"""Tests for the input pipeline (dataset, loader, device prefetch)."""

import numpy as np
import pytest

from multimodal_moe_tpu.data.pipeline import (
    DetectionLoader,
    ZODMoEDataConfig,
    ZODMoEVisionDataset,
    prefetch_to_device,
)


@pytest.fixture(scope="module")
def dataset(boxed_parquet, split_csvs):
    cfg = ZODMoEDataConfig(
        frames_parquet=str(boxed_parquet),
        split_csv=str(split_csvs["train"]),
        img_h=64,
        img_w=128,
        max_boxes=32,
    )
    return ZODMoEVisionDataset(cfg)


class TestDataset:
    def test_len(self, dataset):
        assert len(dataset) == 8

    def test_sample_shapes(self, dataset):
        s = dataset.load(0)
        assert s["image"].shape == (64, 128, 3) and s["image"].dtype == np.uint8
        assert s["gt_boxes"].shape == (32, 4)
        assert s["gt_mask"].shape == (32,)
        assert s["label"] in (0, 1)
        assert 0 <= s["solar_bin"] <= 5

    def test_boxes_rescaled_to_canvas(self, dataset):
        for i in range(len(dataset)):
            s = dataset.load(i)
            boxes = s["gt_boxes"][s["gt_mask"]]
            if len(boxes):
                assert boxes[:, 0].min() >= 0 and boxes[:, 2].max() <= 128
                assert boxes[:, 1].min() >= 0 and boxes[:, 3].max() <= 64

    def test_unclear_policy_filters(self, boxed_parquet, split_csvs):
        keep = ZODMoEVisionDataset(
            ZODMoEDataConfig(
                frames_parquet=str(boxed_parquet),
                split_csv=str(split_csvs["train"]),
                unclear_policy="keep_all",
                img_h=64,
                img_w=128,
            )
        )
        drop = ZODMoEVisionDataset(
            ZODMoEDataConfig(
                frames_parquet=str(boxed_parquet),
                split_csv=str(split_csvs["train"]),
                unclear_policy="exclude_unclear",
                img_h=64,
                img_w=128,
            )
        )
        n_keep = sum(int(keep.load(i)["gt_mask"].sum()) for i in range(len(keep)))
        n_drop = sum(int(drop.load(i)["gt_mask"].sum()) for i in range(len(drop)))
        assert n_keep > n_drop


class TestLoader:
    def test_batch_shapes_droplast(self, dataset):
        loader = DetectionLoader(dataset, batch_size=3, drop_last=True)
        batches = list(loader)
        assert len(batches) == len(loader) == 2
        for b in batches:
            assert b["image"].shape == (3, 64, 128, 3)
            assert b["gt_boxes"].shape == (3, 32, 4)
            assert b["batch_valid"].all()

    def test_partial_batch_padded(self, dataset):
        loader = DetectionLoader(dataset, batch_size=5, drop_last=False)
        batches = list(loader)
        assert len(batches) == 2
        last = batches[-1]
        assert last["image"].shape[0] == 5
        assert last["batch_valid"].tolist() == [True, True, True, False, False]

    def test_shuffle_changes_order_deterministically(self, dataset):
        l1 = DetectionLoader(dataset, batch_size=8, shuffle=True, seed=1)
        l2 = DetectionLoader(dataset, batch_size=8, shuffle=True, seed=1)
        b1, b2 = next(iter(l1)), next(iter(l2))
        np.testing.assert_array_equal(b1["image"], b2["image"])
        # epoch 2 differs from epoch 1
        b1b = next(iter(l1))
        assert not np.array_equal(b1["image"], b1b["image"])


class TestMultiHostSharding:
    def test_processes_get_disjoint_complete_coverage(self, dataset):
        loaders = [
            DetectionLoader(
                dataset, batch_size=2, shuffle=True, seed=5,
                process_index=i, process_count=2, drop_last=False,
            )
            for i in range(2)
        ]
        seen = []
        for loader in loaders:
            for batch in loader:
                seen.append(batch["image"][batch["batch_valid"]])
        imgs = np.concatenate(seen)
        assert imgs.shape[0] == len(dataset)  # disjoint + complete
        # uniqueness via content hash
        hashes = {arr.tobytes() for arr in imgs}
        assert len(hashes) == len(dataset)

    def test_len_accounts_for_sharding(self, dataset):
        l = DetectionLoader(dataset, batch_size=2, process_index=0, process_count=2)
        assert len(l) == len(dataset) // 2 // 2


class TestPrefetch:
    def test_prefetch_to_mesh(self, dataset):
        from multimodal_moe_tpu.parallel.mesh import batch_sharding, create_mesh

        mesh = create_mesh()  # 8 virtual CPU devices
        loader = DetectionLoader(dataset, batch_size=8, drop_last=True)
        out = list(prefetch_to_device(iter(loader), sharding=batch_sharding(mesh)))
        assert len(out) == 1
        img = out[0]["image"]
        assert img.shape == (8, 64, 128, 3)
        # sharded over the data axis: 8 shards, one per device
        assert len(img.sharding.device_set) == 8


class TestDistributedEntry:
    def test_single_host_noop(self, monkeypatch):
        from multimodal_moe_tpu.parallel import distributed

        for var in (
            "MMOE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
            "MMOE_NUM_PROCESSES", "JAX_NUM_PROCESSES",
        ):
            monkeypatch.delenv(var, raising=False)
        assert distributed.maybe_initialize_distributed() is False
        assert distributed.loader_shard() == (0, 1)

    def test_multi_host_env_detected(self, monkeypatch):
        # With a coordinator address set, the entry must attempt real
        # initialization (we don't run a second process here — the call
        # failing to connect/validate is the expected signal).
        from multimodal_moe_tpu.parallel import distributed

        monkeypatch.setattr(distributed, "_initialized", False)
        monkeypatch.setenv("MMOE_COORDINATOR_ADDRESS", "127.0.0.1:1")
        monkeypatch.setenv("MMOE_NUM_PROCESSES", "2")
        monkeypatch.setenv("MMOE_PROCESS_ID", "1")
        import pytest as _pytest

        with _pytest.raises(Exception):
            distributed.maybe_initialize_distributed()
