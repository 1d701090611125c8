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


# ---------------------------------------------------------------------------
# Streaming YUV420 store: native batch decode to raw planes, finished on
# device (half the H2D bytes; pixels identical to the resident loader's).
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def presized_corpus(tmp_path_factory):
    """Six pre-resized 64x128 4:2:0 JPEGs + parquet + split CSV (the corpus
    shape the yuv420 streaming store requires)."""
    import pandas as pd
    from PIL import Image

    root = tmp_path_factory.mktemp("presized")
    rng = np.random.default_rng(7)
    rows = []
    for i in range(6):
        # smooth gradients compress predictably (JPEG-friendly)
        yy = np.linspace(0, 180, 64)[:, None]
        xx = np.linspace(0, 60, 128)[None, :]
        arr = np.clip(yy + xx + rng.normal(0, 3, (64, 128)), 0, 255)
        img = np.stack([arr, 0.7 * arr + 30, 255 - arr], -1).astype(np.uint8)
        p = root / f"img_{i}.jpg"
        Image.fromarray(img).save(p, quality=92, subsampling=2)
        rows.append(
            {
                "frame_id": f"{i:06d}",
                "resized_image_path": str(p),
                "xyxy_bboxes": [[4.0 + i, 6.0, 40.0 + i, 30.0]],
                "ped_unclear_list": [False],
                "ped_present": True,
                "solar_context_bin": "day",
            }
        )
    parquet = root / "frames.parquet"
    pd.DataFrame(rows).to_parquet(parquet)
    split = root / "train_ids.csv"
    split.write_text("frame_id\n" + "\n".join(r["frame_id"] for r in rows) + "\n")
    return {"parquet": parquet, "split": split}


@pytest.fixture(scope="module")
def presized_dataset(presized_corpus):
    return ZODMoEVisionDataset(
        ZODMoEDataConfig(
            frames_parquet=str(presized_corpus["parquet"]),
            split_csv=str(presized_corpus["split"]),
            img_h=64,
            img_w=128,
            max_boxes=8,
        )
    )


def _native_ready():
    from multimodal_moe_tpu.data.native_decode import native_available

    return native_available()


@pytest.mark.skipif(not _native_ready(), reason="native decoder not built")
class TestYuvStreamingStore:
    def test_auto_resolves_yuv420_on_presized_corpus(self, presized_dataset):
        loader = DetectionLoader(presized_dataset, batch_size=2, store="auto")
        assert loader.store == "yuv420"

    def test_auto_falls_back_on_resize_corpus(self, dataset):
        # `dataset` (module fixture) resizes at load time -> not eligible.
        loader = DetectionLoader(dataset, batch_size=2, store="auto")
        assert loader.store == "rgb"

    def test_explicit_yuv420_on_bad_corpus_raises(self, dataset):
        with pytest.raises(ValueError, match="not usable"):
            DetectionLoader(dataset, batch_size=2, store="yuv420")

    def test_batches_carry_planes_and_targets_match_rgb_path(self, presized_dataset):
        yuv_loader = DetectionLoader(presized_dataset, batch_size=3, store="yuv420")
        rgb_loader = DetectionLoader(presized_dataset, batch_size=3, store="rgb")
        yb = list(yuv_loader)
        rb = list(rgb_loader)
        assert len(yb) == len(rb) == 2
        for a, b in zip(yb, rb):
            assert a["y"].shape == (3, 64, 128) and a["y"].dtype == np.uint8
            assert a["cb"].shape == (3, 32, 64)
            assert "image" not in a
            for k in ("gt_boxes", "gt_labels", "gt_mask", "label", "solar_bin"):
                np.testing.assert_array_equal(a[k], b[k])

    def test_prefetch_converts_to_image_near_pil(self, presized_dataset):
        yuv_loader = DetectionLoader(presized_dataset, batch_size=3, store="yuv420")
        rgb_loader = DetectionLoader(presized_dataset, batch_size=3, store="rgb")
        for a, b in zip(
            prefetch_to_device(iter(yuv_loader)), prefetch_to_device(iter(rgb_loader))
        ):
            img = np.asarray(a["image"])
            assert img.shape == (3, 64, 128, 3) and img.dtype == np.uint8
            assert "y" not in a
            # nearest-neighbor chroma vs libjpeg fancy upsampling: close but
            # not bit-exact (same tolerance as the native-decode parity test).
            diff = np.abs(img.astype(np.float32) - np.asarray(b["image"], np.float32))
            assert diff.mean() < 2.0
            assert np.quantile(diff, 0.99) < 16.0

    def test_prefetch_matches_resident_conversion_exactly(self, presized_dataset):
        import jax

        from multimodal_moe_tpu.data.native_decode import decode_jpeg_files_yuv420
        from multimodal_moe_tpu.ops.preprocess import yuv420_to_rgb_u8

        loader = DetectionLoader(presized_dataset, batch_size=6, store="yuv420")
        (batch,) = list(prefetch_to_device(iter(loader)))
        cfg = presized_dataset.cfg
        paths = [
            presized_dataset.df.iloc[i][cfg.image_path_col] for i in range(6)
        ]
        y, cb, cr = decode_jpeg_files_yuv420(paths, 64, 128)
        want = np.asarray(jax.jit(yuv420_to_rgb_u8)(y, cb, cr))
        np.testing.assert_array_equal(np.asarray(batch["image"]), want)

    def test_partial_batch_padded(self, presized_dataset):
        loader = DetectionLoader(
            presized_dataset, batch_size=4, store="yuv420", drop_last=False
        )
        batches = list(loader)
        assert len(batches) == 2
        last = batches[1]
        assert last["y"].shape == (4, 64, 128)
        np.testing.assert_array_equal(last["batch_valid"], [True, True, False, False])
        assert last["y"][3].max() == 0  # zero-padded plane rows

    def test_evaluator_accepts_plane_batches(self, presized_dataset):
        import jax.numpy as jnp

        from multimodal_moe_tpu.train.evaluator import evaluate_detector

        loader = DetectionLoader(
            presized_dataset, batch_size=3, store="yuv420", drop_last=False
        )

        def infer_fn(images, context_ids=None):
            b = images.shape[0]
            boxes = jnp.tile(
                jnp.asarray([[4.0, 6.0, 40.0, 30.0]], jnp.float32), (b, 1)
            )[:, None, :]
            return boxes, jnp.ones((b, 1), jnp.float32)

        metrics = evaluate_detector(
            iter(loader), infer_fn, compute_curves=False, use_nms=False
        )
        assert metrics["n_images"] == 6
        assert metrics["map50"] > 0.5  # predictions equal frame-0 GT
