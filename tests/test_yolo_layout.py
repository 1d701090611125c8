"""YOLO-layout dataset: export → re-import round trip."""

import numpy as np
import pytest

from multimodal_moe_tpu.data.exports import export_yolo_split, write_yolo_dataset_yaml
from multimodal_moe_tpu.data.index import load_split_frames
from multimodal_moe_tpu.data.pipeline import (
    DetectionLoader,
    ZODMoEDataConfig,
    ZODMoEVisionDataset,
)
from multimodal_moe_tpu.data.yolo_layout import YoloLayoutConfig, YoloLayoutDataset


@pytest.fixture(scope="module")
def exported(boxed_parquet, split_csvs, tmp_path_factory):
    out = tmp_path_factory.mktemp("yolo_ds")
    for split in ("train", "val"):
        frames = load_split_frames(boxed_parquet, split_csvs[split])
        export_yolo_split(split_name=split, frames_df=frames, out_dataset_dir=out)
    write_yolo_dataset_yaml(out, {0: "pedestrian"})
    return out


class TestYoloLayout:
    def test_roundtrip_matches_parquet_dataset(self, exported, boxed_parquet, split_csvs):
        layout = YoloLayoutDataset(
            YoloLayoutConfig(dataset_yaml=str(exported / "dataset.yaml"), split="train")
        )
        parquet_ds = ZODMoEVisionDataset(
            ZODMoEDataConfig(
                frames_parquet=str(boxed_parquet),
                split_csv=str(split_csvs["train"]),
            )
        )
        assert len(layout) == len(parquet_ds)
        # Match by frame id (layout sorts by filename; parquet by split order).
        by_stem = {p.stem: i for i, p in enumerate(layout.image_paths)}
        for j in range(len(parquet_ds)):
            s_p = parquet_ds.load(j)
            fid = parquet_ds.df.iloc[j]["frame_id"]
            s_l = layout.load(by_stem[fid])
            np.testing.assert_array_equal(s_l["image"], s_p["image"])
            n_p = int(s_p["gt_mask"].sum())
            n_l = int(s_l["gt_mask"].sum())
            assert n_l == n_p
            if n_p:
                # label txt carries 6-decimal normalized coords → ~1e-3 px
                a = np.sort(s_l["gt_boxes"][:n_l], axis=0)
                b = np.sort(s_p["gt_boxes"][:n_p], axis=0)
                np.testing.assert_allclose(a, b, atol=0.01)

    def test_loader_compatible(self, exported):
        ds = YoloLayoutDataset(
            YoloLayoutConfig(dataset_yaml=str(exported / "dataset.yaml"), split="val")
        )
        batch = next(iter(DetectionLoader(ds, batch_size=2, drop_last=False)))
        assert batch["image"].shape[1:] == (704, 1248, 3)
        assert batch["gt_boxes"].shape[1:] == (96, 4)

    def test_missing_yaml_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            YoloLayoutDataset(YoloLayoutConfig(dataset_yaml=str(tmp_path / "x.yaml")))
