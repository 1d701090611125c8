"""Exporter tests: YOLO layout + COCO JSON (ref: src/data/exports.py,
scripts/export_coco_dataset.py)."""

import json

import numpy as np
import pytest

from multimodal_moe_tpu.data.exports import (
    export_coco_split,
    export_yolo_split,
    safe_iter_boxes,
    write_yolo_dataset_yaml,
    xyxy_to_coco_xywh,
)
from multimodal_moe_tpu.data.index import load_split_frames


class TestSafeIterBoxes:
    def test_none_and_empty(self):
        assert safe_iter_boxes(None) == []
        assert safe_iter_boxes([]) == []

    def test_2d_array(self):
        boxes = safe_iter_boxes(np.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=np.float32))
        assert len(boxes) == 2 and boxes[0].shape == (4,)

    def test_single_box_1d(self):
        boxes = safe_iter_boxes(np.array([1, 2, 3, 4]))
        assert len(boxes) == 1

    def test_object_container(self):
        raw = np.empty(2, dtype=object)
        raw[0] = [1.0, 2.0, 3.0, 4.0]
        raw[1] = [1.0, 2.0, 3.0]  # wrong length — dropped
        boxes = safe_iter_boxes(raw)
        assert len(boxes) == 1

    def test_weird_shape(self):
        assert safe_iter_boxes(np.zeros((2, 3))) == []


class TestCocoXywh:
    def test_clamps_to_image_extent(self):
        # COCO clamps to [0, W], not [0, W-1] (ref: export_coco_dataset.py:80-90).
        out = xyxy_to_coco_xywh(np.array([-10.0, -10.0, 2000.0, 2000.0]), 1248, 704)
        assert out == (0.0, 0.0, 1248.0, 704.0)

    def test_degenerate_none(self):
        assert xyxy_to_coco_xywh(np.array([5.0, 5.0, 5.0, 9.0]), 100, 100) is None


@pytest.fixture(scope="module")
def split_frames(boxed_parquet, split_csvs):
    return {
        name: load_split_frames(boxed_parquet, csv) for name, csv in split_csvs.items()
    }


class TestYoloExport:
    def test_export_layout_and_labels(self, split_frames, tmp_path):
        out_dir = tmp_path / "yolo_export"
        summary = export_yolo_split(
            split_name="train",
            frames_df=split_frames["train"],
            out_dataset_dir=out_dir,
            unclear_policy="exclude_unclear",
        )
        assert summary.n_frames == len(split_frames["train"])
        assert summary.n_images_written == summary.n_frames
        assert summary.n_label_files_written == summary.n_frames

        images = sorted((out_dir / "images" / "train").iterdir())
        labels = sorted((out_dir / "labels" / "train").iterdir())
        assert len(images) == len(labels) == summary.n_frames
        assert all(p.is_symlink() for p in images)

        # Label format: "0 xc yc w h" at 6 decimals, everything in (0, 1].
        n_lines = 0
        for label in labels:
            for line in label.read_text().splitlines():
                parts = line.split(" ")
                assert len(parts) == 5
                assert parts[0] == "0"
                vals = [float(v) for v in parts[1:]]
                assert all("." in p and len(p.split(".")[1]) == 6 for p in parts[1:])
                assert 0.0 <= vals[0] <= 1.0 and 0.0 <= vals[1] <= 1.0
                assert 0.0 < vals[2] <= 1.0 and 0.0 < vals[3] <= 1.0
                n_lines += 1
        assert n_lines == summary.n_boxes_written

    def test_unclear_policy(self, split_frames, tmp_path):
        keep = export_yolo_split(
            split_name="train",
            frames_df=split_frames["train"],
            out_dataset_dir=tmp_path / "keep",
            unclear_policy="keep_all",
        )
        drop = export_yolo_split(
            split_name="train",
            frames_df=split_frames["train"],
            out_dataset_dir=tmp_path / "drop",
            unclear_policy="exclude_unclear",
        )
        assert drop.n_boxes_dropped_unclear > 0
        assert keep.n_boxes_dropped_unclear == 0
        assert keep.n_boxes_written == drop.n_boxes_written + drop.n_boxes_dropped_unclear

    def test_empty_label_files_counted(self, split_frames, tmp_path):
        df = split_frames["train"]
        zero_ped = df[df["ped_count_clear"] + df["ped_count_unclear"] == 0]
        if len(zero_ped) == 0:
            pytest.skip("no zero-ped frame in train split")
        summary = export_yolo_split(
            split_name="train", frames_df=zero_ped, out_dataset_dir=tmp_path / "empty"
        )
        assert summary.n_empty_label_files == len(zero_ped)

    def test_dataset_yaml(self, tmp_path):
        path = write_yolo_dataset_yaml(tmp_path / "ds", {0: "pedestrian"})
        text = path.read_text()
        assert "train: images/train" in text
        assert "nc: 1" in text
        assert "  0: pedestrian" in text
        assert f"path: {str((tmp_path / 'ds').resolve())}" in text


class TestCocoExport:
    def test_export_schema(self, split_frames, tmp_path):
        out_dir = tmp_path / "coco_export"
        summary = export_coco_split(
            split_name="val",
            frames_df=split_frames["val"],
            out_dataset_dir=out_dir,
            unclear_policy="exclude_unclear",
        )
        coco = json.loads((out_dir / "annotations" / "instances_val.json").read_text())
        assert set(coco.keys()) == {"info", "licenses", "images", "annotations", "categories"}
        assert coco["categories"] == [
            {"id": 1, "name": "pedestrian", "supercategory": "person"}
        ]
        assert len(coco["images"]) == summary.n_images_written
        assert len(coco["annotations"]) == summary.n_annotations_written

        img_ids = {img["id"] for img in coco["images"]}
        ann_ids = [a["id"] for a in coco["annotations"]]
        assert ann_ids == list(range(1, len(ann_ids) + 1))  # sequential from 1
        for ann in coco["annotations"]:
            assert ann["image_id"] in img_ids
            assert ann["category_id"] == 1
            assert ann["iscrowd"] == 0
            x, y, w, h = ann["bbox"]
            assert w > 0 and h > 0
            assert abs(ann["area"] - w * h) < 1e-6

        for img in coco["images"]:
            assert img["width"] == 1248 and img["height"] == 704
            assert "solar_context_bin" in img  # context rides along per image

    def test_images_symlinked(self, split_frames, tmp_path):
        out_dir = tmp_path / "coco_links"
        export_coco_split(
            split_name="val", frames_df=split_frames["val"], out_dataset_dir=out_dir
        )
        imgs = list((out_dir / "images" / "val").iterdir())
        assert len(imgs) > 0 and all(p.is_symlink() for p in imgs)
