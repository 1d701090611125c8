#!/usr/bin/env python3
"""Export train/val/test splits to the Ultralytics/YOLO dataset layout.

CLI counterpart of the reference's YOLO export flow
(ref: scripts/export_yolo_dataset.py via src/data/exports.py:178-336).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths
from multimodal_moe_tpu.data.exports import export_yolo_split, write_yolo_dataset_yaml
from multimodal_moe_tpu.data.index import load_split_frames


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Export YOLO dataset from parquet+splits.")
    p.add_argument(
        "--parquet", type=str, default=str(paths.ZODMOE_FRAMES_WITH_BOXES_PARQUET)
    )
    p.add_argument("--splits-dir", type=str, default=str(paths.SPLITS_DIR))
    p.add_argument(
        "--out-dir",
        type=str,
        default=str(paths.EXPORTS_DIR / "yolo" / "pedestrian_v1_exclude_unclear"),
    )
    p.add_argument(
        "--unclear-policy",
        choices=["keep_all", "exclude_unclear"],
        default="exclude_unclear",
    )
    p.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    return p.parse_args()


def main() -> None:
    args = parse_args()
    splits_dir = Path(args.splits_dir)
    for split in args.splits:
        frames = load_split_frames(args.parquet, splits_dir / f"{split}_ids.csv")
        summary = export_yolo_split(
            split_name=split,
            frames_df=frames,
            out_dataset_dir=args.out_dir,
            unclear_policy=args.unclear_policy,
        )
        print(summary)
    yaml_path = write_yolo_dataset_yaml(args.out_dir, {0: "pedestrian"})
    print(f"Wrote {yaml_path}")


if __name__ == "__main__":
    main()
