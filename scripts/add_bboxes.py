#!/usr/bin/env python3
"""Add canonical xyxy pedestrian boxes to the frame parquet.

CLI counterpart of ref: scripts/add_bboxes.py:22-51 (points_to_xyxy →
clamp → validity filter per pedestrian).
"""

from __future__ import annotations

import argparse

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths
from multimodal_moe_tpu.data.indexer import add_xyxy_bboxes


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Add xyxy bbox column to parquet.")
    p.add_argument("--in-parquet", type=str, default=str(paths.ZODMOE_FRAMES_PARQUET))
    p.add_argument(
        "--out-parquet", type=str, default=str(paths.ZODMOE_FRAMES_WITH_BOXES_PARQUET)
    )
    return p.parse_args()


def main() -> None:
    import pandas as pd

    args = parse_args()
    df = pd.read_parquet(args.in_parquet)
    df = add_xyxy_bboxes(df)
    from pathlib import Path

    Path(args.out_parquet).parent.mkdir(parents=True, exist_ok=True)
    df.to_parquet(args.out_parquet)
    print(f"Saved updated parquet to: {args.out_parquet}")


if __name__ == "__main__":
    main()
