#!/usr/bin/env python3
"""Create stratified train/val/test split CSVs.

CLI counterpart of ref: scripts/create_splits.py:5-36 (two-stage 80/10/10,
stratified on ped_bin_4 × time_of_day, seed 0; bit-comparable given the same
input parquet).
"""

from __future__ import annotations

import argparse

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths
from multimodal_moe_tpu.data.splits import create_stratified_splits, write_split_csvs


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Create stratified splits.")
    p.add_argument("--parquet", type=str, default=str(paths.ZODMOE_FRAMES_PARQUET))
    p.add_argument("--output-dir", type=str, default=str(paths.SPLITS_DIR))
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main() -> None:
    import pandas as pd

    args = parse_args()
    df = pd.read_parquet(args.parquet)
    splits = create_stratified_splits(df, seed=args.seed)
    write_split_csvs(splits, args.output_dir)
    print(
        f"Created splits -- train: {len(splits['train'])}, "
        f"val: {len(splits['val'])}, test: {len(splits['test'])}"
    )


if __name__ == "__main__":
    main()
