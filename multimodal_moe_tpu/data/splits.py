"""Stratified train/val/test split creation.

Reproduces the reference's two-stage 80/10/10 stratified split on the
composite key ``ped_bin_4 + "_" + time_of_day`` with seed 0
(ref: scripts/create_splits.py:5-36). Uses sklearn's ``train_test_split`` with
identical arguments so the emitted ID lists are bit-comparable with the
reference for identical input parquet.
"""

from __future__ import annotations

from pathlib import Path

import pandas as pd
from sklearn.model_selection import train_test_split


def create_stratified_splits(
    df: pd.DataFrame, seed: int = 0, test_size: float = 0.20
) -> "dict[str, pd.DataFrame]":
    """Split frames 80/10/10 stratified by ``ped_bin_4 × time_of_day``."""
    df = df.copy()
    df["time_of_day"] = df["time_of_day"].fillna("unknown").astype(str)
    df["ped_bin_4"] = df["ped_bin_4"].astype(int)
    df["strat_key"] = df["ped_bin_4"].astype(str) + "_" + df["time_of_day"]

    train_df, temp_df = train_test_split(
        df, test_size=test_size, random_state=seed, stratify=df["strat_key"]
    )
    val_df, test_df = train_test_split(
        temp_df, test_size=0.50, random_state=seed, stratify=temp_df["strat_key"]
    )
    return {"train": train_df, "val": val_df, "test": test_df}


def write_split_csvs(
    splits: "dict[str, pd.DataFrame]", output_dir: "str | Path"
) -> "dict[str, Path]":
    """Write ``{split}_ids.csv`` files holding only ``frame_id`` columns."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    out = {}
    for split_name, split_df in splits.items():
        path = output_dir / f"{split_name}_ids.csv"
        split_df[["frame_id"]].to_csv(path, index=False)
        out[split_name] = path
    return out
