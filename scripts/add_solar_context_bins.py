#!/usr/bin/env python3
"""Add binned solar-elevation context labels (the MoE routing signal).

CLI counterpart of ref: scripts/add_solar_context_bins.py:70-116, including
the immutable-input/derived-output policy and the ``--overwrite`` guard.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from _common import PROJECT_ROOT  # noqa: F401

from multimodal_moe_tpu import paths
from multimodal_moe_tpu.data.solar import add_solar_context_bins


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Add solar context bins and save derived parquet."
    )
    p.add_argument(
        "--in-parquet", type=str, default=str(paths.ZODMOE_FRAMES_WITH_BOXES_PARQUET)
    )
    p.add_argument(
        "--out-parquet",
        type=str,
        default=str(paths.ZODMOE_FRAMES_WITH_BOXES_AND_SOLAR_BINS_PARQUET),
    )
    p.add_argument("--overwrite", action="store_true")
    return p.parse_args()


def main() -> None:
    import pandas as pd

    args = parse_args()
    in_parquet = Path(args.in_parquet).expanduser().resolve()
    out_parquet = Path(args.out_parquet).expanduser().resolve()

    if not in_parquet.exists():
        raise FileNotFoundError(f"Input parquet not found: {in_parquet}")
    if out_parquet.exists() and not args.overwrite:
        raise FileExistsError(
            f"Output parquet already exists: {out_parquet}. Use --overwrite to replace it."
        )

    df = add_solar_context_bins(pd.read_parquet(in_parquet))
    out_parquet.parent.mkdir(parents=True, exist_ok=True)
    df.to_parquet(out_parquet, index=False)

    print(f"Input parquet  -> {in_parquet}")
    print(f"Output parquet -> {out_parquet}")
    print("solar_context_bin counts:")
    print(df["solar_context_bin"].value_counts(dropna=False).to_string())


if __name__ == "__main__":
    main()
