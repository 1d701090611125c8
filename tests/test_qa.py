"""Tests for the index data-QA battery (data/qa.py) — the committed form of
the reference's QA notebooks (see module docstring)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from multimodal_moe_tpu.data import qa


@pytest.fixture()
def boxed_df(boxed_parquet) -> pd.DataFrame:
    return pd.read_parquet(boxed_parquet)


def test_full_qa_passes_on_healthy_index(boxed_df):
    report = qa.run_full_qa(boxed_df)
    assert report["parallel_array_violations"] == 0
    assert report["occlusion"]["n_mismatched_frames"] == 0
    assert report["labels"]["n_frames"] == len(boxed_df)
    assert report["labels"]["total_clear_peds"] > 0
    assert report["bboxes"]["n_boxes"] > 0
    assert 0.0 < report["bboxes"]["height_px"]["p50"]


def test_parallel_array_invariant_catches_corruption(boxed_df):
    df = boxed_df.copy()
    # Drop one uuid from the first frame that has pedestrians.
    i = int(df.index[(df.ped_count_clear + df.ped_count_unclear) > 0][0])
    uuids = list(df.at[i, "ped_uuid"])
    df.at[i, "ped_uuid"] = uuids[:-1]
    bad = qa.parallel_array_invariant(df)
    assert len(bad) == 1
    assert bad.iloc[0]["frame_id"] == df.at[i, "frame_id"]
    with pytest.raises(AssertionError, match="parallel-array"):
        qa.run_full_qa(df)


def test_occlusion_consistency_catches_mismatch(boxed_df):
    df = boxed_df.copy()
    i = int(df.index[0])
    df.at[i, "ped_occ_none"] = int(df.at[i, "ped_occ_none"]) + 1
    occ = qa.occlusion_consistency(df)
    assert occ["n_mismatched_frames"] == 1
    assert df.at[i, "frame_id"] in occ["mismatched_frame_ids"]


def test_occlusion_totals_sum_to_ped_totals(boxed_df):
    occ = qa.occlusion_consistency(boxed_df)
    total_occ = sum(occ["occlusion_totals"].values())
    total_peds = int((boxed_df.ped_count_clear + boxed_df.ped_count_unclear).sum())
    assert total_occ == total_peds


def test_bbox_visibility_fractions_monotone(boxed_df):
    bb = qa.bbox_stats(boxed_df)
    fr = bb["visible_fraction_at_min_height"]
    vals = [fr[k] for k in [">=8px", ">=12px", ">=16px", ">=24px", ">=32px"]]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals == sorted(vals, reverse=True)


def test_crosstabs_cover_all_frames(boxed_df):
    tabs = qa.context_crosstabs(boxed_df)
    assert "time_of_day" in tabs
    assert int(tabs["time_of_day"].to_numpy().sum()) == len(boxed_df)


def test_bbox_stats_without_bbox_stage(indexed_parquet):
    """Falls back to reconstructing boxes from ped_points_xy_resized."""
    df = pd.read_parquet(indexed_parquet)
    assert "xyxy_bboxes" not in df.columns
    bb = qa.bbox_stats(df)
    assert bb["n_boxes"] > 0


def test_analyze_cli(boxed_parquet, tmp_path, capsys):
    import sys
    from unittest import mock

    sys.path.insert(0, "scripts")
    import analyze_index_qa

    with mock.patch(
        "sys.argv",
        ["analyze_index_qa.py", "--parquet", str(boxed_parquet), "--out-dir", str(tmp_path)],
    ):
        rc = analyze_index_qa.main()
    assert rc == 0
    assert (tmp_path / "qa_report.md").exists()
    assert (tmp_path / "qa_report.json").exists()
    md = (tmp_path / "qa_report.md").read_text()
    assert "0 violations" in md
