"""Tests for frame-ID normalization + split loading (ref: src/data/index.py)."""

import pandas as pd
import pytest

from multimodal_moe_tpu.data.index import (
    load_split_frame_ids,
    load_split_frames,
    normalize_frame_id,
    normalize_frame_id_series,
)


class TestNormalization:
    def test_int_ids(self):
        assert normalize_frame_id(123) == "000123"

    def test_float_suffix(self):
        assert normalize_frame_id("123.0") == "000123"

    def test_whitespace(self):
        assert normalize_frame_id(" 42 ") == "000042"

    def test_already_padded(self):
        assert normalize_frame_id("000123") == "000123"

    def test_series_mixed(self):
        s = normalize_frame_id_series([1, "2.0", " 000003 ", 123456])
        assert s.tolist() == ["000001", "000002", "000003", "123456"]


class TestSplitLoading:
    def test_missing_csv_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_split_frame_ids(tmp_path / "nope.csv")

    def test_missing_column_raises(self, tmp_path):
        p = tmp_path / "bad.csv"
        pd.DataFrame({"wrong": [1]}).to_csv(p, index=False)
        with pytest.raises(ValueError, match="frame_id"):
            load_split_frame_ids(p)

    def test_split_order_is_deterministic(self, tmp_path):
        parquet = tmp_path / "frames.parquet"
        pd.DataFrame(
            {"frame_id": ["000001", "000002", "000003", "000004"], "x": [1, 2, 3, 4]}
        ).to_parquet(parquet)
        csv = tmp_path / "split.csv"
        # CSV order (3, 1, 4) must be preserved in the output.
        pd.DataFrame({"frame_id": [3, 1, 4]}).to_csv(csv, index=False)

        df = load_split_frames(parquet, csv)
        assert df["frame_id"].tolist() == ["000003", "000001", "000004"]
        assert df["x"].tolist() == [3, 1, 4]

    def test_required_columns_subset(self, tmp_path):
        parquet = tmp_path / "frames.parquet"
        pd.DataFrame(
            {"frame_id": ["000001"], "a": [1], "b": [2]}
        ).to_parquet(parquet)
        csv = tmp_path / "split.csv"
        pd.DataFrame({"frame_id": [1]}).to_csv(csv, index=False)

        df = load_split_frames(parquet, csv, required_columns=["a"])
        assert set(df.columns) == {"frame_id", "a"}

    def test_empty_match_raises(self, tmp_path):
        parquet = tmp_path / "frames.parquet"
        pd.DataFrame({"frame_id": ["000001"]}).to_parquet(parquet)
        csv = tmp_path / "split.csv"
        pd.DataFrame({"frame_id": [999999]}).to_csv(csv, index=False)
        with pytest.raises(RuntimeError, match="No rows matched"):
            load_split_frames(parquet, csv)

    def test_mixed_format_ids_still_match(self, tmp_path):
        # Parquet holds ints, CSV holds padded strings — normalization bridges.
        parquet = tmp_path / "frames.parquet"
        pd.DataFrame({"frame_id": [7, 8]}).to_parquet(parquet)
        csv = tmp_path / "split.csv"
        pd.DataFrame({"frame_id": ["000008"]}).to_csv(csv, index=False)
        df = load_split_frames(parquet, csv)
        assert df["frame_id"].tolist() == ["000008"]
