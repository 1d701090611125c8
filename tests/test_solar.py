"""Tests for solar context binning (ref: scripts/add_solar_context_bins.py:90-104)."""

import numpy as np
import pandas as pd
import pytest

from multimodal_moe_tpu.data.solar import (
    NUM_SOLAR_BINS,
    add_solar_context_bins,
    solar_bin_ids,
    solar_bin_labels,
    solar_bin_one_hot,
)


class TestBinning:
    def test_regime_boundaries(self):
        # Right-closed intervals, matching pd.cut(right=True, include_lowest=True).
        values = [-90.0, -6.1, -6.0, -5.9, 0.0, 0.1, 15.0, 15.1, 45.0, 45.1, 89.0]
        labels = solar_bin_labels(values).tolist()
        assert labels == [
            "night(<-6)",
            "night(<-6)",
            "night(<-6)",       # -6.0 falls in (-inf, -6]
            "twilight(-6..0)",
            "twilight(-6..0)",  # 0.0 falls in (-6, 0]
            "low_sun(0..15)",
            "low_sun(0..15)",   # 15.0 falls in (0, 15]
            "mid_sun(15..45)",
            "mid_sun(15..45)",  # 45.0 falls in (15, 45]
            "high_sun(>45)",
            "high_sun(>45)",
        ]

    def test_missing_values(self):
        labels = solar_bin_labels([None, float("nan"), "not_a_number", 10.0]).tolist()
        assert labels == ["missing", "missing", "missing", "low_sun(0..15)"]

    def test_matches_pandas_cut_reference(self):
        """Bit-compare against the reference's exact pd.cut construction."""
        rng = np.random.default_rng(0)
        solar = pd.Series(rng.uniform(-90, 90, size=500))
        solar.iloc[::17] = np.nan

        ref_bins = [-1e9, -6.0, 0.0, 15.0, 45.0, 1e9]
        ref_labels = [
            "night(<-6)",
            "twilight(-6..0)",
            "low_sun(0..15)",
            "mid_sun(15..45)",
            "high_sun(>45)",
        ]
        ref = (
            pd.cut(solar, bins=ref_bins, labels=ref_labels, include_lowest=True)
            .astype("string")
            .fillna("missing")
        )
        ours = solar_bin_labels(solar)
        assert ours.tolist() == ref.tolist()

    def test_add_column_requires_input(self):
        with pytest.raises(ValueError, match="solar_angle_elevation"):
            add_solar_context_bins(pd.DataFrame({"other": [1]}))

    def test_add_column(self):
        df = pd.DataFrame({"solar_angle_elevation": [30.0, None], "k": [1, 2]})
        out = add_solar_context_bins(df)
        assert out["solar_context_bin"].tolist() == ["mid_sun(15..45)", "missing"]
        assert "solar_context_bin" not in df.columns  # input immutable

    def test_one_hot_shape(self):
        ids = solar_bin_ids([30.0, None, -10.0])
        oh = solar_bin_one_hot(ids)
        assert oh.shape == (3, NUM_SOLAR_BINS)
        np.testing.assert_array_equal(oh.sum(axis=1), [1, 1, 1])
        assert oh[1, NUM_SOLAR_BINS - 1] == 1.0  # missing → last id
