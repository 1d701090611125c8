"""Solar-elevation context binning — the routing signal for the MoE detector.

Bins follow the USNO illumination regimes with daytime subdivided into
practical ML routing bands, exactly as the reference's derived-table stage
(ref: scripts/add_solar_context_bins.py:90-104): right-closed intervals over
``(-inf, -6], (-6, 0], (0, 15], (15, 45], (45, inf)`` with labels
night/twilight/low_sun/mid_sun/high_sun and ``"missing"`` for absent values.

Besides the string labels (for parquet portability) this module exposes the
**integer bin ids and one-hot encoding** the TPU MoE router consumes: the
router's additive context bias is a learned embedding over these bins
(ref design notes: notes/related_work.md:64-75).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SOLAR_BIN_EDGES = [-1e9, -6.0, 0.0, 15.0, 45.0, 1e9]
SOLAR_BIN_LABELS = [
    "night(<-6)",
    "twilight(-6..0)",
    "low_sun(0..15)",
    "mid_sun(15..45)",
    "high_sun(>45)",
]
MISSING_LABEL = "missing"
# Integer ids: the 5 real bins in SOLAR_BIN_LABELS order, then "missing".
NUM_SOLAR_BINS = len(SOLAR_BIN_LABELS) + 1
SOLAR_BIN_TO_ID = {label: i for i, label in enumerate(SOLAR_BIN_LABELS)}
SOLAR_BIN_TO_ID[MISSING_LABEL] = len(SOLAR_BIN_LABELS)


def solar_bin_ids(solar_elevation) -> np.ndarray:
    """Vectorized elevation(deg) → integer bin id (missing/NaN → last id)."""
    x = np.asarray(pd.to_numeric(pd.Series(solar_elevation), errors="coerce"), dtype=np.float64)
    # right-closed bins to match pd.cut(right=True): x <= -6 → 0, -6 < x <= 0 → 1, ...
    ids = np.digitize(x, SOLAR_BIN_EDGES[1:-1], right=True)
    ids = np.where(np.isnan(x), len(SOLAR_BIN_LABELS), ids)
    return ids.astype(np.int32)


def solar_bin_labels(solar_elevation) -> pd.Series:
    """Vectorized elevation(deg) → string label series (plain ``str`` dtype)."""
    ids = solar_bin_ids(solar_elevation)
    all_labels = np.asarray(SOLAR_BIN_LABELS + [MISSING_LABEL], dtype=object)
    return pd.Series(all_labels[ids]).astype("string")


def add_solar_context_bins(df: pd.DataFrame, out_col: str = "solar_context_bin") -> pd.DataFrame:
    """Return a copy of ``df`` with the categorical solar bin column added.

    Requires a ``solar_angle_elevation`` column
    (ref: scripts/add_solar_context_bins.py:86-109).
    """
    if "solar_angle_elevation" not in df.columns:
        raise ValueError("Expected 'solar_angle_elevation' column in input parquet.")
    out = df.copy()
    labels = solar_bin_labels(out["solar_angle_elevation"])
    labels.index = out.index
    out[out_col] = labels
    return out


def solar_bin_one_hot(bin_ids: np.ndarray) -> np.ndarray:
    """Integer bin ids → ``(N, NUM_SOLAR_BINS)`` float32 one-hot (router input)."""
    return np.eye(NUM_SOLAR_BINS, dtype=np.float32)[np.asarray(bin_ids, dtype=np.int64)]
