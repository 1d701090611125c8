"""Tests for stratified split creation (ref: scripts/create_splits.py)."""

import numpy as np
import pandas as pd

from multimodal_moe_tpu.data.splits import create_stratified_splits, write_split_csvs


def _fake_frames(n=400, seed=0):
    # Cycle through all 12 (bin × time) combos so every stratification class
    # has ≥ n/12 members (sklearn stratify needs ≥2 per class).
    rng = np.random.default_rng(seed)
    combos = [(b, t) for b in range(4) for t in ("day", "night", "twilight")]
    picks = [combos[i % len(combos)] for i in range(n)]
    rng.shuffle(picks)
    return pd.DataFrame(
        {
            "frame_id": [f"{i:06d}" for i in range(n)],
            "ped_bin_4": [p[0] for p in picks],
            "time_of_day": [p[1] for p in picks],
        }
    )


class TestSplits:
    def test_sizes_80_10_10(self):
        df = _fake_frames()
        splits = create_stratified_splits(df, seed=0)
        n = len(df)
        assert len(splits["train"]) == int(n * 0.8)
        assert len(splits["val"]) + len(splits["test"]) == n - len(splits["train"])
        assert abs(len(splits["val"]) - len(splits["test"])) <= 1

    def test_disjoint_and_complete(self):
        df = _fake_frames()
        splits = create_stratified_splits(df, seed=0)
        ids = [set(s["frame_id"]) for s in splits.values()]
        assert ids[0] & ids[1] == set()
        assert ids[0] & ids[2] == set()
        assert ids[1] & ids[2] == set()
        assert ids[0] | ids[1] | ids[2] == set(df["frame_id"])

    def test_deterministic_given_seed(self):
        df = _fake_frames()
        a = create_stratified_splits(df, seed=0)
        b = create_stratified_splits(df, seed=0)
        for k in a:
            assert a[k]["frame_id"].tolist() == b[k]["frame_id"].tolist()

    def test_stratification_preserved(self):
        df = _fake_frames(n=2000)
        splits = create_stratified_splits(df, seed=0)
        df = df.copy()
        df["key"] = df["ped_bin_4"].astype(str) + "_" + df["time_of_day"]
        full_dist = df["key"].value_counts(normalize=True)
        tr = splits["train"].copy()
        tr_dist = tr["strat_key"].value_counts(normalize=True)
        for key, frac in full_dist.items():
            assert abs(tr_dist.get(key, 0.0) - frac) < 0.02

    def test_write_csvs_only_frame_id(self, tmp_path):
        df = _fake_frames(n=240)
        splits = create_stratified_splits(df, seed=0)
        paths = write_split_csvs(splits, tmp_path)
        for name, p in paths.items():
            out = pd.read_csv(p, dtype=str)
            assert out.columns.tolist() == ["frame_id"]
            assert len(out) == len(splits[name])

    def test_nan_time_of_day_handled(self):
        df = _fake_frames(n=480)
        df.loc[:119, "time_of_day"] = None
        splits = create_stratified_splits(df, seed=0)
        assert sum(len(s) for s in splits.values()) == len(df)
