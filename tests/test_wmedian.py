"""Weighted median: brute parity, unit-weight degeneracy, partition
invariance."""
import numpy as np
import pandas as pd
import ray.data

from proj_ray.functions.percentile import weighted_median


def _brute(df):
    rows = []
    for g, gg in df.groupby("g"):
        agg = gg.groupby("v", as_index=False)["w"].sum().sort_values("v")
        tot = int(agg["w"].sum())
        cum = 0
        for v, w in agg.itertuples(index=False):
            cum += int(w)
            if 2 * cum >= tot:
                rows.append((g, int(v), tot))
                break
    return pd.DataFrame(rows, columns=["g", "wmedian", "total_w"])


def test_weighted_median_brute_parity(ray_session):
    rng = np.random.default_rng(12)
    n = 5000
    df = pd.DataFrame({
        "g": rng.integers(0, 9, n).astype(np.int64),
        "v": rng.integers(0, 40, n).astype(np.int64),
        "w": rng.integers(1, 100, n).astype(np.int64)})
    want = _brute(df).sort_values("g").reset_index(drop=True)
    for parts in (1, 7):
        got = weighted_median(
            ray.data.from_pandas(df).repartition(parts), "g", "v", "w")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_weighted_median_unit_weights_is_median(ray_session):
    vals = np.array([1, 3, 5, 7, 9], dtype=np.int64)
    df = pd.DataFrame({"g": np.zeros(5, np.int64), "v": vals,
                       "w": np.ones(5, np.int64)})
    got = weighted_median(ray.data.from_pandas(df), "g", "v", "w")
    assert int(got["wmedian"].iloc[0]) == 5
