"""Stratified priority sampling: per-stratum brute parity + partition
invariance."""
import numpy as np
import pandas as pd
import ray.data

from proj_ray.functions.sample import stratified_priority_sample

_KNUTH, _MOD = 2654435761, 1 << 32


def _brute(df, n):
    q = (df["w"].to_numpy(np.int64).astype(object) * _MOD) // \
        (df["id"].to_numpy(np.int64) % _MOD * _KNUTH % _MOD + 1)
    d = df.assign(q=q.astype(np.int64))
    d = d.sort_values(["q", "id"], ascending=[False, True],
                      kind="mergesort")
    return (d.groupby("s", sort=False).head(n)
            .sort_values(["s", "q", "id"],
                         ascending=[True, False, True],
                         kind="mergesort").reset_index(drop=True))


def test_stratified_priority_parity(ray_session):
    rng = np.random.default_rng(19)
    m = 3000
    df = pd.DataFrame({
        "s": rng.choice(["a", "b", "c", "d"], m),
        "id": rng.permutation(m).astype(np.int64),
        "w": rng.integers(1, 1000, m).astype(np.int64)})
    want = _brute(df, 7)[["s", "id", "w"]]
    for parts in (1, 6):
        got = stratified_priority_sample(
            ray.data.from_pandas(df).repartition(parts),
            "s", "w", "id", n=7)[["s", "id", "w"]]
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
