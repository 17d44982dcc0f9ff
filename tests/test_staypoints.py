"""Stay-point detection: pandas gaps-and-islands parity + partition
invariance."""
import numpy as np
import pandas as pd
import ray.data

from proj_ray.functions.temporal import staypoints


def _brute(df, r2, min_run):
    rows = []
    for u, g in df.groupby("k"):
        g = g.sort_values(["t", "tie"], kind="stable")
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        brk = np.r_[True, (np.diff(x) ** 2 + np.diff(y) ** 2) > r2]
        seg = np.cumsum(brk)
        lens = pd.Series(seg).value_counts().to_numpy()
        rows.append((u, len(g), int((lens >= min_run).sum()),
                     int(lens.max())))
    return pd.DataFrame(rows, columns=["k", "n_points", "n_stays",
                                       "longest_run"]).sort_values("k")


def test_staypoints_parity_and_partitions(ray_session):
    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 25, n).astype(np.int64),
        "t": rng.integers(0, 500, n).astype(np.int64),  # ts ties occur
        "tie": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 3000, n).astype(np.int64),
        "y": rng.integers(0, 3000, n).astype(np.int64),
    })
    want = _brute(df, r2=1_000_000, min_run=3).reset_index(drop=True)
    for parts in (1, 8):
        got = (staypoints(ray.data.from_pandas(df).repartition(parts),
                          "k", "t", r2=1_000_000, min_run=3,
                          tie_col="tie")
               .to_pandas().sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
