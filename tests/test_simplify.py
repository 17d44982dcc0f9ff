"""Douglas-Peucker simplification: recursive-reference parity,
partition invariance, eps monotonicity."""
import numpy as np
import pandas as pd
import ray.data

from proj_ray.functions.simplify import _dp_keep_mask, simplify_stats


def _dp_ref(x, y, eps2):
    kept = {0, len(x) - 1}

    def rec(lo, hi):
        if hi - lo < 2:
            return
        dx, dy = int(x[hi]) - int(x[lo]), int(y[hi]) - int(y[lo])
        best, bc = -1, -1
        for p in range(lo + 1, hi):
            c = abs(dx * (int(y[p]) - int(y[lo]))
                    - dy * (int(x[p]) - int(x[lo])))
            if c > bc:
                bc, best = c, p
        if bc * bc > eps2 * (dx * dx + dy * dy):
            kept.add(best)
            rec(lo, best)
            rec(best, hi)

    rec(0, len(x) - 1)
    return np.array(sorted(kept))


def test_dp_mask_matches_recursive_reference():
    rng = np.random.default_rng(2)
    for _ in range(20):
        n = int(rng.integers(2, 120))
        x = rng.integers(0, 100_000, n).astype(np.int64)
        y = rng.integers(0, 100_000, n).astype(np.int64)
        eps2 = int(rng.choice([10 ** 4, 10 ** 6, 10 ** 8]))
        got = np.flatnonzero(_dp_keep_mask(x, y, eps2))
        assert np.array_equal(got, _dp_ref(x, y, eps2))


def test_simplify_stats_partition_invariance(ray_session):
    rng = np.random.default_rng(8)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 20, n).astype(np.int64),
        "t": rng.integers(0, 10 ** 6, n).astype(np.int64),
        "tie": np.arange(n, dtype=np.int64),
        "x": rng.integers(0, 1_000_000, n).astype(np.int64),
        "y": rng.integers(0, 1_000_000, n).astype(np.int64),
    })
    outs = []
    for parts in (1, 7):
        got = (simplify_stats(
            ray.data.from_pandas(df).repartition(parts),
            "k", "t", eps=5000, tie_col="tie")
            .to_pandas().sort_values("k").reset_index(drop=True))
        outs.append(got)
        # more points than kept, endpoints always kept
        assert (got["n_kept"] >= 2).all()
        assert (got["n_kept"] <= got["n_points"]).all()
    pd.testing.assert_frame_equal(outs[0], outs[1])
