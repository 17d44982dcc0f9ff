"""IDW grid interpolation: exact-int parity with a scalar reference
and partition-count invariance (order-free accumulators)."""

import numpy as np
import pandas as pd


def _scalar_idw(df, x0=-1800, y0=-800, pitch=100, nx=36, ny=17, r=150):
    W = 1 << 30
    acc = {}
    for lon, lat, v in df.itertuples(index=False):
        px = int(np.floor(lon * 10 + 0.5))
        py = int(np.floor(lat * 10 + 0.5))
        for i in range(nx):
            for j in range(ny):
                gx, gy = x0 + pitch * i, y0 + pitch * j
                d2 = (px - gx) ** 2 + (py - gy) ** 2
                if d2 <= r * r:
                    c = acc.setdefault((gx, gy), [0, 0, 0])
                    wq = W // max(d2, 1)
                    c[0] += 1
                    c[1] += wq
                    c[2] += wq * int(v)
    rows = [(gx, gy, n, swq, swqv, swqv // max(swq, 1))
            for (gx, gy), (n, swq, swqv) in sorted(acc.items())]
    return pd.DataFrame(rows, columns=["gx", "gy", "n_pts", "sum_wq",
                                       "sum_wqv", "est_q"])


def test_idw_matches_scalar_and_is_partition_invariant(ray_session):
    import ray.data as rd

    from proj_ray.functions.interpolate import idw_grid_stats

    rng = np.random.default_rng(17)
    df = pd.DataFrame({"lon": rng.uniform(-179, 179, 400),
                       "lat": rng.uniform(-84, 84, 400),
                       "v": rng.integers(1, 5000, 400)})
    exp = _scalar_idw(df)
    a = idw_grid_stats(rd.from_pandas(df).repartition(1),
                       "lon", "lat", "v", chunk=64)
    b = idw_grid_stats(rd.from_pandas(df).repartition(7),
                       "lon", "lat", "v", chunk=33)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(
        a, exp.astype(np.int64), check_dtype=False)


def test_idw_point_on_node_uses_capped_weight(ray_session):
    import ray.data as rd

    from proj_ray.functions.interpolate import idw_grid_stats

    # point exactly on node (0, 0): d2 = 0 -> wq = W // 1
    df = pd.DataFrame({"lon": [0.0], "lat": [0.0], "v": [7]})
    out = idw_grid_stats(rd.from_pandas(df), "lon", "lat", "v")
    at_node = out[(out.gx == 0) & (out.gy == 0)].iloc[0]
    assert at_node["sum_wq"] == (1 << 30)
    assert at_node["est_q"] == 7
