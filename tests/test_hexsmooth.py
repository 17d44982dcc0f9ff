"""Hex stencil smoothing: dense-reference parity + partial-input
linearity (partials vs pre-combined counts give identical output)."""
import numpy as np
import pandas as pd
import ray.data

from proj_ray.functions.hotspot import _HEX_DIRS, hex_smooth


def _brute(df):
    cnt = {(q, r): n for q, r, n in
           df.groupby(["hq", "hr"], as_index=False)["n"].sum()
           .itertuples(index=False)}
    rows = []
    for (q, r), n in sorted(cnt.items()):
        tot = 6 * n + sum(cnt.get((q + dq, r + dr), 0)
                          for dq, dr in _HEX_DIRS)
        rows.append((q, r, n, tot // 12))
    return pd.DataFrame(rows, columns=["hq", "hr", "n", "sm"])


def test_hex_smooth_parity_and_linearity(ray_session):
    rng = np.random.default_rng(4)
    m = 600
    df = pd.DataFrame({
        "hq": rng.integers(-8, 8, m).astype(np.int64),
        "hr": rng.integers(-8, 8, m).astype(np.int64),
        "n": rng.integers(1, 9, m).astype(np.int64),
    })
    want = _brute(df).reset_index(drop=True)
    # partial rows (duplicated cells, several blocks) and pre-combined
    # counts must smooth identically — the stencil is linear
    pre = df.groupby(["hq", "hr"], as_index=False)["n"].sum()
    for frame, parts in ((df, 5), (pre, 1), (pre, 3)):
        got = hex_smooth(ray.data.from_pandas(frame).repartition(parts))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
