"""Local-maximum hotspot detection: brute parity + boundary semantics."""

import numpy as np
import pandas as pd


def _brute(counts, min_count):
    idx = {(r.x, r.y): r.n for r in counts.itertuples(index=False)}
    out = []
    for (x, y), n in idx.items():
        if n < min_count:
            continue
        ring = [idx.get((x + dx, y + dy), 0)
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)]
        if all(n > g for g in ring):
            out.append((x, y, n))
    return sorted(out)


def test_local_max_matches_brute(ray_session):
    import ray.data as rd

    from proj_ray.functions.hotspot import local_max_cells

    rng = np.random.default_rng(7)
    cells = rng.choice(400, size=(120, 2), replace=False) % 20
    df = pd.DataFrame({"x": cells[:, 0].astype(np.int64),
                       "y": cells[:, 1].astype(np.int64),
                       "n": rng.integers(1, 50, 120).astype(np.int64)})
    df = df.drop_duplicates(subset=["x", "y"]).reset_index(drop=True)
    got = local_max_cells(rd.from_pandas(df).repartition(4),
                          "x", "y", "n", min_count=5)
    exp = _brute(df, 5)
    assert list(map(tuple, got.to_numpy())) == exp


def test_ties_are_not_hotspots(ray_session):
    import ray.data as rd

    from proj_ray.functions.hotspot import local_max_cells

    # equal neighbors: strictness means NEITHER is a hotspot
    df = pd.DataFrame({"x": [0, 1, 5], "y": [0, 0, 5],
                       "n": [7, 7, 9]})
    got = local_max_cells(rd.from_pandas(df), "x", "y", "n",
                          min_count=1)
    assert list(map(tuple, got.to_numpy())) == [(5, 5, 9)]
