"""Bounded-round weighted SSSP: Bellman-Ford reference parity."""
import numpy as np
import pandas as pd
import ray.data

from proj_ray.functions.graph import sssp_hops


def _bf_ref(edges, source, rounds):
    dist = {source: 0}
    for _ in range(rounds):
        nxt = dict(dist)
        for a, b, w in edges:
            for u, v in ((a, b), (b, a)):
                if u in dist:
                    nd = dist[u] + w
                    if nd < nxt.get(v, 1 << 60):
                        nxt[v] = nd
        dist = nxt
    return dist


def test_sssp_matches_bellman_ford(ray_session):
    rng = np.random.default_rng(6)
    m = 400
    edges = [(int(a), int(b), int(w)) for a, b, w in
             zip(rng.integers(0, 60, m), rng.integers(0, 60, m),
                 rng.integers(1, 10, m))]
    df = pd.DataFrame(edges, columns=["a", "b", "w"])
    for rounds in (1, 3):
        want = _bf_ref(edges, source=0, rounds=rounds)
        got = (sssp_hops(ray.data.from_pandas(df).repartition(4),
                         source=0, max_rounds=rounds)
               .to_pandas().sort_values("node"))
        assert dict(zip(got["node"], got["dist"])) == want
