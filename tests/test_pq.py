"""PQ ADC top-k: brute-force parity and partition invariance."""
import numpy as np
import pandas as pd
import ray.data

from proj_ray.functions.ann import formula_centroids, pq_adc_topk


def _brute(V, qids, k, m, ncode, scale=1_000_000):
    n, dim = V.shape
    sub = dim // m
    C = formula_centroids(ncode, sub).astype(np.int64)
    Q = np.floor(V * scale + 0.5).astype(np.int64).reshape(n, m, sub)
    codes = np.argmax(np.einsum("njd,cd->njc", Q, C), axis=2)
    rows = []
    for q in qids:
        T = np.einsum("jd,cd->jc", Q[q], C)
        sc = sum(T[j, codes[:, j]] for j in range(m))
        order = np.lexsort((np.arange(n), -sc))[:k]
        for r, i in enumerate(order):
            rows.append((q, i, int(sc[i]), r + 1))
    return pd.DataFrame(rows, columns=["q", "nid", "score", "rk"])


def test_pq_adc_matches_brute_and_partitions(ray_session):
    rng = np.random.default_rng(3)
    V = rng.normal(size=(300, 32)).astype(np.float32).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64),
                       "embedding": [v for v in V]})
    want = _brute(V, [0, 1, 2], k=5, m=4, ncode=8)
    for parts in (1, 6):
        got = pq_adc_topk(ray.data.from_pandas(df).repartition(parts),
                          query_ids=[0, 1, 2], k=5, m=4, ncode=8)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False)


def test_pq_self_hit_ranks_first(ray_session):
    # a query's own code-word reconstruction maximizes its ADC score
    # unless another vector shares all its codes — distinct random
    # vectors here, so rank 1 is the query itself
    rng = np.random.default_rng(11)
    V = rng.normal(size=(64, 16)).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(64, dtype=np.int64),
                       "embedding": [v for v in V]})
    got = pq_adc_topk(ray.data.from_pandas(df), query_ids=[5],
                      k=3, m=2, ncode=8)
    assert int(got.iloc[0]["nid"]) == 5
