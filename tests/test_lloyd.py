"""Iterative Lloyd k-means: local-reference parity and partition
invariance under the integer contract."""

import numpy as np
import pandas as pd


def _local_lloyd(V, k, iters, scale=1_000_000):
    Q = np.floor(V * scale + 0.5).astype(np.int64)
    C = Q[:k].copy()
    cids = np.arange(k, dtype=np.int64)
    for _ in range(iters):
        dist = ((Q * Q).sum(1, keepdims=True) - 2 * (Q @ C.T)
                + (C * C).sum(1)[None, :])
        a = np.argmin(dist, axis=1)
        keep, n, sums = [], [], []
        for j in range(len(cids)):
            m = a == j
            if m.sum():
                keep.append(cids[j])
                n.append(int(m.sum()))
                sums.append(Q[m].sum(0))
        cids = np.asarray(keep, dtype=np.int64)
        n = np.asarray(n, dtype=np.int64)
        S = np.stack(sums)
        q = np.abs(S) // n[:, None]
        C = np.where(S >= 0, q, -q).astype(np.int64)
    w = np.arange(1, Q.shape[1] + 1, dtype=np.int64)
    return pd.DataFrame({"cid": cids, "n_vecs": n, "cchk": C @ w})


def test_lloyd_matches_local_reference(ray_session):
    import ray.data as rd

    from proj_ray.functions.ann import kmeans_lloyd

    rng = np.random.default_rng(5)
    V = rng.normal(size=(600, 64)) * 0.3
    df = pd.DataFrame({"vec_id": np.arange(600, dtype=np.int64),
                       "embedding": [row.astype(np.float32)
                                     for row in V]})
    got = kmeans_lloyd(rd.from_pandas(df).repartition(5), k=8, iters=3)
    # the engine quantizes float32-roundtripped values; mirror that
    exp = _local_lloyd(
        np.stack(df["embedding"].to_numpy()).astype(np.float64), 8, 3)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp, check_dtype=False)


def test_lloyd_partition_invariance(ray_session):
    import ray.data as rd

    from proj_ray.functions.ann import kmeans_lloyd

    rng = np.random.default_rng(11)
    V = rng.normal(size=(300, 64))
    df = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64),
                       "embedding": [row.astype(np.float32)
                                     for row in V]})
    a = kmeans_lloyd(rd.from_pandas(df).repartition(1), k=5, iters=2)
    b = kmeans_lloyd(rd.from_pandas(df).repartition(9), k=5, iters=2)
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
