"""Similarity search over an embedding column (list<float>).

- `ann_brute`: exact cosine top-k — query matrix broadcast once
  (`ray.put`), per-batch numpy matmul + partial top-k, small global
  merge. The baseline.
- `ann_ivf`: IVF-style scale path — k-means coarse centroids trained on
  a sample, vectors routed to their nearest centroid list (the shuffle
  key), queries probe only `nprobe` lists.
"""

from __future__ import annotations

import numpy as np


def _as_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    return M / np.where(n == 0, 1.0, n)


def ann_brute(ds, queries: np.ndarray, k: int = 10,
              vec_col: str = "embedding", id_col: str = "vec_id",
              batch_size: int = 8192):
    """Exact cosine top-k. Returns pandas DataFrame
    (q, nid, cosine, rank)."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(Q)

    def local(batch):
        import pandas as pd

        Qm = ray.get(qref)
        V = _normalize(_as_matrix(batch[vec_col]))
        ids = np.asarray(batch[id_col])
        sims = Qm @ V.T  # (nq, n)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        nq = Qm.shape[0]
        return pd.DataFrame({
            "q": np.repeat(np.arange(nq, dtype=np.int64), kk),
            "nid": ids[part].ravel(),
            "cosine": sims[np.arange(nq)[:, None], part].ravel(),
        })

    cand = ds.map_batches(local, batch_format="numpy",
                          batch_size=batch_size)
    import pandas as pd

    frames = [b for b in cand.iter_batches(batch_format="pandas")]
    allc = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame(columns=["q", "nid", "cosine"])
    allc = (allc.sort_values(["q", "cosine", "nid"],
                             ascending=[True, False, True])
                .groupby("q").head(k))
    allc["rank"] = allc.groupby("q").cumcount() + 1
    return allc.reset_index(drop=True)


def train_centroids(ds, vec_col: str = "embedding", n_centroids: int = 64,
                    sample: int = 10000, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Driver-side k-means on a bounded sample (the only materialized
    piece; centroids are tiny and broadcast afterwards)."""
    rows = ds.limit(sample).take_all()
    X = _normalize(np.stack([np.asarray(r[vec_col], dtype=np.float64)
                             for r in rows]))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for ci in range(len(C)):
            m = assign == ci
            if m.any():
                v = X[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[ci] = v / n
    return C


def ann_ivf(ds, queries: np.ndarray, k: int = 10, centroids=None,
            nprobe: int = 4, vec_col: str = "embedding",
            id_col: str = "vec_id", batch_size: int = 8192):
    """IVF cosine top-k: route vectors to their centroid list, probe only
    the nprobe closest lists per query. Approximate; recall grows with
    nprobe. Returns DataFrame (q, nid, cosine, rank)."""
    import ray

    if centroids is None:
        centroids = train_centroids(ds, vec_col=vec_col)
    C = np.asarray(centroids, dtype=np.float64)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cref = ray.put(C)
    pref = ray.put(probe)
    qref = ray.put(Q)

    def local(batch):
        import pandas as pd

        Cm = ray.get(cref)
        Qm = ray.get(qref)
        Pm = ray.get(pref)
        V = _normalize(_as_matrix(batch[vec_col]))
        ids = np.asarray(batch[id_col])
        lists = np.argmax(V @ Cm.T, axis=1)  # list id per vector
        out_q = []
        out_id = []
        out_sim = []
        nq = Qm.shape[0]
        for qi in range(nq):
            m = np.isin(lists, Pm[qi])
            if not m.any():
                continue
            sims = Qm[qi] @ V[m].T
            kk = min(k, sims.shape[0])
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[m][part])
            out_sim.append(sims[part])
        if not out_q:
            return pd.DataFrame(columns=["q", "nid", "cosine"])
        return pd.DataFrame({
            "q": np.concatenate(out_q),
            "nid": np.concatenate(out_id),
            "cosine": np.concatenate(out_sim),
        })

    cand = ds.map_batches(local, batch_format="numpy",
                          batch_size=batch_size)
    import pandas as pd

    frames = [b for b in cand.iter_batches(batch_format="pandas")]
    allc = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame(columns=["q", "nid", "cosine"])
    allc = (allc.sort_values(["q", "cosine", "nid"],
                             ascending=[True, False, True])
                .groupby("q").head(k))
    allc["rank"] = allc.groupby("q").cumcount() + 1
    return allc.reset_index(drop=True)
