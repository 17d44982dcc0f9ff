"""Distributed connected components (min-label propagation).

The clustering step of a near-duplicate pipeline: dup PAIRS (from
MinHash/SimHash/embedding verify stages) become edges; each connected
component keeps one canonical document. Labels converge to the
component-minimum node id in O(graph diameter) iterations.

Scale shape per iteration: two hash-bucket all-to-alls (propagate
messages along edges co-partitioned with labels, then per-node min) —
never a driver-side graph. Labels (one row per node) are materialized
between iterations so iteration k+1 does not re-execute k's lineage;
that is O(nodes), bounded, and the standard iterative-dataflow trade.
Convergence is detected with a monotone aggregate: sum(label) strictly
decreases until the fixpoint, so one cheap Sum per iteration replaces
a change-count join.
"""
from __future__ import annotations

import numpy as np


def _bucket(arr: np.ndarray, nb: int) -> np.ndarray:
    a = np.asarray(arr, dtype=np.int64)
    return (a % nb + nb) % nb


def connected_components(edges, max_iters: int = 30,
                         n_buckets: int = 32):
    """edges: Dataset with int64 columns `a`, `b` (undirected; self
    loops fine). Returns a Dataset (node, label) with label = min node
    id of the component."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def both_dirs(b: dict) -> dict:
        a = np.asarray(b["a"], dtype=np.int64)
        bb = np.asarray(b["b"], dtype=np.int64)
        return {"src": np.concatenate([a, bb]),
                "dst": np.concatenate([bb, a])}

    ed = edges.map_batches(both_dirs, batch_format="numpy",
                           batch_size=65536).materialize()

    def init_labels(b: dict) -> dict:
        n = np.unique(np.asarray(b["src"], dtype=np.int64))
        return {"node": n, "label": n, "_bk": _bucket(n, n_buckets)}

    def min_per_node(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["label"].min()
        out["label"] = out["label"].astype(np.int64)
        return out

    labels = (ed.map_batches(init_labels, batch_format="numpy",
                             batch_size=65536)
              .groupby("_bk")
              .map_groups(lambda g: min_per_node(
                  g.drop(columns=["_bk"])), batch_format="pandas")
              .materialize())

    def tag_edges(b: dict) -> dict:
        return {"src": b["src"], "dst": b["dst"],
                "_bk": _bucket(b["src"], n_buckets)}

    edb = ed.map_batches(tag_edges, batch_format="numpy",
                         batch_size=65536).materialize()

    def tag_labels(b: dict) -> dict:
        return {"node": b["node"], "label": b["label"],
                "_bk": _bucket(b["node"], n_buckets)}

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        """One bucket: edges with src in bucket + labels for those
        nodes; emit (node=dst, candidate label) messages plus the
        nodes' own labels."""
        lab = g[g["dst"].isna()][["node", "label"]]
        ed_ = g[~g["dst"].isna()][["node", "dst"]].rename(
            columns={"node": "src"})
        m = ed_.merge(lab, left_on="src", right_on="node")
        out = pd.concat([
            lab,
            pd.DataFrame({"node": m["dst"].to_numpy(np.int64),
                          "label": m["label"].to_numpy(np.int64)}),
        ], ignore_index=True)
        out["_bk"] = _bucket(out["node"].to_numpy(), n_buckets)
        return out

    prev_sum = None
    for _ in range(max_iters):
        def lbl_rows(b: dict) -> dict:
            return {"node": np.asarray(b["node"], dtype=np.int64),
                    "dst": np.full(len(b["node"]), np.nan),
                    "label": np.asarray(b["label"], dtype=np.int64),
                    "_bk": _bucket(b["node"], n_buckets)}

        def edge_rows(b: dict) -> dict:
            return {"node": np.asarray(b["src"], dtype=np.int64),
                    "dst": np.asarray(b["dst"], dtype=np.float64),
                    "label": np.zeros(len(b["src"]), dtype=np.int64),
                    "_bk": np.asarray(b["_bk"], dtype=np.int64)}

        mixed = (labels.map_batches(lbl_rows, batch_format="numpy",
                                    batch_size=65536)
                 .union(edb.map_batches(edge_rows,
                                        batch_format="numpy",
                                        batch_size=65536)))
        labels = (mixed.groupby("_bk")
                  .map_groups(lambda g: propagate(
                      g.drop(columns=["_bk"])), batch_format="pandas")
                  .groupby("_bk")
                  .map_groups(lambda g: min_per_node(
                      g.drop(columns=["_bk"])), batch_format="pandas")
                  .materialize())
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    return labels


def pagerank(edges, iters: int = 5, scale: int = 1_000_000,
             d_pct: int = 85, n_buckets: int = 32):
    """Fixed-iteration PageRank in integer fixed-point (rank scale
    `scale`, damping d_pct/100), so a SQL oracle of chained CTEs is
    bit-exact:

        contrib(u)  = r(u) // outdeg(u)
        r'(v)       = scale*(100-d_pct)//100
                      + (d_pct * sum_{u->v} contrib(u)) // 100

    Dangling nodes contribute nothing (the standard simplification,
    mirrored in the oracle). edges: Dataset (src:int64, dst:int64),
    directed, multi-edges counted.

    Scale shape per iteration (same dataflow as connected_components):
    TWO hash-bucket all-to-alls — ranks co-partitioned with edges by
    src bucket to emit (dst, contrib) messages, then per-node sum by
    dst bucket — never a driver-side graph; ranks (one row per node)
    are materialized between iterations to cut lineage. Returns a
    Dataset (node, r)."""
    import pandas as pd

    teleport = scale * (100 - d_pct) // 100

    def tag_edges(b: dict) -> dict:
        s = np.asarray(b["src"], dtype=np.int64)
        return {"src": s, "dst": np.asarray(b["dst"], dtype=np.int64),
                "_bk": _bucket(s, n_buckets)}

    ed = edges.map_batches(tag_edges, batch_format="numpy",
                           batch_size=65536).materialize()

    # outdegree, attached to each edge once (per-bucket, vectorized)
    def outdeg_join(g: pd.DataFrame) -> pd.DataFrame:
        o = g.groupby("src")["dst"].size().rename("out")
        g = g.merge(o, left_on="src", right_index=True)
        g["out"] = g["out"].astype(np.int64)
        return g

    edo = (ed.groupby("_bk")
           .map_groups(outdeg_join, batch_format="pandas")
           .materialize())

    def node_rows(b: dict) -> dict:
        n = np.unique(np.concatenate(
            [np.asarray(b["src"], dtype=np.int64),
             np.asarray(b["dst"], dtype=np.int64)]))
        return {"node": n, "_bk": _bucket(n, n_buckets)}

    def dedup_nodes(g: pd.DataFrame) -> pd.DataFrame:
        n = np.unique(g["node"].to_numpy(np.int64))
        return pd.DataFrame({"node": n})

    nodes = (ed.map_batches(node_rows, batch_format="numpy",
                            batch_size=65536)
             .groupby("_bk").map_groups(
                 lambda g: dedup_nodes(g.drop(columns=["_bk"])),
                 batch_format="pandas")
             .materialize())

    def init_ranks(b: dict) -> dict:
        n = np.asarray(b["node"], dtype=np.int64)
        return {"node": n, "r": np.full(len(n), scale, dtype=np.int64),
                "_bk": _bucket(n, n_buckets)}

    ranks = nodes.map_batches(init_ranks, batch_format="numpy",
                              batch_size=65536).materialize()

    def rank_msg_rows(b: dict) -> dict:
        n = np.asarray(b["node"], dtype=np.int64)
        return {"src": n, "dst": np.full(len(n), -1, dtype=np.int64),
                "out": np.zeros(len(n), dtype=np.int64),
                "r": np.asarray(b["r"], dtype=np.int64),
                "_bk": np.asarray(b["_bk"], dtype=np.int64)}

    def edge_msg_rows(b: dict) -> dict:
        return {"src": np.asarray(b["src"], dtype=np.int64),
                "dst": np.asarray(b["dst"], dtype=np.int64),
                "out": np.asarray(b["out"], dtype=np.int64),
                "r": np.zeros(len(b["src"]), dtype=np.int64),
                "_bk": np.asarray(b["_bk"], dtype=np.int64)}

    def contribs(g: pd.DataFrame) -> pd.DataFrame:
        """One src bucket: join this bucket's ranks onto its edges and
        emit (node=dst, c=r//out) messages, re-bucketed by dst."""
        lab = g[g["dst"] < 0][["src", "r"]]
        e = g[g["dst"] >= 0][["src", "dst", "out"]]
        m = e.merge(lab, on="src")
        c = (m["r"].to_numpy(np.int64)
             // np.maximum(m["out"].to_numpy(np.int64), 1))
        d = m["dst"].to_numpy(np.int64)
        return pd.DataFrame({"node": d, "c": c,
                             "_bk": _bucket(d, n_buckets)})

    def zero_msgs(df: pd.DataFrame) -> pd.DataFrame:
        # pandas in/out so the union with the map_groups (pandas-block)
        # message dataset keeps one block type
        n = df["node"].to_numpy(np.int64)
        return pd.DataFrame({"node": n,
                             "c": np.zeros(len(n), dtype=np.int64),
                             "_bk": _bucket(n, n_buckets)})

    def new_ranks(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("node", as_index=False)["c"].sum()
        n = s["node"].to_numpy(np.int64)
        r = teleport + d_pct * s["c"].to_numpy(np.int64) // 100
        return pd.DataFrame({"node": n, "r": r,
                             "_bk": _bucket(n, n_buckets)})

    for _ in range(iters):
        msgs = (ranks.map_batches(rank_msg_rows, batch_format="numpy",
                                  batch_size=65536)
                .union(edo.map_batches(edge_msg_rows,
                                       batch_format="numpy",
                                       batch_size=65536))
                .groupby("_bk")
                .map_groups(lambda g: contribs(g.drop(columns=["_bk"])),
                            batch_format="pandas"))
        # zero-in-degree nodes keep a row via zero messages
        ranks = (msgs.union(nodes.map_batches(zero_msgs,
                                              batch_format="pandas",
                                              batch_size=65536))
                 .groupby("_bk")
                 .map_groups(lambda g: new_ranks(
                     g.drop(columns=["_bk"])), batch_format="pandas")
                 .materialize())

    return ranks.drop_columns(["_bk"])


def pagerank_numpy(src: np.ndarray, dst: np.ndarray, iters: int = 5,
                   scale: int = 1_000_000, d_pct: int = 85):
    """Driver-side PageRank on the same integer fixed-point recurrence
    as `pagerank` (bit-identical results — pytest-enforced): the
    under-cap fast path for graphs whose EDGE LIST fits the driver,
    per the repo's cap-with-distributed-fallback convention. Returns
    (nodes, ranks) int64 arrays."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    src_i = np.searchsorted(nodes, src)
    dst_i = np.searchsorted(nodes, dst)
    outdeg = np.bincount(src_i, minlength=len(nodes)).astype(np.int64)
    teleport = scale * (100 - d_pct) // 100
    r = np.full(len(nodes), scale, dtype=np.int64)
    for _ in range(iters):
        contrib = r[src_i] // outdeg[src_i]
        sums = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(sums, dst_i, contrib)
        r = teleport + d_pct * sums // 100
    return nodes, r
