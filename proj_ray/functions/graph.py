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
