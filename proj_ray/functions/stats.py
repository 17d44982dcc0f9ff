"""Distributed exact statistics over Ray Data datasets.

grouped_quantiles: EXACT discrete quantiles per group for fixed-point-
quantizable values (money, counts, quantized measurements), at scale.

Scale shape: instead of sorting each group's raw rows (unbounded group
memory at 100 TB), every batch partial-counts (group, quantized value)
pairs inside map_batches, a groupby sums those tiny histograms, and
the per-group quantile walk runs over DISTINCT values only. The
all-to-all moves O(groups x distinct values) partial rows — bounded by
the value domain, not the corpus. Quantile semantics match DuckDB's
quantile_disc: the element at 1-based sorted position ceil(q*n).
"""

from __future__ import annotations

import numpy as np


def grouped_quantiles(ds, group_col: str, value_col: str,
                      qs: tuple = (0.25, 0.5, 0.75),
                      scale: int = 100):
    """-> rows (group, q, quantile): exact discrete quantiles of
    value_col per group. `scale` is the fixed-point factor; values must
    be exact multiples of 1/scale for exactness (money at scale=100)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch):
        df = pd.DataFrame({
            group_col: np.asarray(batch[group_col]),
            "_v": np.rint(np.asarray(batch[value_col], dtype=np.float64)
                          * scale).astype(np.int64),
        })
        g = df.groupby([group_col, "_v"], sort=False,
                       as_index=False).size()
        g["n"] = g["size"].astype(np.int64)
        return g.drop(columns=["size"])

    hist = (ds.map_batches(partial, batch_format="numpy")
            .groupby([group_col, "_v"])
            .aggregate(Sum("n", alias_name="n_total")))

    qs_arr = np.asarray(qs, dtype=np.float64)

    def walk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("_v", kind="stable")
        counts = g["n_total"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        # 1-based position ceil(q*n), clamped to [1, n] (quantile_disc)
        pos = np.minimum(np.maximum(
            np.ceil(qs_arr * n).astype(np.int64), 1), n)
        idx = np.searchsorted(cum, pos, side="left")
        vals = g["_v"].to_numpy()[idx] / scale
        return pd.DataFrame({
            group_col: np.repeat(g[group_col].iloc[0], len(qs_arr)),
            "q": qs_arr,
            "quantile": vals,
        })

    return hist.groupby(group_col).map_groups(walk,
                                              batch_format="pandas")
