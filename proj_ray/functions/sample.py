"""Deterministic stratified sampling over Ray Data datasets.

Engine-added operator (no reference counterpart): take n rows per
stratum, chosen by a deterministic integer mixing key so the result is
reproducible run-to-run AND SQL-expressible (the driver oracle ranks by
the same `(id * 2654435761) % 2^32` Knuth multiplicative hash).

Scale shape: each batch PRE-PRUNES to its local n-smallest keys per
stratum inside map_batches, so the single all-to-all moves at most
n × strata × blocks rows instead of the corpus; the per-stratum final
pick is a tiny vectorized partial sort. No row-wise Python anywhere.
"""

from __future__ import annotations

import numpy as np

_KNUTH = 2654435761  # Knuth multiplicative-hash constant (2^32 * phi)
_MOD = 4294967296


def _mix(ids: np.ndarray) -> np.ndarray:
    """(id * 2654435761) mod 2^32 — identical in int64 SQL as long as
    id < 2^31 (no signed overflow); ids are reduced mod 2^32 first so
    the contract holds for any int64 id."""
    a = np.asarray(ids, dtype=np.int64) % _MOD
    return (a * _KNUTH) % _MOD


def stratified_sample(ds, stratum_col: str, id_col: str, n: int,
                      extra_cols: tuple = ()):
    """n rows per stratum, the ones with the smallest mixing key
    (ties -> smallest id). Returns the sampled rows with their stratum.
    """
    import pandas as pd

    need = list(dict.fromkeys([stratum_col, id_col, *extra_cols]))

    def prune(batch):
        df = pd.DataFrame({c: np.asarray(batch[c]) for c in need})
        df["_k"] = _mix(df[id_col].to_numpy())
        df = df.sort_values(["_k", id_col], kind="stable")
        return df.groupby(stratum_col, sort=False).head(n)

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["_k", id_col], kind="stable").head(n)
        return g.drop(columns=["_k"])

    return (ds.select_columns(need)
            .map_batches(prune, batch_format="numpy")
            .groupby(stratum_col)
            .map_groups(pick, batch_format="pandas"))


def top_k_per_group(ds, group_col: str, value_col: str, id_col: str,
                    k: int, ascending: bool = False,
                    extra_cols: tuple = ()):
    """k rows per group with the largest (default) / smallest values;
    ties broken by smallest id (SQL: ROW_NUMBER() OVER (PARTITION BY g
    ORDER BY v [DESC], id) <= k).

    Scale shape: identical to stratified_sample — each batch pre-prunes
    to its local k per group inside map_batches, the single all-to-all
    moves at most k x groups x blocks rows, the final per-group pick is
    a tiny sort."""
    import pandas as pd

    need = list(dict.fromkeys([group_col, value_col, id_col,
                               *extra_cols]))

    def order(df):
        return df.sort_values(
            [value_col, id_col], kind="stable",
            ascending=[ascending, True])

    def prune(batch):
        df = pd.DataFrame({c: np.asarray(batch[c]) for c in need})
        return order(df).groupby(group_col, sort=False).head(k)

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        return order(group).head(k)

    return (ds.select_columns(need)
            .map_batches(prune, batch_format="numpy")
            .groupby(group_col)
            .map_groups(pick, batch_format="pandas"))
