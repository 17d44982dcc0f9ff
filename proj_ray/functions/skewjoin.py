"""Skew-aware (salted) distributed hash join with fused aggregation.

Engine-added operator: the JOIN counterpart of the salted groupby the
north rule names ("skewed cells are salted and split explicitly").
The reference has no join engine; the analogous pattern there is the
per-point candidate fan-out in grid selection (src/grids.cpp) where a
hot area is served by several overlapping grids.

Problem shape: a fact table joined on a low-cardinality or Zipf key
sends every row of a hot key to ONE reducer — the classic straggler.
Fix: replicate the (small) matching dim rows S ways and spread each
hot key's fact rows across S salted partitions, so no reducer sees
more than ~|hot_key_rows|/S rows.

Scale shape (one all-to-all, bounded exchanges):
  census   bounded Misra-Gries partials per block (<= m rows each) ->
           one driver combine -> hot-key set. Any key with share
           > rows/m is guaranteed caught; false positives only add
           harmless replication.
  dim      ships per-key DISTINCT join attrs; hot keys replicated
           x S (dim rows for a hot key are few by construction —
           the key is hot on the FACT side).
  fact     each row tagged (bucket of (key, salt)); value pre-quantized
           to int64 fixed point so per-bucket partial sums are exact
           and order-free.
  join     per-bucket vectorized merge + partial groupby -> at most
           n_buckets x |groups| partial rows -> tiny driver combine.

Salt assignment uses each row's position within its batch — correctness
is salt-invariant (every salted partition holds the full dim row set
for its keys), so block-split changes cannot change the result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._hash import splitmix64, stable_u64
from .sketch import _mg_merge

__all__ = ["hot_keys", "salted_join_agg"]


def hot_keys(ds, col: str, threshold: int, m: int = 4096) -> set:
    """Bounded one-pass census: keys whose frequency MAY exceed
    `threshold` (Misra-Gries upper bound — superset of the true hot
    set, never misses a key with count > n/m + threshold)."""

    def batch_summary(b: dict) -> dict:
        kk, cc, dec = _mg_merge(np.asarray(b[col]),
                                np.ones(len(b[col]), dtype=np.int64), m)
        return {col: kk, "_c": cc,
                "_dec": np.r_[np.int64(dec),
                              np.zeros(max(len(kk) - 1, 0), np.int64)]
                if len(kk) else np.empty(0, np.int64)}

    parts = ds.map_batches(batch_summary, batch_format="numpy").to_pandas()
    if not len(parts):
        return set()
    kk, cc, dec = _mg_merge(parts[col].to_numpy(),
                            parts["_c"].to_numpy(np.int64), m)
    dec += int(parts["_dec"].sum())
    # upper bound = estimate + total decrement absorbed by the sketch
    return set(np.asarray(kk)[cc + dec >= threshold].tolist())


def _bucket_of(keys: np.ndarray, salts: np.ndarray,
               n_buckets: int) -> np.ndarray:
    h = stable_u64(keys) ^ splitmix64(salts.astype(np.uint64))
    return (h % np.uint64(n_buckets)).astype(np.int64)


def salted_join_agg(fact_ds, dim_ds, fact_key: str, dim_key: str,
                    group_col: str, value_col: str, scale: int = 100,
                    salt: int = 8, hot_threshold: int | None = None,
                    n_buckets: int = 64, m: int = 4096) -> pd.DataFrame:
    """fact JOIN dim ON fact_key = dim_key, GROUP BY dim.group_col ->
    pandas (group_col, n, sum_value_q) with sum_value_q =
    SUM(floor(value*scale + 0.5)) as exact int64.

    Keys whose fact-side frequency may exceed `hot_threshold` (default:
    2x the uniform share) are salted `salt` ways; their dim rows are
    replicated once per salt so every salted partition can join
    locally. One all-to-all total."""
    import ray

    n_fact = fact_ds.count()
    if hot_threshold is None:
        # anything above ~2x the uniform per-bucket share is "hot"
        hot_threshold = max(2 * n_fact // max(n_buckets, 1), 1)
    hot = hot_keys(fact_ds, fact_key, hot_threshold, m=m)
    hot_ref = ray.put(hot)
    salt = max(int(salt), 1)

    def tag_fact(b: dict) -> pd.DataFrame:
        keys = np.asarray(b[fact_key])
        vq = np.floor(np.asarray(b[value_col], dtype=np.float64)
                      * scale + 0.5).astype(np.int64)
        hset = ray.get(hot_ref)
        is_hot = (pd.Index(keys).isin(hset) if hset
                  else np.zeros(len(keys), dtype=bool))
        salts = np.where(is_hot, np.arange(len(keys)) % salt, 0)
        return pd.DataFrame({
            "_k": keys, "_s": salts.astype(np.int64), "_vq": vq,
            "_side": np.int64(1), "_g": "",
            "_bk": _bucket_of(keys, salts, n_buckets)})

    def tag_dim(b: dict) -> pd.DataFrame:
        df = pd.DataFrame({dim_key: b[dim_key], group_col: b[group_col]})
        df = df.drop_duplicates(subset=[dim_key])
        keys = df[dim_key].to_numpy()
        hset = ray.get(hot_ref)
        is_hot = (pd.Index(keys).isin(hset) if hset
                  else np.zeros(len(keys), dtype=bool))
        reps = np.where(is_hot, salt, 1)
        idx = np.repeat(np.arange(len(df)), reps)
        # salt s in [0, reps_i) per replica
        offs = np.arange(len(idx)) - np.repeat(
            np.cumsum(reps) - reps, reps)
        out = pd.DataFrame({
            "_k": keys[idx], "_s": offs.astype(np.int64),
            "_vq": np.int64(0), "_side": np.int64(0),
            "_g": df[group_col].to_numpy()[idx].astype(str),
            "_bk": _bucket_of(keys[idx], offs, n_buckets)})
        return out

    fact = fact_ds.map_batches(tag_fact, batch_format="numpy")
    dim = dim_ds.map_batches(tag_dim, batch_format="numpy")

    def join_agg(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["_side"] == 0]
        f = g[g["_side"] == 1]
        if not len(d) or not len(f):
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "sum_value_q": pd.Series([], dtype=np.int64)})
        # join on (key, salt): two replicas of one key can hash-collide
        # into the same bucket, so the salt must disambiguate them
        j = f[["_k", "_s", "_vq"]].merge(
            d[["_k", "_s", "_g"]], on=["_k", "_s"], how="inner")
        agg = j.groupby("_g", sort=False).agg(
            n=("_vq", "size"), sum_value_q=("_vq", "sum"))
        agg.index.name = group_col
        out = agg.reset_index()
        out["n"] = out["n"].astype(np.int64)
        out["sum_value_q"] = out["sum_value_q"].astype(np.int64)
        return out

    parts = fact.union(dim).groupby("_bk").map_groups(
        join_agg, batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "sum_value_q": pd.Series([], dtype=np.int64)})
    out = parts.groupby(group_col, sort=True).agg(
        n=("n", "sum"), sum_value_q=("sum_value_q", "sum")).reset_index()
    out["n"] = out["n"].astype(np.int64)
    out["sum_value_q"] = out["sum_value_q"].astype(np.int64)
    return out
