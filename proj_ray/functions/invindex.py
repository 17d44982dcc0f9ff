"""Distributed inverted index (term -> posting list) over a corpus.

The missing sibling of the retrieval family (tfidf_topk ranks, ann.*
searches embeddings): build a TERM index once, then answer term
lookups by reading only the index partitions that can contain them.

Scale shape, mirroring ann.ivf_build / stages.knn_index:
- build: ONE tokenize pass emits each document's DISTINCT terms as
  (term, doc_id) pairs tagged with a term-hash bucket; a
  groupby(bucket) all-to-all co-partitions the pairs and each bucket
  writes ONE sorted parquet partition. What crosses the shuffle is
  (term, doc_id) pairs — never document text — and the output is
  resumable per-bucket (partitioned directories, no giant file).
- lookup: queried terms hash to buckets; ONLY those partitions are
  read (dictionary/row-group pruning on top via a parquet row filter).
  I/O scales with the query's bucket fan-out, not the corpus
  (asserted in pytest via bytes-read accounting).
- stats view (`inverted_index_stats`): per-term document frequency +
  integer posting checksums (sum/min/max of doc ids) computed with
  per-batch partial aggregation so the all-to-all moves one row per
  (batch, term) — the oracle-checked query surface (q79).

Tokenization contract: whitespace split on a single space, identical
to the q12/q59 oracles (`string_split(text, ' ')`).
"""

from __future__ import annotations

import os

import numpy as np

from proj_ray.functions.text import fingerprint64


def _pairs_batch(b: dict, text_col: str, id_col: str,
                 n_buckets: int) -> "object":
    """Distinct (term, doc) pairs of one batch, bucket-tagged."""
    import pandas as pd

    s = pd.Series(b[text_col])
    ids = pd.Series(np.asarray(b[id_col], dtype=np.int64))
    ex = s.str.split(" ").explode()
    pairs = pd.DataFrame({"doc_id": ids.reindex(ex.index).to_numpy(),
                          "term": ex.to_numpy(dtype=object)})
    pairs = pairs.drop_duplicates(ignore_index=True)
    bk = fingerprint64(pairs["term"].to_numpy(dtype=object)) % n_buckets
    pairs["bucket"] = bk
    return pairs


def build_inverted_index(ds, path: str, text_col: str = "text",
                         id_col: str = "doc_id", n_buckets: int = 64):
    """Build the bucket-partitioned posting index under `path`.

    Returns a pandas manifest (bucket, n_terms, n_postings, bytes).
    Size `n_buckets` so one bucket's postings fit a worker heap
    (thousands at web scale; the per-bucket write is the reducer).
    On a multi-node cluster `path` must be cluster-shared storage
    (NFS/S3-fuse) — writers and later lookups land on different
    nodes."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)

    def pairs(b: dict) -> "pd.DataFrame":
        return _pairs_batch(b, text_col, id_col, n_buckets)

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["bucket"].iloc[0])
        g = g.sort_values(["term", "doc_id"], ignore_index=True)
        part = os.path.join(path, f"bucket={bk:05d}")
        os.makedirs(part, exist_ok=True)
        f = os.path.join(part, "postings.parquet")
        pq.write_table(pa.table({
            "term": pa.array(g["term"], type=pa.string()),
            "doc_id": pa.array(g["doc_id"], type=pa.int64())}), f)
        return pd.DataFrame({
            "bucket": [bk],
            "n_terms": [int(g["term"].nunique())],
            "n_postings": [len(g)],
            "bytes": [os.path.getsize(f)]})

    man = (ds.select_columns([id_col, text_col])
           .map_batches(pairs, batch_format="numpy", batch_size=4096)
           .groupby("bucket")
           .map_groups(write_bucket, batch_format="pandas")
           .to_pandas())
    return man.sort_values("bucket", ignore_index=True)


def lookup_postings(path: str, terms, n_buckets: int = 64,
                    _stats: dict | None = None):
    """Postings of `terms`: reads ONLY the buckets the query terms
    hash to, with a parquet-level row filter inside each. Returns a
    pandas (term, doc_id) frame sorted by (term, doc_id)."""
    import pandas as pd
    import pyarrow.dataset as pads

    terms = list(terms)
    if not terms:
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "doc_id": pd.Series(dtype=np.int64)})
    bks = np.unique(
        fingerprint64(np.asarray(terms, dtype=object)) % n_buckets)
    frames = []
    bytes_read = 0
    for bk in bks:
        f = os.path.join(path, f"bucket={int(bk):05d}",
                         "postings.parquet")
        if not os.path.exists(f):
            continue
        bytes_read += os.path.getsize(f)
        t = pads.dataset(f).to_table(
            filter=pads.field("term").isin(terms))
        frames.append(t.to_pandas())
    if _stats is not None:
        total = 0
        for root, _dirs, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, x))
                         for x in files)
        _stats["bytes_read"] = bytes_read
        _stats["bytes_total"] = total
        _stats["buckets_read"] = len(bks)
    out = (pd.concat(frames, ignore_index=True) if frames else
           pd.DataFrame({"term": pd.Series(dtype=object),
                         "doc_id": pd.Series(dtype=np.int64)}))
    return out.sort_values(["term", "doc_id"], ignore_index=True)


def inverted_index_stats(ds, text_col: str = "text",
                         id_col: str = "doc_id", min_df: int = 1,
                         n_buckets: int = 64):
    """Per-term (df, id_sum, id_min, id_max) — the index's integrity
    view. Per-batch partials (each doc lives in exactly one batch, so
    partial dfs are disjoint and sum exactly) -> bucket co-partition
    -> vectorized within-bucket combine. One row per (batch, term)
    crosses the shuffle."""
    import pandas as pd

    def partial(b: dict) -> "pd.DataFrame":
        pairs = _pairs_batch(b, text_col, id_col, n_buckets)
        g = (pairs.groupby("term", as_index=False)
             .agg(df_p=("doc_id", "size"), sum_p=("doc_id", "sum"),
                  min_p=("doc_id", "min"), max_p=("doc_id", "max"),
                  bucket=("bucket", "first")))
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("term", as_index=False)
               .agg(df=("df_p", "sum"), id_sum=("sum_p", "sum"),
                    id_min=("min_p", "min"), id_max=("max_p", "max")))
        out = out[out["df"] >= min_df]
        for c in ("df", "id_sum", "id_min", "id_max"):
            out[c] = out[c].astype(np.int64)
        return out

    return (ds.select_columns([id_col, text_col])
            .map_batches(partial, batch_format="numpy",
                         batch_size=4096)
            .groupby("bucket")
            .map_groups(lambda g: combine(g.drop(columns=["bucket"])),
                        batch_format="pandas"))
