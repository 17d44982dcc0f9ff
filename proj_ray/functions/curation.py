"""The composed training-data curation pipeline — the flagship
"everything before tokenization" flow a 100-TB corpus actually runs:

  quality filter (Gopher rules)       stateless map, no exchange
  -> test-set decontamination         benchmark grams broadcast once;
     (drop docs sharing any n-gram)   stateless map, no exchange
  -> exact dedup (min doc_id wins)    ONE hash-bucket co-partition of
                                      per-block (text, min-id) partials
  -> sequence packing (concat-and-    distributed prefix sum (tiny
     chunk at seq_len)                offset vector on the driver)

Stages 1+2 are FUSED into a single map_batches fn so the corpus text
is read and tokenized once for both filters; after dedup only winner
rows move, and packing never shuffles text at all (functions/packing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .decontam import bench_gram_set, contaminated_mask
from .dedup import dedup_exact
from .packing import pack_sequences
from .text import gopher_signals

__all__ = ["curation_pipeline"]


def curation_pipeline(corpus_ds, bench_ds, id_col: str = "doc_id",
                      text_col: str = "text", n_gram: int = 4,
                      seq_len: int = 256, bucket_size: int = 1 << 10,
                      batch_size: int = 4096):
    """Run quality -> decontaminate -> dedup -> pack; returns the
    packed-sequence Dataset (seq_id, n_docs, min_doc, max_doc,
    n_tokens)."""
    import ray

    bench = bench_gram_set(bench_ds, text_col=text_col, n=n_gram)
    bref = ray.put(bench)

    def keep_clean_quality(df: pd.DataFrame) -> pd.DataFrame:
        texts = df[text_col].reset_index(drop=True)
        pos, sig = gopher_signals(texts)
        ok = np.zeros(len(df), dtype=bool)
        ok[pos[sig["passes"].to_numpy() == 1]] = True
        ok &= ~contaminated_mask(texts, ray.get(bref), n=n_gram)
        return df.iloc[np.flatnonzero(ok)][[id_col, text_col]]

    survivors = corpus_ds.map_batches(keep_clean_quality,
                                      batch_format="pandas",
                                      batch_size=batch_size)
    winners = dedup_exact(survivors, text_col, id_col)
    return pack_sequences(winners, id_col, text_col, seq_len=seq_len,
                          bucket_size=bucket_size)
