"""Deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes:
  - exact: hash-partition on the key (groupby) + per-group min — the
    shuffle moves only (key, id) pairs after a projection.
  - MinHash-LSH: per-batch signature computation (vectorized), band
    buckets as the groupby key (shingle -> minhash -> band -> bucket
    groupby), candidate pairs verified with exact Jaccard inside
    map_groups. No all-pairs comparison ever happens.
  - SimHash: 64-bit signatures, near-dup = hamming distance <= t within
    bucket groups keyed by bit-band.
  - embedding cosine: LSH random-hyperplane buckets then exact cosine.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _stable_u64(strings) -> np.ndarray:
    """Deterministic 64-bit hash per string (blake2b, process-stable)."""
    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        out[i] = np.frombuffer(
            hashlib.blake2b(str(s).encode(), digest_size=8).digest(),
            dtype=np.uint64)[0]
    return out


# ------------------------------------------------------------- exact ------


def dedup_exact(ds, key_col: str, id_col: str):
    """Keep exactly one row (min id) per duplicate group of `key_col`.

    Pattern: project to (key, id) -> groupby(key).min(id) -> the winner
    set is small; callers can semi-join it back to fetch full rows.
    Returns a Dataset of (key_col, id_col) winners.
    """
    from ray.data.aggregate import Min

    return (ds.select_columns([key_col, id_col])
              .groupby(key_col)
              .aggregate(Min(id_col, alias_name=id_col)))


def dedup_exact_rows(ds, key_col: str, id_col: str):
    """Full-row variant: per-group first row by id (map_groups)."""

    def first(g):
        return g.sort_values(id_col).head(1)

    return ds.groupby(key_col).map_groups(first, batch_format="pandas")


# ---------------------------------------------------------- shingling -----


def _shingles(text: str, k: int = 5) -> np.ndarray:
    b = text.encode("utf-8", errors="ignore")
    if len(b) <= k:
        # blake2b, not builtin hash(): PYTHONHASHSEED salts hash(bytes)
        # per process, which would give identical short docs different
        # band keys on different Ray workers.
        h = np.frombuffer(hashlib.blake2b(b, digest_size=8).digest(),
                          dtype=np.uint64)[0]
        return np.array([h & np.uint64(0x7FFFFFFFFFFFFFFF)],
                        dtype=np.uint64)
    # rolling window hashes, vectorized over byte windows
    arr = np.frombuffer(b, dtype=np.uint8)
    n = len(arr) - k + 1
    windows = np.lib.stride_tricks.sliding_window_view(arr, k)
    mult = np.array([31 ** (k - 1 - j) for j in range(k)], dtype=np.uint64)
    return (windows.astype(np.uint64) * mult[None, :]).sum(axis=1)[:n]


_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Per-actor state: the (a, b) permutation tables, built once."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5,
                 bands: int = 16, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm,
                              dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm,
                              dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        # (num_perm, n_shingles) permuted hash, take min
        with np.errstate(over="ignore"):
            h = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return h.min(axis=1)

    def band_keys(self, sig: np.ndarray) -> list[int]:
        keys = []
        for bi in range(self.bands):
            chunk = sig[bi * self.rows_per_band:(bi + 1) * self.rows_per_band]
            digest = hashlib.blake2b(chunk.tobytes(), digest_size=8,
                                     salt=bi.to_bytes(8, "little")).digest()
            keys.append(int.from_bytes(digest, "little") & 0x7FFFFFFFFFFFFFF)
        return keys


def jaccard_ngrams(a: str, b: str, k: int = 5) -> float:
    sa = set(_shingles(a, k).tolist())
    sb = set(_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def dedup_minhash_lsh(ds, text_col: str, id_col: str,
                      threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16, concurrency=(2, 8),
                      bucket_cap: int = 4096):
    """Near-duplicate pairs via MinHash LSH.

    Scale shape: the band shuffle moves only (band_key, rid) — ~10 B/row
    × bands, never the document text. Candidate pairs come from bucket
    collisions (deduped across bands), and only then is each candidate
    pair's text fetched ONCE via an id-keyed join for the exact n-gram
    Jaccard verify. Oversized buckets (> bucket_cap) are split
    deterministically by rid hash, bounding the O(b²) pair expansion —
    a documented recall trade on pathological buckets.

    Returns a Dataset of {id_a, id_b, jaccard} with jaccard >= threshold.
    """
    import pandas as pd

    class Signer:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm, bands=bands)

        def __call__(self, batch):
            ids = np.asarray(batch[id_col])
            texts = batch[text_col]
            keys = np.empty((len(ids), bands), dtype=np.int64)
            for i, t in enumerate(texts):
                keys[i] = self.mh.band_keys(self.mh.signature(str(t)))
            return {"band": keys.ravel(),
                    "rid": np.repeat(ids, bands)}

    sigs = ds.map_batches(Signer, batch_format="numpy",
                          batch_size=1024, concurrency=concurrency)

    def bucket_pairs(group):
        ids = np.unique(group["rid"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        chunks = [ids]
        if len(ids) > bucket_cap:
            nsub = -(-len(ids) // bucket_cap)
            sub = _stable_u64([str(i) for i in ids]) % np.uint64(nsub)
            chunks = [ids[sub == s] for s in range(nsub)]
        out_a, out_b = [], []
        for c in chunks:
            if len(c) < 2:
                continue
            iu = np.triu_indices(len(c), k=1)
            out_a.append(c[iu[0]])
            out_b.append(c[iu[1]])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": []})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    pairs = sigs.groupby("band").map_groups(bucket_pairs,
                                            batch_format="pandas")

    def distinct(batch):
        return batch.drop_duplicates(["id_a", "id_b"]) if len(batch) else \
            pd.DataFrame({"id_a": [], "id_b": []})

    # a pair colliding in several bands must be verified once
    pairs = pairs.groupby("id_a").map_groups(distinct,
                                             batch_format="pandas")
    return _verify_pairs_exact(ds, pairs, text_col, id_col, threshold)


def _verify_pairs_exact(docs, pairs, text_col: str, id_col: str,
                        threshold: float, shingle_k: int = 5):
    """Attach each candidate pair's two texts by id (one groupby on the
    id — each text crosses the wire once per pair-participation, not per
    band) and keep pairs with exact n-gram Jaccard >= threshold."""
    import pandas as pd

    def pair_requests(batch):
        a = batch["id_a"].to_numpy()
        b = batch["id_b"].to_numpy()
        return pd.DataFrame({
            "key": np.concatenate([a, b]),
            "id_a": np.concatenate([a, a]),
            "id_b": np.concatenate([b, b]),
            "side": np.concatenate([np.zeros(len(a), np.int8),
                                    np.ones(len(b), np.int8)]),
            "text": np.full(2 * len(a), "", dtype=object),
        })

    def doc_rows(batch):
        ids = np.asarray(batch[id_col])
        return pd.DataFrame({
            "key": ids,
            "id_a": ids,           # unused for side=-1 rows
            "id_b": ids,
            "side": np.full(len(ids), -1, dtype=np.int8),
            "text": np.asarray(batch[text_col], dtype=object),
        })

    req = pairs.map_batches(pair_requests, batch_format="pandas")
    src = docs.map_batches(doc_rows, batch_format="numpy")
    both = req.union(src)

    def attach(group):
        texts = group[group["side"] == -1]
        if len(texts) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "side": [],
                                 "text": []})
        t = texts["text"].iloc[0]
        g = group[group["side"] >= 0]
        return pd.DataFrame({"id_a": g["id_a"].to_numpy(),
                             "id_b": g["id_b"].to_numpy(),
                             "side": g["side"].to_numpy(),
                             "text": np.full(len(g), t, dtype=object)})

    sided = both.groupby("key").map_groups(attach, batch_format="pandas")

    def judge(group):
        if len(group) != 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        g = group.sort_values("side")
        jac = jaccard_ngrams(str(g["text"].iloc[0]), str(g["text"].iloc[1]),
                             k=shingle_k)
        if jac < threshold:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        return pd.DataFrame({"id_a": [g["id_a"].iloc[0]],
                             "id_b": [g["id_b"].iloc[0]],
                             "jaccard": [jac]})

    return sided.groupby(["id_a", "id_b"]).map_groups(
        judge, batch_format="pandas")


# ------------------------------------------------------------- simhash ----


def simhash64(texts, k: int = 4) -> np.ndarray:
    """64-bit SimHash of character k-gram hashes, batch-vectorized.

    All documents' shingle hashes are concatenated, unpacked to a
    (total_shingles, 64) bit matrix in one pass, per-document bit votes
    reduced with `np.add.reduceat`, and the sign vector repacked with
    `np.packbits` — no per-bit Python loop.
    """
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    shingle_sets = [_shingles(str(t), k) for t in texts]
    lens = np.array([len(s) for s in shingle_sets], dtype=np.int64)
    cat = np.concatenate(shingle_sets).astype("<u8")
    cat_bytes = cat.view(np.uint8).reshape(-1, 8)  # little-endian bytes
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    # per-doc per-bit one-counts via byte histograms: for each of the 8
    # byte positions, bincount (doc, byte value) then expand the 256
    # byte values to their 8 bit columns with one tiny matmul — avoids
    # materializing a (total_shingles, 64) bit matrix.
    byte_bits = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                              axis=1, bitorder="little").astype(np.int64)
    votes = np.empty((n, 64), dtype=np.int64)
    base = doc_idx << 8
    for p in range(8):
        hist = np.bincount(base + cat_bytes[:, p],
                           minlength=n * 256).reshape(n, 256)
        ones = hist @ byte_bits  # (n, 8) one-counts for bits 8p..8p+7
        votes[:, 8 * p:8 * p + 8] = 2 * ones - lens[:, None]
    pos = (votes > 0).astype(np.uint8)
    packed = np.packbits(pos, axis=1, bitorder="little")
    return np.ascontiguousarray(packed).view("<u8").ravel().view(np.int64)


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """SWAR popcount of a^b — 6 vector ops, no 64-iteration loop."""
    x = (np.asarray(a).astype(np.int64).view(np.uint64)
         ^ np.asarray(b).astype(np.int64).view(np.uint64))
    x = x - ((x >> np.uint64(1)) & _M1)
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    with np.errstate(over="ignore"):
        return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def dedup_simhash(ds, text_col: str, id_col: str, max_hamming: int = 3,
                  concurrency=(2, 8)):
    """Near-dup pairs with SimHash: 4 16-bit bands as bucket keys (any
    pair within hamming<=3 of 64 bits shares at least one exact band)."""

    def sign(batch):
        import pandas as pd

        sh = simhash64([str(t) for t in batch[text_col]])
        hu = sh.view(np.uint64)
        ids = np.asarray(batch[id_col])
        keys = np.concatenate([
            (((hu >> np.uint64(band * 16)) & np.uint64(0xFFFF))
             .astype(np.int64) | np.int64(band << 16))
            for band in range(4)])
        return pd.DataFrame({"band": keys,
                             "rid": np.tile(ids, 4),
                             "simhash": np.tile(sh, 4)})

    sigs = ds.map_batches(sign, batch_format="pandas", batch_size=2048)

    def verify(group):
        import pandas as pd

        g = group.drop_duplicates("rid").sort_values("rid")
        ids = g["rid"].to_numpy()
        hs = g["simhash"].to_numpy()
        out = []
        for i in range(len(ids)):
            if i + 1 < len(ids):
                d = hamming64(np.full(len(ids) - i - 1, hs[i]), hs[i + 1:])
                for joff in np.flatnonzero(d <= max_hamming):
                    out.append((ids[i], ids[i + 1 + joff],
                                int(d[joff])))
        return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])

    pairs = sigs.groupby("band").map_groups(verify, batch_format="pandas")

    def distinct(batch):
        import pandas as pd

        return batch.drop_duplicates(["id_a", "id_b"]) if len(batch) else \
            pd.DataFrame(columns=["id_a", "id_b", "hamming"])

    return pairs.groupby("id_a").map_groups(distinct, batch_format="pandas")


# ------------------------------------------------- embedding near-dup -----


def dedup_embedding(ds, vec_col: str, id_col: str, threshold: float = 0.95,
                    nbits: int | None = None, seed: int = 42,
                    dim: int | None = None, concurrency=(2, 8),
                    target_bucket: int = 128, bucket_cap: int = 8192):
    """Embedding-cosine near-dup: random-hyperplane LSH buckets, exact
    cosine verify within buckets. Returns {id_a, id_b, cosine}.

    `nbits` scales with the dataset size (log2(n / target_bucket)) so the
    expected bucket stays ~target_bucket rows and the within-bucket
    O(b²·d) verify stays bounded as n grows; buckets that still exceed
    `bucket_cap` are split deterministically by id hash (documented
    recall trade on pathological clusters)."""
    if nbits is None:
        n = ds.count()
        nbits = int(max(8, np.ceil(np.log2(max(2.0, n / target_bucket)))))
    nbits = min(nbits, 62)

    class Bucketer:
        def __init__(self, d):
            rng = np.random.default_rng(seed)
            self.planes = None
            self.d = d
            self.rng_state = rng

        def __call__(self, batch):
            import pandas as pd

            vecs = np.stack([np.asarray(v, dtype=np.float64)
                             for v in batch[vec_col]])
            if self.planes is None:
                self.planes = np.random.default_rng(seed).normal(
                    size=(vecs.shape[1], nbits))
            proj = vecs @ self.planes
            bits = (proj > 0).astype(np.int64)
            key = (bits * (1 << np.arange(nbits, dtype=np.int64))).sum(axis=1)
            norm = np.linalg.norm(vecs, axis=1)
            return pd.DataFrame({
                "bucket": key,
                "rid": np.asarray(batch[id_col]),
                "vec": [v / n if n > 0 else v
                        for v, n in zip(vecs, norm)],
            })

    buck = ds.map_batches(Bucketer, fn_constructor_args=(dim,),
                          batch_format="pandas", batch_size=4096,
                          concurrency=concurrency)

    def verify(group):
        import pandas as pd

        g = group.sort_values("rid")
        ids = g["rid"].to_numpy()
        chunks = [np.arange(len(ids))]
        if len(ids) > bucket_cap:
            nsub = -(-len(ids) // bucket_cap)
            sub = _stable_u64([str(i) for i in ids]) % np.uint64(nsub)
            chunks = [np.flatnonzero(sub == s) for s in range(nsub)]
        Vall = np.stack(g["vec"].to_numpy())
        frames = []
        for sel in chunks:
            if len(sel) < 2:
                continue
            V = Vall[sel]
            sims = V @ V.T
            iu = np.triu_indices(len(sel), k=1)
            hits = sims[iu] >= threshold
            frames.append(pd.DataFrame({
                "id_a": ids[sel][iu[0][hits]],
                "id_b": ids[sel][iu[1][hits]],
                "cosine": sims[iu][hits].astype(np.float64),
            }))
        if not frames:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        return pd.concat(frames, ignore_index=True)

    return buck.groupby("bucket").map_groups(verify, batch_format="pandas")
