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


def _stable_u64(values) -> np.ndarray:
    """Deterministic 64-bit hash per element, vectorized (splitmix64
    for ints, pandas SipHash for strings — process-stable)."""
    from proj_ray.functions._hash import stable_u64

    return stable_u64(values)


# ------------------------------------------------------------- exact ------


def dedup_exact(ds, key_col: str, id_col: str, n_buckets: int = 64):
    """Keep exactly one row (min id) per duplicate group of `key_col`.

    Shape: project to (key, id) -> per-batch local min per key (the
    only rows the shuffle ever moves are one per (block, key)) ->
    hash-bucket co-partition (`_bk = stable_hash(key) % n_buckets`;
    Ray's sort-based groupby prices a raw-key sort at seconds of fixed
    latency while the 64-value int sort costs a fraction) -> one
    vectorized min-per-key pass per bucket. Size `n_buckets` so
    distinct-keys / n_buckets rows fit a worker's heap (~1-2M rows per
    bucket => thousands of buckets at the 100-TB target; the default
    suits up to ~10^8 distinct keys).

    Returns a Dataset of (key_col, id_col) winners; callers can
    semi-join it back to fetch full rows.
    """
    import pandas as pd

    def partial(b: dict) -> dict:
        df = pd.DataFrame({key_col: b[key_col], id_col: b[id_col]})
        g = df.groupby(key_col, as_index=False)[id_col].min()
        bk = (_stable_u64(g[key_col].to_numpy())
              % np.uint64(n_buckets)).astype(np.int64)
        return {key_col: g[key_col].to_numpy(),
                id_col: g[id_col].to_numpy(), "_bk": bk}

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return (g.drop(columns=["_bk"])
                 .groupby(key_col, as_index=False)[id_col].min())

    return (ds.select_columns([key_col, id_col])
              .map_batches(partial, batch_format="numpy",
                           batch_size=65536)
              .groupby("_bk")
              .map_groups(combine, batch_format="pandas"))


# (a former dedup_exact_rows full-row groupby variant was deleted: it
# shuffled entire rows through groupby(key).map_groups — the exact
# anti-pattern dedup_exact's (key, id) projection exists to avoid —
# and had no callers; semi-join dedup_exact's winners back instead)


# ------------------------------------------------- incremental exact ------
#
# The daily-increment shape of a 100-TB corpus: dedup a NEW shard
# against the accumulated history without re-scanning it. The history
# lives as a bucket-partitioned (key, canonical_id) parquet index;
# resolving a delta co-partitions the delta's per-block partial mins
# by the SAME bucket hash, so each reducer reads exactly one index
# partition — history I/O scales with the delta's bucket fan-out,
# never with history size.


def dedup_index_build(ds, key_col: str, id_col: str, path: str,
                      n_buckets: int = 64):
    """Persist the exact-dedup state of `ds` as a bucket-partitioned
    (key, canonical_id=min id) parquet index under `path`.

    Same shuffle discipline as dedup_exact: projection -> per-block
    partial min per key -> hash-bucket co-partition -> one vectorized
    min-per-key pass per bucket, which then writes ONE sorted parquet
    partition (resumable per-bucket, no giant file). Returns a pandas
    manifest (bucket, n_keys, bytes). On a multi-node cluster `path`
    must be cluster-shared storage (NFS/S3-fuse)."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)

    def partial(b: dict) -> dict:
        df = pd.DataFrame({key_col: b[key_col], id_col: b[id_col]})
        g = df.groupby(key_col, as_index=False)[id_col].min()
        bk = (_stable_u64(g[key_col].to_numpy())
              % np.uint64(n_buckets)).astype(np.int64)
        return {key_col: g[key_col].to_numpy(),
                id_col: g[id_col].to_numpy(), "_bk": bk}

    def write_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        bk = int(g["_bk"].iloc[0])
        out = (g.drop(columns=["_bk"])
                .groupby(key_col, as_index=False)[id_col].min()
                .sort_values(key_col, ignore_index=True))
        part = os.path.join(path, f"bucket={bk:05d}")
        os.makedirs(part, exist_ok=True)
        f = os.path.join(part, "keys.parquet")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       f)
        return pd.DataFrame({"bucket": [bk], "n_keys": [len(out)],
                             "bytes": [os.path.getsize(f)]})

    man = (ds.select_columns([key_col, id_col])
           .map_batches(partial, batch_format="numpy",
                        batch_size=65536)
           .groupby("_bk")
           .map_groups(write_bucket, batch_format="pandas")
           .to_pandas())
    return man.sort_values("bucket", ignore_index=True)


def dedup_exact_incremental(ds_new, path: str, key_col: str,
                            id_col: str, n_buckets: int = 64):
    """Resolve a NEW shard against the persistent index at `path`.

    Returns a Dataset with one row per DISTINCT new key:
      (key_col, canonical_id, from_index, n_new)
    where canonical_id is the historical min id when the key exists in
    the index (from_index=1) else the new shard's min id (from_index=0),
    and n_new counts the shard's rows under that key. A row of the new
    shard is a duplicate iff its id != its key's canonical_id — derive
    per-row marks by broadcast/hash-joining this (distinct-keys-sized)
    result back; the all-to-all here moves one row per (block, key).

    `n_buckets` must equal the index build's."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    def partial(b: dict) -> dict:
        df = pd.DataFrame({key_col: b[key_col], id_col: b[id_col]})
        g = df.groupby(key_col, as_index=False).agg(
            _min=(id_col, "min"), _cnt=(id_col, "size"))
        bk = (_stable_u64(g[key_col].to_numpy())
              % np.uint64(n_buckets)).astype(np.int64)
        return {key_col: g[key_col].to_numpy(),
                "_min": g["_min"].to_numpy(np.int64),
                "_cnt": g["_cnt"].to_numpy(np.int64), "_bk": bk}

    def resolve(g: "pd.DataFrame") -> "pd.DataFrame":
        bk = int(g["_bk"].iloc[0])
        new = (g.drop(columns=["_bk"])
               .groupby(key_col, as_index=False)
               .agg(_min=("_min", "min"), n_new=("_cnt", "sum")))
        f = os.path.join(path, f"bucket={bk:05d}", "keys.parquet")
        if os.path.exists(f):
            old = pq.read_table(f).to_pandas() \
                .rename(columns={id_col: "_old"})
            new = new.merge(old, on=key_col, how="left")
        else:
            new["_old"] = np.nan
        hit = new["_old"].notna()
        new["canonical_id"] = np.where(
            hit, new["_old"].fillna(0), new["_min"]).astype(np.int64)
        new["from_index"] = hit.to_numpy().astype(np.int64)
        new["n_new"] = new["n_new"].astype(np.int64)
        return new[[key_col, "canonical_id", "from_index", "n_new"]]

    return (ds_new.select_columns([key_col, id_col])
            .map_batches(partial, batch_format="numpy",
                         batch_size=65536)
            .groupby("_bk")
            .map_groups(resolve, batch_format="pandas"))


# --------------------------------------------- incremental near-dup -------


def minhash_index_build(ds, text_col: str, id_col: str, path: str,
                        num_perm: int = 64, bands: int = 16,
                        n_buckets: int = 64, shingle_k: int = 5,
                        local_cap: int = 100_000):
    """Persist the MinHash near-dup state of a corpus under `path`:

    - `bands/bucket=K/` — (band, rid) rows, partitioned by
      band-key hash: the LSH probe surface. ~10 B/row x bands crosses
      the build shuffle; never text.
    - `shingles/bucket=K/` — one (rid, shingles list<int64>) row per
      doc, partitioned by rid: the verify surface (hashed shingle
      sets, NOT text — exact Jaccard over them equals substring-gram
      Jaccard while the rolling hash stays collision-free on the
      corpus alphabet, the same contract q19 documents).

    Both components are bucket-partitioned parquet (resumable, and a
    delta's probe/verify reads ONLY the buckets it hashes to).
    Returns a pandas manifest (component, bucket, n_rows, bytes).
    On a multi-node cluster `path` must be cluster-shared storage
    (NFS/S3-fuse).

    Adaptive shape (same trade as dedup_minhash_lsh's local_sig_cap):
    at or under `local_cap` source rows the signing/shingling passes
    still run distributed but the bucket partitioning happens
    driver-local (the two groupby all-to-alls cost seconds of fixed
    exchange latency that dwarf small corpora); above the cap the
    bucket co-partitioning is a distributed groupby."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)

    def sign(batch: dict) -> dict:
        mh = _minhasher(num_perm, bands)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        keys = mh.band_keys_batch(mh.signatures(batch[text_col]))
        band = keys.ravel()
        return {"band": band, "rid": np.repeat(ids, bands),
                "_bk": (band % n_buckets).astype(np.int64)}

    def write_bands(g: "pd.DataFrame") -> "pd.DataFrame":
        bk = int(g["_bk"].iloc[0])
        out = g.drop(columns=["_bk"]).drop_duplicates(
            ["band", "rid"]).sort_values(["band", "rid"],
                                         ignore_index=True)
        part = os.path.join(path, "bands", f"bucket={bk:05d}")
        os.makedirs(part, exist_ok=True)
        f = os.path.join(part, "bands.parquet")
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       f)
        return pd.DataFrame({"component": ["bands"], "bucket": [bk],
                             "n_rows": [len(out)],
                             "bytes": [os.path.getsize(f)]})

    def shingle_rows(batch: dict) -> "pd.DataFrame":
        ids = np.asarray(batch[id_col], dtype=np.int64)
        sets = [np.unique(_shingles(str(t), shingle_k))
                .view(np.int64) for t in batch[text_col]]
        return pd.DataFrame({
            "rid": ids, "shingles": sets,
            "_bk": (ids % n_buckets).astype(np.int64)})

    def write_shingles(g: "pd.DataFrame") -> "pd.DataFrame":
        bk = int(g["_bk"].iloc[0])
        g = g.sort_values("rid", ignore_index=True)
        part = os.path.join(path, "shingles", f"bucket={bk:05d}")
        os.makedirs(part, exist_ok=True)
        f = os.path.join(part, "shingles.parquet")
        pq.write_table(pa.table({
            "rid": pa.array(g["rid"].to_numpy(np.int64)),
            "shingles": pa.array(
                [list(s) for s in g["shingles"]],
                type=pa.large_list(pa.int64()))}), f)
        return pd.DataFrame({"component": ["shingles"], "bucket": [bk],
                             "n_rows": [len(g)],
                             "bytes": [os.path.getsize(f)]})

    src = ds.select_columns([id_col, text_col])
    if ds.count() <= local_cap:
        bands_df = src.map_batches(sign, batch_format="numpy",
                                   batch_size=256).to_pandas()
        sh_df = src.map_batches(shingle_rows, batch_format="pandas",
                                batch_size=256).to_pandas()
        mans = [write_bands(g) for _, g in bands_df.groupby("_bk")]
        mans += [write_shingles(g) for _, g in sh_df.groupby("_bk")]
        man = pd.concat(mans, ignore_index=True)
        return man.sort_values(["component", "bucket"],
                               ignore_index=True)
    man_b = (src.map_batches(sign, batch_format="numpy",
                             batch_size=1024)
             .groupby("_bk")
             .map_groups(write_bands, batch_format="pandas")
             .to_pandas())
    man_s = (src.map_batches(shingle_rows, batch_format="pandas",
                             batch_size=1024)
             .groupby("_bk")
             .map_groups(write_shingles, batch_format="pandas")
             .to_pandas())
    return (pd.concat([man_b, man_s], ignore_index=True)
            .sort_values(["component", "bucket"], ignore_index=True))


def minhash_incremental(ds_new, path: str, text_col: str, id_col: str,
                        threshold: float = 0.6, num_perm: int = 64,
                        bands: int = 16, n_buckets: int = 64,
                        shingle_k: int = 5,
                        pairs_cap: int = 1_000_000,
                        local_cap: int = 100_000):
    """Near-dup pairs between a NEW shard and the history persisted by
    `minhash_index_build` — without rescanning history.

    Probe: the delta's (band, rid) rows co-partition by the SAME
    band-key hash the index used, so each reducer inner-joins against
    exactly ONE `bands/` partition — candidate discovery I/O scales
    with the delta's bucket fan-out. Verify: candidates are bounded
    (LSH collisions, enforced by `pairs_cap` — recall is NEVER traded,
    the guard raises instead); the old sides' hashed shingle sets are
    read from ONLY the `shingles/` buckets the candidate ids hash to,
    the new sides' are recomputed in one shuffle-free filtered pass
    over the delta, and the exact Jaccard judge runs as a distributed
    map_batches stage over the candidate pairs with both lookup
    tables broadcast via ray.put (the same shape as
    `_verify_pairs_exact`'s broadcast path). Returns a pandas frame
    (id_new, id_old, jaccard) with jaccard >= threshold.

    Parameters must match the build's (num_perm/bands/n_buckets/
    shingle_k)."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq
    import ray

    def sign(batch: dict) -> dict:
        mh = _minhasher(num_perm, bands)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        keys = mh.band_keys_batch(mh.signatures(batch[text_col]))
        band = keys.ravel()
        return {"band": band, "rid": np.repeat(ids, bands),
                "_bk": (band % n_buckets).astype(np.int64)}

    def probe(g: "pd.DataFrame") -> "pd.DataFrame":
        bk = int(g["_bk"].iloc[0])
        f = os.path.join(path, "bands", f"bucket={bk:05d}",
                         "bands.parquet")
        empty = pd.DataFrame({"id_new": pd.Series(dtype=np.int64),
                              "id_old": pd.Series(dtype=np.int64)})
        if not os.path.exists(f):
            return empty
        old = pq.read_table(f).to_pandas() \
            .rename(columns={"rid": "id_old"})
        new = (g.drop(columns=["_bk"])
               .drop_duplicates(["band", "rid"])
               .rename(columns={"rid": "id_new"}))
        m = new.merge(old, on="band")
        if m.empty:
            return empty
        return m[["id_new", "id_old"]].drop_duplicates(
            ignore_index=True)

    sigs = ds_new.select_columns([id_col, text_col]) \
        .map_batches(sign, batch_format="numpy", batch_size=256)
    if ds_new.count() <= local_cap:
        # bounded delta: sign distributed, probe driver-local (skips
        # the band groupby's fixed all-to-all latency); each needed
        # bucket partition is still read exactly once
        sdf = sigs.to_pandas()
        pairs = pd.concat(
            [probe(g) for _, g in sdf.groupby("_bk")],
            ignore_index=True)
    else:
        from proj_ray.dsutil import pull_pandas

        cand = (sigs.groupby("_bk")
                .map_groups(probe, batch_format="pandas")
                .materialize())
        n_cand = cand.count()
        if n_cand > pairs_cap:
            raise ValueError(
                f"{n_cand} LSH candidates exceed "
                f"pairs_cap={pairs_cap}; raise the cap or tighten "
                "bands — the verify below broadcasts the candidate "
                "sides")
        pairs = pull_pandas(cand)
    if len(pairs) > pairs_cap:
        raise ValueError(
            f"{len(pairs)} LSH candidates exceed "
            f"pairs_cap={pairs_cap}; raise the cap or tighten bands "
            "— the verify below broadcasts the candidate sides")
    pairs = pairs.drop_duplicates(["id_new", "id_old"],
                                  ignore_index=True)
    if pairs.empty:
        return pd.DataFrame({"id_new": pd.Series(dtype=np.int64),
                             "id_old": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=np.float64)})

    # old shingle sets: only the buckets the candidate old-ids hash to
    old_sets: dict = {}
    need_old = np.unique(pairs["id_old"].to_numpy(np.int64))
    for bk in np.unique(need_old % n_buckets):
        f = os.path.join(path, "shingles", f"bucket={int(bk):05d}",
                         "shingles.parquet")
        if not os.path.exists(f):
            continue
        t = pq.read_table(f)
        rids = t.column("rid").to_numpy()
        keep = np.isin(rids, need_old)
        for r, s, k in zip(rids, t.column("shingles").to_pylist(),
                           keep):
            if k:
                old_sets[int(r)] = set(s)

    # new shingle sets: one shuffle-free filtered pass over the delta
    need_new = np.unique(pairs["id_new"].to_numpy(np.int64))
    need_ref = ray.put(need_new)  # sorted by np.unique

    def pick(batch: dict) -> "pd.DataFrame":
        ids = np.asarray(batch[id_col], dtype=np.int64)
        srt = ray.get(need_ref)
        pos = np.searchsorted(srt, ids)
        pos[pos >= len(srt)] = 0
        m = srt[pos] == ids
        return pd.DataFrame({
            "rid": ids[m],
            "shingles": [np.unique(_shingles(str(t), shingle_k))
                         .view(np.int64)
                         for t in np.asarray(batch[text_col],
                                             dtype=object)[m]]})

    got = (ds_new.select_columns([id_col, text_col])
           .map_batches(pick, batch_format="numpy", batch_size=1024)
           .to_pandas())
    new_sets = {int(r): set(s.tolist())
                for r, s in zip(got["rid"], got["shingles"])}

    # exact size-ratio prune before the judge: J(A,B) <= min/max of
    # the set sizes, so pairs failing min >= t*max can never reach the
    # threshold — zero recall loss (the AllPairs length filter q29's
    # n-gram join uses)
    sa = np.array([len(new_sets.get(int(i), ()))
                   for i in pairs["id_new"]], dtype=np.int64)
    sb = np.array([len(old_sets.get(int(i), ()))
                   for i in pairs["id_old"]], dtype=np.int64)
    pairs = pairs[np.minimum(sa, sb)
                  >= threshold * np.maximum(sa, sb)]
    if pairs.empty:
        return pd.DataFrame({"id_new": pd.Series(dtype=np.int64),
                             "id_old": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=np.float64)})

    import ray.data as rd

    old_ref = ray.put(old_sets)
    new_ref = ray.put(new_sets)

    def judge(b: "pd.DataFrame") -> "pd.DataFrame":
        olds = ray.get(old_ref)
        news = ray.get(new_ref)
        ja = np.empty(len(b), dtype=np.float64)
        for i, (a, o) in enumerate(zip(b["id_new"].to_numpy(),
                                       b["id_old"].to_numpy())):
            sa = news.get(int(a), set())
            sb = olds.get(int(o), set())
            inter = len(sa & sb)
            ja[i] = inter / max(1, len(sa) + len(sb) - inter)
        out = b.assign(jaccard=ja)
        return out[out["jaccard"] >= threshold]

    out = (rd.from_pandas(pairs)
           .repartition(max(1, min(64, len(pairs) // 8192 + 1)))
           .map_batches(judge, batch_format="pandas",
                        batch_size=8192)
           .to_pandas())
    if out.empty:  # every candidate judged below threshold
        return pd.DataFrame({"id_new": pd.Series(dtype=np.int64),
                             "id_old": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=np.float64)})
    return out.sort_values(["id_new", "id_old"],
                           ignore_index=True)


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
        return self.signatures([text])[0]

    def signatures(self, texts) -> np.ndarray:
        """(n, num_perm) signature matrix, batch-vectorized: all docs'
        shingle hashes concatenated, permuted in memory-bounded
        permutation chunks, per-doc min via np.minimum.reduceat — no
        per-document Python loop in the permute/min step."""
        n = len(texts)
        sig = np.empty((n, self.num_perm), dtype=np.uint64)
        if n == 0:
            return sig
        sets = [_shingles(str(t), self.k) for t in texts]
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        # group docs so each group's (perm-chunk x shingles) work
        # buffer stays <= ~8 MB: larger fresh buffers hit a
        # pathological first-touch slow path (measured ~20x) and the
        # permute/fold pass is pure memory bandwidth anyway
        budget = 1_000_000
        start = 0
        while start < n:
            end, tot = start, 0
            while end < n and (tot + lens[end] <= budget or end == start):
                tot += lens[end]
                end += 1
            cat = np.concatenate(sets[start:end])
            offsets = np.zeros(end - start, dtype=np.int64)
            np.cumsum(lens[start:end][:-1], out=offsets[1:])
            self._sign_group(cat, offsets, sig[start:end], budget)
            start = end
        return sig

    def _sign_group(self, cat, offsets, out, budget):
        pc = max(1, min(self.num_perm, budget // max(1, len(cat))))
        h = np.empty((pc, len(cat)), dtype=np.uint64)
        t = np.empty_like(h)
        one61 = np.uint64(61)
        with np.errstate(over="ignore"):
            for p0 in range(0, self.num_perm, pc):
                a = self.a[p0:p0 + pc][:, None]
                b = self.b[p0:p0 + pc][:, None]
                hc, tc = h[:len(a)], t[:len(a)]
                np.multiply(cat[None, :], a, out=hc)
                np.add(hc, b, out=hc)
                # x mod (2^61-1) via branch-free Mersenne fold — uint64
                # division is ~20x slower than these shifts. (The
                # product above already wraps mod 2^64, so this is a
                # stable hash family, not modular arithmetic; equal
                # shingle sets still give equal signatures.)
                np.right_shift(hc, one61, out=tc)
                np.bitwise_and(hc, _MERSENNE, out=hc)
                np.add(hc, tc, out=hc)
                np.right_shift(hc, one61, out=tc)
                np.bitwise_and(hc, _MERSENNE, out=hc)
                np.add(hc, tc, out=hc)
                out[:, p0:p0 + pc] = np.minimum.reduceat(
                    hc, offsets, axis=1).T

    def band_keys(self, sig: np.ndarray) -> list[int]:
        return self.band_keys_batch(sig[None, :])[0].tolist()

    def band_keys_batch(self, sig: np.ndarray) -> np.ndarray:
        """(n, bands) int64 band keys: chained splitmix64 over each
        band's signature rows, salted by band index. Replaces round 2's
        16 per-document blake2b calls; key VALUES changed, collision
        semantics identical (equal band chunks -> equal keys)."""
        from proj_ray.functions._hash import splitmix64

        n, r = sig.shape[0], self.rows_per_band
        keys = np.empty((n, self.bands), dtype=np.int64)
        for bi in range(self.bands):
            h = splitmix64(np.full(n, bi, dtype=np.uint64))
            for j in range(r):
                h = splitmix64(h ^ sig[:, bi * r + j])
            keys[:, bi] = (h & np.uint64(0x7FFFFFFFFFFFFFF)).astype(
                np.int64)
        return keys


def jaccard_ngrams(a: str, b: str, k: int = 5) -> float:
    sa = set(_shingles(a, k).tolist())
    sb = set(_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


import functools


@functools.lru_cache(maxsize=8)
def _minhasher(num_perm: int, bands: int) -> "MinHasher":
    # module-level cache: map_batches functions pickle by reference,
    # and every task on a worker reuses the same permutation tables
    return MinHasher(num_perm=num_perm, bands=bands)


def _bucket_pair_arrays(ids: np.ndarray, bucket_cap: int):
    """All unordered pairs within one bucket; buckets above bucket_cap
    split deterministically by id hash (documented recall trade)."""
    chunks = [ids]
    if len(ids) > bucket_cap:
        nsub = -(-len(ids) // bucket_cap)
        sub = _stable_u64(ids) % np.uint64(nsub)
        chunks = [ids[sub == s] for s in range(nsub)]
    out_a, out_b = [], []
    for c in chunks:
        if len(c) < 2:
            continue
        iu = np.triu_indices(len(c), k=1)
        out_a.append(c[iu[0]])
        out_b.append(c[iu[1]])
    return out_a, out_b


def dedup_minhash_lsh(ds, text_col: str, id_col: str,
                      threshold: float = 0.7, num_perm: int = 64,
                      bands: int = 16, concurrency=(2, 8),
                      bucket_cap: int = 4096,
                      local_sig_cap: int = 2_000_000,
                      broadcast_pairs_cap: int = 100_000):
    """Near-duplicate pairs via MinHash LSH.

    Scale shape: the signing pass emits only (band_key, rid) — ~10 B/row
    × bands, never the document text. When the signature table is small
    (<= local_sig_cap rows) the bucket pairing happens driver-local
    (pandas groupby over a bounded table — no all-to-all at all);
    above the cap it is a distributed groupby(band). Candidate pairs
    are deduped across bands and each pair's text is fetched ONCE for
    the exact n-gram Jaccard verify (see _verify_pairs_exact for its
    own broadcast/distributed split). Oversized buckets (> bucket_cap)
    are split deterministically by rid hash, bounding the O(b²) pair
    expansion — a documented recall trade on pathological buckets.

    Returns a Dataset of {id_a, id_b, jaccard} with jaccard >= threshold.
    """
    import pandas as pd

    def sign(batch):
        mh = _minhasher(num_perm, bands)
        ids = np.asarray(batch[id_col])
        keys = mh.band_keys_batch(mh.signatures(batch[text_col]))
        return {"band": keys.ravel(), "rid": np.repeat(ids, bands)}

    sigs = ds.map_batches(sign, batch_format="numpy", batch_size=1024)

    # decide local vs distributed pairing from the SOURCE row count
    # (metadata-cheap for parquet) — the signature table itself is
    # never materialized just to count it
    if ds.count() * bands <= local_sig_cap:
        pdf = sigs.to_pandas().drop_duplicates(["band", "rid"])
        sizes = pdf.groupby("band")["rid"].transform("size")
        multi = pdf[sizes > 1]
        out_a, out_b = [], []
        for _, g in multi.groupby("band"):
            a, b = _bucket_pair_arrays(
                np.sort(g["rid"].to_numpy()), bucket_cap)
            out_a.extend(a)
            out_b.extend(b)
        pairs = pd.DataFrame({
            "id_a": np.concatenate(out_a) if out_a else np.array([]),
            "id_b": np.concatenate(out_b) if out_b else np.array([]),
        }).drop_duplicates(["id_a", "id_b"])
    else:
        def bucket_pairs(group):
            ids = np.unique(group["rid"].to_numpy())
            if len(ids) < 2:
                return pd.DataFrame({"id_a": [], "id_b": []})
            out_a, out_b = _bucket_pair_arrays(ids, bucket_cap)
            if not out_a:
                return pd.DataFrame({"id_a": [], "id_b": []})
            return pd.DataFrame({"id_a": np.concatenate(out_a),
                                 "id_b": np.concatenate(out_b)})

        pairs = sigs.groupby("band").map_groups(bucket_pairs,
                                                batch_format="pandas")
    return _verify_pairs_exact(ds, pairs, text_col, id_col, threshold,
                               broadcast_pairs_cap=broadcast_pairs_cap)


def _verify_pairs_exact(docs, pairs, text_col: str, id_col: str,
                        threshold: float, shingle_k: int = 5,
                        broadcast_pairs_cap: int = 100_000,
                        sim_fn=None):
    """Exact n-gram Jaccard verify of candidate pairs (cross-band
    duplicates deduped here). Adaptive two-path shape:

    - candidate set <= broadcast_pairs_cap (the common case — LSH
      collisions are a tiny fraction of the corpus): broadcast the
      candidate-id set, semi-join the docs with a shuffle-free
      map_batches filter, judge in a distributed actor stage holding
      the (small) id->text table: ZERO extra all-to-alls after the
      band groupby.
    - larger candidate sets: two co-partitioned attach passes
      (union + groupby on id_a, then id_b, judging inline in the
      second) — 2 all-to-alls, each text crossing the wire once per
      pair-participation; round 2's separate distinct + judge shuffles
      are folded in.
    """
    import pandas as pd
    import ray
    import ray.data as rd

    if sim_fn is None:
        def sim_fn(a, b):
            return jaccard_ngrams(a, b, k=shingle_k)
    if isinstance(pairs, pd.DataFrame):
        pdf = pairs.drop_duplicates(["id_a", "id_b"])
        small = len(pdf) <= broadcast_pairs_cap
        pairs_ds = None
    else:
        from proj_ray.dsutil import pull_pandas

        pairs_ds = pairs.materialize()
        small = pairs_ds.count() <= broadcast_pairs_cap
        pdf = pull_pandas(pairs_ds).drop_duplicates(["id_a", "id_b"]) \
            if small else None
    if small:
        if len(pdf) == 0:
            return rd.from_pandas(pd.DataFrame(
                {"id_a": [], "id_b": [], "jaccard": []}))
        need = np.unique(np.concatenate([pdf["id_a"].to_numpy(),
                                         pdf["id_b"].to_numpy()]))
        need_ref = ray.put(need)  # sorted by np.unique

        def pick(batch):
            ids = np.asarray(batch[id_col])
            srt = ray.get(need_ref)
            pos = np.searchsorted(srt, ids)
            pos[pos >= len(srt)] = 0
            m = srt[pos] == ids
            return {"rid": ids[m],
                    "text": np.asarray(batch[text_col], dtype=object)[m]}

        got = docs.map_batches(pick, batch_format="numpy").take_all()
        lk_ref = ray.put({r["rid"]: r["text"] for r in got})

        def judge(batch):
            lk = ray.get(lk_ref)
            out_a, out_b, out_j = [], [], []
            for a, b in zip(batch["id_a"].to_numpy(),
                            batch["id_b"].to_numpy()):
                ta, tb = lk.get(a), lk.get(b)
                if ta is None or tb is None:
                    continue
                jac = sim_fn(str(ta), str(tb))
                if jac >= threshold:
                    out_a.append(a)
                    out_b.append(b)
                    out_j.append(jac)
            return pd.DataFrame({
                "id_a": np.asarray(out_a, dtype=batch["id_a"].dtype),
                "id_b": np.asarray(out_b, dtype=batch["id_b"].dtype),
                "jaccard": np.asarray(out_j, dtype=np.float64)})

        return rd.from_pandas(pdf.reset_index(drop=True)).map_batches(
            judge, batch_format="pandas", batch_size=4096)
    if pairs_ds is None:
        pairs_ds = rd.from_pandas(pdf.reset_index(drop=True))

    # distributed path: attach text_a (dedup folded in), then attach
    # text_b and judge inline
    def pair_rows(batch):
        return pd.DataFrame({
            "key": batch["id_a"].to_numpy(),
            "id_b": batch["id_b"].to_numpy(),
            "side": np.zeros(len(batch), np.int8),
            "text": np.full(len(batch), "", dtype=object)})

    def doc_rows(batch):
        ids = np.asarray(batch[id_col])
        return pd.DataFrame({
            "key": ids,
            "id_b": ids,  # unused on side=-1 rows
            "side": np.full(len(ids), -1, dtype=np.int8),
            "text": np.asarray(batch[text_col], dtype=object)})

    def attach_a(group):
        srcs = group[group["side"] == -1]
        g = group[group["side"] == 0].drop_duplicates("id_b")
        if len(srcs) == 0 or len(g) == 0:
            return pd.DataFrame({"key": [], "id_a": [], "side": [],
                                 "text": []})
        return pd.DataFrame({
            "key": g["id_b"].to_numpy(),
            "id_a": np.full(len(g), group["key"].iloc[0]),
            "side": np.zeros(len(g), np.int8),
            "text": np.full(len(g), srcs["text"].iloc[0], dtype=object)})

    def doc_rows_b(batch):
        ids = np.asarray(batch[id_col])
        return pd.DataFrame({
            "key": ids,
            "id_a": ids,  # unused on side=-1 rows
            "side": np.full(len(ids), -1, dtype=np.int8),
            "text": np.asarray(batch[text_col], dtype=object)})

    def attach_b_judge(group):
        srcs = group[group["side"] == -1]
        g = group[group["side"] == 0]
        if len(srcs) == 0 or len(g) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        tb = str(srcs["text"].iloc[0])
        key = group["key"].iloc[0]
        out_a, out_j = [], []
        for aid, ta in zip(g["id_a"].to_numpy(), g["text"].to_numpy()):
            jac = sim_fn(str(ta), tb)
            if jac >= threshold:
                out_a.append(aid)
                out_j.append(jac)
        return pd.DataFrame({"id_a": out_a,
                             "id_b": np.full(len(out_a), key),
                             "jaccard": np.asarray(out_j, np.float64)})

    withs_a = (pairs_ds.map_batches(pair_rows, batch_format="pandas")
               .union(docs.map_batches(doc_rows, batch_format="numpy"))
               .groupby("key").map_groups(attach_a,
                                          batch_format="pandas"))
    return (withs_a
            .union(docs.map_batches(doc_rows_b, batch_format="numpy"))
            .groupby("key").map_groups(attach_b_judge,
                                       batch_format="pandas"))


# ------------------------------------------------- word-n-gram jaccard ----


def word_ngrams(text: str, n: int = 2) -> set:
    """Distinct word n-gram strings of `lower(text)` split on single
    spaces — the exact tokenization ANSI SQL reproduces with
    string_split(lower(text), ' '), so the oracle matches verbatim."""
    toks = text.lower().split(" ")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def jaccard_word_ngrams(a: str, b: str, n: int = 2) -> float:
    sa, sb = word_ngrams(a, n), word_ngrams(b, n)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _word_gram_rows(texts, ids, n: int = 2):
    """Per-batch exploded distinct word-n-gram hashes, vectorized.

    Returns (gram uint64, rid, sz int64) row arrays where sz is the
    doc's distinct-gram count (carried per row so no later size join is
    needed). Gram identity is the 64-bit siphash of the gram STRING
    (pd.util.hash_pandas_object: keyed, deterministic across processes),
    so df/prefix bookkeeping stays numeric; the final verify recomputes
    jaccard from the strings, so hash collisions can only add candidate
    work, never change an output value.
    """
    import pandas as pd

    ids = np.asarray(ids)
    s = pd.Series(np.asarray(texts, dtype=object)).astype(str).str.lower()
    ex = s.str.split(" ").explode()
    tok = ex.to_numpy(dtype=object)
    doc = ex.index.to_numpy()
    if len(tok) == 0:
        e = np.array([], dtype=np.int64)
        return e.astype(np.uint64), ids[:0], e
    # n-gram strings via (n-1) aligned shifts inside each doc
    gram = pd.Series(tok)
    mask = np.ones(len(tok), dtype=bool)
    for j in range(1, n):
        nxt = np.empty(len(tok), dtype=object)
        nxt[:-j] = tok[j:]
        nxt[-j:] = ""
        m = np.zeros(len(tok), dtype=bool)
        m[:-j] = doc[:-j] == doc[j:]
        mask &= m
        gram = gram + " " + pd.Series(nxt)
    gram, doc = gram[mask], doc[mask]
    h = pd.util.hash_pandas_object(gram, index=False).to_numpy()
    # distinct per (doc, hash)
    order = np.lexsort((h, doc))
    d, hh = doc[order], h[order]
    keep = np.ones(len(d), dtype=bool)
    keep[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
    d, hh = d[keep], hh[keep]
    sz = np.bincount(d, minlength=len(ids))
    return hh, ids[d], sz[d].astype(np.int64)


def _prefix_rows(pdf, threshold: float):
    """AllPairs prefix per doc: sort grams by (global df, gram) and keep
    the first sz - ceil(t*sz) + 1. Any pair with J >= t shares at least
    one prefix gram of each side (Bayardo/Ma/Srikant, WWW'07: all
    shared grams in the suffix would bound the overlap below t*sz)."""
    pdf = pdf.sort_values(["rid", "df", "gram"], kind="stable")
    k = pdf.groupby("rid", sort=False).cumcount().to_numpy()
    sz = pdf["sz"].to_numpy()
    p = sz - np.ceil(threshold * sz).astype(np.int64) + 1
    return pdf[k < p]


def _length_filtered_pairs(pre, threshold: float, bucket_cap: int):
    """Bucket prefix rows by gram; emit unordered id pairs passing the
    length filter min(sz) >= t * max(sz) (necessary for J >= t)."""
    import pandas as pd

    out_a, out_b = [], []
    sizes = pre.groupby("gram", sort=False)["rid"].transform("size")
    multi = pre[sizes.to_numpy() > 1]
    for _, g in multi.groupby("gram", sort=False):
        order = np.argsort(g["rid"].to_numpy())
        ids = g["rid"].to_numpy()[order]
        szs = g["sz"].to_numpy()[order]
        if len(ids) > bucket_cap:
            # deterministic split of pathological buckets (documented
            # recall trade, same policy as the LSH path)
            sub = _stable_u64(ids) % np.uint64(-(-len(ids) // bucket_cap))
            chunks = [(ids[sub == s], szs[sub == s])
                      for s in range(int(sub.max()) + 1)]
        else:
            chunks = [(ids, szs)]
        for cid, csz in chunks:
            if len(cid) < 2:
                continue
            iu, ju = np.triu_indices(len(cid), k=1)
            ok = (np.minimum(csz[iu], csz[ju])
                  >= threshold * np.maximum(csz[iu], csz[ju]))
            out_a.append(cid[iu[ok]])
            out_b.append(cid[ju[ok]])
    if not out_a:
        return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                             "id_b": np.array([], dtype=np.int64)})
    return pd.DataFrame({"id_a": np.concatenate(out_a),
                         "id_b": np.concatenate(out_b)}
                        ).drop_duplicates(["id_a", "id_b"])


def dedup_ngram_jaccard(ds, text_col: str, id_col: str,
                        threshold: float = 0.5, n: int = 2,
                        local_docs_cap: int = 100_000,
                        bucket_cap: int = 4096,
                        broadcast_pairs_cap: int = 100_000):
    """EXACT word-n-gram Jaccard similarity self-join (near-dup pairs
    with J >= threshold) via AllPairs prefix filtering — no sketching,
    full recall, SQL-oracle-checkable.

    Scale shape: the signing pass ships only (gram_hash u64, rid, sz)
    rows — never text. Candidate generation indexes only each doc's
    prefix (the ~(1-t)*sz globally-rarest grams), so a doc pair is
    compared only if it shares a rare gram; the length filter prunes
    size-mismatched pairs before any text moves. Below local_docs_cap
    source docs the df/prefix/pair steps run driver-local on the
    bounded gram table (0 all-to-alls); above, they are three
    distributed groupbys (gram -> rid -> gram). Verification fetches
    each candidate's text once (see _verify_pairs_exact).

    Returns {id_a, id_b, jaccard} with exact string-set jaccard.
    """
    import functools

    import pandas as pd

    def sign(batch):
        hh, rid, sz = _word_gram_rows(batch[text_col], batch[id_col], n)
        return {"gram": hh, "rid": rid, "sz": sz}

    grams = ds.map_batches(sign, batch_format="numpy", batch_size=1024)
    sim = functools.partial(jaccard_word_ngrams, n=n)

    if ds.count() <= local_docs_cap:
        pdf = grams.to_pandas()
        if len(pdf) == 0:
            import ray.data as rd

            return rd.from_pandas(pd.DataFrame(
                {"id_a": np.array([], dtype=np.int64),
                 "id_b": np.array([], dtype=np.int64),
                 "jaccard": np.array([], dtype=np.float64)}))
        pdf["df"] = pdf.groupby("gram", sort=False)["gram"].transform(
            "size")
        pairs = _length_filtered_pairs(
            _prefix_rows(pdf, threshold), threshold, bucket_cap)
        return _verify_pairs_exact(
            ds, pairs, text_col, id_col, threshold,
            broadcast_pairs_cap=broadcast_pairs_cap, sim_fn=sim)

    def attach_df(group):
        return group.assign(df=len(group))

    def prefix(group):
        return _prefix_rows(group, threshold)

    def bucket_pairs(group):
        return _length_filtered_pairs(group, threshold, bucket_cap)

    pairs = (grams
             .groupby("gram").map_groups(attach_df, batch_format="pandas")
             .groupby("rid").map_groups(prefix, batch_format="pandas")
             .groupby("gram").map_groups(bucket_pairs,
                                         batch_format="pandas"))
    return _verify_pairs_exact(ds, pairs, text_col, id_col, threshold,
                               broadcast_pairs_cap=broadcast_pairs_cap,
                               sim_fn=sim)


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
        n = len(ids)
        frames = []
        # chunked (ch x n) SWAR hamming matrix — one vectorized pass
        # per 2048-row stripe, no per-row Python loop; memory bounded
        # at ch*n uint64s per stripe regardless of bucket size
        CH = 2048
        for lo in range(0, n, CH):
            d = hamming64(hs[lo:lo + CH, None], hs[None, :])
            r, c = np.nonzero(d <= max_hamming)
            keep = (lo + r) < c  # strict upper triangle, global index
            r, c = r[keep], c[keep]
            if len(r):
                frames.append(pd.DataFrame({
                    "id_a": ids[lo + r], "id_b": ids[c],
                    "hamming": d[r, c].astype(np.int64)}))
        if not frames:
            return pd.DataFrame(columns=["id_a", "id_b", "hamming"])
        return pd.concat(frames, ignore_index=True)

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
            # hyperplanes built once per actor when the dimension is
            # known up front; lazily on the first batch otherwise
            self.planes = np.random.default_rng(seed).normal(
                size=(d, nbits)) if d else None

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
            norm = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.where(norm == 0, 1.0, norm)
            return pd.DataFrame({
                "bucket": key,
                # the all-to-all co-partitions on a bounded HASH of the
                # bucket (64 groups), not the bucket itself: one sort
                # over a small int domain instead of 2^nbits map_groups
                # invocations dragging object-dtype vectors
                "_bk": key % 64,
                "rid": np.asarray(batch[id_col]),
                "vec": list(vecs),
            })

    buck = ds.map_batches(Bucketer, fn_constructor_args=(dim,),
                          batch_format="pandas", batch_size=4096,
                          concurrency=concurrency)

    def verify_one(ids, Vall, frames):
        import pandas as pd

        chunks = [np.arange(len(ids))]
        if len(ids) > bucket_cap:
            nsub = -(-len(ids) // bucket_cap)
            sub = _stable_u64(ids) % np.uint64(nsub)
            chunks = [np.flatnonzero(sub == s) for s in range(nsub)]
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

    def verify(group):
        import pandas as pd

        g = group.sort_values(["bucket", "rid"], kind="stable")
        buckets = g["bucket"].to_numpy()
        ids = g["rid"].to_numpy()
        Vall = np.stack(g["vec"].to_numpy())
        frames = []
        # per-bucket segments of the sorted group, each verified with
        # one vectorized matmul
        cut = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        ends = np.r_[cut[1:], len(buckets)]
        for lo, hi in zip(cut, ends):
            if hi - lo >= 2:
                verify_one(ids[lo:hi], Vall[lo:hi], frames)
        if not frames:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        return pd.concat(frames, ignore_index=True)

    return (buck.groupby("_bk")
            .map_groups(lambda g: verify(g.drop(columns=["_bk"])),
                        batch_format="pandas"))


def cosine_pairs(ds, vec_col: str, id_col: str, threshold: float,
                 concurrency=(2, 8), batch_size: int = 1024):
    """EXACT cosine-similarity pairs: every (id_a < id_b) pair with
    cosine >= threshold, with the cosine value. The exact counterpart
    of `dedup_embedding` (whose LSH buckets trade recall for scale).

    Shape: the full normalized matrix is broadcast once via `ray.put`
    (read in every task, never re-shipped per batch) and each streaming
    batch multiplies against it — O(n*d) broadcast memory, O(n^2*d)
    total compute split evenly across batches. Exact all-pairs is
    inherently quadratic, so this is the small-to-medium-n baseline
    (n*d doubles must fit an actor heap: ~1 GB at n=2M, d=64); beyond
    that, use dedup_embedding's bucketed LSH.
    """
    import ray

    side = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = side[id_col].to_numpy()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in side[vec_col]])
    nrm = np.linalg.norm(V, axis=1, keepdims=True)
    V /= np.where(nrm == 0, 1.0, nrm)
    ref = ray.put((ids_all, V))

    class Pairer:
        def __init__(self):
            self.ids_all, self.V = ray.get(ref)

        def __call__(self, batch):
            import pandas as pd

            ids = np.asarray(batch[id_col])
            Q = np.stack([np.asarray(v, dtype=np.float64)
                          for v in batch[vec_col]])
            nq = np.linalg.norm(Q, axis=1, keepdims=True)
            Q = Q / np.where(nq == 0, 1.0, nq)
            sims = Q @ self.V.T
            hit = (sims >= threshold) & (ids[:, None] < self.ids_all[None, :])
            r, c = np.nonzero(hit)
            return pd.DataFrame({
                "id_a": ids[r], "id_b": self.ids_all[c],
                "cosine": sims[r, c].astype(np.float64),
            })

    return ds.map_batches(Pairer, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


def hash_band_pairs(ds, hash_col: str, id_col: str,
                    max_hamming: int = 6, n_bands: int = 8):
    """Near-dup pairs over a PRECOMPUTED 64-bit hash column (pHash /
    aHash / SimHash alike): `n_bands` equal bit-slices are the bucket
    keys — a pair within hamming h < n_bands shares at least one exact
    band (pigeonhole), so recall is total for max_hamming < n_bands.
    The default 8x8-bit banding therefore guarantees hamming <= 7.
    Verify reuses the chunked SWAR hamming matrix; pair dedup is the
    bucketed distinct pass (dedup_simhash's plan, generalized to any
    hash source). Returns {id_a, id_b, hamming}."""
    import pandas as pd

    assert max_hamming < n_bands, "pigeonhole recall needs h < bands"
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def sign(batch):
        hu = np.asarray(batch[hash_col]).astype(np.int64).view(np.uint64)
        ids = np.asarray(batch[id_col])
        keys = np.concatenate([
            (((hu >> np.uint64(band * width)) & mask).astype(np.int64)
             | np.int64(band << (width + 1)))
            for band in range(n_bands)])
        return pd.DataFrame({"band": keys,
                             "rid": np.tile(ids, n_bands),
                             "simhash": np.tile(hu.view(np.int64),
                                                n_bands)})

    # coarse hash buckets (not raw band keys / id_a) as the groupby
    # keys: ray's sort-groupby pays per-GROUP overhead, and band keys
    # number in the thousands — 64 buckets x an in-task pandas groupby
    # does the same co-partitioning at block cost (the bucketed_sum
    # lesson applied to map_groups)
    nb = 64
    sigs = ds.map_batches(sign, batch_format="pandas",
                          batch_size=4096)

    def tag_bucket(df):
        df["_bk"] = (df["band"].to_numpy(np.int64) % nb + nb) % nb
        return df

    def verify_bucket(group):
        frames = []
        for _, g in group.groupby("band", sort=False):
            g = g.drop_duplicates("rid").sort_values("rid")
            ids = g["rid"].to_numpy()
            hs = g["simhash"].to_numpy()
            n = len(ids)
            CH = 2048
            for lo in range(0, n, CH):
                d = hamming64(hs[lo:lo + CH, None], hs[None, :])
                r, c = np.nonzero(d <= max_hamming)
                keep = (lo + r) < c
                r, c = r[keep], c[keep]
                if len(r):
                    frames.append(pd.DataFrame({
                        "id_a": ids[lo + r], "id_b": ids[c],
                        "hamming": d[r, c].astype(np.int64)}))
        if not frames:
            return pd.DataFrame(columns=["id_a", "id_b", "hamming"])
        out = pd.concat(frames, ignore_index=True)
        # per-bucket pre-dedup (same band pair seen via two bands in
        # this bucket) before the pair-bucket distinct
        return out.drop_duplicates(["id_a", "id_b"])

    pairs = (sigs.map_batches(tag_bucket, batch_format="pandas",
                              batch_size=65536)
             .groupby("_bk")
             .map_groups(lambda g: verify_bucket(
                 g.drop(columns=["_bk"])), batch_format="pandas"))

    def tag_pair(df):
        if not len(df):
            return pd.DataFrame(columns=["id_a", "id_b", "hamming",
                                         "_bk"])
        df["_bk"] = ((df["id_a"].astype(np.int64) * 31
                      + df["id_b"].astype(np.int64)) % nb + nb) % nb
        return df

    def distinct(batch):
        return batch.drop_duplicates(["id_a", "id_b"]) if len(batch) \
            else pd.DataFrame(columns=["id_a", "id_b", "hamming"])

    return (pairs.map_batches(tag_pair, batch_format="pandas",
                              batch_size=65536)
            .groupby("_bk")
            .map_groups(lambda g: distinct(g.drop(columns=["_bk"])),
                        batch_format="pandas"))
