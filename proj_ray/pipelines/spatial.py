"""The headline spatial pipeline: synth geotags -> webmerc cells ->
z/x/y tiles -> PIP join vs broadcast polygon index -> per-tile counts.

Two aggregation paths:
- `headline_spatial`: fused actor stage emits per-batch partial
  (tile, count) pairs; the groupby-Sum combine moves O(#tiles × #blocks)
  rows — the shuffle-minimal shape.
- `tile_counts_salted`: the explicit skew path for row-level shuffles —
  census pass finds hot keys (images.geotags plants Zipfian metro
  hotspots), hot keys split into `salt` deterministic sub-keys before
  the groupby, partial counts merged after. Counts are identical with
  and without salting (tests assert it); the salt bounds the largest
  single reducer group at 100-TB skew.
"""

from __future__ import annotations

import numpy as np


from proj_ray.dsutil import pull_pandas  # noqa: F401  (re-export)


def geotag_dataset(n_rows: int, parallelism: int | None = None):
    """Geotagged rows without pixel payloads: the spatial-bench input
    (arithmetic-only synthesis, embarrassingly parallel).

    Synthesis hangs off rd.range so every block carries its REAL row
    count: a from_items shard-descriptor source (1-row blocks) let
    downstream maps with explicit batch_size (with_tiles' 128k)
    BUNDLE the whole input into 1-9 fused tasks — the salted-agg
    pipeline ran near-serial at any cpu count (36 s for 24M rows at 4
    cpus vs 11.6 s after this fix; scaling eff 0.25 -> ~0.9)."""
    import ray.data as rd

    from proj_ray.images import geotags

    if parallelism is None:
        # size by BLOCK ROWS, not block count: ~384k rows/block keeps
        # every per-block temporary under glibc's mmap threshold (the
        # round-5 chunking lesson) at any input size, with a floor of
        # 64 blocks so small inputs still parallelize
        parallelism = max(64, (n_rows + 384_000 - 1) // 384_000)

    def gen(batch: dict) -> dict:
        idx = np.asarray(batch["id"], dtype=np.int64)
        lon, lat = geotags(idx)
        return {"image_id": idx, "lon": lon, "lat": lat}

    return rd.range(n_rows, override_num_blocks=max(parallelism, 1)) \
        .map_batches(gen, batch_format="numpy")


class FusedSpatialStage:
    """One fused actor stage: synth geotags -> webmerc cells -> z/x/y
    tiles -> PIP join -> per-batch partial tile counts.

    The polygon index is fetched from the object store once per actor;
    the whole per-row path is a single pass over NumPy arrays, so the
    only shuffle left is the tiny (tile, partial_count) groupby. This is
    the fuse-the-sandwich pattern (SURVEY §1.5: compose kernels inside
    ONE map_batches fn)."""

    CHUNK = 65536  # rows per inner pass: ~3 MB working set stays cache-
    # resident, easing memory-bandwidth contention across workers

    def __init__(self, index_ref, zoom: int, totals_only: bool = False):
        self.index_ref = index_ref
        self.index = None
        self.zoom = zoom
        # totals_only: emit one (0, batch_total) row instead of per-tile
        # partials — the minimal sufficient statistic when the consumer
        # only needs the matched count
        self.totals_only = totals_only

    def __call__(self, batch: dict) -> dict:
        if self.index is None:
            import ray

            self.index = ray.get(self.index_ref)
        from proj_ray.cells import cell_id
        from proj_ray.images import geotags
        from proj_ray.tiles import tile_assign

        outs = []
        for s, c in zip(batch["start"], batch["count"]):
            s = int(s)
            c = int(c)
            for cs in range(s, s + c, self.CHUNK):
                idx = np.arange(cs, min(cs + self.CHUNK, s + c),
                                dtype=np.int64)
                lon, lat = geotags(idx)
                cell = cell_id(lon, lat, self.zoom)
                tx, ty, valid = tile_assign(lon, lat, self.zoom)
                pts, polys = self.index.query(lon, lat)
                kept = pts[valid[pts]]
                key = tx[kept] * np.int64(1 << 30) + ty[kept]
                _ = cell  # cell ids computed to exercise the kernel path
                cells_u, counts = np.unique(key, return_counts=True)
                if self.totals_only:
                    outs.append((np.zeros(1, np.int64),
                                 np.array([counts.sum()], np.int64)))
                else:
                    outs.append((cells_u, counts))
        keys = np.concatenate([o[0] for o in outs]) if outs else \
            np.empty(0, np.int64)
        cnts = np.concatenate([o[1] for o in outs]) if outs else \
            np.empty(0, np.int64)
        return {"tile_key": keys, "partial_n": cnts.astype(np.int64)}


def default_polygon_index():
    """The bench/driver 16-rectangle layer as a PolygonIndex."""
    from proj_ray.join import PolygonIndex

    rects = [(j, -180.0 + j * 22.0 + 0.0005,
              -60.0 + (j % 8) * 15.0 + 0.0005, 18.0, 12.0)
             for j in range(16)]
    ids = [r[0] for r in rects]
    rx = [np.array([x0, x0 + w, x0 + w, x0]) for _, x0, y0, w, h in rects]
    ry = [np.array([y0, y0, y0 + h, y0 + h]) for _, x0, y0, w, h in rects]
    return PolygonIndex(ids, rx, ry)


def headline_spatial(n_rows: int, num_cpus: int = 32, zoom: int = 10,
                     index=None, combine: str = "total"):
    """Run the fused pipeline; returns (matched_rows, tile_counts_df).

    combine="total" (the benchmark metric): per-batch partial (tile,
    count) pairs stream to the driver and only their sum is kept — no
    shuffle. combine="tiles": materialize per-tile counts with a
    distributed groupby-Sum. Note the synthetic geotags have no
    spatial locality per block, so at zoom 10 partial counts barely
    compress (~#matched rows of partials) and the groupby is a real
    shuffle — that per-tile path is benchmarked separately
    (tile_counts_salted), where the salt also handles the Zipf
    hotspots."""
    import ray
    import ray.data as rd

    ref = ray.put(index if index is not None else default_polygon_index())
    par = max(num_cpus * 4, 16)
    shard = max(1, n_rows // par)
    items = [{"start": s, "count": min(shard, n_rows - s)}
             for s in range(0, n_rows, shard)]
    stage = FusedSpatialStage(ref, zoom, totals_only=(combine == "total"))
    ds = rd.from_items(items).map_batches(
        stage, batch_format="numpy", batch_size=4)
    if combine == "tiles":
        agg = bucketed_sum(ds, "tile_key", "partial_n", "n").to_pandas()
        return int(agg["n"].sum()), agg
    total = 0
    for b in ds.iter_batches(batch_format="numpy"):
        total += int(b["partial_n"].sum())
    return total, None


def bucketed_sum(parts, key_col: str, val_col: str, out_col: str,
                 n_buckets: int | None = None):
    """Distributed sum-combine of a (key, partial) table: hash keys
    into a SMALL int bucket domain, co-partition on the bucket, one
    vectorized unique+add.at pass per bucket.

    This deliberately avoids `groupby(key).aggregate(Sum(...))`:
    ray.data's sort-aggregate runs a Python loop over every KEY on
    both the map and reduce sides (~80 us/row measured — 4.9 s for a
    131k-row partial table at 4 cpus), while this shape prices the
    same all-to-all at ~1 s because the sort domain is `n_buckets`
    small ints and all per-key work is NumPy. Size `n_buckets` so
    distinct-keys / n_buckets rows fit a worker heap (defaults to
    4 x cluster CPUs; thousands at the 100-TB target)."""
    import pandas as pd
    import ray

    from proj_ray.functions._hash import splitmix64

    if n_buckets is None:
        n_buckets = 4 * max(1, int(ray.cluster_resources().get("CPU", 8)))

    def add_bk(b: dict) -> dict:
        k = np.asarray(b[key_col], dtype=np.int64)
        bk = (splitmix64(k) % np.uint64(n_buckets)).astype(np.int64)
        return {key_col: k, val_col: b[val_col], "_bk": bk}

    def comb(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy()
        n = g[val_col].to_numpy()
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, n)
        return pd.DataFrame({key_col: uk, out_col: s})

    return (parts.map_batches(add_bk, batch_format="numpy")
            .groupby("_bk")
            .map_groups(lambda g: comb(g.drop(columns=["_bk"])),
                        batch_format="pandas"))


class FusedSaltedTileStage:
    """One fused stage for the shuffle bench: synth geotags -> tile
    assignment -> per-batch unique-combine -> UNCONDITIONAL two-level
    salt, over {start, count} shard descriptors (so no row-wide data
    ever crosses an operator boundary — the round-5 lesson: each
    boundary pays an Arrow block build + batch re-slice ~0.3 us/row,
    which HALVED the map phase's throughput when synthesis and tiling
    were separate operators).

    Census-free salting: every key gets a per-batch deterministic
    sub-key (not only census-detected hot keys). Because the stage
    emits pre-combined partials, the salt inflates only the final
    merged table (<= #tiles x salt rows), never the shuffle volume —
    each partial row carries exactly one salted key. Skew bound: a hot
    tile's partials (one row per contributing batch) split across
    `salt` reducer sub-keys, same guarantee the censused path gives,
    with zero barrier jobs. This is the classic two-phase/salted
    aggregation (pre-aggregate locally, re-aggregate by salted key)."""

    CHUNK = 384_000  # rows per inner pass: temporaries stay under
    # glibc's mmap threshold (the round-5 kernel-chunking lesson)

    def __init__(self, zoom: int, salt: int):
        self.zoom = zoom
        self.salt = salt

    def __call__(self, batch: dict) -> dict:
        from proj_ray.functions._hash import splitmix64
        from proj_ray.images import geotags
        from proj_ray.tiles import tile_assign

        ks, ns = [], []
        for s, c in zip(batch["start"], batch["count"]):
            s = int(s)
            c = int(c)
            for cs in range(s, s + c, self.CHUNK):
                idx = np.arange(cs, min(cs + self.CHUNK, s + c),
                                dtype=np.int64)
                lon, lat = geotags(idx)
                tx, ty, _valid = tile_assign(lon, lat, self.zoom)
                key = tx * np.int64(1 << 30) + ty
                uk, cnt = np.unique(key, return_counts=True)
                ks.append(uk)
                ns.append(cnt.astype(np.int64))
        k = np.concatenate(ks) if ks else np.empty(0, np.int64)
        n = np.concatenate(ns) if ns else np.empty(0, np.int64)
        # combine across the batch's chunks, then salt with one
        # deterministic content-derived sub-key per batch
        uk, inv = np.unique(k, return_inverse=True)
        sm = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sm, inv, n)
        sub = np.int64(splitmix64(np.asarray(
            [abs(int(sm.sum())) + len(sm)], dtype=np.uint64))[0]
            % np.uint64(self.salt))
        return {"cell_salted": uk * np.int64(self.salt) + sub,
                "n_part": sm}


def tile_counts_salted_fused(n_rows: int, zoom: int = 7, salt: int = 16,
                             num_cpus: int | None = None):
    """Census-free salted per-tile counts in ONE streaming execution:
    fused shard-descriptor stage (synthesis + tiling + local combine +
    salt) -> bucketed_sum all-to-all -> driver un-salt merge.

    The censused `tile_counts_salted` needs three executions (map+
    materialize, coalesce, salted combine) around the census barrier;
    this path needs one, because unconditional salting removes the
    need to KNOW which keys are hot before the shuffle. Returns a
    pandas DataFrame of (tile_key, n) — counts are identical to the
    censused and unsalted paths (tests assert parity).

    Two measured scheduling decisions (each worth >2x wall time at
    small cpu counts):
    - op resource reservation OFF for this execution: with an
      all-to-all (Sort) in the plan, Ray Data's reservation allocator
      pins most CPUs for downstream ops and runs the map stage nearly
      serially at <=4 cpus (measured 12 tasks x 0.57 s CPU taking
      6.9 s wall on 4 cpus; 1.9 s with reservation off). The plan here
      is map -> tiny sort -> map with bounded partial tables, so
      starvation protection buys nothing.
    - coarse shards, one task per cpu: tasks = num_cpus (par = 2x
      shards bundled 2/batch), since the synthetic work is perfectly
      uniform; more shards only multiply partial rows (one row per
      distinct salted key PER BATCH) and task-launch gaps. Shard size
      is capped at 24 M rows so a 100-TB input still gets balanced,
      retryable tasks rather than hour-long ones."""
    import pandas as pd
    import ray
    import ray.data as rd
    from ray.data import DataContext

    if num_cpus is None:
        num_cpus = int(ray.cluster_resources().get("CPU", 8))
    par = max(2 * num_cpus, 2, -(-n_rows // 24_000_000))
    shard = max(1, n_rows // par)
    items = [{"start": s, "count": min(shard, n_rows - s)}
             for s in range(0, n_rows, shard)]
    stage = FusedSaltedTileStage(zoom, salt)
    ctx = DataContext.get_current()
    saved = ctx.op_resource_reservation_enabled
    ctx.op_resource_reservation_enabled = False
    try:
        parts = rd.from_items(items).map_batches(
            stage, batch_format="numpy", batch_size=2)
        merged = bucketed_sum(parts, "cell_salted", "n_part", "n_sub")
        outs = []
        for b in merged.iter_batches(batch_format="numpy"):
            outs.append(pd.DataFrame({
                "tile_key": np.asarray(b["cell_salted"]) // salt,
                "n_sub": np.asarray(b["n_sub"], dtype=np.int64)}))
    finally:
        ctx.op_resource_reservation_enabled = saved
    mdf = pd.concat(outs, ignore_index=True) if outs else \
        pd.DataFrame({"tile_key": [], "n_sub": []})
    return (mdf.groupby("tile_key", as_index=False)["n_sub"].sum()
            .rename(columns={"n_sub": "n"}))


def tile_counts_salted(ds, zoom: int = 7, threshold: int | None = None,
                       salt: int = 16, key_col: str = "image_id",
                       salted: bool = True, cache: bool = True):
    """Per-tile counts with explicit skew handling: census -> salt hot
    tile keys -> salted groupby -> merge.

    Shuffle-minimal shape: every groupby input is pre-aggregated inside
    map_batches first, so the all-to-all moves O(#distinct keys per
    block), never raw rows — the salt's job is to split what would
    still be a hot reducer key across `salt` sub-keys. The keyed
    projection (key, tile_key — 16 B/row) is materialized once so the
    census and the counting pass don't re-execute the input lineage.

    `salted=False` runs the same flow without the salt (for parity
    checks and A/B timing). Returns a Dataset of (tile_key, n).

    Round-3 fusion: the per-block partial counts are computed ONCE and
    materialized; the census AND the salted groupby both consume that
    (tile, n_part) table — the raw rows are read exactly once, and both
    all-to-alls move pre-combined partials. Hot tiles' partials are
    salted with a per-batch deterministic sub-key (a hot reducer group
    has one row per contributing block; the salt splits it `salt`
    ways).

    Round-5 fusion: tile assignment, key packing and the per-block
    unique-combine run in ONE map_batches fn on whole blocks
    (batch_size=None). Three separate map operators, even auto-fused
    by Ray into one task, paid an Arrow block build + batch slice at
    EVERY operator boundary — measured ~0.3 us/row/boundary, 22 s of
    the 33 s single-cpu map phase at 24 M rows; the hand-fused fn is
    wall-time ~= UDF-time."""

    def tile_partials(b: dict) -> dict:
        from proj_ray.tiles import tile_assign

        tx, ty, _valid = tile_assign(b["lon"], b["lat"], zoom)
        key = tx * np.int64(1 << 30) + ty
        keys, counts = np.unique(key, return_counts=True)
        return {"tile_key": keys, "n_part": counts.astype(np.int64)}

    keyed = ds.map_batches(tile_partials, batch_format="numpy",
                           batch_size=None)

    def coalesced_partials():
        """Partial counts, COALESCED to ~2 blocks per CPU with a
        second unique-combine pass: the downstream groupby's sort
        exchange prices O(map_blocks x reducers) objects whichever
        combine implementation consumes it (64 16k-row partial blocks
        measured ~5 s slower end-to-end than the same rows in 8
        blocks, even under bucketed_sum), and the re-combine also
        collapses duplicate tile keys across merged blocks so the
        census reads O(#tiles x coalesced_blocks) rows."""
        import ray

        def combine(b: dict) -> dict:
            k = np.asarray(b["tile_key"])
            n = np.asarray(b["n_part"], dtype=np.int64)
            uk, inv = np.unique(k, return_inverse=True)
            s = np.zeros(len(uk), dtype=np.int64)
            np.add.at(s, inv, n)
            return {"tile_key": uk, "n_part": s}

        ncpu = int(ray.cluster_resources().get("CPU", 8))
        # two jobs on purpose: an IN-CHAIN repartition becomes the
        # whole plan's block target and re-serializes the heavy
        # synthesis maps; materializing first keeps those at full
        # parallelism, and the coalesce job touches only the small
        # partial table
        p = keyed.materialize()
        if p.num_blocks() > 2 * ncpu:
            p = (p.repartition(2 * ncpu)
                 .map_batches(combine, batch_format="numpy",
                              batch_size=None)
                 .materialize())
        return p

    if not salted:
        return bucketed_sum(coalesced_partials(),
                            "tile_key", "n_part", "n")
    if threshold is None:
        threshold = 10000
    parts = coalesced_partials()
    # census over the SAME materialized partials: driver-local pandas
    # when the partial table is bounded (#tiles x #blocks rows), a
    # distributed groupby above local_cap
    local_cap = 4_000_000
    if parts.count() <= local_cap:
        cdf = pull_pandas(parts)
        cen = cdf.groupby("tile_key")["n_part"].sum()
        hot_sorted = np.sort(
            cen.index.to_numpy()[cen.to_numpy() >= threshold]
            .astype(np.int64))
    else:
        census = bucketed_sum(parts, "tile_key", "n_part", "n")
        hot: set[int] = set()
        for b in census.iter_batches(batch_format="numpy"):
            sel = np.asarray(b["n"]) >= threshold
            hot.update(int(c) for c in np.asarray(b["tile_key"])[sel])
        hot_sorted = np.sort(
            np.fromiter(hot, dtype=np.int64, count=len(hot)))

    def salt_parts(b: dict) -> dict:
        from proj_ray.functions._hash import splitmix64

        keys = np.asarray(b["tile_key"], dtype=np.int64)
        n = np.asarray(b["n_part"], dtype=np.int64)
        if len(hot_sorted):
            pos = np.searchsorted(hot_sorted, keys)
            pos[pos >= len(hot_sorted)] = 0
            is_hot = hot_sorted[pos] == keys
        else:
            is_hot = np.zeros(len(keys), dtype=bool)
        # one deterministic content-derived sub-key per batch: each
        # block's partial for a hot tile lands on one of `salt` reducers
        sub = np.int64(splitmix64(np.asarray(
            [abs(int(n.sum())) + len(n)], dtype=np.uint64))[0]
            % np.uint64(salt))
        return {"cell_salted": keys * np.int64(salt)
                + np.where(is_hot, sub, np.int64(0)),
                "n_part": n}

    part = bucketed_sum(parts.map_batches(salt_parts,
                                          batch_format="numpy"),
                        "cell_salted", "n_part", "n_sub").materialize()
    # un-salt merge: the salted output is <= #tiles + #hot*salt rows;
    # merge driver-local under the cap, distributed groupby above it
    if part.count() <= local_cap:
        import ray.data as rd

        mdf = pull_pandas(part)
        mdf["tile_key"] = mdf["cell_salted"] // salt
        out = (mdf.groupby("tile_key", as_index=False)["n_sub"].sum()
               .rename(columns={"n_sub": "n"}))
        return rd.from_pandas(out)

    def unsalt(b: dict) -> dict:
        return {"tile_key": np.asarray(b["cell_salted"]) // salt,
                "n_sub": b["n_sub"]}

    return bucketed_sum(part.map_batches(unsalt, batch_format="numpy"),
                        "tile_key", "n_sub", "n")
