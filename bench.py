"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "headline_rows": R, "headline_rows_per_s": T}

--scaling: runs the headline spatial pipeline twice in fresh processes
(SCALING_CPUS pair, default 1,4 — the N vs 4N criterion) on the same
input and reports both throughputs plus scaling efficiency
(speedup / cpu-ratio).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_tag(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def geotag_dataset(n_rows: int, parallelism: int = 64):
    from proj_ray.pipelines import geotag_dataset as _gd

    return _gd(n_rows, parallelism)


def warmup_cluster() -> float:
    """Spin up worker processes with a trivial pipeline so measured
    pipeline timings reflect steady-state throughput, not interpreter
    start-up. Reported separately as warmup_sec."""
    import ray.data as rd

    t0 = time.time()

    def _imports(b):
        import pandas  # noqa: F401
        import ray.data  # noqa: F401

        import proj_ray.stages  # noqa: F401
        from proj_ray.functions._hash import splitmix64  # noqa: F401
        from proj_ray.images import geotags  # noqa: F401
        from proj_ray.tiles import tile_assign  # noqa: F401

        return b

    rd.range(NUM_CPUS * 2).map_batches(
        _imports, batch_format="numpy", batch_size=1).count()
    return round(time.time() - t0, 3)


def headline_spatial(n_rows: int) -> int:
    """The north-star pipeline, fused: geotags -> cells -> tiles -> PIP
    join -> per-tile aggregate. Composition lives in
    proj_ray.pipelines.spatial; the combine is a distributed
    groupby-Sum over per-batch partial (tile, count) pairs."""
    from proj_ray.pipelines import headline_spatial as _hs

    matched, _tiles = _hs(n_rows, num_cpus=NUM_CPUS, zoom=10)
    return matched


def headline_salted_agg(n_rows: int) -> int:
    """The explicit skew pass: row-level tile groupby with census ->
    salt hot tiles -> salted groupby -> merge, over the Zipf-hotspot
    geotags. Returns number of distinct tiles."""
    from proj_ray.pipelines import geotag_dataset as _gd
    from proj_ray.pipelines import tile_counts_salted

    from proj_ray.pipelines.spatial import pull_pandas

    ds = tile_counts_salted(_gd(n_rows), zoom=7,
                            threshold=max(1000, n_rows // 200), salt=16)
    # block-ref pull: iter_batches on the (already materialized) result
    # would spin a fresh streaming execution (~0.5-1 s fixed)
    return len(pull_pandas(ds))


def run_suite(sf_dir: str) -> dict:
    import __ray_entry__ as E

    import ray.data as rd

    lineitem_rows = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet").count()
    n_headline = lineitem_rows * 4

    warmup_sec = warmup_cluster()

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    matched = timed("headline_spatial", lambda: headline_spatial(n_headline))
    timed("headline_salted_agg",
          lambda: headline_salted_agg(n_headline // 4))

    def consume(ds):
        if hasattr(ds, "iter_batches"):
            n = 0
            for b in ds.iter_batches(batch_format="pyarrow"):
                n += b.num_rows
            return n
        return len(ds)

    timed("q01_pricing_summary", lambda: consume(E._q01_pricing(sf_dir)))
    timed("q05_webmerc", lambda: consume(E._q05_webmerc(sf_dir)))
    timed("q07_tile_counts", lambda: consume(E._q07_tile_counts(sf_dir)))
    timed("q09_pip_rect_join", lambda: consume(E._q09_pip_rect(sf_dir)))
    timed("q10_knn", lambda: consume(E._q10_knn(sf_dir)))
    timed("q11_dedup_exact", lambda: consume(E._q11_dedup_exact(sf_dir)))
    timed("q14_ann_cosine", lambda: consume(E._q14_ann(sf_dir)))
    timed("q16_utm", lambda: consume(E._q16_utm(sf_dir)))
    timed("q18_text_quality", lambda: consume(E._q18_text_quality(sf_dir)))
    timed("q24_dedup_images_small", lambda: consume(
        E._q24_dedup_images(sf_dir.replace("sf0.1", "sf0.01"))
        if "sf0.1" in sf_dir else E._q24_dedup_images(sf_dir)))
    timed("q33_dedup_embedding",
          lambda: consume(E._q33_dedup_embedding(sf_dir)))
    timed("q34_images_resize",
          lambda: consume(E._q34_images_resize(sf_dir)))
    timed("q35_video_frames",
          lambda: consume(E._q35_video_frames(sf_dir)))
    timed("q36_audio_features",
          lambda: consume(E._q36_audio_features(sf_dir)))
    timed("q38_sessionize", lambda: consume(E._q38_sessionize(sf_dir)))
    timed("q41_grouped_quantiles",
          lambda: consume(E._q41_grouped_quantiles(sf_dir)))
    timed("q45_dwithin_join",
          lambda: consume(E._q45_dwithin_join(sf_dir)))
    timed("q46_rolling_window",
          lambda: consume(E._q46_rolling_window(sf_dir)))
    timed("q47_pivot", lambda: consume(E._q47_pivot(sf_dir)))
    timed("q49_zonal_stats",
          lambda: consume(E._q49_zonal_stats(sf_dir)))

    # raster axis at bench scale: the driver queries size the DEM table
    # by the (fixed-size) documents table, so re-run warp + hillshade
    # over a lineitem-proportional tile count here.
    def _raster(statfn):
        from proj_ray.raster import dem_table

        return consume(statfn(dem_table(
            max(n_headline // 50, 2000),
            columns=["tile_id", "bytes", "lon0", "lat0",
                     "lon1", "lat1"])))

    from proj_ray.raster import hillshade_stats, warp_stats

    timed("raster_warp", lambda: _raster(warp_stats))
    timed("raster_hillshade", lambda: _raster(hillshade_stats))

    # pyramid: the one raster op whose pixels CROSS the shuffle (once,
    # already 4x-reduced quadrants keyed by parent tile)
    def _pyramid():
        from proj_ray.raster import dem_table, pyramid_stats

        return consume(pyramid_stats(dem_table(
            max(n_headline // 50, 2000),
            columns=["tile_id", "bytes"])))

    timed("raster_pyramid", _pyramid)

    # text axis at bench scale: TF-IDF (two corpus passes: DF
    # aggregation + broadcast-idf scoring) over a lineitem-
    # proportional synthetic corpus read from a cached stored table
    def _tfidf():
        import ray.data as rd

        from proj_ray.functions.text import tfidf_topk
        from proj_ray.images import cached_table

        n_docs = max(n_headline // 12, 20000)

        def docs_ds(n, parallelism=32):
            import numpy as np
            import pandas as pd

            vocab = np.array(
                ("the a scan sort merge join filter group window "
                 "batch stream spark table row key hash dup value "
                 "data big small slow fast query line part order "
                 "customer agg column").split(), dtype=object)

            def gen(b):
                i = np.asarray(b["id"], dtype=np.int64)
                out = []
                for k in i:
                    rng = (k * 6364136223846793005 + 1442695040888963407)
                    m = 8 + (rng >> 33) % 25
                    idx = (k * 2654435761 + np.arange(m) * 40503) \
                        % len(vocab)
                    out.append(" ".join(vocab[idx]))
                return pd.DataFrame({"doc_id": i,
                                     "text": np.array(out, dtype=object)})

            return rd.range(n, override_num_blocks=parallelism) \
                .map_batches(gen, batch_format="numpy", batch_size=4096)

        path = cached_table(docs_ds, "benchdocs", n_docs)
        ds = rd.read_parquet(path)
        return consume(tfidf_topk(ds))

    timed("tfidf_topk", _tfidf)
    timed("q51_heavy_hitters",
          lambda: consume(E._q51_heavy_hitters(sf_dir)))
    timed("q52_revenue_by_nation",
          lambda: consume(E._q52_revenue_by_nation(sf_dir)))
    timed("q71_overlay_area",
          lambda: consume(E._q71_overlay_area(sf_dir)))
    timed("q72_track_crossings",
          lambda: consume(E._q72_track_crossings(sf_dir)))
    timed("q73_substring_dedup",
          lambda: consume(E._q73_substring_dedup(sf_dir)))
    timed("q74_cube",
          lambda: consume(E._q74_cube(sf_dir)))
    timed("q75_grouped_stats",
          lambda: consume(E._q75_grouped_stats(sf_dir)))
    timed("q76_gram_matrix",
          lambda: consume(E._q76_gram_matrix(sf_dir)))
    timed("q77_profile",
          lambda: consume(E._q77_profile(sf_dir)))
    timed("q78_hex_bin",
          lambda: consume(E._q78_hex_bin(sf_dir)))
    timed("q79_inverted_index",
          lambda: consume(E._q79_inverted_index(sf_dir)))
    timed("q80_bm25",
          lambda: consume(E._q80_bm25(sf_dir)))
    timed("q81_dedup_incremental",
          lambda: consume(E._q81_dedup_incremental(sf_dir)))
    timed("q82_minhash_incremental",
          lambda: consume(E._q82_minhash_incremental(sf_dir)))
    timed("q83_ivf_append",
          lambda: consume(E._q83_ivf_append(sf_dir)))
    timed("q84_json_stats",
          lambda: consume(E._q84_json_stats(sf_dir)))
    timed("q85_pack_sequences",
          lambda: consume(E._q85_pack_sequences(sf_dir)))
    timed("q86_bloom_semi_join",
          lambda: consume(E._q86_bloom_semi_join(sf_dir)))
    timed("q87_gopher_quality",
          lambda: consume(E._q87_gopher_quality(sf_dir)))
    timed("q88_bloom_anti_join",
          lambda: consume(E._q88_bloom_anti_join(sf_dir)))
    timed("q89_decontaminate",
          lambda: consume(E._q89_decontaminate(sf_dir)))
    timed("q90_centroid_outliers",
          lambda: consume(E._q90_centroid_outliers(sf_dir)))
    timed("q91_gram_coverage",
          lambda: consume(E._q91_gram_coverage(sf_dir)))
    timed("q92_clip_retrieval",
          lambda: consume(E._q92_clip_retrieval(sf_dir)))
    timed("q93_geo_clip_retrieval",
          lambda: consume(E._q93_geo_clip_retrieval(sf_dir)))
    timed("q94_resample_ffill",
          lambda: consume(E._q94_resample_ffill(sf_dir)))
    timed("q95_top_percentile",
          lambda: consume(E._q95_top_percentile(sf_dir)))
    timed("q96_latest_by_key",
          lambda: consume(E._q96_latest_by_key(sf_dir)))
    timed("q97_curation_pipeline",
          lambda: consume(E._q97_curation_pipeline(sf_dir)))
    timed("q98_split_assign",
          lambda: consume(E._q98_split_assign(sf_dir)))
    timed("q99_bpe_pairs",
          lambda: consume(E._q99_bpe_pairs(sf_dir)))
    timed("q100_source_overlap",
          lambda: consume(E._q100_source_overlap(sf_dir)))
    timed("q101_jpeg_fidelity",
          lambda: consume(E._q101_jpeg_fidelity(sf_dir)))
    timed("q102_pii_redact",
          lambda: consume(E._q102_pii_redact(sf_dir)))
    timed("q103_repetition_filter",
          lambda: consume(E._q103_repetition_filter(sf_dir)))
    timed("q104_pagerank",
          lambda: consume(E._q104_pagerank(sf_dir)))
    timed("q105_funnel",
          lambda: consume(E._q105_funnel(sf_dir)))
    timed("q106_retention",
          lambda: consume(E._q106_retention(sf_dir)))
    timed("q107_snapshot_diff",
          lambda: consume(E._q107_snapshot_diff(sf_dir)))
    timed("q108_salted_join",
          lambda: consume(E._q108_salted_join(sf_dir)))
    timed("q109_map_match",
          lambda: consume(E._q109_map_match(sf_dir)))
    timed("q110_idw_grid",
          lambda: consume(E._q110_idw_grid(sf_dir)))
    timed("q111_contours",
          lambda: consume(E._q111_contours(sf_dir)))
    timed("q112_triangles",
          lambda: consume(E._q112_triangles(sf_dir)))
    timed("q113_image_patches",
          lambda: consume(E._q113_image_patches(sf_dir)))
    timed("q114_scd2",
          lambda: consume(E._q114_scd2(sf_dir)))
    timed("q115_hilbert",
          lambda: consume(E._q115_hilbert(sf_dir)))
    timed("q116_late_events",
          lambda: consume(E._q116_late_events(sf_dir)))
    timed("q117_cross_track",
          lambda: consume(E._q117_cross_track(sf_dir)))
    timed("q118_kmeans_lloyd",
          lambda: consume(E._q118_kmeans_lloyd(sf_dir)))
    timed("q119_dbscan_core",
          lambda: consume(E._q119_dbscan_core(sf_dir)))
    timed("q120_hotspots",
          lambda: consume(E._q120_hotspots(sf_dir)))
    timed("q121_ahash_neardup",
          lambda: consume(E._q121_ahash_neardup(sf_dir)))
    timed("q122_fuzzy_join",
          lambda: consume(E._q122_fuzzy_join(sf_dir)))
    timed("q123_skyline",
          lambda: consume(E._q123_skyline(sf_dir)))
    timed("q124_kmv_distinct",
          lambda: consume(E._q124_kmv_distinct(sf_dir)))
    timed("q125_priority_sample",
          lambda: consume(E._q125_priority_sample(sf_dir)))
    timed("q126_bfs_hops",
          lambda: consume(E._q126_bfs_hops(sf_dir)))
    timed("q127_dominant_color",
          lambda: consume(E._q127_dominant_color(sf_dir)))
    timed("q128_count_min",
          lambda: consume(E._q128_count_min(sf_dir)))
    timed("q129_pq_adc",
          lambda: consume(E._q129_pq_adc(sf_dir)))
    timed("q130_staypoints",
          lambda: consume(E._q130_staypoints(sf_dir)))
    timed("q131_rrf_fusion",
          lambda: consume(E._q131_rrf_fusion(sf_dir)))
    timed("q132_sharpness",
          lambda: consume(E._q132_sharpness(sf_dir)))
    timed("q133_scene_cuts",
          lambda: consume(E._q133_scene_cuts(sf_dir)))
    timed("q134_simplify",
          lambda: consume(E._q134_simplify(sf_dir)))
    timed("q135_hex_smooth",
          lambda: consume(E._q135_hex_smooth(sf_dir)))
    timed("q136_sssp",
          lambda: consume(E._q136_sssp(sf_dir)))
    timed("q137_weighted_median",
          lambda: consume(E._q137_weighted_median(sf_dir)))
    timed("q138_transitions",
          lambda: consume(E._q138_transitions(sf_dir)))
    timed("q139_trend",
          lambda: consume(E._q139_trend(sf_dir)))
    timed("q140_cdc_chunks",
          lambda: consume(E._q140_cdc_chunks(sf_dir)))
    timed("q141_stratified_priority",
          lambda: consume(E._q141_stratified_priority(sf_dir)))
    timed("q142_hist_equalize",
          lambda: consume(E._q142_hist_equalize(sf_dir)))
    timed("q143_hist_quantile",
          lambda: consume(E._q143_hist_quantile(sf_dir)))
    timed("q144_dwell_time",
          lambda: consume(E._q144_dwell_time(sf_dir)))
    timed("q145_corr_matrix",
          lambda: consume(E._q145_corr_matrix(sf_dir)))
    timed("q146_source_similarity",
          lambda: consume(E._q146_source_similarity(sf_dir)))
    timed("q147_voronoi_assign",
          lambda: consume(E._q147_voronoi_assign(sf_dir)))
    timed("q148_gyration",
          lambda: consume(E._q148_gyration(sf_dir)))
    timed("q149_peak_hour",
          lambda: consume(E._q149_peak_hour(sf_dir)))
    timed("q150_gini",
          lambda: consume(E._q150_gini(sf_dir)))

    total = round(sum(timings.values()), 3)
    return {
        "metric": "spatial-join+tile-assignment suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_tag(sf_dir),
        "num_cpus": NUM_CPUS,
        "headline_rows": n_headline,
        "headline_matched_rows": matched,
        "headline_rows_per_s": round(
            n_headline / timings["headline_spatial"], 1),
        "warmup_sec": warmup_sec,
    }


def run_headline_once(sf_dir: str, num_cpus: int) -> dict:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    warmup = warmup_cluster()
    # scaling runs need enough per-core work that the ~0.4 s fixed
    # pipeline overhead (planning + first-task latency + final drain)
    # is amortized at the 4N level too: 192 rows per lineitem row
    # puts the 4-cpu run at ~15 s (overhead < 3%)
    lineitem_rows = rd.read_parquet(f"{sf_dir}/lineitem.parquet").count()
    n = lineitem_rows * int(os.environ.get("SCALING_ROWS_MULT", "192"))
    _ = warmup
    t0 = time.time()
    matched = headline_spatial(n)
    dt = time.time() - t0
    ray.shutdown()
    return {"num_cpus": num_cpus, "rows": n, "matched": matched,
            "sec": round(dt, 3), "rows_per_s": round(n / dt, 1)}


def run_shuffle_once(sf_dir: str, num_cpus: int) -> dict:
    """One salted-aggregate run (the shuffle-heavy pipeline: census ->
    salt hot tiles -> salted groupby -> merge) in a fresh Ray session —
    the scaling evidence for an ALL-TO-ALL-bound stage, complementing
    the map-bound headline."""
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    warmup_cluster()
    lineitem_rows = rd.read_parquet(f"{sf_dir}/lineitem.parquet").count()
    n = lineitem_rows * int(os.environ.get("SCALING_SHUFFLE_MULT", "40"))
    # warm the sort/groupby execution path at tiny n: the FIRST
    # all-to-all in a fresh session pays ~1.3 s of one-time setup
    # (worker import + sort codepath), which would otherwise be
    # counted against the 4-cpu side disproportionately
    from proj_ray.pipelines import tile_counts_salted_fused

    _ = tile_counts_salted_fused(200_000, zoom=7, salt=16,
                                 num_cpus=num_cpus)
    # two timed passes, best reported: the first full-size pass still
    # pays one-time session costs the tiny warmup can't reach (worker
    # heap/allocator growth to full batch size, object-store mmap);
    # steady-state throughput is what the 100-TB regime sees, and it
    # matches the --scaling harness's own best-of-repeats protocol
    dt, tiles = None, 0
    for _pass in range(2):
        t0 = time.time()
        if os.environ.get("SCALING_SHUFFLE_CENSUS", "0") == "1":
            # legacy three-execution censused path (the Dataset-input
            # API), kept measurable for A/B against the fused path
            tiles = headline_salted_agg(n)
        else:
            tiles = len(tile_counts_salted_fused(n, zoom=7, salt=16,
                                                 num_cpus=num_cpus))
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
    ray.shutdown()
    return {"num_cpus": num_cpus, "rows": n, "tiles": tiles,
            "sec": round(dt, 3), "rows_per_s": round(n / dt, 1)}


def main() -> None:
    if "--headline-once" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--headline-once") + 1])
        print(json.dumps(run_headline_once(SF_DIR, cpus)))
        return
    if "--shuffle-once" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--shuffle-once") + 1])
        print(json.dumps(run_shuffle_once(SF_DIR, cpus)))
        return
    if "--scaling" in sys.argv:
        # N and 4N parallelism levels. This sandbox's host delivers only
        # ~8-11 effective cores regardless of the 32 visible CPUs (shared
        # host; measured with an independent multiprocessing burn test),
        # so the honest two-level comparison that stays within real
        # hardware is 2 -> 8. Override with SCALING_CPUS=8,32.
        pair = os.environ.get("SCALING_CPUS", "1,4")
        repeats = int(os.environ.get("SCALING_REPEATS", "2"))
        results = []
        for cpus in (int(x) for x in pair.split(",")):
            best = None
            for _ in range(repeats):
                out = subprocess.run(
                    [sys.executable, __file__, "--headline-once", str(cpus)],
                    capture_output=True, text=True, check=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)))
                r = json.loads(out.stdout.strip().splitlines()[-1])
                if best is None or r["sec"] < best["sec"]:
                    best = r
            results.append(best)
        lo, hi = results
        speedup = lo["sec"] / hi["sec"]
        eff = speedup / (hi["num_cpus"] / lo["num_cpus"])
        out = {
            "metric": "headline spatial pipeline scaling N->4N cpus",
            "value": round(eff, 3),
            "unit": "efficiency",
            "runs": results,
            "speedup": round(speedup, 3),
            "sf": _sf_tag(SF_DIR),
        }
        if os.environ.get("SCALING_SHUFFLE", "0") == "1":
            # secondary evidence: the shuffle-bound salted-aggregate
            # pipeline at the same two levels (best of SCALING_REPEATS
            # per level — same protocol as the headline pairs; the
            # shared host's minute-scale load swings otherwise
            # dominate a single 5-15 s run)
            sres = []
            for cpus in (int(x) for x in pair.split(",")):
                best = None
                for _ in range(repeats):
                    o = subprocess.run(
                        [sys.executable, __file__, "--shuffle-once",
                         str(cpus)],
                        capture_output=True, text=True, check=True,
                        cwd=os.path.dirname(os.path.abspath(__file__)))
                    r = json.loads(o.stdout.strip().splitlines()[-1])
                    if best is None or r["sec"] < best["sec"]:
                        best = r
                sres.append(best)
            slo, shi = sres
            sspeed = slo["sec"] / shi["sec"]
            out["shuffle_runs"] = sres
            out["shuffle_speedup"] = round(sspeed, 3)
            out["shuffle_efficiency"] = round(
                sspeed / (shi["num_cpus"] / slo["num_cpus"]), 3)
        print(json.dumps(out))
        return
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if os.environ.get("BENCH_NO_RESERVATION", "0") == "1":
        # A/B probe: Ray Data's op resource reservation measurably
        # starves map stages feeding an all-to-all at small cpu counts
        # (see tile_counts_salted_fused); this flag measures the same
        # effect on the whole suite
        DataContext.get_current().op_resource_reservation_enabled = False
    result = run_suite(SF_DIR)
    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
