"""q147 Voronoi assignment: every doc assigns to its true nearest
seed (scipy-free brute check)."""
import numpy as np

import __ray_entry__ as E


def test_voronoi_counts_match_brute(ray_session):
    got = E._q147_voronoi_assign("/root/testdata/sf0.001")
    # brute: recompute assignment for all docs driver-side
    import duckdb
    con = duckdb.connect()
    ids = con.execute(
        "SELECT doc_id FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet')").df()["doc_id"] \
        .to_numpy(np.int64)
    lon = np.radians((ids * 61803 % 360000) / 1000.0 - 180.0)
    lat = np.radians((ids * 75487 % 170000) / 1000.0 - 85.0)
    j = np.arange(20)
    slon = np.radians((j * 61803 % 360000) / 1000.0 - 180.0)
    slat = np.radians((j * 75487 % 170000) / 1000.0 - 85.0)
    sp = np.sin((lat[:, None] - slat[None, :]) / 2) ** 2
    sl = np.sin((lon[:, None] - slon[None, :]) / 2) ** 2
    a = sp + np.cos(lat)[:, None] * np.cos(slat)[None, :] * sl
    d = 2 * 6371000.0 * np.arcsin(np.sqrt(np.minimum(a, 1.0)))
    tmm = np.rint(d * 10000).astype(np.int64)
    seeds = np.argmin(tmm, axis=1)
    want_n = np.bincount(seeds, minlength=20)
    have = np.zeros(20, np.int64)
    have[got["seed"].to_numpy()] = got["n"].to_numpy()
    assert np.array_equal(have, want_n)
    assert int(got["n"].sum()) == len(ids)
