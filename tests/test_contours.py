"""Marching-squares contour classification: scalar parity, planted
shapes, and the edge-consistency invariant."""

import numpy as np

from proj_ray.raster import dem_decode, dem_values, marching_cases


def test_cases_match_scalar():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (12, 12)).astype(np.uint8)
    cs = marching_cases(px, 128)
    for r in range(11):
        for c in range(11):
            b = lambda rr, cc: 1 if px[rr, cc] >= 128 else 0
            exp = (b(r, c) + 2 * b(r, c + 1)
                   + 4 * b(r + 1, c + 1) + 8 * b(r + 1, c))
            assert cs[r, c] == exp


def test_planted_shapes():
    # uniform below threshold -> all case 0; above -> all 15
    lo = np.zeros((8, 8), dtype=np.uint8)
    hi = np.full((8, 8), 200, dtype=np.uint8)
    assert (marching_cases(lo) == 0).all()
    assert (marching_cases(hi) == 15).all()
    # single hot pixel in the middle -> 4 crossed cells, one per corner
    one = lo.copy()
    one[4, 4] = 255
    cs = marching_cases(one)
    crossed = ((cs != 0) & (cs != 15)).sum()
    assert crossed == 4
    assert sorted(cs[cs != 0].tolist()) == [1, 2, 4, 8]


def test_edge_consistency_invariant():
    """Contour segments pair up across shared cell edges: the total
    number of threshold sign changes along all horizontal pixel
    adjacencies equals the number of vertical cell-edge crossings
    counted from the case masks (and symmetrically). Catches any bit
    order / orientation regression."""
    px = dem_values(12345)  # deterministic 32x32 tile
    b = (px.astype(int) >= 128).astype(int)
    cs = marching_cases(px)
    # vertical edge between (r,c)-(r,c+1) for every pixel row
    sign_changes_h = int(np.abs(np.diff(b, axis=1)).sum())
    # from cases: bottom edge of cell crossed iff bit SW != bit SE
    bottom = ((cs & 1 > 0) != ((cs >> 1) & 1 > 0)).sum()
    top = (((cs >> 3) & 1 > 0) != ((cs >> 2) & 1 > 0)).sum()
    # every horizontal adjacency is the bottom edge of the cell above
    # it (rows 0..30) or the top edge of the cell below (rows 1..31);
    # interior adjacencies are counted twice across the two sums
    row0 = int(np.abs(np.diff(b[0:1], axis=1)).sum())
    row_last = int(np.abs(np.diff(b[-1:], axis=1)).sum())
    assert int(bottom + top) == 2 * sign_changes_h - row0 - row_last


def test_contour_stats_roundtrip(ray_session):
    import ray.data as rd
    import pandas as pd

    from proj_ray.raster import contour_stats, dem_encode

    ids = np.arange(24, dtype=np.int64)
    rows = pd.DataFrame({
        "tile_id": ids,
        "bytes": [dem_encode(dem_values(int(i))) for i in ids]})
    out = contour_stats(rd.from_pandas(rows).repartition(3)).to_pandas()
    assert len(out) == 24
    for _, row in out.iterrows():
        cs = marching_cases(dem_values(int(row["tile_id"])))
        crossed = (cs != 0) & (cs != 15)
        assert row["n_cross"] == crossed.sum()
        assert row["n_seg"] == crossed.sum() + ((cs == 5) | (cs == 10)).sum()
        pos = np.arange(31 * 31, dtype=np.int64) + 1
        assert row["case_chk"] == (cs.ravel() * pos).sum()
