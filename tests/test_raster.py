"""Raster warp: codec round-trip, brute-force bilinear parity,
edge-clamp semantics, and the Dataset stage."""
import numpy as np
import pytest

from proj_ray.raster import (OUT_H, OUT_W, SRC_H, SRC_W, dem_decode,
                             dem_encode, dem_extent, dem_values,
                             make_dem_for, warp_tile_batch)


def test_dem_codec_roundtrip():
    px = dem_values(42)
    assert px.shape == (SRC_H, SRC_W)
    out = dem_decode(dem_encode(px))
    assert np.array_equal(out, px)
    with pytest.raises(ValueError):
        dem_decode(b"BMP?" + bytes(16))


def _brute_warp_one(tile_id: int):
    """Scalar re-derivation of the warp for one tile: per-pixel Python
    loop, independent formula order — catches vectorization bugs."""
    import math

    lon0, lat0, lon1, lat1 = (float(v) for v in dem_extent(
        np.array([tile_id])))
    src = dem_values(tile_id).astype(float)
    y0 = math.asinh(math.tan(math.radians(lat0)))
    y1 = math.asinh(math.tan(math.radians(lat1)))
    out = np.empty((OUT_H, OUT_W))
    for oy in range(OUT_H):
        for ox in range(OUT_W):
            lon = lon0 + (ox + 0.5) * (lon1 - lon0) / OUT_W
            y = y0 + (oy + 0.5) * (y1 - y0) / OUT_H
            lat = math.degrees(math.atan(math.sinh(y)))
            fx = (lon - lon0) / ((lon1 - lon0) / SRC_W) - 0.5
            fy = (lat - lat0) / ((lat1 - lat0) / SRC_H) - 0.5
            fx = min(max(fx, 0.0), SRC_W - 1.0)
            fy = min(max(fy, 0.0), SRC_H - 1.0)
            gx, gy = min(int(fx), SRC_W - 2), min(int(fy), SRC_H - 2)
            wx, wy = fx - gx, fy - gy
            out[oy, ox] = ((1 - wy) * ((1 - wx) * src[gy, gx]
                                       + wx * src[gy, gx + 1])
                           + wy * ((1 - wx) * src[gy + 1, gx]
                                   + wx * src[gy + 1, gx + 1]))
    return out


def test_warp_matches_brute():
    ids = np.array([0, 7, 95, 159, 500], dtype=np.int64)
    rows = make_dem_for(ids)
    got = warp_tile_batch(rows["bytes"], rows["lon0"], rows["lat0"],
                          rows["lon1"], rows["lat1"])
    for k, i in enumerate(ids):
        exp = _brute_warp_one(int(i))
        assert np.allclose(got[k], exp, rtol=0, atol=1e-9), f"tile {i}"


def test_warp_constant_raster_is_constant():
    """Bilinear of a constant field is that constant everywhere,
    including the clamped edge rows."""
    blob = dem_encode(np.full((SRC_H, SRC_W), 77, dtype=np.uint8))
    got = warp_tile_batch(np.array([blob], dtype=object),
                          [10.0], [51.0], [32.5], [68.0])
    assert np.allclose(got, 77.0, rtol=0, atol=1e-12)


def test_warp_edge_clamp_high_latitude():
    """At high latitude Mercator stretching pushes the top output-row
    centers within half a source pixel of the north edge (fy > 31):
    they must clamp to the last source row (never index out of range,
    never NaN)."""
    ids = np.array([144], dtype=np.int64)  # ty=9 -> lat in [68, 85]
    rows = make_dem_for(ids)
    got = warp_tile_batch(rows["bytes"], rows["lon0"], rows["lat0"],
                          rows["lon1"], rows["lat1"])
    assert np.isfinite(got).all()
    src = dem_values(144).astype(float)
    # clamped top row == bilinear along source row 31 at wx=0.5
    exp = 0.5 * (src[31, 0] + src[31, 1])
    assert got[0, 15, 0] == pytest.approx(exp, abs=1e-9)


def test_warp_stats_dataset(ray_session):
    import ray.data as rd

    from proj_ray.raster import warp_stats

    ids = np.arange(40, dtype=np.int64)
    rows = make_dem_for(ids)
    import pandas as pd

    ds = rd.from_pandas(pd.DataFrame(rows))
    out = warp_stats(ds).to_pandas().sort_values("tile_id")
    assert len(out) == 40
    assert (out["n_px"] == OUT_H * OUT_W).all()
    wv = warp_tile_batch(rows["bytes"], rows["lon0"], rows["lat0"],
                         rows["lon1"], rows["lat1"])
    pv = np.floor(wv * 1000 + 0.5).astype(np.int64)
    assert np.array_equal(out["wsum"].to_numpy(), pv.sum(axis=(1, 2)))
    pos = np.arange(OUT_H * OUT_W, dtype=np.int64) \
        .reshape(1, OUT_H, OUT_W) + 1
    assert np.array_equal(out["wchk"].to_numpy(),
                          (pv * pos).sum(axis=(1, 2)))


def test_mosaic_assembly_and_missing_tile():
    ids = np.arange(160, dtype=np.int64)
    rows = make_dem_for(ids)
    from proj_ray.raster import mosaic_from_rows

    m = mosaic_from_rows(rows["tile_id"], rows["bytes"])
    assert m.shape == (320, 512)
    # spot-check: global (gy, gx) -> tile/local decomposition
    for gy, gx in ((0, 0), (319, 511), (100, 333), (37, 482)):
        tid = (gy // 32) * 16 + gx // 32
        assert m[gy, gx] == (tid * 31 + (gy % 32) * 7
                             + (gx % 32) * 13) % 256
    with pytest.raises(ValueError):
        mosaic_from_rows(rows["tile_id"][:100], rows["bytes"][:100])


def test_point_sampler_brute_parity():
    from proj_ray.raster import MOSAIC_H, MOSAIC_W, PointSampler, \
        mosaic_from_rows

    rows = make_dem_for(np.arange(160, dtype=np.int64))
    m = mosaic_from_rows(rows["tile_id"], rows["bytes"])
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-85, 85, 200)
    # include edge/clamp cases
    lon[:4] = (-180.0, 180.0, -179.99, 179.99)
    lat[:4] = (-85.0, 85.0, -84.99, 84.99)
    got = PointSampler(m)({"doc_id": np.arange(200), "lon": lon,
                           "lat": lat})["samp_f"]
    for j in range(200):
        fx = min(max((lon[j] + 180.0) / (360.0 / MOSAIC_W) - 0.5, 0.0),
                 MOSAIC_W - 1.0)
        fy = min(max((lat[j] + 85.0) / (170.0 / MOSAIC_H) - 0.5, 0.0),
                 MOSAIC_H - 1.0)
        gx, gy = min(int(fx), MOSAIC_W - 2), min(int(fy), MOSAIC_H - 2)
        wx, wy = fx - gx, fy - gy
        v = ((1 - wy) * ((1 - wx) * m[gy, gx] + wx * m[gy, gx + 1])
             + wy * ((1 - wx) * m[gy + 1, gx] + wx * m[gy + 1, gx + 1]))
        assert got[j] == int(np.floor(v * 1000 + 0.5)), j


def test_hillshade_brute_parity():
    """Scalar Horn hillshade vs the vectorized batch (independent
    loop), incl. flat-field check: zero gradient -> uniform
    255*cos(zen)."""
    import math

    from proj_ray.raster import hillshade_batch

    rows = make_dem_for(np.array([3, 160], dtype=np.int64))
    got = hillshade_batch(rows["bytes"])
    assert got.shape == (2, SRC_H - 2, SRC_W - 2)
    for k, tid in enumerate((3, 160)):
        v = dem_values(tid).astype(float)
        for r, c in ((1, 1), (15, 20), (30, 30), (7, 29)):
            p = ((v[r-1, c+1] + 2*v[r, c+1] + v[r+1, c+1])
                 - (v[r-1, c-1] + 2*v[r, c-1] + v[r+1, c-1])) / 8.0
            q = ((v[r+1, c-1] + 2*v[r+1, c] + v[r+1, c+1])
                 - (v[r-1, c-1] + 2*v[r-1, c] + v[r-1, c+1])) / 8.0
            slope = math.atan(math.hypot(p, q))
            aspect = math.atan2(q, -p)
            hs = 255.0 * max(
                math.cos(math.pi/4) * math.cos(slope)
                + math.sin(math.pi/4) * math.sin(slope)
                * math.cos(5*math.pi/4 - aspect), 0.0)
            assert got[k, r-1, c-1] == pytest.approx(hs, abs=1e-9)

    flat = dem_encode(np.full((SRC_H, SRC_W), 100, dtype=np.uint8))
    hs = hillshade_batch(np.array([flat], dtype=object))
    assert np.allclose(hs, 255.0 * np.cos(np.pi/4), atol=1e-12)


def test_laea_warp_engine_kernel_parity(ray_session):
    """laea_warp_stats drives the engine's laea inverse; assert the
    stage output equals an independent scalar recomputation through
    the same engine transform (per pixel, per tile), incl. an
    antimeridian + high-latitude tile where adjlon wrapping bites."""
    import pandas as pd
    import ray.data as rd

    from proj_ray.factory import create_operation, transform
    from proj_ray.raster import LAT_SPAN, LON_SPAN, laea_warp_stats

    ids = np.array([0, 85, 144], dtype=np.int64)
    rows = make_dem_for(ids)
    out = laea_warp_stats(rd.from_pandas(pd.DataFrame(rows))) \
        .to_pandas().set_index("tile_id")
    for k, tid in enumerate(ids):
        lo, la = float(rows["lon0"][k]), float(rows["lat0"][k])
        clon, clat = lo + 11.25, la + 8.5
        op = create_operation(
            f"+proj=laea +R=6371000 +lat_0={clat} +lon_0={clon}")
        src = dem_values(int(tid)).astype(float)
        tot = chk = 0
        for oy in range(16):
            for ox in range(16):
                x = -900e3 + (ox + 0.5) * (1800e3 / 16)
                y = -800e3 + (oy + 0.5) * (1600e3 / 16)
                lam, phi, _, _ = transform(op, "inv",
                                           np.array([x]), np.array([y]))
                d = np.degrees(lam[0]) - clon
                d -= 360.0 * np.floor((d + 180.0) / 360.0)
                fx = (d + 11.25) / (LON_SPAN / SRC_W) - 0.5
                fy = (np.degrees(phi[0]) - la) / (LAT_SPAN / SRC_H) - 0.5
                fx = min(max(fx, 0.0), SRC_W - 1.0)
                fy = min(max(fy, 0.0), SRC_H - 1.0)
                gx, gy = min(int(fx), SRC_W - 2), min(int(fy), SRC_H - 2)
                wx, wy = fx - gx, fy - gy
                v = ((1 - wy) * ((1 - wx) * src[gy, gx]
                                 + wx * src[gy, gx + 1])
                     + wy * ((1 - wx) * src[gy + 1, gx]
                             + wx * src[gy + 1, gx + 1]))
                pv = int(np.floor(v * 1000 + 0.5))
                tot += pv
                chk += pv * (oy * 16 + ox + 1)
        assert out.loc[tid, "wsum"] == tot, tid
        assert out.loc[tid, "wchk"] == chk, tid


def test_blob_stats_matches_union_find(ray_session):
    """Vectorized label-propagation blobs vs scalar union-find on the
    same thresholded tiles — independent algorithm, exact match."""
    import pandas as pd
    import ray.data as rd

    from proj_ray.raster import blob_stats

    ids = np.array([0, 3, 97, 255], dtype=np.int64)
    rows = make_dem_for(ids)
    got = blob_stats(rd.from_pandas(pd.DataFrame(rows))) \
        .to_pandas().set_index("tile_id")

    for k, tid in enumerate(ids):
        v = dem_values(int(tid))
        mask = v >= 240
        parent = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in range(SRC_H):
            for c in range(SRC_W):
                if not mask[r, c]:
                    continue
                parent[(r, c)] = (r, c)
        for r in range(SRC_H):
            for c in range(SRC_W):
                if not mask[r, c]:
                    continue
                for dr, dc in ((1, 0), (0, 1)):
                    rr, cc = r + dr, c + dc
                    if rr < SRC_H and cc < SRC_W and mask[rr, cc]:
                        ra, rb = find((r, c)), find((rr, cc))
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
        sizes = {}
        for node in parent:
            root = find(node)
            sizes[root] = sizes.get(root, 0) + 1
        if not sizes:
            assert tid not in got.index
            continue
        assert got.loc[tid, "n_blobs"] == len(sizes), tid
        assert got.loc[tid, "max_blob"] == max(sizes.values()), tid
        assert got.loc[tid, "n_masked"] == int(mask.sum()), tid


def test_pyramid_brute_parity(ray_session):
    """pyramid_stats vs a direct numpy mosaic over 90 tiles (layer 0
    only partially covered, so missing-quadrant parents are
    exercised): n_children, pixel sums and the position-weighted
    checksum all match, and absent children contribute zeros."""
    import numpy as np

    from proj_ray.raster import (GRID_NX, SRC_H, SRC_W, dem_table,
                                 dem_values, pyramid_stats)

    n = 90
    got = pyramid_stats(dem_table(n, columns=["tile_id", "bytes"])) \
        .to_pandas().set_index("parent_id").sort_index()

    parents: dict[int, np.ndarray] = {}
    counts: dict[int, int] = {}
    for i in range(n):
        px = dem_values(i).astype(np.int64)
        d = ((px[0::2, 0::2] + px[0::2, 1::2]
              + px[1::2, 0::2] + px[1::2, 1::2]) // 4)
        tx, ty = i % GRID_NX, (i // GRID_NX) % 10
        pid = (i // 160) * 40 + (ty // 2) * 8 + tx // 2
        tile = parents.setdefault(
            pid, np.zeros((SRC_H, SRC_W), dtype=np.int64))
        tile[(ty % 2) * 16:(ty % 2) * 16 + 16,
             (tx % 2) * 16:(tx % 2) * 16 + 16] = d
        counts[pid] = counts.get(pid, 0) + 1
    w = 1 + np.arange(SRC_H)[:, None] * 33 + np.arange(SRC_W)[None, :]
    assert len(got) == len(parents)
    incomplete = 0
    for pid, tile in parents.items():
        row = got.loc[pid]
        assert row["n_children"] == counts[pid], pid
        assert row["sum_ds"] == int(tile.sum()), pid
        assert row["chk"] == int((tile * w).sum()), pid
        if counts[pid] < 4:
            incomplete += 1
    assert incomplete > 0  # the partial layer really was exercised
