import numpy as np

from proj_ray import cells as C
from proj_ray import tiles as T


def test_cell_roundtrip():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-179.9, 179.9, 1000)
    lat = rng.uniform(-84.9, 84.9, 1000)
    for level in (0, 4, 12, 20):
        cid = C.cell_id(lon, lat, level)
        lvl, tx, ty = C.cell_to_tile(cid)
        assert np.all(lvl == level)
        x, y = C.lonlat_to_webmerc(lon, lat)
        tx2, ty2, bad = C.tile_xy(x, y, level)
        assert not bad.any()
        assert np.array_equal(tx, tx2)
        assert np.array_equal(ty, ty2)


def test_cell_invalid_latitude():
    cid = C.cell_id(np.array([0.0]), np.array([91.0]), 10)
    assert cid[0] == -1


def test_cell_parent_and_neighbors():
    cid = C.cell_id(np.array([10.0]), np.array([50.0]), 12)
    par = C.cell_parent(cid, 10)
    lvl, _, _ = C.cell_to_tile(par)
    assert lvl[0] == 10
    nb = C.cell_neighbors(cid)
    assert nb.shape == (1, 9)
    assert cid[0] in nb[0]
    # all neighbors decode to adjacent tiles
    _, tx0, ty0 = C.cell_to_tile(cid)
    for n in nb[0]:
        _, tx, ty = C.cell_to_tile(np.array([n]))
        assert abs(int(tx[0]) - int(tx0[0])) <= 1 or \
            abs(int(tx[0]) - int(tx0[0])) == (1 << 12) - 1  # wrap
        assert abs(int(ty[0]) - int(ty0[0])) <= 1


def test_tile_assign_known():
    # (0,0) at zoom 1 -> tile (1, 1) upper-left quadrant boundary
    tx, ty, ok = T.tile_assign(np.array([0.0]), np.array([0.0]), 1)
    assert ok[0] and tx[0] == 1 and ty[0] == 1
    # Paris at zoom 10: known slippy tile (529, 357)... compute oracle
    import math

    lon, lat = 2.3522, 48.8566
    n = 2 ** 10
    ox = int((lon + 180) / 360 * n)
    oy = int((1 - math.asinh(math.tan(math.radians(lat))) / math.pi) / 2 * n)
    tx, ty, ok = T.tile_assign(np.array([lon]), np.array([lat]), 10)
    assert (tx[0], ty[0]) == (ox, oy)


def test_grid_cell_sql_formula():
    lon = np.array([-180.0, 0.0, 179.9])
    lat = np.array([-90.0, 0.0, 89.9])
    got = C.grid_cell(lon, lat, 1.0)
    exp = np.floor(lon + 180) * 180 + np.floor(lat + 90)
    assert np.array_equal(got, exp.astype(np.int64))


def test_salting():
    cell = np.array([5, 5, 5, 7, 7], dtype=np.int64)
    rk = np.arange(5, dtype=np.int64)
    salted = C.salt_cells(cell, rk, {5}, 4)
    assert np.array_equal(salted // 4, cell)
    assert len(np.unique(salted[:3])) > 1  # hot cell split
    assert np.all(salted[3:] % 4 == 0)     # cold cell single sub-key


def test_geohash_known_vectors():
    # public canonical examples (Niemeyer's ezs42; Wikipedia's u4pruydqqvj)
    lon = np.array([10.40744, -5.6, -0.1277583])
    lat = np.array([57.64911, 42.6, 51.5073509])
    assert list(C.geohash_encode(lon, lat, 5)) == ["u4pru", "ezs42", "gcpvj"]
    assert list(C.geohash_encode(lon, lat, 11)) == [
        "u4pruydqqvj", "ezs42e44yx9", "gcpvj0dup40"]


def test_geohash_prefix_property_and_roundtrip():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    g8 = C.geohash_encode(lon, lat, 8)
    g4 = C.geohash_encode(lon, lat, 4)
    assert np.array_equal(g8.astype("<U4"), g4)  # parent == prefix
    # odd precision hits the other interleave branch
    g7 = C.geohash_encode(lon, lat, 7)
    assert np.array_equal(g8.astype("<U7"), g7)
    dlon, dlat = C.geohash_decode(C.geohash_encode(lon, lat, 12))
    assert np.abs(dlon - lon).max() < 1e-6
    assert np.abs(dlat - lat).max() < 1e-5


def test_tiles_covering_bbox_brute():
    import itertools

    zoom, n = 5, 32
    lon0 = np.array([-179.9, 10.0, 100.0])
    lat0 = np.array([-59.9, -10.0, 40.0])
    lon1 = lon0 + np.array([25.0, 3.0, 0.5])
    lat1 = lat0 + np.array([18.0, 7.0, 0.5])
    ridx, tx, ty = T.tiles_covering_bbox(lon0, lat0, lon1, lat1, zoom)
    got = {(int(r), int(x), int(y)) for r, x, y in zip(ridx, tx, ty)}

    def v(lat):
        t = np.tan(np.radians(lat))
        return (1 - np.log(t + np.sqrt(t * t + 1)) / np.pi) / 2

    exp = set()
    for i in range(3):
        for x, y in itertools.product(range(n), range(n)):
            if (x + 1) / n * 360 - 180 > lon0[i] \
                    and x / n * 360 - 180 < lon1[i] \
                    and (y + 1) / n > v(lat1[i]) and y / n < v(lat0[i]):
                exp.add((i, x, y))
    assert got == exp


def test_hex_axial_centers_roundtrip():
    """Hex centers (axial -> plane -> assign) land in their own cell,
    and cube rounding always repairs the q+r+s=0 invariant."""
    import numpy as np

    from proj_ray.cells import WEBMERC_A, hex_axial

    size = 250000.0
    rng = np.random.default_rng(2)
    hq = rng.integers(-20, 21, 200).astype(np.float64)
    hr = rng.integers(-15, 16, 200).astype(np.float64)
    # axial -> plane (pointy-top): x = size*sqrt(3)*(q + r/2), y = size*1.5*r
    x = size * np.sqrt(3.0) * (hq + hr / 2.0)
    y = size * 1.5 * hr
    # keep centers on the Mercator-representable band
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WEBMERC_A)) - np.pi / 2)
    lon = np.degrees(x / WEBMERC_A)
    ok = (np.abs(lon) < 179.9) & (np.abs(lat) < 84.9)
    gq, gr = hex_axial(lon[ok], lat[ok], size)
    assert np.array_equal(gq, hq[ok].astype(np.int64))
    assert np.array_equal(gr, hr[ok].astype(np.int64))


def test_hex_axial_partitions_plane():
    """Random points: every point gets exactly one finite cell and
    jittering by a tiny epsilon never moves it more than one ring."""
    import numpy as np

    from proj_ray.cells import hex_axial

    rng = np.random.default_rng(4)
    lon = rng.uniform(-179, 179, 5000)
    lat = rng.uniform(-80, 80, 5000)
    hq, hr = hex_axial(lon, lat)
    hq2, hr2 = hex_axial(lon + 1e-9, lat + 1e-9)
    # axial distance = (|dq| + |dr| + |dq+dr|) / 2 — epsilon jitter
    # crosses at most one boundary
    dq, dr = hq2 - hq, hr2 - hr
    dist = (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2
    assert dist.max() <= 1
    assert (dist == 0).mean() > 0.999
