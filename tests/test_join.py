import numpy as np

from proj_ray.join import PolygonIndex


def _scalar_pip(px, py, xs, ys):
    """Independent scalar even-odd oracle."""
    inside = False
    n = len(xs)
    j = n - 1
    for i in range(n):
        if (ys[i] > py) != (ys[j] > py):
            xint = xs[j] + (py - ys[i]) * (xs[j] - xs[i]) / (ys[j] - ys[i]) \
                if False else \
                (xs[j] - xs[i]) * (py - ys[i]) / (ys[j] - ys[i]) + xs[i]
            if px < xint:
                inside = not inside
        j = i
    return inside


def test_index_matches_scalar_oracle():
    rng = np.random.default_rng(7)
    polys = []
    for j in range(40):
        cx, cy = rng.uniform(-150, 150), rng.uniform(-60, 60)
        n = rng.integers(3, 9)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(2, 12, n)
        polys.append((f"poly{j}", cx + r * np.cos(ang),
                      cy + r * np.sin(ang)))
    idx = PolygonIndex([p[0] for p in polys],
                       [p[1] for p in polys],
                       [p[2] for p in polys])
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-85, 85, 2000)
    pts, pis = idx.query(lon, lat)
    got = set(zip(pts.tolist(), pis.tolist()))
    exp = set()
    for j, (_, xs, ys) in enumerate(polys):
        xs_c = np.append(xs, xs[0])
        ys_c = np.append(ys, ys[0])
        for i in range(len(lon)):
            if _scalar_pip(lon[i], lat[i], xs_c, ys_c):
                exp.add((i, j))
    assert got == exp


def test_concave_polygon():
    # C-shape: point inside the notch must NOT match
    xs = np.array([0, 10, 10, 2, 2, 10, 10, 0, 0])
    ys = np.array([0, 0, 3, 3, 7, 7, 10, 10, 0])
    idx = PolygonIndex(["c"], [xs], [ys])
    pts, _ = idx.query(np.array([5.0, 1.0, 5.0]),
                       np.array([5.0, 5.0, 1.0]))
    assert set(pts.tolist()) == {1, 2}  # notch point (5,5) excluded


def test_antimeridian_polygon():
    xs = np.array([170, -170, -170, 170])
    ys = np.array([-10, -10, 10, 10])
    idx = PolygonIndex(["am"], [xs], [ys])
    pts, _ = idx.query(np.array([175.0, -175.0, 0.0]),
                       np.array([0.0, 0.0, 0.0]))
    assert set(pts.tolist()) == {0, 1}


def test_spatial_join_dataset(ray_session):
    import ray.data as rd

    from proj_ray.stages import spatial_join

    rows = [{"pid": i, "lon": float(i), "lat": 0.5} for i in range(20)]
    ds = rd.from_items(rows)
    # one square covering lon 4.5..8.5 (off-lattice bounds: boundary
    # semantics of even-odd ray casting are not exercised)
    idx = PolygonIndex(["sq"], [np.array([4.5, 8.5, 8.5, 4.5])],
                       [np.array([0, 0, 1, 1])])
    inner = spatial_join(ds, idx, how="inner").to_pandas()
    assert sorted(inner["pid"]) == [5, 6, 7, 8]
    semi = spatial_join(ds, idx, how="semi").to_pandas()
    assert sorted(semi["pid"]) == [5, 6, 7, 8]
    anti = spatial_join(ds, idx, how="anti").to_pandas()
    assert len(anti) == 16


def test_pip_nonconvex_star_and_antimeridian():
    """Even-odd ray casting on the q68 polygon layer: a point in a
    star's concave notch (inside the bbox AND the convex hull) is
    OUTSIDE; star tips are inside; the antimeridian star accepts
    points on both sides of +-180."""
    import numpy as np

    import __ray_entry__ as E
    from proj_ray.join import PolygonIndex

    polys = E._q68_polys()
    idx = PolygonIndex(
        [p[0] for p in polys],
        [np.array([v[0] for v in pts]) for _, pts in polys],
        [np.array([v[1] for v in pts]) for _, pts in polys])

    import math
    cx, cy, rot = -96.3, 38.7, 11.0
    # between two tips at radius 10 (inner radius is 5): concave notch
    a_mid = math.radians(rot + 18.0)
    notch = (cx + 10.0 * math.cos(a_mid), cy + 10.0 * math.sin(a_mid))
    a_tip = math.radians(rot)
    tip_in = (cx + 11.0 * math.cos(a_tip), cy + 11.0 * math.sin(a_tip))
    lon = np.array([notch[0], tip_in[0], cx, 179.9, -179.9, 178.6])
    lat = np.array([notch[1], tip_in[1], cy, -10.3, -10.2, -10.3])
    pts_i, poly_i = idx.query(lon, lat)
    hits = dict(zip(pts_i.tolist(), poly_i.tolist()))
    assert 0 not in hits          # concave notch excluded
    assert hits.get(1) == 0       # near-tip point inside star 0
    assert hits.get(2) == 0       # center inside
    assert hits.get(3) == 4       # east of the antimeridian
    assert hits.get(4) == 4       # west of the antimeridian (wrapped)
    assert hits.get(5) == 4       # center of the wrapped star
