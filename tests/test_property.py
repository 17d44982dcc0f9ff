"""Property-based tests (hypothesis): forward/inverse projection
roundtrips over the core projection families inside their numeric
domains, geodesic inverse->direct closure, and the overlay join's
reference-point rule under adversarial cell-boundary alignment.

These complement the gie corpus (fixed vectors): hypothesis hammers
arbitrary interior points and exact grid-boundary geometry that fixed
fixtures rarely hit. All tests are Ray-free (pure kernel surface) so
they stay fast and deterministic under the seeded profile."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from proj_ray import transform

# (definition, lon_range_deg, lat_range_deg, roundtrip_tol_deg)
_OPS = [
    ("+proj=utm +zone=32 +ellps=GRS80", (3, 15), (-80, 84), 1e-9),
    ("+proj=tmerc +lon_0=9 +k=0.9996 +ellps=GRS80", (-6, 24), (-80, 84),
     1e-9),
    ("+proj=merc +ellps=WGS84", (-180, 180), (-85, 85), 1e-9),
    ("+proj=webmerc +datum=WGS84", (-180, 180), (-85, 85), 1e-9),
    ("+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 +ellps=GRS80",
     (-140, -50), (5, 75), 1e-9),
    ("+proj=stere +lat_0=90 +lat_ts=70 +ellps=WGS84", (-180, 180),
     (30, 89.5), 1e-8),
    ("+proj=laea +lat_0=52 +lon_0=10 +ellps=GRS80", (-30, 50), (20, 80),
     1e-8),
    ("+proj=aeqd +lat_0=40 +lon_0=-100 +ellps=WGS84", (-150, -50),
     (0, 80), 1e-8),
    ("+proj=cea +ellps=WGS84", (-180, 180), (-85, 85), 1e-9),
    ("+proj=eqc +ellps=WGS84", (-180, 180), (-89, 89), 1e-9),
]


@settings(max_examples=40, deadline=None)
@given(u=st.floats(0, 1), v=st.floats(0, 1),
       i=st.integers(0, len(_OPS) - 1))
def test_projection_roundtrip(u, v, i):
    defn, (lo0, lo1), (la0, la1), tol = _OPS[i]
    lon = np.radians(np.array([lo0 + u * (lo1 - lo0)]))
    lat = np.radians(np.array([la0 + v * (la1 - la0)]))
    x, y = transform(defn, "fwd", lon, lat)[:2]
    assert np.isfinite(x).all() and np.isfinite(y).all()
    blon, blat = transform(defn, "inv", x, y)[:2]
    assert abs(np.degrees(blon[0]) - np.degrees(lon[0])) < np.degrees(tol) \
        or abs(abs(np.degrees(blon[0]) - np.degrees(lon[0])) - 360.0) \
        < np.degrees(tol)
    assert abs(np.degrees(blat[0]) - np.degrees(lat[0])) < np.degrees(tol)


@settings(max_examples=40, deadline=None)
@given(u1=st.floats(0, 1), v1=st.floats(0.02, 0.98),
       u2=st.floats(0, 1), v2=st.floats(0.02, 0.98))
def test_geodesic_inverse_direct_closure(u1, v1, u2, v2):
    """inverse(P1, P2) -> (s12, azi1); direct(P1, azi1, s12) must land
    on P2 to sub-millimeter (the Karney closure property)."""
    from proj_ray.geodesic import WGS84_GEOD as g

    lat1 = -88.0 + v1 * 176.0
    lon1 = -180.0 + u1 * 360.0
    lat2 = -88.0 + v2 * 176.0
    lon2 = -180.0 + u2 * 360.0
    s12, azi1, _ = g.inverse(np.array([lat1]), np.array([lon1]),
                             np.array([lat2]), np.array([lon2]))[:3]
    blat, blon, _ = g.direct(np.array([lat1]), np.array([lon1]),
                             azi1, s12)
    assert abs(blat[0] - lat2) < 1e-8          # ~1 mm in latitude
    dlon = (blon[0] - lon2 + 180.0) % 360.0 - 180.0
    assert abs(dlon * np.cos(np.radians(lat2))) < 1e-8


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_overlay_reference_point_exact(data):
    """Random integer rects — including widths/positions EXACTLY on
    4-unit cell boundaries — must yield the brute-force pair set with
    every pair emitted exactly once."""
    from proj_ray.functions.overlay import _RectIndex

    n = data.draw(st.integers(1, 25))
    m = data.draw(st.integers(1, 25))
    cell = 4

    def rects(k):
        x0 = np.array(data.draw(st.lists(
            st.integers(-20, 16), min_size=k, max_size=k)))
        y0 = np.array(data.draw(st.lists(
            st.integers(-20, 16), min_size=k, max_size=k)))
        w = np.array(data.draw(st.lists(
            st.integers(1, 12), min_size=k, max_size=k)))
        h = np.array(data.draw(st.lists(
            st.integers(1, 12), min_size=k, max_size=k)))
        return x0, y0, x0 + w, y0 + h

    lx0, ly0, lx1, ly1 = rects(n)
    rx0, ry0, rx1, ry1 = rects(m)
    idx = _RectIndex(rx0, ry0, rx1, ry1, np.arange(m), cell)
    li, ri, ar = idx.probe(lx0, ly0, lx1, ly1, np.arange(n))
    got = sorted(zip(li.tolist(), ri.tolist(), ar.tolist()))
    ix0 = np.maximum(lx0[:, None], rx0[None, :])
    iy0 = np.maximum(ly0[:, None], ry0[None, :])
    ix1 = np.minimum(lx1[:, None], rx1[None, :])
    iy1 = np.minimum(ly1[:, None], ry1[None, :])
    hit = (ix1 > ix0) & (iy1 > iy0)
    bl, br = np.nonzero(hit)
    want = sorted(zip(
        bl.tolist(), br.tolist(),
        ((ix1[bl, br] - ix0[bl, br]) * (iy1[bl, br] - iy0[bl, br]))
        .tolist()))
    assert got == want


def test_conformal_projections_zero_angular_distortion():
    """Conformal family invariant: angular distortion omega ~ 0 at
    interior points (numerical-derivative tolerance ~1e-7). lcca is
    excluded by design: the reference's truncated series is only
    locally conformal near lat_0 (parity, gie-pinned); nzmg is
    excluded as a bounded-domain complex series."""
    from proj_ray.factors import factors

    defs = [
        "+proj=merc +ellps=WGS84",
        "+proj=tmerc +lon_0=9 +ellps=WGS84",
        "+proj=etmerc +lon_0=9 +ellps=WGS84",
        "+proj=lcc +lat_1=33 +lat_2=45 +lon_0=-96 +ellps=WGS84",
        "+proj=stere +lat_0=90 +lat_ts=70 +ellps=WGS84",
        "+proj=sterea +lat_0=52 +lon_0=5 +ellps=WGS84",
        "+proj=omerc +lat_0=4 +lonc=102 +alpha=323 +ellps=WGS84",
        "+proj=somerc +lat_0=46.95 +lon_0=7.44 +ellps=bessel",
        "+proj=gstmerc +lat_0=-21 +lon_0=55 +ellps=intl",
    ]
    lon = np.radians(np.array([-5.0, 2.0, 15.0, 30.0]))
    lat = np.radians(np.array([20.0, 40.0, 55.0, 70.0]))
    for d in defs:
        f = factors(d, lon, lat)
        assert np.nanmax(f["angular_distortion"]) < 1e-6, d


def test_equal_area_projections_unit_areal_scale():
    """Equal-area family invariant: areal scale s == 1 everywhere
    (boggs tolerance reflects the reference's fixed-iteration
    arithmetic-mean solve)."""
    from proj_ray.factors import factors

    defs = [
        "+proj=laea +lat_0=45 +lon_0=10 +ellps=WGS84",
        "+proj=aea +lat_1=29.5 +lat_2=45.5 +lon_0=-96 +ellps=WGS84",
        "+proj=cea +ellps=WGS84",
        "+proj=moll +ellps=WGS84",
        "+proj=sinu +ellps=WGS84",
        "+proj=eck4 +ellps=WGS84",
        "+proj=eck6 +ellps=WGS84",
        "+proj=hammer +ellps=WGS84",
        "+proj=mbtfpq +ellps=WGS84",
        "+proj=qua_aut +ellps=WGS84",
        "+proj=collg +ellps=WGS84",
        "+proj=bonne +lat_1=45 +ellps=WGS84",
        "+proj=leac +lat_1=30 +ellps=WGS84",
    ]
    lon = np.radians(np.array([-5.0, 2.0, 15.0, 30.0]))
    lat = np.radians(np.array([20.0, 40.0, 55.0, 70.0]))
    for d in defs:
        f = factors(d, lon, lat)
        assert np.nanmax(np.abs(f["areal_scale"] - 1)) < 1e-8, d
    f = factors("+proj=boggs +ellps=WGS84", lon, lat)
    assert np.nanmax(np.abs(f["areal_scale"] - 1)) < 1e-5


# ---- inverted-index partial-aggregation algebra (Ray-free) ----------
#
# The scale-correctness claim of inverted_index_stats is that per-batch
# partials are DISJOINT (each doc lives in exactly one batch) so
# partial dfs/sums/mins/maxes combine exactly. Hypothesis hammers
# arbitrary corpora and arbitrary batch boundaries.

@settings(max_examples=30, deadline=None)
@given(docs=st.lists(
           st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8),
           min_size=1, max_size=24),
       seed=st.integers(0, 2**31 - 1))
def test_invindex_partials_combine_exactly(docs, seed):
    import pandas as pd

    from proj_ray.functions.invindex import _pairs_batch

    texts = np.array([" ".join(d) for d in docs], dtype=object)
    ids = np.arange(len(docs), dtype=np.int64)

    # arbitrary contiguous batch split
    rng = np.random.default_rng(seed)
    n_cuts = int(rng.integers(0, min(4, len(docs))))
    cuts = np.sort(rng.choice(np.arange(1, len(docs)),
                              size=n_cuts, replace=False)) \
        if n_cuts else np.array([], dtype=np.int64)
    bounds = np.r_[0, cuts, len(docs)]

    parts = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        parts.append(_pairs_batch(
            {"text": texts[lo:hi], "doc_id": ids[lo:hi]},
            "text", "doc_id", n_buckets=8))
    got = (pd.concat(parts, ignore_index=True)
           .groupby("term", as_index=False)
           .agg(df=("doc_id", "size"), id_sum=("doc_id", "sum"),
                id_min=("doc_id", "min"), id_max=("doc_id", "max"))
           .sort_values("term", ignore_index=True))

    tok = pd.DataFrame({"doc_id": ids, "text": texts})
    tok = tok.assign(term=tok["text"].str.split(" ")).explode("term") \
        .drop_duplicates(["doc_id", "term"])
    exp = (tok.groupby("term", as_index=False)
           .agg(df=("doc_id", "size"), id_sum=("doc_id", "sum"),
                id_min=("doc_id", "min"), id_max=("doc_id", "max"))
           .sort_values("term", ignore_index=True))
    assert got["term"].tolist() == exp["term"].tolist()
    for c in ("df", "id_sum", "id_min", "id_max"):
        assert got[c].tolist() == exp[c].tolist()
