"""Planner closure regression nets: create_crs_to_crs(A, B) followed
by (B, A) must return to the start within the approximate-Helmert
parity envelope (the reference's small-angle rotation matrix with
transpose inverse closes only to ~rot^2 * R — helmert.cpp:174-200;
grid-backed and rotation-free paths close far tighter). A planner
asymmetry (different candidate chosen per direction) would blow past
these bounds immediately."""

import numpy as np
import pytest


def _roundtrip(code, lat, lon, z=None):
    from proj_ray.factory import create_crs_to_crs

    fw = create_crs_to_crs("EPSG:4326", f"EPSG:{code}")
    bw = create_crs_to_crs(f"EPSG:{code}", "EPSG:4326")
    la = np.radians(np.asarray(lat, dtype=np.float64))
    lo = np.radians(np.asarray(lon, dtype=np.float64))
    zz = np.zeros_like(la) if z is None else np.asarray(z, float)
    t = np.full_like(la, np.inf)
    x, y, zr, _ = fw.fwd((la.copy(), lo.copy(), zz.copy(), t.copy()))
    ok = np.isfinite(x) & np.isfinite(y)
    bl, bp, bz, _ = bw.fwd((x, y, zr, t.copy()))
    return la, lo, bl, bp, ok


# (epsg code, probe lats, probe lons) — a spread of datum families:
# grid-backed NAD83/NAD27, Helmert-only Pulkovo/GDA/Tokyo, ETRS zones
_PAIRS = [
    (32633, [48.0, 55.0], [12.0, 16.0]),    # WGS84 UTM (no datum step)
    (25832, [48.0, 54.0], [8.0, 11.0]),     # ETRS89 UTM
    (2180, [50.0, 53.5], [16.0, 22.0]),     # ETRS89 / Poland CS92
    (27700, [51.0, 55.0], [-4.0, 0.5]),     # OSGB36 (grid or helmert)
    (2499, [49.5, 49.9], [38.5, 40.0]),     # Pulkovo GK (7-par helmert)
    (28354, [-35.0, -20.0], [141.0, 150.0]),  # GDA94 MGA
    (30169, [35.0, 38.0], [137.0, 140.0]),  # Tokyo zone (big shift)
]


@pytest.mark.parametrize("code,lats,lons", _PAIRS)
def test_ab_ba_closure(ray_session, code, lats, lons):
    la, lo, bl, bp, ok = _roundtrip(code, lats, lons)
    assert ok.any(), f"EPSG:{code} produced no finite points"
    err = np.max(np.where(ok, np.abs(bl - la) + np.abs(bp - lo), 0.0))
    # 5e-8 rad ~ 32 cm: the approximate-Helmert parity envelope
    assert err < 5e-8, (code, err)


def test_compound_closure_sample(ray_session):
    """EPSG:4979 <-> compound horizontal+vertical pairs: horizontal
    closure within the Helmert envelope AND height closure within
    30 cm (geoid-grid interpolation + vertical ballpark envelope)."""
    from proj_ray.epsg_generated import EPSG_COMPOUND
    from proj_ray.factory import create_crs_to_crs

    lat = np.radians(np.array([47.0, 50.0]))
    lon = np.radians(np.array([8.0, 12.0]))
    z0 = np.array([200.0, 500.0])
    t0 = np.full(2, np.inf)
    tested = 0
    for code in sorted(EPSG_COMPOUND)[::29]:
        try:
            fw = create_crs_to_crs("EPSG:4979", f"EPSG:{code}")
            bw = create_crs_to_crs(f"EPSG:{code}", "EPSG:4979")
        except Exception:
            continue
        x, y, z, _ = fw.fwd((lat.copy(), lon.copy(), z0.copy(),
                             t0.copy()))
        ok = np.isfinite(x) & np.isfinite(y) & np.isfinite(z)
        if not ok.any():
            continue
        tested += 1
        bl, bp, bz, _ = bw.fwd((x, y, z, t0.copy()))
        err = np.max(np.where(ok, np.abs(bl - lat) + np.abs(bp - lon),
                              0.0))
        errz = np.max(np.where(ok, np.abs(bz - z0), 0.0))
        assert err < 5e-8 and errz < 0.3, (code, err, errz)
        if tested >= 8:
            break
    assert tested >= 4
