"""Static EPSG registry (curated + generated from the reference's EPSG
SQL distribution) and the crs_to_crs pipeline path."""

import numpy as np
import pytest


def _fwd(op, lon_deg, lat_deg):
    x, y, *_ = op.fwd((np.radians(np.atleast_1d(lon_deg)),
                       np.radians(np.atleast_1d(lat_deg)),
                       np.zeros(1), np.full(1, np.inf)))
    return x[0], y[0]


def test_generated_registry_size():
    from proj_ray.epsg_generated import EPSG_GENERATED

    assert len(EPSG_GENERATED) > 6000
    # spot shapes
    assert EPSG_GENERATED[32631].startswith("+proj=tmerc")
    assert "+axis=neu" in EPSG_GENERATED[2193]  # NZTM: northing first
    assert EPSG_GENERATED[5514].startswith("+proj=krovak")


def test_generated_matches_curated_params():
    """Generated defs agree with the hand-curated legacy ones on the
    projection parameters (curated adds towgs84, which modern init
    omits)."""
    from proj_ray.epsg import EPSG_INIT
    from proj_ray.epsg_generated import EPSG_GENERATED

    def params(defn):
        out = {}
        for tok in defn.split():
            if "=" in tok:
                k, v = tok.lstrip("+").split("=", 1)
                try:
                    out[k] = round(float(v), 7)
                except ValueError:
                    out[k] = v
        return out

    for code in (32631, 2193, 25832, 28992):
        cur = params(EPSG_INIT[code])
        gen = params(EPSG_GENERATED[code])
        for k in ("lat_0", "lon_0", "k", "x_0", "y_0", "lat_1", "lat_2"):
            if k in cur and k in gen:
                assert cur[k] == pytest.approx(gen[k], abs=1e-7), \
                    (code, k, cur[k], gen[k])


def test_resolve_init_falls_back_to_generated():
    from proj_ray.factory import create_operation

    # EPSG:3035 is not in the curated table. The +init path follows
    # legacy proj4 rules: pure (n,e) axis permutations are dropped, so
    # output is easting,northing even though EPSG says N,E.
    op = create_operation("+init=epsg:3035")
    e, n = _fwd(op, 10.0, 52.0)
    assert e == pytest.approx(4321000.0, abs=1e-6)
    assert n == pytest.approx(3210000.0, abs=1e-6)
    # ... while the EPSG:code path keeps authority order (N,E)
    from proj_ray.epsg import resolve_code_authority

    op2 = create_operation(resolve_code_authority(3035))
    n2, e2 = _fwd(op2, 10.0, 52.0)
    assert n2 == pytest.approx(3210000.0, abs=1e-6)
    assert e2 == pytest.approx(4321000.0, abs=1e-6)


def test_crs_to_crs_geographic_to_projected():
    from proj_ray.factory import create_crs_to_crs, transform

    # EPSG:4326 by code has AUTHORITY axis order: input is (lat, lon)
    op = create_crs_to_crs("EPSG:4326", "EPSG:25832")
    x, y = _fwd(op, 55.0, 12.0)
    rx, ry, *_ = transform("+proj=utm +zone=32 +ellps=GRS80", "fwd",
                           np.radians([12.0]), np.radians([55.0]))
    # sub-mm agreement (difference = the legitimate WGS84<->GRS80
    # geocentric sandwich from the curated towgs84 entries)
    assert x == pytest.approx(rx[0], abs=5e-4)
    assert y == pytest.approx(ry[0], abs=5e-4)


def test_crs_to_crs_projected_roundtrip():
    from proj_ray.factory import create_crs_to_crs

    op = create_crs_to_crs("EPSG:32631", "EPSG:25832")
    x0, y0 = np.array([1000000.0]), np.array([6100000.0])
    x, y, *_ = op.fwd((x0, y0, np.zeros(1), np.full(1, np.inf)))
    xb, yb, *_ = op.inv((x, y, np.zeros(1), np.full(1, np.inf)))
    assert xb[0] == pytest.approx(x0[0], abs=1e-6)
    assert yb[0] == pytest.approx(y0[0], abs=1e-6)


def test_crs_to_crs_rejects_wkt():
    from proj_ray.factory import create_crs_to_crs

    with pytest.raises(NotImplementedError):
        create_crs_to_crs('GEOGCS["WGS 84"]', "EPSG:4326")


def test_unknown_epsg_raises():
    from proj_ray.epsg import resolve_init

    with pytest.raises(NotImplementedError):
        resolve_init("epsg:99999999")
