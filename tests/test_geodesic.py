import pytest
import numpy as np

from proj_ray.geodesic import Geodesic


def test_known_value_jfk_lhr():
    g = Geodesic()
    s, a1, a2 = g.inverse([40.6], [-73.8], [51.6], [-0.5])
    assert abs(s[0] - 5551759.4004) < 1e-3
    assert abs(a1[0] - 51.19888) < 1e-4
    assert abs(a2[0] - 107.82177) < 1e-4


def test_direct_inverse_consistency():
    g = Geodesic()
    rng = np.random.default_rng(42)
    lat1 = rng.uniform(-85, 85, 2000)
    lon1 = rng.uniform(-180, 180, 2000)
    azi = rng.uniform(-180, 180, 2000)
    s = rng.uniform(1, 19_000_000, 2000)
    lat2, lon2, _ = g.direct(lat1, lon1, azi, s)
    s2, _, _ = g.inverse(lat1, lon1, lat2, lon2)
    assert np.max(np.abs(s2 - s)) < 1e-5


def test_equator_and_meridian():
    g = Geodesic()
    s, a1, _ = g.inverse([0], [0], [0], [1])
    assert abs(s[0] - 111319.4908) < 1e-3
    assert abs(a1[0] - 90) < 1e-9
    s, _, _ = g.inverse([0], [0], [1], [0])
    assert abs(s[0] - 110574.3886) < 1e-3


def test_polygon_area_planimeter_goldens():
    """GeographicLib planimeter test values (reference
    src/tests/geodtest.c Planimeter0/Planimeter13)."""
    from proj_ray.geodesic import WGS84_GEOD as g

    cases = [
        ([89, 89, 89, 89], [0, 90, 180, 270], 631819.8745, 24952305678.0),
        ([-89, -89, -89, -89], [0, 90, 180, 270], 631819.8745,
         -24952305678.0),
        ([0, -1, 0, 1], [-1, 0, 1, 0], 627598.2731, 24619419146.0),
        ([90, 0, 0], [0, 0, 90], 30022685, 63758202715511.0),
    ]
    for lats, lons, P, A in cases:
        p, a = g.polygon_area(lats, lons)
        assert abs(p - P) < 1.0
        assert abs(a - A) < 2.0
    # encircling the pole twice (crossing-parity handling)
    p, a = g.polygon_area([89] * 6, [-360, -240, -120, 0, 120, 240])
    assert abs(p - 1160741) < 2.0
    assert abs(a - 32415230256.0) < 2.0


def test_polygon_area_small_quad():
    import numpy as np

    from proj_ray.geodesic import WGS84_GEOD as g

    _, a = g.polygon_area([10, 10, 10.1, 10.1], [10, 10.1, 10.1, 10])

    def q(phi):  # authalic function (pj_qsfn): band area = a^2*dlam*q/2
        s = np.sin(phi)
        e = np.sqrt(g.e2)
        return (1 - g.e2) * (s / (1 - g.e2 * s * s)
                             + np.arctanh(e * s) / e)

    expect = g.a ** 2 * np.radians(0.1) * \
        (q(np.radians(10.1)) - q(np.radians(10.0))) / 2
    # exact ellipsoidal quad area (edges are geodesics, not parallels,
    # so agreement is to the sliver left between geodesic and parallel)
    assert abs(a - expect) / expect < 1e-5


def test_line_positions_walk():
    import numpy as np

    from proj_ray.geodesic import WGS84_GEOD as g

    d = np.linspace(0, 5_000_000, 11)
    lat2, lon2, azi2 = g.line_positions(40.0, -75.0, 45.0, d)
    assert lat2[0] == pytest.approx(40.0, abs=1e-9)
    assert lon2[0] == pytest.approx(-75.0, abs=1e-9)
    # each step is consistent with the inverse problem
    s, a1, _ = g.inverse(np.full(11, 40.0), np.full(11, -75.0), lat2, lon2)
    assert np.allclose(s[1:], d[1:], atol=1e-3)
    assert np.allclose(a1[1:], 45.0, atol=1e-7)
