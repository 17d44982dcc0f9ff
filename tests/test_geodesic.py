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
