import math

import numpy as np
import pytest

from proj_ray import create_operation, transform

D = math.pi / 180


def test_utm_known_value():
    x, y, _, _ = transform("+proj=utm +zone=32 +ellps=WGS84", "fwd",
                           [12 * D], [55 * D])
    assert abs(x[0] - 691875.632137542) < 1e-6
    assert abs(y[0] - 6098907.825129169) < 1e-6


@pytest.mark.parametrize("defn", [
    "+proj=merc +ellps=GRS80",
    "+proj=merc +R=6400000",
    "+proj=tmerc +ellps=GRS80 +lon_0=9",
    "+proj=etmerc +ellps=GRS80 +lon_0=9",
    "+proj=utm +zone=33 +ellps=WGS84",
    "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=40 +lon_0=-96 +ellps=GRS80",
    "+proj=webmerc +ellps=WGS84",
    "+proj=cart +ellps=GRS80",
])
def test_roundtrip(defn):
    rng = np.random.default_rng(1)
    lon = rng.uniform(-8, 8, 200) * D
    lat = rng.uniform(-80, 80, 200) * D
    op = create_operation(defn)
    out = op.fwd((lon, lat, np.zeros_like(lon), np.full_like(lon, np.inf)))
    back = op.inv(out)
    # compare with local-curvature metric: < 0.5 mm
    dlam = np.abs(back[0] - lon)
    dphi = np.abs(back[1] - lat)
    assert np.all(dlam * 6.4e6 < 5e-4)
    assert np.all(dphi * 6.4e6 < 5e-4)


def test_inband_errors_dont_break_batch():
    x, y, _, _ = transform("+proj=webmerc +ellps=WGS84", "fwd",
                           np.array([0.0, 10 * D, 20.0]),
                           np.array([91 * D, 45 * D, 0.5]))
    assert not np.isfinite(x[0])          # invalid latitude
    assert np.isfinite(x[1])              # neighbor unaffected
    assert not np.isfinite(x[2])          # lon > 10 rad -> invalid


def test_pipeline_push_pop_preserves_z():
    op = create_operation(
        "+proj=pipeline "
        "+step +proj=push +v_3 "
        "+step +proj=cart +ellps=WGS84 "
        "+step +proj=cart +inv +ellps=WGS84 "
        "+step +proj=pop +v_3")
    z = np.array([123.456])
    out = op.fwd((np.array([0.2]), np.array([0.9]), z,
                  np.array([np.inf])))
    assert abs(out[2][0] - 123.456) < 1e-9


def test_helmert_7param_roundtrip():
    op = create_operation(
        "+proj=helmert +x=100 +y=-50 +z=20 +rx=1 +ry=-2 +rz=3 +s=5 "
        "+exact +convention=position_vector")
    X = np.array([3586525.76])
    Y = np.array([762339.58])
    Z = np.array([5201465.44])
    out = op.fwd((X, Y, Z, np.full(1, np.inf)))
    back = op.inv(out)
    assert abs(back[0][0] - X[0]) < 1e-6


def test_unitconvert_units_and_time():
    x, y, z, t = transform("+proj=unitconvert +xy_in=km +xy_out=m", "fwd",
                           [1.0], [2.0])
    assert x[0] == 1000.0 and y[0] == 2000.0
    op = create_operation(
        "+proj=unitconvert +t_in=decimalyear +t_out=yyyymmdd")
    out = op.fwd((np.zeros(1), np.zeros(1), np.zeros(1),
                  np.array([2000.0])))
    assert out[3][0] == 20000101.0


def test_axisswap_neu():
    op = create_operation("+proj=axisswap +order=2,1")
    out = op.fwd((np.array([1.0]), np.array([2.0]), np.zeros(1),
                  np.zeros(1)))
    assert out[0][0] == 2.0 and out[1][0] == 1.0
