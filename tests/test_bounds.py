"""trans_bounds parity with the reference's proj_trans_bounds test
vectors (test/unit/test_c_api.cpp:6126-6515)."""
import numpy as np
import pytest

from proj_ray.bounds import trans_bounds, transform_bounds_batch
from proj_ray.factory import create_crs_to_crs

LAEA = ("+proj=laea +lat_0=45 +lon_0=-100 +x_0=0 +y_0=0 "
        "+a=6370997 +b=6370997 +units=m +no_defs")
LONGLAT = "+proj=longlat +datum=WGS84"
NZ_LCC = ("+proj=lcc +lat_0=-41 +lon_0=173 +lat_1=-37.5 +lat_2=-44.5 "
          "+x_0=3000000 +y_0=7000000 +a=6378137 +rf=298.257222101 "
          "+towgs84=0,0,0,0,0,0,0 +units=m")
NZ_GEOG = "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0"
UPS_N = ("+proj=stere +lat_0=90 +k=0.994 +x_0=2000000 +y_0=2000000 "
         "+datum=WGS84 +units=m")
UPS_S = ("+proj=stere +lat_0=-90 +k=0.994 +x_0=2000000 +y_0=2000000 "
         "+datum=WGS84 +units=m")


def near(got, want, tol=1.0):
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert abs(g - w) <= tol, f"{got} vs {want}"


def test_densify_0():  # test_c_api.cpp:6126
    P = create_crs_to_crs("EPSG:4326", LAEA)
    near(trans_bounds(P, "fwd", 40, -120, 64, -80, densify_pts=0),
         (-1684649.41338, -350356.81377, 1684649.41338, 2234551.18559))


def test_densify_100():  # :6150
    P = create_crs_to_crs("EPSG:4326", LAEA)
    near(trans_bounds(P, "fwd", 40, -120, 64, -80, densify_pts=100),
         (-1684649.41338, -555777.79210, 1684649.41338, 2234551.18559))


def test_normalized():  # :6174
    P = create_crs_to_crs(LONGLAT, LAEA)
    near(trans_bounds(P, "fwd", -120, 40, -80, 64, densify_pts=100),
         (-1684649.41338, -555777.79210, 1684649.41338, 2234551.18559))


def test_antimeridian_xy():  # :6201
    P = create_crs_to_crs(NZ_GEOG, NZ_LCC)
    near(trans_bounds(P, "fwd", 160.6, -55.95, -171.2, -25.88),
         (1722483.900174921, 5228058.6143420935,
          4624385.494808555, 8692574.544944234))
    near(trans_bounds(P, "inv", 1722483.900174921, 5228058.6143420935,
                      4624385.494808555, 8692574.544944234),
         (153.2799922, -56.7471249, -162.1813873, -24.6148194),
         tol=1e-4)


def test_antimeridian_latlon_order():  # :6237 (authority axis order)
    P = create_crs_to_crs("EPSG:4167", "EPSG:3851")
    near(trans_bounds(P, "fwd", -55.95, 160.6, -25.88, -171.2),
         (5228058.6143420935, 1722483.900174921,
          8692574.544944234, 4624385.494808555))
    near(trans_bounds(P, "inv", 5228058.6143420935, 1722483.900174921,
                      8692574.544944234, 4624385.494808555),
         (-56.7471249, 153.2799922, -24.6148194, -162.1813873),
         tol=1e-4)


def test_beyond_global_bounds():  # :6291 (4-crossing ring -> +/-180)
    P = create_crs_to_crs("+proj=cea +lat_ts=30 +datum=WGS84 +units=m",
                          LONGLAT)
    near(trans_bounds(P, "fwd", -17367531.3203125, -7314541.19921875,
                      17367531.3203125, 7314541.19921875),
         (-180.0, -85.0445994113099, 180.0, 85.0445994113099), tol=1e-3)


def test_north_pole_xy():  # :6390
    P = create_crs_to_crs(UPS_N, LONGLAT)
    near(trans_bounds(P, "fwd", -1371213.7625429356, -1405880.71737131,
                      5371213.762542935, 5405880.71737131),
         (-180.0, 48.656, 180.0, 90.0), tol=1e-2)
    near(trans_bounds(P, "inv", -180.0, 60.0, 180.0, 90.0),
         (-1371213.76, -1405880.72, 5371213.76, 5405880.72))


def test_north_pole_latlon_order():  # :6412
    # EPSG:32661's CS 4493 axes are rotated-meridian ("South along
    # 180degE" / "South along 90degE"), which the legacy +axis= syntax
    # cannot express; the registry documents the plain E,N
    # approximation (tools/gen_epsg.py "along" branch — same as the
    # reference's own proj4-string export). The geographic side's
    # lat,lon authority order IS honored.
    P = create_crs_to_crs("EPSG:32661", "EPSG:4326")
    near(trans_bounds(P, "fwd", -1371213.7625429356, -1405880.71737131,
                      5371213.762542935, 5405880.71737131),
         (48.656, -180.0, 90.0, 180.0), tol=1e-2)
    near(trans_bounds(P, "inv", 60.0, -180.0, 90.0, 180.0),
         (-1371213.76, -1405880.72, 5371213.76, 5405880.72))


def test_south_pole_xy():  # :6447
    P = create_crs_to_crs(UPS_S, LONGLAT)
    near(trans_bounds(P, "fwd", -1371213.7625429356, -1405880.71737131,
                      5371213.762542935, 5405880.71737131),
         (-180.0, -90.0, 180.0, -48.656), tol=1e-2)
    near(trans_bounds(P, "inv", -180.0, -90.0, 180.0, -60.0),
         (-1371213.76, -1405880.72, 5371213.76, 5405880.72))


def test_south_pole_latlon_order():  # :6484
    # same E,N approximation note as test_north_pole_latlon_order
    P = create_crs_to_crs("EPSG:32761", "EPSG:4326")
    near(trans_bounds(P, "fwd", -1371213.7625429356, -1405880.71737131,
                      5371213.762542935, 5405880.71737131),
         (-90.0, -180.0, -48.656, 180.0), tol=1e-2)
    near(trans_bounds(P, "inv", -90.0, -180.0, -60.0, 180.0),
         (-1371213.76, -1405880.72, 5371213.76, 5405880.72))


def test_ignore_inf():
    # points beyond the gnomonic horizon project to inf; the max scans
    # must skip them (reference simple_max HUGE_VAL guard, :6324)
    P = create_crs_to_crs(LONGLAT,
                          "+proj=gnom +lat_0=-90 +datum=WGS84 +units=m")
    out = trans_bounds(P, "fwd", -180.0, -90.0, 180.0, 1.3)
    assert all(np.isfinite(out)), out


def test_antimeridian_input_span():
    # geographic INPUT crossing the antimeridian: xmax < xmin spans
    # xmax - xmin + 360 (4D_api.cpp:1567)
    P = create_crs_to_crs(LONGLAT,
                          "+proj=merc +lon_0=180 +datum=WGS84 +units=m")
    x0, y0, x1, y1 = trans_bounds(P, "fwd", 170.0, -10.0, -170.0, 10.0)
    # the box is 20 degrees wide centered on lon_0=180 -> symmetric x
    assert abs(x0 + x1) < 1e-6 and x1 > 0
    from proj_ray.factory import transform

    ex = transform("+proj=merc +lon_0=180 +datum=WGS84",
                   "fwd", np.radians([190.0 - 360.0]), np.radians([0.0]))
    assert abs(x1 - ex[0][0]) < 1e-6


def test_densify_validation():
    P = create_crs_to_crs(LONGLAT, LAEA)
    with pytest.raises(ValueError):
        trans_bounds(P, "fwd", 0, 0, 1, 1, densify_pts=10001)
    with pytest.raises(ValueError):
        trans_bounds(P, "inv", 0, 0, 1, 1, densify_pts=1)  # geographic out
    with pytest.raises(ValueError):
        # latitudes reversed is an error (only longitudes may wrap)
        trans_bounds(P, "fwd", 0, 10, 1, -10)


def test_batch_matches_scalar():
    rng = np.random.default_rng(7)
    n = 40
    x0 = rng.uniform(-170, 150, n)
    y0 = rng.uniform(-80, 60, n)
    x1 = x0 + rng.uniform(1, 20, n)
    y1 = y0 + rng.uniform(1, 15, n)
    defn = "+proj=utm +zone=31 +ellps=WGS84"
    bx0, by0, bx1, by1 = transform_bounds_batch(
        defn, "fwd", x0, y0, x1, y1, densify_pts=21)
    for i in range(n):
        sx0, sy0, sx1, sy1 = trans_bounds(defn, "fwd", x0[i], y0[i],
                                          x1[i], y1[i], densify_pts=21)
        assert abs(bx0[i] - sx0) < 1e-9 and abs(by0[i] - sy0) < 1e-9
        assert abs(bx1[i] - sx1) < 1e-9 and abs(by1[i] - sy1) < 1e-9
