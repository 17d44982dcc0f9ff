"""proj_factors distortion analysis (reference src/factors.cpp:15,
src/deriv.cpp:8, P5_FACTORS src/proj.h:206-221)."""

import numpy as np
import pytest


def test_merc_factors_closed_form():
    from proj_ray.factors import factors

    phi = np.radians([0.0, 30.0, 55.0, 70.0])
    f = factors("+proj=merc +ellps=WGS84", np.zeros(4), phi)
    es = 0.0066943799901413165
    expect = np.sqrt(1 - es * np.sin(phi) ** 2) / np.cos(phi)
    assert np.allclose(f["parallel_scale"], expect, rtol=1e-7)
    assert np.allclose(f["meridional_scale"], expect, rtol=1e-7)
    # conformal: no angular distortion, axes equal, areal = k*h
    assert np.allclose(f["angular_distortion"], 0, atol=1e-6)
    assert np.allclose(f["tissot_semimajor"], f["tissot_semiminor"],
                       rtol=1e-6)
    assert np.allclose(f["areal_scale"], expect * expect, rtol=1e-6)
    assert np.allclose(f["meridian_convergence"], 0, atol=1e-9)


def test_utm_scale_and_convergence():
    from proj_ray.factors import factors

    f = factors("+proj=utm +zone=32 +ellps=GRS80",
                np.radians([9.0, 12.0]), np.radians([55.0, 55.0]))
    # on the central meridian scale = k_0
    assert f["parallel_scale"][0] == pytest.approx(0.9996, rel=1e-7)
    # 3 deg off: convergence ~ atan(tan(dlam) sin(phi))
    gamma = np.arctan(np.tan(np.radians(3.0)) * np.sin(np.radians(55.0)))
    assert f["meridian_convergence"][1] == pytest.approx(gamma, abs=2e-4)


def test_cea_equal_area():
    from proj_ray.factors import factors

    f = factors("+proj=cea +ellps=WGS84", np.radians([10.0]),
                np.radians([35.0]))
    assert f["areal_scale"][0] == pytest.approx(1.0, rel=1e-6)


def test_factors_invalid_latitude_nan():
    from proj_ray.factors import factors

    f = factors("+proj=merc +ellps=WGS84", np.zeros(1),
                np.array([np.pi]))  # > pi/2
    assert np.isnan(f["parallel_scale"][0])


def test_with_factors_stage(ray_session):
    import ray.data as rd

    from proj_ray.factors import with_factors

    ds = rd.from_items([{"lon": 9.0, "lat": 50.0},
                        {"lon": 15.0, "lat": 60.0}])
    out = with_factors(ds, "+proj=utm +zone=32 +ellps=GRS80").to_pandas()
    assert {"meridional_scale", "parallel_scale",
            "areal_scale"} <= set(out.columns)
    assert (out["parallel_scale"] > 0.999).all()


def test_factors_units_and_axis_invariant():
    """pj_factors derivatives come from the raw kernel (deriv.cpp:21):
    output units (+units=us-ft) and +axis flips must not leak into the
    scale factors (they did before round 3)."""
    from proj_ray.factors import factors

    base = ("+proj=tmerc +lat_0=0 +lon_0=-86.666666 +k=0.9996 "
            "+x_0=500000 +ellps=GRS80")
    lon, lat = [-86.666666], [40.0]
    f_m = factors(base, lon, lat, degrees=True)
    f_ft = factors(base + " +units=us-ft", lon, lat, degrees=True)
    f_ax = factors(base + " +axis=wsu", lon, lat, degrees=True)
    for k in ("parallel_scale", "meridional_scale", "areal_scale"):
        assert f_ft[k][0] == pytest.approx(f_m[k][0], rel=1e-12)
        assert f_ax[k][0] == pytest.approx(f_m[k][0], rel=1e-12)
    assert f_m["parallel_scale"][0] == pytest.approx(0.9996, abs=1e-6)
    assert f_ax["meridian_convergence"][0] == pytest.approx(
        f_m["meridian_convergence"][0], abs=1e-12)
