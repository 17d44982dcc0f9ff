"""Cross-track corridor assignment: analytic cases + on-circle zeros."""

import numpy as np
import pandas as pd


def test_equator_route_crosstrack_is_latitude_arc(ray_session):
    import ray.data as rd

    from proj_ray.stages.mapmatch import cross_track_stats

    # route 0: the equator segment (0,0) -> (0, 90E). For a point at
    # longitude 45E and latitude phi, |dxt| = phi * R exactly.
    routes = np.array([[0, 0.0, 0.0, 0.0, 90.0]])
    R = 6371000.0
    lats = np.array([1.0, 5.0, -3.0, 0.0])
    df = pd.DataFrame({"lon": np.full(4, 45.0), "lat": lats})
    out = cross_track_stats(rd.from_pandas(df), "lon", "lat", routes,
                            max_m=10**9)
    assert out.iloc[0]["n_pts"] == 4
    exp = np.floor(np.abs(np.radians(lats)) * R + 0.5).sum()
    assert out.iloc[0]["sum_dxt_q"] == int(exp)


def test_points_on_the_great_circle_have_zero_crosstrack(ray_session):
    import ray.data as rd

    from proj_ray.stages.mapmatch import cross_track_stats

    # slerp points along the circle through A, B
    a = np.radians([10.0, -30.0])   # lat, lon
    b = np.radians([45.0, 60.0])

    def unit(lat, lon):
        return np.array([np.cos(lat) * np.cos(lon),
                         np.cos(lat) * np.sin(lon), np.sin(lat)])

    ua, ub = unit(*a), unit(*b)
    omega = np.arccos(ua @ ub)
    ts = np.linspace(0.1, 0.9, 7)
    pts = np.array([(np.sin((1 - t) * omega) * ua
                     + np.sin(t * omega) * ub) / np.sin(omega)
                    for t in ts])
    lat = np.degrees(np.arcsin(pts[:, 2]))
    lon = np.degrees(np.arctan2(pts[:, 1], pts[:, 0]))
    routes = np.array([[0, 10.0, -30.0, 45.0, 60.0]])
    out = cross_track_stats(
        rd.from_pandas(pd.DataFrame({"lon": lon, "lat": lat})),
        "lon", "lat", routes, max_m=10**9)
    # metres of cross-track over 7 on-circle points: numerically ~0
    assert out.iloc[0]["n_pts"] == 7
    assert out.iloc[0]["sum_dxt_q"] <= 7  # < 1 m each


def test_route_argmin_and_corridor_filter(ray_session):
    import ray.data as rd

    from proj_ray.stages.mapmatch import cross_track_stats

    # the equator route and the great circle from (30,0) to (30,90)
    # (which bulges NORTH of the 30th parallel mid-route); a point just
    # south of the second route's start snaps to it, a near-equator
    # point to route 0, and a pole point is outside both corridors
    routes = np.array([[0, 0.0, 0.0, 0.0, 90.0],
                       [1, 30.0, 0.0, 30.0, 90.0]])
    df = pd.DataFrame({"lon": [45.0, 2.0, 45.0],
                       "lat": [5.0, 28.0, 89.0]})
    out = cross_track_stats(rd.from_pandas(df), "lon", "lat", routes,
                            max_m=1_000_000)
    got = dict(zip(out["route_id"], out["n_pts"]))
    assert got == {0: 1, 1: 1}
