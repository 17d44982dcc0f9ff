"""DBSCAN core-point stats: brute-force parity and planted clusters."""

import numpy as np
import pandas as pd


def _brute(df, eps_mdeg, min_pts):
    px = np.floor(df["lon"].to_numpy() * 1000 + 0.5).astype(np.int64)
    py = np.floor(df["lat"].to_numpy() * 1000 + 0.5).astype(np.int64)
    d2 = ((px[:, None] - px[None, :]) ** 2
          + (py[:, None] - py[None, :]) ** 2)
    cnt = (d2 <= eps_mdeg * eps_mdeg).sum(axis=1)
    core = cnt >= min_pts
    ids = df["id"].to_numpy(np.int64)
    return (int(core.sum()), int((~core).sum()),
            int((cnt * (ids + 1)).sum()))


def test_dbscan_matches_brute(ray_session):
    import ray.data as rd

    from proj_ray.functions.dbscan import dbscan_core_stats

    rng = np.random.default_rng(13)
    df = pd.DataFrame({"lon": rng.uniform(-179, 179, 1500),
                       "lat": rng.uniform(-84, 84, 1500),
                       "id": np.arange(1500, dtype=np.int64)})
    out = dbscan_core_stats(rd.from_pandas(df).repartition(6),
                            "lon", "lat", "id",
                            eps_mdeg=3000, min_pts=3).iloc[0]
    nc, nn, chk = _brute(df, 3000, 3)
    assert (out["n_core"], out["n_noncore"], out["chk"]) == (nc, nn, chk)


def test_dbscan_planted_cluster(ray_session):
    import ray.data as rd

    from proj_ray.functions.dbscan import dbscan_core_stats

    # a tight blob of 6 + 3 isolated points; min_pts 4 -> blob is core
    rng = np.random.default_rng(2)
    blob = rng.uniform(-0.4, 0.4, (6, 2))
    iso = np.array([[100.0, 50.0], [-120.0, -60.0], [60.0, 70.0]])
    pts = np.vstack([blob, iso])
    df = pd.DataFrame({"lon": pts[:, 0], "lat": pts[:, 1],
                       "id": np.arange(9, dtype=np.int64)})
    out = dbscan_core_stats(rd.from_pandas(df), "lon", "lat", "id",
                            eps_mdeg=2000, min_pts=4).iloc[0]
    assert out["n_core"] == 6
    assert out["n_noncore"] == 3


def test_dbscan_ball_straddles_cells(ray_session):
    import ray.data as rd

    from proj_ray.functions.dbscan import dbscan_core_stats

    # two points in DIFFERENT eps-cells but within eps: the ghost
    # replication must count them for each other
    df = pd.DataFrame({"lon": [0.999, 1.001, 50.0],
                       "lat": [0.0, 0.0, 50.0],
                       "id": np.arange(3, dtype=np.int64)})
    out = dbscan_core_stats(rd.from_pandas(df), "lon", "lat", "id",
                            eps_mdeg=1000, min_pts=2).iloc[0]
    assert out["n_core"] == 2
    assert out["n_noncore"] == 1
