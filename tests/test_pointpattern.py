import numpy as np
import pandas as pd

from proj_ray.functions.pointpattern import (pair_counts_brute,
                                             pair_counts_within,
                                             variogram_bands,
                                             variogram_brute)


def _points(n, seed=0, span=50_000):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, span, n), rng.integers(0, span, n),
            rng.integers(0, 1_000_000, n))


def test_pair_counts_matches_brute(ray_session):
    import ray.data as rd

    x, y, t = _points(400)
    ds = rd.from_pandas(pd.DataFrame(
        {"x": x, "y": y, "pid": np.arange(len(x))}))
    radii = [1000, 4000, 10000]
    got = pair_counts_within(ds, radii, cell=10000)
    want = pair_counts_brute(x, y, radii)
    pd.testing.assert_frame_equal(got, want)


def test_pair_counts_time_dimension(ray_session):
    import ray.data as rd

    x, y, t = _points(300, seed=1)
    ds = rd.from_pandas(pd.DataFrame(
        {"x": x, "y": y, "t": t, "pid": np.arange(len(x))}))
    radii = [5000, 10000]
    tau = 200_000
    got = pair_counts_within(ds, radii, cell=10000,
                             time_col="t", tau=tau)
    want = pair_counts_brute(x, y, radii, t=t, tau=tau)
    pd.testing.assert_frame_equal(got, want)


def test_pair_counts_duplicate_points(ray_session):
    """Coincident points are distinct pairs (id tiebreak, d2=0)."""
    import ray.data as rd

    x = np.array([5, 5, 5, 20000])
    y = np.array([7, 7, 7, 20000])
    ds = rd.from_pandas(pd.DataFrame(
        {"x": x, "y": y, "pid": np.arange(4)}))
    got = pair_counts_within(ds, [100], cell=10000)
    assert got["n_pairs"].tolist() == [3]


def test_variogram_matches_brute(ray_session):
    import ray.data as rd

    x, y, t = _points(350, seed=2)
    v = (x * 7 + y * 3) % 1000
    ds = rd.from_pandas(pd.DataFrame(
        {"x": x, "y": y, "v": v, "pid": np.arange(len(x))}))
    bands = [(0, 2000), (2000, 6000), (6000, 10000)]
    got = variogram_bands(ds, bands, cell=10000)
    want = variogram_brute(x, y, v, bands)
    pd.testing.assert_frame_equal(got, want)


def test_pair_counts_rejects_bad_radius(ray_session):
    import pytest
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame(
        {"x": [1], "y": [1], "pid": [0]}))
    with pytest.raises(ValueError):
        pair_counts_within(ds, [20000], cell=10000)
