"""Count-Min sketch: upper-bound guarantee, exactness without
collisions, partition invariance."""
import numpy as np
import pandas as pd
import ray.data

from proj_ray.functions.sketch import count_min


def _truth(keys):
    s = pd.Series(keys).value_counts().sort_index()
    return s.index.to_numpy(np.int64), s.to_numpy(np.int64)


def test_cms_upper_bound_and_partition_invariance(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 5000, size=20000)  # >> width: forced collisions
    tk, tn = _truth(keys)
    prev = None
    for parts in (1, 7):
        got = count_min(
            ray.data.from_pandas(pd.DataFrame({"k": keys}))
            .repartition(parts), "k", depth=4, width=64)
        assert np.array_equal(got["k"].to_numpy(np.int64), tk)
        assert np.array_equal(got["n_exact"].to_numpy(np.int64), tn)
        est = got["n_est"].to_numpy(np.int64)
        assert (est >= tn).all()          # CMS never undercounts
        assert (est > tn).any()           # collisions present at w=64
        if prev is not None:              # merge-order free
            assert np.array_equal(est, prev)
        prev = est


def test_cms_exact_when_no_collisions(ray_session):
    # every key < width and the identity-ish hash spread of 40 keys in
    # 4 independent rows of 4096 buckets: P(all-rows collision) ~ 0
    keys = np.repeat(np.arange(40, dtype=np.int64), 13)
    got = count_min(ray.data.from_pandas(pd.DataFrame({"k": keys})),
                    "k", depth=4, width=4096)
    assert np.array_equal(got["n_est"].to_numpy(), got["n_exact"].to_numpy())
    assert (got["n_exact"].to_numpy() == 13).all()
