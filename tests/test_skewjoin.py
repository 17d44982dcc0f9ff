"""Salted skew join: parity across salt levels, vs pandas, and the
hot-key census superset guarantee."""

import numpy as np
import pandas as pd
import pytest


def _zipf_tables(seed=11, n_fact=20_000, n_keys=200):
    rng = np.random.default_rng(seed)
    # Zipf-ish: key 0 takes ~35% of rows, long uniform tail
    hot = rng.integers(0, 3, n_fact // 2)
    tail = rng.integers(0, n_keys, n_fact - len(hot))
    keys = np.concatenate([hot, tail])
    rng.shuffle(keys)
    fact = pd.DataFrame({
        "k": keys.astype(np.int64),
        "value": rng.uniform(-10, 10, n_fact).round(4)})
    dim = pd.DataFrame({
        "dk": np.arange(n_keys, dtype=np.int64),
        "grp": [f"g{i % 7}" for i in range(n_keys)]})
    return fact, dim


def _expected(fact, dim, scale=100):
    j = fact.merge(dim, left_on="k", right_on="dk")
    j["vq"] = np.floor(j["value"] * scale + 0.5).astype(np.int64)
    out = j.groupby("grp", sort=True).agg(
        n=("vq", "size"), sum_value_q=("vq", "sum")).reset_index()
    out["n"] = out["n"].astype(np.int64)
    return out.rename(columns={"grp": "grp"})


@pytest.mark.parametrize("salt", [1, 8])
def test_salted_join_agg_matches_pandas(ray_session, salt):
    import ray.data as rd

    from proj_ray.functions.skewjoin import salted_join_agg

    fact, dim = _zipf_tables()
    got = salted_join_agg(
        rd.from_pandas(fact).repartition(8),
        rd.from_pandas(dim).repartition(3),
        "k", "dk", "grp", "value", salt=salt)
    exp = _expected(fact, dim).rename(columns={"grp": "grp"})
    got = got.sort_values("grp").reset_index(drop=True)
    exp = exp.sort_values("grp").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_names=False)


def test_salt_levels_agree_and_unmatched_keys_drop(ray_session):
    import ray.data as rd

    from proj_ray.functions.skewjoin import salted_join_agg

    fact, dim = _zipf_tables(seed=5)
    # make some fact keys unmatched: dim covers only even keys
    dim = dim[dim["dk"] % 2 == 0].reset_index(drop=True)
    a = salted_join_agg(rd.from_pandas(fact).repartition(6),
                        rd.from_pandas(dim), "k", "dk", "grp", "value",
                        salt=1)
    b = salted_join_agg(rd.from_pandas(fact).repartition(6),
                        rd.from_pandas(dim), "k", "dk", "grp", "value",
                        salt=16, hot_threshold=10)
    pd.testing.assert_frame_equal(
        a.sort_values("grp").reset_index(drop=True),
        b.sort_values("grp").reset_index(drop=True))
    exp = _expected(fact, dim)
    pd.testing.assert_frame_equal(
        a.sort_values("grp").reset_index(drop=True),
        exp.sort_values("grp").reset_index(drop=True), check_names=False)


def test_hot_keys_census_superset(ray_session):
    import ray.data as rd

    from proj_ray.functions.skewjoin import hot_keys

    fact, _ = _zipf_tables(seed=3)
    true_counts = fact["k"].value_counts()
    thr = 500
    hot = hot_keys(rd.from_pandas(fact).repartition(8), "k", thr, m=64)
    truly_hot = set(true_counts[true_counts >= thr].index.tolist())
    # MG upper bound: every truly-hot key must be reported
    assert truly_hot <= hot
    # and the census is bounded, not the full key set
    assert len(hot) <= 64 + len(truly_hot)
