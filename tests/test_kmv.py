"""KMV sketch: exact below k, estimator accuracy above k, and
partition invariance (the sketch is mergeable)."""

import numpy as np
import pandas as pd
import ray

from proj_ray.functions.sketch import kmv_distinct


def test_kmv_exact_below_k(ray_session):
    df = pd.DataFrame({"g": ["a"] * 200 + ["b"] * 90,
                       "v": list(np.arange(200) % 40)
                       + list(np.arange(90) % 17)})
    got = (kmv_distinct(ray.data.from_pandas(df).repartition(5),
                        "g", "v", k=64).to_pandas()
           .sort_values("g").reset_index(drop=True))
    assert got["est"].tolist() == [40, 17]
    assert got["n_kept"].tolist() == [40, 17]


def test_kmv_estimator_and_partition_invariance(ray_session):
    rng = np.random.default_rng(4)
    true_n = 5000
    vals = rng.choice(np.arange(1, true_n + 1), size=20000)
    df = pd.DataFrame({"g": ["x"] * len(vals), "v": vals})
    k = 256
    outs = []
    for parts in (3, 11):
        got = kmv_distinct(ray.data.from_pandas(df).repartition(parts),
                           "g", "v", k=k).to_pandas()
        outs.append(got[["n_kept", "kth_hash", "est"]].iloc[0].tolist())
    assert outs[0] == outs[1]  # mergeable: partitioning is invisible
    est = outs[0][2]
    n_distinct = df["v"].nunique()
    assert abs(est - n_distinct) / n_distinct < 3 / np.sqrt(k)
