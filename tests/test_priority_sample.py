"""Priority sampling: partition invariance and the inclusion-bias
property (heavier rows are sampled proportionally more often)."""

import numpy as np
import pandas as pd
import ray

from proj_ray.functions.sample import priority_sample


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(8)
    df = pd.DataFrame({"id": np.arange(20000, dtype=np.int64),
                       "w": rng.integers(1, 100, 20000)})
    outs = []
    for parts in (2, 13):
        got = (priority_sample(
            ray.data.from_pandas(df).repartition(parts),
            "w", "id", n=50).to_pandas()
            .sort_values(["q", "id"], ascending=[False, True])
            .reset_index(drop=True))
        outs.append(got)
    assert outs[0].equals(outs[1])
    assert len(outs[0]) == 50


def test_weight_bias(ray_session):
    # two strata: weight 1 vs weight 64; the heavy stratum should
    # dominate the sample (E[share] ~ w-proportional for n << N)
    n_each = 5000
    df = pd.DataFrame({
        "id": np.arange(2 * n_each, dtype=np.int64),
        "w": np.concatenate([np.ones(n_each, np.int64),
                             np.full(n_each, 64, np.int64)])})
    got = priority_sample(ray.data.from_pandas(df).repartition(4),
                          "w", "id", n=200).to_pandas()
    heavy = (got["w"] == 64).sum()
    assert heavy > 150  # w-proportional expectation ~197/200
