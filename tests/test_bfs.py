"""BFS hop distances: distributed min-message dataflow vs the numpy
reference, including unreachable nodes and the early-exit fixpoint."""

import numpy as np
import pandas as pd
import ray

from proj_ray.functions.graph import bfs_hops, bfs_numpy


def test_bfs_matches_numpy(ray_session):
    rng = np.random.default_rng(1)
    a = rng.integers(0, 400, 1200).astype(np.int64)
    b = rng.integers(0, 400, 1200).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b})) \
        .repartition(5)
    got = (bfs_hops(ds, source=0, max_hops=4).to_pandas()
           .sort_values("node").reset_index(drop=True))
    nodes, dist = bfs_numpy(np.concatenate([a, b]),
                            np.concatenate([b, a]), 0, 4)
    assert (got["node"].to_numpy() == nodes).all()
    assert (got["dist"].to_numpy() == dist).all()


def test_bfs_early_exit_on_small_component(ray_session):
    # component {0,1,2} exhausts in 2 hops; max_hops=10 must not
    # change the answer (fixpoint detection) nor reach 3-5
    df = pd.DataFrame({"a": [0, 1, 3, 4], "b": [1, 2, 4, 5]})
    got = (bfs_hops(ray.data.from_pandas(df), source=0, max_hops=10)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert got["node"].tolist() == [0, 1, 2]
    assert got["dist"].tolist() == [0, 1, 2]
