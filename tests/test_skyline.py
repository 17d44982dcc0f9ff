"""2-D skyline: exactness vs the NOT-EXISTS dominance oracle,
including duplicated frontier points and block-boundary effects."""

import duckdb
import numpy as np
import pandas as pd
import ray

from proj_ray.functions.skyline import skyline2d


def _brute(df):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(
        "SELECT price, size, id FROM t a WHERE NOT EXISTS ("
        " SELECT 1 FROM t b WHERE b.price <= a.price"
        " AND b.size >= a.size"
        " AND (b.price < a.price OR b.size > a.size))"
    ).df().sort_values("id").reset_index(drop=True)


def test_skyline_anticorrelated_with_dups(ray_session):
    rng = np.random.default_rng(2)
    n = 3000
    price = rng.integers(0, 80, n).astype(np.float64)
    size = (80 - price + rng.integers(-4, 5, n)).astype(np.int64)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "price": price, "size": size})
    got = (skyline2d(ray.data.from_pandas(df).repartition(7),
                     "price", "size", ("id",))
           .to_pandas().sort_values("id").reset_index(drop=True))
    want = _brute(df)
    assert len(got) == len(want)
    for c in ("price", "size", "id"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all()


def test_skyline_all_duplicate_points(ray_session):
    df = pd.DataFrame({"id": np.arange(40, dtype=np.int64),
                       "price": np.full(40, 3.5),
                       "size": np.full(40, 7, dtype=np.int64)})
    got = (skyline2d(ray.data.from_pandas(df).repartition(5),
                     "price", "size", ("id",)).to_pandas())
    assert len(got) == 40  # nothing dominates an identical twin
