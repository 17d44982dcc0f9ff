"""Fuzzy string join: banded-DP exactness vs DuckDB levenshtein, and
total recall of the deletion-neighborhood blocking at k=1."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from proj_ray.functions.fuzzy import (banded_levenshtein, _encode,
                                      fuzzy_join)


def _rand_strs(rng, n, lmax, alpha="abcd"):
    return ["".join(rng.choice(list(alpha))
                    for _ in range(rng.integers(0, lmax)))
            for _ in range(n)]


@pytest.mark.parametrize("k", [1, 2, 3])
def test_banded_dp_matches_duckdb(k):
    rng = np.random.default_rng(11 + k)
    pool = _rand_strs(rng, 200, 10)
    a = [pool[i] for i in rng.integers(0, 200, 1500)]
    b = [pool[i] for i in rng.integers(0, 200, 1500)]
    am, al = _encode(a)
    bm, bl = _encode(b)
    got = banded_levenshtein(am, al, bm, bl, k)
    con = duckdb.connect()
    want = np.minimum(
        [con.execute("select levenshtein(?, ?)", [x, y]).fetchone()[0]
         for x, y in zip(a, b)], k + 1)
    assert (got == np.asarray(want)).all()


def test_fuzzy_join_exact_vs_brute(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"id": np.arange(400, dtype=np.int64),
                       "s": _rand_strs(rng, 400, 9, "abcde")})
    ds = ray.data.from_pandas(df).repartition(6)
    got = (fuzzy_join(ds, "s", "id", 1).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT a.id id_a, b.id id_b, "
        "CAST(levenshtein(a.s, b.s) AS BIGINT) dist "
        "FROM t a, t b WHERE a.id < b.id "
        "AND levenshtein(a.s, b.s) <= 1"
    ).df().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ("id_a", "id_b", "dist"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all()
