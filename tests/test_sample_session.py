"""Sessionization and stratified-sampling operators vs brute force."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from proj_ray.functions.sample import _mix, stratified_sample
from proj_ray.functions.temporal import sessionize


@pytest.fixture(scope="module")
def events():
    rng = np.random.default_rng(3)
    n = 2000
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "u": rng.integers(0, 20, n),
        "typ": rng.choice(list("abcde"), n),
        "ts": rng.integers(0, 10_000, n).astype("datetime64[s]")
        .astype("datetime64[us]"),
    })


def test_sessionize_brute_parity(events):
    gap = 600_000_000
    out = sessionize(rd.from_pandas(events).repartition(7),
                     "u", "ts", gap, "id").to_pandas()
    want = {}
    for u, g in events.groupby("u"):
        g = g.sort_values(["ts", "id"], kind="stable")
        t = g["ts"].astype("int64").to_numpy()
        s = k = 0
        last = None
        for rid, tt in zip(g["id"], t):
            if last is None or tt - last > gap:
                s += 1
                k = 0
            k += 1
            last = tt
            want[rid] = (u, s, k)
    assert len(out) == len(events)
    for r in out.itertuples():
        assert want[r.id] == (r.u, r.session_seq, r.event_seq)


def test_stratified_sample_brute_parity(events):
    n = 15
    out = stratified_sample(rd.from_pandas(events).repartition(7),
                            "typ", "id", n).to_pandas()
    df = events.copy()
    df["_k"] = _mix(df["id"].to_numpy())
    want = (df.sort_values(["_k", "id"], kind="stable")
            .groupby("typ", sort=False).head(n))
    got = {(r.typ, r.id) for r in out.itertuples()}
    assert got == {(r.typ, r.id) for r in want.itertuples()}
    # per-stratum count: min(n, stratum size)
    sizes = events.groupby("typ").size()
    counts = out.groupby("typ").size()
    for typ, c in counts.items():
        assert c == min(n, sizes[typ])


def test_stratified_sample_prune_bound(events):
    """The pre-shuffle prune leaves at most n rows per stratum per
    batch — the all-to-all is O(n x strata x blocks), not the corpus."""
    ds = rd.from_pandas(events).repartition(4)
    n = 5

    def prune_probe(batch):
        import numpy as _np
        import pandas as _pd

        df = _pd.DataFrame({c: _np.asarray(batch[c]) for c in batch})
        df["_k"] = (df["id"].to_numpy() % 4294967296) \
            * 2654435761 % 4294967296
        df = df.sort_values(["_k", "id"], kind="stable")
        return df.groupby("typ", sort=False).head(n)

    pruned = (ds.select_columns(["typ", "id"])
              .map_batches(prune_probe, batch_format="numpy"))
    total = pruned.count()
    assert total <= n * events["typ"].nunique() * 4


def test_top_k_per_group_brute_parity(events):
    from proj_ray.functions.sample import top_k_per_group

    vals = events.copy()
    vals["v"] = (vals["id"] * 37 % 100).astype(float)
    out = top_k_per_group(rd.from_pandas(vals).repartition(7),
                          "typ", "v", "id", 4).to_pandas()
    want = (vals.sort_values(["v", "id"], kind="stable",
                             ascending=[False, True])
            .groupby("typ", sort=False).head(4))
    assert ({(r.typ, r.id) for r in out.itertuples()}
            == {(r.typ, r.id) for r in want.itertuples()})


def test_grouped_quantiles_matches_duckdb_semantics(events):
    """quantile_disc semantics: 1-based sorted position ceil(q*n)."""
    import math

    from proj_ray.functions.stats import grouped_quantiles

    vals = events.copy()
    vals["v"] = np.round((vals["id"] * 131 % 997) / 100.0, 2)
    qs = (0.25, 0.5, 0.75, 0.95)
    out = grouped_quantiles(rd.from_pandas(vals).repartition(7),
                            "typ", "v", qs=qs, scale=100)
    for typ, g in vals.groupby("typ"):
        sv = np.sort(g["v"].to_numpy())
        n = len(sv)
        for q in qs:
            want = sv[max(math.ceil(q * n), 1) - 1]
            got = out[(out["typ"] == typ)
                      & (np.isclose(out["q"], q))]["quantile"].iloc[0]
            assert got == pytest.approx(want, abs=1e-9), (typ, q)


def test_count_distinct_exact_and_hll(events):
    from proj_ray.functions.distinct import (grouped_count_distinct,
                                             grouped_count_distinct_hll)

    vals = events.copy()
    # value domain much larger than row count per group in places
    vals["v"] = (vals["id"] * 7919 % 1500).astype(np.int64)
    ds = rd.from_pandas(vals).repartition(7)
    out = grouped_count_distinct(ds, "typ", "v").to_pandas()
    want = vals.groupby("typ")["v"].nunique()
    assert len(out) == len(want)
    for r in out.itertuples():
        assert r.n_distinct == want[r.typ], r
    # HLL estimate within 5x the theoretical standard error (1.04/64
    # at p=12) of the exact count
    est = grouped_count_distinct_hll(ds, "typ", "v", p=12)
    for r in est.itertuples():
        exact = want[r.typ]
        assert abs(r.n_distinct_est - exact) / exact < 5 * 1.04 / 64, r


def test_hll_strings_and_scale():
    from proj_ray.functions.distinct import grouped_count_distinct_hll

    n = 60_000
    df = pd.DataFrame({
        "g": np.repeat("all", n),
        "v": [f"doc-{i % 40_000}" for i in range(n)],
    })
    est = grouped_count_distinct_hll(rd.from_pandas(df), "g", "v", p=12)
    e = float(est["n_distinct_est"].iloc[0])
    assert abs(e - 40_000) / 40_000 < 5 * 1.04 / 64
