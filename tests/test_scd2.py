"""SCD2 version extraction: pandas window parity incl. single-version
keys and interleaved arrival order."""

import numpy as np
import pandas as pd


def _expected(df):
    d = df.sort_values(["k", "ts", "oid"], kind="stable")
    prev_k = d["k"].shift()
    prev_s = d["s"].shift()
    is_new = (d["k"] != prev_k) | (d["s"] != prev_s)
    starts = d[is_new].copy()
    starts["ver_no"] = starts.groupby("k").cumcount() + 1
    out = starts.rename(columns={"ts": "ts_from", "s": "state"})
    return out[["k", "ver_no", "state", "ts_from"]].reset_index(drop=True)


def test_scd2_matches_pandas(ray_session):
    import ray.data as rd

    from proj_ray.functions.temporal import scd2_versions

    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
        "oid": np.arange(n, dtype=np.int64),
        "s": rng.integers(0, 3, n).astype(np.int64)})
    # shuffle arrival order: the operator must not depend on input order
    df = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    got = (scd2_versions(rd.from_pandas(df).repartition(6),
                         "k", "ts", "s", "oid")
           .to_pandas()
           .sort_values(["k", "ver_no"], kind="stable")
           .reset_index(drop=True))
    exp = _expected(df).sort_values(["k", "ver_no"],
                                    kind="stable").reset_index(drop=True)
    got["ver_no"] = got["ver_no"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_scd2_constant_state_is_one_version(ray_session):
    import ray.data as rd

    from proj_ray.functions.temporal import scd2_versions

    df = pd.DataFrame({
        "k": np.repeat(np.arange(5, dtype=np.int64), 10),
        "ts": pd.to_datetime(np.tile(np.arange(10), 5), unit="s"),
        "oid": np.arange(50, dtype=np.int64),
        "s": np.zeros(50, dtype=np.int64)})
    out = scd2_versions(rd.from_pandas(df), "k", "ts", "s",
                        "oid").to_pandas()
    assert len(out) == 5
    assert (out["ver_no"] == 1).all()
