"""q145 correlation stats: integer pieces reproduce numpy corrcoef."""
import numpy as np
import pandas as pd

import __ray_entry__ as E


def test_corr_pieces_match_numpy(ray_session, tmp_path):
    rng = np.random.default_rng(31)
    n = 8000
    qty = rng.integers(1, 51, n)
    disc = np.clip((qty // 10) + rng.integers(0, 4, n), 0, 10)  # corr>0
    tax = rng.integers(0, 9, n)
    days = rng.integers(0, 30, n)
    df = pd.DataFrame({
        "l_orderkey": np.arange(n, dtype=np.int64),
        "l_partkey": np.zeros(n, np.int64),
        "l_suppkey": np.zeros(n, np.int64),
        "l_linenumber": np.ones(n, np.int32),
        "l_quantity": qty.astype(float),
        "l_extendedprice": np.ones(n),
        "l_discount": disc / 100.0, "l_tax": tax / 100.0,
        "l_returnflag": ["N"] * n, "l_linestatus": ["O"] * n,
        "l_shipdate": pd.to_datetime((19723 + days) * 86400, unit="s")})
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "lineitem.parquet")
    got = E._q145_corr_matrix(str(d))
    cols = {"qty": qty, "disc": disc, "tax": tax, "sday": days}
    for _, r in got.iterrows():
        x, y = cols[r["ca"]].astype(float), cols[r["cb"]].astype(float)
        want = np.corrcoef(x, y)[0, 1]
        have = r["num"] / np.sqrt(float(r["den_a"]) * float(r["den_b"]))
        assert abs(have - want) < 1e-9
    row = got[(got["ca"] == "disc") & (got["cb"] == "qty")].iloc[0]
    assert row["num"] > 0  # planted positive correlation
