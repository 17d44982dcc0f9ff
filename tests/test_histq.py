"""q143 histogram quantile sketch: estimator bound vs exact quantile,
merge-order invariance."""
import numpy as np
import pandas as pd

import __ray_entry__ as E


def test_hist_quantile_brackets_exact(ray_session, tmp_path):
    rng = np.random.default_rng(23)
    n = 20000
    price = rng.gamma(4.0, 8000.0, n).round(2)
    df = pd.DataFrame({
        "l_orderkey": np.arange(n, dtype=np.int64),
        "l_partkey": np.zeros(n, np.int64),
        "l_suppkey": np.zeros(n, np.int64),
        "l_linenumber": np.ones(n, np.int32),
        "l_quantity": np.ones(n), "l_extendedprice": price,
        "l_discount": np.zeros(n), "l_tax": np.zeros(n),
        "l_returnflag": ["N"] * n, "l_linestatus": ["O"] * n,
        "l_shipdate": pd.to_datetime(["2024-01-01"] * n)})
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "lineitem.parquet")
    got = E._q143_hist_quantile(str(d))
    cents = np.floor(price * 100 + 0.5).astype(np.int64)
    for _, row in got.iterrows():
        q = row["q_ppm"] / 1e6
        exact = np.quantile(cents, q, method="inverted_cdf")
        lo, hi = row["bin_lo"], row["bin_lo"] + 12000
        # the exact q-quantile lands inside the sketch's chosen bin
        assert lo <= exact < hi
        # cum_n covers at least ceil(q*n)
        assert row["cum_n"] >= int(np.ceil(q * n))
