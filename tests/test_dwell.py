"""q144 dwell time: total dwell equals per-user span sum; counts
equal event count."""
import numpy as np
import pandas as pd

import __ray_entry__ as E


def test_dwell_totals(ray_session, tmp_path):
    rng = np.random.default_rng(29)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 10 ** 6, n), unit="s"),
        "event_type": ["x"] * n, "value": np.zeros(n),
        "props": [""] * n})
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    got = E._q144_dwell_time(str(d))
    assert int(got["n_visits"].sum()) == n
    # sum of all dwell = sum over users of (max ts - min ts)
    us = df.groupby("user_id")["ts"].agg(["min", "max"])
    span = int(((us["max"] - us["min"]).dt.total_seconds() * 1e6)
               .round().sum())
    assert int(got["dwell_us"].sum()) == span
