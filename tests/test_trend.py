"""q139 grouped regression: slope pair matches numpy polyfit and is
partition-order free."""
import numpy as np
import pandas as pd

import __ray_entry__ as E


def test_trend_matches_polyfit(ray_session, tmp_path):
    rng = np.random.default_rng(21)
    n = 6000
    days = rng.integers(0, 30, n)
    ts = pd.to_datetime((19723 + days) * 86400, unit="s")
    val = (2.5 * days + rng.normal(0, 3, n)).round(2)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.zeros(n, np.int64), "ts": ts,
        "event_type": rng.choice(["a", "b"], n),
        "value": val, "props": [""] * n})
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    got = E._q139_trend(str(d))
    for _, row in got.iterrows():
        m = df["event_type"] == row["event_type"]
        x = days[m.to_numpy()]
        y = np.floor(val[m.to_numpy()] * 100 + 0.5)
        slope = row["num"] / row["den"]
        want = np.polyfit(x, y, 1)[0]
        assert abs(slope - want) < 1e-6
        # ~2.5 units/day in cents
        assert 200 < slope < 300
