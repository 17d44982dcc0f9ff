"""q149 peak hour + q150 Gini: brute parity on random fixtures."""
import numpy as np
import pandas as pd

import __ray_entry__ as E


def test_peak_hour_brute(ray_session, tmp_path):
    rng = np.random.default_rng(41)
    n = 5000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 25, n).astype(np.int64),
        "ts": pd.to_datetime(rng.integers(0, 30 * 86400, n), unit="s"),
        "event_type": ["x"] * n, "value": np.zeros(n),
        "props": [""] * n})
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    got = E._q149_peak_hour(str(d))
    hrs = (df["ts"].astype(np.int64) // 10**9 // 3600 % 24).to_numpy()
    for _, r in got.iterrows():
        m = df["user_id"].to_numpy() == r["user_id"]
        cnt = np.bincount(hrs[m], minlength=24)
        assert int(r["n_at_peak"]) == cnt.max()
        assert int(r["peak_hour"]) == int(np.argmax(cnt))
        assert int(r["n_events"]) == int(m.sum())


def test_gini_brute_and_bounds(ray_session, tmp_path):
    rng = np.random.default_rng(43)
    n = 2000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["t"] * n, "lang": ["en"] * n,
        "source": rng.choice(["a", "b", "c"], n),
        "n_chars": rng.integers(1, 5000, n).astype(np.int64)})
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "documents.parquet")
    got = E._q150_gini(str(d))
    for _, r in got.iterrows():
        x = np.sort(df[df["source"] == r["source"]]["n_chars"]
                    .to_numpy(np.int64))
        i = np.arange(1, len(x) + 1)
        num = int(((2 * i - len(x) - 1) * x).sum())
        assert int(r["g_num"]) == num
        gini = num / (len(x) * int(x.sum()))
        assert 0.0 <= gini < 1.0
