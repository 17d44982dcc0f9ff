"""q138 transition counts: pandas window parity on a synthetic
clickstream (ts ties broken by event_id, users interleaved)."""
import numpy as np
import pandas as pd

import __ray_entry__ as E


def test_transitions_matches_pandas_window(ray_session, tmp_path):
    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 30, n).astype(np.int64),
        "ts": pd.to_datetime(
            rng.integers(0, 10 ** 6, n), unit="s"),
        "event_type": rng.choice(list("abcde"), n),
        "value": np.zeros(n), "props": [""] * n,
    })
    d = tmp_path / "sf"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    got = E._q138_transitions(str(d))
    s = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    prev_u = s["user_id"].shift()
    prev_t = s["event_type"].shift()
    m = prev_u == s["user_id"]
    want = (pd.DataFrame({"from_type": prev_t[m],
                          "to_type": s["event_type"][m]})
            .groupby(["from_type", "to_type"], as_index=False).size()
            .rename(columns={"size": "n"})
            .sort_values(["from_type", "to_type"], ignore_index=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
