"""q148 radius of gyration: brute per-user parity on the fixture."""
import numpy as np

import __ray_entry__ as E


def test_gyration_brute(ray_session):
    import duckdb
    got = E._q148_gyration("/root/testdata/sf0.001")
    con = duckdb.connect()
    df = con.execute(
        "SELECT event_id, user_id, epoch_us(ts) AS t FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')").df()
    e = df["event_id"].to_numpy(np.int64)
    u = df["user_id"].to_numpy(np.int64)
    bk = df["t"].to_numpy(np.int64) // 259_200_000_000
    x = (u * 2654435761 + bk * 40503) % 100_000_000 \
        + (e * 7919 % 2001 - 1000)
    y = (u * 2246822519 + bk * 65537) % 100_000_000 \
        + (e * 104729 % 2001 - 1000)
    for _, row in got.iterrows():
        m = u == row["user_id"]
        cx = int(x[m].sum()) // int(m.sum())
        cy = int(y[m].sum()) // int(m.sum())
        rg2 = int(((x[m] - cx) ** 2 + (y[m] - cy) ** 2).sum())
        assert int(row["rg2_sum"]) == rg2
        assert int(row["n_points"]) == int(m.sum())
