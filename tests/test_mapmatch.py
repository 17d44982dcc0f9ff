"""Map-matching kernel: vectorized snap vs exact scalar reference."""

import numpy as np

from proj_ray.stages.mapmatch import demo_segments, snap_metric

_MQ = 65536


def _scalar_mq(px, py, ax, ay, bx, by):
    ex, ey = bx - ax, by - ay
    len2 = ex * ex + ey * ey
    dot = (px - ax) * ex + (py - ay) * ey
    d2a = (px - ax) ** 2 + (py - ay) ** 2
    d2b = (px - bx) ** 2 + (py - by) ** 2
    if len2 == 0 or dot <= 0:
        return d2a * _MQ
    if dot >= len2:
        return d2b * _MQ
    return ((d2a * len2 - dot * dot) * _MQ) // len2


def test_snap_matches_scalar_reference():
    rng = np.random.default_rng(42)
    seg = demo_segments(64)
    px = rng.integers(-1800, 1801, 500)
    py = rng.integers(-850, 851, 500)
    sid, mq = snap_metric(px.astype(np.int64), py.astype(np.int64), seg)
    for i in range(len(px)):
        # exact Python-int reference over all segments, ties -> lowest s
        best = min(
            (( _scalar_mq(int(px[i]), int(py[i]), *map(int, seg[j, 1:])),
              int(seg[j, 0])) for j in range(len(seg))))
        assert (int(mq[i]), int(sid[i])) == best


def test_point_on_segment_has_zero_metric():
    # segment (0,0)-(10,10); its lattice midpoint lies exactly on it
    seg = np.array([[0, 0, 0, 10, 10]], dtype=np.int64)
    sid, mq = snap_metric(np.array([5], dtype=np.int64),
                          np.array([5], dtype=np.int64), seg)
    assert mq[0] == 0 and sid[0] == 0


def test_zero_length_segment_is_point_distance():
    seg = np.array([[7, 3, 4, 3, 4]], dtype=np.int64)
    sid, mq = snap_metric(np.array([0], dtype=np.int64),
                          np.array([0], dtype=np.int64), seg)
    assert sid[0] == 7 and mq[0] == 25 * _MQ


def test_segment_snap_stats_counts(ray_session):
    import ray.data as rd
    import pandas as pd

    from proj_ray.stages.mapmatch import segment_snap_stats

    rng = np.random.default_rng(9)
    df = pd.DataFrame({"lon": rng.uniform(-179, 179, 3000),
                       "lat": rng.uniform(-84, 84, 3000)})
    seg = demo_segments(64)
    out = segment_snap_stats(rd.from_pandas(df).repartition(5),
                             "lon", "lat", seg)
    assert out["n_pts"].sum() == 3000
    # parity with a single-shot local computation
    px = np.floor(df["lon"].to_numpy() * 10 + 0.5).astype(np.int64)
    py = np.floor(df["lat"].to_numpy() * 10 + 0.5).astype(np.int64)
    sid, mq = snap_metric(px, py, seg)
    exp = pd.DataFrame({"seg_id": sid, "mq": mq}).groupby(
        "seg_id", sort=True).agg(n_pts=("mq", "size"),
                                 sum_mq=("mq", "sum")).reset_index()
    pd.testing.assert_frame_equal(
        out, exp.astype(np.int64), check_dtype=False)
