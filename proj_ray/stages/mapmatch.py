"""Map-matching: snap points to the nearest polyline segment.

Geospatial operator (vector x vector nearest-object join): each point
is assigned to the segment minimizing an EXACT integer distance
metric, so the result is bit-reproducible and SQL-oracle-checkable —
no float argmin ties. The reference's analogous shape is per-point
candidate selection against a small indexed geometry set
(src/grids.cpp grid descent; tinshift quadtree point location).

Metric: coordinates quantized to integer deci-degrees
(floor(deg*10 + 0.5)); squared point-to-segment distance is the
rational (|p-a|^2 * len2 - dot^2) / len2 on the interior branch, so
the comparable metric is the floor-scaled integer

    mq = (num * 65536) // den        (int64 end-to-end)

with den = 1 on the endpoint branches. Bounds: |coords| <= 3600 so
num <= ~4e11 and num*65536 <= ~3e16 — safely inside int64. Ties break
by segment id ascending (np.argmin first-hit == SQL ORDER BY mq, s).

Scale shape: the segment set is small (a road tile's worth) and
broadcast once via ray.put; each batch computes a vectorized
points x segments distance matrix and emits <= |segments| partial
(seg, n, sum_mq) rows; one tiny driver combine. For continental road
networks, partition segments by coarse tile and route points to their
tile's segment set first (the knn_index pattern) — this stage is the
per-partition kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["segment_snap_stats", "snap_metric"]

_MQ_SCALE = 65536


def snap_metric(px: np.ndarray, py: np.ndarray, seg: np.ndarray):
    """(n_pts,) best segment id + (n_pts,) integer metric mq.

    seg: (m, 5) int64 rows (s, ax, ay, bx, by). All int64 math."""
    ax, ay = seg[:, 1][None, :], seg[:, 2][None, :]
    bx, by = seg[:, 3][None, :], seg[:, 4][None, :]
    ex, ey = bx - ax, by - ay
    len2 = ex * ex + ey * ey
    dxa = px[:, None] - ax
    dya = py[:, None] - ay
    dxb = px[:, None] - bx
    dyb = py[:, None] - by
    dot = dxa * ex + dya * ey
    d2a = dxa * dxa + dya * dya
    d2b = dxb * dxb + dyb * dyb
    interior_num = d2a * len2 - dot * dot
    safe_len2 = np.maximum(len2, 1)
    mq = np.where(
        (len2 == 0) | (dot <= 0), d2a * _MQ_SCALE,
        np.where(dot >= len2, d2b * _MQ_SCALE,
                 (interior_num * _MQ_SCALE) // safe_len2))
    best = np.argmin(mq, axis=1)  # first hit = lowest segment id
    rows = np.arange(len(px))
    return seg[best, 0], mq[rows, best]


def segment_snap_stats(ds, lon_col: str, lat_col: str,
                       segments: np.ndarray) -> pd.DataFrame:
    """Snap every point to its nearest segment; -> pandas
    (seg_id, n_pts, sum_mq) sorted by seg_id. `segments` is (m, 5)
    int64 (s, ax, ay, bx, by) in deci-degrees, broadcast once."""
    import ray

    seg_ref = ray.put(np.ascontiguousarray(segments, dtype=np.int64))

    def partial(b: dict) -> pd.DataFrame:
        lon = np.asarray(b[lon_col], dtype=np.float64)
        lat = np.asarray(b[lat_col], dtype=np.float64)
        px = np.floor(lon * 10 + 0.5).astype(np.int64)
        py = np.floor(lat * 10 + 0.5).astype(np.int64)
        seg = ray.get(seg_ref)
        sid, mq = snap_metric(px, py, seg)
        g = pd.DataFrame({"seg_id": sid, "_mq": mq}).groupby(
            "seg_id", sort=False).agg(n_pts=("_mq", "size"),
                                      sum_mq=("_mq", "sum"))
        return g.reset_index()

    parts = ds.map_batches(partial, batch_format="numpy").to_pandas()
    if not len(parts):
        return pd.DataFrame({"seg_id": pd.Series([], dtype=np.int64),
                             "n_pts": pd.Series([], dtype=np.int64),
                             "sum_mq": pd.Series([], dtype=np.int64)})
    out = parts.groupby("seg_id", sort=True).agg(
        n_pts=("n_pts", "sum"), sum_mq=("sum_mq", "sum")).reset_index()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def demo_segments(m: int = 64) -> np.ndarray:
    """Deterministic synthetic 'road' segments in integer deci-degrees
    (mirrored verbatim by the q109 SQL oracle)."""
    s = np.arange(m, dtype=np.int64)
    ax = (s * 127) % 3600 - 1800
    ay = (s * 211) % 1700 - 850
    bx = ax + (s * 89) % 200 - 100
    by = ay + (s * 53) % 200 - 100
    return np.stack([s, ax, ay, bx, by], axis=1)


def route_endpoints(m: int = 8):
    """Deterministic great-circle routes (degrees), mirrored verbatim
    by the q117 SQL oracle."""
    r = np.arange(m, dtype=np.int64)
    lat_a = (r * 29) % 140 - 70 + 0.5
    lon_a = (r * 47) % 340 - 170 + 0.5
    lat_b = (r * 61 + 37) % 140 - 70 + 0.5
    lon_b = (r * 83 + 59) % 340 - 170 + 0.5
    return np.stack([r.astype(np.float64), lat_a, lon_a, lat_b, lon_b],
                    axis=1)


def cross_track_stats(ds, lon_col: str, lat_col: str,
                      routes: np.ndarray, max_m: int = 500_000):
    """Assign each point to the great-circle ROUTE with the smallest
    absolute cross-track distance (spherical: asin(sin(d13) *
    sin(theta13 - theta12)) * R, the standard corridor test an AIS /
    flight-track pipeline runs), keep points within `max_m` meters of
    their route, and return pandas (route_id, n_pts, sum_dxt_q) with
    dxt quantized to whole meters (floor(|dxt| + 0.5)) so the argmin
    and the sums are integer-exact.

    Float contract: every transcendental is composed in exactly the
    SQL oracle's op order (the q57/q58 convention — numpy and DuckDB
    share libm, so mirrored expressions match bit-for-bit); acos
    arguments clamp to [-1, 1] on both sides. Routes broadcast via
    closure (tiny); each batch computes points x routes and ships
    <= |routes| partial rows."""
    import pandas as pd

    rid = routes[:, 0].astype(np.int64)
    phi1 = np.radians(routes[:, 1])[None, :]
    lam1 = np.radians(routes[:, 2])[None, :]
    phi2 = np.radians(routes[:, 3])[None, :]
    lam2 = np.radians(routes[:, 4])[None, :]
    th12 = np.arctan2(
        np.sin(lam2 - lam1) * np.cos(phi2),
        np.cos(phi1) * np.sin(phi2)
        - np.sin(phi1) * np.cos(phi2) * np.cos(lam2 - lam1))

    def partial(b: dict) -> pd.DataFrame:
        phip = np.radians(np.asarray(b[lat_col], np.float64))[:, None]
        lamp = np.radians(np.asarray(b[lon_col], np.float64))[:, None]
        cosd = (np.sin(phi1) * np.sin(phip)
                + np.cos(phi1) * np.cos(phip) * np.cos(lamp - lam1))
        d13 = np.arccos(np.minimum(np.maximum(cosd, -1.0), 1.0))
        th13 = np.arctan2(
            np.sin(lamp - lam1) * np.cos(phip),
            np.cos(phi1) * np.sin(phip)
            - np.sin(phi1) * np.cos(phip) * np.cos(lamp - lam1))
        dxt = np.arcsin(np.minimum(np.maximum(
            np.sin(d13) * np.sin(th13 - th12), -1.0), 1.0)) * 6371000.0
        mq = np.floor(np.abs(dxt) + 0.5).astype(np.int64)
        best = np.argmin(mq, axis=1)  # ties -> lowest route id
        rows = np.arange(len(best))
        bm = mq[rows, best]
        keep = bm <= max_m
        g = pd.DataFrame({"route_id": rid[best[keep]],
                          "_mq": bm[keep]}).groupby(
            "route_id", sort=False).agg(n_pts=("_mq", "size"),
                                        sum_dxt_q=("_mq", "sum"))
        return g.reset_index()

    parts = ds.map_batches(partial, batch_format="numpy").to_pandas()
    if not len(parts):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("route_id", "n_pts",
                                       "sum_dxt_q")})
    out = parts.groupby("route_id", sort=True).agg(
        n_pts=("n_pts", "sum"), sum_dxt_q=("sum_dxt_q", "sum")) \
        .reset_index()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out
