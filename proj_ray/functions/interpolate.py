"""Inverse-distance-weighted (IDW) interpolation of scattered points
onto a regular grid — the vector -> raster surface-fitting operator.

Exactness contract: all arithmetic is int64. Coordinates quantize to
deci-degrees (floor(deg*10 + 0.5)); the IDW power-2 weight 1/d^2 is
quantized to wq = W // max(d2, 1) with W = 2**30, so per-node
accumulators (n, sum_wq, sum_wq*v) are order-free integer sums and the
SQL oracle matches bit-for-bit. (Float weights would make the sum
order-dependent — the same trick as the engine's quantized k-means
accumulators, functions/ann.py kmeans_assign_stats.)

Overflow headroom: wq <= 2^30; with values v <= ~10^4 and <= ~10^5
in-radius points per node, sum_wq*v <= ~2^30 * 10^9 — use a radius /
grid pitch that keeps in-radius counts bounded (any real deployment
grids the domain, so counts per node are density-bounded).

Scale shape: the node lattice is small and regular (computed inline,
nothing broadcast); each batch computes a chunked points x nodes
integer distance matrix and emits <= |nodes| partial rows; one tiny
combine. For dense lattices, bucket points by coarse cell and pair
each bucket only with the nodes its radius can reach (the knn_index
ring pattern) — this function is the per-bucket kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["idw_grid_stats"]

_W = 1 << 30


def _node_lattice(x0: int, y0: int, pitch: int, nx: int, ny: int):
    gx = x0 + pitch * np.arange(nx, dtype=np.int64)
    gy = y0 + pitch * np.arange(ny, dtype=np.int64)
    gxx, gyy = np.meshgrid(gx, gy, indexing="ij")
    return gxx.ravel(), gyy.ravel()


def idw_grid_stats(ds, lon_col: str, lat_col: str, value_col: str,
                   x0: int = -1800, y0: int = -800, pitch: int = 100,
                   nx: int = 36, ny: int = 17, radius: int = 150,
                   chunk: int = 2048) -> pd.DataFrame:
    """-> pandas (gx, gy, n_pts, sum_wq, sum_wqv, est_q) for every
    lattice node with at least one point inside `radius` (deci-deg).
    est_q = sum_wqv // sum_wq is the integer IDW estimate."""
    gx, gy = _node_lattice(x0, y0, pitch, nx, ny)
    r2 = np.int64(radius) * np.int64(radius)
    n_nodes = len(gx)

    def partial(b: dict) -> pd.DataFrame:
        lon = np.asarray(b[lon_col], dtype=np.float64)
        lat = np.asarray(b[lat_col], dtype=np.float64)
        px = np.floor(lon * 10 + 0.5).astype(np.int64)
        py = np.floor(lat * 10 + 0.5).astype(np.int64)
        v = np.asarray(b[value_col], dtype=np.int64)
        cnt = np.zeros(n_nodes, dtype=np.int64)
        swq = np.zeros(n_nodes, dtype=np.int64)
        swqv = np.zeros(n_nodes, dtype=np.int64)
        for lo in range(0, len(px), chunk):
            cx = px[lo:lo + chunk, None] - gx[None, :]
            cy = py[lo:lo + chunk, None] - gy[None, :]
            d2 = cx * cx + cy * cy
            ipt, ind = (d2 <= r2).nonzero()
            wq = _W // np.maximum(d2[ipt, ind], 1)
            np.add.at(cnt, ind, 1)
            np.add.at(swq, ind, wq)
            np.add.at(swqv, ind, wq * v[lo + ipt])
        keep = cnt > 0
        return pd.DataFrame({"gx": gx[keep], "gy": gy[keep],
                             "n_pts": cnt[keep], "sum_wq": swq[keep],
                             "sum_wqv": swqv[keep]})

    parts = ds.map_batches(partial, batch_format="numpy").to_pandas()
    if not len(parts):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("gx", "gy", "n_pts", "sum_wq",
                                       "sum_wqv", "est_q")})
    out = parts.groupby(["gx", "gy"], sort=True).agg(
        n_pts=("n_pts", "sum"), sum_wq=("sum_wq", "sum"),
        sum_wqv=("sum_wqv", "sum")).reset_index()
    out["est_q"] = out["sum_wqv"] // np.maximum(out["sum_wq"], 1)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out
