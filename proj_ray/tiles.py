"""Web-Mercator z/x/y tile assignment (pure arithmetic from webmerc x,y).

The north-star "raster<->vector tile assignment" step: every geotagged row
gets its (z, x, y) slippy-map tile. All kernels vectorized; the Dataset
wrapper lives in proj_ray.stages.
"""

from __future__ import annotations

import numpy as np

from proj_ray.cells import WEBMERC_A, lonlat_to_webmerc, tile_xy


def tile_assign(lon_deg, lat_deg, zoom: int):
    """(lon, lat) -> (tx, ty, valid) at `zoom`."""
    x, y = lonlat_to_webmerc(lon_deg, lat_deg)
    tx, ty, bad = tile_xy(x, y, zoom)
    return tx, ty, ~bad


def tile_bounds(z: np.ndarray, x: np.ndarray, y: np.ndarray):
    """Tile -> webmerc (xmin, ymin, xmax, ymax)."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    world = 2 * np.pi * WEBMERC_A
    n = (np.int64(1) << z).astype(np.float64)
    xmin = x / n * world - np.pi * WEBMERC_A
    xmax = (x + 1) / n * world - np.pi * WEBMERC_A
    ymax = np.pi * WEBMERC_A - y / n * world
    ymin = np.pi * WEBMERC_A - (y + 1) / n * world
    return xmin, ymin, xmax, ymax


def tile_quadkey(z: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Bing-style quadkey string per tile (diagnostics / partition names)."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    out = np.empty(len(z), dtype=object)
    for i in range(len(z)):
        digits = []
        for k in range(int(z[i]), 0, -1):
            mask = 1 << (k - 1)
            d = 0
            if x[i] & mask:
                d += 1
            if y[i] & mask:
                d += 2
            digits.append(str(d))
        out[i] = "".join(digits)
    return out


def _webmerc_v(lat_deg: np.ndarray) -> np.ndarray:
    """Normalized slippy-map y in [0,1] via the asinh(tan) form.

    Written as log(t + sqrt(t*t+1)) so a SQL oracle can reproduce it
    bit-for-bit (DuckDB has no asinh).
    """
    t = np.tan(np.radians(np.asarray(lat_deg, dtype=np.float64)))
    y = np.log(t + np.sqrt(t * t + 1.0))
    return (1.0 - y / np.pi) / 2.0


def tiles_covering_bbox(lon0, lat0, lon1, lat1, zoom: int):
    """Vector->raster burn: every z/x/y tile each bbox overlaps.

    Open-overlap semantics (a bbox touching a tile only at its edge
    does not cover it): x-range = floor(u0*n) .. ceil(u1*n)-1, same on
    the y axis in slippy-map v space. Returns (row_idx, tx, ty) with
    one output row per (bbox, tile) pair, fully vectorized — the
    per-row rectangle expansion is arithmetic on repeated indices, no
    Python loop over boxes.
    """
    lon0 = np.asarray(lon0, dtype=np.float64)
    lat0 = np.asarray(lat0, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    n = float(1 << zoom)
    tx0 = np.floor((lon0 + 180.0) / 360.0 * n)
    tx1 = np.ceil((lon1 + 180.0) / 360.0 * n) - 1.0
    ty0 = np.floor(_webmerc_v(lat1) * n)
    ty1 = np.ceil(_webmerc_v(lat0) * n) - 1.0
    tx0 = np.clip(tx0, 0, n - 1).astype(np.int64)
    tx1 = np.clip(tx1, 0, n - 1).astype(np.int64)
    ty0 = np.clip(ty0, 0, n - 1).astype(np.int64)
    ty1 = np.clip(ty1, 0, n - 1).astype(np.int64)
    nx = np.maximum(tx1 - tx0 + 1, 0)
    ny = np.maximum(ty1 - ty0 + 1, 0)
    counts = nx * ny
    total = int(counts.sum())
    ridx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    k = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ny_r = ny[ridx]
    tx = tx0[ridx] + k // np.maximum(ny_r, 1)
    ty = ty0[ridx] + k % np.maximum(ny_r, 1)
    return ridx, tx, ty
