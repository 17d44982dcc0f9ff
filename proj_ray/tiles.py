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
