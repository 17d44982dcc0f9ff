"""tinshift: triangulated irregular network shift.

Re-derivation of src/transformations/tinshift.cpp +
tinshift_impl.hpp:386-600 — triangle location by barycentric test (the
reference accelerates with a quadtree; here the candidate scan is
vectorized points-x-triangles which is the batch-friendly equivalent),
barycentric interpolation of target coordinates / vertical offsets,
fallback strategies nearest_side / nearest_centroid.

This is the reference's own point-in-polygon-with-small-indexed-side
pattern — the same shape as the engine's PolygonIndex spatial join.
"""

from __future__ import annotations

import json
import os

import numpy as np

from proj_ray.ops.base import Coords, Operation, UNITS_WHATEVER

EPS = 1e-10

TIN_SEARCH_PATH = [
    "/root/repo/data",
    "/root/reference/data",
]


class Tinshift(Operation):
    name = "tinshift"
    left = UNITS_WHATEVER
    right = UNITS_WHATEVER

    def setup(self, ps) -> None:
        fname = ps.s("file")
        if not fname:
            raise ValueError("tinshift: missing +file")
        path = None
        for d in TIN_SEARCH_PATH:
            cand = os.path.join(d, fname)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            raise ValueError(f"tinshift: file not found: {fname}")
        try:
            j = json.load(open(path))
        except Exception as exc:  # noqa: BLE001
            raise ValueError(f"tinshift: invalid file {fname}") from exc
        if j.get("file_type") != "triangulation_file":
            raise ValueError("tinshift: not a triangulation file")
        comps = j.get("transformed_components", [])
        self.horizontal = "horizontal" in comps
        self.vertical = "vertical" in comps
        cols = j["vertices_columns"]
        self.V = np.asarray(j["vertices"], dtype=np.float64)
        self.T = np.asarray(j["triangles"], dtype=np.int64)[:, :3]
        self.col = {c: i for i, c in enumerate(cols)}
        fb = j.get("fallback_strategy", "none")
        if fb not in ("none", "nearest_side", "nearest_centroid"):
            raise ValueError("tinshift: invalid fallback_strategy")
        self.fallback = fb
        if self.horizontal:
            self.src_xy = self.V[:, [self.col["source_x"],
                                     self.col["source_y"]]]
            self.tgt_xy = self.V[:, [self.col["target_x"],
                                     self.col["target_y"]]]
        else:
            self.src_xy = self.V[:, [self.col["source_x"],
                                     self.col["source_y"]]]
            self.tgt_xy = self.src_xy
        if self.vertical:
            # normalized like the reference parser: offset_z column, or
            # target_z - source_z (tinshift_impl.hpp:211-224)
            if "offset_z" in self.col:
                self.dz = self.V[:, self.col["offset_z"]]
            elif "source_z" in self.col and "target_z" in self.col:
                self.dz = (self.V[:, self.col["target_z"]]
                           - self.V[:, self.col["source_z"]])
            else:
                raise ValueError(
                    "tinshift: need offset_z or source_z/target_z")
        else:
            self.dz = None

    def _locate(self, x, y, xy_verts):
        """Vectorized triangle location. Returns (tri_idx, l1, l2, l3) with
        tri_idx == -1 where no triangle contains the point."""
        n = len(x)
        tri = np.full(n, -1, dtype=np.int64)
        L1 = np.zeros(n)
        L2 = np.zeros(n)
        L3 = np.zeros(n)
        remaining = np.ones(n, dtype=bool)
        xs = xy_verts[:, 0][self.T]
        ys = xy_verts[:, 1][self.T]
        for ti in range(len(self.T)):
            if not remaining.any():
                break
            x1, x2, x3 = xs[ti]
            y1, y2, y3 = ys[ti]
            det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
            if abs(det) < EPS:
                continue
            l1 = ((y2 - y3) * (x - x3) + (x3 - x2) * (y - y3)) / det
            l2 = ((y3 - y1) * (x - x3) + (x1 - x3) * (y - y3)) / det
            l3 = 1.0 - l1 - l2
            inside = (remaining & (l1 >= -EPS) & (l1 <= 1 + EPS)
                      & (l2 >= -EPS) & (l2 <= 1 + EPS) & (l3 >= 0))
            if inside.any():
                tri[inside] = ti
                L1[inside] = l1[inside]
                L2[inside] = l2[inside]
                L3[inside] = l3[inside]
                remaining &= ~inside
        if remaining.any() and self.fallback != "none":
            idxs = np.flatnonzero(remaining)
            for pi in idxs:
                ti = self._nearest_triangle(x[pi], y[pi], xs, ys)
                if ti < 0:
                    continue
                x1, x2, x3 = xs[ti]
                y1, y2, y3 = ys[ti]
                det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
                if abs(det) < EPS:
                    continue
                l1 = ((y2 - y3) * (x[pi] - x3)
                      + (x3 - x2) * (y[pi] - y3)) / det
                l2 = ((y3 - y1) * (x[pi] - x3)
                      + (x1 - x3) * (y[pi] - y3)) / det
                tri[pi] = ti
                L1[pi] = l1
                L2[pi] = l2
                L3[pi] = 1.0 - l1 - l2
        return tri, L1, L2, L3

    def _nearest_triangle(self, px, py, xs, ys) -> int:
        best = -1
        best_d = np.inf
        for ti in range(len(self.T)):
            x1, x2, x3 = xs[ti]
            y1, y2, y3 = ys[ti]
            d12 = (x1 - x2) ** 2 + (y1 - y2) ** 2
            d23 = (x2 - x3) ** 2 + (y2 - y3) ** 2
            d13 = (x1 - x3) ** 2 + (y1 - y3) ** 2
            if d12 < EPS or d23 < EPS or d13 < EPS:
                continue
            if self.fallback == "nearest_side":
                d = min(
                    self._seg_d2(px, py, x1, y1, x2, y2, d12),
                    self._seg_d2(px, py, x2, y2, x3, y3, d23),
                    self._seg_d2(px, py, x1, y1, x3, y3, d13))
            else:
                cx = (x1 + x2 + x3) / 3.0
                cy = (y1 + y2 + y3) / 3.0
                d = (px - cx) ** 2 + (py - cy) ** 2
            if d < best_d:
                best_d = d
                best = ti
        return best

    @staticmethod
    def _seg_d2(px, py, x1, y1, x2, y2, dseg) -> float:
        t = ((px - x1) * (x2 - x1) + (py - y1) * (y2 - y1)) / dseg
        if t <= 0.0:
            return (px - x1) ** 2 + (py - y1) ** 2
        if t >= 1.0:
            return (px - x2) ** 2 + (py - y2) ** 2
        qx = x1 + t * (x2 - x1)
        qy = y1 + t * (y2 - y1)
        return (px - qx) ** 2 + (py - qy) ** 2

    def _apply(self, x, y, z, forward: bool):
        verts = self.src_xy if forward or not self.horizontal \
            else self.tgt_xy
        tri, l1, l2, l3 = self._locate(x, y, verts)
        bad = tri < 0
        tric = np.where(bad, 0, tri)
        i1 = self.T[tric, 0]
        i2 = self.T[tric, 1]
        i3 = self.T[tric, 2]
        if self.horizontal:
            out_xy = self.tgt_xy if forward else self.src_xy
            xo = (out_xy[i1, 0] * l1 + out_xy[i2, 0] * l2
                  + out_xy[i3, 0] * l3)
            yo = (out_xy[i1, 1] * l1 + out_xy[i2, 1] * l2
                  + out_xy[i3, 1] * l3)
        else:
            xo, yo = x, y
        if self.vertical and self.dz is not None:
            dz = self.dz[i1] * l1 + self.dz[i2] * l2 + self.dz[i3] * l3
            zo = z + dz if forward else z - dz
        else:
            zo = z
        xo = np.where(bad, np.inf, xo)
        yo = np.where(bad, np.inf, yo)
        return xo, yo, zo

    def _fwd(self, x, y, z, t) -> Coords:
        xo, yo, zo = self._apply(x, y, z, True)
        return xo, yo, zo, t

    def _inv(self, x, y, z, t) -> Coords:
        xo, yo, zo = self._apply(x, y, z, False)
        return xo, yo, zo, t


def register_all(register) -> None:
    register(Tinshift)
