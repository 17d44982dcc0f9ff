"""Datum-shift grids: NTv2 (.gsb) and GTX readers + hgridshift/vgridshift.

Re-derivations of the reference's grid machinery in batch form:
  - NTv2 parsing: src/grids.cpp:2047-2330 (11x16-byte headers, subgrid
    tree via PARENT, 4xfloat32 nodes ordered east->west within south->north
    rows, arc-seconds, west-positive longitudes)
  - GTX parsing: src/grids.cpp:200-300 (big-endian 40-byte header)
  - bilinear lookup: pj_hgrid_interpolate, src/grids.cpp:3315-3384
  - forward add / iterative inverse (<=10 iters, tol 1e-12):
    pj_hgrid_apply_internal, src/grids.cpp:3388-3480
  - vgridshift z +/- multiplier*value with default multiplier -1.0:
    src/transformations/vgridshift.cpp:54-105,201

Whole grids are loaded once into NumPy arrays at operator construction —
the batch analog of the reference's per-context grid cache, and exactly
the state an actor-pool stage holds per worker at scale.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation, UNITS_RADIANS

SEC_TO_RAD = np.pi / 180.0 / 3600.0
DEG_TO_RAD = np.pi / 180.0
REL_TOL = 1e-5  # REL_TOLERANCE_HGRIDSHIFT (src/grids.cpp)

GRID_SEARCH_PATH = [
    "/root/repo/data/grids",
    "/root/reference/data/tests",
    "/root/reference/data",
]


class GridUnavailable(NotImplementedError):
    pass


@dataclass
class ShiftGrid:
    """One (sub)grid. For horizontal grids `lon_shift`/`lat_shift` are
    radians east/north-positive; for vertical grids `values` are meters."""

    west: float
    south: float
    east: float
    north: float
    resX: float
    resY: float
    width: int
    height: int
    lon_shift: np.ndarray | None = None
    lat_shift: np.ndarray | None = None
    values: np.ndarray | None = None
    children: list["ShiftGrid"] = field(default_factory=list)
    is_null: bool = False

    def contains(self, lam: np.ndarray, phi: np.ndarray,
                 eps_factor: float = 0.0) -> np.ndarray:
        epsX = self.resX * eps_factor
        epsY = self.resY * eps_factor
        lam_n = np.where(lam < self.west - epsX, lam + 2 * np.pi, lam)
        lam_n = np.where(lam_n > self.east + epsX, lam_n - 2 * np.pi, lam_n)
        return ((lam_n >= self.west - epsX) & (lam_n <= self.east + epsX)
                & (phi >= self.south - epsY) & (phi <= self.north + epsY))


def _read_ntv2(path: str) -> list[ShiftGrid]:
    with open(path, "rb") as f:
        data = f.read()
    hdr = data[:11 * 16]
    # endianness detection: NUM_OREC value is 11 (grids.cpp:2200)
    must_swap = hdr[8] != 11
    endian = ">" if must_swap else "<"
    if hdr[56:63] != b"SECONDS":
        raise GridUnavailable(f"NTv2 {path}: GS_TYPE != SECONDS")
    num_subfiles = struct.unpack(endian + "i", hdr[40:44])[0]
    pos = 11 * 16
    grids: dict[bytes, ShiftGrid] = {}
    roots: list[ShiftGrid] = []
    for _ in range(num_subfiles):
        sub = data[pos:pos + 11 * 16]
        if sub[:8] != b"SUB_NAME":
            raise GridUnavailable(f"NTv2 {path}: bad subgrid header")
        name = sub[8:16]
        parent = sub[24:32]
        south, north, e_long, w_long, lat_inc, lon_inc = (
            struct.unpack(endian + "d", sub[8 + 16 * (4 + i):16 + 16 * (4 + i)])[0]
            for i in range(6))
        gs_count = struct.unpack(
            endian + "i", sub[8 + 16 * 10:12 + 16 * 10])[0]
        west = -w_long * SEC_TO_RAD
        east = -e_long * SEC_TO_RAD
        g = ShiftGrid(
            west=west, south=south * SEC_TO_RAD,
            east=east, north=north * SEC_TO_RAD,
            resX=lon_inc * SEC_TO_RAD, resY=lat_inc * SEC_TO_RAD,
            width=int(abs((east - west) / (lon_inc * SEC_TO_RAD)) + 0.5) + 1,
            height=int(abs((north - south) / lat_inc) + 0.5) + 1,
        )
        pos += 11 * 16
        raw = np.frombuffer(
            data, dtype=endian + "f4", count=gs_count * 4, offset=pos
        ).reshape(g.height, g.width, 4)
        # components: lat shift, lon shift, lat err, lon err (arc-seconds);
        # columns stored east->west -> flip to west->east; negate lon for
        # east-positive convention (grids.cpp:2147-2166)
        lat = raw[:, ::-1, 0].astype(np.float64) * SEC_TO_RAD
        lon = -raw[:, ::-1, 1].astype(np.float64) * SEC_TO_RAD
        g.lat_shift = lat
        g.lon_shift = lon
        pos += gs_count * 16
        grids[name] = g
        if parent in grids:
            grids[parent].children.append(g)
        else:
            roots.append(g)
    return roots


def _read_gtx(path: str) -> list[ShiftGrid]:
    with open(path, "rb") as f:
        data = f.read()
    yorigin, xorigin, ystep, xstep = struct.unpack(">dddd", data[:32])
    rows, cols = struct.unpack(">ii", data[32:40])
    if cols <= 0 or rows <= 0 or not (-360 <= xorigin <= 360) or \
            not (-90 <= yorigin <= 90):
        raise GridUnavailable(f"GTX {path}: invalid header")
    if xorigin >= 180.0:
        xorigin -= 360.0
    vals = np.frombuffer(data, dtype=">f4", count=rows * cols,
                         offset=40).reshape(rows, cols).astype(np.float64)
    g = ShiftGrid(
        west=xorigin * DEG_TO_RAD, south=yorigin * DEG_TO_RAD,
        east=(xorigin + xstep * (cols - 1)) * DEG_TO_RAD,
        north=(yorigin + ystep * (rows - 1)) * DEG_TO_RAD,
        resX=xstep * DEG_TO_RAD, resY=ystep * DEG_TO_RAD,
        width=cols, height=rows, values=vals)
    return [g]


_GRID_CACHE: dict[str, list[ShiftGrid]] = {}


def load_grids(names: str) -> list[ShiftGrid]:
    """Resolve a +grids= / +nadgrids= comma list. '@' marks optional."""
    out: list[ShiftGrid] = []
    any_required_missing = None
    for name in names.split(","):
        name = name.strip()
        optional = name.startswith("@")
        if optional:
            name = name[1:]
        if not name:
            continue
        if name == "null":
            out.append(ShiftGrid(-np.pi, -np.pi / 2, np.pi, np.pi / 2,
                                 np.pi, np.pi, 3, 3, is_null=True))
            continue
        if name in _GRID_CACHE:
            out.extend(_GRID_CACHE[name])
            continue
        path = None
        for d in GRID_SEARCH_PATH:
            cand = os.path.join(d, name)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            if not optional:
                any_required_missing = name
            continue
        low = name.lower()
        if low.endswith(".gsb"):
            gs = _read_ntv2(path)
        elif low.endswith(".gtx"):
            gs = _read_gtx(path)
        else:
            if not optional:
                any_required_missing = name
            continue
        _GRID_CACHE[name] = gs
        out.extend(gs)
    if not out:
        raise GridUnavailable(
            f"no grid available from '{names}'"
            + (f" (missing {any_required_missing})" if any_required_missing
               else ""))
    if any_required_missing:
        raise GridUnavailable(f"required grid missing: {any_required_missing}")
    return out


def _bilinear(grid: ShiftGrid, tlam: np.ndarray, tphi: np.ndarray,
              comp: np.ndarray) -> np.ndarray:
    """Vectorized pj_hgrid_interpolate on normalized-to-origin coords.

    comp: (h, w) component array. Returns interpolated values with NaN
    outside the grid (caller masks)."""
    gl = tlam / grid.resX
    gp = tphi / grid.resY
    il = np.floor(gl).astype(np.int64)
    ip = np.floor(gp).astype(np.int64)
    fl = gl - il
    fp = gp - ip
    # edge snapping (grids.cpp:3332-3356)
    snap_lo_l = (il == -1) & (fl > 1 - 10 * REL_TOL)
    il = np.where(snap_lo_l, 0, il)
    fl = np.where(snap_lo_l, 0.0, fl)
    snap_hi_l = (il + 1 == grid.width) & (fl < 10 * REL_TOL)
    il = np.where(snap_hi_l, il - 1, il)
    fl = np.where(snap_hi_l, 1.0, fl)
    snap_lo_p = (ip == -1) & (fp > 1 - 10 * REL_TOL)
    ip = np.where(snap_lo_p, 0, ip)
    fp = np.where(snap_lo_p, 0.0, fp)
    snap_hi_p = (ip + 1 == grid.height) & (fp < 10 * REL_TOL)
    ip = np.where(snap_hi_p, ip - 1, ip)
    fp = np.where(snap_hi_p, 1.0, fp)
    ok = (il >= 0) & (il + 1 < grid.width) & (ip >= 0) & (ip + 1 < grid.height)
    ilc = np.clip(il, 0, grid.width - 2)
    ipc = np.clip(ip, 0, grid.height - 2)
    f00 = comp[ipc, ilc]
    f10 = comp[ipc, ilc + 1]
    f01 = comp[ipc + 1, ilc]
    f11 = comp[ipc + 1, ilc + 1]
    m10 = fl * (1 - fp)
    m11 = fl * fp
    m01 = (1 - fl) * fp
    m00 = (1 - fl) * (1 - fp)
    val = m00 * f00 + m10 * f10 + m01 * f01 + m11 * f11
    return np.where(ok, val, np.nan)


def _flatten(grids: list[ShiftGrid]) -> list[ShiftGrid]:
    """Children (finer) first, then parents — finest-containing wins when
    assigning points (mirrors findGrid's subgrid descent)."""
    out: list[ShiftGrid] = []
    for g in grids:
        out.extend(_flatten(g.children))
        out.append(g)
    return out


class Hgridshift(Operation):
    name = "hgridshift"
    left = UNITS_RADIANS
    right = UNITS_RADIANS

    def setup(self, ps) -> None:
        names = ps.s("grids") or ps.s("nadgrids")
        if not names:
            raise ValueError("hgridshift: +grids= required")
        self.grids = _flatten(load_grids(names))

    def _shift_at(self, grid: ShiftGrid, lam: np.ndarray, phi: np.ndarray):
        eps = (grid.resX + grid.resY) * REL_TOL
        tl = lam - grid.west
        tl = np.where(tl + eps < 0, tl + 2 * np.pi, tl)
        tl = np.where(tl - eps > grid.east - grid.west, tl - 2 * np.pi, tl)
        tp = phi - grid.south
        dl = _bilinear(grid, tl, tp, grid.lon_shift)
        dp = _bilinear(grid, tl, tp, grid.lat_shift)
        return tl, tp, dl, dp

    def _fwd(self, lam, phi, z, t) -> Coords:
        out_l = np.full_like(lam, np.inf)
        out_p = np.full_like(phi, np.inf)
        remaining = np.ones(lam.shape, dtype=bool)
        for grid in self.grids:
            if not remaining.any():
                break
            m = remaining & grid.contains(lam, phi, REL_TOL)
            if not m.any():
                continue
            if grid.is_null:
                out_l[m] = lam[m]
                out_p[m] = phi[m]
                remaining &= ~m
                continue
            _, _, dl, dp = self._shift_at(grid, lam[m], phi[m])
            good = np.isfinite(dl) & np.isfinite(dp)
            idx = np.flatnonzero(m)[good]
            out_l[idx] = lam[idx] + dl[good]
            out_p[idx] = phi[idx] + dp[good]
            remaining[np.flatnonzero(m)[good]] = False
        return out_l, out_p, z, t

    def _inv(self, lam, phi, z, t) -> Coords:
        out_l = np.full_like(lam, np.inf)
        out_p = np.full_like(phi, np.inf)
        remaining = np.ones(lam.shape, dtype=bool)
        for grid in self.grids:
            if not remaining.any():
                break
            m = remaining & grid.contains(lam, phi, REL_TOL)
            if not m.any():
                continue
            if grid.is_null:
                out_l[m] = lam[m]
                out_p[m] = phi[m]
                remaining &= ~m
                continue
            tb_l, tb_p, dl0, dp0 = self._shift_at(grid, lam[m], phi[m])
            tl = tb_l - dl0
            tp = tb_p - dp0
            conv = np.zeros(tl.shape, dtype=bool)
            for _ in range(10):  # MAX_ITERATIONS, tol 1e-12 rad
                dl = _bilinear(grid, tl, tp, grid.lon_shift)
                dp = _bilinear(grid, tl, tp, grid.lat_shift)
                dif_l = tl + dl - tb_l
                dif_p = tp + dp - tb_p
                step_ok = np.isfinite(dif_l) & np.isfinite(dif_p)
                tl = np.where(step_ok, tl - dif_l, tl)
                tp = np.where(step_ok, tp - dif_p, tp)
                conv = step_ok & (dif_l * dif_l + dif_p * dif_p <= 1e-24)
                if conv.all():
                    break
            good = conv | (np.isfinite(tl) & np.isfinite(tp))
            idx = np.flatnonzero(m)[good]
            out_l[idx] = S.adjlon(tl[good] + grid.west)
            out_p[idx] = tp[good] + grid.south
            remaining[idx] = False
        return out_l, out_p, z, t


class Vgridshift(Operation):
    name = "vgridshift"
    left = UNITS_RADIANS
    right = UNITS_RADIANS

    def setup(self, ps) -> None:
        names = ps.s("grids") or ps.s("geoidgrids")
        if not names:
            raise ValueError("vgridshift: +grids= required")
        self.grids = _flatten(load_grids(names))
        self.multiplier = ps.f("multiplier", -1.0)

    def _nodata(self, v: np.ndarray) -> np.ndarray:
        # GTX nodata rule (grids.cpp:356-362)
        return ((v * self.multiplier > 1000) | (v * self.multiplier < -1000)
                | (v == np.float64(np.float32(-88.8888))))

    def _value(self, lam, phi) -> np.ndarray:
        """Vectorized read_vgrid_value (grids.cpp:3583-3739): clamped
        neighbor indices, nodata-aware renormalized bilinear weights."""
        out = np.full_like(lam, np.nan)
        remaining = np.ones(lam.shape, dtype=bool)
        for grid in self.grids:
            if not remaining.any():
                break
            m = remaining & grid.contains(lam, phi, 0.0)
            if not m.any():
                continue
            if grid.is_null:
                out[m] = 0.0
                remaining &= ~m
                continue
            gl = lam[m]
            gl = np.where(gl < grid.west, gl + 2 * np.pi, gl)
            gl = np.where(gl > grid.east, gl - 2 * np.pi, gl)
            gx = (gl - grid.west) / grid.resX
            gy = (phi[m] - grid.south) / grid.resY
            ix = np.clip(np.floor(gx).astype(np.int64), 0, grid.width - 1)
            iy = np.clip(np.floor(gy).astype(np.int64), 0, grid.height - 1)
            fx = gx - ix
            fy = gy - iy
            ix2 = np.minimum(ix + 1, grid.width - 1)
            iy2 = np.minimum(iy + 1, grid.height - 1)
            V = grid.values
            va = V[iy, ix]
            vb = V[iy, ix2]
            vc = V[iy2, ix]
            vd = V[iy2, ix2]
            fxy = fx * fy
            wa = 1.0 - fx - fy + fxy
            wb = fx - fxy
            wc = fy - fxy
            wd = fxy
            vals = np.stack([va, vb, vc, vd])
            ws = np.stack([wa, wb, wc, wd])
            valid = ~self._nodata(vals)
            ws = np.where(valid, ws, 0.0)
            tw = ws.sum(axis=0)
            with np.errstate(invalid="ignore", divide="ignore"):
                v = (vals * ws).sum(axis=0) / tw
            v = np.where(valid.any(axis=0), v, np.nan)
            good = np.isfinite(v)
            idx = np.flatnonzero(m)[good]
            out[idx] = v[good]
            remaining[idx] = False
        return out

    def _fwd(self, lam, phi, z, t) -> Coords:
        v = self._value(lam, phi)
        zz = z + self.multiplier * v
        bad = ~np.isfinite(v)
        return (np.where(bad, np.inf, lam), np.where(bad, np.inf, phi),
                np.where(bad, np.inf, zz), t)

    def _inv(self, lam, phi, z, t) -> Coords:
        v = self._value(lam, phi)
        zz = z - self.multiplier * v
        bad = ~np.isfinite(v)
        return (np.where(bad, np.inf, lam), np.where(bad, np.inf, phi),
                np.where(bad, np.inf, zz), t)


def register_all(register) -> None:
    register(Hgridshift)
    register(Vgridshift)
