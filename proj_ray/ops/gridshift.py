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

def _default_grid_path() -> list[str]:
    """Grid search path: $PROJ_RAY_DATA / $PROJ_LIB first, then the
    package-relative data/grids dir, then the reference checkout's test
    grids (test-only fallback for replaying its gie corpora)."""
    path: list[str] = []
    for env in ("PROJ_RAY_DATA", "PROJ_LIB", "PROJ_DATA"):
        v = os.environ.get(env)
        if v:
            path.extend(v.split(os.pathsep))
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path.append(os.path.join(os.path.dirname(pkg), "data", "grids"))
    for ref in ("/root/reference/data/tests", "/root/reference/data"):
        if os.path.isdir(ref):
            path.append(ref)
    return path


GRID_SEARCH_PATH = _default_grid_path()


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
    raw0: np.ndarray | None = None  # unconverted sample 0 (tif vgrid use)
    children: list["ShiftGrid"] = field(default_factory=list)
    is_null: bool = False

    @property
    def full_world(self) -> bool:
        """Grid spans all longitudes (ExtentAndRes::fullWorldLongitude,
        grids.cpp:88): the seam column wraps."""
        return self.east - self.west + self.resX >= 2 * np.pi - 1e-10

    def contains(self, lam: np.ndarray, phi: np.ndarray,
                 eps_factor: float = 0.0) -> np.ndarray:
        # single epsilon from the combined resolution on BOTH axes
        # (isPointInExtent callers pass (resX+resY)*tol, grids.cpp)
        eps = (self.resX + self.resY) * eps_factor
        in_phi = (phi >= self.south - eps) & (phi <= self.north + eps)
        if self.full_world:
            return in_phi & np.isfinite(lam)
        lam_n = np.where(lam < self.west - eps, lam + 2 * np.pi, lam)
        lam_n = np.where(lam_n > self.east + eps, lam_n - 2 * np.pi, lam_n)
        return ((lam_n >= self.west - eps) & (lam_n <= self.east + eps)
                & in_phi)


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


def _read_ntv1(path: str) -> list[ShiftGrid]:
    """NTv1 (.dat, e.g. ntv1_can.dat): 192-byte header, float64
    (lat, lon) shift pairs in arc-seconds, columns stored east->west,
    west-longitude-positive (grids.cpp:1792-1922)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 192:
        raise GridUnavailable(f"NTv1 {path}: truncated header")
    rec_count = struct.unpack(">i", data[8:12])[0]
    if rec_count != 12:
        raise GridUnavailable(f"NTv1 {path}: wrong record count")

    def d(off: int) -> float:
        return struct.unpack(">d", data[off:off + 8])[0]

    deg = np.pi / 180.0
    south = d(24) * deg
    north = d(40) * deg
    east = -d(56) * deg
    west = -d(72) * deg
    resY = d(88) * deg
    resX = d(104) * deg
    if not (west < east and south < north and resX > 1e-10 and resY > 1e-10):
        raise GridUnavailable(f"NTv1 {path}: inconsistent georeferencing")
    width = int(abs((east - west) / resX) + 0.5) + 1
    height = int(abs((north - south) / resY) + 0.5) + 1
    raw = np.frombuffer(data, dtype=">f8", count=width * height * 2,
                        offset=192).reshape(height, width, 2)
    g = ShiftGrid(west=west, south=south, east=east, north=north,
                  resX=resX, resY=resY, width=width, height=height)
    # east->west storage -> flip; negate lon for east-positive
    g.lat_shift = raw[:, ::-1, 0].astype(np.float64) * SEC_TO_RAD
    g.lon_shift = -raw[:, ::-1, 1].astype(np.float64) * SEC_TO_RAD
    return [g]


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


def _read_ct2(path: str) -> list[ShiftGrid]:
    """CTable2 (nad2bin v2): 160-byte header with doubles at offset 96
    (west, south, resX, resY in radians) and int32 width/height at 128,
    then little-endian float32 (lon, lat) pairs row-major from the south
    (grids.cpp CTable2Grid::open/valueAt).  The stored longitude value
    uses the NT west-positive convention: hgrid application negates it
    (compensateNTConvention), while raw reads (velocity grids via
    pj_hgrid_value) keep it as-is."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:9] != b"CTABLE V2":
        raise GridUnavailable(f"CT2 {path}: bad magic")
    west, south, resX, resY = struct.unpack("<dddd", data[96:128])
    width, height = struct.unpack("<ii", data[128:136])
    if width <= 0 or height <= 0:
        raise GridUnavailable(f"CT2 {path}: invalid header")
    vals = np.frombuffer(data, dtype="<f4", count=width * height * 2,
                         offset=160).reshape(height, width, 2)
    raw_lon = vals[:, :, 0].astype(np.float64)
    raw_lat = vals[:, :, 1].astype(np.float64)
    g = ShiftGrid(
        west=west, south=south,
        east=west + resX * (width - 1),
        north=south + resY * (height - 1),
        resX=resX, resY=resY, width=width, height=height,
        lon_shift=-raw_lon, lat_shift=raw_lat)
    g.raw_lon = raw_lon
    g.raw_lat = raw_lat
    return [g]


def _tiff_to_shiftgrid(g) -> ShiftGrid:
    """Convert a TiffGrid to the hgrid/vgrid ShiftGrid form
    (GTiffHGridShiftSet semantics, grids.cpp:2540-2620): sample roles by
    DESCRIPTION (default 0=lat,1=lon), UNITTYPE arc-second/degree/radian,
    positive_value west negation; single-sample grids become vertical."""
    ns = g.samples.shape[2]
    idx_lat, idx_lon = -1, -1
    for i in range(ns):
        d = g.sample_meta.get(i, {}).get("DESCRIPTION", "")
        if d == "latitude_offset":
            idx_lat = i
        elif d == "longitude_offset":
            idx_lon = i
    idx_vert = -1
    for i in range(ns):
        d = g.sample_meta.get(i, {}).get("DESCRIPTION", "")
        if d in ("geoid_undulation", "vertical_offset",
                 "ellipsoidal_height_offset", "hydroid_height"):
            idx_vert = i
    if idx_lat < 0 and idx_lon < 0 and idx_vert < 0 and ns >= 2:
        idx_lat, idx_lon = 0, 1
    out = ShiftGrid(
        west=g.west, south=g.south, east=g.east, north=g.north,
        resX=g.resX, resY=g.resY, width=g.width, height=g.height)

    def unit_factor(i, default=SEC_TO_RAD):
        u = g.sample_meta.get(i, {}).get("UNITTYPE", "")
        if u in ("", "arc-second", "arc-seconds"):
            return default
        if u == "degree":
            return DEG_TO_RAD
        if u == "radian":
            return 1.0
        raise GridUnavailable(f"unsupported UNITTYPE {u}")

    def clean(a):
        if g.nodata is not None:
            return np.where(a == g.nodata, np.nan, a)
        return a

    if idx_lat >= 0 and idx_lon >= 0:
        sign = -1.0 if g.sample_meta.get(idx_lon, {}).get(
            "positive_value", "east") == "west" else 1.0
        out.lat_shift = clean(g.samples[:, :, idx_lat]) \
            * unit_factor(idx_lat)
        out.lon_shift = sign * clean(g.samples[:, :, idx_lon]) \
            * unit_factor(idx_lon)
        out.raw0 = clean(g.samples[:, :, 0])
    else:
        idx_v = idx_vert if idx_vert >= 0 else 0
        out.values = clean(g.samples[:, :, idx_v])
        out.raw0 = out.values
    out.children = [_tiff_to_shiftgrid(c) for c in g.children]
    return out


def _read_tiff_shift(path: str) -> list[ShiftGrid]:
    from proj_ray.sources.geotiff import read_geotiff_grids

    try:
        roots = read_geotiff_grids(path)
    except Exception as exc:  # noqa: BLE001
        raise GridUnavailable(f"cannot read {path}: {exc}") from exc
    return [_tiff_to_shiftgrid(g) for g in roots]


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
            # PROJ_NETWORK=ON fallback: fetch from the CDN endpoint into
            # the user cache dir (reference: pj_open_lib -> network file
            # manager, src/filemanager.cpp + networkfilemanager.cpp)
            from proj_ray.sources import netgrids
            if netgrids.network_enabled():
                try:
                    path = netgrids.NetworkFileManager.default() \
                        .ensure_local(name)
                except Exception:  # noqa: BLE001 - endpoint missing file
                    path = None
        if path is None:
            if not optional:
                any_required_missing = name
            continue
        low = name.lower()
        if low.endswith(".gsb"):
            gs = _read_ntv2(path)
        elif low.endswith(".dat"):
            gs = _read_ntv1(path)
        elif low.endswith(".ct2"):
            gs = _read_ct2(path)
        elif low.endswith(".gtx"):
            gs = _read_gtx(path)
        elif low.endswith(".tif") or low.endswith(".tiff"):
            gs = _read_tiff_shift(path)
        else:
            # extensionless legacy names (e.g. 'conus'): sniff the
            # magic like the reference's format detection
            with open(path, "rb") as f:
                head = f.read(12)
            if head.startswith(b"CTABLE V2"):
                gs = _read_ct2(path)
            elif head[8:12] == b"\x00\x00\x00\x0c":  # NTv1 rec count
                gs = _read_ntv1(path)
            elif head.startswith(b"HEADER"):
                gs = _read_ntv1(path)
            else:
                if not optional:
                    any_required_missing = name
                continue
        _GRID_CACHE[name] = gs
        out.extend(gs)
    if not out:
        if any_required_missing is None:
            # every entry was '@'-optional and missing: the op becomes
            # a pass-through ("Only try the gridshift if at least one
            # grid is loaded, otherwise just pass the coordinate
            # through unchanged", vgridshift.cpp:68-71)
            return []
        raise GridUnavailable(
            f"no grid available from '{names}' "
            f"(missing {any_required_missing})")
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
    full = getattr(grid, "full_world", False)
    if full:
        # periodic longitude: the seam cell interpolates against
        # column 0 (grids.cpp full-world wrap), so normalize into
        # [0, width) instead of rejecting the last column
        gl = np.mod(gl, grid.width)
    il = np.floor(gl).astype(np.int64)
    ip = np.floor(gp).astype(np.int64)
    fl = gl - il
    fp = gp - ip
    # edge snapping (grids.cpp:3332-3356)
    if not full:
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
    ok = (ip >= 0) & (ip + 1 < grid.height)
    if full:
        ilc = np.clip(il, 0, grid.width - 1)
        il2 = np.where(ilc + 1 >= grid.width, 0, ilc + 1)
    else:
        ok = ok & (il >= 0) & (il + 1 < grid.width)
        ilc = np.clip(il, 0, grid.width - 2)
        il2 = ilc + 1
    ipc = np.clip(ip, 0, grid.height - 2)
    f00 = comp[ipc, ilc]
    f10 = comp[ipc, il2]
    f01 = comp[ipc + 1, ilc]
    f11 = comp[ipc + 1, il2]
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
        # time bracket (hgridshift.cpp forward_4d): with both t_epoch
        # and t_final set, the shift applies only to t < t_epoch
        # (2D/t-less coordinates always shift)
        self.t_epoch = ps.f("t_epoch", 0.0)
        tf = ps.s("t_final")
        self.t_final = 9999.0 if tf == "now" else \
            (float(tf) if tf else 0.0)

    def _time_mask(self, t: np.ndarray) -> np.ndarray | None:
        if self.t_final == 0.0 or self.t_epoch == 0.0:
            return None
        if not (self.t_final > self.t_epoch):
            return np.zeros(t.shape, dtype=bool) | ~np.isfinite(t)
        return ~np.isfinite(t) | (t < self.t_epoch)

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
        tm = self._time_mask(t)
        if tm is not None:
            rl = np.array(lam, copy=True)
            rp = np.array(phi, copy=True)
            if tm.any():
                ol, op_, _, _ = self._fwd_core(lam[tm], phi[tm],
                                               z[tm], t[tm])
                rl[tm] = ol
                rp[tm] = op_
            return rl, rp, z, t
        return self._fwd_core(lam, phi, z, t)

    def _fwd_core(self, lam, phi, z, t) -> Coords:
        if not self.grids:  # all-optional grids missing: pass through
            return lam, phi, z, t
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

    def _tb_of(self, grid: ShiftGrid, lam: np.ndarray, phi: np.ndarray):
        eps = (grid.resX + grid.resY) * REL_TOL
        tl = lam - grid.west
        tl = np.where(tl + eps < 0, tl + 2 * np.pi, tl)
        tl = np.where(tl - eps > grid.east - grid.west, tl - 2 * np.pi, tl)
        return tl, phi - grid.south

    def _inv(self, lam, phi, z, t) -> Coords:
        tm = self._time_mask(t)
        if tm is not None:
            rl = np.array(lam, copy=True)
            rp = np.array(phi, copy=True)
            if tm.any():
                ol, op_, _, _ = self._inv_core(lam[tm], phi[tm],
                                               z[tm], t[tm])
                rl[tm] = ol
                rp[tm] = op_
            return rl, rp, z, t
        return self._inv_core(lam, phi, z, t)

    def _inv_core(self, lam, phi, z, t) -> Coords:
        """Iterative inverse with cross-subgrid re-selection: a guess
        that leaves its grid mid-iteration switches to another
        containing grid and keeps iterating; no switch available
        accepts the current guess; 10 iterations without convergence is
        an error (pj_hgrid_apply_internal, grids.cpp:3388-3480)."""
        if not self.grids:  # all-optional grids missing: pass through
            return lam, phi, z, t
        n = lam.shape[0]
        grids = self.grids
        out_l = np.full_like(lam, np.inf)
        out_p = np.full_like(phi, np.inf)
        gidx = np.full(n, -1, dtype=np.int64)
        for k, g in enumerate(grids):
            m = (gidx < 0) & g.contains(lam, phi, REL_TOL)
            gidx[m] = k
        done = gidx < 0  # outside every grid: stays inf
        for k, g in enumerate(grids):
            if g.is_null:
                m = gidx == k
                out_l[m] = lam[m]
                out_p[m] = phi[m]
                done |= m
        t_l = np.zeros(n)
        t_p = np.zeros(n)
        tb_l = np.zeros(n)
        tb_p = np.zeros(n)
        # initial guess: tb - shift(tb) in each point's grid
        for k in np.unique(gidx[~done]):
            g = grids[k]
            sel = (gidx == k) & ~done
            bl, bp = self._tb_of(g, lam[sel], phi[sel])
            dl = _bilinear(g, bl, bp, g.lon_shift)
            dp = _bilinear(g, bl, bp, g.lat_shift)
            bad = ~(np.isfinite(dl) & np.isfinite(dp))
            tb_l[sel] = bl
            tb_p[sel] = bp
            t_l[sel] = bl - np.where(bad, 0.0, dl)
            t_p[sel] = bp - np.where(bad, 0.0, dp)
            idx = np.flatnonzero(sel)[bad]
            done[idx] = True  # outside: stays inf (error)
        active = ~done
        for _it in range(10):  # MAX_ITERATIONS, tol 1e-12 rad
            if not active.any():
                break
            for k in np.unique(gidx[active]):
                g = grids[k]
                sel = active & (gidx == k)
                dl = _bilinear(g, t_l[sel], t_p[sel], g.lon_shift)
                dp = _bilinear(g, t_l[sel], t_p[sel], g.lat_shift)
                left = ~(np.isfinite(dl) & np.isfinite(dp))
                idx = np.flatnonzero(sel)
                if left.any():
                    # guess escaped this grid: re-select at the guess
                    esc = idx[left]
                    lp_l = t_l[esc] + g.west
                    lp_p = t_p[esc] + g.south
                    new_k = np.full(len(esc), -1, dtype=np.int64)
                    for k2, g2 in enumerate(grids):
                        if k2 == k or g2.is_null:
                            continue
                        m2 = (new_k < 0) & g2.contains(lp_l, lp_p, REL_TOL)
                        new_k[m2] = k2
                    sw = new_k >= 0
                    # no alternative: accept the current guess
                    acc = esc[~sw]
                    out_l[acc] = S.adjlon(t_l[acc] + g.west)
                    out_p[acc] = t_p[acc] + g.south
                    active[acc] = False
                    for k2 in np.unique(new_k[sw]):
                        g2 = grids[k2]
                        pts = esc[sw][new_k[sw] == k2]
                        gidx[pts] = k2
                        t_l[pts] = lp_l[sw][new_k[sw] == k2] - g2.west
                        t_p[pts] = lp_p[sw][new_k[sw] == k2] - g2.south
                        bl, bp = self._tb_of(g2, lam[pts], phi[pts])
                        tb_l[pts] = bl
                        tb_p[pts] = bp
                ok = idx[~left]
                dif_l = t_l[ok] + dl[~left] - tb_l[ok]
                dif_p = t_p[ok] + dp[~left] - tb_p[ok]
                t_l[ok] = t_l[ok] - dif_l
                t_p[ok] = t_p[ok] - dif_p
                conv = ok[dif_l * dif_l + dif_p * dif_p <= 1e-24]
                gk = grids[k]
                out_l[conv] = S.adjlon(t_l[conv] + gk.west)
                out_p[conv] = t_p[conv] + gk.south
                active[conv] = False
        # 10 iterations without convergence: error (stays inf)
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
        self.t_epoch = ps.f("t_epoch", 0.0)
        tf = ps.s("t_final")
        self.t_final = 9999.0 if tf == "now" else \
            (float(tf) if tf else 0.0)

    def _time_mask(self, t: np.ndarray) -> np.ndarray | None:
        if self.t_final == 0.0 or self.t_epoch == 0.0:
            return None
        if not (self.t_final > self.t_epoch):
            return np.zeros(t.shape, dtype=bool) | ~np.isfinite(t)
        return ~np.isfinite(t) | (t < self.t_epoch)

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
            if grid.full_world:
                # periodic longitude: index modulo width, seam column
                # wraps to 0 (read_vgrid_value grids.cpp:3620-3660)
                gx = (gl - grid.west) / grid.resX
                gx = np.mod(np.mod(gx, grid.width) + grid.width,
                            grid.width)
            else:
                gl = np.where(gl < grid.west, gl + 2 * np.pi, gl)
                gl = np.where(gl > grid.east, gl - 2 * np.pi, gl)
                gx = (gl - grid.west) / grid.resX
            gy = (phi[m] - grid.south) / grid.resY
            ix = np.clip(np.floor(gx).astype(np.int64), 0, grid.width - 1)
            iy = np.clip(np.floor(gy).astype(np.int64), 0, grid.height - 1)
            fx = gx - ix
            fy = gy - iy
            if grid.full_world:
                ix2 = np.where(ix + 1 >= grid.width, 0, ix + 1)
            else:
                ix2 = np.minimum(ix + 1, grid.width - 1)
            iy2 = np.minimum(iy + 1, grid.height - 1)
            V = grid.values if grid.values is not None else grid.raw0
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
            valid = ~self._nodata(vals) & np.isfinite(vals)
            vals = np.where(valid, vals, 0.0)
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
        if not self.grids:  # all-optional grids missing: pass through
            return lam, phi, z, t
        tm = self._time_mask(t)
        v = self._value(lam, phi)
        zz = z + self.multiplier * v
        bad = ~np.isfinite(v)
        if tm is not None:
            zz = np.where(tm, zz, z)
            bad = bad & tm
        return (np.where(bad, np.inf, lam), np.where(bad, np.inf, phi),
                np.where(bad, np.inf, zz), t)

    def _inv(self, lam, phi, z, t) -> Coords:
        if not self.grids:  # all-optional grids missing: pass through
            return lam, phi, z, t
        tm = self._time_mask(t)
        v = self._value(lam, phi)
        zz = z - self.multiplier * v
        bad = ~np.isfinite(v)
        if tm is not None:
            zz = np.where(tm, zz, z)
            bad = bad & tm
        return (np.where(bad, np.inf, lam), np.where(bad, np.inf, phi),
                np.where(bad, np.inf, zz), t)


def register_all(register) -> None:
    register(Hgridshift)
    register(Vgridshift)
    register(Gridshift)


# ===================================================================== #
# Unified GeoTIFF gridshift (reference: src/transformations/gridshift.cpp)
# ===================================================================== #

ARCSEC_TO_RAD = np.pi / 180.0 / 3600.0


def _tiff_grid_list(names: str):
    """Load GeoTIFF grid trees for a +grids= list."""
    from proj_ray.sources.geotiff import read_geotiff_grids

    roots = []
    for name in names.split(","):
        name = name.strip()
        optional = name.startswith("@")
        if optional:
            name = name[1:]
        if not name:
            continue
        path = None
        for d in GRID_SEARCH_PATH:
            cand = os.path.join(d, name)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            if optional:
                continue
            raise ValueError(f"gridshift: grid not found: {name}")
        try:
            file_roots = read_geotiff_grids(path)
        except Exception as exc:  # noqa: BLE001
            raise ValueError(f"gridshift: cannot read {name}: {exc}") \
                from exc
        # metadata fallback: grids without TYPE inherit the first grid's
        # metadata (GTiffGenericGrid::setFirstGrid, grids.cpp:1493-1500)
        if file_roots:
            first = file_roots[0]

            def _walk(g):
                if g is not first and not g.metadata.get("TYPE") \
                        and first.metadata.get("TYPE"):
                    merged = dict(first.metadata)
                    merged.update(g.metadata)
                    g.metadata = merged
                    sm = {k: dict(v) for k, v in first.sample_meta.items()}
                    for k, v in g.sample_meta.items():
                        sm.setdefault(k, {}).update(v)
                    g.sample_meta = sm
                for c in g.children:
                    _walk(c)

            for g in file_roots:
                _walk(g)
        roots.extend(file_roots)
    if not roots:
        raise ValueError(f"gridshift: no grid loaded from {names}")
    return roots


class _TiffGridInfo:
    """Per-grid sample-index semantics (gridshift.cpp grid_interpolate
    cache block)."""

    def __init__(self, grid, gtype: str, interpolation: str, skip_z: bool):
        self.grid = grid
        ns = grid.samples.shape[2]
        idxX = idxY = idxZ = -1
        self.easting_northing = False
        geo = grid.is_geographic
        for i in range(ns):
            desc = grid.sample_meta.get(i, {}).get("DESCRIPTION", "")
            if geo and desc == "latitude_offset":
                idxY = i
            elif geo and desc == "longitude_offset":
                idxX = i
            elif not geo and desc == "easting_offset":
                self.easting_northing = True
                idxX = i
            elif not geo and desc == "northing_offset":
                self.easting_northing = True
                idxY = i
            elif desc in ("ellipsoidal_height_offset", "geoid_undulation",
                          "hydroid_height", "vertical_offset"):
                idxZ = i
        if ns >= 2 and idxX < 0 and idxY < 0 \
                and gtype == "HORIZONTAL_OFFSET":
            if not geo:
                self.easting_northing = True
                idxX, idxY = 0, 1
            else:
                idxX, idxY = 1, 0
        if gtype in ("HORIZONTAL_OFFSET", "GEOGRAPHIC_3D_OFFSET") \
                and (idxX < 0 or idxY < 0):
            raise ValueError("gridshift: grid has not expected samples")
        if gtype in ("ELLIPSOIDAL_HEIGHT_OFFSET",
                     "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL",
                     "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL",
                     "GEOGRAPHIC_3D_OFFSET") and idxZ < 0:
            raise ValueError("gridshift: grid has not expected samples")
        interp = interpolation or grid.metadata.get(
            "interpolation_method", "") or "bilinear"
        if interp not in ("bilinear", "biquadratic"):
            raise ValueError("gridshift: unsupported interpolation_method")
        self.bilinear = (interp == "bilinear" or grid.width < 3
                         or grid.height < 3)
        self.idxX = idxX
        self.idxY = idxY
        self.idxZ = -1 if skip_z else idxZ


def _interp_grid(info: _TiffGridInfo, x, y):
    """Vectorized bilinear/biquadratic sampling. x/y are coordinates in
    the grid's system (radians if geographic). Returns (sx, sy, sz) with
    NaN where outside; lat/lon offsets converted arcsec->rad."""
    g = info.grid
    gx = (x - g.west) / g.resX
    gy = (y - g.south) / g.resY
    ix = np.floor(gx).astype(np.int64)
    iy = np.floor(gy).astype(np.int64)
    fx = gx - ix
    fy = gy - iy
    # edge snap (REL_TOLERANCE_HGRIDSHIFT rule)
    sl = (ix == -1) & (fx > 1 - 10 * REL_TOL)
    ix = np.where(sl, 0, ix)
    fx = np.where(sl, 0.0, fx)
    sh = (ix + 1 == g.width) & (fx < 10 * REL_TOL)
    ix = np.where(sh, ix - 1, ix)
    fx = np.where(sh, 1.0, fx)
    sl = (iy == -1) & (fy > 1 - 10 * REL_TOL)
    iy = np.where(sl, 0, iy)
    fy = np.where(sl, 0.0, fy)
    sh = (iy + 1 == g.height) & (fy < 10 * REL_TOL)
    iy = np.where(sh, iy - 1, iy)
    fy = np.where(sh, 1.0, fy)
    ok = (ix >= 0) & (ix + 1 < g.width) & (iy >= 0) & (iy + 1 < g.height)

    def sample(si, jx, jy):
        return g.samples[np.clip(jy, 0, g.height - 1),
                         np.clip(jx, 0, g.width - 1), si]

    def nodata_mask(vals):
        if g.nodata is None:
            return np.zeros(vals.shape, dtype=bool)
        return vals == g.nodata

    outs = []
    if info.bilinear:
        w00 = (1 - fx) * (1 - fy)
        w10 = fx * (1 - fy)
        w01 = (1 - fx) * fy
        w11 = fx * fy
        for si in (info.idxX, info.idxY, info.idxZ):
            if si < 0:
                outs.append(np.zeros_like(x))
                continue
            v00 = sample(si, ix, iy)
            v10 = sample(si, ix + 1, iy)
            v01 = sample(si, ix, iy + 1)
            v11 = sample(si, ix + 1, iy + 1)
            nod = (nodata_mask(v00) | nodata_mask(v10)
                   | nodata_mask(v01) | nodata_mask(v11))
            v = w00 * v00 + w10 * v10 + w01 * v01 + w11 * v11
            outs.append(np.where(nod, np.nan, v))
    else:
        # biquadratic (NOAA qterp): shift 3x3 window per half-pixel rule
        ix2 = np.where(((fx <= 0.5) & (ix > 0)) | (ix + 2 == g.width),
                       ix - 1, ix)
        fx2 = fx + (ix - ix2)
        iy2 = np.where(((fy <= 0.5) & (iy > 0)) | (iy + 2 == g.height),
                       iy - 1, iy)
        fy2 = fy + (iy - iy2)

        def qterp(t, f0, f1, f2):
            df0 = f1 - f0
            d2f0 = (f2 - f1) - df0
            return f0 + t * df0 + 0.5 * t * (t - 1.0) * d2f0

        for si in (info.idxX, info.idxY, info.idxZ):
            if si < 0:
                outs.append(np.zeros_like(x))
                continue
            rows = []
            nod = np.zeros(x.shape, dtype=bool)
            for j in range(3):
                f0 = sample(si, ix2, iy2 + j)
                f1 = sample(si, ix2 + 1, iy2 + j)
                f2 = sample(si, ix2 + 2, iy2 + j)
                nod |= nodata_mask(f0) | nodata_mask(f1) | nodata_mask(f2)
                rows.append(qterp(fx2, f0, f1, f2))
            v = qterp(fy2, rows[0], rows[1], rows[2])
            outs.append(np.where(nod, np.nan, v))
    sx, sy, sz = outs
    if info.idxX >= 0 and info.idxY >= 0 and not info.easting_northing:
        sx = sx * ARCSEC_TO_RAD
        sy = sy * ARCSEC_TO_RAD
    sx = np.where(ok, sx, np.nan)
    sy = np.where(ok, sy, np.nan)
    sz = np.where(ok, sz, np.nan)
    return sx, sy, sz


class Gridshift(Operation):
    """Unified GeoTIFF grid shift (+proj=gridshift)."""

    name = "gridshift"
    left = UNITS_RADIANS
    right = UNITS_RADIANS

    def setup(self, ps) -> None:
        names = ps.s("grids")
        if not names:
            raise ValueError("gridshift: +grids parameter missing")
        self.interpolation = ps.s("interpolation")
        if self.interpolation not in ("", "bilinear", "biquadratic"):
            raise ValueError("gridshift: unsupported +interpolation")
        self.skip_z = ps.flag("no_z_transform")
        self.roots = _tiff_grid_list(names)
        # checkGridTypes (gridshift.cpp:124-236)
        has_horiz = has_geo3d = has_ellh = has_v2v = has_g2v = False
        for g in self.roots:
            t = g.metadata.get("TYPE", "")
            if t == "HORIZONTAL_OFFSET":
                has_horiz = True
            elif t == "GEOGRAPHIC_3D_OFFSET":
                has_geo3d = True
            elif t == "ELLIPSOIDAL_HEIGHT_OFFSET":
                has_ellh = True
            elif t == "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL":
                has_v2v = True
            elif t == "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL":
                has_g2v = True
            elif t == "":
                raise ValueError("gridshift: missing TYPE metadata")
            else:
                raise ValueError(f"gridshift: unhandled TYPE {t}")
        if (has_ellh + has_v2v + has_g2v) > 1:
            raise ValueError("gridshift: unsupported mix of grid types")
        self.is_horizontal = has_horiz or has_geo3d
        self.has_horiz = has_horiz
        if has_geo3d:
            self.main_type = "GEOGRAPHIC_3D_OFFSET"
        elif not has_horiz:
            self.main_type = ("ELLIPSOIDAL_HEIGHT_OFFSET" if has_ellh else
                              "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL"
                              if has_g2v else
                              "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL")
        else:
            self.main_type = "HORIZONTAL_OFFSET"
        self.aux_type = ""
        if has_horiz:
            if has_ellh:
                self.aux_type = "ELLIPSOIDAL_HEIGHT_OFFSET"
            elif has_g2v:
                self.aux_type = "VERTICAL_OFFSET_GEOGRAPHIC_TO_VERTICAL"
            elif has_v2v:
                self.aux_type = "VERTICAL_OFFSET_VERTICAL_TO_VERTICAL"
        # constant_offset items (single-grid only, gridshift.cpp:277-296)
        self.offX = self.offY = 0.0
        if len(self.roots) == 1:
            sm = self.roots[0].sample_meta
            self.offX = float(sm.get(0, {}).get("constant_offset", 0.0))
            self.offY = float(sm.get(1, {}).get("constant_offset", 0.0))
        elif any("constant_offset" in v for g in self.roots
                 for v in g.sample_meta.values()):
            raise ValueError(
                "gridshift: constant_offset only supported for one grid")
        self.projected = any(not g.is_geographic for g in self.roots)
        if self.projected:
            self.left = "projected"
            self.right = "projected"
        self._info_cache: dict = {}

    def _info(self, g, gtype) -> _TiffGridInfo:
        key = (id(g), gtype)
        if key not in self._info_cache:
            self._info_cache[key] = _TiffGridInfo(
                g, gtype, self.interpolation, self.skip_z)
        return self._info_cache[key]

    def _grid_at(self, gtype, x_s, y_s):
        """Scalar grid lookup mirroring gridAt order: first top grid of
        matching TYPE whose extent contains the point, descended."""
        for g in self.roots:
            t = g.metadata.get("TYPE", "")
            if t and t != gtype:
                continue
            if self._in_extent(g, x_s, y_s):
                return self._descend(g, x_s, y_s)
        return None

    @staticmethod
    def _norm_x(g, x):
        if g.is_geographic:
            eps = (g.resX + g.resY) * REL_TOL
            if x < g.west - eps:
                x += 2 * np.pi
            elif x > g.east + eps:
                x -= 2 * np.pi
        return x

    def _in_extent(self, g, x, y) -> bool:
        x = self._norm_x(g, x)
        eps = 1e-12
        return (g.west - eps <= x <= g.east + eps
                and g.south - eps <= y <= g.north + eps)

    def _descend(self, g, x, y):
        for c in g.children:
            if self._in_extent(c, x, y):
                return self._descend(c, x, y)
        return g

    def _apply(self, x, y, z, forward: bool):
        n = len(x)
        ox = np.full(n, np.inf)
        oy = np.full(n, np.inf)
        oz = np.full(n, np.inf)
        # assign each point to a main grid (few grids; scalar descent);
        # mixed GEO3D + HORIZONTAL sets fall back per point
        # (gridshift.cpp apply :752-765)
        assign: dict = {}
        found_geo3d = np.zeros(n, dtype=bool)
        geo3d_main = self.main_type == "GEOGRAPHIC_3D_OFFSET"
        for i in range(n):
            if not np.isfinite(x[i]):
                continue
            g = self._grid_at(self.main_type, float(x[i]), float(y[i]))
            gt = self.main_type
            if g is not None and geo3d_main:
                found_geo3d[i] = True
            if g is None and geo3d_main and self.has_horiz:
                gt = "HORIZONTAL_OFFSET"
                g = self._grid_at(gt, float(x[i]), float(y[i]))
            if g is not None:
                assign.setdefault(id(g), (g, gt, []))[2].append(i)
        vertical_only = self.main_type not in (
            "HORIZONTAL_OFFSET", "GEOGRAPHIC_3D_OFFSET")
        for _, (g, gtype, idxs) in assign.items():
            ii = np.asarray(idxs, dtype=np.int64)
            info = self._info(g, gtype)
            xi = np.array([self._norm_x(g, float(v)) for v in x[ii]])
            yi = y[ii]
            sx, sy, sz = _interp_grid(info, xi, yi)
            good = np.isfinite(sx) & np.isfinite(sy)
            if forward:
                rx = x[ii] + np.where(info.idxX >= 0, sx, 0.0)
                ry = yi + np.where(info.idxY >= 0, sy, 0.0)
                rz = z[ii] + np.where(info.idxZ >= 0, sz, 0.0)
            elif vertical_only:
                rx = x[ii]
                ry = yi
                rz = z[ii] - np.where(info.idxZ >= 0, sz, 0.0)
            else:
                # iterative inverse (bilinear); biquadratic single-step
                gx = xi - sx
                gy = yi - sy
                if info.bilinear:
                    conv = np.zeros(len(ii), dtype=bool)
                    for _it in range(10):
                        s2x, s2y, s2z = _interp_grid(info, gx, gy)
                        dx = gx + s2x - xi
                        dy = gy + s2y - yi
                        okm = np.isfinite(dx) & np.isfinite(dy)
                        gx = np.where(okm & ~conv, gx - dx, gx)
                        gy = np.where(okm & ~conv, gy - dy, gy)
                        conv = conv | (okm & (dx * dx + dy * dy <= 1e-24))
                        if conv.all():
                            break
                    sx2, sy2, sz2 = _interp_grid(info, gx, gy)
                    sz = np.where(np.isfinite(sz2), sz2, sz)
                    good = good & conv
                rx = np.where(g.is_geographic,
                              S.adjlon(gx), gx)
                ry = gy
                rz = z[ii] - np.where(info.idxZ >= 0, sz, 0.0)
            ox[ii[good]] = rx[good]
            oy[ii[good]] = ry[good]
            oz[ii[good]] = rz[good]
        # aux vertical pass (skipped for points served by a GEO3D grid)
        if self.aux_type:
            done = np.isfinite(ox) & ~found_geo3d
            for i in np.flatnonzero(done):
                g = self._grid_at(self.aux_type, float(ox[i]), float(oy[i]))
                if g is None:
                    ox[i] = oy[i] = oz[i] = np.inf
                    continue
                info = self._info(g, self.aux_type)
                sx, sy, sz = _interp_grid(
                    info, np.array([self._norm_x(g, float(ox[i]))]),
                    np.array([oy[i]]))
                if not np.isfinite(sz[0]):
                    ox[i] = oy[i] = oz[i] = np.inf
                    continue
                oz[i] = oz[i] + sz[0] if forward else oz[i] - sz[0]
        return ox, oy, oz

    def _fwd(self, lam, phi, z, t) -> Coords:
        if not self.roots:  # all-optional grids missing: pass through
            return lam, phi, z, t
        ox, oy, oz = self._apply(lam, phi, z, True)
        # constant_offset applied after the shift (gridshift.cpp:847-848)
        return ox + self.offX, oy + self.offY, oz, t

    def _inv(self, lam, phi, z, t) -> Coords:
        if not self.roots:  # all-optional grids missing: pass through
            return lam, phi, z, t
        ox, oy, oz = self._apply(lam - self.offX, phi - self.offY, z,
                                 False)
        return ox, oy, oz, t
