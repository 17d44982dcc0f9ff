"""Grid-driven kinematic transformations: defmodel (JSON deformation
model), deformation (velocity-grid kinematic shift), xyzgridshift
(geocentric grid shift).

References (parity targets, not copied):
  defmodel     src/transformations/defmodel.cpp + defmodel_impl.hpp
  deformation  src/transformations/deformation.cpp
  xyzgridshift src/transformations/xyzgridshift.cpp
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

from proj_ray.ops.base import (Coords, Operation, UNITS_CARTESIAN,
                               UNITS_PROJECTED, UNITS_RADIANS)
from proj_ray.ops.gridshift import GRID_SEARCH_PATH, GridUnavailable, \
    load_grids

D2R = math.pi / 180.0


def _decimal_year(dt: str) -> float:
    """ISO-8601 date-time -> decimal year
    (defmodel_impl.hpp ISO8601ToDecimalYear)."""
    import re

    m = re.match(r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})Z", dt)
    if not m:
        raise ValueError(f"invalid date-time {dt}")
    year, month, day, hour, minute, sec = (int(g) for g in m.groups())
    if year < 1582 or not (1 <= month <= 12) or not (1 <= day <= 31) \
            or hour >= 24 or minute >= 60 or sec >= 61:
        raise ValueError(f"invalid date-time {dt}")
    leap = (year % 4 == 0 and year % 100 != 0) or year % 400 == 0
    mt = [31, 29 if leap else 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]
    if day > mt[month - 1]:
        raise ValueError(f"invalid date-time {dt}")
    day_in_year = day - 1 + sum(mt[:month - 1])
    return year + (day_in_year * 86400 + hour * 3600 + minute * 60 + sec) \
        / ((366 if leap else 365) * 86400.0)


def _time_function(tf: dict):
    """Return a vectorized t(decimal-year array) -> factor callable
    (defmodel_impl.hpp Component::*TimeFunction::evaluateAt)."""
    kind = tf.get("type")
    par = tf.get("parameters", {})
    if kind == "constant":
        return lambda t: np.ones(np.shape(t))
    if kind == "velocity":
        t0 = _decimal_year(par["reference_epoch"])
        return lambda t: t - t0
    if kind == "step":
        t0 = _decimal_year(par["step_epoch"])
        return lambda t: np.where(t < t0, 0.0, 1.0)
    if kind == "reverse_step":
        t0 = _decimal_year(par["step_epoch"])
        return lambda t: np.where(t < t0, -1.0, 0.0)
    if kind == "piecewise":
        before = par["before_first"]
        after = par["after_last"]
        model = [(float(_decimal_year(e["epoch"])),
                  float(e["scale_factor"])) for e in par["model"]]

        def piecewise(t):
            t = np.asarray(t, dtype=float)
            if not model:
                return np.zeros(t.shape)
            xs = np.array([m[0] for m in model])
            ys = np.array([m[1] for m in model])
            out = np.interp(t, xs, ys)
            if before == "zero":
                out = np.where(t < xs[0], 0.0, out)
            elif before != "constant" and len(model) > 1:
                sl = (ys[1] - ys[0]) / (xs[1] - xs[0]) \
                    if xs[1] != xs[0] else 0.0
                out = np.where(t < xs[0], ys[0] + sl * (t - xs[0]), out)
            if after == "zero":
                out = np.where(t >= xs[-1], np.where(t == xs[-1], ys[-1],
                                                     0.0), out)
                # exact boundary behaves like the last linear piece
                out = np.where(t > xs[-1], 0.0, out)
            elif after != "constant" and len(model) > 1:
                sl = (ys[-1] - ys[-2]) / (xs[-1] - xs[-2]) \
                    if xs[-1] != xs[-2] else 0.0
                out = np.where(t > xs[-1], ys[-1] + sl * (t - xs[-1]), out)
            return out

        return piecewise
    if kind == "exponential":
        t0 = _decimal_year(par["reference_epoch"])
        end = par.get("end_epoch")
        t_end = _decimal_year(end) if end else None
        tau = float(par["relaxation_constant"])
        if tau <= 0.0:
            raise ValueError("invalid relaxation_constant")
        before = float(par["before_scale_factor"])
        a0 = float(par["initial_scale_factor"])
        a1 = float(par["final_scale_factor"])

        def expo(t):
            t = np.asarray(t, dtype=float)
            teff = np.minimum(t, t_end) if t_end is not None else t
            val = a0 + (a1 - a0) * (1.0 - np.exp(-(teff - t0) / tau))
            return np.where(t < t0, before, val)

        return expo
    raise ValueError(f"unsupported time function {kind}")


def _resolve_file(name: str) -> str:
    for d in GRID_SEARCH_PATH:
        cand = os.path.join(d, name)
        if os.path.exists(cand):
            return cand
    raise GridUnavailable(f"no grid available from '{name}' (missing "
                          f"{name})")


class _GenericGrids:
    """Generic multi-band grids (GeoTIFF) with per-band descriptions,
    mirroring GenericShiftGridSet."""

    def __init__(self, names: str):
        from proj_ray.sources.geotiff import read_geotiff_grids

        self.grids = []
        for name in names.split(","):
            name = name.strip()
            optional = name.startswith("@")
            if optional:
                name = name[1:]
            if not name:
                continue
            try:
                path = _resolve_file(name)
            except GridUnavailable:
                if optional:
                    continue
                raise
            self.grids.extend(read_geotiff_grids(path))
        if not self.grids:
            raise GridUnavailable(f"no grid available from '{names}'")

    @staticmethod
    def _contains(g, lam, phi):
        eps = (g.resX + g.resY) * 1e-5
        lam_n = np.where(lam + eps < g.west, lam + 2 * np.pi, lam)
        lam_n = np.where(lam_n - eps > g.east, lam_n - 2 * np.pi, lam_n)
        return ((lam_n >= g.west - eps) & (lam_n <= g.east + eps)
                & (phi >= g.south - eps) & (phi <= g.north + eps))

    def grid_for(self, lam, phi):
        """Most refined grid per point; -1 where none."""
        flat = []

        def walk(g):
            idx = len(flat)
            flat.append(g)
            for c in g.children:
                walk(c)
            return idx

        flat_list = []
        assign = np.full(np.shape(lam), -1, dtype=int)
        for g in self.grids:
            stack = [g]
            while stack:
                cur = stack.pop()
                m = self._contains(cur, lam, phi)
                assign = np.where(m, len(flat_list), assign)
                flat_list.append(cur)
                stack.extend(cur.children)
        self.flat = flat_list
        return assign

    @staticmethod
    def band_index(g, wanted: dict[str, int]) -> dict[str, int]:
        """Map descriptions to band indices with the reference defaults."""
        out = dict(wanted)
        ns = g.samples.shape[2]
        for i in range(ns):
            d = g.sample_meta.get(i, {}).get("DESCRIPTION", "")
            if d in out:
                out[d] = i
        return out

    @staticmethod
    def bilinear(g, lam, phi, band):
        """pj_bilinear_interpolation-style sample of one band at
        (lam, phi) with longitude normalization; NaN outside."""
        from proj_ray.ops.gridshift import _bilinear

        eps = (g.resX + g.resY) * 1e-5
        lam_n = np.where(lam + eps < g.west, lam + 2 * np.pi, lam)
        lam_n = np.where(lam_n - eps > g.east, lam_n - 2 * np.pi, lam_n)
        return _bilinear(g, lam_n - g.west, phi - g.south,
                         g.samples[:, :, band])


class Defmodel(Operation):
    """JSON deformation model (src/transformations/defmodel.cpp)."""

    name = "defmodel"

    def setup(self, ps) -> None:
        from proj_ray import factory
        from proj_ray.sources.geotiff import read_geotiff_grids

        model_name = ps.s("model")
        if not model_name:
            raise ValueError("defmodel: +model= should be specified")
        try:
            path = _resolve_file(model_name)
            with open(path, "rb") as f:
                model = json.load(f)
            if not isinstance(model, dict) or "components" not in model:
                raise ValueError("not a deformation model")
        except (GridUnavailable, ValueError, OSError) as exc:
            raise ValueError(f"defmodel: cannot open model: {exc}")

        self.h_unit_degree = model.get("horizontal_offset_unit") == "degree"
        self.is_addition = model.get("horizontal_offset_method",
                                     "addition") != "geocentric"
        self.is_geographic = self._crs_is_geographic(
            model.get("definition_crs", ""))
        if not self.is_geographic and self.h_unit_degree:
            raise ValueError("defmodel: projected CRS incompatible with "
                             "degree unit")
        if not self.is_geographic and not self.is_addition:
            raise ValueError("defmodel: projected CRS incompatible with "
                             "geocentric method")
        if self.is_geographic:
            self.left = UNITS_RADIANS
            self.right = UNITS_RADIANS
        else:
            self.left = UNITS_PROJECTED
            self.right = UNITS_PROJECTED

        def norm_extent(ext):
            bbox = ext["parameters"]["bbox"]
            if self.is_geographic:
                return [v * D2R for v in bbox]
            return list(bbox)

        self.extent = norm_extent(model["extent"])
        te = model["time_extent"]
        self.t_first = _decimal_year(te["first"])
        self.t_last = _decimal_year(te["last"])
        self.components = []
        for comp in model["components"]:
            disp = comp.get("displacement_type", "none")
            if disp == "none":
                continue
            interp = comp["spatial_model"].get("interpolation_method",
                                               "bilinear")
            if not self.is_geographic and interp != "bilinear":
                raise ValueError("defmodel: projected CRS incompatible "
                                 "with geocentric_bilinear")
            self.components.append({
                "displacement_type": disp,
                "extent": norm_extent(comp["extent"]),
                "filename": comp["spatial_model"]["filename"],
                "bilinear": interp != "geocentric_bilinear",
                "tfunc": _time_function(comp["time_function"]),
                "gridset": None,
            })
        ell = self.P.ell
        self.cart = factory._create_single(
            {"proj": "cart", "a": repr(ell.a), "es": repr(ell.es)})
        self._read_geotiff = read_geotiff_grids

    @staticmethod
    def _crs_is_geographic(crs: str) -> bool:
        from proj_ray.epsg import EPSG_INIT

        try:
            auth, code = crs.split(":")
            if auth.upper() == "EPSG" and int(code) in EPSG_INIT:
                return "+proj=longlat" in EPSG_INIT[int(code)] \
                    or "+proj=geocent" in EPSG_INIT[int(code)]
        except (ValueError, AttributeError):
            pass
        return True  # reference default when the CRS can't be resolved

    def _apply(self, x, y, z, t, for_inverse: bool) -> tuple:
        """Vectorized Evaluator::forward; returns (x2, y2, z2, ok)."""
        EPS = 1e-10 if self.is_geographic else 1e-5
        minx, miny, maxx, maxy = self.extent
        xw = np.array(x, dtype=float, copy=True)
        if self.is_geographic:
            for _ in range(2):
                xw = np.where(xw < minx - EPS, xw + 2 * math.pi, xw)
                xw = np.where(xw > maxx + EPS, xw - 2 * math.pi, xw)
        margin = 0.1 * D2R if self.is_geographic else 10000.0
        extra = margin if for_inverse else 0.0
        xw2, yw2, ok = self._bbox_check(xw, y, minx, miny, maxx, maxy, EPS,
                                        extra)
        ok = ok & (t >= self.t_first) & (t <= self.t_last)
        dlam = np.zeros(x.shape)
        dphi = np.zeros(x.shape)
        de = np.zeros(x.shape)
        dn = np.zeros(x.shape)
        dz = np.zeros(x.shape)
        fail = ~ok
        for comp in self.components:
            cminx, cminy, cmaxx, cmaxy = comp["extent"]
            xg, yg, cok = self._bbox_check(xw2, yw2, cminx, cminy, cmaxx,
                                           cmaxy, EPS,
                                           0.0 if not for_inverse else 0.0)
            cok = cok & ok
            if not cok.any():
                continue
            xg = np.clip(xg, cminx, cmaxx)
            yg = np.clip(yg, cminy, cmaxy)
            tfactor = comp["tfunc"](t)
            cok = cok & (tfactor != 0.0)
            if not cok.any():
                continue
            if comp["gridset"] is None:
                try:
                    comp["gridset"] = _GenericGrids(comp["filename"])
                except GridUnavailable:
                    fail |= cok
                    continue
            gs = comp["gridset"]
            assign = gs.grid_for(xg, yg)
            for gi, g in enumerate(gs.flat):
                m = cok & (assign == gi)
                if not m.any():
                    continue
                if g.width < 2 or g.height < 2:
                    fail |= m
                    continue
                ix_d = (xg - g.west) / g.resX
                iy_d = (yg - g.south) / g.resY
                inb = ((ix_d >= -EPS) & (iy_d >= -EPS)
                       & (ix_d + 1 < g.width + EPS)
                       & (iy_d + 1 < g.height + EPS))
                m = m & inb
                if not m.any():
                    continue
                ix0 = np.minimum(ix_d.astype(int), g.width - 2)
                iy0 = np.minimum(iy_d.astype(int), g.height - 2)
                ix0 = np.maximum(ix0, 0)
                iy0 = np.maximum(iy0, 0)
                fx = ix_d - ix0
                fy = iy_d - iy0
                m00 = (1 - fx) * (1 - fy)
                m10 = fx * (1 - fy)
                m01 = (1 - fx) * fy
                m11 = fx * fy
                disp = comp["displacement_type"]
                bands = gs.band_index(
                    g, {"east_offset": 0, "north_offset": 1,
                        "vertical_offset": 2})
                ns = g.samples.shape[2]
                if disp == "vertical" and ns == 1:
                    bz = 0
                else:
                    bz = bands["vertical_offset"]

                def pick(band):
                    c = g.samples[:, :, band]
                    return (c[iy0, ix0] * m00 + c[iy0 + 1, ix0] * m01
                            + c[iy0, ix0 + 1] * m10
                            + c[iy0 + 1, ix0 + 1] * m11)

                if disp in ("vertical", "3d"):
                    dz = np.where(m, dz + tfactor * pick(bz), dz)
                if disp in ("horizontal", "3d"):
                    vx = g.samples[:, :, bands["east_offset"]]
                    vy = g.samples[:, :, bands["north_offset"]]
                    if self.h_unit_degree:
                        dlam_i = pick(bands["east_offset"]) * D2R
                        dphi_i = pick(bands["north_offset"]) * D2R
                        dlam = np.where(m, dlam + tfactor * dlam_i, dlam)
                        dphi = np.where(m, dphi + tfactor * dphi_i, dphi)
                    elif comp["bilinear"]:
                        de = np.where(
                            m, de + tfactor * pick(bands["east_offset"]),
                            de)
                        dn = np.where(
                            m, dn + tfactor * pick(bands["north_offset"]),
                            dn)
                    else:
                        de_i, dn_i = self._geocentric_bilinear(
                            g, vx, vy, ix0, iy0, m00, m01, m10, m11, fx,
                            yw2)
                        de = np.where(m, de + tfactor * de_i, de)
                        dn = np.where(m, dn + tfactor * dn_i, dn)
        x_out = np.array(x, dtype=float, copy=True)
        y_out = np.array(y, dtype=float, copy=True)
        if self.h_unit_degree:
            x_out = x_out + dlam
            y_out = y_out + dphi
        elif self.is_addition and not self.is_geographic:
            x_out = x_out + de
            y_out = y_out + dn
        elif self.is_addition:
            ell = self.P.ell
            cosphi = np.cos(y)
            one_minu = ell.es * (1 - cosphi * cosphi)
            X = 1 - one_minu
            sqrtX = np.sqrt(X)
            x_out = x_out + de * sqrtX / (ell.a * cosphi)
            y_out = y_out + dn * ell.a * sqrtX * X / (ell.b * ell.b)
        else:
            sinphi = np.sin(y)
            cosphi = np.cos(y)
            sinlam = np.sin(x)
            coslam = np.cos(x)
            dnsin = dn * sinphi
            dX = -de * sinlam - dnsin * coslam
            dY = de * coslam - dnsin * sinlam
            dZ = dn * cosphi
            zz = np.zeros(x.shape)
            X, Y, Z, _ = self.cart._fwd(x, y, zz, zz)
            lam2, phi2, _, _ = self.cart._inv(X + dX, Y + dY, Z + dZ, zz)
            x_out = lam2
            y_out = phi2
        z_out = z + dz
        x_out = np.where(fail, np.inf, x_out)
        y_out = np.where(fail, np.inf, y_out)
        z_out = np.where(fail, np.inf, z_out)
        return x_out, y_out, z_out, ~fail

    @staticmethod
    def _bbox_check(x, y, minx, miny, maxx, maxy, EPS, extra):
        """defmodel_impl.hpp bboxCheck: clamp within the extra margin
        for the inverse path."""
        x2 = np.array(x, dtype=float, copy=True)
        y2 = np.array(y, dtype=float, copy=True)
        x_in = (x >= minx - EPS) & (x <= maxx + EPS)
        y_in = (y >= miny - EPS) & (y <= maxy + EPS)
        if extra > 0:
            clamp_lo_x = (~x_in) & (x > minx - extra) & (x < minx)
            clamp_hi_x = (~x_in) & (x < maxx + extra) & (x > maxx)
            x2 = np.where(clamp_lo_x, minx, np.where(clamp_hi_x, maxx, x2))
            x_in = x_in | clamp_lo_x | clamp_hi_x
            clamp_lo_y = (~y_in) & (y > miny - extra) & (y < miny)
            clamp_hi_y = (~y_in) & (y < maxy + extra) & (y > maxy)
            y2 = np.where(clamp_lo_y, miny, np.where(clamp_hi_y, maxy, y2))
            y_in = y_in | clamp_lo_y | clamp_hi_y
        return x2, y2, x_in & y_in

    def _geocentric_bilinear(self, g, vx, vy, ix0, iy0, m00, m01, m10, m11,
                             fx, phi):
        """GridEx::getBilinearGeocentric + the easting/northing
        reconstruction (defmodel_impl.hpp:96-176, 1093-1145)."""
        shx = math.sin(g.resX / 2)
        chx = math.cos(g.resX / 2)
        y0 = g.south + iy0 * g.resY
        sinphi0 = np.sin(y0)
        cosphi0 = np.cos(y0)
        sinphi1 = np.sin(y0 + g.resY)
        cosphi1 = np.cos(y0 + g.resY)

        def enu2xyz(de, dn, sinlam, coslam, sinph, cosph):
            dns = dn * sinph
            return (-de * sinlam - dns * coslam,
                    de * coslam - dns * sinlam,
                    dn * cosph)

        de00 = vx[iy0, ix0]
        dn00 = vy[iy0, ix0]
        de01 = vx[iy0 + 1, ix0]
        dn01 = vy[iy0 + 1, ix0]
        de10 = vx[iy0, ix0 + 1]
        dn10 = vy[iy0, ix0 + 1]
        de11 = vx[iy0 + 1, ix0 + 1]
        dn11 = vy[iy0 + 1, ix0 + 1]
        X00, Y00, Z00 = enu2xyz(de00, dn00, -shx, chx, sinphi0, cosphi0)
        X01, Y01, Z01 = enu2xyz(de01, dn01, -shx, chx, sinphi1, cosphi1)
        X10, Y10, Z10 = enu2xyz(de10, dn10, shx, chx, sinphi0, cosphi0)
        X11, Y11, Z11 = enu2xyz(de11, dn11, shx, chx, sinphi1, cosphi1)
        dX = m00 * X00 + m01 * X01 + m10 * X10 + m11 * X11
        dY = m00 * Y00 + m01 * Y01 + m10 * Y10 + m11 * Y11
        dZ = m00 * Z00 + m01 * Z01 + m10 * Z10 + m11 * Z11
        lam_rel = (fx - 0.5) * g.resX
        if g.resX < D2R:
            sinlam = lam_rel * (1 - (1.0 / 6) * lam_rel * lam_rel)
            coslam = 1 - 0.5 * lam_rel * lam_rel
        else:
            sinlam = np.sin(lam_rel)
            coslam = np.cos(lam_rel)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        de_i = -dX * sinlam + dY * coslam
        dn_i = (-dX * coslam - dY * sinlam) * sinphi + dZ * cosphi
        return de_i, dn_i

    def _fwd(self, x, y, z, t) -> Coords:
        miss = ~np.isfinite(t)
        x2, y2, z2, _ = self._apply(x, y, z, t, False)
        x2 = np.where(miss, np.inf, x2)
        y2 = np.where(miss, np.inf, y2)
        return x2, y2, z2, t

    def _inv(self, x, y, z, t) -> Coords:
        miss = ~np.isfinite(t)
        x_out = np.array(x, dtype=float, copy=True)
        y_out = np.array(y, dtype=float, copy=True)
        z_out = np.array(z, dtype=float, copy=True)
        fail = miss.copy()
        conv = np.zeros(x.shape, dtype=bool)
        for _ in range(10):
            x_new, y_new, z_new, ok = self._apply(x_out, y_out, z_out, t,
                                                  True)
            fail |= ~ok & ~conv
            dx = x_new - x
            dy = y_new - y
            dzv = z_new - z
            act = ~conv & ~fail
            x_out = np.where(act, x_out - dx, x_out)
            y_out = np.where(act, y_out - dy, y_out)
            z_out = np.where(act, z_out - dzv, z_out)
            conv |= act & (np.maximum(np.abs(dx), np.abs(dy)) < 1e-12) \
                & (np.abs(dzv) < 1e-3)
            if (conv | fail).all():
                break
        fail |= ~conv
        x_out = np.where(fail, np.inf, x_out)
        y_out = np.where(fail, np.inf, y_out)
        z_out = np.where(fail, np.inf, z_out)
        return x_out, y_out, z_out, t


class Deformation(Operation):
    """Kinematic grid shift on geocentric coordinates
    (src/transformations/deformation.cpp)."""

    name = "deformation"
    left = UNITS_CARTESIAN
    right = UNITS_CARTESIAN

    def setup(self, ps) -> None:
        from proj_ray import factory

        has_grids = ps.has("grids")
        has_xy = ps.has("xy_grids")
        has_z = ps.has("z_grids")
        if not has_grids and not (has_xy and has_z):
            raise ValueError("deformation: either +grids or (+xy_grids "
                             "and +z_grids) required")
        self.generic = None
        self.hgrids = None
        self.vgrids = None
        if has_grids:
            self.generic = _GenericGrids(ps.s("grids"))
        else:
            self.hgrids = load_grids(ps.s("xy_grids"))
            self.vgrids = load_grids(ps.s("z_grids"))
        if ps.has("t_obs"):
            raise ValueError("deformation: +t_obs deprecated, use +dt")
        self.dt = ps.f("dt", math.inf) if ps.has("dt") else math.inf
        self.t_epoch = ps.f("t_epoch") if ps.has("t_epoch") else math.inf
        if not math.isfinite(self.dt) and not math.isfinite(self.t_epoch):
            raise ValueError("deformation: either +dt or +t_epoch needed")
        if math.isfinite(self.dt) and math.isfinite(self.t_epoch):
            raise ValueError("deformation: +dt and +t_epoch are mutually "
                             "exclusive")
        ell = self.P.ell
        self.cart = factory._create_single(
            {"proj": "cart", "a": repr(ell.a), "es": repr(ell.es)})

    def _velocities(self, lam, phi):
        """(ve, vn, vu) m/yr at geodetic coords; NaN where no grid."""
        shape = np.shape(lam)
        ve = np.full(shape, np.nan)
        vn = np.full(shape, np.nan)
        vu = np.full(shape, np.nan)
        if self.generic is not None:
            assign = self.generic.grid_for(lam, phi)
            for gi, g in enumerate(self.generic.flat):
                m = assign == gi
                if not m.any():
                    continue
                bands = self.generic.band_index(
                    g, {"east_velocity": 0, "north_velocity": 1,
                        "up_velocity": 2})
                ve_i = self.generic.bilinear(g, lam, phi,
                                             bands["east_velocity"])
                vn_i = self.generic.bilinear(g, lam, phi,
                                             bands["north_velocity"])
                vu_i = self.generic.bilinear(g, lam, phi,
                                             bands["up_velocity"])
                ve = np.where(m, ve_i, ve)
                vn = np.where(m, vn_i, vn)
                vu = np.where(m, vu_i, vu)
        else:
            from proj_ray.ops.gridshift import _bilinear

            for g in self.hgrids:
                m = g.contains(lam, phi, 1e-5)
                if not m.any():
                    continue
                eps = (g.resX + g.resY) * 1e-5
                lam_n = np.where(lam + eps < g.west, lam + 2 * np.pi, lam)
                lam_n = np.where(lam_n - eps > g.east, lam_n - 2 * np.pi,
                                 lam_n)
                raw_lon = getattr(g, "raw_lon", None)
                raw_lat = getattr(g, "raw_lat", None)
                if raw_lon is None:
                    raw_lon = -g.lon_shift
                    raw_lat = g.lat_shift
                ve_i = _bilinear(g, lam_n - g.west, phi - g.south, raw_lon)
                vn_i = _bilinear(g, lam_n - g.west, phi - g.south, raw_lat)
                ve = np.where(m, ve_i, ve)
                vn = np.where(m, vn_i, vn)
            for g in self.vgrids:
                m = g.contains(lam, phi, 1e-5)
                if not m.any():
                    continue
                eps = (g.resX + g.resY) * 1e-5
                lam_n = np.where(lam + eps < g.west, lam + 2 * np.pi, lam)
                lam_n = np.where(lam_n - eps > g.east, lam_n - 2 * np.pi,
                                 lam_n)
                vu_i = _bilinear(g, lam_n - g.west, phi - g.south, g.values)
                vu = np.where(m, vu_i, vu)
        return ve / 1000.0, vn / 1000.0, vu / 1000.0

    def _shift(self, X, Y, Z):
        """ENU velocity at the geodetic position of (X,Y,Z), converted
        to geocentric (deformation.cpp pj_deformation_get_grid_shift)."""
        zz = np.zeros(np.shape(X))
        lam, phi, _, _ = self.cart._inv(X, Y, Z, zz)
        ve, vn, vu = self._velocities(lam, phi)
        sp = np.sin(phi)
        cp = np.cos(phi)
        sl = np.sin(lam)
        cl = np.cos(lam)
        dx = -sp * cl * vn - sl * ve + cp * cl * vu
        dy = -sp * sl * vn + cl * ve + cp * sl * vu
        dz = cp * vn + sp * vu
        return dx, dy, dz

    def _dt(self, t):
        if math.isfinite(self.dt):
            return np.full(np.shape(t), self.dt), np.zeros(np.shape(t),
                                                           dtype=bool)
        miss = ~np.isfinite(t)
        return t - self.t_epoch, miss

    def _fwd(self, x, y, z, t) -> Coords:
        dt, miss = self._dt(t)
        dx, dy, dz = self._shift(x, y, z)
        x2 = x + dt * dx
        y2 = y + dt * dy
        z2 = z + dt * dz
        bad = miss | ~np.isfinite(dx)
        x2 = np.where(bad, np.inf, x2)
        y2 = np.where(bad, np.inf, y2)
        z2 = np.where(bad, np.inf, z2)
        return x2, y2, z2, t

    def _inv(self, x, y, z, t) -> Coords:
        dt, miss = self._dt(t)
        dx, dy, dz = self._shift(x, y, z)
        bad = miss | ~np.isfinite(dx)
        z0 = dz
        ox = x - dt * dx
        oy = y - dt * dy
        oz = z + dt * dz
        active = ~bad
        for _ in range(10):
            if not active.any():
                break
            dx, dy, dz = self._shift(ox, oy, oz)
            newly_bad = active & ~np.isfinite(dx)
            bad |= newly_bad
            active &= ~newly_bad
            difx = ox + dt * dx - x
            dify = oy + dt * dy - y
            difz = oz - dt * dz - z
            ox = np.where(active, ox - difx, ox)
            oy = np.where(active, oy - dify, oy)
            oz = np.where(active, oz - difz, oz)
            active = active & (np.hypot(difx, dify) > 1e-8)
        oz = z - dt * z0
        ox = np.where(bad, np.inf, ox)
        oy = np.where(bad, np.inf, oy)
        oz = np.where(bad, np.inf, oz)
        return ox, oy, oz, t


class Xyzgridshift(Operation):
    """Geocentric grid shift (src/transformations/xyzgridshift.cpp)."""

    name = "xyzgridshift"
    left = UNITS_CARTESIAN
    right = UNITS_CARTESIAN

    def setup(self, ps) -> None:
        from proj_ray import factory

        grid_ref = ps.s("grid_ref")
        if grid_ref and grid_ref not in ("input_crs", "output_crs"):
            raise ValueError("xyzgridshift: unsupported grid_ref")
        self.grid_ref_is_input = grid_ref != "output_crs"
        if not ps.has("grids"):
            raise ValueError("xyzgridshift: +grids parameter missing")
        self.generic = _GenericGrids(ps.s("grids"))
        self.multiplier = ps.f("multiplier", 1.0)
        ell = self.P.ell
        self.cart = factory._create_single(
            {"proj": "cart", "a": repr(ell.a), "es": repr(ell.es)})

    def _grid_values(self, X, Y, Z):
        zz = np.zeros(np.shape(X))
        lam, phi, _, _ = self.cart._inv(X, Y, Z, zz)
        shape = np.shape(lam)
        dx = np.full(shape, np.nan)
        dy = np.full(shape, np.nan)
        dz = np.full(shape, np.nan)
        assign = self.generic.grid_for(lam, phi)
        for gi, g in enumerate(self.generic.flat):
            m = assign == gi
            if not m.any():
                continue
            bands = self.generic.band_index(
                g, {"x_translation": 0, "y_translation": 1,
                    "z_translation": 2})
            dx = np.where(m, self.generic.bilinear(
                g, lam, phi, bands["x_translation"]), dx)
            dy = np.where(m, self.generic.bilinear(
                g, lam, phi, bands["y_translation"]), dy)
            dz = np.where(m, self.generic.bilinear(
                g, lam, phi, bands["z_translation"]), dz)
        return dx * self.multiplier, dy * self.multiplier, \
            dz * self.multiplier

    def _direct(self, X, Y, Z, factor):
        dx, dy, dz = self._grid_values(X, Y, Z)
        return X + factor * dx, Y + factor * dy, Z + factor * dz

    def _iterative(self, X, Y, Z, factor):
        px, py, pz = X.copy(), Y.copy(), Z.copy()
        for _ in range(10):
            dx, dy, dz = self._grid_values(px, py, pz)
            dx *= factor
            dy *= factor
            dz *= factor
            err = ((px - X) - dx) ** 2 + ((py - Y) - dy) ** 2 \
                + ((pz - Z) - dz) ** 2
            px = X + dx
            py = Y + dy
            pz = Z + dz
            with np.errstate(invalid="ignore"):
                if np.all(~np.isfinite(err) | (err < 1e-10)):
                    break
        return px, py, pz

    def _fwd(self, x, y, z, t) -> Coords:
        if self.grid_ref_is_input:
            x2, y2, z2 = self._direct(x, y, z, 1.0)
        else:
            x2, y2, z2 = self._iterative(x, y, z, 1.0)
        bad = ~np.isfinite(x2)
        return (np.where(bad, np.inf, x2), np.where(bad, np.inf, y2),
                np.where(bad, np.inf, z2), t)

    def _inv(self, x, y, z, t) -> Coords:
        if self.grid_ref_is_input:
            x2, y2, z2 = self._iterative(x, y, z, -1.0)
        else:
            x2, y2, z2 = self._direct(x, y, z, -1.0)
        bad = ~np.isfinite(x2)
        return (np.where(bad, np.inf, x2), np.where(bad, np.inf, y2),
                np.where(bad, np.inf, z2), t)


def register_all(register) -> None:
    for cls in (Defmodel, Deformation, Xyzgridshift):
        register(cls)
