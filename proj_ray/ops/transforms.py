"""Conversions and transformations, vectorized.

Re-derivations of:
  - cart/geocent: src/conversions/cart.cpp (closed-form Bowring-style
    inverse, :156-250)
  - helmert/molobadekas: src/transformations/helmert.cpp (3/4/7/14-param,
    exact vs small-angle rotation, position_vector vs coordinate_frame)
  - molodensky: src/transformations/molodensky.cpp
  - affine/geogoffset: src/transformations/affine.cpp
  - vertoffset: src/transformations/vertoffset.cpp
  - axisswap: src/conversions/axisswap.cpp
  - unitconvert: src/conversions/unitconvert.cpp (incl. time units)
  - geoc: src/conversions/geoc.cpp; noop: src/conversions/noop.cpp;
    set: src/conversions/set.cpp; topocentric: src/conversions/topocentric.cpp
"""

from __future__ import annotations

import math
import re

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import (
    Coords,
    Operation,
    UNITS_CARTESIAN,
    UNITS_PROJECTED,
    UNITS_RADIANS,
    UNITS_WHATEVER,
)
from proj_ray.params import UNITS_TO_METER

ARCSEC_TO_RAD = math.pi / 180.0 / 3600.0


# ------------------------------------------------------------------- cart --
class Cart(Operation):
    """Geodetic (lam,phi,h) <-> geocentric cartesian XYZ."""

    name = "cart"
    left = UNITS_RADIANS
    right = UNITS_CARTESIAN

    def _fwd(self, lam, phi, z, t) -> Coords:
        ell = self.P.ell
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        N = ell.a / np.sqrt(1 - ell.es * sinphi * sinphi) if ell.es != 0 \
            else np.full_like(sinphi, ell.a)
        X = (N + z) * cosphi * np.cos(lam)
        Y = (N + z) * cosphi * np.sin(lam)
        Z = (N * (1 - ell.es) + z) * sinphi
        return X, Y, Z, t

    def _inv(self, X, Y, Z, t) -> Coords:
        ell = self.P.ell
        x_a = X * ell.ra
        y_a = Y * ell.ra
        z_a = Z * ell.ra
        p_a = np.sqrt(x_a * x_a + y_a * y_a)
        b_div_a = 1 - ell.f
        pb = p_a * b_div_a
        norm = np.sqrt(z_a * z_a + pb * pb)
        safe = norm != 0
        inv_norm = np.where(safe, 1.0 / np.where(safe, norm, 1.0), 0.0)
        c = np.where(safe, pb * inv_norm, 1.0)
        s = np.where(safe, z_a * inv_norm, 0.0)
        y_phi = z_a + ell.e2s * b_div_a * s * s * s
        x_phi = p_a - ell.es * c * c * c
        norm_phi = np.sqrt(y_phi * y_phi + x_phi * x_phi)
        safe2 = norm_phi != 0
        inv_np = np.where(safe2, 1.0 / np.where(safe2, norm_phi, 1.0), 0.0)
        cosphi = np.where(safe2, x_phi * inv_np, 1.0)
        sinphi = np.where(safe2, y_phi * inv_np, 0.0)
        degenerate = x_phi <= 0
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = np.where(degenerate,
                           np.where(Z >= 0, S.HALFPI, -S.HALFPI),
                           np.arctan(y_phi / np.where(x_phi != 0, x_phi, 1.0)))
        cosphi = np.where(degenerate, 0.0, cosphi)
        sinphi = np.where(degenerate, np.where(Z >= 0, 1.0, -1.0), sinphi)
        lam = np.arctan2(y_a, x_a)
        near_pole = cosphi < 1e-6
        # geocentric radius (for heights close to the pole)
        cp2 = cosphi * cosphi
        sp2 = sinphi * sinphi
        ba2 = b_div_a * b_div_a
        r = ell.a * np.sqrt((cp2 + ba2 * ba2 * sp2) / (cp2 + ba2 * sp2))
        N = ell.a / np.sqrt(1 - ell.es * sinphi * sinphi) if ell.es != 0 \
            else np.full_like(sinphi, ell.a)
        with np.errstate(divide="ignore", invalid="ignore"):
            h_normal = ell.a * p_a / np.where(near_pole, 1.0, cosphi) - N
        h = np.where(near_pole, np.abs(Z) - r, h_normal)
        return lam, phi, h, t


class Geocent(Cart):
    name = "geocent"


# ---------------------------------------------------------------- helmert --
class Helmert(Operation):
    name = "helmert"
    left = UNITS_CARTESIAN
    right = UNITS_CARTESIAN

    def setup(self, ps) -> None:
        self.x0_ = ps.f("x")
        self.y0_ = ps.f("y")
        self.z0_ = ps.f("z")
        self.rx0 = ps.f("rx") * ARCSEC_TO_RAD
        self.ry0 = ps.f("ry") * ARCSEC_TO_RAD
        self.rz0 = ps.f("rz") * ARCSEC_TO_RAD
        self.exact = ps.flag("exact")
        self.fourparam = ps.has("theta")
        self.theta0 = ps.f("theta") * ARCSEC_TO_RAD
        self.s0 = 1.0 if self.fourparam else 0.0
        if ps.has("s"):
            self.s0 = ps.f("s")
        if ps.has("towgs84"):
            vals = [float(v) for v in ps.s("towgs84").split(",")]
            vals += [0.0] * (7 - len(vals))
            self.x0_, self.y0_, self.z0_ = vals[0:3]
            self.rx0 = vals[3] * ARCSEC_TO_RAD
            self.ry0 = vals[4] * ARCSEC_TO_RAD
            self.rz0 = vals[5] * ARCSEC_TO_RAD
            self.s0 = vals[6]
            self.convention = "position_vector"
        self.dx = ps.f("dx")
        self.dy = ps.f("dy")
        self.dz = ps.f("dz")
        self.drx = ps.f("drx") * ARCSEC_TO_RAD
        self.dry = ps.f("dry") * ARCSEC_TO_RAD
        self.drz = ps.f("drz") * ARCSEC_TO_RAD
        self.ds = ps.f("ds")
        self.dtheta = ps.f("dtheta") * ARCSEC_TO_RAD
        self.t_epoch = ps.f("t_epoch")
        self.refp = np.zeros(3)
        if ps.flag("transpose"):
            raise ValueError(
                "helmert: 'transpose' is no longer valid; use convention=")
        if ps.has("towgs84"):
            if ps.s("convention") == "coordinate_frame":
                raise ValueError(
                    "helmert: towgs84 requires convention=position_vector")
        else:
            self.convention = ps.s("convention")
        self.no_rotation = (self.rx0 == 0 and self.ry0 == 0 and self.rz0 == 0
                            and self.drx == 0 and self.dry == 0
                            and self.drz == 0)
        if not self.no_rotation and self.convention not in (
                "position_vector", "coordinate_frame"):
            raise ValueError("helmert: missing/invalid 'convention'")
        self.is_position_vector = self.convention == "position_vector"
        self.time_dependent = any(v != 0.0 for v in (
            self.dx, self.dy, self.dz, self.drx, self.dry, self.drz,
            self.ds, self.dtheta))
        if self.fourparam:
            self.left = UNITS_PROJECTED
            self.right = UNITS_PROJECTED
        self._static = self._params_at(self.t_epoch)

    def _params_at(self, t_obs: float):
        dt = t_obs - self.t_epoch
        T = np.array([self.x0_ + self.dx * dt, self.y0_ + self.dy * dt,
                      self.z0_ + self.dz * dt])
        f = self.rx0 + self.drx * dt
        th = self.ry0 + self.dry * dt
        p = self.rz0 + self.drz * dt
        scale = self.s0 + self.ds * dt
        theta = self.theta0 + self.dtheta * dt
        R = self._rot_matrix(f, th, p)
        return T, R, scale, theta

    def _rot_matrix(self, f: float, t: float, p: float) -> np.ndarray:
        """Coordinate-frame convention matrix; transposed for
        position_vector (helmert.cpp:161-342)."""
        if self.exact:
            cf, sf = math.cos(f), math.sin(f)
            ct, st = math.cos(t), math.sin(t)
            cp, sp = math.cos(p), math.sin(p)
            R = np.array([
                [ct * cp, cf * sp + sf * st * cp, sf * sp - cf * st * cp],
                [-ct * sp, cf * cp - sf * st * sp, sf * cp + cf * st * sp],
                [st, -sf * ct, cf * ct],
            ])
        else:
            R = np.array([
                [1.0, p, -t],
                [-p, 1.0, f],
                [t, -f, 1.0],
            ])
        if self.is_position_vector:
            R = R.T
        return R

    def _apply(self, X, Y, Z, t, forward: bool):
        tt = np.asarray(t, dtype=np.float64)
        finite_t = np.isfinite(tt)
        if self.time_dependent and finite_t.any() and \
                np.unique(tt[finite_t]).size > 0:
            # group by unique epoch; rebuild params per epoch (vectorized
            # analog of the reference's per-point rebuild cache)
            outX = np.array(X, dtype=np.float64, copy=True)
            outY = np.array(Y, dtype=np.float64, copy=True)
            outZ = np.array(Z, dtype=np.float64, copy=True)
            eff_t = np.where(finite_t, tt, self.t_epoch)
            for epoch in np.unique(eff_t):
                m = eff_t == epoch
                T, R, scale, _ = self._params_at(float(epoch))
                ox, oy, oz = self._apply_static(
                    X[m], Y[m], Z[m], T, R, scale, forward)
                outX[m], outY[m], outZ[m] = ox, oy, oz
            return outX, outY, outZ, t
        T, R, scale, _ = self._static
        ox, oy, oz = self._apply_static(X, Y, Z, T, R, scale, forward)
        return ox, oy, oz, t

    def _apply_static(self, X, Y, Z, T, R, scale, forward: bool):
        if self.no_rotation and scale == 0:
            if forward:
                return X + T[0], Y + T[1], Z + T[2]
            return X - T[0], Y - T[1], Z - T[2]
        sc = 1 + scale * 1e-6
        if forward:
            Xr = X - self.refp[0]
            Yr = Y - self.refp[1]
            Zr = Z - self.refp[2]
            ox = sc * (R[0, 0] * Xr + R[0, 1] * Yr + R[0, 2] * Zr) + T[0]
            oy = sc * (R[1, 0] * Xr + R[1, 1] * Yr + R[1, 2] * Zr) + T[1]
            oz = sc * (R[2, 0] * Xr + R[2, 1] * Yr + R[2, 2] * Zr) + T[2]
            return ox, oy, oz
        Xs = (X - T[0]) / sc
        Ys = (Y - T[1]) / sc
        Zs = (Z - T[2]) / sc
        ox = (R[0, 0] * Xs + R[1, 0] * Ys + R[2, 0] * Zs) + self.refp[0]
        oy = (R[0, 1] * Xs + R[1, 1] * Ys + R[2, 1] * Zs) + self.refp[1]
        oz = (R[0, 2] * Xs + R[1, 2] * Ys + R[2, 2] * Zs) + self.refp[2]
        return ox, oy, oz

    def _fwd(self, X, Y, Z, t) -> Coords:
        if self.fourparam:
            T, R, scale, theta = self._static
            cr = math.cos(theta) * scale
            sr = math.sin(theta) * scale
            return (cr * X + sr * Y + self.x0_,
                    -sr * X + cr * Y + self.y0_, Z, t)
        return self._apply(X, Y, Z, t, forward=True)

    def _inv(self, X, Y, Z, t) -> Coords:
        if self.fourparam:
            T, R, scale, theta = self._static
            cr = math.cos(theta) / scale
            sr = math.sin(theta) / scale
            x = X - self.x0_
            y = Y - self.y0_
            return x * cr - y * sr, x * sr + y * cr, Z, t
        return self._apply(X, Y, Z, t, forward=False)


class Molobadekas(Helmert):
    """Molodensky-Badekas: helmert about a reference point px/py/pz."""

    name = "molobadekas"

    def setup(self, ps) -> None:
        super().setup(ps)
        if self.convention not in ("position_vector", "coordinate_frame"):
            raise ValueError("molobadekas: missing 'convention'")
        self.refp = np.array([ps.f("px"), ps.f("py"), ps.f("pz")])
        # refp folded into translations (helmert.cpp:754-758)
        self.x0_ += self.refp[0]
        self.y0_ += self.refp[1]
        self.z0_ += self.refp[2]
        self._static = self._params_at(self.t_epoch)


# ------------------------------------------------------------- molodensky --
class Molodensky(Operation):
    name = "molodensky"
    left = UNITS_RADIANS
    right = UNITS_RADIANS

    def setup(self, ps) -> None:
        for k in ("dx", "dy", "dz", "da", "df"):
            if not ps.has(k):
                raise ValueError(f"molodensky: missing required +{k}")
        self.dx = ps.f("dx")
        self.dy = ps.f("dy")
        self.dz = ps.f("dz")
        self.da = ps.f("da")
        self.df = ps.f("df")
        self.abridged = ps.flag("abridged")

    def _rm(self, sphi):
        ell = self.P.ell
        if ell.es == 0:
            return np.full_like(sphi, ell.a)
        return (ell.a * (1 - ell.es)) / (1 - ell.es * sphi * sphi) ** 1.5

    def _rn(self, sphi):
        ell = self.P.ell
        if ell.es == 0:
            return np.full_like(sphi, ell.a)
        return ell.a / np.sqrt(1 - ell.es * sphi * sphi)

    def _deltas(self, lam, phi, z):
        ell = self.P.ell
        slam, clam = np.sin(lam), np.cos(lam)
        sphi, cphi = np.sin(phi), np.cos(phi)
        if self.abridged:
            adffda = ell.a * self.df + ell.f * self.da
            dphi = (-self.dx * sphi * clam - self.dy * sphi * slam
                    + self.dz * cphi + adffda * np.sin(2 * phi))
            dphi = dphi / self._rm(sphi)
            dlam_den = self._rn(sphi) * cphi
            with np.errstate(divide="ignore", invalid="ignore"):
                dlam = (-self.dx * slam + self.dy * clam) / dlam_den
            dlam = np.where(dlam_den == 0, np.inf, dlam)
            dh = (self.dx * cphi * clam + self.dy * cphi * slam
                  + self.dz * sphi - self.da + adffda * sphi * sphi)
        else:
            rho = self._rm(sphi)
            nu = self._rn(sphi)
            f = ell.f
            dphi = (-self.dx * sphi * clam - self.dy * sphi * slam
                    + self.dz * cphi
                    + (nu * ell.es * sphi * cphi * self.da) / ell.a
                    + sphi * cphi * (rho / (1 - f) + nu * (1 - f)) * self.df)
            den = rho + z
            with np.errstate(divide="ignore", invalid="ignore"):
                dphi = np.where(den == 0, np.inf, dphi / den)
                dlam_den = (nu + z) * cphi
                dlam = np.where(dlam_den == 0, np.inf,
                                (-self.dx * slam + self.dy * clam) / dlam_den)
            dh = (self.dx * cphi * clam + self.dy * cphi * slam
                  + self.dz * sphi - (ell.a / nu) * self.da
                  + nu * (1 - f) * sphi * sphi * self.df)
        return dlam, dphi, dh

    def _fwd(self, lam, phi, z, t) -> Coords:
        dlam, dphi, dh = self._deltas(lam, phi, z)
        return lam + dlam, phi + dphi, z + dh, t

    def _inv(self, lam, phi, z, t) -> Coords:
        dlam, dphi, dh = self._deltas(lam, phi, z)
        return lam - dlam, phi - dphi, z - dh, t


# ----------------------------------------------------------------- affine --
class Affine(Operation):
    name = "affine"
    left = UNITS_WHATEVER
    right = UNITS_WHATEVER

    def setup(self, ps) -> None:
        self.xoff = ps.f("xoff")
        self.yoff = ps.f("yoff")
        self.zoff = ps.f("zoff")
        self.toff = ps.f("toff")
        self.M = np.array([
            [ps.f("s11", 1.0), ps.f("s12"), ps.f("s13")],
            [ps.f("s21"), ps.f("s22", 1.0), ps.f("s23")],
            [ps.f("s31"), ps.f("s32"), ps.f("s33", 1.0)],
        ])
        self.tscale = ps.f("tscale", 1.0)
        if self.tscale == 0.0:
            raise ValueError("affine: tscale must be non-zero")
        det = np.linalg.det(self.M)
        self.Minv = np.linalg.inv(self.M) if det != 0 else None

    def _fwd(self, x, y, z, t) -> Coords:
        M = self.M
        return (self.xoff + M[0, 0] * x + M[0, 1] * y + M[0, 2] * z,
                self.yoff + M[1, 0] * x + M[1, 1] * y + M[1, 2] * z,
                self.zoff + M[2, 0] * x + M[2, 1] * y + M[2, 2] * z,
                self.toff + t * self.tscale)

    def _inv(self, x, y, z, t) -> Coords:
        if self.Minv is None:
            raise NotImplementedError("affine matrix is singular")
        M = self.Minv
        x = x - self.xoff
        y = y - self.yoff
        z = z - self.zoff
        return (M[0, 0] * x + M[0, 1] * y + M[0, 2] * z,
                M[1, 0] * x + M[1, 1] * y + M[1, 2] * z,
                M[2, 0] * x + M[2, 1] * y + M[2, 2] * z,
                (t - self.toff) / self.tscale)


class Geogoffset(Operation):
    name = "geogoffset"
    left = UNITS_RADIANS
    right = UNITS_RADIANS

    def setup(self, ps) -> None:
        self.xoff = ps.f("dlon") * ARCSEC_TO_RAD
        self.yoff = ps.f("dlat") * ARCSEC_TO_RAD
        self.zoff = ps.f("dh")

    def _fwd(self, lam, phi, z, t) -> Coords:
        return lam + self.xoff, phi + self.yoff, z + self.zoff, t

    def _inv(self, lam, phi, z, t) -> Coords:
        return lam - self.xoff, phi - self.yoff, z - self.zoff, t


# -------------------------------------------------------------- vertoffset --
class Vertoffset(Operation):
    """EPSG 1046 Vertical Offset and Slope."""

    name = "vertoffset"
    left = UNITS_RADIANS
    right = UNITS_RADIANS

    def setup(self, ps) -> None:
        P = self.P
        self.slope_lon = ps.f("slope_lon") * ARCSEC_TO_RAD
        self.slope_lat = ps.f("slope_lat") * ARCSEC_TO_RAD
        self.zoff = ps.f("dh")
        sinlat0 = math.sin(P.phi0)
        om = 1 - P.es * sinlat0 * sinlat0
        self.rho0 = P.a * (1 - P.es) / (om * math.sqrt(om))
        self.nu0 = P.a / math.sqrt(om)

    def _offset(self, lam, phi):
        return (self.zoff + self.slope_lat * self.rho0 * (phi - self.P.phi0)
                + self.slope_lon * self.nu0 * lam * np.cos(phi))

    def _fwd(self, lam, phi, z, t) -> Coords:
        # lam0 is subtracted in prepare; this op must operate on the
        # unshifted longitude and return it (vertoffset.cpp:54-73)
        return lam + self.P.lam0, phi, z + self._offset(lam, phi), t

    def _inv(self, lam, phi, z, t) -> Coords:
        lam = lam - self.P.lam0
        return lam, phi, z - self._offset(lam, phi), t


# --------------------------------------------------------------- axisswap --
class Axisswap(Operation):
    name = "axisswap"
    left = UNITS_WHATEVER
    right = UNITS_WHATEVER
    skip_fwd_finalize = True
    skip_inv_prepare = True

    def setup(self, ps) -> None:
        if ps.has("order") == ps.has("axis"):
            raise ValueError(
                "axisswap: must provide EITHER 'order' OR 'axis'")
        order = ps.s("order") or ps.s("axis")
        if ps.has("axis"):
            # 'axis' style: enu / neu / swu ... map to order+sign
            axis_map = {"e": (0, 1), "w": (0, -1), "n": (1, 1),
                        "s": (1, -1), "u": (2, 1), "d": (2, -1)}
            ax = [axis_map[c] for c in order]
            self.axis = [a for a, _ in ax] + list(range(len(ax), 4))
            self.sign = [s for _, s in ax] + [1] * (4 - len(ax))
            self.ndim = 4
            return
        parts = order.split(",")
        if not (2 <= len(parts) <= 4):
            raise ValueError("axisswap: order needs 2-4 axes")
        self.axis = []
        self.sign = []
        for p in parts:
            if not re.fullmatch(r"-?[1-4]", p):
                raise ValueError(f"axisswap: unknown axis '{p}'")
            sign = -1 if p.startswith("-") else 1
            self.axis.append(abs(int(p)) - 1)
            self.sign.append(sign)
        if sorted(self.axis) != list(range(len(parts))):
            raise ValueError("axisswap: axes must be a permutation of 1..n")
        for i in range(len(parts), 4):
            self.axis.append(i)
            self.sign.append(1)
        self.ndim = len(parts)

    def _fwd(self, x, y, z, t) -> Coords:
        vin = [x, y, z, t]
        out = [vin[self.axis[i]] * self.sign[i] for i in range(4)]
        if self.ndim == 2:
            out[2], out[3] = z, t
        return tuple(out)  # type: ignore[return-value]

    def _inv(self, x, y, z, t) -> Coords:
        vin = [x, y, z, t]
        out: list = [None, None, None, None]
        for i in range(4):
            out[self.axis[i]] = vin[i] * self.sign[i]
        if self.ndim == 2:
            out[2], out[3] = z, t
        return tuple(out)  # type: ignore[return-value]


# ------------------------------------------------------------ unitconvert --
_ANGULAR_UNITS = {"rad": 1.0, "deg": math.pi / 180.0,
                  "grad": math.pi / 200.0}


def _decimalyear_to_mjd(y: float) -> float:
    if not (-10000 <= y <= 10000):
        return 0.0
    year = math.floor(y)
    frac = y - year
    mjd = (year - 1859) * 365 + 14 + 31
    mjd += frac * (366 if _is_leap(year) else 365)
    yy = year - 1
    while yy > 1858:
        if _is_leap(yy):
            mjd += 1
        yy -= 1
    return float(mjd)


def _is_leap(year: float) -> bool:
    y = int(year)
    return (y % 4 == 0 and y % 100 != 0) or y % 400 == 0


def _days_in_year(y: int) -> int:
    return 366 if _is_leap(y) else 365


def _mjd_to_decimalyear(mjd: float) -> float:
    mjd_iter = 14 + 31
    year = 1859
    while mjd >= mjd_iter:
        mjd_iter += _days_in_year(year)
        year += 1
    year -= 1
    mjd_iter -= _days_in_year(year)
    return year + (mjd - mjd_iter) / _days_in_year(year)


_MONTHS = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _days_in_month(y: int, m: int) -> int:
    m = min(max(m, 1), 12)
    d = _MONTHS[m - 1]
    if _is_leap(y) and m == 2:
        d += 1
    return d


def _yyyymmdd_to_mjd(v: float) -> float:
    year = int(math.floor(v / 10000))
    month = int(math.floor((v - year * 10000) / 100))
    day = int(math.floor(v - year * 10000 - month * 100))
    month = min(max(month, 1), 12)
    day = min(day, _days_in_month(year, month))
    mjd = sum(_days_in_month(year, m) for m in range(1, month)) + day
    for yy in range(year - 1, 1858, -1):
        mjd += _days_in_year(yy)
    return float(mjd + 13 + 31)


def _mjd_to_yyyymmdd(mjd: float) -> float:
    date_iter = 14 + 31
    year = 1859
    date = int(round(mjd))
    while date >= date_iter:
        date_iter += _days_in_year(year)
        year += 1
    year -= 1
    date_iter -= _days_in_year(year)
    month = 1
    while date_iter + _days_in_month(year, month) <= date:
        date_iter += _days_in_month(year, month)
        month += 1
    day = date - date_iter + 1
    return year * 10000.0 + month * 100.0 + day


_TIME_UNITS = {
    "mjd": (lambda v: v, lambda v: v),
    "decimalyear": (np.vectorize(_decimalyear_to_mjd, otypes=[np.float64]),
                    np.vectorize(_mjd_to_decimalyear, otypes=[np.float64])),
    "gps_week": (lambda v: 44244.0 + v * 7.0,
                 lambda v: (v - 44244.0) / 7.0),
    "yyyymmdd": (np.vectorize(_yyyymmdd_to_mjd, otypes=[np.float64]),
                 np.vectorize(_mjd_to_yyyymmdd, otypes=[np.float64])),
}


def _unit_factor(name: str) -> tuple[float, str | None]:
    """Return (factor, kind): kind 'angular' | 'linear' | None (numeric).

    Mirrors get_unit_conversion_factor semantics: a zero or infinite
    numeric factor is an error (unitconvert.cpp setup)."""
    if name in _ANGULAR_UNITS:
        return _ANGULAR_UNITS[name], "angular"
    if name in UNITS_TO_METER:
        return UNITS_TO_METER[name], "linear"
    f = float(name)
    if f == 0.0 or not math.isfinite(f) or 1.0 / f == 0.0:
        raise ValueError(f"unitconvert: invalid unit factor {name}")
    return f, None


class Unitconvert(Operation):
    name = "unitconvert"
    left = UNITS_WHATEVER
    right = UNITS_WHATEVER
    skip_fwd_prepare = True
    skip_inv_prepare = True

    def setup(self, ps) -> None:
        xy_in, xy_in_kind = _unit_factor(ps.s("xy_in", "m"))
        xy_out, xy_out_kind = _unit_factor(ps.s("xy_out", "m"))
        if xy_in_kind and xy_out_kind and xy_in_kind != xy_out_kind:
            raise ValueError("unitconvert: mixing angular and linear xy")
        # angular units pin the io-unit class (unitconvert.cpp setup)
        if ps.has("xy_in") and xy_in_kind == "angular":
            self.left = UNITS_RADIANS if ps.s("xy_in") == "rad" \
                else "degrees"
        if ps.has("xy_out") and xy_out_kind == "angular":
            self.right = UNITS_RADIANS if ps.s("xy_out") == "rad" \
                else "degrees"
        self.xy_factor = xy_in / xy_out
        z_in, z_in_kind = _unit_factor(ps.s("z_in", "m"))
        z_out, z_out_kind = _unit_factor(ps.s("z_out", "m"))
        if z_in_kind and z_out_kind and z_in_kind != z_out_kind:
            raise ValueError("unitconvert: mixing angular and linear z")
        self.z_factor = z_in / z_out
        self.t_in = ps.s("t_in")
        self.t_out = ps.s("t_out")
        for tname in (self.t_in, self.t_out):
            if tname and tname not in _TIME_UNITS:
                raise ValueError(f"unitconvert: unknown time unit {tname}")

    def _time(self, t, forward: bool):
        t_in, t_out = (self.t_in, self.t_out) if forward else (
            self.t_out, self.t_in)
        if not t_in or not t_out:
            return t
        mjd = _TIME_UNITS[t_in][0](t)
        return np.asarray(_TIME_UNITS[t_out][1](mjd), dtype=np.float64)

    def _fwd(self, x, y, z, t) -> Coords:
        return (x * self.xy_factor, y * self.xy_factor,
                z * self.z_factor, self._time(t, True))

    def _inv(self, x, y, z, t) -> Coords:
        return (x / self.xy_factor, y / self.xy_factor,
                z / self.z_factor, self._time(t, False))


# ------------------------------------------------------------------- misc --
class Noop(Operation):
    name = "noop"
    left = UNITS_WHATEVER
    right = UNITS_WHATEVER

    def _fwd(self, x, y, z, t) -> Coords:
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        return x, y, z, t


class SetCoord(Operation):
    """Force coordinate components to fixed values (+v_1..+v_4)."""

    name = "set"
    left = UNITS_WHATEVER
    right = UNITS_WHATEVER

    def setup(self, ps) -> None:
        self.vals = [ps.f(f"v_{i}") if ps.has(f"v_{i}") else None
                     for i in (1, 2, 3, 4)]

    def _apply(self, x, y, z, t) -> Coords:
        out = []
        for arr, v in zip((x, y, z, t), self.vals):
            out.append(np.full_like(arr, v) if v is not None else arr)
        return tuple(out)  # type: ignore[return-value]

    def _fwd(self, x, y, z, t) -> Coords:
        return self._apply(x, y, z, t)

    def _inv(self, x, y, z, t) -> Coords:
        return self._apply(x, y, z, t)


class Geoc(Operation):
    """Geographic <-> geocentric latitude."""

    name = "geoc"
    left = UNITS_RADIANS
    right = UNITS_RADIANS

    def _fwd(self, lam, phi, z, t) -> Coords:
        # geographic -> geocentric latitude
        with np.errstate(invalid="ignore"):
            out = np.arctan(self.P.one_es * np.tan(phi))
        out = np.where(np.abs(phi) >= S.HALFPI, phi, out)
        return lam, out, z, t

    def _inv(self, lam, phi, z, t) -> Coords:
        with np.errstate(invalid="ignore"):
            out = np.arctan(self.P.rone_es * np.tan(phi))
        out = np.where(np.abs(phi) >= S.HALFPI, phi, out)
        return lam, out, z, t


class Topocentric(Operation):
    """Geocentric XYZ <-> topocentric ENU about X_0/Y_0/Z_0 (EPSG 9836,
    src/conversions/topocentric.cpp)."""

    name = "topocentric"
    left = UNITS_CARTESIAN
    right = UNITS_CARTESIAN

    def setup(self, ps) -> None:
        P = self.P
        has_xyz = [ps.has(k) for k in ("X_0", "Y_0", "Z_0")]
        has_ll = [ps.has(k) for k in ("lon_0", "lat_0")]
        if any(has_xyz) and any(has_ll):
            raise ValueError(
                "topocentric: X_0/Y_0/Z_0 and lon_0/lat_0 are exclusive")
        if any(has_xyz) and not all(has_xyz):
            raise ValueError("topocentric: need all of X_0, Y_0, Z_0")
        if not any(has_xyz) and not all(has_ll):
            raise ValueError(
                "topocentric: need X_0/Y_0/Z_0 or lat_0 and lon_0")
        if ps.has("X_0") or ps.has("Y_0") or ps.has("Z_0"):
            self.X0 = ps.f("X_0")
            self.Y0 = ps.f("Y_0")
            self.Z0 = ps.f("Z_0")
            # derive lam0/phi0 of the origin via cart inverse
            cart = Cart(P, ps)
            lam, phi, h, _ = cart._inv(
                np.array([self.X0]), np.array([self.Y0]),
                np.array([self.Z0]), np.array([0.0]))
            lam0, phi0 = float(lam[0]), float(phi[0])
        else:
            lam0 = ps.r("lon_0")
            phi0 = ps.r("lat_0")
            h0 = ps.f("h_0")
            cart = Cart(P, ps)
            X, Y, Z, _ = cart._fwd(np.array([lam0]), np.array([phi0]),
                                   np.array([h0]), np.array([0.0]))
            self.X0, self.Y0, self.Z0 = float(X[0]), float(Y[0]), float(Z[0])
        sl, cl = math.sin(lam0), math.cos(lam0)
        sp, cp = math.sin(phi0), math.cos(phi0)
        # rows: E, N, U in terms of dX,dY,dZ
        self.R = np.array([
            [-sl, cl, 0.0],
            [-sp * cl, -sp * sl, cp],
            [cp * cl, cp * sl, sp],
        ])

    def _fwd(self, X, Y, Z, t) -> Coords:
        dX = X - self.X0
        dY = Y - self.Y0
        dZ = Z - self.Z0
        R = self.R
        E = R[0, 0] * dX + R[0, 1] * dY
        N = R[1, 0] * dX + R[1, 1] * dY + R[1, 2] * dZ
        U = R[2, 0] * dX + R[2, 1] * dY + R[2, 2] * dZ
        return E, N, U, t

    def _inv(self, E, N, U, t) -> Coords:
        R = self.R
        X = self.X0 + R[0, 0] * E + R[1, 0] * N + R[2, 0] * U
        Y = self.Y0 + R[0, 1] * E + R[1, 1] * N + R[2, 1] * U
        Z = self.Z0 + R[1, 2] * N + R[2, 2] * U
        return X, Y, Z, t
