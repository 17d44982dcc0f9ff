"""Core projections, vectorized.

Each class re-derives one reference projection's math in batch NumPy form:
  - merc/webmerc: src/projections/merc.cpp
  - tmerc (Evenden/Snyder approx + spherical), etmerc (Poder/Engsager
    exact), utm: src/projections/tmerc.cpp
  - lcc: src/projections/lcc.cpp
  - longlat & aliases: src/projections/latlong.cpp
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import (
    Coords,
    Operation,
    UNITS_RADIANS,
    UNITS_CLASSIC,
)

EPS10 = 1e-10


# ---------------------------------------------------------------- longlat --
class LongLat(Operation):
    """Angular passthrough (identity 'projection')."""

    name = "longlat"
    left = UNITS_RADIANS
    right = UNITS_RADIANS

    def setup(self, ps) -> None:
        # reference zeroes offsets for latlong (src/projections/latlong.cpp)
        self.P.x0 = 0.0
        self.P.y0 = 0.0

    def _fwd(self, x, y, z, t) -> Coords:
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        return x, y, z, t


# ------------------------------------------------------------------- merc --
class Merc(Operation):
    name = "merc"

    def setup(self, ps) -> None:
        P = self.P
        if ps.has("lat_ts"):
            phits = abs(ps.r("lat_ts"))
            if phits >= S.HALFPI:
                raise ValueError("|lat_ts| should be <= 90d")
            if P.es != 0.0:
                P.k0 = float(S.msfn(math.sin(phits), math.cos(phits), P.es))
            else:
                P.k0 = math.cos(phits)

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        k0 = P.k0
        x = k0 * lam
        if P.es != 0.0:
            sphi = np.sin(phi)
            cphi = np.cos(phi)
            y = k0 * (np.arcsinh(sphi / cphi) - P.e * np.arctanh(P.e * sphi))
        else:
            y = k0 * np.arcsinh(np.tan(phi))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        k0 = P.k0
        if P.es != 0.0:
            phi = np.arctan(S.sinhpsi2tanphi(np.sinh(y / k0), P.e))
        else:
            phi = np.arctan(np.sinh(y / k0))
        lam = x / k0
        return lam, phi, z, t


class WebMerc(Merc):
    """EPSG:3857: spherical Mercator formulas on the WGS84 semimajor axis
    with k0 forced to 1 (merc.cpp:76-84)."""

    name = "webmerc"

    def setup(self, ps) -> None:
        self.P.k0 = 1.0

    def _fwd(self, lam, phi, z, t) -> Coords:
        x = lam
        y = np.arcsinh(np.tan(phi))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        return x, np.arctan(np.sinh(y)), z, t


# ------------------------------------------------------------------ tmerc --
_FC = (1.0, 0.5, 1.0 / 6, 1.0 / 12, 0.05, 1.0 / 30, 1.0 / 42, 1.0 / 56)
ETMERC_ORDER = 6


def _etmerc_coeffs(n: float, k0: float, phi0: float):
    """Poder/Engsager 6th-order coefficient sets in third flattening n
    (tmerc.cpp:487-596)."""
    cgb = np.empty(6)
    cbg = np.empty(6)
    utg = np.empty(6)
    gtu = np.empty(6)
    np_ = n
    cgb[0] = n * (2 + n * (-2 / 3.0 + n * (-2 + n * (116 / 45.0 + n * (
        26 / 45.0 + n * (-2854 / 675.0))))))
    cbg[0] = n * (-2 + n * (2 / 3.0 + n * (4 / 3.0 + n * (-82 / 45.0 + n * (
        32 / 45.0 + n * (4642 / 4725.0))))))
    np_ *= n
    cgb[1] = np_ * (7 / 3.0 + n * (-8 / 5.0 + n * (-227 / 45.0 + n * (
        2704 / 315.0 + n * (2323 / 945.0)))))
    cbg[1] = np_ * (5 / 3.0 + n * (-16 / 15.0 + n * (-13 / 9.0 + n * (
        904 / 315.0 + n * (-1522 / 945.0)))))
    np_ *= n
    cgb[2] = np_ * (56 / 15.0 + n * (-136 / 35.0 + n * (-1262 / 105.0 + n * (
        73814 / 2835.0))))
    cbg[2] = np_ * (-26 / 15.0 + n * (34 / 21.0 + n * (8 / 5.0 + n * (
        -12686 / 2835.0))))
    np_ *= n
    cgb[3] = np_ * (4279 / 630.0 + n * (-332 / 35.0 + n * (-399572 / 14175.0)))
    cbg[3] = np_ * (1237 / 630.0 + n * (-12 / 5.0 + n * (-24832 / 14175.0)))
    np_ *= n
    cgb[4] = np_ * (4174 / 315.0 + n * (-144838 / 6237.0))
    cbg[4] = np_ * (-734 / 315.0 + n * (109598 / 31185.0))
    np_ *= n
    cgb[5] = np_ * (601676 / 22275.0)
    cbg[5] = np_ * (444337 / 155925.0)

    n2 = n * n
    Qn = k0 / (1 + n) * (1 + n2 * (1 / 4.0 + n2 * (1 / 64.0 + n2 / 256.0)))
    np_ = n
    utg[0] = n * (-0.5 + n * (2 / 3.0 + n * (-37 / 96.0 + n * (1 / 360.0 + n * (
        81 / 512.0 + n * (-96199 / 604800.0))))))
    gtu[0] = n * (0.5 + n * (-2 / 3.0 + n * (5 / 16.0 + n * (41 / 180.0 + n * (
        -127 / 288.0 + n * (7891 / 37800.0))))))
    np_ = n * n
    utg[1] = np_ * (-1 / 48.0 + n * (-1 / 15.0 + n * (437 / 1440.0 + n * (
        -46 / 105.0 + n * (1118711 / 3870720.0)))))
    gtu[1] = np_ * (13 / 48.0 + n * (-3 / 5.0 + n * (557 / 1440.0 + n * (
        281 / 630.0 + n * (-1983433 / 1935360.0)))))
    np_ *= n
    utg[2] = np_ * (-17 / 480.0 + n * (37 / 840.0 + n * (209 / 4480.0 + n * (
        -5569 / 90720.0))))
    gtu[2] = np_ * (61 / 240.0 + n * (-103 / 140.0 + n * (15061 / 26880.0 + n * (
        167603 / 181440.0))))
    np_ *= n
    utg[3] = np_ * (-4397 / 161280.0 + n * (11 / 504.0 + n * (830251 / 7257600.0)))
    gtu[3] = np_ * (49561 / 161280.0 + n * (-179 / 168.0 + n * (6601661 / 7257600.0)))
    np_ *= n
    utg[4] = np_ * (-4583 / 161280.0 + n * (108847 / 3991680.0))
    gtu[4] = np_ * (34729 / 80640.0 + n * (-3418889 / 1995840.0))
    np_ *= n
    utg[5] = np_ * (-20648693 / 638668800.0)
    gtu[5] = np_ * (212378941 / 319334400.0)

    # origin northing offset from the Gaussian latitude of phi0
    Z = S.gatg(cbg, np.float64(phi0), np.float64(math.cos(2 * phi0)),
               np.float64(math.sin(2 * phi0)))
    Zb = -Qn * (Z + S.clens(gtu, np.float64(2 * Z)))
    return cgb, cbg, utg, gtu, float(Qn), float(Zb)


class Tmerc(Operation):
    """Transverse Mercator. algo: 'approx' (Evenden/Snyder), 'exact'
    (Poder/Engsager), or 'auto' (exact only beyond 3 deg from the central
    meridian, tmerc.cpp:598-614). Sphere always uses the spherical form."""

    name = "tmerc"
    default_algo = "auto-or-ini"

    def setup(self, ps) -> None:
        P = self.P
        algo = self._resolve_algo(ps)
        self.algo = algo
        if P.es == 0.0:
            self.algo = algo = "approx"
        if algo in ("approx", "auto"):
            if P.es != 0.0:
                self.en = S.enfn(P.ell.n)
                self.ml0 = float(S.mlfn(np.float64(P.phi0),
                                        np.float64(math.sin(P.phi0)),
                                        np.float64(math.cos(P.phi0)), self.en))
                self.esp = P.es / (1.0 - P.es)
            else:
                self.esp = P.k0
                self.ml0 = 0.5 * self.esp
        if algo in ("exact", "auto"):
            (self.cgb, self.cbg, self.utg, self.gtu,
             self.Qn, self.Zb) = _etmerc_coeffs(P.ell.n, P.k0, P.phi0)

    def _resolve_algo(self, ps) -> str:
        P = self.P
        if ps.flag("approx"):
            return "approx"
        alg = ps.s("algo")
        if alg == "evenden_snyder":
            return "approx"
        if alg == "poder_engsager":
            return "exact"
        # proj.ini default is poder_engsager (src/proj_internal.h:818)
        if alg != "auto":
            return "exact"
        if P.es > 0.1 or P.phi0 != 0 or abs(P.k0 - 1) > 0.01:
            return "exact"
        return "auto"

    # -- Evenden/Snyder ellipsoidal (tmerc.cpp:71-190) ---------------------
    def _approx_fwd(self, lam, phi):
        P = self.P
        bad = (lam < -S.HALFPI) | (lam > S.HALFPI)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        tt = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        tt = tt * tt
        al = cosphi * lam
        als = al * al
        al = al / np.sqrt(1.0 - P.es * sinphi * sinphi)
        nn = self.esp * cosphi * cosphi
        x = P.k0 * al * (_FC[0] + _FC[2] * als * (1.0 - tt + nn + _FC[4] * als *
            (5.0 + tt * (tt - 18.0) + nn * (14.0 - 58.0 * tt) + _FC[6] * als *
             (61.0 + tt * (tt * (179.0 - tt) - 479.0)))))
        y = P.k0 * (S.mlfn(phi, sinphi, cosphi, self.en) - self.ml0 +
            sinphi * al * lam * _FC[1] * (1.0 + _FC[3] * als *
            (5.0 - tt + nn * (9.0 + 4.0 * nn) + _FC[5] * als *
             (61.0 + tt * (tt - 58.0) + nn * (270.0 - 330 * tt) + _FC[7] * als *
              (1385.0 + tt * (tt * (543.0 - tt) - 3111.0))))))
        x = np.where(bad, np.inf, x)
        y = np.where(bad, np.inf, y)
        return x, y

    def _approx_inv(self, x, y):
        P = self.P
        phi = S.inv_mlfn(self.ml0 + y / P.k0, self.en)
        at_pole = np.abs(phi) >= S.HALFPI
        phi_pole = np.where(y < 0.0, -S.HALFPI, S.HALFPI)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        tt = np.where(np.abs(cosphi) > 1e-10, sinphi / cosphi, 0.0)
        nn = self.esp * cosphi * cosphi
        con = 1.0 - P.es * sinphi * sinphi
        d = x * np.sqrt(con) / P.k0
        con = con * tt
        tt = tt * tt
        ds = d * d
        phi_out = phi - (con * ds / (1.0 - P.es)) * _FC[1] * (1.0 -
            ds * _FC[3] * (5.0 + tt * (3.0 - 9.0 * nn) + nn * (1.0 - 4 * nn) -
            ds * _FC[5] * (61.0 + tt * (90.0 - 252.0 * nn + 45.0 * tt) + 46.0 * nn -
            ds * _FC[7] * (1385.0 + tt * (3633.0 + tt * (4095.0 + 1575.0 * tt))))))
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_out = d * (_FC[0] - ds * _FC[2] * (1.0 + 2.0 * tt + nn -
                ds * _FC[4] * (5.0 + tt * (28.0 + 24.0 * tt + 8.0 * nn) + 6.0 * nn -
                ds * _FC[6] * (61.0 + tt * (662.0 + tt * (1320.0 + 720.0 * tt)))))) / cosphi
        phi_r = np.where(at_pole, phi_pole, phi_out)
        lam_r = np.where(at_pole, 0.0, lam_out)
        return lam_r, phi_r

    # -- spherical (tmerc.cpp:118-151, 193-216) ----------------------------
    def _sph_fwd(self, lam, phi):
        cosphi = np.cos(phi)
        b = cosphi * np.sin(lam)
        bad = np.abs(np.abs(b) - 1.0) <= EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            x = self.ml0 * np.log((1.0 + b) / (1.0 - b))
            yy = cosphi * np.cos(lam) / np.sqrt(1.0 - b * b)
        ay = np.abs(yy)
        wrap = (cosphi == 1) & ((lam < -S.HALFPI) | (lam > S.HALFPI))
        over = (ay >= 1.0) & ((ay - 1.0) > EPS10)
        y = np.where(ay >= 1.0, 0.0, np.arccos(np.clip(yy, -1.0, 1.0)))
        y = np.where(wrap, np.pi, y)
        y = np.where(phi < 0.0, -y, y)
        y = self.esp * (y - self.P.phi0)
        bad = bad | over
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y)

    def _sph_inv(self, x, y):
        with np.errstate(over="ignore"):
            h = np.exp(x / self.esp)
        bad = h == 0
        g = 0.5 * (h - 1.0 / h)
        D = self.P.phi0 + y / self.esp
        hh = np.cos(D)
        phi = np.arcsin(np.sqrt(np.clip((1.0 - hh * hh) / (1.0 + g * g), 0, 1)))
        phi = np.copysign(phi, D)
        lam = np.where((g != 0.0) | (hh != 0.0), np.arctan2(g, hh), 0.0)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi)

    # -- Poder/Engsager exact (tmerc.cpp:326-485) --------------------------
    def _exact_fwd(self, lam, phi):
        Cn = S.gatg(self.cbg, phi, np.cos(2 * phi), np.sin(2 * phi))
        sin_Cn = np.sin(Cn)
        cos_Cn = np.cos(Cn)
        sin_Ce = np.sin(lam)
        cos_Ce = np.cos(lam)
        cos_Cn_cos_Ce = cos_Cn * cos_Ce
        Cn = np.arctan2(sin_Cn, cos_Cn_cos_Ce)
        inv_denom = 1.0 / np.hypot(sin_Cn, cos_Cn_cos_Ce)
        tan_Ce = sin_Ce * cos_Cn * inv_denom
        Ce = np.arcsinh(tan_Ce)
        two_inv = 2 * inv_denom
        two_inv_sq = two_inv * inv_denom
        tmp_r = cos_Cn_cos_Ce * two_inv_sq
        sin_arg_r = sin_Cn * tmp_r
        cos_arg_r = cos_Cn_cos_Ce * tmp_r - 1
        sinh_arg_i = tan_Ce * two_inv
        cosh_arg_i = two_inv_sq - 1
        dCn, dCe = S.clenS(self.gtu, sin_arg_r, cos_arg_r,
                           sinh_arg_i, cosh_arg_i)
        Cn = Cn + dCn
        Ce = Ce + dCe
        ok = np.abs(Ce) <= 2.623395162778
        y = np.where(ok, self.Qn * Cn + self.Zb, np.inf)
        x = np.where(ok, self.Qn * Ce, np.inf)
        return x, y

    def _exact_inv(self, x, y):
        Cn = (y - self.Zb) / self.Qn
        Ce = x / self.Qn
        ok = np.abs(Ce) <= 2.623395162778
        Ce_safe = np.where(ok, Ce, 0.0)
        sin_arg_r = np.sin(2 * Cn)
        cos_arg_r = np.cos(2 * Cn)
        exp2 = np.exp(2 * Ce_safe)
        half_inv = 0.5 / exp2
        sinh_arg_i = 0.5 * exp2 - half_inv
        cosh_arg_i = 0.5 * exp2 + half_inv
        dCn, dCe = S.clenS(self.utg, sin_arg_r, cos_arg_r,
                           sinh_arg_i, cosh_arg_i)
        Cn = Cn + dCn
        Ce = Ce_safe + dCe
        sin_Cn = np.sin(Cn)
        cos_Cn = np.cos(Cn)
        sinhCe = np.sinh(Ce)
        Ce_out = np.arctan2(sinhCe, cos_Cn)
        mod_Ce = np.hypot(sinhCe, cos_Cn)
        Cn_out = np.arctan2(sin_Cn, mod_Ce)
        tmp = 2 * mod_Ce / (sinhCe * sinhCe + 1)
        sin_2_Cn = sin_Cn * tmp
        cos_2_Cn = tmp * mod_Ce - 1.0
        phi = S.gatg(self.cgb, Cn_out, cos_2_Cn, sin_2_Cn)
        lam = Ce_out
        return (np.where(ok, lam, np.inf), np.where(ok, phi, np.inf))

    # -- dispatch ----------------------------------------------------------
    def _fwd(self, lam, phi, z, t) -> Coords:
        if self.P.es == 0.0:
            x, y = self._sph_fwd(lam, phi)
        elif self.algo == "approx":
            x, y = self._approx_fwd(lam, phi)
        elif self.algo == "exact":
            x, y = self._exact_fwd(lam, phi)
        else:  # auto: exact only beyond 3 degrees from central meridian
            near = np.abs(lam) <= 3 * math.pi / 180
            if near.all():
                x, y = self._approx_fwd(lam, phi)
            elif not near.any():
                x, y = self._exact_fwd(lam, phi)
            else:
                # mixed batch: each algorithm runs only on its subset
                x = np.empty_like(lam)
                y = np.empty_like(lam)
                m = near
                x[m], y[m] = self._approx_fwd(lam[m], phi[m])
                m = ~near
                x[m], y[m] = self._exact_fwd(lam[m], phi[m])
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        if self.P.es == 0.0:
            lam, phi = self._sph_inv(x, y)
        elif self.algo == "approx":
            lam, phi = self._approx_inv(x, y)
        elif self.algo == "exact":
            lam, phi = self._exact_inv(x, y)
        else:
            near = np.abs(x) <= 0.053 - 0.022 * y * y
            if near.all():
                lam, phi = self._approx_inv(x, y)
            elif not near.any():
                lam, phi = self._exact_inv(x, y)
            else:
                lam = np.empty_like(x)
                phi = np.empty_like(x)
                m = near
                lam[m], phi[m] = self._approx_inv(x[m], y[m])
                m = ~near
                lam[m], phi[m] = self._exact_inv(x[m], y[m])
        return lam, phi, z, t


class Etmerc(Tmerc):
    name = "etmerc"

    def _resolve_algo(self, ps) -> str:
        if self.P.es == 0.0:
            raise ValueError("etmerc requires an ellipsoid")
        return "exact"


class Utm(Tmerc):
    """UTM: tmerc with zone-derived lon_0, k0=0.9996, x0=500000
    (tmerc.cpp:737-775)."""

    name = "utm"

    def setup(self, ps) -> None:
        P = self.P
        if P.es == 0.0:
            raise ValueError("utm requires an ellipsoid")
        P.y0 = 10000000.0 if ps.flag("south") else 0.0
        P.x0 = 500000.0
        if ps.has("zone"):
            zone = ps.i("zone")
            if not (1 <= zone <= 60):
                raise ValueError("invalid utm zone")
            zone -= 1
        else:
            zone = int(round(math.floor(
                (float(S.adjlon(np.float64(P.lam0))) + math.pi) * 30.0 / math.pi)))
            zone = min(max(zone, 0), 59)
        P.lam0 = (zone + 0.5) * math.pi / 30.0 - math.pi
        P.k0 = 0.9996
        P.phi0 = 0.0
        self.zone = zone + 1
        super().setup(ps)

    def _resolve_algo(self, ps) -> str:
        return "approx" if ps.flag("approx") else "exact"


# -------------------------------------------------------------------- lcc --
class Lcc(Operation):
    name = "lcc"

    def setup(self, ps) -> None:
        P = self.P
        phi1 = ps.r("lat_1")
        if ps.has("lat_2"):
            phi2 = ps.r("lat_2")
        else:
            phi2 = phi1
            if not ps.has("lat_0"):
                P.phi0 = phi1
        if abs(phi1 + phi2) < EPS10:
            raise ValueError("|lat_1 + lat_2| should be > 0")
        self.n = sinphi = math.sin(phi1)
        cosphi = math.cos(phi1)
        if abs(cosphi) < EPS10 or abs(phi1) >= S.HALFPI:
            raise ValueError("|lat_1| should be < 90")
        secant = abs(phi1 - phi2) >= EPS10
        if P.es != 0.0:
            m1 = float(S.msfn(sinphi, cosphi, P.es))
            ml1 = float(S.tsfn(np.float64(phi1), np.float64(sinphi), P.e))
            if secant:
                sinphi2 = math.sin(phi2)
                self.n = math.log(m1 / float(S.msfn(sinphi2, math.cos(phi2), P.es)))
                ml2 = float(S.tsfn(np.float64(phi2), np.float64(sinphi2), P.e))
                self.n /= math.log(ml1 / ml2)
            self.rho0 = m1 * ml1 ** (-self.n) / self.n
            self.c = self.rho0
            if abs(abs(P.phi0) - S.HALFPI) < EPS10:
                self.rho0 = 0.0
            else:
                self.rho0 *= float(S.tsfn(np.float64(P.phi0),
                                          np.float64(math.sin(P.phi0)),
                                          P.e)) ** self.n
        else:
            if secant:
                self.n = (math.log(cosphi / math.cos(phi2)) /
                          math.log(math.tan(S.FORTPI + 0.5 * phi2) /
                                   math.tan(S.FORTPI + 0.5 * phi1)))
            if self.n == 0:
                raise ValueError("invalid lat_1/lat_2")
            self.c = (cosphi * math.tan(S.FORTPI + 0.5 * phi1) ** self.n / self.n)
            if abs(abs(P.phi0) - S.HALFPI) < EPS10:
                self.rho0 = 0.0
            else:
                self.rho0 = self.c * math.tan(S.FORTPI + 0.5 * P.phi0) ** (-self.n)

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        n = self.n
        at_pole = np.abs(np.abs(phi) - S.HALFPI) < EPS10
        bad = at_pole & ((phi * n) <= 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            if P.es != 0.0:
                rho = self.c * S.tsfn(phi, np.sin(phi), P.e) ** n
            else:
                rho = self.c * np.tan(S.FORTPI + 0.5 * phi) ** (-n)
        rho = np.where(at_pole, 0.0, rho)
        lamn = lam * n
        x = P.k0 * rho * np.sin(lamn)
        y = P.k0 * (self.rho0 - rho * np.cos(lamn))
        return (np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t)

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        n = self.n
        x = x / P.k0
        y = self.rho0 - y / P.k0
        rho = np.hypot(x, y)
        if n < 0.0:
            rho = -rho
            x = -x
            y = -y
        zero = rho == 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            if P.es != 0.0:
                phi = S.phi2((rho / self.c) ** (1.0 / n), P.e)
            else:
                phi = 2.0 * np.arctan((self.c / rho) ** (1.0 / n)) - S.HALFPI
            lam = np.arctan2(x, y) / n
        phi = np.where(zero, S.HALFPI if n > 0 else -S.HALFPI, phi)
        lam = np.where(zero, 0.0, lam)
        return lam, phi, z, t
