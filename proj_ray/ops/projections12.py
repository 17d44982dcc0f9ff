"""Projection wave 12: Colombia Urban, Bertin 1953, quadrilateralized
spherical cube, and the Space Oblique Mercator family (som/lsat/misrsom).

References (parity targets, not copied):
  col_urban  src/projections/col_urban.cpp (IOGP Guidance Note 7-2)
  bertin1953 src/projections/bertin1953.cpp
  qsc        src/projections/qsc.cpp (O'Neill & Laubscher 1976)
  som        src/projections/som.cpp (Snyder Space Oblique Mercator)
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation
from proj_ray.ops.projections2 import aasin

EPS10 = 1e-10
FORTPI = math.pi / 4


class ColUrban(Operation):
    """Colombia Urban projection (src/projections/col_urban.cpp)."""

    name = "col_urban"

    def setup(self, ps) -> None:
        P = self.P
        self.h0 = ps.f("h_0") / P.ell.a
        sinphi0 = math.sin(P.phi0)
        nu0 = 1.0 / math.sqrt(1 - P.es * sinphi0 * sinphi0)
        self.A = 1 + self.h0 / nu0
        self.rho0 = (1 - P.es) / (1 - P.es * sinphi0 * sinphi0) ** 1.5
        self.B = math.tan(P.phi0) / (2 * self.rho0 * nu0)
        self.C = 1 + self.h0
        self.D = self.rho0 * (1 + self.h0 / (1 - P.es))

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1 - P.es * sinphi * sinphi)
        lnc = lam * nu * cosphi
        x = self.A * lnc
        sinphi_m = np.sin(0.5 * (phi + P.phi0))
        rho_m = (1 - P.es) / (1 - P.es * sinphi_m * sinphi_m) ** 1.5
        G = 1 + self.h0 / rho_m
        y = G * self.rho0 * ((phi - P.phi0) + self.B * lnc * lnc)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        phi = P.phi0 + y / self.D - self.B * (x / self.C) * (x / self.C)
        sinphi = np.sin(phi)
        nu = 1.0 / np.sqrt(1 - P.es * sinphi * sinphi)
        lam = x / (self.C * nu * np.cos(phi))
        return lam, phi, z, t


class Bertin1953(Operation):
    """Bertin 1953 (no inverse), src/projections/bertin1953.cpp
    (Riviere's published formulation)."""

    name = "bertin1953"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        P = self.P
        P.lam0 = 0.0
        P.phi0 = math.radians(-42.0)
        self.cos_dphi = math.cos(P.phi0)
        self.sin_dphi = math.sin(P.phi0)
        if P.ell.es != 0.0:
            P.ell = Ellipsoid(a=P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        fu, k, w = 1.4, 12.0, 1.68
        lam = lam + math.radians(-16.5)
        cosphi = np.cos(phi)
        x3 = np.cos(lam) * cosphi
        y3 = np.sin(lam) * cosphi
        z3 = np.sin(phi)
        z0 = z3 * self.cos_dphi + x3 * self.sin_dphi
        lam = np.arctan2(y3, x3 * self.cos_dphi - z3 * self.sin_dphi)
        phi = np.arcsin(np.clip(z0, -1.0, 1.0))
        lam = S.adjlon(lam)
        cond = lam + phi < -fu
        d = np.where(cond, (lam - phi + 1.6) * (lam + phi + fu) / 8.0, 0.0)
        lam = lam + d
        phi = phi - 0.8 * d * np.sin(phi + math.pi / 2.0)
        cosphi = np.cos(phi)
        d = np.sqrt(2.0 / (1.0 + cosphi * np.cos(lam / 2.0)))
        x = w * d * cosphi * np.sin(lam / 2.0)
        y = d * np.sin(phi)
        d = (1.0 - np.cos(lam * phi)) / k
        x = np.where(y < 0.0, x * (1.0 + d), x)
        y = np.where(y > 0.0, y * (1.0 + d / 1.5 * x * x), y)
        return x, y, z, t


class Qsc(Operation):
    """Quadrilateralized spherical cube (src/projections/qsc.cpp)."""

    name = "qsc"
    F_FRONT, F_RIGHT, F_BACK, F_LEFT, F_TOP, F_BOTTOM = range(6)

    def setup(self, ps) -> None:
        P = self.P
        if P.phi0 >= S.HALFPI - FORTPI / 2.0:
            self.face = self.F_TOP
        elif P.phi0 <= -(S.HALFPI - FORTPI / 2.0):
            self.face = self.F_BOTTOM
        elif abs(P.lam0) <= FORTPI:
            self.face = self.F_FRONT
        elif abs(P.lam0) <= S.HALFPI + FORTPI:
            self.face = self.F_RIGHT if P.lam0 > 0.0 else self.F_LEFT
        else:
            self.face = self.F_BACK
        if P.es != 0.0:
            a = P.ell.a
            self.b = a * math.sqrt(1.0 - P.es)
            self.one_minus_f = 1.0 - (a - self.b) / a
            self.one_minus_f_sq = self.one_minus_f ** 2

    @staticmethod
    def _shift_lon(lon, off):
        s = lon + off
        s = np.where(s < -math.pi, s + 2 * math.pi, s)
        s = np.where(s > math.pi, s - 2 * math.pi, s)
        return s

    @staticmethod
    def _equat_theta(phi, yy, xx):
        """theta and area on an equatorial face
        (qsc.cpp qsc_fwd_equat_face_theta)."""
        theta = np.arctan2(yy, xx)
        area = np.select(
            [np.abs(theta) <= FORTPI,
             (theta > FORTPI) & (theta <= S.HALFPI + FORTPI),
             (theta > S.HALFPI + FORTPI) | (theta <= -(S.HALFPI + FORTPI))],
            [0, 1, 2], 3)
        theta = np.select(
            [area == 1, area == 2, area == 3],
            [theta - S.HALFPI,
             np.where(theta >= 0.0, theta - math.pi, theta + math.pi),
             theta + S.HALFPI], theta)
        small = phi < EPS10
        return np.where(small, 0.0, theta), np.where(small, 0, area)

    def _fwd(self, lam, phi_in, z, tt) -> Coords:
        P = self.P
        if P.es != 0.0:
            lat = np.arctan(self.one_minus_f_sq * np.tan(phi_in))
        else:
            lat = phi_in
        lon = lam
        if self.face == self.F_TOP:
            phi = S.HALFPI - lat
            conds = [(lon >= FORTPI) & (lon <= S.HALFPI + FORTPI),
                     (lon > S.HALFPI + FORTPI) | (lon <= -(S.HALFPI
                                                           + FORTPI)),
                     (lon > -(S.HALFPI + FORTPI)) & (lon <= -FORTPI)]
            area = np.select(conds, [0, 1, 2], 3)
            theta = np.select(
                conds,
                [lon - S.HALFPI,
                 np.where(lon > 0.0, lon - math.pi, lon + math.pi),
                 lon + S.HALFPI], lon)
        elif self.face == self.F_BOTTOM:
            phi = S.HALFPI + lat
            conds = [(lon >= FORTPI) & (lon <= S.HALFPI + FORTPI),
                     (lon < FORTPI) & (lon >= -FORTPI),
                     (lon < -FORTPI) & (lon >= -(S.HALFPI + FORTPI))]
            area = np.select(conds, [0, 1, 2], 3)
            theta = np.select(
                conds,
                [-lon + S.HALFPI, -lon, -lon - S.HALFPI],
                np.where(lon > 0.0, -lon + math.pi, -lon - math.pi))
        else:
            if self.face == self.F_RIGHT:
                lon = self._shift_lon(lon, S.HALFPI)
            elif self.face == self.F_BACK:
                lon = self._shift_lon(lon, math.pi)
            elif self.face == self.F_LEFT:
                lon = self._shift_lon(lon, -S.HALFPI)
            sinlat, coslat = np.sin(lat), np.cos(lat)
            sinlon, coslon = np.sin(lon), np.cos(lon)
            q = coslat * coslon
            r = coslat * sinlon
            s = sinlat
            if self.face == self.F_FRONT:
                phi = np.arccos(np.clip(q, -1, 1))
                theta, area = self._equat_theta(phi, s, r)
            elif self.face == self.F_RIGHT:
                phi = np.arccos(np.clip(r, -1, 1))
                theta, area = self._equat_theta(phi, s, -q)
            elif self.face == self.F_BACK:
                phi = np.arccos(np.clip(-q, -1, 1))
                theta, area = self._equat_theta(phi, s, -r)
            else:
                phi = np.arccos(np.clip(-r, -1, 1))
                theta, area = self._equat_theta(phi, s, q)
        mu = np.arctan((12.0 / math.pi)
                       * (theta + np.arccos(np.sin(theta)
                                            * math.cos(FORTPI))
                          - S.HALFPI))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.sqrt((1.0 - np.cos(phi))
                        / (np.cos(mu) ** 2)
                        / (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))))
        mu = mu + np.select([area == 1, area == 2, area == 3],
                            [S.HALFPI, math.pi, math.pi + S.HALFPI], 0.0)
        x = t * np.cos(mu)
        y = t * np.sin(mu)
        return x, y, z, tt

    def _inv(self, x, y, z, tt) -> Coords:
        P = self.P
        nu = np.arctan(np.sqrt(x * x + y * y))
        mu = np.arctan2(y, x)
        conds = [(x >= 0.0) & (x >= np.abs(y)),
                 (y >= 0.0) & (y >= np.abs(x)),
                 (x < 0.0) & (-x >= np.abs(y))]
        area = np.select(conds, [0, 1, 2], 3)
        mu = np.select(
            conds,
            [mu, mu - S.HALFPI,
             np.where(mu < 0.0, mu + math.pi, mu - math.pi)],
            mu + S.HALFPI)
        t = (math.pi / 12.0) * np.tan(mu)
        tantheta = np.sin(t) / (np.cos(t) - (1.0 / math.sqrt(2.0)))
        theta = np.arctan(tantheta)
        cosmu = np.cos(mu)
        tannu = np.tan(nu)
        cosphi = 1.0 - cosmu * cosmu * tannu * tannu * \
            (1.0 - np.cos(np.arctan(1.0 / np.cos(theta))))
        cosphi = np.clip(cosphi, -1.0, 1.0)
        if self.face == self.F_TOP:
            phiv = np.arccos(cosphi)
            lp_phi = S.HALFPI - phiv
            lp_lam = np.select(
                [area == 0, area == 1, area == 2],
                [theta + S.HALFPI,
                 np.where(theta < 0.0, theta + math.pi, theta - math.pi),
                 theta - S.HALFPI], theta)
        elif self.face == self.F_BOTTOM:
            phiv = np.arccos(cosphi)
            lp_phi = phiv - S.HALFPI
            lp_lam = np.select(
                [area == 0, area == 1, area == 2],
                [-theta + S.HALFPI, -theta, -theta - S.HALFPI],
                np.where(theta < 0.0, -theta - math.pi, -theta + math.pi))
        else:
            q = cosphi
            t2 = q * q
            s = np.where(t2 >= 1.0, 0.0, np.sqrt(np.maximum(1.0 - t2, 0.0))
                         * np.sin(theta))
            t2 = t2 + s * s
            r = np.where(t2 >= 1.0, 0.0, np.sqrt(np.maximum(1.0 - t2, 0.0)))
            # rotate into the correct area
            q1, r1, s1 = q, r, s
            r = np.select([area == 1, area == 2, area == 3],
                          [-s1, -r1, s1], r1)
            s = np.select([area == 1, area == 2, area == 3],
                          [r1, -s1, -r1], s1)
            q = q1
            # rotate into the correct cube face
            if self.face == self.F_RIGHT:
                q, r = -r, q
            elif self.face == self.F_BACK:
                q, r = -q, -r
            elif self.face == self.F_LEFT:
                q, r = r, -q
            lp_phi = np.arccos(np.clip(-s, -1, 1)) - S.HALFPI
            lp_lam = np.arctan2(r, q)
            if self.face == self.F_RIGHT:
                lp_lam = self._shift_lon(lp_lam, -S.HALFPI)
            elif self.face == self.F_BACK:
                lp_lam = self._shift_lon(lp_lam, -math.pi)
            elif self.face == self.F_LEFT:
                lp_lam = self._shift_lon(lp_lam, S.HALFPI)
        if P.es != 0.0:
            a = P.ell.a
            invert = lp_phi < 0.0
            tanphi = np.tan(lp_phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                xa = self.b / np.sqrt(tanphi * tanphi + self.one_minus_f_sq)
                lp_phi = np.arctan(
                    np.sqrt(np.maximum(a * a - xa * xa, 0.0))
                    / (self.one_minus_f * xa))
            lp_phi = np.where(invert, -lp_phi, lp_phi)
        return lp_lam, lp_phi, z, tt


class Som(Operation):
    """Space Oblique Mercator (src/projections/som.cpp)."""

    name = "som"
    TOL = 1e-7

    def setup(self, ps) -> None:
        P = self.P
        P.lam0 = ps.r("asc_lon")
        if P.lam0 < -2 * math.pi or P.lam0 > 2 * math.pi:
            raise ValueError("som: asc_lon out of [-2pi, 2pi]")
        self.alf = ps.r("inc_angle")
        if self.alf < 0 or self.alf > math.pi:
            raise ValueError("som: inc_angle out of [0, pi]")
        self.p22 = ps.f("ps_rev")
        if self.p22 < 0:
            raise ValueError("som: ps_rev must be positive")
        self.rlm = 0.0
        self._setup_som()

    def _seraz0(self, lam_deg: float, mult: float) -> None:
        lam = math.radians(lam_deg)
        sd = math.sin(lam)
        sdsq = sd * sd
        s = self.p22 * self.sa * math.cos(lam) * math.sqrt(
            (1.0 + self.t * sdsq)
            / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
        d1 = 1.0 + self.q * sdsq
        h = math.sqrt((1.0 + self.q * sdsq) / (1.0 + self.w * sdsq)) * (
            (1.0 + self.w * sdsq) / (d1 * d1) - self.p22 * self.ca)
        sq = math.sqrt(self.xj * self.xj + s * s)
        fc = mult * (h * self.xj - s * s) / sq
        self.b += fc
        self.a2 += fc * math.cos(lam + lam)
        self.a4 += fc * math.cos(lam * 4.0)
        fc = mult * s * (h + self.xj) / sq
        self.c1 += fc * math.cos(lam)
        self.c3 += fc * math.cos(lam * 3.0)

    def _setup_som(self) -> None:
        P = self.P
        self.sa = math.sin(self.alf)
        self.ca = math.cos(self.alf)
        if abs(self.ca) < 1e-9:
            self.ca = 1e-9
        one_es = P.ell.one_es
        rone_es = 1.0 / one_es
        esc = P.es * self.ca * self.ca
        ess = P.es * self.sa * self.sa
        self.w = (1.0 - esc) * rone_es
        self.w = self.w * self.w - 1.0
        self.q = ess * rone_es
        self.t = ess * (2.0 - P.es) * rone_es * rone_es
        self.u = esc * rone_es
        self.xj = one_es * one_es * one_es
        self.rlm2 = self.rlm + 2 * math.pi
        self.a2 = self.a4 = self.b = self.c1 = self.c3 = 0.0
        self._seraz0(0.0, 1.0)
        lam = 9.0
        while lam <= 81.0001:
            self._seraz0(lam, 4.0)
            lam += 18.0
        lam = 18.0
        while lam <= 72.0001:
            self._seraz0(lam, 2.0)
            lam += 18.0
        self._seraz0(90.0, 1.0)
        self.a2 /= 30.0
        self.a4 /= 60.0
        self.b /= 30.0
        self.c1 /= 15.0
        self.c3 /= 45.0

    def _fwd(self, lam, phi, z, tt) -> Coords:
        P = self.P
        TOL = self.TOL
        one_es = P.ell.one_es
        phi = np.clip(phi, -S.HALFPI, S.HALFPI)
        lampp = np.where(phi >= 0.0, S.HALFPI, math.pi + S.HALFPI)
        tanphi = np.tan(phi)
        lamdp = np.zeros(lam.shape)
        lamt = np.zeros(lam.shape)
        err = np.zeros(lam.shape, dtype=bool)
        outer_active = np.ones(lam.shape, dtype=bool)
        for nn in range(3):
            if not outer_active.any():
                break
            sav = lampp.copy()
            lamtp = lam + self.p22 * lampp
            cl = np.cos(lamtp)
            fac = np.where(cl < 0,
                           lampp + np.sin(lampp) * S.HALFPI,
                           lampp - np.sin(lampp) * S.HALFPI)
            inner_active = outer_active.copy()
            conv_at_l0 = np.zeros(lam.shape, dtype=bool)
            for li in range(50, -1, -1):
                if not inner_active.any():
                    break
                lamt_i = lam + self.p22 * sav
                c = np.cos(lamt_i)
                lamt_i = np.where(np.abs(c) < TOL, lamt_i - TOL, lamt_i)
                c = np.where(np.abs(c) < TOL, np.cos(lamt_i), c)
                xlam = (one_es * tanphi * self.sa
                        + np.sin(lamt_i) * self.ca) / c
                lamdp_i = np.arctan(xlam) + fac
                lamt = np.where(inner_active, lamt_i, lamt)
                lamdp = np.where(inner_active, lamdp_i, lamdp)
                conv = np.abs(np.abs(sav) - np.abs(lamdp_i)) < TOL
                conv_at_l0 |= inner_active & conv & (li == 0)
                inner_active = inner_active & ~conv
                sav = np.where(inner_active, lamdp_i, sav)
            err |= outer_active & conv_at_l0
            in_range = (lamdp > self.rlm) & (lamdp < self.rlm2)
            stop = conv_at_l0 | in_range
            outer_active = outer_active & ~stop
            if nn < 2:
                lampp = np.where(outer_active & (lamdp <= self.rlm),
                                 2 * math.pi + S.HALFPI, lampp)
                lampp = np.where(outer_active & (lamdp >= self.rlm2),
                                 S.HALFPI, lampp)
        sp = np.sin(phi)
        phidp = aasin((one_es * self.ca * sp
                       - self.sa * np.cos(phi) * np.sin(lamt))
                      / np.sqrt(1.0 - P.es * sp * sp))
        tanph = np.log(np.tan(FORTPI + 0.5 * phidp))
        sd = np.sin(lamdp)
        sdsq = sd * sd
        s = self.p22 * self.sa * np.cos(lamdp) * np.sqrt(
            (1.0 + self.t * sdsq)
            / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
        d = np.sqrt(self.xj * self.xj + s * s)
        x = (self.b * lamdp + self.a2 * np.sin(2.0 * lamdp)
             + self.a4 * np.sin(lamdp * 4.0) - tanph * s / d)
        y = (self.c1 * sd + self.c3 * np.sin(lamdp * 3.0)
             + tanph * self.xj / d)
        x = np.where(err, np.inf, x)
        y = np.where(err, np.inf, y)
        return x, y, z, tt

    def _inv(self, x, y, z, tt) -> Coords:
        P = self.P
        TOL = self.TOL
        one_es = P.ell.one_es
        rone_es = 1.0 / one_es
        lamdp = x / self.b
        s = np.zeros(x.shape)
        active = np.isfinite(lamdp)
        for _ in range(50):
            if not active.any():
                break
            sav = lamdp
            sd = np.sin(lamdp)
            sdsq = sd * sd
            s_i = self.p22 * self.sa * np.cos(lamdp) * np.sqrt(
                (1.0 + self.t * sdsq)
                / ((1.0 + self.w * sdsq) * (1.0 + self.q * sdsq)))
            s = np.where(active, s_i, s)
            lamdp_n = (x + y * s_i / self.xj
                       - self.a2 * np.sin(2.0 * lamdp)
                       - self.a4 * np.sin(lamdp * 4.0)
                       - s_i / self.xj * (self.c1 * np.sin(lamdp)
                                          + self.c3 * np.sin(lamdp * 3.0)))
            lamdp_n = lamdp_n / self.b
            lamdp = np.where(active, lamdp_n, lamdp)
            active = active & (np.abs(lamdp - sav) >= TOL)
        sl = np.sin(lamdp)
        fac = np.exp(np.sqrt(1.0 + s * s / self.xj / self.xj)
                     * (y - self.c1 * sl - self.c3 * np.sin(lamdp * 3.0)))
        phidp = 2.0 * (np.arctan(fac) - FORTPI)
        dd = sl * sl
        lamdp = np.where(np.abs(np.cos(lamdp)) < TOL, lamdp - TOL, lamdp)
        spp = np.sin(phidp)
        sppsq = spp * spp
        denom = 1.0 - sppsq * (1.0 + self.u)
        bad = denom == 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            lamt = np.arctan(
                ((1.0 - sppsq * rone_es) * np.tan(lamdp) * self.ca
                 - spp * self.sa * np.sqrt(np.maximum(
                     (1.0 + self.q * dd) * (1.0 - sppsq) - sppsq * self.u,
                     0.0)) / np.cos(lamdp))
                / np.where(bad, 1.0, denom))
        sl2 = np.where(lamt >= 0.0, 1.0, -1.0)
        scl = np.where(np.cos(lamdp) >= 0.0, 1.0, -1.0)
        lamt = lamt - S.HALFPI * (1.0 - scl) * sl2
        lam = lamt - self.p22 * lamdp
        if abs(self.sa) < TOL:
            phi = aasin(spp / np.sqrt(one_es * one_es + P.es * sppsq))
        else:
            phi = np.arctan((np.tan(lamdp) * np.cos(lamt)
                             - self.ca * np.sin(lamt))
                            / (one_es * self.sa))
        lam = np.where(bad, np.inf, lam)
        phi = np.where(bad, np.inf, phi)
        return lam, phi, z, tt


class Misrsom(Som):
    """Space oblique for MISR (src/projections/som.cpp:278-301)."""

    name = "misrsom"

    def setup(self, ps) -> None:
        P = self.P
        path = ps.i("path")
        if path <= 0 or path > 233:
            raise ValueError("misrsom: path out of [1, 233]")
        P.lam0 = math.radians(129.3056) - 2 * math.pi / 233.0 * path
        self.alf = math.radians(98.30382)
        self.p22 = 98.88 / 1440.0
        self.rlm = 0.0
        self._setup_som()


class Lsat(Som):
    """Space oblique for LANDSAT (src/projections/som.cpp:303-341)."""

    name = "lsat"

    def setup(self, ps) -> None:
        P = self.P
        land = ps.i("lsat")
        if land <= 0 or land > 5:
            raise ValueError("lsat: lsat out of [1, 5]")
        path = ps.i("path")
        max_path = 251 if land <= 3 else 233
        if path <= 0 or path > max_path:
            raise ValueError(f"lsat: path out of [1, {max_path}]")
        if land <= 3:
            P.lam0 = math.radians(128.87) - 2 * math.pi / 251.0 * path
            self.p22 = 103.2669323
            self.alf = math.radians(99.092)
        else:
            P.lam0 = math.radians(129.3) - 2 * math.pi / 233.0 * path
            self.p22 = 98.8841202
            self.alf = math.radians(98.2)
        self.p22 /= 1440.0
        self.rlm = math.pi * (1.0 / 248.0 + 0.5161290322580645)
        self._setup_som()


def register_all(register) -> None:
    for cls in (ColUrban, Bertin1953, Qsc, Som, Misrsom, Lsat):
        register(cls)
    try:
        from proj_ray.ops import projections13 as p13

        p13.register_all(register)
    except ImportError:
        pass
