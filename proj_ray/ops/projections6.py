"""Sixth wave: remaining cylindricals + perspective/misc spherical.

Re-derivations of: cc, tcc, tcea, times, tobmerc, comill, patterson
(src/projections/<name>.cpp polynomial cylindricals), lagrng
(src/projections/lagrng.cpp), vandg (van der Grinten I, Snyder 29-x
closed forms, src/projections/vandg.cpp), nsper/tpers
(src/projections/nsper.cpp).
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation
from proj_ray.ops.projections5 import _Sph

EPS10 = 1e-10


class Cc(_Sph):
    name = "cc"

    def _fwd(self, lam, phi, z, t) -> Coords:
        bad = np.abs(np.abs(phi) - S.HALFPI) <= EPS10
        y = np.tan(phi)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        return x, np.arctan(y), z, t


class Tcc(_Sph):
    name = "tcc"

    def _fwd(self, lam, phi, z, t) -> Coords:
        b = np.cos(phi) * np.sin(lam)
        bt = 1.0 - b * b
        bad = bt < EPS10
        x = b / np.sqrt(np.where(bad, 1.0, bt))
        y = np.arctan2(np.tan(phi), np.cos(lam))
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t


class Tcea(_Sph):
    name = "tcea"

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        x = np.cos(phi) * np.sin(lam) / P.k0
        y = P.k0 * (np.arctan2(np.tan(phi), np.cos(lam)) - P.phi0)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        yy = y / P.k0 + P.phi0
        xx = x * P.k0
        tt = np.sqrt(np.maximum(1.0 - xx * xx, 0.0))
        phi = np.arcsin(np.clip(tt * np.sin(yy), -1, 1))
        lam = np.arctan2(xx, tt * np.cos(yy))
        return lam, phi, z, t


class Times(_Sph):
    name = "times"

    def _fwd(self, lam, phi, z, t) -> Coords:
        T = np.tan(phi / 2.0)
        Ssq = np.sin(S.FORTPI * T) ** 2
        x = lam * (0.74482 - 0.34588 * Ssq)
        y = 1.70711 * T
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        T = y / 1.70711
        Ssq = np.sin(S.FORTPI * T) ** 2
        lam = x / (0.74482 - 0.34588 * Ssq)
        phi = 2 * np.arctan(T)
        return lam, phi, z, t


class Tobmerc(Operation):
    name = "tobmerc"

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        bad = np.abs(phi) >= S.HALFPI
        cosphi = np.cos(phi)
        x = P.k0 * lam * cosphi * cosphi
        with np.errstate(divide="ignore", invalid="ignore"):
            y = P.k0 * np.arcsinh(np.tan(phi))
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        phi = np.arctan(np.sinh(y / P.k0))
        cosphi = np.cos(phi)
        lam = x / P.k0 / (cosphi * cosphi)
        return lam, phi, z, t


class _PolyCyl(_Sph):
    """y = phi * poly(phi^2) cylindricals with Newton inverses."""

    MAX_Y = 0.0

    def _y_of(self, phi):
        raise NotImplementedError

    def _dy_of(self, phi):
        raise NotImplementedError

    def _fwd(self, lam, phi, z, t) -> Coords:
        return lam, self._y_of(phi), z, t

    def _inv(self, x, y, z, t) -> Coords:
        yc = np.clip(y, -self.MAX_Y, self.MAX_Y)
        target = yc.copy()
        conv = np.zeros(yc.shape, dtype=bool)
        for _ in range(100):
            f = self._y_of(yc) - target
            tol = f / self._dy_of(yc)
            yc = yc - np.where(conv, 0.0, tol)
            conv = conv | (np.abs(tol) < 1e-11)
            if conv.all():
                break
        return x, yc, z, t


class Comill(_PolyCyl):
    name = "comill"
    K1, K2, K3 = 0.9902, 0.1604, -0.03054
    MAX_Y = 0.6000207669862655 * np.pi

    def _y_of(self, phi):
        p2 = phi * phi
        return phi * (self.K1 + p2 * (self.K2 + self.K3 * p2))

    def _dy_of(self, phi):
        p2 = phi * phi
        return self.K1 + p2 * (3 * self.K2 + 5 * self.K3 * p2)


class Patterson(_PolyCyl):
    name = "patterson"
    K1, K2, K3, K4 = 1.0148, 0.23185, -0.14499, 0.02406
    MAX_Y = 1.790857183

    def _y_of(self, phi):
        p2 = phi * phi
        return phi * (self.K1 + p2 * p2 * (self.K2 + p2 * (
            self.K3 + self.K4 * p2)))

    def _dy_of(self, phi):
        p2 = phi * phi
        return self.K1 + p2 * p2 * (5 * self.K2 + p2 * (
            7 * self.K3 + 9 * self.K4 * p2))


class Lagrng(_Sph):
    name = "lagrng"
    TOL = 1e-10

    def _setup(self, ps) -> None:
        self.w = ps.f("W", 2.0) if ps.has("W") else 2.0
        if self.w <= 0:
            raise ValueError("lagrng: W should be > 0")
        self.hw = 0.5 * self.w
        self.rw = 1.0 / self.w
        self.hrw = 0.5 * self.rw
        sin_phi1 = math.sin(ps.r("lat_1"))
        if abs(abs(sin_phi1) - 1.0) < self.TOL:
            raise ValueError("lagrng: |lat_1| should be < 90")
        self.a1 = ((1.0 - sin_phi1) / (1.0 + sin_phi1)) ** self.hrw
        self.a2 = self.a1 * self.a1

    def _fwd(self, lam, phi, z, t) -> Coords:
        sp = np.sin(phi)
        at_pole = np.abs(np.abs(sp) - 1) < self.TOL
        with np.errstate(divide="ignore", invalid="ignore"):
            v = self.a1 * ((1.0 + sp) / (1.0 - sp)) ** self.hrw
            lm = lam * self.rw
            c = 0.5 * (v + 1.0 / v) + np.cos(lm)
            bad = (c < self.TOL) & ~at_pole
            x = 2.0 * np.sin(lm) / c
            y = (v - 1.0 / v) / c
        x = np.where(at_pole, 0.0, x)
        y = np.where(at_pole, np.where(phi < 0, -2.0, 2.0), y)
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        at_pole = np.abs(np.abs(y) - 2.0) < self.TOL
        x2 = x * x
        y2p = 2.0 + y
        y2m = 2.0 - y
        c = y2p * y2m - x2
        bad = (np.abs(c) < self.TOL) & ~at_pole
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = 2.0 * np.arctan(
                ((y2p * y2p + x2) / (self.a2 * (y2m * y2m + x2)))
                ** self.hw) - S.HALFPI
            lam = self.w * np.arctan2(4.0 * x, c)
        phi = np.where(at_pole, np.where(y < 0, -S.HALFPI, S.HALFPI), phi)
        lam = np.where(at_pole, 0.0, lam)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Vandg(_Sph):
    name = "vandg"
    TOL = 1e-10

    def _fwd(self, lam, phi, z, t) -> Coords:
        THIRD = 1 / 3.0
        p2 = np.abs(phi / S.HALFPI)
        bad = (p2 - self.TOL) > 1.0
        p2 = np.minimum(p2, 1.0)
        eq = np.abs(phi) <= self.TOL
        merid = (np.abs(lam) <= self.TOL) | (np.abs(p2 - 1.0) < self.TOL)
        sign = np.where(self.P.over & (np.abs(lam) > np.pi), -1.0, 1.0) \
            if self.P.over else 1.0
        with np.errstate(divide="ignore", invalid="ignore"):
            al = 0.5 * sign * np.abs(np.pi / lam - lam / np.pi)
            al2 = al * al
            g = np.sqrt(np.maximum(1.0 - p2 * p2, 0.0))
            g = g / (p2 + g - 1.0)
            g2 = g * g
            pp = g * (2.0 / p2 - 1.0)
            pp = pp * pp
            xa = g - pp
            gg = pp + al2
            x_g = (np.pi * np.abs(
                al * xa + np.sqrt(np.maximum(
                    al2 * xa * xa - gg * (g2 - pp), 0.0))) / gg)
            x_g = np.where(lam < 0.0, -x_g, x_g)
            ynorm = np.abs(x_g / np.pi)
            y_g = 1.0 - ynorm * (ynorm + 2.0 * al)
            bad_g = y_g < -self.TOL
            y_g = np.sqrt(np.maximum(y_g, 0.0)) * np.where(
                phi < 0.0, -np.pi, np.pi)
        y_m = np.pi * np.tan(0.5 * np.arcsin(np.clip(p2, -1, 1)))
        y_m = np.where(phi < 0.0, -y_m, y_m)
        x = np.where(eq, lam, np.where(merid, 0.0, x_g))
        y = np.where(eq, 0.0, np.where(merid, y_m, y_g))
        bad = bad | (~eq & ~merid & bad_g)
        _ = THIRD
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        TOL = self.TOL
        THIRD = 1 / 3.0
        C2_27 = 2 / 27.0
        PI4_3 = 4 * np.pi / 3
        PISQ = np.pi ** 2
        TPISQ = 2 * PISQ
        HPISQ = 0.5 * PISQ
        x2 = x * x
        ay = np.abs(y)
        eq = ay < TOL
        with np.errstate(divide="ignore", invalid="ignore"):
            t_eq = x2 * x2 + TPISQ * (x2 + HPISQ)
            lam_eq = np.where(np.abs(x) <= TOL, 0.0,
                              0.5 * (x2 - PISQ + np.sqrt(t_eq)) / x)
            y2 = y * y
            r = x2 + y2
            r2 = r * r
            c1 = -np.pi * ay * (r + PISQ)
            c3 = r2 + 2 * np.pi * (ay * r + np.pi * (
                y2 + np.pi * (ay + S.HALFPI)))
            c2 = c1 + PISQ * (r - 3.0 * y2)
            c0 = np.pi * ay
            c2 = c2 / c3
            al = c1 / c3 - THIRD * c2 * c2
            m = 2.0 * np.sqrt(np.maximum(-THIRD * al, 0.0))
            d = C2_27 * c2 * c2 * c2 + (c0 * c0 - THIRD * c2 * c1) / c3
            al_m = al * m
            degen = np.abs(al_m) < 1e-16
            d = 3.0 * d / np.where(degen, 1.0, al_m)
            td = np.abs(d)
            bad = ((td - TOL) > 1.0) | degen
            d = np.where(td > 1.0, np.where(d > 0.0, 0.0, np.pi),
                         np.arccos(np.clip(d, -1, 1)))
            d = np.where(r > PISQ, 2 * np.pi - d, d)
            phi = np.pi * (m * np.cos(d * THIRD + PI4_3) - THIRD * c2)
            phi = np.where(y < 0.0, -phi, phi)
            t_g = r2 + TPISQ * (x2 - y2 + HPISQ)
            lam_g = np.where(
                np.abs(x) <= TOL, 0.0,
                0.5 * (r - PISQ + np.where(t_g <= 0.0, 0.0,
                                           np.sqrt(np.maximum(t_g, 0.0))))
                / x)
        phi = np.where(eq, 0.0, phi)
        lam = np.where(eq, lam_eq, lam_g)
        bad = bad & ~eq
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Nsper(_Sph):
    name = "nsper"
    tilt = False

    def _setup(self, ps) -> None:
        P = self.P
        self.height = ps.f("h")
        tv = abs(P.phi0)
        if abs(tv - S.HALFPI) < EPS10:
            self.mode = "s_pole" if P.phi0 < 0 else "n_pole"
        elif tv < EPS10:
            self.mode = "equit"
        else:
            self.mode = "obliq"
        self.sinph0 = math.sin(P.phi0)
        self.cosph0 = math.cos(P.phi0)
        self.pn1 = self.height / P.a
        if self.pn1 <= 0 or self.pn1 > 1e10:
            raise ValueError("nsper: invalid h")
        self.p = 1.0 + self.pn1
        self.rp = 1.0 / self.p
        self.h = 1.0 / self.pn1
        self.pfact = (self.p + 1.0) * self.h
        if self.tilt:
            omega = ps.r("tilt")
            gamma = ps.r("azi")
            self.cg = math.cos(gamma)
            self.sg = math.sin(gamma)
            self.cw = math.cos(omega)
            self.sw = math.sin(omega)

    def _fwd(self, lam, phi, z, t) -> Coords:
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.mode == "obliq":
            yb = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        elif self.mode == "equit":
            yb = cosphi * coslam
        elif self.mode == "s_pole":
            yb = -sinphi
        else:
            yb = sinphi
        bad = yb < self.rp
        yy = self.pn1 / (self.p - yb)
        x = yy * cosphi * np.sin(lam)
        if self.mode == "obliq":
            y = yy * (self.cosph0 * sinphi
                      - self.sinph0 * cosphi * coslam)
        elif self.mode == "equit":
            y = yy * sinphi
        else:
            cl = -coslam if self.mode == "n_pole" else coslam
            y = yy * cosphi * cl
        if self.tilt:
            yt = y * self.cg + x * self.sg
            ba = 1.0 / (yt * self.sw * self.h + self.cw)
            x, y = (x * self.cg - y * self.sg) * self.cw * ba, yt * ba
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        if self.tilt:
            yt = 1.0 / (self.pn1 - y * self.sw)
            bm = self.pn1 * x * yt
            bq = self.pn1 * y * self.cw * yt
            x = bm * self.cg + bq * self.sg
            y = bq * self.cg - bm * self.sg
        rh = np.hypot(x, y)
        center = np.abs(rh) <= EPS10
        rh_safe = np.where(center, 1.0, rh)
        sinz = 1.0 - rh * rh * self.pfact
        bad = sinz < 0.0
        sinz = ((self.p - np.sqrt(np.maximum(sinz, 0.0)))
                / (self.pn1 / rh_safe + rh_safe / self.pn1))
        cosz = np.sqrt(np.maximum(1.0 - sinz * sinz, 0.0))
        if self.mode == "obliq":
            phi = np.arcsin(np.clip(
                cosz * self.sinph0 + y * sinz * self.cosph0 / rh_safe,
                -1, 1))
            yy = (cosz - self.sinph0 * np.sin(phi)) * rh
            xx = x * sinz * self.cosph0
        elif self.mode == "equit":
            phi = np.arcsin(np.clip(y * sinz / rh_safe, -1, 1))
            yy = cosz * rh
            xx = x * sinz
        elif self.mode == "n_pole":
            phi = np.arcsin(np.clip(cosz, -1, 1))
            yy = -y
            xx = x
        else:
            phi = -np.arcsin(np.clip(cosz, -1, 1))
            yy = y
            xx = x
        lam = np.arctan2(xx, yy)
        phi = np.where(center, self.P.phi0, phi)
        lam = np.where(center, 0.0, lam)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Tpers(Nsper):
    name = "tpers"
    tilt = True


def register_all(register) -> None:
    for cls in (Cc, Tcc, Tcea, Times, Tobmerc, Comill, Patterson, Lagrng,
                Vandg, Nsper, Tpers):
        register(cls)
    try:
        from proj_ray.ops import projections7 as p7

        p7.register_all(register)
    except ImportError:
        pass
