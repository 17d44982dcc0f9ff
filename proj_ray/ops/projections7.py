"""Seventh wave: oblique/conic/special spherical set.

Re-derivations of: ocea (src/projections/ocea.cpp), airy
(src/projections/airy.cpp, fwd only), calcofi
(src/projections/calcofi.cpp), tpeqd (src/projections/tpeqd.cpp),
sconics family euler/murd1/murd2/murd3/pconic/tissot/vitk1
(src/projections/sconics.cpp).
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation
from proj_ray.ops.projections2 import aasin, aacos
from proj_ray.ops.projections5 import _Sph

EPS10 = 1e-10


class Ocea(_Sph):
    name = "ocea"

    def _setup(self, ps) -> None:
        P = self.P
        self.rok = 1.0 / P.k0
        self.rtk = P.k0
        if ps.has("alpha"):
            alpha = np.pi + ps.r("alpha")
            lonz = ps.r("lonc")
            lam_p = math.atan2(-math.cos(alpha),
                               -math.sin(P.phi0) * math.sin(alpha)) + lonz
            phi_p = math.asin(max(-1, min(
                1, math.cos(P.phi0) * math.sin(alpha))))
        else:
            phi_1 = ps.r("lat_1")
            phi_2 = ps.r("lat_2")
            lam_1 = ps.r("lon_1")
            lam_2 = ps.r("lon_2")
            lam_p = math.atan2(
                math.cos(phi_1) * math.sin(phi_2) * math.cos(lam_1)
                - math.sin(phi_1) * math.cos(phi_2) * math.cos(lam_2),
                math.sin(phi_1) * math.cos(phi_2) * math.sin(lam_2)
                - math.cos(phi_1) * math.sin(phi_2) * math.sin(lam_1))
            if lam_1 == -S.HALFPI:
                lam_p = -lam_p
            cosd = math.cos(lam_p - lam_1)
            tph1 = math.tan(phi_1)
            if tph1 == 0.0:
                phi_p = -S.HALFPI if cosd >= 0.0 else S.HALFPI
            else:
                phi_p = math.atan(-cosd / tph1)
        P.lam0 = lam_p + S.HALFPI
        self.cosphi = math.cos(phi_p)
        self.sinphi = math.sin(phi_p)

    def _fwd(self, lam, phi, z, t) -> Coords:
        sy = np.sin(lam)
        tt = np.cos(lam)
        with np.errstate(divide="ignore", invalid="ignore"):
            x = np.arctan((np.tan(phi) * self.cosphi
                           + self.sinphi * sy) / tt)
        x = np.where(tt < 0.0, x + np.pi, x)
        x = x * self.rtk
        y = self.rok * (self.sinphi * np.sin(phi)
                        - self.cosphi * np.cos(phi) * sy)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        yy = y / self.rok
        xx = x / self.rtk
        tt = np.sqrt(np.maximum(1.0 - yy * yy, 0.0))
        s = np.sin(xx)
        phi = np.arcsin(np.clip(yy * self.sinphi
                                + tt * self.cosphi * s, -1, 1))
        lam = np.arctan2(tt * self.sinphi * s - yy * self.cosphi,
                         tt * np.cos(xx))
        return lam, phi, z, t


class Airy(_Sph):
    name = "airy"
    EPS = 1e-10

    def _setup(self, ps) -> None:
        P = self.P
        self.no_cut = ps.flag("no_cut")
        beta = 0.5 * (S.HALFPI - ps.r("lat_b"))
        if abs(beta) < self.EPS:
            self.Cb = -0.5
        else:
            cb = 1.0 / math.tan(beta)
            self.Cb = cb * cb * math.log(math.cos(beta))
        if abs(abs(P.phi0) - S.HALFPI) < self.EPS:
            self.mode = "s_pole" if P.phi0 < 0 else "n_pole"
            self.p_halfpi = -S.HALFPI if P.phi0 < 0 else S.HALFPI
        elif abs(P.phi0) < self.EPS:
            self.mode = "equit"
        else:
            self.mode = "obliq"
        self.sinph0 = math.sin(P.phi0)
        self.cosph0 = math.cos(P.phi0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        EPS = self.EPS
        sinlam = np.sin(lam)
        coslam = np.cos(lam)
        if self.mode in ("equit", "obliq"):
            sinphi = np.sin(phi)
            cosphi = np.cos(phi)
            cosz = cosphi * coslam
            if self.mode == "obliq":
                cosz = self.sinph0 * sinphi + self.cosph0 * cosz
            bad = np.zeros(lam.shape, dtype=bool)
            if not self.no_cut:
                bad = cosz < -EPS
            s = 1.0 - cosz
            tt = 0.5 * (1.0 + cosz)
            bad = bad | (tt == 0)
            tt = np.where(tt == 0, 1.0, tt)
            with np.errstate(divide="ignore", invalid="ignore"):
                Krho = np.where(np.abs(s) > EPS,
                                -np.log(tt) / s - self.Cb / tt,
                                0.5 - self.Cb)
            x = Krho * cosphi * sinlam
            if self.mode == "obliq":
                y = Krho * (self.cosph0 * sinphi
                            - self.sinph0 * cosphi * coslam)
            else:
                y = Krho * sinphi
            return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t
        ph = np.abs(self.p_halfpi - phi)
        bad = np.zeros(lam.shape, dtype=bool)
        if not self.no_cut:
            bad = (ph - EPS) > S.HALFPI
        ph = ph * 0.5
        big = ph > EPS
        tt = np.tan(ph)
        with np.errstate(divide="ignore", invalid="ignore"):
            Krho = -2.0 * (np.log(np.cos(ph)) / tt + tt * self.Cb)
        x = np.where(big, Krho * sinlam, 0.0)
        y = np.where(big, Krho * coslam, 0.0)
        if self.mode == "n_pole":
            y = -y
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t


class Calcofi(Operation):
    name = "calcofi"
    DEG_TO_LINE = 5
    DEG_TO_STATION = 15
    LINE_TO_RAD = 0.0034906585039886592
    STATION_TO_RAD = 0.0011635528346628863
    PT_O_LINE = 80
    PT_O_STATION = 60
    PT_O_LAMBDA = -2.1144663887911301
    PT_O_PHI = 0.59602993955606354
    ROT = 0.52359877559829882

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        P = self.P
        P.lam0 = 0.0
        # a forced to 1 so CLASSIC scaling is a no-op (calcofi.cpp)
        P.ell = Ellipsoid(a=1.0, es=P.ell.es)
        P.x0 = 0.0
        P.y0 = 0.0
        P.over = True

    def _merc_y(self, phi):
        P = self.P
        if P.es != 0.0:
            return -np.log(S.tsfn(phi, np.sin(phi), P.e))
        return np.log(np.tan(S.FORTPI + 0.5 * phi))

    def _inv_merc(self, y):
        P = self.P
        if P.es != 0.0:
            return S.phi2(np.exp(-y), P.e)
        return S.HALFPI - 2.0 * np.arctan(np.exp(-y))

    def _fwd(self, lam, phi, z, t) -> Coords:
        bad = np.abs(np.abs(phi) - S.HALFPI) <= EPS10
        ROT = self.ROT
        ym = self._merc_y(phi)
        oy = float(self._merc_y(np.float64(self.PT_O_PHI)))
        l1 = (ym - oy) * np.tan(ROT)
        l2 = -lam - l1 + self.PT_O_LAMBDA
        ry = l2 * np.cos(ROT) * np.sin(ROT) + ym
        ry = self._inv_merc(ry)
        x = self.PT_O_LINE - np.degrees(
            ry - self.PT_O_PHI) * self.DEG_TO_LINE / np.cos(ROT)
        y = self.PT_O_STATION + np.degrees(
            ry - phi) * self.DEG_TO_STATION / np.sin(ROT)
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        ROT = self.ROT
        ry = self.PT_O_PHI - self.LINE_TO_RAD * (
            x - self.PT_O_LINE) * np.cos(ROT)
        phi = ry - self.STATION_TO_RAD * (
            y - self.PT_O_STATION) * np.sin(ROT)
        oym = float(self._merc_y(np.float64(self.PT_O_PHI)))
        rym = self._merc_y(ry)
        xym = self._merc_y(phi)
        l1 = (xym - oym) * np.tan(ROT)
        l2 = (rym - xym) / (np.cos(ROT) * np.sin(ROT))
        lam = self.PT_O_LAMBDA - (l1 + l2)
        return lam, phi, z, t


class Tpeqd(_Sph):
    name = "tpeqd"

    def _setup(self, ps) -> None:
        P = self.P
        phi_1 = ps.r("lat_1")
        lam_1 = ps.r("lon_1")
        phi_2 = ps.r("lat_2")
        lam_2 = ps.r("lon_2")
        if phi_1 == phi_2 and lam_1 == lam_2:
            raise ValueError("tpeqd: the 2 points should be distinct")
        P.lam0 = float(S.adjlon(np.float64(0.5 * (lam_1 + lam_2))))
        dlam2 = float(S.adjlon(np.float64(lam_2 - lam_1)))
        self.cp1 = math.cos(phi_1)
        self.cp2 = math.cos(phi_2)
        self.sp1 = math.sin(phi_1)
        self.sp2 = math.sin(phi_2)
        self.cs = self.cp1 * self.sp2
        self.sc = self.sp1 * self.cp2
        self.ccs = self.cp1 * self.cp2 * math.sin(dlam2)
        csm = self.cs - self.sc * math.cos(dlam2)
        z02 = math.atan2(
            math.hypot(self.cp2 * math.sin(dlam2), csm),
            self.sp1 * self.sp2 + self.cp1 * self.cp2 * math.cos(dlam2))
        if z02 == 0.0:
            raise ValueError("tpeqd: invalid lat_1/lat_2")
        self.hz0 = 0.5 * z02
        A12 = math.atan2(self.cp2 * math.sin(dlam2), csm)
        pp = math.asin(max(-1, min(1, self.cp1 * math.sin(A12))))
        self.ca = math.cos(pp)
        self.sa = math.sin(pp)
        self.lp = float(S.adjlon(np.float64(
            math.atan2(self.cp1 * math.cos(A12), self.sp1) - self.hz0)))
        self.dlam2 = dlam2 * 0.5
        self.lamc = S.HALFPI - math.atan2(
            math.sin(A12) * self.sp1, math.cos(A12)) - self.dlam2
        self.thz0 = math.tan(self.hz0)
        self.rhshz0 = 0.5 / math.sin(self.hz0)
        self.r2z0 = 0.5 / z02
        self.z02 = z02 * z02

    def _fwd(self, lam, phi, z, t) -> Coords:
        sp = np.sin(phi)
        cp = np.cos(phi)
        dl1 = lam + self.dlam2
        dl2 = lam - self.dlam2
        z1 = aacos(self.sp1 * sp + self.cp1 * cp * np.cos(dl1))
        z2 = aacos(self.sp2 * sp + self.cp2 * cp * np.cos(dl2))
        z1 = z1 * z1
        z2 = z2 * z2
        tt = z1 - z2
        x = self.r2z0 * tt
        tt = self.z02 - tt
        y = self.r2z0 * np.sqrt(np.maximum(
            4.0 * self.z02 * z2 - tt * tt, 0.0))
        neg = (self.ccs * sp
               - cp * (self.cs * np.sin(dl1)
                       - self.sc * np.sin(dl2))) < 0.0
        y = np.where(neg, -y, y)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        cz1 = np.cos(np.hypot(y, x + self.hz0))
        cz2 = np.cos(np.hypot(y, x - self.hz0))
        s = cz1 + cz2
        d = cz1 - cz2
        lam = -np.arctan2(d, s * self.thz0)
        phi = aacos(np.hypot(self.thz0 * s, d) * self.rhshz0)
        phi = np.where(y < 0.0, -phi, phi)
        sp = np.sin(phi)
        cp = np.cos(phi)
        lam = lam - self.lp
        s = np.cos(lam)
        phi2 = aasin(self.sa * sp + self.ca * cp * s)
        lam2 = np.arctan2(cp * np.sin(lam),
                          self.sa * cp * s - self.ca * sp) + self.lamc
        return lam2, phi2, z, t


class _Sconic(_Sph):
    ctype = "euler"
    EPS = 1e-10

    def _setup(self, ps) -> None:
        P = self.P
        if not ps.has("lat_1") or not ps.has("lat_2"):
            raise ValueError(f"{self.name}: lat_1 and lat_2 required")
        p1 = ps.r("lat_1")
        p2 = ps.r("lat_2")
        self.sig = 0.5 * (p2 + p1)
        delta = 0.5 * (p2 - p1)
        if abs(delta) < self.EPS or abs(self.sig) < self.EPS:
            raise ValueError(
                f"{self.name}: |lat_1 - lat_2| and |lat_1 + lat_2| > 0")
        sig = self.sig
        self.c1 = self.c2 = 0.0
        if self.ctype == "tissot":
            self.n = math.sin(sig)
            cs = math.cos(delta)
            self.rho_c = self.n / cs + cs / self.n
            self.rho_0 = math.sqrt(
                (self.rho_c - 2 * math.sin(P.phi0)) / self.n)
        elif self.ctype == "murd1":
            self.rho_c = math.sin(delta) / (delta * math.tan(sig)) + sig
            self.rho_0 = self.rho_c - P.phi0
            self.n = math.sin(sig)
        elif self.ctype == "murd2":
            cs = math.sqrt(math.cos(delta))
            self.rho_c = cs / math.tan(sig)
            self.rho_0 = self.rho_c + math.tan(sig - P.phi0)
            self.n = math.sin(sig) * cs
        elif self.ctype == "murd3":
            self.rho_c = delta / (math.tan(sig) * math.tan(delta)) + sig
            self.rho_0 = self.rho_c - P.phi0
            self.n = (math.sin(sig) * math.sin(delta) * math.tan(delta)
                      / (delta * delta))
        elif self.ctype == "euler":
            self.n = math.sin(sig) * math.sin(delta) / delta
            delta *= 0.5
            self.rho_c = delta / (math.tan(delta) * math.tan(sig)) + sig
            self.rho_0 = self.rho_c - P.phi0
        elif self.ctype == "pconic":
            self.n = math.sin(sig)
            self.c2 = math.cos(delta)
            self.c1 = 1.0 / math.tan(sig)
            dd = P.phi0 - sig
            if abs(dd) - EPS10 >= S.HALFPI:
                raise ValueError(
                    "pconic: |lat_0 - 0.5*(lat_1+lat_2)| should be < 90")
            self.rho_0 = self.c2 * (self.c1 - math.tan(dd))
            self.rho_c = 0.0
        elif self.ctype == "vitk1":
            cs = math.tan(delta)
            self.n = cs * math.sin(sig) / delta
            self.rho_c = delta / (cs * math.tan(sig)) + sig
            self.rho_0 = self.rho_c - P.phi0

    def _fwd(self, lam, phi, z, t) -> Coords:
        if self.ctype == "murd2":
            rho = self.rho_c + np.tan(self.sig - phi)
        elif self.ctype == "pconic":
            rho = self.c2 * (self.c1 - np.tan(phi - self.sig))
        else:
            rho = self.rho_c - phi
        lamn = lam * self.n
        return rho * np.sin(lamn), self.rho_0 - rho * np.cos(lamn), z, t

    def _inv(self, x, y, z, t) -> Coords:
        yy = self.rho_0 - y
        rho = np.hypot(x, yy)
        if self.n < 0.0:
            rho = -rho
            x = -x
            yy = -yy
        lam = np.arctan2(x, yy) / self.n
        if self.ctype == "pconic":
            phi = np.arctan(self.c1 - rho / self.c2) + self.sig
        elif self.ctype == "murd2":
            phi = self.sig - np.arctan(rho - self.rho_c)
        else:
            phi = self.rho_c - rho
        return lam, phi, z, t


class Euler(_Sconic):
    name = "euler"
    ctype = "euler"


class Murd1(_Sconic):
    name = "murd1"
    ctype = "murd1"


class Murd2(_Sconic):
    name = "murd2"
    ctype = "murd2"


class Murd3(_Sconic):
    name = "murd3"
    ctype = "murd3"


class Pconic(_Sconic):
    name = "pconic"
    ctype = "pconic"


class Tissot(_Sconic):
    name = "tissot"
    ctype = "tissot"


class Vitk1(_Sconic):
    name = "vitk1"
    ctype = "vitk1"


def register_all(register) -> None:
    for cls in (Ocea, Airy, Calcofi, Tpeqd, Euler, Murd1, Murd2, Murd3,
                Pconic, Tissot, Vitk1):
        register(cls)
    try:
        from proj_ray.ops import projections8 as p8

        p8.register_all(register)
    except ImportError:
        pass
