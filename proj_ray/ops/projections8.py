"""Eighth wave: geos, krovak family, McBryde-Thomas trio, hatano, oea,
lcca, ccon.

Re-derivations of the corresponding src/projections/*.cpp files.
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation
from proj_ray.ops.projections2 import aasin, aacos
from proj_ray.ops.projections5 import _Sph

EPS10 = 1e-10


class Geos(Operation):
    name = "geos"

    def setup(self, ps) -> None:
        P = self.P
        self.h = ps.f("h")
        sweep = ps.s("sweep")
        if sweep not in ("", "x", "y"):
            raise ValueError("geos: sweep must be x or y")
        self.flip = sweep == "x"
        self.rg1 = self.h / P.a
        if self.rg1 <= 0 or self.rg1 > 1e10:
            raise ValueError("geos: invalid h")
        self.rg = 1.0 + self.rg1
        self.C = self.rg * self.rg - 1.0
        if P.es != 0.0:
            self.rp = math.sqrt(P.one_es)
            self.rp2 = P.one_es
            self.rpi2 = P.rone_es

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        if P.es != 0.0:
            phi = np.arctan(self.rp2 * np.tan(phi))
            r = self.rp / np.hypot(self.rp * np.cos(phi), np.sin(phi))
            Vx = r * np.cos(lam) * np.cos(phi)
            Vy = r * np.sin(lam) * np.cos(phi)
            Vz = r * np.sin(phi)
            bad = ((self.rg - Vx) * Vx - Vy * Vy
                   - Vz * Vz * self.rpi2) < 0.0
        else:
            cphi = np.cos(phi)
            Vx = np.cos(lam) * cphi
            Vy = np.sin(lam) * cphi
            Vz = np.sin(phi)
            bad = np.zeros(lam.shape, dtype=bool)
        tmp = self.rg - Vx
        if self.flip:
            x = self.rg1 * np.arctan(Vy / np.hypot(Vz, tmp))
            y = self.rg1 * np.arctan(Vz / tmp)
        else:
            x = self.rg1 * np.arctan(Vy / tmp)
            y = self.rg1 * np.arctan(Vz / np.hypot(Vy, tmp))
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        Vx = np.full_like(x, -1.0)
        if self.flip:
            Vz = np.tan(y / self.rg1)
            Vy = np.tan(x / self.rg1) * np.hypot(1.0, Vz)
        else:
            Vy = np.tan(x / self.rg1)
            Vz = np.tan(y / self.rg1) * np.hypot(1.0, Vy)
        if P.es != 0.0:
            a = Vz / self.rp
            a = Vy * Vy + a * a + Vx * Vx
        else:
            a = Vy * Vy + Vz * Vz + Vx * Vx
        b = 2 * self.rg * Vx
        det = b * b - 4 * a * self.C
        bad = det < 0.0
        k = (-b - np.sqrt(np.maximum(det, 0.0))) / (2.0 * a)
        Vx = self.rg + k * Vx
        Vy = Vy * k
        Vz = Vz * k
        lam = np.arctan2(Vy, Vx)
        phi = np.arctan(Vz * np.cos(lam) / Vx)
        if P.es != 0.0:
            phi = np.arctan(self.rpi2 * np.tan(phi))
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


_MK = dict(X0=1089000.0, Y0=654000.0,
           C=(2.946529277E-02, 2.515965696E-02, 1.193845912E-07,
              -4.668270147E-07, 9.233980362E-12, 1.523735715E-12,
              1.696780024E-18, 4.408314235E-18, -8.331083518E-24,
              -3.689471323E-24))


def _mod_krovak_dxdy(Xr, Yr):
    C1, C2, C3, C4, C5, C6, C7, C8, C9, C10 = _MK["C"]
    Xr2 = Xr * Xr
    Yr2 = Yr * Yr
    Xr4 = Xr2 * Xr2
    Yr4 = Yr2 * Yr2
    dX = (C1 + C3 * Xr - C4 * Yr - 2 * C6 * Xr * Yr + C5 * (Xr2 - Yr2)
          + C7 * Xr * (Xr2 - 3 * Yr2) - C8 * Yr * (3 * Xr2 - Yr2)
          + 4 * C9 * Xr * Yr * (Xr2 - Yr2)
          + C10 * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    dY = (C2 + C3 * Yr + C4 * Xr + 2 * C5 * Xr * Yr + C6 * (Xr2 - Yr2)
          + C8 * Xr * (Xr2 - 3 * Yr2) + C7 * Yr * (3 * Xr2 - Yr2)
          - 4 * C10 * Xr * Yr * (Xr2 - Yr2)
          + C9 * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    return dX, dY


class Krovak(Operation):
    name = "krovak"
    modified = False
    UQ = 1.04216856380474
    S0 = 1.37008346281555

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        P = self.P
        # Krovak is defined on Bessel regardless of user input.  The
        # reference (src/projections/krovak.cpp:286-289) overwrites only
        # a/es/e AFTER pj_calc_ellipsoid_params has run, so derived fields
        # like ra (used by the inverse prepare step, src/inv.cpp:92) keep
        # the USER ellipsoid's value.  Mirror that quirk: force Bessel but
        # retain the original 1/a for the inverse descaling.
        orig_ra = P.ell.ra
        P.ell = Ellipsoid(a=6377397.155, es=0.006674372230614)
        P.ell.ra = orig_ra
        if not ps.has("lat_0"):
            P.phi0 = 0.863937979737193
        if not ps.has("lon_0"):
            P.lam0 = 0.7417649320975901 - 0.308341501185665
        if not ps.has("k") and not ps.has("k_0"):
            P.k0 = 0.9999
        self.easting_northing = not ps.flag("czech")
        es, e = P.es, P.e
        phi0 = P.phi0
        self.alpha = math.sqrt(
            1.0 + (es * math.cos(phi0) ** 4) / (1.0 - es))
        u0 = math.asin(math.sin(phi0) / self.alpha)
        g = ((1.0 + e * math.sin(phi0))
             / (1.0 - e * math.sin(phi0))) ** (self.alpha * e / 2.0)
        thp = math.tan(phi0 / 2.0 + S.FORTPI)
        if thp == 0.0:
            raise ValueError("krovak: invalid lat_0")
        self.k = math.tan(u0 / 2.0 + S.FORTPI) / thp ** self.alpha * g
        n0 = math.sqrt(1.0 - es) / (1.0 - es * math.sin(phi0) ** 2)
        self.n = math.sin(self.S0)
        self.rho0 = P.k0 * n0 / math.tan(self.S0)
        self.ad = S.HALFPI - self.UQ

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        e = P.e
        gfi = ((1.0 + e * np.sin(phi))
               / (1.0 - e * np.sin(phi))) ** (self.alpha * e / 2.0)
        u = 2.0 * (np.arctan(
            self.k * np.tan(phi / 2.0 + S.FORTPI) ** self.alpha / gfi)
            - S.FORTPI)
        deltav = -lam * self.alpha
        s = np.arcsin(np.clip(
            np.cos(self.ad) * np.sin(u)
            + np.sin(self.ad) * np.cos(u) * np.cos(deltav), -1, 1))
        cos_s = np.cos(s)
        center = cos_s < 1e-12
        d = np.arcsin(np.clip(np.cos(u) * np.sin(deltav)
                              / np.where(center, 1.0, cos_s), -1, 1))
        eps = self.n * d
        rho = (self.rho0 * math.tan(self.S0 / 2.0 + S.FORTPI) ** self.n
               / np.tan(s / 2.0 + S.FORTPI) ** self.n)
        x = rho * np.cos(eps)
        y = rho * np.sin(eps)
        if self.modified:
            Xr = x * P.a - _MK["X0"]
            Yr = y * P.a - _MK["Y0"]
            dX, dY = _mod_krovak_dxdy(Xr, Yr)
            x = x - dX / P.a
            y = y - dY / P.a
        x, y = y, x
        if self.easting_northing:
            x = -x - 2 * P.x0 / P.a
            y = -y - 2 * P.y0 / P.a
        x = np.where(center, 0.0, x)
        y = np.where(center, 0.0, y)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        e = P.e
        if self.easting_northing:
            y2 = -y - 2 * P.x0 / P.a
            x2 = -x - 2 * P.y0 / P.a
        else:
            x2, y2 = x, y
        x, y = y2, x2
        if self.modified:
            Xr = x * P.a - _MK["X0"]
            Yr = y * P.a - _MK["Y0"]
            dX, dY = _mod_krovak_dxdy(Xr, Yr)
            x = x + dX / P.a
            y = y + dY / P.a
        rho = np.sqrt(x * x + y * y)
        eps = np.arctan2(y, x)
        d = eps / math.sin(self.S0)
        s = np.where(
            rho == 0.0, S.HALFPI,
            2.0 * (np.arctan(
                (self.rho0 / np.where(rho == 0, 1, rho)) ** (1.0 / self.n)
                * math.tan(self.S0 / 2.0 + S.FORTPI)) - S.FORTPI))
        u = np.arcsin(np.clip(
            np.cos(self.ad) * np.sin(s)
            - np.sin(self.ad) * np.cos(s) * np.cos(d), -1, 1))
        deltav = np.arcsin(np.clip(
            np.cos(s) * np.sin(d) / np.cos(u), -1, 1))
        lam = -deltav / self.alpha
        fi1 = np.array(u, copy=True)
        phi = np.array(u, copy=True)
        conv = np.zeros(u.shape, dtype=bool)
        for _ in range(100):
            phi = 2.0 * (np.arctan(
                self.k ** (-1.0 / self.alpha)
                * np.tan(u / 2.0 + S.FORTPI) ** (1.0 / self.alpha)
                * ((1.0 + e * np.sin(fi1))
                   / (1.0 - e * np.sin(fi1))) ** (e / 2.0)) - S.FORTPI)
            conv = conv | (np.abs(fi1 - phi) < 1e-15)
            if conv.all():
                break
            fi1 = np.where(conv, fi1, phi)
        bad = ~conv
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class ModKrovak(Krovak):
    name = "mod_krovak"
    modified = True


class Mbtfpp(_Sph):
    name = "mbtfpp"
    CSy = 0.95257934441568037152
    FXC = 0.92582009977255146156
    FYC = 3.40168025708304504493

    def _fwd(self, lam, phi, z, t) -> Coords:
        ph = np.arcsin(np.clip(self.CSy * np.sin(phi), -1, 1))
        x = self.FXC * lam * (2.0 * np.cos(2.0 / 3.0 * ph) - 1.0)
        y = self.FYC * np.sin(ph / 3.0)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        ph = y / self.FYC
        bad = np.abs(ph) > 1.0000001
        ph = np.where(np.abs(ph) >= 1.0,
                      np.where(ph < 0, -S.HALFPI, S.HALFPI),
                      np.arcsin(np.clip(ph, -1, 1)))
        ph = ph * 3.0
        lam = x / (self.FXC * (2.0 * np.cos(2.0 / 3.0 * ph) - 1.0))
        ph = np.sin(ph) / self.CSy
        bad = bad | (np.abs(ph) > 1.0000001)
        phi = np.where(np.abs(ph) >= 1.0,
                       np.where(ph < 0, -S.HALFPI, S.HALFPI),
                       np.arcsin(np.clip(ph, -1, 1)))
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Mbtfpq(_Sph):
    name = "mbtfpq"
    C = 1.70710678118654752440
    RC = 0.58578643762690495119
    FYC = 1.87475828462269495505
    RYC = 0.53340209679417701685
    FXC = 0.31245971410378249250
    RXC = 3.20041258076506210122

    def _fwd(self, lam, phi, z, t) -> Coords:
        c = self.C * np.sin(phi)
        ph = np.array(phi, copy=True)
        conv = np.zeros(ph.shape, dtype=bool)
        for _ in range(20):
            th1 = ((np.sin(0.5 * ph) + np.sin(ph) - c)
                   / (0.5 * np.cos(0.5 * ph) + np.cos(ph)))
            ph = ph - np.where(conv, 0.0, th1)
            conv = conv | (np.abs(th1) < 1e-7)
        x = self.FXC * lam * (1.0 + 2.0 * np.cos(ph) / np.cos(0.5 * ph))
        y = self.FYC * np.sin(0.5 * ph)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        ph = self.RYC * y
        bad = np.abs(ph) > 1.000001
        tt = np.where(np.abs(ph) > 1.0, np.where(ph < 0, -1.0, 1.0), ph)
        phw = np.where(np.abs(ph) > 1.0,
                       np.where(ph < 0, -np.pi, np.pi),
                       2.0 * np.arcsin(np.clip(ph, -1, 1)))
        lam = self.RXC * x / (1.0 + 2.0 * np.cos(phw) / np.cos(0.5 * phw))
        ph2 = self.RC * (tt + np.sin(phw))
        bad = bad | (np.abs(ph2) > 1.000001)
        phi = np.where(np.abs(ph2) > 1.0,
                       np.where(ph2 < 0, -S.HALFPI, S.HALFPI),
                       np.arcsin(np.clip(ph2, -1, 1)))
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class MbtFps(_Sph):
    name = "mbt_fps"
    C1 = 0.45503
    C2 = 1.36509
    C3 = 1.41546
    C_x = 0.22248
    C_y = 1.44492

    def _fwd(self, lam, phi, z, t) -> Coords:
        k = self.C3 * np.sin(phi)
        ph = np.array(phi, copy=True)
        conv = np.zeros(ph.shape, dtype=bool)
        for _ in range(10):
            tt = ph / self.C2
            # C1_2 = C1/C2 = 1/3 (mbt_fps.cpp)
            V = ((self.C1 * np.sin(tt) + np.sin(ph) - k)
                 / ((1.0 / 3.0) * np.cos(tt) + np.cos(ph)))
            ph = ph - np.where(conv, 0.0, V)
            conv = conv | (np.abs(V) < 1e-7)
        tt = ph / self.C2
        x = self.C_x * lam * (1.0 + 3.0 * np.cos(ph) / np.cos(tt))
        y = self.C_y * np.sin(tt)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        tt = aasin(y / self.C_y)
        ph = self.C2 * tt
        lam = x / (self.C_x * (1.0 + 3.0 * np.cos(ph) / np.cos(tt)))
        phi = aasin((self.C1 * np.sin(tt) + np.sin(ph)) / self.C3)
        return lam, phi, z, t


class Hatano(_Sph):
    name = "hatano"
    CN = 2.67595
    CS = 2.43763
    RCN = 0.37369906014686373063
    RCS = 0.41023453108141924738
    FYCN = 1.75859
    FYCS = 1.93052
    RYCN = 0.56863737426006061674
    RYCS = 0.51799515156538134803
    FXC = 0.85
    RXC = 1.17647058823529411764

    def _fwd(self, lam, phi, z, t) -> Coords:
        c = np.sin(phi) * np.where(phi < 0.0, self.CS, self.CN)
        ph = np.array(phi, copy=True)
        conv = np.zeros(ph.shape, dtype=bool)
        for _ in range(20):
            th1 = (ph + np.sin(ph) - c) / (1.0 + np.cos(ph))
            ph = ph - np.where(conv, 0.0, th1)
            conv = conv | (np.abs(th1) < 1e-7)
        ph = ph * 0.5
        x = self.FXC * lam * np.cos(ph)
        y = np.sin(ph) * np.where(ph < 0.0, self.FYCS, self.FYCN)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        th = y * np.where(y < 0.0, self.RYCS, self.RYCN)
        bad = np.abs(th) > 1.000001
        th = np.where(np.abs(th) > 1.0,
                      np.where(th > 0, S.HALFPI, -S.HALFPI),
                      np.arcsin(np.clip(th, -1, 1)))
        lam = self.RXC * x / np.cos(th)
        th = th + th
        phi = (th + np.sin(th)) * np.where(y < 0.0, self.RCS, self.RCN)
        bad = bad | (np.abs(phi) > 1.000001)
        phi = np.where(np.abs(phi) > 1.0,
                       np.where(phi > 0, S.HALFPI, -S.HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Oea(_Sph):
    name = "oea"

    def _setup(self, ps) -> None:
        P = self.P
        self.n = ps.f("n")
        self.m = ps.f("m")
        if self.n <= 0 or self.m <= 0:
            raise ValueError("oea: n and m must be > 0")
        self.theta = ps.r("theta")
        self.sp0 = math.sin(P.phi0)
        self.cp0 = math.cos(P.phi0)
        self.rn = 1.0 / self.n
        self.rm = 1.0 / self.m
        self.two_r_n = 2.0 * self.rn
        self.two_r_m = 2.0 * self.rm
        self.hm = 0.5 * self.m
        self.hn = 0.5 * self.n

    def _fwd(self, lam, phi, z, t) -> Coords:
        cp = np.cos(phi)
        sp = np.sin(phi)
        cl = np.cos(lam)
        Az = np.arctan2(cp * np.sin(lam),
                        self.cp0 * sp - self.sp0 * cp * cl) + self.theta
        shz = np.sin(0.5 * aacos(self.sp0 * sp + self.cp0 * cp * cl))
        M = aasin(shz * np.sin(Az))
        N = aasin(shz * np.cos(Az) * np.cos(M) / np.cos(M * self.two_r_m))
        y = self.n * np.sin(N * self.two_r_n)
        x = self.m * np.sin(M * self.two_r_m) * np.cos(N) \
            / np.cos(N * self.two_r_n)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        N = self.hn * aasin(y * self.rn)
        M = self.hm * aasin(x * self.rm * np.cos(N * self.two_r_n)
                            / np.cos(N))
        xp = 2.0 * np.sin(M)
        yp = 2.0 * np.sin(N) * np.cos(M * self.two_r_m) / np.cos(M)
        Az = np.arctan2(xp, yp) - self.theta
        cAz = np.cos(Az)
        zz = 2.0 * aasin(0.5 * np.hypot(xp, yp))
        sz = np.sin(zz)
        cz = np.cos(zz)
        phi = aasin(self.sp0 * cz + self.cp0 * sz * cAz)
        lam = np.arctan2(sz * np.sin(Az),
                         self.cp0 * cz - self.sp0 * sz * cAz)
        return lam, phi, z, t


class Lcca(Operation):
    name = "lcca"

    def setup(self, ps) -> None:
        P = self.P
        self.en = S.enfn(P.ell.n)
        if P.phi0 == 0.0:
            raise ValueError("lcca: lat_0 must be non-zero")
        self.l = math.sin(P.phi0)
        self.M0 = float(S.mlfn(np.float64(P.phi0), np.float64(self.l),
                               np.float64(math.cos(P.phi0)), self.en))
        s2p0 = self.l * self.l
        R0 = 1.0 / (1.0 - P.es * s2p0)
        N0 = math.sqrt(R0)
        R0 = R0 * P.one_es * N0
        self.r0 = N0 / math.tan(P.phi0)
        self.C = 1.0 / (6.0 * R0 * N0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        Sv = S.mlfn(phi, np.sin(phi), np.cos(phi), self.en) - self.M0
        dr = Sv * (1.0 + Sv * Sv * self.C)
        r = self.r0 - dr
        ll = lam * self.l
        return P.k0 * r * np.sin(ll), \
            P.k0 * (self.r0 - r * np.cos(ll)), z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        x = x / P.k0
        y = y / P.k0
        theta = np.arctan2(x, self.r0 - y)
        dr = y - x * np.tan(0.5 * theta)
        lam = theta / self.l
        Sv = np.array(dr, copy=True)
        conv = np.zeros(Sv.shape, dtype=bool)
        for _ in range(10):
            dif = ((Sv * (1.0 + Sv * Sv * self.C) - dr)
                   / (1.0 + 3.0 * Sv * Sv * self.C))
            Sv = Sv - np.where(conv, 0.0, dif)
            conv = conv | (np.abs(dif) < 1e-12)
            if conv.all():
                break
        bad = ~conv
        phi = S.inv_mlfn(Sv + self.M0, self.en)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Ccon(_Sph):
    name = "ccon"

    def _setup(self, ps) -> None:
        self.phi1 = ps.r("lat_1")
        if abs(self.phi1) < EPS10:
            raise ValueError("ccon: lat_1 must be non-zero")
        self.sinphi1 = math.sin(self.phi1)
        self.ctgphi1 = math.cos(self.phi1) / self.sinphi1

    def _fwd(self, lam, phi, z, t) -> Coords:
        r = self.ctgphi1 - np.tan(phi - self.phi1)
        x = r * np.sin(lam * self.sinphi1)
        y = self.ctgphi1 - r * np.cos(lam * self.sinphi1)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        yy = self.ctgphi1 - y
        phi = self.phi1 - np.arctan(np.hypot(x, yy) - self.ctgphi1)
        lam = np.arctan2(x, yy) / self.sinphi1
        return lam, phi, z, t


def register_all(register) -> None:
    for cls in (Geos, Krovak, ModKrovak, Mbtfpp, Mbtfpq, MbtFps, Hatano,
                Oea, Lcca, Ccon):
        register(cls)
    try:
        from proj_ray.ops import projections9 as p9

        p9.register_all(register)
    except ImportError:
        pass
