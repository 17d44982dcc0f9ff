"""Fourth projection wave: oblique Mercators and geodesic-based azimuthal.

Re-derivations of:
  - somerc (Swiss Oblique Mercator): src/projections/somerc.cpp
  - omerc (Hotine Oblique Mercator incl. two-point form):
    src/projections/omerc.cpp
  - aeqd (Azimuthal Equidistant; ellipsoidal case via the Karney
    geodesic, spherical closed forms, Guam variant):
    src/projections/aeqd.cpp
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation
from proj_ray.ops.projections2 import aasin

EPS10 = 1e-10
TOL7 = 1e-7


class Somerc(Operation):
    name = "somerc"

    def setup(self, ps) -> None:
        P = self.P
        self.hlf_e = 0.5 * P.e
        cp = math.cos(P.phi0) ** 2
        self.c = math.sqrt(1 + P.es * cp * cp * P.rone_es)
        sp = math.sin(P.phi0)
        self.sinp0 = sp / self.c
        phip0 = math.asin(max(-1, min(1, self.sinp0)))
        self.cosp0 = math.cos(phip0)
        spe = sp * P.e
        self.K = (math.log(math.tan(S.FORTPI + 0.5 * phip0))
                  - self.c * (math.log(math.tan(S.FORTPI + 0.5 * P.phi0))
                              - self.hlf_e * math.log(
                                  (1.0 + spe) / (1.0 - spe))))
        self.kR = P.k0 * math.sqrt(P.one_es) / (1.0 - spe * spe)

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        sp = P.e * np.sin(phi)
        phip = 2.0 * np.arctan(np.exp(
            self.c * (np.log(np.tan(S.FORTPI + 0.5 * phi))
                      - self.hlf_e * np.log((1.0 + sp) / (1.0 - sp)))
            + self.K)) - S.HALFPI
        lamp = self.c * lam
        cp = np.cos(phip)
        phipp = aasin(self.cosp0 * np.sin(phip)
                      - self.sinp0 * cp * np.cos(lamp))
        lampp = aasin(cp * np.sin(lamp) / np.cos(phipp))
        x = self.kR * lampp
        y = self.kR * np.log(np.tan(S.FORTPI + 0.5 * phipp))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        phipp = 2.0 * (np.arctan(np.exp(y / self.kR)) - S.FORTPI)
        lampp = x / self.kR
        cp = np.cos(phipp)
        phip = aasin(self.cosp0 * np.sin(phipp)
                     + self.sinp0 * cp * np.cos(lampp))
        lamp = aasin(cp * np.sin(lampp) / np.cos(phip))
        con = (self.K - np.log(np.tan(S.FORTPI + 0.5 * phip))) / self.c
        conv = np.zeros(phip.shape, dtype=bool)
        for _ in range(6):
            esp = P.e * np.sin(phip)
            delp = ((con + np.log(np.tan(S.FORTPI + 0.5 * phip))
                     - self.hlf_e * np.log((1.0 + esp) / (1.0 - esp)))
                    * (1.0 - esp * esp) * np.cos(phip) * P.rone_es)
            phip = phip - np.where(conv, 0.0, delp)
            conv = conv | (np.abs(delp) < EPS10)
            if conv.all():
                break
        bad = ~conv
        lam = lamp / self.c
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phip), z, t


class Omerc(Operation):
    name = "omerc"

    def setup(self, ps) -> None:
        P = self.P
        self.no_rot = ps.flag("no_rot")
        alp = ps.has("alpha")
        gam = ps.has("gamma")
        alpha_c = ps.r("alpha")
        gamma = ps.r("gamma")
        no_off = False
        if alp or gam:
            lamc = ps.r("lonc")
            no_off = ps.flag("no_off") or ps.flag("no_uoff")
        else:
            lam1 = ps.r("lon_1")
            phi1 = ps.r("lat_1")
            lam2 = ps.r("lon_2")
            phi2 = ps.r("lat_2")
            if abs(phi1) > S.HALFPI - TOL7 or abs(phi2) > S.HALFPI - TOL7:
                raise ValueError("omerc: |lat_1|,|lat_2| should be < 90")
            if abs(phi1 - phi2) <= TOL7:
                raise ValueError("omerc: lat_1 == lat_2")
            if abs(phi1) <= TOL7:
                raise ValueError("omerc: lat_1 == 0")
            if abs(abs(P.phi0) - S.HALFPI) <= TOL7:
                raise ValueError("omerc: |lat_0| should be < 90")
        com = math.sqrt(P.one_es)

        def tsfn_s(phi_: float) -> float:
            return float(S.tsfn(np.float64(phi_),
                                np.float64(math.sin(phi_)), P.e))

        if abs(P.phi0) > EPS10:
            sinph0 = math.sin(P.phi0)
            cosph0 = math.cos(P.phi0)
            con = 1.0 - P.es * sinph0 * sinph0
            B = cosph0 * cosph0
            B = math.sqrt(1.0 + P.es * B * B / P.one_es)
            A = B * P.k0 * com / con
            D = B * com / (cosph0 * math.sqrt(con))
            F = D * D - 1.0
            if F <= 0:
                F = 0.0
            else:
                F = math.sqrt(F)
                if P.phi0 < 0:
                    F = -F
            F = F + D
            E = F * tsfn_s(P.phi0) ** B
        else:
            B = 1.0 / com
            A = P.k0
            E = D = F = 1.0
        if alp or gam:
            if alp:
                gamma0 = math.asin(max(-1, min(1, math.sin(alpha_c) / D)))
                if not gam:
                    gamma = alpha_c
            else:
                gamma0 = gamma
                s = D * math.sin(gamma0)
                if abs(s) > 1:
                    raise ValueError("omerc: invalid gamma for lat_0")
                alpha_c = math.asin(s)
            if abs(abs(P.phi0) - S.HALFPI) <= TOL7:
                raise ValueError("omerc: |lat_0| should be < 90")
            P.lam0 = lamc - math.asin(max(-1, min(
                1, 0.5 * (F - 1.0 / F) * math.tan(gamma0)))) / B
        else:
            H = tsfn_s(phi1) ** B
            L = tsfn_s(phi2) ** B
            F = E / H
            p = (L - H) / (L + H)
            if p == 0:
                raise ValueError("omerc: invalid eccentricity")
            J = E * E
            J = (J - L * H) / (J + L * H)
            con = lam1 - lam2
            if con < -math.pi:
                lam2 -= 2 * math.pi
            elif con > math.pi:
                lam2 += 2 * math.pi
            P.lam0 = float(S.adjlon(np.float64(
                0.5 * (lam1 + lam2)
                - math.atan(J * math.tan(0.5 * B * (lam1 - lam2)) / p) / B)))
            denom = F - 1.0 / F
            if denom == 0:
                raise ValueError("omerc: invalid eccentricity")
            gamma0 = math.atan(2.0 * math.sin(
                B * float(S.adjlon(np.float64(lam1 - P.lam0)))) / denom)
            gamma = alpha_c = math.asin(max(-1, min(
                1, D * math.sin(gamma0))))
        self.B = B
        self.A = A
        self.E = E
        self.singam = math.sin(gamma0)
        self.cosgam = math.cos(gamma0)
        self.sinrot = math.sin(gamma)
        self.cosrot = math.cos(gamma)
        self.rB = 1.0 / B
        self.ArB = A * self.rB
        self.BrA = 1.0 / self.ArB
        if no_off:
            self.u_0 = 0.0
        else:
            self.u_0 = abs(self.ArB * math.atan(
                math.sqrt(max(D * D - 1.0, 0.0)) / math.cos(alpha_c)))
            if P.phi0 < 0:
                self.u_0 = -self.u_0
        Fh = 0.5 * gamma0
        self.v_pole_n = self.ArB * math.log(math.tan(S.FORTPI - Fh))
        self.v_pole_s = self.ArB * math.log(math.tan(S.FORTPI + Fh))

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        at_pole = np.abs(np.abs(phi) - S.HALFPI) <= EPS10
        with np.errstate(all="ignore"):
            W = self.E / S.tsfn(phi, np.sin(phi), P.e) ** self.B
            one_div_W = 1.0 / W
            Sv = 0.5 * (W - one_div_W)
            Tv = 0.5 * (W + one_div_W)
            V = np.sin(self.B * lam)
            U = (Sv * self.singam - V * self.cosgam) / Tv
            bad = (np.abs(np.abs(U) - 1.0) < EPS10) & ~at_pole
            v = 0.5 * self.ArB * np.log(
                (1.0 - U) / np.where(np.abs(1.0 + U) < 1e-300, 1.0, 1.0 + U))
            temp = np.cos(self.B * lam)
            u = np.where(np.abs(temp) < TOL7, self.A * lam,
                         self.ArB * np.arctan2(
                             Sv * self.cosgam + V * self.singam, temp))
        v = np.where(at_pole,
                     np.where(phi > 0, self.v_pole_n, self.v_pole_s), v)
        u = np.where(at_pole, self.ArB * phi, u)
        if self.no_rot:
            x, y = u, v
        else:
            u = u - self.u_0
            x = v * self.cosrot + u * self.sinrot
            y = u * self.cosrot - v * self.sinrot
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        if self.no_rot:
            v, u = y, x
        else:
            v = x * self.cosrot - y * self.sinrot
            u = y * self.cosrot + x * self.sinrot + self.u_0
        with np.errstate(all="ignore"):
            Qp = np.exp(-self.BrA * v)
            bad = Qp == 0
            Sp = 0.5 * (Qp - 1.0 / Qp)
            Tp = 0.5 * (Qp + 1.0 / Qp)
            Vp = np.sin(self.BrA * u)
            Up = (Vp * self.cosgam + Sp * self.singam) / Tp
            deg = np.abs(np.abs(Up) - 1.0) < EPS10
            ratio = self.E / np.sqrt((1.0 + Up) / (1.0 - Up))
            phi = S.phi2(ratio ** (1.0 / self.B), P.e)
            lam = -self.rB * np.arctan2(
                Sp * self.cosgam - Vp * self.singam,
                np.cos(self.BrA * u))
        phi = np.where(deg, np.where(Up < 0, -S.HALFPI, S.HALFPI), phi)
        lam = np.where(deg, 0.0, lam)
        bad = bad | ~np.isfinite(phi)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Aeqd(Operation):
    """Azimuthal Equidistant. Ellipsoidal obliq/equit via the Karney
    geodesic (aeqd.cpp:115,220), spherical closed forms, polar via
    meridional arc; +guam variant."""

    name = "aeqd"

    def setup(self, ps) -> None:
        P = self.P
        self.guam = ps.flag("guam")
        phi0 = P.phi0
        t = abs(phi0)
        if abs(t - S.HALFPI) < EPS10:
            self.mode = "s_pole" if phi0 < 0 else "n_pole"
            self.sinph0 = -1.0 if phi0 < 0 else 1.0
            self.cosph0 = 0.0
        elif t < EPS10:
            self.mode = "equit"
            self.sinph0 = 0.0
            self.cosph0 = 1.0
        else:
            self.mode = "obliq"
            self.sinph0 = math.sin(phi0)
            self.cosph0 = math.cos(phi0)
        from proj_ray.geodesic import Geodesic

        self.g = Geodesic(1.0, P.ell.f)
        if P.es != 0:
            self.en = S.enfn(P.ell.n)
            if self.guam:
                self.M1 = float(S.mlfn(np.float64(phi0),
                                       np.float64(self.sinph0),
                                       np.float64(self.cosph0), self.en))
            elif self.mode in ("n_pole", "s_pole"):
                self.Mp = float(S.mlfn(
                    np.float64(S.HALFPI if self.mode == "n_pole"
                               else -S.HALFPI),
                    np.float64(1.0 if self.mode == "n_pole" else -1.0),
                    np.float64(0.0), self.en))

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        if P.es == 0:
            return self._s_fwd(lam, phi, z, t)
        if self.guam:
            cosphi = np.cos(phi)
            sinphi = np.sin(phi)
            x = lam * cosphi / np.sqrt(1.0 - P.es * sinphi * sinphi)
            y = (S.mlfn(phi, sinphi, cosphi, self.en) - self.M1
                 + 0.5 * lam * lam * cosphi * sinphi
                 / np.sqrt(1.0 - P.es * sinphi * sinphi))
            return x, y, z, t
        if self.mode in ("n_pole", "s_pole"):
            sg = 1.0 if self.mode == "n_pole" else -1.0
            coslam = np.cos(lam) * (-sg)
            rho = np.abs(self.Mp - S.mlfn(phi, np.sin(phi), np.cos(phi),
                                          self.en))
            x = rho * np.sin(lam)
            y = rho * coslam
            return x, y, z, t
        # oblique/equatorial ellipsoid: geodesic azimuth+distance
        lat0 = np.degrees(np.full_like(phi, P.phi0))
        lon0 = np.zeros_like(lam)
        s12, azi1, _ = self.g.inverse(lat0, lon0, np.degrees(phi),
                                      np.degrees(lam))
        az = np.radians(azi1)
        return s12 * np.sin(az), s12 * np.cos(az), z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        if P.es == 0:
            return self._s_inv(x, y, z, t)
        if self.guam:
            x2 = 0.5 * x * x
            phi = np.array(y, copy=True)
            for _ in range(3):
                tq = np.sqrt(1.0 - P.es * np.sin(phi) ** 2)
                phi = S.inv_mlfn(self.M1 + y - x2 * np.tan(phi) * tq,
                                 self.en)
            lam = x * np.sqrt(1.0 - P.es * np.sin(phi) ** 2) / np.cos(phi)
            return lam, phi, z, t
        if self.mode in ("n_pole", "s_pole"):
            rho = np.hypot(x, y)
            sg = 1.0 if self.mode == "n_pole" else -1.0
            phi = S.inv_mlfn(self.Mp - sg * rho, self.en)
            lam = np.arctan2(x, -sg * y)
            return lam, phi, z, t
        c = np.hypot(x, y)
        azi1 = np.degrees(np.arctan2(x, y))
        lat0 = np.degrees(np.full_like(x, P.phi0))
        lon0 = np.zeros_like(x)
        lat2, lon2, _ = self.g.direct(lat0, lon0, azi1, c)
        return np.radians(lon2), np.radians(lat2), z, t

    # spherical closed forms (aeqd.cpp aeqd_s_forward/aeqd_s_inverse)
    def _s_fwd(self, lam, phi, z, t) -> Coords:
        TOL = 1e-14
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        if self.mode in ("equit", "obliq"):
            if self.mode == "equit":
                cosc = cosphi * coslam
                ybase = sinphi
            else:
                cosc = (self.sinph0 * sinphi
                        + self.cosph0 * cosphi * coslam)
                ybase = (self.cosph0 * sinphi
                         - self.sinph0 * cosphi * coslam)
            degen = np.abs(np.abs(cosc) - 1.0) < TOL
            bad = degen & (cosc < 0)
            center = degen & (cosc >= 0)
            c = np.arccos(np.clip(cosc, -1, 1))
            with np.errstate(all="ignore"):
                k = c / np.sin(c)
            k = np.where(degen, 0.0, k)
            x = k * cosphi * sinlam
            y = k * ybase
            if center.any():
                # reference delegates near-center points to the geodesic
                # path (aeqd.cpp spherical forward -> aeqd_e_forward)
                lat0 = np.degrees(np.full(int(center.sum()), self.P.phi0))
                s12, azi1, _ = self.g.inverse(
                    lat0, np.zeros_like(lat0),
                    np.degrees(phi[center]), np.degrees(lam[center]))
                az = np.radians(azi1)
                x = np.array(x, copy=True)
                y = np.array(y, copy=True)
                x[center] = s12 * np.sin(az)
                y[center] = s12 * np.cos(az)
            return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t
        # polar: N pole negates phi and coslam (aeqd.cpp:~330)
        if self.mode == "n_pole":
            phi_e = -phi
            coslam_e = -coslam
        else:
            phi_e = phi
            coslam_e = coslam
        bad = np.abs(phi_e - S.HALFPI) < EPS10  # antipodal pole
        yy = S.HALFPI + phi_e
        x = yy * sinlam
        y = yy * coslam_e
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _s_inv(self, x, y, z, t) -> Coords:
        c_rh = np.hypot(x, y)
        bad = c_rh - EPS10 > np.pi
        c_rh = np.minimum(c_rh, np.pi)
        center = c_rh < EPS10
        if self.mode in ("equit", "obliq"):
            sinc = np.sin(c_rh)
            cosc = np.cos(c_rh)
            rh_safe = np.where(center, 1.0, c_rh)
            if self.mode == "equit":
                phi = aasin(y * sinc / rh_safe)
                xx = x * sinc
                yy = cosc * c_rh
            else:
                phi = aasin(cosc * self.sinph0
                            + y * sinc * self.cosph0 / rh_safe)
                yy = (cosc - self.sinph0 * np.sin(phi)) * c_rh
                xx = x * sinc * self.cosph0
            lam = np.where(yy == 0.0, 0.0, np.arctan2(xx, yy))
            phi = np.where(center, self.P.phi0, phi)
            lam = np.where(center, 0.0, lam)
        elif self.mode == "n_pole":
            phi = S.HALFPI - c_rh
            lam = np.arctan2(x, -y)
        else:
            phi = c_rh - S.HALFPI
            lam = np.arctan2(x, y)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


def P_HALF(mode: str) -> float:
    return S.HALFPI if mode == "n_pole" else -S.HALFPI


def register_all(register) -> None:
    register(Somerc)
    register(Omerc)
    register(Aeqd)
    try:
        from proj_ray.ops import projections5 as p5

        p5.register_all(register)
    except ImportError:
        pass
