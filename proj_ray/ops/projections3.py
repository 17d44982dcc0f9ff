"""Third projection wave, vectorized.

Re-derivations of: gnom (sphere; src/projections/gnom.cpp), ortho
(src/projections/ortho.cpp), cass (src/projections/cass.cpp), bonne
(src/projections/bonne.cpp), eqdc (src/projections/eqdc.cpp),
moll/wag4/wag5 (src/projections/moll.cpp), sinu/gn_sinu/eck6/mbtfps
(src/projections/gn_sinu.cpp), robin (src/projections/robin.cpp, tabular
coefficients), mill (src/projections/mill.cpp), gall
(src/projections/gall.cpp), sterea with the Gauss sphere mapping
(src/projections/sterea.cpp + src/gauss.cpp).
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation
from proj_ray.ops.projections2 import aasin, generic_inverse_2d

EPS10 = 1e-10


def _mode_of(phi0: float) -> str:
    t = abs(phi0)
    if abs(t - S.HALFPI) < EPS10:
        return "s_pole" if phi0 < 0 else "n_pole"
    return "obliq" if t > EPS10 else "equit"


# -------------------------------------------------------------- gnom ------


class Gnom(Operation):
    name = "gnom"

    def setup(self, ps) -> None:
        self.ell_mode = self.P.es != 0.0
        if self.ell_mode:
            # ellipsoidal gnomonic via the exact geodesic (Karney 2013
            # sec. 8; mirror of gnom.cpp:120-183): rho = m12/M12, with a
            # Newton iteration on the geodesic line for the inverse.
            # The reference then sets P->es = 0 (gnom.cpp:211) which
            # only affects unrelated prepare steps.
            from proj_ray.geodesic import Geodesic

            self.geod = Geodesic(1.0, self.P.ell.f)
            self.lat0_deg = math.degrees(self.P.phi0)
            return
        self.mode = _mode_of(self.P.phi0)
        self.sinph0 = math.sin(self.P.phi0)
        self.cosph0 = math.cos(self.P.phi0)

    def _fwd_ell(self, lam, phi, z, t) -> Coords:
        lat0 = np.full(lam.shape, self.lat0_deg)
        lon0 = np.zeros(lam.shape)
        _, azi0, _, m, M, _ = self.geod.inverse(
            lat0, lon0, np.degrees(phi), np.degrees(lam), extra=True)
        bad = M <= 0
        with np.errstate(divide="ignore", invalid="ignore"):
            rho = m / M
        azi0r = np.radians(azi0)
        x = np.where(bad, np.inf, rho * np.sin(azi0r))
        y = np.where(bad, np.inf, rho * np.cos(azi0r))
        return x, y, z, t

    def _inv_ell(self, x, y, z, t) -> Coords:
        eps_ = 0.01 * math.sqrt(2.220446049250313e-16)
        azi0 = np.degrees(np.arctan2(x, y))
        rho = np.hypot(x, y)
        s = np.arctan(rho)
        little = rho <= 1.0
        rho = np.where(little, rho, 1.0 / np.where(rho == 0, 1.0, rho))
        lat0 = np.full(x.shape, self.lat0_deg)
        lon0 = np.zeros(x.shape)
        lat1 = np.zeros(x.shape)
        lon1 = np.zeros(x.shape)
        trip = np.zeros(x.shape, dtype=bool)
        active = np.isfinite(s)
        for _ in range(10):
            la, lo, _, m, M, _ = self.geod.direct(lat0, lon0, azi0, s,
                                                  extra=True)
            lat1 = np.where(active, la, lat1)
            lon1 = np.where(active, lo, lon1)
            step_active = active & ~trip
            if not step_active.any():
                break
            ds = np.where(little, (m - rho * M) * M, (rho * m - M) * m)
            s = np.where(step_active, s - ds, s)
            # reversed test to let NaNs escape (gnom.cpp:172)
            trip = trip | (step_active & ~(np.abs(ds) >= eps_))
            active = step_active | trip
        lam = np.where(trip, np.radians(lon1), np.inf)
        phi = np.where(trip, np.radians(lat1), np.inf)
        return lam, phi, z, t

    def _fwd(self, lam, phi, z, t) -> Coords:
        if self.ell_mode:
            return self._fwd_ell(lam, phi, z, t)
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        if self.mode == "equit":
            y = cosphi * coslam
        elif self.mode == "obliq":
            y = self.sinph0 * sinphi + self.cosph0 * cosphi * coslam
        elif self.mode == "s_pole":
            y = -sinphi
        else:
            y = sinphi
        bad = y <= EPS10
        y = 1.0 / np.where(bad, 1.0, y)
        x = y * cosphi * np.sin(lam)
        if self.mode == "equit":
            y = y * sinphi
        elif self.mode == "obliq":
            y = y * (self.cosph0 * sinphi - self.sinph0 * cosphi * coslam)
        else:
            cl = -coslam if self.mode == "n_pole" else coslam
            y = y * cosphi * cl
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        if self.ell_mode:
            return self._inv_ell(x, y, z, t)
        rh = np.hypot(x, y)
        phi = np.arctan(rh)
        sinz = np.sin(phi)
        cosz = np.sqrt(1.0 - sinz * sinz)
        center = np.abs(rh) <= EPS10
        rh_safe = np.where(center, 1.0, rh)
        if self.mode == "obliq":
            p = cosz * self.sinph0 + y * sinz * self.cosph0 / rh_safe
            phi_o = np.where(np.abs(p) >= 1.0,
                             np.where(p > 0, S.HALFPI, -S.HALFPI),
                             np.arcsin(np.clip(p, -1, 1)))
            yy = (cosz - self.sinph0 * np.sin(phi_o)) * rh
            xx = x * sinz * self.cosph0
        elif self.mode == "equit":
            p = y * sinz / rh_safe
            phi_o = np.where(np.abs(p) >= 1.0,
                             np.where(p > 0, S.HALFPI, -S.HALFPI),
                             np.arcsin(np.clip(p, -1, 1)))
            yy = cosz * rh
            xx = x * sinz
        elif self.mode == "s_pole":
            phi_o = phi - S.HALFPI
            xx, yy = x, y
        else:
            phi_o = S.HALFPI - phi
            xx, yy = x, -y
        lam = np.arctan2(xx, yy)
        phi_o = np.where(center, self.P.phi0, phi_o)
        lam = np.where(center, 0.0, lam)
        return lam, phi_o, z, t


# ------------------------------------------------------------- ortho ------


class Ortho(Operation):
    name = "ortho"

    def setup(self, ps) -> None:
        P = self.P
        self.mode = _mode_of(P.phi0)
        self.sinph0 = math.sin(P.phi0)
        self.cosph0 = math.cos(P.phi0)
        alpha = ps.r("alpha")
        self.sinalpha = math.sin(alpha)
        self.cosalpha = math.cos(alpha)
        if P.es != 0:
            self.nu0 = 1.0 / math.sqrt(1.0 - P.es * self.sinph0 ** 2)
            self.y_shift = P.es * self.nu0 * self.sinph0 * self.cosph0
            self.y_scale = 1.0 / math.sqrt(
                1.0 - P.es * self.cosph0 * self.cosph0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        cosphi = np.cos(phi)
        coslam = np.cos(lam)
        sinphi = np.sin(phi)
        if P.es == 0:
            if self.mode == "equit":
                bad = cosphi * coslam < -EPS10
                yp = sinphi
            elif self.mode == "obliq":
                bad = (self.sinph0 * sinphi
                       + self.cosph0 * cosphi * coslam) < -EPS10
                yp = self.cosph0 * sinphi - self.sinph0 * cosphi * coslam
            else:
                cl = -coslam if self.mode == "n_pole" else coslam
                bad = (np.abs(phi - P.phi0) - EPS10) > S.HALFPI
                yp = cosphi * cl
            xp = cosphi * np.sin(lam)
        else:
            bad = (self.sinph0 * sinphi
                   + self.cosph0 * cosphi * coslam) < -EPS10
            nu = 1.0 / np.sqrt(1.0 - P.es * sinphi * sinphi)
            xp = nu * cosphi * np.sin(lam)
            yp = (nu * (sinphi * self.cosph0
                        - cosphi * self.sinph0 * coslam)
                  + P.es * (self.nu0 * self.sinph0
                            - nu * sinphi) * self.cosph0)
        x = (xp * self.cosalpha - yp * self.sinalpha) * P.k0
        y = (xp * self.sinalpha + yp * self.cosalpha) * P.k0
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        xr = (self.cosalpha * x + self.sinalpha * y) / P.k0
        yr = (-self.sinalpha * x + self.cosalpha * y) / P.k0
        if P.es == 0:
            rh = np.hypot(xr, yr)
            sinc = rh
            bad = (sinc - 1.0) > EPS10
            sinc = np.minimum(sinc, 1.0)
            cosc = np.sqrt(1.0 - sinc * sinc)
            center = np.abs(rh) <= EPS10
            rh_safe = np.where(center, 1.0, rh)
            if self.mode == "n_pole":
                phi = np.arccos(np.clip(sinc, -1, 1))
                lam = np.arctan2(xr, -yr)
            elif self.mode == "s_pole":
                phi = -np.arccos(np.clip(sinc, -1, 1))
                lam = np.arctan2(xr, yr)
            elif self.mode == "equit":
                p = yr * sinc / rh_safe
                phi = np.where(np.abs(p) >= 1.0,
                               np.where(p < 0, -S.HALFPI, S.HALFPI),
                               np.arcsin(np.clip(p, -1, 1)))
                yy = cosc * rh
                xx = xr * sinc
                lam = np.where(
                    (yy == 0.0),
                    np.where(xx == 0.0, 0.0,
                             np.where(xx < 0, -S.HALFPI, S.HALFPI)),
                    np.arctan2(xx, yy))
            else:
                p = cosc * self.sinph0 + yr * sinc * self.cosph0 / rh_safe
                yy = (cosc - self.sinph0 * p) * rh
                xx = xr * sinc * self.cosph0
                phi = np.where(np.abs(p) >= 1.0,
                               np.where(p < 0, -S.HALFPI, S.HALFPI),
                               np.arcsin(np.clip(p, -1, 1)))
                lam = np.where(
                    (yy == 0.0),
                    np.where(xx == 0.0, 0.0,
                             np.where(xx < 0, -S.HALFPI, S.HALFPI)),
                    np.arctan2(xx, yy))
            phi = np.where(center, P.phi0, phi)
            lam = np.where(center, 0.0, lam)
            return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t
        # ellipsoidal closed forms / analytic-jacobian Newton
        # (ortho.cpp:206-295)
        if self.mode in ("n_pole", "s_pole"):
            rh2 = xr * xr + yr * yr
            bad = (rh2 - 1.0) > EPS10
            on_limb = rh2 >= 1.0 - 1e-15
            with np.errstate(invalid="ignore"):
                phi = np.where(
                    on_limb, 0.0,
                    np.arccos(np.sqrt(np.clip(
                        rh2 * P.one_es / (1 - P.es * rh2), 0, 1)))
                    * (1 if self.mode == "n_pole" else -1))
            lam = np.arctan2(xr, yr * (-1 if self.mode == "n_pole" else 1))
            return (np.where(bad, np.inf, lam), np.where(bad, np.inf, phi),
                    z, t)
        if self.mode == "equit":
            bad = xr * xr + (yr * (P.a / P.ell.b)) ** 2 > 1 + 1e-11
            with np.errstate(divide="ignore", invalid="ignore"):
                sinphi2 = np.where(
                    yr == 0, 0.0, 1.0 / (((1 - P.es) / yr) ** 2 + P.es))
            at_pole = sinphi2 > 1 - 1e-11
            phi = np.arcsin(np.sqrt(np.clip(sinphi2, 0, 1))) \
                * np.where(yr > 0, 1.0, -1.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                sinlam = xr * np.sqrt((1 - P.es * sinphi2)
                                      / np.maximum(1 - sinphi2, 1e-300))
            lam = np.where(np.abs(sinlam) - 1 > -1e-15,
                           S.HALFPI * np.where(xr > 0, 1.0, -1.0),
                           np.arcsin(np.clip(sinlam, -1, 1)))
            phi = np.where(at_pole,
                           S.HALFPI * np.where(yr > 0, 1.0, -1.0), phi)
            lam = np.where(at_pole, 0.0, lam)
            return (np.where(bad, np.inf, lam), np.where(bad, np.inf, phi),
                    z, t)
        # oblique
        yrc = (yr - self.y_shift) / self.y_scale
        bad = xr * xr + yrc * yrc > 1 + 1e-11
        # spherical inverse of recentered coords as the start point
        rh = np.hypot(xr, yrc)
        sinc = np.minimum(rh, 1.0)
        cosc = np.sqrt(1.0 - sinc * sinc)
        rh_safe = np.where(rh == 0, 1.0, rh)
        p = cosc * self.sinph0 + yrc * sinc * self.cosph0 / rh_safe
        phi = np.arcsin(np.clip(p, -1, 1))
        lam = np.arctan2(xr * sinc * self.cosph0,
                         (cosc - self.sinph0 * p) * rh_safe)
        conv = np.zeros(phi.shape, dtype=bool)
        for _ in range(20):
            cosphi = np.cos(phi)
            sinphi = np.sin(phi)
            coslam = np.cos(lam)
            sinlam = np.sin(lam)
            omes = 1.0 - P.es * sinphi * sinphi
            nu = 1.0 / np.sqrt(omes)
            xn = nu * cosphi * sinlam
            yn = (nu * (sinphi * self.cosph0
                        - cosphi * self.sinph0 * coslam)
                  + P.es * (self.nu0 * self.sinph0
                            - nu * sinphi) * self.cosph0)
            rho = (1.0 - P.es) * nu / omes
            J11 = -rho * sinphi * sinlam
            J12 = nu * cosphi * coslam
            J21 = rho * (cosphi * self.cosph0
                         + sinphi * self.sinph0 * coslam)
            J22 = nu * self.sinph0 * cosphi * sinlam
            D = J11 * J22 - J12 * J21
            dx = xr - xn
            dy = yr - yn
            with np.errstate(divide="ignore", invalid="ignore"):
                dphi = (J22 * dx - J12 * dy) / D
                dlam = (-J21 * dx + J11 * dy) / D
            dphi = np.where(conv | ~np.isfinite(dphi), 0.0, dphi)
            dlam = np.where(conv | ~np.isfinite(dlam), 0.0, dlam)
            phi = phi + dphi
            over = phi > S.HALFPI
            under = phi < -S.HALFPI
            phi = np.where(over, np.pi - phi, phi)
            phi = np.where(under, -np.pi - phi, phi)
            lam = np.where(over | under, S.adjlon(lam + np.pi), lam)
            lam = lam + dlam
            conv = conv | ((np.abs(dphi) < 1e-12) & (np.abs(dlam) < 1e-12))
            if conv.all():
                break
        bad = bad | ~conv
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


# -------------------------------------------------------------- cass ------


class Cass(Operation):
    name = "cass"

    def setup(self, ps) -> None:
        P = self.P
        self.hyperbolic = ps.flag("hyperbolic")
        if P.es != 0:
            self.en = S.enfn(P.ell.n)
            self.m0 = float(S.mlfn(np.float64(P.phi0),
                                   np.float64(math.sin(P.phi0)),
                                   np.float64(math.cos(P.phi0)), self.en))

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        if P.es == 0:
            x = np.arcsin(np.clip(np.cos(phi) * np.sin(lam), -1, 1))
            y = np.arctan2(np.tan(phi), np.cos(lam)) - P.phi0
            return x, y, z, t
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        M = S.mlfn(phi, sinphi, cosphi, self.en)
        nu_sq = 1.0 / (1.0 - P.es * sinphi * sinphi)
        nu = np.sqrt(nu_sq)
        tanphi = np.tan(phi)
        T = tanphi * tanphi
        A = lam * cosphi
        C = P.es * (cosphi * cosphi) / (1 - P.es)
        A2 = A * A
        C1, C2_, C3 = 1 / 6.0, 1 / 120.0, 1 / 24.0
        x = nu * A * (1.0 - A2 * T * (C1 + (8.0 - T + 8.0 * C) * A2 * C2_))
        y = (M - self.m0 + nu * tanphi * A2
             * (0.5 + (5.0 - T + 6.0 * C) * A2 * C3))
        if self.hyperbolic:
            rho = nu_sq * (1.0 - P.es) * nu
            y = y - y * y * y / (6 * rho * nu)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        if P.es == 0:
            dd = y + P.phi0
            phi = np.arcsin(np.clip(np.sin(dd) * np.cos(x), -1, 1))
            lam = np.arctan2(np.tan(x), np.cos(dd))
            return lam, phi, z, t
        phi1 = S.inv_mlfn(self.m0 + y, self.en)
        tanphi1 = np.tan(phi1)
        T1 = tanphi1 * tanphi1
        sinphi1 = np.sin(phi1)
        nu1_sq = 1.0 / (1.0 - P.es * sinphi1 * sinphi1)
        nu1 = np.sqrt(nu1_sq)
        rho1 = nu1_sq * (1.0 - P.es) * nu1
        D = x / nu1
        D2 = D * D
        C3, C4, C5 = 1 / 24.0, 1 / 3.0, 1 / 15.0
        phi = phi1 - (nu1 * tanphi1 / rho1) * D2 * (
            0.5 - (1.0 + 3.0 * T1) * D2 * C3)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = D * (1.0 + T1 * D2 * (-C4 + (1.0 + 3.0 * T1) * D2 * C5)) \
                / np.cos(phi1)
        lam, phi, bad = generic_inverse_2d(
            lambda la, ph: self._fwd(la, ph, np.zeros_like(la),
                                     np.zeros_like(la))[:2],
            x, y, lam, phi, tol=1e-12)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


# -------------------------------------------------------------- bonne -----


class Bonne(Operation):
    name = "bonne"

    def setup(self, ps) -> None:
        P = self.P
        self.phi1 = ps.r("lat_1")
        if abs(self.phi1) < EPS10:
            raise ValueError("bonne: |lat_1| should be > 0")
        if P.es != 0:
            self.en = S.enfn(P.ell.n)
            am1 = math.sin(self.phi1)
            c = math.cos(self.phi1)
            self.m1 = float(S.mlfn(np.float64(self.phi1), np.float64(am1),
                                   np.float64(c), self.en))
            self.am1 = c / (math.sqrt(1.0 - P.es * am1 * am1) * am1)
        else:
            if abs(self.phi1) + EPS10 >= S.HALFPI:
                self.cphi1 = 0.0
            else:
                self.cphi1 = 1.0 / math.tan(self.phi1)

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        if P.es != 0:
            E = np.sin(phi)
            c = np.cos(phi)
            rh = self.am1 + self.m1 - S.mlfn(phi, E, c, self.en)
            small = np.abs(rh) <= EPS10
            rh_safe = np.where(small, 1.0, rh)
            Ang = c * lam / (rh_safe * np.sqrt(1.0 - P.es * E * E))
            x = np.where(small, 0.0, rh * np.sin(Ang))
            y = np.where(small, 0.0, self.am1 - rh * np.cos(Ang))
            return x, y, z, t
        rh = self.cphi1 + self.phi1 - phi
        small = np.abs(rh) <= EPS10
        rh_safe = np.where(small, 1.0, rh)
        E = lam * np.cos(phi) / rh_safe
        x = np.where(small, 0.0, rh * np.sin(E))
        y = np.where(small, 0.0, self.cphi1 - rh * np.cos(E))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        if P.es != 0:
            yy = self.am1 - y
            rh = np.copysign(np.hypot(x, yy), self.phi1)
            phi = S.inv_mlfn(self.am1 + self.m1 - rh, self.en)
            ab = np.abs(phi)
            bad = (ab >= S.HALFPI) & (ab - S.HALFPI > EPS10)
            sinphi = np.sin(phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                lm = rh * np.sqrt(1.0 - P.es * sinphi * sinphi) / np.cos(phi)
                lam = np.where(
                    self.phi1 > 0, lm * np.arctan2(x, yy),
                    lm * np.arctan2(-x, -yy))
            lam = np.where(ab >= S.HALFPI, 0.0, lam)
            return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t
        yy = self.cphi1 - y
        rh = np.copysign(np.hypot(x, yy), self.phi1)
        phi = self.cphi1 + self.phi1 - rh
        ab = np.abs(phi)
        bad = ab > S.HALFPI
        with np.errstate(divide="ignore", invalid="ignore"):
            lm = rh / np.cos(phi)
            lam = np.where(self.phi1 > 0, lm * np.arctan2(x, yy),
                           lm * np.arctan2(-x, -yy))
        lam = np.where(S.HALFPI - ab <= EPS10, 0.0, lam)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


# -------------------------------------------------------------- eqdc ------


class Eqdc(Operation):
    name = "eqdc"

    def setup(self, ps) -> None:
        P = self.P
        self.phi1 = ps.r("lat_1")
        self.phi2 = ps.r("lat_2")
        if abs(self.phi1) > S.HALFPI or abs(self.phi2) > S.HALFPI:
            raise ValueError("eqdc: |lat| must be <= 90")
        if abs(self.phi1 + self.phi2) < EPS10:
            raise ValueError("eqdc: |lat_1 + lat_2| should be > 0")
        self.en = S.enfn(P.ell.n)
        sinphi = math.sin(self.phi1)
        cosphi = math.cos(self.phi1)
        self.n = sinphi
        secant = abs(self.phi1 - self.phi2) >= EPS10
        self.ellips = P.es > 0
        if self.ellips:
            m1 = float(S.msfn(sinphi, cosphi, P.es))
            ml1 = float(S.mlfn(np.float64(self.phi1), np.float64(sinphi),
                               np.float64(cosphi), self.en))
            if secant:
                sinphi2 = math.sin(self.phi2)
                cosphi2 = math.cos(self.phi2)
                ml2 = float(S.mlfn(np.float64(self.phi2),
                                   np.float64(sinphi2),
                                   np.float64(cosphi2), self.en))
                if ml1 == ml2:
                    raise ValueError("eqdc: eccentricity too close to 1")
                self.n = (m1 - float(S.msfn(sinphi2, cosphi2, P.es))) \
                    / (ml2 - ml1)
                if self.n == 0:
                    raise ValueError("eqdc: invalid eccentricity")
            self.c = ml1 + m1 / self.n
            self.rho0 = self.c - float(S.mlfn(
                np.float64(P.phi0), np.float64(math.sin(P.phi0)),
                np.float64(math.cos(P.phi0)), self.en))
        else:
            if secant:
                self.n = (cosphi - math.cos(self.phi2)) \
                    / (self.phi2 - self.phi1)
            if self.n == 0:
                raise ValueError("eqdc: invalid lat_1/lat_2")
            self.c = self.phi1 + math.cos(self.phi1) / self.n
            self.rho0 = self.c - P.phi0

    def _fwd(self, lam, phi, z, t) -> Coords:
        if self.ellips:
            rho = self.c - S.mlfn(phi, np.sin(phi), np.cos(phi), self.en)
        else:
            rho = self.c - phi
        lamn = lam * self.n
        return rho * np.sin(lamn), self.rho0 - rho * np.cos(lamn), z, t

    def _inv(self, x, y, z, t) -> Coords:
        yy = self.rho0 - y
        rho = np.hypot(x, yy)
        zero = rho == 0.0
        if self.n < 0:
            rho = -rho
            x = -x
            yy = -yy
        phi = self.c - rho
        if self.ellips:
            phi = S.inv_mlfn(phi, self.en)
        lam = np.arctan2(x, yy) / self.n
        phi = np.where(zero, S.HALFPI if self.n > 0 else -S.HALFPI, phi)
        lam = np.where(zero, 0.0, lam)
        return lam, phi, z, t


# ------------------------------------------------------- moll family ------


class MollBase(Operation):
    C_x = C_y = C_p = 0.0

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)
        self._setup_consts()

    def _setup_consts(self) -> None:
        pass

    def _fwd(self, lam, phi, z, t) -> Coords:
        k = self.C_p * np.sin(phi)
        ph = np.array(phi, copy=True)
        conv = np.zeros(ph.shape, dtype=bool)
        for _ in range(30):
            V = (ph + np.sin(ph) - k) / (1.0 + np.cos(ph))
            ph = ph - np.where(conv, 0.0, V)
            conv = conv | (np.abs(V) < 1e-7)
            if conv.all():
                break
        ph = np.where(conv, ph * 0.5,
                      np.where(ph < 0, -S.HALFPI, S.HALFPI))
        x = self.C_x * lam * np.cos(ph)
        y = self.C_y * np.sin(ph)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        phi = aasin(y / self.C_y)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x / (self.C_x * np.cos(phi))
        bad = np.abs(lam) >= np.pi
        phi2 = phi + phi
        phi_o = aasin((phi2 + np.sin(phi2)) / self.C_p)
        return (np.where(bad, np.inf, lam), np.where(bad, np.inf, phi_o),
                z, t)


def _moll_consts(p: float):
    p2 = p + p
    sp = math.sin(p)
    r = math.sqrt(2 * math.pi * sp / (p2 + math.sin(p2)))
    return 2.0 * r / math.pi, r / sp, p2 + math.sin(p2)


class Moll(MollBase):
    name = "moll"

    def _setup_consts(self) -> None:
        self.C_x, self.C_y, self.C_p = _moll_consts(S.HALFPI)


class Wag4(MollBase):
    name = "wag4"

    def _setup_consts(self) -> None:
        self.C_x, self.C_y, self.C_p = _moll_consts(math.pi / 3)


class Wag5(MollBase):
    name = "wag5"

    def _setup_consts(self) -> None:
        self.C_x, self.C_y, self.C_p = 0.90977, 1.65014, 3.00896


# ------------------------------------------------------- sinu family ------


class GnSinuBase(Operation):
    m = 0.0
    n = 1.0

    def setup(self, ps) -> None:
        P = self.P
        self.ellipsoidal = False
        if self.name == "sinu" and P.es != 0.0:
            self.en = S.enfn(P.ell.n)
            self.ellipsoidal = True
            return
        self._read_params(ps)
        from proj_ray.ellipsoid import Ellipsoid

        if P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=P.ell.a, es=0.0)
        self.C_y = math.sqrt((self.m + 1.0) / self.n)
        self.C_x = self.C_y / (self.m + 1.0)

    def _read_params(self, ps) -> None:
        pass

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        if self.ellipsoidal:
            s = np.sin(phi)
            c = np.cos(phi)
            y = S.mlfn(phi, s, c, self.en)
            x = lam * c / np.sqrt(1.0 - P.es * s * s)
            return x, y, z, t
        ph = np.array(phi, copy=True)
        if self.m == 0.0:
            ph = aasin(self.n * np.sin(ph)) if self.n != 1.0 else ph
        else:
            k = self.n * np.sin(ph)
            conv = np.zeros(ph.shape, dtype=bool)
            for _ in range(8):
                V = (self.m * ph + np.sin(ph) - k) / (self.m + np.cos(ph))
                ph = ph - np.where(conv, 0.0, V)
                conv = conv | (np.abs(V) < 1e-7)
            bad = ~conv
            x = self.C_x * lam * (self.m + np.cos(ph))
            y = self.C_y * ph
            return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t
        x = self.C_x * lam * (self.m + np.cos(ph))
        y = self.C_y * ph
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        if self.ellipsoidal:
            phi = S.inv_mlfn(y, self.en)
            s = np.abs(phi)
            sin_phi = np.sin(phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                lam_full = x * np.sqrt(1.0 - P.es * sin_phi * sin_phi) \
                    / np.cos(phi)
            bad = (s - EPS10) >= S.HALFPI
            lam = np.where(s < S.HALFPI, lam_full, 0.0)
            return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t
        yy = y / self.C_y
        if self.m != 0.0:
            phi = aasin((self.m * yy + np.sin(yy)) / self.n)
        else:
            phi = aasin(np.sin(yy) / self.n) if self.n != 1.0 else yy
        lam = x / (self.C_x * (self.m + np.cos(yy)))
        return lam, phi, z, t


class Sinu(GnSinuBase):
    name = "sinu"
    m = 0.0
    n = 1.0


class GnSinu(GnSinuBase):
    name = "gn_sinu"

    def _read_params(self, ps) -> None:
        if not (ps.has("n") and ps.has("m")):
            raise ValueError("gn_sinu: need +m and +n")
        self.n = ps.f("n")
        self.m = ps.f("m")
        if not (self.n > 0 and self.m >= 0):
            raise ValueError("gn_sinu: invalid m/n")


class Eck6(GnSinuBase):
    name = "eck6"
    m = 1.0
    n = 2.570796326794896619231321691


class Mbtfps(GnSinuBase):
    name = "mbtfps"
    m = 0.5
    n = 1.785398163397448309615660845


# -------------------------------------------------------------- robin -----

_ROBIN_X = np.array([
    [1.0, 2.2199e-17, -7.15515e-05, 3.1103e-06],
    [0.9986, -0.000482243, -2.4897e-05, -1.3309e-06],
    [0.9954, -0.00083103, -4.48605e-05, -9.86701e-07],
    [0.99, -0.00135364, -5.9661e-05, 3.6777e-06],
    [0.9822, -0.00167442, -4.49547e-06, -5.72411e-06],
    [0.973, -0.00214868, -9.03571e-05, 1.8736e-08],
    [0.96, -0.00305085, -9.00761e-05, 1.64917e-06],
    [0.9427, -0.00382792, -6.53386e-05, -2.6154e-06],
    [0.9216, -0.00467746, -0.00010457, 4.81243e-06],
    [0.8962, -0.00536223, -3.23831e-05, -5.43432e-06],
    [0.8679, -0.00609363, -0.000113898, 3.32484e-06],
    [0.835, -0.00698325, -6.40253e-05, 9.34959e-07],
    [0.7986, -0.00755338, -5.00009e-05, 9.35324e-07],
    [0.7597, -0.00798324, -3.5971e-05, -2.27626e-06],
    [0.7186, -0.00851367, -7.01149e-05, -8.6303e-06],
    [0.6732, -0.00986209, -0.000199569, 1.91974e-05],
    [0.6213, -0.010418, 8.83923e-05, 6.24051e-06],
    [0.5722, -0.00906601, 0.000182, 6.24051e-06],
    [0.5322, -0.00677797, 0.000275608, 6.24051e-06],
], dtype=np.float32).astype(np.float64)

_ROBIN_Y = np.array([
    [-5.20417e-18, 0.0124, 1.21431e-18, -8.45284e-11],
    [0.062, 0.0124, -1.26793e-09, 4.22642e-10],
    [0.124, 0.0124, 5.07171e-09, -1.60604e-09],
    [0.186, 0.0123999, -1.90189e-08, 6.00152e-09],
    [0.248, 0.0124002, 7.10039e-08, -2.24e-08],
    [0.31, 0.0123992, -2.64997e-07, 8.35986e-08],
    [0.372, 0.0124029, 9.88983e-07, -3.11994e-07],
    [0.434, 0.0123893, -3.69093e-06, -4.35621e-07],
    [0.4958, 0.0123198, -1.02252e-05, -3.45523e-07],
    [0.5571, 0.0121916, -1.54081e-05, -5.82288e-07],
    [0.6176, 0.0119938, -2.41424e-05, -5.25327e-07],
    [0.6769, 0.011713, -3.20223e-05, -5.16405e-07],
    [0.7346, 0.0113541, -3.97684e-05, -6.09052e-07],
    [0.7903, 0.0109107, -4.89042e-05, -1.04739e-06],
    [0.8435, 0.0103431, -6.4615e-05, -1.40374e-09],
    [0.8936, 0.00969686, -6.4636e-05, -8.547e-06],
    [0.9394, 0.00840947, -0.000192841, -4.2106e-06],
    [0.9761, 0.00616527, -0.000256, -4.2106e-06],
    [1.0, 0.00328947, -0.000319159, -4.2106e-06],
], dtype=np.float32).astype(np.float64)

_FXC = 0.8487
_FYC = 1.3523
_C1R = 11.45915590261646417544
_RC1 = 0.08726646259971647884
_NODES = 18


def _robin_poly(tbl: np.ndarray, i: np.ndarray, zdeg: np.ndarray):
    c0 = tbl[i, 0]
    c1 = tbl[i, 1]
    c2 = tbl[i, 2]
    c3 = tbl[i, 3]
    return c0 + zdeg * (c1 + zdeg * (c2 + zdeg * c3))


def _robin_dpoly(tbl: np.ndarray, i: np.ndarray, zdeg: np.ndarray):
    c1 = tbl[i, 1]
    c2 = tbl[i, 2]
    c3 = tbl[i, 3]
    return c1 + 2 * zdeg * c2 + zdeg * zdeg * 3.0 * c3


class Robin(Operation):
    """Robinson (src/projections/robin.cpp). Parity note: the
    reference's spline table is stored in SINGLE precision (float
    literals), so fwd/inv roundtrip closure is limited to ~1e-7
    relative (~2e-5 deg of longitude at the dateline) by design; this
    port keeps the same table for coordinate parity."""

    name = "robin"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        dphi = np.abs(phi)
        i = np.floor(dphi * _C1R + 1e-15).astype(np.int64)
        bad = ~np.isfinite(phi) | (i < 0)
        i = np.clip(i, 0, _NODES)
        dd = np.degrees(dphi - _RC1 * i)
        x = _robin_poly(_ROBIN_X, i, dd) * _FXC * lam
        y = _robin_poly(_ROBIN_Y, i, dd) * _FYC
        y = np.where(phi < 0.0, -y, y)
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        lam = x / _FXC
        phi_n = np.abs(y / _FYC)
        bad = phi_n > 1.000001
        at_pole = (phi_n >= 1.0) & ~bad
        # general case: find table interval in Y space
        pn = np.clip(phi_n, 0.0, 0.9999999)
        i = np.clip(np.floor(pn * _NODES).astype(np.int64), 0, _NODES - 1)
        # adjust interval (table is mildly nonuniform in c0)
        for _ in range(3):
            dec = _ROBIN_Y[i, 0] > pn
            i = np.where(dec, i - 1, i)
            inc = (_ROBIN_Y[np.minimum(i + 1, _NODES), 0] <= pn) & ~dec
            i = np.where(inc, i + 1, i)
            i = np.clip(i, 0, _NODES - 1)
        tt = 5.0 * (pn - _ROBIN_Y[i, 0]) / (
            _ROBIN_Y[i + 1, 0] - _ROBIN_Y[i, 0])
        conv = np.zeros(tt.shape, dtype=bool)
        for _ in range(100):
            t1 = (_robin_poly(_ROBIN_Y, i, tt) - pn) \
                / _robin_dpoly(_ROBIN_Y, i, tt)
            tt = tt - np.where(conv, 0.0, t1)
            conv = conv | (np.abs(t1) < 1e-10)
            if conv.all():
                break
        phi = np.radians(5.0 * i + tt)
        phi = np.where(y < 0.0, -phi, phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_g = lam / _robin_poly(_ROBIN_X, i, tt)
        lam_p = lam / _ROBIN_X[_NODES, 0]
        phi = np.where(at_pole, np.where(y < 0, -S.HALFPI, S.HALFPI), phi)
        lam_o = np.where(at_pole, lam_p, lam_g)
        bad = bad | (np.abs(lam_o) > np.pi)
        return np.where(bad, np.inf, lam_o), np.where(bad, np.inf, phi), z, t


# --------------------------------------------------------------- mill -----


class Mill(Operation):
    name = "mill"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        return lam, np.log(np.tan(S.FORTPI + phi * 0.4)) * 1.25, z, t

    def _inv(self, x, y, z, t) -> Coords:
        return x, 2.5 * (np.arctan(np.exp(0.8 * y)) - S.FORTPI), z, t


class Gall(Operation):
    name = "gall"
    XF = 0.70710678118654752440
    YF = 1.70710678118654752440

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        return self.XF * lam, self.YF * np.tan(0.5 * phi), z, t

    def _inv(self, x, y, z, t) -> Coords:
        return x / self.XF, 2.0 * np.arctan(y / self.YF), z, t


# -------------------------------------------------------------- sterea ----


class GaussSphere:
    """Gauss conformal sphere mapping (src/gauss.cpp)."""

    def __init__(self, e: float, phi0: float):
        es = e * e
        self.e = e
        sphi = math.sin(phi0)
        cphi2 = math.cos(phi0) ** 2
        self.C = math.sqrt(1.0 + es * cphi2 * cphi2 / (1.0 - es))
        self.rc = math.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
        self.ratexp = 0.5 * self.C * e
        self.chi = math.asin(sphi / self.C)
        srat0 = self._srat_s(e * sphi, self.ratexp)
        if 0.5 * phi0 + S.FORTPI < 1e-10:
            self.K = 1.0 / srat0
        else:
            self.K = (math.tan(0.5 * self.chi + S.FORTPI)
                      / (math.tan(0.5 * phi0 + S.FORTPI) ** self.C * srat0))

    @staticmethod
    def _srat_s(esinp: float, ratexp: float) -> float:
        return ((1.0 - esinp) / (1.0 + esinp)) ** ratexp

    def _srat(self, esinp, ratexp):
        return ((1.0 - esinp) / (1.0 + esinp)) ** ratexp

    def fwd(self, lam, phi):
        sphi = 2.0 * np.arctan(
            self.K * np.tan(0.5 * phi + S.FORTPI) ** self.C
            * self._srat(self.e * np.sin(phi), self.ratexp)) - S.HALFPI
        return self.C * lam, sphi

    def inv(self, slam, sphi):
        lam = slam / self.C
        num = (np.tan(0.5 * sphi + S.FORTPI) / self.K) ** (1.0 / self.C)
        phi = np.array(sphi, copy=True)
        prev = np.array(sphi, copy=True)
        conv = np.zeros(phi.shape, dtype=bool)
        for _ in range(20):
            phi = 2.0 * np.arctan(
                num * self._srat(self.e * np.sin(prev), -0.5 * self.e)) \
                - S.HALFPI
            conv = conv | (np.abs(phi - prev) < 1e-14)
            if conv.all():
                break
            prev = np.where(conv, prev, phi)
        return lam, phi


class Sterea(Operation):
    name = "sterea"

    def setup(self, ps) -> None:
        P = self.P
        self.g = GaussSphere(P.e, P.phi0)
        self.phic0 = self.g.chi
        self.sinc0 = math.sin(self.phic0)
        self.cosc0 = math.cos(self.phic0)
        self.R2 = 2.0 * self.g.rc

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        slam, sphi = self.g.fwd(lam, phi)
        sinc = np.sin(sphi)
        cosc = np.cos(sphi)
        cosl = np.cos(slam)
        denom = 1.0 + self.sinc0 * sinc + self.cosc0 * cosc * cosl
        bad = denom == 0.0
        k = P.k0 * self.R2 / np.where(bad, 1.0, denom)
        x = k * cosc * np.sin(slam)
        y = k * (self.cosc0 * sinc - self.sinc0 * cosc * cosl)
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        x = x / P.k0
        y = y / P.k0
        rho = np.hypot(x, y)
        center = rho == 0.0
        rho_safe = np.where(center, 1.0, rho)
        c = 2.0 * np.arctan2(rho, self.R2)
        sinc = np.sin(c)
        cosc = np.cos(c)
        sphi = np.arcsin(np.clip(
            cosc * self.sinc0 + y * sinc * self.cosc0 / rho_safe, -1, 1))
        slam = np.arctan2(x * sinc,
                          rho * self.cosc0 * cosc - y * self.sinc0 * sinc)
        sphi = np.where(center, self.phic0, sphi)
        slam = np.where(center, 0.0, slam)
        return (*self.g.inv(slam, sphi), z, t)


def register_all(register) -> None:
    register(Gnom)
    register(Ortho)
    register(Cass)
    register(Bonne)
    register(Eqdc)
    register(Moll)
    register(Wag4)
    register(Wag5)
    register(Sinu)
    register(GnSinu)
    register(Eck6)
    register(Mbtfps)
    register(Robin)
    register(Mill)
    register(Gall)
    register(Sterea)
    try:
        from proj_ray.ops import projections4 as p4

        p4.register_all(register)
    except ImportError:
        pass
