"""Projection wave 9: general oblique transformation (ob_tran),
polyconic (poly), New Zealand Map Grid (nzmg), Gauss-Schreiber transverse
Mercator (gstmerc), van der Grinten II/III/IV.

References (parity targets, not copied):
  ob_tran  src/projections/ob_tran.cpp
  poly     src/projections/poly.cpp
  nzmg     src/projections/nzmg.cpp
  gstmerc  src/projections/gstmerc.cpp
  vandg2/3 src/projections/vandg2.cpp
  vandg4   src/projections/vandg4.cpp
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import (Coords, Operation, UNITS_RADIANS,
                               UNITS_WHATEVER)
from proj_ray.ops.projections2 import aasin

TOL10 = 1e-10
TWO_D_PI = 2.0 / math.pi


class ObTran(Operation):
    """General oblique transformation: rotate lon/lat to a new pole, then
    apply an inner projection built from the same parameter set with
    o_proj= as its proj= (src/projections/ob_tran.cpp:26-299).  The inner
    kernel is invoked RAW (no prepare/finalize), exactly as the reference
    calls link->fwd/inv directly, so the inner op's lam0/x0/y0 are inert.
    """

    name = "ob_tran"

    def setup(self, ps) -> None:
        from proj_ray import factory

        o_proj = ps.s("o_proj")
        if not o_proj or o_proj == "ob_tran":
            raise ValueError("ob_tran: missing or recursive o_proj")
        inner_kv = {k: v for k, v in ps.kv.items()
                    if k not in ("proj", "o_proj")}
        inner_kv["proj"] = o_proj
        self.link = factory._create_single(inner_kv)
        # 4D-only transform ops have no 2D kernel for ob_tran to wrap
        # (reference: link->fwd / link->inv are nullptr -> no_inverse_op)
        mod = type(self.link).__module__
        self._has_2d = ".ops.projections" in mod

        if ps.has("o_alpha"):
            lamc = ps.r("o_lon_c")
            phic = ps.r("o_lat_c")
            alpha = ps.r("o_alpha")
            if abs(abs(phic) - S.HALFPI) <= TOL10:
                raise ValueError("ob_tran: |o_lat_c| must be < 90")
            self.lamp = lamc + math.atan2(-math.cos(alpha),
                                          -math.sin(alpha) * math.sin(phic))
            phip = math.asin(min(1.0, max(-1.0,
                                          math.cos(phic) * math.sin(alpha))))
        elif ps.has("o_lat_p"):
            self.lamp = ps.r("o_lon_p")
            phip = ps.r("o_lat_p")
        else:
            lam1 = ps.r("o_lon_1")
            phi1 = ps.r("o_lat_1")
            lam2 = ps.r("o_lon_2")
            phi2 = ps.r("o_lat_2")
            if abs(phi1) > S.HALFPI - TOL10:
                raise ValueError("ob_tran: |o_lat_1| must be < 90")
            if abs(phi2) > S.HALFPI - TOL10:
                raise ValueError("ob_tran: |o_lat_2| must be < 90")
            if abs(phi1 - phi2) < TOL10:
                raise ValueError("ob_tran: o_lat_1 == o_lat_2")
            if abs(phi1) < TOL10:
                raise ValueError("ob_tran: o_lat_1 == 0")
            self.lamp = math.atan2(
                math.cos(phi1) * math.sin(phi2) * math.cos(lam1)
                - math.sin(phi1) * math.cos(phi2) * math.cos(lam2),
                math.sin(phi1) * math.cos(phi2) * math.sin(lam2)
                - math.cos(phi1) * math.sin(phi2) * math.sin(lam1))
            phip = math.atan(-math.cos(self.lamp - lam1) / math.tan(phi1))

        self.oblique = abs(phip) > TOL10
        self.cphip = math.cos(phip)
        self.sphip = math.sin(phip)
        # speculative latlong-as-target support: no semimajor scaling
        # (src/projections/ob_tran.cpp:293-295)
        if self.link.right == UNITS_RADIANS:
            self.right = UNITS_WHATEVER

    def _fwd(self, lam, phi, z, t) -> Coords:
        if not self._has_2d:
            raise NotImplementedError("ob_tran: inner op has no 2D forward")
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        coslam = np.cos(lam)
        if self.oblique:
            lam2 = S.adjlon(np.arctan2(
                cosphi * np.sin(lam),
                self.sphip * cosphi * coslam + self.cphip * sinphi)
                + self.lamp)
            phi2 = aasin(self.sphip * sinphi
                         - self.cphip * cosphi * coslam)
        else:
            lam2 = S.adjlon(np.arctan2(cosphi * np.sin(lam), sinphi)
                            + self.lamp)
            phi2 = aasin(-cosphi * coslam)
        return self.link._fwd(lam2, phi2, z, t)

    def _inv(self, x, y, z, t) -> Coords:
        if not self._has_2d:
            raise NotImplementedError("ob_tran: inner op has no 2D inverse")
        lam, phi, z, t = self.link._inv(x, y, z, t)
        with np.errstate(invalid="ignore"):
            if self.oblique:
                lam = lam - self.lamp
                coslam = np.cos(lam)
                sinphi = np.sin(phi)
                cosphi = np.cos(phi)
                phi2 = aasin(self.sphip * sinphi
                             + self.cphip * cosphi * coslam)
                lam2 = np.arctan2(cosphi * np.sin(lam),
                                  self.sphip * cosphi * coslam
                                  - self.cphip * sinphi)
            else:
                tt = lam - self.lamp
                cosphi = np.cos(phi)
                lam2 = np.arctan2(cosphi * np.sin(tt), -np.sin(phi))
                phi2 = aasin(cosphi * np.cos(tt))
        return lam2, phi2, z, t


class Poly(Operation):
    """American polyconic, spherical and ellipsoidal
    (src/projections/poly.cpp:23-136)."""

    name = "poly"

    def setup(self, ps) -> None:
        P = self.P
        self.es = P.es
        if self.es != 0.0:
            self.en = S.enfn(P.ell.n)
            phi0 = np.asarray([P.phi0])
            self.ml0 = float(S.mlfn(phi0, np.sin(phi0), np.cos(phi0),
                                    self.en)[0])
        else:
            self.ml0 = -P.phi0

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        flat = np.abs(phi) <= TOL10
        if self.es != 0.0:
            sp = np.sin(phi)
            cp = np.cos(phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                ms = np.where(np.abs(cp) > TOL10,
                              S.msfn(sp, cp, self.es) / np.where(
                                  sp == 0, 1.0, sp), 0.0)
                E = lam * sp
                x = np.where(flat, lam, ms * np.sin(E))
                y = np.where(flat, -self.ml0,
                             (S.mlfn(phi, sp, cp, self.en) - self.ml0)
                             + ms * (1.0 - np.cos(E)))
        else:
            with np.errstate(divide="ignore", invalid="ignore"):
                cot = 1.0 / np.tan(np.where(flat, 1.0, phi))
                E = lam * np.sin(phi)
                x = np.where(flat, lam, np.sin(E) * cot)
                y = np.where(flat, self.ml0,
                             phi - P.phi0 + cot * (1.0 - np.cos(E)))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        if self.es != 0.0:
            yy = y + self.ml0
            flat = np.abs(yy) <= TOL10
            phi = np.where(flat, 0.0, yy)
            r = yy * yy + x * x
            bad = np.zeros(phi.shape, dtype=bool)
            active = ~flat
            for _ in range(20):
                if not active.any():
                    break
                sp = np.sin(phi)
                cp = np.cos(phi)
                newly_bad = active & (np.abs(cp) < 1e-12)
                bad |= newly_bad
                active &= ~newly_bad
                with np.errstate(divide="ignore", invalid="ignore"):
                    mlp = np.sqrt(1.0 - self.es * sp * sp)
                    c = sp * mlp / np.where(cp == 0, 1.0, cp)
                    ml = S.mlfn(phi, sp, cp, self.en)
                    mlb = ml * ml + r
                    mlp2 = P.ell.one_es / (mlp * mlp * mlp)
                    s2ph = sp * cp
                    dphi = ((ml + ml + c * mlb - 2.0 * yy * (c * ml + 1.0))
                            / (self.es * s2ph * (mlb - 2.0 * yy * ml)
                               / np.where(c == 0, 1.0, c)
                               + 2.0 * (yy - ml)
                               * (c * mlp2 - 1.0 / np.where(s2ph == 0, 1.0,
                                                            s2ph))
                               - mlp2 - mlp2))
                phi = np.where(active, phi + dphi, phi)
                active = active & (np.abs(dphi) > 1e-12)
            bad |= active  # non-converged
            sp = np.sin(phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                lam = np.where(
                    flat, x,
                    np.arcsin(x * np.tan(phi)
                              * np.sqrt(1.0 - self.es * sp * sp))
                    / np.where(flat, 1.0, sp))
            phi = np.where(flat, 0.0, phi)
            lam = np.where(bad, np.inf, lam)
            phi = np.where(bad, np.inf, phi)
        else:
            yy = P.phi0 + y
            flat = np.abs(yy) <= TOL10
            phi = np.where(flat, 1.0, yy)
            B = x * x + yy * yy
            bad = np.zeros(phi.shape, dtype=bool)
            active = ~flat
            for i in range(10):
                if not active.any():
                    break
                with np.errstate(divide="ignore", invalid="ignore"):
                    tp = np.tan(phi)
                    dphi = ((yy * (phi * tp + 1.0) - phi
                             - 0.5 * (phi * phi + B) * tp)
                            / ((phi - yy) / np.where(tp == 0, 1.0, tp) - 1.0))
                phi = np.where(active, phi - dphi, phi)
                still = np.abs(dphi) > TOL10
                if i == 9:
                    bad |= active & still
                active = active & still
            with np.errstate(divide="ignore", invalid="ignore"):
                lam = np.where(flat, x,
                               np.arcsin(x * np.tan(phi)) / np.sin(phi))
            phi = np.where(flat, 0.0, phi)
            lam = np.where(bad, np.inf, lam)
            phi = np.where(bad, np.inf, phi)
        return lam, phi, z, t


# New Zealand Map Grid sixth-order complex polynomial and the psi<->phi
# series, from src/projections/nzmg.cpp:41-56 (public constants of the
# published NZMG definition, Reilly 1973).
_NZMG_BF = np.array([
    0.7557853228 + 0.0j,
    0.249204646 + 0.003371507j,
    -0.001541739 + 0.041058560j,
    -0.10162907 + 0.01727609j,
    -0.26623489 - 0.36249218j,
    -0.6870983 - 1.1651967j,
])
_NZMG_TPSI = np.array([
    0.6399175073, -0.1358797613, 0.063294409, -0.02526853, 0.0117879,
    -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034])
_NZMG_TPHI = np.array([
    1.5627014243, 0.5185406398, -0.03333098, -0.1052906, -0.0368594,
    0.007317, 0.01220, 0.00394, -0.0013])
_SEC5_TO_RAD = 0.4848136811095359935899141023
_RAD_TO_SEC5 = 2.062648062470963551564733573


def _zpoly(z: np.ndarray) -> np.ndarray:
    """p(z) = z * Horner(_NZMG_BF reversed) = sum C_i z^i, i=1..6."""
    a = np.full(z.shape, _NZMG_BF[-1], dtype=complex)
    for c in _NZMG_BF[-2::-1]:
        a = c + z * a
    return z * a


def _zpoly_deriv(z: np.ndarray) -> np.ndarray:
    """d/dz of _zpoly: sum i*C_i z^(i-1)."""
    n = len(_NZMG_BF)
    a = np.full(z.shape, n * _NZMG_BF[-1], dtype=complex)
    for i in range(n - 1, 0, -1):
        a = i * _NZMG_BF[i - 1] + z * a
    return a


class Nzmg(Operation):
    """New Zealand Map Grid (src/projections/nzmg.cpp:58-134): forces the
    International ellipsoid and the fixed NZ origin/offsets."""

    name = "nzmg"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        P = self.P
        P.ell = Ellipsoid(a=6378388.0, es=P.ell.es)
        P.lam0 = math.radians(173.0)
        P.phi0 = math.radians(-41.0)
        P.x0 = 2510000.0
        P.y0 = 6023150.0

    def _fwd(self, lam, phi, z, t) -> Coords:
        dphi = (phi - self.P.phi0) * _RAD_TO_SEC5
        psi = np.full(dphi.shape, _NZMG_TPSI[-1])
        for c in _NZMG_TPSI[-2::-1]:
            psi = c + dphi * psi
        psi = psi * dphi
        p = _zpoly(psi + 1j * lam)
        return p.imag, p.real, z, t

    def _inv(self, x, y, z, t) -> Coords:
        p = y + 1j * x
        target = p.copy()
        active = np.isfinite(x) & np.isfinite(y)
        nn = np.zeros(x.shape, dtype=bool)  # converged flag
        for _ in range(20):
            if not active.any():
                break
            f = _zpoly(p) - target
            fp = _zpoly_deriv(p)
            with np.errstate(divide="ignore", invalid="ignore"):
                dp = -f / fp
            p = np.where(active, p + dp, p)
            done = (np.abs(dp.real) + np.abs(dp.imag)) <= 1e-10
            nn |= active & done
            active &= ~done
        lam = p.imag
        psi = p.real
        phi = np.full(psi.shape, _NZMG_TPHI[-1])
        for c in _NZMG_TPHI[-2::-1]:
            phi = c + psi * phi
        phi = self.P.phi0 + psi * phi * _SEC5_TO_RAD
        lam = np.where(nn, lam, np.inf)
        phi = np.where(nn, phi, np.inf)
        return lam, phi, z, t


class Gstmerc(Operation):
    """Gauss-Schreiber transverse Mercator (Gauss-Laborde Reunion),
    src/projections/gstmerc.cpp:30-79.  The raw kernel scales by ra/a
    internally, mirroring the reference."""

    name = "gstmerc"

    def setup(self, ps) -> None:
        P = self.P
        es, e = P.es, P.e
        phi0 = P.phi0
        sphi0 = math.sin(phi0)
        self.n1 = math.sqrt(1.0 + es * math.cos(phi0) ** 4 / (1.0 - es))
        self.phic = math.asin(sphi0 / self.n1)
        ts1 = float(S.tsfn(np.asarray([-self.phic]),
                           np.asarray([-sphi0 / self.n1]), 0.0)[0])
        ts0 = float(S.tsfn(np.asarray([-phi0]), np.asarray([-sphi0]), e)[0])
        self.c = math.log(ts1) - self.n1 * math.log(ts0)
        self.n2 = P.k0 * P.ell.a * math.sqrt(1.0 - es) / (
            1.0 - es * sphi0 * sphi0)
        self.XS = 0.0
        self.YS = -self.n2 * self.phic

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        L = self.n1 * lam
        Ls = self.c + self.n1 * np.log(S.tsfn(-phi, -np.sin(phi), P.e))
        sinLs1 = np.sin(L) / np.cosh(Ls)
        Ls1 = np.log(S.tsfn(-np.arcsin(sinLs1), -sinLs1, 0.0))
        x = (self.XS + self.n2 * Ls1) * P.ell.ra
        y = (self.YS + self.n2 * np.arctan(np.sinh(Ls) / np.cos(L))) \
            * P.ell.ra
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        a = P.ell.a
        u = (x * a - self.XS) / self.n2
        v = (y * a - self.YS) / self.n2
        L = np.arctan(np.sinh(u) / np.cos(v))
        sinC = np.sin(v) / np.cosh(u)
        LC = np.log(S.tsfn(-np.arcsin(sinC), -sinC, 0.0))
        lam = L / self.n1
        phi = -S.phi2(np.exp((LC - self.c) / self.n1), P.e)
        return lam, phi, z, t


class Vandg2(Operation):
    """van der Grinten II (no inverse), src/projections/vandg2.cpp:26-64."""

    name = "vandg2"
    vdg3 = False

    def setup(self, ps) -> None:
        pass

    def _fwd(self, lam, phi, z, t) -> Coords:
        bt = np.abs(TWO_D_PI * phi)
        ct = np.sqrt(np.maximum(1.0 - bt * bt, 0.0))
        center = np.abs(lam) < TOL10
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_safe = np.where(center, 1.0, lam)
            at = 0.5 * np.abs(math.pi / lam_safe - lam_safe / math.pi)
            if self.vdg3:
                x1 = bt / (1.0 + ct)
                x = math.pi * (np.sqrt(at * at + 1.0 - x1 * x1) - at)
                y = math.pi * x1
            else:
                x1 = ((ct * np.sqrt(1.0 + at * at) - at * ct * ct)
                      / (1.0 + at * at * bt * bt))
                x = math.pi * x1
                y = math.pi * np.sqrt(1.0 - x1 * (x1 + 2.0 * at) + TOL10)
            x = np.where(lam < 0.0, -x, x)
            y = np.where(phi < 0.0, -y, y)
            x = np.where(center, 0.0, x)
            y = np.where(center,
                         math.pi * np.where(phi < 0.0, -bt, bt) / (1.0 + ct),
                         y)
        return x, y, z, t


class Vandg3(Vandg2):
    """van der Grinten III (no inverse), forces es=0
    (src/projections/vandg2.cpp:66-82)."""

    name = "vandg3"
    vdg3 = True

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)


class Vandg4(Operation):
    """van der Grinten IV (no inverse), src/projections/vandg4.cpp:10-56."""

    name = "vandg4"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        flat = np.abs(phi) < TOL10
        axis = (np.abs(lam) < TOL10) | (np.abs(np.abs(phi) - S.HALFPI)
                                        < TOL10)
        with np.errstate(divide="ignore", invalid="ignore"):
            bt = np.abs(TWO_D_PI * phi)
            bt2 = bt * bt
            denom = bt2 * (bt - 1.0)
            ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) / np.where(
                denom == 0, 1.0, denom)
            ct2 = ct * ct
            lam_safe = np.where(np.abs(lam) < TOL10, 1.0, lam)
            dt = TWO_D_PI * lam_safe
            dt = dt + 1.0 / dt
            dt = np.sqrt(np.maximum(dt * dt - 4.0, 0.0))
            dt = np.where((np.abs(lam) - S.HALFPI) < 0.0, -dt, dt)
            dt2 = dt * dt
            x1 = bt + ct
            x1 = x1 * x1
            tt = bt + 3.0 * ct
            ft = (x1 * (bt2 + ct2 * dt2 - 1.0)
                  + (1.0 - bt2) * (bt2 * (tt * tt + 4.0 * ct2)
                                   + ct2 * (12.0 * bt * ct + 4.0 * ct2)))
            x1 = ((dt * (x1 + ct2 - 1.0) + 2.0 * np.sqrt(np.maximum(ft, 0.0)))
                  / (4.0 * x1 + dt2))
            x = S.HALFPI * x1
            y = S.HALFPI * np.sqrt(np.maximum(
                1.0 + dt * np.abs(x1) - x1 * x1, 0.0))
            x = np.where(lam < 0.0, -x, x)
            y = np.where(phi < 0.0, -y, y)
            x = np.where(axis, 0.0, x)
            y = np.where(axis, phi, y)
            x = np.where(flat & ~axis, lam, x)
            y = np.where(flat & ~axis, 0.0, y)
        return x, y, z, t


def register_all(register) -> None:
    for cls in (ObTran, Poly, Nzmg, Gstmerc, Vandg2, Vandg3, Vandg4):
        register(cls)
    try:
        from proj_ray.ops import projections10 as p10

        p10.register_all(register)
    except ImportError:
        pass
