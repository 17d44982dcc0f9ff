"""Second projection wave, vectorized.

Re-derivations of:
  - adams family (guyou/peirce_q/adams_hemi/adams_ws1/adams_ws2):
    src/projections/adams.cpp (elliptic integral F(phi, k^2=1/2) via the
    even Chebyshev series ell_int_5, adams.cpp:85-110)
  - aea/leac: src/projections/aea.cpp (authalic phi1_ iteration)
  - eqc: src/projections/eqc.cpp
  - cea: src/projections/cea.cpp (+ pj_authset/pj_authlat, src/auth.cpp)
  - laea: src/projections/laea.cpp
  - stere/ups: src/projections/stere.cpp
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation

EPS10 = 1e-10
RSQRT2 = 0.7071067811865475244008443620


def aasin(v: np.ndarray) -> np.ndarray:
    return np.arcsin(np.clip(v, -1.0, 1.0))


def aacos(v: np.ndarray) -> np.ndarray:
    return np.arccos(np.clip(v, -1.0, 1.0))


# authalic latitude series (src/auth.cpp)


def authset(es: float) -> np.ndarray:
    P00, P01, P02 = 1 / 3.0, 31 / 180.0, 517 / 5040.0
    P10, P11 = 23 / 360.0, 251 / 3780.0
    P20 = 761 / 45360.0
    t = es * es
    apa = np.empty(3)
    apa[0] = es * P00 + t * P01 + t * es * P02
    apa[1] = t * P10 + t * es * P11
    apa[2] = t * es * P20
    return apa


def authlat(beta: np.ndarray, apa: np.ndarray) -> np.ndarray:
    t = beta + beta
    return (beta + apa[0] * np.sin(t) + apa[1] * np.sin(t + t)
            + apa[2] * np.sin(t + t + t))


# ------------------------------------------------------------- adams ------

_ELL5_C0 = 2.19174570831038
_ELL5_C = (
    -8.58691003636495e-07, 2.02692115653689e-07, 3.12960480765314e-05,
    5.30394739921063e-05, -0.0012804644680613, -0.00575574836830288,
    0.0914203033408211,
)


def ell_int_5(phi: np.ndarray) -> np.ndarray:
    """Elliptic integral of the first kind for k^2 = 1/2 (even Chebyshev
    series, adams.cpp:85-110)."""
    y = phi * (2.0 / np.pi)
    y = 2.0 * y * y - 1.0
    y2 = 2.0 * y
    d1 = np.zeros_like(phi)
    d2 = np.zeros_like(phi)
    for c in _ELL5_C:
        d1, d2 = y2 * d1 - d2 + c, d1
    return phi * (y * d1 - d2 + 0.5 * _ELL5_C0)


class AdamsBase(Operation):
    mode = "?"
    TOL = 1e-9
    SHD = 1.8540746773013719 * 2

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        # forced spherical (adams.cpp: P->es = 0)
        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)
        self.pqshape = None

    def _ab(self, lam, phi):
        """Return (a, b, sm, sn, domain_error_mask)."""
        raise NotImplementedError

    def _fwd(self, lam, phi, z, t) -> Coords:
        a, b, sm, sn, bad = self._ab(lam, phi)
        m = aasin(np.sqrt(1.0 + np.minimum(0.0, np.cos(a + b))))
        m = np.where(sm, -m, m)
        n = aasin(np.sqrt(np.abs(1.0 - np.maximum(0.0, np.cos(a - b)))))
        n = np.where(sn, -n, n)
        x = ell_int_5(m)
        y = ell_int_5(n)
        x, y = self._post(lam, phi, x, y)
        return (np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t)

    def _post(self, lam, phi, x, y):
        return x, y


class Guyou(AdamsBase):
    name = "guyou"

    def _ab(self, lam, phi):
        bad = (np.abs(lam) - self.TOL) > S.HALFPI
        at_pole = np.abs(np.abs(phi) - S.HALFPI) < self.TOL
        sl = np.sin(lam)
        sp = np.sin(phi)
        cp = np.cos(phi)
        a = aacos((cp * sl - sp) * RSQRT2)
        b = aacos((cp * sl + sp) * RSQRT2)
        sm = lam < 0.0
        sn = phi < 0.0
        # poles map to (0, +-1.85407) exactly
        self._pole_mask = at_pole
        self._pole_y = np.where(phi < 0, -1.85407, 1.85407)
        return a, b, sm, sn, bad & ~at_pole

    def _post(self, lam, phi, x, y):
        if self._pole_mask.any():
            x = np.where(self._pole_mask, 0.0, x)
            y = np.where(self._pole_mask, self._pole_y, y)
        return x, y


class PeirceQ(AdamsBase):
    name = "peirce_q"

    def setup(self, ps) -> None:
        super().setup(ps)
        shape = ps.s("shape") or "diamond"
        if shape not in ("square", "diamond", "nhemisphere", "shemisphere",
                         "horizontal", "vertical"):
            raise ValueError("peirce_q: invalid 'shape'")
        self.pqshape = shape
        self.scrollx = 0.0
        self.scrolly = 0.0
        if shape == "horizontal" and ps.has("scrollx"):
            self.scrollx = ps.f("scrollx")
            if abs(self.scrollx) > 1:
                raise ValueError("|scrollx| must be <= 1")
        if shape == "vertical" and ps.has("scrolly"):
            self.scrolly = ps.f("scrolly")
            if abs(self.scrolly) > 1:
                raise ValueError("|scrolly| must be <= 1")

    def _inv(self, x, y, z, t) -> Coords:
        # Newton inverse with the reference's heuristic seeds, square and
        # diamond shapes only (src/projections/adams.cpp:318-385).
        if self.pqshape not in ("square", "diamond"):
            raise NotImplementedError("peirce_q: no inverse for this shape")
        QP = np.pi / 4
        lam0 = np.zeros(x.shape)
        phi0 = np.zeros(x.shape)
        center = (x == 0) & (y == 0)
        if self.pqshape == "square":
            conds = [
                (x == 0) & (y < 0),
                (x > 0) & (np.abs(y) < 1e-7),
                (x < 0) & (np.abs(y) < 1e-7),
                (np.abs(x) < 1e-7) & (y > 0),
                (x >= 0) & (y <= 0),
                (x >= 0) & (y >= 0),
                (x <= 0) & (y >= 0) & (np.abs(x) < np.abs(y)),
                (x <= 0) & (y >= 0),
            ]
            lam0 = np.select(conds,
                             [-QP, QP, -3 * QP, 3 * QP, 0.0, 2 * QP,
                              np.pi * 0.9, -np.pi * 0.9], -2 * QP)
            phi0 = np.select(
                conds[:3],
                [np.where(np.abs(y) < 2.622057580396, QP, 0.0),
                 0.0,
                 np.pi / 2 / 2.622057574224 * x + np.pi / 2], 0.0)
            phi0 = np.where(center, np.pi / 2, phi0)
        else:
            conds = [
                (x >= 0) & (y <= 0) & (x > 0) & (y == 0),
                (x >= 0) & (y <= 0) & (x == 0) & (y < 0),
                (x >= 0) & (y <= 0),
                (x >= 0) & (y >= 0),
                (x <= 0) & (y >= 0),
            ]
            lam0 = np.select(conds, [2 * QP, 0.0, QP, 3 * QP, -3 * QP], -QP)
            phi0 = np.select(conds[:2], [0.0, QP], 0.0)
            far = (np.abs(x) > 1.8540746773013719 + 1e-3) \
                | (np.abs(y) > 1.8540746773013719 + 1e-3)
            phi0 = np.where(far, -QP, phi0)
            phi0 = np.where(center, np.pi / 2, phi0)

        def fwd2(lam_a, phi_a):
            zz = np.zeros(lam_a.shape)
            fx, fy, _, _ = self._fwd(lam_a, phi_a, zz, zz)
            return fx, fy

        lam, phi, bad = generic_inverse_2d(fwd2, x, y, lam0, phi0,
                                           tol=1e-10)
        lam = np.where(bad, np.inf, lam)
        phi = np.where(bad, np.inf, phi)
        lam = np.where(center, 0.0, lam)
        phi = np.where(center, np.pi / 2, phi)
        return lam, phi, z, t

    def _ab(self, lam, phi):
        bad = np.zeros(lam.shape, dtype=bool)
        if self.pqshape == "nhemisphere":
            bad = phi < -self.TOL
        elif self.pqshape == "shemisphere":
            bad = phi > -self.TOL
        sl = np.sin(lam)
        cl = np.cos(lam)
        cp = np.cos(phi)
        a = aacos(cp * (sl + cl) * RSQRT2)
        b = aacos(cp * (sl - cl) * RSQRT2)
        return a, b, sl < 0.0, cl > 0.0, bad

    def _post(self, lam, phi, x, y):
        shd = self.SHD
        shape = self.pqshape
        if shape in ("square", "diamond"):
            south = phi < 0.0
            y = np.where(south & (lam < -0.75 * np.pi), shd - y, y)
            x = np.where(south & (lam >= -0.75 * np.pi)
                         & (lam < -0.25 * np.pi), -shd - x, x)
            y = np.where(south & (lam >= -0.25 * np.pi)
                         & (lam < 0.25 * np.pi), -shd - y, y)
            x = np.where(south & (lam >= 0.25 * np.pi)
                         & (lam < 0.75 * np.pi), shd - x, x)
            y = np.where(south & (lam >= 0.75 * np.pi), shd - y, y)
        if shape == "square":
            x, y = RSQRT2 * (x - y), RSQRT2 * (x + y)
        if shape == "horizontal":
            x = np.where(phi < 0.0, shd - x, x)
            x = x - shd / 2
            if self.scrollx != 0.0:
                xs, xt = 2.0, shd / 2
                x = x + self.scrollx * (xt * 2 * xs)
                x = np.where(x >= xt * xs, x - shd * xs, x)
                x = np.where(x < -xt * xs, x + shd * xs, x)
        if shape == "vertical":
            y = np.where(phi < 0.0, shd - y, y)
            y = y - shd / 2
            if self.scrolly != 0.0:
                ys, yt = 2.0, shd / 2
                y = y + self.scrolly * (yt * 2 * ys)
                y = np.where(y >= yt * ys, y - shd * ys, y)
                y = np.where(y < -yt * ys, y + shd * ys, y)
        return x, y


class AdamsHemi(AdamsBase):
    name = "adams_hemi"

    def _ab(self, lam, phi):
        sp = np.sin(phi)
        bad = (np.abs(lam) - self.TOL) > S.HALFPI
        a0 = np.cos(phi) * np.sin(lam)
        sm = (sp + a0) < 0.0
        sn = (sp - a0) < 0.0
        a = aacos(a0)
        b = S.HALFPI - phi
        return a, b, sm, sn, bad

    def _post(self, lam, phi, x, y):
        return RSQRT2 * (x - y), RSQRT2 * (x + y)


class AdamsWs1(AdamsBase):
    name = "adams_ws1"

    def _ab(self, lam, phi):
        sp = np.tan(0.5 * phi)
        b0 = np.cos(aasin(sp)) * np.sin(0.5 * lam)
        a = aacos((b0 - sp) * RSQRT2)
        b = aacos((b0 + sp) * RSQRT2)
        return a, b, lam < 0.0, phi < 0.0, np.zeros(lam.shape, dtype=bool)


class AdamsWs2(AdamsBase):
    name = "adams_ws2"

    def _ab(self, lam, phi):
        spp = np.tan(0.5 * phi)
        a0 = np.cos(aasin(spp)) * np.sin(0.5 * lam)
        sm = (spp + a0) < 0.0
        sn = (spp - a0) < 0.0
        b = aacos(spp)
        a = aacos(a0)
        return a, b, sm, sn, np.zeros(lam.shape, dtype=bool)

    def _post(self, lam, phi, x, y):
        return RSQRT2 * (x - y), RSQRT2 * (x + y)

    def _inv(self, x, y, z, t) -> Coords:
        # Newton-Raphson on the forward (adams.cpp adams_inverse)
        phi0 = np.clip(y / 2.62181347, -1.0, 1.0) * S.HALFPI
        with np.errstate(all="ignore"):
            lam0 = np.where(
                np.abs(phi0) >= S.HALFPI, 0.0,
                np.clip(x / 2.62205760
                        / np.where(np.cos(phi0) == 0, 1, np.cos(phi0)),
                        -1.0, 1.0) * np.pi)
        # near-pole convergence is a slow clip-boundary oscillation
        # (~0.6x/cycle); 120 iterations reaches sub-mm where the
        # reference's 15 do not reliably (their gie file comments note
        # platform-dependent roundtrip failures here)
        lam, phi, bad = generic_inverse_2d(
            lambda la, ph: self._fwd(la, ph, np.zeros_like(la),
                                     np.zeros_like(la))[:2],
            x, y, lam0, phi0, iters=120)
        return (np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t)


def generic_inverse_2d(fwd2, x, y, lam0, phi0, tol: float = 1e-10,
                       iters: int = 15):
    """Vectorized 2D Newton on a forward kernel with numeric jacobian
    (mirror of pj_generic_inverse_2d, src/generic_inverse.cpp:44-118:
    inward finite differences, +-0.3 rad step clamp, domain clipping)."""
    lam = np.array(lam0, dtype=np.float64, copy=True)
    phi = np.array(phi0, dtype=np.float64, copy=True)
    dlX = np.zeros(lam.shape)
    dlY = np.zeros(lam.shape)
    dpX = np.zeros(lam.shape)
    dpY = np.zeros(lam.shape)
    jxl_s = np.zeros(lam.shape)
    jyp_s = np.zeros(lam.shape)
    sing = np.zeros(lam.shape, dtype=bool)  # latest recompute was singular
    for it in range(iters):
        fx, fy = fwd2(lam, phi)
        dx = fx - x
        dy = fy - y
        done = (np.abs(dx) < tol) & (np.abs(dy) < tol)
        if done.all():
            break
        # recompute the jacobian only when far from the target; close to
        # it the previous (good) derivatives are reused, which also avoids
        # probing across edge folds (generic_inverse.cpp:59-61)
        rec = np.ones(lam.shape, dtype=bool) if it == 0 else \
            (np.abs(dx) > 1e-6) | (np.abs(dy) > 1e-6)
        if rec.any():
            # inward finite differences (stay inside the domain near edges)
            dLam = np.where(lam > 0, -1e-6, 1e-6)
            dPhi = np.where(phi > 0, -1e-6, 1e-6)
            fx1, fy1 = fwd2(lam + dLam, phi)
            fx2, fy2 = fwd2(lam, phi + dPhi)
            jxl = (fx1 - fx) / dLam
            jyl = (fy1 - fy) / dLam
            jxp = (fx2 - fx) / dPhi
            jyp = (fy2 - fy) / dPhi
            det = jxl * jyp - jxp * jyl
            ok = rec & (det != 0) & np.isfinite(det)
            det_safe = np.where(ok, det, 1.0)
            dlX = np.where(ok, jyp / det_safe, dlX)
            dlY = np.where(ok, -jxp / det_safe, dlY)
            dpX = np.where(ok, -jyl / det_safe, dpX)
            dpY = np.where(ok, jxl / det_safe, dpY)
            jxl_s = np.where(rec, jxl, jxl_s)
            jyp_s = np.where(rec, jyp, jyp_s)
            sing = np.where(rec, ~((det != 0) & np.isfinite(det)), sing)
        delta_lam = np.clip(dx * dlX + dy * dlY, -0.3, 0.3)
        delta_phi = np.clip(dx * dpX + dy * dpY, -0.3, 0.3)
        # latest jacobian was singular (e.g. at a pole where
        # dX/dlam == 0): diagonal Newton on the latest derivatives
        with np.errstate(divide="ignore", invalid="ignore"):
            diag_phi = np.clip(dy / jyp_s, -0.3, 0.3)
            diag_lam = np.clip(dx / jxl_s, -0.3, 0.3)
        use_diag = sing & np.isfinite(jyp_s) & (np.abs(jyp_s) > 1e-12)
        delta_phi = np.where(use_diag, diag_phi, delta_phi)
        delta_lam = np.where(
            use_diag,
            np.where(np.isfinite(diag_lam) & (np.abs(jxl_s) > 1e-12),
                     diag_lam, 0.0),
            delta_lam)
        delta_lam = np.where(done | (x == 0), 0.0, delta_lam)
        delta_phi = np.where(done | (y == 0), 0.0, delta_phi)
        lam = np.clip(lam - delta_lam, -np.pi, np.pi)
        phi = np.clip(phi - delta_phi, -S.HALFPI, S.HALFPI)
    fx, fy = fwd2(lam, phi)
    bad = ~((np.abs(fx - x) < 1e-6) & (np.abs(fy - y) < 1e-6))
    return lam, phi, bad


# --------------------------------------------------------------- aea ------


class Aea(Operation):
    name = "aea"

    def setup(self, ps) -> None:
        self.phi1 = ps.r("lat_1")
        self.phi2 = ps.r("lat_2")
        self._setup_common()

    def _setup_common(self) -> None:
        P = self.P
        if abs(self.phi1) > S.HALFPI or abs(self.phi2) > S.HALFPI:
            raise ValueError("|lat_1|,|lat_2| must be <= 90")
        if abs(self.phi1 + self.phi2) < EPS10:
            raise ValueError("|lat_1 + lat_2| should be > 0")
        sinphi = math.sin(self.phi1)
        cosphi = math.cos(self.phi1)
        self.n = sinphi
        secant = abs(self.phi1 - self.phi2) >= EPS10
        self.ellips = P.es > 0.0
        if self.ellips:
            m1 = float(S.msfn(sinphi, cosphi, P.es))
            ml1 = float(S.qsfn(np.float64(sinphi), P.e, P.one_es))
            if secant:
                sinphi2 = math.sin(self.phi2)
                m2 = float(S.msfn(sinphi2, math.cos(self.phi2), P.es))
                ml2 = float(S.qsfn(np.float64(sinphi2), P.e, P.one_es))
                if ml2 == ml1:
                    raise ValueError("aea: degenerate parallels")
                self.n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
                if self.n == 0:
                    raise ValueError("aea: invalid eccentricity")
            self.ec = (1.0 - 0.5 * P.one_es
                       * math.log((1.0 - P.e) / (1.0 + P.e)) / P.e)
            self.c = m1 * m1 + self.n * ml1
            self.dd = 1.0 / self.n
            self.rho0 = self.dd * math.sqrt(
                self.c - self.n * float(S.qsfn(np.float64(math.sin(P.phi0)),
                                               P.e, P.one_es)))
        else:
            if secant:
                self.n = 0.5 * (self.n + math.sin(self.phi2))
            self.n2 = self.n + self.n
            self.c = cosphi * cosphi + self.n2 * sinphi
            self.dd = 1.0 / self.n
            self.rho0 = self.dd * math.sqrt(
                self.c - self.n2 * math.sin(P.phi0))

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        if self.ellips:
            rho = self.c - self.n * S.qsfn(np.sin(phi), P.e, P.one_es)
        else:
            rho = self.c - self.n2 * np.sin(phi)
        bad = rho < 0.0
        rho = self.dd * np.sqrt(np.maximum(rho, 0.0))
        lamn = lam * self.n
        x = rho * np.sin(lamn)
        y = self.rho0 - rho * np.cos(lamn)
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _phi1(self, qs):
        """Vectorized authalic phi iteration (aea.cpp phi1_)."""
        P = self.P
        Te = P.e
        Tone_es = P.one_es
        Phi = np.arcsin(np.clip(0.5 * qs, -1, 1))
        if Te < 1e-7:
            return Phi
        ok = np.zeros(Phi.shape, dtype=bool)
        for _ in range(15):
            sinpi = np.sin(Phi)
            cospi = np.cos(Phi)
            con = Te * sinpi
            com = 1.0 - con * con
            with np.errstate(divide="ignore", invalid="ignore"):
                dphi = (0.5 * com * com / cospi
                        * (qs / Tone_es - sinpi / com
                           + 0.5 / Te * np.log((1.0 - con) / (1.0 + con))))
            Phi = Phi + np.where(ok, 0.0, dphi)
            ok = ok | ~(np.abs(dphi) > 1e-10)
            if ok.all():
                return Phi
        return np.where(ok, Phi, np.inf)

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        y = self.rho0 - y
        rho = np.hypot(x, y)
        zero = rho == 0.0
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        phi = rho / self.dd
        bad = np.zeros(x.shape, dtype=bool)
        if self.ellips:
            phi = (self.c - phi * phi) / self.n
            at_pole = np.abs(self.ec - np.abs(phi)) <= 1e-7
            over = (np.abs(phi) > 2) & ~at_pole
            phi_it = self._phi1(np.where(at_pole | over, 0.0, phi))
            phi = np.where(at_pole,
                           np.where(phi < 0, -S.HALFPI, S.HALFPI), phi_it)
            bad = over | ~np.isfinite(phi)
        else:
            phi = (self.c - phi * phi) / self.n2
            phi = np.where(np.abs(phi) <= 1.0,
                           np.arcsin(np.clip(phi, -1, 1)),
                           np.where(phi < 0, -S.HALFPI, S.HALFPI))
        lam = np.arctan2(x, y) / self.n
        phi = np.where(zero, S.HALFPI if self.n > 0 else -S.HALFPI, phi)
        lam = np.where(zero, 0.0, lam)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Leac(Aea):
    name = "leac"

    def setup(self, ps) -> None:
        self.phi2 = ps.r("lat_1")
        self.phi1 = -S.HALFPI if ps.flag("south") else S.HALFPI
        self._setup_common()


# --------------------------------------------------------------- eqc ------


class Eqc(Operation):
    name = "eqc"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        self.rc = math.cos(ps.r("lat_ts"))
        if self.rc <= 0.0:
            raise ValueError("eqc: |lat_ts| should be < 90")
        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        return self.rc * lam, phi - self.P.phi0, z, t

    def _inv(self, x, y, z, t) -> Coords:
        return x / self.rc, y + self.P.phi0, z, t


# --------------------------------------------------------------- cea ------


class Cea(Operation):
    name = "cea"

    def setup(self, ps) -> None:
        P = self.P
        tv = 0.0
        if ps.has("lat_ts"):
            tv = ps.r("lat_ts")
            P.k0 = math.cos(tv)
            if P.k0 < 0.0:
                raise ValueError("cea: |lat_ts| should be <= 90")
        if P.es != 0.0:
            ts = math.sin(tv)
            P.k0 /= math.sqrt(1.0 - P.es * ts * ts)
            self.apa = authset(P.es)
            self.qp = float(S.qsfn(np.float64(1.0), P.e, P.one_es))

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        x = P.k0 * lam
        if P.es != 0.0:
            y = 0.5 * S.qsfn(np.sin(phi), P.e, P.one_es) / P.k0
        else:
            y = np.sin(phi) / P.k0
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        if P.es != 0.0:
            phi = authlat(np.arcsin(
                np.clip(2.0 * y * P.k0 / self.qp, -1, 1)), self.apa)
            lam = x / P.k0
            return lam, phi, z, t
        yy = y * P.k0
        tt = np.abs(yy)
        bad = (tt - 1e-10) > 1.0
        phi = np.where(tt >= 1.0,
                       np.where(yy < 0, -S.HALFPI, S.HALFPI),
                       np.arcsin(np.clip(yy, -1, 1)))
        lam = x / P.k0
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


# -------------------------------------------------------------- laea ------


class Laea(Operation):
    name = "laea"

    def setup(self, ps) -> None:
        P = self.P
        tv = abs(P.phi0)
        if tv > S.HALFPI + EPS10:
            raise ValueError("laea: |lat_0| should be <= 90")
        if abs(tv - S.HALFPI) < EPS10:
            self.mode = "s_pole" if P.phi0 < 0 else "n_pole"
        elif abs(tv) < EPS10:
            self.mode = "equit"
        else:
            self.mode = "obliq"
        if P.es != 0.0:
            self.qp = float(S.qsfn(np.float64(1.0), P.e, P.one_es))
            self.mmf = 0.5 / (1.0 - P.es)
            self.apa = authset(P.es)
            if self.mode in ("n_pole", "s_pole"):
                self.dd = 1.0
            elif self.mode == "equit":
                self.rq = math.sqrt(0.5 * self.qp)
                self.dd = 1.0 / self.rq
                self.xmf = 1.0
                self.ymf = 0.5 * self.qp
            else:
                self.rq = math.sqrt(0.5 * self.qp)
                sinphi = math.sin(P.phi0)
                self.sinb1 = float(S.qsfn(np.float64(sinphi), P.e,
                                          P.one_es)) / self.qp
                self.cosb1 = math.sqrt(1.0 - self.sinb1 * self.sinb1)
                self.dd = (math.cos(P.phi0)
                           / (math.sqrt(1.0 - P.es * sinphi * sinphi)
                              * self.rq * self.cosb1))
                self.xmf = self.rq * self.dd
                self.ymf = self.rq / self.dd
        else:
            if self.mode == "obliq":
                self.sinb1 = math.sin(P.phi0)
                self.cosb1 = math.cos(P.phi0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        sinphi = np.sin(phi)
        if P.es != 0.0:
            q = S.qsfn(sinphi, P.e, P.one_es)
            if self.mode in ("obliq", "equit"):
                sinb = q / self.qp
                cosb2 = 1.0 - sinb * sinb
                cosb = np.sqrt(np.maximum(cosb2, 0.0))
                if self.mode == "obliq":
                    b = 1.0 + self.sinb1 * sinb + self.cosb1 * cosb * coslam
                else:
                    b = 1.0 + cosb * coslam
                bad = np.abs(b) < EPS10
                b = np.sqrt(2.0 / np.where(bad, 1.0, b))
                if self.mode == "obliq":
                    y = self.ymf * b * (self.cosb1 * sinb
                                        - self.sinb1 * cosb * coslam)
                else:
                    y = b * sinb * self.ymf
                x = self.xmf * b * cosb * sinlam
                return (np.where(bad, np.inf, x), np.where(bad, np.inf, y),
                        z, t)
            if self.mode == "n_pole":
                b = S.HALFPI + phi
                q = self.qp - q
            else:
                b = phi - S.HALFPI
                q = self.qp + q
            bad = np.abs(b) < EPS10
            rt = np.sqrt(np.maximum(q, 0.0))
            x = np.where(q >= 1e-15, rt * sinlam, 0.0)
            y = np.where(q >= 1e-15,
                         coslam * (rt if self.mode == "s_pole" else -rt), 0.0)
            return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t
        # sphere
        cosphi = np.cos(phi)
        if self.mode in ("equit", "obliq"):
            if self.mode == "equit":
                yy = 1.0 + cosphi * coslam
            else:
                yy = (1.0 + self.sinb1 * sinphi
                      + self.cosb1 * cosphi * coslam)
            bad = yy <= EPS10
            yy = np.sqrt(2.0 / np.where(bad, 1.0, yy))
            x = yy * cosphi * sinlam
            y = yy * (sinphi if self.mode == "equit"
                      else self.cosb1 * sinphi
                      - self.sinb1 * cosphi * coslam)
            return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t
        cl = -coslam if self.mode == "n_pole" else coslam
        bad = np.abs(phi + self.P.phi0) < EPS10
        yy = S.FORTPI - phi * 0.5
        yy = 2.0 * (np.cos(yy) if self.mode == "s_pole" else np.sin(yy))
        x = yy * sinlam
        y = yy * cl
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        if P.es != 0.0:
            if self.mode in ("equit", "obliq"):
                x = x / self.dd
                y = y * self.dd
                rho = np.hypot(x, y)
                center = rho < EPS10
                arg = 0.5 * rho / self.rq
                bad = arg > 1
                sCe = 2.0 * np.arcsin(np.clip(arg, -1, 1))
                cCe = np.cos(sCe)
                sCe = np.sin(sCe)
                x = x * sCe
                rho_safe = np.where(center, 1.0, rho)
                if self.mode == "obliq":
                    ab = (cCe * self.sinb1
                          + y * sCe * self.cosb1 / rho_safe)
                    y = rho * self.cosb1 * cCe - y * self.sinb1 * sCe
                else:
                    ab = y * sCe / rho_safe
                    y = rho * cCe
                lam = np.arctan2(x, y)
                phi = authlat(np.arcsin(np.clip(ab, -1, 1)), self.apa)
                lam = np.where(center, 0.0, lam)
                phi = np.where(center, P.phi0, phi)
                return (np.where(bad, np.inf, lam),
                        np.where(bad, np.inf, phi), z, t)
            yy = -y if self.mode == "n_pole" else y
            q = x * x + yy * yy
            center = q == 0.0
            ab = 1.0 - q / self.qp
            if self.mode == "s_pole":
                ab = -ab
            lam = np.arctan2(x, yy)
            phi = authlat(np.arcsin(np.clip(ab, -1, 1)), self.apa)
            lam = np.where(center, 0.0, lam)
            phi = np.where(center, P.phi0, phi)
            return lam, phi, z, t
        # sphere
        rh = np.hypot(x, y)
        half = rh * 0.5
        bad = half > 1.0
        c = 2.0 * np.arcsin(np.clip(half, -1, 1))
        sinz = np.sin(c)
        cosz = np.cos(c)
        rh_safe = np.where(rh == 0, 1.0, rh)
        if self.mode == "equit":
            phi = np.where(np.abs(rh) <= EPS10, 0.0,
                           np.arcsin(np.clip(y * sinz / rh_safe, -1, 1)))
            xx = x * sinz
            yy = cosz * rh
        elif self.mode == "obliq":
            phi = np.where(
                np.abs(rh) <= EPS10, P.phi0,
                np.arcsin(np.clip(cosz * self.sinb1
                                  + y * sinz * self.cosb1 / rh_safe, -1, 1)))
            xx = x * sinz * self.cosb1
            yy = (cosz - np.sin(phi) * self.sinb1) * rh
        elif self.mode == "n_pole":
            phi = S.HALFPI - c
            xx = x
            yy = -y
        else:
            phi = c - S.HALFPI
            xx = x
            yy = y
        lam = np.where((yy == 0.0) & (self.mode in ("equit", "obliq")),
                       0.0, np.arctan2(xx, yy))
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


# -------------------------------------------------------------- stere -----


class Stere(Operation):
    name = "stere"

    def setup(self, ps) -> None:
        self.phits = abs(ps.r("lat_ts")) if ps.has("lat_ts") else S.HALFPI
        self._setup_common()

    def _setup_common(self) -> None:
        P = self.P
        tv = abs(P.phi0)
        if abs(tv - S.HALFPI) < EPS10:
            self.mode = "s_pole" if P.phi0 < 0 else "n_pole"
        else:
            self.mode = "obliq" if tv > EPS10 else "equit"
        if P.es != 0.0:
            if self.mode in ("n_pole", "s_pole"):
                if abs(self.phits - S.HALFPI) < EPS10:
                    self.akm1 = (2.0 * P.k0
                                 / math.sqrt((1 + P.e) ** (1 + P.e)
                                             * (1 - P.e) ** (1 - P.e)))
                else:
                    ts = math.sin(self.phits)
                    self.akm1 = (math.cos(self.phits)
                                 / float(S.tsfn(np.float64(self.phits),
                                                np.float64(ts), P.e)))
                    ts *= P.e
                    self.akm1 /= math.sqrt(1.0 - ts * ts)
            else:
                ts = math.sin(P.phi0)
                X = 2.0 * math.atan(self._ssfn_scalar(P.phi0, ts)) - S.HALFPI
                ts *= P.e
                self.akm1 = 2.0 * P.k0 * math.cos(P.phi0) / math.sqrt(
                    1.0 - ts * ts)
                self.sinX1 = math.sin(X)
                self.cosX1 = math.cos(X)
        else:
            if self.mode == "obliq":
                self.sinX1 = math.sin(P.phi0)
                self.cosX1 = math.cos(P.phi0)
            if self.mode in ("obliq", "equit"):
                self.akm1 = 2.0 * P.k0
            else:
                self.akm1 = (math.cos(self.phits)
                             / math.tan(S.FORTPI - 0.5 * self.phits)
                             if abs(self.phits - S.HALFPI) >= EPS10
                             else 2.0 * P.k0)

    def _ssfn_scalar(self, phit: float, sinphi: float) -> float:
        e = self.P.e
        sinphi *= e
        return (math.tan(0.5 * (S.HALFPI + phit))
                * ((1.0 - sinphi) / (1.0 + sinphi)) ** (0.5 * e))

    def _ssfn(self, phit, sinphi):
        e = self.P.e
        sinphi = sinphi * e
        return (np.tan(0.5 * (S.HALFPI + phit))
                * ((1.0 - sinphi) / (1.0 + sinphi)) ** (0.5 * e))

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        coslam = np.cos(lam)
        sinlam = np.sin(lam)
        sinphi = np.sin(phi)
        if P.es != 0.0:
            bad = np.zeros(lam.shape, dtype=bool)
            if self.mode in ("obliq", "equit"):
                X = 2.0 * np.arctan(self._ssfn(phi, sinphi)) - S.HALFPI
                sinX = np.sin(X)
                cosX = np.cos(X)
                if self.mode == "obliq":
                    denom = self.cosX1 * (1.0 + self.sinX1 * sinX
                                          + self.cosX1 * cosX * coslam)
                    bad = denom == 0
                    A = self.akm1 / np.where(bad, 1.0, denom)
                    y = A * (self.cosX1 * sinX
                             - self.sinX1 * cosX * coslam)
                else:
                    denom = 1.0 + cosX * coslam
                    A = self.akm1 / np.where(denom == 0, 1.0, denom)
                    y = np.where(denom == 0, np.inf, A * sinX)
                x = A * cosX
            else:
                phi_e = np.where(self.mode == "s_pole", -phi, phi) \
                    if self.mode == "s_pole" else phi
                if self.mode == "s_pole":
                    phi_e = -phi
                    coslam = -coslam
                    sinphi = -sinphi
                else:
                    phi_e = phi
                x = np.where(np.abs(phi_e - S.HALFPI) < 1e-15, 0.0,
                             self.akm1 * S.tsfn(phi_e, sinphi, P.e))
                y = -x * coslam
            x = x * sinlam
            return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t
        # sphere
        cosphi = np.cos(phi)
        bad = np.zeros(lam.shape, dtype=bool)
        if self.mode in ("equit", "obliq"):
            if self.mode == "equit":
                yy = 1.0 + cosphi * coslam
            else:
                yy = (1.0 + self.sinX1 * sinphi
                      + self.cosX1 * cosphi * coslam)
            bad = yy <= EPS10
            yy = self.akm1 / np.where(bad, 1.0, yy)
            x = yy * cosphi * sinlam
            y = yy * (sinphi if self.mode == "equit"
                      else self.cosX1 * sinphi
                      - self.sinX1 * cosphi * coslam)
        else:
            if self.mode == "n_pole":
                coslam = -coslam
                phi = -phi
            bad = np.abs(phi - S.HALFPI) < 1e-8
            yy = self.akm1 * np.tan(S.FORTPI + 0.5 * phi)
            x = sinlam * yy
            y = yy * coslam
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        if P.es != 0.0:
            rho = np.hypot(x, y)
            if self.mode in ("obliq", "equit"):
                tp = 2.0 * np.arctan2(rho * self.cosX1, self.akm1)
                cosphi = np.cos(tp)
                sinphi = np.sin(tp)
                rho_safe = np.where(rho == 0, 1.0, rho)
                phi_l = np.where(
                    rho == 0.0,
                    np.arcsin(np.clip(cosphi * self.sinX1, -1, 1)),
                    np.arcsin(np.clip(cosphi * self.sinX1
                                      + y * sinphi * self.cosX1 / rho_safe,
                                      -1, 1)))
                tp = np.tan(0.5 * (S.HALFPI + phi_l))
                x = x * sinphi
                y = rho * self.cosX1 * cosphi - y * self.sinX1 * sinphi
                halfpi = S.HALFPI
                halfe = 0.5 * P.e
            else:
                yy = -y if self.mode == "n_pole" else y
                y = yy
                tp = -rho / self.akm1
                phi_l = S.HALFPI - 2.0 * np.arctan(tp)
                halfpi = -S.HALFPI
                halfe = -0.5 * P.e
            phi = phi_l
            conv = np.zeros(phi.shape, dtype=bool)
            for _ in range(8):
                sinphi = P.e * np.sin(phi_l)
                phi = (2.0 * np.arctan(
                    tp * ((1.0 + sinphi) / (1.0 - sinphi)) ** halfe)
                    - halfpi)
                conv = conv | (np.abs(phi_l - phi) < 1e-10)
                phi_l = phi
            bad = ~conv
            if self.mode == "s_pole":
                phi = -phi
            lam = np.where((x == 0.0) & (y == 0.0), 0.0, np.arctan2(x, y))
            return (np.where(bad, np.inf, lam),
                    np.where(bad, np.inf, phi), z, t)
        rh = np.hypot(x, y)
        c = 2.0 * np.arctan(rh / self.akm1)
        sinc = np.sin(c)
        cosc = np.cos(c)
        rh_safe = np.where(rh == 0, 1.0, rh)
        if self.mode == "equit":
            phi = np.where(np.abs(rh) <= EPS10, 0.0,
                           np.arcsin(np.clip(y * sinc / rh_safe, -1, 1)))
            lam = np.where((cosc != 0.0) | (x != 0.0),
                           np.arctan2(x * sinc, cosc * rh), 0.0)
        elif self.mode == "obliq":
            phi = np.where(
                np.abs(rh) <= EPS10, P.phi0,
                np.arcsin(np.clip(cosc * self.sinX1
                                  + y * sinc * self.cosX1 / rh_safe, -1, 1)))
            cc = cosc - self.sinX1 * np.sin(phi)
            lam = np.where((cc != 0.0) | (x != 0.0),
                           np.arctan2(x * sinc * self.cosX1, cc * rh), 0.0)
        else:
            yy = -y if self.mode == "n_pole" else y
            phi = np.where(np.abs(rh) <= EPS10, P.phi0,
                           np.arcsin(np.clip(
                               -cosc if self.mode == "s_pole" else cosc,
                               -1, 1)))
            lam = np.where((x == 0.0) & (yy == 0.0), 0.0,
                           np.arctan2(x, yy))
        return lam, phi, z, t


class Ups(Stere):
    name = "ups"

    def setup(self, ps) -> None:
        P = self.P
        if P.es == 0.0:
            raise ValueError("ups requires an ellipsoid")
        P.phi0 = -S.HALFPI if ps.flag("south") else S.HALFPI
        P.k0 = 0.994
        P.x0 = 2000000.0
        P.y0 = 2000000.0
        P.lam0 = 0.0
        self.phits = S.HALFPI
        self._setup_common()


def register_all(register) -> None:
    register(Guyou)
    register(PeirceQ)
    register(AdamsHemi)
    register(AdamsWs1)
    register(AdamsWs2)
    register(Aea)
    register(Leac)
    register(Eqc)
    register(Cea)
    register(Laea)
    register(Stere)
    register(Ups)
    try:
        from proj_ray.ops import projections3 as p3

        p3.register_all(register)
    except ImportError:
        pass
