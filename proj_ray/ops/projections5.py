"""Fifth wave: the pseudocylindrical / miscellaneous spherical long tail.

Re-derivations of the corresponding reference files in
src/projections/: eck1-eck5 (+eck3 family putp1/wag6/kav7), putp2,
putp3/putp3p, putp4p/weren, putp5/putp5p, putp6/putp6p, wag2, wag3, wag7,
urmfps/wag1, sts family (kav5, qua_aut, fouc, mbt_s), fouc_s, urm5,
boggs, collg, crast, denoy, fahey, nell, nell_h, loxim, wink1, wink2,
natearth, natearth2, eqearth, hammer, aitoff/wintri, lask, gins8, larr,
nicol, august. All spherical-only ops force es=0 like the reference.
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation
from proj_ray.ops.projections2 import aasin, authlat, authset, \
    generic_inverse_2d

EPS10 = 1e-10


class _Sph(Operation):
    """Base for spherical-only ops (reference sets P->es = 0)."""

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)
        self._setup(ps)

    def _setup(self, ps) -> None:
        pass


class Eck1(_Sph):
    name = "eck1"
    FC = 0.92131773192356127802
    RP = 0.31830988618379067154

    def _fwd(self, lam, phi, z, t) -> Coords:
        x = self.FC * lam * (1.0 - self.RP * np.abs(phi))
        return x, self.FC * phi, z, t

    def _inv(self, x, y, z, t) -> Coords:
        phi = y / self.FC
        lam = x / (self.FC * (1.0 - self.RP * np.abs(phi)))
        return lam, phi, z, t


class Eck2(_Sph):
    name = "eck2"
    FXC = 0.46065886596178063902
    FYC = 1.44720250911653531871

    def _fwd(self, lam, phi, z, t) -> Coords:
        yy = np.sqrt(4.0 - 3.0 * np.sin(np.abs(phi)))
        x = self.FXC * lam * yy
        y = self.FYC * (2.0 - yy)
        y = np.where(phi < 0.0, -y, y)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        ay = 2.0 - np.abs(y) / self.FYC
        lam = x / (self.FXC * ay)
        phi = (4.0 - ay * ay) / 3.0
        bad = np.abs(phi) > 1.0000001
        phi = np.where(np.abs(phi) >= 1.0,
                       np.where(phi < 0, -S.HALFPI, S.HALFPI),
                       np.arcsin(np.clip(phi, -1, 1)))
        phi = np.where(y < 0, -phi, phi)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class _Eck3Base(_Sph):
    C_x = C_y = A = B = 0.0

    def _fwd(self, lam, phi, z, t) -> Coords:
        y = self.C_y * phi
        x = self.C_x * lam * (self.A + np.sqrt(np.maximum(
            1.0 - self.B * phi * phi, 0.0)))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        phi = y / self.C_y
        den = self.C_x * (self.A + np.sqrt(np.maximum(
            1.0 - self.B * phi * phi, 0.0)))
        lam = np.where(den == 0, np.inf, x / np.where(den == 0, 1, den))
        return lam, phi, z, t


class Eck3(_Eck3Base):
    name = "eck3"
    C_x = 0.42223820031577120149
    C_y = 0.84447640063154240298
    A = 1.0
    B = 0.4052847345693510857755


class Putp1(_Eck3Base):
    name = "putp1"
    C_x = 1.89490
    C_y = 0.94745
    A = -0.5
    B = 0.30396355092701331433


class Wag6(_Eck3Base):
    name = "wag6"
    C_x = 0.94745
    C_y = 0.94745
    A = 0.0
    B = 0.30396355092701331433


class Kav7(_Eck3Base):
    name = "kav7"
    C_x = 0.8660254037844
    C_y = 1.0
    A = 0.0
    B = 0.30396355092701331433


class Eck4(_Sph):
    name = "eck4"
    C_x = 0.42223820031577120149
    C_y = 1.32650042817700232218
    RC_y = 0.75386330736002178205
    C_p = 3.57079632679489661922
    RC_p = 0.28004957675577868795

    def _fwd(self, lam, phi, z, t) -> Coords:
        p = self.C_p * np.sin(phi)
        V = phi * phi
        theta = phi * (0.895168 + V * (0.0218849 + V * 0.00826809))
        conv = np.zeros(theta.shape, dtype=bool)
        for _ in range(6):
            c = np.cos(theta)
            s = np.sin(theta)
            V = (theta + s * (c + 2.0) - p) / (1.0 + c * (c + 2.0) - s * s)
            theta = theta - np.where(conv, 0.0, V)
            conv = conv | (np.abs(V) < 1e-7)
        x = np.where(conv, self.C_x * lam * (1.0 + np.cos(theta)),
                     self.C_x * lam)
        y = np.where(conv, self.C_y * np.sin(theta),
                     np.where(theta < 0, -self.C_y, self.C_y))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        st = y * self.RC_y
        ood = np.abs(st) > 1.00000000000001  # aasin ONE_TOL (aasincos.cpp)
        near_pole = (1.0 - np.abs(st) >= 0.0) & (1.0 - np.abs(st) <= 1e-12)
        theta = aasin(st)
        ct = np.cos(theta)
        lam = np.where(near_pole, x / self.C_x,
                       x / (self.C_x * (1.0 + ct)))
        phi = np.where(near_pole,
                       np.where(st > 0, S.HALFPI, -S.HALFPI),
                       aasin((theta + st * (ct + 2.0)) * self.RC_p))
        over = np.abs(lam) - np.pi
        bad = (over > 1e-10) | ood
        lam = np.where((over > 0) & ~bad,
                       np.where(lam > 0, np.pi, -np.pi), lam)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Eck5(_Sph):
    name = "eck5"
    XF = 0.44101277172455148219
    RXF = 2.26750802723822639137
    YF = 0.88202554344910296438
    RYF = 1.13375401361911319568

    def _fwd(self, lam, phi, z, t) -> Coords:
        return self.XF * (1.0 + np.cos(phi)) * lam, self.YF * phi, z, t

    def _inv(self, x, y, z, t) -> Coords:
        phi = self.RYF * y
        return self.RXF * x / (1.0 + np.cos(phi)), phi, z, t


class Putp2(_Sph):
    name = "putp2"
    C_x = 1.89490
    C_y = 1.71848
    C_p = 0.6141848493043784

    def _fwd(self, lam, phi, z, t) -> Coords:
        p = self.C_p * np.sin(phi)
        ph = phi * (0.615709 + phi * phi * (0.00909953
                                            + phi * phi * 0.0046292))
        conv = np.zeros(ph.shape, dtype=bool)
        for _ in range(10):
            c = np.cos(ph)
            s = np.sin(ph)
            V = (ph + s * (c - 1.0) - p) / (1.0 + c * (c - 1.0) - s * s)
            ph = ph - np.where(conv, 0.0, V)
            conv = conv | (np.abs(V) < 1e-10)
        ph = np.where(conv, ph,
                      np.where(ph < 0, -1.0471975511965977,
                               1.0471975511965977))
        x = self.C_x * lam * (np.cos(ph) - 0.5)
        y = self.C_y * np.sin(ph)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        ph = aasin(y / self.C_y)
        c = np.cos(ph)
        lam = x / (self.C_x * (c - 0.5))
        phi = aasin((ph + np.sin(ph) * (c - 1.0)) / self.C_p)
        return lam, phi, z, t


class Putp3(_Sph):
    name = "putp3"
    C = 0.79788456
    A = 4.0 * 0.1013211836

    def _fwd(self, lam, phi, z, t) -> Coords:
        return self.C * lam * (1.0 - self.A * phi * phi), self.C * phi, z, t

    def _inv(self, x, y, z, t) -> Coords:
        phi = y / self.C
        return x / (self.C * (1.0 - self.A * phi * phi)), phi, z, t


class Putp3p(Putp3):
    name = "putp3p"
    A = 2.0 * 0.1013211836


class Putp4p(_Sph):
    name = "putp4p"
    C_x = 0.874038744
    C_y = 3.883251825

    def _fwd(self, lam, phi, z, t) -> Coords:
        ph = aasin(0.883883476 * np.sin(phi))
        x = self.C_x * lam * np.cos(ph)
        ph = ph / 3.0
        x = x / np.cos(ph)
        y = self.C_y * np.sin(ph)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        ph = aasin(y / self.C_y)
        lam = x * np.cos(ph) / self.C_x
        ph = ph * 3.0
        lam = lam / np.cos(ph)
        phi = aasin(1.13137085 * np.sin(ph))
        return lam, phi, z, t


class Weren(Putp4p):
    name = "weren"
    C_x = 1.0
    C_y = 4.442882938


class Putp5(_Sph):
    name = "putp5"
    C = 1.01346
    D = 1.2158542
    A = 2.0
    B = 1.0

    def _fwd(self, lam, phi, z, t) -> Coords:
        x = self.C * lam * (self.A - self.B * np.sqrt(
            1.0 + self.D * phi * phi))
        return x, self.C * phi, z, t

    def _inv(self, x, y, z, t) -> Coords:
        phi = y / self.C
        lam = x / (self.C * (self.A - self.B * np.sqrt(
            1.0 + self.D * phi * phi)))
        return lam, phi, z, t


class Putp5p(Putp5):
    name = "putp5p"
    A = 1.5
    B = 0.5


class Putp6(_Sph):
    name = "putp6"
    C_x = 1.01346
    C_y = 0.91910
    A = 4.0
    B = 2.1471437182129378784
    D = 2.0

    def _fwd(self, lam, phi, z, t) -> Coords:
        p = self.B * np.sin(phi)
        ph = phi * 1.10265779
        conv = np.zeros(ph.shape, dtype=bool)
        for _ in range(10):
            r = np.sqrt(1.0 + ph * ph)
            V = ((self.A - r) * ph - np.log(ph + r) - p) / (self.A - 2.0 * r)
            ph = ph - np.where(conv, 0.0, V)
            conv = conv | (np.abs(V) < 1e-10)
        CON = 1.732050807568877
        sq = np.where(conv, np.sqrt(1.0 + ph * ph), 2.0)
        ph = np.where(conv, ph, np.where(p < 0, -CON, CON))
        x = self.C_x * lam * (self.D - sq)
        y = self.C_y * ph
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        ph = y / self.C_y
        r = np.sqrt(1.0 + ph * ph)
        lam = x / (self.C_x * (self.D - r))
        phi = aasin(((self.A - r) * ph - np.log(ph + r)) / self.B)
        return lam, phi, z, t


class Putp6p(Putp6):
    name = "putp6p"
    C_x = 0.44329
    C_y = 0.80404
    A = 6.0
    B = 5.61125
    D = 3.0


class Wag2(_Sph):
    name = "wag2"
    C_x = 0.92483
    C_y = 1.38725
    C_p1 = 0.88022
    C_p2 = 0.88550

    def _fwd(self, lam, phi, z, t) -> Coords:
        ph = aasin(self.C_p1 * np.sin(self.C_p2 * phi))
        return self.C_x * lam * np.cos(ph), self.C_y * ph, z, t

    def _inv(self, x, y, z, t) -> Coords:
        ph = y / self.C_y
        lam = x / (self.C_x * np.cos(ph))
        phi = aasin(np.sin(ph) / self.C_p1) / self.C_p2
        return lam, phi, z, t


class Wag3(_Sph):
    name = "wag3"

    def _setup(self, ps) -> None:
        ts = ps.r("lat_ts")
        self.C_x = math.cos(ts) / math.cos(2.0 * ts / 3.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        return self.C_x * lam * np.cos(2.0 / 3.0 * phi), phi, z, t

    def _inv(self, x, y, z, t) -> Coords:
        return x / (self.C_x * np.cos(2.0 / 3.0 * y)), y, z, t


class Wag7(_Sph):
    name = "wag7"

    def _fwd(self, lam, phi, z, t) -> Coords:
        y = 0.90630778703664996 * np.sin(phi)
        theta = np.arcsin(np.clip(y, -1, 1))
        ct = np.cos(theta)
        lm = lam / 3.0
        x = 2.66723 * ct * np.sin(lm)
        D = 1.0 / np.sqrt(0.5 * (1.0 + ct * np.cos(lm)))
        return x * D, y * 1.24104 * D, z, t


class Urmfps(_Sph):
    name = "urmfps"
    C_x = 0.8773826753
    Cy = 1.139753528477

    def _setup(self, ps) -> None:
        if not ps.has("n"):
            raise ValueError("urmfps: missing n")
        self.n = ps.f("n")
        if not (0.0 < self.n <= 1.0):
            raise ValueError("urmfps: n must be in ]0,1]")
        self.C_y = self.Cy / self.n

    def _fwd(self, lam, phi, z, t) -> Coords:
        ph = aasin(self.n * np.sin(phi))
        return self.C_x * lam * np.cos(ph), self.C_y * ph, z, t

    def _inv(self, x, y, z, t) -> Coords:
        yy = y / self.C_y
        phi = aasin(np.sin(yy) / self.n)
        lam = x / (self.C_x * np.cos(yy))
        return lam, phi, z, t


class Wag1(Urmfps):
    name = "wag1"

    def _setup(self, ps) -> None:
        self.n = 0.8660254037844386467637231707
        self.C_y = self.Cy / self.n


class _StsBase(_Sph):
    p = q = 1.0
    tan_mode = False

    def _setup(self, ps) -> None:
        self.C_x = self.q / self.p
        self.C_y = self.p
        self.C_p = 1.0 / self.q

    def _fwd(self, lam, phi, z, t) -> Coords:
        x = self.C_x * lam * np.cos(phi)
        ph = phi * self.C_p
        c = np.cos(ph)
        if self.tan_mode:
            x = x * c * c
            y = self.C_y * np.tan(ph)
        else:
            x = x / c
            y = self.C_y * np.sin(ph)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        yy = y / self.C_y
        ph = np.arctan(yy) if self.tan_mode else aasin(yy)
        c = np.cos(ph)
        phi = ph / self.C_p
        lam = x / (self.C_x * np.cos(phi))
        if self.tan_mode:
            lam = lam / (c * c)
        else:
            lam = lam * c
        return lam, phi, z, t


class Fouc(_StsBase):
    name = "fouc"
    p = 2.0
    q = 2.0
    tan_mode = True


class Kav5(_StsBase):
    name = "kav5"
    p = 1.50488
    q = 1.35439


class QuaAut(_StsBase):
    name = "qua_aut"
    p = 2.0
    q = 2.0


class MbtS(_StsBase):
    name = "mbt_s"
    p = 1.48875
    q = 1.36509


class FoucS(_Sph):
    name = "fouc_s"

    def _setup(self, ps) -> None:
        self.n = ps.f("n")
        if self.n < 0.0 or self.n > 1.0:
            raise ValueError("fouc_s: n must be in [0,1]")
        self.n1 = 1.0 - self.n

    def _fwd(self, lam, phi, z, t) -> Coords:
        c = np.cos(phi)
        x = lam * c / (self.n + self.n1 * c)
        y = self.n * phi + self.n1 * np.sin(phi)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        if self.n != 0.0:
            phi = np.array(y, copy=True)
            conv = np.zeros(phi.shape, dtype=bool)
            for _ in range(10):
                V = ((self.n * phi + self.n1 * np.sin(phi) - y)
                     / (self.n + self.n1 * np.cos(phi)))
                phi = phi - np.where(conv, 0.0, V)
                conv = conv | (np.abs(V) < 1e-7)
            phi = np.where(conv, phi,
                           np.where(y < 0, -S.HALFPI, S.HALFPI))
        else:
            phi = aasin(y)
        V = np.cos(phi)
        lam = x * (self.n + self.n1 * V) / V
        return lam, phi, z, t


class Urm5(_Sph):
    name = "urm5"

    def _setup(self, ps) -> None:
        if not ps.has("n"):
            raise ValueError("urm5: missing n")
        self.n = ps.f("n")
        if not (0.0 < self.n <= 1.0):
            raise ValueError("urm5: n in ]0,1]")
        self.q3 = ps.f("q") / 3.0
        alpha = ps.r("alpha")
        tv = self.n * math.sin(alpha)
        denom = math.sqrt(1.0 - tv * tv)
        if denom == 0:
            raise ValueError("urm5: n*sin(|alpha|) must be < 1")
        self.m = math.cos(alpha) / denom
        self.rmn = 1.0 / (self.m * self.n)

    def _fwd(self, lam, phi, z, t) -> Coords:
        ph = aasin(self.n * np.sin(phi))
        x = self.m * lam * np.cos(ph)
        t2 = ph * ph
        y = ph * (1.0 + t2 * self.q3) * self.rmn
        return x, y, z, t


class Boggs(_Sph):
    name = "boggs"

    def _fwd(self, lam, phi, z, t) -> Coords:
        theta = np.array(phi, copy=True)
        at_pole = np.abs(np.abs(phi) - S.HALFPI) < 1e-7
        c = np.sin(theta) * np.pi
        conv = np.zeros(theta.shape, dtype=bool)
        for _ in range(20):
            th1 = (theta + np.sin(theta) - c) / (1.0 + np.cos(theta))
            theta = theta - np.where(conv, 0.0, th1)
            conv = conv | (np.abs(th1) < 1e-7)
        theta = theta * 0.5
        with np.errstate(divide="ignore", invalid="ignore"):
            x = 2.00276 * lam / (1.0 / np.cos(phi) + 1.11072 / np.cos(theta))
        x = np.where(at_pole, 0.0, x)
        y = 0.49931 * (phi + math.sqrt(2) * np.sin(theta))
        return x, y, z, t


class Collg(_Sph):
    name = "collg"
    FXC = 1.12837916709551257390
    FYC = 1.77245385090551602729

    def _fwd(self, lam, phi, z, t) -> Coords:
        yy = np.sqrt(np.maximum(1.0 - np.sin(phi), 0.0))
        x = self.FXC * lam * yy
        y = self.FYC * (1.0 - yy)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        ph = y / self.FYC - 1.0
        ph = 1.0 - ph * ph
        bad = (np.abs(ph) >= 1.0) & (np.abs(ph) > 1.0000001)
        phi = np.where(np.abs(ph) < 1.0, np.arcsin(np.clip(ph, -1, 1)),
                       np.where(ph < 0, -S.HALFPI, S.HALFPI))
        ll = np.maximum(1.0 - np.sin(phi), 0.0)
        lam = np.where(ll <= 0.0, 0.0,
                       x / (self.FXC * np.sqrt(np.where(ll <= 0, 1, ll))))
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Crast(_Sph):
    name = "crast"
    XM = 0.97720502380583984317
    RXM = 1.02332670794648848847
    YM = 3.06998012383946546542
    RYM = 0.32573500793527994772

    def _fwd(self, lam, phi, z, t) -> Coords:
        ph = phi / 3.0
        x = self.XM * lam * (2.0 * np.cos(ph + ph) - 1.0)
        y = self.YM * np.sin(ph)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        phi = 3.0 * np.arcsin(np.clip(y * self.RYM, -1, 1))
        lam = x * self.RXM / (2.0 * np.cos((phi + phi) / 3.0) - 1.0)
        return lam, phi, z, t


class Denoy(_Sph):
    name = "denoy"

    def _fwd(self, lam, phi, z, t) -> Coords:
        C0, C1, C3 = 0.95, -1 / 12.0, 1 / 600.0
        D1, D5 = 0.9, 0.03
        al = np.abs(lam)
        x = lam * np.cos((C0 + al * (C1 + al * al * C3))
                         * (phi * (D1 + D5 * phi ** 4)))
        return x, phi, z, t


class Fahey(_Sph):
    name = "fahey"

    def _fwd(self, lam, phi, z, t) -> Coords:
        tt = np.tan(0.5 * phi)
        y = 1.819152 * tt
        x = 0.819152 * lam * np.sqrt(np.maximum(1 - tt * tt, 0.0))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        yy = y / 1.819152
        phi = 2.0 * np.arctan(yy)
        yy = 1.0 - yy * yy
        lam = np.where(np.abs(yy) < 1e-6, 0.0,
                       x / (0.819152 * np.sqrt(np.abs(yy))))
        return lam, phi, z, t


class Nell(_Sph):
    name = "nell"

    def _fwd(self, lam, phi, z, t) -> Coords:
        k = 2.0 * np.sin(phi)
        V2 = phi * phi
        ph = phi * (1.00371 + V2 * (-0.0935382 + V2 * -0.011412))
        conv = np.zeros(ph.shape, dtype=bool)
        for _ in range(10):
            V = (ph + np.sin(ph) - k) / (1.0 + np.cos(ph))
            ph = ph - np.where(conv, 0.0, V)
            conv = conv | (np.abs(V) < 1e-7)
        x = 0.5 * lam * (1.0 + np.cos(ph))
        return x, ph, z, t

    def _inv(self, x, y, z, t) -> Coords:
        lam = 2.0 * x / (1.0 + np.cos(y))
        phi = aasin(0.5 * (y + np.sin(y)))
        return lam, phi, z, t


class NellH(_Sph):
    name = "nell_h"

    def _fwd(self, lam, phi, z, t) -> Coords:
        x = 0.5 * lam * (1.0 + np.cos(phi))
        y = 2.0 * (phi - np.tan(0.5 * phi))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        p = 0.5 * y
        phi = np.zeros_like(y)
        conv = np.zeros(phi.shape, dtype=bool)
        for _ in range(9):
            c = np.cos(0.5 * phi)
            V = (phi - np.tan(phi / 2) - p) / (1.0 - 0.5 / (c * c))
            phi = phi - np.where(conv, 0.0, V)
            conv = conv | (np.abs(V) < 1e-7)
        lam = np.where(conv, 2.0 * x / (1.0 + np.cos(phi)), 2.0 * x)
        phi = np.where(conv, phi, np.where(p < 0, -S.HALFPI, S.HALFPI))
        return lam, phi, z, t


class Loxim(_Sph):
    name = "loxim"

    def _setup(self, ps) -> None:
        self.phi1 = ps.r("lat_1")
        self.cosphi1 = math.cos(self.phi1)
        if self.cosphi1 < 1e-8:
            raise ValueError("loxim: |lat_1| should be < 90")
        self.tanphi1 = math.tan(S.FORTPI + 0.5 * self.phi1)

    def _fwd(self, lam, phi, z, t) -> Coords:
        EPS = 1e-8
        y = phi - self.phi1
        near = np.abs(y) < EPS
        A = S.FORTPI + 0.5 * phi
        degen = (np.abs(A) < EPS) | (np.abs(np.abs(A) - S.HALFPI) < EPS)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_gen = lam * y / np.log(np.tan(A) / self.tanphi1)
        x = np.where(near, lam * self.cosphi1,
                     np.where(degen, 0.0, x_gen))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        EPS = 1e-8
        phi = y + self.phi1
        near = np.abs(y) < EPS
        A = S.FORTPI + 0.5 * phi
        degen = (np.abs(A) < EPS) | (np.abs(np.abs(A) - S.HALFPI) < EPS)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_gen = x * np.log(np.tan(A) / self.tanphi1) / y
        lam = np.where(near, x / self.cosphi1,
                       np.where(degen, 0.0, lam_gen))
        return lam, phi, z, t


class Wink1(_Sph):
    name = "wink1"

    def _setup(self, ps) -> None:
        self.cosphi1 = math.cos(ps.r("lat_ts"))

    def _fwd(self, lam, phi, z, t) -> Coords:
        return 0.5 * lam * (self.cosphi1 + np.cos(phi)), phi, z, t

    def _inv(self, x, y, z, t) -> Coords:
        return 2.0 * x / (self.cosphi1 + np.cos(y)), y, z, t


class Wink2(_Sph):
    name = "wink2"

    def _setup(self, ps) -> None:
        self.cosphi1 = math.cos(ps.r("lat_1"))

    def _fwd(self, lam, phi, z, t) -> Coords:
        ybase = phi * (2.0 / np.pi)
        k = np.pi * np.sin(phi)
        ph = phi * 1.8
        conv = np.zeros(ph.shape, dtype=bool)
        for _ in range(10):
            V = (ph + np.sin(ph) - k) / (1.0 + np.cos(ph))
            ph = ph - np.where(conv, 0.0, V)
            conv = conv | (np.abs(V) < 1e-7)
        ph = np.where(conv, ph * 0.5,
                      np.where(ph < 0, -S.HALFPI, S.HALFPI))
        x = 0.5 * lam * (np.cos(ph) + self.cosphi1)
        y = S.FORTPI * (np.sin(ph) + ybase)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        lam, phi, bad = generic_inverse_2d(
            lambda la, ph: self._fwd(la, ph, np.zeros_like(la),
                                     np.zeros_like(la))[:2],
            x, y, x, y)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Natearth(_Sph):
    name = "natearth"
    A = (0.8707, -0.131979, -0.013791, 0.003971, -0.001529)
    B = (1.007226, 0.015085, -0.044475, 0.028874, -0.005916)
    MAX_Y = 0.8707 * 0.52 * np.pi

    def _fwd(self, lam, phi, z, t) -> Coords:
        A0, A1, A2, A3, A4 = self.A
        B0, B1, B2, B3, B4 = self.B
        p2 = phi * phi
        p4 = p2 * p2
        x = lam * (A0 + p2 * (A1 + p2 * (A2 + p4 * p2 * (A3 + p2 * A4))))
        y = phi * (B0 + p2 * (B1 + p4 * (B2 + B3 * p2 + B4 * p4)))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        A0, A1, A2, A3, A4 = self.A
        B0, B1, B2, B3, B4 = self.B
        C0, C1, C2, C3, C4 = B0, 3 * B1, 7 * B2, 9 * B3, 11 * B4
        yc = np.clip(y, -self.MAX_Y, self.MAX_Y)
        target = yc.copy()
        conv = np.zeros(yc.shape, dtype=bool)
        for _ in range(100):
            y2 = yc * yc
            y4 = y2 * y2
            f = yc * (B0 + y2 * (B1 + y4 * (B2 + B3 * y2 + B4 * y4))) \
                - target
            fder = C0 + y2 * (C1 + y4 * (C2 + C3 * y2 + C4 * y4))
            tol = f / fder
            yc = yc - np.where(conv, 0.0, tol)
            conv = conv | (np.abs(tol) < 1e-11)
            if conv.all():
                break
        phi = yc
        y2 = yc * yc
        lam = x / (A0 + y2 * (A1 + y2 * (A2 + y2 * y2 * y2 * (A3
                                                              + y2 * A4))))
        return lam, phi, z, t


class Natearth2(_Sph):
    name = "natearth2"
    A = (0.84719, -0.13063, -0.04515, 0.05494, -0.02326, 0.00331)
    B = (1.01183, -0.02625, 0.01926, -0.00396)
    MAX_Y = 0.84719 * 0.535117535153096 * np.pi

    def _fwd(self, lam, phi, z, t) -> Coords:
        A0, A1, A2, A3, A4, A5 = self.A
        B0, B1, B2, B3 = self.B
        p2 = phi * phi
        p4 = p2 * p2
        p6 = p2 * p4
        x = lam * (A0 + A1 * p2 + p6 * p6 * (A2 + A3 * p2 + A4 * p4
                                             + A5 * p6))
        y = phi * (B0 + p4 * p4 * (B1 + B2 * p2 + B3 * p4))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        A0, A1, A2, A3, A4, A5 = self.A
        B0, B1, B2, B3 = self.B
        C0, C1, C2, C3 = B0, 9 * B1, 11 * B2, 13 * B3
        yc = np.clip(y, -self.MAX_Y, self.MAX_Y)
        target = yc.copy()
        conv = np.zeros(yc.shape, dtype=bool)
        for _ in range(100):
            y2 = yc * yc
            y4 = y2 * y2
            f = yc * (B0 + y4 * y4 * (B1 + B2 * y2 + B3 * y4)) - target
            fder = C0 + y4 * y4 * (C1 + C2 * y2 + C3 * y4)
            tol = f / fder
            yc = yc - np.where(conv, 0.0, tol)
            conv = conv | (np.abs(tol) < 1e-11)
            if conv.all():
                break
        phi = yc
        y2 = yc * yc
        y4 = y2 * y2
        y6 = y2 * y4
        lam = x / (A0 + A1 * y2 + y6 * y6 * (A2 + A3 * y2 + A4 * y4
                                             + A5 * y6))
        return lam, phi, z, t


class Eqearth(Operation):
    """Equal Earth (sph & ell via authalic latitude)."""

    name = "eqearth"
    A1 = 1.340264
    A2 = -0.081106
    A3 = 0.000893
    A4 = 0.003796
    M = math.sqrt(3.0) / 2.0
    MAX_Y = 1.3173627591574

    def setup(self, ps) -> None:
        P = self.P
        if P.es != 0.0:
            self.qp = float(S.qsfn(np.float64(1.0), P.e, P.one_es))
            self.apa = authset(P.es)
            self.rqda = math.sqrt(0.5 * self.qp)
        else:
            self.qp = 2.0
            self.rqda = 1.0

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        sbeta = np.sin(phi)
        if P.es != 0.0:
            sbeta = S.qsfn(sbeta, P.e, P.one_es) / self.qp
            sbeta = np.clip(sbeta, -1, 1)
        psi = np.arcsin(self.M * sbeta)
        psi2 = psi * psi
        psi6 = psi2 * psi2 * psi2
        x = lam * np.cos(psi) / (self.M * (
            self.A1 + 3 * self.A2 * psi2
            + psi6 * (7 * self.A3 + 9 * self.A4 * psi2)))
        y = psi * (self.A1 + self.A2 * psi2
                   + psi6 * (self.A3 + self.A4 * psi2))
        return x * self.rqda, y * self.rqda, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        x = x / self.rqda
        y = y / self.rqda
        at_pole = np.abs(y) >= self.MAX_Y
        yc = np.clip(y, -self.MAX_Y, self.MAX_Y)
        target = yc.copy()
        conv = np.zeros(yc.shape, dtype=bool)
        for _ in range(12):
            y2 = yc * yc
            y6 = y2 * y2 * y2
            f = yc * (self.A1 + self.A2 * y2
                      + y6 * (self.A3 + self.A4 * y2)) - target
            fder = self.A1 + 3 * self.A2 * y2 \
                + y6 * (7 * self.A3 + 9 * self.A4 * y2)
            tol = f / fder
            yc = yc - np.where(conv, 0.0, tol)
            conv = conv | (np.abs(tol) < 1e-11)
            if conv.all():
                break
        bad = ~conv
        y2 = yc * yc
        y6 = y2 * y2 * y2
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = (self.M * x * (self.A1 + 3 * self.A2 * y2
                                 + y6 * (7 * self.A3 + 9 * self.A4 * y2))
                   / np.cos(yc))
            sbeta = np.sin(yc) / self.M
        sbeta = np.clip(sbeta, -1, 1)
        if P.es != 0.0:
            phi = authlat(np.arcsin(sbeta), self.apa)
        else:
            phi = np.arcsin(sbeta)
        phi = np.where(at_pole, np.where(y < 0, -S.HALFPI, S.HALFPI), phi)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Hammer(_Sph):
    name = "hammer"

    def _setup(self, ps) -> None:
        self.w = abs(ps.f("W", 0.5)) if ps.has("W") else 0.5
        if self.w <= 0:
            raise ValueError("hammer: W must be > 0")
        m = abs(ps.f("M", 1.0)) if ps.has("M") else 1.0
        if m <= 0:
            raise ValueError("hammer: M must be > 0")
        self.rm = 1.0 / m
        self.m = m / self.w

    def _fwd(self, lam, phi, z, t) -> Coords:
        cosphi = np.cos(phi)
        lm = lam * self.w
        denom = 1.0 + cosphi * np.cos(lm)
        bad = denom == 0.0
        d = np.sqrt(2.0 / np.where(bad, 1.0, denom))
        x = self.m * d * cosphi * np.sin(lm)
        y = self.rm * d * np.sin(phi)
        return np.where(bad, np.inf, x), np.where(bad, np.inf, y), z, t

    def _inv(self, x, y, z, t) -> Coords:
        zz = np.sqrt(np.maximum(
            1.0 - 0.25 * self.w * self.w * x * x - 0.25 * y * y, 0.0))
        bad = np.abs(2.0 * zz * zz - 1.0) < 1e-10
        with np.errstate(invalid="ignore"):
            lam = np.arctan2(self.w * x * zz, 2.0 * zz * zz - 1) / self.w
            phi = aasin(zz * y)
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Aitoff(_Sph):
    name = "aitoff"
    winkel = False

    def _setup(self, ps) -> None:
        if self.winkel:
            if ps.has("lat_1"):
                self.cosphi1 = math.cos(ps.r("lat_1"))
                if self.cosphi1 == 0.0:
                    raise ValueError("wintri: |lat_1| should be < 90")
            else:
                self.cosphi1 = 0.636619772367581343  # 2/pi

    def _fwd(self, lam, phi, z, t) -> Coords:
        c = 0.5 * lam
        d = np.arccos(np.clip(np.cos(phi) * np.cos(c), -1, 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            iy = 1.0 / np.sin(d)
            x = 2.0 * d * np.cos(phi) * np.sin(c) * iy
            y = d * np.sin(phi) * iy
        zero = d == 0.0
        x = np.where(zero, 0.0, x)
        y = np.where(zero, 0.0, y)
        if self.winkel:
            x = (x + lam * self.cosphi1) * 0.5
            y = (y + phi) * 0.5
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        # Newton-Raphson on the forward (aitoff.cpp inverse, simplified to
        # the generic 2D solver; the reference iterates an analytic
        # jacobian with over-rounds)
        lam, phi, bad = generic_inverse_2d(
            lambda la, ph: self._fwd(la, ph, np.zeros_like(la),
                                     np.zeros_like(la))[:2],
            x, y, x, y, tol=1e-12, iters=40)
        center = (np.abs(x) < 1e-12) & (np.abs(y) < 1e-12)
        lam = np.where(center, 0.0, lam)
        phi = np.where(center, 0.0, phi)
        bad = bad & ~center
        return np.where(bad, np.inf, lam), np.where(bad, np.inf, phi), z, t


class Wintri(Aitoff):
    name = "wintri"
    winkel = True


class Lask(_Sph):
    name = "lask"

    def _fwd(self, lam, phi, z, t) -> Coords:
        a10, a12, a32, a14 = 0.975534, -0.119161, -0.0143059, -0.0547009
        b01, b21, b03 = 1.00384, 0.0802894, 0.0998909
        b41, b23, b05 = 0.000199025, -0.02855, -0.0491032
        l2 = lam * lam
        p2 = phi * phi
        x = lam * (a10 + p2 * (a12 + l2 * a32 + p2 * a14))
        y = phi * (b01 + l2 * (b21 + p2 * b23 + l2 * b41)
                   + p2 * (b03 + p2 * b05))
        return x, y, z, t


class Gins8(_Sph):
    name = "gins8"

    def _fwd(self, lam, phi, z, t) -> Coords:
        Cl, Cp, C12 = 0.000952426, 0.162388, 1 / 12.0
        t2 = phi * phi
        y = phi * (1.0 + t2 * C12)
        x = lam * (1.0 - Cp * t2)
        t2 = lam * lam
        x = x * (0.87 - Cl * t2 * t2)
        return x, y, z, t


class Larr(_Sph):
    name = "larr"

    def _fwd(self, lam, phi, z, t) -> Coords:
        x = 0.5 * lam * (1.0 + np.sqrt(np.cos(phi)))
        y = phi / (np.cos(0.5 * phi) * np.cos(lam / 6.0))
        return x, y, z, t


class Nicol(_Sph):
    name = "nicol"

    def _fwd(self, lam, phi, z, t) -> Coords:
        EPS = 1e-10
        lam_a = np.where(lam == 0, 1e-30, lam)
        phi_a = np.where(phi == 0, 1e-30, phi)
        tb = S.HALFPI / lam_a - lam_a / S.HALFPI
        c = phi_a / S.HALFPI
        sp = np.sin(phi_a)
        with np.errstate(divide="ignore", invalid="ignore"):
            d = (1 - c * c) / (sp - c)
            r2 = (tb / d) ** 2
            m = (tb * sp / d - 0.5 * tb) / (1.0 + r2)
            n = (sp / r2 + 0.5 * d) / (1.0 + 1.0 / r2)
            xg = np.cos(phi_a)
            xg = np.sqrt(m * m + xg * xg / (1.0 + r2))
            xg = S.HALFPI * (m + np.where(lam < 0.0, -xg, xg))
            yg = np.sqrt(np.maximum(
                n * n - (sp * sp / r2 + d * sp - 1.0)
                / (1.0 + 1.0 / r2), 0.0))
            yg = S.HALFPI * (n + np.where(phi < 0.0, yg, -yg))
        x = np.where(np.abs(lam) < EPS, 0.0,
                     np.where(np.abs(phi) < EPS, lam,
                     np.where(np.abs(np.abs(lam) - S.HALFPI) < EPS,
                              lam * np.cos(phi),
                     np.where(np.abs(np.abs(phi) - S.HALFPI) < EPS,
                              0.0, xg))))
        y = np.where(np.abs(lam) < EPS, phi,
                     np.where(np.abs(phi) < EPS, 0.0,
                     np.where(np.abs(np.abs(lam) - S.HALFPI) < EPS,
                              S.HALFPI * np.sin(phi),
                     np.where(np.abs(np.abs(phi) - S.HALFPI) < EPS,
                              phi, yg))))
        return x, y, z, t


class August(_Sph):
    name = "august"

    def _fwd(self, lam, phi, z, t) -> Coords:
        M = 4.0 / 3.0
        tt = np.tan(0.5 * phi)
        c1 = np.sqrt(np.maximum(1.0 - tt * tt, 0.0))
        lm = lam * 0.5
        c = 1.0 + c1 * np.cos(lm)
        x1 = np.sin(lm) * c1 / c
        y1 = tt / c
        x12 = x1 * x1
        y12 = y1 * y1
        x = M * x1 * (3.0 + x12 - 3.0 * y12)
        y = M * y1 * (3.0 + 3.0 * x12 - y12)
        return x, y, z, t


def register_all(register) -> None:
    try:
        from proj_ray.ops import projections6 as p6

        p6.register_all(register)
    except ImportError:
        pass
    for cls in (Eck1, Eck2, Eck3, Putp1, Wag6, Kav7, Eck4, Eck5, Putp2,
                Putp3, Putp3p, Putp4p, Weren, Putp5, Putp5p, Putp6,
                Putp6p, Wag2, Wag3, Wag7, Urmfps, Wag1, Fouc, Kav5,
                QuaAut, MbtS, FoucS, Urm5, Boggs, Collg, Crast, Denoy,
                Fahey, Nell, NellH, Loxim, Wink1, Wink2, Natearth,
                Natearth2, Eqearth, Hammer, Aitoff, Wintri, Lask, Gins8,
                Larr, Nicol, August):
        register(cls)
