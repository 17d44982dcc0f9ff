"""Projection wave 11: Goode homolosine and the interrupted composites
(igh, igh_o, imoll, imoll_o), plus the Bacon globular family.

References (parity targets, not copied):
  goode    src/projections/goode.cpp
  igh      src/projections/igh.cpp
  igh_o    src/projections/igh_o.cpp
  imoll    src/projections/imoll.cpp
  imoll_o  src/projections/imoll_o.cpp
  bacon    src/projections/bacon.cpp (apian/ortel/bacon)
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation

EPSLN = 1e-10
_D = math.radians
_PHI_JOIN = (40 + 44 / 60.0 + 11.8 / 3600.0) * math.pi / 180.0


def _sph_kernels():
    """Raw spherical sinusoidal and Mollweide kernels (unit sphere)."""
    from proj_ray import factory

    sinu = factory._create_single({"proj": "sinu", "R": "1"})
    moll = factory._create_single({"proj": "moll", "R": "1"})
    return sinu, moll


class Goode(Operation):
    """Goode homolosine: sinusoidal below 40d44'11.8", Mollweide above,
    with the classic 0.05280 y-shift (src/projections/goode.cpp)."""

    name = "goode"
    Y_COR = 0.05280

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)
        self.sinu, self.moll = _sph_kernels()

    def _fwd(self, lam, phi, z, t) -> Coords:
        low = np.abs(phi) <= _PHI_JOIN
        x = np.empty_like(lam)
        y = np.empty_like(lam)
        if low.any():
            xs, ys, _, _ = self.sinu._fwd(lam[low], phi[low], z[low], t[low])
            x[low] = xs
            y[low] = ys
        hi = ~low
        if hi.any():
            xm, ym, _, _ = self.moll._fwd(lam[hi], phi[hi], z[hi], t[hi])
            x[hi] = xm
            y[hi] = ym - np.where(phi[hi] >= 0.0, self.Y_COR, -self.Y_COR)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        low = np.abs(y) <= _PHI_JOIN
        lam = np.empty_like(x)
        phi = np.empty_like(x)
        if low.any():
            ls, ps, _, _ = self.sinu._inv(x[low], y[low], z[low], t[low])
            lam[low] = ls
            phi[low] = ps
        hi = ~low
        if hi.any():
            yh = y[hi] + np.where(y[hi] >= 0.0, self.Y_COR, -self.Y_COR)
            lm, pm, _, _ = self.moll._inv(x[hi], yh, z[hi], t[hi])
            lam[hi] = lm
            phi[hi] = pm
        return lam, phi, z, t


class _Interrupted(Operation):
    """Shared machinery for the interrupted composites.  Each zone is a
    raw spherical sub-kernel with its own (lam0, x0, y0); zone choice is
    by lon/lat band on the forward path and by x/y band (plus a
    projectable-range check) on the inverse path."""

    name = "?"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)
        self.sinu, self.moll = _sph_kernels()
        self._setup_zones()

    # zones: dict zone_id -> [op, lam0, x0, y0]
    def _raw_fwd_xy(self, zid: int, lam, phi):
        op, lam0, x0, y0 = self.zones[zid]
        zz = np.zeros(np.shape(lam))
        x, y, _, _ = op._fwd(np.asarray(lam) - lam0, np.asarray(phi), zz, zz)
        return x + x0, y + y0

    def _zone_offset(self, z1: int, z2: int, lam: float, phi1: float,
                     phi2: float) -> float:
        """x-offset so zone z1 matches zone z2 at (lam, phi)
        (imoll.cpp compute_zone_offset)."""
        x1, _ = self._raw_fwd_xy(z1, [lam], [phi1])
        x2, _ = self._raw_fwd_xy(z2, [lam], [phi2])
        return float(x2[0] - x1[0])

    def _x_boundary(self, lam: float, phi: float) -> float:
        """Mean forward x just west/east of a seam
        (imoll.cpp compute_zone_x_boundary)."""
        za = self._fwd_zone(np.asarray([lam - EPSLN]), np.asarray([phi]))[0]
        zb = self._fwd_zone(np.asarray([lam + EPSLN]), np.asarray([phi]))[0]
        xa, _ = self._raw_fwd_xy(int(za), [lam - EPSLN], [phi])
        xb, _ = self._raw_fwd_xy(int(zb), [lam + EPSLN], [phi])
        return float(xa[0] + xb[0]) / 2.0

    def _fwd(self, lam, phi, z, t) -> Coords:
        zid = self._fwd_zone(lam, phi)
        x = np.full(lam.shape, np.inf)
        y = np.full(lam.shape, np.inf)
        for zi in self.zones:
            m = zid == zi
            if m.any():
                xm, ym = self._raw_fwd_xy(zi, lam[m], phi[m])
                x[m] = xm
                y[m] = ym
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        zid = self._inv_zone(x, y)
        lam = np.full(x.shape, np.inf)
        phi = np.full(x.shape, np.inf)
        for zi in self.zones:
            m = zid == zi
            if not m.any():
                continue
            op, lam0, x0, y0 = self.zones[zi]
            zz = np.zeros(x[m].shape)
            lm, pm, _, _ = op._inv(x[m] - x0, y[m] - y0, zz, zz)
            lm = lm + lam0
            ok = self._zone_ok(zi, lm, pm)
            lam[m] = np.where(ok, lm, np.inf)
            phi[m] = np.where(ok, pm, np.inf)
        return lam, phi, z, t


class Igh(_Interrupted):
    """Interrupted Goode homolosine (src/projections/igh.cpp)."""

    name = "igh"

    def _setup_zones(self) -> None:
        d = _D
        zz = np.zeros(1)
        pb = np.asarray([_PHI_JOIN])
        y1 = self.moll._fwd(zz, pb, zz, zz)[1][0]
        y3 = self.sinu._fwd(zz, pb, zz, zz)[1][0]
        self.dy0 = float(y3 - y1)
        dy0 = self.dy0
        m, s = self.moll, self.sinu
        self.zones = {
            1: [m, d(-100), d(-100), dy0],
            2: [m, d(30), d(30), dy0],
            3: [s, d(-100), d(-100), 0.0],
            4: [s, d(30), d(30), 0.0],
            5: [s, d(-160), d(-160), 0.0],
            6: [s, d(-60), d(-60), 0.0],
            7: [s, d(20), d(20), 0.0],
            8: [s, d(140), d(140), 0.0],
            9: [m, d(-160), d(-160), -dy0],
            10: [m, d(-60), d(-60), -dy0],
            11: [m, d(20), d(20), -dy0],
            12: [m, d(140), d(140), -dy0],
        }

    def _fwd_zone(self, lam, phi):
        d = _D
        north = phi >= _PHI_JOIN
        mid_n = (phi >= 0) & ~north
        mid_s = (phi >= -_PHI_JOIN) & (phi < 0)
        south = phi < -_PHI_JOIN
        z = np.zeros(lam.shape, dtype=int)
        z[north] = np.where(lam[north] <= d(-40), 1, 2)
        z[mid_n] = np.where(lam[mid_n] <= d(-40), 3, 4)
        for base, m in ((5, mid_s), (9, south)):
            lm = lam[m]
            z[m] = np.select(
                [lm <= d(-100), lm <= d(-20), lm <= d(80)],
                [base, base + 1, base + 2], base + 3)
        return z

    def _inv_zone(self, x, y):
        d = _D
        y90 = self.dy0 + math.sqrt(2.0)
        out = (y > y90 + EPSLN) | (y < -y90 + EPSLN)
        z = self._fwd_zone(x, y)
        z[out] = 0
        return z

    def _zone_ok(self, zi, lam, phi):
        d = _D
        if zi == 1:
            return (((lam >= -d(180) - EPSLN) & (lam <= -d(40) + EPSLN))
                    | ((lam >= -d(40) - EPSLN) & (lam <= -d(10) + EPSLN)
                       & (phi >= d(60) - EPSLN) & (phi <= d(90) + EPSLN)))
        if zi == 2:
            return (((lam >= -d(40) - EPSLN) & (lam <= d(180) + EPSLN))
                    | ((lam >= -d(180) - EPSLN) & (lam <= -d(160) + EPSLN)
                       & (phi >= d(50) - EPSLN) & (phi <= d(90) + EPSLN))
                    | ((lam >= -d(50) - EPSLN) & (lam <= -d(40) + EPSLN)
                       & (phi >= d(60) - EPSLN) & (phi <= d(90) + EPSLN)))
        if zi == 3:
            return (lam >= -d(180) - EPSLN) & (lam <= -d(40) + EPSLN)
        if zi == 4:
            return (lam >= -d(40) - EPSLN) & (lam <= d(180) + EPSLN)
        lo, hi = {5: (-180, -100), 6: (-100, -20), 7: (-20, 80),
                  8: (80, 180), 9: (-180, -100), 10: (-100, -20),
                  11: (-20, 80), 12: (80, 180)}[zi]
        return (lam >= d(lo) - EPSLN) & (lam <= d(hi) + EPSLN)


class IghO(_Interrupted):
    """Interrupted Goode homolosine, oceanic view
    (src/projections/igh_o.cpp)."""

    name = "igh_o"

    def _setup_zones(self) -> None:
        d = _D
        zz = np.zeros(1)
        pb = np.asarray([_PHI_JOIN])
        y1 = self.moll._fwd(zz, pb, zz, zz)[1][0]
        y4 = self.sinu._fwd(zz, pb, zz, zz)[1][0]
        self.dy0 = float(y4 - y1)
        dy0 = self.dy0
        m, s = self.moll, self.sinu
        self.zones = {
            1: [m, d(-140), d(-140), dy0],
            2: [m, d(-10), d(-10), dy0],
            3: [m, d(130), d(130), dy0],
            4: [s, d(-140), d(-140), 0.0],
            5: [s, d(-10), d(-10), 0.0],
            6: [s, d(130), d(130), 0.0],
            7: [s, d(-110), d(-110), 0.0],
            8: [s, d(20), d(20), 0.0],
            9: [s, d(150), d(150), 0.0],
            10: [m, d(-110), d(-110), -dy0],
            11: [m, d(20), d(20), -dy0],
            12: [m, d(150), d(150), -dy0],
        }

    def _fwd_zone(self, lam, phi):
        d = _D
        z = np.zeros(lam.shape, dtype=int)
        band1 = phi >= _PHI_JOIN
        band2 = (phi >= 0) & ~band1
        band3 = (phi >= -_PHI_JOIN) & (phi < 0)
        band4 = phi < -_PHI_JOIN
        for base, m, west, east in ((1, band1, -90, 60), (4, band2, -90, 60),
                                    (7, band3, -60, 90), (10, band4, -60,
                                                          90)):
            lm = lam[m]
            z[m] = np.select([lm <= d(west), lm >= d(east)],
                             [base, base + 2], base + 1)
        return z

    def _inv_zone(self, x, y):
        y90 = self.dy0 + math.sqrt(2.0)
        out = (y > y90 + EPSLN) | (y < -y90 + EPSLN)
        z = self._fwd_zone(x, y)
        z[out] = 0
        return z

    def _zone_ok(self, zi, lam, phi):
        d = _D
        if zi == 1:
            return (((lam >= -d(180) - EPSLN) & (lam <= -d(90) + EPSLN))
                    | ((lam >= d(160) - EPSLN) & (lam <= d(180) + EPSLN)
                       & (phi >= d(50) - EPSLN) & (phi <= d(90) + EPSLN)))
        if zi == 3:
            return (((lam >= d(60) - EPSLN) & (lam <= d(180) + EPSLN))
                    | ((lam >= -d(180) - EPSLN) & (lam <= -d(160) + EPSLN)
                       & (phi >= d(50) - EPSLN) & (phi <= d(90) + EPSLN)))
        if zi == 11:
            return (((lam >= -d(60) - EPSLN) & (lam <= d(90) + EPSLN))
                    | ((lam >= d(90) - EPSLN) & (lam <= d(100) + EPSLN)
                       & (phi >= -d(90) - EPSLN) & (phi <= -d(40) + EPSLN)))
        lo, hi = {2: (-90, 60), 4: (-180, -90), 5: (-90, 60), 6: (60, 180),
                  7: (-180, -60), 8: (-60, 90), 9: (90, 180),
                  10: (-180, -60), 12: (90, 180)}[zi]
        return (lam >= d(lo) - EPSLN) & (lam <= d(hi) + EPSLN)


class Imoll(_Interrupted):
    """Interrupted Mollweide (src/projections/imoll.cpp)."""

    name = "imoll"

    def _setup_zones(self) -> None:
        d = _D
        m = self.moll
        self.zones = {
            1: [m, d(-100), d(-100), 0.0],
            2: [m, d(30), d(30), 0.0],
            3: [m, d(-160), d(-160), 0.0],
            4: [m, d(-60), d(-60), 0.0],
            5: [m, d(20), d(20), 0.0],
            6: [m, d(140), d(140), 0.0],
        }
        self.zones[3][2] += self._zone_offset(3, 1, -d(160), -EPSLN, EPSLN)
        self.zones[2][2] += self._zone_offset(2, 1, -d(40), EPSLN, EPSLN)
        self.zones[4][2] += self._zone_offset(4, 1, -d(100), -EPSLN, EPSLN)
        self.zones[5][2] += self._zone_offset(5, 2, -d(20), -EPSLN, EPSLN)
        self.zones[6][2] += self._zone_offset(6, 2, d(80), -EPSLN, EPSLN)
        self.boundary12 = self._x_boundary(-d(40), EPSLN)
        self.boundary34 = self._x_boundary(-d(100), -EPSLN)
        self.boundary45 = self._x_boundary(-d(20), -EPSLN)
        self.boundary56 = self._x_boundary(d(80), -EPSLN)

    def _fwd_zone(self, lam, phi):
        d = _D
        z = np.zeros(lam.shape, dtype=int)
        north = phi >= 0
        z[north] = np.where(lam[north] <= -d(40), 1, 2)
        south = ~north
        lm = lam[south]
        z[south] = np.select([lm <= -d(100), lm <= -d(20), lm <= d(80)],
                             [3, 4, 5], 6)
        return z

    def _inv_zone(self, x, y):
        y90 = math.sqrt(2.0)
        out = (y > y90 + EPSLN) | (y < -y90 + EPSLN)
        z = np.zeros(x.shape, dtype=int)
        north = y >= 0
        z[north] = np.where(x[north] <= self.boundary12, 1, 2)
        south = ~north
        xs = x[south]
        z[south] = np.select(
            [xs <= self.boundary34, xs <= self.boundary45,
             xs <= self.boundary56], [3, 4, 5], 6)
        z[out] = 0
        return z

    def _zone_ok(self, zi, lam, phi):
        d = _D
        lo, hi = {1: (-180, -40), 2: (-40, 180), 3: (-180, -100),
                  4: (-100, -20), 5: (-20, 80), 6: (80, 180)}[zi]
        rng = (lam >= d(lo) - EPSLN) & (lam <= d(hi) + EPSLN)
        if zi <= 2:
            return rng & (phi >= -EPSLN)
        return rng & (phi <= EPSLN)


class ImollO(_Interrupted):
    """Interrupted Mollweide, oceanic view
    (src/projections/imoll_o.cpp)."""

    name = "imoll_o"

    def _setup_zones(self) -> None:
        d = _D
        m = self.moll
        self.zones = {
            1: [m, d(-140), d(-140), 0.0],
            2: [m, d(-10), d(-10), 0.0],
            3: [m, d(130), d(130), 0.0],
            4: [m, d(-110), d(-110), 0.0],
            5: [m, d(20), d(20), 0.0],
            6: [m, d(150), d(150), 0.0],
        }
        self.zones[2][2] += self._zone_offset(2, 1, -d(90), EPSLN, EPSLN)
        self.zones[3][2] += self._zone_offset(3, 2, d(60), EPSLN, EPSLN)
        self.zones[4][2] += self._zone_offset(4, 1, -d(180), -EPSLN, EPSLN)
        self.zones[5][2] += self._zone_offset(5, 2, -d(60), -EPSLN, EPSLN)
        self.zones[6][2] += self._zone_offset(6, 3, d(90), -EPSLN, EPSLN)
        self.boundary12 = self._x_boundary(-d(90), EPSLN)
        self.boundary23 = self._x_boundary(d(60), EPSLN)
        self.boundary45 = self._x_boundary(-d(60), -EPSLN)
        self.boundary56 = self._x_boundary(d(90), -EPSLN)

    def _fwd_zone(self, lam, phi):
        d = _D
        z = np.zeros(lam.shape, dtype=int)
        north = phi >= 0
        ln = lam[north]
        z[north] = np.select([ln <= -d(90), ln >= d(60)], [1, 3], 2)
        south = ~north
        ls = lam[south]
        z[south] = np.select([ls <= -d(60), ls >= d(90)], [4, 6], 5)
        return z

    def _inv_zone(self, x, y):
        y90 = math.sqrt(2.0)
        out = (y > y90 + EPSLN) | (y < -y90 + EPSLN)
        z = np.zeros(x.shape, dtype=int)
        north = y >= 0
        xn = x[north]
        z[north] = np.select([xn <= self.boundary12, xn >= self.boundary23],
                             [1, 3], 2)
        south = ~north
        xs = x[south]
        z[south] = np.select([xs <= self.boundary45, xs >= self.boundary56],
                             [4, 6], 5)
        z[out] = 0
        return z

    def _zone_ok(self, zi, lam, phi):
        d = _D
        lo, hi = {1: (-180, -90), 2: (-90, 60), 3: (60, 180),
                  4: (-180, -60), 5: (-60, 90), 6: (90, 180)}[zi]
        rng = (lam >= d(lo) - EPSLN) & (lam <= d(hi) + EPSLN)
        if zi <= 3:
            return rng & (phi >= -EPSLN)
        return rng & (phi <= EPSLN)


class Bacon(Operation):
    """Bacon globular (no inverse), src/projections/bacon.cpp."""

    name = "bacon"
    bacn = True
    ortl = False
    HLFPI2 = 2.46740110027233965467

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        y = S.HALFPI * np.sin(phi) if self.bacn else phi
        ax = np.abs(lam)
        small = ax < EPSLN
        with np.errstate(divide="ignore", invalid="ignore"):
            f = 0.5 * (self.HLFPI2 / np.where(small, 1.0, ax) + ax)
            x_main = ax - f + np.sqrt(np.maximum(f * f - y * y, 0.0))
            if self.ortl:
                outer = ax >= S.HALFPI
                x_outer = np.sqrt(self.HLFPI2 - phi * phi + EPSLN) \
                    + ax - S.HALFPI
                x_main = np.where(outer, x_outer, x_main)
            x = np.where(lam < 0.0, -x_main, x_main)
            x = np.where(small, 0.0, x)
        return x, np.asarray(y) + 0.0 * x, z, t


class Apian(Bacon):
    name = "apian"
    bacn = False
    ortl = False


class Ortel(Bacon):
    name = "ortel"
    bacn = False
    ortl = True


def register_all(register) -> None:
    for cls in (Goode, Igh, IghO, Imoll, ImollO, Bacon, Apian, Ortel):
        register(cls)
    try:
        from proj_ray.ops import projections12 as p12

        p12.register_all(register)
    except ImportError:
        pass
