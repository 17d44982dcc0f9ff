"""Horner polynomial evaluation (Engsager/Poder gen_pol) and the SCH
sensor-aligned coordinate system.

References (parity targets, not copied):
  horner  src/transformations/horner.cpp
  sch     src/projections/sch.cpp
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.ops.base import Coords, Operation, UNITS_WHATEVER


def _n_real(order: int) -> int:
    return (order + 1) * (order + 2) // 2


def _n_complex(order: int) -> int:
    return 2 * order + 2


def _parse_coefs(ps, key: str, n: int):
    if not ps.has(key):
        return None
    toks = ps.s(key).split(",")
    if len(toks) < n:
        raise ValueError(f"horner: malformed {key}, need {n} coefs")
    return [float(t) for t in toks[:n]]


def _double_real_horner_exact(order, cx, cy, e, n, order_offset=0):
    """Faithful pointer walk of double_real_horner_eval."""
    ix = _n_real(order)
    iy = _n_real(order)
    ix -= 1
    iy -= 1
    N = np.full(np.shape(e), cy[iy])
    E = np.full(np.shape(e), cx[ix])
    for r in range(order, order_offset, -1):
        iy -= 1
        u = np.full(np.shape(e), cy[iy])
        ix -= 1
        v = np.full(np.shape(e), cx[ix])
        for c in range(order, r - 1, -1):
            iy -= 1
            u = n * u + cy[iy]
            ix -= 1
            v = e * v + cx[ix]
        N = e * N + u
        E = n * E + v
    return E, N


def _single_real_horner(order, cx, x, order_offset=0):
    i = order + 1
    i -= 1
    u = np.full(np.shape(x), cx[i])
    for r in range(order, order_offset, -1):
        i -= 1
        u = x * u + cx[i]
    return u


def _complex_horner(order, c, e, n, order_offset=0):
    """complex_horner_eval: coefficients ordered (Cn0, Ce0, Cn1, ...)."""
    i = _n_complex(order)
    i -= 1
    E = np.full(np.shape(e), c[i])
    i -= 1
    N = np.full(np.shape(e), c[i])
    beg = order_offset * 2
    while i > beg:
        i -= 1
        w = n * E + e * N + c[i]
        i -= 1
        N = n * N - e * E + c[i]
        E = w
    return E, N


class Horner(Operation):
    """Engsager/Poder 2D polynomial transformation
    (src/transformations/horner.cpp)."""

    name = "horner"
    left = UNITS_WHATEVER
    right = UNITS_WHATEVER

    def setup(self, ps) -> None:
        if not ps.has("deg"):
            raise ValueError("horner: must specify +deg=n")
        self.order = ps.i("deg")
        if self.order < 0 or self.order > 10000:
            raise ValueError("horner: unreasonable degree")
        self.complex_mode = ps.has("fwd_c") or ps.has("inv_c")
        n_c = _n_complex(self.order)
        n_r = _n_real(self.order)
        if self.complex_mode:
            self.has_inv = ps.has("inv_c") or ps.has("inv_origin")
            self.uneg = ps.flag("uneg")
            self.vneg = ps.flag("vneg")
            self.fwd_c = _parse_coefs(ps, "fwd_c", n_c)
            if self.fwd_c is None:
                raise ValueError("horner: missing fwd_c")
            if self.has_inv:
                self.inv_c = _parse_coefs(ps, "inv_c", n_c)
                if self.inv_c is None:
                    raise ValueError("horner: missing inv_c")
        else:
            self.has_inv = (ps.has("inv_u") or ps.has("inv_v")
                            or ps.has("inv_origin"))
            self.fwd_u = _parse_coefs(ps, "fwd_u", n_r)
            self.fwd_v = _parse_coefs(ps, "fwd_v", n_r)
            if self.fwd_u is None or self.fwd_v is None:
                raise ValueError("horner: missing fwd_u/fwd_v")
            if self.has_inv:
                self.inv_u = _parse_coefs(ps, "inv_u", n_r)
                self.inv_v = _parse_coefs(ps, "inv_v", n_r)
                if self.inv_u is None or self.inv_v is None:
                    raise ValueError("horner: missing inv_u/inv_v")
        fo = _parse_coefs(ps, "fwd_origin", 2)
        if fo is None:
            raise ValueError("horner: missing fwd_origin")
        self.fwd_origin = fo
        if self.has_inv:
            io = _parse_coefs(ps, "inv_origin", 2)
            if io is None:
                raise ValueError("horner: missing inv_origin")
            self.inv_origin = io
        rng = _parse_coefs(ps, "range", 1)
        self.range = rng[0] if rng else 500000.0
        tol = _parse_coefs(ps, "inv_tolerance", 1)
        self.inv_tol = tol[0] if tol else 0.001

    def _out_of_range(self, e, n):
        return (np.abs(n) > self.range) | (np.abs(e) > self.range)

    def _eval(self, x, y, forward: bool):
        origin = self.fwd_origin if forward else self.inv_origin
        e = x - origin[0]
        n = y - origin[1]
        if self.complex_mode:
            if self.uneg:
                e = -e
            if self.vneg:
                n = -n
        bad = self._out_of_range(e, n)
        if self.complex_mode:
            c = self.fwd_c if forward else self.inv_c
            E, N = _complex_horner(self.order, c, e, n)
        else:
            cx = self.fwd_u if forward else self.inv_u
            cy = self.fwd_v if forward else self.inv_v
            E, N = _double_real_horner_exact(self.order, cx, cy, e, n)
        E = np.where(bad, np.inf, E)
        N = np.where(bad, np.inf, N)
        return E, N

    def _fwd(self, x, y, z, t) -> Coords:
        E, N = self._eval(x, y, True)
        return E, N, z, t

    def _inv(self, x, y, z, t) -> Coords:
        if self.has_inv:
            E, N = self._eval(x, y, False)
            return E, N, z, t
        # iterative inverse on the forward polynomial
        e = np.asarray(x, dtype=float)
        n = np.asarray(y, dtype=float)
        bad = self._out_of_range(e, n)
        if self.complex_mode:
            dZr = n - self.fwd_c[0]
            dZi = e - self.fwd_c[1]
            w0r = np.zeros(e.shape)
            w0i = np.zeros(e.shape)
            conv = np.zeros(e.shape, dtype=bool)
            for _ in range(32):
                if conv.all():
                    break
                Ed, Nd = _complex_horner(self.order, self.fwd_c, w0i, w0r,
                                         1)
                detr, deti = Nd, Ed
                den = detr * detr + deti * deti
                with np.errstate(divide="ignore", invalid="ignore"):
                    w1r = (dZr * detr + dZi * deti) / den
                    w1i = (dZi * detr - dZr * deti) / den
                step_ok = (np.abs(w1r - w0r) < self.inv_tol) \
                    & (np.abs(w1i - w0i) < self.inv_tol)
                w0r = np.where(conv, w0r, w1r)
                w0i = np.where(conv, w0i, w1i)
                conv = conv | step_ok
            E = w0i
            N = w0r
            if self.uneg:
                E = -E
            if self.vneg:
                N = -N
            E = E + self.fwd_origin[0]
            N = N + self.fwd_origin[1]
            bad |= ~conv
        else:
            de = e - self.fwd_u[0]
            dn = n - self.fwd_v[0]
            x0 = np.zeros(e.shape)
            y0 = np.zeros(e.shape)
            conv = np.zeros(e.shape, dtype=bool)
            for _ in range(32):
                if conv.all():
                    break
                Mb, Mc = _double_real_horner_exact(self.order, self.fwd_u,
                                                   self.fwd_v, x0, y0, 1)
                Ma = _single_real_horner(self.order, self.fwd_u, x0, 1)
                Md = _single_real_horner(self.order, self.fwd_v, y0, 1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    idet = 1.0 / (Ma * Md - Mb * Mc)
                    xn = idet * (Md * de - Mb * dn)
                    yn = idet * (Ma * dn - Mc * de)
                step_ok = (np.abs(xn - x0) < self.inv_tol) \
                    & (np.abs(yn - y0) < self.inv_tol)
                x0 = np.where(conv, x0, xn)
                y0 = np.where(conv, y0, yn)
                conv = conv | step_ok
            E = x0 + self.fwd_origin[0]
            N = y0 + self.fwd_origin[1]
            bad |= ~conv
        E = np.where(bad, np.inf, E)
        N = np.where(bad, np.inf, N)
        return E, N, z, t


class Sch(Operation):
    """Spherical cross-track height sensor coordinate system
    (src/projections/sch.cpp): geodetic -> local sphere around a peg
    point with heading."""

    name = "sch"

    def setup(self, ps) -> None:
        from proj_ray import factory

        P = self.P
        if not ps.has("plat_0"):
            raise ValueError("sch: missing plat_0")
        if not ps.has("plon_0"):
            raise ValueError("sch: missing plon_0")
        if not ps.has("phdg_0"):
            raise ValueError("sch: missing phdg_0")
        self.plat = ps.r("plat_0")
        self.plon = ps.r("plon_0")
        self.phdg = ps.r("phdg_0")
        self.h0 = ps.f("h_0", 0.0)
        ell = P.ell
        self.cart = factory._create_single(
            {"proj": "cart", "a": repr(ell.a), "es": repr(ell.es)})
        clt = math.cos(self.plat)
        slt = math.sin(self.plat)
        clo = math.cos(self.plon)
        slo = math.sin(self.plon)
        temp = math.sqrt(1.0 - P.es * slt * slt)
        reast = ell.a / temp
        rnorth = ell.a * (1.0 - P.es) / temp ** 3
        chdg = math.cos(self.phdg)
        shdg = math.sin(self.phdg)
        self.rcurv = self.h0 + (reast * rnorth) / (
            reast * chdg * chdg + rnorth * shdg * shdg)
        self.cart_sph = factory._create_single(
            {"proj": "cart", "a": repr(self.rcurv), "es": "0"})
        self.M = [
            clt * clo, -shdg * slo - slt * clo * chdg,
            slo * chdg - slt * clo * shdg,
            clt * slo, clo * shdg - slt * slo * chdg,
            -clo * chdg - slt * slo * shdg,
            slt, clt * chdg, clt * shdg,
        ]
        zz = np.zeros(1)
        X, Y, Z, _ = self.cart._fwd(np.asarray([self.plon]),
                                    np.asarray([self.plat]),
                                    np.asarray([self.h0]), zz)
        self.xyzoff = [float(X[0]) - self.rcurv * clt * clo,
                       float(Y[0]) - self.rcurv * clt * slo,
                       float(Z[0]) - self.rcurv * slt]

    def _fwd(self, lam, phi, z, t) -> Coords:
        M = self.M
        X, Y, Z, _ = self.cart._fwd(lam, phi, z, t)
        X = X - self.xyzoff[0]
        Y = Y - self.xyzoff[1]
        Z = Z - self.xyzoff[2]
        Xr = M[0] * X + M[3] * Y + M[6] * Z
        Yr = M[1] * X + M[4] * Y + M[7] * Z
        Zr = M[2] * X + M[5] * Y + M[8] * Z
        lam2, phi2, h2, _ = self.cart_sph._inv(Xr, Yr, Zr, t)
        a = self.P.ell.a
        x = lam2 * (self.rcurv / a)
        y = phi2 * (self.rcurv / a)
        return x, y, h2, t

    def _inv(self, x, y, z, t) -> Coords:
        M = self.M
        a = self.P.ell.a
        lam = x * (a / self.rcurv)
        phi = y * (a / self.rcurv)
        X, Y, Z, _ = self.cart_sph._fwd(lam, phi, z, t)
        Xr = M[0] * X + M[1] * Y + M[2] * Z
        Yr = M[3] * X + M[4] * Y + M[5] * Z
        Zr = M[6] * X + M[7] * Y + M[8] * Z
        Xr = Xr + self.xyzoff[0]
        Yr = Yr + self.xyzoff[1]
        Zr = Zr + self.xyzoff[2]
        return self.cart._inv(Xr, Yr, Zr, t)


def register_all(register) -> None:
    for cls in (Horner, Sch):
        register(cls)
