"""Projection wave 13: S2 cube-face projection and (r)HEALPix.

References (parity targets, not copied):
  s2       src/projections/s2.cpp (Google S2 published cell mapping)
  healpix  src/projections/healpix.cpp (Calabretta & Roukema 2007;
           rHEALPix per Gibb, Raichev & Speth 2013)
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import (Coords, Operation, UNITS_PROJECTED,
                               UNITS_RADIANS)

FORTPI = math.pi / 4
EPS15 = 1e-15


class S2(Operation):
    """S2 cube-face projection (src/projections/s2.cpp).  Output is the
    (s, t) cell coordinate in [0, 1]^2 (io-units PROJECTED: no semimajor
    scaling); lam0 only selects the face (from_greenwich trick,
    s2.cpp:432)."""

    name = "s2"
    left = UNITS_RADIANS
    right = UNITS_PROJECTED
    F_FRONT, F_RIGHT, F_TOP, F_BACK, F_LEFT, F_BOTTOM = range(6)

    def setup(self, ps) -> None:
        P = self.P
        kind = ps.s("UVtoST") or "quadratic"
        if kind not in ("linear", "quadratic", "tangent", "none"):
            raise ValueError("s2: UVtoST must be linear, quadratic, "
                             "tangent, or none")
        self.kind = kind
        if P.phi0 >= S.HALFPI - FORTPI / 2.0:
            self.face = self.F_TOP
        elif P.phi0 <= -(S.HALFPI - FORTPI / 2.0):
            self.face = self.F_BOTTOM
        elif abs(P.lam0) <= FORTPI:
            self.face = self.F_FRONT
        elif abs(P.lam0) <= S.HALFPI + FORTPI:
            self.face = self.F_RIGHT if P.lam0 > 0.0 else self.F_LEFT
        else:
            self.face = self.F_BACK
        # the kernel consumes absolute longitudes: cancel the lam0
        # subtraction done by the prepare step
        P.from_greenwich = P.from_greenwich - P.lam0
        if P.es != 0.0:
            a = P.ell.a
            b = P.ell.b
            self.a_sq = a * a
            self.b_ell = b
            self.one_minus_f = 1.0 - (a - b) / a
            self.one_minus_f_sq = self.one_minus_f ** 2

    def _uv_to_st(self, u):
        if self.kind == "linear":
            return 0.5 * (u + 1.0)
        if self.kind == "quadratic":
            return np.where(u >= 0.0,
                            0.5 * np.sqrt(1.0 + 3.0 * u),
                            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))
        if self.kind == "tangent":
            return (2.0 / math.pi) * (np.arctan(u) + FORTPI)
        return u

    def _st_to_uv(self, s):
        if self.kind == "linear":
            return 2.0 * s - 1.0
        if self.kind == "quadratic":
            return np.where(s >= 0.5,
                            (1.0 / 3.0) * (4.0 * s * s - 1.0),
                            (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) ** 2))
        if self.kind == "tangent":
            sv = np.tan(S.HALFPI * s - FORTPI)
            return sv + (1.0 / float(1 << 53)) * sv
        return s

    def _fwd(self, lam, phi, z, tt) -> Coords:
        P = self.P
        if P.es != 0.0:
            lat = np.arctan(self.one_minus_f_sq * np.tan(phi))
        else:
            lat = phi
        coslat = np.cos(lat)
        x = coslat * np.cos(lam)
        y = coslat * np.sin(lam)
        zz = np.sin(lat)
        f = self.face
        with np.errstate(divide="ignore", invalid="ignore"):
            if f == 0:
                u, v = y / x, zz / x
            elif f == 1:
                u, v = -x / y, zz / y
            elif f == 2:
                u, v = -x / zz, -y / zz
            elif f == 3:
                u, v = zz / x, y / x
            elif f == 4:
                u, v = zz / y, -x / y
            else:
                u, v = -y / zz, -x / zz
        return self._uv_to_st(u), self._uv_to_st(v), z, tt

    def _inv(self, x, y, z, tt) -> Coords:
        P = self.P
        u = self._st_to_uv(x)
        v = self._st_to_uv(y)
        major = 1.0 / np.sqrt(1.0 + u * u + v * v)
        m1 = u * major
        m2 = v * major
        f = self.face
        if f == 0:
            q, r, s = major, m1, m2
        elif f == 1:
            q, r, s = -m1, major, m2
        elif f == 2:
            q, r, s = -m1, -m2, major
        elif f == 3:
            q, r, s = -major, -m2, -m1
        elif f == 4:
            q, r, s = m2, -major, -m1
        else:
            q, r, s = m2, m1, -major
        phi = np.arccos(np.clip(-s, -1, 1)) - S.HALFPI
        lam = np.arctan2(r, q)
        if P.es != 0.0:
            invert = phi < 0.0
            tanphi = np.tan(phi)
            with np.errstate(divide="ignore", invalid="ignore"):
                xa = self.b_ell / np.sqrt(tanphi * tanphi
                                          + self.one_minus_f_sq)
                phi = np.arctan(np.sqrt(np.maximum(self.a_sq - xa * xa, 0.0))
                                / (self.one_minus_f * xa))
            phi = np.where(invert, -phi, phi)
        return lam, phi, z, tt


# exact +-90-degree rotation matrices indexed as the reference's ROT
# (healpix.cpp:42-63): IDENT, R1, R2, R3, R3, R2, R1 (last three are the
# inverses of the first three rotations)
_ROT = np.array([
    [[1, 0], [0, 1]],
    [[0, -1], [1, 0]],
    [[-1, 0], [0, -1]],
    [[0, 1], [-1, 0]],
    [[0, 1], [-1, 0]],
    [[-1, 0], [0, -1]],
    [[0, -1], [1, 0]],
], dtype=float)


def _rotate_index(idx):
    """Map a cn-pole difference in [-3, 3] to a ROT row."""
    return np.select([idx == 1, idx == 2, idx == 3,
                      idx == -1, idx == -2, idx == -3],
                     [1, 2, 3, 4, 5, 6], 0)


def _healpix_sphere_fwd(lam, phi):
    phi0 = math.asin(2.0 / 3.0)
    equat = np.abs(phi) <= phi0
    with np.errstate(invalid="ignore"):
        sigma = np.sqrt(np.maximum(3.0 * (1.0 - np.abs(np.sin(phi))), 0.0))
    cn = np.minimum(np.floor(2.0 * lam / math.pi + 2.0), 3.0)
    lamc = -3.0 * FORTPI + S.HALFPI * cn
    x = np.where(equat, lam, lamc + (lam - lamc) * sigma)
    y = np.where(equat, 3.0 * math.pi / 8.0 * np.sin(phi),
                 np.sign(phi) * FORTPI * (2.0 - sigma))
    return x, y


def _healpix_sphere_inv(x, y):
    equat = np.abs(y) <= FORTPI
    polar = (np.abs(y) > FORTPI) & (np.abs(y) < S.HALFPI)
    cn = np.minimum(np.floor(2.0 * x / math.pi + 2.0), 3.0)
    xc = -3.0 * FORTPI + S.HALFPI * cn
    tau = 2.0 - 4.0 * np.abs(y) / math.pi
    with np.errstate(divide="ignore", invalid="ignore"):
        lam_p = xc + (x - xc) / np.where(tau == 0, 1.0, tau)
        phi_p = np.sign(y) * np.arcsin(
            np.clip(1.0 - tau * tau / 3.0, -1.0, 1.0))
    lam = np.select([equat, polar], [x, lam_p], -math.pi)
    phi = np.select([equat, polar],
                    [np.arcsin(np.clip(8.0 * y / (3.0 * math.pi), -1, 1)),
                     phi_p], np.sign(y) * S.HALFPI)
    return lam, phi


def _pnpoly(verts, x, y):
    """Vectorized even-odd polygon test with the reference's boundary
    rule (healpix.cpp pnpoly)."""
    inside = np.zeros(x.shape, dtype=bool)
    on_vertex = np.zeros(x.shape, dtype=bool)
    n = len(verts)
    for vx, vy in verts:
        on_vertex |= (x == vx) & (y == vy)
    counter = np.zeros(x.shape, dtype=np.int64)
    p1x, p1y = verts[0]
    for i in range(1, n):
        p2x, p2y = verts[i % n]
        cond = ((y > min(p1y, p2y)) & (y <= max(p1y, p2y))
                & (x <= max(p1x, p2x)) & (p1y != p2y))
        if p1y != p2y:
            xinters = (y - p1y) * (p2x - p1x) / (p2y - p1y) + p1x
            hit = cond & ((p1x == p2x) | (x <= xinters))
            counter += hit.astype(np.int64)
        p1x, p1y = p2x, p2y
    inside = (counter % 2) == 1
    return inside | on_vertex


def _healpix_verts():
    e = EPS15
    H, F, P = S.HALFPI, FORTPI, math.pi
    return [(-P - e, F), (-3 * F, H + e), (-H, F + e), (-F, H + e),
            (0.0, F + e), (F, H + e), (H, F + e), (3 * F, H + e),
            (P + e, F), (P + e, -F), (3 * F, -H - e), (H, -F - e),
            (F, -H - e), (0.0, -F - e), (-F, -H - e), (-H, -F - e),
            (-3 * F, -H - e), (-P - e, -F), (-P - e, F)]


def _rhealpix_verts(ns, ss):
    e = EPS15
    F, H, P = FORTPI, S.HALFPI, math.pi
    return [(-P - e, F + e),
            (-P + ns * H - e, F + e),
            (-P + ns * H - e, 3 * F + e),
            (-P + (ns + 1.0) * H + e, 3 * F + e),
            (-P + (ns + 1.0) * H + e, F + e),
            (P + e, F + e),
            (P + e, -F - e),
            (-P + (ss + 1.0) * H + e, -F - e),
            (-P + (ss + 1.0) * H + e, -3 * F - e),
            (-P + ss * H - e, -3 * F - e),
            (-P + ss * H - e, -F - e),
            (-P - e, -F - e)]


class Healpix(Operation):
    """HEALPix (src/projections/healpix.cpp).  Ellipsoidal variant maps
    through the authalic latitude and scales to the authalic radius."""

    name = "healpix"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid
        from proj_ray.kernels._series import qsfn

        P = self.P
        self.rot_xy = math.radians(ps.f("rot_xy"))
        self.es = P.es
        if P.es != 0.0:
            from proj_ray.ops.projections2 import authset

            self.apa = authset(P.es)
            self.qp = float(qsfn(np.asarray([1.0]), P.e,
                                 P.ell.one_es)[0])
            self.e_orig = P.e
            self.one_es_orig = P.ell.one_es
            # switch to the authalic radius, keeping es
            # (healpix.cpp:633-635 re-runs pj_calc_ellipsoid_params)
            P.ell = Ellipsoid(a=P.ell.a * math.sqrt(0.5 * self.qp),
                              es=P.es)

    def _auth_fwd(self, phi):
        from proj_ray.kernels._series import qsfn

        q = qsfn(np.sin(phi), self.e_orig, self.one_es_orig)
        return np.arcsin(np.clip(q / self.qp, -1.0, 1.0))

    def _auth_inv(self, phi):
        from proj_ray.ops.projections2 import authlat

        return authlat(phi, self.apa)

    def _rot(self, x, y, angle):
        if angle == 0.0:
            return x, y
        c, s = math.cos(angle), math.sin(angle)
        return x * c - y * s, y * c + x * s

    def _fwd(self, lam, phi, z, t) -> Coords:
        if self.es != 0.0:
            phi = self._auth_fwd(phi)
        x, y = _healpix_sphere_fwd(lam, phi)
        x, y = self._rot(x, y, -self.rot_xy)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        x, y = self._rot(x, y, self.rot_xy)
        ok = _pnpoly(_healpix_verts(), x, y)
        lam, phi = _healpix_sphere_inv(x, y)
        if self.es != 0.0:
            phi = self._auth_inv(phi)
        lam = np.where(ok, lam, np.inf)
        phi = np.where(ok, phi, np.inf)
        return lam, phi, z, t


class Rhealpix(Healpix):
    """rHEALPix: HEALPix with the polar caps rearranged into two squares
    (src/projections/healpix.cpp combine_caps)."""

    name = "rhealpix"

    def setup(self, ps) -> None:
        self.ns = ps.i("north_square")
        self.ss = ps.i("south_square")
        if self.ns < 0 or self.ns > 3:
            raise ValueError("rhealpix: north_square out of [0,3]")
        if self.ss < 0 or self.ss > 3:
            raise ValueError("rhealpix: south_square out of [0,3]")
        ps.kv.setdefault("rot_xy", "0")
        super().setup(ps)

    def _get_cap(self, x, y, inverse: bool):
        """cn, cap point (cx, cy), region (1=north, -1=south, 0=equat)
        per healpix.cpp get_cap."""
        e = EPS15
        F, H = FORTPI, S.HALFPI
        region = np.select([y > F, y < -F], [1, -1], 0)
        if not inverse:
            cn = np.select([x < -H, x < 0, x < H], [0, 1, 2], 3)
            cx = np.select([cn == 0, cn == 1, cn == 2],
                           [-3 * F, -F, F], 3 * F)
            cy = np.where(region == 1, H, -H)
        else:
            ns, ss = self.ns, self.ss
            cx = np.where(region == 1, -3 * F + ns * H, -3 * F + ss * H)
            cy = np.where(region == 1, H, -H)
            xs = np.where(region == 1, x - ns * H, x - ss * H)
            n_cn = np.select(
                [(y >= -xs - F - e) & (y < xs + 5 * F - e),
                 (y > -xs - F + e) & (y >= xs + 5 * F - e),
                 (y <= -xs - F + e) & (y > xs + 5 * F + e)],
                [(ns + 1) % 4, (ns + 2) % 4, (ns + 3) % 4], ns)
            s_cn = np.select(
                [(y <= xs + F + e) & (y > -xs - 5 * F + e),
                 (y < xs + F - e) & (y <= -xs - 5 * F + e),
                 (y >= xs + F - e) & (y < -xs - 5 * F - e)],
                [(ss + 1) % 4, (ss + 2) % 4, (ss + 3) % 4], ss)
            cn = np.where(region == 1, n_cn, s_cn)
        return cn, cx, cy, region

    def _combine_caps(self, x, y, inverse: bool):
        cn, cx, cy, region = self._get_cap(x, y, inverse)
        polar = region != 0
        pole = np.where(region == 1, self.ns, self.ss)
        diff = cn - pole
        if not inverse:
            idx = np.where(region == 1, _rotate_index(diff),
                           _rotate_index(-diff))
        else:
            idx = np.where(region == 1, _rotate_index(-diff),
                           _rotate_index(diff))
        m = _ROT[idx]  # (..., 2, 2)
        vx = x - cx
        vy = y - cy
        rx = m[..., 0, 0] * vx + m[..., 0, 1] * vy
        ry = m[..., 1, 0] * vx + m[..., 1, 1] * vy
        tgt = pole if not inverse else cn
        ax = -3 * FORTPI + tgt * S.HALFPI
        ay = np.where(region == 1, S.HALFPI, -S.HALFPI)
        out_x = np.where(polar, rx + ax, x)
        out_y = np.where(polar, ry + ay, y)
        return out_x, out_y

    def _fwd(self, lam, phi, z, t) -> Coords:
        if self.es != 0.0:
            phi = self._auth_fwd(phi)
        x, y = _healpix_sphere_fwd(lam, phi)
        x, y = self._combine_caps(x, y, False)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        ok = _pnpoly(_rhealpix_verts(self.ns, self.ss), x, y)
        x2, y2 = self._combine_caps(x, y, True)
        lam, phi = _healpix_sphere_inv(x2, y2)
        if self.es != 0.0:
            phi = self._auth_inv(phi)
        lam = np.where(ok, lam, np.inf)
        phi = np.where(ok, phi, np.inf)
        return lam, phi, z, t


def register_all(register) -> None:
    for cls in (S2, Healpix, Rhealpix):
        register(cls)
    try:
        from proj_ray.ops import projections14 as p14

        p14.register_all(register)
    except ImportError:
        pass
