"""Projection wave 14: Icosahedral Snyder Equal Area.

Reference (parity target, not copied): src/projections/isea.cpp
(Snyder 1992 icosahedral equal-area; planar inverse after Harrison,
Mahdavi-Amiri & Samavati / the reference's ISEAPlanarProjection).
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.ops.base import Coords, Operation

DEG120 = math.radians(120.0)
SQRT3 = math.sqrt(3.0)
SIN60 = SQRT3 / 2.0
COS30 = SQRT3 / 2.0
TAN30 = math.tan(math.radians(30.0))
COT_THETA = 1.0 / TAN30
# spherical distance face center -> vertex, g
SDC2VOS = 0.6523581397843681859886783
TANG = 0.76393202250021030358019673567
COSG = math.cos(math.radians(36.0))
SING = math.sin(math.radians(36.0))
COS_SDC2VOS = 0.7946544722917661229596057297879189448539
SING_COSG_ = SING * COS_SDC2VOS
RPRIME_OVER_R = 0.9103832815095032
TABLE_G = TANG * SIN60
TABLE_H = 0.25 * TANG
ISEA_STD_LAT = 1.01722196792335072101
ISEA_STD_LONG = 0.19634954084936207740
E_RAD = 0.91843818701052843323
F_RAD = 0.18871053078356206978
ISEA_SCALE = 0.8301572857837594396028083
DBL_EPS = 2.220446049250313e-16
INT_MAX = 2 ** 31 - 1
INT_MIN = -(2 ** 31)

_FACE_LAT = np.array([E_RAD] * 5 + [F_RAD] * 5 + [-F_RAD] * 5 + [-E_RAD] * 5)
_FACE_LON = np.radians(np.array(
    [-144.0, -72, 0, 72, 144,
     -144, -72, 0, 72, 144,
     -108, -36, 36, 108, 180,
     -108, -36, 36, 108, 180]))
_AZ_ADJ = np.array([0.0] * 5 + [math.pi] * 5 + [0.0] * 5
                   + [math.pi, math.pi, -math.pi, -math.pi, -math.pi])
# az_adjustment(): pi for 5..9, 15, 16; -pi for >= 17
_AZ_ADJ = np.zeros(20)
for _i in range(20):
    if (5 <= _i <= 9) or _i in (15, 16):
        _AZ_ADJ[_i] = math.pi
    elif _i >= 17:
        _AZ_ADJ[_i] = -math.pi

# triangle plate positions (isea_triangle_xy)
_TRI_X = np.zeros(20)
_TRI_Y = np.zeros(20)
for _i in range(20):
    _x = TABLE_G * ((_i % 5) - 2) * 2.0
    if _i > 9:
        _x += TABLE_G
    _y = [5.0 * TABLE_H, TABLE_H, -TABLE_H, -5.0 * TABLE_H][_i // 5]
    _TRI_X[_i] = _x * RPRIME_OVER_R
    _TRI_Y[_i] = _y * RPRIME_OVER_R


def _safe_arcsin(t):
    eps = 1e-15
    return np.where(np.abs(t) < eps, 0.0,
                    np.where(np.abs(t - 1.0) < eps, math.pi / 2,
                             np.where(np.abs(t + 1.0) < eps, -math.pi / 2,
                                      np.arcsin(np.clip(t, -1, 1)))))


def _safe_arccos(t):
    eps = 1e-15
    return np.where(np.abs(t) < eps, math.pi / 2,
                    np.where(np.abs(t + 1.0) < eps, math.pi,
                             np.where(np.abs(t - 1.0) < eps, 0.0,
                                      np.arccos(np.clip(t, -1, 1)))))


def _ctran(pole_lat, pole_lon, lam, phi, lon0):
    """Rotate to the oriented icosahedron frame (isea.cpp isea_ctran /
    snyder_ctran)."""
    alpha = pole_lat
    beta = pole_lon + math.pi
    dlam = lam - beta
    cos_p = np.cos(phi)
    sin_p = np.sin(phi)
    cos_a = math.cos(alpha)
    sin_a = math.sin(alpha)
    cos_dl = np.cos(dlam)
    sin_dl = np.sin(dlam)
    sin_phip = sin_a * sin_p - cos_a * cos_p * cos_dl
    lambdap = np.arctan2(cos_p * sin_dl,
                         sin_a * cos_p * cos_dl + cos_a * sin_p) + beta
    lambdap = np.remainder(lambdap + math.pi, 2 * math.pi) - math.pi
    npt_lat = _safe_arcsin(sin_phip)
    npt_lon = lambdap - (-lon0 + pole_lon)
    npt_lon = np.remainder(npt_lon + math.pi, 2 * math.pi) - math.pi
    return npt_lon, npt_lat


class Isea(Operation):
    """Icosahedral Snyder Equal Area (src/projections/isea.cpp).
    mode=plane is fully vectorized; the dd/di/hex grid-addressing modes
    run per-row (discrete cell output, not a bulk-transform path).

    Parity note: with a non-zero eccentricity the reference mixes
    scales between forward and inverse — the forward treats geodetic
    latitude as spherical and its output is scaled by raw `a`
    (isea.cpp's own TODO at isea_s_forward), while the inverse's
    planar constants derive from the AUTHALIC radius but rescale the
    input by `a` (isea.cpp:1342-1356 vs :1380) — so fwd/inv roundtrip
    closes only for spherical definitions (+R/+a), exactly as in the
    reference; the gie corpus tests isea only on spheres."""

    name = "isea"

    def setup(self, ps) -> None:
        self.o_lat = ISEA_STD_LAT
        self.o_lon = ISEA_STD_LONG
        self.o_az = 0.0
        self.aperture = 3
        self.resolution = 4
        orient = ps.s("orient")
        if orient:
            if orient == "isea":
                pass
            elif orient == "pole":
                self.o_lat = math.pi / 2.0
                self.o_lon = 0.0
            else:
                raise ValueError("isea: orient must be isea or pole")
        if ps.has("azi"):
            self.o_az = ps.r("azi")
        if ps.has("lon_0"):
            self.o_lon = ps.r("lon_0")
        if ps.has("lat_0"):
            self.o_lat = ps.r("lat_0")
        mode = ps.s("mode")
        self.mode = mode or "plane"
        if self.mode not in ("plane", "di", "dd", "hex"):
            raise ValueError("isea: mode must be plane, di, dd or hex")
        if ps.has("resolution"):
            self.resolution = ps.i("resolution")
        if ps.has("aperture"):
            self.aperture = ps.i("aperture")
        self._init_planar()

    def _init_planar(self) -> None:
        """Constants for the planar inverse (isea.cpp
        pj_isea_data::initialize); only the default plane configuration
        has an inverse, matching the reference."""
        P = self.P
        self.invertible = (self.mode == "plane" and self.o_az == 0.0
                           and self.aperture == 3 and self.resolution == 4
                           and ((self.o_lat == ISEA_STD_LAT
                                 and self.o_lon == ISEA_STD_LONG)
                                or (self.o_lat == math.pi / 2.0
                                    and self.o_lon == 0.0)))
        if self.o_lat == ISEA_STD_LAT and self.o_lon == ISEA_STD_LONG:
            self.orient_lat = (E_RAD + F_RAD) / 2.0
            self.orient_lon = math.radians(-11.25)
        else:
            self.orient_lat = 0.0
            self.orient_lon = 0.0
        a = P.ell.a
        if P.e > 0:
            a2 = a * a
            c2 = P.ell.b * P.ell.b
            log1 = math.log((1 + P.e) / (1 - P.e))
            Ssurf = math.pi * (2 * a2 + c2 / P.e * log1)
            self.R2 = Ssurf / (4 * math.pi)
            self.Rprime = RPRIME_OVER_R * math.sqrt(self.R2)
        else:
            self.R2 = a * a
            self.Rprime = RPRIME_OVER_R * a
        self.Rprime2X = 2 * self.Rprime
        self.RprimeTang = self.Rprime * TANG
        self.centerToBase = self.RprimeTang / 2
        self.triWidth = self.RprimeTang * SQRT3
        self.Rprime2Tan2g = self.RprimeTang * self.RprimeTang
        self.yOffsets = [-2 * self.centerToBase, -4 * self.centerToBase,
                         -5 * self.centerToBase, -7 * self.centerToBase]
        self.xo = 2.5 * self.triWidth
        self.yo = -1.5 * self.centerToBase
        self.sx = 1.0 / self.triWidth
        self.sy = 1.0 / (3 * self.centerToBase)

    # ---- forward ---------------------------------------------------------

    def _snyder_fwd(self, lam, phi):
        """Vectorized isea_snyder_forward: returns (tri, x, y) with
        tri=-1 for unassigned (should not happen)."""
        sinLat = np.sin(phi)
        cosLat = np.cos(phi)
        tri = np.full(lam.shape, -1, dtype=int)
        ox = np.zeros(lam.shape)
        oy = np.zeros(lam.shape)
        for i in range(20):
            active = tri < 0
            if not active.any():
                break
            sc_s = math.sin(_FACE_LAT[i])
            sc_c = math.cos(_FACE_LAT[i])
            dLon = lam - _FACE_LON[i]
            cosLat_cosLon = cosLat * np.cos(dLon)
            cosZ = sc_s * sinLat + sc_c * cosLat_cosLon
            z = _safe_arccos(cosZ)
            cand = active & (z <= SDC2VOS + 0.000005)
            if not cand.any():
                continue
            Az = np.arctan2(cosLat * np.sin(dLon),
                            sc_c * sinLat - sc_s * cosLat_cosLon)
            Az = Az - _AZ_ADJ[i]
            Az = np.where(Az < 0.0, Az + 2.0 * math.pi, Az)
            mult = np.zeros(lam.shape)
            for k in (1, 2):
                mult += (Az > k * DEG120 + DBL_EPS).astype(float)
            Az = Az - mult * DEG120
            cosAz = np.cos(Az)
            sinAz = np.sin(Az)
            q = np.arctan2(TANG, cosAz + sinAz * COT_THETA)
            cand = cand & (z <= q + 0.000005)
            if not cand.any():
                continue
            H = _safe_arccos(sinAz * SING_COSG_ - cosAz * COSG)
            Ag = Az + math.radians(36.0) + H - math.pi
            Azprime = np.arctan2(
                2.0 * Ag,
                RPRIME_OVER_R * RPRIME_OVER_R * TANG * TANG
                - 2.0 * Ag * COT_THETA)
            dprime = RPRIME_OVER_R * TANG / (np.cos(Azprime)
                                             + np.sin(Azprime) * COT_THETA)
            with np.errstate(divide="ignore", invalid="ignore"):
                f = dprime / (2.0 * RPRIME_OVER_R * np.sin(q / 2.0))
            rho = 2.0 * RPRIME_OVER_R * f * np.sin(z / 2.0)
            Azprime = Azprime + DEG120 * mult
            ox = np.where(cand, rho * np.sin(Azprime), ox)
            oy = np.where(cand, rho * np.cos(Azprime), oy)
            tri = np.where(cand, i, tri)
        return tri, ox, oy

    def _fwd(self, lam, phi, z, t) -> Coords:
        lam2, phi2 = _ctran(self.o_lat, self.o_lon, lam, phi, self.o_az)
        tri, x, y = self._snyder_fwd(lam2, phi2)
        bad = tri < 0
        tri = np.where(bad, 0, tri)
        if self.mode == "plane":
            down = ((tri // 5) % 2) == 1
            x = np.where(down, -x, x)
            y = np.where(down, -y, y)
            x = x + _TRI_X[tri]
            y = y + _TRI_Y[tri]
        else:
            x = x * ISEA_SCALE + 0.5
            y = y * ISEA_SCALE + 2.0 * 0.14433756729740644112
            xo = np.empty(x.shape)
            yo = np.empty(x.shape)
            flat_x = np.atleast_1d(x)
            flat_y = np.atleast_1d(y)
            flat_t = np.atleast_1d(tri)
            for n in range(flat_x.size):
                try:
                    xo.flat[n], yo.flat[n] = self._grid_address(
                        int(flat_t[n]), float(flat_x[n]), float(flat_y[n]))
                except (ValueError, ZeroDivisionError, OverflowError):
                    xo.flat[n] = np.inf
                    yo.flat[n] = np.inf
            x, y = xo, yo
        x = np.where(bad, np.inf, x)
        y = np.where(bad, np.inf, y)
        return x, y, z, t

    # ---- grid addressing (per-row; isea.cpp isea_ptdd/dddi/hex) ----------

    @staticmethod
    def _rotate_pt(x, y, degrees):
        rad = -math.radians(degrees)
        while rad >= 2 * math.pi:
            rad -= 2 * math.pi
        while rad <= -2 * math.pi:
            rad += 2 * math.pi
        return (x * math.cos(rad) + y * math.sin(rad),
                -x * math.sin(rad) + y * math.cos(rad))

    @staticmethod
    def _hexbin2(width, x, y):
        x = x / math.cos(math.radians(30.0))
        y = y - x / 2.0
        if width == 0:
            raise ValueError("isea: division by zero")
        x /= width
        y /= width
        zz = -x - y
        rx, ry, rz = math.floor(x + 0.5), math.floor(y + 0.5), \
            math.floor(zz + 0.5)
        ix, iy, iz = int(rx), int(ry), int(rz)
        if abs(ix + iy) > INT_MAX or abs(ix + iy + iz) > INT_MAX:
            raise ValueError("isea: integer overflow")
        s = ix + iy + iz
        if s:
            abs_dx = abs(rx - x)
            abs_dy = abs(ry - y)
            abs_dz = abs(rz - zz)
            if abs_dx >= abs_dy and abs_dx >= abs_dz:
                ix -= s
            elif abs_dy >= abs_dx and abs_dy >= abs_dz:
                iy -= s
            else:
                iz -= s
        # hex_xy on iso coords
        if ix >= 0:
            hy = -iy - (ix + 1) // 2
        else:
            hy = -iy - ix // 2
        return ix, hy

    @staticmethod
    def _hex_iso(hx, hy):
        if hx >= 0:
            hy2 = -hy - (hx + 1) // 2
        else:
            hy2 = -hy - hx // 2
        return hx, hy2, -hx - hy2

    def _ptdd(self, tri, x, y):
        downtri = ((tri // 5) % 2) == 1
        quadz = (tri % 5) + (tri // 10) * 5 + 1
        x, y = self._rotate_pt(x, y, 240.0 if downtri else 60.0)
        if downtri:
            x += 0.5
            y += COS30
        return quadz, x, y

    def _dddi_ap3odd(self, quadz, x, y):
        sidelength = (2.0 ** self.resolution + 1.0) / 2.0
        hexwidth = math.cos(math.pi / 6.0) / sidelength
        maxcoord = round(sidelength * 2.0)
        hx, hy = self._hexbin2(hexwidth, x, y)
        hx, hy, hz = self._hex_iso(hx, hy)
        d = hx - hz
        i = hx + hy + hy
        if quadz <= 5:
            if d == 0 and i == maxcoord:
                quadz, d, i = 0, 0, 0
            elif i == maxcoord:
                quadz += 1
                if quadz == 6:
                    quadz = 1
                i = maxcoord - d
                d = 0
            elif d == maxcoord:
                quadz += 5
                d = 0
        else:
            if i == 0 and d == maxcoord:
                quadz, d, i = 11, 0, 0
            elif d == maxcoord:
                quadz += 1
                if quadz == 11:
                    quadz = 6
                d = maxcoord - i
                i = 0
            elif i == maxcoord:
                quadz = (quadz - 4) % 5
                i = 0
        return quadz, float(d), float(i)

    def _dddi(self, quadz, x, y):
        if self.aperture == 3 and self.resolution % 2 != 0:
            return self._dddi_ap3odd(quadz, x, y)
        if self.aperture > 0:
            sd = self.aperture ** (self.resolution / 2.0)
            if abs(sd) > INT_MAX:
                raise ValueError("isea: integer overflow")
            sidelength = round(sd)
        else:
            sidelength = self.resolution
        if sidelength == 0:
            raise ValueError("isea: division by zero")
        hexwidth = 1.0 / sidelength
        x, y = self._rotate_pt(x, y, -30.0)
        hx, hy = self._hexbin2(hexwidth, x, y)
        hx, hy, hz = self._hex_iso(hx, hy)
        if quadz <= 5:
            if hx == 0 and hz == -sidelength:
                quadz, hx, hy, hz = 0, 0, 0, 0
            elif hz == -sidelength:
                quadz += 1
                if quadz == 6:
                    quadz = 1
                hy = sidelength - hx
                hz = hx - sidelength
                hx = 0
            elif hx == sidelength:
                quadz += 5
                hy = -hz
                hx = 0
        else:
            if hz == 0 and hx == sidelength:
                quadz, hx, hy, hz = 11, 0, 0, 0
            elif hx == sidelength:
                quadz += 1
                if quadz == 11:
                    quadz = 6
                hx = hy + sidelength
                hy = 0
                hz = -hx
            elif hy == -sidelength:
                quadz -= 4
                hy = 0
                hz = -hx
        return quadz, float(hx), float(-hz)

    def _grid_address(self, tri, x, y):
        quadz, x, y = self._ptdd(tri, x, y)
        if self.mode == "dd":
            return x, y
        quadz, dx, dy = self._dddi(quadz, x, y)
        if self.mode == "di":
            return dx, dy
        # hex: global hex coordinate (isea.cpp isea_hex)
        if dx < (INT_MIN >> 4) or dx > (INT_MAX >> 4):
            raise ValueError("isea: invalid shift")
        return float(int(dx) * 16 + quadz), dy

    # ---- inverse (plane, default config only) ----------------------------

    def _inv(self, x, y, z, t) -> Coords:
        if not self.invertible:
            lam = np.full(x.shape, np.inf)
            return lam, lam.copy(), z, t
        P = self.P
        a = P.ell.a
        px = x * a + self.xo
        py = y * a + self.yo
        eps = 1e-11
        sr = -SIN60
        cr = 0.5
        wrap = (px < 0) | ((px < self.triWidth / 2) & (py < 0)
                           & (py * cr < px * sr))
        px = np.where(wrap, px + 5 * self.triWidth, px)
        shearX = 1.0 / SQRT3
        yp = -(px * sr + py * cr)
        gx = (px * cr - py * sr + yp * shearX) * self.sx
        gy = yp * self.sy
        gx = np.where((gx < 0) | ((gy > gx) & (gx < 5 - eps)), gx + eps,
                      np.where((gx > 5) | ((gy < gx) & (gx > eps)), gx - eps,
                               gx))
        gy = np.where((gy < 0) | ((gx > gy) & (gy < 6 - eps)), gy + eps,
                      np.where((gy > 6) | ((gx < gy) & (gy > eps)), gy - eps,
                               gy))
        in_range = (gx >= 0) & (gx <= 5) & (gy >= 0) & (gy <= 6)
        ix = np.clip(gx.astype(int), 0, 4)
        iy = np.clip(gy.astype(int), 0, 5)
        rhombus = ix + iy
        valid = in_range & ((iy == ix) | (iy == ix + 1))
        top = (gx - ix) > (gy - iy)
        face_top = np.select(
            [rhombus == 0, rhombus == 2, rhombus == 4, rhombus == 6,
             rhombus == 8, rhombus == 1, rhombus == 3, rhombus == 5,
             rhombus == 7, rhombus == 9],
            [0, 1, 2, 3, 4, 10, 11, 12, 13, 14], -1)
        face_bot = np.select(
            [rhombus == 0, rhombus == 2, rhombus == 4, rhombus == 6,
             rhombus == 8, rhombus == 1, rhombus == 3, rhombus == 5,
             rhombus == 7, rhombus == 9],
            [5, 6, 7, 8, 9, 15, 16, 17, 18, 19], -1)
        face = np.where(top, face_top, face_bot)
        valid = valid & (face >= 0)
        face = np.where(valid, face, 0)
        fy = face // 5
        fx = face - 5 * fy
        rx = px - (2 * fx + fy // 2 + 1) * self.triWidth / 2.0
        ry = py - (np.asarray(self.yOffsets)[fy] + 3 * self.centerToBase)
        lam, phi, ok = self._ico_to_sphere(face, rx, ry)
        ok = ok & valid
        lam = np.where(lam < -math.pi - eps, lam + 2 * math.pi,
                       np.where(lam > math.pi + eps, lam - 2 * math.pi, lam))
        lam = np.where(ok, lam, np.inf)
        phi = np.where(ok, phi, np.inf)
        return lam, phi, z, t

    def _ico_to_sphere(self, face, cx, cy):
        """Vectorized ISEAPlanarProjection::icosahedronToSphere."""
        precision = math.radians(1e-11)
        AzMax = DEG120
        westVertexLon = math.radians(-144.0)
        Az = np.arctan2(cx, cy)
        rho = np.sqrt(cx * cx + cy * cy)
        AzAdj = np.where((face <= 4) | ((10 <= face) & (face <= 14)),
                         0.0, math.pi)
        Az = Az + AzAdj
        for _ in range(4):
            neg = Az < 0
            AzAdj = np.where(neg, AzAdj + AzMax, AzAdj)
            Az = np.where(neg, Az + AzMax, Az)
            big = Az > AzMax
            AzAdj = np.where(big, AzAdj - AzMax, AzAdj)
            Az = np.where(big, Az - AzMax, Az)
        sinAz = np.sin(Az)
        cosAz = np.cos(Az)
        with np.errstate(divide="ignore", invalid="ignore"):
            cotAz = cosAz / sinAz
            area = self.Rprime2Tan2g / (2 * (cotAz + COT_THETA))
            darea = area / self.R2 - westVertexLon
            Az_earth = Az.copy()
            active = np.isfinite(Az_earth)
            for _ in range(50):
                if not active.any():
                    break
                sinAe = np.sin(Az_earth)
                cosAe = np.cos(Az_earth)
                H = np.arccos(np.clip(sinAe * SING_COSG_ - cosAe * COSG,
                                      -1, 1))
                FAz = darea - H - Az_earth
                F2Az = (cosAe * SING_COSG_ + sinAe * COSG) / np.sin(H) - 1.0
                deltaAz = -FAz / F2Az
                Az_earth = np.where(active, Az_earth + deltaAz, Az_earth)
                active = active & (np.abs(deltaAz) > precision)
            sinAe = np.sin(Az_earth)
            cosAe = np.cos(Az_earth)
            q = np.arctan2(TANG, cosAe + sinAe * COT_THETA)
            d = self.RprimeTang / (cosAz + sinAz * COT_THETA)
            f = d / (self.Rprime2X * np.sin(q / 2))
            zarg = rho / (self.Rprime2X * f)
            zz = 2 * np.arcsin(np.clip(zarg, -1.0, 1.0))
            ok = np.abs(zarg) <= 1.0 + 1e-9
            Az_earth = Az_earth - AzAdj
            sinLat0 = np.sin(_FACE_LAT[face])
            cosLat0 = np.cos(_FACE_LAT[face])
            sinZ = np.sin(zz)
            cosZ = np.cos(zz)
            cosLat0SinZ = cosLat0 * sinZ
            latSin = sinLat0 * cosZ + cosLat0SinZ * np.cos(Az_earth)
            lat = _safe_arcsin(latSin)
            lon = _FACE_LON[face] + np.arctan2(
                np.sin(Az_earth) * cosLat0SinZ, cosZ - sinLat0 * np.sin(lat))
        lam, phi = self._revert_orientation(lat, lon)
        return lam, phi, ok

    def _revert_orientation(self, lat, lon):
        precisionPD = math.radians(1e-5)
        lon = np.where((lat < -math.pi / 2 + precisionPD)
                       | (lat > math.pi / 2 - precisionPD), 0.0, lon)
        if self.orient_lat != 0.0 or self.orient_lon != 0.0:
            sinLat = np.sin(lat)
            cosLat = np.cos(lat)
            sinLon = np.sin(lon)
            cosLon = np.cos(lon)
            cosOl = math.cos(self.orient_lat)
            sinOl = math.sin(self.orient_lat)
            cosLonCosLat = cosLon * cosLat
            rlat = _safe_arcsin(sinLat * cosOl - cosLonCosLat * sinOl)
            rlon = np.arctan2(sinLon * cosLat,
                              cosLonCosLat * cosOl + sinLat * sinOl) \
                - self.orient_lon
            return rlon, rlat
        return lon, lat


def register_all(register) -> None:
    register(Isea)
    try:
        from proj_ray.ops import projections15 as p15

        p15.register_all(register)
    except ImportError:
        pass
