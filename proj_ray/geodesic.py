"""Vectorized geodesic computations on the ellipsoid (Karney's algorithm).

NumPy re-derivation of the direct and inverse geodesic problems following
C. F. F. Karney, "Algorithms for geodesics", J. Geodesy 87, 43-55 (2013)
— the same published algorithm the reference imports as Karney's C library
(src/geodesic.c, 6th-order series, GEODESIC_ORDER at src/geodesic.c:34-46;
API geod_init/geod_direct/geod_inverse at src/geodesic.h:145,183,271).

This implementation is batch-first: all inputs are ndarrays, the Newton
iteration of the inverse problem runs with an active mask. Accuracy target:
round-trip agreement with the direct problem at sub-millimeter level for
non-near-antipodal pairs; near-antipodal pairs fall back to extra plain
iterations (no exact Helmert-function treatment), which keeps errors below
~1 m in that measure-zero regime — adequate for kNN distance ranking and
conformance distance metrics. Azimuths in degrees like the reference API.
"""

from __future__ import annotations

import numpy as np

GEOD_ORD = 6


class Geodesic:
    def __init__(self, a: float = 6378137.0, f: float = 1 / 298.257223563):
        self.a = a
        self.f = f
        self.f1 = 1 - f
        self.e2 = f * (2 - f)
        self.ep2 = self.e2 / (1 - self.e2)
        self.n = f / (2 - f)
        self.b = a * self.f1
        n = self.n
        # A3 coefficients (Karney eq. 24, order 6)
        self.A3x = np.array([
            1.0,
            -(1.0 / 2 - n / 2),
            -(1.0 / 4 + n / 8 - 3 * n * n / 8),
            -(1.0 / 16 + 3 * n / 16 + n * n / 16),
            -(3.0 / 64 + n / 32),
            -3.0 / 128,
        ])
        # C3 coefficients (Karney eq. 25, order 6), ascending in eps,
        # C3[l] = eps^l * polynomial(C3x[l-1], eps)
        # authalic radius squared (geod_init, src/geodesic.c c2)
        e2 = self.e2
        if e2 == 0:
            t = 1.0
        elif e2 > 0:
            t = float(np.arctanh(np.sqrt(e2))) / np.sqrt(abs(e2))
        else:
            t = float(np.arctan(np.sqrt(-e2))) / np.sqrt(abs(e2))
        self.c2 = (self.a ** 2 + self.b ** 2 * t) / 2
        # C4 (area) series: order-6 coefficients of Karney's expansion
        # (I4 integral; same published table as src/geodesic.c C4coeff),
        # each entry a polynomial in n evaluated once here.
        _C4_TABLE = [
            (97, 15015), (1088, 156, 45045), (-224, -4784, 1573, 45045),
            (-10656, 14144, -4576, -858, 45045),
            (64, 624, -4576, 6864, -3003, 15015),
            (100, 208, 572, 3432, -12012, 30030, 45045),
            (1, 9009), (-2944, 468, 135135), (5792, 1040, -1287, 135135),
            (5952, -11648, 9152, -2574, 135135),
            (-64, -624, 4576, -6864, 3003, 135135),
            (8, 10725), (1856, -936, 225225), (-8448, 4992, -1144, 225225),
            (-1440, 4160, -4576, 1716, 225225),
            (-136, 63063), (1024, -208, 105105), (3584, -3328, 1144, 315315),
            (-128, 135135), (-2560, 832, 405405),
            (128, 99099),
        ]
        self.C4x: list[float] = []
        it = iter(_C4_TABLE)
        for ell in range(6):
            for j in range(5, ell - 1, -1):
                row = next(it)
                poly, denom = row[:-1], row[-1]
                v = 0.0
                for c in poly:
                    v = v * n + c
                self.C4x.append(v / denom)
        n2 = n * n
        self.C3x = [
            np.array([(1 - n) / 4, (1 - n2) / 8, (3 + 3 * n - n2) / 64,
                      (5 + 2 * n) / 128, 3.0 / 128]),
            np.array([(2 - 3 * n + n2) / 32, (3 - 2 * n - 3 * n2) / 64,
                      (3 + n) / 128, 5.0 / 256]),
            np.array([(5 - 9 * n + 5 * n2) / 192, (9 - 10 * n) / 384,
                      7.0 / 512]),
            np.array([(7 - 14 * n) / 512, 7.0 / 512]),
            np.array([21.0 / 2560]),
        ]

    # ---- series helpers (Karney eqs. 15-21) ------------------------------
    @staticmethod
    def _A1m1(eps):
        coeff = (1.0 / 4, 1.0 / 64, 1.0 / 256)
        e2 = eps * eps
        t = e2 * (coeff[0] + e2 * (coeff[1] + e2 * coeff[2]))
        return (t + eps) / (1 - eps)

    @staticmethod
    def _C1(eps):
        e = eps
        e2 = eps * eps
        return [
            e * (-1.0 / 2 + e2 * (3.0 / 16 - e2 / 32)),
            e2 * (-1.0 / 16 + e2 * (1.0 / 32 - 9.0 * e2 / 2048)),
            e * e2 * (-1.0 / 48 + e2 * 3.0 / 256),
            e2 * e2 * (-5.0 / 512 + e2 * 3.0 / 512),
            e * e2 * e2 * (-7.0 / 1280),
            e2 * e2 * e2 * (-7.0 / 2048),
        ]

    @staticmethod
    def _C1p(eps):
        e = eps
        e2 = eps * eps
        return [
            e * (1.0 / 2 + e2 * (-9.0 / 32 + e2 * 205.0 / 1536)),
            e2 * (5.0 / 16 + e2 * (-37.0 / 96 + e2 * 1335.0 / 4096)),
            e * e2 * (29.0 / 96 + e2 * (-75.0 / 128)),
            e2 * e2 * (539.0 / 1536 + e2 * (-2391.0 / 2560)),
            e * e2 * e2 * (3467.0 / 7680),
            e2 * e2 * e2 * (38081.0 / 61440),
        ]

    @staticmethod
    def _A2m1(eps):
        coeff = (-3.0 / 4, -7.0 / 64, -11.0 / 256)
        e2 = eps * eps
        t = e2 * (coeff[0] + e2 * (coeff[1] + e2 * coeff[2]))
        return (t - eps) / (1 + eps)

    @staticmethod
    def _C2(eps):
        e = eps
        e2 = eps * eps
        return [
            e * (1.0 / 2 + e2 * (1.0 / 16 + e2 / 32)),
            e2 * (3.0 / 16 + e2 * (1.0 / 32 + 35.0 * e2 / 2048)),
            e * e2 * (5.0 / 48 + e2 * 5.0 / 256),
            e2 * e2 * (35.0 / 512 + e2 * 7.0 / 512),
            e * e2 * e2 * (63.0 / 1280),
            e2 * e2 * e2 * (77.0 / 2048),
        ]

    def _A3f(self, eps):
        v = np.zeros_like(eps)
        for c in self.A3x[::-1]:
            v = v * eps + c
        return v

    def _C3f(self, eps):
        out = []
        mult = np.ones_like(eps)
        for l in range(5):
            mult = mult * eps
            poly = np.zeros_like(eps)
            for c in self.C3x[l][::-1]:
                poly = poly * eps + c
            out.append(mult * poly)
        return out

    def _C4f(self, eps):
        """C4 area series coefficients at eps (order 6)."""
        out = []
        o = 0
        mult = np.ones_like(eps)
        for ell in range(6):
            m = 5 - ell
            poly = np.zeros_like(eps)
            for c in self.C4x[o:o + m + 1]:
                poly = poly * eps + c
            out.append(mult * poly)
            o += m + 1
            mult = mult * eps
        return out

    @staticmethod
    def _sin_cos_series(sinp: bool, sinx, cosx, c):
        """Clenshaw sum of c[k]*sin((2k+2)x) (sinp) else cos((2k+1)x)."""
        ar = 2 * (cosx - sinx) * (cosx + sinx)
        y0 = np.zeros_like(sinx)
        y1 = np.zeros_like(sinx)
        for ck in c[::-1]:
            y0, y1 = ar * y0 - y1 + ck, y0
        if sinp:
            return 2 * sinx * cosx * y0
        return cosx * (y0 - y1)

    def _lengths(self, eps, sig12, ssig1, csig1, ssig2, csig2):
        """Reduced length m12/b and geodesic scales M12/M21 (mirror of
        geodesic.c Lengths() with the REDUCEDLENGTH|GEODESICSCALE
        outmask)."""
        k2 = 4.0 * eps / (1.0 - eps) ** 2
        dn1 = np.sqrt(1.0 + k2 * ssig1 * ssig1)
        dn2 = np.sqrt(1.0 + k2 * ssig2 * ssig2)
        A1 = 1 + self._A1m1(eps)
        A2 = 1 + self._A2m1(eps)
        C1 = self._C1(eps)
        C2 = self._C2(eps)
        B11 = self._sin_cos_series(True, ssig1, csig1, C1)
        B12 = self._sin_cos_series(True, ssig2, csig2, C1)
        B21 = self._sin_cos_series(True, ssig1, csig1, C2)
        B22 = self._sin_cos_series(True, ssig2, csig2, C2)
        J12 = (A1 - A2) * sig12 + (A1 * (B12 - B11) - A2 * (B22 - B21))
        m12b = (dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2)
                - csig1 * csig2 * J12)
        csig12 = csig1 * csig2 + ssig1 * ssig2
        t = k2 * (ssig2 - ssig1) * (ssig2 + ssig1) / (dn1 + dn2)
        M12 = csig12 + (t * ssig2 - csig2 * J12) * ssig1 / dn1
        M21 = csig12 - (t * ssig1 - csig1 * J12) * ssig2 / dn2
        return m12b, M12, M21

    def _lengths_m0(self, eps, sig12, ssig1, csig1, ssig2, csig2,
                    dn1, dn2):
        """Reduced length m12/b plus m0, with EXPLICIT dn factors —
        the form InverseStart's prolate branch needs, where Lengths()
        is called with eps=n and (ssig, csig) = (sbet, -/+cbet) so dn
        must be sqrt(1 + ep2*sbet^2), not derived from eps
        (reference: src/geodesic.c:1305-1308 Lengths call)."""
        A1 = 1 + self._A1m1(eps)
        A2 = 1 + self._A2m1(eps)
        m0 = A1 - A2
        C1, C2 = self._C1(eps), self._C2(eps)
        B11 = self._sin_cos_series(True, ssig1, csig1, C1)
        B12 = self._sin_cos_series(True, ssig2, csig2, C1)
        B21 = self._sin_cos_series(True, ssig1, csig1, C2)
        B22 = self._sin_cos_series(True, ssig2, csig2, C2)
        J12 = m0 * sig12 + (A1 * (B12 - B11) - A2 * (B22 - B21))
        m12b = (dn2 * (csig1 * ssig2) - dn1 * (ssig1 * csig2)
                - csig1 * csig2 * J12)
        return m12b, m0

    # ---- direct problem --------------------------------------------------
    def direct(self, lat1, lon1, azi1, s12, extra: bool = False):
        """Returns (lat2, lon2, azi2), degrees; with extra=True also
        appends (m12 meters, M12, M21)."""
        lat1 = np.asarray(lat1, dtype=np.float64)
        lon1 = np.asarray(lon1, dtype=np.float64)
        azi1 = np.asarray(azi1, dtype=np.float64)
        s12 = np.asarray(s12, dtype=np.float64)
        f1 = self.f1
        phi1 = np.radians(lat1)
        alp1 = np.radians(azi1)
        salp1 = np.sin(alp1)
        calp1 = np.cos(alp1)
        sbet1 = f1 * np.sin(phi1)
        cbet1 = np.maximum(np.cos(phi1), 1e-12)
        norm = np.hypot(sbet1, cbet1)
        sbet1 = sbet1 / norm
        cbet1 = cbet1 / norm
        # alp0: azimuth at equator crossing
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        ssig1 = sbet1
        somg1 = salp0 * sbet1
        csig1 = comg1 = np.where((sbet1 != 0) | (calp1 != 0),
                                 cbet1 * calp1, 1.0)
        norm = np.hypot(ssig1, csig1)
        ssig1 = ssig1 / norm
        csig1 = csig1 / norm
        k2 = calp0 * calp0 * self.ep2
        eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
        A1 = 1 + self._A1m1(eps)
        C1 = self._C1(eps)
        B11 = self._sin_cos_series(True, ssig1, csig1, C1)
        s = np.sin(B11)
        c = np.cos(B11)
        stau1 = ssig1 * c + csig1 * s
        ctau1 = csig1 * c - ssig1 * s
        tau12 = s12 / (self.b * A1)
        s = np.sin(tau12)
        c = np.cos(tau12)
        C1p = self._C1p(eps)
        B12 = -self._sin_cos_series(
            True, stau1 * c + ctau1 * s, ctau1 * c - stau1 * s, C1p)
        sig12 = tau12 - (B12 - B11)
        ssig12 = np.sin(sig12)
        csig12 = np.cos(sig12)
        ssig2 = ssig1 * csig12 + csig1 * ssig12
        csig2 = csig1 * csig12 - ssig1 * ssig12
        sbet2 = calp0 * ssig2
        cbet2 = np.hypot(salp0, calp0 * csig2)
        salp2 = salp0
        calp2 = calp0 * csig2
        somg2 = salp0 * ssig2
        comg2 = csig2
        omg12 = np.arctan2(somg2 * comg1 - comg2 * somg1,
                           comg2 * comg1 + somg2 * somg1)
        A3 = self._A3f(eps)
        C3 = self._C3f(eps)
        B31 = self._sin_cos_series(True, ssig1, csig1, C3)
        B32 = self._sin_cos_series(True, ssig2, csig2, C3)
        lam12 = omg12 - self.f * salp0 * A3 * (sig12 + (B32 - B31))
        lat2 = np.degrees(np.arctan2(sbet2, f1 * cbet2))
        lon2 = lon1 + np.degrees(lam12)
        lon2 = (lon2 + 180) % 360 - 180
        azi2 = np.degrees(np.arctan2(salp2, calp2))
        if extra:
            m12b, M12, M21 = self._lengths(eps, sig12, ssig1, csig1,
                                           ssig2, csig2)
            return lat2, lon2, azi2, self.b * m12b, M12, M21
        return lat2, lon2, azi2

    def _area_S12(self, sb1, cb1, sb2, cb2, salp1, calp1, salp2, calp2,
                  swsign, lonsign, latsign, equat, same):
        """Area between the geodesic edge and the equator (S12, m²) from
        canonical-frame quantities (geod_geninverse GEOD_AREA branch)."""
        salp0 = salp1 * cb1
        calp0 = np.hypot(calp1, salp1 * sb1)
        k2 = calp0 * calp0 * self.ep2
        eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
        A4 = self.a ** 2 * calp0 * salp0 * self.e2
        ssig1, csig1 = sb1, calp1 * cb1
        ssig2, csig2 = sb2, calp2 * cb2
        n1 = np.hypot(ssig1, csig1)
        n2 = np.hypot(ssig2, csig2)
        n1 = np.where(n1 == 0, 1.0, n1)
        n2 = np.where(n2 == 0, 1.0, n2)
        ssig1, csig1 = ssig1 / n1, csig1 / n1
        ssig2, csig2 = ssig2 / n2, csig2 / n2
        C4 = self._C4f(eps)
        B41 = self._sin_cos_series(False, ssig1, csig1, C4)
        B42 = self._sin_cos_series(False, ssig2, csig2, C4)
        S12 = np.where((calp0 != 0) & (salp0 != 0), A4 * (B42 - B41), 0.0)
        # spherical term c2*alp12; tan(Gamma/2) form when the edge is
        # short enough, alp2-alp1 fallback otherwise
        somg1, comg1 = salp0 * sb1, cb1 * calp1
        somg2, comg2 = salp0 * sb2, cb2 * calp2
        # the bilinears carry the per-point normalization scales; the
        # tan(Gamma/2) form needs true sin/cos of omg12, so go through
        # the (scale-invariant) angle
        omg12 = np.arctan2(somg2 * comg1 - comg2 * somg1,
                           comg2 * comg1 + somg2 * somg1)
        somg12 = np.sin(omg12)
        comg12 = np.cos(omg12)
        db1 = 1 + cb1
        db2 = 1 + cb2
        alp12_short = 2 * np.arctan2(
            somg12 * (sb1 * db2 + sb2 * db1),
            (1 + comg12) * (sb1 * sb2 + db1 * db2))
        salp12 = salp2 * calp1 - calp2 * salp1
        calp12 = calp2 * calp1 + salp2 * salp1
        fix = (salp12 == 0) & (calp12 < 0)
        salp12 = np.where(fix, 1e-300 * calp1, salp12)
        calp12 = np.where(fix, -1.0, calp12)
        alp12_long = np.arctan2(salp12, calp12)
        use_short = (comg12 > -0.7071) & (sb2 - sb1 < 1.75)
        alp12 = np.where(use_short, alp12_short, alp12_long)
        S12 = (S12 + self.c2 * alp12) * swsign * lonsign * latsign
        return np.where(equat | same, 0.0, S12)

    # ---- inverse problem -------------------------------------------------
    def inverse(self, lat1, lon1, lat2, lon2, extra: bool = False,
                area: bool = False):
        """Returns (s12 meters, azi1 deg, azi2 deg); with extra=True
        also appends (m12 meters, M12, M21).

        Canonical arrangement per Karney section 5: points swapped so
        |bet1| >= |bet2|, signs set so bet1 <= 0, longitudes so
        0 <= lam12 <= pi; azimuths unswapped at the end.
        """
        lat1 = np.asarray(lat1, dtype=np.float64).ravel()
        lon1 = np.asarray(lon1, dtype=np.float64).ravel()
        lat2 = np.asarray(lat2, dtype=np.float64).ravel()
        lon2 = np.asarray(lon2, dtype=np.float64).ravel()
        f1 = self.f1
        lon12 = (lon2 - lon1 + 180) % 360 - 180
        lonsign = np.where(lon12 >= 0, 1.0, -1.0)
        lon12a = np.abs(lon12)
        phi1 = np.radians(lat1)
        phi2 = np.radians(lat2)

        def _beta(phi):
            sb = f1 * np.sin(phi)
            cb = np.cos(phi)
            cb = np.where(np.abs(cb) < 1e-15, 1e-15, cb)
            n = np.hypot(sb, cb)
            return sb / n, cb / n

        sbet1, cbet1 = _beta(phi1)
        sbet2, cbet2 = _beta(phi2)
        swapp = np.abs(sbet1) < np.abs(sbet2)
        sb1 = np.where(swapp, sbet2, sbet1)
        cb1 = np.where(swapp, cbet2, cbet1)
        sb2 = np.where(swapp, sbet1, sbet2)
        cb2 = np.where(swapp, cbet1, cbet2)
        # swapping the endpoints reverses the longitude direction
        lonsign = np.where(swapp, -lonsign, lonsign)
        latsign = np.where(sb1 <= 0, 1.0, -1.0)
        sb1 = sb1 * latsign
        sb2 = sb2 * latsign
        lam12 = np.radians(lon12a)

        # start guess: spherical great-circle azimuth on reduced
        # latitudes (Karney sec. 5; the clam12-sign split avoids
        # cancellation near sig12 ~ 0 and ~ pi)
        sl, cl = np.sin(lam12), np.cos(lam12)
        salp1 = cb2 * sl
        sbet12 = sb2 * cb1 - cb2 * sb1
        sbet12a = sb2 * cb1 + cb2 * sb1
        with np.errstate(divide="ignore", invalid="ignore"):
            calp1 = np.where(
                cl >= 0,
                sbet12 + cb2 * sb1 * np.where(cl > -1.0,
                                              sl * sl / (1 + cl), 0.0),
                sbet12a - cb2 * sb1 * np.where(cl < 1.0,
                                               sl * sl / (1 - cl), 0.0))
        ssig12 = np.hypot(salp1, calp1)
        csig12 = sb1 * sb2 + cb1 * cb2 * cl
        # near-antipodal: the spherical guess sits at a stationary
        # point (for equatorial pairs it degenerates to the FALSE
        # azi=90 root, which returns s12 = pi*b). Use Karney sec. 7's
        # astroid construction: in scaled coordinates (x, y) the
        # correct start azimuth comes from the positive root k of
        # k^4 + 2k^3 - (x^2+y^2-1)k^2 - 2y^2 k - y^2 = 0.
        anti = (csig12 < 0) & (ssig12 < 6 * abs(self.n) * np.pi
                               * cb1 * cb1) & (abs(self.n) <= 0.1)
        if anti.any():
            err0 = np.seterr(divide="ignore", invalid="ignore")
            tol1 = 200 * np.finfo(float).eps
            if self.f >= 0:
                # oblate: x = scaled dlong, y = scaled dlat
                k2a = sb1 * sb1 * self.ep2
                eps0 = k2a / (2 * (1 + np.sqrt(1 + k2a)) + k2a)
                lamscale = self.f * cb1 * self._A3f(eps0) * np.pi
                lamscale = np.where(lamscale == 0, 1e-300, lamscale)
                betscale = lamscale * cb1
                x = (lam12 - np.pi) / lamscale
                y = sbet12a / betscale
            else:
                # prolate (f < 0): the roles of x and y SWAP — x is the
                # scaled latitude difference measured through the
                # reduced length at the antipode, y the scaled
                # longitude (src/geodesic.c:1297-1313)
                cbet12a = cb2 * cb1 - sb2 * sb1
                bet12a = np.arctan2(sbet12a, cbet12a)
                dn1 = np.sqrt(1 + self.ep2 * sb1 * sb1)
                dn2 = np.sqrt(1 + self.ep2 * sb2 * sb2)
                m12b, m0 = self._lengths_m0(
                    self.n, np.pi + bet12a, sb1, -cb1, sb2, cb2,
                    dn1, dn2)
                x = -1 + m12b / (cb1 * cb2 * m0 * np.pi)
                betscale = np.where(x < -0.01, sbet12a / x,
                                    -self.f * cb1 * cb1 * np.pi)
                lamscale = betscale / cb1
                lamscale = np.where(lamscale == 0, 1e-300, lamscale)
                y = (lam12 - np.pi) / lamscale
            xthresh = 1000 * np.sqrt(np.finfo(float).eps)
            simple = (y > -tol1) & (x > -1 - xthresh)
            if self.f >= 0:
                salp1_s = np.minimum(1.0, -np.clip(x, -1.0, 0.0))
                calp1_s = -np.sqrt(np.maximum(1 - salp1_s * salp1_s, 0.0))
            else:
                calp1_s = np.maximum(np.where(x > -tol1, 0.0, -1.0), x)
                salp1_s = np.sqrt(np.maximum(1 - calp1_s * calp1_s, 0.0))
            k = _astroid(x, y)
            omg12a = lamscale * np.where(
                self.f >= 0, -x * k / (1 + k),
                -y * (1 + k) / np.where(k == 0, 1.0, k))
            somg12 = np.sin(omg12a)
            comg12 = -np.cos(omg12a)
            salp1_a = cb2 * somg12
            calp1_a = sbet12a - cb2 * sb1 * np.where(
                comg12 > -1.0, somg12 * somg12 / (1 + comg12), 0.0)
            salp1 = np.where(anti, np.where(simple, salp1_s, salp1_a),
                             salp1)
            calp1 = np.where(anti, np.where(simple, calp1_s, calp1_a),
                             calp1)
            np.seterr(**err0)
        nz = np.hypot(salp1, calp1)
        nz = np.where(nz == 0, 1.0, nz)
        salp1, calp1 = salp1 / nz, calp1 / nz

        shape = salp1.shape
        salp1_f = salp1.copy()
        calp1_f = calp1.copy()
        sig12_f = np.zeros(shape)
        eps_f = np.zeros(shape)
        ssig1_f = np.zeros(shape)
        csig1_f = np.ones(shape)
        ssig2_f = np.zeros(shape)
        csig2_f = np.ones(shape)
        salp2_f = np.zeros(shape)
        calp2_f = np.ones(shape)

        # bracketed Newton (geodesic.c:1430-1470): in the canonical
        # arrangement v = lam12(alp1) - lam12 has a single root in
        # (0, pi) with v < 0 left of it and v > 0 right of it, so every
        # evaluation tightens an [alp1a, alp1b] bracket; when the Newton
        # step leaves the bracket (or dv <= 0 — nonmonotone tail past
        # the root), bisect instead. A bare step-clipped Newton can
        # limit-cycle across the root (seen on prolate near-antipodal
        # starts: +-0.5-rad-clipped steps jumping 83deg <-> 112deg over
        # a root at 97.7deg forever).
        active = np.ones(shape, dtype=bool)
        alp1a = np.zeros(shape)
        alp1b = np.full(shape, np.pi)
        for _it in range(80):
            if not active.any():
                break
            (v, dv, sig12, ssig1, csig1, ssig2, csig2, eps,
             salp2, calp2) = self._lambda12(
                sb1, cb1, sb2, cb2, salp1, calp1, lam12)
            upd = active
            sig12_f = np.where(upd, sig12, sig12_f)
            eps_f = np.where(upd, eps, eps_f)
            ssig1_f = np.where(upd, ssig1, ssig1_f)
            csig1_f = np.where(upd, csig1, csig1_f)
            ssig2_f = np.where(upd, ssig2, ssig2_f)
            csig2_f = np.where(upd, csig2, csig2_f)
            salp1_f = np.where(upd, salp1, salp1_f)
            calp1_f = np.where(upd, calp1, calp1_f)
            salp2_f = np.where(upd, salp2, salp2_f)
            calp2_f = np.where(upd, calp2, calp2_f)
            conv = np.abs(v) < 1e-13
            active = active & ~conv
            if not active.any():
                break
            alp1c = np.arctan2(salp1, calp1)
            alp1a = np.where(active & (v < 0),
                             np.maximum(alp1a, alp1c), alp1a)
            alp1b = np.where(active & (v > 0),
                             np.minimum(alp1b, alp1c), alp1b)
            with np.errstate(divide="ignore", invalid="ignore"):
                newton = alp1c - v / dv
            ok = ((dv > 0) & np.isfinite(newton)
                  & (newton > alp1a) & (newton < alp1b))
            alp1 = np.where(active,
                            np.where(ok, newton, 0.5 * (alp1a + alp1b)),
                            alp1c)
            # keep alp1 in (0, pi): geodesic goes eastward after canonical
            alp1 = np.clip(alp1, 1e-12, np.pi - 1e-12)
            salp1 = np.sin(alp1)
            calp1 = np.cos(alp1)

        A1 = 1 + self._A1m1(eps_f)
        C1 = self._C1(eps_f)
        B11 = self._sin_cos_series(True, ssig1_f, csig1_f, C1)
        B12 = self._sin_cos_series(True, ssig2_f, csig2_f, C1)
        s12 = self.b * A1 * (sig12_f + (B12 - B11))

        # equatorial special case: both within ~2e-9 rad of the equator
        # (the Newton iteration's sig12 is degenerate there: csig ~ 0 and
        # ssig ~ 0 simultaneously at azi ~ 90; the along-equator distance
        # is exact to O(a*bet^2) ~ 1e-7 m at this threshold)
        equat = ((np.abs(sb1) < 1e-7) & (np.abs(sb2) < 1e-7)
                 & (lam12 <= np.pi * (1 - self.f)))
        s12 = np.where(equat, self.a * lam12, s12)
        salp1_f = np.where(equat, 1.0, salp1_f)
        calp1_f = np.where(equat, 0.0, calp1_f)
        salp2_f = np.where(equat, 1.0, salp2_f)
        calp2_f = np.where(equat, 0.0, calp2_f)

        # undo canonicalization: swap azimuths back, apply signs
        # (GeographicLib: salp *= swapp*lonsign, calp *= swapp*latsign)
        swsign = np.where(swapp, -1.0, 1.0)
        sa1 = np.where(swapp, salp2_f, salp1_f) * swsign * lonsign
        ca1 = np.where(swapp, calp2_f, calp1_f) * swsign * latsign
        sa2 = np.where(swapp, salp1_f, salp2_f) * swsign * lonsign
        ca2 = np.where(swapp, calp1_f, calp2_f) * swsign * latsign
        azi1 = np.degrees(np.arctan2(sa1, ca1))
        azi2 = np.degrees(np.arctan2(sa2, ca2))
        same = (lon12a < 1e-13) & (np.abs(phi1 - phi2) < 1e-13)
        s12 = np.where(same, 0.0, s12)
        if extra:
            m12b, M12, M21 = self._lengths(eps_f, sig12_f, ssig1_f,
                                           csig1_f, ssig2_f, csig2_f)
            m12 = self.b * m12b
            # m12 is symmetric under endpoint exchange; the scales swap
            M12s = np.where(swapp, M21, M12)
            M21s = np.where(swapp, M12, M21)
            # equatorial shortcut: k2=0 so sigma = s/b exactly
            sig_eq = self.a * lam12 / self.b
            m12 = np.where(equat, self.b * np.sin(sig_eq), m12)
            M12s = np.where(equat, np.cos(sig_eq), M12s)
            M21s = np.where(equat, np.cos(sig_eq), M21s)
            m12 = np.where(same, 0.0, m12)
            M12s = np.where(same, 1.0, M12s)
            M21s = np.where(same, 1.0, M21s)
            return s12, azi1, azi2, m12, M12s, M21s
        if area:
            S12 = self._area_S12(sb1, cb1, sb2, cb2, salp1_f, calp1_f,
                                 salp2_f, calp2_f, swsign, lonsign,
                                 latsign, equat, same)
            return s12, azi1, azi2, S12
        return s12, azi1, azi2

    def _lambda12(self, sbet1, cbet1, sbet2, cbet2, salp1, calp1, lam12):
        """Karney's Lambda12(alp1) and its derivative; canonical inputs
        (bet1 <= 0, |bet1| >= |bet2|, 0 <= lam12 <= pi)."""
        calp1 = np.where((sbet1 == 0) & (calp1 == 0), -1e-15, calp1)
        salp0 = salp1 * cbet1
        calp0 = np.hypot(calp1, salp1 * sbet1)
        ssig1 = sbet1
        somg1 = salp0 * sbet1
        csig1 = comg1 = cbet1 * calp1
        n1 = np.hypot(ssig1, csig1)
        n1 = np.where(n1 == 0, 1.0, n1)
        ssig1n = ssig1 / n1
        csig1n = csig1 / n1

        # alp2: salp2*cbet2 = salp0; robust calp2 (Karney eq. 45 remark)
        with np.errstate(divide="ignore", invalid="ignore"):
            salp2 = np.where(cbet2 != cbet1, salp0 / cbet2, salp1)
            inner = np.where(
                cbet1 < -sbet1,
                (cbet2 - cbet1) * (cbet1 + cbet2),
                (sbet1 - sbet2) * (sbet1 + sbet2))
            calp2 = np.where(
                (cbet2 != cbet1) | (np.abs(sbet2) != -sbet1),
                np.sqrt(np.maximum(
                    (calp1 * cbet1) ** 2 + inner, 0.0)) / cbet2,
                np.abs(calp1))
        ssig2 = sbet2
        somg2 = salp0 * sbet2
        csig2 = comg2 = cbet2 * calp2
        n2 = np.hypot(ssig2, csig2)
        n2 = np.where(n2 == 0, 1.0, n2)
        ssig2n = ssig2 / n2
        csig2n = csig2 / n2

        sig12 = np.arctan2(
            np.maximum(csig1n * ssig2n - ssig1n * csig2n, 0.0),
            csig1n * csig2n + ssig1n * ssig2n)
        somg12 = np.maximum(comg1 * somg2 - somg1 * comg2, 0.0)
        comg12 = comg1 * comg2 + somg1 * somg2
        omg12 = np.arctan2(somg12, comg12)

        k2 = calp0 * calp0 * self.ep2
        eps = k2 / (2 * (1 + np.sqrt(1 + k2)) + k2)
        A3 = self._A3f(eps)
        C3 = self._C3f(eps)
        B31 = self._sin_cos_series(True, ssig1n, csig1n, C3)
        B32 = self._sin_cos_series(True, ssig2n, csig2n, C3)
        domg12 = -self.f * salp0 * A3 * (sig12 + (B32 - B31))
        v = (omg12 + domg12) - lam12

        # derivative via reduced length m12 (Karney eq. 38)
        A1 = 1 + self._A1m1(eps)
        A2 = 1 + self._A2m1(eps)
        C1 = self._C1(eps)
        C2 = self._C2(eps)
        B11 = self._sin_cos_series(True, ssig1n, csig1n, C1)
        B12 = self._sin_cos_series(True, ssig2n, csig2n, C1)
        B21 = self._sin_cos_series(True, ssig1n, csig1n, C2)
        B22 = self._sin_cos_series(True, ssig2n, csig2n, C2)
        J12 = (A1 - A2) * sig12 + (A1 * (B12 - B11) - A2 * (B22 - B21))
        dn1 = np.sqrt(1 + self.ep2 * sbet1 * sbet1)
        dn2 = np.sqrt(1 + self.ep2 * sbet2 * sbet2)
        with np.errstate(divide="ignore", invalid="ignore"):
            # reduced length / b (dimensionless, Karney eq. 38 / Lengths)
            m12b = (dn2 * (csig1n * ssig2n)
                    - dn1 * (ssig1n * csig2n)
                    - csig1n * csig2n * J12)
            dv = np.where(
                np.abs(calp2) > 1e-12,
                m12b * self.f1 / (calp2 * cbet2),
                -2 * self.f1 * dn1 / np.where(sbet1 == 0, -1e-12, sbet1))
        return (v, dv, sig12, ssig1n, csig1n, ssig2n, csig2n, eps,
                salp2, calp2)


    # ---- polygon area / line walking ------------------------------------
    def polygon_area(self, lats, lons):
        """Geodesic polygon perimeter (m) and signed area (m²) — the
        geod_polygon_* suite (src/geodesic.h:124, planimeter). Vertices
        in order; the closing edge is added automatically. Counter-
        clockwise traversal gives positive area; pole-encircling rings
        handled via prime-meridian crossing parity (transit())."""
        lats = np.asarray(lats, dtype=np.float64).ravel()
        lons = np.asarray(lons, dtype=np.float64).ravel()
        if len(lats) < 3:
            return 0.0, 0.0
        la1, lo1 = lats, lons
        la2 = np.roll(lats, -1)
        lo2 = np.roll(lons, -1)
        s12, _, _, S12 = self.inverse(la1, lo1, la2, lo2, area=True)
        perimeter = float(np.sum(s12))
        # transit(): prime-meridian crossing direction per edge
        lon12 = (lo2 - lo1 + 180.0) % 360.0 - 180.0
        n1 = (lo1 + 180.0) % 360.0 - 180.0
        n2 = (lo2 + 180.0) % 360.0 - 180.0
        cross = np.where(
            (lon12 > 0) & (((n1 < 0) & (n2 >= 0)) | ((n1 > 0) & (n2 == 0))),
            1, np.where((lon12 < 0) & (n1 >= 0) & (n2 < 0), -1, 0))
        crossings = int(np.sum(cross))
        area0 = 4 * np.pi * self.c2
        area = float(np.sum(S12))
        area = math_remainder(area, area0)
        if crossings % 2:
            area += (1.0 if area < 0 else -1.0) * area0 / 2
        area = -area  # right-hand rule: CCW positive (areareduceA)
        if area > area0 / 2:
            area -= area0
        elif area <= -area0 / 2:
            area += area0
        return perimeter, area

    def line_positions(self, lat1, lon1, azi1, distances):
        """Walk a geodesic line: positions at each distance from the
        start (geod_position, src/geodesic.h:483) — one vectorized
        direct solve over the distance array."""
        d = np.asarray(distances, dtype=np.float64)
        lat2, lon2, azi2 = self.direct(
            np.full_like(d, float(lat1)), np.full_like(d, float(lon1)),
            np.full_like(d, float(azi1)), d)
        return lat2, lon2, azi2


def _astroid(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Positive root k of k^4 + 2k^3 - (x^2+y^2-1)k^2 - 2y^2 k - y^2
    = 0 (Karney 2013 eq. 57 discussion) — the solution of the astroid
    equation giving the near-antipodal start azimuth. Vectorized
    closed form via the resolvent cubic; follows the published
    algorithm's branch structure to avoid cancellation."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p = x * x
    q = y * y
    r = (p + q - 1) / 6
    S = p * q / 4
    r2 = r * r
    r3 = r * r2
    disc = S * (S + 2 * r3)
    # disc >= 0: one real root of the resolvent cubic, with the sign
    # of the sqrt chosen to avoid cancellation in T3
    sq = np.sqrt(np.maximum(disc, 0.0))
    T3 = S + r3
    T3 = T3 + np.where(T3 < 0, -sq, sq)
    T = np.cbrt(T3)
    u_pos = r + T + np.where(T != 0, r2 / np.where(T == 0, 1.0, T), 0.0)
    # disc < 0: three real roots; the angle form picks the one needed
    ang = np.arctan2(np.sqrt(np.maximum(-disc, 0.0)), -(S + r3))
    u_neg = r + 2 * r * np.cos(ang / 3)
    u = np.where(disc >= 0, u_pos, u_neg)
    v = np.sqrt(u * u + q)
    uv = np.where(u < 0, q / np.where(v - u == 0, 1.0, v - u), u + v)
    w = (uv - q) / (2 * np.where(v == 0, 1.0, v))
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.where(uv > 0, uv / (np.sqrt(np.maximum(uv, 0.0) + w * w)
                                   + w), 0.0)
    # q == 0 and r <= 0: y = 0 with |x| <= 1 -> k = 0 (handled by the
    # caller's "simple" branch)
    return np.where((q == 0) & (r <= 0), 0.0, k)


def math_remainder(x: float, y: float) -> float:
    import math

    return math.remainder(x, y)


WGS84_GEOD = Geodesic()


def geod_inverse(lat1, lon1, lat2, lon2, a=6378137.0,
                 f=1 / 298.257223563):
    g = WGS84_GEOD if (a, f) == (WGS84_GEOD.a, WGS84_GEOD.f) else \
        Geodesic(a, f)
    return g.inverse(lat1, lon1, lat2, lon2)


def geod_direct(lat1, lon1, azi1, s12, a=6378137.0, f=1 / 298.257223563):
    g = WGS84_GEOD if (a, f) == (WGS84_GEOD.a, WGS84_GEOD.f) else \
        Geodesic(a, f)
    return g.direct(lat1, lon1, azi1, s12)
