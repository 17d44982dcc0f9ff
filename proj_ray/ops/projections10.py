"""Projection wave 10: rectangular polyconic, Chamberlin trimetric,
bipolar conic, Laborde, Roussilhe, IMW polyconic, and the modified
stereographic family (mil_os/lee_os/gs48/alsk/gs50).

References (parity targets, not copied):
  rpoly    src/projections/rpoly.cpp
  chamb    src/projections/chamb.cpp
  bipc     src/projections/bipc.cpp
  labrd    src/projections/labrd.cpp
  rouss    src/projections/rouss.cpp  (+ src/proj_mdist.cpp)
  imw_p    src/projections/imw_p.cpp
  mod_ster src/projections/mod_ster.cpp
"""

from __future__ import annotations

import math

import numpy as np

from proj_ray.kernels import _series as S
from proj_ray.ops.base import Coords, Operation
from proj_ray.ops.projections2 import aasin, aacos

EPS9 = 1e-9
EPS10 = 1e-10
EPS12 = 1e-12


# --- elliptic meridian distance (src/proj_mdist.cpp:47-128) ---------------

def mdist_ini(es: float) -> tuple[float, np.ndarray, float]:
    """Series coefficients for true meridian distance."""
    E_terms = [1.0]
    ens = es
    numf = twon1 = denfi = 1.0
    denf = 1.0
    twon = 4.0
    Es = 1.0
    El = 1.0
    i = 1
    for i in range(1, 20):
        numf *= twon1 * twon1
        den = twon * denf * denf * twon1
        T = numf / den
        E_terms.append(T * ens)
        Es -= E_terms[i]
        ens *= es
        twon *= 4.0
        denfi += 1.0
        denf *= denfi
        twon1 += 2.0
        if Es == El:
            break
        El = Es
    else:
        i = 19
    nb = i - 1
    b = np.zeros(i)
    E = Es
    Es2 = 1.0 - Es
    b[0] = Es2
    numf = denf = 1.0
    numfi = 2.0
    denfi = 3.0
    for j in range(1, i):
        Es2 -= E_terms[j]
        numf *= numfi
        denf *= denfi
        b[j] = Es2 * numf / denf
        numfi += 2.0
        denfi += 2.0
    return E, b[:nb + 1], es


def mdist(phi, sphi, cphi, md) -> np.ndarray:
    E, b, es = md
    sc = sphi * cphi
    sphi2 = sphi * sphi
    D = phi * E - es * sc / np.sqrt(1.0 - es * sphi2)
    acc = np.full(np.shape(phi), b[-1])
    for c in b[-2::-1]:
        acc = c + sphi2 * acc
    return D + sc * acc


def inv_mdist(dist, md) -> np.ndarray:
    _, _, es = md
    k = 1.0 / (1.0 - es)
    phi = np.array(dist, dtype=float, copy=True)
    active = np.isfinite(phi)
    for _ in range(20):
        if not active.any():
            break
        s = np.sin(phi)
        t = 1.0 - es * s * s
        step = (mdist(phi, s, np.cos(phi), md) - dist) * (t * np.sqrt(t)) * k
        phi = np.where(active, phi - step, phi)
        active = active & (np.abs(step) >= 1e-14)
    return phi


# --- complex polynomial (src/zpoly1.cpp) ----------------------------------

def zpoly(z: np.ndarray, C: np.ndarray) -> np.ndarray:
    """p(z) = sum_{i=1..len(C)} C[i-1] z^i (C_0 == 0)."""
    a = np.full(z.shape, C[-1], dtype=complex)
    for c in C[-2::-1]:
        a = c + z * a
    return z * a


def zpoly_deriv(z: np.ndarray, C: np.ndarray) -> np.ndarray:
    n = len(C)
    a = np.full(z.shape, n * C[-1], dtype=complex)
    for i in range(n - 1, 0, -1):
        a = i * C[i - 1] + z * a
    return a


class Rpoly(Operation):
    """Rectangular polyconic (no inverse), src/projections/rpoly.cpp."""

    name = "rpoly"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        self.phi1 = abs(ps.r("lat_ts"))
        self.mode = self.phi1 > EPS9
        if self.mode:
            self.fxb = 0.5 * math.sin(self.phi1)
            self.fxa = 0.5 / self.fxb
        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        if self.mode:
            fa = np.tan(lam * self.fxb) * self.fxa
        else:
            fa = 0.5 * lam
        flat = np.abs(phi) < EPS9
        with np.errstate(divide="ignore", invalid="ignore"):
            cot = 1.0 / np.tan(np.where(flat, 1.0, phi))
            fa2 = 2.0 * np.arctan(fa * np.sin(phi))
            x = np.where(flat, fa + fa, np.sin(fa2) * cot)
            y = np.where(flat, -P.phi0,
                         phi - P.phi0 + (1.0 - np.cos(fa2)) * cot)
        return x, y, z, t


def _vect(dphi, c1, s1, c2, s2, dlam):
    """Geodesic distance and azimuth on the sphere
    (src/projections/chamb.cpp:33-52)."""
    cdl = np.cos(dlam)
    big = (np.abs(dphi) > 1.0) | (np.abs(dlam) > 1.0)
    dp = np.sin(0.5 * dphi)
    dl = np.sin(0.5 * dlam)
    r_small = 2.0 * aasin(np.sqrt(dp * dp + c1 * c2 * dl * dl))
    r_big = aacos(s1 * s2 + c1 * c2 * cdl)
    r = np.where(big, r_big, r_small)
    az = np.arctan2(c2 * np.sin(dlam), c1 * s2 - s1 * c2 * cdl)
    zero = np.abs(r) <= EPS9
    return np.where(zero, 0.0, r), np.where(zero, 0.0, az)


def _lc(b, c, a):
    """Law of cosines angle (src/projections/chamb.cpp:55-57)."""
    return aacos(0.5 * (b * b + c * c - a * a) / (b * c))


class Chamb(Operation):
    """Chamberlin trimetric (no inverse), src/projections/chamb.cpp."""

    name = "chamb"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        P = self.P
        c = []
        for i in range(3):
            phi = ps.r(f"lat_{i + 1}")
            lam = ps.r(f"lon_{i + 1}")
            lam = float(S.adjlon(np.asarray([lam - P.lam0]))[0])
            c.append({"phi": phi, "lam": lam,
                      "cosphi": math.cos(phi), "sinphi": math.sin(phi)})
        for i in range(3):
            j = 0 if i == 2 else i + 1
            r, az = _vect(np.asarray([c[j]["phi"] - c[i]["phi"]]),
                          c[i]["cosphi"], c[i]["sinphi"],
                          c[j]["cosphi"], c[j]["sinphi"],
                          np.asarray([c[j]["lam"] - c[i]["lam"]]))
            if r[0] == 0.0:
                raise ValueError("chamb: control points must be distinct")
            c[i]["vr"] = float(r[0])
            c[i]["vaz"] = float(az[0])
        self.beta_0 = float(_lc(np.asarray([c[0]["vr"]]),
                                np.asarray([c[2]["vr"]]),
                                np.asarray([c[1]["vr"]]))[0])
        self.beta_1 = float(_lc(np.asarray([c[0]["vr"]]),
                                np.asarray([c[1]["vr"]]),
                                np.asarray([c[2]["vr"]]))[0])
        self.beta_2 = math.pi - self.beta_0
        c[0]["py"] = c[1]["py"] = c[2]["vr"] * math.sin(self.beta_0)
        self.py = 2.0 * c[0]["py"]
        c[2]["py"] = 0.0
        c[1]["px"] = 0.5 * c[0]["vr"]
        c[0]["px"] = -c[1]["px"]
        c[2]["px"] = c[0]["px"] + c[2]["vr"] * math.cos(self.beta_0)
        self.px = c[2]["px"]
        self.c = c
        if P.ell.es != 0.0:
            P.ell = Ellipsoid(a=P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        c = self.c
        sinphi = np.sin(phi)
        cosphi = np.cos(phi)
        v_r = []
        v_az = []
        at_ctl = []
        for i in range(3):
            r, az = _vect(phi - c[i]["phi"], c[i]["cosphi"], c[i]["sinphi"],
                          cosphi, sinphi, lam - c[i]["lam"])
            at_ctl.append(r == 0.0)
            v_r.append(r)
            v_az.append(S.adjlon(az - c[i]["vaz"]))
        x = np.full(phi.shape, self.px)
        y = np.full(phi.shape, self.py)
        with np.errstate(divide="ignore", invalid="ignore"):
            for i in range(3):
                j = 0 if i == 2 else i + 1
                a = _lc(c[i]["vr"], v_r[i], v_r[j])
                a = np.where(v_az[i] < 0.0, -a, a)
                if i == 0:
                    x = x + v_r[i] * np.cos(a)
                    y = y - v_r[i] * np.sin(a)
                elif i == 1:
                    a = self.beta_1 - a
                    x = x - v_r[i] * np.cos(a)
                    y = y - v_r[i] * np.sin(a)
                else:
                    a = self.beta_2 - a
                    x = x + v_r[i] * np.cos(a)
                    y = y + v_r[i] * np.sin(a)
        x = x / 3.0
        y = y / 3.0
        # point coincides with a control point -> that control point's xy
        for i in range(3):
            x = np.where(at_ctl[i], c[i]["px"], x)
            y = np.where(at_ctl[i], c[i]["py"], y)
            if i > 0:
                pass
        return x, y, z, t


# Bipolar conic constants (src/projections/bipc.cpp:10-28; published
# constants of the Miller-Briesemeister bipolar oblique conic).
_B_LAMB = -0.34894976726250681539
_B_N = 0.63055844881274687180
_B_F = 1.89724742567461030582
_B_AZAB = 0.81650043674686363166
_B_AZBA = 1.82261843856185925133
_B_T = 1.27246578267089012270
_B_RHOC = 1.20709121521568721927
_B_CAZC = 0.69691523038678375519
_B_SAZC = 0.71715351331143607555
_B_C45 = 0.70710678118654752469
_B_S45 = 0.70710678118654752410
_B_C20 = 0.93969262078590838411
_B_S20 = -0.34202014332566873287
_B_R110 = 1.91986217719376253360
_B_R104 = 1.81514242207410275904


class Bipc(Operation):
    """Bipolar conic of the western hemisphere,
    src/projections/bipc.cpp."""

    name = "bipc"

    def setup(self, ps) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        self.noskew = ps.flag("ns")
        if self.P.ell.es != 0.0:
            self.P.ell = Ellipsoid(a=self.P.ell.a, es=0.0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        cphi = np.cos(phi)
        sphi = np.sin(phi)
        pole = np.abs(np.abs(phi) - S.HALFPI) < EPS10
        with np.errstate(divide="ignore", invalid="ignore"):
            tphi = np.where(pole, np.inf, sphi / np.where(cphi == 0, 1.0,
                                                          cphi))
            sdlam_a = _B_LAMB - lam
            cdlam = np.cos(sdlam_a)
            sdlam = np.sin(sdlam_a)
            Az = np.where(pole,
                          np.where(phi < 0.0, math.pi, 0.0),
                          np.arctan2(sdlam, _B_C45 * (tphi - cdlam)))
            tag = Az > _B_AZBA
            # B-hemisphere (tag): recompute around the Atlantic pole
            sdlam_b = lam + _B_R110
            cdlam_b = np.cos(sdlam_b)
            sdlam_b2 = np.sin(sdlam_b)
            zb = _B_S20 * sphi + _B_C20 * cphi * cdlam_b
            za = _B_S45 * (sphi + cphi * cdlam)
            zv = np.where(tag, zb, za)
            err = np.abs(zv) > 1.000000001
            zv = np.clip(zv, -1.0, 1.0)
            zarc = np.arccos(zv)
            Az_b = np.where(pole, Az,
                            np.arctan2(sdlam_b2,
                                       _B_C20 * tphi - _B_S20 * cdlam_b))
            Az = np.where(tag, Az_b, Az)
            Av = np.where(tag, _B_AZAB, _B_AZBA)
            y0 = np.where(tag, _B_RHOC, -_B_RHOC)
            tt = np.tan(0.5 * zarc) ** _B_N
            r = _B_F * tt
            al_arg = 0.5 * (_B_R104 - zarc)
            err |= al_arg < 0.0
            al = (tt + np.maximum(al_arg, 0.0) ** _B_N) / _B_T
            err |= np.abs(al) > 1.000000001
            al = np.arccos(np.clip(al, -1.0, 1.0))
            tn = _B_N * (Av - Az)
            r = np.where(np.abs(tn) < al,
                         r / np.cos(al + np.where(tag, tn, -tn)), r)
            x = r * np.sin(tn)
            y = y0 + np.where(tag, -r, r) * np.cos(tn)
            if self.noskew:
                x, y = (-x * _B_CAZC - y * _B_SAZC,
                        -y * _B_CAZC + x * _B_SAZC)
        x = np.where(err, np.inf, x)
        y = np.where(err, np.inf, y)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        if self.noskew:
            x, y = (-x * _B_CAZC + y * _B_SAZC,
                    -y * _B_CAZC - x * _B_SAZC)
        neg = x < 0.0
        yy = np.where(neg, _B_RHOC - y, y + _B_RHOC)
        s = np.where(neg, _B_S20, _B_S45)
        c = np.where(neg, _B_C20, _B_C45)
        Av = np.where(neg, _B_AZAB, _B_AZBA)
        r = np.hypot(x, yy)
        rp = r.copy()
        rl = r.copy()
        Az = np.arctan2(x, yy)
        fAz = np.abs(Az)
        zarc = np.zeros(x.shape)
        bad = np.zeros(x.shape, dtype=bool)
        active = np.isfinite(r)
        with np.errstate(divide="ignore", invalid="ignore"):
            for it in range(10):
                if not active.any():
                    break
                zarc = np.where(active,
                                2.0 * np.arctan((r / _B_F) ** (1.0 / _B_N)),
                                zarc)
                al = np.arccos(np.clip(
                    (np.tan(0.5 * zarc) ** _B_N
                     + np.tan(0.5 * (_B_R104 - zarc)) ** _B_N) / _B_T,
                    -1.0, 1.0))
                r_new = np.where(fAz < al,
                                 rp * np.cos(al + np.where(neg, Az, -Az)), r)
                done = np.abs(rl - r_new) < EPS10
                rl = np.where(active, r_new, rl)
                r = np.where(active, r_new, r)
                if it == 9:
                    bad |= active & ~done
                active = active & ~done
            Az2 = Av - Az / _B_N
            phi = np.arcsin(s * np.cos(zarc) + c * np.sin(zarc) * np.cos(Az2))
            lam = np.arctan2(np.sin(Az2),
                             c / np.tan(zarc) - s * np.cos(Az2))
            lam = np.where(neg, lam - _B_R110, _B_LAMB - lam)
        lam = np.where(bad, np.inf, lam)
        phi = np.where(bad, np.inf, phi)
        return lam, phi, z, t


class Labrd(Operation):
    """Laborde oblique Mercator for Madagascar,
    src/projections/labrd.cpp."""

    name = "labrd"

    def setup(self, ps) -> None:
        P = self.P
        if P.phi0 == 0.0:
            raise ValueError("labrd: lat_0 must be non-zero")
        Az = ps.r("azi")
        sinp = math.sin(P.phi0)
        t = 1.0 - P.es * sinp * sinp
        N = 1.0 / math.sqrt(t)
        R = P.ell.one_es * N / t
        self.kRg = P.k0 * math.sqrt(N * R)
        self.p0s = math.atan(math.sqrt(R / N) * math.tan(P.phi0))
        self.A = sinp / math.sin(self.p0s)
        te = P.e * sinp
        self.C = (0.5 * P.e * self.A * math.log((1.0 + te) / (1.0 - te))
                  - self.A * math.log(math.tan(S.FORTPI + 0.5 * P.phi0))
                  + math.log(math.tan(S.FORTPI + 0.5 * self.p0s)))
        t2 = Az + Az
        self.Cb = 1.0 / (12.0 * self.kRg * self.kRg)
        self.Ca = (1.0 - math.cos(t2)) * self.Cb
        self.Cb *= math.sin(t2)
        self.Cc = 3.0 * (self.Ca * self.Ca - self.Cb * self.Cb)
        self.Cd = 6.0 * self.Ca * self.Cb

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        V1 = self.A * np.log(np.tan(S.FORTPI + 0.5 * phi))
        te = P.e * np.sin(phi)
        V2 = 0.5 * P.e * self.A * np.log((1.0 + te) / (1.0 - te))
        ps = 2.0 * (np.arctan(np.exp(V1 - V2 + self.C)) - S.FORTPI)
        I1 = ps - self.p0s
        cosps = np.cos(ps)
        cosps2 = cosps * cosps
        sinps = np.sin(ps)
        sinps2 = sinps * sinps
        I4 = self.A * cosps
        I2 = 0.5 * self.A * I4 * sinps
        I3 = I2 * self.A * self.A * (5.0 * cosps2 - sinps2) / 12.0
        I6 = I4 * self.A * self.A
        I5 = I6 * (cosps2 - sinps2) / 6.0
        I6 = I6 * (self.A * self.A
                   * (5.0 * cosps2 * cosps2
                      + sinps2 * (sinps2 - 18.0 * cosps2)) / 120.0)
        tl = lam * lam
        x = self.kRg * lam * (I4 + tl * (I5 + tl * I6))
        y = self.kRg * (I1 + tl * (I2 + tl * I3))
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        x = x + self.Ca * V1 + self.Cb * V2
        y = y + self.Ca * V2 - self.Cb * V1
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        x2 = x * x
        y2 = y * y
        V1 = 3.0 * x * y2 - x * x2
        V2 = y * y2 - 3.0 * x2 * y
        V3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
        V4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
        xx = x + (-self.Ca * V1 - self.Cb * V2 + self.Cc * V3
                  + self.Cd * V4)
        yy = y + (self.Cb * V1 - self.Ca * V2 - self.Cd * V3
                  + self.Cc * V4)
        ps = self.p0s + yy / self.kRg
        pe = ps + P.phi0 - self.p0s
        active = np.isfinite(pe)
        for _ in range(20):
            if not active.any():
                break
            V1 = self.A * np.log(np.tan(S.FORTPI + 0.5 * pe))
            tpe = P.e * np.sin(pe)
            V2 = 0.5 * P.e * self.A * np.log((1.0 + tpe) / (1.0 - tpe))
            step = ps - 2.0 * (np.arctan(np.exp(V1 - V2 + self.C))
                               - S.FORTPI)
            pe = np.where(active, pe + step, pe)
            active = active & (np.abs(step) >= EPS10)
        te = P.e * np.sin(pe)
        te = 1.0 - te * te
        Re = P.ell.one_es / (te * np.sqrt(te))
        tt = np.tan(ps)
        t2 = tt * tt
        s = self.kRg * self.kRg
        d = Re * P.k0 * self.kRg
        I7 = tt / (2.0 * d)
        I8 = tt * (5.0 + 3.0 * t2) / (24.0 * d * s)
        d = np.cos(ps) * self.kRg * self.A
        I9 = 1.0 / d
        d = d * s
        I10 = (1.0 + 2.0 * t2) / (6.0 * d)
        I11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
        x2 = xx * xx
        phi = pe + x2 * (-I7 + I8 * x2)
        lam = xx * (I9 + x2 * (-I10 + x2 * I11))
        return lam, phi, z, t


class Rouss(Operation):
    """Roussilhe stereographic (ellipsoidal polynomial),
    src/projections/rouss.cpp."""

    name = "rouss"

    def setup(self, ps) -> None:
        P = self.P
        self.md = mdist_ini(P.es)
        sp0 = math.sin(P.phi0)
        self.s0 = float(mdist(np.asarray([P.phi0]), np.asarray([sp0]),
                              np.asarray([math.cos(P.phi0)]), self.md)[0])
        es2 = P.es * sp0 * sp0
        t = 1.0 - es2
        N0 = 1.0 / math.sqrt(t)
        R_R0_2 = t * t / P.ell.one_es
        R_R0_4 = R_R0_2 * R_R0_2
        tp = math.tan(P.phi0)
        t2 = tp * tp
        self.A1 = self.C1 = R_R0_2 / 4.0
        self.A2 = self.C2 = R_R0_2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0
        self.A3 = R_R0_2 * tp * (1.0 + 4.0 * t2) / (12.0 * N0)
        self.A4 = R_R0_4 / 24.0
        self.A5 = R_R0_4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0
        self.A6 = R_R0_4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0
        self.B1 = tp / (2.0 * N0)
        self.B2 = R_R0_2 / 12.0
        self.B3 = R_R0_2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0
        self.B4 = R_R0_2 * tp * (2.0 - t2) / (24.0 * N0)
        self.B5 = R_R0_2 * tp * (5.0 + 4.0 * t2) / (8.0 * N0)
        self.B6 = R_R0_4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0
        self.B7 = R_R0_4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0
        self.B8 = R_R0_4 / 120.0
        self.C3 = R_R0_2 * tp * (1.0 + t2) / (3.0 * N0)
        self.C4 = R_R0_4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0
        self.C5 = R_R0_4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0
        self.C6 = R_R0_4 / 16.0
        self.C7 = R_R0_4 * tp * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * N0)
        self.C8 = R_R0_4 * tp * (1.0 + t2 * 4.0) / (36.0 * N0)
        self.D1 = tp / (2.0 * N0)
        self.D2 = R_R0_2 / 12.0
        self.D3 = R_R0_2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0
        self.D4 = R_R0_2 * tp * (1.0 + t2) / (8.0 * N0)
        self.D5 = R_R0_2 * tp * (1.0 + t2 * 2.0) / (4.0 * N0)
        self.D6 = R_R0_4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0
        self.D7 = R_R0_4 * t2 * (3.0 + t2 * 4.0) / 8.0
        self.D8 = R_R0_4 / 80.0
        self.D9 = R_R0_4 * tp * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0
        self.D10 = R_R0_4 * tp * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * N0)
        self.D11 = R_R0_4 * tp * (37.0 + t2 * 44.0) / (96.0 * N0)

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        cp = np.cos(phi)
        sp = np.sin(phi)
        s = mdist(phi, sp, cp, self.md) - self.s0
        s2 = s * s
        al = lam * cp / np.sqrt(1.0 - P.es * sp * sp)
        al2 = al * al
        x = P.k0 * al * (1.0 + s2 * (self.A1 + s2 * self.A4)
                         - al2 * (self.A2 + s * self.A3 + s2 * self.A5
                                  + al2 * self.A6))
        y = P.k0 * (al2 * (self.B1 + al2 * self.B4)
                    + s * (1.0 + al2 * (self.B3 - al2 * self.B6)
                           + s2 * (self.B2 + s2 * self.B8)
                           + s * al2 * (self.B5 + s * self.B7)))
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        xx = x / P.k0
        yy = y / P.k0
        x2 = xx * xx
        y2 = yy * yy
        al = xx * (1.0 - self.C1 * y2
                   + x2 * (self.C2 + self.C3 * yy - self.C4 * x2
                           + self.C5 * y2 - self.C7 * x2 * yy)
                   + y2 * (self.C6 * y2 - self.C8 * x2 * yy))
        s = (self.s0 + yy * (1.0 + y2 * (-self.D2 + self.D8 * y2))
             + x2 * (-self.D1
                     + yy * (-self.D3
                             + yy * (-self.D5
                                     + yy * (-self.D7 + yy * self.D11)))
                     + x2 * (self.D4 + yy * (self.D6 + yy * self.D10)
                             - x2 * self.D9)))
        phi = inv_mdist(s, self.md)
        sp = np.sin(phi)
        lam = al * np.sqrt(1.0 - P.es * sp * sp) / np.cos(phi)
        return lam, phi, z, t


class ImwP(Operation):
    """International Map of the World polyconic,
    src/projections/imw_p.cpp."""

    name = "imw_p"

    def setup(self, ps) -> None:
        P = self.P
        if not ps.has("lat_1"):
            raise ValueError("imw_p: lat_1 required")
        if not ps.has("lat_2"):
            raise ValueError("imw_p: lat_2 required")
        self.en = S.enfn(P.ell.n)
        phi_1 = ps.r("lat_1")
        phi_2 = ps.r("lat_2")
        delta = 0.5 * (phi_2 - phi_1)
        sig = 0.5 * (phi_2 + phi_1)
        if abs(delta) < EPS10 or abs(sig) < EPS10:
            raise ValueError("imw_p: |lat_1 - lat_2| and |lat_1 + lat_2| "
                             "must be > 0")
        if phi_2 < phi_1:
            phi_1, phi_2 = phi_2, phi_1
        self.phi_1, self.phi_2 = phi_1, phi_2
        if ps.has("lon_1"):
            self.lam_1 = ps.r("lon_1")
        else:
            sigd = abs(math.degrees(sig))
            self.lam_1 = math.radians(
                2.0 if sigd <= 60 else (4.0 if sigd <= 76 else 8.0))
        self.mode = 0
        if phi_1 != 0.0:
            x1, y1, self.sphi_1, self.R_1 = self._xy(phi_1)
        else:
            self.mode = 1
            y1 = 0.0
            x1 = self.lam_1
            self.sphi_1 = 0.0
            self.R_1 = 0.0
        if phi_2 != 0.0:
            x2, T2, self.sphi_2, self.R_2 = self._xy(phi_2)
        else:
            self.mode = -1
            T2 = 0.0
            x2 = self.lam_1
            self.sphi_2 = 0.0
            self.R_2 = 0.0
        m1 = float(S.mlfn(np.asarray([phi_1]), np.asarray([self.sphi_1]),
                          np.asarray([math.cos(phi_1)]), self.en)[0])
        m2 = float(S.mlfn(np.asarray([phi_2]), np.asarray([self.sphi_2]),
                          np.asarray([math.cos(phi_2)]), self.en)[0])
        tm = m2 - m1
        sm = x2 - x1
        y2 = math.sqrt(tm * tm - sm * sm) + y1
        self.C2 = y2 - T2
        tm = 1.0 / tm
        self.Pc = (m2 * y1 - m1 * y2) * tm
        self.Qc = (y2 - y1) * tm
        self.Pp = (m2 * x1 - m1 * x2) * tm
        self.Qp = (x2 - x1) * tm

    def _xy(self, phi: float):
        sp = math.sin(phi)
        R = 1.0 / (math.tan(phi) * math.sqrt(1.0 - self.P.es * sp * sp))
        F = self.lam_1 * sp
        return R * math.sin(F), R * (1 - math.cos(F)), sp, R

    def _loc_for(self, lam, phi):
        """Vectorized loc_for (src/projections/imw_p.cpp:63-110);
        returns (x, y, yc)."""
        P = self.P
        flat = phi == 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            sp = np.sin(phi)
            m = S.mlfn(phi, sp, np.cos(phi), self.en)
            xa = self.Pp + self.Qp * m
            ya = self.Pc + self.Qc * m
            R = 1.0 / (np.tan(np.where(flat, 1.0, phi))
                       * np.sqrt(1.0 - P.es * sp * sp))
            C = np.sqrt(R * R - xa * xa)
            C = np.where(phi < 0.0, -C, C)
            C = C + ya - R
            if self.mode == -1:
                xb = lam
                yb = np.full(lam.shape, self.C2)
            else:
                tt = lam * self.sphi_2
                xb = self.R_2 * np.sin(tt)
                yb = self.C2 + self.R_2 * (1.0 - np.cos(tt))
            if self.mode == 1:
                xc = lam
                yc = np.zeros(lam.shape)
            else:
                tt = lam * self.sphi_1
                xc = self.R_1 * np.sin(tt)
                yc = self.R_1 * (1.0 - np.cos(tt))
            D = (xb - xc) / (yb - yc)
            B = xc + D * (C + R - yc)
            x = D * np.sqrt(R * R * (1 + D * D) - B * B)
            x = np.where(phi > 0, -x, x)
            x = (B + x) / (1.0 + D * D)
            y = np.sqrt(R * R - x * x)
            y = np.where(phi > 0, -y, y)
            y = y + C + R
        x = np.where(flat, lam, x)
        y = np.where(flat, 0.0, y)
        yc = np.where(flat, 0.0, yc)
        return x, y, yc

    def _fwd(self, lam, phi, z, t) -> Coords:
        x, y, _ = self._loc_for(lam, phi)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        phi = np.full(x.shape, self.phi_2)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x / math.cos(self.phi_2)
        active = np.isfinite(x) & np.isfinite(y)
        bad = ~active
        for _ in range(1000):
            tx, ty, yc = self._loc_for(lam, phi)
            denom = ty - yc
            with np.errstate(divide="ignore", invalid="ignore"):
                update = (denom != 0) | (np.abs(ty - y) > EPS10)
                newly_bad = active & update & (denom == 0)
                bad |= newly_bad
                active &= ~newly_bad
                phi_new = ((phi - self.phi_1) * (y - yc)
                           / np.where(denom == 0, 1.0, denom) + self.phi_1)
                phi = np.where(active & update, phi_new, phi)
                lam_upd = (tx != 0) & (np.abs(tx - x) > EPS10)
                lam = np.where(active & lam_upd,
                               lam * x / np.where(tx == 0, 1.0, tx), lam)
            active = active & ((np.abs(tx - x) > EPS10)
                               | (np.abs(ty - y) > EPS10))
            if not active.any():
                break
        bad |= active
        lam = np.where(bad, np.inf, lam)
        phi = np.where(bad, np.inf, phi)
        return lam, phi, z, t


class _ModSter(Operation):
    """Modified stereographic base (src/projections/mod_ster.cpp:24-130).
    Subclasses fix lam0/phi0, the complex coefficients, and possibly the
    ellipsoid (preserving the user ra, as the reference never recomputes
    derived ellipsoid fields after overriding a/es)."""

    name = "?"
    lam0_deg = 0.0
    phi0_deg = 0.0

    def setup(self, ps) -> None:
        P = self.P
        P.lam0 = math.radians(self.lam0_deg)
        P.phi0 = math.radians(self.phi0_deg)
        self._fix_ellipsoid(ps)
        e = P.e
        if P.es != 0.0:
            esphi = e * math.sin(P.phi0)
            chio = 2.0 * math.atan(
                math.tan((S.HALFPI + P.phi0) * 0.5)
                * ((1.0 - esphi) / (1.0 + esphi)) ** (e * 0.5)) - S.HALFPI
        else:
            chio = P.phi0
        self.schio = math.sin(chio)
        self.cchio = math.cos(chio)

    def _fix_ellipsoid(self, ps) -> None:
        pass

    def _force(self, a: float, es: float | None) -> None:
        from proj_ray.ellipsoid import Ellipsoid

        P = self.P
        orig_ra = P.ell.ra
        if es is None:
            es = P.ell.es
        P.ell = Ellipsoid(a=a, es=es)
        P.ell.ra = orig_ra

    def _fwd(self, lam, phi, z, t) -> Coords:
        P = self.P
        sinlon = np.sin(lam)
        coslon = np.cos(lam)
        esphi = P.e * np.sin(phi)
        if P.es != 0.0:
            chi = 2.0 * np.arctan(
                np.tan((S.HALFPI + phi) * 0.5)
                * ((1.0 - esphi) / (1.0 + esphi)) ** (P.e * 0.5)) - S.HALFPI
        else:
            chi = phi
        schi = np.sin(chi)
        cchi = np.cos(chi)
        denom = 1.0 + self.schio * schi + self.cchio * cchi * coslon
        with np.errstate(divide="ignore", invalid="ignore"):
            s = 2.0 / denom
            p = zpoly(s * cchi * sinlon
                      + 1j * (s * (self.cchio * schi
                                   - self.schio * cchi * coslon)),
                      self.zcoeff)
        x = np.where(denom == 0, np.inf, p.real)
        y = np.where(denom == 0, np.inf, p.imag)
        return x, y, z, t

    def _inv(self, x, y, z, t) -> Coords:
        P = self.P
        p = x + 1j * y
        target = p.copy()
        active = np.isfinite(x) & np.isfinite(y)
        conv = np.zeros(x.shape, dtype=bool)
        for _ in range(20):
            if not active.any():
                break
            f = zpoly(p, self.zcoeff) - target
            fp = zpoly_deriv(p, self.zcoeff)
            with np.errstate(divide="ignore", invalid="ignore"):
                dp = -f / fp
            p = np.where(active, p + dp, p)
            done = (np.abs(dp.real) + np.abs(dp.imag)) <= EPS12
            conv |= active & done
            active &= ~done
        rh = np.hypot(p.real, p.imag)
        zz = 2.0 * np.arctan(0.5 * rh)
        sinz = np.sin(zz)
        cosz = np.cos(zz)
        origin = np.abs(rh) <= EPS12
        with np.errstate(divide="ignore", invalid="ignore"):
            chi = aasin(cosz * self.schio
                        + p.imag * sinz * self.cchio
                        / np.where(origin, 1.0, rh))
            phi = chi.copy()
            if P.es != 0.0:
                act2 = conv & ~origin
                for _ in range(20):
                    if not act2.any():
                        break
                    esphi = P.e * np.sin(phi)
                    dphi = (2.0 * np.arctan(
                        np.tan((S.HALFPI + chi) * 0.5)
                        * ((1.0 + esphi) / (1.0 - esphi)) ** (P.e * 0.5))
                        - S.HALFPI - phi)
                    phi = np.where(act2, phi + dphi, phi)
                    act2 = act2 & (np.abs(dphi) > EPS12)
            lam = np.arctan2(p.real * sinz,
                             rh * self.cchio * cosz
                             - p.imag * self.schio * sinz)
        lam = np.where(origin, 0.0, lam)
        phi = np.where(origin, P.phi0, phi)
        lam = np.where(conv | origin, lam, np.inf)
        phi = np.where(conv | origin, phi, np.inf)
        return lam, phi, z, t


class MilOs(_ModSter):
    name = "mil_os"
    lam0_deg = 20.0
    phi0_deg = 18.0
    zcoeff = np.array([0.924500, 0.0, 0.019430], dtype=complex)

    def _fix_ellipsoid(self, ps) -> None:
        self._force(self.P.ell.a, 0.0)


class LeeOs(_ModSter):
    name = "lee_os"
    lam0_deg = -165.0
    phi0_deg = -10.0
    zcoeff = np.array([0.721316, 0.0, -0.0088162 - 0.00617325j],
                      dtype=complex)

    def _fix_ellipsoid(self, ps) -> None:
        self._force(self.P.ell.a, 0.0)


class Gs48(_ModSter):
    name = "gs48"
    lam0_deg = -96.0
    phi0_deg = 39.0
    zcoeff = np.array([0.98879, 0.0, -0.050909, 0.0, 0.075528],
                      dtype=complex)

    def _fix_ellipsoid(self, ps) -> None:
        self._force(6370997.0, 0.0)


_ALSK_ABE = np.array([
    0.9945303, 0.0052083 - 0.0027404j, 0.0072721 + 0.0048181j,
    -0.0151089 - 0.1932526j, 0.0642675 - 0.1381226j,
    0.3582802 - 0.2884586j], dtype=complex)
_ALSK_ABS = np.array([
    0.9972523, 0.0052513 - 0.0041175j, 0.0074606 + 0.0048125j,
    -0.0153783 - 0.1968253j, 0.0636871 - 0.1408027j,
    0.3660976 - 0.2937382j], dtype=complex)
_GS50_ABE = np.array([
    0.9827497, 0.0210669 + 0.0053804j, -0.1031415 - 0.0571664j,
    -0.0323337 - 0.0322847j, 0.0502303 + 0.1211983j,
    0.0251805 + 0.0895678j, -0.0012315 - 0.1416121j,
    0.0072202 - 0.1317091j, -0.0194029 + 0.0759677j,
    -0.0210072 + 0.0834037j], dtype=complex)
_GS50_ABS = np.array([
    0.9842990, 0.0211642 + 0.0037608j, -0.1036018 - 0.0575102j,
    -0.0329095 - 0.0320119j, 0.0499471 + 0.1223335j,
    0.0260460 + 0.0899805j, 0.0007388 - 0.1435792j,
    0.0075848 - 0.1334108j, -0.0216473 + 0.0776645j,
    -0.0225161 + 0.0853673j], dtype=complex)


class Alsk(_ModSter):
    name = "alsk"
    lam0_deg = -152.0
    phi0_deg = 64.0

    def _fix_ellipsoid(self, ps) -> None:
        if self.P.ell.es != 0.0:
            self.zcoeff = _ALSK_ABE
            self._force(6378206.4, 0.00676866)
        else:
            self.zcoeff = _ALSK_ABS
            self._force(6370997.0, 0.0)


class Gs50(_ModSter):
    name = "gs50"
    lam0_deg = -120.0
    phi0_deg = 45.0

    def _fix_ellipsoid(self, ps) -> None:
        if self.P.ell.es != 0.0:
            self.zcoeff = _GS50_ABE
            self._force(6378206.4, 0.00676866)
        else:
            self.zcoeff = _GS50_ABS
            self._force(6370997.0, 0.0)


def register_all(register) -> None:
    for cls in (Rpoly, Chamb, Bipc, Labrd, Rouss, ImwP,
                MilOs, LeeOs, Gs48, Alsk, Gs50):
        register(cls)
    try:
        from proj_ray.ops import projections11 as p11

        p11.register_all(register)
    except ImportError:
        pass
