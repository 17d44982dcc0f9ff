"""Vectorized shared math helpers.

Re-derivations (batch/NumPy form) of the reference's scalar helpers:
meridional-arc series ``pj_enfn/pj_mlfn/pj_inv_mlfn`` (``src/mlfn.cpp``),
isometric-latitude machinery ``pj_tsfn``/``pj_phi2``/``pj_sinhpsi2tanphi``
(``src/tsfn.cpp``, ``src/phi2.cpp``), ``pj_msfn`` (``src/msfn.cpp``),
``pj_qsfn`` (``src/qsfn.cpp``), longitude wrap ``adjlon``
(``src/adjlon.cpp``), and the Gauss/Clenshaw helpers used by the exact
(Poder/Engsager) transverse Mercator (``src/projections/tmerc.cpp:263-330``).

Every function takes/returns ``np.ndarray`` (float64) and is branch-free
per element (masks instead of branches); a scalar float also works by
promotion.
"""

from __future__ import annotations

import numpy as np

TWOPI = 2 * np.pi
HALFPI = np.pi / 2
FORTPI = np.pi / 4

# -- longitude wrap (src/adjlon.cpp) ----------------------------------------


def adjlon(lam: np.ndarray) -> np.ndarray:
    """Wrap longitude(s) to [-pi, pi], letting values within 1e-12 overshoot
    stand (avoids sign flips exactly at the date line)."""
    lam = np.asarray(lam, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        need = np.abs(lam) >= np.pi + 1e-12
        if not need.any():
            return lam
        shifted = lam + np.pi
        shifted = shifted - TWOPI * np.floor(shifted / TWOPI)
        return np.where(need & np.isfinite(lam), shifted - np.pi, lam)


# -- meridional arc: 6th-order series in third flattening (src/mlfn.cpp) ----

_Lmax = 6
_COEFF_RAD = (1.0, 1.0 / 4, 1.0 / 64, 1.0 / 256)
_COEFF_MU_PHI = (
    -3.0 / 2, 9.0 / 16, -3.0 / 32, 15.0 / 16,
    -15.0 / 32, 135.0 / 2048, -35.0 / 48, 105.0 / 256,
    315.0 / 512, -189.0 / 512, -693.0 / 1280, 1001.0 / 2048,
)
_COEFF_PHI_MU = (
    3.0 / 2, -27.0 / 32, 269.0 / 512, 21.0 / 16,
    -55.0 / 32, 6759.0 / 4096, 151.0 / 96, -417.0 / 128,
    1097.0 / 512, -15543.0 / 2560, 8011.0 / 2560, 293393.0 / 61440,
)


def _polyval(x: float, p: tuple[float, ...], N: int) -> float:
    y = p[N] if N >= 0 else 0.0
    while N > 0:
        N -= 1
        y = y * x + p[N]
    return y


def enfn(n: float) -> np.ndarray:
    """Precompute the 13 meridional-arc coefficients for third flattening n."""
    n2 = n * n
    en = np.empty(2 * _Lmax + 1)
    en[0] = _polyval(n2, _COEFF_RAD, _Lmax // 2) / (1 + n)
    d = n
    o = 0
    for l in range(_Lmax):
        m = (_Lmax - l - 1) // 2
        en[l + 1] = d * _polyval(n2, _COEFF_MU_PHI[o:], m)
        en[l + 1 + _Lmax] = d * _polyval(n2, _COEFF_PHI_MU[o:], m)
        d *= n
        o += m + 1
    return en


def _clenshaw_sin2k(szeta: np.ndarray, czeta: np.ndarray,
                    c: np.ndarray) -> np.ndarray:
    """sum(c[k] * sin((2k+2) zeta)) via Clenshaw, vectorized over zeta."""
    u0 = np.zeros_like(szeta)
    u1 = np.zeros_like(szeta)
    X = 2 * (czeta - szeta) * (czeta + szeta)  # 2 cos(2 zeta)
    for k in range(len(c) - 1, -1, -1):
        u0, u1 = X * u0 - u1 + c[k], u0
    return 2 * szeta * czeta * u0


def mlfn(phi: np.ndarray, sphi: np.ndarray, cphi: np.ndarray,
         en: np.ndarray) -> np.ndarray:
    return en[0] * (phi + _clenshaw_sin2k(sphi, cphi, en[1:1 + _Lmax]))


def inv_mlfn(mu: np.ndarray, en: np.ndarray) -> np.ndarray:
    mu = mu / en[0]
    return mu + _clenshaw_sin2k(np.sin(mu), np.cos(mu), en[1 + _Lmax:])


# -- isometric latitude (src/tsfn.cpp, src/phi2.cpp) ------------------------


def tsfn(phi: np.ndarray, sinphi: np.ndarray, e: float) -> np.ndarray:
    """ts(phi) = exp(-psi), Snyder (7-10); accurate near both poles."""
    cosphi = np.cos(phi)
    pos = sinphi > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        base = np.where(pos, cosphi / (1 + sinphi), (1 - sinphi) / cosphi)
        return np.exp(e * np.arctanh(e * sinphi)) * base


def sinhpsi2tanphi(taup: np.ndarray, e: float) -> np.ndarray:
    """Convert tau' = tan(chi) to tau = tan(phi) by Newton iteration
    (GeographicLib Math::tauf; reference src/phi2.cpp:10-115).

    Vectorized: a fixed 5 Newton steps (the scalar reference needs <= 2 for
    any |f| <= 1/150; extra steps are no-ops at convergence).
    """
    taup = np.asarray(taup, dtype=np.float64)
    if e == 0.0:
        return taup
    rooteps = np.sqrt(np.finfo(np.float64).eps)
    tmax = 2 / rooteps
    e2m = 1 - e * e
    big = np.abs(taup) > 70
    tau = np.where(big, taup * np.exp(e * np.arctanh(e)), taup / e2m)
    # elements with |tau| >= tmax (inf/nan included) keep their start value
    active = np.abs(tau) < tmax
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        for _ in range(5):
            tau1 = np.sqrt(1 + tau * tau)
            sig = np.sinh(e * np.arctanh(e * tau / tau1))
            taupa = np.sqrt(1 + sig * sig) * tau - sig * tau1
            dtau = ((taup - taupa) * (1 + e2m * tau * tau)
                    / (e2m * tau1 * np.sqrt(1 + taupa * taupa)))
            tau = np.where(active, tau + dtau, tau)
    return tau


def phi2(ts0: np.ndarray, e: float) -> np.ndarray:
    """Latitude from ts = exp(-psi) (reference pj_phi2, src/phi2.cpp:118)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.arctan(sinhpsi2tanphi((1 / ts0 - ts0) / 2, e))


# -- msfn / qsfn ------------------------------------------------------------


def msfn(sinphi: np.ndarray, cosphi: np.ndarray, es: float) -> np.ndarray:
    return cosphi / np.sqrt(1.0 - es * sinphi * sinphi)


def qsfn(sinphi: np.ndarray, e: float, one_es: float) -> np.ndarray:
    """Authalic-latitude q (src/qsfn.cpp)."""
    if e >= 1.0e-7:
        con = e * sinphi
        div1 = 1.0 - con * con
        div2 = 1.0 + con
        with np.errstate(divide="ignore", invalid="ignore"):
            out = one_es * (sinphi / div1
                            - (0.5 / e) * np.log((1.0 - con) / div2))
        return np.where((div1 == 0.0) | (div2 == 0.0), np.inf, out)
    return sinphi + sinphi


# -- Poder/Engsager helpers (src/projections/tmerc.cpp:263-330) -------------


def gatg(p: np.ndarray, B: np.ndarray, cos_2B: np.ndarray,
         sin_2B: np.ndarray) -> np.ndarray:
    """B + sum(p[k] sin(2(k+1)B)) via Clenshaw with given cos/sin(2B)."""
    h: np.ndarray = np.zeros_like(B)
    h2 = np.zeros_like(B)
    two_cos = 2 * cos_2B
    h1 = np.full_like(B, p[-1])
    for k in range(len(p) - 2, -1, -1):
        h = -h2 + two_cos * h1 + p[k]
        h2 = h1
        h1 = h
    return B + h * sin_2B


def clens(a: np.ndarray, arg_r: np.ndarray) -> np.ndarray:
    """Real Clenshaw summation sum(a[k] sin(2(k+1) arg))... evaluated as the
    reference's clens (tmerc.cpp:309-326)."""
    cos_arg = np.cos(arg_r)
    r = 2 * cos_arg
    hr1 = np.zeros_like(arg_r)
    hr = np.full_like(arg_r, a[-1])
    for k in range(len(a) - 2, -1, -1):
        hr, hr1 = -hr1 + r * hr + a[k], hr
    return np.sin(arg_r) * hr


def clenS(a: np.ndarray, sin_arg_r: np.ndarray, cos_arg_r: np.ndarray,
          sinh_arg_i: np.ndarray, cosh_arg_i: np.ndarray
          ) -> tuple[np.ndarray, np.ndarray]:
    """Complex Clenshaw summation (tmerc.cpp:279-306): returns (R, I)."""
    r = 2 * cos_arg_r * cosh_arg_i
    i = -2 * sin_arg_r * sinh_arg_i
    hr1 = np.zeros_like(r)
    hi1 = np.zeros_like(r)
    hi = np.zeros_like(r)
    hr = np.full_like(r, a[-1])
    for k in range(len(a) - 2, -1, -1):
        hr2, hi2 = hr1, hi1
        hr1, hi1 = hr, hi
        hr = -hr2 + r * hr1 - i * hi1 + a[k]
        hi = -hi2 + i * hr1 + r * hi1
    rr = sin_arg_r * cosh_arg_i
    ii = cos_arg_r * sinh_arg_i
    return rr * hr - ii * hi, rr * hi + ii * hr


def hypot_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return np.hypot(x, y)
