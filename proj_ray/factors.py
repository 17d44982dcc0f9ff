"""Projection distortion analysis: the P5_FACTORS suite.

Vectorized re-derivation of pj_factors / pj_deriv (reference
src/factors.cpp:15-119, src/deriv.cpp:8-70, struct P5_FACTORS
src/proj.h:206-221): 4-point numerical partial derivatives of the
forward projection, then meridional/parallel scale, areal scale,
convergence, meridian/parallel angle, Tissot axes, and angular
distortion. The derivative step is in radians (DEFAULT_H 1e-5).

The engine's operations apply the earth radius (and x_0/y_0) inside
fwd; constants vanish in the derivative and the radius is divided out,
so the factors are dimensionless exactly like the reference's raw-
kernel derivatives.
"""

from __future__ import annotations

import numpy as np

DEFAULT_H = 1e-5
HALFPI = np.pi / 2


def factors(op, lon, lat, h: float = DEFAULT_H, degrees: bool = False):
    """Compute distortion factors of `op` (an Operation or +proj
    string) at geographic coordinates (radians by default).

    Returns a dict of ndarrays: meridional_scale (h), parallel_scale
    (k), areal_scale (s), angular_distortion (omega),
    meridian_parallel_angle (theta'), meridian_convergence (alpha),
    tissot_semimajor (a), tissot_semiminor (b), plus the four raw
    derivatives dx_dlam, dx_dphi, dy_dlam, dy_dphi.
    """
    from proj_ray.factory import create_operation

    if isinstance(op, str):
        op = create_operation(op)
    lam = np.asarray(lon, dtype=np.float64)
    phi = np.asarray(lat, dtype=np.float64)
    if degrees:
        lam = np.radians(lam)
        phi = np.radians(phi)
    bad = (np.abs(phi) - HALFPI > 1e-12) | (np.abs(lam) > 10.0)
    # move a point overshooting the pole slightly inside so the
    # numerical derivative exists (factors.cpp:60-62)
    phi = np.clip(phi, -(HALFPI - h), HALFPI - h)

    ell = op.P.ell
    a_ax = ell.a
    es = ell.es
    one_es = 1.0 - es

    # pj_deriv calls the raw kernel (src/deriv.cpp:21 `(*Q->fwd)`), which
    # never sees the fwd_finalize units (+to_meter) or +axis flips that
    # our Operation.fwd applies — undo them so scale factors stay
    # dimensionless for feet-based / axis-swapped CRSs too.
    to_meter = getattr(op.P, "to_meter", 1.0)
    axis = getattr(op.P, "axis", None)
    if axis is not None:
        from proj_ray.ops.base import _axis_inv

    def fx(dl, dp):
        z = np.zeros_like(lam)
        t = np.full_like(lam, np.inf)
        x, y, zz, tt = op.fwd((lam + dl, phi + dp, z, t))
        if axis is not None:
            x, y, zz, tt = _axis_inv(axis, x, y, zz, tt)
        return x * to_meter / a_ax, y * to_meter / a_ax

    x1, y1 = fx(+h, +h)
    x2, y2 = fx(+h, -h)
    x3, y3 = fx(-h, -h)
    x4, y4 = fx(-h, +h)
    inv4h = 1.0 / (4.0 * h)
    x_l = ((x1 + x2) - (x3 + x4)) * inv4h   # dx/dlam
    x_p = ((x1 - x2) - (x3 - x4)) * inv4h   # dx/dphi
    y_l = ((y1 + y2) - (y3 + y4)) * inv4h
    y_p = ((y1 - y2) - (y3 - y4)) * inv4h

    cosphi = np.cos(phi)
    fh = np.hypot(x_p, y_p)
    fk = np.hypot(x_l, y_l) / cosphi
    if es != 0.0:
        t = np.sin(phi)
        t = 1.0 - es * t * t
        n = np.sqrt(t)
        fh = fh * (t * n / one_es)
        fk = fk * n
        r = t * t / one_es
    else:
        r = 1.0
    conv = -np.arctan2(x_p, y_p)
    s = (y_p * x_l - x_p * y_l) * r / cosphi
    with np.errstate(invalid="ignore", divide="ignore"):
        thetap = np.arcsin(np.clip(s / (fh * fk), -1.0, 1.0))
    t2 = fk * fk + fh * fh
    ta = np.sqrt(np.maximum(t2 + 2.0 * s, 0.0))
    tb = np.sqrt(np.maximum(t2 - 2.0 * s, 0.0))
    tiss_a = 0.5 * (ta + tb)
    tiss_b = 0.5 * (ta - tb)
    with np.errstate(invalid="ignore", divide="ignore"):
        omega = 2.0 * np.arcsin(np.clip(
            (tiss_a - tiss_b) / (tiss_a + tiss_b), -1.0, 1.0))
    nanify = lambda v: np.where(bad, np.nan, v)  # noqa: E731
    return {
        "meridional_scale": nanify(fh),
        "parallel_scale": nanify(fk),
        "areal_scale": nanify(s),
        "angular_distortion": nanify(omega),
        "meridian_parallel_angle": nanify(thetap),
        "meridian_convergence": nanify(conv),
        "tissot_semimajor": nanify(tiss_a),
        "tissot_semiminor": nanify(tiss_b),
        "dx_dlam": nanify(x_l),
        "dx_dphi": nanify(x_p),
        "dy_dlam": nanify(y_l),
        "dy_dphi": nanify(y_p),
    }


import functools


@functools.lru_cache(maxsize=64)
def _cached_op(defn: str):
    from proj_ray.factory import create_operation

    return create_operation(defn)


def with_factors(ds, defn: str, lon_col: str = "lon", lat_col: str = "lat",
                 batch_size: int = 64 * 1024,
                 fields: tuple = ("meridional_scale", "parallel_scale",
                                  "areal_scale", "meridian_convergence")):
    """Dataset stage: append distortion-factor columns (degrees in);
    operator built once per worker (module-level lru_cache)."""

    def fn(batch: dict) -> dict:
        fac = factors(_cached_op(defn), batch[lon_col], batch[lat_col],
                      degrees=True)
        for f in fields:
            batch[f] = fac[f]
        return batch

    return ds.map_batches(fn, batch_format="numpy", batch_size=batch_size)
