"""Operation base: the batch analog of the reference's PJ object.

A PROJ operator is a scalar function PJ_COORD -> PJ_COORD with precomputed
state (src/proj_internal.h:456-687); here an Operation holds the same
precomputed constants but its fwd/inv operate on whole NumPy column arrays
(x, y, z, t) at once.

The prepare/finalize sandwich mirrors src/fwd.cpp:40-174 and
src/inv.cpp:39-140: angular range checks, latitude clamp, longitude wrap,
central-meridian offset, semimajor-axis scaling, false easting/northing and
unit factors. Errors are in-band: a failed point becomes +inf in every
component (the reference's HUGE_VAL convention, src/4D_api.cpp:568-606) and
the rest of the batch proceeds.
"""

from __future__ import annotations

import numpy as np

from proj_ray.ellipsoid import Ellipsoid
from proj_ray.kernels import _series as S
from proj_ray.params import ParamSet

# io-unit classes (src/proj_internal.h:191-199)
UNITS_WHATEVER = "whatever"
UNITS_CLASSIC = "classic"
UNITS_PROJECTED = "projected"
UNITS_CARTESIAN = "cartesian"
UNITS_RADIANS = "radians"
UNITS_DEGREES = "degrees"

EPS_LAT = 1e-12

Coords = tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]


def coord_error_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    return ~(np.isfinite(x) & np.isfinite(y))


def apply_error(mask: np.ndarray, c: Coords,
                nan_in: np.ndarray | None = None) -> Coords:
    """HUGE_VAL-style in-band error; NaN inputs propagate as NaN (the
    reference lets NaN flow through untouched, gie treats nan==nan)."""
    if nan_in is not None and nan_in.any():
        x, y, z, t = (np.array(a, copy=True) for a in c)
        err = mask & ~nan_in
        for a in (x, y, z, t):
            a[err] = np.inf
            a[nan_in] = np.nan
        return x, y, z, t
    if not mask.any():
        return c
    x, y, z, t = (a.copy() for a in c)
    x[mask] = np.inf
    y[mask] = np.inf
    z[mask] = np.inf
    t[mask] = np.inf
    return x, y, z, t


class Operation:
    """Base operator. Subclasses set `left`/`right` unit classes and
    implement `_fwd` and/or `_inv` on (x, y, z, t) column arrays."""

    name: str = "?"
    left = UNITS_RADIANS
    right = UNITS_CLASSIC
    # mirror of PJ skip flags (e.g. axisswap sets skip_fwd_finalize /
    # skip_inv_prepare, src/conversions/axisswap.cpp:304-305; unitconvert
    # sets skip_*_prepare, src/conversions/unitconvert.cpp)
    skip_fwd_prepare = False
    skip_fwd_finalize = False
    skip_inv_prepare = False
    skip_inv_finalize = False

    def __init__(self, P: "Common", ps: ParamSet):
        self.P = P
        self.setup(ps)

    def setup(self, ps: ParamSet) -> None:  # pragma: no cover - default
        pass

    # -- kernels (dimensionless / radian domain) ---------------------------
    def _fwd(self, x, y, z, t) -> Coords:
        raise NotImplementedError(f"{self.name} has no forward")

    def _inv(self, x, y, z, t) -> Coords:
        raise NotImplementedError(f"{self.name} has no inverse")

    # -- public batch API --------------------------------------------------
    # Large inputs run in cache-sized chunks: every NumPy ufunc on an
    # N-point array allocates a fresh temporary, and beyond glibc's
    # mmap threshold (~128 KB) each allocation is a new mmap whose
    # pages fault in on first touch — measured 35x slower than the
    # same kernel on small chunks (etmerc fwd: 0.12 M pts/s on a
    # 2M-point array vs 4.4 M on 32k chunks). 32k points = 256 KB per
    # temporary keeps the whole working set in L2 and allocations in
    # the malloc arena. Pipelines chunk per STEP (each step's public
    # fwd/inv chunks independently), which preserves push/pop stack
    # semantics.
    CHUNK = 32768

    def fwd(self, c: Coords) -> Coords:
        return self._chunked(self._fwd_whole, c)

    def inv(self, c: Coords) -> Coords:
        return self._chunked(self._inv_whole, c)

    def _chunked(self, fn, c: Coords) -> Coords:
        x = np.asarray(c[0])
        if x.ndim == 0 or x.shape[0] <= 2 * self.CHUNK:
            return fn(c)
        n = x.shape[0]
        outs: tuple[list, list, list, list] = ([], [], [], [])
        for s in range(0, n, self.CHUNK):
            e = min(s + self.CHUNK, n)
            sub = tuple(
                a[s:e] if getattr(a, "ndim", 0) >= 1
                and getattr(a, "shape", (0,))[0] == n else a
                for a in c)
            res = fn(sub)
            for lst, comp in zip(outs, res):
                arr = np.asarray(comp, dtype=np.float64)
                if arr.ndim == 0:
                    arr = np.full(e - s, float(arr))
                lst.append(arr)
        return tuple(np.concatenate(lst) for lst in outs)

    def _fwd_whole(self, c: Coords) -> Coords:
        P = self.P
        x, y, z, t = (np.asarray(a, dtype=np.float64) for a in c)
        nan_in = np.isnan(x) | np.isnan(y)
        bad = ~(np.isfinite(x) & np.isfinite(y))
        if self.left == UNITS_RADIANS and not self.skip_fwd_prepare:
            lam, phi = x, y
            over_lat = (np.abs(phi) - S.HALFPI) > EPS_LAT
            over_lon = (lam > 10) | (lam < -10)
            bad = bad | over_lat | over_lon
            phi = np.clip(phi, -S.HALFPI, S.HALFPI)
            if P.geoc:
                # geocentric -> geographic latitude (pj_geocentric_latitude)
                with np.errstate(invalid="ignore"):
                    phi = np.arctan(P.ell.rone_es * np.tan(phi))
            if not P.over:
                lam = S.adjlon(lam)
            # legacy cs2cs datum sandwich (src/fwd.cpp:86-101)
            if P.hgridshift is not None:
                lam, phi, z, t = P.hgridshift._inv(lam, phi, z, t)
            elif P.helmert is not None or (P.cart_wgs84 is not None
                                           and P.cart is not None):
                lam, phi, z, t = P.cart_wgs84._fwd(lam, phi, z, t)
                if P.helmert is not None:
                    lam, phi, z, t = P.helmert._inv(lam, phi, z, t)
                lam, phi, z, t = P.cart._inv(lam, phi, z, t)
            if P.vgridshift is not None:
                lam, phi, z, t = P.vgridshift._fwd(lam, phi, z, t)
            bad = bad | ~(np.isfinite(lam) & np.isfinite(phi))
            lam = (lam - P.from_greenwich) - P.lam0
            if not P.over:
                lam = S.adjlon(lam)
            x, y = lam, phi
        elif self.left == UNITS_CARTESIAN:
            if P.helmert is not None:
                x, y, z, t = P.helmert._inv(x, y, z, t)
        with np.errstate(all="ignore"):
            x, y, z, t = self._fwd(x, y, z, t)
        bad = bad | ~(np.isfinite(x) & np.isfinite(y))
        if not self.skip_fwd_finalize:
            x, y, z, t = self._fwd_finalize(x, y, z, t)
            if P.axis is not None:
                x, y, z, t = _axis_fwd(P.axis, x, y, z, t)
        return apply_error(bad, (x, y, z, t), nan_in)

    def _inv_whole(self, c: Coords) -> Coords:
        P = self.P
        x, y, z, t = (np.asarray(a, dtype=np.float64) for a in c)
        nan_in = np.isnan(x) | np.isnan(y)
        bad = ~(np.isfinite(x) & np.isfinite(y))
        # inv_prepare (src/inv.cpp:39-101)
        if self.skip_inv_prepare:
            pass
        elif P.axis is not None:
            x, y, z, t = _axis_inv(P.axis, x, y, z, t)
        if self.skip_inv_prepare:
            pass
        elif self.right == UNITS_CARTESIAN:
            x = x * P.to_meter
            y = y * P.to_meter
            z = z * P.to_meter
        elif self.right in (UNITS_PROJECTED, UNITS_CLASSIC):
            x = P.to_meter * x - P.x0
            y = P.to_meter * y - P.y0
            z = P.vto_meter * z - P.z0
            if self.right == UNITS_CLASSIC:
                x = x * P.ell.ra
                y = y * P.ell.ra
        elif self.right == UNITS_RADIANS:
            z = P.vto_meter * z - P.z0
        with np.errstate(all="ignore"):
            x, y, z, t = self._inv(x, y, z, t)
        bad = bad | ~(np.isfinite(x) & np.isfinite(y))
        # inv_finalize (src/inv.cpp:103-140)
        if self.left == UNITS_RADIANS and not self.skip_inv_finalize:
            lam, phi = x, y
            lam = lam + P.from_greenwich + P.lam0
            if not P.over:
                lam = S.adjlon(lam)
            if P.vgridshift is not None:
                lam, phi, z, t = P.vgridshift._inv(lam, phi, z, t)
            if P.hgridshift is not None:
                lam, phi, z, t = P.hgridshift._fwd(lam, phi, z, t)
            elif P.helmert is not None or (P.cart_wgs84 is not None
                                           and P.cart is not None):
                lam, phi, z, t = P.cart._fwd(lam, phi, z, t)
                if P.helmert is not None:
                    lam, phi, z, t = P.helmert._fwd(lam, phi, z, t)
                lam, phi, z, t = P.cart_wgs84._inv(lam, phi, z, t)
            bad = bad | ~(np.isfinite(lam) & np.isfinite(phi))
            if P.geoc:
                with np.errstate(invalid="ignore"):
                    phi = np.arctan(P.ell.one_es * np.tan(phi))
            x, y = lam, phi
        return apply_error(bad, (x, y, z, t), nan_in)

    def _fwd_finalize(self, x, y, z, t) -> Coords:
        # src/fwd.cpp:123-174
        P = self.P
        r = self.right
        if r == UNITS_CARTESIAN:
            x = x * P.fr_meter
            y = y * P.fr_meter
            z = z * P.fr_meter
        elif r in (UNITS_CLASSIC, UNITS_PROJECTED):
            if r == UNITS_CLASSIC:
                x = x * P.ell.a
                y = y * P.ell.a
            x = P.fr_meter * (x + P.x0)
            y = P.fr_meter * (y + P.y0)
            z = P.vfr_meter * (z + P.z0)
        elif r == UNITS_RADIANS:
            z = P.vfr_meter * (z + P.z0)
            if P.long_wrap_center is not None:
                x = P.long_wrap_center + S.adjlon(x - P.long_wrap_center)
        return x, y, z, t

    @property
    def has_inverse(self) -> bool:
        return type(self)._inv is not Operation._inv

    @property
    def angular_input(self) -> bool:
        return self.left in (UNITS_RADIANS, UNITS_DEGREES)

    @property
    def angular_output(self) -> bool:
        return self.right in (UNITS_RADIANS, UNITS_DEGREES)


_AXIS_MAP = {"e": (0, 1.0), "w": (0, -1.0), "n": (1, 1.0), "s": (1, -1.0),
             "u": (2, 1.0), "d": (2, -1.0)}


def _axis_perm(axis: str) -> list[tuple[int, float]]:
    return [_AXIS_MAP[c] for c in axis]


def _axis_fwd(axis: str, x, y, z, t) -> Coords:
    """+axis= emulation: output axis i takes standard-enu component
    axis[i] (src/conversions/axisswap.cpp semantics, applied at
    fwd_finalize end per src/fwd.cpp:170-173)."""
    vin = (x, y, z, t)
    out = [x, y, z, t]
    for i, (src, sgn) in enumerate(_axis_perm(axis)):
        out[i] = vin[src] * sgn
    return tuple(out)  # type: ignore[return-value]


def _axis_inv(axis: str, x, y, z, t) -> Coords:
    vin = (x, y, z, t)
    out = [x, y, z, t]
    for i, (dst, sgn) in enumerate(_axis_perm(axis)):
        out[dst] = vin[i] * sgn
    return tuple(out)  # type: ignore[return-value]


class Common:
    """The shared PJ fields: ellipsoid + cartographic offsets/scales.

    Built once per operator from its paralist (src/init.cpp:434-572).
    """

    def __init__(self, ell: Ellipsoid, ps: ParamSet):
        self.ell = ell
        self.k0 = 1.0
        if ps.has("k_0"):
            self.k0 = ps.f("k_0")
        elif ps.has("k"):
            self.k0 = ps.f("k")
        if self.k0 <= 0:
            raise ValueError("k <= 0")
        self.phi0 = ps.r("lat_0")
        if abs(self.phi0) > S.HALFPI:
            raise ValueError("|lat_0| should be <= 90")
        self.lam0 = ps.r("lon_0")
        self.x0 = ps.f("x_0")
        self.y0 = ps.f("y_0")
        self.z0 = ps.f("z_0")
        self.over = ps.flag("over")
        self.geoc = ps.flag("geoc") and ell.es != 0.0
        self.is_geocent = False
        # cs2cs-emulation helpers, filled by the factory (src/4D_api.cpp:836)
        self.axis: str | None = None
        if ps.has("axis"):
            ax = ps.s("axis")
            if len(ax) != 3 or any(c not in "ewnsud" for c in ax) or \
                    len({"ew" if c in "ew" else "ns" if c in "ns" else "ud"
                         for c in ax}) != 3:
                raise ValueError(f"invalid axis spec {ax}")
            if ax != "enu":
                self.axis = ax
        self.hgridshift = None
        self.vgridshift = None
        self.helmert = None
        self.cart = None
        self.cart_wgs84 = None
        self.long_wrap_center: float | None = None
        if ps.has("lon_wrap"):
            self.long_wrap_center = ps.r("lon_wrap")
        from proj_ray.params import UNITS_TO_METER, PRIME_MERIDIANS
        from proj_ray.params import dms_to_rad

        if ps.has("to_meter"):
            raw = ps.s("to_meter")
            if "/" in raw:
                num, den = raw.split("/", 1)
                self.to_meter = float(num) / float(den)
            else:
                self.to_meter = float(raw)
        elif ps.has("units"):
            self.to_meter = UNITS_TO_METER[ps.s("units")]
        else:
            self.to_meter = 1.0
        self.fr_meter = 1.0 / self.to_meter
        if ps.has("vto_meter"):
            raw = ps.s("vto_meter")
            if "/" in raw:
                num, den = raw.split("/", 1)
                self.vto_meter = float(num) / float(den)
            else:
                self.vto_meter = float(raw)
        elif ps.has("vunits"):
            self.vto_meter = UNITS_TO_METER[ps.s("vunits")]
        else:
            self.vto_meter = self.to_meter if ps.has("to_meter") or ps.has("units") else 1.0
        self.vfr_meter = 1.0 / self.vto_meter
        self.from_greenwich = 0.0
        if ps.has("pm"):
            pm = ps.s("pm")
            if pm in PRIME_MERIDIANS:
                self.from_greenwich = dms_to_rad(PRIME_MERIDIANS[pm])
            else:
                self.from_greenwich = dms_to_rad(pm)

    # convenience pass-throughs used all over the kernels
    @property
    def a(self) -> float:
        return self.ell.a

    @property
    def es(self) -> float:
        return self.ell.es

    @property
    def e(self) -> float:
        return self.ell.e

    @property
    def one_es(self) -> float:
        return self.ell.one_es

    @property
    def rone_es(self) -> float:
        return self.ell.rone_es

    @property
    def n(self) -> float:
        return self.ell.n

    @property
    def b(self) -> float:
        return self.ell.b
