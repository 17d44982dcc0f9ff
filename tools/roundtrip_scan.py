"""Registry-wide fwd/inv roundtrip scan: probe every registered
projection that exposes an inverse with a global lattice of points and
report the worst closure error inside the finite domain.

This is a BUG-HUNT tool, not a conformance gate: regional projections
(alsk, gs48/gs50, nzmg, krovak, imw_p, ...) legitimately blow up
outside their validity area, `cart`/`geocent` lose z in a 2D
roundtrip, and two parity-bound cases are documented in their
docstrings (robin: the reference's single-precision spline table
bounds closure at ~1e-7 relative; isea: the reference's own fwd/inv
scale mix at es != 0 — spherical isea closes to 1e-9 deg). Run with
--threshold to tune reporting. The geodesic near-antipodal bug fixed
in round 4 was found by exactly this sweep + the hypothesis closure
test (tests/test_property.py).

Usage: python tools/roundtrip_scan.py [--threshold 1e-6]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=1e-6,
                    help="report ops with worst closure above this "
                         "(degrees)")
    args = ap.parse_args()

    from proj_ray import create_operation, transform
    from proj_ray.factory import registry

    lon = np.radians(np.array(
        [-140.0, -75.0, -30.0, -5.0, 0.0, 10.0, 45.0, 91.0, 160.0]))
    lat = np.radians(np.array(
        [-70.0, -45.0, -20.0, -5.0, 0.0, 15.0, 33.0, 55.0, 78.0]))
    LO, LA = np.meshgrid(lon, lat)
    LO, LA = LO.ravel(), LA.ravel()

    fallbacks = ("", " +lat_1=30 +lat_2=50", " +lat_1=30", " +lat_ts=30",
                 " +o_proj=longlat +o_lat_p=45 +o_lon_p=0")
    rows = []
    for name in sorted(registry()):
        op = None
        for extra in fallbacks:
            try:
                op = create_operation(f"+proj={name}{extra} +ellps=WGS84")
                break
            except Exception:
                continue
        if op is None:
            continue
        try:
            x, y = transform(op, "fwd", LO.copy(), LA.copy())[:2]
            fin = np.isfinite(x) & np.isfinite(y)
            if not fin.any():
                continue
            bl, bp = transform(op, "inv", x.copy(), y.copy())[:2]
        except NotImplementedError:
            continue
        except Exception as exc:  # noqa: BLE001
            rows.append((name, float("inf"), f"raise: {exc!r:.60}"))
            continue
        ok = fin & np.isfinite(bl) & np.isfinite(bp)
        if not ok.any():
            continue
        dlon = np.abs((np.degrees(bl - LO) + 180) % 360 - 180)
        dlat = np.abs(np.degrees(bp - LA))
        err = np.where(ok, np.hypot(dlon * np.cos(LA), dlat), 0.0)
        w = float(err.max())
        if w > args.threshold:
            i = int(err.argmax())
            rows.append((name, w,
                         f"lon={np.degrees(LO[i]):.0f} "
                         f"lat={np.degrees(LA[i]):.0f}"))
    rows.sort(key=lambda r: -r[1])
    for name, w, where in rows:
        print(f"{name:12s} worst={w:10.3e} deg  at {where}")
    print(f"{len(rows)} ops above threshold {args.threshold} "
          f"(regional/domain-limited ops expected; see module doc)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
