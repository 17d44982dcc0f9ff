"""NKG (Nordic Geodetic Commission) coordinate-operation resolution.

The reference registers these in proj.db from data/sql/nkg.sql:
concatenated operations chaining EPSG time-dependent Helmerts
(ITRF->ETRF), NKG 7-param Helmerts and PROJ-string deformation /
xyzgridshift steps (src/iso19111/factory.cpp resolves the urn, the
concatenated-operation machinery infers per-step direction by CRS
chaining). This module re-derives the same pipelines from the
generated static registry (proj_ray/nkg_generated.py).

The grid-based steps reference PROJ-data deformation grids
(eur_nkg_nkgrf03vel_realigned.tif, eur_nkg_nkgrf17vel.tif,
no_kv_NKGETRF14_EPSG7922_2000.tif) that neither the reference checkout
nor this repo ships — the reference's own ctest skips nkg.gie without
them. `ensure_synth_grids()` synthesizes deterministic stand-ins in
the reference's GeoTIFF layout so the pipelines can be constructed and
executed end-to-end (closure-checked, not value-asserted) behind an
explicit opt-in; see proj_ray.gie's PROJ_RAY_SYNTH_GRIDS handling.
"""

from __future__ import annotations

import os

import numpy as np

# source/target geocentric CRSs of the EPSG steps NKG concatenations
# reference (data/sql/nkg.sql concatenated_operation_step):
#   7941 ITRF2000 -> ETRF2000, 8366 ITRF2014 -> ETRF2014
_EPSG_STEP_CRS = {
    "7941": (("EPSG", "4919"), ("EPSG", "7930")),
    "8366": (("EPSG", "7789"), ("EPSG", "8401")),
}

# grids referenced by the PROJ-string steps, with the lon/lat extent
# (degrees) of the synthesized stand-ins — generous Nordic coverage
_SYNTH_GRIDS = {
    "eur_nkg_nkgrf03vel_realigned.tif": (0.0, 50.0, 40.0, 75.0),
    "eur_nkg_nkgrf17vel.tif": (0.0, 50.0, 40.0, 75.0),
    "no_kv_NKGETRF14_EPSG7922_2000.tif": (-2.0, 52.0, 40.0, 76.0),
}

_synth_dir: str | None = None


def _step_defn(auth: str, code: str) -> tuple[str, tuple, tuple]:
    """(proj definition, source crs, target crs) for one step."""
    from proj_ray.nkg_generated import NKG_HELMERT, NKG_PROJSTRING

    if auth == "EPSG":
        from proj_ray.epsg import _helmert_defn
        from proj_ray.epsg_ops import OPERATIONS

        if code not in _EPSG_STEP_CRS or int(code) not in OPERATIONS:
            raise NotImplementedError(
                f"operator not implemented: NKG step EPSG:{code}")
        src, tgt = _EPSG_STEP_CRS[code]
        return _helmert_defn(OPERATIONS[int(code)]), src, tgt
    if code in NKG_HELMERT:
        e = NKG_HELMERT[code]
        t, r = e["t"], e["r"]
        defn = (f"+proj=helmert +x={t[0]:.15g} +y={t[1]:.15g} "
                f"+z={t[2]:.15g} +rx={r[0]:.15g} +ry={r[1]:.15g} "
                f"+rz={r[2]:.15g} +s={e['s']:.15g} "
                f"+convention={e['conv']}")
        return defn, e["src"], e["tgt"]
    if code in NKG_PROJSTRING:
        e = NKG_PROJSTRING[code]
        return e["defn"], e["src"], e["tgt"]
    raise NotImplementedError(
        f"operator not implemented: NKG operation {code} "
        "(not in static NKG registry)")


def resolve_nkg(code: str) -> str:
    """NKG operation code -> +proj pipeline/definition string. All NKG
    operations run in the geocentric (cartesian) domain, so the chain
    is a flat helmert/deformation/xyzgridshift pipeline; per-step
    direction is inferred by CRS chaining exactly like the reference's
    ConcatenatedOperation factory."""
    from proj_ray.nkg_generated import NKG_CONCAT

    if code not in NKG_CONCAT:
        defn, _src, _tgt = _step_defn("NKG", code)
        return defn
    op = NKG_CONCAT[code]
    cur = op["src"]
    parts = ["+proj=pipeline"]
    for auth, scode in op["steps"]:
        defn, src, tgt = _step_defn(auth, scode)
        if src == cur:
            inv = False
            cur = tgt
        elif tgt == cur:
            inv = True
            cur = src
        else:
            raise NotImplementedError(
                f"operator not implemented: NKG {code} step {scode} "
                f"does not chain from {cur}")
        parts.append("+step " + ("+inv " if inv else "") + defn)
    if cur != op["tgt"]:
        raise NotImplementedError(
            f"operator not implemented: NKG {code} chain ends at {cur}, "
            f"expected {op['tgt']}")
    return " ".join(parts)


def nkg_grid_names() -> set[str]:
    return set(_SYNTH_GRIDS)


def ensure_synth_grids() -> str:
    """Write deterministic stand-in NKG deformation grids (velocity in
    m/yr for the eur_nkg velocity grids, metres for the xyzgridshift
    translations — smooth mm-scale fields, NOT the real PROJ-data
    values) and register the directory on the grid search path.
    Returns the directory."""
    global _synth_dir
    if _synth_dir is not None:
        return _synth_dir
    from proj_ray.ops.gridshift import GRID_SEARCH_PATH
    from proj_ray.sources.geotiff import write_geotiff_grid

    d = os.path.join("/tmp", "proj_ray_synth_nkg")
    os.makedirs(d, exist_ok=True)
    res = 0.5
    for name, (w_, s_, e_, n_) in _SYNTH_GRIDS.items():
        path = os.path.join(d, name)
        if not os.path.exists(path):
            nx = int(round((e_ - w_) / res)) + 1
            ny = int(round((n_ - s_) / res)) + 1
            lon = w_ + np.arange(nx) * res
            lat = n_ - np.arange(ny) * res  # row 0 = north
            LO, LA = np.meshgrid(lon, lat)
            # smooth, deterministic, grid-name-salted mm-scale fields
            salt = (sum(map(ord, name)) % 7) * 0.1
            b0 = 1e-3 * (1.0 + salt + 0.3 * np.sin(np.radians(3 * LO))
                         * np.cos(np.radians(2 * LA)))
            b1 = 1e-3 * (2.0 - salt + 0.3 * np.cos(np.radians(2 * LO
                                                              + LA)))
            b2 = 1e-3 * (3.0 + salt + 0.3 * np.sin(np.radians(LO - LA)))
            if name.startswith("eur_nkg"):
                bands = ["east_velocity", "north_velocity", "up_velocity"]
            else:
                bands = ["x_translation", "y_translation", "z_translation"]
            write_geotiff_grid(
                path, np.stack([b0, b1, b2], axis=2), west=w_, north=n_,
                res=res, band_descriptions=bands,
                metadata={"grid_name": name,
                          "synthetic": "proj_ray test fixture"})
    if d not in GRID_SEARCH_PATH:
        GRID_SEARCH_PATH.append(d)
    _synth_dir = d
    return d
