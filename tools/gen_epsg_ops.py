"""Generate the static coordinate-operation planner tables from the
reference's public EPSG SQL distribution (/root/reference/data/sql/).

Emits proj_ray/epsg_ops.py with:
- GEOG_BASE: crs_code -> canonical geographic-2D CRS code (projected
  CRSs -> their base; geographic-3D / geocentric CRSs -> the 2D sibling
  sharing the datum)
- HELMERT: (src_geog2d, tgt_geog2d) -> list of candidate Helmert
  transformations (params normalized to metre / arc-second / ppm,
  Molodensky-Badekas pivots in metres), each with accuracy and the
  area-of-use bbox from usage/extent — the data
  coordinateoperationfactory.cpp:583 queries from proj.db, reduced to
  the Helmert subset this engine plans with (grid-based ops are
  handled by the curated nadgrids fallback).

Usage: python tools/gen_epsg_ops.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from gen_epsg import SQL, rows, _num  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "proj_ray" / "epsg_ops.py"

ARCSEC_PER = {  # rotation uom -> arc-seconds factor
    "9104": 1.0,                      # arc-second
    "9109": 0.20626480624709636,      # microradian
    "9101": 206264.80624709636,       # radian
    "9105": 3240.0,                   # grad? (1 grad = 0.9 deg = 3240")
    "9102": 3600.0,                   # degree
    "1031": 0.001,                    # milliarc-second
    "9113": 0.324,                    # centesimal second (1e-4 grad)
}
PPM_PER = {"9202": 1.0, "9201": 1e6,  # parts-per-million / unity
           "1028": 0.001}             # parts-per-billion
LEN_M = {"9001": 1.0, "1025": 0.001, "1033": 0.01}  # m / mm / cm
# per-year rate uoms -> PROJ-native per-year factors
RATE_M = {"1042": 1.0, "1027": 0.001, "1034": 0.01}      # m|mm|cm /yr
RATE_AS = {"1043": 1.0, "1032": 0.001}                   # "|mas /yr
RATE_PPM = {"1041": 1.0, "1030": 0.001}                  # ppm|ppb /yr
# geocentric-domain helmert methods, directly applicable to XYZ input
# (the cct surface): code -> (kind, convention); td = time-dependent
GEOCEN_METHODS = {
    "1031": ("3", None),
    "1033": ("7", "position_vector"),
    "1032": ("7", "coordinate_frame"),
    "1053": ("td", "position_vector"),
    "1056": ("td", "coordinate_frame"),
}
METHODS = {
    # method code -> (n_params_kind, convention, is_3d_domain)
    # geog2D-domain methods preserve the input height (the planner
    # wraps them in push/pop v_3); geocen/geog3D domains transform it
    "9603": ("3", None, False),
    "1031": ("3", None, True),
    "9606": ("7", "position_vector", False),
    "1033": ("7", "position_vector", True),
    "1037": ("7", "position_vector", True),
    "9607": ("7", "coordinate_frame", False),
    "1032": ("7", "coordinate_frame", True),
    "1038": ("7", "coordinate_frame", True),
    "9636": ("mb", "position_vector", False),
    "1034": ("mb", "coordinate_frame", False),
    "1061": ("mb", "position_vector", True),
    "1063": ("mb", "coordinate_frame", True),
    # time-dependent 15-param (14 + reference epoch) Helmerts — the
    # ITRF/ETRF/GDA2020 plate-motion family (geocen / geog2D / geog3D
    # domains)
    "1053": ("td", "position_vector", True),
    "1054": ("td", "position_vector", False),
    "1055": ("td", "position_vector", True),
    "1056": ("td", "coordinate_frame", True),
    "1057": ("td", "coordinate_frame", False),
    "1058": ("td", "coordinate_frame", True),
}


def main():
    # geodetic CRSs: code -> (type, datum_code)
    geod: dict[int, tuple[str, int]] = {}
    for v in rows("geodetic_crs.sql", "geodetic_crs"):
        if v[0] != "EPSG" or v[-1] == "1":
            continue
        try:
            code = int(v[1])
            datum = int(v[8]) if v[8] not in ("NULL", "") else -1
        except ValueError:
            continue
        geod[code] = (v[4], datum)
    # canonical geographic-2D per datum (lowest code wins)
    canon2d: dict[int, int] = {}
    for code, (typ, datum) in sorted(geod.items()):
        if typ == "geographic 2D" and datum not in canon2d:
            canon2d[datum] = code
    geog_base: dict[int, int] = {}
    for code, (typ, datum) in geod.items():
        base = canon2d.get(datum)
        if base is not None:
            geog_base[code] = base if typ != "geographic 2D" else code
    for v in rows("projected_crs.sql", "projected_crs"):
        if v[0] != "EPSG" or v[-1] == "1":
            continue
        try:
            code = int(v[1])
            g = int(v[7])
        except ValueError:
            continue
        if g in geog_base:
            geog_base[code] = geog_base[g]

    # angular unit of geographic CRSs (non-degree only): factor to deg
    import math

    rad_per = {}
    for v in rows("unit_of_measure.sql", "unit_of_measure"):
        if v[0] == "EPSG" and v[3] == "angle" and v[4] not in ("NULL", ""):
            rad_per[v[1]] = float(v[4])
    cs_unit: dict[str, str] = {}
    for v in rows("axis.sql", "axis"):
        cs_unit.setdefault(v[6], v[9])
    geog_unit: dict[int, float] = {}
    for v in rows("geodetic_crs.sql", "geodetic_crs"):
        if v[0] != "EPSG" or v[-1] == "1" or not v[4].startswith("geog"):
            continue
        u = cs_unit.get(v[6])
        if u is None or u == "9102":
            continue
        f = rad_per.get(u)
        if f is None:
            continue
        fdeg = f * 180.0 / math.pi
        if abs(fdeg - 1.0) < 1e-9:  # degree variants with float noise
            continue
        try:
            geog_unit[int(v[1])] = fdeg
        except ValueError:
            continue

    # extents (+ offshore flag: 4D_api.cpp:322 deprioritizes offshore
    # areas at per-point selection time)
    extent: dict[int, tuple[float, float, float, float]] = {}
    offshore: set[int] = set()
    for v in rows("extent.sql", "extent"):
        try:
            code = int(v[1])
        except ValueError:
            continue
        s, n, w, e = (_num(v[4]), _num(v[5]), _num(v[6]), _num(v[7]))
        if None in (s, n, w, e):
            continue
        extent[code] = (w, s, e, n)
        if "offshore" in v[2].lower():
            offshore.add(code)
    extent_by_name: dict[str, tuple] = {}
    for v in rows("extent.sql", "extent"):
        try:
            code = int(v[1])
        except ValueError:
            continue
        if v[-1] != "1" and code in extent:
            extent_by_name[" ".join(v[2].split()).casefold()] = \
                extent[code]

    # usage rows for helmert ops live inside helmert_transformation.sql
    op_extent: dict[str, int] = {}
    for v in rows("helmert_transformation.sql", "usage"):
        if v[2] == "helmert_transformation" and v[3] == "EPSG":
            try:
                op_extent[v[4]] = int(v[6])
            except ValueError:
                continue

    helmert: dict[tuple[int, int], list[dict]] = {}
    kept = skipped = 0
    for v in rows("helmert_transformation.sql", "helmert_transformation"):
        if v[0] != "EPSG" or v[-1] == "1":
            skipped += 1
            continue
        mcode = v[5]
        kind = METHODS.get(mcode)
        if kind is None:
            skipped += 1
            continue
        if kind[0] != "td" and any(x not in ("NULL", "")
                                   for x in v[25:38]):
            # rate terms on a non-td method: malformed, skip
            skipped += 1
            continue
        if v[7] != "EPSG" or v[9] != "EPSG":
            skipped += 1
            continue
        try:
            scode, tcode = int(v[8]), int(v[10])
        except ValueError:
            skipped += 1
            continue
        sbase = geog_base.get(scode)
        tbase = geog_base.get(tcode)
        if sbase is None or tbase is None:
            skipped += 1
            continue
        lfac = LEN_M.get(v[16]) if v[15] == "EPSG" else None
        if lfac is None:  # translations in an unknown length unit
            skipped += 1
            continue
        acc = _num(v[11])
        tx, ty, tz = _num(v[12]), _num(v[13]), _num(v[14])
        if None in (tx, ty, tz):
            skipped += 1
            continue
        entry = {"code": int(v[1]), "acc": acc,
                 "t": (tx * lfac, ty * lfac, tz * lfac)}
        nkind, conv, d3 = kind
        if d3:
            entry["d3"] = True
        if nkind == "td":
            rfac = ARCSEC_PER.get(v[21])
            sfac = PPM_PER.get(v[24])
            dfac = RATE_M.get(v[29])
            rrfac = RATE_AS.get(v[34])
            ssfac = RATE_PPM.get(v[37])
            rx, ry, rz, sc = (_num(v[17]), _num(v[18]), _num(v[19]),
                              _num(v[22]))
            dtx, dty, dtz = _num(v[25]), _num(v[26]), _num(v[27])
            drx, dry, drz = _num(v[30]), _num(v[31]), _num(v[32])
            dsc, ep = _num(v[35]), _num(v[38])
            if (None in (rx, ry, rz, sc, dtx, dty, dtz, drx, dry,
                         drz, dsc, ep)
                    or None in (rfac, sfac, dfac, rrfac, ssfac)
                    or v[40] != "1029"):  # epoch must be in years
                skipped += 1
                continue
            entry["r"] = (rx * rfac, ry * rfac, rz * rfac)
            entry["s"] = sc * sfac
            entry["conv"] = conv
            entry["dt"] = (dtx * dfac, dty * dfac, dtz * dfac)
            entry["dr"] = (drx * rrfac, dry * rrfac, drz * rrfac)
            entry["dsc"] = dsc * ssfac
            entry["ep"] = ep
        if nkind in ("7", "mb"):
            rfac = ARCSEC_PER.get(v[21])
            sfac = PPM_PER.get(v[24])
            rx, ry, rz, sc = (_num(v[17]), _num(v[18]), _num(v[19]),
                              _num(v[22]))
            if None in (rx, ry, rz, sc) or rfac is None or sfac is None:
                skipped += 1
                continue
            entry["r"] = (rx * rfac, ry * rfac, rz * rfac)
            entry["s"] = sc * sfac
            entry["conv"] = conv
        if nkind == "mb":
            px, py, pz = _num(v[41]), _num(v[42]), _num(v[43])
            if None in (px, py, pz) or v[45] != "9001":
                skipped += 1
                continue
            entry["p"] = (px, py, pz)
        ext = op_extent.get(v[1])
        entry["bbox"] = extent.get(ext) if ext is not None else None
        if ext in offshore:
            entry["off"] = True
        helmert.setdefault((sbase, tbase), []).append(entry)
        kept += 1

    # grid transformations (NTv2/NTv1 subset this engine's hgridshift
    # reads); availability is checked at plan time against the grid
    # search path. grid_alternatives maps EPSG grid names to PROJ
    # filenames (and flags inverse-direction grids).
    alt: dict[str, tuple[str, str | None, int]] = {}
    import re as _re

    tup = _re.compile(r"^\('((?:[^']|'')*)','((?:[^']|'')*)',"
                      r"(?:'((?:[^']|'')*)'|NULL),'[^']*','[^']*',(\d)")
    for line in (SQL / "grid_alternatives.sql").open(encoding="utf-8"):
        m = tup.match(line.strip())
        if m:
            alt[m.group(1)] = (m.group(2), m.group(3), int(m.group(4)))

    op_extent_g: dict[str, int] = {}
    for v in rows("grid_transformation.sql", "usage"):
        if v[2] == "grid_transformation" and v[3] == "EPSG":
            try:
                op_extent_g[v[4]] = int(v[6])
            except ValueError:
                continue
    grids: dict[tuple[int, int], list[dict]] = {}
    gkept = 0
    for v in rows("grid_transformation.sql", "grid_transformation"):
        if v[0] != "EPSG" or v[-1] == "1":
            continue
        # NTv2 / NTv1 / NADCON / geocentric translation by grid (IGN)
        if v[5] not in ("9615", "9614", "9613", "1087"):
            continue
        if v[7] != "EPSG" or v[9] != "EPSG":
            continue
        try:
            scode, tcode = int(v[8]), int(v[10])
        except ValueError:
            continue
        sbase = geog_base.get(scode)
        tbase = geog_base.get(tcode)
        if sbase is None or tbase is None:
            continue
        gname = v[15]
        names = [gname]
        a = alt.get(gname)
        invdir = 0
        if a:
            names = [a[0]] + ([a[1]] if a[1] else []) + [gname]
            invdir = a[2]
        elif v[5] == "9613" and gname.endswith(".las"):
            # NADCON 'xxx.las'/'xxx.los' pairs ship in PROJ as the
            # CTable2 file 'xxx' / packaged 'us_noaa_xxx.tif'
            # (reference singleoperation.cpp NADCON name handling)
            stem = gname[:-4]
            names = [f"us_noaa_{stem}.tif", stem]
        entry = {"code": int(v[1]), "acc": _num(v[11]),
                 "grids": names, "invdir": bool(invdir)}
        if v[5] == "1087":
            # geocentric XYZ offset grid -> +proj=xyzgridshift leg;
            # the engine's xyzgridshift reads GeoTIFF only, so the
            # legacy .txt alternative must not satisfy availability
            entry["xyz"] = True
            entry["grids"] = [g for g in names
                              if g.lower().endswith((".tif", ".tiff"))]
            if not entry["grids"]:
                continue
        ext = op_extent_g.get(v[1])
        entry["bbox"] = extent.get(ext) if ext is not None else None
        if ext in offshore:
            entry["off"] = True
        grids.setdefault((sbase, tbase), []).append(entry)
        gkept += 1

    # supersession: op code -> replacement op codes. Two sources, both
    # used by the reference planner's discardSuperseded pass
    # (factory.cpp:6986-7001): the supersession table, plus EPSG
    # remarks of the form "Replaced ... (transformation code NNNN)" /
    # "Replaced by code NNNN" for grid ops the table does not cover
    # (NAD27->NAD83: NTv1 op 1312's remark points at NTv2 op 1313).
    superseded: dict[int, list[int]] = {}
    for v in rows("supersession.sql", "supersession"):
        if v[1] != "EPSG" or v[4] != "EPSG":
            continue
        try:
            superseded.setdefault(int(v[2]), []).append(int(v[5]))
        except ValueError:
            continue
    for v in rows("grid_transformation.sql", "grid_transformation"):
        if v[0] != "EPSG" or v[-1] == "1":
            continue
        desc = str(v[3])
        m = _re.search(r"[Rr]eplaced[^.]*", desc)
        if not m:
            continue
        try:
            code = int(v[1])
        except ValueError:
            continue
        for rep in _re.findall(r"code (\d+)", m.group(0)):
            superseded.setdefault(code, []).append(int(rep))

    # geoid-model transformations: vertical CRS code -> candidate grid
    # names ("Geographic3D to GravityRelatedHeight" family), for
    # compound-CRS (EPSG:h+v) resolution
    vert_grids: dict[int, list[list[str]]] = {}
    vkept = 0
    for v in rows("grid_transformation.sql", "grid_transformation"):
        if v[0] != "EPSG" or v[-1] == "1":
            continue
        if "GravityRelatedHeight" not in v[6]:
            continue
        if v[9] != "EPSG":
            continue
        try:
            vcode = int(v[10])
        except ValueError:
            continue
        gname = v[15]
        names = [gname]
        a = alt.get(gname)
        if a:
            names = [a[0]] + ([a[1]] if a[1] else []) + [gname]
        vert_grids.setdefault(vcode, []).append(names)
        vkept += 1

    # similarity transformations (9621) directly between CRS pairs
    # (EPSG Guidance Note 7.2: XT = XT0 + XS*M*cos(t) + YS*M*sin(t),
    # YT = YT0 - XS*M*sin(t) + YS*M*cos(t)) — expressed as affine
    # coefficients at plan time
    op_extent_o: dict[str, int] = {}
    for v in rows("other_transformation.sql", "usage"):
        if v[2] == "other_transformation" and v[3] == "EPSG":
            try:
                op_extent_o[v[4]] = int(v[6])
            except ValueError:
                continue
    ANGLE_DEG = {"9102": 1.0, "9104": 1.0 / 3600.0,
                 "9101": 57.29577951308232}
    similarity: dict[tuple[int, int], list[dict]] = {}
    skept = 0
    for v in rows("other_transformation.sql", "other_transformation"):
        if v[0] != "EPSG" or v[-1] == "1" or v[5] != "9621":
            continue
        if v[7] != "EPSG" or v[9] != "EPSG":
            continue
        try:
            scode, tcode = int(v[8]), int(v[10])
        except ValueError:
            continue
        # params in fixed order: 8621 XT0 (m), 8622 YT0 (m),
        # 1061 M (unity), 8614 rotation angle
        p = {}
        for base in (12, 18, 24, 30):
            if v[base + 1] in ("8621", "8622", "1061", "8614"):
                p[v[base + 1]] = (_num(v[base + 3]), v[base + 5])
        if set(p) != {"8621", "8622", "1061", "8614"}:
            continue
        if p["8621"][1] != "9001" or p["8622"][1] != "9001" \
                or p["1061"][1] != "9201":
            continue
        adeg = ANGLE_DEG.get(p["8614"][1])
        if adeg is None:
            continue
        entry = {"code": int(v[1]), "acc": _num(v[11]),
                 "xt0": p["8621"][0], "yt0": p["8622"][0],
                 "m": p["1061"][0], "theta_deg": p["8614"][0] * adeg}
        ext = op_extent_o.get(v[1])
        entry["bbox"] = extent.get(ext) if ext is not None else None
        if ext in offshore:
            entry["off"] = True
        similarity.setdefault((scode, tcode), []).append(entry)
        skept += 1

    # operation-code-keyed geocentric helmert ops (incl. the
    # time-dependent ones the planner table skips): the `cct
    # EPSG:<code>` / name-initialization surface
    # (reference src/apps/cct.cpp object_name_or_code handling)
    operations: dict[int, dict] = {}
    for v in rows("helmert_transformation.sql", "helmert_transformation"):
        if v[0] != "EPSG" or v[-1] == "1":
            continue
        mk = GEOCEN_METHODS.get(v[5])
        if mk is None:
            continue
        kind, conv = mk
        lf = LEN_M.get(v[16])
        t = (_num(v[12]), _num(v[13]), _num(v[14]))
        if lf is None or None in t:
            continue
        entry: dict = {"name": v[2],
                       "t": tuple(x * lf for x in t)}
        if conv:
            rf = ARCSEC_PER.get(v[21])
            sf = PPM_PER.get(v[24])
            r = (_num(v[17]), _num(v[18]), _num(v[19]))
            s = _num(v[22])
            if rf is None or sf is None or None in r or s is None:
                continue
            entry["r"] = tuple(x * rf for x in r)
            entry["s"] = s * sf
            entry["conv"] = conv
        if kind == "td":
            dtf = RATE_M.get(v[29])
            drf = RATE_AS.get(v[34])
            dsf = RATE_PPM.get(v[37])
            dt = (_num(v[25]), _num(v[26]), _num(v[27]))
            dr = (_num(v[30]), _num(v[31]), _num(v[32]))
            ds = _num(v[35])
            ep = _num(v[38])
            if None in (dtf, drf, dsf, ds, ep) or None in dt \
                    or None in dr or v[40] != "1029":
                continue
            entry["dt"] = tuple(x * dtf for x in dt)
            entry["dr"] = tuple(x * drf for x in dr)
            entry["ds"] = ds * dsf
            entry["epoch"] = ep
        try:
            operations[int(v[1])] = entry
        except ValueError:
            continue

    # gridless CONCATENATED operations between geodetic bases: these
    # are the db-listed multi-step chains (NTF (Paris) to WGS 84 (1),
    # code 8094 = rotation + helmert) whose presence tells the
    # reference's planner a real gridless path exists — which in turn
    # decides whether a ballpark fallback op is appended to the
    # candidate list (PD/83 -> WGS 84 has no such chain -> ballpark).
    grid_op_codes = {str(e["code"]) for es in grids.values() for e in es}
    grid_op_codes |= {v[1] for v in rows("grid_transformation.sql",
                                         "grid_transformation")
                      if v[0] == "EPSG"}
    concat_steps: dict[str, list[str]] = {}
    for v in rows("concatenated_operation_step.sql",
                  "concatenated_operation_step"):
        if v[0] == "EPSG":
            concat_steps.setdefault(v[1], []).append(v[4])
    concat_gridless: set[tuple[int, int]] = set()
    for v in rows("concatenated_operation.sql",
                  "concatenated_operation"):
        if v[0] != "EPSG" or v[-1] == "1":
            continue
        if v[4] != "EPSG" or v[6] != "EPSG":
            continue
        steps = concat_steps.get(v[1], [])
        if not steps or any(s in grid_op_codes for s in steps):
            continue
        try:
            s_c, t_c = int(v[5]), int(v[7])
        except ValueError:
            continue
        sb = geog_base.get(s_c, s_c)
        tb = geog_base.get(t_c, t_c)
        concat_gridless.add((sb, tb))

    # prime-meridian siblings: EPSG "Longitude rotation" (9601)
    # operations map a non-Greenwich geographic CRS (NTF (Paris),
    # Monte Mario (Rome)...) to its Greenwich sibling. Coordinates at
    # the planner's angular hub are already Greenwich-referenced (the
    # CRS string's +pm is applied by prepare/finalize), so the sibling
    # code is a pure ALIAS for datum-shift planning.
    pm_equiv: dict[int, int] = {}
    for v in rows("other_transformation.sql", "other_transformation"):
        if v[0] != "EPSG" or v[5] != "9601":
            continue
        if v[7] != "EPSG" or v[9] != "EPSG":
            continue
        try:
            s_c, t_c = int(v[8]), int(v[10])
        except ValueError:
            continue
        # prefer non-deprecated rows; any row still encodes the alias
        if s_c not in pm_equiv or v[-1] != "1":
            pm_equiv[s_c] = t_c

    with OUT.open("w", encoding="utf-8") as f:
        f.write('"""Static coordinate-operation planner tables.\n\n'
                "AUTO-GENERATED by tools/gen_epsg_ops.py from the\n"
                "reference's public EPSG SQL distribution — do not edit.\n"
                "Parity target: the Helmert subset of what proj.db's\n"
                "coordinateoperationfactory plans with (reference\n"
                "src/iso19111/operation/coordinateoperationfactory.cpp:583"
                ").\n"
                '"""\n\n')
        f.write("# geographic CRSs whose authority angular unit is not\n"
                "# degree: code -> factor converting that unit to "
                "degrees\n")
        f.write("GEOG_UNIT = {\n")
        for code in sorted(geog_unit):
            f.write(f"    {code}: {geog_unit[code]!r},\n")
        f.write("}\n\n")
        f.write("GEOG_BASE = {\n")
        for code in sorted(geog_base):
            f.write(f"    {code}: {geog_base[code]},\n")
        f.write("}\n\n")
        f.write("# non-Greenwich geographic CRS -> Greenwich sibling\n"
                "# (EPSG 9601 Longitude rotation ops); planner alias\n")
        f.write("PM_EQUIV = {\n")
        for code in sorted(pm_equiv):
            f.write(f"    {code}: {pm_equiv[code]},\n")
        f.write("}\n\n")
        f.write("# EPSG extent name (casefolded) -> (w, s, e, n) bbox\n"
                "# (cs2cs --area lookup)\n")
        f.write("EXTENT_BY_NAME = {\n")
        for name in sorted(extent_by_name):
            f.write(f"    {name!r}: {extent_by_name[name]!r},\n")
        f.write("}\n\n")
        f.write("# geodetic base pairs connected by a GRIDLESS\n"
                "# db-listed concatenated operation (Greenwich-aliased)"
                "\n")
        f.write("CONCAT_GRIDLESS = frozenset({\n")
        cg = sorted({(pm_equiv.get(a, a), pm_equiv.get(b, b))
                     for a, b in concat_gridless})
        for pair in cg:
            f.write(f"    {pair!r},\n")
        f.write("})\n\n")
        f.write("HELMERT = {\n")
        for key in sorted(helmert):
            f.write(f"    {key!r}: [\n")
            for e in sorted(helmert[key],
                            key=lambda e: (e["acc"] is None,
                                           e["acc"], e["code"])):
                f.write(f"        {e!r},\n")
            f.write("    ],\n")
        f.write("}\n\n")
        f.write("GRIDS = {\n")
        for key in sorted(grids):
            f.write(f"    {key!r}: [\n")
            for e in sorted(grids[key],
                            key=lambda e: (e["acc"] is None,
                                           e["acc"], e["code"])):
                f.write(f"        {e!r},\n")
            f.write("    ],\n")
        f.write("}\n\n")
        f.write("VERT_GRIDS = {\n")
        for key in sorted(vert_grids):
            f.write(f"    {key}: {vert_grids[key]!r},\n")
        f.write("}\n\n")
        kept_codes = {e["code"] for es in helmert.values() for e in es}
        kept_codes |= {e["code"] for es in grids.values() for e in es}
        f.write("# op code -> replacement op codes (supersession table"
                " + EPSG\n# 'Replaced ... code NNNN' remarks); planner"
                " drops a candidate when\n# a replacement is in the"
                " same candidate set (discardSuperseded)\n")
        f.write("SUPERSEDED = {\n")
        for code in sorted(superseded):
            if code in kept_codes:
                f.write(f"    {code}: {sorted(set(superseded[code]))!r}"
                        ",\n")
        f.write("}\n\n")
        f.write("SIMILARITY = {\n")
        for key in sorted(similarity):
            f.write(f"    {key!r}: [\n")
            for e in sorted(similarity[key],
                            key=lambda e: (e["acc"] is None,
                                           e["acc"], e["code"])):
                f.write(f"        {e!r},\n")
            f.write("    ],\n")
        f.write("}\n\n")
        f.write("# geocentric-domain coordinate operations keyed by EPSG\n"
                "# operation code (metre / arc-second / ppm, rates per\n"
                "# year, epoch in years) — the cct CLI's EPSG:<code> and\n"
                "# name-initialization surface\n")
        f.write("OPERATIONS = {\n")
        for code in sorted(operations):
            f.write(f"    {code}: {operations[code]!r},\n")
        f.write("}\n")
    print(f"wrote {OUT}: {len(geog_base)} bases, "
          f"{kept} helmert ops ({skipped} skipped), "
          f"{len(helmert)} pairs, {gkept} grid ops, "
          f"{skept} similarity ops, {len(operations)} geocen op codes")


if __name__ == "__main__":
    main()
