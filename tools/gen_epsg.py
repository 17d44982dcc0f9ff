"""Generate a static EPSG registry (code -> proj4-style definition) from
the reference's EPSG SQL distribution (/root/reference/data/sql/).

Mirrors what PROJ's proj.db + createFromUserInput would resolve for
`+init=epsg:XXXX` / `EPSG:XXXX`, restricted to the conversion methods
this engine implements. Modern semantics: no +towgs84 is emitted (the
curated table in proj_ray/epsg.py keeps its legacy towgs84 entries and
takes precedence).

Usage: python tools/gen_epsg.py  ->  writes proj_ray/epsg_generated.py
"""

from __future__ import annotations

import re
from pathlib import Path

SQL = Path("/root/reference/data/sql")


def rows(fname: str, table: str):
    """Yield tuples from single-line INSERT statements."""
    pat = re.compile(rf'INSERT INTO "{table}" (?:\([^)]*\) )?VALUES\s*\((.*)\);\s*$')
    for line in (SQL / fname).open(encoding="utf-8"):
        m = pat.match(line.strip())
        if not m:
            continue
        yield _split_tuple(m.group(1))


def _split_tuple(s: str) -> list:
    out, cur, in_q, i = [], [], False, 0
    while i < len(s):
        ch = s[i]
        if in_q:
            if ch == "'":
                if i + 1 < len(s) and s[i + 1] == "'":
                    cur.append("'")
                    i += 1
                else:
                    in_q = False
            else:
                cur.append(ch)
        else:
            if ch == "'":
                in_q = True
            elif ch == ",":
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        i += 1
    out.append("".join(cur))
    return [x.strip() for x in out]


def _num(x: str):
    if x in ("NULL", ""):
        return None
    return float(x)


def load_units() -> dict[str, tuple[str, float | None]]:
    units = {}
    for r in rows("unit_of_measure.sql", "unit_of_measure"):
        code, name, typ, factor = r[1], r[2], r[3], _num(r[4])
        units[code] = (typ, factor, name)
    return units


def angle_deg(value: float, uom: str, units) -> float:
    """Convert an EPSG angular parameter to decimal degrees. Common
    units use exact ratios (the stored radian factors are rounded
    decimals that would inject 1e-14 noise via a rad round-trip)."""
    import math

    if uom == "9110":  # sexagesimal DMS: D.MMSSsss
        sign = -1.0 if value < 0 else 1.0
        v = abs(value)
        d = int(v)
        m = int(round((v - d) * 100, 9))
        sec = (v - d - m / 100.0) * 10000.0
        if sec < 0:
            sec = 0.0
        return sign * (d + m / 60.0 + sec / 3600.0)
    if uom in ("9102", "9122"):  # degree
        return value
    if uom == "9105":  # grad
        return value * 0.9
    if uom == "9103":  # arc-minute
        return value / 60.0
    if uom == "9104":  # arc-second
        return value / 3600.0
    if uom == "9101":  # radian
        return math.degrees(value)
    if uom == "9109":  # microradian
        return math.degrees(value * 1e-6)
    typ, factor, _ = units[uom]
    if factor is None:
        raise ValueError(f"no factor for uom {uom}")
    return value * factor * 180.0 / math.pi if typ == "angle" else value


def length_m(value: float, uom: str, units) -> float:
    typ, factor, _ = units[uom]
    return value * (factor if factor else 1.0)


# EPSG parameter code -> canonical key
P = {
    "8801": "lat_0", "8802": "lon_0", "8805": "k_0",
    "8806": "x_0", "8807": "y_0",
    "8811": "lat_0", "8812": "lonc", "8813": "alpha", "8814": "gamma",
    "8815": "k_0", "8816": "x_0", "8817": "y_0",
    "8821": "lat_0", "8822": "lon_0", "8823": "lat_1", "8824": "lat_2",
    "8826": "x_0", "8827": "y_0",
    "8832": "lat_ts", "8833": "lon_0",
    "1036": "alpha", "8818": "lat_1", "1038": "k_0", "1039": "h_0",
    "8819": "k_0",
}
ANGLES = {"lat_0", "lon_0", "lonc", "alpha", "gamma", "lat_1", "lat_2",
          "lat_ts"}

# method code -> (proj name, param remaps / extras)
METHODS = {
    "9807": ("tmerc", {}, []),
    "9808": ("tmerc", {}, ["axis=wsu"]),
    "9802": ("lcc", {}, []),
    "9801": ("lcc", {"lat_0": ["lat_1", "lat_0"]}, []),
    "1051": ("lcc", {}, []),
    "9804": ("merc", {}, []),
    "9805": ("merc", {"lat_1": ["lat_ts"]}, []),
    "1024": ("webmerc", {}, []),
    "9806": ("cass", {}, []),
    "9809": ("sterea", {}, []),
    "9810": ("stere", {}, []),
    "9829": ("stere", {"lat_ts": ["lat_ts"], "_polar_b": True}, []),
    "9812": ("omerc", {}, ["no_uoff"]),
    "9815": ("omerc", {}, []),
    "9818": ("poly", {}, []),
    "9820": ("laea", {}, []),
    "9822": ("aea", {}, []),
    "9832": ("aeqd", {}, []),
    "9831": ("aeqd", {}, ["guam"]),
    "9833": ("cass", {}, ["hyperbolic"]),
    "9835": ("cea", {"lat_1": ["lat_ts"]}, []),
    "9834": ("cea", {"lat_1": ["lat_ts"]}, []),
    "1028": ("eqc", {"lat_1": ["lat_ts"]}, []),
    "1029": ("eqc", {"lat_1": ["lat_ts"]}, []),
    "9823": ("eqc", {"lat_1": ["lat_ts"]}, []),
    "9842": ("eqc", {"lat_1": ["lat_ts"]}, []),
    "9811": ("nzmg", {}, []),
    "1052": ("col_urban", {}, []),
    "9828": ("bonne", {"lat_1": ["lat_1"]}, []),
    "9826": ("lcc", {"lat_0": ["lat_1", "lat_0"]}, []),  # west orientated:
    # axis letters from the CS carry the orientation
    "9819": ("krovak", {}, []),
    "1041": ("krovak", {}, []),
    "1042": ("mod_krovak", {}, []),
    "1043": ("mod_krovak", {}, []),
}


def fmt(v: float) -> str:
    s = f"{v:.15g}"
    return s


def main() -> None:
    units = load_units()

    ellps = {}
    for r in rows("ellipsoid.sql", "ellipsoid"):
        code, a, uom_code, rf, b = r[1], _num(r[6]), r[8], _num(r[9]), \
            _num(r[10])
        a_m = length_m(a, uom_code, units)
        ellps[code] = (a_m, rf, length_m(b, uom_code, units)
                       if b is not None else None)

    pms = {}
    for r in rows("prime_meridian.sql", "prime_meridian"):
        code, lon, uom = r[1], _num(r[3]), r[5]
        pms[code] = angle_deg(lon, uom, units)

    datums = {}
    for r in rows("geodetic_datum.sql", "geodetic_datum"):
        code, ell, pm = r[1], r[5], r[7]
        datums[code] = (ell, pm)
    # datum ensembles reference member datums via a separate table; the
    # ensemble row itself carries the ellipsoid, so nothing extra needed.

    geod = {}
    geod_cs = {}
    for r in rows("geodetic_crs.sql", "geodetic_crs"):
        code, typ, cs, datum, deprecated = r[1], r[4], r[6], r[8], r[-1]
        if deprecated == "1":
            continue
        geod[code] = (typ, datum)
        geod_cs[code] = cs

    axes = {}
    for r in rows("axis.sql", "axis"):
        cs, order, orient, uom = r[6], int(r[7]), r[4], r[9]
        axes.setdefault(cs, []).append((order, orient, uom))

    convs = {}
    for r in rows("conversion.sql", "conversion"):
        code, method = r[1], r[5]
        params = {}
        # 7 parameter slots of (auth, code, name, value, uom_auth, uom)
        base = 7
        for s in range(7):
            off = base + s * 6
            if off + 5 >= len(r):
                break
            pc, val, uom = r[off + 1], _num(r[off + 3]), r[off + 5]
            if pc in ("NULL", "") or val is None:
                continue
            params[pc] = (val, uom)
        convs[code] = (method, params)

    def geo_defn(gcode: str) -> str | None:
        if gcode not in geod:
            return None
        typ, datum = geod[gcode]
        if datum not in datums:
            return None
        ellc, pmc = datums[datum]
        if ellc not in ellps:
            return None
        a, rf, b = ellps[ellc]
        parts = [f"+a={fmt(a)}"]
        if rf:
            parts.append(f"+rf={fmt(rf)}")
        elif b is not None:
            parts.append(f"+b={fmt(b)}")
        else:
            parts.append(f"+b={fmt(a)}")
        pmv = pms.get(pmc, 0.0)
        if pmv:
            parts.append(f"+pm={fmt(pmv)}")
        return " ".join(parts)

    # towgs84 from helmert_transformation.sql: a geographic CRS gets a
    # +towgs84 only when its to-WGS84/ETRS89 transformation is
    # UNAMBIGUOUS (one distinct parameter set at the best accuracy);
    # coordinate-frame rotations are negated into the position-vector
    # convention proj4 +towgs84 uses. Time-dependent ops skipped.
    HUB = {"4326", "4258", "4979", "4937", "9989"}
    PV = {"9606", "1037", "1033", "1053"}
    CF = {"9607", "1032", "1038", "1056"}
    T3 = {"9603", "1031", "1035"}
    cands: dict[str, list] = {}
    for r in rows("helmert_transformation.sql", "helmert_transformation"):
        method, s_auth, s_code = r[5], r[7], r[8]
        t_auth, t_code, acc = r[9], r[10], _num(r[11])
        deprecated = r[-1]
        if deprecated == "1" or s_auth != "EPSG" or t_auth != "EPSG":
            continue
        if t_code not in HUB or method not in (PV | CF | T3):
            continue
        if r[25] not in ("NULL", ""):  # rate_tx: time-dependent
            continue
        try:
            tx = length_m(_num(r[12]), r[16], units)
            ty = length_m(_num(r[13]), r[16], units)
            tz = length_m(_num(r[14]), r[16], units)
        except (TypeError, KeyError):
            continue
        if method in T3:
            params = (tx, ty, tz, 0.0, 0.0, 0.0, 0.0)
        else:
            try:
                # rotations to arc-seconds, scale to ppm
                rx = angle_deg(_num(r[17]), r[21], units) * 3600.0
                ry = angle_deg(_num(r[18]), r[21], units) * 3600.0
                rz = angle_deg(_num(r[19]), r[21], units) * 3600.0
                sc = _num(r[22])
                s_uom = r[24]
                sfac = units.get(s_uom, (None, 1.0, ""))[1] or 1.0
                sc = sc * sfac * 1e6  # unity-factor -> ppm
            except (TypeError, KeyError):
                continue
            if method in CF:
                rx, ry, rz = -rx, -ry, -rz
            params = (tx, ty, tz, rx, ry, rz, sc)
        cands.setdefault(s_code, []).append(
            (acc if acc is not None else 999.0, params))
    towgs84: dict[str, str] = {}
    for s_code, lst in cands.items():
        if s_code in HUB:
            continue
        # conservative: only when every candidate agrees (a single
        # distinct parameter set) — the most accurate op is usually the
        # most regional one, which is the wrong default for a whole CRS
        sets = {tuple(round(v, 6) for v in p) for _a, p in lst}
        if len(sets) == 1:
            p = next(iter(sets))
            towgs84[s_code] = ",".join(fmt(v) for v in p)

    # the hand-curated table's towgs84 choices (classic proj4 picks,
    # e.g. ED50 -87,-98,-121) take precedence over the conservative
    # auto-selection for their geographic codes
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from proj_ray.epsg import EPSG_INIT

    for ccode, cdef in EPSG_INIT.items():
        m = re.search(r"\+towgs84=([0-9eE+,.\-]+)", cdef)
        if m and "longlat" in cdef:
            towgs84[str(ccode)] = m.group(1)

    out: dict[int, str] = {}
    latlon_order: list[int] = []
    geo3d: list[int] = []
    for code, (typ, datum) in geod.items():
        if not typ.startswith("geographic"):
            if typ == "geocentric":
                base = geo_defn(code)
                if base:
                    out[int(code)] = f"+proj=geocent {base} +units=m"
            continue
        base = geo_defn(code)
        if base:
            tw = towgs84.get(code)
            suffix = f" +towgs84={tw}" if tw else ""
            out[int(code)] = f"+proj=longlat {base}{suffix}"
            cs = geod_cs.get(code)
            ax = sorted(axes.get(cs, [])) if cs else []
            if ax and ax[0][1].lower().startswith("north"):
                latlon_order.append(int(code))
            if typ == "geographic 3D":
                geo3d.append(int(code))

    skipped_methods: dict[str, int] = {}
    for r in rows("projected_crs.sql", "projected_crs"):
        code, cs, gcrs, conv, deprecated = r[1], r[5], r[7], r[9], r[-1]
        if deprecated == "1" or conv not in convs:
            continue
        method, params = convs[conv]
        if method not in METHODS:
            skipped_methods[method] = skipped_methods.get(method, 0) + 1
            continue
        name, remap, extras = METHODS[method]
        base = geo_defn(gcrs)
        if base is None:
            continue
        kv: dict[str, float] = {}
        ok = True
        for pc, (val, uom) in params.items():
            key = P.get(pc)
            if key is None:
                ok = False
                break
            tgt = remap.get(key, [key]) if isinstance(remap.get(key), list) \
                else [remap.get(key, key)]
            for t in tgt:
                if not isinstance(t, str):
                    continue
                try:
                    kv[t] = angle_deg(val, uom, units) if t in ANGLES \
                        else length_m(val, uom, units)
                except ValueError:
                    ok = False
        if not ok:
            continue
        if method == "9829" and "lat_0" not in kv:
            # Polar Stereographic B: hemisphere implied by lat_ts sign
            kv["lat_0"] = 90.0 if kv.get("lat_ts", 90.0) >= 0 else -90.0
        # CS units / axis order
        ax = sorted(axes.get(cs, []))
        if len(ax) < 2:
            continue
        uoms = {a[2] for a in ax}
        if len(uoms) != 1:
            continue
        ufactor = units[ax[0][2]][1]
        if ufactor is None:
            continue
        if any("along" in a[1] for a in ax):
            # polar CS with rotated-meridian axes ("North along 90 deg
            # East"): legacy +axis can't express these; use the plain
            # projection axes (documented approximation, as in proj4
            # legacy strings for UPS/NSIDC codes)
            letters = "enu"
        else:
            letters = "".join({"east": "e", "north": "n", "south": "s",
                               "west": "w"}.get(a[1].lower(), "?")
                              for a in ax) + "u"
        if "?" in letters:
            continue
        parts = [f"+proj={name}"]
        for k in ("lat_0", "lon_0", "lonc", "lat_1", "lat_2", "lat_ts",
                  "alpha", "gamma", "k_0", "x_0", "y_0", "h_0"):
            if k in kv:
                pk = "k" if k == "k_0" else k
                parts.append(f"+{pk}={fmt(kv[k])}")
        for e in extras:
            parts.append(f"+{e}")
        parts.append(base)
        tw = towgs84.get(gcrs)
        if tw:
            parts.append(f"+towgs84={tw}")
        if abs(ufactor - 1.0) < 1e-15:
            parts.append("+units=m")
        elif abs(ufactor - 0.3048) < 1e-12:
            parts.append("+units=ft")
        elif abs(ufactor - 1200.0 / 3937.0) < 1e-12:
            parts.append("+units=us-ft")
        else:
            parts.append(f"+to_meter={fmt(ufactor)}")
        if letters != "enu":
            parts.append(f"+axis={letters}")
        out[int(code)] = " ".join(parts)

    # compound CRS codes -> (horizontal member, vertical member)
    compound: dict[int, tuple[int, int]] = {}
    for r in rows("compound_crs.sql", "compound_crs"):
        if r[0] != "EPSG" or r[-1] == "1":
            continue
        if r[4] != "EPSG" or r[6] != "EPSG":
            continue
        try:
            compound[int(r[1])] = (int(r[5]), int(r[7]))
        except ValueError:
            continue

    dst = Path(__file__).resolve().parent.parent / "proj_ray" / \
        "epsg_generated.py"
    with dst.open("w", encoding="utf-8") as f:
        f.write('"""GENERATED by tools/gen_epsg.py from the reference\n'
                "EPSG SQL distribution (/root/reference/data/sql/*.sql,\n"
                "IOGP EPSG dataset, public). Do not edit by hand.\n"
                "Modern semantics: no +towgs84 (see proj_ray/epsg.py for\n"
                'the curated legacy entries, which take precedence)."""\n\n'
                "EPSG_GENERATED: dict[int, str] = {\n")
        for code in sorted(out):
            f.write(f"    {code}: {out[code]!r},\n")
        f.write("}\n\n")
        f.write("# geographic CRSs whose EPSG authority axis order is\n"
                "# (latitude, longitude) — used by the EPSG:code path;\n"
                "# the legacy +init path keeps lon,lat\n"
                "EPSG_GEO_LATLON: frozenset[int] = frozenset({\n")
        for i in range(0, len(latlon_order), 10):
            f.write("    " + ", ".join(str(c) for c in
                                       sorted(latlon_order)[i:i + 10])
                    + ",\n")
        f.write("})\n\n")
        f.write("# geographic 3D CRSs (ellipsoidal height is part of the\n"
                "# coordinate tuple; vertical transformations apply)\n"
                "EPSG_GEO_3D: frozenset[int] = frozenset({\n")
        for i in range(0, len(geo3d), 10):
            f.write("    " + ", ".join(str(c) for c in
                                       sorted(geo3d)[i:i + 10]) + ",\n")
        f.write("})\n\n")
        f.write("# compound CRS code -> (horizontal member, vertical "
                "member)\n"
                "EPSG_COMPOUND: dict[int, tuple[int, int]] = {\n")
        for code in sorted(compound):
            f.write(f"    {code}: {compound[code]!r},\n")
        f.write("}\n")
    print(f"wrote {len(out)} codes to {dst}")
    top = sorted(skipped_methods.items(), key=lambda x: -x[1])[:12]
    print("skipped methods:", top)


if __name__ == "__main__":
    main()
