"""Generate a static IAU_2015 planetary-CRS registry from the
reference's iau.sql (/root/reference/data/sql/iau.sql, built by the
reference's scripts/build_db_from_iau.py from the public IAU WGCCRE
report; same provenance as proj.db).

Mirrors what createFromUserInput("IAU_2015:NNNN") resolves: ocentric
geographic CRSs (east lon, lat-first authority order), ographic CRSs
(west positive lon on most bodies), spherical planetocentric CRSs
(+geoc on ellipsoidal datums), and the projected families
(eqc/sinu/stere/tmerc/lcc/laea/aea/merc/ortho/moll/robin per body).

Usage: python tools/gen_iau.py  ->  writes proj_ray/iau_generated.py
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import gen_epsg as GE  # noqa: E402  (shared SQL parsing/units/methods)

IAU_SQL = Path("/root/reference/data/sql/iau.sql")

# iau.sql-only conversion methods beyond gen_epsg.METHODS
EXTRA_METHODS = {
    "1026": ("merc", {}, []),        # Mercator (Spherical)
    "9840": ("ortho", {}, []),
    "MOLLWEIDE": ("moll", {}, []),
    "ROBINSON": ("robin", {}, []),
    "SINUSOIDAL": ("sinu", {}, []),
}

_ORIENT = {"east": "e", "north": "n", "south": "s", "west": "w"}


def iau_rows() -> dict[str, list[list[str]]]:
    """table name -> rows, from iau.sql's unquoted INSERT statements."""
    pat = re.compile(r"INSERT INTO (\w+) VALUES\s*\((.*)\);\s*$")
    tables: dict[str, list[list[str]]] = {}
    for line in IAU_SQL.open(encoding="utf-8"):
        m = pat.match(line.strip())
        if m:
            tables.setdefault(m.group(1), []).append(
                GE._split_tuple(m.group(2)))
    return tables


def main() -> None:
    units = GE.load_units()
    tables = iau_rows()
    methods = dict(GE.METHODS)
    methods.update(EXTRA_METHODS)

    ellps = {}
    for r in tables.get("ellipsoid", []):
        code, a, uom, rf, b = r[1], GE._num(r[6]), r[8], GE._num(r[9]), \
            GE._num(r[10])
        ellps[code] = (GE.length_m(a, uom, units), rf,
                       GE.length_m(b, uom, units) if b is not None
                       else None)

    pms = {}
    for r in tables.get("prime_meridian", []):
        pms[r[1]] = GE.angle_deg(GE._num(r[3]), r[5], units)

    datums = {}
    for r in tables.get("geodetic_datum", []):
        datums[r[1]] = (r[5], r[7])  # ellipsoid code, pm code

    # axis orientations per coordinate-system code: PROJ-authority CSs
    # ship in iau.sql; EPSG CSs (4400 etc.) in the EPSG axis file
    axes: dict[str, list] = {}
    for r in tables.get("axis", []):
        axes.setdefault(r[6], []).append((int(r[7]), r[4].lower(), r[9]))
    for r in GE.rows("axis.sql", "axis"):
        axes.setdefault(r[6], []).append((int(r[7]), r[4].lower(), r[9]))

    def geo_parts(gcode: str):
        """(ellipsoid tokens, is_sphere) for a geodetic CRS code."""
        if gcode not in geod:
            return None, True
        _typ, _cs, datum = geod[gcode]
        ellc, pmc = datums.get(datum, (None, None))
        if ellc not in ellps:
            return None, True
        a, rf, b = ellps[ellc]
        parts = [f"+a={GE.fmt(a)}"]
        sphere = True
        if rf:
            parts.append(f"+rf={GE.fmt(rf)}")
            sphere = False
        elif b is not None and abs(b - a) > 1e-9:
            parts.append(f"+b={GE.fmt(b)}")
            sphere = False
        else:
            parts.append(f"+b={GE.fmt(a)}")
        pmv = pms.get(pmc, 0.0)
        if pmv:
            parts.append(f"+pm={GE.fmt(pmv)}")
        return " ".join(parts), sphere

    geod: dict[str, tuple[str, str, str]] = {}
    for r in tables.get("geodetic_crs", []):
        code, typ, cs, datum, dep = r[1], r[4], r[6], r[8], r[-1]
        if dep == "1":
            continue
        geod[code] = (typ, cs, datum)

    out: dict[int, str] = {}
    latlon: list[int] = []
    for code, (typ, cs, _datum) in geod.items():
        base, sphere = geo_parts(code)
        if base is None:
            continue
        ax = sorted(axes.get(cs, []))
        lat_first = bool(ax) and ax[0][1].startswith("north")
        lon_west = any(o == "west" for _n, o, _u in ax)
        toks = ["+proj=longlat", base]
        # spherical planetocentric CS on an ellipsoidal datum: the
        # latitude is geocentric (+geoc); on spheres they coincide
        if typ == "other" and not sphere:
            toks.append("+geoc")
        if lon_west:
            # ographic west-positive longitude, authority order lat,lon
            toks.append("+axis=nwu" if lat_first else "+axis=wnu")
        elif lat_first:
            latlon.append(int(code))
        out[int(code)] = " ".join(toks)

    convs = {}
    for r in tables.get("conversion", []):
        code, method = r[1], r[5]
        params = {}
        for s in range(7):
            off = 7 + s * 6
            if off + 5 >= len(r):
                break
            pc, val, uom = r[off + 1], GE._num(r[off + 3]), r[off + 5]
            if pc in ("NULL", "") or val is None:
                continue
            params[pc] = (val, uom)
        convs[code] = (method, params)

    skipped: dict[str, int] = {}
    for r in tables.get("projected_crs", []):
        code, cs, gcrs, conv, dep = r[1], r[5], r[7], r[9], r[-1]
        if dep == "1" or conv not in convs:
            continue
        method, params = convs[conv]
        if method not in methods:
            skipped[method] = skipped.get(method, 0) + 1
            continue
        name, remap, extras = methods[method]
        base, _sphere = geo_parts(gcrs)
        if base is None:
            continue
        kv: dict[str, float] = {}
        ok = True
        for pc, (val, uom) in params.items():
            key = GE.P.get(pc)
            if key is None:
                ok = False
                break
            tgt = remap.get(key, [key]) \
                if isinstance(remap.get(key), list) \
                else [remap.get(key, key)]
            for tk in tgt:
                if not isinstance(tk, str):
                    continue
                kv[tk] = GE.angle_deg(val, uom, units) \
                    if tk in GE.ANGLES else GE.length_m(val, uom, units)
        if not ok:
            continue
        ax = sorted(axes.get(cs, []))
        if len(ax) < 2:
            continue
        letters = "".join(_ORIENT.get(o, "?") for _n, o, _u in ax) + "u"
        if "?" in letters:
            continue
        ufac = units[ax[0][2]][1]
        if ufac is None or abs(ufac - 1.0) > 1e-15:
            continue  # IAU projected CSs are metres
        parts = [f"+proj={name}"]
        for k in ("lat_0", "lon_0", "lonc", "lat_1", "lat_2", "lat_ts",
                  "alpha", "gamma", "k_0", "x_0", "y_0"):
            if k in kv:
                parts.append(f"+{'k' if k == 'k_0' else k}={GE.fmt(kv[k])}")
        parts.extend(f"+{e}" for e in extras)
        parts.append(base)
        parts.append("+units=m")
        if letters != "enu":
            parts.append(f"+axis={letters}")
        out[int(code)] = " ".join(parts)

    dst = Path(__file__).resolve().parent.parent / "proj_ray" / \
        "iau_generated.py"
    with dst.open("w", encoding="utf-8") as f:
        f.write('"""GENERATED by tools/gen_iau.py from the reference\'s\n'
                "iau.sql (public IAU WGCCRE 2015 dataset). Do not edit\n"
                'by hand."""\n\n'
                "IAU_GENERATED: dict[int, str] = {\n")
        for code in sorted(out):
            f.write(f"    {code}: {out[code]!r},\n")
        f.write("}\n\n")
        f.write("# geographic CRSs with (latitude, longitude) authority\n"
                "# order and east-positive longitude (west-positive CRSs\n"
                "# carry an explicit +axis instead)\n"
                "IAU_GEO_LATLON: frozenset[int] = frozenset({\n")
        for i in range(0, len(latlon), 10):
            f.write("    " + ", ".join(
                str(c) for c in sorted(latlon)[i:i + 10]) + ",\n")
        f.write("})\n")
    print(f"wrote {len(out)} codes to {dst}")
    if skipped:
        print("skipped methods:", sorted(skipped.items(),
                                         key=lambda x: -x[1]))


if __name__ == "__main__":
    main()
