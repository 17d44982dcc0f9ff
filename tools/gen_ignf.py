"""Generate a static IGNF registry (code -> proj string) from the
reference's ignf.sql (public IGN France dataset distributed with
PROJ's proj.db; originally derived from the legacy proj4 'IGNF' init
file).

Also emits IGNF_GEOG_BASE: IGNF code -> the EPSG geographic-2D CRS
code sharing its (EPSG-authority) datum, which lets create_crs_to_crs
plan datum shifts for +init=IGNF: pairs with the existing EPSG
operation tables (NTFG -> RGF93G rides the NTF->RGF93 grid ops).

Usage: python tools/gen_ignf.py  ->  writes proj_ray/ignf_generated.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import gen_epsg as GE  # noqa: E402

EXTRA_METHODS = {
    "9840": ("ortho", {}, []),
    "mill": ("mill", {}, []),        # PROJ-authority method names
    "gstm": ("gstmerc", {}, []),     # Gauss Schreiber (Laborde Réunion)
    "MILLER": ("mill", {}, []),
    "MOLLWEIDE": ("moll", {}, []),
    "9827": ("bonne", {"lat_0": ["lat_1"]}, []),
    "9829": ("stere", {"lat_ts": ["lat_ts"], "_polar_b": True}, []),
    "9841": ("merc", {}, []),
    "1027": ("laea", {}, ["R_A"]),
    "1026": ("merc", {}, []),
    "9834": ("cea", {"lat_1": ["lat_ts"]}, []),
    "9842": ("eqc", {"lat_1": ["lat_ts"]}, []),
    "9818": ("poly", {}, []),
}


def main() -> None:
    units = GE.load_units()
    methods = dict(GE.METHODS)
    methods.update(EXTRA_METHODS)

    # EPSG ellipsoids/prime meridians (IGNF rows reference them), plus
    # ignf.sql's own additions
    ellps = {}
    for fname, auth in (("ellipsoid.sql", "EPSG"),
                        ("ignf.sql", "IGNF")):
        for r in GE.rows(fname, "ellipsoid"):
            if r[0] != auth:
                continue
            a, uom, rf, b = GE._num(r[6]), r[8], GE._num(r[9]), \
                GE._num(r[10])
            ellps[(r[0], r[1])] = (
                GE.length_m(a, uom, units), rf,
                GE.length_m(b, uom, units) if b is not None else None)
    pms = {}
    for fname in ("prime_meridian.sql", "ignf.sql"):
        for r in GE.rows(fname, "prime_meridian"):
            pms[(r[0], r[1])] = GE.angle_deg(GE._num(r[3]), r[5], units)

    datums = {}  # (auth, code) -> ((ell auth, code), (pm auth, code))
    for fname in ("geodetic_datum.sql", "ignf.sql"):
        for r in GE.rows(fname, "geodetic_datum"):
            datums[(r[0], r[1])] = ((r[4], r[5]), (r[6], r[7]))

    # EPSG datum code -> canonical EPSG geographic-2D CRS code
    epsg_geo_by_datum: dict[str, int] = {}
    for r in GE.rows("geodetic_crs.sql", "geodetic_crs"):
        if r[0] != "EPSG" or r[-1] == "1" or r[4] != "geographic 2D":
            continue
        if r[7] == "EPSG":
            code = int(r[1])
            cur = epsg_geo_by_datum.get(r[8])
            if cur is None or code < cur:
                epsg_geo_by_datum[r[8]] = code

    geod = {}   # IGNF code -> (datum key)
    for r in GE.rows("ignf.sql", "geodetic_crs"):
        if r[0] != "IGNF" or r[-1] == "1":
            continue
        geod[r[1]] = (r[4], (r[7], r[8]))  # type, datum key

    def ell_tokens(dkey):
        d = datums.get(dkey)
        if d is None:
            return None
        (ek, pk) = d
        e = ellps.get(ek)
        if e is None:
            return None
        a, rf, b = e
        toks = [f"+a={GE.fmt(a)}"]
        if rf:
            toks.append(f"+rf={GE.fmt(rf)}")
        elif b is not None and abs(b - a) > 1e-9:
            toks.append(f"+b={GE.fmt(b)}")
        else:
            toks.append(f"+b={GE.fmt(a)}")
        pmv = pms.get(pk, 0.0)
        if pmv:
            toks.append(f"+pm={GE.fmt(pmv)}")
        return " ".join(toks)

    out: dict[str, str] = {}
    geog_base: dict[str, int] = {}
    for code, (typ, dkey) in geod.items():
        base = ell_tokens(dkey)
        if base is None:
            continue
        if typ == "geocentric":
            out[code] = f"+proj=geocent {base} +units=m"
        else:
            out[code] = f"+proj=longlat {base}"
        if dkey[0] == "EPSG" and dkey[1] in epsg_geo_by_datum:
            geog_base[code] = epsg_geo_by_datum[dkey[1]]

    convs = {}
    for r in GE.rows("ignf.sql", "conversion"):
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

    axes: dict[str, list] = {}
    for r in GE.rows("axis.sql", "axis"):
        axes.setdefault(r[6], []).append((int(r[7]), r[4].lower(), r[9]))

    skipped: dict[str, int] = {}
    for r in GE.rows("ignf.sql", "projected_crs"):
        code, cs, gcrs, conv, dep = r[1], r[5], r[7], r[9], r[-1]
        if r[0] != "IGNF" or dep == "1" or conv not in convs:
            continue
        method, params = convs[conv]
        if method not in methods:
            skipped[method] = skipped.get(method, 0) + 1
            continue
        name, remap, extras = methods[method]
        g = geod.get(gcrs)
        if g is None:
            continue
        base = ell_tokens(g[1])
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
                try:
                    kv[tk] = GE.angle_deg(val, uom, units) \
                        if tk in GE.ANGLES \
                        else GE.length_m(val, uom, units)
                except (ValueError, KeyError):
                    ok = False
        if not ok:
            continue
        if method == "9829" and "lat_0" not in kv:
            kv["lat_0"] = 90.0 if kv.get("lat_ts", 90.0) >= 0 else -90.0
        ax = sorted(axes.get(cs, []))
        if len(ax) < 2:
            continue
        ufac = units[ax[0][2]][1]
        if ufac is None or abs(ufac - 1.0) > 1e-15:
            continue  # IGNF projected CSs are metres
        parts = [f"+proj={name}"]
        for k in ("lat_0", "lon_0", "lonc", "lat_1", "lat_2", "lat_ts",
                  "alpha", "gamma", "k_0", "x_0", "y_0"):
            if k in kv:
                parts.append(
                    f"+{'k' if k == 'k_0' else k}={GE.fmt(kv[k])}")
        parts.extend(f"+{e}" for e in extras)
        parts.append(base)
        parts.append("+units=m")
        out[code] = " ".join(parts)
        if g[1][0] == "EPSG" and g[1][1] in epsg_geo_by_datum:
            geog_base[code] = epsg_geo_by_datum[g[1][1]]

    dst = Path(__file__).resolve().parent.parent / "proj_ray" / \
        "ignf_generated.py"
    with dst.open("w", encoding="utf-8") as f:
        f.write('"""GENERATED by tools/gen_ignf.py from the reference\'s\n'
                "ignf.sql (public IGN France registry). Do not edit by\n"
                'hand."""\n\n'
                "IGNF_GENERATED: dict[str, str] = {\n")
        for code in sorted(out):
            f.write(f"    {code!r}: {out[code]!r},\n")
        f.write("}\n\n")
        f.write("# IGNF code -> EPSG geographic-2D CRS sharing its "
                "datum (planner hub)\n"
                "IGNF_GEOG_BASE: dict[str, int] = {\n")
        for code in sorted(geog_base):
            f.write(f"    {code!r}: {geog_base[code]},\n")
        f.write("}\n")
    print(f"wrote {len(out)} codes ({len(geog_base)} with EPSG bases) "
          f"to {dst}")
    if skipped:
        print("skipped methods:", sorted(skipped.items(),
                                         key=lambda x: -x[1])[:10])


if __name__ == "__main__":
    main()
