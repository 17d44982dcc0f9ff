"""Command-line filters mirroring the reference apps (§3.1-3.3):

  python -m proj_ray.cli proj  +proj=utm +zone=31 +ellps=WGS84 [-I] [-d N]
  python -m proj_ray.cli cs2cs EPSG:4326 EPSG:25832 [-d N]
  python -m proj_ray.cli geod  +ellps=WGS84 [-I] [-d N]
  python -m proj_ray.cli gie   file.gie [...]

Unlike the reference's one-coordinate-at-a-time loops
(src/apps/proj.cpp:63, cs2cs.cpp:102), input lines are parsed in bulk
and transformed as one vectorized batch — the engine's batch-first
shape all the way to the terminal. DMS input (12d30'S) accepted via
dmstor-equivalent parsing; trailing line remainders are echoed like
the reference apps.
"""

from __future__ import annotations

import sys

import numpy as np


def _read_coords(stream):
    """Parse 'x y [z [t]] [rest]' lines in bulk; returns arrays + rest
    strings (DMS accepted)."""
    from proj_ray.params import dms_to_deg

    xs, ys, zs, ts, rests = [], [], [], [], []
    for line in stream:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        toks = line.split()
        vals = []
        rest = ""
        for i, tok in enumerate(toks[:4]):
            try:
                vals.append(dms_to_deg(tok))
            except ValueError:
                rest = " ".join(toks[i:])
                break
        else:
            rest = " ".join(toks[4:])
        if len(vals) < 2:
            continue
        xs.append(vals[0])
        ys.append(vals[1])
        zs.append(vals[2] if len(vals) > 2 else 0.0)
        ts.append(vals[3] if len(vals) > 3 else np.inf)
        rests.append(rest)
    return (np.array(xs), np.array(ys), np.array(zs), np.array(ts), rests)


def _print_coords(x, y, z, rests, decimals: int, angular: bool):
    fmt = f"%.{decimals}f"
    for i in range(len(x)):
        if not np.isfinite(x[i]) or not np.isfinite(y[i]):
            line = "*\t* *"
        else:
            xi, yi = (np.degrees(x[i]), np.degrees(y[i])) if angular \
                else (x[i], y[i])
            line = f"{fmt % xi}\t{fmt % yi} {fmt % z[i]}"
        if rests[i]:
            line += f" {rests[i]}"
        print(line)


def cmd_proj(args: list[str]) -> int:
    from proj_ray.factory import _resolve_crs_text, create_operation

    inverse = "-I" in args
    want_factors = "-S" in args
    decimals = 2
    if "-d" in args:
        decimals = int(args[args.index("-d") + 1])
    defn = " ".join(a for i, a in enumerate(args)
                    if a not in ("-I", "-d", "-S")
                    and (i == 0 or args[i - 1] != "-d"))
    if not defn.lstrip().startswith("+"):
        # authority CRS reference (proj EPSG:32620 -S)
        defn = _resolve_crs_text(defn.strip())
    # proj historically ignores datum specifiers (src/apps/proj.cpp:627)
    op = create_operation(defn + " +break_cs2cs_recursion")
    # GH-1782 app hack: ob_tran with an angular inner projection gets
    # PROJECTED output so +to_meter applies (src/apps/proj.cpp:653-658)
    from proj_ray.ops.base import UNITS_PROJECTED, UNITS_WHATEVER

    if getattr(op, "name", "") == "ob_tran" \
            and op.right == UNITS_WHATEVER:
        op.right = UNITS_PROJECTED
    x, y, z, t, rests = _read_coords(sys.stdin)
    if op.angular_input and not inverse or (op.angular_output and inverse):
        x = np.radians(x)
        y = np.radians(y)
    c = (x, y, z, t)
    rx, ry, rz, _ = op.inv(c) if inverse else op.fwd(c)
    angular = op.angular_input if inverse else op.angular_output
    if want_factors and not inverse:
        # scale-factor output like `proj -S` (src/apps/proj.cpp:123-191)
        from proj_ray.factors import factors

        fac = factors(op, x, y)
        # <h k s omega a b> like the reference (proj.cpp:186-191)
        rests = [(f"<{fac['meridional_scale'][i]:g} "
                  f"{fac['parallel_scale'][i]:g} "
                  f"{fac['areal_scale'][i]:g} "
                  f"{np.degrees(fac['angular_distortion'][i]):g} "
                  f"{fac['tissot_semimajor'][i]:g} "
                  f"{fac['tissot_semiminor'][i]:g}>"
                  + (f" {r}" if r else ""))
                 for i, r in enumerate(rests)]
    _print_coords(rx, ry, rz, rests, decimals, angular)
    return 0


def cmd_cs2cs(args: list[str]) -> int:
    from proj_ray.factory import create_crs_to_crs

    decimals = 4
    if "-d" in args:
        decimals = int(args[args.index("-d") + 1])
        args = [a for i, a in enumerate(args)
                if a != "-d" and (i == 0 or args[i - 1] != "-d")]
    only_best = no_ballpark = False
    accuracy = authority = area = None
    aoi_bbox = None
    kept = []
    skip_next = False
    for i, a in enumerate(args):
        if skip_next:
            skip_next = False
            continue
        if a in ("--only-best", "--only-best=yes"):
            only_best = True
        elif a == "--only-best=no":
            only_best = False
        elif a == "--no-ballpark":
            no_ballpark = True
        elif a in ("--accuracy", "--authority", "--area", "--bbox"):
            if i + 1 >= len(args):
                print(f"cs2cs: missing argument for {a}",
                      file=sys.stderr)
                return 1
            val = args[i + 1]
            skip_next = True
            try:
                if a == "--accuracy":
                    accuracy = float(val)
                elif a == "--authority":
                    authority = val
                elif a == "--area":
                    area = val
                else:
                    aoi_bbox = tuple(float(v) for v in val.split(","))
                    if len(aoi_bbox) != 4:
                        raise ValueError(val)
            except ValueError:
                print(f"cs2cs: invalid argument for {a}: {val!r}",
                      file=sys.stderr)
                return 1
        elif a.startswith("-W"):
            # -W<d>: output seconds precision, d in [0,8] (cs2cs.cpp);
            # this CLI prints decimal degrees, so it maps to decimals
            digits = a[2:]
            if not (len(digits) == 1 and digits.isdigit()
                    and int(digits) <= 8):
                print("-W argument missing or not in range [0,8]",
                      file=sys.stderr)
                return 1
            decimals = int(digits)
        else:
            kept.append(a)
    args = kept
    if not args:
        print("usage: cs2cs <src crs> [dst crs]", file=sys.stderr)
        return 2
    try:
        op = create_crs_to_crs(args[0],
                               args[1] if len(args) > 1 else None,
                               only_best=only_best,
                               no_ballpark=no_ballpark,
                               accuracy=accuracy,
                               authority=authority,
                               area=area, bbox=aoi_bbox)
    except (ValueError, NotImplementedError) as exc:
        print(f"cs2cs: cannot initialize transformation: {exc}",
              file=sys.stderr)
        return 3
    x, y, z, t, rests = _read_coords(sys.stdin)
    if op.angular_input:
        x = np.radians(x)
        y = np.radians(y)
    rx, ry, rz, _ = op.fwd((x, y, z, t))
    _print_coords(rx, ry, rz, rests, decimals, op.angular_output)
    return 0


def cmd_geod(args: list[str]) -> int:
    """Inverse problem on 'lat1 lon1 lat2 lon2' lines (like geod -I);
    prints azi1 azi2 s12. With -p (polygon), reads 'lat lon' vertices
    and prints perimeter + area (geod_polygon_*)."""
    from proj_ray.geodesic import Geodesic

    a = 6378137.0
    f = 1 / 298.257223563
    for tok in args:
        if tok.startswith("+a="):
            a = float(tok[3:])
        elif tok.startswith("+rf="):
            f = 1 / float(tok[4:])
    g = Geodesic(a, f)
    decimals = 3
    if "-d" in args:
        decimals = int(args[args.index("-d") + 1])
    if "-p" in args:
        x, y, _, _, _ = _read_coords(sys.stdin)
        per, area = g.polygon_area(x, y)  # lines are 'lat lon'
        print(f"{per:.{decimals}f} {area:.1f}")
        return 0
    lat1, lon1, lat2, lon2 = [], [], [], []
    from proj_ray.params import dms_to_deg

    for line in sys.stdin:
        toks = line.split()
        if len(toks) < 4:
            continue
        lat1.append(dms_to_deg(toks[0]))
        lon1.append(dms_to_deg(toks[1]))
        lat2.append(dms_to_deg(toks[2]))
        lon2.append(dms_to_deg(toks[3]))
    s, a1, a2 = g.inverse(np.array(lat1), np.array(lon1),
                          np.array(lat2), np.array(lon2))
    for i in range(len(s)):
        print(f"{a1[i]:.{decimals}f} {a2[i]:.{decimals}f} "
              f"{s[i]:.{decimals}f}")
    return 0


def cmd_gie(args: list[str]) -> int:
    from proj_ray.gie import run_gie_file

    total_ok = total_fail = 0
    for f in args:
        r = run_gie_file(f)
        total_ok += r.ok
        total_fail += r.fail
        print(f"{f}: {r.ok} ok, {r.fail} fail, {r.skip} skip, "
              f"{r.unsupported} unsupported")
        for msg in r.failures[:10]:
            print("  FAIL", msg[:200])
    return 1 if total_fail else 0


def cmd_projinfo(args: list[str]) -> int:
    """projinfo (reference src/apps/projinfo.cpp): EXACT-text output
    for EPSG-registered CRSs, -k object lookups and -s/-t operation
    search via proj_ray.projinfo_text (scoreboard:
    tools/replay_projinfo_yaml.py, 41/84 reference cases byte-exact);
    non-registry inputs (raw +proj strings, WKT) fall back to the
    semantic WKT2/PROJJSON emitters below."""
    from proj_ray.projinfo_text import run_projinfo

    try:
        out, code = run_projinfo(args)
        sys.stdout.write(out)
        return code
    except NotImplementedError:
        pass  # fall back to the semantic subset below
    import json as _json

    fmt = "WKT2:2019"
    rest = []
    i = 0
    while i < len(args):
        if args[i] == "-o" and i + 1 < len(args):
            fmt = args[i + 1]
            i += 2
            continue
        rest.append(args[i])
        i += 1
    if not rest:
        print("usage: projinfo [-o WKT2:2019|PROJJSON|PROJ] <crs>",
              file=sys.stderr)
        return 2
    spec = " ".join(rest)
    from proj_ray.factory import _resolve_crs_text

    defn = _resolve_crs_text(spec)
    up = fmt.upper()
    if up.startswith("PROJJSON"):
        from proj_ray.wkt_export import proj_to_projjson

        print(_json.dumps(proj_to_projjson(defn), indent=2))
    elif up.startswith("WKT2"):
        from proj_ray.wkt_export import proj_to_wkt2

        print(proj_to_wkt2(defn))
    elif up.startswith("WKT1"):
        from proj_ray.wkt_export import proj_to_wkt1

        print(proj_to_wkt1(defn))
    elif up == "PROJ":
        print(defn)
    else:
        print(f"unknown output format {fmt!r}", file=sys.stderr)
        return 2
    return 0


def cmd_projdb(args: list[str]) -> int:
    """Arbitrary read-only SQL over the bundled live proj.db — the
    registry-as-a-database surface the reference services through
    src/iso19111/factory.cpp (every lookup there is a SQL statement
    against proj.db). Output is sqlite3-CLI style: one row per line,
    columns pipe-separated, NULL empty. `projdb --structure` prints
    the schema the way factory.cpp's getDatabaseStructure does."""
    from proj_ray import projdb

    if not args:
        print("usage: projdb [--structure | SQL...]", file=sys.stderr)
        return 2
    if args[0] == "--structure":
        for stmt in projdb.database_structure():
            print(stmt)
        return 0
    sql = " ".join(args)
    try:
        _, rows = projdb.query(sql)
    except FileNotFoundError as exc:
        print(str(exc), file=sys.stderr)
        return 2
    except Exception as exc:  # sqlite errors -> CLI diagnostics
        print(f"SQL error: {exc}", file=sys.stderr)
        return 1
    for row in rows:
        print("|".join("" if v is None else str(v) for v in row))
    return 0


def cmd_cct(args: list[str]) -> int:
    """cct subset (reference src/apps/cct.cpp): 4D filter applying a
    coordinate operation given as +proj tokens, an EPSG operation code
    (EPSG:8366), an operation name ('ITRF2014 to ETRF2014 (1)'), a
    @file containing COORDINATEOPERATION WKT, or inline WKT. Options:
    -d N decimals, -z Z / -t T fixed 3rd/4th coordinate. Remaining args
    are input files (default stdin). Output format mirrors cct.cpp:536-
    545: %14.*f angles (10 dec default) / %13.*f distances (4 dec),
    z %12.*f, t %12.4f; missing input columns print as inf."""
    import math

    from proj_ray.factory import create_operation

    dec_ang, dec_dist = 10, 4
    fixed_z = fixed_t = math.inf
    rest: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a in ("-d", "--decimals") and i + 1 < len(args):
            dec_ang = dec_dist = int(args[i + 1])
            i += 2
        elif a in ("-z", "--height") and i + 1 < len(args):
            fixed_z = float(args[i + 1])
            i += 2
        elif a in ("-t", "--time") and i + 1 < len(args):
            fixed_t = float(args[i + 1])
            i += 2
        elif a == "-I":
            rest.append(a)
            i += 1
        else:
            rest.append(a)
            i += 1
    inverse = "-I" in rest
    rest = [a for a in rest if a != "-I"]

    defn_toks = []
    while rest and rest[0].startswith("+"):
        defn_toks.append(rest.pop(0))
    if defn_toks:
        defn = " ".join(defn_toks)
    elif rest:
        ref = rest.pop(0)
        if ref.startswith("@"):
            try:
                ref = open(ref[1:], encoding="utf-8").read()
            except OSError:
                print(f"Cannot open file {ref[1:]}", file=sys.stderr)
                return 1
        from proj_ray.wkt import looks_like_wkt

        if ref.lstrip().upper().startswith("COORDINATEOPERATION"):
            from proj_ray.wkt import coordinate_operation_to_proj

            defn = coordinate_operation_to_proj(ref)
        elif looks_like_wkt(ref):
            print("cct: Input object is not a coordinate operation, "
                  "but a CRS.", file=sys.stderr)
            return 1
        else:
            from proj_ray.epsg import resolve_operation

            defn = resolve_operation(ref)
    else:
        print("cct: no operation given", file=sys.stderr)
        return 2

    try:
        op = create_operation(defn)
    except Exception as exc:  # noqa: BLE001
        print(f"cct: {exc}", file=sys.stderr)
        return 1

    # read input records (files or stdin), one 2-4 column line each
    def lines():
        if rest:
            for fname in rest:
                try:
                    fh = open(fname, encoding="utf-8-sig")
                except OSError:
                    print(f"Cannot open file {fname}", file=sys.stderr)
                    raise SystemExit(1) from None
                yield from fh
                fh.close()
        else:
            # skip a UTF-8 BOM on the first stdin line too
            first = True
            for ln in sys.stdin:
                if first and ln.startswith("﻿"):
                    ln = ln.lstrip("﻿")
                first = False
                yield ln

    out_lines = []
    for raw in lines():
        s = raw.strip()
        if not s or s.startswith("#"):
            out_lines.append(raw.rstrip("\n"))
            continue
        toks = s.split()
        try:
            vals = [float(t) for t in toks[:4]]
        except ValueError:
            out_lines.append(f"# Record UNREADABLE: {s}")
            continue
        if len(vals) < 2:
            out_lines.append(f"# Record UNREADABLE: {s}")
            continue
        x, y = vals[0], vals[1]
        z = fixed_z if math.isfinite(fixed_z) else (
            vals[2] if len(vals) > 2 else math.inf)
        t = fixed_t if math.isfinite(fixed_t) else (
            vals[3] if len(vals) > 3 else math.inf)
        ang_in = (op.right if inverse else op.left) == "radians"
        if ang_in:
            x, y = math.radians(x), math.radians(y)
        try:
            c = (op.inv if inverse else op.fwd)((x, y, z, t))
            rx, ry, rz, rt = (float(np.asarray(v).reshape(-1)[0])
                              for v in c)
        except Exception:  # noqa: BLE001
            out_lines.append(f"# Record TRANSFORMATION ERROR: {s}")
            continue
        out_unit = op.left if inverse else op.right
        if out_unit == "radians":
            rx, ry = math.degrees(rx), math.degrees(ry)
        if out_unit in ("radians", "degrees"):
            out_lines.append(f"{rx:14.{dec_ang}f}  {ry:14.{dec_ang}f}  "
                             f"{rz:12.{dec_dist}f}  {rt:12.4f}")
        else:
            out_lines.append(f"{rx:13.{dec_dist}f}  {ry:13.{dec_dist}f}  "
                             f"{rz:12.{dec_dist}f}  {rt:12.4f}")
    print("\n".join(out_lines))
    return 0


def cmd_projsync(args: list[str]) -> int:
    """projsync (reference src/apps/projsync.cpp): sync grid files from
    a CDN endpoint (or local mirror directory) per the manifest
    `files.geojson`, with the reference's filter options."""
    from proj_ray.sources.netgrids import projsync

    kw: dict = {}
    i = 0
    try:
        while i < len(args):
            a = args[i]
            if a == "--endpoint":
                i += 1
                kw["endpoint"] = args[i]
            elif a == "--target-dir":
                i += 1
                kw["target_dir"] = args[i]
            elif a == "--user-writable-directory":
                pass  # the default target
            elif a == "--local-geojson-file":
                i += 1
                kw["local_geojson_file"] = args[i]
            elif a == "--bbox":
                i += 1
                parts = args[i].split(",")
                if len(parts) != 4:
                    print(f"Incorrect number of values for option "
                          f"--bbox: {args[i]}", file=sys.stderr)
                    return 2
                kw["bbox"] = tuple(float(x) for x in parts)
            elif a == "--spatial-test":
                i += 1
                if args[i] not in ("contains", "intersects"):
                    print(f"Unrecognized value for option --spatial-test: "
                          f"{args[i]}", file=sys.stderr)
                    return 2
                kw["spatial_test"] = args[i]
            elif a == "--source-id":
                i += 1
                kw["source_id"] = args[i]
            elif a == "--area-of-use":
                i += 1
                kw["area_of_use"] = args[i]
            elif a == "--file":
                i += 1
                kw["file"] = args[i]
            elif a == "--all":
                kw["all_files"] = True
            elif a == "--exclude-world-coverage":
                kw["exclude_world_coverage"] = True
            elif a == "--list-files":
                kw["list_files"] = True
            elif a == "--dry-run":
                kw["dry_run"] = True
            elif a in ("-q", "--quiet"):
                kw["quiet"] = True
            elif a == "--verbose":
                pass
            else:
                print(f"Unrecognized option: {a}", file=sys.stderr)
                return 2
            i += 1
    except IndexError:
        print(f"Missing value for option {args[-1]}", file=sys.stderr)
        return 2
    try:
        projsync(**kw)
    except ValueError as exc:
        print(str(exc), file=sys.stderr)
        return 2
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2
    cmd, rest = argv[0], argv[1:]
    if cmd == "proj":
        return cmd_proj(rest)
    if cmd == "invproj":  # reference alias: proj with -I implied
        return cmd_proj(["-I"] + rest)
    if cmd == "cs2cs":
        return cmd_cs2cs(rest)
    if cmd == "geod":
        return cmd_geod(rest)
    if cmd == "gie":
        return cmd_gie(rest)
    if cmd == "projinfo":
        return cmd_projinfo(rest)
    if cmd == "cct":
        return cmd_cct(rest)
    if cmd == "projdb":
        return cmd_projdb(rest)
    if cmd == "projsync":
        return cmd_projsync(rest)
    print(f"unknown command {cmd!r}; one of: proj cs2cs geod gie "
          "projinfo cct projdb projsync", file=sys.stderr)
    return 2


if __name__ == "__main__":
    try:
        code = main()
        sys.stdout.flush()
    except BrokenPipeError:
        code = 0  # downstream pipe (e.g. `| head`) closed early
    raise SystemExit(code)
