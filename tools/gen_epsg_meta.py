"""Generate EPSG *naming/metadata* tables for exact projinfo-style WKT
output, from the reference's public EPSG SQL distribution
(/root/reference/data/sql/) — the same legitimate build step as
tools/gen_epsg.py (which generates the definition registry).

Emits proj_ray/epsg_meta.py with:
  UOM        code -> (name, type, factor_to_base)
  ELLIPSOID  code -> (name, a, inv_f | None, b | None)
  PM         code -> (name, raw_value, uom_code)
  DATUM      code -> (name, ellps_code, pm_code, ensemble_accuracy|None)
  ENSEMBLE_MEMBERS  code -> [member datum codes in position order]
  GEOG       code -> (name, kind, cs_code, datum_code, deprecated)
  PROJCRS    code -> (name, cs_code, base_geod_code, conv_code,
                      deprecated)
  CONV       code -> (name, method_code, method_name,
                      ((param_code, name, value, uom_code), ...))
  CS         code -> (type, ((axis_name, abbrev, orientation,
                              uom_code), ...))
  EXTENT     code -> (name_description, south, north, west, east)
  SCOPE      code -> text
  USAGE      (table, code) -> ((extent_code, scope_code), ...)
  VERT       code -> (name, cs_code, datum_code, deprecated)
  VDATUM     code -> (name,)

Usage: python tools/gen_epsg_meta.py
"""

from __future__ import annotations

from pathlib import Path

from gen_epsg import SQL, _num, rows  # noqa: F401 (shared helpers)


def opt(x: str):
    return None if x in ("NULL", "") else x


def rows_multiline(fname: str, table: str):
    """Yield tuples from INSERT statements that may span lines, strip
    `-- comment` tails, and fold SQL `||` string concatenation (the
    hand-written *_custom.sql files use all three)."""
    import re

    from gen_epsg import _split_tuple

    text = (SQL / fname).read_text(encoding="utf-8")
    # strip -- comments (never inside quotes in these files' tails)
    lines = []
    for ln in text.split("\n"):
        if "--" in ln:
            # only strip when the -- is outside quotes
            qcount = ln.split("--")[0].count("'")
            if qcount % 2 == 0:
                ln = ln.split("--")[0]
        lines.append(ln)
    text = "\n".join(lines)
    pat = re.compile(
        rf'INSERT INTO "?{table}"? VALUES\s*\((.*?)\);', re.S)
    for m in pat.finditer(text):
        body = " ".join(m.group(1).split("\n"))
        body = re.sub(r"'\s*\|\|\s*'", "", body)  # 'a' || 'b' -> 'ab'
        yield _split_tuple(" ".join(body.split()))


def rows_multirow(fname: str, table: str):
    """Like rows_multiline but also handles optional column lists and
    multi-row `VALUES (...), (...)` statements (nkg.sql)."""
    import re

    from gen_epsg import _split_tuple

    text = (SQL / fname).read_text(encoding="utf-8")
    lines = []
    for ln in text.split("\n"):
        if "--" in ln and ln.split("--")[0].count("'") % 2 == 0:
            ln = ln.split("--")[0]
        lines.append(ln)
    text = "\n".join(lines)
    pat = re.compile(
        rf'INSERT INTO "?{table}"?\s*(?:\([^)]*\)\s*)?VALUES', re.S)
    for m in pat.finditer(text):
        # scan from the VALUES keyword to the statement-terminating ';'
        # (quotes may contain ';' and ')'), yielding each top-level
        # parenthesized row group
        i = m.end()
        depth = 0
        start = None
        in_q = False
        while i < len(text):
            ch = text[i]
            if in_q:
                if ch == "'":
                    if i + 1 < len(text) and text[i + 1] == "'":
                        i += 1
                    else:
                        in_q = False
            elif ch == "'":
                in_q = True
            elif ch == "(":
                if depth == 0:
                    start = i + 1
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and start is not None:
                    body = " ".join(text[start:i].split())
                    body = re.sub(r"'\s*\|\|\s*'", "", body)
                    yield _split_tuple(body)
                    start = None
            elif ch == ";" and depth == 0:
                break
            i += 1


def main() -> None:
    uom = {}
    for r in rows("unit_of_measure.sql", "unit_of_measure"):
        if r[0] != "EPSG":
            continue
        uom[int(r[1])] = (r[2], r[3], _num(r[4]))

    ell = {}
    for r in rows("ellipsoid.sql", "ellipsoid"):
        if r[0] != "EPSG" or r[-1] == "1":
            continue
        # auth, code, name, desc, body_auth, body, a, uom_a, uom_c,
        # inv_f, b, deprecated
        a = _num(r[6])
        inv_f = _num(r[9])
        b = _num(r[10])
        ell[int(r[1])] = (r[2], a, inv_f, b)

    pm = {}
    for r in rows("prime_meridian.sql", "prime_meridian"):
        if r[0] != "EPSG" or r[-1] == "1":
            continue
        pm[int(r[1])] = (r[2], _num(r[3]), int(r[5]))

    datum = {}
    for r in rows("geodetic_datum.sql", "geodetic_datum"):
        if r[0] != "EPSG" or r[-1] == "1":
            continue
        # auth, code, name, desc, ell_auth, ell, pm_auth, pm,
        # pub_date, frame_epoch, ensemble_accuracy, anchor,
        # anchor_epoch, deprecated
        datum[int(r[1])] = (r[2], int(r[5]), int(r[7]), opt(r[10]))

    members: dict[int, list[int]] = {}
    for r in rows("geodetic_datum_ensemble_member.sql",
                  "geodetic_datum_ensemble_member"):
        members.setdefault(int(r[1]), []).append((int(r[4]), int(r[3])
                                                  if False else int(r[3])))
    # rows: (ens_auth, ens_code, mem_auth, mem_code, position)
    members = {}
    for r in rows("geodetic_datum_ensemble_member.sql",
                  "geodetic_datum_ensemble_member"):
        members.setdefault(int(r[1]), []).append((int(r[4]), int(r[3])))
    ens_members = {k: [c for _, c in sorted(v)]
                   for k, v in members.items()}

    geog = {}
    for r in rows("geodetic_crs.sql", "geodetic_crs"):
        if r[0] != "EPSG":
            continue
        # auth, code, name, desc, type, cs_auth, cs, datum_auth,
        # datum, text_def, deprecated
        if opt(r[8]) is None:
            continue
        geog[int(r[1])] = (r[2], r[4], int(r[6]), int(r[8]),
                           int(r[10] or 0))

    projcrs = {}
    for r in rows("projected_crs.sql", "projected_crs"):
        if r[0] != "EPSG":
            continue
        # auth, code, name, desc, cs_auth, cs, geod_auth, geod,
        # conv_auth, conv, text_def, deprecated
        if opt(r[7]) is None or opt(r[9]) is None:
            continue
        projcrs[int(r[1])] = (r[2], int(r[5]), int(r[7]), int(r[9]),
                              int(r[10] if r[10] in ("0", "1")
                                  else r[11] or 0))

    conv = {}
    for r in rows("conversion.sql", "conversion"):
        if r[0] != "EPSG" or r[-1] == "1":
            continue
        params = []
        # 7 parameter slots of 6 fields each, starting at index 7
        for k in range(7):
            base = 7 + k * 6
            if base + 5 >= len(r) - 1 or opt(r[base + 1]) is None:
                continue
            params.append((int(r[base + 1]), r[base + 2],
                           _num(r[base + 3]), int(r[base + 5])))
        conv[int(r[1])] = (r[2], int(r[5]), r[6], tuple(params))

    cs_type = {}
    for r in rows("coordinate_system.sql", "coordinate_system"):
        if r[0] != "EPSG":
            continue
        cs_type[int(r[1])] = r[2]
    axes: dict[int, list] = {}
    for r in rows("axis.sql", "axis"):
        # auth, code, name, abbrev, orientation, cs_auth, cs, order,
        # uom_auth, uom
        if r[0] != "EPSG":
            continue
        axes.setdefault(int(r[6]), []).append(
            (int(r[7]), (r[2], r[3], r[4],
                         int(r[9]) if opt(r[9]) else None)))
    cs = {c: (cs_type.get(c, "Cartesian"),
              tuple(a for _, a in sorted(v)))
          for c, v in axes.items()}

    extent = {}
    extent_name = {}
    for r in rows("extent.sql", "extent"):
        if r[0] != "EPSG":
            continue
        extent[int(r[1])] = (r[3], _num(r[4]), _num(r[5]),
                             _num(r[6]), _num(r[7]))
        extent_name[int(r[1])] = r[2]

    scope = {}
    for r in rows("scope.sql", "scope"):
        if r[0] != "EPSG":
            continue
        scope[int(r[1])] = r[2]

    usage: dict[tuple, list] = {}
    for fname in ("geodetic_crs.sql", "projected_crs.sql",
                  "geodetic_datum.sql", "vertical_crs.sql",
                  "compound_crs.sql", "helmert_transformation.sql",
                  "grid_transformation.sql", "conversion.sql",
                  "other_transformation.sql",
                  "grid_transformation_custom.sql",
                  "other_transformation_custom.sql",
                  "concatenated_operation.sql", "vertical_datum.sql"):
        try:
            for r in rows(fname, "usage"):
                # auth, code, obj_table, obj_auth, obj_code,
                # ext_auth, ext_code, scope_auth, scope_code
                if r[3] != "EPSG" or r[5] != "EPSG" or r[7] != "EPSG":
                    continue
                usage.setdefault((r[2], int(r[4])), []).append(
                    (int(r[6]), int(r[8])))
        except FileNotFoundError:
            continue

    vert = {}
    for r in rows("vertical_crs.sql", "vertical_crs"):
        # auth, code, name, desc, cs_auth, cs, datum_auth, datum,
        # deprecated
        if r[0] != "EPSG" or opt(r[7]) is None:
            continue
        vert[int(r[1])] = (r[2], int(r[5]), int(r[7]), int(r[8] or 0))
    vdatum = {}
    for r in rows("vertical_datum.sql", "vertical_datum"):
        if r[0] != "EPSG" or r[-1] == "1":
            continue
        # auth, code, name, desc, pub_date, frame_epoch, ...
        vdatum[int(r[1])] = (r[2], _num(r[5]) if opt(r[5]) else None)

    # transformation-op naming: code -> (name, kind); the extent/scope
    # ride the shared USAGE table (parsed below from the same files)
    op_meta: dict[int, tuple] = {}
    for fname, table, kind in (
            ("helmert_transformation.sql", "helmert_transformation",
             "helmert"),
            ("grid_transformation.sql", "grid_transformation", "grid"),
            ("grid_transformation_custom.sql", "grid_transformation",
             "grid"),
            ("other_transformation.sql", "other_transformation",
             "other"),
            ("other_transformation_custom.sql", "other_transformation",
             "other"),
            ("concatenated_operation.sql", "concatenated_operation",
             "concat")):
        try:
            for r in rows(fname, table):
                if r[0] != "EPSG":
                    continue
                try:
                    code = int(r[1])
                except ValueError:
                    continue
                op_meta.setdefault(code, (r[2], kind, opt(r[3]) or ""))
        except FileNotFoundError:
            continue
    # accuracy as the DB's VERBATIM string (projinfo prints '1.0 m' vs
    # '5 m' exactly as stored), with customizations.sql UPDATEs applied
    op_acc: dict[int, str] = {}
    for fname, table in (
            ("helmert_transformation.sql", "helmert_transformation"),
            ("grid_transformation.sql", "grid_transformation"),
            ("grid_transformation_custom.sql", "grid_transformation"),
            ("other_transformation.sql", "other_transformation"),
            ("concatenated_operation.sql", "concatenated_operation")):
        try:
            for r in rows(fname, table):
                if r[0] != "EPSG":
                    continue
                idx = 8 if table == "concatenated_operation" else 11
                if idx < len(r) and r[idx] not in ("NULL", ""):
                    try:
                        float(r[idx])
                    except ValueError:
                        continue
                    try:
                        op_acc[int(r[1])] = r[idx]
                    except ValueError:
                        continue
        except FileNotFoundError:
            continue
    import re as _re2

    upd = _re2.compile(
        r"UPDATE (?:grid|helmert|other)_transformation SET accuracy = "
        r"([0-9.]+) WHERE auth_name = 'EPSG' AND code = '(\d+)';")
    for line in (SQL / "customizations.sql").open(encoding="utf-8"):
        m = upd.match(line.strip())
        if m:
            op_acc[int(m.group(2))] = m.group(1)

    # full helmert-op table (incl. geocentric pairs and time-dependent
    # rates) for projinfo's operation rendering; raw values + uom codes
    helm_ops: dict[int, dict] = {}
    for r in rows("helmert_transformation.sql",
                  "helmert_transformation"):
        if r[0] != "EPSG" or r[-1] == "1":
            continue
        if r[7] != "EPSG" or r[9] != "EPSG":
            continue
        try:
            code = int(r[1])
        except ValueError:
            continue
        d = {"src": int(r[8]), "dst": int(r[10]), "method": int(r[5]),
             "t": (_num(r[12]), _num(r[13]), _num(r[14])),
             "tu": int(r[16])}
        if opt(r[17]) is not None:
            d["r"] = (_num(r[17]), _num(r[18]), _num(r[19]))
            d["ru"] = int(r[21])
        if opt(r[22]) is not None:
            d["s"] = _num(r[22])
            d["su"] = int(r[24])
        if opt(r[25]) is not None:
            d["dt"] = (_num(r[25]), _num(r[26]), _num(r[27]))
            d["dtu"] = int(r[29])
            d["dr"] = (_num(r[30]), _num(r[31]), _num(r[32]))
            d["dru"] = int(r[34])
            d["ds"] = _num(r[35])
            d["dsu"] = int(r[37])
            d["epoch"] = _num(r[38])
        helm_ops[code] = d

    superseded_by: dict[int, list] = {}
    for r in rows("supersession.sql", "supersession"):
        # table, auth, code, table2, auth2, replacement, source, same?
        if r[1] != "EPSG" or r[4] != "EPSG":
            continue
        try:
            superseded_by.setdefault(int(r[2]), []).append(int(r[5]))
        except ValueError:
            continue

    grid_alt = {}
    import re as _re3

    alt_pat = _re3.compile(r"^\('([^']+)','([^']+)',")
    for line in (SQL / "grid_alternatives.sql").open(encoding="utf-8"):
        m = alt_pat.match(line.strip())
        if m:
            grid_alt[m.group(1)] = m.group(2)
    noaa = (SQL / "grid_alternatives_generated_noaa.sql"
            ).read_text(encoding="utf-8")
    for m in _re3.finditer(r"VALUES\s*\('([^']+)',\s*'([^']+)'", noaa):
        grid_alt[m.group(1)] = m.group(2)
    grid_ops: dict[int, tuple] = {}
    for fname in ("grid_transformation.sql",
                  "grid_transformation_custom.sql"):
        try:
            it = rows(fname, "grid_transformation")
        except FileNotFoundError:
            continue
        for r in it:
            if r[0] != "EPSG" or r[-1] == "1":
                continue
            if r[7] != "EPSG" or r[9] != "EPSG":
                continue
            try:
                code = int(r[1])
                src, dst = int(r[8]), int(r[10])
            except ValueError:
                continue
            origs = [v for v in (r[15], r[19] if len(r) > 19 else "")
                     if v not in ("NULL", "")]
            mapped = []
            for g in origs:
                alt = grid_alt.get(g, g)
                if alt not in mapped:  # lat+lon pair -> one GTiff
                    mapped.append(alt)
            version = r[22] if len(r) > 23 and r[22] not in \
                ("NULL", "") else None
            grid_ops[code] = (src, dst, int(r[5]), r[6], version,
                              tuple(origs), tuple(mapped))

    # other_transformation ops with a file parameter (tinshift etc.)
    other_ops: dict[int, tuple] = {}
    for fname in ("other_transformation.sql",
                  "other_transformation_custom.sql"):
        try:
            it = rows(fname, "other_transformation")
        except FileNotFoundError:
            continue
        for r in it:
            if r[0] != "EPSG" or r[-1] == "1":
                continue
            if r[7] != "EPSG" or r[9] != "EPSG":
                continue
            try:
                code = int(r[1])
                method = int(r[5])
            except ValueError:
                continue
            fileval = r[15] if len(r) > 15 else ""
            if not fileval or fileval == "NULL":
                continue
            other_ops[code] = (int(r[8]), int(r[10]), method,
                               grid_alt.get(fileval, fileval))

    concat: dict[int, tuple] = {}
    steps: dict[int, list] = {}
    for r in rows("concatenated_operation_step.sql",
                  "concatenated_operation_step"):
        # auth, code, step_number, step_auth, step_code[, direction?]
        if r[0] != "EPSG" or r[3] != "EPSG":
            continue
        steps.setdefault(int(r[1]), []).append((int(r[2]), int(r[4])))
    concat_deprecated: set[int] = set()
    for r in rows("concatenated_operation.sql",
                  "concatenated_operation"):
        # auth, code, name, desc, src_auth, src, dst_auth, dst,
        # accuracy?, scope-ish, deprecated
        if r[0] != "EPSG" or r[4] != "EPSG" or r[6] != "EPSG":
            continue
        st = [c for _, c in sorted(steps.get(int(r[1]), []))]
        if st:
            concat[int(r[1])] = (r[2], int(r[5]), int(r[7]), tuple(st))
            if r[-1] == "1":
                concat_deprecated.add(int(r[1]))

    alias: dict[tuple, int] = {}
    for r in rows("alias_name.sql", "alias_name"):
        # table, auth, code, alias, source
        if r[1] != "EPSG":
            continue
        try:
            alias[(r[0], r[3].casefold())] = int(r[2])
        except ValueError:
            continue

    depr: dict[tuple, list] = {}
    for r in rows("deprecation.sql", "deprecation"):
        # table, auth, code, repl_auth, repl_code, source
        if r[1] != "EPSG" or r[3] != "EPSG":
            continue
        depr.setdefault((r[0], int(r[2])), []).append(int(r[4]))

    esri: dict[tuple, str] = {}
    import re as _re

    pat = _re.compile(
        r"INSERT INTO alias_name VALUES\('([a-z_]+)','EPSG','(\d+)',"
        r"'([^']*)','ESRI'\);")
    for line in (SQL / "esri.sql").open(encoding="utf-8"):
        m = pat.match(line.strip())
        if m:
            esri[(m.group(1), int(m.group(2)))] = m.group(3)

    # PROJ-authority custom operations (hand-written *_custom.sql):
    # geoid grid ops, PROJString (tinshift) ops, and concatenations.
    proj_ops: dict[str, dict] = {}
    for r in rows_multiline("grid_transformation_custom.sql",
                            "grid_transformation"):
        if r[0] != "PROJ" or r[-1] == "1":
            continue
        grid = r[15]
        proj_ops[r[1]] = {
            "kind": "grid", "name": r[2], "method": int(r[5]),
            "method_name": r[6], "src": int(r[8]), "dst": int(r[10]),
            "acc": opt(r[11]), "grids": (grid,),
            "mapped": (grid_alt.get(grid, grid),)}
    for r in rows_multiline("other_transformation_custom.sql",
                            "other_transformation"):
        if r[0] != "PROJ" or r[-1] == "1":
            continue
        interp = None
        if len(r) >= 4 and r[-4] == "EPSG" and r[-3].isdigit():
            interp = int(r[-3])  # interpolation CRS column
        proj_ops[r[1]] = {
            "kind": "projstring", "name": r[2], "src": int(r[8]),
            "dst": int(r[10]), "acc": opt(r[11]), "projstring": r[6],
            "interp": interp}
    concat_steps_custom: dict[str, list] = {}
    for r in rows_multiline("other_transformation_custom.sql",
                            "concatenated_operation_step"):
        if r[0] != "PROJ":
            continue
        step = (r[3], r[4] if r[3] != "EPSG" else int(r[4]))
        concat_steps_custom.setdefault(r[1], []).append(
            (int(r[2]), step))
    for r in rows_multiline("other_transformation_custom.sql",
                            "concatenated_operation"):
        if r[0] != "PROJ" or r[-1] == "1":
            continue
        st = [s for _, s in sorted(concat_steps_custom.get(r[1], []))]
        proj_ops[r[1]] = {
            "kind": "concat", "name": r[2], "src": int(r[5]),
            "dst": int(r[7]), "acc": opt(r[8]), "steps": tuple(st)}
    # usage rows for PROJ-authority objects (keyed by string code)
    for fname in ("grid_transformation_custom.sql",
                  "other_transformation_custom.sql"):
        for r in rows_multiline(fname, "usage"):
            if r[3] != "PROJ" or r[5] != "EPSG" or r[7] != "EPSG":
                continue
            usage.setdefault((r[2], r[4]), []).append(
                (int(r[6]), int(r[8])))

    # NKG-authority concatenated operations (nkg.sql): candidates for
    # geocentric ITRF->ETRS89(country) queries. Multi-row VALUES
    # statements with column lists.
    nkg_ops: dict[str, dict] = {}
    for r in rows_multirow("nkg.sql", "concatenated_operation"):
        if r[0] != "NKG" or r[-1] == "1":
            continue
        if r[4] != "EPSG" or r[6] != "EPSG":
            continue
        nkg_ops[r[1]] = {"kind": "concat", "name": r[2],
                         "src": int(r[5]), "dst": int(r[7]),
                         "acc": opt(r[8])}
    for r in rows_multirow("nkg.sql", "usage"):
        if r[3] != "NKG" or r[5] != "EPSG":
            continue
        usage.setdefault((r[2], r[4]), []).append((int(r[6]), -1))
    for r in rows_multirow("nkg.sql", "supersession"):
        # table, auth, code, table2, auth2, replacement, source, same
        if r[1] != "NKG" or r[4] != "NKG":
            continue
        superseded_by.setdefault(r[2], []).append(r[5])

    dst = Path(__file__).resolve().parent.parent / "proj_ray" / \
        "epsg_meta.py"
    with dst.open("w", encoding="utf-8") as f:
        f.write('"""EPSG naming/usage metadata for exact WKT output.\n'
                "\nAUTO-GENERATED by tools/gen_epsg_meta.py from the\n"
                "reference's public EPSG SQL distribution. Do not "
                'edit."""\n\n')
        for name, obj in (("UOM", uom), ("ELLIPSOID", ell), ("PM", pm),
                          ("DATUM", datum),
                          ("ENSEMBLE_MEMBERS", ens_members),
                          ("GEOG", geog), ("PROJCRS", projcrs),
                          ("CONV", conv), ("CS", cs),
                          ("EXTENT", extent), ("SCOPE", scope),
                          ("USAGE", {k: tuple(v)
                                     for k, v in usage.items()}),
                          ("VERT", vert), ("VDATUM", vdatum),
                          ("ESRI_ALIAS", esri),
                          ("DEPRECATION", depr), ("ALIAS", alias),
                          ("CONCAT_OPS", concat),
                          ("OP_META", op_meta), ("OP_ACC", op_acc),
                          ("EXTENT_NAME", extent_name),
                          ("GRID_OPS", grid_ops),
                          ("HELMERT_OPS", helm_ops),
                          ("SUPERSEDED_BY", superseded_by),
                          ("OTHER_OPS", other_ops),
                          ("PROJ_OPS", proj_ops),
                          ("NKG_OPS", nkg_ops),
                          ("CONCAT_DEPRECATED",
                           {c: 1 for c in sorted(concat_deprecated)})):
            f.write(f"{name} = {{\n")
            for k in sorted(obj, key=lambda x: (str(type(x)), repr(x))):
                f.write(f"    {k!r}: {obj[k]!r},\n")
            f.write("}\n\n")
    print(f"wrote {dst}: " + ", ".join(
        f"{n}={len(o)}" for n, o in (
            ("uom", uom), ("ell", ell), ("datum", datum),
            ("ens", ens_members), ("geog", geog), ("proj", projcrs),
            ("conv", conv), ("cs", cs), ("extent", extent),
            ("usage", usage), ("vert", vert))))


if __name__ == "__main__":
    main()
