"""Generate proj_ray/nkg_generated.py from the reference's public NKG
SQL registration (reference data/sql/nkg.sql) — the Nordic Geodetic
Commission transformation registry (helmert / PROJ-string deformation
steps composed into concatenated operations).

Usage: python tools/gen_nkg.py [path-to-nkg.sql]
"""

from __future__ import annotations

import os
import re
import sys


def tokenize_values(s: str) -> list:
    """Split one SQL VALUES(...) body into python scalars."""
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c in " \t\r\n,":
            i += 1
            continue
        if c == "'":
            j = i + 1
            buf = []
            while j < n:
                if s[j] == "'" and j + 1 < n and s[j + 1] == "'":
                    buf.append("'")
                    j += 2
                    continue
                if s[j] == "'":
                    break
                buf.append(s[j])
                j += 1
            out.append("".join(buf))
            i = j + 1
            continue
        m = re.match(r"[-+0-9.eE]+", s[i:])
        if m:
            tok = m.group(0)
            out.append(float(tok) if any(ch in tok for ch in ".eE")
                       else int(tok))
            i += len(tok)
            continue
        m = re.match(r"NULL", s[i:], re.I)
        if m:
            out.append(None)
            i += 4
            continue
        raise ValueError(f"cannot tokenize at: {s[i:i+40]!r}")
    return out


def split_tuples(s: str) -> list[str]:
    """Split 'VALUES (a),(b),(c)' bodies into the (...) groups."""
    groups = []
    depth = 0
    start = None
    in_q = False
    for i, c in enumerate(s):
        if c == "'":
            in_q = not in_q
        if in_q:
            continue
        if c == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                groups.append(s[start:i])
    return groups


def parse(sql: str):
    helmert = {}
    projstring = {}
    concat = {}
    steps: dict[str, list[tuple[int, str, str]]] = {}
    # strip comments
    sql = re.sub(r"--[^\n]*", "", sql)
    stmts = [s.strip() for s in sql.split(";") if s.strip()]
    for st in stmts:
        m = re.match(r'INSERT INTO "(\w+)"\s*(\([^)]*\))?\s*VALUES\s*(.*)',
                     st, re.S | re.I)
        if not m:
            continue
        table = m.group(1)
        body = m.group(3)
        for grp in split_tuples("(" + body if not body.lstrip().
                                startswith("(") else body):
            v = tokenize_values(grp)
            if table == "helmert_transformation":
                # positional EPSG schema (see proj_db_table_defs.sql):
                # auth, code, name, desc, method(a,c,name),
                # source(a,c), target(a,c), accuracy,
                # tx, ty, tz, unit(a,c), rx, ry, rz, unit(a,c),
                # s, unit(a,c), [rates/pivot NULLs...], version, depr
                if v[0] != "NKG":
                    continue
                assert v[4] == "EPSG" and v[5] == "1033", v[:6]
                assert (v[15], v[16]) == ("EPSG", "9001")
                assert (v[20], v[21]) == ("EPSG", "9104")
                assert (v[23], v[24]) == ("EPSG", "9202")
                helmert[v[1]] = {
                    "name": v[2],
                    "src": (v[7], str(v[8])), "tgt": (v[9], str(v[10])),
                    "t": (v[12], v[13], v[14]),
                    "r": (v[17], v[18], v[19]),
                    "s": v[22], "conv": "position_vector",
                }
            elif table == "other_transformation":
                if v[0] != "NKG":
                    continue
                assert v[4] == "PROJ" and v[5] == "PROJString", v[:7]
                projstring[v[1]] = {
                    "name": v[2],
                    "defn": v[6],
                    "src": (v[7], str(v[8])), "tgt": (v[9], str(v[10])),
                }
            elif table == "concatenated_operation":
                if v[0] != "NKG":
                    continue
                concat[v[1]] = {
                    "name": v[2],
                    "src": (v[4], str(v[5])), "tgt": (v[6], str(v[7])),
                }
            elif table == "concatenated_operation_step":
                if v[0] != "NKG":
                    continue
                steps.setdefault(v[1], []).append(
                    (int(v[2]), v[3], str(v[4])))
    for code, lst in steps.items():
        lst.sort()
        concat[code]["steps"] = [(a, c) for _, a, c in lst]
    return helmert, projstring, concat


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/data/sql/nkg.sql"
    with open(src) as f:
        sql = f.read()
    helmert, projstring, concat = parse(sql)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "proj_ray", "nkg_generated.py")
    with open(out, "w") as f:
        f.write('"""Static NKG (Nordic Geodetic Commission) coordinate-'
                'operation registry.\n\nAUTO-GENERATED by tools/gen_nkg.py'
                ' from the reference\'s public NKG SQL\nregistration '
                '(data/sql/nkg.sql) — do not edit. Grid-based steps '
                'reference\nPROJ-data deformation grids that are not '
                'shipped; see proj_ray.nkg for\nthe synthesized-fixture '
                'path used to exercise the pipelines.\n"""\n\n')
        for name, d in (("NKG_HELMERT", helmert),
                        ("NKG_PROJSTRING", projstring),
                        ("NKG_CONCAT", concat)):
            f.write(f"{name} = {{\n")
            for k in sorted(d):
                f.write(f"    {k!r}: {d[k]!r},\n")
            f.write("}\n\n")
    print(f"wrote {out}: {len(helmert)} helmert, {len(projstring)} "
          f"projstring, {len(concat)} concatenated")


if __name__ == "__main__":
    main()
