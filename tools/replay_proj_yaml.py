"""Replay the reference's proj/invproj CLI golden corpora
(test/cli/test_proj*.yaml, test_invproj.yaml) against the engine.

Mirrors the proj app's semantics: datum specifiers ignored
(break_cs2cs_recursion, src/apps/proj.cpp:627), DMS input, output
compared numerically at printed precision (first two coordinate
columns; trailing echo columns ignored).

Usage: python tools/replay_proj_yaml.py <yaml> [-v]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import yaml

from tools.replay_cs2cs_yaml import parse_num


def clean_args(args: str):
    toks = str(args).split()
    out = []
    skip_next = False
    inverse = False
    skip = False
    for t in toks:
        if skip_next:
            skip_next = False
            continue
        if t in ("-f", "-d", "-w", "-W"):
            skip_next = True
            continue
        if t == "-I":
            inverse = True
            continue
        if t == "-S":
            skip = True  # -> want_factors
            continue
        if t.startswith("-"):
            continue
        out.append(t)
    return " ".join(out), inverse, skip


def parse_line(line: str, maxn: int = 3):
    toks = line.replace("\t", " ").split()
    vals = []
    for tok in toks[:maxn]:
        try:
            vals.append(parse_num(tok))
        except (ValueError, TypeError):
            break
    return vals


def run(yaml_path: str, verbose: bool = False):
    from proj_ray.factory import _resolve_crs_text, create_operation

    d = yaml.safe_load(open(yaml_path))
    exe_default = d.get("exe", "proj")
    npass = nfail = nskip = 0
    fails = []
    for ti, t in enumerate(d["tests"]):
        if "out" not in t:
            nskip += 1
            continue
        args, inverse, want_factors = clean_args(t.get("args", ""))
        if (t.get("exe", exe_default)) == "invproj":
            inverse = True
        if not args:
            nskip += 1
            continue
        echo = "-E" in str(t.get("args", ""))
        try:
            defn = _resolve_crs_text(args) if not args.startswith("+") \
                else args
            op = create_operation(defn + " +break_cs2cs_recursion")
        except Exception as exc:  # noqa: BLE001
            nskip += 1
            if verbose:
                print(f"[{ti}] BUILD-SKIP {args[:80]} -> "
                      f"{type(exc).__name__} {str(exc)[:60]}")
            continue
        # GH-1782 proj-app hack: ob_tran with an angular inner
        # projection gets PROJECTED output units so +to_meter applies
        # (src/apps/proj.cpp:653-658)
        from proj_ray.ops.base import UNITS_PROJECTED, UNITS_WHATEVER

        if getattr(op, "name", "") == "ob_tran" \
                and op.right == UNITS_WHATEVER:
            op.right = UNITS_PROJECTED
        ins = [parse_line(ln) for ln in str(t["in"]).strip().splitlines()]
        out_lines = str(t["out"]).strip().splitlines()
        # yaml `sub`: architecture-dependent token replacement
        sub = t.get("sub")
        if sub:
            out_lines = [ln.replace(str(sub[0]), str(sub[1]))
                         for ln in out_lines]
        ok = True
        why = ""
        for i, iv in enumerate(ins):
            if i >= len(out_lines) or len(iv) < 2:
                continue
            oline = out_lines[i]
            if echo and "\t" in oline:
                oline = oline.split("\t", 1)[1]
            ov = parse_line(oline, maxn=2)
            if len(ov) < 2:
                continue
            x = np.array([iv[0][0]])
            y = np.array([iv[1][0]])
            z = np.array([iv[2][0] if len(iv) > 2 else 0.0])
            tt = np.array([np.inf])
            ang_in = op.angular_output if inverse else op.angular_input
            if ang_in:
                x, y = np.radians(x), np.radians(y)
            try:
                fn = op.inv if inverse else op.fwd
                rx, ry, _, _ = fn((x, y, z, tt))
            except Exception as exc:  # noqa: BLE001
                ok = False
                why = f"exec {type(exc).__name__}"
                break
            ang_out = op.angular_input if inverse else op.angular_output
            if ang_out:
                rx, ry = np.degrees(rx), np.degrees(ry)
            for (ev, tol), gv in zip(ov, (rx[0], ry[0])):
                if np.isnan(ev):
                    if np.isfinite(gv):
                        ok = False
                        why = f"row{i} expected failure got {gv}"
                    continue
                if not np.isfinite(gv) or abs(gv - ev) > tol:
                    ok = False
                    why = f"row{i} got {gv!r} want {ev!r} tol {tol:g}"
                    break
            if ok and want_factors and not inverse:
                # proj -S: compare the <h k s omega a b> block
                # (src/apps/proj.cpp:186-191) at printed precision
                import re as _re

                from proj_ray.factors import factors

                m_f = _re.search(r"<([^>]*)>", oline)
                if m_f:
                    fac = factors(op, x, y)
                    got = [fac["meridional_scale"][0],
                           fac["parallel_scale"][0],
                           fac["areal_scale"][0],
                           np.degrees(fac["angular_distortion"][0]),
                           fac["tissot_semimajor"][0],
                           fac["tissot_semiminor"][0]]
                    for tok, gv in zip(m_f.group(1).split(), got):
                        ev, tol = parse_num(tok)
                        # %g prints ~6 significant digits: widen the
                        # tolerance to half an ulp of the 6th digit
                        if ev != 0:
                            tol = max(tol, abs(ev) * 5e-6)
                        else:
                            tol = max(tol, 1e-6) if "." in tok or \
                                "e" in tok else 1e-6
                        if not np.isfinite(gv) or abs(gv - ev) > tol:
                            ok = False
                            why = (f"row{i} factors got {gv!r} "
                                   f"want {ev!r}")
                            break
            if not ok:
                break
        if ok:
            npass += 1
        else:
            nfail += 1
            fails.append((ti, str(t.get("args", ""))[:90], why))
    print(f"pass {npass}  fail {nfail}  skip {nskip}")
    for ti, a, w in fails[:30]:
        print(f"  [{ti}] {a}\n        {w}")
    return npass, nfail, nskip


if __name__ == "__main__":
    paths = [a for a in sys.argv[1:] if a.endswith(".yaml")]
    run(paths[0] if paths else
        "/root/reference/test/cli/test_proj_nad27.yaml",
        "-v" in sys.argv)
