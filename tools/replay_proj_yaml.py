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
        if t in ("-S",):
            skip = True  # factors output format not replayed
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
        args, inverse, skip = clean_args(t.get("args", ""))
        if (t.get("exe", exe_default)) == "invproj":
            inverse = True
        if skip or not args:
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
        ins = [parse_line(ln) for ln in str(t["in"]).strip().splitlines()]
        out_lines = str(t["out"]).strip().splitlines()
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
