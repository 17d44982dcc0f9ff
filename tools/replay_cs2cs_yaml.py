"""Replay the reference's cs2cs CLI golden tests
(test/cli/test_cs2cs_various.yaml) against the engine's
create_crs_to_crs, comparing numerically at the precision the expected
output was printed with. Exploration tool; the curated subset lives in
tests/test_cs2cs_yaml.py.

Usage: python tools/replay_cs2cs_yaml.py [-v]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import yaml

YAML = "/root/reference/test/cli/test_cs2cs_various.yaml"

# -I (inverse), -E (echo input), --only-best and --s_epoch/--t_epoch
# (coordinate epoch -> the t coordinate of a time-dependent op) are
# handled below; planner authority/accuracy selection are not.
SKIP_FLAGS = ("--no-ballpark", "--authority", "--accuracy")


def parse_num(tok: str):
    """Numeric token (decimal or DMS) -> (value, abs tolerance)."""
    from proj_ray.params import dms_to_deg

    if tok in ("*", "inf", "-inf"):
        return np.nan, 0.0
    if any(c in tok for c in "d°'\""):
        v = dms_to_deg(tok)
        # precision = seconds decimals (default whole seconds)
        dec = 0
        if "." in tok:
            frag = tok.split(".")[-1]
            dec = sum(ch.isdigit() for ch in frag)
        if "'" not in tok and '"' not in tok and "d" in tok:
            # only degrees printed: tolerance at the minute level
            tol = 1.5 / 60.0 if "." not in tok else 1.5 * 10.0 ** -dec
        else:
            tol = 1.5 * 10.0 ** -dec / 3600.0
        return v, max(tol, 5e-12)
    v = float(tok)
    dec = len(tok.split(".")[1]) if "." in tok else 0
    # floor: 5e-12 (0.5 um in degrees, 5 pm in meters) — below the
    # deg<->rad round-trip noise of the printing path itself
    return v, max(1.5 * 10.0 ** -dec, 5e-12)


def split_args(args: str):
    import shlex

    toks = shlex.split(str(args))
    # drop cs2cs flags and their values
    out = []
    skip_next = False
    for t in toks:
        if skip_next:
            skip_next = False
            continue
        if t in ("-f", "-d", "--s_epoch", "--t_epoch"):
            skip_next = True
            continue
        if t.startswith("-") and not t[1:2].isdigit():
            continue
        out.append(t)
    # re-quote values that embed spaces (shlex strips both quoting
    # layers of '+nadgrids="dir with space/f"') so tokenize() keeps
    # them as one token
    out = [t if " " not in t or "=" not in t or '"' in t else
           t.split("=", 1)[0] + '="' + t.split("=", 1)[1] + '"'
           for t in out]
    if "+to" in out:
        i = out.index("+to")
        return " ".join(out[:i]), " ".join(out[i + 1:])
    if len(out) == 2:
        # AUTH:CODE, +proj strings, or bare CRS names (GDA94,
        # ITRF2000...) — name resolution failures surface as
        # BUILD-SKIPs, not silent arg-parse skips
        return out[0], out[1]
    return None, None


def parse_lines(text: str):
    rows = []
    for line in str(text).strip().splitlines():
        toks = line.replace("\t", " ").split()
        vals = []
        for tok in toks:
            try:
                vals.append(parse_num(tok))
            except (ValueError, TypeError):
                break
        if len(vals) >= 2:
            rows.append(vals)
        else:
            rows.append(None)
    return rows


def _alias_test_grids():
    """The reference CI renames data/tests grids to the names the yaml
    goldens reference (ntv2_0_downsampled.gsb -> ntv2_0.gsb); mirror
    that with a symlink dir prepended to the grid search path."""
    import os

    from proj_ray.ops import gridshift as GS

    alias = "/tmp/proj_ray_grid_alias"
    os.makedirs(alias, exist_ok=True)
    link = os.path.join(alias, "ntv2_0.gsb")
    if not os.path.exists(link):
        os.symlink("/root/reference/data/tests/ntv2_0_downsampled.gsb",
                   link)
    # data/CMakeLists.txt copies tests/conus -> "dir with space/myconus"
    spaced = os.path.join(alias, "dir with space")
    os.makedirs(spaced, exist_ok=True)
    link = os.path.join(spaced, "myconus")
    if not os.path.exists(link):
        os.symlink("/root/reference/data/tests/conus", link)
    if alias not in GS.GRID_SEARCH_PATH:
        GS.GRID_SEARCH_PATH.insert(0, alias)


def run(verbose: bool = False, yaml_path: str = YAML):
    from proj_ray.factory import create_crs_to_crs

    _alias_test_grids()
    d = yaml.safe_load(open(yaml_path))
    npass = nfail = nskip = 0
    fails = []
    for ti, t in enumerate(d["tests"]):
        args = str(t.get("args", ""))
        if "out" not in t or any(f in args for f in SKIP_FLAGS):
            nskip += 1
            continue
        src, dst = split_args(args)
        if not src or not dst:
            nskip += 1
            continue
        # grid-stripped scenarios: the yaml copies only proj.db into a
        # fresh tmpdir PROJ_DATA, so grid-backed planner candidates
        # must be unavailable there (the helmert fallback is the
        # expected path). A PROJ_DATA that merely EXTENDS the search
        # path (contains ${PROJ_DATA}) is not stripped.
        env_pd = str((t.get("env") or {}).get("PROJ_DATA", ""))
        stripped = "tmpdir" in env_pd
        if stripped:
            os.environ["PROJ_RAY_SKIP_GRID_OPS"] = "YES"
        try:
            op = create_crs_to_crs(src, dst, force_3d="--3d" in args)
        except Exception as exc:  # noqa: BLE001
            nskip += 1
            if verbose:
                print(f"[{ti}] BUILD-SKIP {args[:80]} -> "
                      f"{type(exc).__name__} {str(exc)[:60]}")
            os.environ.pop("PROJ_RAY_SKIP_GRID_OPS", None)
            continue
        finally:
            os.environ.pop("PROJ_RAY_SKIP_GRID_OPS", None)
        inverse = " -I" in f" {args}" or args.endswith("-I")
        echo = " -E" in f" {args}"
        epoch = None
        m_ep = __import__("re").search(
            r"--[st]_epoch[= ]([0-9.]+)", args)
        if m_ep:
            epoch = float(m_ep.group(1))
        ins = parse_lines(t["in"])
        outs = parse_lines(t["out"])
        ok = True
        why = ""
        for i, (iv, ov) in enumerate(zip(ins, outs)):
            if iv is None or ov is None:
                continue
            x = np.array([iv[0][0]])
            y = np.array([iv[1][0]])
            z = np.array([iv[2][0] if len(iv) > 2 else 0.0])
            tt = np.array([iv[3][0] if len(iv) > 3 else
                           (epoch if epoch is not None else np.inf)])
            ang_in = op.angular_output if inverse else op.angular_input
            ang_out = op.angular_input if inverse else op.angular_output
            if ang_in:
                x, y = np.radians(x), np.radians(y)
            try:
                step = op.inv if inverse else op.fwd
                rx, ry, rz, _ = step((x, y, z, tt))
            except Exception as exc:  # noqa: BLE001
                ok = False
                why = f"exec {type(exc).__name__}"
                break
            if ang_out:
                rx, ry = np.degrees(rx), np.degrees(ry)
            if not (np.isfinite(rx[0]) and np.isfinite(ry[0])):
                # cs2cs marks the whole record failed (* * inf) when
                # the transform errors; mirror that for z too
                rx = ry = rz = np.array([np.inf])
            if echo:
                # cs2cs -E prefixes each output line with the input's
                # spatial columns; compare only the result columns
                ov = ov[min(3, len(iv)):]
                if len(ov) < 2:
                    continue
            exp = [ov[0], ov[1]] + ([ov[2]] if len(ov) > 2 else [])
            got = [rx[0], ry[0]] + ([rz[0]] if len(ov) > 2 else [])
            for (ev, tol), gv in zip(exp, got):
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
            fails.append((ti, args[:90], why))
    print(f"pass {npass}  fail {nfail}  skip {nskip}")
    for ti, a, w in fails[:40]:
        print(f"  [{ti}] {a}\n        {w}")
    return npass, nfail, nskip


if __name__ == "__main__":
    paths = [a for a in sys.argv[1:] if a.endswith(".yaml")]
    run("-v" in sys.argv, *(paths[:1] or []))
