"""Replay the reference's test/cli/test_projinfo.yaml against this
engine's projinfo implementation (proj_ray.projinfo_text), comparing
EXACT stdout text. Usage:

  python tools/replay_projinfo_yaml.py [-v] [N ...]

With -v, prints a unified diff for each failing case; N selects
specific 1-based test indexes. Exit code 0 regardless (scoreboard
tool); the summary line lists pass/fail/skip with skip reasons
itemized by missing-feature class.
"""

from __future__ import annotations

import difflib
import shlex
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

YAML = Path("/root/reference/test/cli/test_projinfo.yaml")


def parse_yaml(path: Path):
    """Minimal parser for the reference's cli-test yaml shape."""
    tests = []
    cur = None
    key = None
    buf: list[str] = []
    lines = path.read_text(encoding="utf-8").split("\n")
    i = 0

    def flush():
        nonlocal key, buf
        if cur is not None and key is not None:
            text = "\n".join(buf)
            if key in ("out", "stdout", "stderr", "args", "grep",
                       "comment", "env", "file", "exitcode"):
                cur[key] = text
        key, buf = None, []

    while i < len(lines):
        line = lines[i]
        if line.startswith("- "):
            flush()
            if cur:
                tests.append(cur)
            cur = {}
            line = "  " + line[2:]
        if cur is None:
            i += 1
            continue
        m = line.strip()
        if line.startswith("  ") and not line.startswith("    ") and \
                ":" in m and not m.startswith("#"):
            flush()
            k, _, v = m.partition(":")
            k = k.strip()
            v = v.strip()
            if v in ("|", "|+", ">", "|-"):
                key = k
                buf = []
                fold = v == ">"
                i += 1
                block = []
                while i < len(lines) and (
                        lines[i].startswith("    ") or lines[i] == ""):
                    if lines[i] == "" and i + 1 < len(lines) and \
                            not (lines[i + 1].startswith("    ")
                                 or lines[i + 1] == ""):
                        break
                    block.append(lines[i][4:])
                    i += 1
                while block and block[-1] == "":
                    block.pop()
                text = " ".join(x for x in block if x) if fold \
                    else "\n".join(block)
                cur[k] = text
                key = None
                continue
            elif v == "" and i + 1 < len(lines) \
                    and lines[i + 1].startswith("  - "):
                # list-valued key (e.g. grep with several patterns)
                items = []
                i += 1
                while i < len(lines) and lines[i].startswith("  - "):
                    items.append(lines[i][4:])
                    i += 1
                cur[k] = items
                continue
            else:
                cur[k] = v
        i += 1
    flush()
    if cur:
        tests.append(cur)
    return [t for t in tests if "args" in t]


def postprocess(got: str, t: dict) -> str:
    """Apply the reference cli-test runner's post-processing commands
    (grep / sort / head / tail) to captured output."""
    import re

    lines = got.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    greps = t.get("grep")
    if greps is not None:
        pats = greps if isinstance(greps, list) else [greps]
        for p in pats:
            rx = re.compile(p)
            lines = [ln for ln in lines if rx.search(ln)]
    if "sort" in t:
        lines = sorted(lines)
    if "head" in t:
        lines = lines[: int(t["head"])]
    if "tail" in t:
        lines = lines[-int(t["tail"]):]
    return "\n".join(lines)


def main() -> int:
    verbose = "-v" in sys.argv
    only = {int(a) for a in sys.argv[1:] if a.isdigit()}
    tests = parse_yaml(YAML)
    from proj_ray.projinfo_text import run_projinfo

    npass = nfail = 0
    skipped: dict[str, list[int]] = {}
    for idx, t in enumerate(tests, 1):
        if only and idx not in only:
            continue
        args = shlex.split(t["args"])
        want = t.get("out", t.get("stdout"))
        try:
            got, code = run_projinfo(args)
        except NotImplementedError as e:
            skipped.setdefault(str(e), []).append(idx)
            continue
        except Exception as e:  # noqa: BLE001 - scoreboard tool
            got, code = f"<exception: {type(e).__name__}: {e}>", 1
        post = any(k in t for k in ("grep", "sort", "head", "tail"))
        if post:
            got_cmp = postprocess(got, t)
        else:
            got_cmp = got
        ok = True
        if want is not None:
            ok &= got_cmp.rstrip("\n") == want.rstrip("\n")
        if "stderr" in t and want is None:
            ok &= code != 0
        if "grep" in t and want is None and "stderr" not in t:
            ok &= bool(got_cmp.strip())
        if "exitcode" in t:
            ok &= code == int(t["exitcode"])
        if ok:
            npass += 1
        else:
            nfail += 1
            print(f"FAIL #{idx}: {t['args'][:100]}")
            if verbose and want is not None:
                for dl in difflib.unified_diff(
                        want.splitlines(), got_cmp.splitlines(),
                        "expected", "got", lineterm=""):
                    print("   " + dl)
    nskip = sum(len(v) for v in skipped.values())
    print(f"\nprojinfo yaml: {npass} pass / {nfail} fail / "
          f"{nskip} skip of {len(tests)}")
    for reason, idxs in sorted(skipped.items()):
        print(f"  skip [{reason}]: {idxs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
