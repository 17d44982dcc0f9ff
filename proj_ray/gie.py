"""gie conformance-file parser and runner.

Replays the reference's own test vectors (/root/reference/test/gie/*.gie,
format defined by src/apps/gie.cpp:153-176 command verbs) against the
vectorized operations. Semantics mirrored from gie.cpp:

  - default tolerance 0.5 mm (gie.cpp:277), `tolerance 0.1 mm` rescales
    (strtod_scaled, gie.cpp:494-529)
  - angular input/output converted deg<->rad per axis string
    (torad_coord/todeg_coord, gie.cpp)
  - comparison: geodesic distance + dz for angular output
    (proj_lpz_dist, src/4D_api.cpp:149-153), euclidean for linear
  - expect failure [errno xxx]: success iff the op errors/returns inf
  - roundtrip n [tol]: half-step out, n-1 full steps, half-step back
    (proj_roundtrip, src/4D_api.cpp:176-213)
  - dimensions given in `expect` mask v[2]/v[3] of the computed result

Operators not implemented in this engine are reported as `unsupported`
(skipped), keeping an honest coverage metric.
"""

from __future__ import annotations

import math
import os
import re
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from proj_ray.factory import create_operation
from proj_ray.ops.base import UNITS_RADIANS
from proj_ray.params import dms_to_deg


def _synth_grid_names() -> set[str]:
    from proj_ray.nkg import nkg_grid_names

    return nkg_grid_names()

DEG = math.pi / 180.0
GRS80_DEG = 111319.4908  # deg-to-m at equator (gie.cpp:499)

_TAGS = (
    "operation", "crs_src", "crs_dst", "use_proj4_init_rules", "accept",
    "expect", "roundtrip", "banner", "verbose", "direction", "tolerance",
    "ignore", "require_grid", "echo", "skip", "</gie>", "<gie-strict>",
    "</gie-strict>", "<gie>",
)


def _scaled(tokens: list[str], default_scale: float) -> float:
    if not tokens:
        return math.inf
    # allow attached units ("1cm") as proj_strtod would parse them
    m = re.match(r"^([+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)(\w*)$",
                 tokens[0])
    if not m:
        return math.inf
    s = float(m.group(1))
    unit = m.group(2) or (tokens[1] if len(tokens) > 1 else "")
    table = {"km": 1000.0, "m": 1.0, "dm": 0.1, "cm": 0.01, "mm": 1e-3,
             "um": 1e-6, "nm": 1e-9}
    if unit in table:
        return s * table[unit]
    if unit == "rad":
        return GRS80_DEG * math.degrees(s)
    if unit == "deg":
        return GRS80_DEG * s
    return s * default_scale


_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _parse_coord(args: str) -> tuple[list[float], int] | None:
    """Parse up to 4 numeric/DMS tokens; returns (v[4], ndims) or None."""
    toks = args.split()
    vals = [0.0, 0.0, 0.0, 0.0]
    n = 0
    for tok in toks[:4]:
        if tok.startswith("HUGE_VAL"):
            vals[n] = math.inf
            n += 1
            continue
        if _NUM_RE.match(tok):
            vals[n] = float(tok)
            n += 1
            continue
        try:
            vals[n] = dms_to_deg(tok)
            n += 1
        except (ValueError, KeyError):
            break
    if n < 2:
        return None
    return vals, n


@dataclass
class GieResult:
    path: str
    ok: int = 0
    fail: int = 0
    skip: int = 0
    unsupported: int = 0
    # expects executed end-to-end on SYNTHESIZED stand-in grids
    # (PROJ_RAY_SYNTH_GRIDS=1): finite + inverse-closure checked, but
    # the corpus' expect values reference real PROJ-data grids so the
    # values themselves cannot be asserted
    unasserted: int = 0
    failures: list[str] = field(default_factory=list)
    unsupported_ops: dict[str, int] = field(default_factory=dict)

    @property
    def total(self) -> int:
        return (self.ok + self.fail + self.skip + self.unsupported
                + self.unasserted)


def _iter_commands(text: str):
    """Yield (verb, args) honoring gie's continuation-line rule: a line not
    starting with a known tag continues the previous command."""
    in_block = False
    cur: tuple[str, list[str]] | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        while line.endswith("\\"):
            line = line[:-1].rstrip()
        stripped = line.strip()
        if not stripped:
            continue
        if stripped.startswith("<gie"):
            in_block = True
            if cur:
                yield cur[0], " ".join(cur[1])
                cur = None
            continue
        if stripped.startswith("</gie"):
            if cur:
                yield cur[0], " ".join(cur[1])
                cur = None
            in_block = False
            continue
        if not in_block:
            continue
        first = stripped.split(None, 1)
        verb = first[0]
        rest = first[1] if len(first) > 1 else ""
        if verb in _TAGS:
            if cur:
                yield cur[0], " ".join(cur[1])
            cur = (verb, [rest])
        else:
            if cur:
                cur[1].append(stripped)
    if cur:
        yield cur[0], " ".join(cur[1])


class GieRunner:
    def __init__(self) -> None:
        self.reset_file("")

    def reset_file(self, path: str) -> None:
        self.res = GieResult(path)
        self.op_str = ""
        self.op = None
        self.op_error: str | None = None  # 'unsupported' | 'invalid'
        self.dir = "fwd"
        self.tolerance = 5e-4
        self.accepted: list[float] = [0.0, 0.0, 0.0, 0.0]
        self.accept_dims = 2
        self.ignore_active = False
        self.skip_section = False

    # ---- helpers ---------------------------------------------------------
    def _angular_input(self) -> bool:
        if self.op is None:
            return False
        return (self.op.left if self.dir == "fwd" else self.op.right) \
            == UNITS_RADIANS

    def _angular_output(self) -> bool:
        if self.op is None:
            return False
        return (self.op.right if self.dir == "fwd" else self.op.left) \
            == UNITS_RADIANS

    def _axis_mask(self, output_side: bool) -> list[bool]:
        """Which of v[0..3] are angular, honoring +axis= (gie torad_coord)."""
        axis = "enut"
        m = re.search(r"\+axis=(\w+)", self.op_str)
        if m:
            use = (self.dir == "inv") if not output_side else \
                (self.dir == "fwd")
            if use:
                axis = m.group(1)
        return [c in "news" for c in axis] + [False] * (4 - len(axis))

    def _torad(self, v: list[float], output_side: bool) -> list[float]:
        mask = self._axis_mask(output_side)
        return [x * DEG if mask[i] else x for i, x in enumerate(v)]

    def _trans(self, v: list[float], direction: str) -> list[float]:
        arr = tuple(np.array([x], dtype=np.float64) for x in v)
        out = self.op.fwd(arr) if direction == "fwd" else self.op.inv(arr)
        return [float(a[0]) for a in out]

    def _lpz_dist(self, a: list[float], b: list[float]) -> float:
        """Geodesic distance + dz. Local radii of curvature are exact in the
        small-separation limit used by tolerance checks; dlam wrapped."""
        if not all(map(math.isfinite, a[:2])) or \
                not all(map(math.isfinite, b[:2])):
            return math.inf
        ell = getattr(self.op, "P", None)
        if ell is not None:
            A, es = ell.ell.a, ell.ell.es
        else:
            A, es = 6378137.0, 0.0066943800229007876
        phi = 0.5 * (a[1] + b[1])
        sp = math.sin(phi)
        w2 = 1 - es * sp * sp
        M = A * (1 - es) / w2 ** 1.5
        N = A / math.sqrt(w2)
        dlam = (b[0] - a[0] + math.pi) % (2 * math.pi) - math.pi
        dphi = b[1] - a[1]
        horiz = math.hypot(dphi * M, dlam * N * math.cos(phi))
        return math.hypot(horiz, a[2] - b[2])

    def _xyz_dist(self, a: list[float], b: list[float]) -> float:
        return math.hypot(math.hypot(a[0] - b[0], a[1] - b[1]), a[2] - b[2])

    # ---- verbs -----------------------------------------------------------
    def do_operation(self, args: str) -> None:
        self.op_str = args
        # operation resets direction/tolerance/ignore (gie.cpp operation())
        self.dir = "fwd"
        self.tolerance = 5e-4
        self.op = None
        self.op_error = None
        self.ignore_active = False
        # gie allows spaces around '=' ("proj = pipeline") and stray
        # ';' separators (GDA.gie): normalize before deciding whether
        # this is a proj-string or a database ref
        normalized = re.sub(r"\s*=\s*", "=", args.replace(";", " "))
        self.op_synth = False
        if "proj=" not in normalized and "init=" not in normalized:
            # urn:/EPSG-code operation references resolve through the
            # static registries (EPSG geocentric Helmerts + the NKG
            # concatenated-operation registry)
            try:
                from proj_ray.epsg import resolve_operation

                normalized = resolve_operation(normalized.strip())
            except NotImplementedError:
                self.op_error = "unsupported"
                self.res.unsupported_ops["crs_database"] = \
                    self.res.unsupported_ops.get("crs_database", 0) + 1
                return
            except Exception:
                self.op_error = "invalid"
                return
        synth_on = os.environ.get("PROJ_RAY_SYNTH_GRIDS") == "1"
        try:
            self.op = create_operation(normalized)
            self.op_synth = self._uses_synth_grid(normalized)
            if self.op_synth and not synth_on:
                # a prior opt-in run left the synth dir on the search
                # path: without the flag these sections must stay
                # grid_missing (reference-ctest parity), never
                # value-compare against fixture grids
                self.op = None
                self.op_synth = False
                self.op_error = "grid_missing"
                key = "synthesized fixture grids (flag off)"
                self.res.unsupported_ops[key] = \
                    self.res.unsupported_ops.get(key, 0) + 1
        except NotImplementedError as exc:
            # a missing grid file is a real runtime failure (the op IS
            # implemented): expect-failure sections should match it
            from proj_ray.ops.gridshift import GridUnavailable

            if isinstance(exc, GridUnavailable) and synth_on \
                    and any(n in str(exc) for n in _synth_grid_names()):
                # opt-in fixture path: synthesize the PROJ-data grids
                # the reference's own ctest skips without, so the
                # pipeline executes end-to-end (expects become
                # finite+closure checks counted as `unasserted`)
                from proj_ray.nkg import ensure_synth_grids

                ensure_synth_grids()
                try:
                    self.op = create_operation(normalized)
                    self.op_synth = True
                    return
                except Exception:
                    pass
            self.op_error = "grid_missing" \
                if isinstance(exc, GridUnavailable) else "unsupported"
            key = str(exc).replace("operator not implemented: ", "")
            self.res.unsupported_ops[key] = \
                self.res.unsupported_ops.get(key, 0) + 1
        except Exception:
            self.op_error = "invalid"

    @staticmethod
    def _uses_synth_grid(defn: str) -> bool:
        """True iff a grid named in `defn` actually resolves to a
        synthesized fixture (real files shadow the synth dir, which
        sits LAST on the search path) — such sections must be
        closure-checked, never value-asserted."""
        from proj_ray import nkg
        from proj_ray.ops.defmodel import _resolve_file
        from proj_ray.ops.gridshift import GridUnavailable

        if nkg._synth_dir is None:
            return False
        for name in _synth_grid_names():
            if name in defn:
                try:
                    if _resolve_file(name).startswith(nkg._synth_dir):
                        return True
                except GridUnavailable:
                    pass
        return False

    def do_expect(self, args: str) -> None:
        res = self.res
        if self.skip_section:
            res.skip += 1
            return
        expect_failure = args.startswith("failure")
        if self.op_error == "grid_missing":
            if expect_failure:
                res.ok += 1
            else:
                res.unsupported += 1
            return
        if self.op_error == "unsupported":
            # a garbage op string (no proj=, not a database urn/EPSG
            # ref) fails to construct in the reference too: an
            # expect-failure block is therefore satisfied, not
            # unsupported (ellipsoid.gie "operation cobra")
            db_ref = "urn:" in self.op_str.lower() \
                or self.op_str.strip().upper().startswith("EPSG:")
            if expect_failure and not db_ref:
                res.ok += 1
            else:
                res.unsupported += 1
            return
        if self.ignore_active:
            res.skip += 1
            return
        if self.op is None:
            if expect_failure:
                res.ok += 1
            else:
                res.fail += 1
                res.failures.append(
                    f"op failed to build: {self.op_str[:100]}")
            return
        if expect_failure:
            ci = self._torad(self.accepted, False) if self._angular_input() \
                else list(self.accepted)
            try:
                co = self._trans(ci, self.dir)
            except NotImplementedError:
                res.ok += 1
                return
            if not all(map(math.isfinite, co[:2])):
                res.ok += 1
            else:
                res.fail += 1
                res.failures.append(
                    f"failed to fail: {self.op_str[:80]} accept "
                    f"{self.accepted}")
            return
        parsed = _parse_coord(args)
        if parsed is None:
            res.fail += 1
            res.failures.append(f"cannot parse expect: {args[:80]}")
            return
        e, edims = parsed
        ce = self._torad(e, True) if self._angular_output() else e
        ci = self._torad(self.accepted, False) if self._angular_input() \
            else list(self.accepted)
        if getattr(self, "op_synth", False):
            # synthesized-grid fixture: the corpus expect values
            # reference real PROJ-data grids, so execute end-to-end
            # and assert finiteness + inverse closure instead
            try:
                co = self._trans(ci, self.dir)
            except NotImplementedError:
                res.unsupported += 1
                return
            if not all(map(math.isfinite, co[:3])):
                res.fail += 1
                res.failures.append(
                    f"synth-grid run non-finite: {self.op_str[:80]}")
                return
            if self.op.has_inverse:
                back = self._trans(list(co), "inv" if self.dir == "fwd"
                                   else "fwd")
                d = max(abs(b - a) for b, a in zip(back[:3], ci[:3]))
                if not (d < 1e-3):
                    res.fail += 1
                    res.failures.append(
                        f"synth-grid closure {d:.3g}: "
                        f"{self.op_str[:80]}")
                    return
            res.unasserted += 1
            return
        try:
            co = self._trans(ci, self.dir)
        except NotImplementedError:
            res.unsupported += 1
            return
        if edims < 4:
            co[3] = 0.0
        if edims < 3:
            co[2] = 0.0
        if math.isnan(co[0]) and math.isnan(ce[0]):
            d = 0.0
        elif self._angular_output():
            d = self._lpz_dist(ce, co)
        else:
            d = self._xyz_dist(co, ce)
        if d <= self.tolerance:
            res.ok += 1
        else:
            res.fail += 1
            res.failures.append(
                f"{self.op_str[:90]} | dir={self.dir} accept="
                f"{self.accepted[:self.accept_dims]} expect={e[:edims]} "
                f"got={co[:edims]} d={d:.6g} tol={self.tolerance:g}")

    def do_roundtrip(self, args: str) -> None:
        res = self.res
        if self.skip_section:
            res.skip += 1
            return
        if self.op_error in ("unsupported", "grid_missing"):
            res.unsupported += 1
            return
        if self.op is None or self.ignore_active:
            res.skip += 1
            return
        toks = args.split()
        ntrips = 100
        tol = self.tolerance
        if toks:
            try:
                ntrips = int(float(toks[0]))
            except ValueError:
                ntrips = 100
            if len(toks) > 1:
                tol = _scaled(toks[1:], 1)
                if not math.isfinite(tol):
                    tol = self.tolerance
        ci = self._torad(self.accepted, False) if self._angular_input() \
            else list(self.accepted)
        org = list(ci)
        try:
            t = self._trans(org, self.dir)
            opp = "inv" if self.dir == "fwd" else "fwd"
            for _ in range(ntrips - 1):
                t = self._trans(self._trans(t, opp), self.dir)
            t = self._trans(t, opp)
        except NotImplementedError:
            res.unsupported += 1
            return
        if any(map(math.isnan, org)) and all(map(math.isnan, t)):
            d = 0.0  # proj_roundtrip NaN rule (src/4D_api.cpp:203-206)
        elif self._angular_input():
            d = self._lpz_dist(org, t)
        else:
            d = self._xyz_dist(org, t)
        if d <= tol:
            res.ok += 1
        else:
            res.fail += 1
            res.failures.append(
                f"roundtrip {self.op_str[:80]} accept="
                f"{self.accepted[:self.accept_dims]} d={d:.6g} tol={tol:g}")

    def dispatch(self, verb: str, args: str) -> None:
        if verb == "operation":
            self.do_operation(args)
        elif verb == "accept":
            parsed = _parse_coord(args)
            if parsed:
                self.accepted, self.accept_dims = parsed
        elif verb == "expect":
            self.do_expect(args)
        elif verb == "roundtrip":
            self.do_roundtrip(args)
        elif verb == "direction":
            a = args.strip().lower()
            self.dir = "inv" if a[:1] in ("i", "r") else "fwd"
        elif verb == "tolerance":
            t = _scaled(args.split(), 1)
            self.tolerance = 5e-4 if not math.isfinite(t) else t
        elif verb == "ignore":
            # grid-dependent ops: we have no grid distribution -> skip
            self.ignore_active = True
        elif verb in ("crs_src", "crs_dst"):
            # crs-to-crs tests need the EPSG database: unsupported
            self.op = None
            self.op_error = "unsupported"
            self.res.unsupported_ops["crs_to_crs"] = \
                self.res.unsupported_ops.get("crs_to_crs", 0) + 1
        elif verb == "skip":
            self.skip_section = True

    def run_file(self, path: str | Path) -> GieResult:
        self.reset_file(str(path))
        text = Path(path).read_text(errors="replace")
        for verb, args in _iter_commands(text):
            self.dispatch(verb, args)
        return self.res


def run_gie_file(path: str | Path) -> GieResult:
    return GieRunner().run_file(path)
