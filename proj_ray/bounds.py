"""Bounding-box transformation with edge densification.

`trans_bounds` re-expresses the reference's `proj_trans_bounds`
(parity target: src/4D_api.cpp:1480-1693, helpers :1184-1430 —
re-derived, not copied): the four bbox edges are densified
(`densify_pts` points added per side, default 21, max 10,000), the
resulting linear ring is pushed through the operation in ONE
vectorized kernel call, and the output bounds are the ring min/max
with the reference's special cases:

  - geographic OUTPUT: pole containment (if the projected bbox
    contains the north/south pole the longitude span is the full
    [-180, 180] and the polar latitude is +/-90), and
    antimeridian-aware longitude min/max (a jump of >= 200 degrees
    between consecutive ring points marks a crossing; two crossings
    select the positive/negative meridian side, four mean the ring
    wraps the world);
  - geographic INPUT: `xmax < xmin` on the longitude axis means the
    bbox crosses the antimeridian and spans `xmax - xmin + 360`;
  - lat/lon vs lon/lat axis order on either side (EPSG authority
    order puts latitude first; detected from the boundary axisswap
    steps the factory builds, overridable by argument);
  - failed points (inf) are skipped by the max scans exactly like the
    reference's HUGE_VAL guards.

Angular bounds are DEGREES at this API (like proj_trans_bounds, whose
crs-to-crs PJs have degree I/O); the radian conversion to the engine's
kernel boundary happens inside. `transform_bounds_batch` is the
Ray-native vectorized form: n boxes -> one (n x ring) kernel call.
"""

from __future__ import annotations

import numpy as np

_INF = float("inf")


def _op_axis_swaps(op) -> bool:
    """The op's legacy `+axis=` permutation puts north/south first."""
    ax = getattr(getattr(op, "P", None), "axis", None)
    return bool(ax and ax[0] in "ns")


def _effective_boundary_swap(op, side: str) -> bool:
    """True when the operation's `side` ('in' for fwd-entry, 'out' for
    fwd-exit) swaps axes 0<->1 (lat,lon / northing,easting authority
    order). EPSG-resolved CRSs carry the legacy `+axis=neu` parameter,
    which applies on an op's RIGHT side (fwd-finalize / inv-prepare,
    ops/base.py) — so it swaps the pipeline INPUT when the first step
    runs inverted, and the OUTPUT when the last step runs forward.
    Explicit axisswap steps at the boundary are honored too. Plain
    +proj ops are lon,lat."""
    from proj_ray.factory import AlternativesOp, Pipeline, PushPop
    from proj_ray.ops.transforms import Axisswap

    if isinstance(op, AlternativesOp):
        op = op.cands[0][0]
    if not isinstance(op, Pipeline):
        # single op: +axis applies on its right (the fwd output)
        return side == "out" and _op_axis_swaps(op)
    steps = [st for st in op.steps if not isinstance(st.op, PushPop)]
    if not steps:
        return False
    st = steps[0] if side == "in" else steps[-1]
    if isinstance(st.op, Axisswap):
        ax = getattr(st.op, "axis", None)
        return bool(ax and len(ax) >= 2 and ax[0] == 1 and ax[1] == 0)
    if side == "in":
        return bool(st.inv) and _op_axis_swaps(st.op)
    return (not st.inv) and _op_axis_swaps(st.op)


def _is_lon_lat_order(op, direction: str, io: str) -> bool:
    """Axis order of the angular side: io='in' is the input of
    `direction`, io='out' its output. lon,lat == True."""
    fwd = direction in ("fwd", "forward")
    boundary = "in" if (io == "in") == fwd else "out"
    return not _effective_boundary_swap(op, boundary)


def _simple_min(v: np.ndarray) -> float:
    # reference simple_min (4D_api.cpp:1184): plain running min
    return float(np.min(v)) if len(v) else _INF


def _simple_max(v: np.ndarray) -> float:
    # reference simple_max (4D_api.cpp:1194): inf values are skipped
    f = v[v != _INF]
    return float(np.max(f)) if len(f) else _INF


def _prev_valid(i: int, data: np.ndarray) -> int:
    n = len(data)
    p = (i - 1) % n
    while data[p] == _INF and p != i:
        p = (p - 1) % n
    return p


def _antimeridian_min(data: np.ndarray) -> float:
    """Longitude min over a densified linear ring that may cross the
    antimeridian (reference antimeridian_min, 4D_api.cpp:1267)."""
    positive_min = _INF
    min_value = _INF
    crossed = 0
    positive_meridian = False
    for i in range(len(data)):
        if data[i] == _INF:
            continue
        delta = data[_prev_valid(i, data)] - data[i]
        if delta >= 200 and delta != _INF:
            if crossed == 0:
                positive_min = min_value
            crossed += 1
            positive_meridian = False
        elif delta <= -200 and delta != -_INF:
            if crossed == 0:
                positive_min = data[i]
            crossed += 1
            positive_meridian = True
        if positive_meridian and data[i] < positive_min:
            positive_min = data[i]
        if data[i] < min_value:
            min_value = data[i]
    if crossed == 2:
        return float(positive_min)
    if crossed == 4:
        return -180.0
    return float(min_value)


def _antimeridian_max(data: np.ndarray) -> float:
    """Longitude max twin (reference antimeridian_max,
    4D_api.cpp:1315)."""
    negative_max = -_INF
    max_value = -_INF
    negative_meridian = False
    crossed = 0
    for i in range(len(data)):
        if data[i] == _INF:
            continue
        delta = data[_prev_valid(i, data)] - data[i]
        if delta >= 200 and delta != _INF:
            if crossed == 0:
                negative_max = data[i]
            crossed += 1
            negative_meridian = True
        elif delta <= -200 and delta != -_INF:
            if crossed == 0:
                negative_max = max_value
            negative_meridian = False
            crossed += 1
        if negative_meridian and (data[i] > negative_max
                                  or negative_max == _INF) \
                and data[i] != _INF:
            negative_max = data[i]
        if (data[i] > max_value or max_value == _INF) and data[i] != _INF:
            max_value = data[i]
    if crossed == 2:
        return float(negative_max)
    if crossed == 4:
        return 180.0
    return float(max_value)


def _transform_ring(op, direction: str, x: np.ndarray, y: np.ndarray,
                    deg_in: bool, deg_out: bool):
    from proj_ray.factory import transform

    if deg_in:
        x = np.radians(x)
        y = np.radians(y)
    with np.errstate(all="ignore"):
        c = transform(op, direction, x, y)
    ox = np.asarray(c[0], dtype=np.float64).copy()
    oy = np.asarray(c[1], dtype=np.float64).copy()
    # reference reports failures as HUGE_VAL; fold nan/-inf in too
    ox[~np.isfinite(ox)] = _INF
    oy[~np.isfinite(oy)] = _INF
    if deg_out:
        m = ox != _INF
        ox[m] = np.degrees(ox[m])
        m = oy != _INF
        oy[m] = np.degrees(oy[m])
    return ox, oy


def _contains_pole(op, direction: str, lat_sign: int, xmin, ymin,
                   xmax, ymax, out_lon_lat: bool,
                   deg_back: bool) -> bool:
    """Project the pole back into the INPUT space and test bbox
    containment (reference contains_north/south_pole,
    4D_api.cpp:1362-1404). `deg_back` = the op's input side for
    `direction` is angular, so the round trip lands in degrees (the
    units of the caller's bbox)."""
    if out_lon_lat:
        px, py = 0.0, 90.0 * lat_sign
    else:
        px, py = 90.0 * lat_sign, 0.0
    opp = "inv" if direction in ("fwd", "forward") else "fwd"
    ox, oy = _transform_ring(op, opp, np.array([px]), np.array([py]),
                             deg_in=True, deg_out=deg_back)
    return bool(xmin < ox[0] < xmax and ymin < oy[0] < ymax)


def trans_bounds(op, direction: str, xmin: float, ymin: float,
                 xmax: float, ymax: float, densify_pts: int = 21,
                 input_lon_lat_order: bool | None = None,
                 output_lon_lat_order: bool | None = None):
    """Transform a bounding box: densify every edge, transform the
    ring, reduce to the output envelope with pole/antimeridian
    handling (proj_trans_bounds parity — see module docstring).

    Angular-side bounds are degrees. Returns (xmin, ymin, xmax, ymax);
    raises ValueError on invalid densify_pts or reversed latitudes.
    """
    from proj_ray.factory import create_operation

    if isinstance(op, str):
        op = create_operation(op)
    if not 0 <= densify_pts <= 10000:
        raise ValueError("densify_pts must be between 0-10000")
    if getattr(op, "name", "") == "noop" or direction in ("ident", "none"):
        return (xmin, ymin, xmax, ymax)

    fwd = direction in ("fwd", "forward")
    deg_in = op.angular_input if fwd else op.angular_output
    deg_out = op.angular_output if fwd else op.angular_input
    if deg_out and densify_pts < 2:
        raise ValueError(
            "densify_pts must be at least 2 if the output is geographic")

    in_lon_lat = (input_lon_lat_order if input_lon_lat_order is not None
                  else _is_lon_lat_order(op, direction, "in"))
    out_lon_lat = (output_lon_lat_order if output_lon_lat_order is not None
                   else _is_lon_lat_order(op, direction, "out"))

    north_pole_in = south_pole_in = False
    if deg_out:
        north_pole_in = _contains_pole(op, direction, 1, xmin, ymin,
                                       xmax, ymax, out_lon_lat, deg_in)
        south_pole_in = _contains_pole(op, direction, -1, xmin, ymin,
                                       xmax, ymax, out_lon_lat, deg_in)

    side_pts = densify_pts + 1
    if deg_in and xmax < xmin:
        if not in_lon_lat:
            raise ValueError("latitude max < latitude min")
        delta_x = (xmax - xmin + 360.0) / side_pts  # antimeridian span
    else:
        delta_x = (xmax - xmin) / side_pts
    if deg_in and ymax < ymin:
        if in_lon_lat:
            raise ValueError("latitude max < latitude min")
        delta_y = (ymax - ymin + 360.0) / side_pts
    else:
        delta_y = (ymax - ymin) / side_pts

    # densified linear ring, same traversal as the reference:
    # xmin edge (top->bottom), ymin edge (left->right),
    # xmax edge (bottom->top), ymax edge (right->left)
    i = np.arange(side_pts, dtype=np.float64)
    bx = np.concatenate([np.full(side_pts, xmin), xmin + i * delta_x,
                         np.full(side_pts, xmax), xmax - i * delta_x])
    by = np.concatenate([ymax - i * delta_y, np.full(side_pts, ymin),
                         ymin + i * delta_y, np.full(side_pts, ymax)])

    ox, oy = _transform_ring(op, direction, bx, by, deg_in, deg_out)

    if not deg_out:
        return (_simple_min(ox), _simple_min(oy),
                _simple_max(ox), _simple_max(oy))
    if north_pole_in and out_lon_lat:
        return (-180.0, _simple_min(oy), 180.0, 90.0)
    if north_pole_in:
        return (_simple_min(ox), -180.0, 90.0, 180.0)
    if south_pole_in and out_lon_lat:
        return (-180.0, -90.0, 180.0, _simple_max(oy))
    if south_pole_in:
        return (-90.0, -180.0, _simple_max(ox), 180.0)
    if out_lon_lat:
        return (_antimeridian_min(ox), _simple_min(oy),
                _antimeridian_max(ox), _simple_max(oy))
    return (_simple_min(ox), _antimeridian_min(oy),
            _simple_max(ox), _antimeridian_max(oy))


def transform_bounds_batch(op, direction: str, xmin, ymin, xmax, ymax,
                           densify_pts: int = 21):
    """Vectorized envelope transform for n boxes at once — the Ray
    map_batches building block. ONE kernel call transforms the
    (n x 4*side_pts) stacked rings; per-box min/max reduce along the
    ring axis with the reference's inf skipping. Returns four float64
    arrays (xmin, ymin, xmax, ymax).

    Fast path only (no pole/antimeridian special cases): intended for
    projected outputs (e.g. geographic -> webmerc/UTM tile cover).
    Boxes needing geographic-output handling go through trans_bounds.
    """
    from proj_ray.factory import create_operation, transform

    if isinstance(op, str):
        op = create_operation(op)
    if not 0 <= densify_pts <= 10000:
        raise ValueError("densify_pts must be between 0-10000")
    fwd = direction in ("fwd", "forward")
    deg_in = op.angular_input if fwd else op.angular_output
    deg_out = op.angular_output if fwd else op.angular_input
    if deg_out:
        raise NotImplementedError(
            "transform_bounds_batch is the projected-output fast path; "
            "use trans_bounds per box for geographic outputs")

    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    n = len(xmin)
    side_pts = densify_pts + 1
    ring = 4 * side_pts
    i = np.arange(side_pts, dtype=np.float64)
    dx = (xmax - xmin)[:, None] / side_pts
    dy = (ymax - ymin)[:, None] / side_pts
    bx = np.empty((n, ring), dtype=np.float64)
    by = np.empty((n, ring), dtype=np.float64)
    bx[:, :side_pts] = xmin[:, None]
    by[:, :side_pts] = ymax[:, None] - i * dy
    bx[:, side_pts:2 * side_pts] = xmin[:, None] + i * dx
    by[:, side_pts:2 * side_pts] = ymin[:, None]
    bx[:, 2 * side_pts:3 * side_pts] = xmax[:, None]
    by[:, 2 * side_pts:3 * side_pts] = ymin[:, None] + i * dy
    bx[:, 3 * side_pts:] = xmax[:, None] - i * dx
    by[:, 3 * side_pts:] = ymax[:, None]

    fx = np.radians(bx.ravel()) if deg_in else bx.ravel()
    fy = np.radians(by.ravel()) if deg_in else by.ravel()
    with np.errstate(all="ignore"):
        c = transform(op, direction, fx, fy)
    ox = np.asarray(c[0], dtype=np.float64).reshape(n, ring)
    oy = np.asarray(c[1], dtype=np.float64).reshape(n, ring)
    bad_x = ~np.isfinite(ox)
    bad_y = ~np.isfinite(oy)
    ox_min = np.where(bad_x, _INF, ox).min(axis=1)
    oy_min = np.where(bad_y, _INF, oy).min(axis=1)
    ox_max = np.where(bad_x, -_INF, ox).max(axis=1)
    oy_max = np.where(bad_y, -_INF, oy).max(axis=1)
    return ox_min, oy_min, ox_max, oy_max
