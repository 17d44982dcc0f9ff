"""Cell indexing: the shuffle key of the engine.

Two schemes, both vectorized uint64 kernels:

- `cell_id` / `cell_to_xyz` — quadtree cells on the Web-Mercator plane
  with Morton (Z-order) interleaving, S2-style: a cell id encodes
  (level, tx, ty) of the webmerc z/x/y tile pyramid. Spatial locality of
  the id ordering keeps groupby/shuffle partitions geographically
  coherent (cf. the reference's own cell projections s2/qsc/healpix/isea,
  src/projections/s2.cpp:33-85, as precedent for cell-gridding the
  sphere; the webmerc math is merc.cpp:76-84).
- `grid_cell` — trivial equal-angle lon/lat grid id (SQL-expressible,
  used for DuckDB oracle cross-checks).

Skew handling (`salt_cells`) splits hot cells into `salt` sub-keys, the
explicit remedy for Zipfian geotag clusters before a groupby.
"""

from __future__ import annotations

import numpy as np

WEBMERC_A = 6378137.0
MAX_LEVEL = 29  # 2 * 29 + 5 bits level < 64

_B = [
    0x5555555555555555,
    0x3333333333333333,
    0x0F0F0F0F0F0F0F0F,
    0x00FF00FF00FF00FF,
    0x0000FFFF0000FFFF,
]


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x to even bit positions (Morton)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x


def lonlat_to_webmerc(lon_deg: np.ndarray, lat_deg: np.ndarray):
    """Spherical web-mercator forward (EPSG:3857; merc.cpp:76-84)."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    with np.errstate(invalid="ignore", divide="ignore"):
        x = WEBMERC_A * lam
        y = WEBMERC_A * np.arcsinh(np.tan(phi))
    return x, y


def webmerc_to_lonlat(x: np.ndarray, y: np.ndarray):
    lon = np.degrees(np.asarray(x, dtype=np.float64) / WEBMERC_A)
    lat = np.degrees(np.arctan(np.sinh(
        np.asarray(y, dtype=np.float64) / WEBMERC_A)))
    return lon, lat


def tile_xy(x_merc: np.ndarray, y_merc: np.ndarray, level: int):
    """Webmerc plane -> integer tile (tx, ty) at `level` (y down)."""
    n = np.uint64(1) << np.uint64(level)
    world = 2 * np.pi * WEBMERC_A
    fx = (np.asarray(x_merc, dtype=np.float64) + np.pi * WEBMERC_A) / world
    fy = (np.pi * WEBMERC_A - np.asarray(y_merc, dtype=np.float64)) / world
    nn = int(n)
    tx = np.clip(np.floor(fx * nn), 0, nn - 1)
    ty = np.clip(np.floor(fy * nn), 0, nn - 1)
    bad = ~(np.isfinite(fx) & np.isfinite(fy))
    tx = np.where(bad, 0, tx).astype(np.int64)
    ty = np.where(bad, 0, ty).astype(np.int64)
    return tx, ty, bad


def cell_id(lon_deg, lat_deg, level: int) -> np.ndarray:
    """Encode (level, morton(tx, ty)) into an int64 cell id.

    Layout: bits [5 + 2*level) = morton code, low 5 bits = level.
    Invalid coordinates map to cell id -1.
    """
    if not (0 <= level <= MAX_LEVEL):
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    lat_arr = np.asarray(lat_deg, dtype=np.float64)
    lon_arr = np.asarray(lon_deg, dtype=np.float64)
    invalid = (~np.isfinite(lat_arr) | ~np.isfinite(lon_arr)
               | (np.abs(lat_arr) > 90.0))
    x, y = lonlat_to_webmerc(lon_arr, lat_arr)
    tx, ty, bad = tile_xy(x, y, level)
    bad = bad | invalid
    m = (_part1by1(tx.astype(np.uint64))
         | (_part1by1(ty.astype(np.uint64)) << np.uint64(1)))
    cid = ((m << np.uint64(5)) | np.uint64(level)).astype(np.int64)
    return np.where(bad, np.int64(-1), cid)


def cell_to_tile(cell: np.ndarray):
    """Decode cell id -> (level, tx, ty)."""
    c = np.asarray(cell).astype(np.uint64)
    level = (c & np.uint64(31)).astype(np.int64)
    m = c >> np.uint64(5)
    tx = _compact1by1(m).astype(np.int64)
    ty = _compact1by1(m >> np.uint64(1)).astype(np.int64)
    return level, tx, ty


def cell_parent(cell: np.ndarray, parent_level: int) -> np.ndarray:
    level, tx, ty = cell_to_tile(cell)
    shift = (level - parent_level).astype(np.int64)
    txp = (tx >> shift).astype(np.uint64)
    typ = (ty >> shift).astype(np.uint64)
    m = _part1by1(txp) | (_part1by1(typ) << np.uint64(1))
    return ((m << np.uint64(5)) | np.uint64(parent_level)).astype(np.int64)


def cell_neighbors(cell: np.ndarray, include_self: bool = True) -> np.ndarray:
    """The 3x3 ring of a cell (clamped at pyramid edges, wrapped in x).

    Returns shape (n, 9) (or (n, 8)) of int64 ids; duplicates possible at
    edges — callers dedup per row if needed.
    """
    level, tx, ty = cell_to_tile(cell)
    n = (np.int64(1) << level)
    out = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if not include_self and dx == 0 and dy == 0:
                continue
            nx = (tx + dx) % n  # wrap around antimeridian
            ny = np.clip(ty + dy, 0, n - 1)
            m = (_part1by1(nx.astype(np.uint64))
                 | (_part1by1(ny.astype(np.uint64)) << np.uint64(1)))
            out.append(((m << np.uint64(5))
                        | level.astype(np.uint64)).astype(np.int64))
    return np.stack(out, axis=1)


def grid_cell(lon_deg, lat_deg, res_deg: float = 1.0) -> np.ndarray:
    """Equal-angle grid id = row-major index over a res_deg lon/lat grid.

    Deliberately simple so a DuckDB oracle can reproduce it:
      cell = floor((lon+180)/res) * ceil(180/res) + floor((lat+90)/res)
    """
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    nlat = int(np.ceil(180.0 / res_deg))
    ix = np.floor((lon + 180.0) / res_deg)
    iy = np.floor((lat + 90.0) / res_deg)
    return (ix * nlat + iy).astype(np.int64)


def hex_axial(lon_deg, lat_deg, size_m: float = 250000.0):
    """Pointy-top hexagonal axial cell assignment on the Web-Mercator
    plane — the H3-style equal-planar-size hex binning primitive
    (axial coordinates + cube rounding, Amit Patel's construction).

    Returns (hq, hr) int64 axial coordinates. Every expression is
    written in SQL-reproducible form (explicit ln/tan Mercator, the
    exact same operation tree the oracle mirrors; rounding is
    floor(v + 0.5), the repo-wide half-up convention), so a DuckDB
    CASE-expression oracle matches the assignment op-for-op."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    x = WEBMERC_A * (lon * (np.pi / 180.0))
    y = WEBMERC_A * np.log(np.tan(np.pi / 4.0
                                  + (lat * (np.pi / 180.0)) / 2.0))
    xf = (np.sqrt(3.0) / 3.0 * x - y / 3.0) / size_m
    zf = (2.0 / 3.0 * y) / size_m
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    # cube rounding: recompute only the axis with the largest residual
    cond_q = (dx > dy) & (dx > dz)
    cond_r = (~cond_q) & ~(dy > dz)
    hq = np.where(cond_q, -ry - rz, rx)
    hr = np.where(cond_r, -rx - ry, rz)
    return hq.astype(np.int64), hr.astype(np.int64)


def salt_cells(cell: np.ndarray, row_key: np.ndarray,
               hot_cells: set | dict, salt: int) -> np.ndarray:
    """Split hot cells into `salt` sub-keys: salted = cell * salt + h.

    `hot_cells` comes from a census pass (groupby(cell).count() above a
    threshold); `row_key` is any stable per-row integer (e.g. a hash of
    image_id) so the split is deterministic. Non-hot cells get sub-key 0,
    so `salted // salt` always recovers the original cell.
    """
    cell = np.asarray(cell, dtype=np.int64)
    rk = np.asarray(row_key, dtype=np.int64)
    if not hot_cells:
        return cell * np.int64(salt)
    hot = np.isin(cell, np.fromiter(hot_cells, dtype=np.int64))
    sub = np.where(hot, np.abs(rk) % salt, 0)
    return cell * np.int64(salt) + sub


# ------------------------------------------------------------- geohash --

_GEOHASH32 = b"0123456789bcdefghjkmnpqrstuvwxyz"
_GEOHASH32_LUT = np.frombuffer(_GEOHASH32, dtype=np.uint8)
_GEOHASH32_INV = np.full(128, -1, dtype=np.int8)
for _i, _c in enumerate(_GEOHASH32):
    _GEOHASH32_INV[_c] = _i


def geohash_encode(lon_deg, lat_deg, precision: int = 8) -> np.ndarray:
    """Standard base32 geohash (Niemeyer), fully vectorized.

    bits = 5*precision, alternating lon/lat starting with a longitude
    bit at the MSB. Each axis is quantized to its bit budget, spread
    with the Morton kernel, and 5-bit groups map to the base32
    alphabet. Returns a unicode array of length-`precision` strings.

    Deliberately a third cell scheme next to `cell_id` (webmerc
    quadtree) and `grid_cell` (equal-angle): geohash is the
    string-keyed, prefix-aggregatable one (parent cell == string
    prefix), the common interchange key in external datasets.
    """
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lon_q = np.clip(np.floor((lon + 180.0) / 360.0 * (1 << nlon)),
                    0, (1 << nlon) - 1).astype(np.uint64)
    lat_q = np.clip(np.floor((lat + 90.0) / 180.0 * (1 << nlat)),
                    0, (1 << nlat) - 1).astype(np.uint64)
    # lon occupies the MSB; from the LSB that is the odd positions when
    # nbits is even, the even positions when nbits is odd.
    if nbits % 2 == 0:
        m = (_part1by1(lon_q) << np.uint64(1)) | _part1by1(lat_q)
    else:
        m = _part1by1(lon_q) | (_part1by1(lat_q) << np.uint64(1))
    shifts = (np.arange(precision - 1, -1, -1, dtype=np.uint64)
              * np.uint64(5))
    idx = ((m[:, None] >> shifts[None, :]) & np.uint64(31)).astype(np.uint8)
    chars = _GEOHASH32_LUT[idx]  # (n, precision) uint8
    return chars.view(f"S{precision}").ravel().astype(str)


def geohash_decode(gh: np.ndarray):
    """Inverse of `geohash_encode`: cell-center (lon, lat) per hash.

    All hashes in the array must share one precision.
    """
    gh = np.asarray(gh)
    s = np.char.encode(gh.astype(str), "ascii")
    precision = len(s[0]) if len(s) else 0
    if precision == 0:
        return np.empty(0), np.empty(0)
    bytes_mat = s.view(np.uint8).reshape(len(s), -1)[:, :precision]
    vals = _GEOHASH32_INV[bytes_mat].astype(np.uint64)  # (n, p) in 0..31
    m = np.zeros(len(s), dtype=np.uint64)
    for k in range(precision):
        m = (m << np.uint64(5)) | vals[:, k]
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    if nbits % 2 == 0:
        lon_q = _compact1by1(m >> np.uint64(1))
        lat_q = _compact1by1(m)
    else:
        lon_q = _compact1by1(m)
        lat_q = _compact1by1(m >> np.uint64(1))
    lon = (lon_q.astype(np.float64) + 0.5) / (1 << nlon) * 360.0 - 180.0
    lat = (lat_q.astype(np.float64) + 0.5) / (1 << nlat) * 180.0 - 90.0
    return lon, lat


def hilbert_d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Hilbert-curve index of integer grid cells (x, y) in
    [0, 2^order)^2 — the locality-preserving alternative to the
    Z-order `cell_id` for shuffle keys: consecutive indices are always
    grid NEIGHBORS (no Z-order jumps), so range-partitioning by d
    keeps spatial neighbors in the same partition. Vectorized over
    points, `order` iterations of the standard bit transform (the rot
    variant reflecting with the full side n-1; validated by the
    bijection + unit-adjacency tests)."""
    n = 1 << order
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        swap = ry == 0
        refl = swap & (rx == 1)
        x2 = np.where(refl, n - 1 - x, x)
        y2 = np.where(refl, n - 1 - y, y)
        x, y = np.where(swap, y2, x2), np.where(swap, x2, y2)
        s >>= 1
    return d


def hilbert_cell(lon_deg, lat_deg, order: int = 8) -> np.ndarray:
    """Hilbert index of a lon/lat point on the equirectangular
    2^order x 2^order grid over [-180,180) x [-85,85) (floor mapping,
    clipped — SQL-reproducible with least/greatest + floor)."""
    n = 1 << order
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1)
    y = np.clip(np.floor((lat + 85.0) / 170.0 * n), 0, n - 1)
    return hilbert_d(order, x.astype(np.int64), y.astype(np.int64))
