"""Minimal GeoTIFF reader for datum-shift grids (pure NumPy + zlib).

Covers what the reference's GTiffGrid reads with libtiff
(src/grids.cpp:439-1330): multi-IFD files (subgrid trees), strip and tile
organization, compression none/deflate, horizontal predictor,
int16/uint16/int32/uint32/float32/float64 samples, planar contig,
GeoPixelScale+GeoTiePoints (or GeoTransformationMatrix) georeferencing,
PixelIsArea/PixelIsPoint, bottom-up detection, the GDAL_METADATA XML tag
(TYPE / grid_name / parent_grid_name / DESCRIPTION / UNITTYPE / SCALE /
OFFSET / interpolation_method / constant_offset / positive_value) and the
GDAL nodata tag.

Grids are normalized on load: sample arrays shaped (height, width,
nsamples) float64 with row 0 at the SOUTH edge, extents in radians for
geographic grids — exactly what the vectorized shift kernels consume.
"""

from __future__ import annotations

import re
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

DEG_TO_RAD = np.pi / 180.0

_T_BYTES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
            11: 4, 12: 8, 16: 8, 17: 8}


@dataclass
class TiffGrid:
    width: int
    height: int
    west: float
    south: float
    east: float
    north: float
    resX: float
    resY: float
    is_geographic: bool
    samples: np.ndarray  # (h, w, ns), row 0 = south
    metadata: dict
    sample_meta: dict  # sample idx -> {name: value}
    nodata: float | None
    children: list["TiffGrid"] = field(default_factory=list)

    @property
    def full_world(self) -> bool:
        """Geographic grid spanning all longitudes: the seam column
        wraps (ExtentAndRes::fullWorldLongitude, grids.cpp:88)."""
        return self.is_geographic and (
            self.east - self.west + self.resX >= 2 * np.pi - 1e-10)

    def contains(self, other: "TiffGrid") -> bool:
        eps = 1e-11
        return (other.west + eps >= self.west
                and other.east - eps <= self.east
                and other.south + eps >= self.south
                and other.north - eps <= self.north)


def _read_ifds(data: bytes):
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    magic = struct.unpack(bo + "H", data[2:4])[0]
    ifds = []
    if magic == 42:
        big = False
        off = struct.unpack(bo + "I", data[4:8])[0]
    elif magic == 43:  # BigTIFF
        big = True
        off = struct.unpack(bo + "Q", data[8:16])[0]
    else:
        raise ValueError("not a TIFF")
    while off:
        if big:
            n = struct.unpack(bo + "Q", data[off:off + 8])[0]
            tags = {}
            for i in range(n):
                e = data[off + 8 + 20 * i: off + 28 + 20 * i]
                tag, typ = struct.unpack(bo + "HH", e[:4])
                cnt = struct.unpack(bo + "Q", e[4:12])[0]
                tags[tag] = (typ, cnt, e[12:20])
            ifds.append(tags)
            off = struct.unpack(
                bo + "Q", data[off + 8 + 20 * n: off + 16 + 20 * n])[0]
        else:
            n = struct.unpack(bo + "H", data[off:off + 2])[0]
            tags = {}
            for i in range(n):
                e = data[off + 2 + 12 * i: off + 14 + 12 * i]
                tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
                tags[tag] = (typ, cnt, e[8:12])
            ifds.append(tags)
            off = struct.unpack(
                bo + "I", data[off + 2 + 12 * n: off + 6 + 12 * n])[0]
    return (bo, big), ifds


def _tag_values(data: bytes, bo_big, entry):
    bo, big = bo_big if isinstance(bo_big, tuple) else (bo_big, False)
    typ, cnt, raw = entry
    size = _T_BYTES.get(typ, 1) * cnt
    inline = 8 if big else 4
    if size <= inline:
        payload = raw[:size]
    else:
        off = struct.unpack(bo + ("Q" if big else "I"), raw)[0]
        payload = data[off:off + size]
    if typ in (3, 8):
        return list(struct.unpack(bo + f"{cnt}H", payload))
    if typ in (4, 9):
        return list(struct.unpack(bo + f"{cnt}I", payload))
    if typ == 11:
        return list(struct.unpack(bo + f"{cnt}f", payload))
    if typ == 12:
        return list(struct.unpack(bo + f"{cnt}d", payload))
    if typ == 2:
        return payload.rstrip(b"\x00").decode("utf-8", "replace")
    if typ == 1:
        return list(payload)
    if typ == 16:
        return list(struct.unpack(bo + f"{cnt}Q", payload))
    if typ == 17:
        return list(struct.unpack(bo + f"{cnt}q", payload))
    return payload


_ITEM_RE = re.compile(
    r'<Item\s+name="([^"]+)"(?:\s+sample="(\d+)")?[^>]*>(.*?)</Item>',
    re.S)


def _parse_gdal_metadata(xml: str):
    meta: dict = {}
    sample_meta: dict = {}
    for name, sample, value in _ITEM_RE.findall(xml):
        value = value.strip()
        if sample == "" or sample is None:
            meta[name] = value
        else:
            sample_meta.setdefault(int(sample), {})[name] = value
    return meta, sample_meta


def _np_dtype(bo: str, sample_format: int, bits: int):
    kind = {1: "u", 2: "i", 3: "f"}.get(sample_format)
    if kind is None:
        raise ValueError(f"unsupported TIFF sample format {sample_format}")
    if kind == "f" and bits not in (32, 64):
        raise ValueError(f"unsupported float bits {bits}")
    if kind in ("u", "i") and bits not in (8, 16, 32):
        raise ValueError(f"unsupported int bits {bits}")
    return np.dtype(f"{bo}{kind}{bits // 8}")


def read_geotiff_grids(path: str) -> list[TiffGrid]:
    """Read all IFDs and return the subgrid tree (roots list)."""
    with open(path, "rb") as f:
        data = f.read()
    bo, ifds = _read_ifds(data)
    flat: list[TiffGrid] = []
    for tags in ifds:
        def val(tag, default=None):
            if tag not in tags:
                return default
            return _tag_values(data, bo, tags[tag])

        subfile = (val(254) or [0])[0]
        if subfile not in (0, 2):
            # skip reduced-resolution overviews etc. (FILETYPE_REDUCEDIMAGE)
            continue
        w = val(256)[0]
        h = val(257)[0]
        spp = (val(277) or [1])[0]
        bits = val(258) or [32]
        sample_format = (val(339) or [3])[0]
        comp = (val(259) or [1])[0]
        predictor = (val(317) or [1])[0]
        planar = (val(284) or [1])[0]
        if comp not in (1, 8):
            raise ValueError(f"unsupported TIFF compression {comp}")
        dt = _np_dtype(bo[0], sample_format, bits[0])
        isz = dt.itemsize

        def decode_block(o, c, row_elems):
            block = data[o:o + c]
            if comp == 8:
                block = zlib.decompress(block)
            if predictor == 3 and comp == 8:
                # TIFF floating-point predictor: per row, byte-planes are
                # stored MSB-first and horizontally differenced
                rowbytes = row_elems * isz
                arr = np.frombuffer(block, dtype=np.uint8).copy()
                nrows_b = len(arr) // rowbytes
                arr = arr[:nrows_b * rowbytes].reshape(nrows_b, rowbytes)
                arr = np.cumsum(arr.astype(np.uint16), axis=1
                                ).astype(np.uint8)
                planes = arr.reshape(nrows_b, isz, row_elems)
                # reassemble big-endian floats
                out = np.empty((nrows_b, row_elems, isz), dtype=np.uint8)
                for b in range(isz):
                    out[:, :, b] = planes[:, b, :]
                flo = out.reshape(nrows_b * row_elems, isz)
                block = flo.tobytes()
                return block, np.dtype(f">f{isz}")
            return block, None

        # assemble raster rows (TIFF row order); truncated blocks yield
        # NaN-filled tails (matches libtiff read errors -> error points)
        raster = np.full((h, w, spp), np.nan, dtype=np.float64)

        def fill(arr_flat, want, block, dt_override=None):
            use_dt = dt_override if dt_override is not None else dt
            got = min(len(block) // isz, want)
            a = np.full(want, np.nan)
            if got > 0:
                a[:got] = np.frombuffer(block, dtype=use_dt, count=got
                                        ).astype(np.float64)
            return a

        if 322 in tags:  # tiled
            tw = val(322)[0]
            th = val(323)[0]
            offs = val(324)
            cnts = val(325)
            tiles_across = (w + tw - 1) // tw
            tiles_down = (h + th - 1) // th
            tiles_per_plane = tiles_across * tiles_down
            for ti, (o, c) in enumerate(zip(offs, cnts)):
                ns = 1 if planar == 2 else spp
                block, dt_o = decode_block(o, c, tw * ns)
                plane = ti // tiles_per_plane if planar == 2 else 0
                tj = ti % tiles_per_plane if planar == 2 else ti
                a = fill(None, tw * th * ns, block, dt_o).reshape(th, tw, ns)
                if predictor == 2:
                    a = np.cumsum(a, axis=1)
                ty0 = (tj // tiles_across) * th
                tx0 = (tj % tiles_across) * tw
                ny = min(th, h - ty0)
                nx = min(tw, w - tx0)
                if planar == 2:
                    raster[ty0:ty0 + ny, tx0:tx0 + nx, plane] = \
                        a[:ny, :nx, 0]
                else:
                    raster[ty0:ty0 + ny, tx0:tx0 + nx, :] = a[:ny, :nx, :]
        else:
            offs = val(273)
            cnts = val(279)
            rps = (val(278) or [h])[0]
            strips_per_plane = (h + rps - 1) // rps
            for si, (o, c) in enumerate(zip(offs, cnts)):
                ns = 1 if planar == 2 else spp
                block, dt_o = decode_block(o, c, w * ns)
                plane = si // strips_per_plane if planar == 2 else 0
                sj = si % strips_per_plane if planar == 2 else si
                row = sj * rps
                nrows = min(rps, h - row)
                a = fill(None, nrows * w * ns, block, dt_o
                         ).reshape(nrows, w, ns)
                if predictor == 2:
                    a = np.cumsum(a, axis=1)
                if planar == 2:
                    raster[row:row + nrows, :, plane] = a[:, :, 0]
                else:
                    raster[row:row + nrows] = a

        # georeferencing
        geokeys = val(34735) or []
        model_type = 2
        pixel_is_area = True
        for k in range(4, len(geokeys), 4):
            kid, loc, cnt_, v = geokeys[k:k + 4]
            if kid == 1024 and loc == 0:
                model_type = v
            if kid == 1025 and loc == 0:
                pixel_is_area = (v == 1)
        is_geo = model_type != 1
        tm = val(34264)
        if tm is not None and len(tm) == 16:
            west = tm[3]
            hres = tm[0]
            north = tm[7]
            vres = -tm[5]
        else:
            scale = val(33550)
            tie = val(33922)
            if scale is None or tie is None:
                raise ValueError("missing georeferencing tags")
            hres = scale[0]
            vres = scale[1]
            west = tie[3] - tie[0] * hres
            north = tie[4] + tie[1] * vres
        if pixel_is_area:
            west += 0.5 * hres
            north -= 0.5 * vres
        mul = DEG_TO_RAD if is_geo else 1.0
        westr = west * mul
        east = (west + hres * (w - 1)) * mul
        northr = north * mul
        south = (north - vres * (h - 1)) * mul
        resX = hres * mul
        resY = abs(vres) * mul
        bottom_up = vres < 0
        if bottom_up:
            south, northr = northr, south
        else:
            raster = raster[::-1]  # normalize: row 0 = south
        meta_xml = val(42112) or ""
        meta, sample_meta = _parse_gdal_metadata(meta_xml) if meta_xml \
            else ({}, {})
        nodata_s = val(42113)
        nodata = float(nodata_s) if nodata_s not in (None, "") else None
        # per-sample scale/offset
        for si, sm in sample_meta.items():
            sc = float(sm.get("SCALE", 1.0))
            of = float(sm.get("OFFSET", 0.0))
            if sc != 1.0 or of != 0.0:
                vals = raster[:, :, si]
                if nodata is not None:
                    mask = vals == nodata
                    raster[:, :, si] = np.where(mask, nodata,
                                                vals * sc + of)
                else:
                    raster[:, :, si] = vals * sc + of
        flat.append(TiffGrid(
            width=w, height=h,
            west=westr, south=south, east=east, north=northr,
            resX=resX, resY=resY, is_geographic=is_geo,
            samples=np.ascontiguousarray(raster),
            metadata=meta, sample_meta=sample_meta, nodata=nodata))

    # build hierarchy: parent_grid_name first, else containment
    roots: list[TiffGrid] = []
    by_name = {}
    for g in flat:
        nm = g.metadata.get("grid_name", "")
        if nm:
            by_name[nm] = g
    for g in flat:
        parent = g.metadata.get("parent_grid_name", "")
        placed = False
        if parent and parent in by_name and by_name[parent] is not g:
            p = by_name[parent]
            if p.contains(g):
                p.children.append(g)
                placed = True
        if not placed:
            # containment: attach to the last earlier grid that contains it
            for cand in reversed(roots):
                if cand.contains(g) and cand.resX > g.resX:
                    cand.children.append(g)
                    placed = True
                    break
        if not placed:
            roots.append(g)
    return roots


def write_geotiff_grid(path: str, samples: np.ndarray, west: float,
                       north: float, res: float,
                       band_descriptions: list[str],
                       metadata: dict | None = None) -> None:
    """Minimal GeoTIFF WRITER (the reader's inverse, for synthesized
    test fixtures — e.g. the NKG deformation grids PROJ-data does not
    ship; see proj_ray.nkg). Classic little-endian TIFF, one IFD,
    single strip, uncompressed float32, PixelIsArea geographic
    georeferencing via ModelPixelScale + ModelTiepoint, GDAL_METADATA
    with per-sample DESCRIPTION items.

    `samples` is (height, width, nsamples) with row 0 at the NORTH
    edge (standard TIFF image order); `west`/`north` are the CENTER of
    the top-left pixel in degrees (the PixelIsArea half-pixel shift is
    applied here so the reader recovers them exactly)."""
    h, w, spp = samples.shape
    assert len(band_descriptions) == spp
    arr = np.ascontiguousarray(samples, dtype="<f4")
    items = []
    for k, v in (metadata or {}).items():
        items.append(f'<Item name="{k}">{v}</Item>')
    for i, d in enumerate(band_descriptions):
        items.append(f'<Item name="DESCRIPTION" sample="{i}" '
                     f'role="description">{d}</Item>')
    gdal_xml = ("<GDALMetadata>\n" + "\n".join(items)
                + "\n</GDALMetadata>\n").encode() + b"\x00"
    geokeys = [1, 1, 0, 2,
               1024, 0, 1, 2,   # ModelTypeGeographic
               1025, 0, 1, 1]   # RasterPixelIsArea
    pixel_scale = [res, res, 0.0]
    # PixelIsArea: tiepoint references the OUTER corner of pixel (0,0)
    tiepoint = [0.0, 0.0, 0.0, west - 0.5 * res, north + 0.5 * res, 0.0]
    strip = arr.tobytes()

    entries = []  # (tag, type, count, payload-bytes)

    def entry(tag, typ, values, fmt):
        payload = struct.pack("<" + fmt * len(values), *values)
        entries.append((tag, typ, len(values), payload))

    entry(256, 3, [w], "H")
    entry(257, 3, [h], "H")
    entry(258, 3, [32] * spp, "H")
    entry(259, 3, [1], "H")
    entry(262, 3, [1], "H")
    entry(273, 4, [0], "I")  # patched below
    entry(277, 3, [spp], "H")
    entry(278, 3, [h], "H")
    entry(279, 4, [len(strip)], "I")
    entry(284, 3, [1], "H")
    entry(339, 3, [3] * spp, "H")
    entry(33550, 12, pixel_scale, "d")
    entry(33922, 12, tiepoint, "d")
    entry(34735, 3, geokeys, "H")
    entries.append((42112, 2, len(gdal_xml), gdal_xml))

    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4
    blobs = []
    fixed = []
    for tag, typ, cnt, payload in entries:
        if len(payload) <= 4:
            fixed.append((tag, typ, cnt, payload.ljust(4, b"\x00")))
        else:
            fixed.append((tag, typ, cnt,
                          struct.pack("<I", data_off + sum(
                              len(b) for b in blobs))))
            blobs.append(payload + (b"\x00" if len(payload) % 2 else b""))
    strip_off = data_off + sum(len(b) for b in blobs)
    # patch StripOffsets (tag 273) with the final strip position
    for idx, (tag, typ, cnt, raw) in enumerate(fixed):
        if tag == 273:
            fixed[idx] = (tag, typ, cnt, struct.pack("<I", strip_off))
    out = [b"II*\x00", struct.pack("<I", ifd_off),
           struct.pack("<H", n)]
    for tag, typ, cnt, raw in fixed:
        out.append(struct.pack("<HHI", tag, typ, cnt) + raw)
    out.append(struct.pack("<I", 0))  # next IFD
    out.extend(blobs)
    out.append(strip)
    with open(path, "wb") as f:
        f.write(b"".join(out))
