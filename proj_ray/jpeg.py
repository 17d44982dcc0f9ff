"""Real baseline JPEG codec (ITU-T T.81 / ISO 10918-1), pure NumPy.

Replaces the round-1..4 deterministic fake-lossy stub: the container
has no libjpeg/PIL, so the codec the engine's lossy-format invariant
(north rule: decoded-pixel PSNR >= 40 dB) rests on is implemented here
from the public spec.

Scope (encoder + decoder, both sides of everything emitted):
  * baseline sequential DCT, 8-bit, 3-component YCbCr (JFIF) or
    1-component grayscale, 4:4:4 (no chroma subsampling);
  * quantization: Annex K.1/K.2 example matrices scaled by the
    libjpeg-convention quality parameter (5000/q | 200-2q);
  * entropy coding: per-image OPTIMIZED Huffman tables built by the
    Annex K.2/K.3 procedures (code-length gathering with the reserved
    all-ones pseudo-symbol, 16-bit length adjustment) and emitted in
    DHT — any spec-conforming decoder can read the output, and the
    decoder here reads any baseline 4:4:4/grayscale stream, not just
    its own;
  * markers: SOI / APP0(JFIF) / DQT / SOF0 / DHT / SOS / (DRI+RSTn
    on decode) / EOI, 0xFF byte stuffing.

Not supported (raise NotImplementedError, the repo's guard style):
progressive SOF2, arithmetic coding, 12-bit precision, subsampled
chroma on decode, CMYK.

Decode is per-symbol sequential by nature (Huffman); it runs inside
actor-pool map_batches stages so throughput comes from blob-level
parallelism. Encoder DCT/quantization are vectorized over all blocks
(tensordot); only the entropy emit loops per block.
"""

from __future__ import annotations

import numpy as np

__all__ = ["jpeg_encode", "jpeg_decode"]

# Annex K.1 / K.2 example quantization matrices (public spec tables).
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# zigzag: ZZ[k] = raster index of the k-th coefficient in zigzag order
def _zigzag() -> np.ndarray:
    coords = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1)
                if 0 <= s - j < 8 and 0 <= j < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        coords.extend(diag)
    return np.array([r * 8 + c for r, c in coords], dtype=np.int64)


ZZ = _zigzag()
UNZZ = np.argsort(ZZ)

# orthonormal DCT-II basis: X = D @ x @ D.T
_k = np.arange(8)
_D = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) / 2.0
_D[0, :] *= 1.0 / np.sqrt(2.0)


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (qt * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) padded plane -> (nblocks, 8, 8) in raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _unblockify(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (blocks.reshape(h8 // 8, w8 // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h8, w8))


# ---------------------------------------------------------------------
# Huffman table construction (Annex K.2 code-length gathering + K.3
# BITS adjustment), canonical code assignment (Annex C).
# ---------------------------------------------------------------------

def _huff_lengths(freq256: np.ndarray) -> np.ndarray:
    """Code length per symbol (257 slots; 256 is the reserved
    pseudo-symbol guaranteeing no real code is all ones)."""
    freq = np.zeros(257, dtype=np.int64)
    freq[:256] = freq256
    freq[256] = 1
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)
    while True:
        nz = np.nonzero(freq)[0]
        if len(nz) <= 1:
            break
        # two least-frequent (ties -> largest symbol value first, the
        # spec's "highest symbol" rule keeps the pseudo-symbol longest)
        order = nz[np.lexsort((-nz, freq[nz]))]
        v1, v2 = int(order[0]), int(order[1])
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = int(others[v1])
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = int(others[v2])
            codesize[v2] += 1
    return codesize


def build_huff_table(freq256: np.ndarray):
    """Return (bits[17], huffval[list]) per Annex K: bits[l] = number of
    codes of length l (1..16), huffval in canonical order."""
    codesize = _huff_lengths(freq256)
    maxlen = int(codesize.max(initial=0))
    bits = np.zeros(max(maxlen, 16) + 1, dtype=np.int64)
    for s in range(257):
        if codesize[s]:
            bits[codesize[s]] += 1
    # Annex K.3: fold code lengths > 16 down
    i = len(bits) - 1
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    bits = bits[:17]
    # remove the longest code (the pseudo-symbol's slot)
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    # canonical symbol order: by code length, then by symbol value
    syms = [s for s in range(256) if codesize[s]]
    syms.sort(key=lambda s: (codesize[s], s))
    return bits, syms


def _assign_codes(bits: np.ndarray, huffval: list[int]):
    """Canonical code assignment (Annex C): {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(int(bits[length])):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """Table-driven decoder: JPEG codes are at most 16 bits, so a
    2^16-entry LUT over a 16-bit peek resolves any symbol in one
    lookup (the reference decoders' standard fast path)."""

    def __init__(self, bits: np.ndarray, huffval: list[int]):
        self.lut_sym = np.full(1 << 16, -1, dtype=np.int16)
        self.lut_len = np.zeros(1 << 16, dtype=np.int8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(int(bits[length])):
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                self.lut_sym[lo:hi] = huffval[k]
                self.lut_len[lo:hi] = length
                code += 1
                k += 1
            code <<= 1


# ---------------------------------------------------------------------
# bit I/O with 0xFF stuffing
# ---------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _entropy_segments(data: bytes, pos: int) -> list[np.ndarray]:
    """Unstuffed entropy bytes from the scan start to the next real
    marker, split at RSTn boundaries (each segment is byte-aligned).
    Iterates only over 0xFF positions — everything else is bulk."""
    arr = np.frombuffer(data, dtype=np.uint8)
    n = len(arr)
    ff = np.nonzero(arr[pos:] == 0xFF)[0] + pos
    segs: list[np.ndarray] = []
    parts: list[np.ndarray] = []
    i = pos
    for f in ff:
        f = int(f)
        if f < i:
            continue
        nxt = int(arr[f + 1]) if f + 1 < n else 0xD9
        if nxt == 0x00:                       # stuffed 0xFF data byte
            parts.append(arr[i:f + 1])
            i = f + 2
        elif 0xD0 <= nxt <= 0xD7:             # RSTn: segment boundary
            parts.append(arr[i:f])
            segs.append(np.concatenate(parts) if parts
                        else np.empty(0, np.uint8))
            parts = []
            i = f + 2
        else:                                  # EOI / next real marker
            parts.append(arr[i:f])
            i = f
            break
    else:
        parts.append(arr[i:n])
    segs.append(np.concatenate(parts) if parts else np.empty(0, np.uint8))
    return segs


def _bit_windows(seg: np.ndarray) -> np.ndarray:
    """val16[i] = the 16 bits starting at bit offset i, as an int —
    one vectorized pass; the decode loop then peeks in O(1).

    Built from a per-byte rolling 32-bit word (b[j]<<24 | b[j+1]<<16 |
    b[j+2]<<8 | b[j+3]) shifted by the intra-byte offset — n x 8 int
    ops total, no (n_bits x 16) sliding-window materialization (which
    made decode superlinear in image size)."""
    # 20 trailing zero bytes pad val16 by 128 bit positions past the
    # segment end, so a truncated scan reaches the bp >= bit_limit
    # ValueError check instead of an IndexError on the peek
    b = np.concatenate([seg, np.zeros(20, dtype=np.uint8)]).astype(np.int64)
    w = (b[:-4] << 24) | (b[1:-3] << 16) | (b[2:-2] << 8) | b[3:-1]
    return (((w[:, None] << np.arange(8, dtype=np.int64)[None, :])
             >> 16) & 0xFFFF).reshape(-1)


def _extend(v: int, t: int) -> int:
    return v - ((1 << t) - 1) if t and v < (1 << (t - 1)) else v


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------

def _component_symbols(zz: np.ndarray):
    """Per-block (dc_sym, dc_bits_val, ac_list) streams for one
    component's zigzagged quantized coefficients (nb, 64). DC is
    differential across blocks in scan order."""
    nb = zz.shape[0]
    prev = 0
    dc_syms = np.empty(nb, dtype=np.int64)
    dc_vals = np.empty(nb, dtype=np.int64)
    ac_streams = []
    for i in range(nb):
        row = zz[i]
        diff = int(row[0]) - prev
        prev = int(row[0])
        t = _category(diff)
        dc_syms[i] = t
        dc_vals[i] = diff if diff >= 0 else diff + (1 << t) - 1
        acs = []
        nz = np.nonzero(row[1:])[0]
        pos = 0
        for j in nz:
            run = int(j) - pos
            while run > 15:
                acs.append((0xF0, 0, 0))       # ZRL
                run -= 16
            v = int(row[1 + j])
            s = _category(v)
            acs.append(((run << 4) | s, s,
                        v if v >= 0 else v + (1 << s) - 1))
            pos = int(j) + 1
        if pos < 63:
            acs.append((0x00, 0, 0))           # EOB
        ac_streams.append(acs)
    return dc_syms, dc_vals, ac_streams


def _category_vec(v: np.ndarray) -> np.ndarray:
    """Vectorized T.81 SSSS category: |v|.bit_length(). Exact for
    |v| < 2**52 (log2 of exact ints is float-exact at the boundaries
    that matter: 2**k -> k, and 2**k + 1 rounds strictly above k)."""
    return np.ceil(np.log2(np.abs(v) + 1.0)).astype(np.int64)


def _symbol_stream(comp_zz: list[np.ndarray]):
    """Vectorized F.1.2 symbol enumeration for the interleaved 1x1
    scan — the all-NumPy replacement for per-block _component_symbols
    (kept for the conformance tests).

    Emission order is encoded in a sort key (mcu, component, slot):
    slot 0/1 = DC symbol / DC appended bits, 8k+0..2 = ZRLs preceding
    the coefficient at zigzag position k, 8k+4/+5 = its RRRRSSSS
    symbol / appended bits, 512 = EOB. Returns (vals, lens, is_sym,
    tsel) in stream order: is_sym rows are Huffman symbols (vals =
    symbol byte; tsel = table 0 luma-DC / 1 luma-AC / 2 chroma-DC /
    3 chroma-AC), the rest raw appended-bit entries (vals, lens)."""
    nc = len(comp_zz)
    nb = comp_zz[0].shape[0]
    kspan = np.int64(8 * 64 + 8)
    keys, vals, lens, is_sym, tsel = [], [], [], [], []

    def add(k, v, ln, sym, t):
        keys.append(k.astype(np.int64))
        vals.append(v.astype(np.int64))
        lens.append(ln.astype(np.int64))
        is_sym.append(sym)
        tsel.append(t.astype(np.int64))

    one = np.int64(1)
    for ci, zz in enumerate(comp_zz):
        base = (np.arange(nb, dtype=np.int64) * nc + ci) * kspan
        tdc = 0 if ci == 0 else 2
        tac = tdc + 1

        # DC: differential across scan order, prev = 0 at start
        diff = np.diff(zz[:, 0], prepend=np.int64(0))
        t = _category_vec(diff)
        add(base, t, np.zeros(nb, np.int64), np.ones(nb, bool),
            np.full(nb, tdc, np.int64))
        m = t > 0
        dcv = np.where(diff >= 0, diff, diff + (one << t) - 1)
        nm = int(m.sum())
        add(base[m] + 1, dcv[m], t[m], np.zeros(nm, bool),
            np.zeros(nm, np.int64))

        # AC: runs between nonzeros, ZRL for each full 16-run, EOB
        acs = zz[:, 1:]
        bi, j = np.nonzero(acs)                  # row-major = scan order
        k = (j + 1).astype(np.int64)
        v = acs[bi, j]
        if len(bi):
            first = np.r_[True, bi[1:] != bi[:-1]]
            prevk = np.where(first, 0, np.r_[np.int64(0), k[:-1]])
        else:
            prevk = k
        run = k - prevk - 1
        s = _category_vec(v)
        nzrl = run >> 4
        if int(nzrl.sum()):
            zi = np.repeat(np.arange(len(k)), nzrl)
            zoff = (np.arange(len(zi), dtype=np.int64)
                    - np.repeat(np.cumsum(nzrl) - nzrl, nzrl))
            nz = len(zi)
            add(base[bi[zi]] + 8 * k[zi] + zoff,
                np.full(nz, 0xF0, np.int64), np.zeros(nz, np.int64),
                np.ones(nz, bool), np.full(nz, tac, np.int64))
        add(base[bi] + 8 * k + 4, ((run & 15) << 4) | s,
            np.zeros(len(k), np.int64), np.ones(len(k), bool),
            np.full(len(k), tac, np.int64))
        av = np.where(v >= 0, v, v + (one << s) - 1)
        add(base[bi] + 8 * k + 5, av, s, np.zeros(len(k), bool),
            np.zeros(len(k), np.int64))
        lastk = np.max(np.where(acs != 0,
                                np.arange(1, 64, dtype=np.int64)[None, :],
                                0), axis=1)
        e = lastk < 63
        ne = int(e.sum())
        add(base[e] + 8 * 64, np.zeros(ne, np.int64),
            np.zeros(ne, np.int64), np.ones(ne, bool),
            np.full(ne, tac, np.int64))

    order = np.argsort(np.concatenate(keys), kind="stable")
    return (np.concatenate(vals)[order], np.concatenate(lens)[order],
            np.concatenate(is_sym)[order], np.concatenate(tsel)[order])


def _pack_bits(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Vectorized MSB-first bit packing: 1-padding to the byte
    boundary and T.81 0xFF00 stuffing, matching _BitWriter bit for
    bit."""
    total = int(lens.sum())
    starts = np.cumsum(lens) - lens
    j = np.repeat(np.arange(len(vals)), lens)
    within = np.arange(total, dtype=np.int64) - starts[j]
    bits = ((vals[j] >> (lens[j] - 1 - within)) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, np.uint8)])
    by = np.packbits(bits)
    stuff = np.nonzero(by == 0xFF)[0]
    if len(stuff):
        by = np.insert(by, stuff + 1, 0)
    return by.tobytes()


def jpeg_encode(px: np.ndarray, quality: int = 92) -> bytes:
    """Encode (h, w, 3) or (h, w) uint8 pixels as baseline JFIF JPEG
    with per-image optimized Huffman tables."""
    px = np.asarray(px)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    planes = [px.astype(np.float64)] if gray else \
        list(np.moveaxis(_rgb_to_ycbcr(px), -1, 0))
    qts = [_quality_scale(QT_LUMA, quality)] + \
        ([] if gray else [_quality_scale(QT_CHROMA, quality)])

    # pad to 8 multiple by edge replication, DCT + quantize, zigzag
    comp_zz = []
    for ci, plane in enumerate(planes):
        ph = -(-h // 8) * 8
        pw = -(-w // 8) * 8
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = _blockify(plane - 128.0)
        coefs = np.einsum("ij,njk,lk->nil", _D, blocks, _D)
        qt = qts[min(ci, len(qts) - 1)].reshape(8, 8).astype(np.float64)
        q = np.round(coefs / qt).astype(np.int64)
        comp_zz.append(q.reshape(-1, 64)[:, ZZ])

    svals, slens, s_is_sym, s_tsel = _symbol_stream(comp_zz)

    # gather symbol statistics -> optimized tables (luma: comp 0;
    # chroma: comps 1+2 share, as SOF0's table-id convention expects)
    ntab = 2 if gray else 4
    tabs = [build_huff_table(np.bincount(svals[s_is_sym & (s_tsel == t)],
                                         minlength=256))
            for t in range(ntab)]
    dc_tabs = [tabs[0]] + ([] if gray else [tabs[2]])
    ac_tabs = [tabs[1]] + ([] if gray else [tabs[3]])
    code_lut = np.zeros((ntab, 256), dtype=np.int64)
    len_lut = np.zeros((ntab, 256), dtype=np.int64)
    for t in range(ntab):
        for symv, (code, ln) in _assign_codes(*tabs[t]).items():
            code_lut[t, symv] = code
            len_lut[t, symv] = ln

    # ---- headers --------------------------------------------------
    out = bytearray()
    out += b"\xFF\xD8"                                    # SOI
    out += b"\xFF\xE0" + (16).to_bytes(2, "big") + \
        b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"   # APP0
    for tid, qt in enumerate(qts):
        out += b"\xFF\xDB" + (67).to_bytes(2, "big") + bytes([tid]) \
            + bytes(int(v) for v in qt[ZZ])               # DQT (zigzag)
    nc = 1 if gray else 3
    sof = bytearray()
    sof += bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([nc])
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        sof += bytes([ci + 1, 0x11, tid])                 # 1x1 sampling
    out += b"\xFF\xC0" + (len(sof) + 2).to_bytes(2, "big") + sof

    def emit_dht(tc, th, bits, huffval):
        seg = bytes([(tc << 4) | th]) \
            + bytes(int(bits[i]) for i in range(1, 17)) \
            + bytes(huffval)
        return b"\xFF\xC4" + (len(seg) + 2).to_bytes(2, "big") + seg

    for ti, (t_dc, t_ac) in enumerate(zip(dc_tabs, ac_tabs)):
        out += emit_dht(0, ti, *t_dc)
        out += emit_dht(1, ti, *t_ac)

    sos = bytearray([nc])
    for ci in range(nc):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + (len(sos) + 2).to_bytes(2, "big") + sos

    # ---- entropy-coded segment (interleaved MCUs, 1x1 => one block
    # of each component per MCU): symbols -> canonical codes, then one
    # vectorized bit-pack ---------------------------------------------
    sidx = np.where(s_is_sym, svals, 0)      # raw bit patterns can be >255
    out_vals = np.where(s_is_sym, code_lut[s_tsel, sidx], svals)
    out_lens = np.where(s_is_sym, len_lut[s_tsel, sidx], slens)
    out += _pack_bits(out_vals, out_lens)
    out += b"\xFF\xD9"                                    # EOI
    return bytes(out)


# ---------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------

def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (8-bit, 4:4:4 or grayscale).
    Returns (h, w, 3) uint8 for color, (h, w) for grayscale."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker sync lost at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:   # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue          # standalone
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:   # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                raster = np.empty(64, dtype=np.int32)
                raster[ZZ] = zz
                qtabs[tq] = raster
                p += 65
        elif marker in (0xC0, 0xC1):   # SOF0/1 baseline
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled chroma not supported (4:4:4 only)")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{marker:02X}")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = np.zeros(17, dtype=np.int64)
                bits[1:17] = np.frombuffer(seg[p + 1:p + 17],
                                           dtype=np.uint8)
                n = int(bits.sum())
                huffval = list(seg[p + 17:p + 17 + n])
                dec = _HuffDecoder(bits, huffval)
                htabs[(tc, th)] = (dec.lut_sym, dec.lut_len)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for si in range(ns):
                cs, tt = seg[1 + 2 * si:3 + 2 * si]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 15})
            pos += seglen
            break
        pos += seglen
    if comps is None or scan is None:
        raise ValueError("missing SOF/SOS")

    nc = len(comps)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nbx, nby = pw // 8, ph // 8
    nb = nbx * nby
    coefs = [np.zeros((nb, 64), dtype=np.int64) for _ in range(nc)]
    order = []  # scan-order component index per scan entry
    for s in scan:
        ci = next(i for i, c in enumerate(comps) if c["id"] == s["cs"])
        order.append((ci, s["td"], s["ta"]))

    segments = _entropy_segments(data, pos)
    seg_idx = 0
    val16 = _bit_windows(segments[0])
    bit_limit = len(segments[0]) * 8
    bp = 0                       # bit cursor within the current segment
    pred = [0] * nc
    mcu = 0
    while mcu < nb:
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1         # RSTn: next byte-aligned segment
            if seg_idx >= len(segments):
                break
            val16 = _bit_windows(segments[seg_idx])
            bit_limit = len(segments[seg_idx]) * 8
            bp = 0
            pred = [0] * nc
        for ci, td, ta in order:
            dc_sym, dc_len = htabs[(0, td)]
            ac_sym, ac_len = htabs[(1, ta)]
            peek = val16[bp]
            t = int(dc_sym[peek])
            if t < 0 or bp >= bit_limit:
                raise ValueError("invalid Huffman code / truncated scan")
            bp += int(dc_len[peek])
            if t:
                pred[ci] += _extend(int(val16[bp]) >> (16 - t), t)
                bp += t
            row = coefs[ci][mcu]
            row[0] = pred[ci]
            k = 1
            while k < 64:
                peek = val16[bp]
                rs = int(ac_sym[peek])
                if rs < 0 or bp >= bit_limit:
                    raise ValueError(
                        "invalid Huffman code / truncated scan")
                bp += int(ac_len[peek])
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break            # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                row[k] = _extend(int(val16[bp]) >> (16 - s), s)
                bp += s
                k += 1
        mcu += 1

    planes = []
    for ci, comp in enumerate(comps):
        qt = qtabs[comp["tq"]].astype(np.float64)
        blocks = np.empty((nb, 64))
        blocks[:, ZZ] = coefs[ci].astype(np.float64)  # unzigzag first
        blocks *= qt[None, :]                         # raster-order table
        blocks = blocks.reshape(nb, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", _D, blocks, _D) + 128.0
        planes.append(_unblockify(spatial, ph, pw)[:h, :w])
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if nc != 3:
        raise NotImplementedError(f"{nc}-component scan")
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
