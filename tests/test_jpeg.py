"""Dedicated tests for the pure-NumPy baseline JPEG codec
(proj_ray/jpeg.py) — the real-codec counterpart of the reference's
image-payload handling. Ray-free; pure kernel coverage."""
import numpy as np
import pytest

from proj_ray import jpeg as J
from proj_ray.images import psnr, synth_pixels


def _noise_rgb(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


def test_roundtrip_psnr_fixture_quality():
    px = synth_pixels(3, 64, 48)
    out = J.jpeg_decode(J.jpeg_encode(px, quality=98))
    assert out.shape == px.shape and out.dtype == np.uint8
    assert psnr(px, out) >= 40.0


def test_quality_orders_psnr():
    px = synth_pixels(7, 48, 40)
    lo = psnr(px, J.jpeg_decode(J.jpeg_encode(px, quality=30)))
    hi = psnr(px, J.jpeg_decode(J.jpeg_encode(px, quality=95)))
    assert hi > lo > 10.0


def test_quality_extremes_still_decode():
    px = _noise_rgb(24, 24, seed=1)
    for q in (1, 50, 100):
        out = J.jpeg_decode(J.jpeg_encode(px, quality=q))
        assert out.shape == px.shape


def test_grayscale_roundtrip():
    g = synth_pixels(5, 40, 32)[:, :, 0]
    blob = J.jpeg_encode(g, quality=95)
    out = J.jpeg_decode(blob)
    assert out.shape == g.shape and out.ndim == 2
    assert psnr(g, out) >= 38.0


@pytest.mark.parametrize("h,w", [(1, 1), (7, 5), (17, 13), (8, 8),
                                 (9, 64), (64, 9)])
def test_odd_dimensions_preserved(h, w):
    px = _noise_rgb(h, w, seed=h * 100 + w)
    out = J.jpeg_decode(J.jpeg_encode(px, quality=90))
    assert out.shape == (h, w, 3)


def test_deterministic_bytes():
    px = synth_pixels(11, 32, 24)
    assert J.jpeg_encode(px, quality=92) == J.jpeg_encode(px, quality=92)


def test_marker_envelope():
    blob = J.jpeg_encode(_noise_rgb(16, 16), quality=80)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    # JFIF APP0 comes first after SOI
    assert blob[2:4] == b"\xff\xe0" and blob[6:11] == b"JFIF\x00"


def test_byte_stuffing_survives_high_entropy():
    # noise maximizes entropy-coded 0xFF bytes -> exercises stuffing on
    # both sides; decode must not lose marker sync
    px = _noise_rgb(48, 48, seed=7)
    blob = J.jpeg_encode(px, quality=100)
    out = J.jpeg_decode(blob)
    assert out.shape == px.shape


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        J.jpeg_decode(b"PNG\x00not really")


def test_progressive_sof_raises():
    blob = bytearray(J.jpeg_encode(_noise_rgb(8, 8), quality=90))
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 1] = 0xC2            # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        J.jpeg_decode(bytes(blob))


def test_truncated_scan_raises():
    blob = J.jpeg_encode(synth_pixels(2, 32, 32), quality=90)
    with pytest.raises(ValueError):
        J.jpeg_decode(blob[:len(blob) // 2])


def test_empty_image_rejected():
    with pytest.raises(ValueError):
        J.jpeg_encode(np.zeros((0, 4, 3), dtype=np.uint8))


def test_dri_marker_parses():
    # splice a DRI segment (restart_interval=9999, larger than the MCU
    # count -> semantically a no-op) before SOS; decode must match the
    # un-spliced stream exactly
    px = synth_pixels(4, 24, 16)
    blob = J.jpeg_encode(px, quality=95)
    i = blob.find(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04" + (9999).to_bytes(2, "big")
    out = J.jpeg_decode(blob[:i] + dri + blob[i:])
    assert np.array_equal(out, J.jpeg_decode(blob))


def test_entropy_segments_unstuff_and_split():
    # 0xFF00 unstuffs to 0xFF; RSTn markers split segments; the next
    # real marker terminates
    data = (b"\x01\xff\x00\x02"          # seg0: 01 FF 02
            b"\xff\xd0"                   # RST0
            b"\x03\x04"                   # seg1: 03 04
            b"\xff\xd9")                  # EOI terminates
    segs = J._entropy_segments(data, 0)
    assert [list(s) for s in segs] == [[1, 0xFF, 2], [3, 4]]


def _encode_gray_with_restarts(g: np.ndarray, quality: int,
                               interval: int) -> bytes:
    """Conforming grayscale encoder with DRI/RSTn, built from the
    module's own primitives: DC prediction resets at every restart and
    each entropy segment is byte-aligned, per T.81 E.1.4/F.1.2.3."""
    h, w = g.shape
    qt = J._quality_scale(J.QT_LUMA, quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    plane = np.pad(g.astype(np.float64), ((0, ph - h), (0, pw - w)),
                   mode="edge")
    blocks = J._blockify(plane - 128.0)
    coefs = np.einsum("ij,njk,lk->nil", J._D, blocks, J._D)
    q = np.round(coefs / qt.reshape(8, 8).astype(np.float64))
    zz = q.astype(np.int64).reshape(-1, 64)[:, J.ZZ]

    # per-restart-segment symbol streams (prev DC = 0 at each start)
    nb = zz.shape[0]
    seg_streams = [J._component_symbols(zz[i:i + interval])
                   for i in range(0, nb, interval)]
    dc_freq = np.zeros(256, dtype=np.int64)
    ac_freq = np.zeros(256, dtype=np.int64)
    for dc_syms, _, ac in seg_streams:
        np.add.at(dc_freq, dc_syms, 1)
        for acs in ac:
            for sym, _, _ in acs:
                ac_freq[sym] += 1
    dc_tab = J.build_huff_table(dc_freq)
    ac_tab = J.build_huff_table(ac_freq)
    dc_codes = J._assign_codes(*dc_tab)
    ac_codes = J._assign_codes(*ac_tab)

    out = bytearray(b"\xFF\xD8")
    out += b"\xFF\xE0" + (16).to_bytes(2, "big") + \
        b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xFF\xDB" + (67).to_bytes(2, "big") + b"\x00" \
        + bytes(int(v) for v in qt[J.ZZ])
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([1, 1, 0x11, 0])
    out += b"\xFF\xC0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for tc, (bits, huffval) in ((0, dc_tab), (1, ac_tab)):
        seg = bytes([tc << 4]) \
            + bytes(int(bits[i]) for i in range(1, 17)) + bytes(huffval)
        out += b"\xFF\xC4" + (len(seg) + 2).to_bytes(2, "big") + seg
    out += b"\xFF\xDD\x00\x04" + interval.to_bytes(2, "big")   # DRI
    out += b"\xFF\xDA" + (8).to_bytes(2, "big") + bytes(
        [1, 1, 0x00, 0, 63, 0])
    for si, (dc_syms, dc_vals, ac) in enumerate(seg_streams):
        if si:
            out += bytes([0xFF, 0xD0 + ((si - 1) % 8)])       # RSTn
        bw = J._BitWriter()
        for i in range(len(dc_syms)):
            code, ln = dc_codes[int(dc_syms[i])]
            bw.put(code, ln)
            if dc_syms[i]:
                bw.put(int(dc_vals[i]), int(dc_syms[i]))
            for sym, s, v in ac[i]:
                code, ln = ac_codes[sym]
                bw.put(code, ln)
                if s:
                    bw.put(v, s)
        bw.flush()
        out += bw.buf
    out += b"\xFF\xD9"
    return bytes(out)


@pytest.mark.parametrize("interval", [1, 3])
def test_restart_markers_decode(interval):
    # decoded pixels depend only on the quantized coefficients, so the
    # RST-segmented stream must decode byte-identically to the plain
    # single-segment encoding of the same image
    g = synth_pixels(6, 32, 16)[:, :, 1]  # 8 blocks
    want = J.jpeg_decode(J.jpeg_encode(g, quality=95))
    got = J.jpeg_decode(_encode_gray_with_restarts(g, 95, interval))
    assert np.array_equal(want, got)
