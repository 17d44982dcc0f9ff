"""q132 sharpness: engine Laplacian matches a direct per-pixel loop."""
import numpy as np

from proj_ray.images import synth_pixels


def _loop_lap_abs(px):
    lum = (px[..., 0].astype(np.int64) * 299
           + px[..., 1].astype(np.int64) * 587
           + px[..., 2].astype(np.int64) * 114) // 1000
    h, w = lum.shape
    s = 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            s += abs(4 * lum[y, x] - lum[y - 1, x] - lum[y + 1, x]
                     - lum[y, x - 1] - lum[y, x + 1])
    return s, (h - 2) * (w - 2)


def test_laplacian_vectorized_matches_loop():
    for i, (w, h) in [(0, (16, 16)), (1, (32, 24)), (5, (64, 48))]:
        px = synth_pixels(i, w, h).astype(np.int64)
        lum = (px[..., 0] * 299 + px[..., 1] * 587
               + px[..., 2] * 114) // 1000
        L = (4 * lum[1:-1, 1:-1] - lum[:-2, 1:-1] - lum[2:, 1:-1]
             - lum[1:-1, :-2] - lum[1:-1, 2:])
        want_s, want_n = _loop_lap_abs(px)
        assert int(np.abs(L).sum()) == want_s
        assert L.size == want_n
