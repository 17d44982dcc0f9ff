"""q142 histogram equalization: remap matches a per-pixel loop and
the degenerate uniform image maps to zero."""
import numpy as np

from proj_ray.images import synth_pixels


def _eq(lum):
    hist = np.bincount(lum, minlength=256)
    cdf = np.cumsum(hist)
    npx = int(cdf[-1])
    cmin = int(cdf[np.flatnonzero(hist)[0]])
    if npx == cmin:
        return np.zeros_like(lum)
    return (cdf - cmin) * 255 // (npx - cmin)


def test_equalize_matches_loop():
    px = synth_pixels(7, 32, 24).astype(np.int64)
    lum = ((px[..., 0] * 299 + px[..., 1] * 587
            + px[..., 2] * 114) // 1000).ravel()
    table = _eq(lum)
    got = table[lum]
    hist = np.bincount(lum, minlength=256)
    cdf = np.cumsum(hist)
    npx, cmin = int(cdf[-1]), int(cdf[np.flatnonzero(hist)[0]])
    for v in np.unique(lum):
        want = (int(cdf[v]) - cmin) * 255 // (npx - cmin)
        assert (got[lum == v] == want).all()
    # equalized output spans the full range
    assert got.max() == 255 and got.min() == 0


def test_uniform_image_maps_to_zero():
    lum = np.full(100, 42, dtype=np.int64)
    assert (_eq(lum)[lum] == 0).all()
