"""q133 scene cuts: container decode path matches direct synthesis."""
import numpy as np

from proj_ray.video import video_encode, video_frame, video_header


def _synth_frame(i, f):
    s = i * 131 + f * 17
    y = np.arange(12, dtype=np.int64)[:, None]
    x = np.arange(16, dtype=np.int64)[None, :]
    r = (s * 37 + y * 11 + x * 7) % 256
    g = (s * 53 + y * 5 + x * 13) % 256
    b = (s * 97 + (y + x) * 3) % 256
    return np.stack([r, g, b], axis=-1)


def test_pair_diffs_match_synthesis():
    for i in (0, 3, 11):
        data = video_encode(i)
        nf = video_header(data)[0]
        assert nf == 8 + (i % 5) * 4
        for f in range(1, nf):
            a = video_frame(data, f).astype(np.int64)
            b = video_frame(data, f - 1).astype(np.int64)
            la = (a[..., 0] * 299 + a[..., 1] * 587
                  + a[..., 2] * 114) // 1000
            lb = (b[..., 0] * 299 + b[..., 1] * 587
                  + b[..., 2] * 114) // 1000
            sa, sb = _synth_frame(i, f), _synth_frame(i, f - 1)
            wa = (sa[..., 0] * 299 + sa[..., 1] * 587
                  + sa[..., 2] * 114) // 1000
            wb = (sb[..., 0] * 299 + sb[..., 1] * 587
                  + sb[..., 2] * 114) // 1000
            assert int(np.abs(la - lb).sum()) == int(np.abs(wa - wb).sum())
