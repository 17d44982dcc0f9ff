import numpy as np

from proj_ray.images import synth_pixels
from proj_ray.video import (FrameSampler, make_videos_batch, n_frames_of,
                            video_encode, video_frame, video_header)


def test_video_container_roundtrip():
    data = video_encode(11)
    nf, w, h, fps, offs, base = video_header(data)
    assert (nf, w, h, fps) == (n_frames_of(11), 16, 12, 24)
    for f in (0, nf // 2, nf - 1):
        assert (video_frame(data, f)
                == synth_pixels(11 * 131 + f * 17, 16, 12)).all()


def test_frame_seek_is_partial(monkeypatch):
    """Sampling must decompress only the sampled frames' byte ranges."""
    import zlib as z

    import proj_ray.video as V

    data = video_encode(3)
    nf = n_frames_of(3)
    calls = []
    orig = z.decompress
    monkeypatch.setattr(V.zlib, "decompress",
                        lambda b: calls.append(len(b)) or orig(b))
    b = make_videos_batch(3, 1)
    out = FrameSampler(every_k=4)(
        {k: v for k, v in b.items()})
    assert len(calls) == len(range(0, nf, 4))  # not nf
    assert len(out["frame_no"]) == len(range(0, nf, 4))
    f0 = synth_pixels(3 * 131, 16, 12).reshape(-1, 3).sum(axis=0)
    assert (out["sum_r"][0], out["sum_g"][0], out["sum_b"][0]) == tuple(f0)


def test_videos_dataset(ray_session):
    from proj_ray.video import frame_sample, videos_dataset

    out = frame_sample(videos_dataset(20, parallelism=2),
                       every_k=5).to_pandas()
    expect = sum(len(range(0, n_frames_of(i), 5)) for i in range(20))
    assert len(out) == expect
    assert set(out.columns) == {"video_id", "frame_no",
                                "sum_r", "sum_g", "sum_b"}
