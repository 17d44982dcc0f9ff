"""Synthetic video table + frame-sampling stage.

A "video" is an opaque binary column holding an indexed container
(magic FVID): per-frame zlib streams behind an offset table, so a
frame-sampling stage seeks straight to the k-th frame's byte range and
decompresses ONLY sampled frames — the shape a real container parser
(mp4 stbl/stco) gives you. No video libs exist in this container, so
the codec is the honest deterministic stand-in (each frame is a
synth_pixels pattern); the Ray-side plumbing — schema, actor stage,
per-frame output layout, partial decode — is real and oracle-tested.

Layout: b"FVID" | >HHHH n_frames,w,h,fps | >I offsets[n_frames+1]
        | concat(zlib(frame_f)) — offsets relative to payload start.
Frame f of video i has pixel seed i*131 + f*17 (proj_ray/images.py
synth_pixels formula), so any worker can regenerate any frame.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from proj_ray.images import synth_pixels

_MAGIC = b"FVID"
_W, _H = 16, 12


def n_frames_of(i: int) -> int:
    """Deterministic frame count for video i: 8..24."""
    return 8 + (i % 5) * 4


def video_encode(i: int) -> bytes:
    nf = n_frames_of(i)
    frames = [zlib.compress(
        synth_pixels(i * 131 + f * 17, _W, _H).tobytes(), 6)
        for f in range(nf)]
    offs = np.zeros(nf + 1, dtype=">u4")
    offs[1:] = np.cumsum([len(b) for b in frames])
    return (_MAGIC + struct.pack(">HHHH", nf, _W, _H, 24)
            + offs.tobytes() + b"".join(frames))


def video_header(data: bytes):
    if data[:4] != _MAGIC:
        raise ValueError("not an FVID blob")
    nf, w, h, fps = struct.unpack(">HHHH", data[4:12])
    offs = np.frombuffer(data, dtype=">u4", count=nf + 1, offset=12)
    return nf, w, h, fps, offs, 12 + 4 * (nf + 1)


def video_frame(data: bytes, f: int) -> np.ndarray:
    """Decode a single frame by byte-range seek (no full-blob decode)."""
    nf, w, h, _, offs, base = video_header(data)
    if not 0 <= f < nf:
        raise IndexError(f"frame {f} of {nf}")
    raw = zlib.decompress(data[base + offs[f]:base + offs[f + 1]])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def make_videos_batch(start: int, count: int) -> dict:
    return make_videos_for(np.arange(start, start + count,
                                     dtype=np.int64))


def make_videos_for(idx: np.ndarray) -> dict:
    idx = np.asarray(idx, dtype=np.int64)
    count = len(idx)
    blobs = np.empty(count, dtype=object)
    nfs = np.empty(count, dtype=np.int32)
    for k, i in enumerate(idx):
        blobs[k] = video_encode(int(i))
        nfs[k] = n_frames_of(int(i))
    return {
        "video_id": np.array([f"vid{i:012d}" for i in idx], dtype=object),
        "bytes": blobs,
        "n_frames": nfs,
        "w": np.full(count, _W, dtype=np.int32),
        "h": np.full(count, _H, dtype=np.int32),
        "fps": np.full(count, 24, dtype=np.int32),
    }


def videos_dataset(n_rows: int, parallelism: int = 8):
    """Dataset of the synthetic videos table, generated shard-wise on
    workers (mirrors images_dataset: rd.range base so fused downstream
    stages batch by real rows, not shard descriptors)."""
    import ray.data as rd

    def gen(batch):
        import pandas as pd

        return pd.DataFrame(make_videos_for(batch["id"]))

    return rd.range(n_rows, override_num_blocks=max(parallelism, 1)) \
        .map_batches(gen, batch_format="numpy", batch_size=128)


class FrameSampler:
    """Actor-pool stage: emit every `every_k`-th frame of each video as
    one row of integer channel sums (video_id, frame_no, sum_r/g/b).
    Only sampled frames are decompressed (offset-table seek)."""

    def __init__(self, every_k: int = 3):
        self.k = every_k

    def __call__(self, b: dict) -> dict:
        ids, fnos, sums = [], [], []
        for j in range(len(b["video_id"])):
            data = b["bytes"][j]
            nf = int(b["n_frames"][j])
            for f in range(0, nf, self.k):
                px = video_frame(data, f)
                ids.append(b["video_id"][j])
                fnos.append(f)
                sums.append(px.reshape(-1, 3).sum(axis=0, dtype=np.int64))
        s = (np.stack(sums) if sums
             else np.empty((0, 3), dtype=np.int64))
        return {"video_id": np.array(ids, dtype=object),
                "frame_no": np.array(fnos, dtype=np.int64),
                "sum_r": s[:, 0], "sum_g": s[:, 1], "sum_b": s[:, 2]}


def frame_sample(ds, every_k: int = 3, concurrency=(2, 16),
                 batch_size: int = 64):
    return ds.map_batches(FrameSampler,
                          fn_constructor_kwargs=dict(every_k=every_k),
                          batch_format="numpy", batch_size=batch_size,
                          concurrency=concurrency)


def videos_table(n_rows: int, columns: list | None = None):
    """Cached stored-table read of the synthetic videos (see
    proj_ray.images.cached_table): frame sampling measures
    read+seek+decode, not fixture synthesis."""
    import ray.data as rd

    from proj_ray.images import cached_table

    path = cached_table(videos_dataset, "videos", n_rows)
    return rd.read_parquet(path, columns=columns)
