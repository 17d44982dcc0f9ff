"""Synthetic audio table + feature-extraction stage.

Audio rows are opaque binary blobs: a real RIFF/WAVE container
(PCM 16-bit mono — pure stdlib struct, no audio libs needed) whose
samples are a deterministic integer chirp  s[t] = ((i*7 + t*t*3)
% 4096) - 2048  so any worker (or the SQL oracle) can regenerate any
clip arithmetically. The feature stage is the real plumbing: an
actor-pool map_batches that parses WAV headers, windows the PCM, and
emits vectorized features (sum of squares for energy/RMS, sign-change
count for zero-crossing rate) — all integer-exact.
"""

from __future__ import annotations

import struct

import numpy as np

_SR = 8000


def n_samples_of(i: int) -> int:
    """Deterministic clip length for row i: 0.5-2.5 s at 8 kHz."""
    return _SR // 2 + (i % 5) * (_SR // 2)


def synth_samples(i: int, n: int) -> np.ndarray:
    t = np.arange(n, dtype=np.int64)
    return (((i * 7 + t * t * 3) % 4096) - 2048).astype(np.int16)


def wav_encode(samples: np.ndarray, sr: int = _SR) -> bytes:
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sr, sr * 2, 2, 16, b"data", len(data))
    return hdr + data


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV blob")
    fmt, ch, sr, _, _, bits = struct.unpack("<HHIIHH", blob[20:36])
    if (fmt, ch, bits) != (1, 1, 16):
        raise ValueError("only PCM16 mono supported")
    size = struct.unpack("<I", blob[40:44])[0]
    return np.frombuffer(blob, dtype="<i2", count=size // 2, offset=44), sr


def make_audio_batch(start: int, count: int) -> dict:
    return make_audio_for(np.arange(start, start + count,
                                    dtype=np.int64))


def make_audio_for(idx: np.ndarray) -> dict:
    idx = np.asarray(idx, dtype=np.int64)
    count = len(idx)
    blobs = np.empty(count, dtype=object)
    ns = np.empty(count, dtype=np.int32)
    for k, i in enumerate(idx):
        n = n_samples_of(int(i))
        blobs[k] = wav_encode(synth_samples(int(i), n))
        ns[k] = n
    return {
        "audio_id": np.array([f"aud{i:012d}" for i in idx], dtype=object),
        "bytes": blobs,
        "n_samples": ns,
        "sr": np.full(count, _SR, dtype=np.int32),
    }


def audio_dataset(n_rows: int, parallelism: int = 8):
    """rd.range base so fused downstream stages batch by real rows,
    not shard descriptors (see images_dataset)."""
    import ray.data as rd

    def gen(batch):
        import pandas as pd

        return pd.DataFrame(make_audio_for(batch["id"]))

    return rd.range(n_rows, override_num_blocks=max(parallelism, 1)) \
        .map_batches(gen, batch_format="numpy", batch_size=128)


class AudioFeatures:
    """Actor-pool stage: WAV parse -> integer-exact clip features.
    sum_sq (energy, the RMS numerator), zero_x (strict sign changes,
    zeros transparent — the usual ZCR numerator), peak (max |s|)."""

    def __call__(self, b: dict) -> dict:
        n = len(b["audio_id"])
        sum_sq = np.empty(n, dtype=np.int64)
        zero_x = np.empty(n, dtype=np.int64)
        peak = np.empty(n, dtype=np.int64)
        for k in range(n):
            s, _ = wav_decode(b["bytes"][k])
            v = s.astype(np.int64)
            sum_sq[k] = int(np.dot(v, v))
            sg = np.sign(v[v != 0])
            zero_x[k] = int(np.count_nonzero(sg[1:] != sg[:-1]))
            peak[k] = int(np.abs(v).max(initial=0))
        return {"audio_id": b["audio_id"], "sum_sq": sum_sq,
                "zero_x": zero_x, "peak": peak}


def audio_features(ds, concurrency=(2, 16), batch_size: int = 128):
    return ds.map_batches(AudioFeatures, batch_format="numpy",
                          batch_size=batch_size, concurrency=concurrency)


def audio_table(n_rows: int, columns: list | None = None):
    """Cached stored-table read of the synthetic audio clips (see
    proj_ray.images.cached_table)."""
    import ray.data as rd

    from proj_ray.images import cached_table

    path = cached_table(audio_dataset, "audio", n_rows)
    return rd.read_parquet(path, columns=columns)
