"""Vectorized, process-stable 64-bit hashing helpers.

Used for deterministic sampling, bucket splitting and band keys in
full-dataset passes — NO per-row Python (hashlib) loops in hot paths.

- integers: splitmix64 finalizer (pure numpy, branch-free)
- strings/objects: pandas.util.hash_array — SipHash-1-3 with a fixed
  key, deterministic across processes and machines (unlike builtin
  ``hash()``, which PYTHONHASHSEED salts per process).

Round-3 note: these replace earlier per-row ``hashlib.blake2b`` loops;
hash VALUES changed, so hash-derived samples / bucket splits differ
from round 2 (documented in BASELINE.md). Collision behavior is
equivalent.
"""

from __future__ import annotations

import numpy as np

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 -> well-mixed uint64."""
    x = np.asarray(x).astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _SM_GAMMA
        x ^= x >> np.uint64(30)
        x *= _SM_M1
        x ^= x >> np.uint64(27)
        x *= _SM_M2
        x ^= x >> np.uint64(31)
    return x


def stable_u64(values) -> np.ndarray:
    """Deterministic uint64 per element, fully vectorized."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return splitmix64(arr)
    from pandas.util import hash_array

    return hash_array(arr.astype(object), categorize=False)


def stable_mod(values, m: int) -> np.ndarray:
    """Deterministic residue in [0, m) per element (int64)."""
    return (stable_u64(values) % np.uint64(m)).astype(np.int64)


def content_digest64(buffers) -> np.ndarray:
    """Vectorized 64-bit content digest of variable-length byte
    buffers (int64 per buffer): group same-length buffers, stack them
    into one contiguous uint8 matrix, view as uint64 words and fold
    column-by-column with chained splitmix64 — the work is O(total
    bytes) of numpy column ops across the group, with NO per-row
    hashlib call. The chain is seeded with the buffer length so equal
    prefixes of different lengths cannot collide trivially.

    Used for content keys (e.g. decoded-pixel dedup) where the only
    contract is deterministic equal-content -> equal-key with 64-bit
    collision odds — not cryptographic strength.
    """
    n = len(buffers)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in buffers), dtype=np.int64,
                       count=n)
    order = np.argsort(lens, kind="stable")
    i = 0
    while i < n:
        length = int(lens[order[i]])
        j = i
        while j < n and lens[order[j]] == length:
            j += 1
        idx = order[i:j]
        pad = (-length) % 8
        blob = b"".join(bytes(buffers[t]) + b"\x00" * pad for t in idx)
        words = np.frombuffer(blob, dtype=np.uint64).reshape(
            len(idx), (length + pad) // 8) if length else \
            np.zeros((len(idx), 0), dtype=np.uint64)
        h = splitmix64(np.full(len(idx), np.uint64(length)))
        for c in range(words.shape[1]):
            h = splitmix64(h ^ words[:, c])
        out[idx] = h.view(np.int64)
        i = j
    return out
