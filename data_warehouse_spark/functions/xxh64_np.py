"""Vectorized XXH64 (public xxHash spec, https://xxhash.com) over a
batch of variable-length byte strings — numpy only, bit-identical to
Spark's ``F.xxhash64`` on string input (seed 42, UTF-8 bytes).

Why it exists: the MinHash signature stage hashes every shingle of
every document. Inside the JVM that hash is cheap, but the surrounding
per-shingle machinery (interpreted higher-order-function lambdas,
Generate rows, 32 aggregate-buffer updates per row) dominates the
stage; moving the whole shingle->signature computation into one
mapInArrow kernel needs the hash itself reproduced EXACTLY, because
banding recall — and therefore the x2 family's oracle-checked output —
depends on the hash values bit for bit.

Vectorization strategy: rows are grouped by byte length; for a fixed
length the XXH64 control flow (number of 32-byte stripes, 8/4/1-byte
tail steps) is static, so every step is one numpy uint64 operation
over all rows of that length. Wrapping arithmetic is native to
np.uint64; rotations are shift-or pairs.

Equality with the JVM implementation is pinned by
tests/test_operators.py (fixture corpus + adversarial strings,
compared value-for-value against F.xxhash64).
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def _load64(w: np.ndarray, off: int) -> np.ndarray:
    """Little-endian uint64 load at byte offset `off` from the (n, L)
    uint8 window matrix."""
    acc = w[:, off].astype(np.uint64)
    for i in range(1, 8):
        acc |= w[:, off + i].astype(np.uint64) << np.uint64(8 * i)
    return acc


def _load32(w: np.ndarray, off: int) -> np.ndarray:
    acc = w[:, off].astype(np.uint64)
    for i in range(1, 4):
        acc |= w[:, off + i].astype(np.uint64) << np.uint64(8 * i)
    return acc


def _xxh64_fixed_len(w: np.ndarray, length: int, seed: int) -> np.ndarray:
    """XXH64 of n byte strings of identical `length`, given as an
    (n, length) uint8 matrix."""
    mask = (1 << 64) - 1
    seed_ = np.uint64(seed)
    n = w.shape[0]
    pos = 0
    if length >= 32:
        # init constants folded in Python ints (explicit mod-2^64 wrap;
        # a uint64 scalar add would warn on the intended overflow)
        v1 = np.full(n, np.uint64((seed + int(_P1) + int(_P2)) & mask),
                     dtype=np.uint64)
        v2 = np.full(n, np.uint64((seed + int(_P2)) & mask), dtype=np.uint64)
        v3 = np.full(n, seed_, dtype=np.uint64)
        v4 = np.full(n, np.uint64((seed - int(_P1)) & mask), dtype=np.uint64)
        while pos + 32 <= length:
            v1 = _rotl(v1 + _load64(w, pos) * _P2, 31) * _P1
            v2 = _rotl(v2 + _load64(w, pos + 8) * _P2, 31) * _P1
            v3 = _rotl(v3 + _load64(w, pos + 16) * _P2, 31) * _P1
            v4 = _rotl(v4 + _load64(w, pos + 24) * _P2, 31) * _P1
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18))
        for v in (v1, v2, v3, v4):
            h ^= _rotl(v * _P2, 31) * _P1
            h = h * _P1 + _P4
    else:
        h = np.full(n, seed_ + _P5, dtype=np.uint64)
    h = h + np.uint64(length)
    while pos + 8 <= length:
        h ^= _rotl(_load64(w, pos) * _P2, 31) * _P1
        h = _rotl(h, 27) * _P1 + _P4
        pos += 8
    if pos + 4 <= length:
        h ^= _load32(w, pos) * _P1
        h = _rotl(h, 23) * _P2 + _P3
        pos += 4
    while pos < length:
        h ^= w[:, pos].astype(np.uint64) * _P5
        h = _rotl(h, 11) * _P1
        pos += 1
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def xxh64_bytes(data: np.ndarray, offsets: np.ndarray,
                seed: int = 42) -> np.ndarray:
    """XXH64 of n byte strings packed in `data` (uint8) with n+1
    `offsets` (int64). Returns uint64 hashes in row order. Bit-equal
    to Spark's xxhash64 over the same bytes (Spark's default seed is
    42)."""
    lens = np.diff(offsets)
    n = len(lens)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    order = np.argsort(lens, kind="stable")
    sorted_lens = lens[order]
    # process one length class at a time: fixed control flow -> every
    # XXH64 step is a vector op over all rows of that length
    starts = np.flatnonzero(np.diff(sorted_lens, prepend=-1))
    for si, s in enumerate(starts):
        e = starts[si + 1] if si + 1 < len(starts) else n
        length = int(sorted_lens[s])
        rows = order[s:e]
        if length == 0:
            out[rows] = _xxh64_fixed_len(
                np.empty((len(rows), 0), dtype=np.uint8), 0, seed)
            continue
        idx = offsets[rows, None] + np.arange(length)
        out[rows] = _xxh64_fixed_len(data[idx], length, seed)
    return out
