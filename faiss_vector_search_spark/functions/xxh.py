"""Spark-compatible xxHash64 in NumPy/Python — bit-identical to
``F.xxhash64(col, F.lit(seed))`` on string input.

Why this exists: the winnowing fingerprint pipeline hashes EVERY char
position of every document. As in-row SQL that is one interpreted
``xxhash64(substr(text, i, k))`` expression evaluation per position
(measured 2.6 s for one corpus pass at sf0.1 — the whole cost of
fingerprint_overlap); as a NumPy kernel the same hash family runs as
a handful of vectorized u64 ops per position. Equality with the JVM
expression is pytest-gated byte-for-byte, so swapping engines cannot
move a single fingerprint.

Spark semantics reproduced exactly (XXH64, the public xxHash spec):

- ``xxhash64(s)`` hashes the UTF-8 bytes of ``s`` with seed 42;
- ``xxhash64(s, lit(seed))`` CHAINS: the int literal is a second
  hashed VALUE, not the algorithm seed — Spark computes
  ``hashInt(seed, hashUnsafeBytes(s, 42))`` (4-byte int path).
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Pure-python XXH64 of ``data`` with ``seed`` — the any-length
    reference (and the non-ASCII / odd-gram fallback). Returns the
    UNSIGNED 64-bit hash."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h ^ k) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h ^ k, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * _P1) & _M), 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_int_chain(h1: int, value: int) -> int:
    """Spark's ``XXH64.hashInt(value, seed=h1)`` — the IntegerType
    second argument of ``xxhash64(col, lit(value))``. ``h1`` unsigned;
    returns SIGNED int64 (the Spark column value)."""
    h = (h1 + _P5 + 4) & _M
    h = (_rotl(h ^ ((value & 0xFFFFFFFF) * _P1) & _M, 23) * _P2 + _P3) & _M
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_str(s: str, seed: int) -> int:
    """Reference: ``F.xxhash64(lit(s), lit(seed))`` for one string."""
    return xxh64_int_chain(xxh64_bytes(s.encode("utf-8"), 42), seed)


# --- vectorized fixed-length path (ASCII text, gram length k < 32) ---

_NP1 = np.uint64(_P1)
_NP2 = np.uint64(_P2)
_NP3 = np.uint64(_P3)
_NP4 = np.uint64(_P4)
_NP5 = np.uint64(_P5)


def _nrotl(x: "np.ndarray", r: int) -> "np.ndarray":
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _navalanche(h: "np.ndarray") -> "np.ndarray":
    h = h ^ (h >> np.uint64(33))
    h = h * _NP2
    h = h ^ (h >> np.uint64(29))
    h = h * _NP3
    return h ^ (h >> np.uint64(32))


def xxh64_fixed_np(grams: "np.ndarray", seed: int) -> "np.ndarray":
    """Vectorized XXH64 over an (npos, k) uint8 matrix of FIXED-length
    byte strings, any k (k >= 32 runs the 4-lane stripe accumulator).
    Returns unsigned u64 per row — identical to :func:`xxh64_bytes`
    row-wise (pytest-gated)."""
    npos, k = grams.shape
    with np.errstate(over="ignore"):
        i = 0
        if k >= 32:
            v1 = np.full(npos, (seed + _P1 + _P2) & _M, dtype=np.uint64)
            v2 = np.full(npos, (seed + _P2) & _M, dtype=np.uint64)
            v3 = np.full(npos, seed & _M, dtype=np.uint64)
            v4 = np.full(npos, (seed - _P1) & _M, dtype=np.uint64)
            lanes = [v1, v2, v3, v4]
            while i + 32 <= k:
                for lane in range(4):
                    w = (
                        np.ascontiguousarray(
                            grams[:, i + 8 * lane:i + 8 * lane + 8]
                        )
                        .view("<u8")
                        .ravel()
                    )
                    lanes[lane] = (
                        _nrotl(lanes[lane] + w * _NP2, 31) * _NP1
                    )
                i += 32
            v1, v2, v3, v4 = lanes
            h = (
                _nrotl(v1, 1) + _nrotl(v2, 7)
                + _nrotl(v3, 12) + _nrotl(v4, 18)
            )
            for v in lanes:
                kk = _nrotl(v * _NP2, 31) * _NP1
                h = (h ^ kk) * _NP1 + _NP4
            h = h + np.uint64(k)
        else:
            h = np.full(npos, (seed + _P5 + k) & _M, dtype=np.uint64)
        while i + 8 <= k:
            w = np.ascontiguousarray(grams[:, i:i + 8]).view("<u8").ravel()
            k1 = _nrotl(w * _NP2, 31) * _NP1
            h = (_nrotl(h ^ k1, 27) * _NP1) + _NP4
            i += 8
        if i + 4 <= k:
            w4 = np.ascontiguousarray(grams[:, i:i + 4]).view("<u4").ravel().astype(np.uint64)
            h = (_nrotl(h ^ (w4 * _NP1), 23) * _NP2) + _NP3
            i += 4
        while i < k:
            b = grams[:, i].astype(np.uint64)
            h = _nrotl(h ^ (b * _NP5), 11) * _NP1
            i += 1
        return _navalanche(h)


def xxh64_int_chain_np(h1: "np.ndarray", value: int) -> "np.ndarray":
    """Vectorized :func:`xxh64_int_chain` over unsigned u64 hashes;
    returns SIGNED int64 Spark column values."""
    with np.errstate(over="ignore"):
        h = h1 + (_NP5 + np.uint64(4))
        k1 = np.uint64(value & 0xFFFFFFFF) * _NP1
        h = (_nrotl(h ^ k1, 23) * _NP2) + _NP3
        return _navalanche(h).view(np.int64)


def xxh64_bytes_many_np(items: list, seed: int) -> "np.ndarray":
    """Vectorized XXH64 over a batch of VARIABLE-length byte strings:
    bucket by length, hash each length class through
    :func:`xxh64_fixed_np` (one (m, L) uint8 matrix per distinct L).
    Distinct lengths are few in word-shingle workloads, so nearly the
    whole batch hashes in a handful of vectorized passes. Returns
    unsigned u64 per item, identical to :func:`xxh64_bytes` item-wise
    (pytest-gated)."""
    n = len(items)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=n)
    for length in np.unique(lens):
        idx = np.nonzero(lens == length)[0]
        if length == 0:
            out[idx] = np.uint64(
                xxh64_bytes(b"", seed)
            )
            continue
        mat = np.frombuffer(
            b"".join(items[i] for i in idx), dtype=np.uint8
        ).reshape(-1, int(length))
        out[idx] = xxh64_fixed_np(mat, seed)
    return out
