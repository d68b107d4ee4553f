"""Hashing for sketch inputs.

The reference leaves hashing to the caller, with the documented convention
of MurmurHash3 x64-128 under a constant seed shared by every sketch that
will ever be unioned (/root/reference/README.markdown:47-58, example seed
0x123456 at README.markdown:81).

Two paths:

- **JVM fast path** (production pipelines): ``pyspark.sql.functions.xxhash64``
  — a 64-bit uniform hash computed JVM-side inside whole-stage codegen, so
  raw values never cross the Arrow boundary. The reference's own test
  vectors pin *post-hash* behavior only, so the hash function is a config
  knob; the only hard rule is the constant shared seed.
- **Murmur3 x64-128 (AK convention)**: numpy-vectorized over uint64 lanes
  for already-fixed-width keys, plus a pure-Python scalar for arbitrary
  byte strings (tests / low-volume interop with AK-ecosystem sketches).
"""

from __future__ import annotations

import numpy as np

DEFAULT_SEED = 0x123456  # README.markdown:81

_MASK64 = 0xFFFFFFFFFFFFFFFF
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_x64_128(key: bytes, seed: int = DEFAULT_SEED) -> tuple[int, int]:
    """Scalar MurmurHash3 x64-128 (Austin Appleby's public-domain spec).
    Returns (h1, h2) as unsigned 64-bit ints; AK convention takes h1."""
    length = len(key)
    h1 = h2 = seed & _MASK64
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(key[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(key[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = key[nblocks * 16 :]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if len(tail) > 0:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def murmur3_64(key: bytes, seed: int = DEFAULT_SEED) -> int:
    """Lower 64 bits (h1) of murmur3 x64-128 — the AK hashing convention."""
    return murmur3_x64_128(key, seed)[0]


# ------------------------------------------------------------ vectorized --

_U = np.uint64


def _np_rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _np_fmix64(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _U(33))
    k = k * _U(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U(33))
    k = k * _U(0xC4CEB9FE1A85EC53)
    return k ^ (k >> _U(33))


def murmur3_64_uint64(values: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Vectorized murmur3 x64-128 lower-64 over uint64 keys, where each key
    is hashed as its 8-byte little-endian representation (tail-only path of
    the block algorithm, len=8). Bit-identical to
    ``murmur3_64(v.to_bytes(8, 'little'))`` — asserted in tests."""
    with np.errstate(over="ignore"):
        v = values.astype(_U, copy=False)
        h1 = np.full(v.shape, seed, dtype=_U)
        h2 = np.full(v.shape, seed, dtype=_U)
        k1 = v * _U(_C1)
        k1 = _np_rotl64(k1, 31)
        k1 = k1 * _U(_C2)
        h1 = h1 ^ k1
        h1 = h1 ^ _U(8)
        h2 = h2 ^ _U(8)
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _np_fmix64(h1)
        h2 = _np_fmix64(h2)
        h1 = h1 + h2
        return h1


def to_uint64(arr: np.ndarray) -> np.ndarray:
    """Reinterpret a signed int64 array (e.g. Spark xxhash64 output) as
    uint64 without copying."""
    a = np.ascontiguousarray(arr)
    if a.dtype == np.uint64:
        return a
    return a.astype(np.int64, copy=False).view(np.uint64)
