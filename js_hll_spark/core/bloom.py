"""Bloom filter: membership with no false negatives; FPR ~=
(1 - e^(-k*n/m))^k. Merge = bitwise OR (same monoid contract as HLL).
PySpark 4.1.2 exposes no bloom_filter_agg (verified absent), hence this
companion (SURVEY.md §2.2 'membership')."""

from __future__ import annotations

import math
import struct

import numpy as np

from .cms import km_positions

_U = np.uint64
_MAGIC = b"BLM1"


class BloomFilter:
    __slots__ = ("n_bits", "n_hashes", "bits", "n_items")

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 5) -> None:
        if n_bits % 8:
            raise ValueError("n_bits must be a multiple of 8")
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)
        self.n_items = 0

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01) -> "BloomFilter":
        m = int(-n * math.log(fpr) / (math.log(2) ** 2))
        m = max(64, (m + 7) // 8 * 8)
        k = max(1, round(m / n * math.log(2))) if n else 1
        return cls(m, k)

    def _positions(self, hashes: np.ndarray) -> np.ndarray:
        return km_positions(hashes, self.n_hashes, self.n_bits)

    def add_hashed(self, hashes: np.ndarray) -> None:
        pos = self._positions(hashes).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.n_items += int(hashes.size)

    def contains_hashed(self, hashes: np.ndarray) -> np.ndarray:
        pos = self._positions(hashes)  # (k, n)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.n_bits, other.n_hashes) != (self.n_bits, self.n_hashes):
            raise ValueError("bloom shape mismatch")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_items += other.n_items
        return self

    @property
    def fpr(self) -> float:
        k, n, m = self.n_hashes, self.n_items, self.n_bits
        return (1.0 - math.exp(-k * n / m)) ** k if n else 0.0

    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack("<iiq", self.n_bits, self.n_hashes, self.n_items)
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        if data[:4] != _MAGIC:
            raise ValueError("not a BLM1 blob")
        n_bits, n_hashes, n_items = struct.unpack_from("<iiq", data, 4)
        expect = 20 + (n_bits + 7) // 8
        if len(data) != expect:
            raise ValueError(
                f"truncated/oversized BLM1 blob: {len(data)} bytes, "
                f"header declares {expect}"
            )
        out = cls(n_bits, n_hashes)
        out.n_items = n_items
        out.bits = np.frombuffer(data, dtype=np.uint8, offset=20).copy()
        return out
