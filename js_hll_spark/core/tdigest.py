"""Merging t-digest (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests"): centroid clustering bounded by the k1 scale
function — tight relative accuracy at the tails, constant size.

This is the merge-based variant: updates buffer raw points and fold them
into the centroid list with a single sorted sweep; merging two digests is
the same sweep over the union of centroids. Deterministic (no RNG), so
partial merges are reproducible given the same input multiset order-
insensitively at the buffer-flush granularity."""

from __future__ import annotations

import math
import struct

import numpy as np

_MAGIC = b"TDG1"


def _k1(q: float, compression: float) -> float:
    return compression / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


class TDigest:
    __slots__ = ("compression", "means", "weights", "n", "_buf")

    def __init__(self, compression: float = 100.0) -> None:
        if compression < 20:
            raise ValueError("compression >= 20 required")
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self._buf: list[np.ndarray] = []

    # ----------------------------------------------------------- updates --

    def update(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self._buf.append(v)
        if sum(b.size for b in self._buf) >= 8192:
            self._flush()
        return self

    def _flush(self) -> None:
        if not self._buf:
            return
        pts = np.concatenate(self._buf)
        self._buf = []
        self._cluster(
            np.concatenate([self.means, pts]),
            np.concatenate([self.weights, np.ones(pts.size)]),
        )

    def _cluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = float(weights.sum())
        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = float(means[0]), float(weights[0])
        w_so_far = 0.0
        q_limit = self._q_limit(0.0)
        for m, w in zip(means[1:], weights[1:]):
            q = (w_so_far + cur_w + w) / total
            if q <= q_limit:
                cur_m += (m - cur_m) * w / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_so_far += cur_w
                q_limit = self._q_limit(w_so_far / total)
                cur_m, cur_w = float(m), float(w)
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m)
        self.weights = np.array(out_w)
        self.n = total

    def _q_limit(self, q0: float) -> float:
        k = _k1(max(0.0, min(1.0, q0)), self.compression) + 1.0
        limit = 0.5 * (math.sin(2.0 * math.pi * k / self.compression) + 1.0)
        return min(1.0, max(q0 + 1e-9, limit))

    # ------------------------------------------------------------- merge --

    def merge(self, other: "TDigest") -> "TDigest":
        if other.compression != self.compression:
            raise ValueError("t-digest compression mismatch")
        other_flushed = other.clone() if other._buf else other
        if other_flushed._buf:
            other_flushed._flush()
        self._flush()
        if other_flushed.means.size:
            self._cluster(
                np.concatenate([self.means, other_flushed.means]),
                np.concatenate([self.weights, other_flushed.weights]),
            )
        return self

    def clone(self) -> "TDigest":
        out = TDigest(self.compression)
        out.means = self.means.copy()
        out.weights = self.weights.copy()
        out.n = self.n
        out._buf = [b.copy() for b in self._buf]
        return out

    # ------------------------------------------------------------ queries --

    def quantile(self, q: float) -> float:
        self._flush()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * self.n
        idx = np.searchsorted(cum, target)
        if idx == 0:
            return float(self.means[0])
        if idx >= self.means.size:
            return float(self.means[-1])
        lo, hi = cum[idx - 1], cum[idx]
        frac = (target - lo) / (hi - lo) if hi > lo else 0.0
        return float(self.means[idx - 1] + frac * (self.means[idx] - self.means[idx - 1]))

    def quantiles(self, qs: list[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    # ------------------------------------------------------------- codec --

    def to_bytes(self) -> bytes:
        self._flush()
        head = _MAGIC + struct.pack("<ddi", self.compression, self.n, self.means.size)
        return (
            head
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        if data[:4] != _MAGIC:
            raise ValueError("not a TDG1 blob")
        compression, n, size = struct.unpack_from("<ddi", data, 4)
        expect = 24 + size * 16
        if size < 0 or len(data) != expect:
            raise ValueError(
                f"truncated/oversized TDG1 blob: {len(data)} bytes, "
                f"header declares {expect}"
            )
        out = cls(compression)
        out.n = n
        pos = 4 + 20
        out.means = np.frombuffer(data, dtype="<f8", count=size, offset=pos).copy()
        out.weights = np.frombuffer(
            data, dtype="<f8", count=size, offset=pos + 8 * size
        ).copy()
        return out
