"""KLL quantile sketch (Karnin, Lang & Liberty, FOCS 2016; see PAPERS.md
KLL± VLDB 2021 for the streaming-variant context). Rank error eps*n with
space O((1/eps) sqrt(log 1/delta)).

Implementation notes:
- compactor levels hold float64 arrays; level i items have weight 2^i
- capacity of level i (from the top): ceil(k * c^(H-i)) with c = 2/3
- compaction keeps every other item of the sorted level; the even/odd
  offset alternates deterministically per level (a deterministic
  derandomization — keeps merges reproducible in tests; rank-error
  guarantees hold with the standard constants in expectation)
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"KLL1"
_C = 2.0 / 3.0


class KLLSketch:
    __slots__ = ("k", "levels", "n", "_offsets")

    def __init__(self, k: int = 200) -> None:
        if k < 8:
            raise ValueError("k >= 8 required")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._offsets = 0  # bit i = next compaction offset for level i

    # ------------------------------------------------------------ sizing --

    def _capacity(self, level: int) -> int:
        height = len(self.levels)
        return max(2, int(np.ceil(self.k * _C ** (height - 1 - level))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    # ----------------------------------------------------------- updates --

    def update(self, values: np.ndarray) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compress()
        return self

    def _compress(self) -> None:
        while sum(lv.size for lv in self.levels) > self._total_capacity():
            for i, lv in enumerate(self.levels):
                if lv.size >= self._capacity(i):
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        lv = np.sort(self.levels[i])
        offset = (self._offsets >> i) & 1
        self._offsets ^= 1 << i
        kept = lv[offset::2]
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[i] = np.empty(0, dtype=np.float64)
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], kept])

    # ------------------------------------------------------------- merge --

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError("KLL k mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if lv.size:
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()
        return self

    # ------------------------------------------------------------ queries --

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            if lv.size:
                items.append(lv)
                weights.append(np.full(lv.size, 1 << i, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        v = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError("q in [0,1]")
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(v[min(idx, v.size - 1)])

    def quantiles(self, qs: list[float]) -> list[float]:
        """All requested quantiles from ONE weighted sort + cumsum (a
        per-q quantile() call would redo the O(S log S) sort per q)."""
        if any(not 0.0 <= q <= 1.0 for q in qs):
            raise ValueError("q in [0,1]")
        v, w = self._weighted()
        if v.size == 0:
            return [float("nan")] * len(qs)
        cum = np.cumsum(w)
        idx = np.searchsorted(cum, np.asarray(qs) * cum[-1], side="left")
        return [float(v[min(int(i), v.size - 1)]) for i in idx]

    def rank(self, value: float) -> float:
        """Approximate fraction of items <= value."""
        v, w = self._weighted()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        idx = int(np.searchsorted(v, value, side="right"))
        return float(cum[idx - 1] / cum[-1]) if idx else 0.0

    # ------------------------------------------------------------- codec --

    def to_bytes(self) -> bytes:
        parts = [
            _MAGIC,
            struct.pack("<iqiq", self.k, self.n, len(self.levels), self._offsets),
        ]
        for lv in self.levels:
            parts.append(struct.pack("<i", lv.size))
            parts.append(lv.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        if data[:4] != _MAGIC:
            raise ValueError("not a KLL1 blob")
        k, n, n_levels, offsets = struct.unpack_from("<iqiq", data, 4)
        out = cls(k)
        out.n = n
        out._offsets = offsets
        out.levels = []
        pos = 4 + 24
        for _ in range(n_levels):
            if pos + 4 > len(data):
                raise ValueError("truncated KLL1 blob: level header past end")
            (sz,) = struct.unpack_from("<i", data, pos)
            pos += 4
            if sz < 0 or pos + 8 * sz > len(data):
                raise ValueError("truncated KLL1 blob: level body past end")
            out.levels.append(
                np.frombuffer(data, dtype="<f8", count=sz, offset=pos).copy()
            )
            pos += 8 * sz
        if pos != len(data):
            raise ValueError(
                f"oversized KLL1 blob: {len(data) - pos} trailing bytes"
            )
        return out
