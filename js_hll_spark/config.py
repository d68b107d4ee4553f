"""HLL shape parameters and derived constants.

Semantics follow the AggregateKnowledge HLL storage spec v1.0.0 as realized
by the reference (js-hll). Citations are to /root/reference files.

- ``log2m`` valid 4..30 here (js-hll allows 4..24, src/hll.js:210; the
  storage spec's 5-bit field allows up to 31, src/hll.js:446-447 — we stop
  at 30 so ``m`` fits comfortably in signed int32 indexing).
- ``regwidth`` valid 1..8 here (js-hll caps at 5 purely because JS bitwise
  ops are 32-bit, src/hll.js:202-204; the spec's 3-bit field allows 1..8).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

# Algorithm codes, lower nibble of the version byte (src/hll.js:503-524).
ALG_UNDEFINED = 0
ALG_EMPTY = 1
ALG_EXPLICIT = 2
ALG_SPARSE = 3
ALG_FULL = 4

SCHEMA_VERSION = 1

MIN_LOG2M = 4
MAX_LOG2M = 30
MIN_REGWIDTH = 1
MAX_REGWIDTH = 8


def alpha_m_squared(m: int) -> float:
    """alpha_m * m**2 (src/hll.js:479-499). Raises for m < 16."""
    if m < 16:
        raise ValueError(f"m must be at least 16 ({m} given)")
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m


@dataclass(frozen=True)
class HLLConfig:
    """Immutable sketch shape. Two sketches are union-compatible without
    folding iff their configs are equal (src/hll.js:328-330)."""

    log2m: int = 13
    regwidth: int = 5

    def __post_init__(self) -> None:
        if not (MIN_LOG2M <= self.log2m <= MAX_LOG2M):
            raise ValueError(
                f"log2m must be in [{MIN_LOG2M}, {MAX_LOG2M}], got {self.log2m}"
            )
        if not (MIN_REGWIDTH <= self.regwidth <= MAX_REGWIDTH):
            raise ValueError(
                f"regwidth must be in [{MIN_REGWIDTH}, {MAX_REGWIDTH}],"
                f" got {self.regwidth}"
            )

    @property
    def m(self) -> int:
        return 1 << self.log2m

    @property
    def max_register_value(self) -> int:
        return (1 << self.regwidth) - 1

    @property
    def register_index_mask(self) -> int:
        return self.m - 1

    @property
    def two_to_l(self) -> float:
        """2**L with L = (2**regwidth - 2) + log2m (src/hll.js:238-240)."""
        pw_bits = self.max_register_value - 1
        return math.pow(2.0, pw_bits + self.log2m)

    @property
    def large_estimator_cutoff(self) -> float:
        return self.two_to_l / 30.0  # src/hll.js:242

    @property
    def small_estimator_cutoff(self) -> float:
        return 5.0 * self.m / 2.0  # src/hll.js:243

    @property
    def alpha_m_squared(self) -> float:
        return alpha_m_squared(self.m)

    @property
    def relative_error(self) -> float:
        """1.04/sqrt(m) — published std error (src/hll.js:315-317)."""
        return 1.04 / math.sqrt(self.m)

    # ---- promotion thresholds (postgresql-hll conventions; the golden
    # corpus pins sparse->full at 512 registers for log2m=11/rw=5 = m/4) ----

    @property
    def sparse_threshold(self) -> int:
        """Max number of occupied registers a SPARSE sketch may hold before
        promotion to FULL. m/4, additionally capped so the sparse body never
        exceeds the FULL body size (empirically pinned by
        cumulative_add_sparse_edge.csv: flips FULL above 512 @ log2m=11)."""
        by_quarter = self.m // 4
        by_size = (self.m * self.regwidth) // (self.log2m + self.regwidth)
        return min(by_quarter, by_size)

    @property
    def max_estimable_cardinality(self) -> float:
        """The reference's sizing table (README.markdown:30-44): the
        estimator's ceiling alpha * 2^L, reached when every register
        saturates at 2^regwidth - 1 — estimates cannot grow past it.
        Reproduces every cell of the published table to 2 significant
        figures (tested)."""
        return self.alpha_m_squared / (float(self.m) * self.m) * self.two_to_l

    @property
    def storage_bytes(self) -> int:
        """FULL-format register payload: m registers x regwidth bits,
        byte-padded (the table's size column; header excluded)."""
        return (self.m * self.regwidth + 7) // 8

    def explicit_threshold(self, cutoff_code: int) -> int:
        """Decode the 6-bit explicit-cutoff code: 0 = explicit disabled,
        63 = auto, else 2**(code-1) values."""
        if cutoff_code == 0:
            return 0
        if cutoff_code == 63:  # auto: explicit storage <= full storage
            auto = max(1, (self.m * self.regwidth) // 64)
            return 1 << (auto.bit_length() - 1)
        return 1 << (cutoff_code - 1)


def config_for(
    rel_error: float | None = None,
    min_capacity: float | None = None,
) -> "HLLConfig":
    """Smallest config meeting a target relative error and/or maximum
    estimable cardinality — the reference's sizing table as a function.
    log2m comes from the error target (1.04/sqrt(2^log2m) <= rel_error),
    regwidth from the capacity target at that log2m."""
    if rel_error is None and min_capacity is None:
        raise ValueError("give rel_error and/or min_capacity")
    log2m = 4
    if rel_error is not None:
        while log2m < 30 and 1.04 / math.sqrt(2.0**log2m) > rel_error:
            log2m += 1
        if 1.04 / math.sqrt(2.0**log2m) > rel_error:
            # silently returning log2m=30 would hand back a config that
            # misses the stated target with no signal (ADVICE r3)
            raise ValueError(
                f"rel_error={rel_error:g} unreachable: log2m=30 floors at "
                f"{1.04 / math.sqrt(2.0 ** 30):.3g}"
            )
    if min_capacity is None:
        # no capacity target: the reference default regwidth, not the
        # smallest — regwidth=1 caps estimates at ~0.72*m, which would
        # silently clamp any set larger than the register count
        return HLLConfig(log2m, 5)
    while True:
        for rw in range(1, 9):
            cfg = HLLConfig(log2m, rw)
            if cfg.max_estimable_cardinality >= min_capacity:
                return cfg
        if log2m < 30:
            # growing m grows capacity AND tightens error, so it never
            # violates a given rel_error target — prefer a larger
            # register file over failing (ADVICE r3: the capacity-only
            # path used to stay pinned at log2m=4)
            log2m += 1
            continue
        raise ValueError(
            f"min_capacity={min_capacity:g} unreachable even at "
            "log2m=30/regwidth=8; lower the capacity target"
        )


def default_cutoff_byte(
    explicit_auto: bool | None = None,
    sparse_on: bool = True,
    explicit_threshold: int | None = None,
) -> int:
    """Faithful cutoff byte (unlike js-hll, which always writes 0, the
    cutoff byte here encodes real thresholds: 1 pad bit | 1 sparse-enabled
    bit | 6-bit explicit cutoff code). A custom integer threshold encodes
    as the smallest power-of-two code covering it (2^(code-1) >= t, the
    spec's representable set — exact when t is itself a power of two), so
    the threshold survives a serialize/decode round trip instead of
    collapsing to 'explicit disabled'."""
    if explicit_auto is None:
        # infer: a caller passing ONLY explicit_threshold means "encode
        # that threshold" — an explicit_auto=True default would silently
        # discard it (review r5)
        explicit_auto = explicit_threshold is None
    if explicit_auto:
        code = 63
    elif not explicit_threshold:
        code = 0
    else:
        code = min(62, max(1, (int(explicit_threshold) - 1).bit_length() + 1))
    return ((1 if sparse_on else 0) << 6) | code
