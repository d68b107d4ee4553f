"""Regenerate the cardinality-correction corpus the reference lost.

The reference test regime (test/hll-test.js:396-403) replays
``cumulative_add_cardinality_correction.csv`` — absent from the reference
copy (.MISSING_LARGE_BLOBS). This rebuilds an equivalent corpus from the
pinned constants: a log2m=4/regwidth=5 FULL-mode sketch walked through all
estimator branches — small-range (zeros present), uncorrected, large-range,
and the NaN case (estimator beyond 2^L, test/hll-test.js:458-480) — one
``cardinality,raw_value,multiset`` line per insert, postgresql-hll file
conventions (row 0 = ``0,0,<empty hex>``).

Raw values are crafted so the rho-relevant bit sits in the lower 32 bits of
the shifted hash — the reference's rho reads only that word
(src/hll.js:255-268) — so the corpus replays identically on both engines.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from js_hll_spark import HLL, HLLConfig  # noqa: E402

LOG2M, REGWIDTH = 4, 5
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "data",
    "cumulative_add_cardinality_correction_regen.csv",
)


def fmt(card: float) -> str:
    if math.isnan(card):
        return "NaN"
    if card == int(card) and abs(card) < 2**53:
        return str(int(card))
    return repr(card)


def main() -> None:
    s = HLL(HLLConfig(LOG2M, REGWIDTH), explicit_threshold=0, sparse_on=False)
    lines = ["cardinality,raw_value,multiset", f"0,0,{s.to_hex()}"]

    def emit(v: int) -> None:
        s.add_raw64(np.array([v], dtype=np.uint64))
        lines.append(f"{fmt(s.algorithm_cardinality())},{v},{s.to_hex()}")

    # phase 1: random inserts walk small-range -> uncorrected.
    # values < 2^30 keep rho bits in the shifted hash's lower 32-bit word.
    rng = np.random.default_rng(20260816)
    for v in rng.integers(16, 1 << 30, size=200, dtype=np.uint64):
        emit(int(v))

    # phase 2: ramp every register through rho = 10..28 — the estimator
    # grows monotonically across the uncorrected/large-range boundary
    # (large cutoff = 2^L/30, src/hll.js:242)
    for r in range(10, 29):
        for i in range(1 << LOG2M):
            emit(i | (1 << (LOG2M + r - 1)))

    # phase 3: saturate all registers to the 5-bit max (rho 31): the
    # estimator exceeds 2^L, 1 - estimator/2^L < 0 -> NaN
    for r in (30, 31):
        for i in range(1 << LOG2M):
            emit(i | (1 << (LOG2M + r - 1)))

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} lines to {OUT}")


if __name__ == "__main__":
    main()
