"""Generate a comprehensive-promotion corpus — the regime of
postgresql-hll's cumulative_add_comprehensive_promotion.csv, which the
reference links but never implemented a test for (test/hll-test.js:406-407
TODO). A log2m=11/rw=5 sketch with DEFAULT thresholds (explicit auto=128,
sparse=m/4=512) is walked with distinct-register inserts so the encoding
crosses EXPLICIT -> SPARSE -> FULL, one ``cardinality,raw_value,multiset``
line per insert (postgresql-hll file conventions, row 0 = empty hex).

Raw values keep their rho bits in the shifted hash's lower 32-bit word so
the reference's decode path (src/hll.js:255-268) sees identical registers.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from js_hll_spark import HLL, HLLConfig  # noqa: E402

LOG2M, REGWIDTH = 11, 5
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "data",
    "cumulative_add_comprehensive_promotion_regen.csv",
)


def fmt(card: float) -> str:
    if card == int(card) and abs(card) < 2**53:
        return str(int(card))
    return repr(card)


def main() -> None:
    s = HLL(HLLConfig(LOG2M, REGWIDTH))  # default cutoff: explicit auto + sparse
    lines = ["cardinality,raw_value,multiset", f"0,0,{s.to_hex()}"]

    # values hitting distinct register indices (occupied count == inserts)
    # with varied rho, so sparse occupancy grows 1:1 until the m/4=512
    # promotion and the explicit cutoff fires exactly at its threshold
    rng = np.random.default_rng(11)
    n = 700  # explicit(<=128) -> sparse(<=512 occupied) -> full
    rhos = rng.integers(1, 20, size=n)
    for i in range(n):
        v = int(i) | (1 << (LOG2M + int(rhos[i]) - 1))
        s.add_raw64(np.array([v], dtype=np.uint64))
        lines.append(f"{fmt(s.algorithm_cardinality())},{v},{s.to_hex()}")

    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} lines to {OUT}")


if __name__ == "__main__":
    main()
