"""Single-node core benchmark replicating the reference stress workload
shape (/root/reference/test/stress-test.html:25-26,52-134):

    200 HLLs x 10^6 addRaw each (log2m=13, rw=5)  -> inserts/sec
    200 cardinality() calls                        -> estimates/sec
    199 pairwise clone()+union()                   -> unions/sec

The reference prints its numbers to a browser console only (unrecorded,
machine-dependent); js-hll executes one scalar addRaw per value on a
single JS thread. This core is numpy-vectorized, so the comparable
number is inserts/sec on ONE core — the Spark harness then multiplies
by the cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from js_hll_spark import HLL, HLLConfig  # noqa: E402


def main() -> None:
    cfg = HLLConfig(13, 5)
    n_sets, n_inserts = 200, 1_000_000
    rng = np.random.default_rng(42)

    # pre-generate values so RNG cost stays out of the measured loop
    # (the reference applies an RNG-cost correction for the same reason,
    # stress-test.html:129-134)
    values = rng.integers(0, 2 ** 64, size=n_inserts, dtype=np.uint64)

    sketches = []
    t0 = time.perf_counter()
    for i in range(n_sets):
        s = HLL(cfg, explicit_threshold=0, sparse_on=False)
        # mimic per-batch arrival: 16 batches of 62.5k values
        for chunk in np.split(values, 16):
            s.add_raw64(chunk)
        sketches.append(s)
    t_inserts = time.perf_counter() - t0
    inserts_per_sec = n_sets * n_inserts / t_inserts

    t0 = time.perf_counter()
    cards = [s.algorithm_cardinality() for s in sketches]
    t_est = time.perf_counter() - t0
    estimates_per_sec = n_sets / t_est

    # batched estimate path (estimate_many): same arithmetic, one call;
    # stacking is timed — a consumer holding blobs pays it too
    from js_hll_spark.core.hll import estimate_many

    t0 = time.perf_counter()
    stacked = np.stack([s.registers() for s in sketches])
    batch_cards = estimate_many(stacked, cfg)
    t_batch = time.perf_counter() - t0
    batch_estimates_per_sec = n_sets / t_batch
    assert list(batch_cards) == cards  # bit-identical

    t0 = time.perf_counter()
    acc = sketches[0].clone()
    for s in sketches[1:]:
        acc = acc.clone().union(s)
    t_union = time.perf_counter() - t0
    unions_per_sec = (n_sets - 1) / t_union

    print(
        json.dumps(
            {
                "workload": "reference stress shape (200x1e6 inserts, 199 unions)",
                "log2m": 13,
                "regwidth": 5,
                "inserts_per_sec": round(inserts_per_sec),
                "estimates_per_sec": round(estimates_per_sec),
                "batch_estimates_per_sec": round(batch_estimates_per_sec),
                "unions_per_sec": round(unions_per_sec),
                "single_thread": True,
                "estimate_sample": cards[0],
            }
        )
    )


if __name__ == "__main__":
    main()
