"""One honest large-scale decontamination run (VERDICT r5 #7): probe the
24M-doc webtext scaling corpus against a held-out eval slice with
contamination_bloom and report docs/sec + blob size — the broadcast-probe
throughput number the 100 TB story rests on.

Split: eval = row_id % 480 == 7 (~50k docs), train = the other ~23.95M.
Construction truth: ~20% of webtext rows duplicate an earlier canonical
id, so cross-split exact duplicates exist and must flag at frac 1.0.

Caveat stated up front: the webtext generator's 33-word vocabulary gives
a tiny shingle universe (~36k trigrams), so the eval shingle SET — and
hence the Bloom blob — is far smaller than a real benchmark suite's, and
most train docs flag at some frac > 0. That does not distort the
throughput number (per-posting probe cost is hit-rate-independent: every
posting is shingled, hashed, and probed exactly once), but the flag-rate
column is structural to this corpus, not a general expectation.

Protocol: one untimed warm pass (JVM codegen for the shingle/probe
stages), then ONE timed pass (REPS env raises it; a 24M pass is ~10+ min
of wall — replicate medians are for sub-minute queries, and the run is
load-gated instead). The timed pass persists its output so the
ground-truth checks read the cache instead of re-probing.

Usage: python tools/bench_contamination_scale.py   (idle box)
Env: SPARK_GRAFT_CPUS (default 32), CORPUS, REPS (default 1).
Progress goes to stderr; the result is ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.environ.get("CORPUS", "/tmp/webtext_scaling_24000000.parquet")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("REPS", "1"))


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    from pyspark.sql import functions as F

    from js_hll_spark.operators import contamination
    from js_hll_spark.spark.blocks import persistent_rdd_ids, unpersist_blocks
    from js_hll_spark.spark.session import get_spark

    spark = get_spark(
        "contamination-scale", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(CORPUS).select("row_id", "text")
    # single-row-group parquet -> repartition or one task does everything
    docs = docs.repartition(int(CPUS) * 4)
    ev = docs.filter(F.col("row_id") % 480 == 7)
    train = docs.filter(F.col("row_id") % 480 != 7)
    n_train = train.count()
    n_eval = ev.count()
    keep = persistent_rdd_ids(spark)
    log(f"split ready: train={n_train} eval={n_eval}")

    # construction = the ONE eval-side job (distinct-hash partials ->
    # driver-built blob at exact-count sizing -> broadcast)
    t0 = time.perf_counter()
    out = contamination.contamination_bloom(
        train, ev, "text", "row_id", min_frac=0.8
    )
    t_build = time.perf_counter() - t0
    n_bits = out._bloom_n_bits
    n_hashes = out._bloom_n_hashes
    n_distinct = out._bloom_n_distinct
    log(
        f"blob built in {t_build:.1f}s: {n_bits // 8} bytes, k={n_hashes}, "
        f"{n_distinct} distinct eval shingles"
    )

    # untimed warm pass (stage codegen), then timed pass(es)
    t0 = time.perf_counter()
    flagged = out.count()
    log(f"warm probe pass: {time.perf_counter() - t0:.1f}s, flagged={flagged}")
    unpersist_blocks(spark, keep)
    times = []
    cached = None
    for i in range(REPS):
        if cached is not None:
            cached.unpersist()
        t0 = time.perf_counter()
        cached = contamination.contamination_bloom(
            train, ev, "text", "row_id", min_frac=0.8
        ).persist()
        assert cached.count() == flagged
        times.append(time.perf_counter() - t0)
        log(f"timed probe pass {i + 1}/{REPS}: {times[-1]:.1f}s")
    times.sort()
    t_probe = times[len(times) // 2]

    # cross-split exact-duplicate ground truth on a bounded sample: every
    # train doc whose text equals an eval doc's text must flag at 1.0
    # (broadcast semi-join: eval side is small). Reads flags from cache.
    t0 = time.perf_counter()
    truth_ids = [
        r[0]
        for r in train.join(F.broadcast(ev.select("text")), "text", "left_semi")
        .select("row_id")
        .limit(1000)
        .collect()
    ]
    got = {
        r["row_id"]: r["frac"]
        for r in cached.filter(F.col("row_id").isin(truth_ids)).collect()
    }
    missed = [i for i in truth_ids if got.get(i) != 1.0]
    log(
        f"truth check in {time.perf_counter() - t0:.1f}s: "
        f"{len(truth_ids)} sampled, {len(missed)} missed"
    )

    print(
        json.dumps(
            {
                "corpus": CORPUS,
                "n_train": n_train,
                "n_eval": n_eval,
                "build_s": round(t_build, 2),
                "probe_pass_s": round(t_probe, 2),
                "probe_reps_s": [round(t, 2) for t in times],
                "docs_per_sec": round(n_train / t_probe, 1),
                "blob_bytes": n_bits // 8,
                "bloom_n_bits": n_bits,
                "bloom_n_hashes": n_hashes,
                "eval_distinct_shingles": n_distinct,
                "flagged_at_0.8": flagged,
                "truth_sample": len(truth_ids),
                "truth_missed": len(missed),
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
