"""Targeted re-measure of specific registry queries under bench.py's exact
protocol (warm JVM, median-of-3, retired-block sweep between reps).

Usage: python tools/bench_subset.py q1 q2 ...   (env SPARK_GRAFT_SF_DIR/CPUS as bench.py)

Adjudication tool for perf-weak entries (VERDICT r5 #1): run ONLY the suspect
queries so the measurement is not confounded by 30 preceding queries' JVM state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_subset.py query ...", file=sys.stderr)
        sys.exit(2)
    from js_hll_spark.queries import QUERIES
    from js_hll_spark.spark.agg import hll_ndv
    from js_hll_spark.spark.blocks import persistent_rdd_ids, unpersist_blocks
    from js_hll_spark.spark.session import get_spark

    spark = get_spark("bench-subset", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    lineitem = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(int(CPUS)).cache()
    )
    lineitem.count()
    hll_ndv(lineitem.limit(50_000), "l_orderkey", log2m=10).collect()
    keep = persistent_rdd_ids(spark)

    results: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        ts = []
        # one untimed warm rep: first execution of a query shape in a fresh
        # JVM pays JIT (memory: 3-5x); the artifact numbers are warm medians
        fn(spark, SF_DIR).collect()
        unpersist_blocks(spark, keep)
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            ts.append(time.perf_counter() - t0)
            unpersist_blocks(spark, keep)
        ts.sort()
        results[name] = {"median": round(ts[len(ts) // 2], 3), "all": [round(t, 3) for t in ts]}
    print(json.dumps({"sf": SF_DIR, "cpus": int(CPUS), "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
