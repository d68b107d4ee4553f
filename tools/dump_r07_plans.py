"""Capture .explain("formatted") output for registry queries into
plans/r07/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

usage: python tools/dump_r07_plans.py <suffix> q1 q2 ...
env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
measurement scale), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from js_hll_spark.queries import QUERIES
    from js_hll_spark.spark.session import get_spark

    spark = get_spark(
        "dump-r07-plans", master=f"local[{CPUS}]", shuffle_partitions=int(CPUS)
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(ROOT, "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
