"""Cross-checks against Spark builtins named in SURVEY.md §2.2: our
sketches vs approx_count_distinct (Catalyst HLL++), count_min_sketch,
and percentile_approx. Neither builtin is AK-storage-compatible — the
check is estimate-vs-estimate agreement on the same data."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from js_hll_spark.spark.agg import hll_ndv
from js_hll_spark.spark.sketch_agg import approx_quantiles, heavy_hitters


def test_hll_vs_approx_count_distinct(spark, events):
    exact = events.select(F.countDistinct("user_id")).first()[0]
    ours = hll_ndv(events, "user_id", log2m=13).first()["ndv"]
    spark_builtin = events.select(
        F.approx_count_distinct("user_id", rsd=0.0115)
    ).first()[0]
    bound = 3 * 1.04 / math.sqrt(2 ** 13)
    assert abs(ours - exact) / exact < bound
    assert abs(spark_builtin - exact) / exact < bound
    # the two estimators agree with each other within combined bounds
    assert abs(ours - spark_builtin) / exact < 2 * bound


def test_cms_topk_vs_builtin_count_min_sketch(spark, documents):
    """Spark's count_min_sketch returns an opaque binary; validate by
    agreement of our CMS-estimated counts with exact counts (the builtin
    pins only that the operator class exists in Spark; formats differ)."""
    toks = documents.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    # builtin runs without error and produces a sketch blob
    blob = toks.select(
        F.count_min_sketch("tok", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("s")
    ).first()["s"]
    assert blob is not None and len(bytes(blob)) > 0
    ours = {r["value"]: r["est_count"] for r in
            heavy_hitters(toks, "tok", k=10, width=16384).collect()}
    exact = {r["tok"]: r["n"] for r in
             toks.groupBy("tok").agg(F.count("*").alias("n")).collect()}
    n_total = sum(exact.values())
    for v, est in ours.items():
        assert est >= exact[v]  # one-sided
        assert est - exact[v] <= math.e / 16384 * n_total * 3


def test_kll_vs_percentile_approx(spark, lineitem):
    ours = approx_quantiles(
        lineitem, "l_extendedprice", qs=(0.5, 0.9), method="kll"
    ).first()
    builtin = lineitem.select(
        F.percentile_approx("l_extendedprice", [0.5, 0.9], 10000).alias("p")
    ).first()["p"]
    exact = lineitem.select(
        F.expr("percentile(l_extendedprice, array(0.5, 0.9))").alias("p")
    ).first()["p"]
    for est, b, ex in zip((ours["q50"], ours["q90"]), builtin, exact):
        assert abs(est - ex) / ex < 0.05
        assert abs(b - ex) / ex < 0.05


def test_hll_vs_spark_datasketches_hll(spark, events):
    """Spark 3.5+ ships Apache DataSketches HLL (hll_sketch_agg /
    hll_sketch_estimate). Formats differ from the AK storage spec by
    design; the cross-check is estimate-vs-estimate agreement per group —
    a third independent estimator family over the same data."""
    import math

    if not hasattr(F, "hll_sketch_estimate"):
        import pytest

        pytest.skip("no datasketches HLL in this Spark")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    ours = {
        r["event_type"]: r["ndv"]
        for r in hll_ndv(events, "user_id", by=["event_type"], log2m=13).collect()
    }
    ds = {
        r["event_type"]: r["ndv"]
        for r in events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(13))
            ).alias("ndv")
        )
        .collect()
    }
    bound = 3 * 1.04 / math.sqrt(2**13)
    for k, n in exact.items():
        assert abs(ours[k] - n) / n < bound, (k, ours[k], n)
        assert abs(ds[k] - n) / n < bound, (k, ds[k], n)
        assert abs(ours[k] - ds[k]) / n < 2 * bound, k
