"""Webtext source + flagship pipeline tests (FIXTURES.md §1, BASELINE.json
input_hint): determinism at any parallelism, byte-identical extraction per
url, NDV(url) within the published bound against construction-time ground
truth, checkpoint/resume lineage."""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import functions as F

from js_hll_spark.pipelines.webtext import extracted_pages, webtext_ndv_pipeline
from js_hll_spark.sources.webtext import (
    exact_ndv_urls,
    extract_text,
    webtext_table,
)

N = 20_000


def test_generator_deterministic_across_partitioning(spark):
    a = webtext_table(spark, 5000, partitions=2).orderBy("row_id").collect()
    b = webtext_table(spark, 5000, partitions=7).orderBy("row_id").collect()
    assert a == b


def test_html_is_function_of_url(spark):
    """Duplicate urls carry byte-identical html (and therefore text)."""
    df = webtext_table(spark, N, partitions=8)
    dup_variants = (
        df.groupBy("url")
        .agg(
            F.countDistinct(F.md5(F.col("html").cast("string"))).alias("v"),
            F.countDistinct("text").alias("t"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter((F.col("v") > 1) | (F.col("t") > 1))
        .count()
    )
    assert dup_variants == 0
    assert df.count() == N


def test_extraction_byte_identical_per_url(spark):
    """The per-row invariant: re-extracting html reproduces the stored
    text byte-for-byte, at different parallelism."""
    pages = webtext_table(spark, 5000, partitions=4)
    re1 = extracted_pages(pages.repartition(3))
    re2 = extracted_pages(pages.repartition(11))
    mismatch = (
        re1.select("row_id", F.col("text").alias("t1"))
        .join(re2.select("row_id", F.col("text").alias("t2")), "row_id")
        .join(pages.select("row_id", "text"), "row_id")
        .filter((F.col("t1") != F.col("text")) | (F.col("t2") != F.col("text")))
        .count()
    )
    assert mismatch == 0


def test_extractor_reference_cases():
    assert extract_text(b"<html><body>a  b\n c</body></html>") == "a b c"
    assert extract_text(b"<p>x</p><p>y</p>") == "x y"
    assert extract_text(b"") == ""
    assert extract_text(b"plain") == "plain"


def test_ndv_url_within_bound(spark):
    from js_hll_spark.spark.agg import hll_ndv

    df = webtext_table(spark, N, partitions=8)
    truth = exact_ndv_urls(N)
    est = hll_ndv(df, "url", log2m=13).first()["ndv"]
    assert abs(est - truth) / truth < 3 * 1.04 / math.sqrt(2 ** 13)


def test_flagship_pipeline_and_resume(spark, tmp_path):
    work = str(tmp_path / "pipeline")
    pages = webtext_table(spark, 5000, partitions=4)
    out = webtext_ndv_pipeline(spark, pages, work, log2m=12)

    truth = exact_ndv_urls(5000)
    got = out["ndv_global"].first()["ndv"]
    assert abs(got - truth) / truth < 3 * 1.04 / math.sqrt(2 ** 12)

    # per-lang NDVs sum to ~global (langs partition the url space)
    per_lang = {r["lang"]: r["ndv"] for r in out["ndv_lang"].collect()}
    assert abs(sum(per_lang.values()) - truth) / truth < 0.05

    # manifests exist with lineage
    m = json.load(open(os.path.join(work, "stage=sketch_day_lang", "_manifest.json")))
    assert m["inputs"] == ["pages"] and m["rows"] > 0 and m["partitions"]

    # resume: rerun must not rebuild complete stages (same fingerprints)
    before = {
        name: json.load(
            open(os.path.join(work, f"stage={name}", "_manifest.json"))
        )["completed_at"]
        for name in ["pages", "sketch_day_lang", "ndv_global"]
    }
    out2 = webtext_ndv_pipeline(spark, pages, work, log2m=12)
    after = {
        name: json.load(
            open(os.path.join(work, f"stage={name}", "_manifest.json"))
        )["completed_at"]
        for name in before
    }
    assert before == after  # nothing re-ran
    assert out2["ndv_global"].first()["ndv"] == got


def test_resume_recomputes_invalidated_stage(spark, tmp_path):
    from js_hll_spark.plans.checkpoint import StageRunner

    work = str(tmp_path / "inval")
    runner = StageRunner(spark, work)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).withColumnRenamed("id", "x")

    runner.run("s1", build)
    runner.run("s1", build)
    assert calls["n"] == 1
    runner.invalidate("s1")
    runner.run("s1", build)
    assert calls["n"] == 2


def test_resume_after_partial_stage_write(spark, tmp_path):
    """A stage directory left behind by a killed run (data written, no
    manifest) is rebuilt on resume, not trusted."""
    from js_hll_spark.plans.checkpoint import StageRunner

    work = str(tmp_path / "crash")
    runner = StageRunner(spark, work)
    # simulate the crash: stage output exists but no manifest
    spark.range(5).write.parquet(os.path.join(work, "stage=s1"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(99).withColumnRenamed("id", "x")

    out = runner.run("s1", build)
    assert calls["n"] == 1
    assert out.count() == 99  # rebuilt, stale data replaced


def test_column_subset_is_byte_identical(spark):
    full = webtext_table(spark, 3000, partitions=3).select(
        "row_id", "url", "lang"
    )
    subset = webtext_table(spark, 3000, partitions=5, columns=("url", "lang"))
    assert subset.columns == ["row_id", "url", "lang"]
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, subset.collect()))
    assert a == b


def test_stage_rebuild_invalidates_downstream_same_shape(spark, tmp_path):
    """Rebuilding an upstream stage must invalidate its downstream even
    when the rebuilt output has the same row/file shape — shape-only
    fingerprints let stale stages skip, the worst checkpoint failure."""
    from js_hll_spark.plans.checkpoint import StageRunner

    runner = StageRunner(spark, str(tmp_path))
    calls = {"b": 0}

    def build_a():
        return spark.range(100).withColumnRenamed("id", "v")

    def build_b():
        calls["b"] += 1
        return spark.read.parquet(str(tmp_path) + "/stage=a").groupBy().count()

    runner.run("a", build_a)
    runner.run("b", build_b, inputs=["a"])
    assert calls["b"] == 1
    # no invalidation: b resumes
    runner.run("b", build_b, inputs=["a"])
    assert calls["b"] == 1
    # rebuild a with IDENTICAL shape: b must rebuild
    runner.invalidate("a")
    runner.run("a", build_a)
    runner.run("b", build_b, inputs=["a"])
    assert calls["b"] == 2


def test_char_ngrams_short_strings_empty(spark):
    """Strings shorter than n yield [] (sequence(1,0) used to count DOWN
    and emit two phantom grams)."""
    from pyspark.sql import functions as F

    from js_hll_spark.operators.text import char_ngrams

    df = spark.createDataFrame([("ab",), ("",), ("abcd",)], ["s"])
    got = [r["g"] for r in df.select(char_ngrams("s", 3).alias("g")).collect()]
    assert got == [[], [], ["abc", "bcd"]]
