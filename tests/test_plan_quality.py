"""Plan-quality regression guards: assert the physical plans stay the
plans we want — pruned scans, pushed filters, partition pruning, JVM-side
hashing before the Arrow boundary, sketch-only shuffles."""

from __future__ import annotations

from pyspark.sql import functions as F

from js_hll_spark.sources.catalog import read_pages, write_pages_table
from js_hll_spark.sources.webtext import webtext_table
from js_hll_spark.spark.agg import hll_sketch


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_ndv_scan_prunes_columns(spark, lineitem, tmp_path):
    path = str(tmp_path / "li")
    lineitem.write.parquet(path)
    df = spark.read.parquet(path)
    for engine in ("python", "sql"):
        p = plan(
            hll_sketch(df, "l_partkey", by=["l_returnflag"], log2m=12, engine=engine)
        )
        # the scan must read only the two needed columns of the 11
        assert "ReadSchema: struct<l_partkey:bigint,l_returnflag:string>" in p, engine
        # the hash is computed JVM-side
        assert "xxhash64" in p, engine


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    path = str(tmp_path / "docs")
    docs.write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("lang") == "en").select("doc_id")
    p = plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in p
    assert "ReadSchema: struct<doc_id:bigint" in p


def test_partition_pruning_on_pages_table(spark, tmp_path):
    pages = webtext_table(spark, 3000, partitions=2)
    path = str(tmp_path / "pages")
    write_pages_table(pages, path)
    pruned = read_pages(spark, path, langs=["de"])
    p = plan(pruned.select("url"))
    # lang is a partition column: the filter appears as PartitionFilters,
    # and unselected partitions are never listed in the scan
    assert "PartitionFilters" in p and "lang" in p.split("PartitionFilters")[1][:200]
    assert pruned.count() == pages.filter(F.col("lang") == "de").count()


def test_broadcast_join_is_broadcast(spark):
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    j = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    assert "BroadcastHashJoin" in plan(j)


def test_merge_shuffle_carries_sketches_not_rows(spark, events):
    """python engine: the only Exchange shuffles partial sketches, never
    raw rows — it sits between the partial MapInPandas (below) and the
    batched merge MapInPandas (above; r4 replaced the per-group
    applyInPandas merge), with the in-partition Sort for the stream's
    group-boundary carry."""
    p = plan(
        hll_sketch(events, "user_id", by=["event_type"], log2m=12, engine="python")
    )
    assert p.count("Exchange") == 1
    assert p.count("MapInPandas") == 2
    assert "FlatMapGroupsInPandas" not in p
    # plans print top-down: merge MapInPandas, Sort, Exchange, partial
    first_map = p.index("MapInPandas")
    assert first_map < p.index("Exchange") < p.index("MapInPandas", first_map + 1)


def test_sql_engine_partial_aggregates_before_shuffle(spark, events):
    """sql engine: a partial HashAggregate (keys, register index) runs
    before the single Exchange, so the shuffle carries at most m rows per
    (key, partition) — never raw rows."""
    p = plan(
        hll_sketch(events, "user_id", by=["event_type"], log2m=12, engine="sql")
    )
    # two exchanges: (key, idx) for the register agg — fed by a PARTIAL
    # HashAggregate that collapses each partition to <= m rows per key —
    # and (key) for the assembly step over <= m agg rows per key
    assert p.count("Exchange") == 2
    assert "partial_max" in p
    assert p.index("partial_max") > p.index("Exchange", p.index("Exchange") + 1)
    assert "bit_count" in p  # rho computed in codegen


def test_ngram_jaccard_pairs_mode_has_no_allpairs_selfjoin(spark):
    """With candidates given, the verification tier must never build the
    all-co-shingled-pairs stage (neither the old id < id self-join nor
    the r7 per-shingle pair-explode) — the intersection work has to be
    proportional to the candidate set. The all-pairs exact tier, in
    turn, must use the r7 single-shuffle shape: one groupBy(sh) posting
    list + codegen pair combinations, never a second shuffle through a
    self-equi-join on sh."""
    import re

    from js_hll_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    # materialize=False: shape checks need the full lazy composition
    # (the default checkpoints the posting table, truncating the plan)
    allpairs_plan = optimized(dedup.ngram_jaccard(docs, materialize=False))
    pairs_plan = optimized(
        dedup.ngram_jaccard(docs, pairs=pairs, materialize=False)
    )
    selfjoin = re.compile(r"__id#\d+L? < __id#\d+L?")
    # r7: the exact tier generates pair combinations from the grouped
    # posting lists (collect_list + explode), with no self-join anywhere
    assert not selfjoin.search(allpairs_plan)
    assert "collect_list" in allpairs_plan
    assert "explode" in allpairs_plan
    # r7: the verify tier attaches per-doc shingle-set arrays to the
    # candidate pairs and intersects in codegen — no per-shingle pair
    # generation (no explode of pair combinations), no self-join
    assert not selfjoin.search(pairs_plan)
    assert "array_intersect" in pairs_plan
    assert "flatten" not in pairs_plan


def test_ngram_jaccard_df_cap_is_antijoin_not_window(spark):
    """The hot-shingle cap must run as aggregate + anti-join (map-side
    combine, no per-partition sort), not a Window.partitionBy(sh) count;
    and the registered query engages the cap so the gate never runs an
    uncapped all-pairs join over hot keys."""
    from js_hll_spark.operators import dedup
    from js_hll_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    p = optimized(dedup.ngram_jaccard(docs, max_shingle_df=5, materialize=False))
    assert "LeftAnti" in p
    assert "Window" not in p
    # the registered query materializes the capped posting table, so its
    # returned plan starts from the checkpointed RDD; the cap's anti-join
    # ran inside the checkpoint job — pin the materialization evidence
    # here and the cap shape on the lazy twin above
    q = QUERIES["ngram_jaccard"](spark, "/root/testdata/sf0.001")
    assert "LogicalRDD" in optimized(q)


def test_composed_dedup_single_raw_scan(spark):
    """The composed dedup tiers materialize the shingle posting table
    once: the returned plan must NOT re-derive shingles from the raw
    documents table (PLANS.md r3 showed 6-8 `Scan parquet` nodes of
    documents in ngram_jaccard / dedup_pipeline_fast — 6-8x the scan
    bandwidth at 100 TB). After the fix the candidate, df-cap, and
    verify stages all read checkpointed blocks."""
    from js_hll_spark.queries import QUERIES

    for name in ("ngram_jaccard", "dedup_pipeline", "dedup_pipeline_fast"):
        p = plan(QUERIES[name](spark, "/root/testdata/sf0.001"))
        n_raw = p.count("Scan parquet")
        assert n_raw == 0, f"{name}: {n_raw} raw parquet scans in final plan"
        assert "Scan ExistingRDD" in p, f"{name}: no materialized stage"


def test_sql_engine_keyed_assembly_is_batched(spark, events):
    """The keyed sql-engine assembly must be the batched mapInPandas
    shape (repartition + sort + MapInPandas), never per-group
    FlatMapGroupsInPandas — per-group python calls are a scale
    bottleneck at high key cardinality."""
    p = plan(
        hll_sketch(events, "user_id", by=["event_type"], log2m=12, engine="sql")
    )
    assert "MapInPandas" in p
    assert "FlatMapGroupsInPandas" not in p
    assert p.count("Exchange") == 2  # partial-agg shuffle + key repartition
    assert "Sort" in p  # in-partition key contiguity for the stream carry


def test_sketch_agg_keyed_merge_is_batched(spark, documents):
    """The companion-sketch keyed merge must stream whole Arrow batches
    (repartition + sort + MapInPandas with cross-batch carry), never one
    applyInPandas python call per group — per-group call overhead is the
    scale bottleneck at high key cardinality (same shape the HLL keyed
    assembly was moved to in r2)."""
    from js_hll_spark.spark.sketch_agg import approx_quantiles

    p = plan(
        approx_quantiles(documents, "n_chars", by=["lang"], qs=(0.5,))
    )
    assert "FlatMapGroupsInPandas" not in p
    assert "MapInPandas" in p and "Sort" in p
