"""Deduplication operators for web-scale training-data pipelines.

Five tiers, cheapest first (SURVEY.md §2.2 + the training-pipeline ops the
north rule adds):

- exact: hash-groupBy on a normalized fingerprint (md5) — one shuffle of
  (hash, id) pairs only.
- minhash_lsh: shingle -> K minhashes -> B bands -> bucket join. Band
  buckets are the join key, so candidate generation is an equi-join that
  AQE can handle; no O(n^2) anywhere.
- simhash: 64-bit near-dup signature, Hamming-banded.
- ngram_jaccard: exact Jaccard on character shingles for candidate pairs
  (verification tier after LSH).
- embedding near-dup: cosine >= threshold over LSH-bucketed vectors (see
  ann.py).

Scale notes: every operator keys its shuffle on a hash (uniform by
construction — no skew); joins of candidate pairs against the docs table
are semi-joins on doc_id; nothing collects to the driver.

MinHash here uses md5-derived permutations so the DuckDB oracle can
reproduce signatures bit-for-bit (md5 exists on both engines); the
numpy-vectorized xxhash64 variant in ``minhash_fast`` is the throughput
path at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .text import fingerprint, tokens


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per normalized-text fingerprint."""
    return (
        df.withColumn("fp", fingerprint(text_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(col, n: int = 3):
    """Word n-gram shingles of the normalized token stream (JVM-side)."""
    toks = tokens(col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )


def shingle_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    materialize: bool = True,
    stage_runner=None,
    stage_name: str = "shingle_postings",
    stage_inputs: Sequence[str] = (),
) -> DataFrame:
    """The shared first stage of every shingle-based dedup tier: the
    exploded DISTINCT ``(__id, sh)`` posting table, materialized ONCE.

    Why this exists (VERDICT r3 "What's wrong" #1): composed plans that
    reference the shingle chain from several stages — the hot-shingle
    df cap, LSH candidate generation, and Jaccard verification — each
    re-run scan -> tokenize -> explode from the raw table, which showed
    up as 6-8 ``Scan parquet`` nodes of ``documents`` in PLANS.md. At
    100 TB the raw scan is the dominant cost, so the composed tiers now
    build this table once (``localCheckpoint`` truncates lineage and
    pins the blocks executor-side, spilling to disk past memory) and
    every consumer reads the materialized blocks.

    Distinct-per-doc shingles are the common denominator: Jaccard is
    defined over the distinct-shingle sets, and a min-aggregate MinHash
    is duplicate-insensitive, so both tiers derive unchanged results
    from the deduplicated postings (the md5/DuckDB oracles, which take
    ``list_min`` over the full shingle list, agree for the same reason).

    ``stage_runner`` (a :class:`js_hll_spark.plans.checkpoint.StageRunner`)
    swaps the executor-pinned ``localCheckpoint`` for a DURABLE parquet
    stage named ``stage_name`` with a lineage manifest: fault-tolerant
    (an executor loss re-reads the files instead of killing the query —
    localCheckpoint blocks have no lineage to recompute from) and
    resumable across driver restarts — the materialization story a real
    1000-executor run needs. Results are identical either way (pinned by
    ``tests/test_operators.py::test_durable_posting_stage``).

    INVALIDATION CONTRACT: StageRunner fingerprint-chains between NAMED
    stages only — a completed stage with no ``stage_inputs`` is served
    as-is on every rerun, even if the raw corpus changed (that is what
    makes a killed pipeline resumable). When the input corpus is itself
    a StageRunner stage, pass its name via ``stage_inputs`` to get
    automatic invalidation; for raw external tables, encode the corpus
    version in ``stage_name`` (or delete the stage dir) when the data
    changes — otherwise new documents silently reuse stale postings.
    """
    ex = _shingle_rows_fast(df, text_col, id_col, shingle_n)
    if stage_runner is not None:
        return stage_runner.run(stage_name, lambda: ex, inputs=stage_inputs)
    return _mat(ex) if materialize else ex


def _shingle_rows_fast(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """The exploded distinct ``(__id, sh)`` posting rows via one
    mapInPandas pass — r7 (guide §4.2): the Catalyst formulation
    (``explode(array_distinct(transform(sequence, i -> array_join(
    slice(toks, i+1, n)))))``) runs the higher-order lambdas in
    interpreted mode per shingle and measured 3.3x slower than this
    batch kernel at sf1.0 (2.6M postings: 3.0 s -> 0.9 s to noop).

    Byte parity with the Catalyst twin (verified exceptAll-empty both
    ways on the gate corpus, and continuously by the DuckDB oracles of
    every query built on top): normalization mirrors
    ``operators/text.tokens`` exactly — Java ``\\s`` is the ASCII class
    ``[ \\t\\n\\x0B\\f\\r]`` (NOT Python's unicode-aware ``\\s``, which
    is why the class is spelled out), Java ``trim`` strips all chars
    <= U+0020, ``split(' ', -1)`` keeps empty fields. The one
    documented divergence: exotic unicode case mappings where Python
    ``str.lower`` and Java ``toLowerCase`` disagree (e.g. dotted
    capital I) — impossible in ASCII corpora.

    One DELIBERATE difference, a latent-bug fix: NULL text yields no
    posting rows here, per the documented contract ("docs with NULL
    text produce no shingles") and per the DuckDB oracle CTEs (unnest
    of a NULL list = no rows). The old Catalyst chain actually emitted
    one ``(id, NULL)`` row for NULL text (``greatest(size(NULL)-n, 0)``
    collapses to 0, so the transform produced ``[NULL]``), which
    downstream hashed to the xxhash64 seed — a phantom shingle shared
    by every null-text doc that would have broken the oracles had the
    fixtures contained NULL text (pinned by
    tests/test_r07_equivalence.py)."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("__id", df.schema[id_col].dataType, True),
            StructField("sh", StringType(), True),
        ]
    )
    n = shingle_n

    def fn(batches):
        import re

        ws = re.compile("[ \t\n\x0b\f\r]+")
        trim_chars = "".join(chr(c) for c in range(33))
        for pdf in batches:
            ids_out, shs = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                if txt is None or isinstance(txt, float):
                    continue  # NULL text -> no shingles (Catalyst twin)
                toks = ws.sub(" ", txt.lower()).strip(trim_chars).split(" ")
                m = len(toks) - n
                if m < 0:
                    m = 0
                seen = set()
                for i in range(m + 1):
                    s = " ".join(toks[i : i + n])
                    if s not in seen:
                        seen.add(s)
                        ids_out.append(did)
                        shs.append(s)
            yield pd.DataFrame({"__id": ids_out, "sh": shs})

    return df.select(id_col, text_col).mapInPandas(fn, schema=schema)


def _mat(df: DataFrame) -> DataFrame:
    """Materialize a shared dedup stage (lineage-truncating checkpoint,
    memory+disk with eviction).

    Storage-level note (measured, 400k-doc pipeline, warm JVM,
    median-of-3): deserialized blocks ~9.7 s vs serialized ~11.7 s —
    every consumer pays a decode pass under the serialized level, so
    Spark's deserialized default wins ~17%. An earlier 1.6M-doc axis
    run that killed an 8 GB driver under this level was root-caused to
    checkpoint blocks ACCUMULATING across benchmark repetitions (no
    unpersist between reps), not to the block format — callers that
    loop dedup jobs in one long-lived session must sweep retired
    checkpoints between iterations:

        from js_hll_spark.spark.blocks import persistent_rdd_ids, unpersist_blocks
        keep = persistent_rdd_ids(spark)   # after warming input caches
        ...run composed pipeline, materialize results...
        unpersist_blocks(spark, keep)      # releases retired stage blocks

    (bench.py and tools/bench_dedup_axis.py both do exactly this.) For
    cluster runs that need fault-tolerant, resumable materialization
    instead of executor-pinned blocks, pass ``stage_runner=`` to
    :func:`shingle_postings` — the posting table then lands as a
    parquet stage with a lineage manifest (plans/checkpoint.py)."""
    return df.localCheckpoint()


def minhash_signature(col, k: int = 16, shingle_n: int = 3):
    """Array of k minhash values; permutation j = min over shingles of
    md5(j || shingle) (first 16 hex chars as the order key). md5 keeps the
    signature reproducible in any engine (the DuckDB oracle recomputes it
    exactly); swap in minhash_fast for raw throughput."""
    sh = shingles(col, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.array_min(
            F.transform(
                sh,
                lambda s: F.substring(
                    F.md5(F.concat(j.cast("string"), F.lit("|"), s)), 1, 16
                ),
            )
        ),
    )


def dedup_keep_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    compute_df: DataFrame | None = None,
) -> DataFrame:
    """The deduplicated table itself: keep the smallest-id row per
    normalized-text fingerprint (left-semi join back against the winner
    set — only (fp, keep_id) pairs shuffle, never full rows).

    ``compute_df`` optionally supplies a re-partitioned twin of ``df``
    for the fingerprint pass (single-split fixture correction) while the
    probe side keeps its pristine scan — fanning out BOTH sides doubles
    the repartition for no benefit (r2 bench regression)."""
    winners = dedup_exact(
        df if compute_df is None else compute_df, text_col, id_col
    ).select(F.col("keep_id").alias(id_col))
    return df.join(winners, id_col, "left_semi")


def minhash_signature_fast(col, k: int = 16, shingle_n: int = 3):
    """Throughput variant of minhash_signature: permutation j = min over
    shingles of xxhash64(j, shingle) — one 64-bit hash per (permutation,
    shingle), entirely in whole-stage codegen (~20x cheaper than k md5s).
    Not DuckDB-reproducible (xxhash64 is Spark-specific), so queries built
    on it register rows-only; candidate quality is asserted against the
    md5 variant in pytest."""
    sh = shingles(col, shingle_n)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s, j=j: F.xxhash64(F.lit(j), s)))
            for j in range(k)
        ]
    )


def _pair_structs(ids_col: str = "ids"):
    """Codegen i<j pair combinations of a SORTED id array: the same pair
    multiset a self-equi-join with an ``a.id < b.id`` condition produces
    for one join-key group, generated directly from the group's member
    list — no second shuffle, no hash-relation build (r7, guide §2.3/2.4)."""
    n = F.size(ids_col)
    return F.flatten(
        F.transform(
            ids_col,
            lambda x, i: F.transform(
                F.slice(ids_col, i + F.lit(2), n - i - F.lit(1)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def _lsh_band_join(
    sig: DataFrame, band_cols: list, *, materialize: bool = True
) -> DataFrame:
    """Band-bucket candidate pairs shared by both MinHash tiers — r7
    rewrite: ONE groupBy over (band_idx, band_hash) collects each
    bucket's sorted member list and codegen explodes the i<j pairs,
    replacing the banded self-equi-join (which shuffled the banded table
    twice, built a hash relation over it, and needed the signature table
    checkpointed so both sides could share blocks). The signature chain
    is consumed exactly once now, so ``materialize`` is a no-op kept for
    API compatibility; bucket membership lists are bounded by the dup
    cluster size per band — the same candidate volume the join carried."""
    banded = sig.select(
        "__id", F.posexplode(F.array(*band_cols)).alias("band_idx", "band_hash")
    )
    grouped = banded.groupBy("band_idx", "band_hash").agg(
        F.sort_array(F.collect_list("__id")).alias("ids")
    )
    return (
        grouped.filter(F.size("ids") >= 2)
        .select(F.explode(_pair_structs("ids")).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def minhash_lsh_candidates_fast(
    df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    postings: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """minhash_lsh_candidates with the xxhash64 signature — the 100 TB
    path. Same plan shape: explode shingles -> k map-side min-aggs ->
    band equi-join. Pass ``postings`` (from ``shingle_postings``) to
    reuse a materialized posting table across composed tiers;
    ``materialize=False`` keeps everything lazy."""
    if df is None and postings is None:
        raise ValueError(
            "pass df (raw documents) or postings (a shingle_postings "
            "table) — with neither there is nothing to shingle"
        )
    rows_per_band = k // bands
    if postings is None:
        postings = shingle_postings(
            df, text_col, id_col, shingle_n=shingle_n, materialize=False
        )
    sig = postings.groupBy("__id").agg(
        *[
            F.min(F.xxhash64(F.lit(j), F.col("sh"))).alias(f"__mh{j}")
            for j in range(k)
        ]
    )
    band_cols = [
        F.xxhash64(
            *[F.col(f"__mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        )
        for b in range(bands)
    ]
    return _lsh_band_join(sig, band_cols, materialize=materialize)


def minhash_lsh_candidates(
    df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    postings: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing at least one LSH band
    (rows of k/bands minhashes). Returns (id_a, id_b) with id_a < id_b.

    Plan shape: one projection (signatures, codegen) -> explode bands ->
    self-equi-join on (band_idx, band_hash) -> distinct pairs. The join key
    is a hash, so it is skew-free; candidates are orders of magnitude fewer
    than n^2. Pass ``postings`` (from ``shingle_postings``) to reuse a
    materialized posting table across composed tiers; ``materialize=False``
    keeps everything lazy."""
    if df is None and postings is None:
        raise ValueError(
            "pass df (raw documents) or postings (a shingle_postings "
            "table) — with neither there is nothing to shingle"
        )
    rows_per_band = k // bands
    # explode shingles once, then k map-side min-aggregations — md5 is
    # computed once per (shingle, permutation) inside codegen, and the
    # partial HashAggregate collapses each partition to one row per doc
    # before the shuffle (vs. recomputing the shingle array k times in a
    # nested transform, which is ~10x slower)
    if postings is None:
        postings = shingle_postings(
            df, text_col, id_col, shingle_n=shingle_n, materialize=False
        )
    sig = postings.groupBy("__id").agg(
        *[
            F.min(
                F.substring(
                    F.md5(F.concat(F.lit(str(j)), F.lit("|"), F.col("sh"))),
                    1,
                    16,
                )
            ).alias(f"__mh{j}")
            for j in range(k)
        ]
    )
    band_cols = [
        F.concat_ws(
            ",",
            *[F.col(f"__mh{b * rows_per_band + r}") for r in range(rows_per_band)],
        )
        for b in range(bands)
    ]
    return _lsh_band_join(sig, band_cols, materialize=materialize)


def ngram_jaccard(
    df: DataFrame | None = None,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.0,
    max_shingle_df: int | None = None,
    postings: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Exact word-shingle Jaccard. If ``pairs`` (id_a, id_b) is given, only
    those candidates are intersected (the LSH → verify pipeline): pairs is
    broadcast onto a's shingles, then an equi-join on (id_b, sh) keeps the
    shared ones — intersection cost is proportional to the candidate set,
    never all co-shingled pairs. Without ``pairs``, scores all pairs
    sharing ≥1 shingle (exact mode for small/oracled inputs).

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs BEFORE sizes/intersections (a stopword shingle is a hot join key
    and a quadratic blowup at scale); this redefines the shingle universe
    consistently, so jaccard stays a true Jaccard over the kept shingles.
    Returns (id_a, id_b, jaccard).

    ``postings`` reuses a materialized ``shingle_postings`` table (the
    composed-pipeline path). ``materialize`` (default on) pins the hashed
    — and, with a cap, df-capped — posting table once so the sizes and
    both intersection sides read materialized blocks instead of each
    re-running the scan -> explode -> hash chain (VERDICT r3 #2)."""
    if df is None and postings is None:
        raise ValueError(
            "pass df (raw documents) or postings (a shingle_postings "
            "table) — with neither there is nothing to shingle"
        )
    postings_was_lazy = postings is None
    if postings is None:
        # the posting chain is consumed once below (the hashed projection
        # is what gets materialized when sharing is needed), so the
        # string-shingle table itself never checkpoints — r7: the old
        # string-posting checkpoint wrote ~3x the bytes of the hashed one
        # for the same sharing
        postings = shingle_postings(
            df, text_col, id_col, shingle_n=shingle_n, materialize=False
        )
    # join/aggregate on the 8-byte shingle hash, not the string: same
    # counts (a 64-bit collision would need two distinct shingles of the
    # same doc pair to collide — ~1e-10 at corpus scale; the DuckDB
    # oracle gate verifies equality empirically), ~17% faster end to end
    ex = postings.select("__id", F.xxhash64("sh").alias("sh"))
    if pairs is not None:
        if max_shingle_df is not None:
            if materialize and postings_was_lazy:
                # the hot aggregate and the anti-join probe both consume
                # the posting chain; share one hashed copy when the
                # caller did not pass an already-materialized table
                ex = _mat(ex)
            # hot-shingle set via map-side-combined count + anti-join: a
            # Window.partitionBy(sh) count shuffles AND sorts every
            # posting partition; the aggregate shuffles the same keys
            # without the sort, and the hot set (df > cap) is typically
            # tiny, so AQE turns the anti-join into a broadcast at
            # runtime — without pinning a hint that would OOM if a
            # pathological corpus made the hot set large.
            hot = (
                ex.groupBy("sh")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") > max_shingle_df)
                .select("sh")
            )
            ex = ex.join(hot, "sh", "left_anti")
        # verification tier (r7 rewrite, guide §2.3/§2.4): collapse each
        # doc's (kept) hashed shingle set into ONE array row via a
        # single groupBy — the same shuffle the old per-doc sizes
        # aggregate already paid — then attach both docs' arrays to each
        # candidate pair and compute the intersection with codegen
        # array_intersect. The old shape joined the candidate pairs
        # against the full posting table TWICE (the (id_b, sh) leg was a
        # multi-million-row shuffle join) and needed an extra
        # checkpoint of the hashed postings plus two sizes joins.
        # Per-doc arrays are bounded by shingles-per-doc, so the shape
        # holds at any corpus size (lists and pairs co-shuffle by id).
        lists = ex.groupBy("__id").agg(F.collect_list("sh").alias("__shs"))
        if materialize:
            # two consumers (the id_a and id_b attach legs)
            lists = _mat(lists)
        a = lists.select(F.col("__id").alias("id_a"), F.col("__shs").alias("__sa"))
        b = lists.select(F.col("__id").alias("id_b"), F.col("__shs").alias("__sb"))
        # no broadcast hint on pairs: candidate sets are usually tiny
        # and AQE broadcasts them at runtime, but a forced hint would
        # OOM when an LSH parameter choice yields a candidate set past
        # executor memory (VERDICT r2 #3)
        out = (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("__sa", "__sb")).alias("n_inter"),
                F.size("__sa").alias("n_a"),
                F.size("__sb").alias("n_b"),
            )
            .select(
                "id_a",
                "id_b",
                F.round(
                    F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
                ).alias("jaccard"),
            )
        )
        if threshold > 0:
            out = out.filter(F.col("jaccard") >= threshold)
        return out
    # ---- all-pairs exact tier (the small/oracled-input mode) ----------
    # r7 rewrite (guide §2.3/§2.4): the old shape self-joined the hashed
    # posting table on sh (two reads of the materialized postings, a
    # build of a multi-million-row hash relation, and sum(df^2) probe
    # output rows through join machinery) and then aggregated the pairs.
    # The co-shingled pair set is a per-shingle combinatorial object, so
    # generate it directly: ONE groupBy(sh) collects each (<= cap-sized)
    # sorted posting list, and codegen explodes the i<j combinations —
    # the same pair multiset the a.sh==b.sh AND a.id<b.id join produced,
    # with the self-join's second shuffle and broadcast build gone.
    # Measured at sf1.0 (2.6M postings): 15.9 s -> ~6 s end to end.
    if max_shingle_df is not None:
        # hot cap first, as a count aggregate + anti-join (NOT by
        # filtering the collected lists): counting is map-side combined
        # and never materializes a hot shingle's full posting list in
        # one aggregation buffer — the property that keeps the cap
        # scale-safe when a stopword shingle covers most of the corpus.
        if materialize and postings_was_lazy:
            # two consumers of the posting chain (hot agg + anti probe);
            # an already-materialized passed-in posting table needs no
            # second copy — both consumers re-hash from its blocks
            ex = _mat(ex)
        hot = (
            ex.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > max_shingle_df)
            .select("sh")
        )
        ex = ex.join(hot, "sh", "left_anti")
    grouped = ex.groupBy("sh").agg(
        F.sort_array(F.collect_list("__id")).alias("ids")
    )
    if materialize:
        # two consumers (sizes + pair generation) of the grouped lists
        grouped = _mat(grouped)
    sizes = (
        grouped.select(F.explode("ids").alias("__id"))
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    # pack each (id_a, id_b) pair into ONE long when every id fits in
    # 31 bits — the pair aggregation keys a single 8-byte column instead
    # of a two-column row, measured 10.2 -> 7.0 s on the 67M-pair
    # aggregate at sf1.0 (r7). The range probe is a driver-side
    # aggregate over the materialized (tiny) per-shingle list table;
    # ids are sorted within each list so min/max come from the ends.
    # Out-of-range ids (or the lazy plan-inspection mode) keep the
    # struct-keyed path — results are identical either way.
    packed = False
    if materialize:
        lo, hi = grouped.agg(
            F.min(F.element_at("ids", 1)), F.max(F.element_at("ids", -1))
        ).first()
        packed = lo is not None and lo >= 0 and hi < (1 << 31)
    if packed:
        n = F.size("ids")
        pair_longs = F.flatten(
            F.transform(
                "ids",
                lambda x, i: F.transform(
                    F.slice("ids", i + F.lit(2), n - i - F.lit(1)),
                    lambda y: F.shiftleft(x, 32).bitwiseOR(y),
                ),
            )
        )
        inter = (
            grouped.filter(n >= 2)
            .select(F.explode(pair_longs).alias("pk"))
            .groupBy("pk")
            .agg(F.count(F.lit(1)).alias("n_inter"))
            .select(
                F.shiftrightunsigned("pk", 32).alias("id_a"),
                F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("id_b"),
                "n_inter",
            )
        )
    else:
        inter = (
            grouped.filter(F.size("ids") >= 2)
            .select(F.explode(_pair_structs("ids")).alias("p"))
            .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    # sizes is one small row per doc — tiny next to the pair table in
    # the regime this tier exists for (exact mode on small/oracled
    # inputs; the 100 TB path is candidates-first via ``pairs``). The
    # explicit broadcast matters: `inter` descends from a checkpointed
    # RDD whose stats under-estimate the exploded pair count, and the
    # static planner otherwise picks `inter` as the build side — a
    # multi-GB hash relation (driver OOM) for a join whose true small
    # side is `sizes`.
    sizes_b = F.broadcast(sizes)
    out = (
        inter.join(sizes_b.withColumnRenamed("__id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes_b.withColumnRenamed("__id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def simhash_verify(
    sigs: DataFrame,
    cand: DataFrame,
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """Verification tier for SimHash candidates: exact Hamming distance
    between the 64-bit signatures of each candidate pair, entirely in
    codegen (``bit_count(a XOR b)``), keeping pairs within
    ``max_hamming``. With 16-bit bands, any pair at Hamming <= 3 shares
    a band by pigeonhole, so candidates -> verify has perfect recall at
    that radius. Returns (id_a, id_b, hamming)."""
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("__sa"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("__sb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    node_col: str | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Cluster near-duplicate pairs into connected components — the step
    between pairwise dedup output and "keep one document per group".
    Returns (doc_id, cluster_id) where cluster_id is the smallest doc id
    in the component (so ``doc_id == cluster_id`` marks the canonical
    representative).

    ``nodes`` optionally supplies the full universe of ids (docs in no
    pair become singleton clusters of themselves); without it only ids
    appearing in ``pairs`` are labeled.

    Algorithm: min-label propagation. Each iteration every node takes the
    smallest label among itself and its direct neighbors — one equi-join
    of the (static, cached) edge list against the label table plus a
    map-side-combined min-aggregate, all on hash-partitioned keys, no
    driver collect. Converges in O(graph diameter) rounds; near-dup
    components are star/clique-shaped (diameter ≲ 3), so 3–5 rounds in
    practice, bounded by ``max_iter``. Lineage is truncated per round via
    localCheckpoint, which keeps the plan constant-size instead of
    doubling per iteration. (For adversarially long path graphs the
    large-star/small-star scheme converges in O(log n) rounds; the web
    near-dup graph never needs it.)
    """
    from ..spark.blocks import checkpoint_rdd_id, unpersist_by_id

    spark = pairs.sparkSession
    # materialize pairs BEFORE doubling into an edge list: the two union
    # branches would otherwise each recompute the (possibly expensive)
    # upstream candidate/verify pipeline
    p = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).localCheckpoint()
    edges = p.union(p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).localCheckpoint()
    # once the mirrored edge list is materialized, the one-way pair
    # blocks are dead weight — free them now (in-operator lifecycle:
    # VERDICT r4 "What's wrong" #2; callers no longer need a sweep to
    # bound this operator's block footprint)
    unpersist_by_id(spark, checkpoint_rdd_id(p))
    singles = None
    if nodes is not None:
        # r7: iterate over EDGE-ADJACENT nodes only. A node in no edge
        # provably never changes label (its neighbor aggregate is
        # empty), and an edge endpoint outside the node universe never
        # had a label to propagate — both facts already held in the old
        # all-nodes loop (an isolated node rode every join doing
        # nothing). Restricting the loop shrinks each round's label
        # table from |nodes| to |edge endpoints| (near-dup graphs:
        # orders of magnitude); the fixed points are emitted directly as
        # singleton clusters at the end.
        nc = node_col or nodes.columns[0]
        all_nodes = nodes.select(F.col(nc).alias("id"))
        bounded = (
            edges.join(
                all_nodes.select(F.col("id").alias("src")), "src", "left_semi"
            ).join(
                all_nodes.select(F.col("id").alias("dst")), "dst", "left_semi"
            )
        ).localCheckpoint()
        unpersist_by_id(spark, checkpoint_rdd_id(edges))
        edges = bounded
        loop_ids = edges.select(F.col("src").alias("id")).distinct()
        singles = True  # derived from the FINAL label table below (the
        # edge checkpoint is retired at loop exit, so anything lazy must
        # not read it)
        labels = loop_ids.select("id", F.col("id").alias("lbl"))
    else:
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .select("id", F.col("id").alias("lbl"))
        )
    labels_cp = labels.localCheckpoint()
    labels = labels_cp
    changed = 0
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("id").alias("dst"), "lbl"), "dst"
            )
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
            .select(F.col("src").alias("id"), "nbr_lbl")
        )
        # r7: the convergence test rides the SAME pass as the label
        # update (a __chg flag materialized with the checkpoint) — the
        # old shape re-joined the new table against the old one per
        # round just to count changes, doubling the per-round job count
        new_cp = labels.join(nbr, "id", "left").select(
            "id",
            F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            (F.coalesce("nbr_lbl", F.col("lbl")) < F.col("lbl")).alias("__chg"),
        ).localCheckpoint()
        changed = new_cp.filter("__chg").count()  # reads checkpoint blocks
        # the superseded round's label blocks are no longer referenced
        # by anything — retire them so the operator's live footprint
        # stays at ONE label table + the edge list, independent of
        # round count
        unpersist_by_id(spark, checkpoint_rdd_id(labels_cp))
        labels_cp = new_cp
        labels = new_cp.select("id", "lbl")
        if changed == 0:
            break
    if changed != 0:
        # silent truncation would report one true component as several
        # clusters; a >max_iter-diameter component is pathological for
        # near-dup graphs and deserves a loud failure
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — the pair graph has a "
            "component with diameter > max_iter; raise max_iter"
        )
    # the edge list is dead once converged; only the final label table
    # stays pinned (the returned DataFrame reads its blocks)
    unpersist_by_id(spark, checkpoint_rdd_id(edges))
    if singles is not None:
        # non-edge nodes are fixed-point singleton clusters: anti-join
        # against the CONVERGED label table (whose checkpoint stays
        # pinned), never against the retired edge blocks
        labels = labels.unionByName(
            all_nodes.join(labels.select("id"), "id", "left_anti").select(
                "id", F.col("id").alias("lbl")
            )
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc, fully JVM-side: token xxhash64 -> per-bit
    vote counts (single aggregate over a 64-wide int array) -> sign bits."""
    toks = tokens(F.col(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # F.shiftright/shiftleft take a Python-int bit count, so the 64 bit
    # positions are unrolled driver-side into literal arrays.
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                    for i in range(64)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    bit_values = [1 << i for i in range(63)] + [-(1 << 63)]  # bit 63 = sign
    sim = F.aggregate(
        F.zip_with(
            votes,
            F.array(*[F.lit(v).cast("long") for v in bit_values]),
            lambda v, b: F.when(v > 0, b).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return df.select(F.col(id_col).alias("doc_id"), sim.alias("simhash"))


def simhash_signatures_fast(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Vectorized-numpy SimHash via mapInPandas: per Arrow batch, tokens
    explode inside pandas, hash via murmur3_64_bytes, and bit votes
    accumulate with one scatter-add into a (rows, 64) vote matrix — no
    shuffle, no per-row Python, ~50x the 64-lane Catalyst expression in
    simhash_signatures. Signatures differ from the xxhash64-based variant
    (different token hash family); near-dup properties are identical."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from ..hashing import murmur3_64_bytes

    schema = StructType(
        [
            StructField("doc_id", df.schema[id_col].dataType, False),
            # NULL text -> NULL signature, matching the Catalyst twin
            # (simhash_signatures propagates NULL through the expression)
            StructField("simhash", LongType(), True),
        ]
    )

    def fn(batches):
        for pdf in batches:
            norm = (
                pdf[text_col]
                .str.lower()
                .str.replace(r"\s+", " ", regex=True)
                .str.strip()
            )
            # NULL text must be masked BEFORE the flatten: iterating a
            # None/NaN "token list" raises and kills the whole task.
            # Nullable Int64 (not float64 + NaN) keeps 64-bit signatures
            # exact through Arrow.
            valid = norm.notna().to_numpy()
            sim_col = pd.array([pd.NA] * len(pdf), dtype="Int64")
            toks = norm[valid].str.split(" ")
            counts = toks.str.len().to_numpy().astype(np.int64)
            flat = [t for row in toks for t in row]
            if flat:
                h = murmur3_64_bytes(flat)
                bits = (
                    (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)
                ).astype(np.int64)
                # tokens of one doc are contiguous in `flat`, so per-doc
                # vote sums are a single reduceat over segment starts (2D
                # add.at scatter is ~10x slower)
                starts = np.zeros(len(counts), dtype=np.int64)
                np.cumsum(counts[:-1], out=starts[1:])
                votes = 2 * np.add.reduceat(bits, starts, axis=0) - counts[:, None]
                sim = np.where(votes > 0, 1, 0).astype(np.uint64)
                weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
                with np.errstate(over="ignore"):
                    sig = (sim * weights[None, :]).sum(axis=1, dtype=np.uint64)
                sim_col[valid] = sig.view(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "simhash": sim_col,
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, schema=schema)


def simhash_candidates(
    sigs: DataFrame, *, band_bits: int = 16
) -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit simhash band (Hamming
    distance <= 3 guarantees a shared band by pigeonhole)."""
    bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * band_bits)
                    .bitwiseAND(F.lit(mask))
                    for i in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def simhash_pipeline(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    band_bits: int = 16,
    max_hamming: int = 3,
    fast: bool = True,
    stage_runner=None,
    stage_name: str = "simhash_signatures",
    stage_inputs: Sequence[str] = (),
) -> DataFrame:
    """Composed SimHash near-dup tier: signatures -> band candidates ->
    exact Hamming verify, with the signature table materialized ONCE —
    the banded self-join plus the two-sided verify join otherwise give
    the composed plan FOUR consumers of the signature subtree, each
    re-running the vectorized kernel over the raw corpus (the same
    dual-consumer shape shingle_postings materializes for the MinHash
    tiers).

    ``stage_runner`` (VERDICT r5 #5) swaps the executor-pinned
    ``localCheckpoint`` for a DURABLE StageRunner parquet stage named
    ``stage_name`` with a lineage manifest — fault-tolerant and
    resumable across driver restarts, same contract (and tests) as the
    durable posting stage. Returns (id_a, id_b, hamming)."""
    sigs = (
        simhash_signatures_fast(df, text_col, id_col)
        if fast
        else simhash_signatures(df, text_col, id_col)
    )
    if stage_runner is not None:
        sigs = stage_runner.run(
            stage_name, lambda: sigs, inputs=stage_inputs
        )
    else:
        sigs = _mat(sigs)
    cand = simhash_candidates(sigs, band_bits=band_bits)
    return simhash_verify(sigs, cand, max_hamming=max_hamming)
