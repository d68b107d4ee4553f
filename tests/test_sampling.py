"""Deterministic sampling operators (operators/sample.py): exact
Spark-vs-DuckDB row-set equivalence (the registry's 50-row driver
window is full, so the oracle lives here), plus the properties a
reproducible corpus subsample must hold — nestedness, join-consistency,
split disjointness, and partition-order independence."""

from __future__ import annotations

import duckdb
import pytest

from js_hll_spark.operators import sample

SF = "/root/testdata/sf0.01"


def _duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con


def U01_fmt(seed: str) -> str:
    # mirror _key_u01's length-prefixed seed + 'v|' value-marker
    # derivation (the marker makes real keys collision-free vs the
    # null draw)
    p = f"{len(seed)}|{seed}|v|"
    return (
        f"(('0x' || substring(md5('{p}' || doc_id::VARCHAR), 1, 13))::BIGINT"
        " / 4503599627370496.0)"
    )


def test_bernoulli_matches_duckdb(spark, documents):
    got = sorted(
        r["doc_id"]
        for r in sample.sample_bernoulli(
            documents, 0.3, "doc_id", seed="s1"
        ).collect()
    )
    con = _duck()
    want = sorted(
        r[0]
        for r in con.sql(
            "SELECT doc_id FROM documents WHERE "
            + U01_fmt("s1")
            + " < 0.3"
        ).fetchall()
    )
    assert got == want and 0 < len(got) < documents.count()
    # fraction is honored within binomial noise
    n = documents.count()
    assert abs(len(got) / n - 0.3) < 0.1


def test_bernoulli_nested_and_join_consistent(spark, documents):
    small = {
        r["doc_id"]
        for r in sample.sample_bernoulli(documents, 0.2, "doc_id").collect()
    }
    big = {
        r["doc_id"]
        for r in sample.sample_bernoulli(documents, 0.5, "doc_id").collect()
    }
    assert small <= big  # nested: growing the fraction only adds keys
    # join-consistency: sampling another table by the same key keeps
    # exactly the same key set
    other = documents.select("doc_id", "lang")
    other_keys = {
        r["doc_id"]
        for r in sample.sample_bernoulli(other, 0.2, "doc_id").collect()
    }
    assert other_keys == small
    # a different seed draws a genuinely different sample
    reseeded = {
        r["doc_id"]
        for r in sample.sample_bernoulli(
            documents, 0.2, "doc_id", seed="other"
        ).collect()
    }
    assert reseeded != small


def test_stratified_matches_duckdb_and_quotas(spark, documents):
    k = 7
    got = sorted(
        (r["lang"], r["doc_id"])
        for r in sample.sample_stratified(
            documents, ["lang"], k, "doc_id"
        ).collect()
    )
    con = _duck()
    want = sorted(
        (r[0], r[1])
        for r in con.sql(
            "SELECT lang, doc_id FROM ("
            "  SELECT lang, doc_id, row_number() OVER ("
            "    PARTITION BY lang ORDER BY " + U01_fmt("")
            + " ASC, doc_id ASC) AS rk FROM documents"
            ") WHERE rk <= 7"
        ).fetchall()
    )
    assert got == want
    counts = (
        sample.sample_stratified(documents, ["lang"], k, "doc_id")
        .groupBy("lang")
        .count()
        .collect()
    )
    n_langs = documents.select("lang").distinct().count()
    assert len(counts) == n_langs
    assert all(r["count"] == k for r in counts)  # every gate lang has >= k docs


def test_fixed_sample_matches_duckdb_and_plan(spark, documents):
    n = 37
    got = sorted(
        r["doc_id"]
        for r in sample.sample_fixed(documents, n, "doc_id").collect()
    )
    con = _duck()
    want = sorted(
        r[0]
        for r in con.sql(
            "SELECT doc_id FROM documents ORDER BY "
            + U01_fmt("")
            + " ASC, doc_id ASC LIMIT 37"
        ).fetchall()
    )
    assert got == want and len(got) == n
    # scale shape: global order+limit must run as TakeOrdered (local
    # top-n + single merge), never a full sort shuffle
    plan = (
        sample.sample_fixed(documents, n, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_split_disjoint_exhaustive_stable(spark, documents):
    train, hold = sample.split_train_holdout(documents, 0.25, "doc_id")
    t = {r["doc_id"] for r in train.collect()}
    h = {r["doc_id"] for r in hold.collect()}
    assert t.isdisjoint(h)
    assert len(t) + len(h) == documents.count()
    # membership is a pure function of the key: a reshuffled copy of the
    # table splits identically (no partition-order dependence)
    t2, h2 = sample.split_train_holdout(
        documents.repartition(13), 0.25, "doc_id"
    )
    assert {r["doc_id"] for r in h2.collect()} == h


def test_bernoulli_rejects_bad_fraction(spark, documents):
    with pytest.raises(ValueError, match="fraction"):
        sample.sample_bernoulli(documents, 1.5, "doc_id")


def test_weighted_sample_matches_duckdb_and_bias(spark, documents):
    """Weighted fixed-size sampling (Efraimidis-Spirakis keys from the
    deterministic hash): exact row-set equality vs DuckDB, TakeOrdered
    plan shape, and the weighting actually biases the sample (mean
    n_chars of a size-weighted sample exceeds the corpus mean)."""
    n = 50
    got = sorted(
        r["doc_id"]
        for r in sample.sample_weighted(
            documents, n, "doc_id", "n_chars"
        ).collect()
    )
    con = _duck()
    want = sorted(
        r[0]
        for r in con.sql(
            "SELECT doc_id FROM documents WHERE n_chars > 0 "
            "ORDER BY -ln(greatest(" + U01_fmt("")
            + ", pow(2.0, -52))) / n_chars::DOUBLE ASC, doc_id ASC LIMIT 50"
        ).fetchall()
    )
    assert got == want and len(got) == n
    plan = (
        sample.sample_weighted(documents, n, "doc_id", "n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    import pyspark.sql.functions as F

    corpus_mean = documents.agg(F.avg("n_chars")).first()[0]
    sample_mean = (
        sample.sample_weighted(documents, n, "doc_id", "n_chars")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sample_mean > corpus_mean


def test_null_keys_survive_bernoulli_and_split(spark):
    """Null keys hash through a sentinel instead of propagating NULL:
    fraction=1.0 must keep every row, and a split must stay exhaustive
    with null-keyed rows present (the repo's recurring null-group bug
    class — NULL < f is NULL, which silently drops the row)."""
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], ["id", "k"]
    )
    assert sample.sample_bernoulli(df, 1.0, "k").count() == 4
    train, hold = sample.split_train_holdout(df, 0.5, "k")
    assert train.count() + hold.count() == 4
    with pytest.raises(ValueError, match="holdout_fraction"):
        sample.split_train_holdout(df, -0.1, "k")


def test_null_draw_independent_of_lookalike_keys(spark):
    """The null draw goes through marker 'n' while real keys hash with a
    'v|' prefix: a real key whose string form matches any sentinel text
    must sample INDEPENDENTLY of null-keyed rows (the old bare-sentinel
    encoding made them travel together under every seed)."""
    df = spark.createDataFrame(
        [(1, "\x00null"), (2, None), (3, "n"), (4, "v|x")], ["id", "k"]
    )
    split_differs = {pair: 0 for pair in ((1, 2), (3, 2))}
    for seed in map(str, range(12)):
        kept = {
            r["id"]
            for r in sample.sample_bernoulli(df, 0.5, "k", seed=seed).collect()
        }
        for a, b in split_differs:
            if (a in kept) != (b in kept):
                split_differs[(a, b)] += 1
    assert all(v > 0 for v in split_differs.values()), split_differs


def test_temp_columns_do_not_clobber_input(spark):
    """The samplers' working columns pick non-colliding names: an input
    that already carries __u/__s/__rk keeps its data in the output."""
    rows = [(i, float(i + 1), f"u{i}", f"s{i}", i * 10) for i in range(20)]
    df = spark.createDataFrame(rows, ["id", "w", "__u", "__s", "__rk"])
    for out in (
        sample.sample_fixed(df, 5, "id"),
        sample.sample_weighted(df, 5, "id", "w"),
        sample.sample_stratified(df, ["__rk"], 1, "id"),
    ):
        got = out.collect()
        assert set(out.columns) == set(df.columns)
        for r in got:
            assert r["__u"] == f"u{r['id']}" and r["__s"] == f"s{r['id']}"


def test_weighted_excludes_nan_and_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, float("nan")), (3, -1.0), (4, 0.0), (5, 3.0)],
        ["id", "w"],
    )
    got = {r["id"] for r in sample.sample_weighted(df, 10, "id", "w").collect()}
    assert got == {1, 5}
