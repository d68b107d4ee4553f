"""Flagship webtext pipeline (SURVEY.md §7 step 6): the queries the north
star names, checkpoint-staged end to end over the CC-style table.

    pages -> extract text (pure, byte-identical per url)
          -> NDV(url) global / per lang / per warc_ts day   [HLL]
          -> heavy-hitter tokens                            [CMS]
          -> text-size quantiles                            [t-digest]

Every arrow is a StageRunner stage: killed runs resume from the last
complete stage via the parquet+manifest lineage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.text import tokens as text_tokens
from ..plans.checkpoint import StageRunner
from ..sources.webtext import WEBTEXT_SCHEMA, extract_text
from ..spark.agg import hll_sketch
from ..spark.sketch_agg import approx_quantiles, heavy_hitters


def extracted_pages(pages: DataFrame) -> DataFrame:
    """Re-extract text from html with the reference extractor (Arrow
    batches; pure function -> byte-identical per url at any parallelism).
    Production pages tables may lack the text column; ours carries it so
    tests can assert the invariant."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["text"] = [extract_text(bytes(h)) for h in pdf["html"]]
            yield pdf

    return pages.mapInPandas(fn, schema=pages.schema)


def webtext_ndv_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    work_dir: str,
    *,
    log2m: int = 13,
) -> dict[str, DataFrame]:
    """Run (or resume) the flagship pipeline; returns the result frames."""
    runner = StageRunner(spark, work_dir)

    def build_pages() -> DataFrame:
        return extracted_pages(pages)

    staged_pages = runner.run("pages", build_pages, partition_by=["lang"])

    sketches_day_lang = runner.run(
        "sketch_day_lang",
        lambda: hll_sketch(
            staged_pages.withColumn("day", F.to_date("warc_ts")),
            "url",
            by=["lang", "day"],
            log2m=log2m,
            estimate=False,
        ),
        inputs=["pages"],
    )

    from ..spark.agg import hll_rollup

    ndv_lang = runner.run(
        "ndv_lang",
        lambda: hll_rollup(sketches_day_lang, ["lang"]).select("lang", "ndv"),
        inputs=["sketch_day_lang"],
    )
    ndv_day = runner.run(
        "ndv_day",
        lambda: hll_rollup(sketches_day_lang, ["day"]).select("day", "ndv"),
        inputs=["sketch_day_lang"],
    )
    ndv_global = runner.run(
        "ndv_global",
        lambda: hll_rollup(
            sketches_day_lang.withColumn("all", F.lit(1)), ["all"]
        ).select("ndv"),
        inputs=["sketch_day_lang"],
    )

    top_tokens = runner.run(
        "top_tokens",
        lambda: heavy_hitters(
            # the shared, oracle-mirrored tokenizer (operators/text.tokens):
            # an ad-hoc split(lower(text)) would emit '' tokens for any
            # multi-space/newline text and pollute the top-k
            staged_pages.select(F.explode(text_tokens("text")).alias("tok")),
            "tok",
            k=30,
            width=16384,
        ),
        inputs=["pages"],
    )

    size_quantiles = runner.run(
        "size_quantiles",
        lambda: approx_quantiles(
            staged_pages.withColumn("n_chars", F.length("text")),
            "n_chars",
            by=["lang"],
            qs=(0.5, 0.9, 0.99),
            method="tdigest",
        ),
        inputs=["pages"],
    )

    return {
        "pages": staged_pages,
        "ndv_lang": ndv_lang,
        "ndv_day": ndv_day,
        "ndv_global": ndv_global,
        "top_tokens": top_tokens,
        "size_quantiles": size_quantiles,
    }
