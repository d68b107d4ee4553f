"""Iceberg-style partitioned pages table (sandbox stand-in).

Production target is an Iceberg table partitioned by (days(warc_ts),
lang) read via ``spark.read.table``; this container has no Iceberg
runtime jars, so the same layout is realized as Hive-partitioned parquet
— which exercises the identical Catalyst machinery the north star needs:
partition pruning on lang/day predicates, column pruning, and
predicate pushdown into the scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_pages_table(pages: DataFrame, path: str) -> None:
    """Persist the CC-style pages table partitioned by (lang, day)."""
    (
        pages.withColumn("day", F.to_date("warc_ts"))
        .write.mode("overwrite")
        .partitionBy("lang", "day")
        .parquet(path)
    )


def read_pages(
    spark: SparkSession,
    path: str,
    *,
    langs: Sequence[str] | None = None,
    day_range: tuple[str, str] | None = None,
) -> DataFrame:
    """Read with partition-pruning predicates: lang/day filters resolve
    against directory metadata — pruned partitions are never opened."""
    df = spark.read.parquet(path)
    if langs:
        df = df.filter(F.col("lang").isin(list(langs)))
    if day_range:
        df = df.filter(F.col("day").between(*day_range))
    return df
