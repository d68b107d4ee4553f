"""Generic two-phase harness for the companion sketches (count-min, KLL,
t-digest, Bloom) — the same partial-per-partition -> merge-sketches-only
template as the HLL path in agg.py (SURVEY.md §2.3: all four are
commutative-monoid merges, so they share plumbing, partition-order
story and salting behavior).

Value transport:
- hash-positional sketches (cms, bloom) consume ``F.xxhash64(col)``
  computed JVM-side; raw values never cross into Python
- value sketches (kll, tdigest) consume the column cast to double
"""

from __future__ import annotations

from typing import Callable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

from ..core.bloom import BloomFilter
from ..core.cms import CountMinSketch
from ..core.kll import KLLSketch
from ..core.tdigest import TDigest
from ..hashing import to_uint64

_VAL = "__v"

_KINDS: dict[str, dict] = {
    "cms": {
        "factory": lambda p: CountMinSketch(p.get("depth", 5), p.get("width", 2048)),
        "update": lambda s, v: s.update_hashed(to_uint64(v)),
        "decode": CountMinSketch.from_bytes,
        "hashed": True,
    },
    "bloom": {
        "factory": lambda p: BloomFilter(p.get("n_bits", 1 << 20), p.get("n_hashes", 5)),
        "update": lambda s, v: s.add_hashed(to_uint64(v)),
        "decode": BloomFilter.from_bytes,
        "hashed": True,
    },
    "kll": {
        "factory": lambda p: KLLSketch(p.get("k", 200)),
        "update": lambda s, v: s.update(v),
        "decode": KLLSketch.from_bytes,
        "hashed": False,
    },
    "tdigest": {
        "factory": lambda p: TDigest(p.get("compression", 100.0)),
        "update": lambda s, v: s.update(v),
        "decode": TDigest.from_bytes,
        "hashed": False,
    },
}


def sketch_agg(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    *,
    kind: str,
    params: dict | None = None,
    finalize: Callable[[object], dict] | None = None,
    finalize_schema: list[StructField] | None = None,
) -> DataFrame:
    """Aggregate ``value_col`` into one ``kind`` sketch per group.

    Returns (keys..., sketch binary, rows_seen long, *finalize columns).
    ``finalize(sketch) -> {col: value}`` runs once per merged group.
    """
    spec = _KINDS[kind]
    params = params or {}
    keys = list(by)

    if spec["hashed"]:
        src = df.select(*keys, F.xxhash64(F.col(value_col)).alias(_VAL))
    else:
        src = df.select(*keys, F.col(value_col).cast("double").alias(_VAL))

    key_fields = [src.schema[k] for k in keys]
    partial_schema = StructType(
        key_fields
        + [
            StructField("sketch", BinaryType(), False),
            StructField("rows_seen", LongType(), False),
        ]
    )

    def partial_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, object] = {}
        rows: dict[tuple, int] = {}
        for pdf in batches:
            v = pdf[_VAL].to_numpy()
            if not keys:
                groups = {(): np.arange(len(pdf))}
            else:
                groups = {
                    (g if isinstance(g, tuple) else (g,)): idx
                    for g, idx in pdf.groupby(
                        list(keys), sort=False, dropna=False
                    ).indices.items()
                }
            for gk, idx in groups.items():
                s = acc.get(gk)
                if s is None:
                    s = acc[gk] = spec["factory"](params)
                    rows[gk] = 0
                spec["update"](s, v[idx])
                rows[gk] += len(idx)
        if acc:
            out = {k: [gk[i] for gk in acc] for i, k in enumerate(keys)}
            out["sketch"] = [s.to_bytes() for s in acc.values()]
            out["rows_seen"] = [rows[gk] for gk in acc]
            yield pd.DataFrame(out)

    partials = src.mapInPandas(partial_fn, schema=partial_schema)

    out_fields = list(key_fields) + [
        StructField("sketch", BinaryType(), False),
        StructField("rows_seen", LongType(), False),
    ] + (finalize_schema or [])

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = None
        for blob in pdf["sketch"]:
            s = spec["decode"](bytes(blob))
            merged = s if merged is None else merged.merge(s)
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out["sketch"] = [merged.to_bytes()]
        out["rows_seen"] = [int(pdf["rows_seen"].sum())]
        if finalize is not None:
            for col, val in finalize(merged).items():
                out[col] = [val]
        return pd.DataFrame(out)

    if keys:
        return partials.groupBy(*keys).applyInPandas(
            merge_fn, schema=StructType(out_fields)
        )
    return partials.groupBy(F.lit(1).alias("__g")).applyInPandas(
        lambda pdf: merge_fn(pdf), schema=StructType(out_fields)
    )


# ------------------------------------------------------------ pipelines --


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    *,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    method: str = "kll",
    params: dict | None = None,
) -> DataFrame:
    """(keys..., q50, q90, ... doubles) via KLL or t-digest — the sketch
    twin of ``percentile``/``percentile_approx`` (SURVEY.md §2.2)."""
    from pyspark.sql.types import DoubleType

    cols = [f"q{int(q * 100) if q * 100 == int(q * 100) else str(q).replace('.', '_')}" for q in qs]

    def fin(s) -> dict:
        vals = s.quantiles(list(qs))
        return dict(zip(cols, vals))

    out = sketch_agg(
        df,
        value_col,
        by,
        kind=method,
        params=params,
        finalize=fin,
        finalize_schema=[StructField(c, DoubleType(), True) for c in cols],
    )
    return out.select(*by, *cols)


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    k: int = 20,
    depth: int = 5,
    width: int = 8192,
    candidates_per_partition: int = 200,
) -> DataFrame:
    """Approximate top-k frequent values via count-min + per-partition
    candidate generation: each partition nominates its local top
    candidates (mapInPandas value_counts — no shuffle of raw rows), the
    global CMS scores the union, top-k by estimated count. The CMS bounds
    the overcount; candidates can only miss an item whose count is below
    every partition's local top-C (SURVEY.md §2.2 'frequency')."""
    from pyspark.sql.types import StringType

    src = df.select(F.col(col).cast("string").alias(_VAL)).filter(
        F.col(_VAL).isNotNull()
    )

    def candidates_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series | None = None
        for pdf in batches:
            c = pdf[_VAL].value_counts()
            counts = c if counts is None else counts.add(c, fill_value=0)
        if counts is not None:
            top = counts.nlargest(candidates_per_partition)
            yield pd.DataFrame({"value": top.index.astype(str)})

    cand = src.mapInPandas(
        candidates_fn, schema=StructType([StructField("value", StringType())])
    ).distinct()

    cms_df = sketch_agg(src, _VAL, kind="cms", params={"depth": depth, "width": width})
    sketch_blob = cms_df.select("sketch")

    # candidates are few (<= partitions * candidates_per_partition), so the
    # single broadcast sketch blob + one scoring task is cheap; hashing the
    # candidate strings stays JVM-side so probe positions match the build
    hashed = cand.crossJoin(F.broadcast(sketch_blob)).withColumn(
        "__h", F.xxhash64("value")
    )

    def score_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = CountMinSketch.from_bytes(bytes(pdf["sketch"].iloc[0]))
        est = sk.query_hashed(to_uint64(pdf["__h"].to_numpy()))
        return pd.DataFrame({"value": pdf["value"], "est_count": est})

    scored = hashed.groupBy(F.lit(1).alias("__g")).applyInPandas(
        score_fn,
        schema=StructType(
            [StructField("value", StringType()), StructField("est_count", LongType())]
        ),
    )
    return scored.orderBy(F.desc("est_count"), F.asc("value")).limit(k)
