"""Deterministic Common-Crawl-style page generator + reference extractor
(FIXTURES.md §1, the BASELINE.json input_hint table):

    (url string, warc_ts timestamp, html binary, text string, lang string)

Every column is a pure function of the row id (seeded splitmix64 streams),
so the table is identical at any parallelism and any partitioning — which
is also what makes 'byte-identical extracted text per url' testable: html
is a function of url only, text = extract_text(html).

~20% of rows duplicate an earlier url (known NDV by construction); hosts
are Zipf-distributed; lang is Zipf-skewed with 'en' ~60% to exercise the
skew story (the partial-aggregation harness is immune by design)."""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_U = np.uint64
SEED = 42

LANGS = ["en", "de", "fr", "es", "zh", "pt", "it", "nl", "ru", "ja", "ko",
         "ar", "sv", "pl"]
# cumulative probabilities: en 60, de 10, fr 8, es 7, zh 6, 9 tail langs 1% each
_LANG_CUM = np.cumsum([0.60, 0.10, 0.08, 0.07, 0.06] + [0.01] * 9)

_WORDS = (
    "data web page crawl index token model train corpus text link site "
    "news article search query learn scale spark shard batch stream merge "
    "sketch count hash value table row column field record store fetch"
).split()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic per-id pseudo-random stream (public splitmix64)."""
    with np.errstate(over="ignore"):
        z = x + _U(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U(30))) * _U(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U(27))) * _U(0x94D049BB133111EB)
        return z ^ (z >> _U(31))


def _stream(ids: np.ndarray, salt: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return _splitmix64(ids.astype(_U) + _U(salt) * _U(0x9E3779B97F4A7C15) + _U(SEED))


def _u01(ids: np.ndarray, salt: int) -> np.ndarray:
    return (_stream(ids, salt) >> _U(11)).astype(np.float64) / float(1 << 53)


from functools import lru_cache


@lru_cache(maxsize=8)
def _zipf_cdf(n: int, s: float) -> np.ndarray:
    """Normalized Zipf(s) CDF over n ranks. Cached: it depends only on
    (n, s), which are fixed per table, while _zipf_index runs once per
    Arrow batch per partition — at n_rows=1e9 (n_hosts=1e6) the rebuild
    was ~1e5 redundant million-element power+cumsum passes dominating
    the url-only generation path."""
    ranks = np.arange(1, n + 1, dtype=np.float64)
    weights = ranks ** -s
    cum = np.cumsum(weights)
    cum /= cum[-1]
    return cum


def _zipf_index(u: np.ndarray, n: int, s: float = 1.2) -> np.ndarray:
    """Map uniform [0,1) to Zipf(s) ranks over n items via inverse CDF."""
    return np.searchsorted(_zipf_cdf(n, s), u, side="right").clip(0, n - 1)


TAG_RE = re.compile(rb"<[^>]*>")
WS_RE = re.compile(rb"\s+")


def extract_text(html: bytes) -> str:
    """The reference extractor: strip tags, collapse whitespace, strip.
    Pure function of the bytes -> byte-identical per url at any
    parallelism (the BASELINE.json per-row invariant)."""
    no_tags = TAG_RE.sub(b" ", html)
    collapsed = WS_RE.sub(b" ", no_tags).strip()
    return collapsed.decode("utf-8")


_ALL_COLS = ("url", "warc_ts", "html", "text", "lang")


def _make_batch(
    ids: np.ndarray,
    n_hosts: int,
    columns: tuple[str, ...] = _ALL_COLS,
) -> pd.DataFrame:
    """Generate the requested columns only — every column is a pure
    function of the row id, so subsetting is free and byte-identical to
    the full generation (html/text carry the per-row Python cost; url and
    lang are fully vectorized)."""
    cols = frozenset(columns)
    # duplicate urls: ~20% of rows (with id>0) point at an earlier row
    is_dup = (_u01(ids, 1) < 0.20) & (ids > 0)
    ref = np.floor(_u01(ids, 2) * ids).astype(np.int64)
    canon = np.where(is_dup, ref, ids)

    data: dict[str, object] = {}
    if "url" in cols:
        host_idx = _zipf_index(_u01(canon, 3), n_hosts)
        path_a = (_stream(canon, 4) % _U(997)).astype(np.int64)
        # canon in the path makes urls globally unique per canonical id,
        # so exact NDV(url) == count of distinct canonical ids
        data["url"] = (
            "https://host"
            + pd.Series(host_idx.astype(np.int64)).astype(str)
            + ".example.com/p/"
            + pd.Series(path_a).astype(str)
            + "/"
            + pd.Series(canon).astype(str)
        )
    if "warc_ts" in cols:
        # warc_ts: uniform over 30 days from 2026-01-01, whole seconds.
        # Emitted tz-NAIVE and meant as UTC wall-clock: Spark interprets
        # naive timestamps in spark.sql.session.timeZone, so sessions
        # must pin UTC (get_spark does) or day boundaries shift
        base = np.int64(1767225600)  # 2026-01-01T00:00:00Z
        ts = base + (_stream(ids, 8) % _U(30 * 86400)).astype(np.int64)
        data["warc_ts"] = pd.to_datetime(ts, unit="s")
    if cols & {"html", "text"}:
        n_paras = 1 + (_stream(canon, 7) % _U(5)).astype(np.int64)
        htmls, texts = [], []
        word_pick = _stream(canon, 9)
        for i in range(len(ids)):
            c = int(canon[i])
            with np.errstate(over="ignore"):
                rng_words = _splitmix64(
                    np.arange(c, c + 40, dtype=np.int64).astype(_U) + word_pick[i]
                )
            words = [_WORDS[int(w % _U(len(_WORDS)))] for w in rng_words]
            title = " ".join(words[:4])
            paras = "".join(
                f"<p>{' '.join(words[4 + 6 * p : 10 + 6 * p])}.</p>"
                for p in range(int(n_paras[i]))
            )
            html = (
                f"<html><head><title>{title}</title></head>"
                f"<body><h1>{title}</h1>{paras}</body></html>"
            ).encode("utf-8")
            htmls.append(html)
            texts.append(extract_text(html))
        if "html" in cols:
            data["html"] = htmls
        if "text" in cols:
            data["text"] = texts
    if "lang" in cols:
        lang_idx = np.searchsorted(
            _LANG_CUM, _u01(canon, 6), side="right"
        ).clip(0, len(LANGS) - 1)
        data["lang"] = [LANGS[int(j)] for j in lang_idx]
    # preserve canonical column order regardless of the requested subset
    return pd.DataFrame({c: data[c] for c in _ALL_COLS if c in cols})


WEBTEXT_SCHEMA = StructType(
    [
        StructField("row_id", LongType(), False),
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)


def webtext_table(
    spark: SparkSession,
    n_rows: int,
    *,
    partitions: int | None = None,
    columns: tuple[str, ...] | None = None,
) -> DataFrame:
    """Generate the CC-style table distributed (mapInPandas over
    spark.range — each partition generates its own id span). ``columns``
    restricts generation to a subset (plus row_id) — manual column
    pruning, since Catalyst cannot prune inside the generator UDF; the
    subset is byte-identical to the full table's columns."""
    n_hosts = max(10, n_rows // 1000)
    rng = spark.range(n_rows, numPartitions=partitions)
    cols = tuple(columns) if columns else _ALL_COLS
    unknown = set(cols) - set(_ALL_COLS)
    if unknown:
        # fail fast: a typo'd column name would otherwise silently
        # vanish from the generated schema and surface far downstream
        raise ValueError(
            f"unknown webtext columns {sorted(unknown)}; "
            f"available: {list(_ALL_COLS)}"
        )
    schema = StructType(
        [WEBTEXT_SCHEMA["row_id"]]
        + [WEBTEXT_SCHEMA[c] for c in _ALL_COLS if c in cols]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = _make_batch(ids, n_hosts, cols)
            out.insert(0, "row_id", ids)
            yield out

    return rng.mapInPandas(gen, schema=schema)


def exact_ndv_urls(n_rows: int) -> int:
    """Ground truth NDV(url) by construction: distinct canonical ids."""
    ids = np.arange(n_rows, dtype=np.int64)
    is_dup = (_u01(ids, 1) < 0.20) & (ids > 0)
    ref = np.floor(_u01(ids, 2) * ids).astype(np.int64)
    canon = np.where(is_dup, ref, ids)
    return int(np.unique(canon).size)
