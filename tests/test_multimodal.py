"""Multimodal plumbing tests: the decode step is stubbed (no media libs in
this container), the Spark-side schema/batching/distribution is real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from js_hll_spark.operators.multimodal import (
    decode_image,
    frame_sample_plan,
    image_features,
)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_image_features_batch_shape(spark):
    media = spark.range(50).select(
        F.col("id").cast("string").alias("media_id"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("media"),
    )
    out = image_features(media, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r["features"]) == 3 for r in rows)
    # deterministic: same blob -> same features at different parallelism
    again = {r["media_id"]: r["features"] for r in
             image_features(media.repartition(7), fake=True).collect()}
    assert all(again[r["media_id"]] == r["features"] for r in rows)


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [("v1", 3500), ("v2", 0)], ["media_id", "duration_ms"]
    )
    out = frame_sample_plan(vids, every_ms=1000).collect()
    got = {(r["media_id"], r["frame_ts_ms"]) for r in out}
    assert got == {("v1", 0), ("v1", 1000), ("v1", 2000), ("v1", 3000), ("v2", 0)}
