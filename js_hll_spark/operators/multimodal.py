"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata. The Spark-side plumbing — schema, partitioning, Arrow UDF
signatures, batch shapes — is real and tested; the actual media decode is
STUBBED (the sandbox has no image/audio libraries): ``decode_image``
raises NotImplementedError unless ``fake=True``, which substitutes a
deterministic fake decoder so the downstream feature pipeline is
exercisable end to end.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def _fake_decode(blob: bytes, out_hw: tuple[int, int]) -> np.ndarray:
    """Deterministic stand-in decoder: a pseudo-image seeded by the blob's
    first 8 bytes. Replaces PIL/cv2 in this container."""
    seed = struct.unpack_from("<Q", blob.ljust(8, b"\0"), 0)[0] & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.random((out_hw[0], out_hw[1], 3), dtype=np.float32)


def decode_image(blob: bytes, out_hw: tuple[int, int] = (32, 32), *, fake: bool = False):
    if not fake:
        # Real path would be: PIL.Image.open(io.BytesIO(blob)).resize(...)
        raise NotImplementedError(
            "image decode requires PIL/cv2, not present in this container;"
            " pass fake=True for the deterministic stand-in"
        )
    return _fake_decode(blob, out_hw)


def image_features(
    df: DataFrame,
    *,
    blob_col: str = "media",
    id_col: str = "media_id",
    out_hw: tuple[int, int] = (32, 32),
    fake: bool = True,
) -> DataFrame:
    """Decode + resize + mean-pool features per image via mapInPandas —
    Arrow-batched, one numpy decode per row, no driver involvement. At
    cluster scale the input is repartitioned by size so decode work
    balances across executors."""
    n_feat = 3

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                img = decode_image(bytes(blob), out_hw, fake=fake)
                feats.append(img.mean(axis=(0, 1)).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_id": pdf[id_col], "features": feats}
            )

    schema = StructType(
        [
            StructField("media_id", df.schema[id_col].dataType, False),
            StructField("features", ArrayType(FloatType()), False),
        ]
    )
    return df.mapInPandas(fn, schema=schema)


def frame_sample_plan(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Expand each video row into (media_id, frame_ts_ms) sample points —
    pure JVM-side sequence/explode; the frame *decode* is the stubbed
    step, the distribution plan (explode -> repartition -> decode UDF)
    is the real scale path."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col(duration_col), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
