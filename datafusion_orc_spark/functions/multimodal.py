"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schema, batch shape, partition behavior,
vectorized UDF signatures) is real and tested; the media *decode* step
is STUBBED with a deterministic fake (this container has no image/audio
libraries — gate is ``_HAS_PIL``), clearly marked below. Swapping the
fake for PIL/librosa is a one-function change; nothing else moves.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder gate — not present in this sandbox
    import PIL.Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),  # opaque encoded bytes
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def synthetic_media(spark, n_rows: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random
    bytes whose length mimics a small JPEG/PCM blob."""
    df = spark.range(n_rows).withColumn("rnd", F.abs(F.xxhash64(F.col("id") + F.lit(seed))))
    return df.select(
        F.col("id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.pmod("rnd", F.lit(3)) + 1).cast("int")).alias("kind"),
        F.sha2(F.col("rnd").cast("string"), 256).cast("binary").alias("payload"),
        (F.pmod("rnd", F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod("rnd", F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod("rnd", F.lit(60000))).cast("int").alias("duration_ms"),
    )


def _fake_decode_features(payload: bytes, kind: str, dim: int = 16) -> np.ndarray:
    """STUB — deterministic stand-in for a media decode + feature
    extraction (e.g. resize->mean-pool for images, MFCC for audio).

    Replace with a real decoder when PIL/librosa are available
    (``_HAS_PIL``); the Spark plumbing around it does not change.
    """
    if _HAS_PIL and kind == "image":  # pragma: no cover - not in sandbox
        raise NotImplementedError("real image decode not wired in this sandbox")
    b = np.frombuffer(payload, dtype=np.uint8)
    # deterministic projection of the byte histogram onto `dim` buckets
    hist = np.bincount(b % dim, weights=b.astype(np.float64), minlength=dim)
    norm = np.linalg.norm(hist) or 1.0
    return (hist / norm).astype(np.float32)


def extract_features(media_df: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, one pandas frame per
    batch, vectorized per batch (the decode stub runs per row because
    real codecs are per-payload; everything around it is batch-shaped)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p, k, dim)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media_df.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: which (media_id, timestamp) pairs to
    decode — pure DataFrame math (sequence/explode), no Python."""
    return (
        media_df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("sample_ms"),
        )
    )
