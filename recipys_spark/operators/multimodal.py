"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` UDFs so each Python worker sees whole
record batches, never rows.

The decode step itself is STUBBED: the image/audio codecs are not in
this container. ``deterministic_fake_decoder`` produces seeded fake
features from the payload hash so the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested;
``codec_decoder`` raises NotImplementedError until a codec is wired in.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.pmod(F.col("id"), F.lit(5000)) + 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def deterministic_fake_decoder(payload: bytes) -> np.ndarray:
    """Stand-in for a real codec: FEATURE_DIM floats derived from the
    payload's sha256 — stable across runs and cluster sizes."""
    digest = hashlib.sha256(payload or b"").digest()
    return np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(
        np.float32
    ) / np.float32(65535.0)


def codec_decoder(payload: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "Real image/audio decode needs codec libraries not present in this "
        "container; wire Pillow/torchaudio here and keep the same signature."
    )


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = deterministic_fake_decoder,
) -> DataFrame:
    """binary payload → float feature vector, one Arrow batch at a time."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video rows → one row per sampled frame offset (pure expressions:
    the frame *grid* is derivable from metadata without decoding)."""
    frames = F.sequence(
        F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms)
    )
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(frames).alias("frame_ms"),
        )
    )
