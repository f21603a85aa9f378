"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode itself is STUBBED (no image/audio codecs
in this container — see ``DecodeNotAvailable``) behind a deterministic fake
so the Spark-side contract — schema, batch shape, partition behavior — is
real and tested; swapping in PIL/torchaudio later only changes the body of
``_decode_payload``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DecodeNotAvailable(NotImplementedError):
    """Real codecs (PIL / libav) are not installed in this environment."""


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_hash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_payload(payload: bytes, media_type: str) -> list[float]:
    """STUB decode: a real implementation would decode pixels/samples.
    Deterministic fake: 8 float features derived from byte statistics, so
    the pipeline shape (binary in -> fixed-length feature out) is exercised
    end-to-end and reproducible."""
    if payload is None:
        return [0.0] * 8
    n = len(payload)
    if n == 0:
        return [0.0] * 8
    head = payload[: min(n, 64)]
    return [
        float(n),
        float(sum(head) % 997),
        float(head[0]),
        float(head[-1]),
        float(max(head)),
        float(min(head)),
        float(len(set(head))),
        float(n % 251),
    ]


def extract_features(df: DataFrame) -> DataFrame:
    """Binary payload -> fixed-length feature vector via Arrow-batched
    ``mapInPandas`` (the production shape for real decoders: one Python
    worker per partition, whole Arrow batches in/out)."""

    import zlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "payload_hash": pdf["payload"].map(
                        lambda p: zlib.crc32(bytes(p)) if p is not None else 0
                    ),
                    "feature": [
                        _decode_payload(bytes(p) if p is not None else None, t)
                        for p, t in zip(pdf["payload"], pdf["media_type"])
                    ],
                }
            )

    return df.mapInPandas(_batches, FEATURE_SCHEMA)


def payload_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass over binary payloads (no decode): byte size,
    crc32, and metadata fields — the cheap pre-filter before decoding."""
    return df.select(
        "media_id",
        F.length(F.col("payload")).alias("n_bytes"),
        F.crc32(F.col("payload")).alias("payload_crc"),
        F.col("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode of each frame is the stubbed stage). Demonstrates the
    explode-by-sequence pattern that keeps sampling declarative.
    ``explode_outer``: a video whose duration is unknown (null metadata,
    common before probing) yields ONE marker row with a null
    frame_ts_ms — dropping it silently would hide the asset from the
    decode stage with no diagnostic."""
    # the sequence must be NULL (not empty, not [0]) for a null duration:
    # greatest() SKIPS nulls, so greatest(NULL-1, 0) = 0 would silently
    # emit frame_ts_ms=0 — indistinguishable from a real first frame
    seq = F.when(F.col("meta.duration_ms").isNull(), F.lit(None)).otherwise(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
            F.lit(every_ms),
        )
    )
    return df.filter(F.col("media_type") == "video").select(
        "media_id", F.explode_outer(seq).alias("frame_ts_ms")
    )
