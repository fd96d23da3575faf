"""Multimodal (image/audio/video) column plumbing (north star §2B).

Media payloads are opaque ``binary`` columns plus a typed metadata struct;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.  The
actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the decode
kernels are stubbed: ``decode_stub=True`` produces deterministic fake
features (hash-seeded), ``False`` raises ``NotImplementedError`` at the
point a real codec would run.  Everything Spark-side — schema, batch
iteration, partitioning, output contract — is real and tested.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-asset schema: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", LongType(), True),
                    StructField("height", LongType(), True),
                    StructField("duration_ms", LongType(), True),
                    StructField("codec", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def _fake_feature(payload: bytes | None, dim: int) -> list[float]:
    """Deterministic stand-in for a real decode→embed kernel."""
    if payload is None:
        return [0.0] * dim
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return [((h >> (i % 56)) % 997) / 997.0 for i in range(dim)]


def extract_features(
    dim: int = 16, decode_stub: bool = True
) -> Callable[[DataFrame], DataFrame]:
    """Binary payload → float feature vector via Arrow-batched mapInPandas.

    Batch shape: the iterator sees pandas DataFrames of
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows; the kernel is
    pure per-row so partitioning is irrelevant to correctness — size
    partitions for memory (payload bytes × batch rows).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media codecs (PIL/librosa/ffmpeg) are not "
                    "available in this container"
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": [
                        _fake_feature(p, dim) for p in pdf["payload"]
                    ],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    def _t(df: DataFrame) -> DataFrame:
        return df.select("asset_id", "media_type", "payload").mapInPandas(
            kernel, FEATURE_SCHEMA
        )

    return _t


def frame_sample_plan(
    every_ms: int = 1000,
) -> Callable[[DataFrame], DataFrame]:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (pure expression — the decode itself is the stubbed kernel).

    Demonstrates the explode-then-decode layout that keeps per-task memory
    bounded: N frame rows per asset, repartitionable before decode.
    """

    def _t(df: DataFrame) -> DataFrame:
        n_frames = F.greatest(
            (F.col("meta.duration_ms") / F.lit(every_ms)).cast("long"),
            F.lit(1),
        )
        return df.withColumn(
            "frame_ts_ms",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i * F.lit(every_ms),
                )
            ),
        )

    return _t
