"""Multimodal (image/audio/video) column plumbing (north star §2B).

Media payloads are opaque ``binary`` columns plus a typed metadata struct;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.  The
decode step is gated on codec IMPORTABILITY, checked inside the kernel
(i.e. on the executor, where it actually matters):

- ``decode="auto"`` (default): real decode where the codec imports
  (PIL for images), deterministic hash-seeded fake features otherwise —
  the same plan runs unchanged in a codec-less sandbox and a production
  image with Pillow installed.
- ``decode="stub"``: always the deterministic fake — the
  oracle-replayable mode (q44 pins this so the DuckDB twin can recompute
  features byte-for-byte).
- ``decode="real"``: require the codec; raise ``NotImplementedError``
  with the missing-dependency message if absent.

This container ships no media codecs, so ``auto`` == ``stub`` here; the
real branch is covered in tests via an injected fake ``PIL`` module.
Everything Spark-side — schema, batch iteration, partitioning, output
contract — is identical across the three modes.
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


def _image_codec():
    """The image codec module if importable on THIS process, else None.

    Called inside the mapInPandas kernel so the check runs on the
    executor (a heterogeneous cluster may have codecs on some images and
    not others; the driver's site-packages prove nothing)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _real_image_feature(payload, dim: int, image_mod) -> list[float]:
    """Decode → grayscale → mean-pool to ``dim`` floats in [0, 1]."""
    import io  # noqa: PLC0415

    if payload is None:
        return [0.0] * dim
    img = image_mod.open(io.BytesIO(bytes(payload))).convert("L")
    side = max(int(dim**0.5), 1)
    px = list(img.resize((side, side)).getdata())
    n = len(px)
    feats = []
    for i in range(dim):
        lo, hi = i * n // dim, max((i + 1) * n // dim, i * n // dim + 1)
        cell = px[lo:hi] or [0]
        feats.append(sum(cell) / (255.0 * len(cell)))
    return feats


def extract_features(
    dim: int = 16, decode: str = "auto"
) -> Callable[[DataFrame], DataFrame]:
    """Binary payload → float feature vector via Arrow-batched mapInPandas.

    ``decode``: ``auto`` | ``stub`` | ``real`` (module docstring).  Batch
    shape: the iterator sees pandas DataFrames of
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows; the kernel is
    pure per-row so partitioning is irrelevant to correctness — size
    partitions for memory (payload bytes × batch rows).
    """
    if decode not in ("auto", "stub", "real"):
        raise ValueError("decode must be auto | stub | real")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        image_mod = None if decode == "stub" else _image_codec()
        if decode == "real" and image_mod is None:
            raise NotImplementedError(
                "decode='real' requires an image codec (Pillow) on the "
                "executors; pip install Pillow or use decode='auto'"
            )

        def feat(media_type: str, payload) -> list[float]:
            if image_mod is not None and media_type == "image":
                return _real_image_feature(payload, dim, image_mod)
            if decode == "real":
                raise NotImplementedError(
                    f"no codec for media_type={media_type!r} "
                    "(audio/video codecs are not wired yet)"
                )
            return _fake_feature(payload, dim)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "feature": [
                        feat(m, p)
                        for m, p in zip(pdf["media_type"], pdf["payload"])
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
