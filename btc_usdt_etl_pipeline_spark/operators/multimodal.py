"""Multimodal (image/audio/video) column plumbing (north star §2B).

Media payloads are opaque ``binary`` columns plus a typed metadata struct;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.  The
decode step is gated on codec IMPORTABILITY, checked inside the kernel
(i.e. on the executor, where it actually matters):

- ``decode="auto"`` (default): real decode where a codec applies
  (the built-in PPM/PGM/BMP decoder below for the formats it parses,
  PIL for anything else it handles), deterministic hash-seeded fake
  features otherwise — the same plan runs unchanged in a codec-less
  sandbox and a production image with Pillow installed.
- ``decode="stub"``: always the deterministic fake — the
  oracle-replayable mode (q44 pins this so the DuckDB twin can recompute
  features byte-for-byte).
- ``decode="real"``: require a working decode; raise
  ``NotImplementedError`` if no codec applies to the payload.

A dependency-free decoder for binary PPM (P6), PGM (P5), and
uncompressed 24-bit BMP ships in-module, so ``decode="real"`` has a real
end-to-end path even where Pillow is not installed (these three formats
are trivially parseable headers + raw samples — no compression).  The
builtin ALWAYS handles the formats it can parse — being dependency-free
it yields identical features on every executor — and PIL, when
importable, only widens coverage to formats the builtin can't parse
(JPEG/PNG/…).  Note the consequence: PIL-decoded features ARE
codec-environment-dependent (Pillow version, availability), builtin
ones are not.  Everything Spark-side — schema, batch iteration,
partitioning, output contract — is identical across the modes.
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


def _pool_to_feature(px: list[int], dim: int) -> list[float]:
    """Mean-pool a flat grayscale pixel list into ``dim`` floats in
    [0, 1] (shared by the PIL and built-in decode paths)."""
    n = len(px)
    feats = []
    for i in range(dim):
        lo, hi = i * n // dim, max((i + 1) * n // dim, i * n // dim + 1)
        cell = px[lo:hi] or [0]
        feats.append(sum(cell) / (255.0 * len(cell)))
    return feats


def _real_image_feature(payload, dim: int, image_mod) -> list[float]:
    """PIL decode → grayscale → resize → mean-pool to ``dim`` floats."""
    import io  # noqa: PLC0415

    if payload is None:
        return [0.0] * dim
    img = image_mod.open(io.BytesIO(bytes(payload))).convert("L")
    side = max(int(dim**0.5), 1)
    return _pool_to_feature(list(img.resize((side, side)).getdata()), dim)


def _decode_builtin(data: bytes):
    """Dependency-free image decode: binary PPM (P6) / PGM (P5) /
    uncompressed 24-bit BMP → (width, height, flat grayscale rows).

    Returns ``None`` when the payload is not one of these formats (the
    caller then falls back or raises per its decode mode).  These are
    header + raw-sample formats, so a correct reader is a page of code —
    no codec dependency, which is what makes ``decode="real"`` testable
    end-to-end in a bare container.
    """
    if data[:2] in (b"P6", b"P5"):
        return _decode_pnm(data)
    if data[:2] == b"BM":
        return _decode_bmp24(data)
    return None


def _decode_pnm(data: bytes):
    """Binary PPM/PGM: ``P6|P5 <w> <h> <maxval>`` header tokens (with
    ``#`` comments), then raw big-endian samples row-major."""
    channels = 3 if data[:2] == b"P6" else 1
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(data):
            return None
        ch = data[pos : pos + 1]
        if ch == b"#":  # comment to end-of-line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif ch.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval, then raster
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        return None
    bps = 1 if maxval < 256 else 2
    need = w * h * channels * bps
    raw = data[pos : pos + need]
    if len(raw) < need:
        return None
    px = []
    for i in range(w * h):
        acc = 0
        for c in range(channels):
            off = (i * channels + c) * bps
            v = (
                raw[off]
                if bps == 1
                else (raw[off] << 8) | raw[off + 1]
            )
            acc += v
        px.append(acc * 255 // (channels * maxval))
    return w, h, px


def _decode_bmp24(data: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): little-endian header
    fields, BGR samples, 4-byte-padded rows, bottom-up unless height<0."""
    import struct  # noqa: PLC0415

    if len(data) < 54:
        return None
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(data) < pixel_off + stride * h:
        return None
    px = [0] * (w * h)
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = pixel_off + src_row * stride
        for x in range(w):
            b, g, r = data[base + 3 * x : base + 3 * x + 3]
            px[row * w + x] = (r + g + b) // 3
    return w, h, px


def _builtin_image_feature(payload, dim: int) -> list[float] | None:
    """Built-in decode → nearest-neighbor resample to side² → mean-pool.

    Mirrors the PIL path's shape exactly (grayscale, side=floor(√dim),
    pool to ``dim``); returns None when the format is unrecognized.
    """
    if payload is None:
        return [0.0] * dim
    decoded = _decode_builtin(bytes(payload))
    if decoded is None:
        return None
    w, h, px = decoded
    side = max(int(dim**0.5), 1)
    resized = [
        px[(r * h // side) * w + (c * w // side)]
        for r in range(side)
        for c in range(side)
    ]
    return _pool_to_feature(resized, dim)


def _decode_wav_pcm(data: bytes):
    """Dependency-free WAV decode: RIFF/WAVE container, PCM (format 1)
    at 8 or 16 bits per sample → flat list of samples in [-1, 1]
    (channels averaged).  Returns ``None`` for anything else."""
    import struct  # noqa: PLC0415

    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        return None
    audio_format, channels, _rate, _bps_total, _align, bits = fmt
    if audio_format != 1 or channels < 1 or bits not in (8, 16):
        return None
    if bits == 16:
        n = len(raw) // 2
        ints = struct.unpack(f"<{n}h", raw[: n * 2])
        norm = [s / 32768.0 for s in ints]
    else:  # 8-bit WAV is unsigned
        norm = [(s - 128) / 128.0 for s in raw]
    if channels > 1:
        frames = len(norm) // channels
        norm = [
            sum(norm[f * channels : (f + 1) * channels]) / channels
            for f in range(frames)
        ]
    return norm


def _builtin_audio_feature(payload, dim: int) -> list[float] | None:
    """WAV decode → per-cell mean absolute amplitude (a crude energy
    envelope), ``dim`` floats in [0, 1].  None if not PCM WAV."""
    if payload is None:
        return [0.0] * dim
    samples = _decode_wav_pcm(bytes(payload))
    if samples is None or not samples:
        return None
    n = len(samples)
    feats = []
    for i in range(dim):
        lo, hi = i * n // dim, max((i + 1) * n // dim, i * n // dim + 1)
        cell = samples[lo:hi] or [0.0]
        feats.append(sum(abs(s) for s in cell) / len(cell))
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

        def feat(media_type: str, payload) -> list[float]:
            # Builtin decoders take precedence over PIL: they are
            # dependency-free and therefore DETERMINISTIC across every
            # executor, whereas PIL's luma/bicubic resize differs from
            # the builtin mean/nearest-neighbor — on a cluster with
            # inconsistent Pillow installs a PIL-first policy would mix
            # algorithms across partitions.  PIL is reserved for formats
            # the builtin can't parse (JPEG/PNG/…).
            if media_type == "image" and decode != "stub":
                built = _builtin_image_feature(payload, dim)
                if built is not None:
                    return built
                if image_mod is not None:
                    return _real_image_feature(payload, dim, image_mod)
            if media_type == "audio" and decode != "stub":
                built = _builtin_audio_feature(payload, dim)
                if built is not None:
                    return built
            if decode == "real":
                raise NotImplementedError(
                    f"no codec applies to media_type={media_type!r} "
                    "payload (images: not PPM/PGM/24-bit BMP and PIL "
                    "absent or unable to parse; audio: not PCM WAV; "
                    "video codecs are not wired yet)"
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


#: dHash output: four 16-bit band words (bits 0–15 → dh0, … 48–63 →
#: dh3).  Words, not one packed BIGINT: bit 63 would be the sign bit
#: (DuckDB raises on 1::BIGINT << 63 — portable-oracle hazard), and the
#: words double as the LSH band keys for :func:`btc_usdt_etl_pipeline_spark.
#: operators.dedup.hamming_near_pairs`.
DHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("dh0", LongType(), True),
        StructField("dh1", LongType(), True),
        StructField("dh2", LongType(), True),
        StructField("dh3", LongType(), True),
    ]
)


def _dhash_words(payload, grid: int = 8) -> list[int] | None:
    """Difference hash of one image payload via the built-in decoder:
    grayscale → nearest-neighbor resample to ``(grid+1) × grid`` →
    horizontal gradient sign bits (``1`` iff left pixel > right),
    row-major bit order, packed into ``grid²/16`` 16-bit words.

    The classic perceptual hash for image near-dup (dHash): invariant
    to uniform brightness/contrast changes (signs only), robust to
    small re-encodes, 64 bits at the default grid=8.  Returns ``None``
    for undecodable payloads (caller surfaces NULL words).
    """
    if payload is None:
        return None
    decoded = _decode_builtin(bytes(payload))
    if decoded is None:
        return None
    w, h, px = decoded
    rows, cols = grid, grid + 1
    g = [
        [px[(r * h // rows) * w + (c * w // cols)] for c in range(cols)]
        for r in range(rows)
    ]
    words = [0] * ((grid * grid + 15) // 16)
    for r in range(rows):
        for c in range(grid):
            if g[r][c] > g[r][c + 1]:
                b = r * grid + c
                words[b // 16] |= 1 << (b % 16)
    return words


def image_dhash(grid: int = 8) -> Callable[[DataFrame], DataFrame]:
    """Perceptual dHash per image asset — Arrow-batched ``mapInPandas``
    over ``(asset_id, payload)``, REAL decode via the dependency-free
    PPM/PGM/BMP reader (no codec gate to stub: these formats always
    decode deterministically on every executor).  Output is
    :data:`DHASH_SCHEMA`; compose with
    :func:`~btc_usdt_etl_pipeline_spark.operators.dedup.hamming_near_pairs`
    for Hamming-≤k near-duplicate pairs (image dedup for multimodal
    training corpora — the image twin of SimHash text dedup).

    Pure per-row kernel: partitioning is irrelevant to correctness;
    size partitions for payload bytes × Arrow batch rows.  Undecodable
    or NULL payloads emit NULL words (filter before pairing).
    """
    if grid != 8:
        # 16-bit words assume grid² divisible by 16; 8 is the standard
        raise ValueError("image_dhash supports grid=8 (64-bit dHash)")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words = [_dhash_words(p, grid) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "dh0": [w[0] if w else None for w in words],
                    "dh1": [w[1] if w else None for w in words],
                    "dh2": [w[2] if w else None for w in words],
                    "dh3": [w[3] if w else None for w in words],
                }
            )

    def _t(df: DataFrame) -> DataFrame:
        return df.select("asset_id", "payload").mapInPandas(
            kernel, DHASH_SCHEMA
        )

    return _t


def _audio_fingerprint_words(payload, frames: int = 65) -> list[int] | None:
    """Energy-envelope fingerprint of one PCM WAV payload: decode →
    ``frames`` equal cells of mean ABSOLUTE amplitude (the
    :func:`_builtin_audio_feature` envelope) → temporal gradient sign
    bits (``1`` iff cell f louder than cell f+1), packed into
    ``(frames−1)/16`` 16-bit words.

    The audio twin of :func:`_dhash_words`: invariant to uniform gain
    (signs only), robust to re-encodes that preserve the envelope.
    All envelope arithmetic on 8/16-bit PCM is DYADIC-exact in double
    (sample norms have power-of-two denominators; cell means divide by
    the cell length — exact for the power-of-two cell sizes the
    fixtures use, and deterministic regardless), so a SQL oracle can
    replay the bits via integer sample sums.  ``None`` for
    undecodable payloads.
    """
    if payload is None:
        return None
    samples = _decode_wav_pcm(bytes(payload))
    if samples is None or len(samples) < frames:
        return None
    n = len(samples)
    env = []
    for f in range(frames):
        lo, hi = f * n // frames, max((f + 1) * n // frames, f * n // frames + 1)
        cell = samples[lo:hi]
        env.append(sum(abs(s) for s in cell) / len(cell))
    bits = frames - 1
    words = [0] * ((bits + 15) // 16)
    for b in range(bits):
        if env[b] > env[b + 1]:
            words[b // 16] |= 1 << (b % 16)
    return words


def audio_fingerprint(frames: int = 65) -> Callable[[DataFrame], DataFrame]:
    """Perceptual audio fingerprint per asset — Arrow-batched
    ``mapInPandas`` over ``(asset_id, payload)``, real PCM WAV decode
    (dependency-free).  Emits the same ``dh0..dh3`` band-word layout as
    :func:`image_dhash`, so
    :func:`~btc_usdt_etl_pipeline_spark.operators.dedup.hamming_near_pairs`
    composes unchanged — audio near-duplicate detection for multimodal
    training corpora.  Undecodable/short payloads emit NULL words.
    """
    if frames != 65:
        raise ValueError("audio_fingerprint supports frames=65 "
                         "(64-bit fingerprint, four 16-bit bands)")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws = [_audio_fingerprint_words(p, frames)
                  for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "dh0": [w[0] if w else None for w in ws],
                    "dh1": [w[1] if w else None for w in ws],
                    "dh2": [w[2] if w else None for w in ws],
                    "dh3": [w[3] if w else None for w in ws],
                }
            )

    def _t(df: DataFrame) -> DataFrame:
        return df.select("asset_id", "payload").mapInPandas(
            kernel, DHASH_SCHEMA
        )

    return _t
