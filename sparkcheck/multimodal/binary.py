"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus a typed metadata
struct — the pattern used by Spark's own ``binaryFile`` source and by
web-scale multimodal pipelines (payload bytes stay columnar/Arrow;
decode happens in vectorized Python batches).

The Spark-side plumbing here is REAL and tested: schemas, partitioning,
``mapInPandas`` batch shape, Arrow transfer. The decode slot is real
too for the formats decodable without native media libraries — PCM WAV
and uncompressed BMP parse + feature-extract in pure numpy
(multimodal/codecs.py: RIFF/DIB header walks, FFT spectral centroid,
nearest-neighbor resize), and baseline JPEG decodes for real via
multimodal/jpeg.py (ITU T.81 Huffman + IDCT, pure numpy). Only VIDEO
codecs (MP4/H.264), whose libraries are not in this container, fall
back to a clearly-marked deterministic stub with the exact signature a
real decoder (pyav) would drop into.

Scale notes: decode is map-only (no shuffle); partition sizing is
governed by bytes not rows — repartition the input so
(rows_per_partition × payload_size) fits executor memory, and keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low for large payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 8


def fake_media_table(spark: SparkSession, n: int, num_partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table (media_id, payload:binary,
    meta:struct) — payload = md5-seeded pseudo-bytes, so tests and
    benches are reproducible without any media libraries."""
    df = spark.range(n, numPartitions=num_partitions)
    payload = F.repeat(F.md5(F.col("id").cast("string")), 4).cast("binary")
    meta = F.struct(
        F.when(F.col("id") % 3 == 0, F.lit("image"))
        .when(F.col("id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("id") % 640 + 32).cast("int").alias("width"),
        (F.col("id") % 480 + 32).cast("int").alias("height"),
        (F.col("id") % 10000).cast("long").alias("duration_ms"),
        F.length(payload).cast("long").alias("n_bytes"),
    )
    return df.select(
        F.col("id").alias("media_id"), payload.alias("payload"), meta.alias("meta")
    )


def real_media_table(
    spark: SparkSession, n: int, num_partitions: int | None = None
) -> DataFrame:
    """Synthetic table of REAL decodable payloads (media_id, payload,
    meta): id%3==0 → PCM WAV sine tones (220 + 20·id Hz, 0.25 s @ 8 kHz),
    id%3==1 → 24-bit BMP gradients (16×16, id-dependent), id%3==2 →
    baseline JPEG of the same gradient (multimodal/jpeg.py). Generated
    executor-side per Arrow batch — deterministic in media_id, so any
    partitioning yields identical rows; no media libs required."""
    import numpy as np

    from sparkcheck.multimodal.codecs import encode_bmp, encode_wav
    from sparkcheck.multimodal.jpeg import encode_jpeg

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_type", T.StringType()),
        ]
    )

    def _gradient(mid: int) -> "np.ndarray":
        g = np.arange(16, dtype=np.uint8)
        img = np.zeros((16, 16, 3), dtype=np.uint8)
        img[:, :, 0] = g[None, :] * 16          # R: x gradient
        img[:, :, 1] = g[:, None] * 16          # G: y gradient
        img[:, :, 2] = (mid * 37) % 256         # B: id-constant
        return img

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(2000) / 8000.0  # 0.25 s @ 8 kHz
        for pdf in batches:
            payloads, kinds = [], []
            for mid in pdf["id"]:
                mid = int(mid)
                if mid % 3 == 0:
                    # 220 + 20*mid keeps every tone on an exact 4 Hz FFT bin
                    # (2000 samples @ 8 kHz), so the spectral centroid has no
                    # leakage bias and tests can pin it tightly
                    tone = 0.5 * np.sin(2 * np.pi * (220.0 + 20.0 * mid) * t)
                    payloads.append(encode_wav(tone, 8000))
                    kinds.append("audio")
                elif mid % 3 == 1:
                    payloads.append(encode_bmp(_gradient(mid)))
                    kinds.append("image")
                else:
                    payloads.append(encode_jpeg(_gradient(mid), quality=90))
                    kinds.append("image")
            yield pd.DataFrame(
                {"media_id": pdf["id"], "payload": payloads, "media_type": kinds}
            )

    base = spark.range(n, numPartitions=num_partitions)
    gen = base.mapInPandas(_gen, out_schema)
    meta = F.struct(
        F.col("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(16).cast("int").alias("width"),
        F.lit(16).cast("int").alias("height"),
        F.lit(250).cast("long").alias("duration_ms"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
    return gen.select("media_id", "payload", meta.alias("meta"))


def media_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata projection + payload size check — pure Column work,
    no decode: (media_id, media_type, n_bytes, meta_bytes_match)."""
    return df.select(
        "media_id",
        F.col("meta.media_type").alias("media_type"),
        F.length("payload").cast("long").alias("n_bytes"),
        (F.length("payload").cast("long") == F.col("meta.n_bytes")).alias("meta_bytes_match"),
    )


def _decode_payload(payload: bytes) -> list[float]:
    """Dispatching decoder: REAL pure-numpy decode + feature extraction
    for PCM WAV, uncompressed 24-bit BMP (multimodal/codecs.py — header
    parsing, FFT spectral centroid, nearest-neighbor resize, channel
    stats) and baseline JPEG (multimodal/jpeg.py — Huffman entropy
    decode + IDCT per ITU T.81). Only VIDEO codecs (MP4/H.264) still
    need native libs absent from this container and fall back to the
    documented deterministic STUB (md5-derived features) — a real
    deployment replaces only that branch with pyav. Raises on None to
    mirror real decoder behavior on missing payloads.
    """
    from sparkcheck.multimodal.codecs import bmp_features, sniff_media, wav_features

    if payload is None:
        raise NotImplementedError("no payload: real decoder would surface codec error")
    kind = sniff_media(payload)
    if kind == "wav":
        return wav_features(payload)
    if kind == "bmp":
        return bmp_features(payload)
    if kind == "jpeg":
        from sparkcheck.multimodal.jpeg import jpeg_features

        return jpeg_features(payload)
    # STUB branch — video codecs unavailable here
    digest = hashlib.md5(payload).digest()
    return [digest[i] / 255.0 for i in range(FEATURE_DIM)]


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def decode_image_features(df: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` — the canonical
    multimodal batch shape: Arrow batches of (id, payload) in, compact
    feature rows out; payload bytes never cross a shuffle."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(_decode_payload(payload))
                    ok.append(True)
                except Exception:
                    feats.append(None)
                    ok.append(False)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats, "decode_ok": ok}
            )

    return df.select("media_id", "payload").mapInPandas(_decode, DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN for video rows: computes the frame timestamps
    to extract (pure Column work — sequence over duration); the actual
    frame decode would run in the same mapInPandas slot as
    ``decode_image_features``. Output: (media_id, frame_ts_ms) rows."""
    return (
        df.where(F.col("meta.media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
