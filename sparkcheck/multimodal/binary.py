"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus a typed metadata
struct — the pattern used by Spark's own ``binaryFile`` source and by
web-scale multimodal pipelines (payload bytes stay columnar/Arrow;
decode happens in vectorized Python batches).

The Spark-side plumbing here is REAL and tested: schemas, partitioning,
``mapInPandas`` batch shape, Arrow transfer, deterministic fake payloads.
The actual codec work is STUBBED — image/audio libraries are not in this
container — behind ``_decode_payload``: a clearly-marked deterministic
fake (md5-derived feature vector) with the exact signature a real
decoder (PIL / torchaudio / pyav) would drop into.

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
    """STUB DECODER — deterministic fake feature extraction.

    A real deployment replaces this body with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` + resize + channel means.
    The fake derives FEATURE_DIM floats from md5(payload) so the whole
    pipeline (schema, batching, partitioning) is testable here. Raises
    on None to mirror real decoder behavior on missing payloads.
    """
    if payload is None:
        raise NotImplementedError("no payload: real decoder would surface codec error")
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
