"""Multimodal columns: images/audio/video as opaque binary columns with
typed metadata (BASELINE.json north star).

Design for 100 TB:
- media lives in `binary` columns (or object-store URIs for >100 MB
  blobs) beside a typed metadata struct (format, width/height,
  sample_rate, duration);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  pandas iterators over mapInPandas — each batch stays columnar, and
  Spark parallelizes by row-group, so heavy per-item work scales with
  the cluster, never the driver;
- the actual codec calls are STUBBED behind a deterministic fake
  (the container ships no PIL/ffmpeg): the Spark-side plumbing —
  schemas, batch iteration, partitioning, output contract — is real
  and tested; swap `_decode_stub` for a real decoder in production.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("fmt", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("content_hash", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def synth_media(spark, n: int = 64):
    """Deterministic fake media table (payload = md5-stream bytes)."""
    def gen(ids):
        rows = []
        for i in ids:
            kind = ("image", "audio", "video")[i % 3]
            payload = b"".join(
                hashlib.md5(f"{i}:{j}".encode()).digest() for j in range(8)
            )
            rows.append(
                (i, kind, {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                 64 if kind != "audio" else None,
                 64 if kind != "audio" else None,
                 1000 if kind != "image" else None,
                 payload)
            )
        return rows

    return spark.createDataFrame(gen(range(n)), MEDIA_SCHEMA)


def _decode_stub(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'decode + embed': real decode would call
    PIL/torchaudio/ffmpeg here (not available in this container).
    Produces a stable float vector from the bytes so downstream
    similarity/dedup operators are exercisable end-to-end."""
    out = []
    for j in range(dim):
        h = hashlib.md5(payload + bytes([j])).digest()
        (v,) = struct.unpack(">I", h[:4])
        out.append(round(v / 2**32, 6))
    return out


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches
    out; one Python worker per partition, zero driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), dim) if p is not None else [0.0] * dim
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "content_hash": [
                        hashlib.md5(bytes(p)).hexdigest() if p is not None else ""
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame timeline from
    duration metadata (decode of each frame is the stubbed step).
    Output: one row per (media_id, frame_ts_ms)."""
    video = media.where(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_metadata(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning as pure metadata arithmetic (aspect-preserving
    target dims); the pixel work is the stubbed decode step."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.where(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )
