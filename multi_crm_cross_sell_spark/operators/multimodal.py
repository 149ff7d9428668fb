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
- the codecs are REAL decoders for real uncompressed container
  formats, stdlib-only (this container ships no PIL/ffmpeg):
  * image — BMP, 24-bit BI_RGB (bottom-up rows, 4-byte row padding),
    parsed with `struct`;
  * audio — WAV, PCM16 mono, parsed with the stdlib `wave` module;
  * video — YUV4MPEG2 (Y4M), the mjpegtools/ffmpeg uncompressed
    interchange format: ASCII stream header, `FRAME\\n` markers, raw
    C444 planes.
  A compressed codec (JPEG/Opus/H.264) would slot into the same
  mapInPandas seam with an external library; the Spark-side contract
  (schema, batching, partitioning) is identical.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
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


# ---------------------------------------------------------------------------
# BMP (image): 24bpp uncompressed BI_RGB. 14-byte file header + 40-byte
# BITMAPINFOHEADER, pixel rows bottom-up in BGR order, each row padded
# to a 4-byte boundary.
# ---------------------------------------------------------------------------

def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode row-major top-down RGB bytes (3 per pixel) as a BMP."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    bgr = arr[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    row_size = (width * 3 + 3) & ~3
    padded = np.zeros((height, row_size), dtype=np.uint8)
    padded[:, : width * 3] = bgr.reshape(height, width * 3)
    pixel_bytes = padded.tobytes()
    file_size = 14 + 40 + len(pixel_bytes)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return header + info + pixel_bytes


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a 24bpp BI_RGB BMP → (width, height, top-down RGB bytes).

    Decode error contract (fuzz-tested): malformed input of ANY kind —
    truncated header, truncated pixel data, corrupt dimensions — raises
    ValueError; struct.error never escapes. Executors surface a clean
    per-row failure instead of an opaque codec traceback."""
    try:
        magic, _size, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
        if magic != b"BM":
            raise ValueError("not a BMP payload")
        hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
    except struct.error as exc:
        raise ValueError(f"truncated BMP header: {exc}") from exc
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    if width <= 0 or height <= 0 or offset < 54:
        raise ValueError(f"corrupt BMP geometry: w={width} h={height} off={offset}")
    row_size = (width * 3 + 3) & ~3
    if offset + height * row_size > len(payload):
        raise ValueError(
            f"truncated BMP pixel data: need {height * row_size} bytes at "
            f"{offset}, have {len(payload) - offset}"
        )
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=height * row_size, offset=offset
    ).reshape(height, row_size)[:, : width * 3]
    bgr = rows.reshape(height, width, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return width, height, bgr[:, :, ::-1].tobytes()


# ---------------------------------------------------------------------------
# WAV (audio): PCM16 mono through the stdlib wave module.
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples as a PCM16 mono WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a PCM16 mono WAV → (sample_rate, int16 sample array).

    Decode error contract (fuzz-tested): malformed input raises
    ValueError — wave.Error/EOFError never escape, and TRUNCATED
    sample data is an error, not a silently shorter array (stdlib
    readframes returns whatever is available without complaint)."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2 or w.getnchannels() != 1:
                raise ValueError("unsupported WAV: need PCM16 mono")
            rate = w.getframerate()
            n_frames = w.getnframes()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError, RuntimeError) as exc:
        # stdlib chunk.py raises bare RuntimeError when a corrupted
        # chunk size seeks past the payload (found by byte-flip fuzz)
        raise ValueError(f"malformed WAV: {exc}") from exc
    if len(frames) != 2 * n_frames:
        raise ValueError(
            f"truncated WAV data: header promises {n_frames} frames "
            f"({2 * n_frames} bytes), payload holds {len(frames)}"
        )
    return rate, np.frombuffer(frames, dtype="<i2")


# ---------------------------------------------------------------------------
# Y4M (video): YUV4MPEG2 uncompressed stream — ASCII header
# "YUV4MPEG2 W<w> H<h> F<n>:<d> Ip A1:1 C444\n", then per frame
# "FRAME\n" + Y + U + V planes (w*h bytes each for C444).
# ---------------------------------------------------------------------------

def encode_y4m(
    width: int, height: int, frames: list[bytes], fps: int = 25
) -> bytes:
    """Encode raw C444 frames (each Y+U+V concatenated, 3*w*h bytes)."""
    plane = width * height
    out = [f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C444\n".encode()]
    for fr in frames:
        if len(fr) != 3 * plane:
            raise ValueError(f"need {3 * plane} bytes per C444 frame, got {len(fr)}")
        out.append(b"FRAME\n")
        out.append(fr)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse a C444 Y4M stream → (width, height, fps, frames).

    Decode error contract (fuzz-tested): malformed input — missing
    header fields, bad frame markers, TRUNCATED final frame (a bytes
    slice past the end is silently short in Python), corrupt
    dimensions, non-integer fields — raises ValueError."""
    try:
        nl = payload.index(b"\n")
        header = payload[:nl].decode()
        parts = header.split()
        if not parts or parts[0] != "YUV4MPEG2":
            raise ValueError("not a YUV4MPEG2 payload")
        width = height = fps = None
        for p in parts[1:]:
            if p.startswith("W"):
                width = int(p[1:])
            elif p.startswith("H"):
                height = int(p[1:])
            elif p.startswith("F"):
                fps = int(p[1:].split(":")[0])
            elif p.startswith("C") and p != "C444":
                raise ValueError(f"unsupported Y4M colorspace: {p}")
    except (UnicodeDecodeError, IndexError) as exc:
        raise ValueError(f"malformed Y4M header: {exc}") from exc
    except ValueError as exc:
        # covers bytes.index misses and int() parse failures alike
        if "YUV4MPEG2" in str(exc) or "colorspace" in str(exc):
            raise
        raise ValueError(f"malformed Y4M header: {exc}") from exc
    if width is None or height is None or fps is None:
        raise ValueError("Y4M header missing W/H/F fields")
    if width <= 0 or height <= 0 or fps <= 0:
        raise ValueError(f"corrupt Y4M geometry: w={width} h={height} f={fps}")
    frame_bytes = 3 * width * height
    frames = []
    pos = nl + 1
    while pos < len(payload):
        try:
            fnl = payload.index(b"\n", pos)
        except ValueError as exc:
            raise ValueError("truncated Y4M frame marker") from exc
        marker = payload[pos:fnl].split()
        if not marker or marker[0] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        frame = payload[fnl + 1 : fnl + 1 + frame_bytes]
        if len(frame) != frame_bytes:
            raise ValueError(
                f"truncated Y4M frame: need {frame_bytes} bytes, "
                f"have {len(frame)}"
            )
        frames.append(frame)
        pos = fnl + 1 + frame_bytes
    return width, height, fps, frames


# ---------------------------------------------------------------------------
# Synthetic media + distributed decode / feature extraction
# ---------------------------------------------------------------------------

IMAGE_SIDE = 64
AUDIO_RATE = 8000
VIDEO_SIDE = 8
VIDEO_FPS = 25


def synth_media(spark, n: int = 64):
    """Deterministic media table with REAL encoded payloads: BMP images,
    PCM16 WAV audio, Y4M video — content seeded per media_id, so every
    run produces byte-identical payloads."""

    def gen(ids):
        rows = []
        for i in ids:
            kind = ("image", "audio", "video")[i % 3]
            rng = np.random.RandomState(i)
            if kind == "image":
                rgb = rng.randint(0, 256, IMAGE_SIDE * IMAGE_SIDE * 3, dtype=np.uint8)
                payload = encode_bmp(IMAGE_SIDE, IMAGE_SIDE, rgb.tobytes())
                rows.append((i, kind, "bmp", IMAGE_SIDE, IMAGE_SIDE, None, payload))
            elif kind == "audio":
                samples = rng.randint(-32768, 32768, AUDIO_RATE, dtype=np.int16)
                payload = encode_wav(samples, AUDIO_RATE)
                rows.append((i, kind, "wav", None, None, 1000, payload))
            else:
                frames = [
                    rng.randint(0, 256, 3 * VIDEO_SIDE * VIDEO_SIDE, dtype=np.uint8).tobytes()
                    for _ in range(VIDEO_FPS)  # 25 frames @ 25fps = 1000ms
                ]
                payload = encode_y4m(VIDEO_SIDE, VIDEO_SIDE, frames, VIDEO_FPS)
                rows.append((i, kind, "y4m", VIDEO_SIDE, VIDEO_SIDE, 1000, payload))
        return rows

    return spark.createDataFrame(gen(range(n)), MEDIA_SCHEMA)


def _decode_features(kind: str, payload: bytes, dim: int = 8) -> list[float]:
    """Real decode + fixed-width feature vector per modality. The vector
    is plain decoded-signal statistics (normalized to ~[0,1]) — the
    deterministic stand-in for a learned embedding; a model embedding
    would be produced at exactly this point in the batch."""
    if kind == "image":
        w, h, rgb = decode_bmp(payload)
        px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(np.float64)
        feats = [
            w / 256.0,
            h / 256.0,
            px[:, 0].mean() / 255.0,
            px[:, 1].mean() / 255.0,
            px[:, 2].mean() / 255.0,
            px.std() / 255.0,
            px.min() / 255.0,
            px.max() / 255.0,
        ]
    elif kind == "audio":
        rate, samples = decode_wav(payload)
        x = samples.astype(np.float64) / 32768.0
        feats = [
            len(samples) / 65536.0,
            rate / 48000.0,
            x.mean(),
            float(np.sqrt((x**2).mean())),  # rms
            float((np.diff(np.signbit(x)) != 0).mean()),  # zero-crossing rate
            x.min(),
            x.max(),
            len(samples) / rate,  # duration seconds
        ]
    elif kind == "video":
        w, h, fps, frames = decode_y4m(payload)
        plane = w * h
        stack = np.frombuffer(b"".join(frames), dtype=np.uint8).reshape(
            len(frames), 3, plane
        ).astype(np.float64)
        y, u, v = stack[:, 0, :], stack[:, 1, :], stack[:, 2, :]
        feats = [
            len(frames) / 256.0,
            w / 256.0,
            h / 256.0,
            y.mean() / 255.0,
            u.mean() / 255.0,
            v.mean() / 255.0,
            y.std() / 255.0,
            y.max() / 255.0,
        ]
    else:
        raise ValueError(f"unknown media kind: {kind}")
    feats = [round(float(f), 6) for f in feats]
    return (feats + [0.0] * dim)[:dim]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas decode + feature extraction: Arrow batches in, Arrow
    batches out; the per-item codec work runs on executors, one Python
    worker per partition, zero driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else None for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "content_hash": [
                        hashlib.md5(p).hexdigest() if p is not None else ""
                        for p in payloads
                    ],
                    "features": [
                        _decode_features(k, p, dim) if p is not None else [0.0] * dim
                        for k, p in zip(pdf["kind"], payloads)
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling timeline from duration metadata — one row
    per (media_id, frame_ts_ms). Pairs with ``sample_frames`` for the
    decoded pixels; the metadata-only timeline exists so downstream
    joins can plan without touching payloads."""
    video = media.where(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_ts_ms", IntegerType(), False),
        StructField("frame_mean_y", FloatType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """REAL frame sampling: decode each video's Y4M stream once per
    Arrow batch and emit the sampled frames' luma means. One row per
    (media_id, frame_ts_ms); the per-frame decode is an index into the
    parsed plane stack, not a re-parse."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts_out, means = [], [], []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or p is None:
                    continue
                w, h, fps, frames = decode_y4m(bytes(p))
                plane = w * h
                duration_ms = int(len(frames) * 1000 / fps)
                for ts in range(0, duration_ms, every_ms):
                    idx = min(ts * fps // 1000, len(frames) - 1)
                    y = np.frombuffer(frames[idx][:plane], dtype=np.uint8)
                    ids.append(mid)
                    ts_out.append(ts)
                    means.append(round(float(y.mean()) / 255.0, 6))
            yield pd.DataFrame(
                {"media_id": ids, "frame_ts_ms": ts_out, "frame_mean_y": means}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)


def resize_metadata(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning as pure metadata arithmetic (aspect-preserving
    target dims); ``resize_images`` does the pixel work."""
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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def resize_images(media: DataFrame, max_side: int = 32) -> DataFrame:
    """REAL image resize: decode BMP → nearest-neighbor downsample
    (pure numpy index arithmetic, no interpolation deps) → re-encode
    BMP. Aspect-preserving; images already within max_side pass
    through re-encoded at original size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, outs = [], [], [], []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if kind != "image" or p is None:
                    continue
                w, h, rgb = decode_bmp(bytes(p))
                scale = min(1.0, max_side / max(w, h))
                tw, th = max(1, round(w * scale)), max(1, round(h * scale))
                px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
                ri = (np.arange(th) * h // th)[:, None]
                ci = (np.arange(tw) * w // tw)[None, :]
                small = px[ri, ci]
                ids.append(mid)
                ws.append(tw)
                hs.append(th)
                outs.append(encode_bmp(tw, th, small.tobytes()))
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "payload": outs}
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)
