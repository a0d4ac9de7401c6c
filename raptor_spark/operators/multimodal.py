"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

Mirrors the reference's media pipelines in SHAPE only — frame extraction +
quality filter (svc/video_analysis_service/frame_extraction.py:87-150), audio
transcode-normalize (svc/audio_recognizer_service/processors/recognizer.py:
55-85), VLM describe (svc/image_processing_service/image_processor.py:164-222)
— with the actual codec/model calls STUBBED deterministically, because the
image/audio libraries are not available in this environment. The Spark-side
contract (schema, batch shape, partitioning, error column) is real and tested.

Swap ``_decode_stub`` for a real decoder (PIL/ffmpeg) by replacing ONE
function; everything else is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("data", BinaryType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("features", ArrayType(DoubleType()), True),
        StructField("error", StringType(), True),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("brightness", DoubleType(), False),
        StructField("entropy", DoubleType(), False),
    ]
)

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this container —
# PIXEL/SAMPLE decode is stubbed; container HEADER metadata below is real
HEADER_FORMATS = ("png", "gif", "bmp", "wav")


def parse_media_header(data: bytes) -> dict | None:
    """REAL container-header metadata decode, stdlib-only: PNG IHDR,
    GIF logical screen, BMP info header, WAV RIFF chunk walk. Returns
    None for payloads that are not a recognized container (those fall
    back to the deterministic stub). This is the honest middle ground the
    sandbox allows: dimensions/duration come from the actual bytes; pixel
    or sample decode would need codec libraries that are not present."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n":
        return {
            "format": "png",
            "width": int.from_bytes(data[16:20], "big"),
            "height": int.from_bytes(data[20:24], "big"),
            "duration_s": None,
        }
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        return {
            "format": "gif",
            "width": int.from_bytes(data[6:8], "little"),
            "height": int.from_bytes(data[8:10], "little"),
            "duration_s": None,
        }
    # 'BM' alone is printable text ("BMW…"); require the reserved zero
    # bytes of a real bitmap header so prose never false-positives
    if len(data) >= 26 and data[:2] == b"BM" and data[6:10] == b"\x00\x00\x00\x00":
        return {
            "format": "bmp",
            "width": int.from_bytes(data[18:22], "little", signed=True),
            "height": abs(int.from_bytes(data[22:26], "little", signed=True)),
            "duration_s": None,
        }
    if len(data) >= 44 and data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        pos, byte_rate, data_size = 12, None, None
        while pos + 8 <= len(data):
            cid = data[pos:pos + 4]
            size = int.from_bytes(data[pos + 4:pos + 8], "little")
            if cid == b"fmt " and pos + 24 <= len(data):
                byte_rate = int.from_bytes(data[pos + 16:pos + 20], "little")
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size % 2)  # chunks are word-aligned
        if byte_rate and data_size is not None:
            return {
                "format": "wav",
                "width": None,
                "height": None,
                "duration_s": round(data_size / byte_rate, 3),
            }
    return None


def _decode_stub(data: bytes, media_type: str) -> dict:
    """Decode metadata: REAL container-header parse when the payload is a
    recognized format (parse_media_header), deterministic content-hash
    stub otherwise. The 8-dim feature vector is always hash-derived —
    content features need pixel/sample decode, which this container cannot
    do (no PIL/ffmpeg); swap this one function when those libs exist."""
    if data is None:
        raise ValueError("null media payload")
    h = hashlib.sha256(data).digest()
    rnd = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
    feats = (rnd[:8] / 255.0).tolist()
    real = parse_media_header(bytes(data))
    if real is not None:
        return {"width": real["width"], "height": real["height"],
                "duration_s": real["duration_s"], "features": feats}
    if media_type == "image":
        return {"width": 64 + h[0] % 512, "height": 64 + h[1] % 512,
                "duration_s": None, "features": feats}
    if media_type in ("audio", "video"):
        return {"width": None, "height": None,
                "duration_s": round(1.0 + (h[2] % 300) / 10.0, 1), "features": feats}
    raise NotImplementedError(f"unsupported media_type: {media_type}")


def extract_media_features(media: DataFrame) -> DataFrame:
    """media(MEDIA_SCHEMA) → FEATURES_SCHEMA, error-column convention instead
    of exceptions (skip-and-log, csv_xlsx_processor.py:189-203)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, data in zip(pdf["media_id"], pdf["media_type"], pdf["data"]):
                n = len(data) if data is not None else 0
                try:
                    meta = _decode_stub(data, mtype)
                    out.append((mid, mtype, n, meta["width"], meta["height"],
                                meta["duration_s"], meta["features"], None))
                except Exception as e:
                    out.append((mid, mtype, n, None, None, None, None, str(e)[:200]))
            yield pd.DataFrame(
                out,
                columns=["media_id", "media_type", "n_bytes", "width", "height",
                         "duration_s", "features", "error"],
            )

    return media.mapInPandas(gen, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, fps_target: int = 2) -> DataFrame:
    """Frame sampling + quality filter plumbing (frame_extraction.py:107-144:
    keep frame iff mean > 5 and entropy > 0.5). Stub 'decodes' a frame per
    second of fake duration; the filter predicate is the real one."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, data in zip(pdf["media_id"], pdf["media_type"], pdf["data"]):
                if mtype != "video" or data is None:
                    continue
                h = hashlib.sha256(data).digest()
                n_frames = (1 + h[2] % 30) * fps_target
                for i in range(n_frames):
                    # ASCII-decimal frame salt (not raw int bytes): keeps the
                    # stub reproducible in plain SQL, where sha256 is
                    # VARCHAR-only and can't hash arbitrary byte suffixes
                    fh = hashlib.sha256(data + str(i).encode()).digest()
                    brightness = fh[0] / 8.0          # 0..31.9
                    entropy = fh[1] / 255.0           # 0..1
                    out.append((mid, i, brightness, entropy))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_index", "brightness", "entropy"]
            )

    frames = media.mapInPandas(gen, schema=FRAMES_SCHEMA)
    return frames.filter((F.col("brightness") > 5.0) & (F.col("entropy") > 0.5))


def synthesize_media_from_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a MEDIA_SCHEMA table from any text table (test harness input:
    content bytes as the opaque payload). The type split is ``id % 3`` —
    deterministic AND reproducible in plain SQL, so the feature/frame
    queries built on it can carry a DuckDB oracle (xxhash64 was equally
    deterministic but Spark-only, forcing those queries to rows-only)."""
    m = F.pmod(F.col(id_col).cast("long"), F.lit(3))
    mt = F.when(m == 0, "image").when(m == 1, "audio").otherwise("video")
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        mt.alias("media_type"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(text_col), "utf-8").alias("data"),
    )
