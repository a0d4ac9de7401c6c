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

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this container


def _decode_stub(data: bytes, media_type: str) -> dict:
    """Deterministic fake decode: derives plausible metadata + an 8-dim
    feature vector from the content hash. Replace with a real decoder when
    PIL/ffmpeg are present (raise NotImplementedError path kept explicit)."""
    if data is None:
        raise ValueError("null media payload")
    h = hashlib.sha256(data).digest()
    rnd = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
    feats = (rnd[:8] / 255.0).tolist()
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
