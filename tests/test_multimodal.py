"""Multimodal gates: REAL container-header decode (PNG/GIF/BMP/WAV,
stdlib-only) vs the deterministic stub fallback for unrecognized payloads —
and the guarantee that text payloads never false-positive as containers
(the driver oracles re-derive the stub path arithmetic)."""

from __future__ import annotations

import pyspark.sql.functions as F

from raptor_spark.operators.multimodal import (
    extract_media_features,
    parse_media_header,
)


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x06\x00\x00\x00"
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 6


def _bmp(w: int, h: int) -> bytes:
    return (
        b"BM" + (122).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True) + h.to_bytes(4, "little", signed=True)
    )


def _wav(sample_rate: int, n_bytes: int, channels: int = 1, bits: int = 16) -> bytes:
    byte_rate = sample_rate * channels * bits // 8
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (channels * bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    data = b"data" + n_bytes.to_bytes(4, "little") + b"\x00" * n_bytes
    body = b"WAVE" + fmt + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_header_parse_real_formats():
    assert parse_media_header(_png(640, 480)) == {
        "format": "png", "width": 640, "height": 480, "duration_s": None}
    assert parse_media_header(_gif(33, 44))["width"] == 33
    assert parse_media_header(_bmp(800, 600))["height"] == 600
    wav = parse_media_header(_wav(16000, 64000))  # 64000 B / 32000 B/s = 2 s
    assert wav["format"] == "wav" and wav["duration_s"] == 2.0


def test_text_payloads_never_false_positive():
    for t in ("BMW review: great car and...", "GIF-like prose", "RIFF raff",
              "plain words", ""):
        assert parse_media_header(t.encode()) is None


def test_extract_uses_real_headers_and_stub_fallback(spark):
    rows = [
        ("p1", "image", None, bytearray(_png(640, 480))),
        ("w1", "audio", None, bytearray(_wav(16000, 64000))),
        ("t1", "image", None, bytearray(b"just some text payload")),
    ]
    media = spark.createDataFrame(
        rows, "media_id STRING, media_type STRING, mime STRING, data BINARY"
    )
    out = {r.media_id: r for r in extract_media_features(media).collect()}
    assert (out["p1"].width, out["p1"].height) == (640, 480)       # real header
    assert out["w1"].duration_s == 2.0                              # real header
    assert out["t1"].width is not None and out["t1"].error is None  # stub path
    assert all(r.error is None for r in out.values())