"""PCM16 WAV decode + audio feature extraction: hand-computed
loudness stats, truncation tolerance, and non-PCM rejection."""

from __future__ import annotations

import math
import struct

import pytest

from karanta_ocr_spark.operators.multimodal import (
    audio_features,
    decode_wav_pcm16,
)


def build_wav(rate: int, ch: int, samples: list[int], fmt_tag: int = 1,
              bits: int = 16) -> bytes:
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate, rate * ch * 2, ch * 2, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_wav_pcm16_roundtrip():
    samples = [0, 100, -100, 32767, -32768, 5, -5, 12345]
    rate, ch, data = decode_wav_pcm16(build_wav(8000, 1, samples))
    assert (rate, ch) == (8000, 1)
    assert list(struct.unpack("<8h", data)) == samples


def test_decode_wav_rejects_non_pcm16():
    assert decode_wav_pcm16(build_wav(8000, 1, [1, 2], fmt_tag=3)) is None
    assert decode_wav_pcm16(build_wav(8000, 1, [1, 2], bits=8)) is None
    assert decode_wav_pcm16(b"RIFF\x04\x00\x00\x00WEBP") is None
    assert decode_wav_pcm16(b"junk") is None


def test_decode_wav_truncated_drops_torn_byte():
    wav = build_wav(8000, 1, [1, 2, 3, 4])
    _, _, data = decode_wav_pcm16(wav[:-3])  # cuts sample 4 + one byte of 3
    assert len(data) % 2 == 0
    assert list(struct.unpack(f"<{len(data)//2}h", data)) == [1, 2]


def test_audio_features_hand_computed(spark):
    samples = [0, 300, -300, 32767, 0, 0, 0, -32768]
    rows = [
        (1, build_wav(8000, 1, samples)),
        (2, build_wav(16000, 2, samples)),
        (3, b"not audio"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    assert len(out) == 4

    ss = sum(s * s for s in samples)
    rms = round(math.sqrt(ss / 8), 6)
    r1 = out[1]
    assert (r1["sample_rate"], r1["channels"]) == (8000, 1)
    assert r1["n_samples"] == 8
    assert r1["duration_ms"] == 1  # 8 frames @ 8 kHz
    assert r1["rms"] == pytest.approx(rms, abs=1e-9)
    assert r1["peak"] == 32768
    assert r1["clip_frac"] == pytest.approx(0.25)  # 32767 and -32768

    r2 = out[2]
    assert (r2["sample_rate"], r2["channels"]) == (16000, 2)
    assert r2["n_samples"] == 4  # frames, not interleaved samples
    assert r2["duration_ms"] == 0
    assert r2["rms"] == pytest.approx(rms, abs=1e-9)

    assert out[3]["sample_rate"] is None and out[3]["rms"] is None
    assert out[4]["sample_rate"] is None
