"""Code-switching mixture stats and the compression-ratio signal."""

from __future__ import annotations

import math

import pytest

from karanta_ocr_spark.operators.signals import (
    code_switch_stats,
    compression_signals,
)

FRA = "le château près de la forêt est très âgé, déjà après noël"
YOR = "ọmọ kékeré fẹ́ràn oúnjẹ aládùn ṣùgbọ́n ọ̀rẹ́ àgbà"
ENG = "plain english text with no diacritic markers at all"


def test_code_switch_stats(spark):
    rows = [
        (1, f"{FRA}\n\n{YOR}\n\n{FRA}"),       # bilingual 2:1
        (2, f"{FRA}\n\n{FRA}"),                # monolingual
        (3, ""),                               # empty
        (4, ENG),                              # und only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in code_switch_stats(df).collect()}

    r = out[1]
    assert (r["n_paragraphs"], r["n_langs"]) == (3, 2)
    assert r["dominant_lang"] == "fra"
    assert r["dominant_share"] == pytest.approx(2 / 3, abs=1e-6)
    h = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert r["lang_entropy"] == pytest.approx(h, abs=1e-6)
    assert r["is_code_switched"] is True

    r = out[2]
    assert (r["n_langs"], r["dominant_lang"]) == (1, "fra")
    assert r["lang_entropy"] == pytest.approx(0.0, abs=1e-9)
    assert r["is_code_switched"] is False

    r = out[3]
    assert (r["n_paragraphs"], r["n_langs"], r["dominant_lang"]) == (0, 0, "none")
    assert r["dominant_share"] is None and r["is_code_switched"] is False

    assert out[4]["dominant_lang"] == "und"


def test_code_switch_partition_invariance(spark):
    rows = [(i, f"{FRA}\n{YOR}" if i % 3 else YOR) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, code_switch_stats(df).collect()))
    b = sorted(map(tuple, code_switch_stats(df.repartition(7)).collect()))
    assert a == b


def test_compression_signals(spark):
    rows = [
        (1, "spam " * 400),                      # highly repetitive
        (2, " ".join(f"w{i * 37 % 997}x{i}" for i in range(200))),  # normal-ish
        (3, ""),                                 # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_signals(df).collect()}
    assert out[1]["compression_verdict"] == "repetitive"
    assert out[1]["compressed_ratio"] < 0.1
    assert out[2]["compression_verdict"] == "normal"
    assert out[3]["compressed_ratio"] is None
    assert out[3]["compression_verdict"] == "empty"
    # determinism across reruns (fixed zlib level)
    again = {r["doc_id"]: r["compressed_ratio"]
             for r in compression_signals(df).collect()}
    assert again[1] == out[1]["compressed_ratio"]
