"""OCR-artifact signals: per-signal positives, clean-prose baseline,
score/verdict composition, and empty/NULL edges."""

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.functions.ocr_quality import (
    GARBLED_THRESHOLD,
    ocr_artifact_report,
)


def _report(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in ocr_artifact_report(df).collect()}


CLEAN = (
    "The quick brown fox jumps over the lazy dog near the river "
    "bank while children play games in the warm afternoon sun."
)


def test_clean_prose_scores_low(spark):
    r = _report(spark, [CLEAN])[0]
    assert r["replacement_count"] == 0
    assert r["isolated_diacritic_count"] == 0
    assert r["broken_hyphen_count"] == 0
    assert r["consonant_run_count"] == 0
    assert r["ocr_artifact_score"] < 0.3
    assert not r["ocr_garbled"]


def test_replacement_chars_counted(spark):
    r = _report(spark, ["some � broken �� bytes"])[0]
    assert r["replacement_count"] == 3


def test_isolated_diacritics_detected(spark):
    # Tone marks split off their base letters: after a space or at
    # text start. A properly attached (NFD) mark does NOT count.
    r = _report(spark, ["̀ww ́ww okó normal"])[0]
    assert r["isolated_diacritic_count"] == 2


def test_broken_hyphenation_detected(spark):
    r = _report(spark, ["the exam- ple shows over- flow but not X- Ray"])[0]
    # "X- Ray" has uppercase after the hyphen → not the dehyphenation
    # shape (sentence-initial capital never starts mid-word).
    assert r["broken_hyphen_count"] == 2


def test_consonant_soup_detected(spark):
    r = _report(spark, ["normal words then rnmclt and WRTHMX soup"])[0]
    assert r["consonant_run_count"] == 2


def test_fragment_and_confusion_fractions(spark):
    r = _report(spark, ["a b c word l1ke 0cr plain"])[0]
    assert r["single_letter_token_frac"] == pytest.approx(3 / 7, abs=1e-6)
    assert r["mixed_alnum_token_frac"] == pytest.approx(2 / 7, abs=1e-6)


def test_garbled_verdict_fires_on_artifact_walls(spark):
    garbled = "�� ̀x ́y bcdfgh jklmnp l1 k2 m3"
    r = _report(spark, [garbled])[0]
    assert r["ocr_artifact_score"] >= GARBLED_THRESHOLD
    assert r["ocr_garbled"]


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in ocr_artifact_report(df).collect()}
    for r in rows.values():
        assert r["ocr_artifact_score"] == 0.0
        assert not r["ocr_garbled"]


def test_map_only_plan(spark):
    df = spark.createDataFrame([(0, CLEAN)], "doc_id long, text string")
    plan = ocr_artifact_report(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
