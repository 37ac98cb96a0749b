"""Winnowing fingerprints (MOSS) and the classifier calibration
report: parity with an independent Python twin, the paper's match
guarantee and prepend-robustness, and hand-computed ECE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.classify import calibration_report
from karanta_ocr_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
    winnow_python,
)


def test_winnow_matches_python_twin(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "ab",                      # shorter than k
        "",                        # empty
        "aaaaaaaaaaaaaaa",         # all-equal hashes: rightmost-tie rule
        "mixed CASE Text with  spaces",
        None,                      # NULL text == "" (ANSI element_at trap)
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, k=5, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        assert got[i] == winnow_python(t, k=5, w=4), f"doc {i}"


def test_winnow_guarantee_and_prepend_robustness(spark):
    # Any shared substring of length >= w+k-1 must share a selected
    # fingerprint — in particular a document vs itself with content
    # PREPENDED (where whole-doc hashing and position-keyed schemes
    # break).
    core = "distributed systems fail in correlated ways under load"
    df = spark.createDataFrame(
        [(1, core), (2, "entirely new preamble text. " + core)],
        "doc_id long, text string",
    )
    pairs = winnow_overlap_pairs(
        winnow_fingerprints(df, k=5, w=4), min_shared=2
    ).collect()
    assert len(pairs) == 1
    assert pairs[0]["n_shared"] >= 3


def test_winnow_density(spark):
    # ~2/(w+1) of positions selected (the paper's expected density);
    # allow a loose band.
    text = " ".join(f"token{i} body words" for i in range(60))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_sel = winnow_fingerprints(df, k=5, w=8).count()
    n_positions = len(text) - 4
    density = n_sel / n_positions
    assert 0.08 < density < 0.45  # 2/(w+1) = 0.22 at w=8


def test_calibration_report_hand_computed(spark):
    # two populated bins: bin 0 (scores .1/.2, labels 0,0) and
    # bin 9 (scores .95/.85->bin 8? .85*10=8.5 floor 8) — keep it
    # explicit: .95 and 1.0 both land in bin 9.
    rows = [
        (0.1, 0), (0.2, 0),          # bin 1 & 2 actually: 0.1*10=1, 0.2*10=2
        (0.95, 1), (1.0, 1),         # bin 9 (1.0 clamps into 9)
    ]
    df = spark.createDataFrame(rows, "score double, label_true int")
    out = {r["bin"]: r for r in calibration_report(df, bins=10).collect()}
    assert set(out) == {1, 2, 9}
    assert out[9]["n"] == 2
    assert out[9]["mean_score"] == pytest.approx(0.975)
    assert out[9]["frac_positive"] == 1.0
    assert out[9]["gap"] == pytest.approx(-0.025)
    # ECE = (1*|.1-0| + 1*|.2-0| + 2*|.975-1|)/4
    ece = (0.1 + 0.2 + 2 * 0.025) / 4
    for r in out.values():
        assert r["ece"] == pytest.approx(ece, abs=1e-6)


def test_calibration_well_calibrated_model_has_low_ece(spark):
    # labels drawn deterministically to match the score in each bin
    rows = []
    for i in range(200):
        s = (i % 10) / 10.0 + 0.05
        rows.append((s, 1 if (i * 7) % 100 < s * 100 else 0))
    df = spark.createDataFrame(rows, "score double, label_true int")
    ece = calibration_report(df, bins=10).collect()[0]["ece"]
    assert ece < 0.12
