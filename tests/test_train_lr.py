"""Logistic-regression trainer tests: learns a separable rule,
partition-invariant weights (the exact fixed-point gradient claim),
map-only scoring plan, and agreement with a NumPy replay of the same
quantized trajectory."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.train_lr import (
    QUANT,
    fit_logreg,
    logreg_scores,
    train_quality_classifier,
)


@pytest.fixture(scope="module")
def separable(spark):
    # y = 1 iff f1 > 0.5; f2 is noise-ish but deterministic.
    rows = [
        (i, (i % 100) / 100.0, ((i * 7) % 100) / 100.0, 1 if (i % 100) > 50 else 0)
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "doc_id long, f1 double, f2 double, y int")


def test_learns_separable_rule(spark, separable):
    w, scored = train_quality_classifier(
        separable, ["f1", "f2"], "y", lr=2.0, iters=30
    )
    acc = (
        scored.filter((F.col("predicted") & (F.col("y") == 1))
                      | (~F.col("predicted") & (F.col("y") == 0))).count()
        / 400
    )
    assert acc >= 0.95
    assert w[0] > 0  # f1 drives the label upward


def test_weights_partition_invariant(spark, separable):
    w1 = fit_logreg(separable.repartition(1), ["f1", "f2"], "y", iters=5)
    w2 = fit_logreg(separable.repartition(13), ["f1", "f2"], "y", iters=5)
    assert w1 == w2  # bit-identical, not approx: integer gradient sums


def test_matches_numpy_replay(spark, separable):
    import numpy as np

    rows = separable.orderBy("doc_id").collect()
    X = np.array([[r["f1"], r["f2"], 1.0] for r in rows])
    y = np.array([float(r["y"]) for r in rows])
    w = np.zeros(3)
    n = len(rows)
    for _ in range(5):
        # replicate the fixed evaluation order: ((b + w1x1) + w2x2)
        z = (w[2] + w[0] * X[:, 0]) + w[1] * X[:, 1]
        sig = 1.0 / (1.0 + np.exp(-z))
        g = np.array(
            [
                int(sum(int(round(v)) for v in ((sig - y) * X[:, j] * QUANT)))
                for j in range(3)
            ]
        )
        w = w - 1.0 * (g / QUANT) / n
    got = fit_logreg(separable, ["f1", "f2"], "y", lr=1.0, iters=5)
    assert got == pytest.approx(list(w), abs=1e-12)


def test_scoring_is_map_only(spark, separable):
    plan = (
        logreg_scores(separable, ["f1", "f2"], [1.0, -0.5, 0.1])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_score_matches_formula(spark):
    df = spark.createDataFrame([(1, 0.4, 0.2)], "doc_id long, f1 double, f2 double")
    out = logreg_scores(df, ["f1", "f2"], [2.0, -1.0, 0.5]).collect()[0]
    z = (0.5 + 2.0 * 0.4) + (-1.0) * 0.2
    assert out["score"] == pytest.approx(round(1 / (1 + math.exp(-z)), 6))
    assert out["predicted"] == (1 / (1 + math.exp(-z)) >= 0.5)
