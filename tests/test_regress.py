"""Distributed normal-equation least squares."""

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.regress import (
    fit_linear,
    solve_normal_equations,
    sufficient_stats,
)


def test_recovers_exact_linear_relation(spark):
    # y = 3 + 2*x1 - x2 exactly -> weights recovered to float precision.
    rows = [(i, i % 7, (i * 3) % 5, 3 + 2 * (i % 7) - (i * 3) % 5)
            for i in range(50)]
    df = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    w, pred = fit_linear(df, ["x1", "x2"], "y")
    assert abs(w[0] - 3) < 1e-9 and abs(w[1] - 2) < 1e-9 and abs(w[2] + 1) < 1e-9
    got = pred.select(F.max(F.abs(F.col("prediction") - F.col("y")))).first()[0]
    assert got < 1e-6


def test_sufficient_stats_exact_and_partition_invariant(spark):
    rows = [(i, i % 4, i % 3, i % 5) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    a = sufficient_stats(df, ["x1", "x2"], "y")
    b = sufficient_stats(df.repartition(7), ["x1", "x2"], "y")
    assert a == b  # integer sums: bit-identical under any partitioning
    gram, mom, n = a
    assert n == 40 and gram[0][0] == 40
    assert gram[0][1] == sum(i % 4 for i in range(40))
    assert mom[1] == sum((i % 4) * (i % 5) for i in range(40))


def test_pivot_and_unpivoted_agree_on_spd():
    gram = [[10, 3, 1], [3, 8, 2], [1, 2, 6]]
    mom = [5, 7, 9]
    wp = solve_normal_equations(gram, mom, pivot=True)
    wn = solve_normal_equations(gram, mom, pivot=False)
    assert all(abs(a - b) < 1e-12 for a, b in zip(wp, wn))
    # residual check: gram @ w == mom
    for i in range(3):
        assert abs(sum(gram[i][j] * wp[j] for j in range(3)) - mom[i]) < 1e-9


def test_singular_raises_and_ridge_rescues(spark):
    # x2 = 2*x1: collinear -> singular without ridge, solvable with.
    rows = [(i, i % 5, 2 * (i % 5), i) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, x1 long, x2 long, y long")
    gram, mom, _ = sufficient_stats(df, ["x1", "x2"], "y")
    with pytest.raises(ValueError, match="singular"):
        solve_normal_equations(gram, mom)
    w = solve_normal_equations(gram, mom, ridge=1.0)
    assert len(w) == 3  # regularized system solves


def test_ridge_shrinks_weights():
    gram = [[100, 40, 10], [40, 60, 5], [10, 5, 30]]
    mom = [50, 80, 20]
    w0 = solve_normal_equations(gram, mom, ridge=0.0)
    w9 = solve_normal_equations(gram, mom, ridge=1000.0)
    assert abs(w9[1]) < abs(w0[1]) and abs(w9[2]) < abs(w0[2])
