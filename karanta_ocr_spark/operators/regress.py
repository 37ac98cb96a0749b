"""Distributed linear-model fitting via normal equations.

The scalable shape for linear/ridge regression on 10^12 rows: one
map-side-combined aggregation accumulates the sufficient statistics
(Gram matrix ``XᵀX`` and moment vector ``Xᵀy``) — d(d+1)/2 + d
scalars regardless of corpus size — and the driver solves the tiny
d×d system. No gradient iterations, no corpus re-scan per step, no
driver data collection beyond the statistics themselves. (The
reference trains its quality classifiers offline and ships weights,
``karanta/inference/image_classifier.py``; this operator is the
in-engine analog for linear probes over corpus features.)

Determinism/oracle discipline: callers pass INTEGER-valued feature
columns (lengths, counts — what corpus features are anyway). Integer
sums are exact and partition-order-independent, so the sufficient
statistics are bit-identical across engines and partitionings —
unlike float sums, which differ by ulps per shuffle order. The
driver-side solve (Gaussian elimination with partial pivoting, fixed
operation order) then maps identical int64 inputs to identical
float64 weights everywhere; the DuckDB oracle replays statistics in
SQL and the solve via the same closed form for small d (Cramer), and
predictions round to a shared 1e-6 grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sufficient_stats(
    df: DataFrame, feature_cols: list[str], target_col: str
) -> tuple[list[list[int]], list[int], int]:
    """(XᵀX, Xᵀy, n) with an implicit leading intercept column.
    Features and target must be integer-valued columns; the result is
    exact (int64 sums — Spark raises on overflow under ANSI rather
    than wrapping silently)."""
    cols = [F.lit(1).cast("long")] + [
        F.col(c).cast("long") for c in feature_cols
    ]
    d = len(cols)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(cols[i] * cols[j]).alias(f"g_{i}_{j}"))
    for i in range(d):
        aggs.append(
            F.sum(cols[i] * F.col(target_col).cast("long")).alias(f"m_{i}")
        )
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = df.agg(*aggs).first()
    gram = [[0] * d for _ in range(d)]
    for i in range(d):
        for j in range(i, d):
            gram[i][j] = gram[j][i] = int(row[f"g_{i}_{j}"] or 0)
    mom = [int(row[f"m_{i}"] or 0) for i in range(d)]
    return gram, mom, int(row["n"])


def solve_normal_equations(
    gram: list[list[int]],
    mom: list[int],
    ridge: float = 0.0,
    pivot: bool = True,
) -> list[float]:
    """Solve (XᵀX + λI)w = Xᵀy by Gaussian elimination — fixed
    operation order, so identical inputs give identical float64
    weights on any IEEE platform. λ is not applied to the intercept
    row (standard ridge convention).

    ``pivot=False`` skips partial pivoting: a Gram matrix is
    symmetric positive (semi-)definite, where unpivoted elimination
    is stable, and the unpivoted schedule is a STRAIGHT-LINE float
    program an independent SQL engine can replay multiply-for-
    multiply — the DuckDB oracle does exactly that, making even the
    solved weights (and so the predictions) bit-reproducible."""
    d = len(mom)
    a = [[float(gram[i][j]) for j in range(d)] + [float(mom[i])]
         for i in range(d)]
    for i in range(1, d):
        a[i][i] += float(ridge)
    for col in range(d):
        if pivot:
            piv = max(range(col, d), key=lambda r: abs(a[r][col]))
            a[col], a[piv] = a[piv], a[col]
        if a[col][col] == 0.0:
            raise ValueError("singular normal equations (collinear features)")
        for r in range(col + 1, d):
            f = a[r][col] / a[col][col]
            for c in range(col, d + 1):
                a[r][c] -= f * a[col][c]
    w = [0.0] * d
    for i in range(d - 1, -1, -1):
        s = a[i][d] - sum(a[i][j] * w[j] for j in range(i + 1, d))
        w[i] = s / a[i][i]
    return w


def predict_expr(feature_cols: list[str], weights: list[float]) -> Column:
    """wᵀx as a Catalyst expression (fixed left-to-right accumulation
    so the float sum order matches the oracle's)."""
    out: Column = F.lit(float(weights[0]))
    for c, w in zip(feature_cols, weights[1:]):
        out = out + F.col(c).cast("double") * F.lit(float(w))
    return out


def fit_linear(
    df: DataFrame,
    feature_cols: list[str],
    target_col: str,
    ridge: float = 0.0,
    pivot: bool = True,
) -> tuple[list[float], DataFrame]:
    """One-pass least-squares fit → (weights, df + ``prediction``).
    weights[0] is the intercept."""
    gram, mom, _ = sufficient_stats(df, feature_cols, target_col)
    w = solve_normal_equations(gram, mom, ridge, pivot=pivot)
    return w, df.withColumn(
        "prediction", F.round(predict_expr(feature_cols, w), 6)
    )
