"""Distributed logistic-regression training — the missing TRAIN half
of the quality-classifier loop (``operators/classify`` scores with a
fitted model; this fits one, at corpus scale, in pure DataFrame ops).

Full-batch gradient descent with one bounded aggregation per
iteration:

    grad_j = Σ_docs (σ(w·x) − y) · x_j          (d+1 numbers)
    w     ← w − lr · grad / n

Each iteration is ONE map-side-combined corpus pass producing d+1
scalars; the weight vector (a handful of doubles) is driver-side
MODEL PARAMETERS — the same adjudication as the IVF centroids and
the DSIR log-ratio vector — re-broadcast into the next pass as plan
literals. No window, no shuffle of the corpus, no Python in the
pass.

Determinism (the part worth copying): floating-point SUM order is
partition-dependent, so a naive double-sum gradient differs run to
run AND can't be replayed by an oracle. Instead each document's
gradient contribution is quantized to FIXED-POINT
(round(g · 2^20) as bigint) and summed EXACTLY — integer addition
commutes, so the fitted weights are bit-identical under any
partitioning, and DuckDB replays the whole 8-iteration trajectory
term for term. The 2^-20 quantization error (~1e-6 per term) is far
below the statistical noise of the gradient itself.

Reference parity: karanta-ocr consumes trained scoring models
(`karanta/utils.py` AutoTokenizer/classifier loads); training them
on the extracted corpus is the downstream mandate this repo adds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

#: Fixed-point scale for exact gradient aggregation.
QUANT = 1 << 20


def _dot_expr(feature_cols: list[str], weights: list[float]) -> str:
    """SQL text for w·x + b with a fixed evaluation order (left fold
    over feature columns; repr() round-trips the doubles exactly)."""
    terms = [repr(float(weights[-1])) + "D"]  # intercept first
    for c, w in zip(feature_cols, weights[:-1]):
        terms.append(f"({repr(float(w))}D * {c})")
    # parenthesize left-to-right: ((b + w1x1) + w2x2) + ...
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def fit_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 8,
) -> list[float]:
    """Fit weights [w_1..w_d, intercept] by *iters* full-batch GD
    steps from w=0. One corpus aggregation per step; exact
    fixed-point gradient sums make the result partition-invariant."""
    n = df.count()
    d = len(feature_cols)
    w = [0.0] * (d + 1)
    xs = list(feature_cols) + ["1"]  # intercept pseudo-feature
    for _ in range(iters):
        z = _dot_expr(feature_cols, w)
        sig = f"(1.0D / (1.0D + exp(-({z}))))"
        aggs = [
            F.sum(
                F.expr(
                    f"cast(round(({sig} - cast({label_col} as double))"
                    f" * {x} * {QUANT}) as bigint)"
                )
            ).alias(f"g{j}")
            for j, x in enumerate(xs)
        ]
        row = df.agg(*aggs).collect()[0]
        w = [
            w[j] - lr * ((row[f"g{j}"] or 0) / QUANT) / n
            for j in range(d + 1)
        ]
    return w


def logreg_scores(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    out_col: str = "score",
) -> DataFrame:
    """Map-only scoring: σ(w·x) rounded to 6 dp plus the 0.5-threshold
    prediction."""
    z = _dot_expr(feature_cols, weights)
    score = F.expr(f"round(1.0D / (1.0D + exp(-({z}))), 6)")
    return df.withColumn(out_col, score).withColumn(
        "predicted", F.col(out_col) >= 0.5
    )


def train_quality_classifier(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 8,
) -> tuple[list[float], DataFrame]:
    """Fit + score in one call: (weights, df + score + predicted)."""
    w = fit_logreg(df, feature_cols, label_col, lr, iters)
    return w, logreg_scores(df, feature_cols, w)


def logreg_oracle_sql(
    base_cte: str,
    feature_cols: list[str],
    label_col: str,
    select_cols: list[str],
    lr: float = 1.0,
    iters: int = 8,
) -> str:
    """DuckDB SQL replaying the full training trajectory + scoring.

    *base_cte* must be a complete ``WITH``-clause body defining a
    relation ``base`` with *feature_cols*, *label_col* and
    *select_cols*. The iterations unroll as chained one-row weight
    CTEs (w0 = zeros; w{i+1} from w{i} via the same quantized
    gradient aggregate), mirroring :func:`fit_logreg` operation for
    operation."""
    d = len(feature_cols)
    names = [f"c{j}" for j in range(d)] + ["b"]
    parts = [base_cte]
    parts.append(
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base)"
    )
    zero = ", ".join(f"0.0 AS {nm}" for nm in names)
    parts.append(f"w0 AS (SELECT {zero})")
    for i in range(iters):
        z = f"w.b"
        for j, c in enumerate(feature_cols):
            z = f"({z} + (w.c{j} * base.{c}))"
        sig = f"(1.0 / (1.0 + exp(-({z}))))"
        xs = list(feature_cols) + ["1"]
        gsel = ", ".join(
            f"sum(CAST(round(({sig} - CAST(base.{label_col} AS DOUBLE))"
            f" * {x} * {QUANT}) AS BIGINT)) AS g{j}"
            for j, x in enumerate(xs)
        )
        upd = ", ".join(
            f"w.{nm} - {repr(float(lr))} * ((g.g{j} / {QUANT}.0) / n.n) AS {nm}"
            for j, nm in enumerate(names)
        )
        parts.append(
            f"g{i} AS (SELECT {gsel} FROM base CROSS JOIN w{i} w)"
        )
        parts.append(
            f"w{i + 1} AS (SELECT {upd} FROM w{i} w CROSS JOIN g{i} g"
            " CROSS JOIN n)"
        )
    zf = f"w.b"
    for j, c in enumerate(feature_cols):
        zf = f"({zf} + (w.c{j} * base.{c}))"
    score = f"round(1.0 / (1.0 + exp(-({zf}))), 6)"
    sel = ", ".join(f"base.{c}" for c in select_cols)
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT {sel}, {score} AS score, {score} >= 0.5 AS predicted"
        + f" FROM base CROSS JOIN w{iters} w"
    )
