"""DSIR-style data selection: hashed-unigram importance weights
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling") re-expressed as two bounded Spark passes.

The method: fit bag-of-hashed-ngrams unigram models over a TARGET
corpus (the distribution you want more of — a quality domain, a
language, a wiki/books mix) and over the RAW pool, then weight every
raw document by its average per-token log-likelihood ratio
log p_target(tok)/p_raw(tok). Documents whose tokens look more like
the target than the pool score > 0; importance resampling keeps the
high scorers.

Spark-first shape, sized for 100 TB:

- **Fitting** is one explode→groupBy per corpus with ≤ num_buckets
  groups (map-side partial sums, so the shuffle moves at most
  buckets×partitions rows — the hashed feature space is the whole
  point of DSIR: the model is B counters, not a vocabulary).
- The fitted model — B log-ratios — is a ~2 KB parameter vector.
  Collecting it to the driver is collecting MODEL PARAMETERS (same
  adjudication as the IVF centroids in ``operators/similarity``),
  not data; it is then folded into the scoring plan as a literal
  array constant.
- **Scoring** is map-only: ``transform`` tokens → ``element_at`` the
  literal log-ratio array → ``aggregate`` (left fold) — whole-stage
  codegen end to end, zero shuffle, zero Python in the hot path.

Determinism: token→bucket hashing is the md5-mod idiom
(engine-neutral, like ``operators/dedup``), the per-doc fold is a
strictly left-to-right ``F.aggregate``, and smoothing/ratio
arithmetic is plain IEEE double math — so the DuckDB oracle replays
fit AND scoring bit-for-bit.

Reference parity: karanta-ocr has no data-selection stage (it stops
at extraction); this is the downstream training-data mandate, built
on the same documents table as the dedup/quality operators.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

#: Hash-domain tag so unigram buckets never collide with other
#: md5-mod uses of the same seed elsewhere in the repo.
_TAG = "u"


def _tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped (the same
    ``[ \\t-\\r]+`` split as functions/text_analysis)."""
    from karanta_ocr_spark.functions.text_analysis import WS

    return F.filter(
        F.split(F.lower(F.trim(col)), WS + "+"), lambda t: t != ""
    )


def _bucket_expr(tok_expr: str, num_buckets: int, seed: int) -> str:
    """SQL text: md5-mod bucket of a token expression (first 60 bits
    of md5("{seed}:u:" || tok), mod num_buckets)."""
    return (
        f"cast(conv(substring(md5(concat('{seed}:{_TAG}:', {tok_expr})), 1, 15),"
        f" 16, 10) as bigint) % {num_buckets}"
    )


def hashed_unigram_counts(
    df: DataFrame,
    col: str = "text",
    num_buckets: int = 256,
    seed: int = 42,
) -> DataFrame:
    """(bucket, n) hashed-unigram counts over ``df[col]``. One
    explode + one ≤ num_buckets-group shuffle (partial-aggregated
    map-side). Buckets with zero occurrences are absent."""
    toks = df.select(F.explode(_tokens(F.col(col))).alias("_t"))
    return (
        toks.select(F.expr(_bucket_expr("_t", num_buckets, seed)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def fit_logratios(
    target: DataFrame,
    raw: DataFrame,
    col: str = "text",
    num_buckets: int = 256,
    seed: int = 42,
) -> list[float]:
    """The fitted DSIR model: per-bucket
    ln p_target(b) − ln p_raw(b) with add-one smoothing
    (p(b) = (n_b + 1) / (N + B)), as a dense B-length list. The two
    count jobs are the only actions; the collect moves 2×B rows."""
    t = {
        r["bucket"]: r["n"]
        for r in hashed_unigram_counts(target, col, num_buckets, seed).collect()
    }
    r = {
        r["bucket"]: r["n"]
        for r in hashed_unigram_counts(raw, col, num_buckets, seed).collect()
    }
    tn = sum(t.values())
    rn = sum(r.values())
    return [
        math.log((t.get(b, 0) + 1) / (tn + num_buckets))
        - math.log((r.get(b, 0) + 1) / (rn + num_buckets))
        for b in range(num_buckets)
    ]


def importance_scores(
    df: DataFrame,
    logratios: list[float],
    col: str = "text",
    num_buckets: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Append ``n_toks`` and ``importance`` (mean per-token log-ratio,
    rounded to 6 dp; null for token-less docs) to *df*. Map-only:
    the model rides in the plan as a literal array."""
    # Built as one SQL expression: the bucket hash must reference the
    # lambda variable `t`, which a Python-side F.expr fragment inside
    # a Column-lambda cannot resolve.
    contrib = F.expr(
        f"transform(filter(split(lower(trim({col})), '{_ws_sql()}+'), t -> t != ''), "
        f"t -> element_at({_lit_array_sql(logratios)}, "
        f"cast({_bucket_expr('t', num_buckets, seed)} + 1 as int)))"
    )
    total = F.aggregate(contrib, F.lit(0.0), lambda a, x: a + x)
    n = F.size(contrib)
    return df.withColumn("n_toks", n.cast("bigint")).withColumn(
        "importance",
        F.when(n > 0, F.round(total / n, 6)),
    )


def _ws_sql() -> str:
    from karanta_ocr_spark.functions.text_analysis import WS_SQL

    return WS_SQL


def _lit_array_sql(values: list[float]) -> str:
    """The model as a SQL array literal (repr keeps full double
    precision: Python repr round-trips IEEE 754 exactly)."""
    return "array(" + ", ".join(repr(float(v)) + "D" for v in values) + ")"


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    col: str = "text",
    num_buckets: int = 256,
    seed: int = 42,
    threshold: float = 0.0,
) -> DataFrame:
    """End-to-end DSIR: fit on (target, df), score df, keep docs with
    importance > threshold (0.0 = "more target-like than pool-like").
    Returns df + n_toks + importance + selected."""
    lr = fit_logratios(target, df, col, num_buckets, seed)
    scored = importance_scores(df, lr, col, num_buckets, seed)
    return scored.withColumn(
        "selected", F.coalesce(F.col("importance") > threshold, F.lit(False))
    )
