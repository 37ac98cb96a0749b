"""BM25 ranked keyword search over a document corpus.

Training-data pipelines query their corpora constantly — "find the
documents about X" powers eval-set curation, contamination triage,
topic audits, and targeted subset extraction. BM25 (Robertson et
al.; the Lucene-default scoring function) is the standard ranked
retrieval model. This operator evaluates a small bag of query terms
against every document in ONE corpus pass, Spark-first:

- per-term term frequencies are Catalyst higher-order functions over
  the whitespace token array (zero Python, zero shuffle — the
  per-row work rides the scan);
- the three corpus statistics BM25 needs (N, avg doc length, per-term
  document frequencies) come from ONE partial aggregate whose single
  output row is broadcast back over the corpus — no driver collect,
  no second corpus scan (Catalyst reuses the cached scan subtree for
  the two consumers under AQE);
- scoring is pure arithmetic; top-k is a ``TakeOrdered`` (orderBy +
  limit — per-partition heaps + driver k-merge, never a global
  sort).

Ordering determinism: scores are rounded to 6 decimals BEFORE the
top-k ordering and tie-break on ``id`` ascending — so the selected
set is stable across partitionings and replayable bit-for-bit by the
DuckDB oracle (``ln`` differs by ≤1 ulp across libm implementations;
the rounding absorbs it).

Scale notes (100 TB): the stats aggregate is a full-corpus reduce to
ONE row — the cheapest possible shuffle; scoring + TakeOrdered keeps
only k rows per partition. Query-term count Q multiplies per-row HOF
work linearly; for large Q you'd switch to an inverted-index join
(the ``vocab_top_tokens`` explode shape), which trades the Q scans
for one corpus explode — not worth it below Q ≈ dozens.

Reference parity: karanta-ocr has no search; this is part of the
training-data operator mandate (brief), the query side of the
WARC/CDX index family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from karanta_ocr_spark.functions.text_analysis import tokens


def _tf(toks: Column, term: str) -> Column:
    t = term.lower()
    return F.size(
        F.filter(toks, lambda x: F.lower(x) == F.lit(t))
    ).cast("double")


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-*k* documents for *query_terms* under BM25.

    ``score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
    (tf(t,d) + k1·(1 - b + b·|d|/avgdl))`` with the Lucene-style
    non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Returns
    ``(id, score, doclen)`` rows, score rounded to 6, ordered
    (score desc, id asc), only matching docs (score > 0).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("double").alias("doclen"),
        *[_tf(toks, t).alias(f"_tf{i}") for i, t in enumerate(query_terms)],
    )
    stats = F.broadcast(
        base.agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("doclen").alias("avgdl"),
            *[
                F.sum((F.col(f"_tf{i}") > 0).cast("double")).alias(f"_df{i}")
                for i in range(len(query_terms))
            ],
        )
    )
    scored = base.crossJoin(stats)
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"_tf{i}")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"_df{i}") + 0.5)
            / (F.col(f"_df{i}") + 0.5)
        )
        score = score + idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * F.col("doclen") / F.col("avgdl"))
        )
    return (
        scored.select(
            "id",
            F.round(score, 6).alias("score"),
            F.col("doclen").cast("long").alias("doclen"),
        )
        .filter(F.col("score") > 0.0)
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )
