"""Curation-funnel tests: first-failing-stage verdicts over a
hand-built corpus where every stage's expected drop count is known,
plus the funnel fold's cumulative-survivor arithmetic and the
staged-pipeline ordering invariant (a doc failing two gates reports
the EARLIER one; dedup only sees gate survivors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.curate import (
    STAGES,
    curate_corpus,
    curation_verdicts,
    funnel,
)

GOOD = "A clean sentence with enough words to keep around."
REP = "same line here now ok\nsame line here now ok\nsame line here now ok"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # kept: unique, passes everything.
        (1, "en", GOOD),
        # duplicate pair: min-id 2 kept, 3 dropped at exact_dedup.
        (2, "en", GOOD + " twice"),
        (3, "en", GOOD + " twice"),
        # wrong lang — AND too short: lang_filter must win (ordered).
        (4, "zh", "short"),
        # quality: under 5 words.
        (5, "en", "only four words here"),
        # quality: curly brace (C4 code heuristic).
        (6, "en", "function() { return 1; } plus some words"),
        # repetition: 3 identical lines -> dup_line_frac 2/3 > 0.3.
        (7, "en", REP),
        # duplicate of a GATE-FAILING text: doc 7 never enters the
        # dedup pool, so 8 is the min-id HOLDER among survivors —
        # but 8 also fails repetition itself. Both report
        # repetition_filter, neither exact_dedup.
        (8, "en", REP),
        # duplicate across a gate-failed twin: 9 kept (its zh twin 10
        # failed lang and is not in the dedup pool).
        (9, "en", GOOD + " thrice"),
        (10, "zh", GOOD + " thrice"),
    ]
    return rows


def test_verdicts_first_failing_stage(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, lang string, text string")
    v = {
        r["doc_id"]: r["verdict"]
        for r in curation_verdicts(df, ["en"]).collect()
    }
    assert v == {
        1: "kept",
        2: "kept",
        3: "exact_dedup",
        4: "lang_filter",  # not quality_filter: stage order
        5: "quality_filter",
        6: "quality_filter",
        7: "repetition_filter",
        8: "repetition_filter",  # dedup never saw 7/8
        9: "kept",
        10: "lang_filter",
    }


def test_funnel_cumulative_survivors(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, lang string, text string")
    kept, fn = curate_corpus(df, ["en"])
    rows = {r["stage"]: r for r in fn.collect()}
    assert [rows[s]["stage_idx"] for s in STAGES] == [1, 2, 3, 4]
    assert rows["lang_filter"]["n_dropped"] == 2
    assert rows["quality_filter"]["n_dropped"] == 2
    assert rows["repetition_filter"]["n_dropped"] == 2
    assert rows["exact_dedup"]["n_dropped"] == 1
    # survivors: 10 -> 8 -> 6 -> 4 -> 3
    assert [rows[s]["n_survivors"] for s in STAGES] == [8, 6, 4, 3]
    assert kept.count() == 3
    assert set(kept.columns) == {"doc_id", "lang", "text"}
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {1, 2, 9}


def test_funnel_equals_staged_pipeline(spark, corpus):
    """The one-pass verdict must equal literally running the stages
    one after another (the S-scan implementation it replaces)."""
    df = spark.createDataFrame(corpus, "doc_id long, lang string, text string")
    s0 = df.filter(F.col("lang").isin("en"))
    from karanta_ocr_spark.functions.text_analysis import WS
    from karanta_ocr_spark.operators.corpus_filters import (
        duplicate_line_stats,
        lines_expr,
    )

    toks = F.split(F.trim(F.col("text")), WS + "+")
    s1 = s0.filter(
        (F.size(toks) >= 5)
        & ~F.lower(F.col("text")).contains("lorem ipsum")
        & ~F.col("text").contains("{")
        & (F.size(lines_expr(F.col("text"))) > 0)
    )
    _, dup_frac, _ = duplicate_line_stats(F.col("text"))
    s2 = s1.filter(dup_frac <= 0.3)
    w = s2.withColumn("_fp", F.md5("text"))
    canon = w.groupBy("_fp").agg(F.min("doc_id").alias("_keep"))
    s3 = (
        w.join(canon, "_fp")
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_fp", "_keep")
    )
    kept, _ = curate_corpus(df, ["en"])
    staged = {r["doc_id"] for r in s3.select("doc_id").collect()}
    onepass = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert staged == onepass


def test_null_inputs_fail_their_gate_not_pass_all(spark):
    # Regression (r4 advice): a NULL lang (or NULL text) made every
    # gate expression NULL, every when() branch was skipped, and the
    # row fell through to 'kept' — bypassing the language allowlist
    # AND dedup. NULLs must fail the FIRST gate they make undecidable.
    rows = [
        (1, "en", GOOD),
        (2, None, GOOD + " null lang"),
        (3, "en", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    v = {r["doc_id"]: r["verdict"]
         for r in curation_verdicts(df, ["en"]).collect()}
    assert v == {1: "kept", 2: "lang_filter", 3: "quality_filter"}
