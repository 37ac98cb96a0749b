"""Bloom incremental-dedup and DSIR importance-resampling tests:
no-false-negatives guarantee, definite-new screening, plan shape
(broadcast joins, no batch shuffle), model arithmetic against a
hand-computed fixture, and selection direction."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.bloom import (
    bloom_build,
    bloom_new_docs,
    bloom_screen,
)
from karanta_ocr_spark.operators.importance import (
    dsir_select,
    fit_logratios,
    hashed_unigram_counts,
    importance_scores,
)

BITS = 1 << 12
K = 4


@pytest.fixture(scope="module")
def corpora(spark):
    prior = spark.createDataFrame(
        [(i, f"prior document number {i} with shared words") for i in range(200)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(i, f"prior document number {i} with shared words") for i in range(100)]
        + [(1000 + i, f"genuinely new page {i} fresh content") for i in range(50)],
        "doc_id long, text string",
    )
    return prior, batch


def test_bloom_no_false_negatives(spark, corpora):
    prior, batch = corpora
    bloom = bloom_build(prior, "text", BITS, K)
    seen = {
        r["doc_id"]: r["seen_before"]
        for r in bloom_screen(batch, bloom, "text", BITS, K).collect()
    }
    # Every text that IS in the prior corpus must be flagged — a
    # Bloom filter can never miss a member.
    assert all(seen[i] for i in range(100))


def test_bloom_new_docs_definitely_new(spark, corpora):
    prior, batch = corpora
    new = bloom_new_docs(batch, prior, "text", BITS, K)
    ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    # Only genuinely-new ids survive (false positives may REMOVE some
    # of the 50, never add a prior doc back).
    assert ids <= {1000 + i for i in range(50)}
    # At 4096 bits / 200 docs / k=4 the fp rate is well under 10%:
    assert len(ids) >= 45


def test_bloom_screen_plan_is_one_broadcast_no_shuffle(spark, corpora):
    prior, batch = corpora
    bloom = bloom_build(prior, "text", BITS, K)
    plan = bloom_screen(batch, bloom, "text", BITS, K)._jdf.queryExecution().executedPlan().toString()
    # ONE broadcast carries the whole filter (the single-row
    # map_from_entries fold); the k probes are map-side lookups, so
    # there is exactly one broadcast exchange, no per-probe join
    # cascade, and the batch is never shuffled or sort-merged.
    assert plan.count("BroadcastExchange") == 1
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("element_at") >= K


def test_hashed_counts_sum_to_token_count(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a a"), (3, "  ")], "doc_id long, text string"
    )
    counts = hashed_unigram_counts(df, num_buckets=16)
    assert counts.agg(F.sum("n")).collect()[0][0] == 5
    assert counts.agg(F.max("bucket")).collect()[0][0] < 16


def test_fit_logratios_hand_computed(spark):
    # One-bucket degenerate case: every token lands in bucket 0, so
    # the ratio reduces to ln((t+1)/(T+1)) - ln((r+1)/(R+1)).
    tgt = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    raw = spark.createDataFrame([(1, "x y z w")], "doc_id long, text string")
    lr = fit_logratios(tgt, raw, num_buckets=1)
    assert lr == pytest.approx(
        [math.log(3 / 3) - math.log(5 / 5)], abs=1e-12
    )
    assert len(lr) == 1


def test_dsir_selects_target_like_docs(spark):
    # Target vocabulary {alpha beta}, pool adds {zeta eta}: docs made
    # of target words must outscore docs of pool-only words.
    tgt = spark.createDataFrame(
        [(i, "alpha beta alpha beta") for i in range(20)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [(i, "alpha beta alpha beta") for i in range(10)]
        + [(100 + i, "zeta eta zeta eta") for i in range(10)],
        "doc_id long, text string",
    )
    out = dsir_select(pool, tgt, num_buckets=64)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert all(rows[i]["selected"] for i in range(10))
    assert not any(rows[100 + i]["selected"] for i in range(10))
    assert rows[0]["importance"] > 0 > rows[100]["importance"]


def test_importance_scores_null_for_empty(spark):
    df = spark.createDataFrame([(1, "   "), (2, "a b")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in importance_scores(df, [0.5] * 8, num_buckets=8).collect()}
    assert out[1]["importance"] is None and out[1]["n_toks"] == 0
    # All buckets 0.5 -> mean is exactly 0.5 regardless of hashing.
    assert out[2]["importance"] == pytest.approx(0.5)


def test_importance_scoring_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = importance_scores(df, [0.1] * 8, num_buckets=8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
