"""Bigram-LM perplexity against hand-computed probabilities on a
corpus small enough to verify by hand, plus partition invariance of
the ordered log-prob fold."""

from __future__ import annotations

import math

import pytest

from karanta_ocr_spark.operators.lm_score import bigram_lm_perplexity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a b"),
        (2, "a b"),
        (3, "solo"),  # one token: no bigram, NULL scores
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("mode", ["xxhash64", "md5"])
def test_bigram_lm_hand_computed(spark, docs, mode):
    # Corpus: V = {a, b, solo} → 3. Bigram counts: B(a b)=3, B(b a)=1.
    # Context counts (w1 of each bigram occurrence): C(a)=3, C(b)=1.
    # P(b|a) = (3+1)/(3+3) = 2/3;  P(a|b) = (1+1)/(1+3) = 1/2.
    p_ba = (3 + 1) / (3 + 3)
    p_ab = (1 + 1) / (1 + 3)
    out = {
        r["doc_id"]: r
        for r in bigram_lm_perplexity(docs, hash_mode=mode).collect()
    }
    assert len(out) == 3

    h1 = -(2 * math.log(p_ba) + math.log(p_ab)) / 3
    assert out[1]["n_bigrams"] == 3
    assert out[1]["cross_entropy"] == pytest.approx(h1, abs=1e-6)
    assert out[1]["perplexity"] == pytest.approx(math.exp(h1), abs=1e-4)

    h2 = -math.log(p_ba)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["cross_entropy"] == pytest.approx(h2, abs=1e-6)
    assert out[2]["perplexity"] == pytest.approx(math.exp(h2), abs=1e-4)

    assert out[3]["n_bigrams"] == 0
    assert out[3]["cross_entropy"] is None
    assert out[3]["perplexity"] is None


def test_lm_partition_invariance(spark, docs):
    # The fold is position-ordered, so the float result must be
    # BIT-identical across partitionings, not just approx.
    a = sorted(map(tuple, bigram_lm_perplexity(docs).collect()))
    b = sorted(map(tuple, bigram_lm_perplexity(docs.repartition(7)).collect()))
    assert a == b


def test_lm_low_perplexity_for_templated_text(spark):
    # A templated (repetitive) doc must score lower perplexity than a
    # doc of corpus-unique words — the signal CCNet-style filters use.
    rows = [(i, "click here to buy now") for i in range(10)]
    rows.append((100, "zephyr quartz vexing glyph jockey"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["perplexity"] for r in bigram_lm_perplexity(df).collect()}
    assert out[0] < out[100]
