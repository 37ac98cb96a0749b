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


# ---------------------------------------------------------------------------
# stupid-backoff held-out scoring (Brants et al. 2007)
# ---------------------------------------------------------------------------

def _is_train(doc_id: int) -> bool:
    """Python twin of the operator's md5(doc_id)-parity split."""
    import hashlib

    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 2 == 0


def _split_ids(n_train: int, n_score: int):
    train, score = [], []
    i = 0
    while len(train) < n_train or len(score) < n_score:
        (train if _is_train(i) else score).append(i)
        i += 1
    return train[:n_train], score[:n_score]


def test_stupid_backoff_hand_computed(spark):
    from karanta_ocr_spark.operators.lm_score import stupid_backoff_score

    (t0,), (s0, s1, s2) = _split_ids(1, 3)
    rows = [
        (t0, "the cat sat on the mat"),   # train: N=6 tokens, V=5
        (s0, "the cat sat on"),           # both trigrams seen in train
        (s1, "big cat sat zzz"),          # bi rung, then uni/OOV rung
        (s2, "hi there"),                 # <3 tokens: NULL scores
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in stupid_backoff_score(df).collect()}
    # only score-half docs are returned
    assert set(out) == {s0, s1, s2}

    r = out[s0]
    assert (r["n_trigrams"], r["hits_tri"], r["hits_bi"], r["hits_uni"]) == (2, 2, 0, 0)
    # c(the cat sat)/c(the cat) = 1/1 and c(cat sat on)/c(cat sat) = 1/1
    assert r["sb_logscore"] == pytest.approx(0.0, abs=1e-6)
    assert r["sb_score"] == pytest.approx(1.0, abs=1e-6)

    r = out[s1]
    assert (r["n_trigrams"], r["hits_tri"], r["hits_bi"], r["hits_uni"]) == (2, 0, 1, 1)
    # (big cat sat): unseen tri -> 0.4 * c(cat sat)/c(cat) = 0.4
    # (cat sat zzz): unseen tri and (sat zzz) -> 0.4^2 * (c(zzz)+1)/(N+V)
    lp1 = math.log(0.4)
    lp2 = 2 * math.log(0.4) + math.log(0 + 1.0) - math.log(6 + 5)
    mean = (lp1 + lp2) / 2
    assert r["sb_logscore"] == pytest.approx(mean, abs=1e-6)
    assert r["sb_score"] == pytest.approx(math.exp(mean), abs=1e-6)

    r = out[s2]
    assert (r["n_trigrams"], r["hits_tri"], r["hits_bi"], r["hits_uni"]) == (0, 0, 0, 0)
    assert r["sb_logscore"] is None and r["sb_score"] is None


def test_stupid_backoff_partition_invariance(spark):
    from karanta_ocr_spark.operators.lm_score import stupid_backoff_score

    train_ids, score_ids = _split_ids(4, 4)
    rows = [(i, "alpha beta gamma delta alpha beta") for i in train_ids]
    rows += [(i, f"alpha beta gamma omega{i} alpha") for i in score_ids]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, stupid_backoff_score(df).collect()))
    b = sorted(map(tuple, stupid_backoff_score(df.repartition(7)).collect()))
    assert a == b
