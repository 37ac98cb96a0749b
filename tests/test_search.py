"""BM25 ranking semantics."""

import pytest

from karanta_ocr_spark.operators.search import bm25_topk


def _corpus(spark):
    rows = [
        (1, "apple apple apple banana fig"),
        (2, "apple banana fig fig fig"),
        (3, "banana banana banana banana fig"),
        (4, "cherry fig " + "pad " * 50),
        (5, "apple " + "pad " * 50),
        (6, "fig"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tf_monotone_and_matching_only(spark):
    out = bm25_topk(_corpus(spark), ["apple"], k=10).collect()
    ids = [r["id"] for r in out]
    assert set(ids) == {1, 2, 5}  # only matching docs
    # doc1 (tf=3) beats doc2 (tf=1) at equal length.
    assert ids.index(1) < ids.index(2)


def test_length_normalization(spark):
    out = {r["id"]: r["score"] for r in bm25_topk(_corpus(spark), ["apple"], k=10).collect()}
    # Same tf=1: short doc2 beats long doc5.
    assert out[2] > out[5]


def test_idf_rare_term_wins(spark):
    # 'cherry' appears in 1 doc, 'fig' in 5: a doc matching only the
    # rare term ranks above a doc matching only the common term at
    # comparable tf/length.
    out = bm25_topk(_corpus(spark), ["cherry", "fig"], k=10).collect()
    scores = {r["id"]: r["score"] for r in out}
    assert scores[4] > scores[6] or scores[4] > scores[3]
    # And doc4 (cherry+fig) must outrank any fig-only long doc.
    assert scores[4] == max(scores[i] for i in (3, 4))


def test_k_limit_and_order(spark):
    out = bm25_topk(_corpus(spark), ["fig"], k=2).collect()
    assert len(out) == 2
    assert out[0]["score"] >= out[1]["score"]


def test_partition_invariance(spark):
    d = _corpus(spark)
    a = [(r["id"], r["score"]) for r in bm25_topk(d, ["apple", "fig"], k=10).collect()]
    b = [(r["id"], r["score"]) for r in bm25_topk(d.repartition(7), ["apple", "fig"], k=10).collect()]
    assert a == b


def test_empty_terms_rejected(spark):
    with pytest.raises(ValueError):
        bm25_topk(_corpus(spark), [])
