"""Decontamination + exact-substring span stats over crafted fixtures
with hand-computed expected values, plus partition invariance."""

from __future__ import annotations

import pytest

from karanta_ocr_spark.operators.decontaminate import (
    decontaminate,
    duplicate_span_stats,
)


@pytest.fixture(scope="module")
def train_docs(spark):
    rows = [
        # Contains the eval trigram "the cat sat" twice (counts ONCE —
        # distinct) and "cat sat on" once.
        (1, "the cat sat on a mat and the cat sat nearby"),
        # Clean: shares words but no full trigram with the eval set.
        (2, "a dog stood on grass"),
        # Too short for any trigram.
        (3, "tiny doc"),
        # Case-insensitive hit: "The CAT sat" lowercases to a hit.
        (4, "look The CAT sat there"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def eval_docs(spark):
    return spark.createDataFrame(
        [("the cat sat on",)], "text string"
    )  # trigrams: "the cat sat", "cat sat on"


@pytest.mark.parametrize("mode", ["xxhash64", "md5", "text"])
def test_decontaminate_counts(spark, train_docs, eval_docs, mode):
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            train_docs, eval_docs, n=3, hash_mode=mode
        ).collect()
    }
    assert len(out) == 4
    assert out[1]["n_contaminated_ngrams"] == 2  # distinct hits, not 3
    assert out[1]["contaminated"] is True
    assert out[2]["n_contaminated_ngrams"] == 0
    assert out[2]["contaminated"] is False
    assert out[3]["n_contaminated_ngrams"] == 0
    assert out[4]["n_contaminated_ngrams"] == 1  # "the cat sat" via lower()


def test_decontaminate_partition_invariance(spark, train_docs, eval_docs):
    a = sorted(
        map(tuple, decontaminate(train_docs, eval_docs, n=3).collect())
    )
    b = sorted(
        map(
            tuple,
            decontaminate(
                train_docs.repartition(7), eval_docs.repartition(3), n=3
            ).collect(),
        )
    )
    assert a == b


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        # Docs 1 and 2 share the 6-token run "one two three four five
        # six" → with window=5 the duplicated windows in each doc are
        # positions 0 and 1, covering tokens 0..5 (6 of them).
        (1, "one two three four five six alpha beta gamma delta"),
        (2, "one two three four five six omega psi chi phi"),
        # Internal repetition inside ONE doc also counts (the window
        # text occurs twice in the corpus): "x y z w v" at pos 0 and 5.
        (3, "x y z w v x y z w v"),
        # No duplicated window anywhere.
        (4, "p q r s t u"),
        # Shorter than the window.
        (5, "a b c"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("mode", ["xxhash64", "md5"])
def test_duplicate_span_stats(spark, span_docs, mode):
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(
            span_docs, window=5, hash_mode=mode
        ).collect()
    }
    assert len(out) == 5
    r1 = out[1]
    assert r1["n_tokens"] == 10
    assert r1["n_dup_windows"] == 2  # pos 0 ("one..five"), pos 1 ("two..six")
    assert r1["dup_token_frac"] == pytest.approx(0.6)  # tokens 0..5 of 10
    assert out[2]["n_dup_windows"] == 2
    assert out[2]["dup_token_frac"] == pytest.approx(0.6)
    r3 = out[3]
    # windows at pos 0 and 5 are both "x y z w v" (occ=2) — the other
    # windows ("y z w v x" etc.) each occur once.
    assert r3["n_dup_windows"] == 2
    assert r3["dup_token_frac"] == pytest.approx(1.0)  # 0..4 and 5..9
    assert out[4]["n_dup_windows"] == 0
    assert out[4]["dup_token_frac"] == 0.0
    assert out[5]["n_tokens"] == 3
    assert out[5]["n_dup_windows"] == 0
    assert out[5]["dup_token_frac"] == 0.0


def test_duplicate_span_partition_invariance(spark, span_docs):
    a = sorted(map(tuple, duplicate_span_stats(span_docs, window=5).collect()))
    b = sorted(
        map(
            tuple,
            duplicate_span_stats(span_docs.repartition(9), window=5).collect(),
        )
    )
    assert a == b


@pytest.mark.parametrize("mode", ["xxhash64", "md5"])
def test_remove_duplicate_spans(spark, span_docs, mode):
    from karanta_ocr_spark.operators.decontaminate import remove_duplicate_spans

    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            span_docs, window=5, hash_mode=mode
        ).collect()
    }
    # Doc 1 holds the globally-first occurrence of the shared run
    # "one two three four five six" -> keeps everything.
    assert out[1]["text"] == "one two three four five six alpha beta gamma delta"
    assert out[1]["n_dropped"] == 0
    # Doc 2's copy is non-first -> loses tokens 0..5, keeps its tail.
    assert out[2]["text"] == "omega psi chi phi"
    assert out[2]["n_dropped"] == 6
    # Doc 3 repeats "x y z w v" internally: first occurrence (pos 0)
    # keeps, second (pos 5) is cut.
    assert out[3]["text"] == "x y z w v"
    assert out[3]["n_dropped"] == 5
    # No duplicated window anywhere / shorter than window: unchanged.
    assert out[4]["text"] == "p q r s t u" and out[4]["n_dropped"] == 0
    assert out[5]["text"] == "a b c" and out[5]["n_dropped"] == 0


def test_remove_duplicate_spans_partition_invariance(spark, span_docs):
    from karanta_ocr_spark.operators.decontaminate import remove_duplicate_spans

    a = sorted(map(tuple, remove_duplicate_spans(span_docs, window=5).collect()))
    b = sorted(
        map(
            tuple,
            remove_duplicate_spans(span_docs.repartition(9), window=5).collect(),
        )
    )
    assert a == b
