"""Distributed BPE merge learning: equivalence with the scalar
reference trainer (scripts/train_bpe.py), adversarial fold cases
(overlapping repeats), and partition invariance."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.bpe_train import (
    _apply_merge_expr,
    bpe_learn,
    word_counts,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _scalar_train(texts: list[str], n: int):
    """Reference trainer over the same pretokens (regex module gives
    \\p{L} parity with Spark's pretokenizer)."""
    import collections

    import regex

    from train_bpe import train

    from karanta_ocr_spark.functions.text_analysis import BPE_ISH_RE

    words = collections.Counter(
        w for t in texts for w in regex.findall(BPE_ISH_RE, t or "") if w
    )
    return train(words, n)


TEXTS = [
    "the merge trainer sees these tokens over and over",
    "over and over the same tokens train the merges",
    "aaaa bbbb aaaa",  # overlapping-repeat adversarial case
    "le château déjà vu déjà vu",
    "",
]


def test_bpe_learn_matches_scalar_reference(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = [
        (r["rank"], r["left"], r["right"])
        for r in bpe_learn(df, n_merges=8).orderBy("rank").collect()
    ]
    exp = [(i + 1, a, b) for i, (a, b) in enumerate(_scalar_train(TEXTS, 8))]
    assert got == exp


def test_fold_apply_equals_scan_on_overlapping_repeats(spark):
    """The fold (decide at the RIGHT symbol) must equal the reference
    scan (consume two at the LEFT) — the classic trap is 'aaaa' with
    merge (a, a): leftmost non-overlapping gives ['aa', 'aa'], never
    ['aa', 'a', 'a'] or a re-merged ['aaa', 'a']."""
    rows = [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["a"],),
            (["b", "a", "a"],), (["a", "a", "b"],)]
    df = spark.createDataFrame(rows, "syms array<string>")
    out = [
        r["m"]
        for r in df.select(
            F.expr(_apply_merge_expr("a", "a")).alias("m")
        ).collect()
    ]
    assert out == [
        ["aa", "a"],
        ["aa", "aa"],
        ["a"],
        ["b", "aa"],
        ["aa", "b"],
    ]


def test_bpe_learn_partition_invariant(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS * 3)), "doc_id long, text string"
    )
    a = bpe_learn(df.repartition(1), n_merges=5).orderBy("rank").collect()
    b = bpe_learn(df.repartition(7), n_merges=5).orderBy("rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bpe_learn_exhausted_corpus_stops_early(spark):
    # single-char pretokens only -> no adjacent pairs -> zero merges
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    got = bpe_learn(df, n_merges=4).collect()
    # ' b' etc. are 2-char pretokens (space-prefixed), so merges DO
    # exist; use truly empty corpus for the hard stop:
    empty = spark.createDataFrame([(0, "")], "doc_id long, text string")
    assert bpe_learn(empty, n_merges=4).collect() == []
    assert len(got) <= 4


def test_word_counts_is_one_pass_groupby(spark):
    df = spark.createDataFrame(
        [(0, "x y x"), (1, "x z")], "doc_id long, text string"
    )
    got = {r["w"]: r["n"] for r in word_counts(df).collect()}
    # GPT-style space prefixes: each doc-leading "x" is bare (2 docs),
    # the mid-text x in doc 0 carries its space.
    assert got["x"] == 2 and got[" x"] == 1
