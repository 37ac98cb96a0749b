"""DoReMi-lite domain reweighting: hard domains gain weight, weights
normalize, temperature extremes, unscorable docs, and partition
invariance."""

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.operators.doremi import domain_reweight


def _corpus(spark):
    # "easy" domain: the same repetitive sentence (low perplexity
    # under the corpus-trained bigram LM); "hard" domain: shuffled
    # unique word salad (high perplexity).
    easy = ["the cat sat on the mat and the cat sat again"] * 6
    hard = [
        "quartz vex jumbled wharf glyphs bright down sphinx",
        "wharf glyphs quartz down vex sphinx bright jumbled",
        "glyphs sphinx wharf vex down bright jumbled quartz",
        "down bright sphinx glyphs jumbled vex quartz wharf",
        "vex wharf bright sphinx quartz jumbled glyphs down",
        "jumbled down glyphs bright wharf quartz sphinx vex",
    ]
    rows = [(i, t, "easy") for i, t in enumerate(easy)] + [
        (100 + i, t, "hard") for i, t in enumerate(hard)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_hard_domain_gets_more_weight(spark):
    out = {r["domain"]: r for r in domain_reweight(_corpus(spark)).collect()}
    assert out["hard"]["mean_cross_entropy"] > out["easy"]["mean_cross_entropy"]
    assert out["hard"]["weight"] > out["easy"]["weight"]
    assert out["hard"]["excess"] > 0.0
    assert out["easy"]["excess"] >= 0.0


def test_weights_normalize(spark):
    out = domain_reweight(_corpus(spark)).collect()
    assert sum(r["weight"] for r in out) == pytest.approx(1.0, abs=1e-5)
    assert all(0.0 <= r["weight"] <= 1.0 for r in out)


def test_high_temperature_flattens(spark):
    sharp = {r["domain"]: r["weight"] for r in
             domain_reweight(_corpus(spark), temperature=0.1).collect()}
    flat = {r["domain"]: r["weight"] for r in
            domain_reweight(_corpus(spark), temperature=100.0).collect()}
    assert sharp["hard"] - sharp["easy"] > flat["hard"] - flat["easy"]
    assert flat["hard"] == pytest.approx(0.5, abs=0.01)


def test_unscorable_docs_counted_but_not_averaged(spark):
    df = _corpus(spark).union(
        spark.createDataFrame(
            [(200, "single", "easy"), (201, "", "easy")],
            "doc_id long, text string, source string",
        )
    )
    out = {r["domain"]: r for r in domain_reweight(df).collect()}
    assert out["easy"]["n_docs"] == 8
    assert out["easy"]["n_scored"] == 6


def test_partition_invariance(spark):
    a = domain_reweight(_corpus(spark).repartition(1)).orderBy("domain").collect()
    b = domain_reweight(_corpus(spark).repartition(7)).orderBy("domain").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
