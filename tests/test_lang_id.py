"""Language-ID heuristic quality over the fixture corpus: script-range
detection must be exact for non-Latin scripts; Latin langs may fall
back to diacritic guesses or 'und' (documented limitation)."""

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.functions.text_analysis import lang_id_heuristic
from karanta_ocr_spark.pipeline import run_extraction
from karanta_ocr_spark.sources.web_pages import synthetic_web_pages

SCRIPT_LANGS = {"amh", "nqo", "vai", "ara"}


def test_script_langs_detected_exactly(spark):
    web = synthetic_web_pages(spark, n_docs=96, seed=42)
    docs = run_extraction(spark, web, num_partitions=4)
    got = docs.select(
        "url", "lang", lang_id_heuristic(F.col("text")).alias("guess")
    ).collect()
    script_rows = [r for r in got if r["lang"] in SCRIPT_LANGS]
    assert script_rows, "corpus must include script-language docs"
    wrong = [
        (r["url"], r["lang"], r["guess"])
        for r in script_rows
        if r["guess"] != r["lang"]
    ]
    assert not wrong, wrong


def test_yoruba_diacritics_detected(spark):
    web = synthetic_web_pages(spark, n_docs=96, seed=42)
    docs = run_extraction(spark, web, num_partitions=4)
    yor = docs.filter(F.col("lang") == "yor").select(
        lang_id_heuristic(F.col("text")).alias("guess")
    ).collect()
    if yor:  # Yoruba diacritic markers present in every fixture doc
        assert all(r["guess"] == "yor" for r in yor)


def test_french_not_shadowed_by_yoruba(spark):
    # Plain French accents are a subset of Yoruba tone-marked vowels;
    # the scored markers must classify French as fra (VERDICT r01 wart).
    rows = [
        (0, "le château était déjà fermé, la fenêtre donnait sur la forêt"),
        (1, "ọmọ mi fẹ́ràn oúnjẹ aládùn àti ẹja ṣíṣè"),
        (2, "ụmụ anyị na-aṅụ mmiri ọhụrụ n'ụtụtụ"),
        (3, "plain ascii text with no diacritics at all"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {r["i"]: r["g"] for r in
           df.select("i", lang_id_heuristic(F.col("text")).alias("g")).collect()}
    assert got == {0: "fra", 1: "yor", 2: "igb", 3: "und"}


def test_script_stats_counts_known_strings(spark):
    from karanta_ocr_spark.functions.text_analysis import (
        SCRIPT_COUNT_CLASSES,
        char_class_count,
        dominant_script,
    )

    rows = [
        # (id, text, expected dominant, expected per-script counts)
        (0, "ሰላም ለዓለም", "ethiopic", {"ethiopic": 7, "latin": 0}),
        (1, "ߒߞߏ ߞߊ߲", "nko", {"nko": 6, "latin": 0}),  # combining ߲ is in-block
        (2, "ꔀꔁꕉ abcd", "latin", {"vai": 3, "latin": 4}),
        (7, "ꔀꔁꕉꕊ abc", "vai", {"vai": 4, "latin": 3}),
        # 3-3 tie: first SCRIPT_COUNT_CLASSES entry (latin) wins
        (8, "ꔀꔁꕉ abc", "latin", {"vai": 3, "latin": 3}),
        (3, "báwo ni, ẹ kú àárọ̀", "latin", {"latin": 13, "ethiopic": 0}),
        (4, "مرحبا 123", "arabic", {"arabic": 5, "latin": 0}),
        (5, "12 345", "none", {"latin": 0, "arabic": 0}),
        (6, "", "none", {"latin": 0}),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in rows], "id long, text string"
    )
    counts = [
        (n, char_class_count(F.col("text"), c)) for n, c in SCRIPT_COUNT_CLASSES
    ]
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            *[c.alias(n) for n, c in counts],
            dominant_script(counts).alias("dom"),
        ).collect()
    }
    for i, text, dom, expect in rows:
        assert out[i]["dom"] == dom, (i, text, out[i])
        for script, n in expect.items():
            assert out[i][script] == n, (i, script, out[i])


def test_script_stats_partition_counts_sum_to_total(spark):
    # Full-profile invariant on the fixture corpus: every codepoint is
    # classified exactly once (scripts + digit + space + other == len).
    import __spark_entry__ as e

    df = e.queries()["script_stats"](spark, "/root/testdata/sf0.001")
    bad = df.filter(
        F.col("n_latin") + F.col("n_ethiopic") + F.col("n_nko")
        + F.col("n_vai") + F.col("n_arabic") + F.col("n_digit")
        + F.col("n_space") + F.col("n_other") != F.col("n_chars")
    ).count()
    assert bad == 0


def test_class_entropy_extremes(spark):
    from karanta_ocr_spark.functions.text_analysis import (
        SCRIPT_COUNT_CLASSES, WS, char_class_count, class_entropy,
    )

    rows = [
        (1, "aaaa"),             # all latin -> H = 0
        (2, "ab12 \u1240\u1241"),  # latin+digit+space+ethiopic mix
        (3, ""),                 # empty -> NULL
        (4, "\ue000\ue001"),       # all 'other' (PUA) -> H = 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.col("text")
    counts = [char_class_count(t, c) for _, c in SCRIPT_COUNT_CLASSES]
    n_digit = char_class_count(t, "[0-9]")
    n_space = char_class_count(t, WS)
    letters = counts[0]
    for c in counts[1:]:
        letters = letters + c
    other = F.length(t) - letters - n_digit - n_space
    ent = class_entropy(counts + [n_digit, n_space, other], F.length(t))
    out = {r["doc_id"]: r["h"] for r in df.select("doc_id", ent.alias("h")).collect()}
    assert out[1] == 0.0
    assert out[3] is None
    assert out[4] == 0.0
    import math

    n = 7  # 'ab12 qq' = a b 1 2 space + two ethiopic
    probs = [2 / n, 2 / n, 1 / n, 2 / n]  # latin, digit, space, ethiopic
    expected = round(-sum(p * math.log(p) for p in probs), 6)
    assert out[2] == pytest.approx(expected, abs=1e-6)


# ---------------------------------------------------------------- trained LID


def test_lang_id_trained_beats_heuristic_on_holdout(spark):
    """The trained char-trigram LID (r5) must be at least as accurate
    as the heuristic on held-out docs — including the Latin-diacritic
    confusable classes (fra ⊂ yor tone-vowels, igb dot-below) the
    heuristic was built around, and plain-ASCII English, which the
    heuristic can only ever call 'und' (zero diacritic markers)."""
    from karanta_ocr_spark.operators.lang_id_train import lang_id_trained

    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    scored = lang_id_trained(docs)
    hold = scored.filter("is_holdout").collect()
    assert hold, "split must produce holdout rows"
    trained_acc = sum(r["correct"] for r in hold) / len(hold)

    # Heuristic accuracy over the SAME synthesized holdout texts.
    from karanta_ocr_spark.operators.lang_id_train import synth_labeled_corpus

    heur = (
        synth_labeled_corpus(docs)
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            "lang_true",
            lang_id_heuristic(F.col("text")).alias("guess"),
        )
        .collect()
    )
    heur_acc = sum(r["guess"] == r["lang_true"] for r in heur) / len(heur)
    assert trained_acc >= heur_acc
    assert trained_acc == 1.0  # 4 well-separated trigram distributions
    # The heuristic CANNOT be perfect here: eng has no markers -> und.
    assert heur_acc < 1.0
    # Every class appears in the holdout and is predicted correctly.
    by_lang = {}
    for r in hold:
        by_lang.setdefault(r["lang_true"], []).append(r["correct"])
    assert set(by_lang) == {"eng", "fra", "yor", "igb"}
    assert all(all(v) for v in by_lang.values())


def test_lang_id_trained_partition_invariant(spark):
    """The fixed-point quantized trainer makes the fitted weights —
    and therefore every prediction — bit-identical under any input
    partitioning (the property the DuckDB oracle relies on)."""
    from karanta_ocr_spark.operators.lang_id_train import lang_id_trained

    base = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    a = sorted(
        (r["doc_id"], r["lang_pred"])
        for r in lang_id_trained(base.repartition(1)).collect()
    )
    b = sorted(
        (r["doc_id"], r["lang_pred"])
        for r in lang_id_trained(base.repartition(13)).collect()
    )
    assert a == b
