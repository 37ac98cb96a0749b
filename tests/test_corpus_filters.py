"""Gopher/C4-style corpus filter tests over crafted fixtures: exact
expected values for duplicate-line fractions, top-bigram mode with a
lexicographic tie-break, and the C4 line-shape signals."""

from __future__ import annotations

import pytest

from karanta_ocr_spark.operators.corpus_filters import (
    c4_quality_signals,
    gopher_repetition_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 3 lines, one duplicated; 'a b' bigram appears twice.
        (1, "a b c\nx y\na b c"),
        # single line, all-distinct bigrams ('p q' wins the ties
        # lexicographically among count-1 bigrams: 'p q', 'q r', 'r s').
        (2, "p q r s."),
        # one token: no bigram.
        (3, "solo"),
        # blank-ish doc: whitespace only.
        (4, "   \n  \n "),
        # C4 drop rules.
        (5, "This page has Lorem Ipsum filler text and more words."),
        (6, "function() { return 1; } extra words here now"),
        (7, "A clean sentence with enough words to keep.\nAnother line!"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_duplicate_lines_and_top_bigram(spark, docs):
    out = {r["doc_id"]: r for r in gopher_repetition_stats(docs).collect()}

    r1 = out[1]
    assert r1["n_lines"] == 3
    assert r1["dup_line_frac"] == pytest.approx(1 / 3)
    # chars: 5 + 3 + 5 = 13, distinct 5 + 3 = 8 → 5/13
    assert r1["dup_line_char_frac"] == pytest.approx(5 / 13, abs=1e-6)
    # bigrams: 'a b' ×2, 'b c' ×2 ('b c' from each copy), 'c x', 'x y', 'y a'
    # → max count 2, tie between 'a b' and 'b c' → lexicographic min 'a b'
    assert r1["top_bigram"] == "a b"
    # text chars = 15 ('a b c\nx y\na b c'); 2 × len('a b')=3 → 6/15
    assert r1["top_bigram_frac"] == pytest.approx(6 / 15, abs=1e-6)

    r2 = out[2]
    assert r2["n_lines"] == 1
    assert r2["dup_line_frac"] == 0.0
    assert r2["top_bigram"] == "p q"

    r3 = out[3]
    assert r3["top_bigram"] is None and r3["top_bigram_frac"] is None

    r4 = out[4]
    assert r4["n_lines"] == 0
    assert r4["dup_line_frac"] == 0.0 and r4["dup_line_char_frac"] == 0.0


def test_gopher_partition_invariance(spark, docs):
    one = gopher_repetition_stats(docs.coalesce(1)).collect()
    many = gopher_repetition_stats(docs.repartition(7)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_paragraph_dedup_first_occurrence_wins(spark):
    from karanta_ocr_spark.operators.corpus_filters import dedup_paragraphs

    rows = [
        (1, "HEADER\nbody one\nFOOTER"),
        (2, "HEADER\nbody two\nFOOTER"),
        (3, "HEADER\nbody one\nFOOTER"),  # body duplicates doc 1's
        (4, "   \n \n"),                   # nothing survives trimming
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}

    assert out[1]["text"] == "HEADER\nbody one\nFOOTER"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (3, 0)
    # doc 2 loses the shared header/footer, keeps its unique body
    assert out[2]["text"] == "body two"
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 2)
    # doc 3 loses everything (header, footer, AND the repeated body)
    assert out[3]["text"] == ""
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (0, 3)
    # whitespace-only doc: zero lines either way
    assert (out[4]["n_kept"], out[4]["n_dropped"]) == (0, 0)


def test_paragraph_dedup_partition_invariance(spark):
    from karanta_ocr_spark.operators.corpus_filters import dedup_paragraphs

    rows = [(i, f"SAME\nuniq {i}\nSAME TAIL") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    one = dedup_paragraphs(df.coalesce(1)).collect()
    many = dedup_paragraphs(df.repartition(13)).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
    kept_total = sum(r["n_kept"] for r in one)
    # 40 unique bodies + one SAME + one SAME TAIL
    assert kept_total == 42


def test_c4_quality_signals(spark, docs):
    out = {r["doc_id"]: r for r in c4_quality_signals(docs).collect()}

    assert out[5]["has_lorem_ipsum"] is True and out[5]["c4_keep"] is False
    assert out[6]["has_curly_brace"] is True and out[6]["c4_keep"] is False

    r7 = out[7]
    assert r7["n_lines"] == 2
    assert r7["terminal_punct_line_frac"] == pytest.approx(1.0)
    assert r7["word_count"] == 10
    assert r7["mean_words_per_line"] == pytest.approx(5.0)
    assert r7["c4_keep"] is True

    # whitespace-only doc: no lines → not kept, fractions are 0/None.
    r4 = out[4]
    assert r4["n_lines"] == 0 and r4["c4_keep"] is False
    assert r4["terminal_punct_line_frac"] == 0.0
    assert r4["mean_words_per_line"] is None


def test_blocklist_filter(spark):
    from karanta_ocr_spark.operators.corpus_filters import blocklist_filter

    rows = [
        (1, "https://spam.bad-ads.example/p/1", "clean words here"),
        (2, "https://bad-ads.example/root", "clean words here"),
        (3, "https://docs.example.org/doc/3", "visit the casino tonight"),
        (4, "https://docs.example.org/doc/4", "all good content"),
        (5, "https://notbad-ads.example.org/x", "fine"),  # not a subdomain match
        (6, "https://sub.deep.tracker.example/y", "fine"),
    ]
    out = {
        r["doc_id"]: r
        for r in blocklist_filter(
            spark.createDataFrame(rows, "doc_id long, url string, text string"),
            blocked_domains=["bad-ads.example", "tracker.example"],
            blocked_words=["casino"],
        ).collect()
    }
    assert out[1]["blocked_domain"] and not out[1]["keep"]  # subdomain
    assert out[2]["blocked_domain"]  # exact domain
    assert not out[3]["blocked_domain"] and out[3]["n_blocked_words"] == 1
    assert not out[3]["keep"]  # any-hit-drops default
    assert out[4]["keep"] and out[4]["n_blocked_words"] == 0
    assert not out[5]["blocked_domain"] and out[5]["keep"]
    assert out[6]["blocked_domain"]  # deep subdomain
    assert out[3]["blocked_word_frac"] == 0.25


def test_blocklist_filter_word_frac_threshold(spark):
    from karanta_ocr_spark.operators.corpus_filters import blocklist_filter

    df = spark.createDataFrame(
        [(1, "https://a.example/x", "casino " + "word " * 99)],
        "doc_id long, url string, text string",
    )
    strict = blocklist_filter(df, [], ["casino"]).collect()[0]
    lax = blocklist_filter(df, [], ["casino"], max_word_frac=0.05).collect()[0]
    assert not strict["keep"] and lax["keep"]


def test_meta_robots_flags(spark):
    from karanta_ocr_spark.operators.corpus_filters import meta_robots_flags

    rows = [
        (1, b'<html><head><meta name="robots" content="noindex, nofollow"></head></html>'),
        (2, b"<html><head><meta content='noindex' name=robots></head></html>"),
        (3, b'<html><head><meta name="ROBOTS" content="INDEX, FOLLOW"></head></html>'),
        (4, b"<html><head><meta charset='utf-8'></head><body>noindex as text</body></html>"),
        (5, b'<html><meta name="description" content="noindex is a word"></html>'),
        # Legal unquoted content value (ADVICE r3: quoted-only regex
        # reported this opted-out page as indexable):
        (6, b"<html><head><meta name=robots content=noindex></head></html>"),
        (7, b"<html><head><meta name=robots content=noindex,nofollow></head></html>"),
    ]
    out = {
        r["doc_id"]: r
        for r in meta_robots_flags(
            spark.createDataFrame(rows, "doc_id long, html binary")
        ).collect()
    }
    assert out[1]["noindex"] and out[1]["nofollow"] and not out[1]["indexable"]
    assert out[2]["noindex"] and not out[2]["nofollow"]
    assert not out[3]["noindex"] and out[3]["indexable"]
    assert not out[4]["noindex"]  # body text is not a meta tag
    assert not out[5]["noindex"]  # description meta, not robots
    assert out[6]["noindex"] and not out[6]["indexable"]  # unquoted value
    assert out[7]["noindex"] and out[7]["nofollow"]


def test_gopher_shape_rules(spark):
    from karanta_ocr_spark.operators.corpus_filters import (
        gopher_quality_signals,
    )

    good = (
        "The quick brown fox jumps over the lazy dog and keeps running "
        "with great joy because that is what foxes have to do all day "
    ) * 3  # ~60 words, stopword-rich, clean lines
    rows = [
        (1, good),
        (2, "- one\n- two\n- three"),                       # all bullets
        (3, "first part...\nsecond part...\nthird part..."),  # all ellipsis
        (4, good + " " + "# " * 20),                        # symbol spray
        (5, "too few words"),                               # count fail
        (6, " ".join(["12345"] * 80)),                      # no letters, no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_quality_signals(df).collect()}
    assert out[1]["gopher_keep"]
    assert out[1]["n_stopwords_present"] >= 2
    assert out[2]["frac_bullet_lines"] == 1.0 and not out[2]["gopher_keep"]
    assert out[3]["frac_ellipsis_lines"] == 1.0 and not out[3]["gopher_keep"]
    assert out[4]["symbol_word_ratio"] > 0.1 and not out[4]["gopher_keep"]
    assert out[5]["n_words"] == 3 and not out[5]["gopher_keep"]
    assert out[6]["frac_alpha_words"] == 0.0 and not out[6]["gopher_keep"]
