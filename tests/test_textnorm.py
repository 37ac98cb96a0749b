"""Unit tests for textnorm — cap-split boundaries, escape map,
mojibake repair, NFC (reference: karanta/prompts/anchor.py:201-228)."""

import unicodedata

from karanta_ocr_spark.kernel.textnorm import (
    cap_split_string,
    clean_element_text,
    fix_text,
    normalize_block_text,
)


def test_cap_split_short_passthrough():
    assert cap_split_string("hello world", 250) == "hello world"
    assert cap_split_string("x" * 250, 250) == "x" * 250


def test_cap_split_exact_reference_arithmetic():
    # max_length=250 → head_length = tail_length = 122
    text = ("word " * 100).strip()  # 499 chars
    out = cap_split_string(text, 250)
    head = text[:122].rsplit(" ", 1)[0]
    tail = text[-122:].split(" ", 1)[-1]
    assert out == f"{head} ... {tail}"


def test_cap_split_no_space_fallback():
    text = "a" * 300
    out = cap_split_string(text, 250)
    assert out == "a" * 122 + " ... " + "a" * 122


def test_escape_map():
    assert clean_element_text("a[b]c") == "a\\[b\\]c"
    assert clean_element_text("a\nb\tc\rd") == "a\\nb\\tc\\rd"


def test_clean_strips_and_caps():
    assert clean_element_text("  hi  ") == "hi"
    assert len(clean_element_text("z" * 1000)) == 122 + 5 + 122


def test_mojibake_latin1_round_trip_repaired():
    orig = "ọjọ́ dáadáa àárọ̀"
    mangled = orig.encode("utf-8").decode("latin-1")
    assert fix_text(mangled) == unicodedata.normalize("NFC", orig)


def test_mojibake_double_encoding_repaired():
    orig = "élan café"
    mangled = orig.encode("utf-8").decode("latin-1").encode("utf-8").decode("latin-1")
    assert fix_text(mangled) == unicodedata.normalize("NFC", orig)


def test_clean_text_left_alone():
    for s in ["hello", "ሰላም ዜና", "ߒߞߏ ߞߊ߲", "ꕉꕜꕮ ꔔꘋ", "naïve café"]:
        assert fix_text(s) == unicodedata.normalize("NFC", s)


def test_nfc_normalization():
    nfd = unicodedata.normalize("NFD", "dáadáa ọjọ́")
    assert fix_text(nfd) == unicodedata.normalize("NFC", "dáadáa ọjọ́")
    assert fix_text(nfd) != nfd  # NFD input actually changed


def test_normalize_block_text_ws():
    assert normalize_block_text("a  b\t c") == "a b c"
    assert normalize_block_text("a\n\n\n\nb") == "a\n\nb"
    # NBSP is not ASCII whitespace: it must survive collapsing (it may
    # be a byte of a mojibake sequence). Without a mojibake lead char
    # before it, no repair fires and it passes through untouched.
    assert normalize_block_text("x\xa0y") == "x\xa0y"
    # With the lead char it IS mojibake ('Ã\xa0' = utf-8 'à' seen as
    # latin-1) and gets repaired.
    assert normalize_block_text("Ã\xa0 plain") == "à plain"
