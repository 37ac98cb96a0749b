"""PII scrubbing and URL canonicalization over crafted fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.functions.pii import (
    EMAIL_TOKEN,
    IP_TOKEN,
    PHONE_TOKEN,
    canonicalize_url,
    scrub_pii,
)


def _scrub_one(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(scrub_pii(F.col("t")).alias("s")).first()["s"]


def _canon_one(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(canonicalize_url(F.col("u")).alias("c")).first()["c"]


def test_scrub_email_ip_phone(spark):
    out = _scrub_one(
        spark,
        "Mail a.b+c@sub.example.org, server 192.168.1.10, call +44 20 7946-0958 ok",
    )
    assert EMAIL_TOKEN in out and IP_TOKEN in out and PHONE_TOKEN in out
    assert "example.org" not in out
    assert "192.168" not in out
    assert "7946" not in out


def test_scrub_order_ip_before_phone(spark):
    # An IPv4 is also a phone-shaped digit run; the IP token must win.
    out = _scrub_one(spark, "host 10.20.30.40 end")
    assert out == f"host {IP_TOKEN} end"


def test_scrub_leaves_clean_text_alone(spark):
    s = "no personal data here, just words and the year 2021."
    assert _scrub_one(spark, s) == s


def test_scrub_spares_dates_isbns_and_spaced_numbers(spark):
    # The phone pattern must match phone SHAPES, not any 8+-digit run
    # (an earlier pattern masked all of these).
    s = ("Published 2021-08-16, revised 2022.01.02; "
         "ISBN 978-0-306-40615-7; population 1 000 000 people")
    assert _scrub_one(spark, s) == s


def test_scrub_rejects_invalid_ipv4_octets(spark):
    # Octets are range-checked: 300.400.500.600 is not an address.
    s = "weights 300.400.500.600 here"
    assert _scrub_one(spark, s) == s


def test_scrub_does_not_half_eat_long_dotted_runs(spark):
    # Boundary captures: '1.2.3.4567' must not become '|||IP|||7'.
    s = "version 1.2.3.4567 shipped"
    assert _scrub_one(spark, s) == s


def test_canonicalize_is_idempotent(spark):
    """canon(canon(u)) == canon(u) over a messy generated URL pool —
    a second pass must find nothing left to normalize."""
    urls = []
    for i in range(64):
        scheme = ["http", "HTTPS", "ftp"][i % 3]
        port = ["", ":80", ":443", ":8080"][i % 4]
        q = ["", "?utm_source=a", "?utm_a=1&b=2", "?x=1&utm_b=2&utm_c=3", "#f",
             "/?utm_z=9#f"][i % 6]
        urls.append(f"{scheme}://Host{i}.Example.COM{port}/P{i}{q}")
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c2"), "c")
    bad = twice.filter(F.col("c") != F.col("c2")).collect()
    assert not bad, bad[:5]


@pytest.mark.parametrize(
    "url,expected",
    [
        ("HTTPS://Example.COM:443/A/B/?utm_source=x#frag", "https://example.com/A/B"),
        ("http://example.com:80/", "http://example.com"),
        ("https://example.com/path/?utm_a=1&utm_b=2", "https://example.com/path"),
        ("https://example.com/p?real=1&utm_medium=z", "https://example.com/p?real=1"),
        ("https://example.com/p?utm_x=1&real=1", "https://example.com/p?real=1"),
        ("https://example.com/p#only-fragment", "https://example.com/p"),
        ("no-scheme/path/", "no-scheme/path"),
        # non-default ports are DIFFERENT origins — must survive:
        ("http://example.com:443/x", "http://example.com:443/x"),
        ("https://example.com:80/x", "https://example.com:80/x"),
    ],
)
def test_canonicalize_url(spark, url, expected):
    assert _canon_one(spark, url) == expected


def test_scrub_phone_left_boundary_guard(spark):
    # The NANP alternative must not match INSIDE a longer digit run:
    # '1234-567-8901' used to half-eat into '1|||PHONE|||'.
    s = "serial 1234-567-8901 intact"
    assert _scrub_one(spark, s) == s
    # ...but a real NANP number with a clean left edge still masks,
    # with the boundary character re-inserted.
    assert _scrub_one(spark, "call (555) 123-4567 now") == f"call {PHONE_TOKEN} now"
    assert _scrub_one(spark, "555-123-4567 leads") == f"{PHONE_TOKEN} leads"


def test_whitespace_class_matches_java_s_for_vertical_tab(spark):
    # Shared oracle-safe patterns use the explicit [ \t-\r] class, which
    # must treat U+000B exactly like Java's \s did (RE2's \s does not
    # include VT — the class is what keeps Spark and DuckDB agreeing).
    from karanta_ocr_spark.functions.text_analysis import token_count

    df = spark.createDataFrame([("a\x0bb c",)], "t string")
    assert df.select(token_count(F.col("t")).alias("n")).first()["n"] == 3


def test_phone_right_boundary_rejects_long_runs(spark):
    from karanta_ocr_spark.functions.pii import scrub_pii
    from pyspark.sql import functions as F

    rows = [
        (1, "ref 555-123-45678 is a serial"),       # 11 digits: no mask
        (2, "call 555-123-4567 now"),               # interior: masked
        (3, "ends with 555-123-4567"),              # string end: masked
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["s"] for r in
           df.select("doc_id", scrub_pii(F.col("text")).alias("s")).collect()}
    assert out[1] == "ref 555-123-45678 is a serial"
    assert out[2] == "call |||PHONE||| now"
    assert out[3] == "ends with |||PHONE|||"


def test_scrub_adjacent_phone_list_both_masked(spark):
    # Each phone match consumes its single-char boundary, so the
    # second number in '4567,555-...' lost its left guard in a single
    # pass; scrub_pii's second phone pass catches it (ADVICE r3).
    assert (
        _scrub_one(spark, "call 555-123-4567,555-987-6543 now")
        == f"call {PHONE_TOKEN},{PHONE_TOKEN} now"
    )
    # Three in a row: pass 1 takes #1 and #3, pass 2 takes #2.
    assert (
        _scrub_one(spark, "555-123-4567,555-987-6543,555-111-2222")
        == f"{PHONE_TOKEN},{PHONE_TOKEN},{PHONE_TOKEN}"
    )


def test_scrub_cards_luhn_gated(spark):
    from karanta_ocr_spark.functions.pii import (
        CARD_TOKEN, count_valid_cards, scrub_cards,
    )

    rows = [
        (1, "pay with 4111 1111 1111 1111 now"),   # Visa test number
        (2, "pay with 4111 1111 1111 1112 now"),   # fails Luhn -> kept
        (3, "card 5500-0000-0000-0004 works"),     # MC test number
        (4, "phone 555-123-4567 stays"),           # 10 digits: not card-shaped
        (5, "order 79927398713 ok"),               # Luhn-valid but 11 digits
        (6, "id 1234567890123 is not a card"),     # 13 digits, Luhn-invalid
        (7, "two: 4111 1111 1111 1111 and 5500-0000-0000-0004"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n"], r["s"])
        for r in df.select(
            "doc_id",
            count_valid_cards(F.col("text")).alias("n"),
            scrub_cards(F.col("text")).alias("s"),
        ).collect()
    }
    assert out[1] == (1, f"pay with {CARD_TOKEN} now")
    assert out[2] == (0, "pay with 4111 1111 1111 1112 now")
    assert out[3] == (1, f"card {CARD_TOKEN} works")
    assert out[4] == (0, "phone 555-123-4567 stays")
    assert out[5] == (0, "order 79927398713 ok")
    assert out[6] == (0, "id 1234567890123 is not a card")
    assert out[7] == (2, f"two: {CARD_TOKEN} and {CARD_TOKEN}")


def test_scrub_cards_before_phones_composition(spark):
    # The documented order: cards first, then scrub_pii — otherwise
    # the phone pattern eats the middle of a spaced card number.
    from karanta_ocr_spark.functions.pii import CARD_TOKEN, scrub_cards

    df = spark.createDataFrame(
        [(1, "card 4111 1111 1111 1111 tel 555-123-4567")],
        "doc_id long, text string",
    )
    out = df.select(
        scrub_pii(scrub_cards(F.col("text"))).alias("s")
    ).collect()[0]["s"]
    assert out == f"card {CARD_TOKEN} tel {PHONE_TOKEN}"


def test_url_shape_features(spark):
    from karanta_ocr_spark.functions.pii import url_shape_features

    rows = [
        (1, "https://EX.example.org/"),
        (2, "https://a.example/a/b/page9"),
        (3, "http://a.example/p?id=5&ref=x"),
        (4, "https://a.example"),  # no path at all
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", url_shape_features(F.col("url")).alias("f")
        ).select("doc_id", "f.*").collect()
    }
    assert out[1]["host"] == "ex.example.org" and out[1]["is_homepage"]
    assert out[1]["path_depth"] == 0 and out[1]["digit_frac"] == 0.0
    assert out[2]["path_depth"] == 3 and out[2]["path_len"] == 10
    assert out[2]["digit_frac"] == round(1 / 10, 6)
    assert out[3]["n_params"] == 2 and not out[3]["is_homepage"]
    assert out[4]["path_len"] == 0 and out[4]["digit_frac"] is None
    assert out[4]["is_homepage"]
