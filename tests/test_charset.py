"""Charset sniff/decode tests: BOM precedence, meta prescan (both
declaration shapes, quoted/bare), the WHATWG latin-1→windows-1252
mandate, transport fallback, self-refuting utf-16 meta, and the
end-to-end kernel path (windows-1252 page extracts its curly quotes
intact; goldens stay byte-identical because UTF-8 stays the
default)."""

from __future__ import annotations

from karanta_ocr_spark.kernel.charset import (
    decode_html,
    resolve_label,
    sniff_charset,
)
from karanta_ocr_spark.kernel.extract import extract_document


def test_bom_wins_over_meta():
    payload = "﻿<meta charset='iso-8859-1'><p>x</p>".encode("utf-8")
    # utf-8-sig consumes the BOM.
    assert sniff_charset(payload) == "utf-8-sig"
    assert decode_html(payload).startswith("<meta")


def test_utf16_boms():
    for enc, codec in (("utf-16-le", "utf-16-le"), ("utf-16-be", "utf-16-be")):
        payload = "﻿<p>héllo</p>".encode(enc)
        assert sniff_charset(payload) == codec
        assert "héllo" in decode_html(payload)


def test_meta_charset_shapes():
    a = b'<meta charset="windows-1251"><p>x</p>'
    b = (
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=koi8-r"><p>x</p>'
    )
    c = b"<meta charset=EUC-KR><p>x</p>"
    assert sniff_charset(a) == "windows-1251"
    assert sniff_charset(b) == "koi8-r"
    assert sniff_charset(c) == "euc-kr"


def test_latin1_is_windows_1252():
    # WHATWG mandate: 0x93/0x94 are curly quotes in cp1252, C1
    # controls in strict latin-1 — real pages mean the quotes.
    payload = b'<meta charset="iso-8859-1"><p>\x93quoted\x94 \x97 dash</p>'
    assert sniff_charset(payload) == "windows-1252"
    text = decode_html(payload)
    assert "“quoted”" in text and "—" in text


def test_transport_hint_and_default():
    plain = b"<p>no declaration</p>"
    assert sniff_charset(plain) == "utf-8"
    assert sniff_charset(plain, "ISO-8859-1") == "windows-1252"
    assert sniff_charset(plain, "nonsense-enc") == "utf-8"
    assert resolve_label("GB2312") == "gbk"


def test_self_refuting_utf16_meta():
    assert sniff_charset(b'<meta charset="utf-16"><p>x</p>') == "utf-8"


def test_transport_beats_stale_meta():
    # WHATWG precedence: the transport layer (HTTP Content-Type)
    # outranks the in-document prescan — a page served shift_jis
    # with a stale <meta charset=iso-8859-1> decodes as shift_jis,
    # matching browsers.
    payload = b'<meta charset="iso-8859-1"><p>\x93\xfa\x96\x7b</p>'
    assert sniff_charset(payload, "shift_jis") == "shift_jis"
    assert "日本" in decode_html(payload, "shift_jis")
    # ...but a BOM still beats the transport hint.
    assert sniff_charset(b"\xef\xbb\xbf<p>x</p>", "shift_jis") == "utf-8-sig"


def test_meta_outside_prescan_ignored():
    payload = b"<p>" + b"a" * 2100 + b'</p><meta charset="koi8-r">'
    assert sniff_charset(payload) == "utf-8"


def test_extraction_decodes_cp1252_page():
    html = (
        b"<html><head><meta charset=\"iso-8859-1\"><title>T</title></head>"
        b"<body><main><p>caf\xe9 \x93r\xe9sum\xe9\x94 with enough words "
        b"to clear the boilerplate filter easily</p></main></body></html>"
    )
    pages = extract_document("https://x.example/a", html)
    assert pages[0].ok
    assert "café" in pages[0].natural_text
    assert "“résumé”" in pages[0].natural_text


def test_utf8_pages_unchanged():
    html = (
        "<html><body><main><p>plain utf-8 café text with enough words "
        "to clear the filter</p></main></body></html>"
    ).encode("utf-8")
    pages = extract_document("https://x.example/b", html)
    assert pages[0].ok and "café" in pages[0].natural_text
