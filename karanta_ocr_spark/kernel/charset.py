"""Charset sniffing + decoding for crawled HTML — the WHATWG
"determine the character encoding" algorithm's offline core.

A Common-Crawl-style corpus is NOT all UTF-8: a long tail of pages is
windows-1252 (often mislabeled iso-8859-1), UTF-16 with a BOM, or
legacy regional encodings. Decoding those as UTF-8-with-replacement
silently destroys exactly the diacritic-heavy text this pipeline
cares about (Latin-with-diacritics African languages, French/Spanish
colonial-era pages), so the kernel sniffs before decoding:

1. **BOM wins** (UTF-8 / UTF-16LE / UTF-16BE) — per WHATWG, a BOM
   overrides everything else;
2. else a ``<meta charset=…>`` or
   ``<meta http-equiv=Content-Type content="…charset=…">`` declared
   in the first 2048 bytes (scanned on raw bytes — ASCII-compatible
   encodings make the declaration readable before decoding; a
   BOM-less UTF-16 page can't be sniffed this way, documented);
3. else an optional transport-layer hint (HTTP Content-Type);
4. else UTF-8.

Labels map through the WHATWG encoding registry's aliasing, most
importantly iso-8859-1 / ascii / us-ascii → windows-1252 (the spec
mandates it: bytes 0x80-0x9F are curly quotes and dashes on real
pages, never C1 controls). Unknown labels fall back to UTF-8. All
decoding uses errors="replace" — extraction never raises on bytes.

Reference parity: the reference's HTML path inherits charset
handling from its HTTP/parsing libraries; this module reimplements
the sniff from the public WHATWG algorithm (steps: BOM, meta
prescan, transport) rather than porting any library.
"""

from __future__ import annotations

import codecs
import re

#: BOM → codec, longest first (UTF-8 BOM is 3 bytes; UTF-16 are 2).
_BOMS = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

#: <meta charset=X> and <meta http-equiv=... content="...;charset=X">
#: — both shapes, quoted or bare, scanned case-insensitively on raw
#: bytes within the prescan window.
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]+charset[ \t]*=[ \t]*[\"']?([A-Za-z0-9_.:-]+)", re.I
)

#: WHATWG label → Python codec for the labels that matter in crawl
#: data. iso-8859-1/ascii deliberately map to windows-1252 (spec
#: mandate — the C1 range carries punctuation on real pages).
_LABEL_TO_CODEC = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "windows-1252",
    "latin1": "windows-1252",
    "latin-1": "windows-1252",
    "ascii": "windows-1252",
    "us-ascii": "windows-1252",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "x-cp1252": "windows-1252",
    "iso-8859-15": "iso-8859-15",
    "iso-8859-2": "iso-8859-2",
    "windows-1250": "windows-1250",
    "windows-1251": "windows-1251",
    "koi8-r": "koi8-r",
    "iso-8859-5": "iso-8859-5",
    "iso-8859-6": "iso-8859-6",
    "windows-1256": "windows-1256",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "euc-jp": "euc-jp",
    "euc-kr": "euc-kr",
    "gbk": "gbk",
    "gb2312": "gbk",  # WHATWG: gb2312 decodes as GBK
    "gb18030": "gb18030",
    "big5": "big5",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "windows-874": "cp874",
    "tis-620": "cp874",
    "iso-8859-9": "windows-1254",  # WHATWG maps latin-5 to 1254
    "windows-1254": "windows-1254",
}

_PRESCAN = 2048


def resolve_label(label: str | None) -> str | None:
    """WHATWG-style charset label → Python codec name (None if the
    label is unknown/empty)."""
    if not label:
        return None
    return _LABEL_TO_CODEC.get(label.strip().strip("\"'").lower())


def sniff_charset(
    payload: bytes, transport_charset: str | None = None
) -> str:
    """The codec to decode *payload* with: BOM > transport hint >
    meta prescan > utf-8 — the WHATWG "determine the encoding"
    precedence: a certain BOM wins outright, then the transport
    layer (HTTP Content-Type charset) overrides any in-document —
    possibly stale — ``<meta>`` declaration, matching what browsers
    do for a page served ``charset=shift_jis`` that still carries an
    old ``<meta charset=iso-8859-1>``."""
    for bom, codec in _BOMS:
        if payload.startswith(bom):
            return codec
    codec = resolve_label(transport_charset)
    if codec:
        return codec
    m = _META_CHARSET_RE.search(payload[:_PRESCAN])
    if m:
        codec = resolve_label(m.group(1).decode("ascii", "replace"))
        if codec:
            # A meta claiming utf-16 on ASCII-readable bytes is
            # self-refuting (we just read it single-byte); WHATWG
            # says treat it as utf-8.
            if codec.startswith("utf-16"):
                return "utf-8"
            return codec
    return "utf-8"


def decode_html(
    payload: bytes, transport_charset: str | None = None
) -> str:
    """Charset-sniffed decode, never raises (errors='replace')."""
    codec = sniff_charset(payload, transport_charset)
    return payload.decode(codec, "replace")
