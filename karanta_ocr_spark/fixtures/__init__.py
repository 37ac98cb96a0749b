"""Deterministic synthetic fixtures (seed-fixed, no external data).

``pdf_gen``: minimal synthetic PDF bytes with text runs at known
coordinates and image XObjects (uncompressed or FlateDecode).
``gen``: the Common-Crawl-style ``web_pages`` corpus per
``FIXTURES.md §1`` — Zipf-skewed domains, HTML with labeled
boilerplate/main blocks in African-language scripts, mojibake spans,
a PDF tail with multi-page/multi-column/image-quirk cases, and a
size-skew tail.
"""

from karanta_ocr_spark.fixtures.pdf_gen import build_pdf, PageSpec, TextRun, ImageSpec
from karanta_ocr_spark.fixtures.gen import generate_web_pages, corpus_pandas

__all__ = [
    "build_pdf", "PageSpec", "TextRun", "ImageSpec",
    "generate_web_pages", "corpus_pandas",
]
