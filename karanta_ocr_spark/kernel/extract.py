"""Per-document extraction: content-type dispatch → per-page natural
text. This is the function the Spark ``mapInPandas`` stage calls per
document inside an Arrow batch.

Mirrors the reference's per-document flow (``karanta/pipeline.py:
455-521``): sniff bytes → fan out to pages → per-page extraction →
page results, with per-page failure isolation (a failed page becomes
a fallback/None row, never an exception — ``pipeline.py:522-532``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from karanta_ocr_spark.kernel.boilerplate import extract_main_text
from karanta_ocr_spark.kernel.linearize import (
    linearize_page_report,
    page_natural_text,
    seed_from_key,
)
from karanta_ocr_spark.kernel.pdf_mini import PdfEncryptedError, parse_pdf

PDF_MAGIC = b"%PDF"

#: reference default anchor budget (karanta/prompts/anchor.py:349,
#: karanta/pipeline.py:1171-1181)
ANCHOR_BUDGET = 4000


def sniff_content_type(payload: bytes) -> str:
    """Reference PDF-magic predicate (``karanta/pipeline.py:1279``):
    first 4 bytes ``%PDF`` → pdf, else html."""
    return "pdf" if payload[:4] == PDF_MAGIC else "html"


@dataclass(frozen=True)
class PageExtract:
    page_num: int  # 1-indexed, like the reference (pipeline.py:498)
    natural_text: Optional[str]
    anchor_text: str
    ok: bool
    error: Optional[str] = None


def extract_document(
    url: str, payload: bytes, anchor_budget: int = ANCHOR_BUDGET
) -> list[PageExtract]:
    """Extract one document (HTML or PDF bytes) into per-page results.

    HTML ⇒ exactly one page: boilerplate-stripped main text.
    PDF  ⇒ one page per PDF page: layout-analyzed natural text, plus
    the reference anchor linearization (kept for parity/debugging).
    Any failure yields a single not-ok page row — never raises.
    """
    try:
        kind = sniff_content_type(payload)
        if kind == "html":
            from karanta_ocr_spark.kernel.charset import decode_html

            text = extract_main_text(decode_html(payload))
            return [PageExtract(1, text if text else None, "", True)]

        seed = seed_from_key(url)
        reports = parse_pdf(payload)
        if not reports:
            return [PageExtract(1, None, "", False, "pdf: no pages")]
        pages: list[PageExtract] = []
        for i, report in enumerate(reports, start=1):
            try:
                natural = page_natural_text(report)
                anchor = linearize_page_report(
                    report, max_length=anchor_budget, shuffle_seed=seed + i
                )
                pages.append(PageExtract(i, natural if natural else None, anchor, True))
            except Exception as exc:  # per-page isolation
                pages.append(PageExtract(i, None, "", False, f"page: {exc!r}"))
        return pages
    except PdfEncryptedError:
        # Typed classification, not a parse failure: the content is
        # ciphertext by declaration, so retrying or quarantining as a
        # parser bug would mislead — the row carries the precise cause.
        return [PageExtract(1, None, "", False, "pdf: encrypted")]
    except Exception as exc:  # per-document isolation
        return [PageExtract(1, None, "", False, f"doc: {exc!r}")]
