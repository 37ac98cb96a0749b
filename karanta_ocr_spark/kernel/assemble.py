"""Document assembly: page texts → document text + char spans + id.

Byte-exact reimplementation of ``build_dolma_document``
(``karanta/pipeline.py:538-591``) plus the error-rate gate from
``process_pdf`` (``pipeline.py:507-515``):

* pages ordered by page_num (the reference relies on asyncio task
  creation order, ``pipeline.py:497-505``; we sort explicitly — the
  only safe equivalent under a shuffle);
* ``content_i = text_i + "\\n"`` for every page except the last
  (``pipeline.py:546-548``); ``None`` text ⇒ empty content but a span
  is still emitted (``:549-550``);
* span ``[start, end, page_num]`` measured on the running
  concatenation (``:552-555``);
* empty final text ⇒ document dropped (``:557-559``);
* ``fallback_pages / num_pages > max_page_error_rate`` (default
  0.004, ``pipeline.py:1146-1151``) ⇒ document dropped (``:511-515``);
* ``doc_id = sha1(utf-8 text)`` (``:571``).

The Spark pipeline computes the very same arithmetic JVM-side with
higher-order functions; this kernel version is the golden oracle the
Spark output is compared against byte-for-byte.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Optional

from karanta_ocr_spark.kernel.extract import PageExtract

#: reference default --max_page_error_rate (karanta/pipeline.py:1146-1151)
MAX_PAGE_ERROR_RATE = 0.004


@dataclass(frozen=True)
class AssembledDoc:
    url: str
    doc_id: str
    text: str
    spans: list[tuple[int, int, int]]  # (start, end, page_num)
    n_pages: int
    n_failed: int


def assemble_document(
    url: str,
    pages: list[PageExtract],
    max_page_error_rate: float = MAX_PAGE_ERROR_RATE,
) -> Optional[AssembledDoc]:
    if not pages:
        return None
    pages = sorted(pages, key=lambda p: p.page_num)
    num_pages = len(pages)
    num_failed = sum(1 for p in pages if not p.ok)

    # Error-rate gate (pipeline.py:507-515): strictly-greater drops.
    if num_failed / num_pages > max_page_error_rate:
        return None

    document_text = ""
    spans: list[tuple[int, int, int]] = []
    current_char_pos = 0
    for index, page in enumerate(pages):
        if page.natural_text is not None:
            content = page.natural_text + ("\n" if index < len(pages) - 1 else "")
        else:
            content = ""
        start_pos = current_char_pos
        document_text += content
        current_char_pos = len(document_text)
        spans.append((start_pos, current_char_pos, page.page_num))

    if not document_text:
        return None  # pipeline.py:557-559

    doc_id = hashlib.sha1(document_text.encode()).hexdigest()
    return AssembledDoc(url, doc_id, document_text, spans, num_pages, num_failed)
