"""Page linearization: (a) the reference's anchor format, (b) the
deterministic natural-text layout analysis.

(a) :func:`linearize_page_report` reproduces
``_linearize_pdf_report`` (``karanta/prompts/anchor.py:231-342``)
byte-identically, with ONE documented deviation: the over-budget path
shuffles remaining elements with an **unseeded** ``random.shuffle``
in the reference (``anchor.py:325``) — nondeterminism that would make
"byte-identical per url" undefined. We seed the shuffle from a caller
-provided key (sha1 of the url), so the over-budget path is
deterministic per url. Quirks preserved: ``max_length < 20`` → header
only (``anchor.py:235-236``); merged images falsy (zero images, or
the n>100 ``None``) → ``""`` for the whole page (``anchor.py:238-241``);
``%.1f``/``%.0f`` float formatting (``anchor.py:233,246,258``);
under-budget sort by y desc (``:275``); edge-element selection
(``:281-308``); final over-budget sort by (x, y) (``:336``).

(b) :func:`page_natural_text` is the engine's deterministic
"pdfminer-style layout analysis" (north star): empty-run filter →
optional two-column split on the dominant x-gap → line clustering by
y → lines top-to-bottom (y desc), runs left-to-right (x asc) within a
line → NFC/mojibake-normalized text.
"""

from __future__ import annotations

import hashlib
import random

from karanta_ocr_spark.kernel.bbox_merge import merge_image_elements
from karanta_ocr_spark.kernel.pdf_mini import ImageElement, PageReport, TextElement
from karanta_ocr_spark.kernel.textnorm import clean_element_text, fix_text


def seed_from_key(key: str) -> int:
    """Stable shuffle seed from a document key (url)."""
    return int.from_bytes(hashlib.sha1(key.encode("utf-8")).digest()[:8], "big")


def linearize_page_report(
    report: PageReport, max_length: int = 4000, shuffle_seed: int = 0
) -> str:
    result = ""
    result += f"Page dimensions: {report.mediabox.x1:.1f}x{report.mediabox.y1:.1f}\n"

    if max_length < 20:
        return result

    images = merge_image_elements(report.image_elements)

    if not images:
        # Reference anchor.py:238-241 — no images (or >100 images) ⇒
        # the entire page linearizes to "".
        return ""

    image_strings = []
    for element in images:
        image_str = (
            f"[Image {element.bbox.x0:.0f}x{element.bbox.y0:.0f} "
            f"to {element.bbox.x1:.0f}x{element.bbox.y1:.0f}]\n"
        )
        image_strings.append((element, image_str))

    text_strings = []
    for element in report.text_elements:
        if len(element.text.strip()) == 0:
            continue
        element_text = clean_element_text(element.text)
        text_str = f"[{element.x:.0f}x{element.y:.0f}]{element_text}\n"
        text_strings.append((element, text_str))

    all_elements: list[tuple[str, object, str, tuple[float, float]]] = []
    for elem, s in image_strings:
        all_elements.append(("image", elem, s, (elem.bbox.x0, elem.bbox.y0)))
    for elem, s in text_strings:
        all_elements.append(("text", elem, s, (elem.x, elem.y)))

    total_length = len(result) + sum(len(s) for _, _, s, _ in all_elements)

    if total_length <= max_length:
        all_elements.sort(key=lambda x: (x[3][1]), reverse=True)
        for _, _, s, _ in all_elements:
            result += s
        return result

    # Over budget: keep edge elements, fill with (seeded) shuffle,
    # final sort by (x, y) — reference anchor.py:281-342.
    edge_elements: set = set()

    if images:
        edge_elements.update(
            [
                min(images, key=lambda e: e.bbox.x0),
                max(images, key=lambda e: e.bbox.x1),
                min(images, key=lambda e: e.bbox.y0),
                max(images, key=lambda e: e.bbox.y1),
            ]
        )

    if report.text_elements:
        text_elements = [e for e in report.text_elements if len(e.text.strip()) > 0]
        if text_elements:
            edge_elements.update(
                [
                    min(text_elements, key=lambda e: e.x),
                    max(text_elements, key=lambda e: e.x),
                    min(text_elements, key=lambda e: e.y),
                    max(text_elements, key=lambda e: e.y),
                ]
            )

    selected_element_ids: set[int] = set()
    selected_elements = []
    for elem_type, elem, s, position in all_elements:
        if elem in edge_elements and id(elem) not in selected_element_ids:
            selected_elements.append((elem_type, elem, s, position))
            selected_element_ids.add(id(elem))

    current_length = len(result) + sum(len(s) for _, _, s, _ in selected_elements)

    remaining_elements = [
        (elem_type, elem, s, position)
        for elem_type, elem, s, position in all_elements
        if id(elem) not in selected_element_ids
    ]

    # Documented deviation: seeded (reference uses bare random.shuffle,
    # anchor.py:325).
    random.Random(shuffle_seed).shuffle(remaining_elements)

    for elem_type, elem, s, position in remaining_elements:
        if current_length + len(s) > max_length:
            break
        selected_elements.append((elem_type, elem, s, position))
        selected_element_ids.add(id(elem))
        current_length += len(s)

    selected_elements.sort(key=lambda x: (x[3][0], x[3][1]))

    for _, _, s, _ in selected_elements:
        result += s

    return result


# ---------------------------------------------------------------- layout
_LINE_TOL = 2.0  # same-line y tolerance (pt)
_COL_GAP_FRAC = 0.20  # min x-gap (fraction of page width) to split columns
_MIN_COL_ELEMENTS = 2


def _cluster_lines(elements: list[TextElement]) -> list[list[TextElement]]:
    """Group runs into lines by y proximity; lines ordered y desc
    (top of page first), runs within a line ordered x asc."""
    if not elements:
        return []
    ordered = sorted(elements, key=lambda e: (-e.y, e.x))
    lines: list[list[TextElement]] = [[ordered[0]]]
    for e in ordered[1:]:
        if abs(lines[-1][0].y - e.y) <= _LINE_TOL:
            lines[-1].append(e)
        else:
            lines.append([e])
    for line in lines:
        line.sort(key=lambda e: (e.x, -e.y))
    return lines


def _split_columns(
    elements: list[TextElement], page_width: float
) -> list[list[TextElement]]:
    """Detect a two-column layout by the dominant gap in x positions.

    Deterministic: split at the largest inter-element x gap when it
    exceeds ``_COL_GAP_FRAC`` of the page width and both sides have at
    least ``_MIN_COL_ELEMENTS`` runs."""
    if len(elements) < 2 * _MIN_COL_ELEMENTS or page_width <= 0:
        return [elements]
    xs = sorted({e.x for e in elements})
    if len(xs) < 2:
        return [elements]
    best_gap, best_split = 0.0, None
    for a, b in zip(xs, xs[1:]):
        gap = b - a
        if gap > best_gap:
            best_gap, best_split = gap, (a + b) / 2.0
    if best_split is None or best_gap < _COL_GAP_FRAC * page_width:
        return [elements]
    left = [e for e in elements if e.x <= best_split]
    right = [e for e in elements if e.x > best_split]
    if len(left) < _MIN_COL_ELEMENTS or len(right) < _MIN_COL_ELEMENTS:
        return [elements]
    return [left, right]


def page_natural_text(report: PageReport) -> str:
    """Deterministic reading-order text for one PDF page.

    Column-aware (left column read fully before right), lines top-to-
    bottom, runs left-to-right joined with a single space, lines
    joined with newlines, columns joined with newlines; normalized
    with :func:`fix_text` (NFC)."""
    elements = [e for e in report.text_elements if e.text.strip()]
    if not elements:
        return ""
    width = report.mediabox.x1 - report.mediabox.x0
    out_lines: list[str] = []
    for col in _split_columns(elements, width):
        for line in _cluster_lines(col):
            text = " ".join(e.text.strip() for e in line if e.text.strip())
            if text:
                out_lines.append(text)
    return fix_text("\n".join(out_lines))
