"""Boilerplate classification over the flattened block array
(jusText/trafilatura-style block scoring, per the north star and the
reference's extraction prompt rules in
``configs/prompts/open_ai_data_generation.yaml:22-43``: strip
headers/footers/navigation, keep the article body, keep footnotes and
cross-page sentence fragments, preserve diacritics).

Deterministic rule set (v1, documented so goldens are derivable):

1. A block inside a structural boilerplate container
   (``nav``/``header``/``footer``/``aside``/``form``) is **bad**.
2. A block with link density > ``MAX_LINK_DENSITY`` (0.30) is **bad**
   (navigation bars, related-links lists, tag clouds).
3. A non-heading block with fewer than ``MIN_GOOD_CHARS`` (25)
   characters is **short**: kept only when adjacent (previous or next
   classified block) is good — jusText's near-good propagation for
   captions/footnote fragments.
4. A heading (``h1``-``h6``) outside boilerplate containers with link
   density ≤ 0.30 is kept iff any good block follows it before the
   next heading (jusText's heading promotion).
5. Everything else with ≥ ``MIN_GOOD_CHARS`` chars and link density
   ≤ 0.30 is **good**.

The kept blocks, in document order, each whitespace-normalized
(:func:`~karanta_ocr_spark.kernel.textnorm.normalize_block_text`),
joined with ``"\\n"``, form the page's *natural text* — the HTML
analog of the reference's per-page ``natural_text``
(``karanta/pipeline.py:545``).
"""

from __future__ import annotations

from karanta_ocr_spark.kernel.html_flatten import Block, flatten_html
from karanta_ocr_spark.kernel.textnorm import normalize_block_text

MAX_LINK_DENSITY = 0.30
MIN_GOOD_CHARS = 25

_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


def score_blocks(blocks: list[Block]) -> list[Block]:
    """Label every block ``good`` / ``short`` / ``bad`` (rules above).

    Two passes: context-free labels first, then near-good propagation
    for ``short`` blocks and heading promotion. Mutates and returns
    *blocks* for chaining.
    """
    # Pass 1: context-free.
    for b in blocks:
        if b.in_boiler or b.link_density > MAX_LINK_DENSITY:
            b.label = "bad"
        elif b.tag in _HEADINGS:
            b.label = "heading"
        elif b.n_chars >= MIN_GOOD_CHARS:
            b.label = "good"
        else:
            b.label = "short"

    # Pass 2a: heading promotion — a heading is good iff a good block
    # follows before the next heading.
    for i, b in enumerate(blocks):
        if b.label != "heading":
            continue
        promoted = False
        for nxt in blocks[i + 1:]:
            if nxt.label == "heading":
                break
            if nxt.label == "good":
                promoted = True
                break
        b.label = "good" if promoted else "bad"

    # Pass 2b: near-good propagation for shorts (single pass over the
    # post-promotion labels; neighbors are the adjacent blocks in
    # document order). A short next to a good block is kept.
    labels = [b.label for b in blocks]
    for i, b in enumerate(blocks):
        if labels[i] != "short":
            continue
        prev_good = i > 0 and labels[i - 1] == "good"
        next_good = i + 1 < len(labels) and labels[i + 1] == "good"
        b.label = "good" if (prev_good or next_good) else "bad"

    return blocks


def extract_main_text(html: str) -> str:
    """HTML → main-content text: flatten → score → keep good blocks in
    document order → normalize each → join with ``"\\n"``."""
    blocks = score_blocks(flatten_html(html))
    kept = [normalize_block_text(b.text) for b in blocks if b.label == "good"]
    return "\n".join(t for t in kept if t)
