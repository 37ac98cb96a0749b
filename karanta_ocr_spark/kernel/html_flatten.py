"""HTML → flattened block-node array (the DOM analog of the
reference's flattened PDF ``PageReport``).

The reference flattens a PDF content stream into a coordinate-tagged
element array (``karanta/prompts/anchor.py:69-128``); for
Common-Crawl-style HTML input the analogous structure is a flat array
of *block nodes* — one per block-level element — each carrying the
signals that boilerplate classification needs (jusText/trafilatura
style): text length, link-character density, tag, DOM depth, and
whether the block sits inside a structural boilerplate container
(``nav``/``header``/``footer``/``aside``).

Pure stdlib (``html.parser``), single pass, deterministic.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

# HTML whitespace is ASCII-only (space, tab, LF, FF, CR). Using
# str.split() here would be wrong: it also eats U+00A0/U+0085, which
# appear as bytes *inside* mojibake sequences that textnorm.fix_text
# must still be able to repair downstream.
_ASCII_WS = re.compile(r"[ \t\r\n\f\v]+")


def _collapse_ws(s: str) -> str:
    return _ASCII_WS.sub(" ", s).strip()


# Tags whose entire subtree is dropped (no visible text).
_SKIP_SUBTREE = {
    "script", "style", "noscript", "template", "svg", "head",
    "iframe", "object", "embed", "canvas", "title",
}

# Tags that open a new block node.
_BLOCK_TAGS = {
    "p", "div", "article", "section", "main", "blockquote", "pre",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "dt", "dd", "td", "th",
    "figcaption", "caption", "summary", "nav", "header", "footer",
    "aside", "ul", "ol", "table", "tr", "form", "fieldset", "body",
}

# Structural containers that mark all enclosed blocks as boilerplate
# candidates (the prompt rules at
# configs/prompts/open_ai_data_generation.yaml:22-43 — strip headers,
# footers, navigation — become these container flags).
_BOILER_CONTAINERS = {"nav", "header", "footer", "aside", "form"}

# Void elements that never get a closing tag.
_VOID = {
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
}


@dataclass
class Block:
    """One flattened block node."""

    seq: int
    tag: str
    depth: int
    text: str = ""
    n_chars: int = 0
    link_chars: int = 0
    n_links: int = 0
    in_boiler: bool = False
    #: classification filled by boilerplate.score_blocks
    label: str = ""

    @property
    def link_density(self) -> float:
        return (self.link_chars / self.n_chars) if self.n_chars else 0.0


class _Flattener(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._stack: list[str] = []
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._cur: Block | None = None
        self._seq = 0
        self._parts: list[str] = []
        self._link_len = 0
        self._n_links = 0

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if self._cur is None:
            return
        raw = "".join(self._parts)
        text = _collapse_ws(raw)
        if text:
            b = self._cur
            b.text = text
            b.n_chars = len(text)
            b.link_chars = min(self._link_len, b.n_chars)
            b.n_links = self._n_links
            self.blocks.append(b)
        self._cur = None
        self._parts = []
        self._link_len = 0
        self._n_links = 0

    def _open_block(self, tag: str) -> None:
        self._flush()
        self._cur = Block(
            seq=self._seq,
            tag=tag,
            depth=len(self._stack),
            in_boiler=self._boiler_depth > 0,
        )
        self._seq += 1

    # -- parser callbacks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        tag = tag.lower()
        if tag in _VOID:
            if tag == "br" and self._cur is not None:
                self._parts.append(" ")
            return
        if self._skip_depth or tag in _SKIP_SUBTREE:
            self._skip_depth += 1
            self._stack.append(tag)
            return
        self._stack.append(tag)
        if tag in _BOILER_CONTAINERS:
            self._boiler_depth += 1
        if tag in _BLOCK_TAGS:
            self._open_block(tag)
        elif tag == "a":
            self._link_depth += 1
            self._n_links += 1

    def handle_endtag(self, tag: str) -> None:
        tag = tag.lower()
        if tag in _VOID:
            return
        # Unwind the stack to the matching open tag (tolerates
        # unclosed intermediates, common in web HTML).
        if tag not in self._stack:
            return
        while self._stack:
            top = self._stack.pop()
            if self._skip_depth:
                self._skip_depth -= 1
            else:
                if top in _BOILER_CONTAINERS:
                    self._boiler_depth -= 1
                if top in _BLOCK_TAGS:
                    self._flush()
                elif top == "a" and self._link_depth:
                    self._link_depth -= 1
            if top == tag:
                break

    def handle_data(self, data: str) -> None:
        if self._skip_depth or not data:
            return
        if self._cur is None:
            # Text outside any block tag (e.g. bare body text): open an
            # implicit block so no visible text is lost.
            self._open_block("_text")
        self._parts.append(data)
        if self._link_depth:
            self._link_len += len(_collapse_ws(data))

    def close(self) -> None:  # noqa: D102
        super().close()
        self._flush()


def flatten_html(html: str) -> list[Block]:
    """Flatten an HTML document into an ordered block-node array.

    Deterministic: document order, whitespace-collapsed text, link
    char counts, boilerplate-container flags.
    """
    p = _Flattener()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # Malformed input must never poison a batch
        # (reference behavior: failures become fallback rows, never
        # raised — karanta/pipeline.py:522-532).
        p._flush()
    return p.blocks
