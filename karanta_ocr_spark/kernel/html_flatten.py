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
    # Rewrite only when a ws char other than ' ' (or a double space)
    # is present; otherwise strip() alone is the identity. The guard
    # uses chained `in` checks — each one a C-speed memchr/two-way
    # scan — instead of a regex alternation, which the profile showed
    # walking the no-match case at interpreter speed (~37% of the
    # whole extraction kernel on clean web text).
    if (
        "\n" in s
        or "  " in s
        or "\t" in s
        or "\r" in s
        or "\f" in s
        or "\v" in s
    ):
        return _ASCII_WS.sub(" ", s).strip()
    return s.strip()


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


# ---------------------------------------------------------- fast path
# A regex tokenizer that emits the SAME event stream html.parser
# (convert_charrefs=True) produces — pinned on its observed behavior
# for tolerant start/end tags, quoted '>' in attributes, bare '<' as
# data, script/style raw-text mode, comments/declarations/CDATA/PIs,
# and charref conversion on text runs only. html.parser spends ~80% of
# the kernel's per-doc time in per-character Python bookkeeping the
# flattener never uses (attribute parsing, position tracking); at 32
# concurrent CPython workers that overhead is also the main source of
# shared-cache pressure. Equivalence is enforced by tests
# (fixture-corpus + adversarial + hypothesis event-stream comparison);
# any exception falls back to the html.parser path.

# Reuse the stdlib's OWN tolerant start-tag matcher as the fallback so
# attribute pathologies (quotes in unquoted values, junk names)
# resolve exactly as html.parser resolves them.
from html.parser import locatestarttagend_tolerant as _FAST_STARTTAG_END  # noqa: E402

_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
# A '<' anywhere inside the tag (even in a quoted value) punts to the
# stdlib-tolerant fallback — that is exactly the territory where
# html.parser's recovery rules are subtle.
# Quotes open a span only directly after '=' (attribute value); a bare
# quote elsewhere (e.g. unquoted value "it's") punts to the fallback,
# where stdlib tolerant parsing treats it as literal value text.
_FAST_STARTTAG = re.compile(
    r"<([a-zA-Z][^\t\n\r\f />\x00]*)"
    r"((?:[^<>\"'=]|=\s*+\"[^\"<]*+\"|=\s*+'[^'<]*+'|=)*?)>",
    re.S,
)
_FAST_TAGNAME = re.compile(r"<([a-zA-Z][^\t\n\r\f />\x00]*)")
_FAST_ENDTAG = re.compile(r"</\s*([a-zA-Z][^\t\n\r\f />\x00]*)[^>]*>", re.S)


def _selfclosing(seg: str) -> bool:
    """html.parser marks a start tag XHTML-self-closing only when the
    trailing '/' is NOT swallowed by a bare (unquoted) attribute
    value: '<br/>', '<hr//>', '<p / x/>' and '<a href=x />' are
    self-closing; '<a href=http://x/>' is not (the '/' is value
    text). Mirrors tagfind/attrfind_tolerant token boundaries."""
    if not seg.endswith("/"):
        return False
    parts = seg.rsplit(None, 1)
    # Leading '/'s are separators (tagfind consumes them), not token
    # text: in '<p /=x/>' the attribute name is '=x'.
    tok = (parts[-1] if parts else seg).lstrip("/")
    eq = tok.find("=")
    if eq <= 0:
        # No '=', or '=' leads the token (then it's part of a valueless
        # attribute NAME per tagfind/attrfind): '/' stands alone.
        return True
    val = tok[eq:].lstrip("=")
    if val[:1] in "\"'":
        e = val.find(val[0], 1)
        return e >= 0 and val[e + 1 :].endswith("/")
    return False  # unquoted value swallows the trailing slash
_FAST_RAW_CLOSE = {
    "script": re.compile(r"</\s*script", re.I),
    "style": re.compile(r"</\s*style", re.I),
}


def _fast_events(html: str, h: "_Flattener") -> None:
    from html import unescape

    data = h.handle_data
    start = h.handle_starttag
    end = h.handle_endtag
    i, n = 0, len(html)
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            run = html[i:]
            data(unescape(run) if "&" in run else run)
            break
        if lt > i:
            run = html[i:lt]
            data(unescape(run) if "&" in run else run)
        i = lt
        c = html[lt + 1 : lt + 2]
        if c in _ASCII_LETTERS:
            m = _FAST_STARTTAG.match(html, i)
            if m is not None:
                tag = m.group(1).lower()
                sc = _selfclosing(m.group(2))
                i = m.end()
            else:
                # Fallback: quote/junk pathologies, resolved exactly as
                # the stdlib's tolerant matcher resolves them.
                j = _FAST_STARTTAG_END.match(html, i).end()
                nxt = html[j : j + 1]
                if nxt == "/" and html[j : j + 2] == "/>":
                    sc = True
                    j += 2
                elif nxt == ">":
                    sc = False
                    j += 1
                else:
                    # Unterminated-at-EOF or bogus mid-tag input:
                    # mirror html.parser's close-time recovery —
                    # everything through the next '>' (or up to the
                    # next '<', or one char) becomes one data chunk,
                    # charref-converted like any text run.
                    k = html.find(">", i + 1)
                    if k >= 0:
                        k += 1
                    else:
                        k = html.find("<", i + 1)
                        if k < 0:
                            k = i + 1
                    chunk = html[i:k]
                    data(unescape(chunk) if "&" in chunk else chunk)
                    i = k
                    continue
                tag = _FAST_TAGNAME.match(html, i).group(1).lower()
                i = j
            start(tag, [])
            if sc:  # <tag/> = startendtag = start + end
                end(tag)
            elif tag in _FAST_RAW_CLOSE:
                # Raw-text content mode: everything up to </tag is one
                # data chunk, NOT charref-converted (html.parser drops
                # unterminated raw content at EOF — so do we).
                mc = _FAST_RAW_CLOSE[tag].search(html, i)
                if mc is None:
                    break
                if mc.start() > i:
                    data(html[i : mc.start()])
                me = _FAST_ENDTAG.match(html, mc.start())
                if me is None:  # '</script' at EOF without '>'
                    end(tag)
                    break
                end(me.group(1).lower())
                i = me.end()
        elif c == "/":
            m = _FAST_ENDTAG.match(html, i)
            if m is not None:
                end(m.group(1).lower())
                i = m.end()
                continue
            gt = html.find(">", i)
            if gt < 0:
                # Unterminated '</…' at EOF: html.parser's close-time
                # recovery emits everything up to the next '<' (or one
                # char) as a charref-converted data chunk.
                k = html.find("<", i + 1)
                if k < 0:
                    k = i + 1
                chunk = html[i:k]
                data(unescape(chunk) if "&" in chunk else chunk)
                i = k
                continue
            i = gt + 1  # '</>' and other bogus: consumed, no event
        elif c == "!":
            # All unterminated forms below: html.parser's close-time
            # recovery emits '<' alone, then the tail flows on as an
            # ordinary text run — dropping it would silently lose the
            # rest of a truncated fetch.
            if html.startswith("<!--", i):
                e = html.find("-->", i + 4)
                if e < 0:
                    data("<")
                    i += 1
                    continue
                i = e + 3
            elif html.startswith("<![CDATA[", i):
                e = html.find("]]>", i + 9)
                if e < 0:
                    data("<")
                    i += 1
                    continue
                i = e + 3
            else:  # <!doctype ...> and other declarations
                gt = html.find(">", i)
                if gt < 0:
                    data("<")
                    i += 1
                    continue
                i = gt + 1
        elif c == "?":
            gt = html.find(">", i)
            if gt < 0:
                data("<")
                i += 1
                continue
            i = gt + 1
        else:  # bare '<' (including at EOF): emitted as its own chunk
            data("<")
            i += 1


def flatten_html(html: str) -> list[Block]:
    """Flatten an HTML document into an ordered block-node array.

    Deterministic: document order, whitespace-collapsed text, link
    char counts, boilerplate-container flags.
    """
    p = _Flattener()
    try:
        _fast_events(html, p)
        p._flush()
        return p.blocks
    except Exception:
        pass
    # Fallback: the battle-tested stdlib parser (also the behavioral
    # spec the fast path is pinned against).
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
