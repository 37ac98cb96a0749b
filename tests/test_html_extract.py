"""HTML flatten + boilerplate classification tests, plus the
reference's four generated-test shapes (text_present / text_absent /
text_order / headers_footers — configs/prompts/create_tests.yaml:1-58,
schemas karanta/data/utils.py:443-604) applied to the fixture corpus."""

from karanta_ocr_spark.kernel.boilerplate import extract_main_text, score_blocks
from karanta_ocr_spark.kernel.html_flatten import flatten_html

SIMPLE = """
<html><head><title>T</title><script>junk()</script></head><body>
<header><nav><a href="/">Home</a> <a href="/n">News</a></nav></header>
<article>
<h1>Big headline here</h1>
<p>This is the first long paragraph of the main article body text.</p>
<p>Second long paragraph with plenty of characters to qualify as good.</p>
<p>tiny</p>
</article>
<aside><ul><li><a href="/x">link one text</a></li><li><a href="/y">link two text</a></li></ul></aside>
<footer><p>Copyright 2025 example.com <a href="/p">Privacy</a></p></footer>
</body></html>
"""


def test_flatten_blocks_and_flags():
    blocks = flatten_html(SIMPLE)
    tags = [(b.tag, b.in_boiler) for b in blocks]
    assert ("h1", False) in tags
    assert ("p", False) in tags
    nav_blocks = [b for b in blocks if b.in_boiler]
    assert nav_blocks, "boilerplate containers must flag their blocks"
    # script/style/title text never appears
    assert all("junk" not in b.text and b.text != "T" for b in blocks)


def test_link_density():
    blocks = flatten_html(SIMPLE)
    li = [b for b in blocks if b.tag == "li"]
    assert li and all(b.link_density > 0.9 for b in li)
    para = [b for b in blocks if b.tag == "p" and not b.in_boiler]
    assert para and all(b.link_density == 0.0 for b in para)


def test_classification_rules():
    blocks = score_blocks(flatten_html(SIMPLE))
    by_text = {b.text: b.label for b in blocks}
    assert by_text["Big headline here"] == "good"  # heading promotion
    assert by_text["tiny"] == "good"  # near-good propagation
    assert all(
        b.label == "bad" for b in blocks if b.in_boiler
    ), "boiler-container blocks must be bad"


def test_extract_main_text_content():
    text = extract_main_text(SIMPLE)
    assert "Big headline here" in text
    assert "first long paragraph" in text
    assert "Home" not in text
    assert "Copyright" not in text
    assert "link one text" not in text


def test_heading_without_body_dropped():
    html = "<body><h1>Lonely heading</h1><footer><p>foot</p></footer></body>"
    assert "Lonely heading" not in extract_main_text(html)


def test_malformed_html_no_crash():
    assert isinstance(extract_main_text("<p>ok<div><b>x"), str)
    assert extract_main_text("") == ""


# ---- reference generated-test shapes over the corpus -------------------
def _extracted(corpus_rows):
    from karanta_ocr_spark.kernel.assemble import assemble_document
    from karanta_ocr_spark.kernel.extract import extract_document

    for r in corpus_rows:
        if r["_kind"].startswith("html"):
            doc = assemble_document(r["url"], extract_document(r["url"], r["html"]))
            yield r, doc


def test_text_present(corpus_rows):
    for r, doc in _extracted(corpus_rows):
        assert doc is not None, r["url"]
        for snip in r["_expect_present"]:
            assert snip in doc.text, (r["url"], snip[:50])


def test_headers_footers_absent(corpus_rows):
    for r, doc in _extracted(corpus_rows):
        for snip in r["_expect_absent"]:
            assert snip not in doc.text, (r["url"], snip)


def test_text_order(corpus_rows):
    # headline precedes body paragraphs (document order preserved)
    for r, doc in _extracted(corpus_rows):
        ep = r["_expect_present"]
        if len(ep) >= 3:
            h, p1, p2 = ep[0], ep[1], ep[2]
            assert doc.text.index(h) < doc.text.index(p1) < doc.text.index(p2), r["url"]
