"""Document assembly span math — byte-exact vs the reference
(karanta/pipeline.py:538-591, 507-515)."""

import hashlib

from karanta_ocr_spark.kernel.assemble import assemble_document
from karanta_ocr_spark.kernel.extract import PageExtract


def _p(n, text, ok=True):
    return PageExtract(page_num=n, natural_text=text, anchor_text="", ok=ok)


def test_span_arithmetic_three_pages():
    doc = assemble_document("u", [_p(1, "aaa"), _p(2, "bb"), _p(3, "c")])
    # content: "aaa\n" + "bb\n" + "c"
    assert doc.text == "aaa\nbb\nc"
    assert doc.spans == [(0, 4, 1), (4, 7, 2), (7, 8, 3)]
    assert doc.spans[-1][1] == len(doc.text)


def test_no_trailing_newline_on_last_page():
    doc = assemble_document("u", [_p(1, "x"), _p(2, "y")])
    assert doc.text == "x\ny"
    assert not doc.text.endswith("\n")


def test_none_page_emits_empty_span():
    # Reference pipeline.py:549-555: None text → empty content, but a
    # span [pos, pos, page] is still recorded.
    doc = assemble_document("u", [_p(1, "aa"), _p(2, None), _p(3, "b")],
                            max_page_error_rate=1.0)
    assert doc.text == "aa\nb"
    assert doc.spans == [(0, 3, 1), (3, 3, 2), (3, 4, 3)]


def test_pages_sorted_by_page_num():
    doc = assemble_document("u", [_p(3, "c"), _p(1, "a"), _p(2, "b")])
    assert doc.text == "a\nb\nc"
    assert [s[2] for s in doc.spans] == [1, 2, 3]


def test_empty_doc_dropped():
    assert assemble_document("u", [_p(1, None)], max_page_error_rate=1.0) is None
    assert assemble_document("u", []) is None


def test_error_rate_boundary_exact_0004():
    # 1 failed page of 250 → rate exactly 0.004: strictly-greater
    # comparison keeps the doc (reference pipeline.py:511 uses >).
    pages = [_p(i, f"t{i}") for i in range(1, 250)] + [_p(250, None, ok=False)]
    assert assemble_document("u", pages) is not None
    # 1 of 249 → 0.004016… > 0.004: dropped.
    pages = [_p(i, f"t{i}") for i in range(1, 249)] + [_p(249, None, ok=False)]
    assert assemble_document("u", pages) is None


def test_doc_id_is_sha1_of_utf8_text():
    doc = assemble_document("u", [_p(1, "ሰላም ߒߞߏ")])
    assert doc.doc_id == hashlib.sha1("ሰላም ߒߞߏ".encode()).hexdigest()


def test_single_page_spans_cover_text():
    doc = assemble_document("u", [_p(1, "hello")])
    assert doc.spans == [(0, 5, 1)]
    assert doc.n_pages == 1 and doc.n_failed == 0


def test_spans_contiguous_cover_full_text(golden_docs):
    for url, doc in golden_docs.items():
        assert doc.spans[0][0] == 0
        assert doc.spans[-1][1] == len(doc.text)
        for a, b in zip(doc.spans, doc.spans[1:]):
            assert a[1] == b[0], url
