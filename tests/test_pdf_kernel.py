"""PDF mini-parser + bbox merge + anchor linearization tests
(reference semantics: karanta/prompts/anchor.py)."""

from karanta_ocr_spark.fixtures.pdf_gen import ImageSpec, PageSpec, TextRun, build_pdf
from karanta_ocr_spark.kernel.bbox_merge import merge_image_elements
from karanta_ocr_spark.kernel.linearize import linearize_page_report, page_natural_text
from karanta_ocr_spark.kernel.pdf_mini import (
    BoundingBox,
    ImageElement,
    parse_pdf,
)


def _one_page(runs=(), images=(), w=612.0, h=792.0, compress=False):
    return parse_pdf(
        build_pdf([PageSpec(width=w, height=h, runs=list(runs), images=list(images))],
                  compress=compress)
    )[0]


def test_text_coordinates_exact():
    rep = _one_page(runs=[TextRun("hello", 72.5, 700.25)])
    assert len(rep.text_elements) == 1
    el = rep.text_elements[0]
    assert (el.text, el.x, el.y) == ("hello", 72.5, 700.25)
    assert rep.mediabox == BoundingBox(0.0, 0.0, 612.0, 792.0)


def test_flate_compressed_stream():
    rep = _one_page(runs=[TextRun("compressed run", 10, 20)], compress=True)
    assert rep.text_elements[0].text == "compressed run"


def test_unicode_and_escapes():
    rep = _one_page(runs=[TextRun("ߒߞߏ (ꕉꕜꕮ) \\ ሰላም", 10, 20)])
    assert rep.text_elements[0].text == "ߒߞߏ (ꕉꕜꕮ) \\ ሰላም"


def test_multipage_order_and_count():
    pdf = build_pdf(
        [PageSpec(runs=[TextRun(f"page {i}", 72, 700)]) for i in range(1, 4)]
    )
    reports = parse_pdf(pdf)
    assert [r.text_elements[0].text for r in reports] == ["page 1", "page 2", "page 3"]


def test_image_bbox_via_ctm():
    rep = _one_page(images=[ImageSpec(100, 200, 80, 60)])
    assert len(rep.image_elements) == 1
    bb = rep.image_elements[0].bbox
    assert (bb.x0, bb.y0, bb.x1, bb.y1) == (100.0, 200.0, 180.0, 260.0)


def test_merge_overlapping_images():
    imgs = [
        ImageElement("/Im0", BoundingBox(0, 0, 10, 10)),
        ImageElement("/Im1", BoundingBox(10.4, 0, 20, 10)),  # within 0.5 tol
        ImageElement("/Im2", BoundingBox(50, 50, 60, 60)),
    ]
    merged = merge_image_elements(imgs)
    assert len(merged) == 2
    big = next(m for m in merged if "+" in m.name)
    assert (big.bbox.x0, big.bbox.x1) == (0, 20)


def test_merge_quirk_over_100_returns_none():
    imgs = [
        ImageElement(f"/Im{i}", BoundingBox(i, i, i + 1, i + 1)) for i in range(101)
    ]
    assert merge_image_elements(imgs) is None


def test_linearize_no_images_empty():
    # Reference anchor.py:238-241: zero images → page anchors to "".
    rep = _one_page(runs=[TextRun("text only", 72, 700)])
    assert linearize_page_report(rep) == ""


def test_linearize_under_budget_format_and_sort():
    rep = _one_page(
        runs=[TextRun("low", 100, 100), TextRun("high", 100, 700)],
        images=[ImageSpec(50, 400, 10, 10)],
    )
    out = linearize_page_report(rep)
    lines = out.splitlines()
    assert lines[0] == "Page dimensions: 612.0x792.0"
    # y-desc order: high(700), image(400), low(100)
    assert lines[1] == "[100x700]high"
    assert lines[2] == "[Image 50x400 to 60x410]"
    assert lines[3] == "[100x100]low"


def test_linearize_budget_lt_20_header_only():
    rep = _one_page(runs=[TextRun("x", 1, 1)], images=[ImageSpec(0, 0, 1, 1)])
    assert linearize_page_report(rep, max_length=19) == "Page dimensions: 612.0x792.0\n"


def test_linearize_over_budget_deterministic_and_bounded():
    runs = [TextRun(f"run number {i} with some padding text", 50 + i, 700 - 2 * i)
            for i in range(300)]
    rep = _one_page(runs=runs, images=[ImageSpec(5, 5, 2, 2)])
    out1 = linearize_page_report(rep, max_length=4000, shuffle_seed=7)
    out2 = linearize_page_report(rep, max_length=4000, shuffle_seed=7)
    out3 = linearize_page_report(rep, max_length=4000, shuffle_seed=8)
    assert out1 == out2  # same seed → identical
    assert out1 != out3  # different seed → different fill
    assert len(out1) <= 4000 + 200  # edge elements may overflow slightly
    # edge elements always present: min-y and max-y text runs
    assert "[50x700]" in out1 and "[349x102]" in out1


def test_natural_text_single_column_reading_order():
    rep = _one_page(
        runs=[
            TextRun("line two", 72, 680),
            TextRun("line one", 72, 700),
            TextRun("line three", 72, 660),
        ]
    )
    assert page_natural_text(rep) == "line one\nline two\nline three"


def test_natural_text_two_columns():
    runs = [TextRun(f"L{i}", 60, 700 - 20 * i) for i in range(4)] + [
        TextRun(f"R{i}", 400, 700 - 20 * i) for i in range(4)
    ]
    rep = _one_page(runs=runs)
    # left column fully before right column
    assert page_natural_text(rep) == "L0\nL1\nL2\nL3\nR0\nR1\nR2\nR3"


def test_natural_text_same_line_x_order():
    rep = _one_page(runs=[TextRun("world", 200, 700), TextRun("hello", 72, 700.5)])
    # y within tolerance → same line, x ascending; gap below column
    # threshold → single column
    assert page_natural_text(rep) == "hello world"


def _raw_pdf(objects: dict[int, bytes]) -> bytes:
    """Assemble raw object syntax into a scannable PDF body."""
    body = b"%PDF-1.4\n"
    for num, obj in sorted(objects.items()):
        body += b"%d 0 obj\n%s\nendobj\n" % (num, obj)
    return body + b"%%EOF"


def test_cyclic_indirect_reference_terminates():
    # Hostile PDF: /MediaBox is a ref cycle 5 -> 6 -> 5. Must not hang
    # (ADVICE r01 high); falls back to the default letter mediabox.
    pdf = _raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox 5 0 R /Contents 4 0 R >>",
        4: b"<< /Length 24 >>\nstream\nBT 1 0 0 1 72 700 Tm (x) Tj ET\nendstream",
        5: b"6 0 R",
        6: b"5 0 R",
    })
    reports = parse_pdf(pdf)
    assert len(reports) == 1
    assert reports[0].mediabox == BoundingBox(0.0, 0.0, 612.0, 792.0)


def test_self_referential_indirect_reference_terminates():
    pdf = _raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox 5 0 R >>",
        5: b"5 0 R",
    })
    reports = parse_pdf(pdf)
    assert reports[0].mediabox == BoundingBox(0.0, 0.0, 612.0, 792.0)


def test_cyclic_kids_tree_terminates():
    # Pages node whose /Kids contains itself: walk must not recurse forever.
    pdf = _raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 2 0 R] /Count 1 "
           b"/MediaBox [0 0 100 200] >>",
        3: b"<< /Type /Page /Parent 2 0 R >>",
    })
    reports = parse_pdf(pdf)
    assert len(reports) == 1
    assert reports[0].mediabox == BoundingBox(0.0, 0.0, 100.0, 200.0)


def test_inline_image_skipped_text_survives():
    # BI ... ID <binary with embedded 'EI' bytes> EI between two text
    # runs: the payload must be skipped, both runs extracted, and no
    # image element emitted (reference pypdf visitors only see /XObject
    # Do images).
    payload = b"\x00\x01EIx\xff" * 8  # contains non-delimiter 'EI'
    content = (
        b"BT 1 0 0 1 72 700 Tm (before) Tj ET\n"
        b"BI /W 4 /H 4 /BPC 8 /CS /RGB ID " + payload + b" EI\n"
        b"BT 1 0 0 1 72 680 Tm (after) Tj ET"
    )
    pdf = _raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    })
    rep = parse_pdf(pdf)[0]
    assert [e.text for e in rep.text_elements] == ["before", "after"]
    assert rep.image_elements == []


def test_object_stream_pages_found():
    # PDF 1.5 layout: catalog/pages/page dicts live inside a compressed
    # /ObjStm; only the container and the content stream are
    # sequentially scannable. The tolerant ObjStm fallback must find
    # the page.
    import zlib as _zlib

    inner = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 300 400] /Contents 5 0 R >>",
    }
    header = b""
    body = b""
    for num, obj in inner.items():
        header += b"%d %d " % (num, len(body))
        body += obj + b" "
    first = len(header)
    payload = _zlib.compress(header + body)
    content = b"BT 1 0 0 1 10 20 Tm (objstm text) Tj ET"
    pdf = _raw_pdf({
        4: b"<< /Type /ObjStm /N 3 /First %d /Filter /FlateDecode /Length %d >>"
           b"\nstream\n%s\nendstream" % (first, len(payload), payload),
        5: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
    })
    reports = parse_pdf(pdf)
    assert len(reports) == 1
    assert reports[0].mediabox == BoundingBox(0.0, 0.0, 300.0, 400.0)
    assert reports[0].text_elements[0].text == "objstm text"


def test_type0_cid_font_tounicode_decode():
    # Type0/Identity-H font: Tj strings are 2-byte CIDs mapped to text
    # through the /ToUnicode CMap (bfchar + both bfrange forms).
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar\n<0001> <0048>\n<0002> <0065>\nendbfchar\n"
        b"2 beginbfrange\n<0010> <0011> <006C>\n"
        b"<0020> <0021> [<006F> <0021>]\nendbfrange\n"
        b"endcmap\nend\n"
    )
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm <00010002001000100020 0021> Tj ET"
    pdf = _raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        5: b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake "
           b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        6: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
    })
    rep = parse_pdf(pdf)[0]
    assert len(rep.text_elements) == 1
    el = rep.text_elements[0]
    # 0001->H 0002->e 0010->l (range, twice) 0020->o 0021->! (array)
    assert el.text == "Hello!"
    assert (el.x, el.y) == (72.0, 700.0)


def test_differences_encoding_decode():
    # Simple Type1 font with /Encoding /Differences: remapped codes
    # decode via glyph names (AGL subset + uniXXXX form), untouched
    # codes keep the latin-1-ish base meaning. Reference analog:
    # pypdf applies the same overlay when extracting text.
    content = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Y\x80r\x81b\x82 \x83K) Tj ET"
    pdf = _raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Fake /Encoding "
           b"<< /Type /Encoding /Differences "
           b"[ 128 /oacute /uni1EB9 /agrave 131 /odieresis ] >> >>",
    })
    rep = parse_pdf(pdf)[0]
    assert len(rep.text_elements) == 1
    # 0x80->ó 0x81->ẹ (uni1EB9) 0x82->à 0x83->ö; Y r b space K via base.
    assert rep.text_elements[0].text == "Yórẹbà öK"


def test_differences_unknown_glyph_drops_not_crashes():
    content = b"BT /F1 12 Tf 1 0 0 1 0 0 Tm (a\x90b) Tj ET"
    pdf = _raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        5: b"<< /Type /Font /Subtype /Type1 /Encoding "
           b"<< /Differences [ 144 /g123notaglyph ] >> >>",
    })
    rep = parse_pdf(pdf)[0]
    assert rep.text_elements[0].text == "ab"


def test_non_cid_font_still_decodes_plain_strings():
    # Tf selecting a plain (no ToUnicode) font must not change the
    # default literal-string decoding.
    content = b"BT /F9 10 Tf 1 0 0 1 10 20 Tm (plain text) Tj ET"
    pdf = _raw_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Resources << /Font << /F9 5 0 R >> >> /Contents 4 0 R >>",
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    })
    rep = parse_pdf(pdf)[0]
    assert rep.text_elements[0].text == "plain text"


def test_encrypted_pdf_typed_error():
    # /Encrypt in the trailer means ciphertext content: the parse must
    # fail with the TYPED error, and extraction must classify the row
    # as ok=false, error='pdf: encrypted' (not a generic parse crash).
    import pytest as _pytest

    from karanta_ocr_spark.kernel.extract import extract_document
    from karanta_ocr_spark.kernel.pdf_mini import (
        PdfDocument,
        PdfEncryptedError,
        _is_encrypted,
    )

    enc = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >> endobj\n"
        b"5 0 obj << /Filter /Standard /V 2 /R 3 /O (x) /U (y) /P -44 >> endobj\n"
        b"trailer << /Root 1 0 R /Encrypt 5 0 R /Size 6 >>\n"
        b"%%EOF"
    )
    assert _is_encrypted(enc)
    with _pytest.raises(PdfEncryptedError):
        PdfDocument(enc)
    pages = extract_document("https://x.example/enc.pdf", enc)
    assert len(pages) == 1 and not pages[0].ok
    assert pages[0].error == "pdf: encrypted"
    # a document that merely MENTIONS /Encrypt in a content string is
    # not encrypted — the detection requires a trailer declaration
    benign = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >> endobj\n"
        b"4 0 obj << /Note (the /Encrypt key is discussed here) >> endobj\n"
        b"trailer << /Root 1 0 R /Size 5 >>\n"
        b"%%EOF"
    )
    assert not _is_encrypted(benign)
    assert PdfDocument(benign).num_pages() == 1


def test_encrypted_pdf_xref_stream_trailer_detected():
    from karanta_ocr_spark.kernel.pdf_mini import _is_encrypted

    # PDF 1.5+: no classic trailer; the xref STREAM object carries the
    # trailer keys, /Encrypt included.
    enc = (
        b"%PDF-1.5\n"
        b"7 0 obj << /Type /XRef /Size 8 /Root 1 0 R /Encrypt 5 0 R "
        b"/W [1 2 1] /Length 0 >> stream\nendstream endobj\n"
        b"%%EOF"
    )
    assert _is_encrypted(enc)


def _xref_stream_pdf(predictor: bool) -> bytes:
    """Minimal PDF 1.5 file: objects located ONLY by an xref STREAM
    (no classic table), W [1 2 1], optional PNG predictor 12."""
    import struct as _s
    import zlib as _z

    out = bytearray(b"%PDF-1.5\n")
    offs = {}

    def add(num, body):
        offs[num] = len(out)
        out.extend(f"{num} 0 obj ".encode() + body + b" endobj\n")

    content = b"BT /F1 12 Tf 72 700 Td (XrefStream works) Tj ET"
    add(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    add(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    add(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
    add(4, b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
           + content + b"\nendstream")
    add(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    xref_off = len(out)
    rows = [(0, 0, 255)]  # obj 0: free
    for n in range(1, 6):
        rows.append((1, offs[n], 0))
    rows.append((1, xref_off, 0))  # obj 6: the xref stream itself
    raw = b"".join(
        bytes([t]) + _s.pack(">H", f1) + bytes([f2]) for t, f1, f2 in rows
    )
    parms = b""
    if predictor:
        # PNG Up (tag 2) rows over 4-byte columns
        enc = bytearray()
        prev = bytes(4)
        for i in range(0, len(raw), 4):
            row = raw[i : i + 4]
            enc.append(2)
            enc.extend((row[j] - prev[j]) & 0xFF for j in range(4))
            prev = row
        raw = bytes(enc)
        parms = b" /DecodeParms << /Predictor 12 /Columns 4 >>"
    comp = _z.compress(raw)
    hdr = (b"<< /Type /XRef /Size 7 /W [1 2 1] /Root 1 0 R"
           + parms + b" /Filter /FlateDecode /Length "
           + str(len(comp)).encode() + b" >>")
    out.extend(b"6 0 obj " + hdr + b"\nstream\n" + comp + b"\nendstream endobj\n")
    out.extend(b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n")
    return bytes(out)


def test_xref_table_path_loads_and_matches_scan():
    from karanta_ocr_spark.fixtures.pdf_gen import PageSpec, TextRun, build_pdf
    from karanta_ocr_spark.kernel.pdf_mini import PdfDocument, parse_pdf

    pdf = build_pdf([PageSpec(runs=[TextRun("Hello xref", 72, 700)]),
                     PageSpec(runs=[TextRun("Page two", 72, 650)])])
    fast = PdfDocument(pdf)
    slow = PdfDocument(pdf, use_xref=False)
    assert fast.loaded_via_xref and not slow.loaded_via_xref
    assert set(fast.objects) == set(slow.objects)
    assert fast.num_pages() == slow.num_pages() == 2
    texts = [t.text for r in parse_pdf(pdf) for t in r.text_elements]
    assert texts == ["Hello xref", "Page two"]


def test_xref_stream_path_with_and_without_predictor():
    from karanta_ocr_spark.kernel.pdf_mini import PdfDocument, parse_pdf

    for predictor in (False, True):
        pdf = _xref_stream_pdf(predictor)
        doc = PdfDocument(pdf)
        assert doc.loaded_via_xref, f"predictor={predictor}"
        assert doc.num_pages() == 1
        texts = [t.text for r in parse_pdf(pdf) for t in r.text_elements]
        assert texts == ["XrefStream works"]


def test_xref_fallback_on_corrupt_or_lying_xref():
    import re as _re

    from karanta_ocr_spark.fixtures.pdf_gen import PageSpec, TextRun, build_pdf
    from karanta_ocr_spark.kernel.pdf_mini import PdfDocument

    pdf = build_pdf([PageSpec(runs=[TextRun("Survive", 72, 700)])])
    no_sx = pdf.replace(b"startxref", b"startxrEf")
    assert PdfDocument(no_sx).num_pages() == 1  # sequential fallback
    lied = _re.sub(
        rb"\n(\d{10}) (\d{5}) n",
        lambda m: b"\n" + b"9" * 10 + b" " + m.group(2) + b" n",
        pdf,
    )
    d = PdfDocument(lied)
    assert not d.loaded_via_xref and d.num_pages() == 1


def test_xref_incremental_update_newest_wins():
    # Appended revision replaces the content object; the /Prev chain
    # walks newest-first so the updated text must win on the xref path
    # (and the sequential scan agrees).
    import re as _re

    from karanta_ocr_spark.fixtures.pdf_gen import PageSpec, TextRun, build_pdf
    from karanta_ocr_spark.kernel.pdf_mini import PdfDocument, parse_pdf

    pdf = bytearray(build_pdf([PageSpec(runs=[TextRun("Old text", 72, 700)])]))
    old_xref = int(_re.search(rb"startxref\s+(\d+)", bytes(pdf)).group(1))
    # find the content-stream object number (stream bodies may be
    # Flate-compressed, so locate it via the parsed object map)
    base = PdfDocument(bytes(pdf), use_xref=False)
    objnum = next(
        n for n, (_v, s) in base.objects.items() if s and b"Old text" in s
    )
    content = b"BT /F1 12 Tf 72 700 Td (New text) Tj ET"
    new_off = len(pdf)
    pdf.extend(f"{objnum} 0 obj << /Length {len(content)} >>\nstream\n".encode()
               + content + b"\nendstream endobj\n")
    xref2 = len(pdf)
    pdf.extend(b"xref\n" + f"{objnum} 1\n".encode()
               + f"{new_off:010d} 00000 n \n".encode()
               + f"trailer\n<< /Size 99 /Root 1 0 R /Prev {old_xref} >>\n".encode()
               + b"startxref\n" + str(xref2).encode() + b"\n%%EOF\n")
    doc = PdfDocument(bytes(pdf))
    assert doc.loaded_via_xref
    texts = [t.text for r in parse_pdf(bytes(pdf)) for t in r.text_elements]
    assert texts == ["New text"]


def test_stale_xref_entry_falls_back_to_full_scan():
    """A regenerated/appended file whose xref has ONE stale offset
    must abandon the fast path entirely — skipping just that entry
    could silently lose a /Contents object (empty page text) while
    the /Root->/Pages validation still passes."""
    import re as _re

    from karanta_ocr_spark.fixtures.pdf_gen import PageSpec, TextRun, build_pdf
    from karanta_ocr_spark.kernel.pdf_mini import PdfDocument, parse_pdf

    pdf = build_pdf([PageSpec(runs=[TextRun("Stale xref text", 72, 700)])])
    entries = list(_re.finditer(rb"(\d{10}) (\d{5}) n", pdf))
    assert entries, "fixture emits a classic xref table"
    # Point the LAST in-use entry 40 bytes past its object header.
    m = entries[-1]
    stale = b"%010d" % (int(m.group(1)) + 40)
    broken = pdf[: m.start(1)] + stale + pdf[m.end(1):]
    doc = PdfDocument(broken)
    assert not doc.loaded_via_xref  # fell back to the sequential scan
    texts = [t.text for r in parse_pdf(broken) for t in r.text_elements]
    assert texts == ["Stale xref text"]


def test_embedded_trailer_bytes_do_not_classify_encrypted():
    """'trailer << /Encrypt ... >>' INSIDE a stream payload (an
    embedded PDF attachment) is content, not this document's
    structure — the outer document must parse normally."""
    from karanta_ocr_spark.fixtures.pdf_gen import PageSpec, TextRun, build_pdf
    from karanta_ocr_spark.kernel.pdf_mini import PdfDocument, parse_pdf

    pdf = build_pdf([PageSpec(runs=[TextRun("Outer doc text", 72, 700)])])
    attachment = (b"90 0 obj << /Type /EmbeddedFile /Length 46 >>\nstream\n"
                  b"trailer << /Encrypt 5 0 R /Root 1 0 R >> x\nendstream endobj\n")
    # Splice before the xref so offsets shift -> parser takes the scan.
    cut = pdf.rindex(b"xref")
    spliced = pdf[:cut] + attachment + pdf[cut:]
    doc = PdfDocument(spliced)  # must NOT raise PdfEncryptedError
    texts = [t.text for r in parse_pdf(spliced) for t in r.text_elements]
    assert texts == ["Outer doc text"]
