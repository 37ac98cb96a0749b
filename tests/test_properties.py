"""Hypothesis property tests for the kernel invariants (no Spark —
fast, wide input coverage)."""

import unicodedata

from hypothesis import given, settings, strategies as st

from karanta_ocr_spark.kernel.assemble import assemble_document
from karanta_ocr_spark.kernel.boilerplate import extract_main_text
from karanta_ocr_spark.kernel.extract import PageExtract, extract_document
from karanta_ocr_spark.kernel.textnorm import cap_split_string, fix_text

texts = st.text(min_size=0, max_size=400)
page_texts = st.lists(
    st.one_of(st.none(), st.text(min_size=0, max_size=50)), min_size=1, max_size=12
)


@given(page_texts)
@settings(max_examples=200)
def test_spans_always_contiguous_and_cover(ptexts):
    pages = [PageExtract(i + 1, t, "", True) for i, t in enumerate(ptexts)]
    doc = assemble_document("u", pages, max_page_error_rate=1.0)
    if doc is None:
        # only when the concatenation is empty
        joined = "".join(
            (t + ("\n" if i < len(ptexts) - 1 else "")) if t is not None else ""
            for i, t in enumerate(ptexts)
        )
        assert joined == ""
        return
    assert doc.spans[0][0] == 0
    assert doc.spans[-1][1] == len(doc.text)
    for a, b in zip(doc.spans, doc.spans[1:]):
        assert a[1] == b[0]
    assert [s[2] for s in doc.spans] == list(range(1, len(ptexts) + 1))


@given(page_texts)
@settings(max_examples=100)
def test_assembly_page_order_invariant(ptexts):
    pages = [PageExtract(i + 1, t, "", True) for i, t in enumerate(ptexts)]
    doc1 = assemble_document("u", pages, max_page_error_rate=1.0)
    doc2 = assemble_document("u", list(reversed(pages)), max_page_error_rate=1.0)
    assert (doc1 is None) == (doc2 is None)
    if doc1:
        assert doc1.text == doc2.text and doc1.spans == doc2.spans


@given(texts, st.integers(min_value=20, max_value=300))
@settings(max_examples=200)
def test_cap_split_bounded(s, cap):
    out = cap_split_string(s, cap)
    if len(s) <= cap:
        assert out == s
    else:
        # head + " ... " + tail, each side ≤ cap//2 - 3 chars
        assert len(out) <= cap + 5
        assert " ... " in out


@given(texts)
@settings(max_examples=200)
def test_fix_text_idempotent_and_nfc(s):
    once = fix_text(s)
    assert fix_text(once) == once  # idempotent
    assert unicodedata.is_normalized("NFC", once)


@given(st.binary(min_size=0, max_size=600))
@settings(max_examples=150)
def test_extract_document_never_raises(payload):
    pages = extract_document("u", payload)
    assert len(pages) >= 1
    assert all(p.page_num >= 1 for p in pages)


@given(st.text(min_size=0, max_size=2000))
@settings(max_examples=100)
def test_extract_main_text_total(html):
    # any string input → a string out, never an exception
    assert isinstance(extract_main_text(html), str)


@settings(max_examples=150, deadline=2000)
@given(st.data())
def test_pdf_parser_terminates_on_mutated_input(data):
    # Hostile-input property: random byte mutations of a valid PDF
    # (flips, truncations, splices) must neither hang nor raise out of
    # parse_pdf's per-page isolation — a hung executor task is the
    # worst failure mode at crawl scale (cf. the r01 resolve-cycle
    # hang, ADVICE high).
    from karanta_ocr_spark.fixtures.pdf_gen import PageSpec, TextRun, build_pdf
    from karanta_ocr_spark.kernel.pdf_mini import parse_pdf

    base = bytearray(build_pdf([
        PageSpec(runs=[TextRun("mutation fixture text", 72, 700)]),
        PageSpec(runs=[TextRun("second page", 72, 700)]),
    ]))
    n_mut = data.draw(st.integers(1, 8))
    buf = bytearray(base)
    for _ in range(n_mut):
        kind = data.draw(st.integers(0, 2))
        if kind == 0 and buf:  # byte flip
            i = data.draw(st.integers(0, len(buf) - 1))
            buf[i] = data.draw(st.integers(0, 255))
        elif kind == 1 and len(buf) > 4:  # truncate
            buf = buf[: data.draw(st.integers(1, len(buf) - 1))]
        else:  # splice a chunk of itself somewhere else
            i = data.draw(st.integers(0, max(len(buf) - 1, 0)))
            j = data.draw(st.integers(0, max(len(buf) - 1, 0)))
            k = data.draw(st.integers(1, 64))
            buf = buf[:i] + base[j : j + k] + buf[i:]
    try:
        reports = parse_pdf(bytes(buf))
        assert isinstance(reports, list)
    except Exception:
        pass  # raising is acceptable; hanging (deadline) is not


@settings(max_examples=120, deadline=3000)
@given(st.data())
def test_image_decoders_never_hang_on_mutations(data):
    """Mutations of VALID PNG/JPEG bytes (flips, truncations) must
    neither hang the stdlib decoders nor escape with a non-typed
    error the multimodal fallback relies on catching — the decoder
    twin of the hostile-PDF property (a hung executor task being the
    uncatchable failure mode at crawl scale)."""
    from karanta_ocr_spark.kernel.jpeg_mini import encode_jpeg_gray, decode_jpeg
    from karanta_ocr_spark.kernel.png_mini import encode_png, decode_png

    w, h = 16, 8
    gray = bytes((x * 13 + y * 7) % 256 for y in range(h) for x in range(w))
    rgb = bytes(v for p in gray for v in (p, p, p))
    base = bytearray(
        encode_jpeg_gray(w, h, gray)
        if data.draw(st.booleans())
        else encode_png(w, h, rgb)
    )
    decode = decode_jpeg if base[:2] == b"\xff\xd8" else decode_png
    buf = bytearray(base)
    for _ in range(data.draw(st.integers(1, 6))):
        if data.draw(st.booleans()) and buf:
            i = data.draw(st.integers(0, len(buf) - 1))
            buf[i] = data.draw(st.integers(0, 255))
        elif len(buf) > 4:
            buf = buf[: data.draw(st.integers(1, len(buf) - 1))]
    try:
        out = decode(bytes(buf))
        assert out is None or len(out) == 3
    except Exception:
        pass  # raising is fine; hanging (deadline) is not


@settings(max_examples=150, deadline=2000)
@given(st.binary(min_size=0, max_size=300))
def test_image_decoders_never_hang_on_magic_prefixed_garbage(payload):
    from karanta_ocr_spark.kernel.jpeg_mini import decode_jpeg
    from karanta_ocr_spark.kernel.png_mini import decode_png

    for prefix, dec in (
        (b"\xff\xd8\xff", decode_jpeg),
        (b"\x89PNG\r\n\x1a\n", decode_png),
    ):
        try:
            dec(prefix + payload)
        except Exception:
            pass


@settings(max_examples=120, deadline=3000)
@given(st.data())
def test_container_decoders_never_hang_on_mutations(data):
    """AVI/GIF/WAV twin of the image-decoder property: mutations of
    valid container bytes must neither hang nor escape with an
    untyped error the operators' fallbacks rely on catching."""
    from karanta_ocr_spark.kernel.avi_mini import build_mjpeg_avi, parse_avi
    from karanta_ocr_spark.kernel.gif_mini import decode_gif, encode_gif_gray
    from karanta_ocr_spark.kernel.jpeg_mini import encode_jpeg_gray
    from karanta_ocr_spark.operators.multimodal import decode_wav_pcm16

    import struct as _s

    w, h = 16, 8
    gray = bytes((x * 13 + y * 7) % 256 for y in range(h) for x in range(w))
    kind = data.draw(st.integers(0, 2))
    if kind == 0:
        base = bytearray(
            build_mjpeg_avi([encode_jpeg_gray(w, h, gray)] * 2, w, h)
        )
        dec = parse_avi
    elif kind == 1:
        base = bytearray(encode_gif_gray(w, h, [gray] * 2))
        dec = decode_gif
    else:
        pcm = b"".join(_s.pack("<h", ((i * 37) % 200 - 100) * 100) for i in range(32))
        fmt = _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = (b"WAVE" + b"fmt " + _s.pack("<I", 16) + fmt
                + b"data" + _s.pack("<I", len(pcm)) + pcm)
        base = bytearray(b"RIFF" + _s.pack("<I", len(body)) + body)
        dec = decode_wav_pcm16
    buf = bytearray(base)
    for _ in range(data.draw(st.integers(1, 6))):
        if data.draw(st.booleans()) and buf:
            i = data.draw(st.integers(0, len(buf) - 1))
            buf[i] = data.draw(st.integers(0, 255))
        elif len(buf) > 4:
            buf = buf[: data.draw(st.integers(1, len(buf) - 1))]
    try:
        dec(bytes(buf))
    except Exception:
        pass  # raising is fine; hanging (deadline) is not


@settings(max_examples=150, deadline=2000)
@given(st.binary(min_size=0, max_size=300))
def test_container_decoders_never_hang_on_magic_prefixed_garbage(payload):
    from karanta_ocr_spark.kernel.avi_mini import parse_avi
    from karanta_ocr_spark.kernel.gif_mini import decode_gif
    from karanta_ocr_spark.operators.multimodal import decode_wav_pcm16

    for prefix, dec in (
        (b"RIFF\xff\xff\x00\x00AVI ", parse_avi),
        (b"GIF89a", decode_gif),
        (b"RIFF\xff\xff\x00\x00WAVE", decode_wav_pcm16),
    ):
        try:
            dec(prefix + payload)
        except Exception:
            pass


@settings(max_examples=100, deadline=2000)
@given(
    st.binary(min_size=0, max_size=200),
    st.binary(min_size=16, max_size=16),
    st.binary(min_size=16, max_size=16),
)
def test_aes_cbc_roundtrip_property(payload, key, iv):
    from karanta_ocr_spark.kernel.pdf_crypt import (
        aes_cbc_decrypt,
        aes_cbc_encrypt,
    )

    enc = aes_cbc_encrypt(key, iv, payload)
    assert len(enc) % 16 == 0 and len(enc) >= 32
    assert aes_cbc_decrypt(key, enc) == payload


@settings(max_examples=100, deadline=2000)
@given(st.binary(min_size=1, max_size=32), st.binary(min_size=0, max_size=200))
def test_rc4_symmetric_property(key, payload):
    from karanta_ocr_spark.kernel.pdf_crypt import rc4

    assert rc4(key, rc4(key, payload)) == payload


@settings(max_examples=60, deadline=5000)
@given(st.data())
def test_bpe_batch_equals_one_at_a_time_on_random_merge_lists(data):
    # WELL-FORMED random merge lists (every component is a base char
    # or the product of an earlier merge — the invariant trained lists
    # satisfy by construction): batch merging and the oracle's
    # one-at-a-time leftmost merging must always agree.
    from karanta_ocr_spark.functions.bpe import BpeEncoder
    from tests.test_bpe import one_at_a_time_count

    alphabet = ["a", "b", "c"]
    symbols = list(alphabet)
    merges, seen = [], set()
    for _ in range(data.draw(st.integers(0, 12))):
        a = data.draw(st.sampled_from(symbols))
        b = data.draw(st.sampled_from(symbols))
        if (a, b) in seen or len(a + b) > 8:
            continue
        seen.add((a, b))
        merges.append((a, b))
        symbols.append(a + b)
    enc = BpeEncoder(merges)
    for _ in range(5):
        w = "".join(
            data.draw(st.sampled_from(alphabet))
            for _ in range(data.draw(st.integers(1, 12)))
        )
        assert enc.count(w) == one_at_a_time_count(w, merges), (w, merges)


@settings(max_examples=120, deadline=2000)
@given(st.text(max_size=300), st.text(min_size=1, max_size=30))
def test_robots_parser_never_crashes_and_verdict_is_bool(txt, path):
    from karanta_ocr_spark.kernel.robots_mini import is_allowed

    assert is_allowed(txt, "bot", path) in (True, False)
