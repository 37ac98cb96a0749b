"""Minimal synthetic PDF writer (pure stdlib).

Emits valid-enough PDFs: catalog → pages tree → per-page content
stream with ``BT ... Tm (text) Tj ET`` runs and ``q w 0 0 h x y cm
/ImN Do Q`` image placements, optionally FlateDecode-compressed.
Text payloads are UTF-8 bytes in literal strings (what
``kernel.pdf_mini`` decodes; documented deviation from real-font
encodings — we control both ends).

Exercises the reference-parity paths: coordinates land exactly where
``karanta/prompts/anchor.py:87-120`` would report them, image bboxes
come from the unit square through the CTM, and the >100-image page
triggers the merge bail-out quirk (``anchor.py:163-164``).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from functools import lru_cache


@dataclass(frozen=True)
class TextRun:
    text: str
    x: float
    y: float
    size: float = 12.0


@dataclass(frozen=True)
class ImageSpec:
    x: float
    y: float
    w: float
    h: float


@dataclass
class PageSpec:
    width: float = 612.0
    height: float = 792.0
    runs: list[TextRun] = field(default_factory=list)
    images: list[ImageSpec] = field(default_factory=list)


def _esc(text: str) -> bytes:
    b = text.encode("utf-8")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _fmt(v: float) -> bytes:
    s = ("%g" % v).encode("ascii")
    return s


def _content_stream(page: PageSpec) -> bytes:
    parts: list[bytes] = []
    for i, img in enumerate(page.images):
        parts.append(
            b"q " + _fmt(img.w) + b" 0 0 " + _fmt(img.h) + b" "
            + _fmt(img.x) + b" " + _fmt(img.y) + b" cm /Im" + str(i).encode() + b" Do Q"
        )
    for run in page.runs:
        parts.append(
            b"BT /F1 " + _fmt(run.size) + b" Tf 1 0 0 1 "
            + _fmt(run.x) + b" " + _fmt(run.y) + b" Tm ("
            + _esc(run.text) + b") Tj ET"
        )
    return b"\n".join(parts)



def _build_objects(pages: list[PageSpec], compress: bool) -> list[bytes]:
    """Phase A: serialize *pages* into the 1-indexed object-body list
    (catalog, pages root, per-page xobjects/content/page dicts) —
    everything except encryption and final byte assembly."""
    objects: list[bytes] = []

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    page_obj_nums: list[int] = []
    # Reserve 1=catalog, 2=pages-root: fill after children are known.
    add(b"")  # 1 placeholder
    add(b"")  # 2 placeholder

    for page in pages:
        # image xobjects (1x1 RGB, minimal)
        xobj_entries: list[bytes] = []
        for i, _ in enumerate(page.images):
            data = b"\xff\x00\x00"
            img_num = add(
                b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
                b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Length "
                + str(len(data)).encode()
                + b" >>\nstream\n" + data + b"\nendstream"
            )
            xobj_entries.append(
                b"/Im" + str(i).encode() + b" " + str(img_num).encode() + b" 0 R"
            )

        content = _content_stream(page)
        if compress:
            comp = zlib.compress(content, 6)
            contents_num = add(
                b"<< /Filter /FlateDecode /Length " + str(len(comp)).encode()
                + b" >>\nstream\n" + comp + b"\nendstream"
            )
        else:
            contents_num = add(
                b"<< /Length " + str(len(content)).encode()
                + b" >>\nstream\n" + content + b"\nendstream"
            )

        res = b"<< /Font << /F1 << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> >>"
        if xobj_entries:
            res += b" /XObject << " + b" ".join(xobj_entries) + b" >>"
        res += b" >>"

        page_num = add(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 "
            + _fmt(page.width) + b" " + _fmt(page.height) + b"] /Resources "
            + res + b" /Contents " + str(contents_num).encode() + b" 0 R >>"
        )
        page_obj_nums.append(page_num)

    objects[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    kids = b" ".join(str(n).encode() + b" 0 R" for n in page_obj_nums)
    objects[1] = (
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(page_obj_nums)).encode() + b" >>"
    )
    return objects


@lru_cache(maxsize=8)
def _cached_o(owner_pwd: bytes, user_pwd: bytes, r: int, bits: int) -> bytes:
    from karanta_ocr_spark.kernel.pdf_crypt import compute_o

    return compute_o(owner_pwd, user_pwd, r, bits)


def _enc_prepare(
    objects: list[bytes],
    encrypt: str,
    user_pwd: bytes,
    owner_pwd: bytes,
) -> dict:
    """Phase B1: standard-security-handler key material for one doc
    plus the list of stream-encryption work items ``(obj_idx, span,
    key, iv, plaintext, aes?)`` — separated from the cipher calls so
    a batch builder can fuse the items of MANY docs into single
    vectorized rc4_many / aes_cbc_encrypt_many passes."""
    import hashlib
    import re as _re

    from karanta_ocr_spark.kernel.pdf_crypt import (
        compute_key,
        object_key,
    )

    v, r, bits = {"rc4-40": (1, 2, 40), "rc4": (2, 3, 128),
                  "aes": (4, 4, 128)}[encrypt]
    p = -44  # typical print/modify restrictions
    fid = hashlib.md5(b"".join(objects)).digest()
    # /O depends only on the passwords and revision — constant across
    # a batch (memoized: its 20 sequential RC4 KSAs were half the
    # batch-build cost). /U depends on the per-doc key, so it is
    # batch-computed in build_pdfs via compute_u_many.
    o_entry = _cached_o(owner_pwd, user_pwd, r, bits)
    key = compute_key(user_pwd, o_entry, p, fid, r, bits)
    aes = encrypt == "aes"
    items = []
    for idx, body in enumerate(objects):
        num = idx + 1
        sm = _re.search(rb"stream\n(.*?)\nendstream", body, _re.S)
        if sm is None:
            continue
        k = object_key(key, num, 0, aes)
        iv = hashlib.md5(b"iv:%d:" % num + fid).digest()[:16] if aes else b""
        items.append((idx, sm.span(1), k, iv, sm.group(1)))
    return {
        "v": v, "r": r, "bits": bits, "aes": aes, "fid": fid,
        "o": o_entry, "u": None, "key": key, "p": p, "items": items,
    }


def _enc_finalize(objects: list[bytes], meta: dict, cts: list[bytes]) -> bytes:
    """Phase B2: patch each stream body with its ciphertext, append the
    /Encrypt dictionary, return the trailer additions."""
    import re as _re

    for (idx, (a, b), _k, _iv, _pt), ct in zip(meta["items"], cts):
        body = objects[idx]
        body = body[:a] + ct + body[b:]
        body = _re.sub(
            rb"/Length \d+", b"/Length " + str(len(ct)).encode(), body,
            count=1,
        )
        objects[idx] = body
    enc = b"<< /Filter /Standard /V " + str(meta["v"]).encode()
    enc += b" /R " + str(meta["r"]).encode()
    if meta["v"] != 1:
        enc += b" /Length " + str(meta["bits"]).encode()
    if meta["aes"]:
        enc += (
            b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
            b" /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
        )
    enc += (
        b" /O <" + meta["o"].hex().encode() + b"> /U <"
        + meta["u"].hex().encode() + b"> /P " + str(meta["p"]).encode() + b" >>"
    )
    objects.append(enc)
    enc_num = len(objects)
    fid = meta["fid"]
    return (
        b" /Encrypt " + str(enc_num).encode() + b" 0 R /ID [<"
        + fid.hex().encode() + b"> <" + fid.hex().encode() + b">]"
    )


def _encrypt_streams(items: list[tuple]) -> list[bytes]:
    """Vectorized cipher dispatch for prepared work items (possibly
    from MANY docs): one rc4_many pass for the RC4 items and one
    aes_cbc_encrypt_many pass for the AES items, results restored to
    input order."""
    from karanta_ocr_spark.kernel.pdf_crypt import (
        aes_cbc_encrypt_many,
        rc4_many,
    )

    rc4_ix = [i for i, it in enumerate(items) if not it[3]]
    aes_ix = [i for i, it in enumerate(items) if it[3]]
    out: list[bytes] = [b""] * len(items)
    if rc4_ix:
        cts = rc4_many(
            [items[i][2] for i in rc4_ix], [items[i][4] for i in rc4_ix]
        )
        for i, ct in zip(rc4_ix, cts):
            out[i] = ct
    if aes_ix:
        cts = aes_cbc_encrypt_many(
            [items[i][2] for i in aes_ix],
            [items[i][3] for i in aes_ix],
            [items[i][4] for i in aes_ix],
        )
        for i, ct in zip(aes_ix, cts):
            out[i] = ct
    return out


def _assemble(objects: list[bytes], trailer_extra: bytes) -> bytes:
    """Phase C: object bytes, xref table, trailer."""
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 " + str(len(objects) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += ("%010d 00000 n \n" % off).encode()
    out += (
        b"trailer\n<< /Size " + str(len(objects) + 1).encode()
        + b" /Root 1 0 R" + trailer_extra + b" >>\nstartxref\n"
        + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


def build_pdf(
    pages: list[PageSpec],
    compress: bool = False,
    encrypt: str | None = None,
    user_pwd: bytes = b"",
    owner_pwd: bytes = b"owner",
) -> bytes:
    """Serialize pages into PDF bytes (object numbers assigned
    deterministically; xref table included for form, though the
    parser scans sequentially).

    ``encrypt`` adds a standard-security-handler layer over every
    stream (``kernel/pdf_crypt.py`` — the same module the parser
    decrypts with, so round-trip tests also pin the two directions
    against each other): ``'rc4-40'`` (V1/R2), ``'rc4'``
    (V2/R3/128-bit) or ``'aes'`` (V4/R4/AESV2). The default empty
    *user_pwd* with a non-empty *owner_pwd* models the common crawled
    owner-locked document that opens freely. Everything stays
    deterministic: the file /ID is the MD5 of the plaintext bodies
    and AES IVs derive from (object number, /ID)."""
    return build_pdfs(
        [(pages, encrypt)], compress=compress,
        user_pwd=user_pwd, owner_pwd=owner_pwd,
    )[0]


def build_pdfs(
    specs: list[tuple[list[PageSpec], str | None]],
    compress: bool = False,
    user_pwd: bytes = b"",
    owner_pwd: bytes = b"owner",
) -> list[bytes]:
    """Batch builder: serialize many ``(pages, encrypt)`` docs with
    ONE vectorized cipher pass over every stream of every encrypted
    doc (``rc4_many`` / ``aes_cbc_encrypt_many`` lockstep across
    messages). Byte-identical to per-doc :func:`build_pdf` calls
    (pytest-pinned); the fixture queries build thousands of
    encrypted PDFs per Arrow batch, where the per-message scalar
    ciphers dominated the whole query's runtime."""
    from karanta_ocr_spark.kernel.pdf_crypt import compute_u_many

    docs = []
    flat_items: list[tuple] = []
    for pages, encrypt in specs:
        objects = _build_objects(pages, compress)
        meta = None
        if encrypt is not None:
            meta = _enc_prepare(objects, encrypt, user_pwd, owner_pwd)
            flat_items.extend(meta["items"])
        docs.append((objects, meta))
    # Batch /U across docs per revision (the 20-pass RC4 chain runs
    # once in numpy lockstep instead of per doc).
    by_r: dict[int, list] = {}
    for _objects, meta in docs:
        if meta is not None:
            by_r.setdefault(meta["r"], []).append(meta)
    for r, metas in by_r.items():
        us = compute_u_many(
            [m["key"] for m in metas], [m["fid"] for m in metas], r
        )
        for m, u in zip(metas, us):
            m["u"] = u
    cts = _encrypt_streams(flat_items)
    pos = 0
    out: list[bytes] = []
    for objects, meta in docs:
        trailer_extra = b""
        if meta is not None:
            n = len(meta["items"])
            trailer_extra = _enc_finalize(objects, meta, cts[pos : pos + n])
            pos += n
        out.append(_assemble(objects, trailer_extra))
    return out
