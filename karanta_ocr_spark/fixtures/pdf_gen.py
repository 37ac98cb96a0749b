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
    objects: list[bytes] = []  # bodies, 1-indexed object numbers

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

    trailer_extra = b""
    if encrypt is not None:
        import hashlib
        import re as _re

        from karanta_ocr_spark.kernel.pdf_crypt import (
            aes_cbc_encrypt,
            compute_key,
            compute_o,
            compute_u,
            object_key,
            rc4,
        )

        v, r, bits = {"rc4-40": (1, 2, 40), "rc4": (2, 3, 128),
                      "aes": (4, 4, 128)}[encrypt]
        p = -44  # typical print/modify restrictions
        fid = hashlib.md5(b"".join(objects)).digest()
        o_entry = compute_o(owner_pwd, user_pwd, r, bits)
        key = compute_key(user_pwd, o_entry, p, fid, r, bits)
        u_entry = compute_u(key, fid, r)
        aes = encrypt == "aes"
        for idx, body in enumerate(objects):
            num = idx + 1
            sm = _re.search(rb"stream\n(.*?)\nendstream", body, _re.S)
            if sm is None:
                continue
            k = object_key(key, num, 0, aes)
            if aes:
                iv = hashlib.md5(b"iv:%d:" % num + fid).digest()[:16]
                ct = aes_cbc_encrypt(k, iv, sm.group(1))
            else:
                ct = rc4(k, sm.group(1))
            body = body[: sm.start(1)] + ct + body[sm.end(1):]
            body = _re.sub(
                rb"/Length \d+", b"/Length " + str(len(ct)).encode(), body,
                count=1,
            )
            objects[idx] = body
        enc = b"<< /Filter /Standard /V " + str(v).encode()
        enc += b" /R " + str(r).encode()
        if v != 1:
            enc += b" /Length " + str(bits).encode()
        if aes:
            enc += (
                b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen"
                b" /Length 16 >> >> /StmF /StdCF /StrF /StdCF"
            )
        enc += (
            b" /O <" + o_entry.hex().encode() + b"> /U <"
            + u_entry.hex().encode() + b"> /P " + str(p).encode() + b" >>"
        )
        enc_num = add(enc)
        trailer_extra = (
            b" /Encrypt " + str(enc_num).encode() + b" 0 R /ID [<"
            + fid.hex().encode() + b"> <" + fid.hex().encode() + b">]"
        )

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
