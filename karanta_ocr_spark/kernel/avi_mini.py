"""Minimal AVI (RIFF) container reader/writer for MJPEG video — pure
stdlib, like the sibling ``png_mini``/``jpeg_mini``/``pdf_mini``.

Motion-JPEG AVI is the one real video format this container can
honestly decode end-to-end: the container is a plain RIFF chunk walk
(public Microsoft 'AVI RIFF File Reference' layout) and every frame
is an ordinary JPEG, which :mod:`karanta_ocr_spark.kernel.jpeg_mini`
already decodes (baseline and progressive). The writer exists for
fixtures and tests — same pattern as the PDF/JPEG fixture encoders.

Reference scope note: the reference pipeline has no video stage
(karanta-ocr is documents-only); frame sampling belongs to the
beyond-reference multimodal suite and was previously an honest stub.

Layout emitted/understood::

    RIFF <sz> 'AVI '
      LIST <sz> 'hdrl'
        'avih' <56>  dwMicroSecPerFrame .. dwTotalFrames .. dwWidth dwHeight
        LIST <sz> 'strl'
          'strh' <56>  fccType='vids' fccHandler='MJPG' .. dwRate ..
          'strf' <40>  BITMAPINFOHEADER (biCompression='MJPG')
      LIST <sz> 'movi'
        '00dc' <sz> <jpeg bytes>  (chunks padded to even length)
      'idx1' ...   (written; the reader does not need it)

The reader tolerates missing 'idx1', missing 'strl', and unknown
chunks; it hard-fails (:class:`AviError`) only on a broken RIFF
envelope. Frame payloads are returned as-is — decoding is the
caller's business, so a corrupt single frame cannot kill the parse.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_U32 = struct.Struct("<I")


class AviError(ValueError):
    """Unparseable AVI container."""


@dataclass
class AviVideo:
    width: int
    height: int
    us_per_frame: int
    total_frames: int  # dwTotalFrames as declared by the header
    frames: list[bytes] = field(default_factory=list)  # '00dc/00db' payloads


def _chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) walking [start, end)."""
    i = start
    while i + 8 <= end:
        fcc = buf[i : i + 4]
        (size,) = _U32.unpack(buf[i + 4 : i + 8])
        body = i + 8
        if body + size > end:
            size = max(0, end - body)  # truncated download: clamp
        yield fcc, body, size
        i = body + size + (size & 1)  # chunks are even-aligned


def parse_avi(data: bytes) -> AviVideo:
    """Parse an AVI byte string into header fields + raw frame bytes."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI file")
    (riff_size,) = _U32.unpack(data[4:8])
    end = min(len(data), 8 + riff_size)
    width = height = us_per_frame = total = 0
    frames: list[bytes] = []

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        nonlocal width, height, us_per_frame, total
        if depth > 16:  # crafted LIST nesting: real AVIs use ≤3 levels
            return      # (RecursionError is not AviError — bound it)
        for fcc, body, size in _chunks(data, lo, hi):
            if fcc == b"LIST" and size >= 4:
                kind = data[body : body + 4]
                if kind in (b"hdrl", b"movi", b"strl", b"rec "):
                    walk(body + 4, body + size, depth + 1)
            elif fcc == b"avih" and size >= 40:
                f = struct.unpack_from("<10I", data, body)
                us_per_frame, total = f[0], f[4]
                width, height = f[8], f[9]
            elif fcc[2:4] in (b"dc", b"db") and fcc[:2].isdigit():
                frames.append(data[body : body + size])

    walk(12, end)
    return AviVideo(
        width=width,
        height=height,
        us_per_frame=us_per_frame,
        total_frames=total,
        frames=frames,
    )


def _chunk(fcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fcc + _U32.pack(len(body)) + body + pad


def build_mjpeg_avi(
    frames: list[bytes], width: int, height: int, us_per_frame: int = 40000
) -> bytes:
    """Assemble JPEG-encoded *frames* into an MJPEG AVI."""
    n = len(frames)
    rate = max(1, round(1_000_000 / us_per_frame)) if us_per_frame else 25
    avih = struct.pack(
        "<14I",
        us_per_frame, 0, 0, 0x10, n, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, rate, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)
    movi_body = b"movi" + b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _chunk(b"LIST", movi_body)
    # idx1: one entry per frame (fourcc, flags=KEYFRAME, offset from
    # 'movi' tag, size) — players want it; our reader ignores it.
    off = 4
    idx_entries = []
    for f in frames:
        idx_entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)
