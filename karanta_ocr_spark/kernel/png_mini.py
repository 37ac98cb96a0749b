"""Pure-stdlib PNG decode (zlib inflate + scanline unfilter).

The container has no Pillow/libpng, but PNG's format is simple enough
that the baseline profile decodes in ~100 lines of stdlib: chunk walk,
one ``zlib.decompress`` over the concatenated IDAT stream, then the
five scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6). This
makes the multimodal path ``decode_images → grayscale_images →
resize_images`` run un-faked end-to-end for PNG payloads (the
reference decodes page renders with PIL, ``karanta/data/
utils.py:186-225``); JPEG/video stay honestly stubbed behind their
codec-gated paths.

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. Everything else raises
``PngError`` — callers treat that like any other undecodable payload.
Output is always row-major RGB (alpha dropped, gray replicated).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunks(data: bytes):
    i = len(_SIG)
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        if len(body) < length:
            raise PngError("truncated chunk")
        yield ctype, body
        i += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """PNG bytes → ``(width, height, row-major RGB bytes)``."""
    if data[: len(_SIG)] != _SIG:
        raise PngError("bad signature")
    width = height = None
    color_type = None
    palette = b""
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            if len(body) < 13:
                raise PngError("truncated IHDR")
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise PngError("nonstandard compression/filter method")
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None:
        raise PngError("missing IHDR")
    if not idat:
        raise PngError("missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt stream
        raise PngError(f"inflate failed: {e}") from e

    ch = _CHANNELS[color_type]
    stride = width * ch
    if len(raw) < height * (stride + 1):
        raise PngError("short pixel data")

    # Unfilter scanlines. bpp == channels at depth 8.
    prev = bytearray(stride)
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                c = prev[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        elif ftype != 0:
            raise PngError(f"bad filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line

    # → RGB
    if color_type == 2:
        return width, height, bytes(out)
    rgb = bytearray(width * height * 3)
    if color_type == 0:
        for i, v in enumerate(out):
            rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = v
    elif color_type == 4:
        for i in range(width * height):
            v = out[2 * i]
            rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = v
    elif color_type == 6:
        for i in range(width * height):
            rgb[3 * i : 3 * i + 3] = out[4 * i : 4 * i + 3]
    elif color_type == 3:
        if not palette:
            raise PngError("palette image without PLTE")
        for i in range(width * height):
            j = 3 * out[i]
            if j + 3 > len(palette):
                raise PngError("palette index out of range")
            rgb[3 * i : 3 * i + 3] = palette[j : j + 3]
    return width, height, bytes(rgb)


def encode_png(width: int, height: int, rgb: bytes, filter_type: int = 0) -> bytes:
    """Minimal RGB PNG encoder (test fixtures + golden generation).
    *filter_type* applies the given filter to every scanline so decode
    tests can exercise each unfilter path."""
    ch = 3
    stride = width * ch
    if len(rgb) != height * stride:
        raise ValueError("rgb length mismatch")
    lines = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = rgb[y * stride : (y + 1) * stride]
        if filter_type == 0:
            enc = line
        elif filter_type == 1:
            enc = bytes(
                (line[x] - (line[x - ch] if x >= ch else 0)) & 0xFF
                for x in range(stride)
            )
        elif filter_type == 2:
            enc = bytes((line[x] - prev[x]) & 0xFF for x in range(stride))
        elif filter_type == 3:
            enc = bytes(
                (line[x] - (((line[x - ch] if x >= ch else 0) + prev[x]) >> 1)) & 0xFF
                for x in range(stride)
            )
        elif filter_type == 4:
            enc = bytes(
                (
                    line[x]
                    - _paeth(
                        line[x - ch] if x >= ch else 0,
                        prev[x],
                        prev[x - ch] if x >= ch else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        else:
            raise ValueError(f"bad filter {filter_type}")
        lines.append(filter_type)
        lines.extend(enc)
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
