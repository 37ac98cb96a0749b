"""Minimal animated-GIF decoder/encoder — pure stdlib, like the
sibling ``png_mini``/``jpeg_mini``/``avi_mini``.

GIF is the third major web image format (after JPEG/PNG) and the one
"video-ish" format crawls actually contain in volume. The format is
public (GIF89a specification): logical screen descriptor + optional
global color table, then a block stream of extensions (graphic
control: per-frame delay, disposal, transparency) and image
descriptors (optional local color table, optional interlacing, LZW-
compressed indexed pixels in 255-byte sub-blocks).

Decoder scope (honest): 87a/89a, global/local color tables,
interlaced and non-interlaced frames, disposal methods 0/1
(none/keep: composite over previous canvas), 2 (restore to
background: transparent-black fill of the frame rect), and
transparency. Disposal 3 (restore-to-previous) is rare and treated as
keep. Frames are emitted as full-canvas row-major RGB after
compositing — what a frame sampler wants.

The encoder exists for fixtures/tests: grayscale frames, 256-entry
palette, LZW with periodic CLEAR (spec-conformant output, not
maximally compressed).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


class GifError(ValueError):
    """Unparseable GIF payload."""


@dataclass
class GifAnim:
    width: int
    height: int
    #: (delay_centiseconds, row-major RGB bytes of the full canvas)
    frames: list[tuple[int, bytes]] = field(default_factory=list)
    #: Image descriptors present in the container — can exceed
    #: ``len(frames)`` when decoding was capped; a sampler should
    #: report THIS as the frame count (matching the AVI path, which
    #: reports the container count, not the decoded count).
    total_frames: int = 0


def _color_table(data: bytes, off: int, flags: int) -> tuple[list[bytes], int]:
    if not flags & 0x80:
        return [], off
    n = 2 << (flags & 0x07)
    end = off + 3 * n
    if end > len(data):
        raise GifError("truncated color table")
    return [data[i : i + 3] for i in range(off, end, 3)], end


def _sub_blocks(data: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate the 255-byte sub-block chain starting at *off*."""
    out = bytearray()
    while True:
        if off >= len(data):
            raise GifError("truncated sub-blocks")
        n = data[off]
        off += 1
        if n == 0:
            return bytes(out), off
        out += data[off : off + n]
        if len(out) > 1 << 26:  # 64 MiB: hostile-input bound
            raise GifError("sub-block chain too large")
        off += n


def _lzw_decode(min_code: int, comp: bytes, max_pixels: int) -> bytes:
    """GIF-flavor LZW → index bytes (bounded by *max_pixels*)."""
    if not 2 <= min_code <= 11:
        raise GifError(f"bad LZW min code size {min_code}")
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    # Bit reader: LSB-first across the byte stream.
    acc = nbits = pos = 0

    def init_table():
        return {i: bytes([i]) for i in range(clear)}

    table = init_table()
    code_size = min_code + 1
    next_code = eoi + 1
    prev: bytes | None = None
    n = len(comp)
    while True:
        while nbits < code_size:
            if pos >= n:
                return bytes(out[:max_pixels])  # truncated stream: best effort
            acc |= comp[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = init_table()
            code_size = min_code + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out[:max_pixels])
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise GifError("bad first LZW code")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise GifError("LZW code out of range")
        out += entry
        if len(out) >= max_pixels:
            return bytes(out[:max_pixels])
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: bytes, w: int, h: int) -> bytes:
    rows = [idx[r * w : (r + 1) * w] for r in range(h)]
    out: list[bytes] = [b""] * h
    src = 0
    for start, step in _INTERLACE_PASSES:
        for r in range(start, h, step):
            out[r] = rows[src]
            src += 1
    return b"".join(out)


def decode_gif(
    data: bytes, max_frames: int = 256, max_total_pixels: int = 1 << 26
) -> GifAnim:
    """Decode an (animated) GIF to full-canvas RGB frames.

    *max_frames* bounds how many frames are composited (a sampler
    that needs frame k only has to pay for frames ≤ k — GIF frames
    are deltas, so earlier frames cannot be skipped);
    *max_total_pixels* (default 64M) bounds canvas×frames work so a
    forged-dimension file cannot grind the pure-Python compositor."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad GIF signature")
    if len(data) < 13:
        raise GifError("truncated header")
    w, h = struct.unpack_from("<HH", data, 6)
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise GifError(f"implausible dims {w}x{h}")
    if w * h > max_total_pixels:
        # Even one frame exceeds the budget — and the canvas alone
        # would be a multi-hundred-MB allocation per row.
        raise GifError(f"canvas {w}x{h} exceeds pixel budget")
    max_frames = min(max_frames, max_total_pixels // (w * h))
    flags, bg_idx = data[10], data[11]
    gct, off = _color_table(data, 13, flags)
    canvas = bytearray(w * h * 3)  # composited RGB canvas, starts black
    anim = GifAnim(width=w, height=h)
    delay_cs = 0
    transparent: int | None = None
    disposal = 0
    while off < len(data) and len(anim.frames) < max_frames:
        b = data[off]
        off += 1
        if b == 0x3B:  # trailer
            break
        try:
            off, delay_cs, transparent, disposal = _block(
                data, off, b, w, h, gct, bg_idx, canvas, anim,
                delay_cs, transparent, disposal,
            )
        except GifError:
            if anim.frames:
                anim.total_frames = len(anim.frames)
                return anim  # truncated download: keep recovered frames
            raise
    # Count image descriptors past the decode cap WITHOUT decoding,
    # so total_frames reports the container truth even when
    # compositing stopped early.
    total = len(anim.frames)
    while off < len(data):
        b = data[off]
        off += 1
        if b == 0x3B:
            break
        try:
            if b == 0x21:
                if off >= len(data):
                    break
                off += 1  # label
                _, off = _sub_blocks(data, off)
            elif b == 0x2C:
                if off + 9 > len(data):
                    break
                iflags = data[off + 8]
                off += 9
                _, off = _color_table(data, off, iflags)
                if off >= len(data):
                    break
                off += 1  # LZW min code size
                _, off = _sub_blocks(data, off)
                total += 1
            else:
                break
        except GifError:
            break
    anim.total_frames = total
    return anim


def _block(
    data: bytes, off: int, b: int, w: int, h: int, gct, bg_idx: int,
    canvas: bytearray, anim: GifAnim,
    delay_cs: int, transparent: int | None, disposal: int,
) -> tuple[int, int, int | None, int]:
    """Parse one block at *off* (tag *b* already consumed); composite
    image blocks onto *canvas*/*anim*. Returns the updated
    (off, delay_cs, transparent, disposal)."""
    if b == 0x21:  # extension
        if off >= len(data):
            raise GifError("truncated extension")
        label = data[off]
        off += 1
        body, off = _sub_blocks(data, off)
        if label == 0xF9 and len(body) >= 4:  # graphic control
            gflags = body[0]
            delay_cs = struct.unpack_from("<H", body, 1)[0]
            transparent = body[3] if gflags & 1 else None
            disposal = (gflags >> 2) & 0x07
        return off, delay_cs, transparent, disposal
    if b != 0x2C:  # unknown block: unrecoverable framing
        raise GifError(f"unexpected block 0x{b:02x}")
    if off + 9 > len(data):
        raise GifError("truncated image descriptor")
    fx, fy, fw, fh = struct.unpack_from("<4H", data, off)
    iflags = data[off + 8]
    off += 9
    lct, off = _color_table(data, off, iflags)
    pal = lct or gct
    if not pal:
        raise GifError("no color table")
    if off >= len(data):
        raise GifError("truncated image data")
    min_code = data[off]
    off += 1
    comp, off = _sub_blocks(data, off)
    idx = _lzw_decode(min_code, comp, fw * fh)
    if len(idx) < fw * fh:
        idx = idx + bytes(fw * fh - len(idx))  # truncated: pad
    if iflags & 0x40:
        idx = _deinterlace(idx, fw, fh)
    # Composite the frame rect onto the canvas.
    for r in range(fh):
        cy = fy + r
        if cy >= h:
            break
        row = idx[r * fw : (r + 1) * fw]
        base = (cy * w + fx) * 3
        for c, pi in enumerate(row):
            if fx + c >= w:
                break
            if pi == transparent:
                continue
            rgb = pal[pi] if pi < len(pal) else b"\x00\x00\x00"
            o = base + c * 3
            canvas[o : o + 3] = rgb
    anim.frames.append((delay_cs, bytes(canvas)))
    if disposal == 2:  # restore to background: clear the rect
        bg = (
            pal[bg_idx]
            if (not lct and bg_idx < len(pal) and transparent != bg_idx)
            else b"\x00\x00\x00"
        )
        for r in range(fh):
            cy = fy + r
            if cy >= h:
                break
            base = (cy * w + fx) * 3
            for c in range(min(fw, w - fx)):
                o = base + c * 3
                canvas[o : o + 3] = bg
    return off, 0, None, 0  # per-frame control state resets after use


# ---------------------------------------------------------------- writer
def _lzw_encode(min_code: int, idx: bytes) -> bytes:
    """Spec-conformant LZW: literal codes with a CLEAR whenever the
    table would need to grow past the initial code size — simple,
    always valid, ~1 byte/pixel."""
    clear = 1 << min_code
    eoi = clear + 1
    code_size = min_code + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    budget = (1 << code_size) - eoi - 2  # codes before the size would bump
    used = 0
    for px in idx:
        put(px)
        used += 1
        if used >= budget:  # decoder's next_code approaches the bump: reset
            put(clear)
            used = 0
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_gray(
    width: int, height: int, frames: list[bytes], delay_cs: int = 4
) -> bytes:
    """Grayscale frames (width*height bytes each) → animated GIF89a
    with a 256-gray global palette and a per-frame graphic control."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 256 entries
    for v in range(256):
        out += bytes([v, v, v])
    if len(frames) > 1:  # Netscape loop extension, as real files have
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for gray in frames:
        if len(gray) != width * height:
            raise GifError("frame size mismatch")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<4H", 0, 0, width, height) + b"\x00"
        out += bytes([8]) + _blocks(_lzw_encode(8, gray))
    out += b"\x3b"
    return bytes(out)
