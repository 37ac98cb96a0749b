"""Pure-stdlib baseline + progressive JPEG (JFIF) decode.

Finishes the real-image-decode story the PNG decoder started
(``kernel/png_mini.py``): the container has no PIL/libjpeg, but
Huffman-coded JPEG — the overwhelming majority of crawled web
images — is decodable with stdlib only: marker walk, Huffman entropy
decode with byte-unstuffing, DC prediction, dequantize + dezigzag,
float IDCT, chroma upsampling, YCbCr→RGB.

Supported: baseline DCT (SOF0) and progressive DCT (SOF2 — spectral
selection AND successive approximation: DC/AC first + refinement
scans, EOB runs, per-scan table redefinition), 8-bit, 1-component
grayscale and 3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0 sampling,
restart markers. Arithmetic coding, 12-bit, lossless, and
hierarchical raise ``JpegError`` — callers treat that like any
undecodable payload (the PIL-gated fallback in
``operators/multimodal.decode_images``).

Matching minimal encoders (baseline gray and a 5-scan progressive
gray: DC first/refine at Al=1→0, AC first split 1–5/6–63, AC refine
with buffered correction bits and EOB-run accumulation, following
the public libjpeg jcphuff.c algorithm) exist for fixtures: with
all-ones quant tables the two encodings carry IDENTICAL final
coefficients, so a progressive fixture must decode to the exact
pixel bytes of its baseline twin — which pins every progressive scan
path without a reference codec in the container.
"""

from __future__ import annotations

import math
import struct

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: IDCT basis: cos((2x+1)u·π/16) scaled by the DCT-II normalization.
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) * (math.sqrt(0.5) if u == 0 else 1.0)
     for u in range(8)]
    for x in range(8)
]


class JpegError(ValueError):
    pass


class _Huff:
    """Canonical Huffman table → (code length, code) lookup dict."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(vals):
                    raise JpegError("huffman table overflow")
                self.lookup[(length, code)] = vals[k]
                k += 1
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RSTn markers surface as aligned restarts."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.buf = 0
        self.n = 0
        #: True once synthetic zero bits were served past the end of
        #: the entropy data (input exhausted or EOI/segment reached) —
        #: a VALID stream only pads inside its final MCU, so a row
        #: loop that sees this flag mid-image is decoding a truncated/
        #: dimension-forged file and should stop (a 16x9480 forged SOF
        #: otherwise grinds ~1200 empty MCU rows through the IDCT).
        self.padded = False

    def _fill(self) -> None:
        while self.n <= 24:
            if self.i >= len(self.d):
                self.buf = (self.buf << 8) | 0
                self.n += 8
                self.padded = True
                continue
            b = self.d[self.i]
            if b == 0xFF:
                nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else 0xD9
                if nxt == 0x00:
                    self.i += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via sync_restart()
                    self.buf = (self.buf << 8) | 0
                    self.n += 8
                    continue
                else:  # EOI or next segment: pad with zeros
                    self.buf = (self.buf << 8) | 0
                    self.n += 8
                    self.padded = True
                    continue
            else:
                self.i += 1
            self.buf = (self.buf << 8) | b
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.buf >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            v = table.lookup.get((length, code))
            if v is not None:
                return v
        raise JpegError("bad huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.buf = 0
        self.n = 0
        while self.i + 1 < len(self.d):
            if self.d[self.i] == 0xFF and 0xD0 <= self.d[self.i + 1] <= 0xD7:
                self.i += 2
                return
            self.i += 1
        raise JpegError("missing restart marker")


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map *size*-bit magnitude to signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _idct2d(coef: list[float]) -> list[int]:
    """8×8 inverse DCT → level-shifted clamped samples (row-major)."""
    # separable: rows then cols
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8 : y * 8 + 8]
        for x in range(8):
            cx = _COS[x]
            tmp[y * 8 + x] = (
                row[0] * cx[0] + row[1] * cx[1] + row[2] * cx[2] + row[3] * cx[3]
                + row[4] * cx[4] + row[5] * cx[5] + row[6] * cx[6] + row[7] * cx[7]
            )
    out = [0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            cy = _COS[y]
            s = (
                col[0] * cy[0] + col[1] * cy[1] + col[2] * cy[2] + col[3] * cy[3]
                + col[4] * cy[4] + col[5] * cy[5] + col[6] * cy[6] + col[7] * cy[7]
            ) / 4.0 + 128.0
            v = int(s + 0.5) if s > 0 else int(s - 0.5)
            out[y * 8 + x] = 0 if v < 0 else (255 if v > 255 else v)
    return out


def _planes_to_rgb(
    comps: list[dict], width: int, height: int, hmax: int, vmax: int
) -> bytes:
    """Assemble per-component sample planes into row-major RGB bytes
    (grayscale replicate or YCbCr→RGB with nearest-neighbor chroma
    upsampling)."""
    rgb = bytearray(width * height * 3)
    if len(comps) == 1:
        c = comps[0]
        plane, pw = c["plane"], c["pw"]
        for y in range(height):
            base = y * pw
            for x in range(width):
                v = plane[base + x]
                o = 3 * (y * width + x)
                rgb[o] = rgb[o + 1] = rgb[o + 2] = v
    elif len(comps) == 3:
        cy, cb, cr = comps
        for y in range(height):
            for x in range(width):
                Y = cy["plane"][(y * cy["v"] // vmax) * cy["pw"] + (x * cy["h"] // hmax)]
                Cb = cb["plane"][(y * cb["v"] // vmax) * cb["pw"] + (x * cb["h"] // hmax)]
                Cr = cr["plane"][(y * cr["v"] // vmax) * cr["pw"] + (x * cr["h"] // hmax)]
                r = Y + 1.402 * (Cr - 128)
                g = Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128)
                b = Y + 1.772 * (Cb - 128)
                o = 3 * (y * width + x)
                rgb[o] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
                rgb[o + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
                rgb[o + 2] = 0 if b < 0 else (255 if b > 255 else int(b + 0.5))
    else:
        raise JpegError(f"{len(comps)}-component images unsupported")
    return bytes(rgb)


#: Pixel budget for this pure-Python decoder (16.7M ≈ a 5000x3300
#: scan). A forged 65535x65535 SOF would otherwise allocate
#: multi-GB coefficient/plane/RGB buffers per row (the progressive
#: path's per-component coefficient array alone would be ~17 GB) —
#: a typed error keeps the row a visible failure instead of an
#: executor OOM. Production swaps in libjpeg behind the same seam.
_MAX_PIXELS = 1 << 24


def _parse_sof_body(body: bytes) -> tuple[int, int, list[dict]]:
    prec = body[0]
    if prec != 8:
        raise JpegError("non-8-bit precision")
    height, width = struct.unpack(">HH", body[1:5])
    if width * height > _MAX_PIXELS:
        raise JpegError(f"{width}x{height} exceeds decoder pixel budget")
    if not width or not height:
        raise JpegError("zero dimension")
    nc = body[5]
    comps = []
    for c in range(nc):
        if 9 + 3 * c > len(body):
            raise JpegError("truncated SOF")
        cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
        h_f, v_f = hv >> 4, hv & 0xF
        if not (1 <= h_f <= 4 and 1 <= v_f <= 4):
            raise JpegError(f"bad sampling factors {h_f}x{v_f}")
        comps.append({"id": cid, "h": h_f, "v": v_f, "tq": tq})
    return width, height, comps


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """JPEG bytes → ``(width, height, row-major RGB bytes)``.
    Dispatches SOF0 → the streaming baseline path below, SOF2 →
    :func:`_decode_progressive`."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("bad SOI")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    i = 2
    n = len(data)
    scan_pos = -1
    scan_map: list[tuple[int, int, int]] = []
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                qt[tq] = list(body[j + 1 : j + 65])
                j += 65
        elif marker == 0xC0:  # SOF0 baseline
            width, height, comps = _parse_sof_body(body)
        elif marker == 0xC2:  # SOF2 progressive — coefficient-accumulating path
            return _decode_progressive(data)
        elif marker in (0xC1, 0xC3, 0xC9, 0xCA, 0xCB):
            raise JpegError("only SOF0/SOF2 supported")
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = body[j + 17 : j + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_map = []
            for c in range(ns):
                cs, tables = body[1 + 2 * c : 3 + 2 * c]
                scan_map.append((cs, tables >> 4, tables & 0xF))
            scan_pos = i + 2 + seg_len
            break
        i += 2 + seg_len
    if not comps or scan_pos < 0 or not width or not height:
        raise JpegError("missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_map:
        c = by_id.get(cs)
        if c is None:
            raise JpegError("scan references unknown component")
        c["td"], c["ta"] = td, ta
        order.append(c)
        # per-component plane, MCU-padded
        c["pw"] = mcux * c["h"] * 8
        c["ph"] = mcuy * c["v"] * 8
        c["plane"] = bytearray(c["pw"] * c["ph"])
        c["pred"] = 0

    rd = _BitReader(data, scan_pos)
    mcu_count = 0
    # Entropy budget: a block costs at least 2 bits (1-bit DC code +
    # 1-bit EOB), so the available entropy bytes bound how many blocks
    # a VALID stream can encode. Forged SOF dimensions (one byte flip
    # makes 16x8 claim 16x9480 or 18704x8) otherwise grind thousands
    # of empty MCUs through the pure-Python IDCT after the data ends.
    # (The reader's `padded` flag alone cannot gate this: _fill
    # pre-fetches up to 4 bytes, so padding legitimately begins while
    # real buffered bits remain for the final MCUs.)
    blocks_per_mcu = sum(c["h"] * c["v"] for c in comps)
    block_budget = (len(data) - scan_pos) * 8 // 2 + 64
    blocks_done = 0
    for my in range(mcuy):
        if blocks_done > block_budget:
            break  # more blocks than the entropy data could encode
        for mx in range(mcux):
            blocks_done += blocks_per_mcu
            if blocks_done > block_budget:
                break  # forged WIDTH: one row can exceed the budget
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.sync_restart()
                for c in order:
                    c["pred"] = 0
            mcu_count += 1
            for c in order:
                q = qt.get(c["tq"])
                if q is None:
                    raise JpegError("missing quant table")
                dc_t = huff_dc.get(c["td"])
                ac_t = huff_ac.get(c["ta"])
                if dc_t is None or ac_t is None:
                    raise JpegError("missing huffman table")
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        coef = [0.0] * 64
                        size = rd.huff(dc_t)
                        diff = _extend(rd.bits(size), size)
                        c["pred"] += diff
                        coef[0] = c["pred"] * q[0]
                        k = 1
                        while k < 64:
                            rs = rd.huff(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC index out of range")
                            coef[_ZIGZAG[k]] = _extend(rd.bits(s), s) * q[k]
                            k += 1
                        px = _idct2d(coef)
                        ox = (mx * c["h"] + bxi) * 8
                        oy = (my * c["v"] + byi) * 8
                        pw = c["pw"]
                        plane = c["plane"]
                        for yy in range(8):
                            row = (oy + yy) * pw + ox
                            plane[row : row + 8] = bytes(px[yy * 8 : yy * 8 + 8])

    return width, height, _planes_to_rgb(comps, width, height, hmax, vmax)


# ---------------------------------------------------------- progressive
def _decode_progressive(data: bytes) -> tuple[int, int, bytes]:
    """Progressive (SOF2) decode: walk EVERY scan, accumulating raw
    (undequantized) coefficients per block across spectral-selection
    and successive-approximation passes, then dequantize + IDCT once
    at the end. Tables may be redefined between scans (the common
    libjpeg output shape); restart intervals apply per scan."""
    from array import array

    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    hmax = vmax = 1
    mcux = mcuy = 0
    allocated = False
    saw_scan = False
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        body = data[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0xF
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                qt[tq] = list(body[j + 1 : j + 65])
                j += 65
        elif marker == 0xC2:
            width, height, comps = _parse_sof_body(body)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC9, 0xCA, 0xCB):
            raise JpegError("mixed/unsupported SOF in progressive stream")
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = body[j + 17 : j + 17 + nv]
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:
            if not comps or not width or not height:
                raise JpegError("SOS before SOF2")
            if not allocated:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (width + 8 * hmax - 1) // (8 * hmax)
                mcuy = (height + 8 * vmax - 1) // (8 * vmax)
                for c in comps:
                    # MCU-padded block grid (interleaved scans) and the
                    # component's own block grid (non-interleaved scans
                    # iterate only the real blocks, per spec A.2.2).
                    c["bw"] = mcux * c["h"]
                    c["bh"] = mcuy * c["v"]
                    cw = (width * c["h"] + hmax - 1) // hmax
                    ch = (height * c["v"] + vmax - 1) // vmax
                    c["nbw"] = (cw + 7) // 8
                    c["nbh"] = (ch + 7) // 8
                    c["coef"] = array("i", bytes(4 * c["bw"] * c["bh"] * 64))
                allocated = True
            ns = body[0]
            by_id = {c["id"]: c for c in comps}
            sel = []
            for s_i in range(ns):
                cs, tables = body[1 + 2 * s_i : 3 + 2 * s_i]
                c = by_id.get(cs)
                if c is None:
                    raise JpegError("scan references unknown component")
                c["td"], c["ta"] = tables >> 4, tables & 0xF
                sel.append(c)
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            if ss > se or se > 63 or al > 13:
                raise JpegError("bad spectral selection")
            if ss > 0 and ns != 1:
                raise JpegError("interleaved AC scan forbidden")
            i = _progressive_scan(
                data, i + 2 + seg_len, sel, ss, se, ah, al,
                restart_interval, huff_dc, huff_ac, mcux, mcuy,
            )
            saw_scan = True
            continue
        i += 2 + seg_len
    if not saw_scan:
        raise JpegError("progressive stream without scans")

    # dequantize + IDCT every (MCU-padded) block into sample planes
    for c in comps:
        q = qt.get(c["tq"])
        if q is None:
            raise JpegError("missing quant table")
        c["pw"] = c["bw"] * 8
        c["ph"] = c["bh"] * 8
        plane = bytearray(c["pw"] * c["ph"])
        coefs = c["coef"]
        pw = c["pw"]
        for by in range(c["bh"]):
            for bx in range(c["bw"]):
                base = (by * c["bw"] + bx) * 64
                block = [0.0] * 64
                nz = False
                for k in range(64):
                    v = coefs[base + _ZIGZAG[k]]
                    if v:
                        block[_ZIGZAG[k]] = v * q[k]
                        nz = True
                px = _FLAT128 if not nz else _idct2d(block)
                ox, oy = bx * 8, by * 8
                for yy in range(8):
                    row = (oy + yy) * pw + ox
                    plane[row : row + 8] = bytes(px[yy * 8 : yy * 8 + 8])
        c["plane"] = plane
    return width, height, _planes_to_rgb(comps, width, height, hmax, vmax)


#: all-zero coefficient block → constant level-shift gray (IDCT of 0).
_FLAT128 = [128] * 64


def _progressive_scan(
    data: bytes,
    pos: int,
    sel: list[dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    huff_dc: dict[int, _Huff],
    huff_ac: dict[int, _Huff],
    mcux: int,
    mcuy: int,
) -> int:
    """Entropy-decode one progressive scan into the selected
    components' coefficient arrays; returns the offset of the next
    marker after the scan's entropy data."""
    rd = _BitReader(data, pos)
    for c in sel:
        c["pred"] = 0
    state = {"eobrun": 0}

    def block(c: dict, by: int, bx: int) -> None:
        coef = c["coef"]
        base = (by * c["bw"] + bx) * 64
        if ss == 0:
            if ah == 0:  # DC first
                dc_t = huff_dc.get(c.get("td"))
                if dc_t is None:
                    raise JpegError("missing huffman table")
                size = rd.huff(dc_t)
                c["pred"] += _extend(rd.bits(size), size)
                coef[base] = c["pred"] << al
            else:  # DC refinement: one bit per block
                if rd.bits(1):
                    coef[base] |= 1 << al
            return
        ac_t = huff_ac.get(c.get("ta"))
        if ac_t is None:
            raise JpegError("missing huffman table")
        if ah == 0:  # AC first (band all-zero before this scan)
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            k = ss
            while k <= se:
                rs = rd.huff(ac_t)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r < 15:  # EOBn: run of (1<<r)+bits(r) all-EOB blocks
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += rd.bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise JpegError("AC index out of band")
                coef[base + _ZIGZAG[k]] = _extend(rd.bits(s), s) << al
                k += 1
            return
        # AC refinement (public libjpeg jdphuff.c decode_mcu_AC_refine
        # shape): newly-significant coefficients arrive as s=1 codes;
        # every already-nonzero coefficient passed on the way emits a
        # correction bit; EOB runs cover whole blocks but still carry
        # correction bits for their nonzero history.
        p1 = 1 << al
        m1 = -1 << al

        def correct(z: int) -> None:
            if rd.bits(1) and (coef[z] & p1) == 0:
                coef[z] += p1 if coef[z] >= 0 else m1

        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = rd.huff(ac_t)
                r, s = rs >> 4, rs & 0xF
                val = 0
                if s == 0:
                    if r < 15:
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += rd.bits(r)
                        break
                    # r == 15 (ZRL): pass 16 zero-history coefficients
                elif s == 1:
                    val = p1 if rd.bits(1) else m1
                else:
                    raise JpegError("bad AC refinement code")
                while k <= se:
                    z = base + _ZIGZAG[k]
                    if coef[z] != 0:
                        correct(z)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    coef[base + _ZIGZAG[k]] = val
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                z = base + _ZIGZAG[k]
                if coef[z] != 0:
                    correct(z)
                k += 1
            state["eobrun"] -= 1

    count = 0
    if len(sel) == 1:
        c = sel[0]
        # Non-interleaved: the component's own block grid, not the
        # MCU-padded one.
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                if restart_interval and count and count % restart_interval == 0:
                    rd.sync_restart()
                    c["pred"] = 0
                    state["eobrun"] = 0
                count += 1
                block(c, by, bx)
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and count and count % restart_interval == 0:
                    rd.sync_restart()
                    for c in sel:
                        c["pred"] = 0
                    state["eobrun"] = 0
                count += 1
                for c in sel:
                    for byi in range(c["v"]):
                        for bxi in range(c["h"]):
                            block(c, my * c["v"] + byi, mx * c["h"] + bxi)

    # locate the next marker after this scan's entropy bytes
    j = max(rd.i, pos)
    while j + 1 < len(data):
        if data[j] == 0xFF and data[j + 1] != 0x00:
            if 0xD0 <= data[j + 1] <= 0xD7:
                j += 2
                continue
            return j
        j += 1
    return len(data)


# ------------------------------------------------------------- encoder
#: Standard luminance Huffman spec (JPEG Annex K.3) — public tables.
_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = bytes(range(12))
_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])


def _huff_codes(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, val: int, k: int) -> None:
        for j in range(k - 1, -1, -1):
            self.buf = (self.buf << 1) | ((val >> j) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1s per spec


def _fdct2d(samples: list[int]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (samples[y * 8 + x] - 128) * _COS[x][v] * _COS[y][u]
            out[u * 8 + v] = s / 4.0
    return out


def encode_jpeg_gray(width: int, height: int, gray: bytes) -> bytes:
    """Minimal baseline grayscale encoder (quant all-ones, standard
    Huffman tables) — fixture generation only. Flat 8×8 blocks round-
    trip exactly through decode_jpeg."""
    if len(gray) != width * height:
        raise ValueError("gray length mismatch")
    dc_codes = _huff_codes(_STD_DC_BITS, _STD_DC_VALS)
    ac_codes = _huff_codes(_STD_AC_BITS, _STD_AC_VALS)
    w = _BitWriter()
    pred = 0
    bx_n = (width + 7) // 8
    by_n = (height + 7) // 8
    for by in range(by_n):
        for bx in range(bx_n):
            block = [0] * 64
            for y in range(8):
                for x in range(8):
                    sx = min(bx * 8 + x, width - 1)
                    sy = min(by * 8 + y, height - 1)
                    block[y * 8 + x] = gray[sy * width + sx]
            coef = _fdct2d(block)
            quant = [int(round(coef[_ZIGZAG[k]])) for k in range(64)]
            diff = quant[0] - pred
            pred = quant[0]
            size = diff.bit_length() if diff else 0
            ln, code = dc_codes[size]
            w.put(code, ln)
            if size:
                w.put(diff if diff > 0 else diff + (1 << size) - 1, size)
            # AC
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if quant[k]:
                    last_nz = k
            for k in range(1, last_nz + 1):
                v = quant[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]
                    w.put(code, ln)
                    run -= 16
                size = abs(v).bit_length()
                ln, code = ac_codes[(run << 4) | size]
                w.put(code, ln)
                w.put(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
            if last_nz < 63:
                ln, code = ac_codes[0x00]  # EOB
                w.put(code, ln)
    w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    qt_body = b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht = (
        b"\x00" + bytes(_STD_DC_BITS) + _STD_DC_VALS
    )
    dht2 = b"\x10" + bytes(_STD_AC_BITS) + _STD_AC_VALS
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    return (
        b"\xff\xd8"
        + seg(0xDB, qt_body)
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + seg(0xC4, dht2)
        + seg(0xDA, sos)
        + bytes(w.out)
        + b"\xff\xd9"
    )


#: Near-flat AC Huffman spec for progressive fixtures: all 256
#: symbols (baseline Annex K lacks the EOBn codes progressive scans
#: emit). DHT counts are u8, so 255 symbols sit at 9 bits and the
#: last at 10 — still canonical and prefix-free.
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_PROG_AC_VALS = bytes(range(256))


def _quant_blocks(width: int, height: int, gray: bytes) -> list[list[int]]:
    """Per-8×8-block quantized (q=1) zigzag coefficient lists — shared
    by both encoders so baseline and progressive fixtures carry
    IDENTICAL final coefficients."""
    blocks = []
    for by in range((height + 7) // 8):
        for bx in range((width + 7) // 8):
            block = [0] * 64
            for y in range(8):
                for x in range(8):
                    sx = min(bx * 8 + x, width - 1)
                    sy = min(by * 8 + y, height - 1)
                    block[y * 8 + x] = gray[sy * width + sx]
            coef = _fdct2d(block)
            blocks.append([int(round(coef[_ZIGZAG[k]])) for k in range(64)])
    return blocks


def encode_jpeg_gray_progressive(width: int, height: int, gray: bytes) -> bytes:
    """Minimal PROGRESSIVE grayscale encoder — fixture generation for
    the SOF2 decode path. Five scans exercise every progressive decode
    mode: DC first (Al=1), AC first over two spectral bands 1–5 and
    6–63 (Al=1, EOB-run accumulation), DC refinement (Ah=1→Al=0), and
    AC refinement 1–63 (correction bits buffered across ZRL/EOB runs —
    the public libjpeg jcphuff.c shape). Same all-ones quant and
    Annex K Huffman tables as :func:`encode_jpeg_gray`, so both
    encodings decode to identical pixels."""
    if len(gray) != width * height:
        raise ValueError("gray length mismatch")
    dc_codes = _huff_codes(_STD_DC_BITS, _STD_DC_VALS)
    # The Annex K baseline AC table has no EOBn symbols (0x10..0xE0) —
    # progressive streams need them, so fixtures carry a flat custom
    # table: all 256 symbols at 9 bits (canonical, prefix-free, and it
    # exercises the decoder's DHT parse of a non-standard table).
    ac_codes = _huff_codes(_PROG_AC_BITS, _PROG_AC_VALS)
    blocks = _quant_blocks(width, height, gray)

    def dc_first_scan(al: int) -> bytes:
        w = _BitWriter()
        pred = 0
        for q in blocks:
            v = q[0] >> al  # DC point transform: arithmetic shift
            diff = v - pred
            pred = v
            size = abs(diff).bit_length()
            ln, code = dc_codes[size]
            w.put(code, ln)
            if size:
                w.put(diff if diff > 0 else diff + (1 << size) - 1, size)
        w.flush()
        return bytes(w.out)

    def dc_refine_scan(al: int) -> bytes:
        w = _BitWriter()
        for q in blocks:
            w.put((q[0] >> al) & 1, 1)
        w.flush()
        return bytes(w.out)

    def ac_first_scan(ss: int, se: int, al: int) -> bytes:
        w = _BitWriter()
        eobrun = 0

        def flush_eobrun() -> None:
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                ln, code = ac_codes[nbits << 4]
                w.put(code, ln)
                if nbits:
                    w.put(eobrun - (1 << nbits), nbits)
                eobrun = 0

        for q in blocks:
            # AC point transform truncates the MAGNITUDE toward zero.
            band = []
            for k in range(ss, se + 1):
                v = q[k]
                t = (abs(v) >> al)
                band.append(t if v >= 0 else -t)
            last_nz = -1
            for idx, v in enumerate(band):
                if v:
                    last_nz = idx
            if last_nz < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
                continue
            flush_eobrun()
            run = 0
            for idx in range(last_nz + 1):
                v = band[idx]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_codes[0xF0]
                    w.put(code, ln)
                    run -= 16
                size = abs(v).bit_length()
                ln, code = ac_codes[(run << 4) | size]
                w.put(code, ln)
                w.put(v if v > 0 else v + (1 << size) - 1, size)
                run = 0
            if last_nz < len(band) - 1:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun()
        flush_eobrun()
        w.flush()
        return bytes(w.out)

    def ac_refine_scan(ss: int, se: int, ah: int, al: int) -> bytes:
        w = _BitWriter()
        eobrun = 0
        pending_bits: list[int] = []  # correction bits awaiting a flush

        def emit_pending() -> None:
            for b in pending_bits:
                w.put(b, 1)
            pending_bits.clear()

        def flush_eobrun() -> None:
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                ln, code = ac_codes[nbits << 4]
                w.put(code, ln)
                if nbits:
                    w.put(eobrun - (1 << nbits), nbits)
                eobrun = 0
            emit_pending()

        for q in blocks:
            absvals = [abs(q[k]) >> al for k in range(ss, se + 1)]
            signs = [1 if q[k] >= 0 else 0 for k in range(ss, se + 1)]
            eob_idx = -1
            for idx, t in enumerate(absvals):
                if t == 1:
                    eob_idx = idx
            r = 0
            br: list[int] = []
            for idx, t in enumerate(absvals):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and idx <= eob_idx:
                    flush_eobrun()
                    ln, code = ac_codes[0xF0]
                    w.put(code, ln)
                    r -= 16
                    for b in br:
                        w.put(b, 1)
                    br = []
                if t > 1:  # previously significant: correction bit only
                    br.append(t & 1)
                    continue
                flush_eobrun()
                ln, code = ac_codes[(r << 4) | 1]
                w.put(code, ln)
                w.put(signs[idx], 1)
                for b in br:
                    w.put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                eobrun += 1
                pending_bits.extend(br)
                if eobrun == 0x7FFF or len(pending_bits) > 900:
                    flush_eobrun()
        flush_eobrun()
        w.flush()
        return bytes(w.out)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos(ss: int, se: int, ah: int, al: int) -> bytes:
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xDB, b"\x00" + bytes([1] * 64))
    out += seg(0xC2, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, b"\x00" + bytes(_STD_DC_BITS) + _STD_DC_VALS)
    out += seg(0xC4, b"\x10" + bytes(_PROG_AC_BITS) + _PROG_AC_VALS)
    out += sos(0, 0, 0, 1) + dc_first_scan(1)
    out += sos(1, 5, 0, 1) + ac_first_scan(1, 5, 1)
    out += sos(6, 63, 0, 1) + ac_first_scan(6, 63, 1)
    out += sos(0, 0, 1, 0) + dc_refine_scan(0)
    out += sos(1, 63, 1, 0) + ac_refine_scan(1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)
