"""Pure-stdlib baseline JPEG (JFIF) decode.

Finishes the real-image-decode story the PNG decoder started
(``kernel/png_mini.py``): the container has no PIL/libjpeg, but
baseline sequential JPEG — the overwhelming majority of crawled web
images — is decodable with stdlib only: marker walk, Huffman entropy
decode with byte-unstuffing, DC prediction, dequantize + dezigzag,
float IDCT, chroma upsampling, YCbCr→RGB.

Supported: baseline DCT (SOF0), 8-bit, 1-component grayscale and
3-component YCbCr at 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers.
Progressive (SOF2), arithmetic coding, and 12-bit raise
``JpegError`` — callers treat that like any undecodable payload (the
PIL-gated fallback in ``operators/multimodal.decode_images``).

A matching minimal encoder (gray/4:4:4, standard Annex K tables)
exists for fixtures: flat 8×8 blocks survive the DCT+quant round trip
exactly, which pins the entropy/DC-prediction/IDCT paths without a
reference codec in the container.
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

    def _fill(self) -> None:
        while self.n <= 24:
            if self.i >= len(self.d):
                self.buf = (self.buf << 8) | 0
                self.n += 8
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


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Baseline JPEG bytes → ``(width, height, row-major RGB bytes)``."""
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
            prec = body[0]
            if prec != 8:
                raise JpegError("non-8-bit precision")
            height, width = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for c in range(nc):
                if 9 + 3 * c > len(body):
                    raise JpegError("truncated SOF0")
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                h_f, v_f = hv >> 4, hv & 0xF
                if not (1 <= h_f <= 4 and 1 <= v_f <= 4):
                    raise JpegError(f"bad sampling factors {h_f}x{v_f}")
                comps.append({"id": cid, "h": h_f, "v": v_f, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            raise JpegError("only baseline SOF0 supported")
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
    for my in range(mcuy):
        for mx in range(mcux):
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
    return width, height, bytes(rgb)


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
