"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata.

The engine treats media payloads exactly like the reference treats
PDFs: opaque bytes in a column, cheap header sniffing before any
expensive decode (the reference's base64-PNG dimension sniff,
``karanta/data/process_pdf_utils.py:78-134``, reads width/height by
byte arithmetic without decoding — reimplemented here over raw
bytes), and the heavy work in Arrow-batched UDFs.

PNG and baseline JPEG payloads decode for real through the
pure-stdlib ``kernel.png_mini`` (zlib inflate + scanline unfilter)
and ``kernel.jpeg_mini`` (Huffman entropy decode + IDCT + YCbCr),
so ``decode_images → grayscale_images → resize_images`` runs
un-faked end-to-end on web images — baseline AND progressive (SOF2)
JPEG both decode in pure stdlib.

Video: MJPEG-in-AVI decodes for REAL (``sample_video_frames``) — the
container walk is ``kernel.avi_mini`` and each sampled frame is an
ordinary JPEG through ``jpeg_mini``. Other codecs (H.264 etc.) need
ffmpeg, which is NOT in this container, so the general
``sample_frames`` path stays honestly stubbed: the Spark-side
plumbing (schemas, mapInPandas batch shape, partitioning) is real and
tested; the inner pixel transform either raises
``NotImplementedError`` (strict mode) or produces a deterministic
fake (test mode) clearly marked as such.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ------------------------------------------------------------- sniffing
#: magic-byte → media kind (JVM-side substring compare, no UDF).
_MAGIC = [
    ("png", bytes([0x89, 0x50, 0x4E, 0x47])),
    ("jpeg", bytes([0xFF, 0xD8, 0xFF])),
    ("gif", b"GIF8"),
    ("pdf", b"%PDF"),
    ("riff", b"RIFF"),  # wav/avi container
    ("tiff", b"II*\x00"),
    ("tiff", b"MM\x00*"),
    ("html", b"<"),
]

#: BITMAPINFOHEADER-family sizes (the u32 at offset 14) accepted by
#: the BMP sniff. The 2-byte 'BM' magic alone classifies any text
#: starting with "BM" (e.g. "BMW …") as bmp, so the sniff also
#: requires a plausible DIB header size — the same field
#: ``bmp_dimensions`` depends on. The 12-byte BITMAPCOREHEADER is
#: deliberately absent: its dims are u16 at a different offset, so a
#: core-header file would sniff as bmp but parse garbage dims.
_BMP_DIB_SIZES = (40, 52, 56, 64, 108, 124)


def media_kind_expr(blob_col: str) -> Column:
    """Classify payload bytes by magic prefix — pure Catalyst (the
    reference's ``%PDF`` predicate generalized,
    ``karanta/pipeline.py:1279``). Takes the column NAME (binary
    substring needs SQL syntax). RIFF containers are refined by their
    fourcc — ``WAVE`` → ``wav``, ``WEBP`` → ``webp`` (matching the
    Arrow-side sniff); other RIFF (avi) stays ``riff``. BMP requires
    'BM' AND a known DIB header size at offset 14 (``_BMP_DIB_SIZES``),
    identically to the Arrow-side sniff."""
    expr = F.lit("unknown")
    for kind, magic in reversed(_MAGIC):
        hexlit = magic.hex().upper()
        expr = F.when(
            F.expr(f"substring({blob_col}, 1, {len(magic)})") == F.expr(f"X'{hexlit}'"),
            F.lit(kind),
        ).otherwise(expr)
    is_bmp = F.expr(f"substring({blob_col}, 1, 2)") == F.expr("X'424D'")
    dib = F.expr(f"substring({blob_col}, 15, 4)")
    dib_ok = F.lit(False)
    for s in _BMP_DIB_SIZES:
        dib_ok = dib_ok | (dib == F.expr(f"X'{struct.pack('<I', s).hex().upper()}'"))
    expr = F.when(is_bmp & dib_ok, F.lit("bmp")).otherwise(expr)
    is_riff = F.expr(f"substring({blob_col}, 1, 4)") == F.expr("X'52494646'")
    fourcc = F.expr(f"substring({blob_col}, 9, 4)")
    return (
        F.when(is_riff & (fourcc == F.expr("X'57415645'")), F.lit("wav"))
        .when(is_riff & (fourcc == F.expr("X'57454250'")), F.lit("webp"))
        .otherwise(expr)
    )


def png_dimensions(payload: bytes) -> tuple[int, int] | None:
    """Width/height from a PNG header WITHOUT decoding the image —
    the IHDR chunk sits at fixed offset 16 (the reference does the
    same trick through base64 offset arithmetic,
    ``karanta/data/process_pdf_utils.py:78-134``)."""
    if len(payload) < 24 or payload[:4] != b"\x89PNG":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return int(w), int(h)


def gif_dimensions(payload: bytes) -> tuple[int, int] | None:
    """Width/height from a GIF87a/89a logical screen descriptor —
    fixed little-endian u16 pair at offset 6, no decode."""
    if len(payload) < 10 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    return int(w), int(h)


def jpeg_dimensions(payload: bytes) -> tuple[int, int] | None:
    """Width/height from JPEG SOF0/SOF2 markers (header walk, no
    decode)."""
    if len(payload) < 4 or payload[:3] != b"\xff\xd8\xff":
        return None
    i, n = 2, len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker == 0xFF:
            # 0xFF fill/padding byte before the real marker (legal and
            # common in crawled JPEGs): skip ONE byte, don't misread a
            # garbage segment length.
            i += 1
            continue
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):
            h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
            return int(w), int(h)
        if marker == 0xD9:  # EOI — no SOF found
            return None
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        i += 2 + max(seg_len, 1)
    return None


def webp_dimensions(payload: bytes) -> tuple[int, int] | None:
    """Width/height from a WebP header — all three bitstream flavors
    (VP8X extended, VP8 lossy key-frame, VP8L lossless), header
    arithmetic only, no decode."""
    if len(payload) < 16 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    fourcc = payload[12:16]
    if fourcc == b"VP8X" and len(payload) >= 30:
        w = int.from_bytes(payload[24:27], "little") + 1
        h = int.from_bytes(payload[27:30], "little") + 1
        return w, h
    if fourcc == b"VP8 " and len(payload) >= 30:
        if payload[23:26] != b"\x9d\x01\x2a":  # key-frame start code
            return None
        w = struct.unpack("<H", payload[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", payload[28:30])[0] & 0x3FFF
        return w, h
    if fourcc == b"VP8L" and len(payload) >= 25:
        if payload[20] != 0x2F:  # lossless signature byte
            return None
        bits = int.from_bytes(payload[21:25], "little")
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    return None


_I32_MAX = 2**31 - 1


def _i32(v: int | None) -> int | None:
    """Clamp a parsed header integer to Arrow int32 range — hostile
    headers can declare u32-range values, and an out-of-range append
    would abort the task at Arrow serialization instead of degrading
    to null."""
    return v if v is not None and 0 <= v <= _I32_MAX else None


def wav_metadata(payload: bytes) -> tuple[int, int, int] | None:
    """(sample_rate, channels, duration_ms) from RIFF/WAVE ``fmt ``
    and ``data`` chunk HEADERS — declared sizes only, no sample
    decode, so truncated crawl files still report their nominal
    duration. None for non-WAVE RIFF (avi, webp) or malformed
    headers (undersized fmt chunk, u32-range garbage fields)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    rate = channels = block_align = data_size = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and size >= 16 and i + 24 <= n:
            channels = struct.unpack("<H", payload[i + 10 : i + 12])[0]
            rate = struct.unpack("<I", payload[i + 12 : i + 16])[0]
            block_align = struct.unpack("<H", payload[i + 20 : i + 22])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not rate or not channels or not block_align or data_size is None:
        return None
    duration_ms = (data_size // block_align) * 1000 // rate
    if _i32(rate) is None or _i32(duration_ms) is None:
        return None
    return int(rate), int(channels), int(duration_ms)


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, bytes] | None:
    """(sample_rate, channels, raw PCM16-LE sample bytes) for a
    RIFF/WAVE file with a 16-bit PCM ``fmt `` chunk — a REAL decode
    (the samples, not just the headers). Truncated data chunks return
    the bytes present (crawl cut-offs are data, not errors). None for
    non-WAVE, non-PCM (compressed codecs need libs this container
    lacks), or non-16-bit payloads."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    rate = channels = None
    data: bytes | None = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and size >= 16 and i + 24 <= n:
            fmt_tag = struct.unpack("<H", payload[i + 8 : i + 10])[0]
            bits = struct.unpack("<H", payload[i + 22 : i + 24])[0]
            if fmt_tag != 1 or bits != 16:  # PCM16 only — honest scope
                return None
            channels = struct.unpack("<H", payload[i + 10 : i + 12])[0]
            rate = struct.unpack("<I", payload[i + 12 : i + 16])[0]
        elif cid == b"data":
            data = payload[i + 8 : i + 8 + size]  # clamped if truncated
        i += 8 + size + (size & 1)
    if not rate or not channels or data is None or _i32(rate) is None:
        return None
    if len(data) & 1:
        data = data[:-1]  # drop a torn trailing byte
    return int(rate), int(channels), data


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("clip_frac", DoubleType()),
    ]
)


def audio_features(
    df: DataFrame, blob_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL audio feature extraction over PCM16 WAV payloads: decode
    the samples (``decode_wav_pcm16``), then numpy-vectorized
    loudness/clipping statistics per file — the triage features an
    audio training-data pipeline buckets on before any expensive
    model pass.

    Output one row per input row: ``sample_rate, channels,
    n_samples`` (frames per channel), ``duration_ms``, ``rms``
    (root-mean-square over all interleaved samples — exact int64
    sum-of-squares then one sqrt, so the value is reproducible
    bit-for-bit by any engine), ``peak`` (max |sample|), and
    ``clip_frac`` (fraction of samples at full scale ±32767/-32768).
    Undecodable payloads yield NULL features (visible, not fatal).

    Scale shape: one Arrow pass, numpy ``frombuffer`` on each blob —
    no Python loops over samples; blob size is bounded by the Arrow
    batch cap like every other media operator."""
    schema = AUDIO_FEATURES_SCHEMA

    def run(batches: Iterator) -> Iterator:
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = {f.name: [] for f in schema.fields}
            for mid, blob in zip(pdf[id_col].tolist(), pdf[blob_col].tolist()):
                blob = bytes(blob) if blob is not None else b""
                dec = decode_wav_pcm16(blob)
                vals = dict.fromkeys(rows)
                vals["media_id"] = mid
                if dec is not None:
                    rate, ch, data = dec
                    s = np.frombuffer(data, dtype="<i2")
                    n_frames = len(s) // ch
                    vals["sample_rate"] = rate
                    vals["channels"] = ch
                    vals["n_samples"] = int(n_frames)
                    vals["duration_ms"] = int(n_frames * 1000 // rate)
                    if len(s):
                        ss = int(np.sum(s.astype(np.int64) ** 2))
                        vals["rms"] = round(math.sqrt(ss / len(s)), 6)
                        vals["peak"] = int(np.max(np.abs(s.astype(np.int32))))
                        vals["clip_frac"] = round(
                            float(np.mean(np.abs(s.astype(np.int32)) >= 32767)), 6
                        )
                    else:
                        vals["rms"], vals["peak"] = 0.0, 0
                        vals["clip_frac"] = 0.0
                for k, v in vals.items():
                    rows[k].append(v)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("exif_orientation", IntegerType()),
        StructField("rotation_correction", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def media_metadata(df: DataFrame, blob_col: str = "payload", id_col: str = "media_id") -> DataFrame:
    """Header-sniffed metadata for a binary media column: one Arrow
    pass, no decode. Output one row per input row.
    ``rotation_correction`` is the clockwise degrees that upright the
    image per its EXIF orientation (0 when absent/non-JPEG) — the
    header-only analog of the reference's per-page
    ``rotation_correction`` attribute (``karanta/pipeline.py:582-589``)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = {f.name: [] for f in MEDIA_META_SCHEMA.fields}
            for mid, blob in zip(pdf[id_col].tolist(), pdf[blob_col].tolist()):
                blob = bytes(blob) if blob is not None else b""
                orient = None
                audio = None
                if blob[:4] == b"\x89PNG":
                    kind, dims = "png", png_dimensions(blob)
                elif blob[:3] == b"\xff\xd8\xff":
                    kind, dims = "jpeg", jpeg_dimensions(blob)
                    orient = jpeg_exif_orientation(blob)
                elif blob[:4] == b"GIF8":
                    kind, dims = "gif", gif_dimensions(blob)
                elif blob[:4] in (b"II*\x00", b"MM\x00*"):
                    kind, dims = "tiff", tiff_dimensions(blob)
                elif (
                    blob[:2] == b"BM"
                    and len(blob) >= 18
                    and struct.unpack("<I", blob[14:18])[0] in _BMP_DIB_SIZES
                ):
                    kind, dims = "bmp", bmp_dimensions(blob)
                elif blob[:4] == b"%PDF":
                    kind, dims = "pdf", None
                elif blob[:4] == b"RIFF":
                    # kind follows the container fourcc (identical to
                    # the Catalyst media_kind_expr split); parse
                    # failure degrades to null fields, not to 'riff'.
                    if blob[8:12] == b"WEBP":
                        kind, dims = "webp", webp_dimensions(blob)
                    elif blob[8:12] == b"WAVE":
                        kind, dims = "wav", None
                        audio = wav_metadata(blob)
                    else:
                        kind, dims = "riff", None
                elif blob[:1] == b"<":
                    kind, dims = "html", None
                else:
                    kind, dims = "unknown", None
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["width"].append(_i32(dims[0]) if dims else None)
                rows["height"].append(_i32(dims[1]) if dims else None)
                rows["n_bytes"].append(len(blob))
                rows["exif_orientation"].append(orient)
                rows["rotation_correction"].append(90 * exif_quarter_turns(orient))
                rows["sample_rate"].append(audio[0] if audio else None)
                rows["channels"].append(audio[1] if audio else None)
                rows["duration_ms"].append(audio[2] if audio else None)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)


#: EXIF orientation (tag 0x0112) value → clockwise quarter-turns that
#: upright the image. Mirrored variants (2,4,5,7) map to the rotation
#: component of their transform; the mirror itself is dropped (text
#: extraction and near-dup features are mirror-insensitive enough, and
#: the reference carries only a rotation_correction angle,
#: ``karanta/pipeline.py:582-589``).
_EXIF_ORIENT_TO_TURNS = {1: 0, 2: 0, 3: 2, 4: 2, 5: 1, 6: 1, 7: 3, 8: 3}


def _tiff_ifd0(tiff: bytes) -> dict[int, int]:
    """IFD0 tag → first SHORT/LONG value from a TIFF blob (either
    endianness). Empty dict on malformed input — shared by the JPEG
    EXIF path and bare-TIFF dimension sniffing."""
    out: dict[int, int] = {}
    if len(tiff) < 8:
        return out
    if tiff[:4] == b"II*\x00":
        end = "<"
    elif tiff[:4] == b"MM\x00*":
        end = ">"
    else:
        return out
    ifd_off = struct.unpack(end + "I", tiff[4:8])[0]
    if ifd_off + 2 > len(tiff):
        return out
    n_entries = struct.unpack(end + "H", tiff[ifd_off : ifd_off + 2])[0]
    for e in range(n_entries):
        off = ifd_off + 2 + e * 12
        if off + 12 > len(tiff):
            break
        tag, typ, cnt = struct.unpack(end + "HHI", tiff[off : off + 8])
        if tag in out:
            continue
        # Per TIFF spec the 4-byte value field is only INLINE when the
        # value fits (SHORT: cnt ≤ 2, LONG: cnt = 1) — otherwise it is
        # an OFFSET, and reading it as a value would report bogus
        # widths/heights/orientations. Multi-count tags are skipped
        # entirely (the tags consumed here are all cnt=1 scalars).
        if typ == 3 and 1 <= cnt <= 2:  # SHORT, inline
            out[tag] = struct.unpack(end + "H", tiff[off + 8 : off + 10])[0]
        elif typ == 4 and cnt == 1:  # LONG, inline
            out[tag] = struct.unpack(end + "I", tiff[off + 8 : off + 12])[0]
    return out


def tiff_dimensions(payload: bytes) -> tuple[int, int] | None:
    """Width/height from a bare TIFF's IFD0 (tags 0x0100/0x0101) —
    the scanned-document format an OCR corpus sees constantly; header
    walk only, no strip/tile decode."""
    try:
        ifd = _tiff_ifd0(payload)
        w, h = ifd.get(0x0100), ifd.get(0x0101)
        if w is None or h is None:
            return None
        return int(w), int(h)
    except Exception:
        return None


def bmp_dimensions(payload: bytes) -> tuple[int, int] | None:
    """Width/height from a BMP BITMAPINFOHEADER — signed i32 pair at
    offset 18; negative height means top-down row order (magnitude is
    the pixel height)."""
    if len(payload) < 26 or payload[:2] != b"BM":
        return None
    w, h = struct.unpack("<ii", payload[18:26])
    if w <= 0 or h == 0:
        return None
    return int(w), abs(int(h))


def jpeg_exif_orientation(payload: bytes) -> int | None:
    """EXIF orientation (1..8) from a JPEG's APP1 segment, pure
    stdlib: marker walk → ``Exif\\0\\0`` APP1 → TIFF header (either
    endianness) → IFD0 entry with tag 0x0112. None when absent or
    malformed — never raises on hostile bytes."""
    try:
        if len(payload) < 4 or payload[:3] != b"\xff\xd8\xff":
            return None
        i, n = 2, len(payload)
        while i + 4 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in (0xDA, 0xD9):  # SOS/EOI: no APP1 ahead
                return None
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if marker == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
                val = _tiff_ifd0(payload[i + 10 : i + 2 + seg_len]).get(0x0112)
                return val if val is not None and 1 <= val <= 8 else None
            i += 2 + max(seg_len, 1)
        return None
    except Exception:
        return None


def exif_quarter_turns(orientation: int | None) -> int:
    """Clockwise quarter-turns that upright an image with the given
    EXIF orientation (0 for None/upright/unknown)."""
    return _EXIF_ORIENT_TO_TURNS.get(orientation or 1, 0)


def _upright(blob: bytes, w: int, h: int, px: bytes) -> tuple[int, int, bytes]:
    """Rotate decoded RGB upright per the blob's EXIF orientation
    (no-op when absent) — shared by every decode path."""
    import numpy as np

    turns = exif_quarter_turns(jpeg_exif_orientation(blob))
    if not turns:
        return w, h, px
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    rot = np.rot90(arr, k=(-turns) % 4)
    return rot.shape[1], rot.shape[0], np.ascontiguousarray(rot).tobytes()


# ------------------------------------------------------------ transforms
DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),  # row-major RGB
    ]
)


def _fake_decode(blob: bytes, mid: int) -> tuple[int, int, bytes]:
    """Deterministic stand-in for an image decode: 4x4 RGB whose bytes
    derive from sha1(blob) — stable plumbing-test payload, clearly not
    a real decode."""
    import hashlib

    h = hashlib.sha1(blob + str(mid).encode()).digest()
    return 4, 4, (h * 3)[: 4 * 4 * 3]


def decode_images(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "media_id",
    allow_fake: bool = False,
    auto_orient: bool = False,
) -> DataFrame:
    """Decode image bytes → raw RGB.

    Decodable PNGs (8-bit, non-interlaced) and Huffman JPEGs —
    baseline AND progressive, together the overwhelming majority of
    web images — decode for real via the pure-stdlib
    :mod:`~karanta_ocr_spark.kernel.png_mini` and
    :mod:`~karanta_ocr_spark.kernel.jpeg_mini`; no codec library
    needed. Other formats (webp, arithmetic-coded JPEG, …) need
    PIL/libjpeg, which are NOT in this container: with
    ``allow_fake=True`` a deterministic fake exercises the full Spark
    path (schema, Arrow batches, downstream ops); otherwise the task
    raises ``NotImplementedError`` with the exact dependency needed.

    With ``auto_orient=True``, JPEGs carrying an EXIF orientation are
    rotated upright (numpy ``rot90`` on the decoded array) before
    emission, so downstream grayscale/resize/fingerprint see the image
    as a viewer would."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from karanta_ocr_spark.kernel.jpeg_mini import decode_jpeg
        from karanta_ocr_spark.kernel.png_mini import decode_png

        try:
            from PIL import Image  # noqa: F401  (absent in sandbox)

            have_pil = True
        except ImportError:
            have_pil = False

        for pdf in batches:
            rows = {f.name: [] for f in DECODED_SCHEMA.fields}
            for mid, blob in zip(pdf[id_col].tolist(), pdf[blob_col].tolist()):
                blob = bytes(blob) if blob is not None else b""
                w = h = px = None
                # Corrupt/hostile payloads must degrade to the codec
                # fallback, never kill the task: the stdlib decoders
                # raise PngError/JpegError on everything they detect,
                # but a crafted header can still surface struct/zero-
                # division/index errors — catch them all here.
                if blob[:4] == b"\x89PNG":
                    try:
                        w, h, px = decode_png(blob)
                    except Exception:
                        w = None  # unsupported/corrupt → codec fallback
                elif blob[:3] == b"\xff\xd8\xff":
                    try:
                        w, h, px = decode_jpeg(blob)
                    except Exception:
                        w = None  # arithmetic/corrupt → codec fallback
                    if w is not None and auto_orient:
                        w, h, px = _upright(blob, w, h, px)
                if w is None:
                    if have_pil:  # pragma: no cover - not installed here
                        import io

                        from PIL import Image

                        img = Image.open(io.BytesIO(blob)).convert("RGB")
                        w, h, px = img.width, img.height, img.tobytes()
                        if auto_orient:
                            w, h, px = _upright(blob, w, h, px)
                    elif allow_fake:
                        w, h, px = _fake_decode(blob, mid)
                    else:
                        raise NotImplementedError(
                            "decode_images needs Pillow on executors for "
                            "non-PNG payloads (pip install pillow + "
                            "spark-submit --py-files); pass allow_fake=True "
                            "to exercise the plumbing."
                        )
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pixels"].append(px)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema=DECODED_SCHEMA)


def grayscale_images(decoded: DataFrame) -> DataFrame:
    """RGB → single-channel luma (ITU-R BT.601 weights), the real
    transform (reference grayscale convert,
    ``karanta/data/utils.py:186-225``) — operates on raw decoded
    pixels, so no codec library is needed: pure numpy per Arrow batch."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np

        for pdf in batches:
            out_px = []
            for w, h, px in zip(pdf["width"], pdf["height"], pdf["pixels"]):
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(int(h), int(w), 3)
                gray = (
                    arr[:, :, 0] * 0.299 + arr[:, :, 1] * 0.587 + arr[:, :, 2] * 0.114
                ).astype(np.uint8)
                out_px.append(gray.tobytes())
            pdf = pdf.copy()
            pdf["pixels"] = out_px
            yield pdf

    return decoded.mapInPandas(run, schema=DECODED_SCHEMA)


def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on raw RGB — real implementation
    (reference render-dim targeting, ``karanta/pipeline.py:1171``
    sizes pages to a longest dimension), pure numpy indexing."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np

        for pdf in batches:
            out_px, out_wl, out_hl = [], [], []
            for w, h, px in zip(pdf["width"], pdf["height"], pdf["pixels"]):
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(int(h), int(w), 3)
                yi = (np.arange(out_h) * int(h) // out_h).clip(0, int(h) - 1)
                xi = (np.arange(out_w) * int(w) // out_w).clip(0, int(w) - 1)
                out_px.append(arr[yi][:, xi].tobytes())
                out_wl.append(out_w)
                out_hl.append(out_h)
            pdf = pdf.copy()
            pdf["width"], pdf["height"], pdf["pixels"] = out_wl, out_hl, out_px
            yield pdf

    return decoded.mapInPandas(run, schema=DECODED_SCHEMA)


def rotate_images(decoded: DataFrame, quarter_turns: int = 1) -> DataFrame:
    """Rotate raw RGB by *quarter_turns* × 90° clockwise (T5 made
    real: pair with :func:`jpeg_exif_orientation` /
    :func:`exif_quarter_turns` to upright camera-rotated crawl
    images). Width/height swap on odd turns; pure numpy ``rot90``."""
    k = (-int(quarter_turns)) % 4  # np.rot90 rotates counter-clockwise

    def run(batches: Iterator) -> Iterator:
        import numpy as np

        for pdf in batches:
            out_px, out_wl, out_hl = [], [], []
            for w, h, px in zip(pdf["width"], pdf["height"], pdf["pixels"]):
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(
                    int(h), int(w), 3
                )
                rot = np.rot90(arr, k=k)
                out_px.append(np.ascontiguousarray(rot).tobytes())
                out_hl.append(rot.shape[0])
                out_wl.append(rot.shape[1])
            pdf = pdf.copy()
            pdf["width"], pdf["height"], pdf["pixels"] = out_wl, out_hl, out_px
            yield pdf

    return decoded.mapInPandas(run, schema=DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


#: Output of :func:`sample_video_frames` — one row per SAMPLED frame,
#: dims taken from the DECODED frame (so a decode failure is visible
#: as NULLs, never a task death).
VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("us_per_frame", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 2,
    max_frames: int = 8,
    blob_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL video frame sampling (1 row in → ≤max_frames rows out)
    for the two moving-picture formats web crawls actually carry that
    are decodable without codec libraries:

    * MJPEG AVI — RIFF walk via ``kernel.avi_mini``, each SAMPLED
      frame decoded as an ordinary JPEG via ``kernel.jpeg_mini``;
      unsampled frames are sliced, never decoded, so cost is
      O(sampled) not O(duration).
    * animated GIF — ``kernel.gif_mini`` LZW decode + compositing
      (GIF frames are deltas over a canvas, so frames up to the last
      sampled index must be composited; cost is O(last sampled)).

    Sampled frame indices are ``0, every_n, 2*every_n, …`` capped at
    *max_frames*; ``us_per_frame`` reports the AVI header rate or the
    GIF first-frame delay. One Arrow batch holds a bounded number of
    blobs (the global Arrow batch cap applies); failure rows degrade
    to NULL dims/pixels like ``decode_images``. Other containers
    (MP4/H.264 — needs ffmpeg, not in this container) and frameless
    payloads emit a single NULL-fields row (n_frames=0) so lineage
    can count them."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from karanta_ocr_spark.kernel.avi_mini import AviError, parse_avi
        from karanta_ocr_spark.kernel.gif_mini import decode_gif
        from karanta_ocr_spark.kernel.jpeg_mini import decode_jpeg

        for pdf in batches:
            rows = {f.name: [] for f in VIDEO_FRAME_SCHEMA.fields}

            def emit(mid, n, us, idx, w, h, px):
                rows["media_id"].append(mid)
                rows["n_frames"].append(n)
                rows["us_per_frame"].append(us)
                rows["frame_idx"].append(idx)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pixels"].append(px)

            for mid, blob in zip(pdf[id_col].tolist(), pdf[blob_col].tolist()):
                blob = bytes(blob) if blob is not None else b""
                if blob[:4] == b"GIF8":
                    try:
                        # Last sampled index bounds the compositing
                        # work; frames past it are never decoded.
                        anim = decode_gif(
                            blob, max_frames=(max_frames - 1) * every_n + 1
                        )
                    except Exception:  # GifError or hostile-header artifacts
                        emit(mid, 0, None, None, None, None, None)
                        continue
                    n_dec = len(anim.frames)
                    if n_dec == 0:
                        emit(mid, 0, None, None, None, None, None)
                        continue
                    us = anim.frames[0][0] * 10_000  # centisec → µs
                    # n_frames reports the CONTAINER's frame count
                    # (total_frames ≥ decoded) — consistent with the
                    # AVI path; sampling stops at the decode cap.
                    for idx in range(0, n_dec, every_n)[:max_frames]:
                        emit(mid, anim.total_frames, us, idx,
                             anim.width, anim.height, anim.frames[idx][1])
                    continue
                try:
                    vid = parse_avi(blob)
                except AviError:
                    emit(mid, 0, None, None, None, None, None)
                    continue
                n = len(vid.frames)
                if n == 0:
                    emit(mid, 0, vid.us_per_frame or None, None, None, None, None)
                    continue
                for idx in range(0, n, every_n)[:max_frames]:
                    try:
                        w, h, px = decode_jpeg(vid.frames[idx])
                    except Exception:
                        w = h = px = None  # corrupt frame → visible, not fatal
                    emit(mid, n, vid.us_per_frame, idx, w, h, px)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    blob_col: str = "payload",
    id_col: str = "media_id",
    allow_fake: bool = False,
) -> DataFrame:
    """General-codec video frame sampling (1 row in → ≤max_frames rows
    out). STUB for non-MJPEG codecs: no ffmpeg in this container (use
    :func:`sample_video_frames` for MJPEG AVI, which decodes for
    real); the fake emits deterministic ``max_frames`` byte-stamped
    frames so the fan-out shape, schema and partition behavior are
    real and tested."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not allow_fake:
                raise NotImplementedError(
                    "sample_frames needs ffmpeg/PyAV on executors; "
                    "pass allow_fake=True to exercise the plumbing."
                )
            rows = {f.name: [] for f in FRAME_SCHEMA.fields}
            for mid, blob in zip(pdf[id_col].tolist(), pdf[blob_col].tolist()):
                blob = bytes(blob) if blob is not None else b""
                for k in range(max_frames):
                    stamp = hashlib.sha1(blob + b"%d/%d" % (k * every_n, mid)).digest()
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(k * every_n)
                    rows["frame"].append(stamp)
            yield pd.DataFrame(rows)

    return df.select(id_col, blob_col).mapInPandas(run, schema=FRAME_SCHEMA)
