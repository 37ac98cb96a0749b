"""Generate the committed pixel-hash manifest that oracle-izes
``media_decode_chain`` (judge r4 task #3).

The query's synthetic JPEGs are a pure function of ``doc_id``:

* pixel content ``(doc_id*31 + y*13 + x*7) % 256`` → depends only on
  ``doc_id % 256`` (31·256 ≡ 0 mod 256);
* encoder choice (progressive for ``doc_id % 3 == 0``) does NOT
  affect decoded pixels — asserted below for every class and both
  parities, so the fingerprint is encoder-invariant;
* the EXIF orientation-6 splice (odd ids) IS determined by
  ``doc_id % 256`` (256 is even).

Hence the full decode → auto-orient → resize(8,4) → BT.601 grayscale
→ md5 chain has exactly 256 distinct outcomes, keyed by
``doc_id % 256``. This script replays that chain SCALAR-SIDE — the
same kernel codecs (`jpeg_mini`), but none of the Spark plumbing
(mapInPandas batching, Arrow transfer, partitioning) — and commits
the 256-row manifest as a single parquet file. The DuckDB oracle
joins ``documents.doc_id % 256`` against it, so the driver's
correctness gate now verifies the Spark chain end-to-end against an
independently computed golden (reference analog: the per-page golden
``.md`` bench comparison, ``karanta/bench/convert.py:245-272``).

Rerun after any kernel codec change: ``python scripts/gen_media_manifest.py``.
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from karanta_ocr_spark.kernel.jpeg_mini import (  # noqa: E402
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_gray_progressive,
)
from karanta_ocr_spark.operators.multimodal import _upright  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "karanta_ocr_spark",
    "fixtures",
    "media_pixel_manifest.parquet",
)

W, H = 16, 8
OUT_W, OUT_H = 8, 4

# EXIF orientation 6 APP1 — byte-identical to the query's splice.
_tiff = (
    b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
    + struct.pack("<HHI", 0x0112, 3, 1)
    + struct.pack("<H", 6) + b"\x00\x00" + struct.pack("<I", 0)
)
_exif = b"Exif\x00\x00" + _tiff
APP1 = b"\xff\xe1" + struct.pack(">H", len(_exif) + 2) + _exif


def chain(jpg: bytes) -> tuple[int, int, str]:
    """decode → auto-orient → nearest-resize → BT.601 gray → md5,
    the scalar twin of the query's decode_images(auto_orient=True) →
    resize_images(8,4) → grayscale_images → md5(pixels)."""
    w, h, px = decode_jpeg(jpg)
    w, h, px = _upright(jpg, w, h, px)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    yi = (np.arange(OUT_H) * h // OUT_H).clip(0, h - 1)
    xi = (np.arange(OUT_W) * w // OUT_W).clip(0, w - 1)
    arr = arr[yi][:, xi]
    gray = (
        arr[:, :, 0] * 0.299 + arr[:, :, 1] * 0.587 + arr[:, :, 2] * 0.114
    ).astype(np.uint8)
    return OUT_W, OUT_H, hashlib.md5(gray.tobytes()).hexdigest()


def main() -> None:
    classes, widths, heights, hashes = [], [], [], []
    for c in range(256):
        img = bytes(
            (c * 31 + y * 13 + x * 7) % 256 for y in range(H) for x in range(W)
        )
        base = encode_jpeg_gray(W, H, img)
        prog = encode_jpeg_gray_progressive(W, H, img)
        if c % 2 == 1:
            base = base[:2] + APP1 + base[2:]
            prog = prog[:2] + APP1 + prog[2:]
        rb = chain(base)
        rp = chain(prog)
        # Encoder invariance: the query picks the encoder by
        # doc_id % 3, which doc_id % 256 does NOT determine — the
        # manifest is only well-defined because both encoders decode
        # to identical pixels. Assert it per class.
        assert rb == rp, f"class {c}: baseline {rb} != progressive {rp}"
        classes.append(c)
        widths.append(rb[0])
        heights.append(rb[1])
        hashes.append(rb[2])
    table = pa.table(
        {
            "content_class": pa.array(classes, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "pixel_md5": pa.array(hashes, pa.string()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {len(classes)} classes -> {OUT}")
    print(f"distinct hashes: {len(set(hashes))}")


if __name__ == "__main__":
    main()
