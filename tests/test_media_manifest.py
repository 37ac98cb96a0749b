"""The committed media pixel manifest (the DuckDB golden for
``media_decode_chain``) must stay in lockstep with both the scalar
generator and the Spark-side decode chain."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

MANIFEST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "karanta_ocr_spark",
    "fixtures",
    "media_pixel_manifest.parquet",
)


def _manifest() -> dict[int, tuple[int, int, str]]:
    t = pq.read_table(MANIFEST).to_pydict()
    return {
        c: (w, h, m)
        for c, w, h, m in zip(
            t["content_class"], t["width"], t["height"], t["pixel_md5"]
        )
    }


def test_manifest_shape_and_distinctness():
    m = _manifest()
    assert set(m) == set(range(256))
    assert all(w == 8 and h == 4 for w, h, _ in m.values())
    # 256 distinct content classes -> 256 distinct fingerprints (a
    # collision would mean the chain lost information it shouldn't).
    assert len({md5 for _, _, md5 in m.values()}) == 256


def test_manifest_matches_regenerated_sample():
    # Re-run the generator's chain for a handful of classes (both
    # parities, both encoders) and compare against the committed
    # rows — catches a kernel codec change that forgot to re-run
    # scripts/gen_media_manifest.py.
    from scripts.gen_media_manifest import APP1, H, W, chain
    from karanta_ocr_spark.kernel.jpeg_mini import (
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )

    m = _manifest()
    for c in (0, 1, 2, 3, 128, 255):
        img = bytes(
            (c * 31 + y * 13 + x * 7) % 256 for y in range(H) for x in range(W)
        )
        for enc in (encode_jpeg_gray, encode_jpeg_gray_progressive):
            jpg = enc(W, H, img)
            if c % 2 == 1:
                jpg = jpg[:2] + APP1 + jpg[2:]
            assert chain(jpg) == m[c], c


def test_spark_chain_agrees_with_manifest(spark):
    # The actual Spark query (mapInPandas encode -> decode_images ->
    # resize -> grayscale -> md5) must land exactly on the manifest
    # for every row — the local twin of the driver's DuckDB join.
    import __spark_entry__ as entrymod

    m = _manifest()
    out = entrymod.queries()["media_decode_chain"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    for r in out:
        w, h, md5 = m[r["media_id"] % 256]
        assert (r["width"], r["height"], r["pixel_md5"]) == (w, h, md5)
