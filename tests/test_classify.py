"""Model-scoring operator (SURVEY §2.9 — the reference image
classifier's process-singleton + batch-predict pattern as a
``predict_batch_udf``)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from karanta_ocr_spark.operators.classify import (
    NEGATIVE_LABEL,
    POSITIVE_LABEL,
    _LOAD_COUNTS,
    classify_features,
    classify_images,
    load_model,
    md5_logistic_weights,
)


def test_load_model_is_process_singleton():
    # The reference loads its HF pipeline once at module level
    # (image_classifier.py:8-12); load_model mirrors that contract.
    m1 = load_model(3, seed=7)
    m2 = load_model(3, seed=7)
    assert m1 is m2
    assert _LOAD_COUNTS[(3, 7)] == 1
    assert load_model(3, seed=8) is not m1  # different model key


def test_md5_weights_deterministic_and_bounded():
    w, b = md5_logistic_weights(4, seed=42)
    w2, b2 = md5_logistic_weights(4, seed=42)
    assert list(w) == list(w2) and b == b2
    assert all(-1.0 <= x < 1.0 for x in list(w) + [b])


def test_classify_features_matches_reference_formula(spark):
    rows = [(1, 0.2, 0.3), (2, -1.0, 2.0), (3, 0.0, 0.0)]
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double")
    out = {r["id"]: r for r in classify_features(df, ["f1", "f2"], seed=5).collect()}
    w, b = md5_logistic_weights(2, seed=5)
    for rid, f1, f2 in rows:
        z = b + f1 * w[0] + f2 * w[1]
        expect = 1.0 / (1.0 + math.exp(-z))
        assert abs(out[rid]["score"] - expect) < 1e-12
        assert out[rid]["label"] == (
            POSITIVE_LABEL if expect >= 0.5 else NEGATIVE_LABEL
        )


def test_classify_features_partition_invariant(spark):
    df = spark.range(200).select(
        F.col("id"),
        (F.col("id") % 17 / 10.0).alias("a"),
        (F.col("id") % 5 - 2.0).alias("b"),
    )
    r1 = {r["id"]: (r["score"], r["label"])
          for r in classify_features(df.repartition(1), ["a", "b"]).collect()}
    r8 = {r["id"]: (r["score"], r["label"])
          for r in classify_features(df.repartition(8), ["a", "b"]).collect()}
    assert r1 == r8 and len(r1) == 200


def test_classify_images_over_real_decoded_jpegs(spark):
    # End-to-end reference shape: JPEG bytes → stdlib decode →
    # grayscale → pixel-stats features → singleton batch scoring.
    from karanta_ocr_spark.kernel.jpeg_mini import encode_jpeg_gray
    from karanta_ocr_spark.operators.multimodal import (
        decode_images,
        grayscale_images,
    )

    w, h = 16, 8
    rows = []
    for mid in range(6):
        img = bytes((mid * 31 + y * 13 + x * 7) % 256
                    for y in range(h) for x in range(w))
        rows.append((mid, encode_jpeg_gray(w, h, img)))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    decoded = grayscale_images(decode_images(df))
    out = classify_images(decoded, seed=42).collect()
    assert len(out) == 6
    for r in out:
        assert 0.0 <= r["score"] <= 1.0
        assert r["label"] in (POSITIVE_LABEL, NEGATIVE_LABEL)
        assert r["f_aspect"] == 2.0  # 16x8
        assert 0.0 <= r["f_mean"] <= 1.0
    # Determinism across partitionings (the classifier must not depend
    # on batch boundaries).
    again = classify_images(
        grayscale_images(decode_images(df.repartition(4))), seed=42
    ).collect()
    assert {(r["media_id"], r["score"], r["label"]) for r in again} == {
        (r["media_id"], r["score"], r["label"]) for r in out
    }


def test_classify_images_null_pixels_score_null(spark):
    # Undecodable rows (None pixels) must flow through as NULL scores,
    # not kill the batch.
    from karanta_ocr_spark.operators.classify import image_stats_features

    rows = [(1, None, None, None), (2, bytes(range(12)), 4, 3)]
    df = spark.createDataFrame(
        rows, "media_id long, pixels binary, width int, height int"
    )
    feats = {r["media_id"]: r for r in image_stats_features(df).collect()}
    assert feats[1]["f_mean"] is None
    assert feats[2]["f_mean"] is not None
