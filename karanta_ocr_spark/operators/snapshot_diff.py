"""Crawl-snapshot diff: new / changed / gone / unchanged per URL.

Monthly Common-Crawl-style snapshots overlap heavily; an incremental
corpus pipeline processes the DELTA, not the union. Given two
snapshots keyed by URL with a content fingerprint, classify every URL:

- ``new``       — in the current snapshot only;
- ``gone``      — in the previous snapshot only (page vanished:
  candidate for tombstoning downstream derived tables);
- ``changed``   — in both, fingerprint differs (re-extract);
- ``unchanged`` — in both, fingerprint equal (skip — the big bucket,
  typically 60-80% of a monthly recrawl).

One full-outer join on the URL — the canonical shape. Fingerprints
are hashes (md5/xxhash64 of extracted text), so the shuffle carries
(url, 16-32B) rows, never page bytes. At 10¹²-URL scale both sides
bucket by url (the natural Iceberg layout for crawl tables), making
the join co-located; AQE handles residual skew (a mega-host's URLs
share a prefix, not a join key, so URL-keyed joins don't hot-spot).

``diff_summary`` folds the per-URL verdicts into the four counts —
the recrawl planning numbers — in the same pass shape (one partial
agg over the join output).

Reference parity: karanta-ocr's resume skips EXACT done-ids
(``filter_already_committed``); the snapshot diff is the
content-aware generalization a recrawl needs (brief:
training-pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    prev: DataFrame,
    cur: DataFrame,
    url_col: str = "url",
    fp_col: str = "fingerprint",
) -> DataFrame:
    """Full-outer join of two ``(url, fingerprint)`` snapshots →
    ``(url, status, prev_fingerprint, cur_fingerprint)``."""
    p = prev.select(
        F.col(url_col).alias("url"), F.col(fp_col).alias("prev_fingerprint")
    )
    c = cur.select(
        F.col(url_col).alias("url"), F.col(fp_col).alias("cur_fingerprint")
    )
    j = p.join(c, "url", "full_outer")
    status = (
        F.when(F.col("prev_fingerprint").isNull(), F.lit("new"))
        .when(F.col("cur_fingerprint").isNull(), F.lit("gone"))
        .when(
            F.col("prev_fingerprint") == F.col("cur_fingerprint"),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "url", status.alias("status"), "prev_fingerprint", "cur_fingerprint"
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Fold a :func:`snapshot_diff` result into per-status counts."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_urls"))
