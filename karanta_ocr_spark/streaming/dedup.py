"""Streaming exact deduplication — the incremental-ingest twin of
``operators.dedup.exact_dedup``.

A crawl that ingests continuously cannot re-run the batch groupBy
over the whole corpus per micro-batch; Structured Streaming's
stateful ``dropDuplicates`` family is the native answer:

* :func:`streaming_exact_dedup` — ``withWatermark +
  dropDuplicatesWithinWatermark``: keeps the FIRST-arriving row per
  key and guarantees suppression of any duplicate arriving within
  the watermark delay of it, while the engine evicts key state older
  than the watermark — bounded state, the only formulation that
  survives an unbounded stream. (Plain ``dropDuplicates`` on a
  stream never evicts and eventually OOMs the state store; it is
  deliberately not offered here.)

The dedup key defaults to ``xxhash64`` of the text (an 8-byte state
key instead of the document bytes) plus the length as a cheap
collision tripwire — the same state-size lesson as the batch
``dedup_paragraphs`` shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    watermark: str = "1 hour",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """First-arrival exact dedup over a streaming DataFrame.

    *key_cols* overrides the default content key (xxhash64(text) +
    length). Rows whose key was already seen within *watermark* of
    event time are dropped; state for keys older than the watermark
    is evicted by the engine. Emits input rows unchanged (plus the
    internal ``_dk`` key columns dropped before return)."""
    df = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if key_cols is None:
        df = df.withColumn("_dk_hash", F.xxhash64(F.col(text_col))).withColumn(
            "_dk_len", F.length(F.col(text_col))
        )
        key_cols = ["_dk_hash", "_dk_len"]
        drop_after = True
    else:
        drop_after = False
    df = df.withWatermark(ts_col, watermark)
    out = df.dropDuplicatesWithinWatermark(key_cols)
    return out.drop("_dk_hash", "_dk_len") if drop_after else out
