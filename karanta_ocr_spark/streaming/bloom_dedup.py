"""Streaming Bloom dedup — all-of-history seen-before screening for
a continuous crawl, in FIXED memory.

``streaming/dedup.streaming_exact_dedup`` is exact but time-bounded:
the engine evicts key state older than the watermark, so a duplicate
arriving a week later sails through. This module is the complement —
the ``operators/bloom`` filter carried across micro-batches:

* state is the (word_idx, bits) filter table, m bits FOREVER —
  independent of how many documents have ever streamed past;
* no duplicate of anything ever inserted is emitted again (no false
  negatives), at the price of the filter's false-positive rate
  dropping a bounded fraction of genuinely-new docs;
* each micro-batch is screened map-side (k broadcast joins) and the
  filter is advanced by one bounded ``bit_or`` merge.

Implemented with ``foreachBatch`` because the state is a TABLE
shared across all keys, which the per-key ``applyInPandasWithState``
model cannot express. Filter persistence is versioned-by-batch-id
(``v=<epoch>`` subdirs + pruning), which makes micro-batch RETRIES
deterministic: a replayed batch N re-reads the newest version
STRICTLY OLDER than N — never the version its failed attempt may
already have committed — so its own bits can't mask it, and the
downstream sink sees the identical new-rows set again (idempotent
overall when the sink itself is; the filter merge is idempotent by
construction, bit_or twice = bit_or once).

Within-batch duplicates are handled by a batch-local
``dropDuplicates`` on the content hash (the filter only learns a
batch's bits AFTER the batch is screened).
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from karanta_ocr_spark.operators.bloom import bloom_build, bloom_screen

_EMPTY_SCHEMA = "word_idx long, bits long"
_V_RE = re.compile(r"^v=(\d+)$")


def _versions(filter_dir: str) -> list[int]:
    if not os.path.isdir(filter_dir):
        return []
    out = []
    for name in os.listdir(filter_dir):
        m = _V_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def load_filter(
    spark: SparkSession, filter_dir: str, before_batch: int | None = None
) -> DataFrame:
    """The newest committed filter version (optionally restricted to
    versions strictly older than *before_batch* — the retry-safe
    read). Empty filter when none exists yet."""
    vs = _versions(filter_dir)
    if before_batch is not None:
        vs = [v for v in vs if v < before_batch]
    if not vs:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    return spark.read.parquet(os.path.join(filter_dir, f"v={vs[-1]}"))


def bloom_dedup_batch_processor(
    filter_dir: str,
    sink,
    col: str = "text",
    num_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 42,
    keep_versions: int = 2,
):
    """A ``foreachBatch`` function: screen the micro-batch against
    the filter-as-of-before-this-batch, hand the definitely-new rows
    to *sink(new_df, batch_id)*, then commit filter version
    ``v=<batch_id>`` = old filter ∪ new rows' bits and prune all but
    the newest *keep_versions* versions (retry reads never need
    more than the immediate predecessor; 2 keeps one spare)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prior = load_filter(spark, filter_dir, before_batch=batch_id)
        batch = batch_df.withColumn("_ck", F.xxhash64(F.col(col))).dropDuplicates(
            ["_ck"]
        ).drop("_ck")
        new = (
            bloom_screen(batch, prior, col, num_bits, k, seed)
            .filter(~F.col("seen_before"))
            .drop("seen_before")
        )
        new = new.persist()
        try:
            sink(new, batch_id)
            merged = (
                prior.unionByName(bloom_build(new, col, num_bits, k, seed))
                .groupBy("word_idx")
                .agg(F.bit_or("bits").alias("bits"))
            )
            vdir = os.path.join(filter_dir, f"v={batch_id}")
            # Overwrite (not error) so a retry that died mid-write
            # converges to the same committed version.
            merged.write.mode("overwrite").parquet(vdir)
            for v in _versions(filter_dir)[:-keep_versions]:
                shutil.rmtree(
                    os.path.join(filter_dir, f"v={v}"), ignore_errors=True
                )
        finally:
            new.unpersist()

    return process


def run_streaming_bloom_dedup(
    stream: DataFrame,
    filter_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    col: str = "text",
    num_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 42,
):
    """Wire a streaming DataFrame through the Bloom screen into an
    append-mode parquet sink at *output_dir*. Returns the started
    ``StreamingQuery``; callers drive it (``processAllAvailable`` in
    tests, ``awaitTermination`` in jobs)."""

    def sink(new: DataFrame, batch_id: int) -> None:
        new.write.mode("append").parquet(output_dir)

    return (
        stream.writeStream.foreachBatch(
            bloom_dedup_batch_processor(
                filter_dir, sink, col, num_bits, k, seed
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
