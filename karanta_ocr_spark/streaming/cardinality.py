"""Streaming distinct-cardinality tracking — the HyperLogLog sketch
(``functions/sketches``) carried across micro-batches in FIXED memory.

The operational question on a continuous crawl is "how many distinct
hosts/urls have we EVER seen, per language?" — exact streaming
distinct state grows without bound and the engine's watermark
eviction makes late arrivals double-count. The HLL register table is
the right state object: m rows per group forever, and the merge is
an elementwise max, which is IDEMPOTENT and COMMUTATIVE — exactly the
algebra micro-batch retries need.

Same versioned-state device as ``streaming/bloom_dedup`` (``v=<epoch>``
subdirs + pruning): a replayed batch N re-reads the newest version
STRICTLY OLDER than N, so a retry can't merge its own failed
attempt's registers twice (harmless anyway — max is idempotent — but
the emitted per-batch estimate snapshot must be deterministic under
replay, and the strictly-older read guarantees it).

Exactness contract (pytest-pinned): after any number of micro-batches
in any order, the committed register table is IDENTICAL to the
batch-mode ``hll_registers`` over the union of all rows — the
streaming path loses nothing vs a from-scratch recount.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from karanta_ocr_spark.functions.sketches import hll_estimate, hll_registers

_V_RE = re.compile(r"^v=(\d+)$")


def _versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        m = _V_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def load_registers(
    spark: SparkSession,
    state_dir: str,
    group_cols: list[str],
    before_batch: int | None = None,
) -> DataFrame:
    """Newest committed register table (optionally strictly older
    than *before_batch* — the retry-safe read)."""
    vs = _versions(state_dir)
    if before_batch is not None:
        vs = [v for v in vs if v < before_batch]
    schema = ", ".join(f"{g} string" for g in group_cols)
    schema = (schema + ", " if schema else "") + "bucket long, rank int"
    if not vs:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(os.path.join(state_dir, f"v={vs[-1]}"))


def hll_coverage_batch_processor(
    state_dir: str,
    estimates_dir: str,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = 10,
    keep_versions: int = 2,
):
    """A ``foreachBatch`` function: merge the micro-batch's registers
    into the all-of-history table, commit ``v=<batch_id>``, and append
    one estimate snapshot row per group to *estimates_dir* —
    ``(group..., n_registers, estimate, batch_id)``, the coverage
    curve a crawl operator watches."""
    if keep_versions < 2:
        # With one retained version, a replayed batch N finds no
        # version strictly older than N (pruning deleted them), loads
        # an EMPTY prior, and overwrites v=N with only that batch's
        # registers — silently discarding all accumulated state. Two
        # versions is the minimum for at-least-once replay safety.
        raise ValueError(
            f"keep_versions must be >= 2 for replay safety, got "
            f"{keep_versions}"
        )
    groups = list(group_cols or [])

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prior = load_registers(spark, state_dir, groups, before_batch=batch_id)
        batch_regs = hll_registers(batch_df, value_col, groups, b=b)
        merged = (
            prior.unionByName(batch_regs)
            .groupBy(*groups, "bucket")
            .agg(F.max("rank").alias("rank"))
        ).persist()
        try:
            vdir = os.path.join(state_dir, f"v={batch_id}")
            # Overwrite so a retry that died mid-write converges.
            merged.write.mode("overwrite").parquet(vdir)
            # Snapshot into a per-batch PARTITION dir with overwrite —
            # foreachBatch replays batches at-least-once, and a plain
            # append would duplicate the (group, batch_id) row on
            # replay; overwrite-into-batch_id=N converges instead.
            # Readers get batch_id back as the partition column.
            snap = hll_estimate(merged, groups, b=b)
            snap.write.mode("overwrite").parquet(
                os.path.join(estimates_dir, f"batch_id={int(batch_id)}")
            )
            for v in _versions(state_dir)[:-keep_versions]:
                shutil.rmtree(
                    os.path.join(state_dir, f"v={v}"), ignore_errors=True
                )
        finally:
            merged.unpersist()

    return process


def run_streaming_hll_coverage(
    stream: DataFrame,
    state_dir: str,
    estimates_dir: str,
    checkpoint_dir: str,
    value_col: str,
    group_cols: list[str] | None = None,
    b: int = 10,
):
    """Wire a streaming DataFrame through the HLL coverage tracker.
    Returns the started ``StreamingQuery``."""
    return (
        stream.writeStream.foreachBatch(
            hll_coverage_batch_processor(
                state_dir, estimates_dir, value_col, group_cols, b=b
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
