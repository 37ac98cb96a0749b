"""Streaming Bloom dedup tests: two availableNow micro-batch runs
over a growing directory must emit exactly the batch
``bloom_new_docs`` semantics (history-wide seen-before with fixed
filter memory), the filter directory must advance one committed
version per batch, and a replayed batch must converge (idempotent
filter merge, retry-safe version read)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from karanta_ocr_spark.streaming.bloom_dedup import (
    bloom_dedup_batch_processor,
    load_filter,
    run_streaming_bloom_dedup,
)

BITS = 1 << 14
K = 4


def _write_batch(path, rows):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _stream(spark, in_dir):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )


def test_streaming_bloom_two_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    out_dir = str(tmp_path / "out")
    fdir = str(tmp_path / "filter")
    ckpt = str(tmp_path / "ckpt")

    b1 = [(i, f"streamed page {i} body") for i in range(20)]
    # batch 2: 10 repeats of batch 1, one within-batch duplicate pair,
    # 9 fresh docs.
    b2 = (
        [(100 + i, f"streamed page {i} body") for i in range(10)]
        + [(200, "fresh page A"), (201, "fresh page A")]
        + [(300 + i, f"fresh page {i}") for i in range(8)]
    )
    _write_batch(in_dir / "b1.jsonl", b1)
    q = run_streaming_bloom_dedup(
        _stream(spark, in_dir), fdir, out_dir, ckpt,
        num_bits=BITS, k=K,
    )
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    assert first.count() == 20  # everything in batch 1 is new

    _write_batch(in_dir / "b2.jsonl", b2)
    q2 = run_streaming_bloom_dedup(
        _stream(spark, in_dir), fdir, out_dir, ckpt,
        num_bits=BITS, k=K,
    )
    q2.awaitTermination(120)
    rows = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    # batch-1 repeats suppressed (no false negatives), within-batch
    # dup pair collapsed to one survivor, fresh docs kept modulo the
    # (tiny at 16k bits / 20 entries) false-positive rate.
    assert all(i in rows for i in range(20))
    assert not any((100 + i) in rows for i in range(10))
    assert (200 in rows) != (201 in rows)
    fresh_kept = sum(1 for i in range(8) if (300 + i) in rows)
    assert fresh_kept >= 7

    # exactly one committed filter version per processed batch, and
    # the filter covers every emitted doc (screening output against
    # it says seen_before for all).
    from karanta_ocr_spark.operators.bloom import bloom_screen

    vs = sorted(
        d for d in os.listdir(fdir) if d.startswith("v=")
    )
    assert len(vs) == 2
    filt = load_filter(spark, fdir)
    emitted = spark.read.parquet(out_dir)
    rescreen = bloom_screen(emitted, filt, "text", BITS, K)
    assert rescreen.filter(~F.col("seen_before")).count() == 0


def test_retry_replays_against_predecessor_version(spark, tmp_path):
    # Simulate a micro-batch retry: run the processor for batch 5
    # twice. The second run must read the filter-as-of-before-batch-5
    # (not its own committed v=5) and hand the SAME new-rows set to
    # the sink.
    fdir = str(tmp_path / "filter")
    seen_per_call = []

    def sink(new, batch_id):
        seen_per_call.append(
            sorted(r["doc_id"] for r in new.select("doc_id").collect())
        )

    proc = bloom_dedup_batch_processor(fdir, sink, num_bits=BITS, k=K)
    prior = spark.createDataFrame(
        [(i, f"old {i}") for i in range(5)], "doc_id long, text string"
    )
    proc(prior, 3)  # seeds v=3
    batch = spark.createDataFrame(
        [(0, "old 0"), (10, "new ten"), (11, "new eleven")],
        "doc_id long, text string",
    )
    proc(batch, 5)
    proc(batch, 5)  # retry
    assert seen_per_call[1] == [10, 11]
    assert seen_per_call[2] == [10, 11]  # not masked by its own bits
    vs = sorted(d for d in os.listdir(fdir) if d.startswith("v="))
    assert vs == ["v=3", "v=5"]
