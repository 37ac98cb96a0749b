"""Streaming HLL coverage: the committed register state after any
sequence of micro-batches must equal batch-mode ``hll_registers``
over the union of all streamed rows (the streaming path loses
nothing), per-batch estimate snapshots must land append-only with
their batch ids, and a replayed batch must converge (idempotent max
merge + strictly-older version read)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from karanta_ocr_spark.functions.sketches import hll_estimate, hll_registers
from karanta_ocr_spark.streaming.cardinality import (
    hll_coverage_batch_processor,
    load_registers,
    run_streaming_hll_coverage,
)

B = 8  # m=256 registers — small enough to eyeball, real enough to merge


def _write_batch(path, rows):
    with open(path, "w") as f:
        for lang, host in rows:
            f.write(json.dumps({"lang": lang, "host": host}) + "\n")


def _stream(spark, in_dir):
    return (
        spark.readStream.schema("lang string, host string")
        .option("maxFilesPerTrigger", 1)
        .json(str(in_dir))
    )


def _batches():
    b1 = [("en", f"h{i}.example") for i in range(120)]
    # overlap with b1 + new hosts + a second language
    b2 = [("en", f"h{i}.example") for i in range(60, 200)] + [
        ("fr", f"f{i}.example") for i in range(30)
    ]
    return b1, b2


def test_streaming_hll_matches_batch_recount(spark, tmp_path):
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    sdir, edir, ckpt = (str(tmp_path / d) for d in ("state", "est", "ckpt"))
    b1, b2 = _batches()

    _write_batch(in_dir / "b1.jsonl", b1)
    q = run_streaming_hll_coverage(
        _stream(spark, in_dir), sdir, edir, ckpt, "host", ["lang"], b=B
    )
    q.awaitTermination(120)
    _write_batch(in_dir / "b2.jsonl", b2)
    q2 = run_streaming_hll_coverage(
        _stream(spark, in_dir), sdir, edir, ckpt, "host", ["lang"], b=B
    )
    q2.awaitTermination(120)

    streamed = load_registers(spark, sdir, ["lang"])
    full = spark.createDataFrame(b1 + b2, "lang string, host string")
    direct = hll_registers(full, "host", ["lang"], b=B)
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # estimate snapshots: one per (group, batch); the en estimate is
    # non-decreasing and tracks the true distinct counts (200 en, 30 fr)
    snaps = spark.read.parquet(edir).collect()
    by = {(r["lang"], r["batch_id"]): r["estimate"] for r in snaps}
    assert len(by) == 3  # en@b0, en@b1, fr@b1
    en = sorted(v for (lang, _), v in by.items() if lang == "en")
    assert en[0] <= en[1]
    assert abs(en[1] - 200) / 200 < 0.25
    fr = [v for (lang, _), v in by.items() if lang == "fr"]
    assert abs(fr[0] - 30) / 30 < 0.35


def test_streaming_hll_replay_converges(spark, tmp_path):
    sdir = str(tmp_path / "state")
    edir = str(tmp_path / "est")
    b1, b2 = _batches()
    proc = hll_coverage_batch_processor(sdir, edir, "host", ["lang"], b=B)
    d1 = spark.createDataFrame(b1, "lang string, host string")
    d2 = spark.createDataFrame(b2, "lang string, host string")
    proc(d1, 0)
    proc(d2, 1)
    after_once = sorted(map(tuple, load_registers(spark, sdir, ["lang"]).collect()))
    snaps_once = sorted(map(tuple, spark.read.parquet(edir).collect()))
    # replay batch 1 (driver died before checkpoint commit): the
    # strictly-older read merges batch 2 into v=0 again — same result,
    # and the per-batch overwrite keeps the snapshot series free of
    # duplicate (group, batch_id) rows.
    proc(d2, 1)
    after_replay = sorted(map(tuple, load_registers(spark, sdir, ["lang"]).collect()))
    assert after_once == after_replay
    snaps_replay = sorted(map(tuple, spark.read.parquet(edir).collect()))
    assert snaps_once == snaps_replay


def test_keep_versions_below_two_rejected():
    # keep_versions=1 would let a replayed batch find no strictly-older
    # version and silently reset all accumulated state; the processor
    # must refuse to be constructed that way.
    import pytest

    with pytest.raises(ValueError, match="keep_versions"):
        hll_coverage_batch_processor("/tmp/x", "/tmp/y", "v", keep_versions=1)
