"""End-to-end corpus build: web pages → extraction → curation →
MinHash dedup → quality gate → tokenized training shards, chained the
way a production data-pipeline run composes the operators. Pins (a)
that the stage interfaces actually compose, (b) that the final shard
bytes are deterministic end-to-end (two full runs byte-identical),
and (c) the conservation invariants between stages (every input doc
is accounted for exactly once: kept, or dropped with a stage verdict).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from karanta_ocr_spark.fixtures import generate_web_pages
from karanta_ocr_spark.operators.curate import curate_corpus
from karanta_ocr_spark.operators.dedup import minhash_lsh_dedup
from karanta_ocr_spark.operators.export import read_token_shards, write_token_shards
from karanta_ocr_spark.pipeline import run_extraction


@pytest.fixture(scope="module")
def extracted(spark):
    rows = generate_web_pages(96, seed=7)
    web = spark.createDataFrame(
        [(r["url"], r["lang"], r["html"]) for r in rows],
        "url string, lang string, html binary",
    )
    docs = run_extraction(spark, web, repartition_input=False, apply_conf=False)
    return docs.select("url", "doc_id", "text", "lang").cache()


def test_full_chain_composes_and_conserves(spark, extracted, tmp_path):
    n_extracted = extracted.count()
    assert n_extracted > 80  # the corrupt-PDF row(s) drop at the gate

    langs = [r["lang"] for r in extracted.select("lang").distinct().collect()]
    kept, funnel_tbl = curate_corpus(extracted, allowed_langs=langs)
    rows = sorted(map(tuple, funnel_tbl.collect()))  # (idx, stage, dropped, survivors)
    n_kept = kept.count()
    # conservation: per-stage drops + final survivors account for
    # every input doc exactly once
    assert sum(r[2] for r in rows) + n_kept == n_extracted
    assert rows[-1][3] == n_kept  # survivors after the last stage

    survivors = minhash_lsh_dedup(
        kept.select("doc_id", "text", "lang"), base_hash="md5"
    )
    n_surv = survivors.count()
    assert 0 < n_surv <= n_kept

    out_dir = str(tmp_path / "shards")
    total = write_token_shards(
        survivors.select("doc_id", "text"), out_dir,
        seq_len=64, shard_seqs=4,
    )
    files = sorted(glob.glob(os.path.join(out_dir, "shard-*.bin")))
    assert files, "no shards written"
    stream = read_token_shards(out_dir)
    assert len(stream) == total
    # every shard but the last holds exactly seq_len*shard_seqs tokens
    sizes = [os.path.getsize(f) // 4 for f in files]
    assert all(s == 64 * 4 for s in sizes[:-1])
    assert 0 < sizes[-1] <= 64 * 4


def test_full_chain_is_deterministic(spark, extracted, tmp_path):
    langs = [r["lang"] for r in extracted.select("lang").distinct().collect()]

    def run(out_dir: str) -> bytes:
        kept, _ = curate_corpus(extracted, allowed_langs=langs)
        survivors = minhash_lsh_dedup(
            kept.select("doc_id", "text", "lang"), base_hash="md5"
        )
        write_token_shards(
            survivors.select("doc_id", "text"), out_dir,
            seq_len=64, shard_seqs=4,
        )
        blob = b""
        for f in sorted(glob.glob(os.path.join(out_dir, "shard-*.bin"))):
            with open(f, "rb") as fh:
                blob += fh.read()
        return blob

    a = run(str(tmp_path / "a"))
    b = run(str(tmp_path / "b"))
    assert a == b and len(a) > 0
