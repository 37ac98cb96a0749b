"""Structured Streaming extraction: availableNow batch-equivalence and
checkpoint resume."""

from karanta_ocr_spark.pipeline import run_extraction
from karanta_ocr_spark.sources.web_pages import synthetic_web_pages
from karanta_ocr_spark.streaming.extraction import run_streaming_extraction


def _wait(q, timeout=120):
    q.awaitTermination(timeout)


def test_streaming_equals_batch(spark, tmp_path):
    web = synthetic_web_pages(spark, n_docs=32, seed=42)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    web.write.parquet(in_dir)

    q = run_streaming_extraction(spark, in_dir, out_dir, ckpt, available_now=True)
    _wait(q)
    got = {
        (r["url"], r["doc_id"], r["text"])
        for r in spark.read.parquet(out_dir).collect()
    }
    batch = {
        (r["url"], r["doc_id"], r["text"])
        for r in run_extraction(spark, web, num_partitions=4).collect()
    }
    assert got == batch


def test_streaming_checkpoint_resume(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # One corpus split into two disjoint file batches (distinct urls).
    full = synthetic_web_pages(spark, n_docs=48, seed=42).cache()
    idx = "cast(regexp_extract(url, '/(\\\\d{6})\\\\.', 1) as int)"
    first = full.filter(f"{idx} < 16")
    first.write.parquet(in_dir)
    q = run_streaming_extraction(spark, in_dir, out_dir, ckpt, available_now=True)
    _wait(q)
    n1 = spark.read.parquet(out_dir).count()

    # New files arrive; restart from the same checkpoint → only the
    # new files are processed, nothing reprocessed.
    more = full.filter(f"{idx} >= 16")
    more.write.mode("append").parquet(in_dir)
    q2 = run_streaming_extraction(spark, in_dir, out_dir, ckpt, available_now=True)
    _wait(q2)
    out = spark.read.parquet(out_dir)
    n2 = out.count()
    assert n2 > n1
    dup = out.groupBy("url").count().filter("count > 1").count()
    assert dup == 0
