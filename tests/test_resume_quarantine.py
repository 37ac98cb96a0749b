"""Failure quarantine: permanently-failing docs stop being retried
after max_attempts runs (lineage-driven, no mutable state)."""

from karanta_ocr_spark.pipeline import run_extraction
from karanta_ocr_spark.resume import filter_known_failures
from karanta_ocr_spark.sources.web_pages import synthetic_web_pages


def test_failed_docs_quarantined_after_attempts(spark, tmp_path):
    out = str(tmp_path / "extr")
    met = str(tmp_path / "metrics")
    # 64-doc corpus: doc 49 is a corrupt PDF that always fails.
    web = synthetic_web_pages(spark, n_docs=64, seed=42)

    for _ in range(3):
        run_extraction(spark, web, output_path=out, metrics_path=met,
                       num_partitions=4)

    # After 3 failing runs the corrupt url is quarantined.
    remaining = filter_known_failures(spark, web, met, max_attempts=3)
    skipped = web.count() - remaining.count()
    assert skipped >= 1
    # Committed docs unaffected: 63 docs, exactly once each.
    docs = spark.read.parquet(out)
    assert docs.count() == 63
    assert docs.select("url").distinct().count() == 63

    # 4th run with quarantine active processes nothing new.
    d4 = run_extraction(spark, web, output_path=out, metrics_path=met,
                        num_partitions=4)
    assert d4.count() == 63


def test_quarantine_no_metrics_is_noop(spark, tmp_path):
    web = synthetic_web_pages(spark, n_docs=8, seed=42)
    same = filter_known_failures(spark, web, str(tmp_path / "nope"), 3)
    assert same.count() == web.count()
