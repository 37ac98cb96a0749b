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


def test_quarantine_not_capped_by_failure_sample_bound(spark, tmp_path):
    # >FAILURE_SAMPLE_N failing urls in ONE partition: the bounded
    # lineage sample alone would hide most of them from the attempt
    # counter; the dedicated failures table must quarantine all of
    # them after max_attempts runs (ADVICE r01).
    import datetime

    from karanta_ocr_spark.metrics import FAILURE_SAMPLE_N
    from karanta_ocr_spark.sources.web_pages import WEB_PAGES_SCHEMA

    n_bad = FAILURE_SAMPLE_N + 4
    ts = datetime.datetime(2025, 1, 1)
    rows = [
        (f"https://bad.example.org/{i}", ts,
         b"%PDF-1.4\nnot a real pdf body at all", None, "en")
        for i in range(n_bad)
    ] + [
        (f"https://good.example.org/{i}", ts,
         ("<html><body><article><h1>T</h1><p>" + "words " * 40 +
          "</p></article></body></html>").encode(), None, "en")
        for i in range(4)
    ]
    web = spark.createDataFrame(rows, WEB_PAGES_SCHEMA).coalesce(1)
    out, met = str(tmp_path / "extr"), str(tmp_path / "metrics")
    for _ in range(3):
        run_extraction(spark, web, output_path=out, metrics_path=met,
                       num_partitions=1)
    remaining = filter_known_failures(spark, web, met, max_attempts=3)
    kept = {r["url"] for r in remaining.select("url").collect()}
    assert not any(u.startswith("https://bad.") for u in kept)
    assert sum(u.startswith("https://good.") for u in kept) == 4


def test_pre_upgrade_lineage_attempts_still_count(spark, tmp_path):
    # Attempts recorded only in lineage failure_samples (before the
    # dedicated failures table existed) must union with the new
    # table's attempts (code-review r2).
    met = str(tmp_path / "metrics")
    from karanta_ocr_spark.metrics import failures_path
    from karanta_ocr_spark.sources.web_pages import WEB_PAGES_SCHEMA

    url = "https://bad.example.org/x"
    # two pre-upgrade runs: failure evidence only in lineage samples
    lineage = spark.createDataFrame(
        [(rid, [ {"url": url, "error": "boom"} ]) for rid in ("r1", "r2")],
        "run_id string, failure_samples array<struct<url:string,error:string>>",
    )
    lineage.write.mode("append").parquet(met)
    # one post-upgrade run: failures table only
    spark.createDataFrame(
        [("r3", url, "boom")], "run_id string, url string, error string"
    ).write.mode("append").parquet(failures_path(met))

    import datetime
    src = spark.createDataFrame(
        [(url, datetime.datetime(2025, 1, 1), b"x", None, "en"),
         ("https://ok.example.org/y", datetime.datetime(2025, 1, 1), b"x", None, "en")],
        WEB_PAGES_SCHEMA,
    )
    kept = {r["url"] for r in
            filter_known_failures(spark, src, met, max_attempts=3).collect()}
    assert kept == {"https://ok.example.org/y"}
