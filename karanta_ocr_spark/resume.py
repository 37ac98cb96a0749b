"""Snapshot/checkpoint resume: skip documents whose output is already
committed.

The reference resumes by checking result-file existence per task
(``bulk_processing/workers/inference_worker.py:316-321``) and
re-initializing its work queue (``karanta/pipeline.py:1357``). The
Spark-native equivalent is ONE distributed LEFT ANTI join of the
source against the last committed output snapshot — idempotent,
coordination-free, and AQE turns it into a broadcast or skew-split
join as appropriate. Restarting a killed job with the same
output_path re-processes only the un-committed remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check through Hadoop's FS API (so
    s3a/hdfs paths work the same as local ones) — avoids probing via a
    thrown-and-logged AnalysisException on every fresh run."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def committed_urls(spark: SparkSession, output_path: str) -> DataFrame | None:
    """urls present in the committed output snapshot, or None if no
    output exists yet (first run). Goes through the table-IO seam, so
    on an Iceberg-equipped cluster the snapshot read sees exactly the
    last committed Iceberg snapshot."""
    from karanta_ocr_spark.sources.table_io import read_table

    try:
        if not _path_exists(spark, output_path):
            return None
        return read_table(spark, output_path).select("url")
    except Exception:
        return None  # unreadable/empty path → treat as fresh run


def filter_already_committed(
    spark: SparkSession, source: DataFrame, output_path: str
) -> DataFrame:
    done = committed_urls(spark, output_path)
    if done is None:
        return source
    # LEFT ANTI on url — at 10^12 rows this is a shuffled hash/SMJ;
    # AQE's skewJoin handles hot url prefixes, and when the committed
    # side is small Catalyst broadcasts it automatically.
    return source.join(done, on="url", how="left_anti")


def filter_known_failures(
    spark: SparkSession,
    source: DataFrame,
    metrics_path: str,
    max_attempts: int = 3,
) -> DataFrame:
    """Quarantine: skip documents that already failed *max_attempts*
    times (counted from the lineage table's failure samples).

    Failed docs are never committed, so plain snapshot resume retries
    them forever; this mirrors the reference's bounded retry budget
    (``autoretry_for`` max 10, bulk_processing/workers/
    inference_worker.py:288-290) without any mutable task state —
    attempts are just failure rows accumulated across runs.
    """
    from pyspark.sql import functions as F

    from karanta_ocr_spark.metrics import failures_path

    # Sources of failure evidence, UNIONED: the unbounded per-url
    # failures table (primary — the bounded lineage failure_samples
    # hide urls on partitions with many failures) plus the lineage
    # samples themselves, so attempts recorded before the failures
    # table existed still count. countDistinct(run_id) dedups a url
    # appearing in both tables for the same run.
    fpath = failures_path(metrics_path)
    parts = []
    if _path_exists(spark, fpath):
        try:
            parts.append(spark.read.parquet(fpath).select("run_id", "url"))
        except Exception:
            pass
    if _path_exists(spark, metrics_path):
        try:
            metrics = spark.read.parquet(metrics_path)
            parts.append(
                metrics.select(
                    "run_id", F.explode("failure_samples").alias("f")
                ).select("run_id", F.col("f.url").alias("url"))
            )
        except Exception:
            pass
    if not parts:
        return source
    per_run_url = parts[0]
    for p in parts[1:]:
        per_run_url = per_run_url.unionByName(p)
    # Attempts = distinct runs in which the url failed (staged mode can
    # log several failed pages of one url in one run).
    failed = (
        per_run_url.groupBy("url")
        .agg(F.countDistinct("run_id").alias("attempts"))
        .filter(F.col("attempts") >= max_attempts)
        .select("url")
    )
    return source.join(failed, on="url", how="left_anti")
