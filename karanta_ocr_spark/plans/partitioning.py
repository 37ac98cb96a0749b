"""Partitioning strategy: explicit skew salting + size-bucketed
repartitioning + AQE (north rule: "partitioning / shuffle / skew
handled explicitly").

Why each knob exists at 10^12-document scale:

* **Domain skew**: Common-Crawl URL keys are Zipf-distributed — a hot
  domain can be 10^4× the median. Any operation keyed by domain (and
  file-listing locality) would hot-spot one task. We salt with
  ``pmod(xxhash64(url), n)`` — uniform by construction, deterministic,
  and cheap (one JVM hash, no Python). The reference's analog is its
  sampled pages-per-group work sizing (karanta/pipeline.py:1300-1333).
* **Size skew**: blob sizes are heavy-tailed (a 200 MB PDF next to
  2 KB pages). A task that draws several giant blobs OOMs its Arrow
  batch. ``size_bucket = int(log2(len(html)))`` groups rows by
  magnitude; range-repartitioning by (bucket, salt) gives the big
  buckets their own partitions, which combined with a small
  ``arrow.maxRecordsPerBatch`` bounds executor memory.
* **AQE**: coalesces the small-bucket partitions back together at
  runtime and handles residual skew in the resume anti-join
  (``spark.sql.adaptive.skewJoin``).

Everything here is column math — Catalyst sees through it, and no
custom rules or RDDs are involved.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

#: Engine session configuration (documented, applied by the pipeline).
ENGINE_CONF = {
    # AQE: runtime coalesce + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow batches: bound batch memory when blobs are large while
    # amortizing per-batch Python overhead (measured sweet spot for
    # 1-100 KB web pages; drop this for a corpus of 100 MB PDFs).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Scan granularity: 64 MB splits so wide binary scans parallelize.
    "spark.sql.files.maxPartitionBytes": str(64 * 1024 * 1024),
}

# Driver-JVM service-thread bounds (effective at session build; the
# runtime ``apply_engine_conf`` path no-ops on static confs via its
# guard). The JVM sizes BOTH its GC worker pool and its JIT compiler
# pool ergonomically from the core count (this 32-core box: 23 G1
# workers, 15 tiered-compiler threads), so on a node whose task slots
# already cover every core the service threads oversubscribe the CPUs
# exactly when the engine is busiest — measured here as multi-second
# first-execution inflation of plan-heavy queries while C2 compiles
# their generated code concurrently with 32 busy task threads.
# Bounding the pools keeps compilation in the background; the same
# bound applies to many-core production executors
# (``spark.executor.extraJavaOptions``) where task slots, not JVM
# service pools, should own the cores. Parameterised:
# ``SPARK_GRAFT_JAVA_OPTS`` (also read by bench.py) overrides this
# whole string when set.
if not os.environ.get("SPARK_GRAFT_JAVA_OPTS"):
    ENGINE_CONF["spark.driver.extraJavaOptions"] = (
        "-XX:ParallelGCThreads=8 -XX:ConcGCThreads=2 -XX:CICompilerCount=4"
    )


def apply_engine_conf(spark) -> None:
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable at runtime on some builds — builder sets it


def cache_sized(
    df: DataFrame, rows_per_task: int | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """Persist *df*, materialize it, and coalesce the cached frame to a
    size-derived partition count (optimization guide §2: derive
    partitioning from data size, not a constant).

    For frames that an iterative trainer or multi-consumer plan will
    scan many times, per-partition task overhead dominates when the
    frame is small; ``coalesce`` is a narrow (shuffle-free) merge of
    the cached blocks, so a bench-scale frame is rescanned as one task
    while a production-scale frame keeps full parallelism.

    Returns ``(frame_for_compute, cached_handle, n_rows)`` — callers
    unpersist via the cached handle once the consumers are done.
    """
    import math
    import os

    if rows_per_task is None:
        rows_per_task = int(
            os.environ.get("SPARK_GRAFT_GRAPH_ROWS_PER_TASK", "250000")
        )
    cached = df.persist()
    n = cached.count()
    npart = max(
        1,
        min(
            cached.sparkSession.sparkContext.defaultParallelism,
            math.ceil(n / rows_per_task),
        ),
    )
    out = cached
    if npart < cached.rdd.getNumPartitions():
        out = cached.coalesce(npart)
    return out, cached, n


def with_domain(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Extract the host from the url (pure Catalyst regexp)."""
    return df.withColumn(
        "domain", F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    )


def with_salt(df: DataFrame, buckets: int, url_col: str = "url") -> DataFrame:
    """Deterministic uniform salt — breaks domain/key skew for any
    downstream partitioning (xxhash64 is JVM-side, whole-stage
    codegen friendly)."""
    return df.withColumn("salt", F.pmod(F.xxhash64(F.col(url_col)), F.lit(buckets)))


def with_size_bucket(df: DataFrame, blob_col: str = "html") -> DataFrame:
    """log2 size bucket of the payload — isolates the heavy tail.

    ``octet_length`` is exact byte size; +1 avoids log2(0)."""
    return df.withColumn(
        "size_bucket",
        F.floor(F.log2(F.octet_length(F.col(blob_col)).cast("double") + F.lit(1.0))).cast("int"),
    )


def prepare_for_extraction(
    df: DataFrame,
    num_partitions: int,
    blob_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Salt-repartition the input for the extraction stage.

    Hash repartition on an explicit ``salt = pmod(xxhash64(url), 16 ×
    num_partitions)`` — uniform regardless of domain/url skew, ONE
    pass over the input. (``repartitionByRange`` on a size bucket was
    considered and rejected: range partitioning needs a sampling job,
    i.e. a second full read of the input — at 100 TB that is ~50% more
    scan I/O. Giant-blob memory safety comes instead from the Arrow
    batch cap (``arrow.maxRecordsPerBatch``) and straggler smoothing
    from running 2-4× more partitions than cores, which is also what
    AQE prefers.) The size_bucket column stays available via
    :func:`with_size_bucket` for diagnostics/routing of a dedicated
    huge-blob path when a corpus needs one.
    """
    prepared = with_salt(df, 16 * num_partitions, url_col)
    prepared = prepared.repartition(num_partitions, F.col("salt"))
    return prepared.drop("salt")
