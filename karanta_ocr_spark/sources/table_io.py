"""Table IO seam: Iceberg when the runtime has it, parquet otherwise.

The north rule's input is "an Iceberg table of Common-Crawl-style web
pages". This sandbox ships no Iceberg runtime jar
(``spark.read.format('iceberg')`` raises DATA_SOURCE_NOT_FOUND), so
every pipeline seam goes through this module: on a cluster with
``iceberg-spark-runtime`` on the classpath the SAME calls read/write
Iceberg tables (transactional snapshot commits, partition evolution,
the snapshot ids our resume path keys on); here they fall back to
parquet directories, whose atomic ``_SUCCESS``-committed writes give
the same append/resume semantics the tests exercise (the resume
anti-join never needed more than "committed rows are readable,
uncommitted are invisible").

Detection is one cached probe of the DataSource registry — no
import-try of Python packages (Iceberg's Spark integration is
JVM-side only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_HAS_ICEBERG: bool | None = None


def has_iceberg(spark: SparkSession) -> bool:
    """True when the JVM can resolve the ``iceberg`` data source.

    ``DataSource.lookupDataSource``'s only signature is
    ``(String, SQLConf)`` (spark-sql 4.x) — passing the session's
    ``SQLConf`` matters: with a ``SparkConf`` Py4J raises a signature
    error on EVERY call and the probe would report False even on an
    Iceberg-equipped cluster. Only a resolution failure (the class
    genuinely absent from the classpath) means "no Iceberg"; any
    other Py4J error is a probe bug and propagates instead of being
    silently swallowed into the parquet fallback.
    """
    global _HAS_ICEBERG
    if _HAS_ICEBERG is None:
        try:
            spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
                "iceberg",
                spark._jvm.org.apache.spark.sql.internal.SQLConf.get(),
            )
            _HAS_ICEBERG = True
        except Exception as exc:  # Py4J wraps the JVM throwable's text
            msg = str(exc)
            if (
                "DATA_SOURCE_NOT_FOUND" in msg
                or "ClassNotFoundException" in msg
                or "Failed to find" in msg
            ):
                _HAS_ICEBERG = False
            else:
                raise
    return _HAS_ICEBERG


def table_format(spark: SparkSession) -> str:
    return "iceberg" if has_iceberg(spark) else "parquet"


def write_table(
    df: DataFrame, path: str, mode: str = "append", fmt: str = "auto"
) -> None:
    """Transactionally committed table write (Iceberg snapshot commit
    or parquet job commit — both all-or-nothing per call)."""
    if fmt == "auto":
        fmt = table_format(df.sparkSession)
    df.write.format(fmt).mode(mode).save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "auto") -> DataFrame:
    if fmt == "auto":
        fmt = table_format(spark)
    return spark.read.format(fmt).load(path)
