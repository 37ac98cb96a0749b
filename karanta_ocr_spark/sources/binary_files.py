"""Raw-file sources (reference S1/S3/S4).

The reference globs PDF paths (recursive bench glob,
``karanta/bench/convert.py:183-185``), validates ``%PDF`` magic
(``karanta/pipeline.py:1279``), and accepts explicit manifests
(``karanta/pipeline.py:1267-1298``). Spark-native equivalents:
``binaryFile`` scans with recursive lookup + glob filters, and a
manifest DataFrame join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from karanta_ocr_spark.operators.multimodal import media_kind_expr


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Directory of raw files → ``(url, warc_ts, html, text, lang)``
    web_pages shape (path→url, modificationTime→warc_ts). The
    binaryFile source prunes ``content`` when only metadata is
    selected — cheap listings stay cheap."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


def filter_valid_payloads(df: DataFrame, kinds: tuple[str, ...] = ("pdf", "html")) -> DataFrame:
    """Magic-byte validation filter (reference drops non-%PDF files;
    we keep the kinds the kernel can extract)."""
    return df.withColumn("_kind", media_kind_expr("html")).filter(
        F.col("_kind").isin(*kinds)
    ).drop("_kind")


def apply_manifest(df: DataFrame, manifest: DataFrame, url_col: str = "url") -> DataFrame:
    """Explicit work manifest (reference ``--pdfs`` path lists): keep
    only listed urls — a broadcast-able semi-join."""
    return df.join(F.broadcast(manifest.select(url_col)), on=url_col, how="left_semi")
