"""Structured Streaming variant of the extraction pipeline.

The reference is strictly batch (static work queue,
``karanta/pipeline.py:1265,1357``) and so is the north rule, but a
continuously-crawled corpus lands as a stream of files; this wires
the SAME fused kernel behind ``readStream`` so nothing about the
extraction semantics changes — only the source/sink:

    web_pages files → readStream → mapInPandas(fused kernel)
      → filter(ok) → writeStream parquet + checkpoint

Exactly-once: file-source tracking + checkpointed offsets + the
parquet sink's transactional commit. Restart with the same
checkpoint dir and it resumes — the streaming analog of the batch
anti-join resume. ``trigger(availableNow=True)`` turns it into an
incremental batch job (test path; also the production catch-up mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from karanta_ocr_spark.pipeline import (
    ExtractConfig,
    OUTPUT_COLS,
    extract_documents_fused,
)
from karanta_ocr_spark.sources.web_pages import WEB_PAGES_SCHEMA


def stream_web_pages(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = 64,
) -> DataFrame:
    reader = (
        spark.readStream.schema(WEB_PAGES_SCHEMA)
        .format("parquet")
        .option("path", input_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load()


def extract_stream(
    stream: DataFrame, cfg: ExtractConfig | None = None
) -> DataFrame:
    """The same fused kernel — mapInPandas composes with streaming
    DataFrames unchanged (stateless per-row transform)."""
    from pyspark.sql import functions as F

    docs = extract_documents_fused(stream, cfg or ExtractConfig())
    return docs.filter(F.col("ok")).select(*OUTPUT_COLS)


def run_streaming_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    cfg: ExtractConfig | None = None,
):
    """Start (or resume, given the same checkpoint_dir) the streaming
    extraction. Returns the StreamingQuery."""
    docs = extract_stream(stream_web_pages(spark, input_dir), cfg)
    writer = (
        docs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
