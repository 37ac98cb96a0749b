"""WARC crawl files → the input_hint web_pages table.

Production ingest for Common-Crawl-style input when the upstream is
raw WARC rather than an Iceberg table: ``spark.read.format
("binaryFile")`` lists the crawl segment files, each Arrow batch of
file blobs is parsed by the pure-stdlib ``kernel.warc_mini``, and the
``response`` records come out as ``(url, warc_ts, html, text, lang)``
rows ready for ``run_extraction``.

Scale notes: Common Crawl ships ~1 GB per-record-gzip segment files —
one file is one row into the parse (``binaryFile`` caps at
2 GB/file), and parallelism comes from the number of segment files
(a crawl has ~64k of them), which is exactly how production jobs
consume CC. Parse failures and non-response records become counted
``ok=false``-style rows, never task failures.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Parsed-record schema: web_pages columns plus provenance/diagnostics.
WARC_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_date", StringType()),  # raw ISO 8601 from the record
        StructField("html", BinaryType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("warc_path", StringType()),
        StructField("rec_type", StringType()),
    ]
)


def parse_warc_blobs(
    df: DataFrame, blob_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """(path, blob) rows → one row per WARC record (response records
    carry the HTTP body as ``html``; other types carry NULL html so
    lineage can count them; an unparseable file yields a single
    ``rec_type='error'`` row)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from karanta_ocr_spark.kernel.warc_mini import WarcError, parse_warc

        for pdf in batches:
            rows = {f.name: [] for f in WARC_PAGES_SCHEMA.fields}

            def emit(url, date, html, status, ctype, path, rtype):
                rows["url"].append(url)
                rows["warc_date"].append(date)
                rows["html"].append(html)
                rows["http_status"].append(status)
                rows["content_type"].append(ctype)
                rows["warc_path"].append(path)
                rows["rec_type"].append(rtype)

            for path, blob in zip(pdf[path_col].tolist(), pdf[blob_col].tolist()):
                blob = bytes(blob) if blob is not None else b""
                try:
                    recs = parse_warc(blob)
                except WarcError:
                    emit(None, None, None, None, None, path, "error")
                    continue
                for r in recs:
                    emit(
                        r.url,
                        r.date,
                        # response: HTTP body; conversion (WET): the
                        # extracted text payload. Other types carry no
                        # payload column (counted via rec_type).
                        r.body if r.rec_type in ("response", "conversion") else None,
                        r.http_status,
                        r.content_type,
                        path,
                        r.rec_type,
                    )
            yield pd.DataFrame(rows)

    return df.select(path_col, blob_col).mapInPandas(run, schema=WARC_PAGES_SCHEMA)


def read_warc_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Crawl segment files → parsed record rows (see module notes)."""
    files = spark.read.format("binaryFile").load(path_glob)
    return parse_warc_blobs(files)


def write_wet(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    date: str = "2025-01-01T00:00:00Z",
) -> int:
    """Extraction output → WET segment files (one ``.warc.wet.gz``
    per partition, written partition-local with no driver collection
    — the same sink shape as ``write_markdown``). Together with
    :func:`read_warc_files` this closes the Common Crawl loop:
    WARC in → extraction → WET out.

    The returned record count is EXACT under task retries and
    speculative duplicates: each partition embeds its record count in
    its segment file name (``seg-00007-n123.warc.wet.gz``), a retry
    ``os.replace``s the same partition's file (after removing any
    prior-count name for that partition), and the driver sums the
    counts from a directory listing AFTER the action — unlike a Spark
    accumulator inside ``foreachPartition``, which double-adds on
    retry.

    The post-action listing is only exact when every seg file in the
    directory belongs to THIS run, so any seg file left by a previous
    run (including the retired un-counted ``seg-NNNNN.warc.wet.gz``
    naming, or a run with a different partition count) is removed up
    front — otherwise stale partitions would be silently counted in
    (or, for the old naming, written over but never tallied)."""
    import glob
    import os
    import re

    if os.path.isdir(out_dir):
        for stale in glob.glob(os.path.join(out_dir, "seg-*.warc.wet.gz")):
            os.remove(stale)
        for stale in glob.glob(os.path.join(out_dir, ".seg-*.tmp")):
            os.remove(stale)

    def write_part(rows) -> None:
        import os

        from pyspark import TaskContext

        from karanta_ocr_spark.kernel.warc_mini import build_wet

        pages = [(r[url_col], date, r[text_col] or "") for r in rows]
        if not pages:
            return
        pid = TaskContext.get().partitionId()
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, f".seg-{pid:05d}.tmp")
        with open(tmp, "wb") as f:
            f.write(build_wet(pages))
        # A retry after a partial upstream change could carry a
        # different count for the same partition: drop stale names
        # first so exactly one seg file per partition survives.
        import glob as _glob

        for stale in _glob.glob(
            os.path.join(out_dir, f"seg-{pid:05d}-n*.warc.wet.gz")
        ):
            os.remove(stale)
        os.replace(
            tmp,
            os.path.join(out_dir, f"seg-{pid:05d}-n{len(pages)}.warc.wet.gz"),
        )

    df.select(url_col, text_col).foreachPartition(write_part)
    total = 0
    if os.path.isdir(out_dir):  # every partition empty → no dir, 0 records
        for name in os.listdir(out_dir):
            m = re.fullmatch(r"seg-\d{5}-n(\d+)\.warc\.wet\.gz", name)
            if m:
                total += int(m.group(1))
    return total


def wet_records_to_documents(records: DataFrame) -> DataFrame:
    """Parsed WET (``conversion``) records → a documents-shaped table
    ``(url, warc_ts, text)`` — reading back the sidecar this engine
    (or Common Crawl) wrote, e.g. to resume a downstream pipeline
    from extracted text without re-running extraction."""
    return records.filter(F.col("rec_type") == "conversion").select(
        "url",
        F.to_timestamp(
            F.trim(F.regexp_replace(F.col("warc_date"), "[TZ]", " "))
        ).alias("warc_ts"),
        F.decode(F.col("html"), "UTF-8").alias("text"),
    )


def warc_records_to_web_pages(records: DataFrame) -> DataFrame:
    """Parsed records → the input_hint web_pages shape (200-status
    responses only; ``text``/``lang`` NULL — extraction fills them)."""
    return (
        records.filter(
            (F.col("rec_type") == "response") & (F.col("http_status") == 200)
        )
        .select(
            "url",
            F.to_timestamp(
                F.trim(F.regexp_replace(F.col("warc_date"), "[TZ]", " "))
            ).alias("warc_ts"),
            "html",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


#: CDX-style URL-index schema (the Common Crawl index shape: enough
#: to range-request and inflate ONE record out of a 1 GB segment).
WARC_CDX_SCHEMA = StructType(
    [
        StructField("urlkey", StringType()),
        StructField("cdx_ts", StringType()),  # 14-digit CDX timestamp
        StructField("url", StringType()),
        StructField("warc_path", StringType()),
        StructField("offset", LongType()),
        StructField("length", LongType()),
        StructField("http_status", IntegerType()),
        StructField("rec_type", StringType()),
    ]
)


def warc_cdx_index(
    df: DataFrame, blob_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """(path, blob) segment files → a CDX-style URL index: one row
    per record with its SURT url key, 14-digit timestamp, and the
    ``(offset, length)`` byte span inside the segment (gzip-member
    spans for per-record-gzip files — what a ranged GET needs). This
    is the lookup table the resume/anti-join and targeted re-fetch
    paths consult at corpus scale; parallelism is per segment file,
    like :func:`parse_warc_blobs`."""

    def run(batches: Iterator) -> Iterator:
        import re

        import pandas as pd

        from karanta_ocr_spark.kernel.warc_mini import (
            parse_warc,
            surt_urlkey,
            warc_record_spans,
        )

        for pdf in batches:
            rows = {f.name: [] for f in WARC_CDX_SCHEMA.fields}
            for path, blob in zip(pdf[path_col].tolist(), pdf[blob_col].tolist()):
                blob = bytes(blob) if blob is not None else b""
                for off, ln in warc_record_spans(blob):
                    try:
                        recs = parse_warc(blob[off : off + ln])
                    except Exception:
                        continue
                    for r in recs:
                        rows["urlkey"].append(
                            surt_urlkey(r.url) if r.url else None
                        )
                        rows["cdx_ts"].append(
                            re.sub(r"[^0-9]", "", r.date)[:14] if r.date else None
                        )
                        rows["url"].append(r.url)
                        rows["warc_path"].append(path)
                        rows["offset"].append(off)
                        rows["length"].append(ln)
                        rows["http_status"].append(r.http_status)
                        rows["rec_type"].append(r.rec_type)
            yield pd.DataFrame(rows)

    return df.select(path_col, blob_col).mapInPandas(run, schema=WARC_CDX_SCHEMA)
