"""web_pages table sources.

The engine's input contract is the ``input_hint`` schema:
``(url string, warc_ts timestamp, html binary, text string, lang
string)`` — an Iceberg table in production (``spark.read.table``),
parquet in this sandbox, plus two deterministic synthetic sources:

* :func:`synthetic_web_pages` — the fixture corpus (HTML + PDFs,
  mojibake/NFD/quirk cases) for correctness tests;
* :func:`web_pages_from_documents` — a *pure-JVM* derivation from the
  driver-provided ``documents.parquet``: each document's text is
  wrapped into a Common-Crawl-style HTML page (nav/header/footer
  boilerplate + article). Because the wrapping is Catalyst
  ``format_string``, it scales to any SF with zero Python, and the
  expected extraction output is SQL-expressible (the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WEB_PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_web_pages(spark: SparkSession, path_or_table: str, fmt: str = "parquet") -> DataFrame:
    """Production reader: Iceberg table name or parquet path."""
    if fmt == "iceberg":
        return spark.read.table(path_or_table)
    return spark.read.format(fmt).load(path_or_table)


def synthetic_web_pages(spark: SparkSession, n_docs: int = 64, seed: int = 42) -> DataFrame:
    """Fixture corpus as a DataFrame (driver-side generation — test
    scale only)."""
    from karanta_ocr_spark.fixtures.gen import corpus_pandas

    return spark.createDataFrame(corpus_pandas(n_docs, seed), schema=WEB_PAGES_SCHEMA)


#: HTML wrapper. %1$s = doc_id, %2$s = article text, %3$s = lang.
#: Boilerplate blocks mirror the fixture generator: high-link-density
#: nav/footer that the extractor must strip; the article h1+p that it
#: must keep. The expected extraction is exactly
#:     'Doc <doc_id>' || '\n' || trim(text)    (when len(trim) ≥ 25)
_HTML_TEMPLATE = (
    "<!DOCTYPE html><html lang=\"%3$s\"><head><title>Doc %1$s</title>"
    "<script>track('%1$s');</script></head><body>"
    "<header><div class=\"brand\">EXAMPLE DOCS PORTAL</div>"
    "<nav><a href=\"/\">Home</a> <a href=\"/news\">News</a> "
    "<a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav></header>"
    "<article><h1>Doc %1$s</h1><p>%2$s</p></article>"
    "<aside><ul><li><a href=\"/r/1\">related one</a></li>"
    "<li><a href=\"/r/2\">related two</a></li></ul></aside>"
    "<footer><p>(c) 2025 docs.example.org <a href=\"/privacy\">Privacy</a></p></footer>"
    "</body></html>"
)

DOCS_URL_PREFIX = "https://docs.example.org/doc/"


def wrap_documents_as_web_pages(docs: DataFrame) -> DataFrame:
    """Wrap a documents-shaped DataFrame (doc_id, text, lang) into the
    input_hint web_pages shape. Pure Catalyst — repartition *before*
    calling this if the upstream has too few splits, so the (cheap but
    per-row) wrapping parallelizes."""
    # HTML-escape the text before interpolation (& first): raw '<'/'&'
    # would parse as markup/entities and break the 'Doc N\n' || trim(text)
    # round-trip the oracle asserts. The extractor's html.parser runs
    # with convert_charrefs=True, so entities decode back to the
    # original characters and the round-trip holds for any corpus.
    escaped = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    return docs.select(
        F.concat(F.lit(DOCS_URL_PREFIX), F.col("doc_id").cast("string")).alias("url"),
        F.to_timestamp(F.lit("2025-01-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.format_string(
                _HTML_TEMPLATE,
                F.col("doc_id").cast("string"),
                escaped,
                F.col("lang"),
            ),
            "UTF-8",
        ).alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def web_pages_from_documents(
    spark: SparkSession, sf_dir: str, num_partitions: int | None = None
) -> DataFrame:
    """documents.parquet → input_hint-shaped web_pages, 100% JVM.

    Deterministic and scale-free: no Python touches the data; the
    html column is a Catalyst format_string over the document text.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if num_partitions:
        docs = docs.repartition(num_partitions)
    return wrap_documents_as_web_pages(docs)
