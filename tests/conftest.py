from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("karanta-ocr-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    from karanta_ocr_spark.fixtures.gen import generate_web_pages

    return generate_web_pages(64, seed=42)


@pytest.fixture(scope="session")
def golden_docs(corpus_rows):
    """Single-process kernel run over the corpus — the golden the
    Spark pipeline must match byte-identically per url."""
    from karanta_ocr_spark.kernel.assemble import assemble_document
    from karanta_ocr_spark.kernel.extract import extract_document

    out = {}
    for r in corpus_rows:
        doc = assemble_document(r["url"], extract_document(r["url"], r["html"]))
        if doc is not None:
            out[r["url"]] = doc
    return out
