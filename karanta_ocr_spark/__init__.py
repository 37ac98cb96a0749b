"""karanta_ocr_spark — a PySpark-native document→text extraction engine.

A from-scratch reimplementation of the extraction semantics of
The-African-Research-Collective/karanta-ocr (reference snapshot at
/root/reference, cited per-function as ``file:line``) as a batch
DataFrame pipeline over Common-Crawl-style web-page tables
``(url, warc_ts, html binary, text, lang)``.

Layout
------
``kernel/``     pure-Python, Spark-free extraction kernel (unit-tested,
                golden-tested; the single source of truth for semantics).
``fixtures/``   deterministic synthetic corpus + golden generators.
``pipeline.py`` the Spark pipeline (mapInPandas kernel wrapper, JVM-side
                assembly, lineage/metrics, snapshot resume).
``operators/``  large-scale training-data ops (dedup, similarity, text
                analysis) as DataFrame compositions.
``functions/``  reusable column expressions.
``sources/``    table readers (parquet now, Iceberg-ready).
``plans/``      partitioning / skew / size-bucket strategies.
"""

__version__ = "0.1.0"
