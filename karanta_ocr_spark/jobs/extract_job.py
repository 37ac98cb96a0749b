"""spark-submit entry point for the extraction pipeline.

Cluster usage (the deployment shape of the north rule)::

    zip -r karanta_ocr_spark.zip karanta_ocr_spark
    spark-submit \\
      --master <cluster> \\
      --py-files karanta_ocr_spark.zip \\
      karanta_ocr_spark/jobs/extract_job.py \\
      --input <parquet path or iceberg table> \\
      --output s3://bucket/extractions \\
      --metrics s3://bucket/extraction_metrics \\
      --format parquet|iceberg --mode fused

Re-running with the same ``--output`` resumes: committed urls are
anti-joined away (snapshot resume). Local smoke::

    python -m karanta_ocr_spark.jobs.extract_job \\
      --synthetic 64 --output /tmp/extr --metrics /tmp/extr_metrics
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="karanta_ocr_spark extraction job")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="web_pages parquet path or Iceberg table")
    src.add_argument("--synthetic", type=int, metavar="N",
                     help="use the N-doc synthetic fixture corpus (smoke)")
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--output", required=True)
    p.add_argument("--metrics", default=None)
    p.add_argument("--mode", default="fused", choices=["fused", "staged"])
    p.add_argument("--num-partitions", type=int, default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--repartition-input", action="store_true",
                   help="salt-shuffle the input first (skewed/few splits)")
    p.add_argument("--max-page-error-rate", type=float, default=0.004)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import SparkSession

    from karanta_ocr_spark.pipeline import ExtractConfig, run_extraction
    from karanta_ocr_spark.sources.web_pages import read_web_pages, synthetic_web_pages

    spark = SparkSession.builder.appName("karanta-extract").getOrCreate()
    if args.synthetic:
        web = synthetic_web_pages(spark, args.synthetic)
    else:
        web = read_web_pages(spark, args.input, args.format)

    t0 = time.time()
    docs = run_extraction(
        spark,
        web,
        cfg=ExtractConfig(max_page_error_rate=args.max_page_error_rate),
        num_partitions=args.num_partitions,
        output_path=args.output,
        metrics_path=args.metrics,
        resume=not args.no_resume,
        mode=args.mode,
        repartition_input=args.repartition_input,
    )
    n = docs.count()
    print(f"extraction complete: {n} documents committed at {args.output} "
          f"in {time.time() - t0:.1f}s", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
