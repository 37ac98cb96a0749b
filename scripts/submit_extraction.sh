#!/usr/bin/env bash
# Package the engine and spark-submit the extraction job
# (north rule: "run via spark-submit --py-files on a multi-executor
# cluster"). All args after -- pass through to extract_job.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${SPARK_MASTER:-local[32]}"

cd "$REPO"
rm -f /tmp/karanta_ocr_spark.zip
zip -qr /tmp/karanta_ocr_spark.zip karanta_ocr_spark -x '*__pycache__*'

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=256 \
  --py-files /tmp/karanta_ocr_spark.zip \
  "$REPO/karanta_ocr_spark/jobs/extract_job.py" \
  "$@"
