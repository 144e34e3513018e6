#!/usr/bin/env bash
# Package the engine and launch the crawl via spark-submit --py-files.
# All args pass through to scripts/crawl_job.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=$(mktemp -u /tmp/cinescrapers_spark.XXXX.zip)
(cd "$REPO" && zip -qr "$ZIP" cinescrapers_spark -x '*__pycache__*')
MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_SHUFFLE:-64}" \
  --py-files "$ZIP" \
  "$REPO/scripts/crawl_job.py" "$@"
