#!/bin/bash
# North-rule execution shape: the engine ships to executors as
# --py-files splade_spark.zip (no repo checkout on the workers).
# Builds a tiny index and runs a pruned query end-to-end; prints
# SMOKE_RESULT {...} and exits nonzero on failure.
set -e
cd "$(dirname "$0")/.."
python scripts/make_pyfiles_zip.py
exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "${SPARK_MASTER:-local[8]}" \
  --py-files splade_spark.zip \
  scripts/submit_smoke_job.py
