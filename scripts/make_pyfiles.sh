#!/usr/bin/env bash
# Build the spark-submit --py-files artifact (pure-python package zip).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/mapping_analysis_spark.zip
zip -qr dist/mapping_analysis_spark.zip mapping_analysis_spark \
    -x '*/__pycache__/*' -x '*.pyc'
echo "built dist/mapping_analysis_spark.zip ($(du -h dist/mapping_analysis_spark.zip | cut -f1))"
