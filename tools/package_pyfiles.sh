#!/usr/bin/env bash
# Build the --py-files artifact for spark-submit.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/tsforge_spark.zip
zip -qr dist/tsforge_spark.zip tsforge_spark -x '*__pycache__*'
echo "dist/tsforge_spark.zip"
