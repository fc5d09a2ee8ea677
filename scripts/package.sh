#!/usr/bin/env bash
# Build the --py-files zip for spark-submit deployment.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/dsjs.zip
zip -qr dist/dsjs.zip datasketches_java_spark -x '*__pycache__*'
echo "dist/dsjs.zip:"
unzip -l dist/dsjs.zip | tail -3
