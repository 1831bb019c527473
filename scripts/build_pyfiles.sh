#!/usr/bin/env bash
# Package the engine for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/engine.zip
zip -qr dist/engine.zip hdfs_anomaly_detection_spark -x '*__pycache__*'
echo "dist/engine.zip:"
unzip -l dist/engine.zip | tail -3
