#!/usr/bin/env bash
# Build the --py-files zip for spark-submit (north_rule: "launched via
# spark-submit --py-files").
set -euo pipefail
cd "$(dirname "$0")/.."
rm -f lams.zip
zip -qr lams.zip logdata_anomaly_miner_spark -x '*__pycache__*'
echo "wrote lams.zip ($(du -h lams.zip | cut -f1))"
