#!/usr/bin/env bash
# Build the --py-files artifact for cluster submission.
#   ./scripts/package.sh            -> dist/jsonschemaparse_spark.zip
# Submit:
#   spark-submit --py-files dist/jsonschemaparse_spark.zip \
#       scripts/run_validation_job.py \
#       --input s3://bucket/webpages --rules rules.json --output s3://bucket/report
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/jsonschemaparse_spark.zip
zip -qr dist/jsonschemaparse_spark.zip jsonschemaparse_spark -x '*__pycache__*'
echo "dist/jsonschemaparse_spark.zip"
unzip -l dist/jsonschemaparse_spark.zip | tail -2
