#!/usr/bin/env bash
# Run the recipe-bake via spark-submit --py-files (north-rule launch
# path). Packages the engine as a zip, submits scripts/bake_job.py.
#   usage: scripts/spark_submit_bake.sh [master] [n_convs] [shuffle_partitions] [extra bake_job args...]
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER="${1:-local[8]}"
N_CONVS="${2:-100000}"
PARTS="${3:-16}"
shift $(( $# > 3 ? 3 : $# ))
ZIP=/tmp/recipys_spark_pkg.zip
rm -f "$ZIP"
zip -qr "$ZIP" recipys_spark -x '*__pycache__*'
spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="$PARTS" \
  --driver-memory 48g \
  scripts/bake_job.py --convs "$N_CONVS" "$@"
