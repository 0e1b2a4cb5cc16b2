#!/usr/bin/env bash
# Package the engine and run it THROUGH spark-submit --py-files — the
# north_rule's deployment path.  Local master stands in for the cluster
# manager; on a real cluster only --master/--num-executors change.
set -euo pipefail
cd "$(dirname "$0")/.."
ZIP=/tmp/freemap_tiler_spark.zip
rm -f "$ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('freemap_tiler_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
"
WORK="${1:-$(mktemp -d /tmp/submit_pyr_XXXX)}"
MASTER="${SPARK_SUBMIT_MASTER:-local[8]}"
# SPARK_SUBMIT_EXTRA_CONF: space-separated k=v pairs appended as --conf
# (e.g. "spark.executor.cores=1 spark.cores.max=8" for a standalone
# multi-executor-JVM master)
EXTRA=()
for kv in ${SPARK_SUBMIT_EXTRA_CONF:-}; do EXTRA+=(--conf "$kv"); done
exec "$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')" \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.local.dir=/dev/shm/spark-local \
  "${EXTRA[@]}" \
  --py-files "$ZIP" \
  tools/submit_job.py "$WORK" "${2:-20000}" "${3:-8}"
