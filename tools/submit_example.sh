#!/usr/bin/env bash
# Cluster deployment example (north rule: spark-submit --py-files on a
# multi-executor cluster). Packages curator_spark as a zip and submits the
# fuzzy-dedup job; on a real cluster swap --master local[32] for
# yarn/k8s and size executors + shuffle partitions to the data.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

ZIP=/tmp/curator_spark.zip
rm -f "$ZIP"
python -c "
import zipfile, pathlib
with zipfile.ZipFile('$ZIP', 'w') as z:
    for p in pathlib.Path('curator_spark').rglob('*.py'):
        z.write(p, p)
print('packaged', '$ZIP')
"

INPUT=${1:?usage: submit_example.sh <input_parquet_or_iceberg_table> <checkpoint_root>}
CKPT=${2:?}

spark-submit \
  --master "${SPARK_MASTER:-local[32]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  tools/run_fuzzy_dedup.py "$INPUT" "$CKPT"

# Ingestion example — plan + download + parse one corpus source into
# parquet (same zip; network via urllib or --fetcher wget):
#   spark-submit --master yarn --py-files "$ZIP" tools/run_ingest.py \
#     cc-news 2024-01 2024-03 hdfs:///warc-cache /data/ccnews.parquet
