"""spark-submit entry point: fuzzy dedup over a clips table.

Usage (see tools/submit_example.sh):
    spark-submit --py-files curator_spark.zip tools/run_fuzzy_dedup.py \
        <input_parquet_or_iceberg_table> <checkpoint_root>

Reads the input (Iceberg table name if a catalog is configured, else a
parquet path), runs the checkpointed MinHash->LSH->CC->keep-first
workflow at the reference config, and prints the stage-time/duplicate
metrics as one JSON line (same shape as the reference's
WorkflowRunResult).
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from curator_spark.config import FuzzyDedupConfig
from curator_spark.pipeline import FuzzyDedupPipeline


def main() -> None:
    inp, ckpt = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("curator-spark-fuzzy-dedup").getOrCreate()
    if "/" in inp or inp.endswith(".parquet"):
        df = spark.read.parquet(inp)
    else:  # Iceberg/catalog table name
        df = spark.read.table(inp)
    cfg = FuzzyDedupConfig()  # reference defaults: 24-gram, 20x13, seed 42
    pipe = FuzzyDedupPipeline(spark, cfg, ckpt)
    res = pipe.run(df)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
