"""SparkSession factory with the configs this engine assumes.

Designed for a 1000-executor cluster reading 100 TB; tested on local[N].
AQE handles runtime coalescing/skew; explicit shuffle-partition counts are
still set per stage by the pipeline (north rule: explicit tuning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def scratch_dir() -> str:
    """Scratch root for benchmark checkpoints. NOTE: measured on this
    sandbox, tmpfs (/dev/shm) is SLOWER than disk for Spark scratch —
    tmpfs pages hit the host's pathologically slow page-allocation path,
    while disk writes are absorbed by page cache. Default stays /tmp."""
    return os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp")


def get_spark(
    master: str | None = None,
    app_name: str = "curator-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    if shuffle_partitions is None:
        # local[N] -> N; on a real cluster callers pass an explicit value
        # sized to ~2-3x total cores
        # local[N] and local[N,maxFailures] are both valid Spark syntax —
        # take the thread count before any comma
        ncores = master[6:-1].split(",")[0] if master.startswith("local[") else "32"
        shuffle_partitions = 32 if ncores == "*" else max(int(ncores), 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("CURATOR_SPARK_DRIVER_MEM", "64g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        # Pinned OFF at build time: Spark's UnionBase.rewriteConstraints
        # crashes ("key not found: dst#N") when self-unions over shared
        # window/UDF-derived attributes are optimized under downstream
        # joins (salted LSH edges, CC large-star rounds). Constraint
        # propagation adds nothing to this engine's long-column join/agg
        # plans (no NOT NULL inference worth having), and pinning it here
        # beats flipping it around individual actions, which races on a
        # shared session.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # Measured on this host (twice, from independent directions): N
        # resident reused python workers make every SUBSEQUENT pure-JVM
        # shuffle stage in the same JVM ~5-8x slower at higher core
        # counts (edges after a UDF stage: 76 s at 8 cores vs 14.5 s at 2;
        # with reuse off: scales normally). Likely memory-fault contention
        # on a ballooned host. Per-task spawn costs ~100-300 ms/task —
        # negligible against Arrow-batch UDF work. Revisit on real
        # clusters with non-ballooned executor memory.
        .config("spark.python.worker.reuse", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
