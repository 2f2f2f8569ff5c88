"""Bucketed parquet tables: co-located joins without a shuffle.

At 100 TB the dominant cost of the dedup joins (id re-attachment,
removal anti-join, manifest reconciliation) is the exchange of the big
side. Spark's bucketed tables pre-hash the data into a fixed number of
bucket files AT WRITE TIME; two tables bucketed on the same key with
the same bucket count then join with ZERO exchange — the scan itself
reports the hash partitioning and Catalyst drops both Exchange nodes.
This is the Spark-native equivalent of the reference's persisted
shuffle layouts (its LSH/edge caches are written pre-hashed on the
bucket key for exactly this reason, fuzzy/lsh/stage.py:179-183).

Bucketed writes go through the session catalog (``saveAsTable`` —
bucket metadata lives in the metastore, not the parquet footer), so
callers pass a table name; ``path`` pins the files to an external
location. The co-location contract is asserted by
``tests/test_bucketed.py`` on the physical plan, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally per-bucket sorted) parquet
    table. Sorting by the join/group key makes downstream SortMergeJoin
    skip its Sort too (scan -> join, nothing in between)."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (a plain
    ``spark.read.parquet`` on the files would LOSE the bucket metadata
    and silently reintroduce the exchange)."""
    return spark.table(table)


def is_colocated_join_plan(joined: DataFrame) -> bool:
    """True iff the physical plan contains a join but NO Exchange —
    the co-location proof callers can assert on."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan and "Join" in plan
