"""Bucketed co-located joins: the physical plan must lose BOTH
Exchanges when two tables share bucketing on the join key."""

from __future__ import annotations

import pytest


@pytest.mark.slow
class TestBucketedJoin:
    def test_join_without_exchange(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from curator_spark.io.bucketed import (
            is_colocated_join_plan,
            read_bucketed,
            write_bucketed,
        )

        left = spark.range(0, 5000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 97).alias("score")
        )
        right = spark.range(0, 5000, 2).select(
            F.col("id").alias("doc_id"), F.lit("k").alias("tag")
        )
        write_bucketed(left, "t_bl", "doc_id", 8, sort_cols="doc_id",
                       path=str(tmp_path / "bl"))
        write_bucketed(right, "t_br", "doc_id", 8, sort_cols="doc_id",
                       path=str(tmp_path / "br"))
        try:
            a = read_bucketed(spark, "t_bl")
            b = read_bucketed(spark, "t_br")
            # hint('merge'): at this toy size Spark would broadcast (and
            # mark the buckets unused); force the SortMergeJoin that
            # bucket co-location exists to serve
            joined = a.hint("merge").join(b.hint("merge"), "doc_id")
            # the whole point: no shuffle on either side
            assert is_colocated_join_plan(joined), (
                joined._jdf.queryExecution().executedPlan().toString()[:2000]
            )
            assert joined.count() == 2500

            # control: the same join against a NON-bucketed copy exchanges
            plain = spark.read.parquet(str(tmp_path / "br"))
            control = a.hint("merge").join(plain.hint("merge"), "doc_id")
            assert not is_colocated_join_plan(control)

            # aggregation on the bucket key also skips the exchange
            agg = a.groupBy("doc_id").agg(F.sum("score").alias("s"))
            plan = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
        finally:
            spark.sql("DROP TABLE IF EXISTS t_bl")
            spark.sql("DROP TABLE IF EXISTS t_br")

    def test_validation(self, spark, tmp_path):
        from curator_spark.io.bucketed import write_bucketed

        df = spark.range(3)
        with pytest.raises(ValueError):
            write_bucketed(df, "t_bad", "id", 0)
