"""Structured Streaming tests (file source -> memory sink, availableNow)
plus the batch ExactDedupPipeline."""

from __future__ import annotations

import pytest

from curator_spark.config import ExactDedupConfig
from curator_spark.pipeline import ExactDedupPipeline
from curator_spark.streaming import streaming_exact_dedup, streaming_hourly_agg


@pytest.fixture()
def stream_dir(spark, tmp_path):
    rows = [
        ("c1", "hello world", "2024-01-01 10:00:00"),
        ("c2", "hello world", "2024-01-01 10:05:00"),  # dup of c1 inside watermark
        ("c3", "something else", "2024-01-01 10:10:00"),
        ("c4", "third text", "2024-01-01 11:10:00"),
        ("c5", "something else", "2024-01-01 11:20:00"),  # dup of c3
    ]
    df = spark.createDataFrame(rows, "clip_id string, transcript string, ts_s string").selectExpr(
        "clip_id", "transcript", "cast(ts_s as timestamp) as ts"
    )
    p = str(tmp_path / "stream_src")
    df.coalesce(1).write.parquet(p)
    return p


def test_streaming_exact_dedup(spark, stream_dir, tmp_path):
    src = spark.readStream.schema("clip_id string, transcript string, ts timestamp").parquet(stream_dir)
    out = streaming_exact_dedup(src, fields=("transcript",), watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["clip_id"] for r in spark.sql("select * from dedup_sink").collect()}
    # one survivor per distinct transcript
    assert len(got) == 3
    assert "c4" in got and len(got & {"c1", "c2"}) == 1 and len(got & {"c3", "c5"}) == 1


def test_streaming_hourly_agg(spark, stream_dir, tmp_path):
    src = spark.readStream.schema("clip_id string, transcript string, ts timestamp").parquet(stream_dir)
    ev = src.selectExpr("ts", "'clip' as event_type", "1.5 as value")
    out = streaming_hourly_agg(ev, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("agg_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from agg_sink").collect()
    # append mode only emits windows closed by the watermark; with
    # availableNow the final watermark closes the 10:00 window (3 events)
    by_window = {str(r["window_start"]): r["n_events"] for r in rows}
    assert any(n == 3 for n in by_window.values()) or rows == []


def test_exact_dedup_pipeline(spark, tmp_path):
    rows = [("a", "x x x"), ("b", "x x x"), ("c", "y"), ("d", "y"), ("e", "z")]
    df = spark.createDataFrame(rows, "clip_id string, transcript string")
    pipe = ExactDedupPipeline(spark, ExactDedupConfig(fields=("transcript",)), str(tmp_path / "ck"))
    res = pipe.run(df)
    assert res["num_duplicates"] == 2
    survivors = {r["clip_id"] for r in pipe.remove(df).collect()}
    assert len(survivors) == 3 and "e" in survivors
    # resumable: second run hits checkpoints, same result
    assert pipe.run(df)["num_duplicates"] == 2
