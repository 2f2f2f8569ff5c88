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


def test_streaming_dedup_state_eviction(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics: a duplicate inside the
    watermark window is dropped; once the watermark passes first_seen +
    watermark the state row is evicted and a late duplicate re-emits."""
    schema = "clip_id string, transcript string, ts timestamp"
    src_dir = tmp_path / "evict_src"
    src_dir.mkdir()

    def write_batch(name: str, rows: list) -> None:
        df = spark.createDataFrame(rows, "clip_id string, transcript string, ts_s string").selectExpr(
            "clip_id", "transcript", "cast(ts_s as timestamp) as ts"
        )
        df.coalesce(1).write.parquet(str(src_dir / name))

    import time

    # batch 1: original + in-window duplicate
    write_batch("b1", [
        ("c1", "hello", "2024-01-01 10:00:00"),
        ("c2", "hello", "2024-01-01 10:30:00"),
    ])
    time.sleep(1.1)  # distinct mtimes => deterministic file-batch order
    # batch 2: advances the watermark to 12:00 (> 10:30 + 1h)
    write_batch("b2", [("c3", "advance", "2024-01-01 13:00:00")])
    time.sleep(1.1)
    # batch 3: runs with watermark 12:00 — the "hello" state row is
    # evicted DURING this batch (eviction lags the watermark by one batch)
    write_batch("b3", [("c3b", "advance2", "2024-01-01 13:01:00")])
    time.sleep(1.1)
    # batch 4: duplicate past the watermark -> re-emitted (state evicted)
    write_batch("b4", [("c4", "hello", "2024-01-01 13:05:00")])

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir) + "/*")
    )
    out = streaming_exact_dedup(src, fields=("transcript",), watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("evict_sink")
        .option("checkpointLocation", str(tmp_path / "ck_evict"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["clip_id"] for r in spark.sql("select * from evict_sink").collect()}
    assert "c1" in got and "c3" in got
    assert "c2" not in got  # in-window duplicate dropped
    assert "c4" in got  # past-watermark duplicate re-emitted (state bounded)


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


def test_streaming_lsh_edges_incremental(spark, tmp_path):
    """Incremental MinHash-LSH candidate edges via applyInPandasWithState:
    near-dups arriving in DIFFERENT microbatches still join one component
    (the bucket anchor persists in state); uniques emit nothing."""
    from curator_spark.config import FuzzyDedupConfig
    from curator_spark.operators import connected_components
    from curator_spark.streaming import streaming_lsh_edges

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows_b1 = [
        ("A1", base),
        ("A2", base + " ok"),  # near-dup of A1
        ("B", "completely different words that never overlap with anything"),
    ]
    rows_b2 = [
        ("A3", base + " yes"),  # near-dup of A1, later batch
        ("C", "another entirely unrelated transcript with novel content"),
    ]
    src_dir = tmp_path / "lsh_src"
    src_dir.mkdir()
    import time as _t

    for name, rows in (("b1", rows_b1), ("b2", rows_b2)):
        spark.createDataFrame(rows, "clip_id string, transcript string").coalesce(1).write.parquet(
            str(src_dir / name)
        )
        _t.sleep(1.1)

    cfg = FuzzyDedupConfig(char_ngrams=5, num_bands=10, minhashes_per_band=1)
    stream = (
        spark.readStream.schema("clip_id string, transcript string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir) + "/*")
    )
    edges = streaming_lsh_edges(stream, cfg)
    q = (
        edges.writeStream.format("memory")
        .queryName("lsh_edges_sink")
        .option("checkpointLocation", str(tmp_path / "ck_lsh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    edge_rows = spark.sql("select * from lsh_edges_sink")
    assert edge_rows.count() > 0
    comps = connected_components(edge_rows)
    from pyspark.sql import functions as F

    ids = {
        r["clip_id"]: r["_nid"]
        for r in spark.createDataFrame(rows_b1 + rows_b2, "clip_id string, transcript string")
        .select("clip_id", F.xxhash64("clip_id").alias("_nid"))
        .collect()
    }
    labels = {r[0]: r[1] for r in comps.collect()}
    # A1/A2/A3 share one component across batches
    assert labels[ids["A1"]] == labels[ids["A2"]] == labels[ids["A3"]]
    # uniques never entered any edge
    assert ids["B"] not in labels and ids["C"] not in labels


def test_streaming_lsh_edges_event_time(spark, tmp_path):
    """Event-time variant: the watermark (not wall clock) bounds bucket
    state. Near-dups within the TTL window join one component even when
    one arrives in a later microbatch with a slightly-late timestamp;
    once the watermark passes last-seen + TTL the bucket re-anchors, so a
    far-future near-dup starts a fresh component."""
    import time as _t

    from pyspark.sql import functions as F

    from curator_spark.config import FuzzyDedupConfig
    from curator_spark.streaming import streaming_lsh_edges

    base = "the quick brown fox jumps over the lazy dog again and again today"
    schema = "clip_id string, transcript string, ts_s string"
    src_dir = tmp_path / "lsh_et_src"
    src_dir.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).selectExpr(
            "clip_id", "transcript", "cast(ts_s as timestamp) as ts"
        ).coalesce(1).write.parquet(str(src_dir / name))
        _t.sleep(1.1)

    # b1: anchor at 10:00; b2: near-dup LATE by 3 min (within 10-min
    # watermark delay) -> same bucket state alive -> edge to anchor
    write_batch("b1", [("A1", base, "2024-01-01 10:00:00")])
    write_batch("b2", [("A2", base + " ok", "2024-01-01 09:57:00")])
    # b3: advances the watermark far past 10:00 + TTL (1h)
    write_batch("b3", [("X", "completely different filler words here", "2024-01-01 15:00:00")])
    # b3b: a trigger where the A-bucket receives NO data while the
    # watermark (14:50) exceeds its timeout (10:57) -> state evicted
    # (timeouts only fire for data-less groups, per FlatMapGroupsWithState)
    write_batch("b3b", [("Y", "more unrelated filler to tick the clock", "2024-01-01 15:05:00")])
    # b4: near-dup at 15:01 -> bucket re-anchors at A3: edge A3->A4 only
    write_batch("b4", [("A3", base, "2024-01-01 15:01:00"), ("A4", base + " ok", "2024-01-01 15:01:30")])

    cfg = FuzzyDedupConfig(char_ngrams=5, num_bands=10, minhashes_per_band=1)
    stream = (
        spark.readStream.schema("clip_id string, transcript string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir) + "/*")
    )
    edges = streaming_lsh_edges(
        stream, cfg, state_ttl_sec=3600, event_time_field="ts", watermark_delay="10 minutes"
    )
    q = (
        edges.writeStream.format("memory")
        .queryName("lsh_et_sink")
        .option("checkpointLocation", str(tmp_path / "ck_lsh_et"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    ids = {
        c: r
        for c, r in spark.createDataFrame(
            [("A1",), ("A2",), ("A3",), ("A4",)], "clip_id string"
        ).select("clip_id", F.xxhash64("clip_id").alias("n")).toPandas().itertuples(index=False)
    }
    got = {(r["src"], r["dst"]) for r in spark.sql("select * from lsh_et_sink").collect()}
    norm = {tuple(sorted(p)) for p in got}
    # in-window late near-dup joined the original anchor
    assert tuple(sorted((ids["A1"], ids["A2"]))) in norm
    # post-eviction pair re-anchored among themselves, NOT to A1
    assert tuple(sorted((ids["A3"], ids["A4"]))) in norm
    assert tuple(sorted((ids["A1"], ids["A3"]))) not in norm
    assert tuple(sorted((ids["A1"], ids["A4"]))) not in norm
