"""Structured Streaming surfaces: incremental exact dedup + windowed aggs.

The reference is batch-only — its "streaming" is pipelined batch execution
(fern/.../concepts/streaming.mdx), and an incremental LSH index is an
unimplemented TODO (fuzzy/lsh/lsh.py:251). These operators are the
Spark-native incremental path for the same semantics: a clip stream is
deduplicated against everything seen so far with watermark-bounded state,
and event-time tumbling windows aggregate late-arriving data.

Both return a streaming DataFrame; callers attach ``writeStream`` (tests
use the memory sink with ``trigger(availableNow=True)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    fields: tuple = ("transcript",),
    ts_field: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival per content hash (exact-dup semantics of
    exact/identification.py:148-160, incrementally).

    State is bounded by the watermark via ``dropDuplicatesWithinWatermark``
    (Spark >= 3.5): one state row per distinct hash, evicted once the
    event-time watermark passes ``first_seen + watermark``. A duplicate
    arriving later than ``watermark`` after its original is therefore
    re-emitted — the batch pipeline is the backstop for unbounded lookback
    (same layering the reference uses between its streaming executor and
    batch workflows). Plain ``dropDuplicates(subset)`` would NOT evict:
    Spark only bounds dedup state when the event-time column is part of
    the subset."""
    from ..operators.duplicates import exact_hash_key

    # ONE key construction shared with the batch pipeline (length-prefixed
    # injection-proof encoding) so streaming and batch dedup agree
    hashed = stream.withColumn("_content_hash", exact_hash_key(tuple(fields)))
    return hashed.withWatermark(ts_field, watermark).dropDuplicatesWithinWatermark(["_content_hash"])


def streaming_hourly_agg(
    stream: DataFrame,
    ts_field: str = "ts",
    key_field: str = "event_type",
    value_field: str = "value",
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """Event-time tumbling-window aggregation with late-data handling —
    the streaming form of the batch events_hourly_agg query (same groupBy,
    plus watermark)."""
    return (
        stream.withWatermark(ts_field, watermark)
        .groupBy(F.window(F.col(ts_field), window).alias("win"), F.col(key_field))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_field) * 100).cast("long").alias("value_centi"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            key_field,
            "n_events",
            "value_centi",
        )
    )
