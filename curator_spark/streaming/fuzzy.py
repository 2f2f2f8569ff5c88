"""Streaming fuzzy-dedup candidate generation (incremental MinHash-LSH).

The reference leaves an incremental LSH index as an explicit TODO
(fuzzy/lsh/lsh.py:251 — its streaming executor pipelines batches but the
dedup index is rebuilt per run). This is the Spark-native incremental
path: a clip stream is MinHashed and band-hashed with the SAME kernels
and config as the batch pipeline, then an ``applyInPandasWithState``
operator keyed on the LSH bucket maintains one tiny state row per bucket
(the first-ever member = the bucket's anchor) and emits a candidate edge
``anchor -> member`` for every subsequent arrival in that bucket.

Semantics vs batch: the batch path emits consecutive-pair (path) edges
per bucket; this emits star edges from the stable anchor — identical
connected components, O(1) state per bucket instead of the member list.
Connected components / removal stay periodic batch jobs over the
accumulated edge stream (the same batch/streaming layering the reference
uses; CC is inherently a multi-pass fixpoint).

State bound: ``state_ttl_sec`` arms a processing-time timeout per bucket;
an evicted bucket's next member becomes a fresh anchor, so near-dups
arriving further apart than the TTL land in separate components — the
bounded-lookback tradeoff, with the batch pipeline as the backstop
(mirrors streaming_exact_dedup's watermark contract). With
``event_time_field`` the bound is EVENT-time instead: the stream gets a
watermark, the event-time column rides through the MinHash/LSH stages,
and each bucket's timeout fires when the watermark passes (max event
time seen) + TTL — late data within the watermark delay extends state
correctly, aligning with streaming_exact_dedup's event-time semantics.

Node ids are ``xxhash64(clip_id)`` so edges are CC-ready longs without a
stateful id service; at 10^12 rows the 64-bit birthday collision count
(~n^2/2^65) merges a negligible number of unrelated pairs — acceptable
for candidate generation, and the batch pipeline's exact ids remain the
system of record.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..config import FuzzyDedupConfig
from ..operators.lsh import lsh_bucket_ids
from ..operators.minhash_stage import minhash_stage

EDGE_SCHEMA = StructType(
    [StructField("src", LongType(), False), StructField("dst", LongType(), False)]
)
_STATE_SCHEMA = StructType([StructField("anchor", LongType(), False)])


def streaming_lsh_edges(
    stream: DataFrame,
    cfg: FuzzyDedupConfig,
    id_field: str = "clip_id",
    text_field: str | None = None,
    state_ttl_sec: int | None = None,
    event_time_field: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """clip stream -> candidate edge stream (src, dst), src = bucket anchor.

    Plan: mapInPandas (signatures, batch kernel) -> mapInPandas (band
    hashes) -> one shuffle on (_bh1, _bh2) -> applyInPandasWithState.

    ``event_time_field`` (with ``state_ttl_sec``) switches the state bound
    from processing-time TTL to event-time: buckets are evicted when the
    watermark (``watermark_delay`` behind max event time) passes the
    bucket's last event time + TTL.
    """
    text_field = text_field or cfg.text_field
    use_event_time = event_time_field is not None
    if use_event_time:
        stream = stream.withWatermark(event_time_field, watermark_delay)
        nodes = stream.select(
            F.xxhash64(F.col(id_field)).alias("_nid"),
            F.col(event_time_field).alias("_ts"),
            F.col(text_field).alias(text_field),
        )
        pt = ("_ts",)
    else:
        nodes = stream.select(
            F.xxhash64(F.col(id_field)).alias("_nid"), F.col(text_field).alias(text_field)
        )
        pt = ()
    sigs = minhash_stage(nodes, cfg, text_field=text_field, id_field="_nid", passthrough=pt)
    buckets = lsh_bucket_ids(sigs, cfg, id_field="_nid", passthrough=pt)

    if use_event_time and state_ttl_sec:
        timeout = GroupStateTimeout.EventTimeTimeout
    elif state_ttl_sec:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout

    def emit_edges(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        members: list = []
        max_ts_ms = None
        for pdf in pdfs:
            members.extend(int(v) for v in pdf["_nid"])
            if use_event_time and len(pdf):
                m = pd.Timestamp(pdf["_ts"].max()).value // 1_000_000
                max_ts_ms = m if max_ts_ms is None else max(max_ts_ms, m)
        if not members:
            return
        members = sorted(set(members))
        if state.exists:
            (anchor,) = state.get
        else:
            anchor = members[0]
            state.update((anchor,))
        if use_event_time and state_ttl_sec:
            # must be strictly above the current watermark or Spark rejects
            target = max_ts_ms + state_ttl_sec * 1000
            state.setTimeoutTimestamp(max(target, state.getCurrentWatermarkMs() + 1))
        elif state_ttl_sec:
            state.setTimeoutDuration(state_ttl_sec * 1000)
        edges = [(anchor, m) for m in members if m != anchor]
        if edges:
            yield pd.DataFrame(edges, columns=["src", "dst"])

    return (
        buckets.groupBy("_bh1", "_bh2")
        .applyInPandasWithState(
            emit_edges,
            outputStructType=EDGE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
