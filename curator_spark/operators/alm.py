"""ALM training-window stages (Spark analogs of the reference's
``stages/audio/alm/alm_data_builder.py`` ``ALMDataBuilderStage`` and
``alm_data_overlap.py`` ``ALMDataOverlapStage``).

Both reference stages process ONE audio file's entry dict at a time
inside a Ray actor; the parallel unit is the file. The Spark shape is
therefore ``applyInPandas`` grouped on ``audio_id``: Catalyst hashes the
corpus across executors by file, each group runs the pure-python kernel
(``kernels/alm.py``) over that file's bounded segment list, and the
windows fan back out as ordinary rows. No driver-side state, no
collect — the plan is a single shuffle on ``audio_id`` and scales with
file count.

Input segment schema (one row per transcript segment):
``audio_id string, sample_rate int, seg_idx int, start double,
end double, speaker string, bandwidth int, text string,
words array<struct<word string, start double, end double>>``
(``words`` may be null; it is only consumed by truncation).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..kernels.alm import STAT_FIELDS, build_alm_windows, filter_window_overlaps

WINDOWS_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("window_start", DoubleType(), False),
        StructField("window_end", DoubleType(), False),
        StructField("num_segments", IntegerType(), False),
        StructField("speaker_durations", ArrayType(DoubleType()), False),
        StructField("seg_starts", ArrayType(DoubleType()), False),
        StructField("seg_ends", ArrayType(DoubleType()), False),
        StructField("seg_speakers", ArrayType(StringType()), False),
        StructField("seg_texts", ArrayType(StringType()), False),
    ]
)

STATS_SCHEMA = StructType(
    [StructField("audio_id", StringType(), False)]
    + [StructField(f, DoubleType(), False) for f in STAT_FIELDS]
    + [StructField("truncation_events", IntegerType(), False)]
)


def _group_to_segments(pdf: pd.DataFrame) -> list[dict]:
    pdf = pdf.sort_values("seg_idx")
    segs = []
    for row in pdf.itertuples(index=False):
        words = getattr(row, "words", None)
        segs.append(
            {
                "start": float(row.start),
                "end": float(row.end),
                "speaker": row.speaker,
                "bandwidth": None if pd.isna(row.bandwidth) else int(row.bandwidth),
                "text": row.text,
                "words": (
                    [
                        {
                            "word": w["word"],
                            "start": float(w["start"]),
                            "end": float(w["end"]),
                        }
                        for w in words
                    ]
                    if words is not None and len(words)
                    else None
                ),
            }
        )
    return segs


def build_windows(
    segments: DataFrame,
    target_window_duration: float = 120.0,
    tolerance: float = 0.1,
    min_bandwidth: int = 8000,
    min_sample_rate: int = 16000,
    min_speakers: int = 2,
    max_speakers: int = 5,
    truncation: bool = True,
) -> DataFrame:
    """One output row per accepted training window (the reference entry's
    ``windows`` list, fanned out). Segment payloads come back as parallel
    arrays rather than nested structs to keep the Arrow exchange flat."""

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        aid = pdf["audio_id"].iloc[0]
        sr = int(pdf["sample_rate"].iloc[0])
        windows, _stats, _tr = build_alm_windows(
            _group_to_segments(pdf),
            sr,
            target_window_duration=target_window_duration,
            tolerance=tolerance,
            min_bandwidth=min_bandwidth,
            min_sample_rate=min_sample_rate,
            min_speakers=min_speakers,
            max_speakers=max_speakers,
            truncation=truncation,
        )
        rows = []
        for i, w in enumerate(windows):
            segs = w["segments"]
            rows.append(
                {
                    "audio_id": aid,
                    "window_idx": i,
                    "window_start": segs[0]["start"],
                    "window_end": segs[-1]["end"],
                    "num_segments": len(segs),
                    "speaker_durations": w["speaker_durations"],
                    "seg_starts": [s["start"] for s in segs],
                    "seg_ends": [s["end"] for s in segs],
                    "seg_speakers": [s["speaker"] for s in segs],
                    "seg_texts": [s["text"] for s in segs],
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in WINDOWS_SCHEMA.fields])

    return segments.groupBy("audio_id").applyInPandas(per_file, WINDOWS_SCHEMA)


def builder_stats(
    segments: DataFrame,
    target_window_duration: float = 120.0,
    tolerance: float = 0.1,
    min_bandwidth: int = 8000,
    min_sample_rate: int = 16000,
    min_speakers: int = 2,
    max_speakers: int = 5,
    truncation: bool = True,
) -> DataFrame:
    """One row per audio file with the reference's ``BuilderStats``
    counters (segment-loss attribution) plus ``truncation_events``."""

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        aid = pdf["audio_id"].iloc[0]
        sr = int(pdf["sample_rate"].iloc[0])
        _w, stats, truncs = build_alm_windows(
            _group_to_segments(pdf),
            sr,
            target_window_duration=target_window_duration,
            tolerance=tolerance,
            min_bandwidth=min_bandwidth,
            min_sample_rate=min_sample_rate,
            min_speakers=min_speakers,
            max_speakers=max_speakers,
            truncation=truncation,
        )
        row = {"audio_id": aid, "truncation_events": truncs}
        row.update({f: float(stats[f]) for f in STAT_FIELDS})
        return pd.DataFrame([row], columns=[f.name for f in STATS_SCHEMA.fields])

    return segments.groupBy("audio_id").applyInPandas(per_file, STATS_SCHEMA)


def overlap_filter(
    windows: DataFrame,
    overlap_percentage: int = 0,
    target_duration: float = 120.0,
) -> DataFrame:
    """Drop windows whose overlap with a neighbor meets the threshold,
    keeping the one closer to ``target_duration`` (ALMDataOverlapStage).

    Accepts any frame carrying ``audio_id``, ``window_start``,
    ``window_end``; surviving rows pass through with all their columns.
    """
    if not 0 <= overlap_percentage <= 100:
        raise ValueError(f"overlap_percentage must be 0-100, got {overlap_percentage}")
    if target_duration <= 0:
        raise ValueError("target_duration must be positive")
    threshold = overlap_percentage / 100.0
    schema = windows.schema
    cols = [f.name for f in schema.fields]

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        spans = list(
            zip(pdf["window_start"].astype(float), pdf["window_end"].astype(float))
        )
        kept = filter_window_overlaps(spans, threshold, target_duration)
        return pdf.iloc[kept][cols]

    return windows.groupBy("audio_id").applyInPandas(per_file, schema)


def filtered_duration(windows: DataFrame) -> DataFrame:
    """Per-audio total surviving duration (the overlap stage's
    ``filtered_dur``) — a plain aggregate, no UDF."""
    return windows.groupBy("audio_id").agg(
        F.sum(F.col("window_end") - F.col("window_start")).alias("filtered_dur"),
        F.count("*").alias("num_windows"),
    )
