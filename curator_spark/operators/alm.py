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
    BinaryType,
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


def drop_overlapping_segments(
    segments: DataFrame,
    min_overlap_sec: float = 0.5,
    id_col: str = "audio_id",
    seg_col: str = "seg_idx",
    start_col: str = "start",
    end_col: str = "end",
    text_col: str | None = "text",
) -> DataFrame:
    """OverlapFilterStage analog (reference ``alm/pretrain/planning.py:
    328-394``): drop segments with empty text, then drop BOTH members of
    every pair that strictly intersects AND (shares >= ``min_overlap_sec``
    of intersection OR one contains the other). No resolution heuristic —
    overlapping speech is simply unusable for pretraining extraction.

    The reference runs a per-file sweep-line; here the corpus-wide shape
    is a declarative equi-self-join on ``audio_id`` plus an anti-join —
    one hash exchange, whole-stage codegen, and Catalyst/AQE pick the
    physical plan. Per-file segment counts are bounded (hours of audio /
    seconds per segment), so the within-file pair comparison the join
    implies stays small even at web scale.

    The strict-intersection precondition mirrors the sweep-line's
    eviction rule: ``a.end > b.start AND b.end > a.start`` — touching
    segments are never flagged even at ``min_overlap_sec=0``, while a
    zero-width segment strictly inside another still counts as contained.
    """
    df = segments
    if text_col is not None and text_col in df.columns:
        df = df.where(F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0)
    a = df.select(
        F.col(id_col).alias("_oa_id"),
        F.col(seg_col).alias("_oa_seg"),
        F.col(start_col).cast("double").alias("_oa_s"),
        F.col(end_col).cast("double").alias("_oa_e"),
    )
    b = a.select(
        F.col("_oa_id").alias("_ob_id"),
        F.col("_oa_seg").alias("_ob_seg"),
        F.col("_oa_s").alias("_ob_s"),
        F.col("_oa_e").alias("_ob_e"),
    )
    overlap = F.least("_oa_e", "_ob_e") - F.greatest("_oa_s", "_ob_s")
    contains = (
        (F.col("_oa_s") <= F.col("_ob_s")) & (F.col("_oa_e") >= F.col("_ob_e"))
    ) | ((F.col("_ob_s") <= F.col("_oa_s")) & (F.col("_ob_e") >= F.col("_oa_e")))
    strict = (F.col("_oa_e") > F.col("_ob_s")) & (F.col("_ob_e") > F.col("_oa_s"))
    bad = (
        a.join(
            b,
            (F.col("_oa_id") == F.col("_ob_id"))
            & (F.col("_oa_seg") != F.col("_ob_seg"))
            & strict
            & ((overlap >= min_overlap_sec) | contains),
        )
        .select(F.col("_oa_id").alias("_bad_id"), F.col("_oa_seg").alias("_bad_seg"))
        .distinct()
    )
    return df.join(
        bad,
        (df[id_col] == bad["_bad_id"]) & (df[seg_col] == bad["_bad_seg"]),
        "left_anti",
    )


SNIPPETS_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("snippet_idx", IntegerType(), False),
        StructField("start", DoubleType(), False),
        StructField("end", DoubleType(), False),
        StructField("num_segments", IntegerType(), False),
        StructField("text", StringType(), False),
        StructField("seg_starts_rel", ArrayType(DoubleType()), False),
        StructField("seg_ends_rel", ArrayType(DoubleType()), False),
    ]
)

SNIPPET_STATS_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("planned", IntegerType(), False),
        StructField("too_long", IntegerType(), False),
        StructField("too_short", IntegerType(), False),
        StructField("no_text", IntegerType(), False),
    ]
)


def _plan_group(pdf: pd.DataFrame, max_dur: float, min_dur: float, max_gap: float):
    from ..kernels.alm import plan_snippets

    pdf = pdf.sort_values(["start", "end"])
    segs = [
        {"start": float(r.start), "end": float(r.end), "text": r.text}
        for r in pdf.itertuples(index=False)
    ]
    return plan_snippets(segs, max_dur, min_dur, max_gap)


def plan_snippets_stage(
    segments: DataFrame,
    max_duration_sec: float = 600.0,
    min_duration_sec: float = 0.5,
    max_segment_gap_sec: float = 30.0,
) -> DataFrame:
    """SnippetCutPlannerStage analog (reference planning:403-474): greedy
    contiguous packing of a file's non-overlapping segments into
    pretraining snippets, one output row per snippet with the joined text
    and snippet-relative clamped segment boundaries
    (``relativize_segments``, planning:206-250). The per-file walk is
    order-dependent, so it runs as an applyInPandas kernel grouped on
    ``audio_id``."""
    if max_duration_sec <= 0:
        raise ValueError("max_duration_sec must be > 0")
    if not 0 <= min_duration_sec <= max_duration_sec:
        raise ValueError("need 0 <= min_duration_sec <= max_duration_sec")
    if max_segment_gap_sec < 0:
        raise ValueError("max_segment_gap_sec must be >= 0")

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.alm import relativize_segments

        aid = pdf["audio_id"].iloc[0]
        snippets, _drops = _plan_group(
            pdf, max_duration_sec, min_duration_sec, max_segment_gap_sec
        )
        rows = []
        for i, sn in enumerate(snippets):
            rel = relativize_segments(sn["segments"], sn["start"], sn["end"])
            rows.append(
                {
                    "audio_id": aid,
                    "snippet_idx": i,
                    "start": sn["start"],
                    "end": sn["end"],
                    "num_segments": len(sn["segments"]),
                    "text": " ".join(s.get("text") or "" for s in sn["segments"]).strip(),
                    "seg_starts_rel": [s["start"] for s in rel],
                    "seg_ends_rel": [s["end"] for s in rel],
                }
            )
        return pd.DataFrame(rows, columns=[f.name for f in SNIPPETS_SCHEMA.fields])

    return segments.groupBy("audio_id").applyInPandas(per_file, SNIPPETS_SCHEMA)


def snippet_plan_stats(
    segments: DataFrame,
    max_duration_sec: float = 600.0,
    min_duration_sec: float = 0.5,
    max_segment_gap_sec: float = 30.0,
) -> DataFrame:
    """Per-file planner drop counters (too_long / too_short / no_text —
    the reference's ``pretrain_long_form`` metadata, planning:455-460)."""

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        aid = pdf["audio_id"].iloc[0]
        snippets, drops = _plan_group(
            pdf, max_duration_sec, min_duration_sec, max_segment_gap_sec
        )
        return pd.DataFrame(
            [
                {
                    "audio_id": aid,
                    "planned": len(snippets),
                    "too_long": drops["too_long"],
                    "too_short": drops["too_short"],
                    "no_text": drops["no_text"],
                }
            ],
            columns=[f.name for f in SNIPPET_STATS_SCHEMA.fields],
        )

    return segments.groupBy("audio_id").applyInPandas(per_file, SNIPPET_STATS_SCHEMA)


def repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    ngram_n: int = 10,
    ngram_max_count: int = 3,
    tokenizer=None,
) -> DataFrame:
    """SnippetRepetitionFilterStage analog (reference planning:481-646):
    flag texts where any contiguous token ``ngram_n``-gram appears
    strictly more than ``ngram_max_count`` times (Whisper-style ASR
    degeneration). Adds ``max_ngram_count`` and ``is_repetitive``;
    callers filter on the flag so the decision stays inspectable.

    With the default whitespace tokenizer the whole computation is
    Column expressions — split, n-gram assembly via ``transform`` over a
    ``sequence``, then max frequency as the longest equal-neighbor run in
    the ``array_sort``-ed n-gram array via ``aggregate``. Zero UDF, zero
    shuffle, whole-stage codegen. The reference instead requires a
    HuggingFace fast tokenizer (unavailable in this sandbox); pass any
    ``tokenizer: str -> list`` callable for the Arrow-batched parity path
    (mirrors TokenCountFilter's injectable-tokenizer shape).

    Texts with fewer than ``ngram_n`` tokens are never repetitive
    (reference planning:617-621).
    """
    if ngram_n < 1:
        raise ValueError("ngram_n must be >= 1")
    if ngram_max_count < 1:
        raise ValueError("ngram_max_count must be >= 1")

    if tokenizer is not None:
        from pyspark.sql.types import IntegerType as _Int

        from ..kernels.alm import max_ngram_count as _mnc

        @F.pandas_udf(_Int())
        def mnc_udf(texts: pd.Series) -> pd.Series:
            return texts.fillna("").map(lambda t: _mnc(tokenizer(t), ngram_n))

        counted = df.withColumn("max_ngram_count", mnc_udf(F.col(text_col)))
        return counted.withColumn(
            "is_repetitive", F.col("max_ngram_count") > F.lit(ngram_max_count)
        )

    trimmed = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.split(trimmed, r"\s+")
    n_tok = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(F.size(toks))
    # n-grams joined on \x01, which whitespace-split tokens cannot contain
    sep = "\x01"
    ngrams = F.transform(
        F.sequence(F.lit(1), n_tok - F.lit(ngram_n - 1)),
        lambda i: F.array_join(F.slice(toks, i, ngram_n), sep),
    )
    # max n-gram frequency == longest run of equal neighbors in the sorted
    # array: one pass, no explode/groupBy
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    max_run = F.aggregate(
        F.array_sort(ngrams),
        acc0,
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    counted = df.withColumn(
        "max_ngram_count",
        F.when(n_tok < ngram_n, F.lit(0)).otherwise(max_run).cast("int"),
    )
    return counted.withColumn(
        "is_repetitive", F.col("max_ngram_count") > F.lit(ngram_max_count)
    )


EXTRACT_SCHEMA = StructType(
    [
        StructField("snippet_id", StringType(), False),
        StructField("audio_id", StringType(), False),
        StructField("start", DoubleType(), False),
        StructField("end", DoubleType(), False),
        StructField("duration_sec", DoubleType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("bytes", BinaryType(), True),
        StructField("extract_error", StringType(), True),
    ]
)


def extract_snippets(
    clips: DataFrame,
    plan: DataFrame,
    target_sample_rate: int = 16000,
    output_format: str = "wav",
    id_col: str = "audio_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
) -> DataFrame:
    """SnippetExtractionStage analog (reference ``alm/pretrain/
    extraction.py:234-303``): for every planned snippet, slice the
    source clip frame-exactly (``[floor(start*sr), ceil(end*sr))``),
    mono-average, resample to ``target_sample_rate``, and re-encode —
    one output row per snippet with the WebDataset-safe ``snippet_id``
    (``make_snippet_id``). Empty frame ranges are skipped (the
    reference logs and drops them); decode failures emit an error row
    so lost snippets are auditable rather than silent.

    Spark shape: equi-join plan→clips on ``audio_id`` (each clip's
    bytes crosses the shuffle once, then fans out to its snippets
    map-side), mapInPandas for the per-snippet DSP. Pair with
    ``io.webdataset.write_tar_shards`` for the reference's tar-shard
    sink. Only ``wav`` (pcm_s16le) encoding is available in this
    container; other formats raise the honest STUB error."""
    if output_format != "wav":
        raise NotImplementedError(
            f"STUB: only wav/pcm_s16le encodable in this environment, got {output_format!r}"
        )
    if target_sample_rate <= 0:
        raise ValueError("target_sample_rate must be > 0")

    slim = clips.select(
        F.col(id_col).alias("audio_id"),
        F.col(bytes_col).alias("_clip_bytes"),
        F.col(codec_col).alias("_clip_codec"),
    )
    joined = plan.select(
        "audio_id", F.col("start").cast("double"), F.col("end").cast("double")
    ).join(slim, "audio_id")

    def run(batches):
        from ..kernels.alm import make_snippet_id, slice_mono_resample
        from ..kernels.audio import decode_clip, encode_wav_pcm16

        for pdf in batches:
            rows = []
            for aid, s, e, raw, codec in zip(
                pdf["audio_id"], pdf["start"], pdf["end"],
                pdf["_clip_bytes"], pdf["_clip_codec"],
            ):
                sid = make_snippet_id(str(aid), float(s), float(e))
                try:
                    samples, sr = decode_clip(bytes(raw), codec)
                    sliced = slice_mono_resample(
                        samples, sr, float(s), float(e), target_sample_rate
                    )
                    if sliced is None:
                        continue  # empty frame range (reference: warn + skip)
                    mono, dur = sliced
                    rows.append(
                        (sid, aid, float(s), float(e), dur, target_sample_rate,
                         encode_wav_pcm16(mono, target_sample_rate), None)
                    )
                except Exception as exc:  # noqa: BLE001 - auditable error row
                    rows.append(
                        (sid, aid, float(s), float(e), None, None, None,
                         f"{type(exc).__name__}: {exc}"[:200])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in EXTRACT_SCHEMA.fields])

    return joined.mapInPandas(run, schema=EXTRACT_SCHEMA)


def duration_histogram(
    df: DataFrame, duration_col: str, bin_width: int = 30
) -> DataFrame:
    """Dense fixed-width duration histogram from bin 0 through the bin of
    the longest duration, zero-count bins included (reference
    ``pretrain/utils.py histogram_30s``). Pure DataFrame ops: one
    aggregate for the sparse counts, one scalar max, a ``sequence``
    explode for the dense bin axis, and a left join — no UDF, no
    collect. Output: (bin_idx, bin_label, n) ordered by bin_idx."""
    if bin_width <= 0:
        raise ValueError("bin_width must be > 0")
    idx = F.floor(F.col(duration_col) / bin_width).cast("long")
    sparse = df.select(idx.alias("bin_idx")).groupBy("bin_idx").count()
    axis = (
        df.select(F.max(idx).alias("_mx"))
        .select(F.explode(F.sequence(F.lit(0).cast("long"), F.col("_mx"))).alias("bin_idx"))
    )
    return (
        axis.join(sparse, "bin_idx", "left")
        .select(
            "bin_idx",
            F.concat(
                (F.col("bin_idx") * bin_width).cast("string"),
                F.lit("-"),
                ((F.col("bin_idx") + 1) * bin_width).cast("string"),
            ).alias("bin_label"),
            F.coalesce(F.col("count"), F.lit(0)).cast("long").alias("n"),
        )
    )


SPLITS_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("split_idx", IntegerType(), False),
        StructField("start", DoubleType(), False),
        StructField("end", DoubleType(), False),
    ]
)


def split_long_audio(
    segments: DataFrame,
    duration: DataFrame,
    suggested_max_len: float = 3600.0,
    min_len: float = 1.0,
) -> DataFrame:
    """SplitLongAudioStage analog (reference stages/audio/tagging/
    split.py:34-199): chunk over-long files at natural pauses (previous
    segment end once the running span exceeds ``suggested_max_len``);
    chunks shorter than ``min_len`` merge into the previous chunk.
    Files at or under the limit pass through as one [0, duration] span.

    ``segments``: (audio_id, start, end) transcript/VAD segments;
    ``duration``: (audio_id, duration_sec). Output spans feed
    ``extract_snippets`` for the actual audio slicing; the per-file walk
    is sequential, so applyInPandas grouped on audio_id."""
    if suggested_max_len <= 0 or min_len < 0:
        raise ValueError("need suggested_max_len > 0 and min_len >= 0")
    segs = segments.select(
        "audio_id", F.col("start").cast("double"), F.col("end").cast("double")
    )
    durs = duration.select("audio_id", F.col("duration_sec").cast("double"))
    joined = segs.join(durs, "audio_id")

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.alm import long_audio_split_points

        aid = pdf["audio_id"].iloc[0]
        total = float(pdf["duration_sec"].iloc[0])
        ends = sorted(float(e) for e in pdf["end"])
        points = long_audio_split_points(ends, suggested_max_len)
        bounds = [0.0, *points, total]
        spans = []
        for s, e in zip(bounds, bounds[1:]):
            if spans and e - s < min_len:
                spans[-1] = (spans[-1][0], e)  # fold the sliver back
            elif e > s:
                spans.append((s, e))
        rows = [
            {"audio_id": aid, "split_idx": i, "start": s, "end": e}
            for i, (s, e) in enumerate(spans)
        ]
        return pd.DataFrame(rows, columns=[f.name for f in SPLITS_SCHEMA.fields])

    return joined.groupBy("audio_id").applyInPandas(per_file, SPLITS_SCHEMA)


def join_split_alignment(
    splits: DataFrame,
    id_col: str = "audio_id",
    idx_col: str = "split_idx",
    text_col: str = "text",
    words_col: str = "words",
    offset_col: str = "offset",
) -> DataFrame:
    """JoinSplitAudioMetadataStage analog (reference stages/audio/
    tagging/split.py:202-299): reassemble each original file from its
    per-split ASR outputs — concatenate non-empty transcripts in split
    order, shift every word's timestamps by the split's offset (rounded
    to ms, like the reference), flatten into one alignment.

    Entirely Column expressions: collect per file, ``array_sort`` on
    split_idx, ``transform``/``flatten``/``array_join`` — no UDF, one
    shuffle. Output: (audio_id, text, alignment).
    """
    packed = splits.groupBy(F.col(id_col).alias("audio_id")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(idx_col).alias("idx"),
                    F.coalesce(F.col(text_col), F.lit("")).alias("text"),
                    F.col(offset_col).cast("double").alias("off"),
                    F.col(words_col).alias("words"),
                )
            )
        ).alias("_splits")
    )
    text = F.array_join(
        F.filter(
            F.transform(F.col("_splits"), lambda s: s["text"]),
            lambda t: t != F.lit(""),
        ),
        " ",
    )
    # a split with NULL words contributes [] (the reference treats a
    # missing per-split alignment as empty) — without the coalesce,
    # Spark's flatten returns NULL when ANY element array is null,
    # nullifying the whole file's alignment
    _empty_words = F.array().cast(
        "array<struct<word:string,start:double,end:double>>"
    )
    alignment = F.flatten(
        F.transform(
            F.col("_splits"),
            lambda s: F.coalesce(
                F.transform(
                    s["words"],
                    lambda w: F.struct(
                        w["word"].alias("word"),
                        F.round(w["start"] + s["off"], 3).alias("start"),
                        F.round(w["end"] + s["off"], 3).alias("end"),
                    ),
                ),
                _empty_words,
            ),
        )
    )
    return packed.select(
        "audio_id", text.alias("text"), alignment.alias("alignment")
    )


MODULE_SEGMENTS_SCHEMA = StructType(
    [
        StructField("audio_id", StringType(), False),
        StructField("seg_idx", IntegerType(), False),
        StructField("speaker", StringType(), True),
        StructField("start", DoubleType(), False),
        StructField("end", DoubleType(), False),
        StructField("text", StringType(), False),
        StructField("n_words", IntegerType(), False),
        StructField("bandwidths", ArrayType(IntegerType()), True),
    ]
)


def prepare_module_segments_stage(
    words: DataFrame,
    module: str = "tts",
    min_duration: float = 5.0,
    max_duration: float = 20.0,
    max_pause: float = 2.0,
    terminal_punct_marks: str | None = None,
    full_utterance_ratio: float = 1.0,
    punctuation_split_only: bool = False,
) -> DataFrame:
    """PrepareModuleSegmentsStage analog (reference stages/audio/tagging/
    prepare_module_segments.py:34-421): re-segment each file's word
    stream for TTS (single-speaker runs, punctuation/pause/bandwidth
    splits) or ASR (multi-speaker, punctuation/random-duration splits;
    the random ceiling is seeded from md5(audio_id) per the reference,
    so output is deterministic and resume-safe). applyInPandas grouped
    on audio_id over (audio_id, word, start, end, speaker[, bandwidth])
    rows — the shape ``merge_alignment_diarization`` emits, flattened.
    """
    from ..kernels.alm import DEFAULT_TERMINAL_PUNCT, prepare_module_segments

    marks = terminal_punct_marks or DEFAULT_TERMINAL_PUNCT
    has_bw = "bandwidth" in words.columns
    cols = ["audio_id", "word", "start", "end", "speaker"] + (
        ["bandwidth"] if has_bw else []
    )
    slim = words.select(*cols)

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        aid = pdf["audio_id"].iloc[0]
        pdf = pdf.sort_values(["start", "end"])
        wlist = [
            {
                "word": r.word,
                "start": float(r.start),
                "end": float(r.end),
                "speaker": r.speaker,
                "bandwidth": (
                    None if not has_bw or pd.isna(r.bandwidth) else int(r.bandwidth)
                ),
            }
            for r in pdf.itertuples(index=False)
        ]
        segs = prepare_module_segments(
            wlist, aid, module=module, min_duration=min_duration,
            max_duration=max_duration, max_pause=max_pause,
            terminal_punct_marks=marks,
            full_utterance_ratio=full_utterance_ratio,
            punctuation_split_only=punctuation_split_only,
        )
        rows = [
            {
                "audio_id": aid,
                "seg_idx": i,
                "speaker": s["speaker"],
                "start": s["start"],
                "end": s["end"],
                "text": s["text"],
                "n_words": len(s["words"]),
                "bandwidths": s["bandwidths"],
            }
            for i, s in enumerate(segs)
        ]
        return pd.DataFrame(
            rows, columns=[f.name for f in MODULE_SEGMENTS_SCHEMA.fields]
        )

    return slim.groupBy("audio_id").applyInPandas(per_file, MODULE_SEGMENTS_SCHEMA)
