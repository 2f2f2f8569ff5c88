"""Deterministic synthetic clips table (FIXTURES.md F8, BASELINE.json input_hint).

Schema: (clip_id:string, bytes:binary, sr_hz:int32, dur_ms:int32,
codec:string, transcript:string). Everything derives from the row index +
seed, generated distributedly via mapInPandas over spark.range — no
driver-side materialization, so the same generator scales to any row count.

Planted duplicate structure, per block of 20 rows (held-out side table
``expected_clusters`` labels them; never an engine input):

  rows 0,1    exact pair (byte-identical audio, identical transcript)
  rows 2,3,4  fuzzy cluster (1-2 word edits of row 2's transcript)
  rows 5,6    substring pair (row 6's transcript contains row 5's whole
              transcript, which is >= 50 chars)
  rows 7,8    near-dup audio (same PCM scaled 0.99 => SNR ~40 dB) with
              identical transcript
  rows 9-19   unique
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .kernels.audio import encode_wav_pcm16

BLOCK = 20
SR_HZ = 16000

_VOCAB = [
    f"{c}{v}{c2}{v2}"
    for c in "btkdspmnlr"
    for v in "aeiou"
    for c2 in "btkd"
    for v2 in ["a", "o"]
][:200]

CLIPS_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("bytes", BinaryType(), False),
        StructField("sr_hz", IntegerType(), False),
        StructField("dur_ms", IntegerType(), False),
        StructField("codec", StringType(), False),
        StructField("transcript", StringType(), False),
    ]
)


def _base_transcript(rng: np.random.RandomState, n_words: int) -> list:
    return [_VOCAB[i] for i in rng.randint(0, len(_VOCAB), size=n_words)]


def _row(i: int, seed: int, lite: bool = False) -> tuple:
    """Fully deterministic row from global index i.

    ``lite=True`` divides clip durations by 10 AFTER drawing them (RNG
    stream unchanged, transcripts identical) — same schema and planted
    clusters with ~10x cheaper audio synthesis, for scaling benchmarks
    where the fuzzy path never decodes audio anyway."""
    block, r = divmod(i, BLOCK)
    brng = np.random.RandomState((seed * 1_000_003 + block) % (2**31))
    # block-level base materials (regenerated identically for each member).
    # ALL fixed-count draws happen BEFORE the duration-dependent randn:
    # the audio noise consumes n_samp draws, so putting any transcript
    # draw after it would make lite=True (smaller n_samp) shift the
    # stream and silently change transcripts vs the full table — the
    # exact invariant the lite mode documents.
    base_words = _base_transcript(brng, 60 + int(brng.randint(0, 60)))
    base_dur = int(brng.randint(250, 750))
    fuzzy_words = _base_transcript(brng, 60 + int(brng.randint(0, 60)))  # rows 2-4 base (distinct from rows 0/1)
    audio_words = _base_transcript(brng, 40 + int(brng.randint(0, 20)))  # rows 7/8 transcript
    sub_words = _base_transcript(brng, 25 + int(brng.randint(0, 15)))  # rows 5/6 core (>=50 chars)
    extra_words = _base_transcript(brng, 30 + int(brng.randint(0, 10)))
    f0 = float(brng.uniform(80, 400))
    if lite:
        base_dur //= 10
    n_samp = base_dur * SR_HZ // 1000
    t = np.arange(n_samp, dtype=np.float32) / SR_HZ
    base_audio = (0.5 * np.sin(2 * np.pi * f0 * t) + 0.1 * brng.randn(n_samp)).astype(np.float32)
    base_audio = np.clip(base_audio, -1.0, 1.0)

    rrng = np.random.RandomState((seed * 2_000_003 + i) % (2**31))

    def unique_row():
        # same fixed-draws-first discipline as the block materials
        words = _base_transcript(rrng, 40 + int(rrng.randint(0, 80)))
        dur = int(rrng.randint(250, 750))
        freq = float(rrng.uniform(80, 400))
        if lite:
            dur //= 10
        n = dur * SR_HZ // 1000
        tt = np.arange(n, dtype=np.float32) / SR_HZ
        audio = (0.4 * np.sin(2 * np.pi * freq * tt) + 0.1 * rrng.randn(n)).astype(np.float32)
        return np.clip(audio, -1, 1), dur, " ".join(words)

    if r in (0, 1):
        audio, dur, words = base_audio, base_dur, list(base_words)
        transcript = " ".join(words)
    elif r in (2, 3, 4):
        words = list(fuzzy_words)
        if r > 2:  # 1-2 word edits at deterministic positions
            erng = np.random.RandomState((seed * 3_000_017 + i) % (2**31))
            for _ in range(r - 2):
                pos = int(erng.randint(0, len(words)))
                words[pos] = _VOCAB[int(erng.randint(0, len(_VOCAB)))]
        transcript = " ".join(words)
        audio, dur = base_audio, base_dur
    elif r in (5, 6):
        core = " ".join(sub_words)
        transcript = core if r == 5 else " ".join(extra_words[:15]) + " " + core + " " + " ".join(extra_words[15:])
        audio, dur, _ = unique_row()
    elif r in (7, 8):
        transcript = " ".join(audio_words)
        audio = base_audio if r == 7 else np.clip(base_audio * 0.99, -1, 1).astype(np.float32)
        dur = base_dur
    else:
        audio, dur, transcript = unique_row()

    return (
        f"clip{i:012d}",
        encode_wav_pcm16(audio, SR_HZ),
        SR_HZ,
        int(dur),
        "pcm_s16le",
        transcript,
    )


def generate_clips(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    num_partitions: int | None = None,
    lite: bool = False,
) -> DataFrame:
    if num_partitions is None:
        # enough splits to keep every core busy downstream
        num_partitions = max(spark.sparkContext.defaultParallelism * 2, n_rows // 5000)
        num_partitions = min(num_partitions, max(1, n_rows // 100))

    def gen(batches):
        for pdf in batches:
            rows = [_row(int(i), seed, lite) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in CLIPS_SCHEMA.fields])

    return spark.range(0, n_rows, numPartitions=num_partitions).mapInPandas(gen, schema=CLIPS_SCHEMA)


def generate_hot_clips(
    spark: SparkSession,
    n_rows: int,
    hot_fraction: float = 0.3,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Skew corpus: ``hot_fraction`` of rows share ONE transcript verbatim,
    so every LSH band maps them to the same bucket — the hot-key shape that
    boilerplate text produces at web scale and that ``num_salts > 1`` is
    designed to defuse. Remaining rows are unique word salad. Columns:
    (clip_id, transcript) — audio omitted (the fuzzy path never reads it).
    """
    hrng = np.random.RandomState(seed)
    hot_text = " ".join(_VOCAB[i] for i in hrng.randint(0, len(_VOCAB), size=80))
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    n_hot = int(n_rows * hot_fraction)

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                if i < n_hot:
                    text = hot_text
                else:
                    rrng = np.random.RandomState((seed * 7_000_003 + i) % (2**31))
                    text = " ".join(_VOCAB[j] for j in rrng.randint(0, len(_VOCAB), size=60))
                out.append((f"clip{i:012d}", text))
            yield pd.DataFrame(out, columns=["clip_id", "transcript"])

    return spark.range(0, n_rows, numPartitions=num_partitions).mapInPandas(
        gen, schema="clip_id string, transcript string"
    )


def expected_clusters(spark: SparkSession, n_rows: int) -> DataFrame:
    """Held-out truth: (clip_id, expected_cluster, kind). Planted pairs
    only; 'unique' rows get their own singleton cluster label."""
    kinds = {0: "exact", 1: "exact", 2: "fuzzy", 3: "fuzzy", 4: "fuzzy", 5: "substring", 6: "substring", 7: "audio", 8: "audio"}
    bases = {0: 0, 1: 0, 2: 2, 3: 2, 4: 2, 5: 5, 6: 5, 7: 7, 8: 7}
    df = spark.range(0, n_rows).select(
        F.concat(F.lit("clip"), F.lpad(F.col("id").cast("string"), 12, "0")).alias("clip_id"),
        F.col("id"),
        (F.col("id") % BLOCK).alias("_r"),
        F.floor(F.col("id") / BLOCK).alias("_block"),
    )
    kind_expr = F.create_map(*[x for k, v in kinds.items() for x in (F.lit(k), F.lit(v))])
    base_expr = F.create_map(*[x for k, v in bases.items() for x in (F.lit(k), F.lit(v))])
    return df.select(
        "clip_id",
        F.when(
            F.col("_r") <= 8,
            F.concat(F.lit("c"), F.col("_block").cast("string"), F.lit("_"), base_expr[F.col("_r")].cast("string")),
        )
        .otherwise(F.concat(F.lit("u"), F.col("id").cast("string")))
        .alias("expected_cluster"),
        F.coalesce(kind_expr[F.col("_r")], F.lit("unique")).alias("kind"),
    )


ALM_SEGMENTS_SCHEMA = (
    "audio_id string, sample_rate int, seg_idx int, start double, end double, "
    "speaker string, bandwidth int, text string, "
    "words array<struct<word string, start double, end double>>"
)


def _alm_file_segments(i: int, seed: int) -> list:
    """Deterministic per-file transcript segments exercising every ALM
    builder branch: every 13th file is 8 kHz (lost_sr), ~8% of segments
    are sub-8kHz bandwidth (lost_bw / scan break), ~5% carry the literal
    'no-speaker' label (speaker break), and speaker churn makes some
    window starts overflow the speaker budget."""
    rng = np.random.RandomState((seed * 9_999_991 + i) % (2**31))
    sr = 8000 if i % 13 == 12 else 16000
    n_seg = 20 + int(rng.randint(0, 40))
    n_spk = 2 + int(rng.randint(0, 5))
    speakers = [f"spk_{c}" for c in "abcdef"[:n_spk]]
    rows = []
    t = float(rng.uniform(0, 2))
    for k in range(n_seg):
        dur = float(rng.uniform(2.0, 8.0))
        start, end = t, t + dur
        t = end + float(rng.uniform(0.0, 1.5))
        r = rng.uniform()
        if r < 0.05:
            spk = "no-speaker"
        else:
            spk = speakers[int(rng.randint(0, n_spk))]
        bw = int(rng.randint(4000, 8000)) if rng.uniform() < 0.08 else int(rng.randint(8000, 12001))
        n_words = max(2, int(dur / 0.4))
        idxs = rng.randint(0, len(_VOCAB), size=n_words)
        bounds = np.linspace(start, end, n_words + 1)
        words = [
            {"word": _VOCAB[int(idxs[w])], "start": float(bounds[w]), "end": float(bounds[w + 1])}
            for w in range(n_words)
        ]
        rows.append(
            (
                f"audio{i:08d}",
                sr,
                k,
                start,
                end,
                spk,
                bw,
                " ".join(w["word"] for w in words),
                words,
            )
        )
    return rows


def generate_alm_segments(
    spark: SparkSession,
    n_files: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic per-segment table for the ALM window stages (one row per
    transcript segment, grouped by audio_id downstream). Distributed via
    mapInPandas over spark.range like generate_clips — scales to any
    file count with no driver materialization."""
    if num_partitions is None:
        num_partitions = max(2, min(spark.sparkContext.defaultParallelism, n_files))

    cols = [
        "audio_id", "sample_rate", "seg_idx", "start", "end",
        "speaker", "bandwidth", "text", "words",
    ]

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(_alm_file_segments(int(i), seed))
            yield pd.DataFrame(rows, columns=cols)

    return spark.range(0, n_files, numPartitions=num_partitions).mapInPandas(
        gen, schema=ALM_SEGMENTS_SCHEMA
    )
