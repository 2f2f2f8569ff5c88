"""Tests for text-analysis functions, similarity search, Jaccard pairs,
and multimodal audio operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from curator_spark.datagen import generate_clips
from curator_spark.functions.text import language_id, quality_score_micro, token_stats
from curator_spark.operators.jaccard import token_jaccard_pairs
from curator_spark.operators.multimodal import audio_features, frame_sample_stub, resample_features
from curator_spark.operators.similarity import ann_lsh_topk, cosine_neardup_pairs, cosine_topk


# ---------- text functions ----------


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "the cat the cat sat")], "id long, text string")
    s = token_stats(F.col("text"))
    row = df.select(*[c.alias(k) for k, c in s.items()]).collect()[0]
    assert row["n_tokens"] == 5
    assert row["n_unique_tokens"] == 3
    # mean token len = (3+3+3+3+3)/5 = 3.0
    assert row["mean_token_len_micro"] == 3_000_000
    # stopwords: 'the' x2 of 5
    assert row["stopword_ratio_micro"] == 400_000
    assert row["repetition_ratio_micro"] == 400_000


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [(1, " ".join(["the", "quick", "fox"] * 20)), (2, "x")], "id long, text string"
    )
    rows = df.select("id", quality_score_micro(F.col("text")).alias("q")).collect()
    scores = {r["id"]: r["q"] for r in rows}
    assert 0 <= scores[2] < scores[1] <= 1_000_000


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "el gato que vive en la casa de los juegos"),
            (3, "der hund ist nicht in das haus und die katze"),
        ],
        "id long, text string",
    )
    rows = df.select("id", language_id(F.col("text")).alias("lang")).collect()
    langs = {r["id"]: r["lang"] for r in rows}
    assert langs == {1: "en", 2: "es", 3: "de"}


# ---------- jaccard ----------


def test_token_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c e"),  # jaccard 3/5 = 0.6 with 1
            (3, "x y z w"),
        ],
        "doc_id long, text string",
    )
    got = token_jaccard_pairs(df, threshold_micro=500_000).collect()
    assert len(got) == 1
    assert (got[0]["src"], got[0]["dst"], got[0]["jaccard_micro"]) == (1, 2, 600_000)


# ---------- similarity ----------


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(8, 16).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # near-duplicate of each: tiny perturbation
        rows.append((100 + i, [float(x) for x in (v + 0.001 * rng.randn(16).astype(np.float32))]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_finds_neardup(vec_df):
    q = vec_df.where(F.col("vec_id") < 8)
    got = cosine_topk(vec_df, q, k=1)
    rows = {r["query_id"]: r["match_id"] for r in got.collect()}
    assert rows == {i: 100 + i for i in range(8)}


def test_cosine_neardup_pairs(vec_df):
    got = cosine_neardup_pairs(vec_df, threshold_micro=999_000)
    pairs = {(r["src"], r["dst"]) for r in got.collect()}
    assert pairs == {(i, 100 + i) for i in range(8)}


def test_ann_lsh_topk_recall(vec_df):
    q = vec_df.where(F.col("vec_id") < 8)
    got = ann_lsh_topk(vec_df, q, dim=16, k=1, n_planes=8, n_tables=6)
    rows = {r["query_id"]: r["match_id"] for r in got.collect()}
    hit = sum(1 for i in range(8) if rows.get(i) == 100 + i)
    assert hit >= 7  # multi-table LSH: allow one miss


# ---------- multimodal ----------


def test_audio_features_roundtrip(spark):
    clips = generate_clips(spark, 20, seed=11)
    feats = audio_features(clips)
    rows = feats.collect()
    assert len(rows) == 20
    ok = [r for r in rows if r["decode_error"] is None]
    assert len(ok) == 20
    assert all(r["decoded_sr_hz"] == 16000 for r in ok)
    assert all(r["n_samples"] > 0 and r["pcm_hash"] for r in ok)
    # exact audio pair rows 0,1 share a pcm hash
    by_id = {r["clip_id"]: r for r in ok}
    assert by_id["clip000000000000"]["pcm_hash"] == by_id["clip000000000001"]["pcm_hash"]


def test_audio_features_stub_codec(spark):
    df = spark.createDataFrame([("c1", b"\x00\x01", "opus")], "clip_id string, bytes binary, codec string")
    rows = audio_features(df).collect()
    assert rows[0]["decode_error"].startswith("STUB:")


def test_resample_features(spark):
    clips = generate_clips(spark, 4, seed=11)
    rows = resample_features(clips, target_sr_hz=8000).collect()
    orig = {r["clip_id"]: r for r in audio_features(clips).collect()}
    for r in rows:
        assert r["resampled_n_samples"] == pytest.approx(orig[r["clip_id"]]["n_samples"] / 2, abs=2)


def test_frame_sample_stub(spark):
    df = spark.createDataFrame([("c1", b"", "h264")], "clip_id string, bytes binary, codec string")
    with pytest.raises(NotImplementedError):
        frame_sample_stub(df)


def test_audio_metrics_duration_and_bandwidth(spark):
    import numpy as np

    from curator_spark.kernels.audio import encode_wav_pcm16
    from curator_spark.operators.multimodal import audio_metrics

    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    multi = sum(0.3 * np.sin(2 * np.pi * f * t) for f in (300, 1200, 2995)).astype(np.float32)
    noise = np.random.default_rng(0).normal(0, 0.1, sr * 2).astype(np.float32)
    df = spark.createDataFrame(
        [
            ("tone", bytearray(encode_wav_pcm16(tone, sr)), "pcm_s16le"),
            ("multi", bytearray(encode_wav_pcm16(multi, sr)), "pcm_s16le"),
            ("noise", bytearray(encode_wav_pcm16(noise, sr)), "pcm_s16le"),
            ("bad", bytearray(b"nope"), "pcm_s16le"),
            ("stub", bytearray(b"\x00"), "opus"),
        ],
        "clip_id string, bytes binary, codec string",
    )
    rows = {r["clip_id"]: r for r in audio_metrics(df).collect()}
    assert rows["tone"]["duration_ms"] == 1000
    assert rows["noise"]["duration_ms"] == 2000
    # band-limited content tops out near its highest component (+ the
    # Blackman-Harris leakage skirt, ~300 Hz at -50 dB); full-band noise
    # reaches Nyquist
    assert 440 <= rows["tone"]["bandwidth_hz"] <= 1000
    assert 2995 <= rows["multi"]["bandwidth_hz"] <= 3900
    assert rows["noise"]["bandwidth_hz"] >= 7500
    assert rows["bad"]["decode_error"] and rows["bad"]["bandwidth_hz"] is None
    assert rows["stub"]["decode_error"].startswith("STUB:")


def test_vad_segments_fanout(spark):
    import numpy as np

    from curator_spark.kernels.audio import encode_wav_pcm16, energy_vad_segments
    from curator_spark.operators.multimodal import vad_segments

    sr = 16000

    def tone(sec, f=440, amp=0.5):
        t = np.arange(int(sr * sec)) / sr
        return amp * np.sin(2 * np.pi * f * t)

    sil = lambda sec: np.zeros(int(sr * sec))  # noqa: E731
    # 1s sil | 3s tone | 0.3s gap (< min_interval -> merged) | 2s tone |
    # 5s sil | 0.5s blip (< min_duration -> dropped) | 1s sil
    clip = np.concatenate(
        [sil(1), tone(3), sil(0.3), tone(2), sil(5), tone(0.5), sil(1)]
    ).astype(np.float32)
    two = np.concatenate([sil(1), tone(3), sil(2), tone(2.5), sil(1)]).astype(np.float32)
    df = spark.createDataFrame(
        [
            ("merged", bytearray(encode_wav_pcm16(clip, sr)), "pcm_s16le"),
            ("two", bytearray(encode_wav_pcm16(two, sr)), "pcm_s16le"),
            ("silent", bytearray(encode_wav_pcm16(sil(3).astype(np.float32), sr)), "pcm_s16le"),
            ("bad", bytearray(b"nope"), "pcm_s16le"),
        ],
        "clip_id string, bytes binary, codec string",
    )
    rows = vad_segments(df).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["clip_id"], []).append(r)
    # the 0.3s gap merges, the 0.5s blip drops -> ONE segment ~[0.7s, 6.6s]
    assert len(by_id["merged"]) == 1
    seg = by_id["merged"][0]
    assert abs(seg["start_ms"] - 700) <= 60 and abs(seg["end_ms"] - 6600) <= 60
    assert seg["duration_ms"] == seg["end_ms"] - seg["start_ms"]
    # the 2s gap does NOT merge -> two segments, numbered in order
    assert [r["segment_num"] for r in sorted(by_id["two"], key=lambda r: r["start_ms"])] == [0, 1]
    # silent and undecodable clips emit no rows
    assert "silent" not in by_id and "bad" not in by_id
    # Spark rows match the kernel exactly (same config)
    ker = energy_vad_segments(clip, sr)
    assert [(r["start_ms"], r["end_ms"]) for r in by_id["merged"]] == ker


def test_mono_conversion(spark):
    """MonoConversionStage parity (mono_conversion.py:74-116): stereo ->
    channel-mean mono; strict sample-rate mismatch / undecodable rows drop."""
    import numpy as np

    from curator_spark.kernels.audio import (
        decode_wav_pcm16,
        encode_wav_pcm16,
        encode_wav_pcm16_stereo,
        snr_db,
    )
    from curator_spark.operators.multimodal import mono_conversion

    sr = 48000
    t = np.arange(sr) / sr
    left = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    right = (0.25 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    df = spark.createDataFrame(
        [
            ("stereo", bytearray(encode_wav_pcm16_stereo(left, right, sr)), "pcm_s16le"),
            ("mono", bytearray(encode_wav_pcm16(left, sr)), "pcm_s16le"),
            ("wrong_rate", bytearray(encode_wav_pcm16(left, 16000)), "pcm_s16le"),
            ("bad", bytearray(b"nope"), "pcm_s16le"),
        ],
        "clip_id string, bytes binary, codec string",
    )
    rows = {r["clip_id"]: r for r in mono_conversion(df, output_sample_rate=sr).collect()}
    # strict: wrong-rate and undecodable rows are gone (reference returns [])
    assert set(rows) == {"stereo", "mono"}
    st = rows["stereo"]
    assert st["src_channels"] == 2 and st["is_mono"] and st["sample_rate"] == sr
    assert st["num_samples"] == sr and st["duration_ms"] == 1000
    # decoded output == channel mean (reference: torch.mean(dim=0))
    got, got_sr = decode_wav_pcm16(bytes(st["bytes"]))
    assert got_sr == sr and snr_db((left + right) / 2, got) >= 30
    # already-mono clips pass through byte-identical
    assert bytes(rows["mono"]["bytes"]) == bytes(encode_wav_pcm16(left, sr))
    # non-strict keeps the 16 kHz row
    lax = {r["clip_id"] for r in
           mono_conversion(df, output_sample_rate=sr, strict_sample_rate=False).collect()}
    assert lax == {"stereo", "mono", "wrong_rate"}


def test_concat_segments_kernel():
    """SegmentConcatenationStage math (concatenation.py:146-231):
    silence gaps between (not after) segments, exact mappings, end<=start
    repair."""
    import numpy as np

    from curator_spark.kernels.audio import concat_segments, translate_to_original

    sr = 16000
    w1 = np.ones(sr, dtype=np.float32)          # 1000 ms
    w2 = np.full(sr // 2, -1.0, dtype=np.float32)  # 500 ms
    combined, maps = concat_segments([w1, w2], [(2000, 3000), (5000, 0)], sr, 0.5)
    assert [m["concat_start_ms"] for m in maps] == [0, 1500]
    assert [m["concat_end_ms"] for m in maps] == [1000, 2000]
    assert maps[0]["original_start_ms"] == 2000 and maps[0]["original_end_ms"] == 3000
    # end<=start repaired to start + actual duration (concatenation.py:188-190)
    assert maps[1]["original_end_ms"] == 5500
    # layout: w1 | 500ms zeros | w2, no trailing silence
    assert len(combined) == sr + sr // 2 + sr // 2
    assert np.all(combined[:sr] == 1.0)
    assert np.all(combined[sr : sr + sr // 2] == 0.0)
    assert np.all(combined[sr + sr // 2 :] == -1.0)
    assert concat_segments([], [], sr)[1] == []

    # timestamp translation (timestamp_mapper.py:75-103)
    spans = translate_to_original(maps, 500, 1700)
    # overlaps seg0 [500,1000) -> orig [2500,3000); seg1 [1500,1700) -> [5000,5200)
    assert spans == [
        {"original_start_ms": 2500, "original_end_ms": 3000, "duration_ms": 500},
        {"original_start_ms": 5000, "original_end_ms": 5200, "duration_ms": 200},
    ]
    assert translate_to_original(maps, 1000, 1500) == []  # pure-silence span


def test_concat_vad_segments_spark(spark):
    """Fused VAD(nested)+concat operator matches the kernels composed by
    hand, and the Column-expr span translation matches the python replica."""
    import hashlib

    import numpy as np

    from curator_spark.kernels.audio import (
        concat_segments,
        encode_wav_pcm16,
        energy_vad_segments,
        translate_to_original,
    )
    from curator_spark.operators.multimodal import concat_vad_segments, translate_concat_spans

    sr = 16000

    def tone(sec, f=440, amp=0.5):
        tt = np.arange(int(sr * sec)) / sr
        return amp * np.sin(2 * np.pi * f * tt)

    sil = lambda sec: np.zeros(int(sr * sec))  # noqa: E731
    clip = np.concatenate([sil(1), tone(3), sil(2), tone(2.5), sil(1)]).astype(np.float32)
    df = spark.createDataFrame(
        [
            ("two", bytearray(encode_wav_pcm16(clip, sr)), "pcm_s16le"),
            ("silent", bytearray(encode_wav_pcm16(sil(3).astype(np.float32), sr)), "pcm_s16le"),
            ("bad", bytearray(b"x"), "pcm_s16le"),
        ],
        "clip_id string, bytes binary, codec string",
    )
    out = concat_vad_segments(df, silence_duration_sec=0.5)
    rows = {r["clip_id"]: r for r in out.collect()}
    assert set(rows) == {"two"}  # silent + undecodable emit no row
    r = rows["two"]
    # replicate with the kernels directly
    segs = energy_vad_segments(clip, sr)
    waves = [clip[int(s * sr / 1000) : int(e * sr / 1000)] for s, e in segs]
    combined, maps = concat_segments(waves, segs, sr, 0.5)
    assert r["num_segments"] == len(maps) == 2
    assert r["total_duration_ms"] == maps[-1]["concat_end_ms"]
    q = np.round(np.clip(combined, -1, 1) * 32767).astype("<i2")
    assert r["pcm_hash"] == hashlib.md5(str(sr).encode() + q.tobytes()).hexdigest()
    got_maps = [m.asDict() for m in r["mappings"]]
    assert got_maps == maps

    # Column-expr translation == python replica, spanning both segments
    span_lo, span_hi = 100, maps[-1]["concat_end_ms"] - 100
    spans = (
        out.where(F.col("clip_id") == "two")
        .select(translate_concat_spans(F.col("mappings"), span_lo, span_hi).alias("s"))
        .collect()[0]["s"]
    )
    assert [x.asDict() for x in spans] == translate_to_original(maps, span_lo, span_hi)
