"""Speaker-separation post-processing: hand-traced timeline semantics
(reference speaker_separation_module/speaker_sep.py:149-447) and the
Spark operator / injectable-diarizer seam."""

from __future__ import annotations

import numpy as np
import pytest

from curator_spark.kernels.diarization import (
    clean_cut_overlaps,
    exclude_overlaps,
    merge_adjacent,
    postprocess_speaker_segments,
)


class TestCleanCut:
    def test_overlap_goes_to_newest_speaker(self):
        # A [0,10], B [4,6]: A is cut at 4, B keeps [4,6], A resumes [6,10]
        out = clean_cut_overlaps({"A": [(0.0, 10.0)], "B": [(4.0, 6.0)]})
        assert out == {"A": [(0.0, 4.0), (6.0, 10.0)], "B": [(4.0, 6.0)]}

    def test_disjoint_untouched(self):
        segs = {"A": [(0.0, 2.0)], "B": [(3.0, 5.0)]}
        assert clean_cut_overlaps(segs) == segs

    def test_identical_spans_drop_one_zero_width(self):
        out = clean_cut_overlaps({"A": [(0.0, 5.0)], "B": [(0.0, 5.0)]})
        # newest start cuts the first at t=0 (zero-length, dropped); the
        # survivor keeps the whole span
        total = sum(len(v) for v in out.values())
        assert total == 1

    def test_three_speaker_chain(self):
        out = clean_cut_overlaps(
            {"A": [(0.0, 10.0)], "B": [(2.0, 8.0)], "C": [(4.0, 6.0)]}
        )
        # hand trace of the REFERENCE algorithm (speaker_sep.py:170-181):
        # when C ends at 6 it restarts EVERY still-active speaker, so both
        # A and B resume at 6 — the region [6,8] is deliberately assigned
        # to both (the reference keeps no precedence among survivors)
        assert out["A"] == [(0.0, 2.0), (6.0, 10.0)]
        assert out["B"] == [(2.0, 4.0), (6.0, 8.0)]
        assert out["C"] == [(4.0, 6.0)]

    def test_two_speakers_always_disjoint(self):
        # with at most two concurrent speakers an end event leaves at most
        # one survivor, so the restart rule cannot double-assign — outputs
        # are pairwise disjoint across speakers
        rng = np.random.RandomState(5)
        for _ in range(20):
            segs = {
                f"s{k}": merge_adjacent(
                    [
                        (float(s), float(s + rng.uniform(0.5, 5)))
                        for s in rng.uniform(0, 50, 5)
                    ],
                    gap_threshold=0.0,
                )
                for k in range(2)
            }
            out = clean_cut_overlaps(segs)
            flat = [iv for sp in out.values() for iv in sp]
            flat.sort()
            for (s1, e1), (s2, e2) in zip(flat, flat[1:]):
                assert e1 <= s2 + 1e-9  # pairwise disjoint across speakers


class TestExclude:
    def test_overlap_region_dropped_with_buffer(self):
        out = exclude_overlaps(
            {"A": [(0.0, 10.0)], "B": [(4.0, 6.0)]}, buffer_time=0.5
        )
        # A solo [0, 4-0.5]; overlap [4,6] gone; A solo resumes [6+0.5, 10]
        assert out["A"] == [(0.0, 3.5), (6.5, 10.0)]
        assert out["B"] == []

    def test_solo_only_untouched(self):
        out = exclude_overlaps({"A": [(1.0, 4.0)]}, buffer_time=0.5)
        assert out == {"A": [(1.0, 4.0)]}

    def test_empty(self):
        assert exclude_overlaps({}) == {}


class TestMergeAndChain:
    def test_merge_adjacent(self):
        assert merge_adjacent([(0.0, 1.0), (1.05, 2.0), (5.0, 6.0)], 0.1) == [
            (0.0, 2.0),
            (5.0, 6.0),
        ]
        assert merge_adjacent([], 0.1) == []
        # overlapping inputs merge too (gap negative)
        assert merge_adjacent([(0.0, 3.0), (2.0, 4.0)], 0.0) == [(0.0, 4.0)]

    def test_full_chain_order(self):
        # clean-cut: A [(0,4),(6,9.8),(9.9,10)], B [(4,6)], C [(9.8,9.9)];
        # merge (gap 0.1) glues A's tail back: [(0,4),(6,10)];
        # min_duration 2.0 drops C's sliver
        segs = {"A": [(0.0, 10.0)], "B": [(4.0, 6.0)], "C": [(9.8, 9.9)]}
        out = postprocess_speaker_segments(
            segs, exclude=False, gap_threshold=0.1, min_duration=2.0
        )
        assert out["A"] == [(0.0, 4.0), (6.0, 10.0)]
        assert out["B"] == [(4.0, 6.0)]
        assert out["C"] == []  # 0.1 s sliver dropped

    def test_min_duration_zero_keeps_all(self):
        segs = {"A": [(0.0, 0.5)]}
        out = postprocess_speaker_segments(segs, min_duration=0.0)
        assert out["A"] == [(0.0, 0.5)]


@pytest.mark.slow
class TestSpeakerSpark:
    def test_postprocess_operator_matches_kernel(self, spark):
        rng = np.random.RandomState(13)
        rows = []
        for c in range(6):
            for k in range(12):
                s = float(rng.uniform(0, 60))
                rows.append(
                    (f"c{c}", f"spk_{int(rng.randint(0, 3))}", s,
                     s + float(rng.uniform(0.5, 8.0)))
                )
        df = spark.createDataFrame(
            rows, "clip_id string, speaker string, start double, end double"
        )
        from curator_spark.operators.multimodal import speaker_segment_postprocess

        got = speaker_segment_postprocess(
            df, exclude_overlaps=True, buffer_time=0.3, min_duration=1.0
        ).collect()
        by_clip: dict = {}
        for cid, spk, s, e in rows:
            by_clip.setdefault(cid, {}).setdefault(spk, []).append((s, e))
        expected = []
        for cid in by_clip:
            out = postprocess_speaker_segments(
                by_clip[cid], exclude=True, buffer_time=0.3,
                gap_threshold=0.1, min_duration=1.0,
            )
            for spk in sorted(out):
                expected.extend((cid, spk, s, e) for s, e in out[spk])
        got_set = {(r.clip_id, r.speaker, round(r.start, 9), round(r.end, 9)) for r in got}
        exp_set = {(c, sp, round(s, 9), round(e, 9)) for c, sp, s, e in expected}
        assert got_set == exp_set and exp_set

    def test_injectable_diarizer(self, spark):
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.multimodal import speaker_separation

        clips = generate_clips(spark, 8, seed=4)

        def fake_diarizer(samples, sr):
            dur = len(samples) / sr
            return {"spk_a": [(0.0, dur * 0.6)], "spk_b": [(dur * 0.5, dur)]}

        out = speaker_separation(
            clips, diarizer=fake_diarizer, min_duration=0.0, buffer_time=0.0
        ).collect()
        assert out and all(r.end > r.start for r in out)
        # clean-cut default: per clip, segments pairwise disjoint
        by_clip: dict = {}
        for r in out:
            by_clip.setdefault(r.clip_id, []).append((r.start, r.end))
        for segs in by_clip.values():
            segs.sort()
            for (s1, e1), (s2, e2) in zip(segs, segs[1:]):
                assert e1 <= s2 + 1e-9

        with pytest.raises(NotImplementedError):
            speaker_separation(clips, diarizer=None)


@pytest.mark.slow
class TestAudioScoreFilter:
    def test_score_attach_and_threshold(self, spark):
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.multimodal import audio_score_filter

        clips = generate_clips(spark, 12, seed=6)

        def rms_scorer(samples, sr):
            assert sr == 16000  # clips are already 16 kHz; no resample
            return float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))

        scored = audio_score_filter(
            clips, scorer=rms_scorer, threshold=None, score_field="mos"
        ).collect()
        assert len(scored) == 12 and all(r.mos is not None for r in scored)
        med = sorted(r.mos for r in scored)[6]
        kept = {r.clip_id for r in audio_score_filter(
            clips, scorer=rms_scorer, threshold=med, score_field="mos"
        ).collect()}
        below = {r.clip_id for r in audio_score_filter(
            clips, scorer=rms_scorer, threshold=med, keep_above=False, score_field="mos"
        ).collect()}
        # the two gates partition the corpus, overlapping exactly on ties
        # (the clips fixture plants byte-identical duplicates -> tied RMS)
        assert kept | below == {r.clip_id for r in scored}
        assert kept & below == {r.clip_id for r in scored if r.mos == med}
        assert kept and below

    def test_resample_before_scoring(self, spark):
        from curator_spark.kernels.audio import encode_wav_pcm16
        from curator_spark.operators.multimodal import audio_score_filter

        wav = encode_wav_pcm16(np.ones(8000, np.float32) * 0.5, 8000)
        df = spark.createDataFrame(
            [("c0", wav, "pcm_s16le")], "clip_id string, bytes binary, codec string"
        )
        seen = []

        def probe(samples, sr):
            return float(sr) + len(samples) / 1e9

        row = audio_score_filter(df, scorer=probe, threshold=None).collect()[0]
        assert int(row.score) == 16000  # resampled to the model rate

    def test_stub_without_scorer(self, spark):
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.multimodal import audio_score_filter

        with pytest.raises(NotImplementedError):
            audio_score_filter(generate_clips(spark, 2, seed=6), scorer=None)


class TestAlignWordsKernel:
    def test_reference_docstring_example(self):
        from curator_spark.kernels.diarization import align_words_to_segments

        al = [{"word": "Hello", "start": 0.0, "end": 1.0},
              {"word": "there", "start": 1.0, "end": 3.0}]
        segs = [{"speaker": "speaker1", "start": 0.0, "end": 3.0}]
        out = align_words_to_segments(al, segs)
        assert out[0]["text"] == "Hello there"
        assert out[0]["words"] == al

    def test_straddler_gap_and_tail(self):
        from curator_spark.kernels.diarization import align_words_to_segments

        al = [
            {"word": "a", "start": 0.0, "end": 1.0},
            {"word": "gap", "start": 3.2, "end": 3.8},   # between segments
            {"word": "strad", "start": 5.5, "end": 6.5},  # 0.5 in s2, 0.3 in s3
            {"word": "tail", "start": 9.0, "end": 9.5},   # past the last segment
        ]
        segs = [
            {"speaker": "s1", "start": 0.0, "end": 3.0},
            {"speaker": "s2", "start": 4.0, "end": 6.0},
            {"speaker": "s3", "start": 6.2, "end": 8.0},
        ]
        out = align_words_to_segments(al, segs)
        assert [s["text"] for s in out] == ["a", "strad", ""]

    def test_straddler_prefers_next_on_bigger_overlap(self):
        from curator_spark.kernels.diarization import align_words_to_segments

        al = [{"word": "w", "start": 5.9, "end": 7.0}]  # 0.1 in s1, 0.8 in s2
        segs = [
            {"speaker": "s1", "start": 4.0, "end": 6.0},
            {"speaker": "s2", "start": 6.2, "end": 8.0},
        ]
        out = align_words_to_segments(al, segs)
        assert out[0]["text"] == "" and out[1]["text"] == "w"

    def test_inputs_not_mutated(self):
        from curator_spark.kernels.diarization import align_words_to_segments

        segs = [{"speaker": "s1", "start": 0.0, "end": 3.0}]
        align_words_to_segments([], segs)
        assert "text" not in segs[0]


@pytest.mark.slow
class TestMergeAlignmentSpark:
    def test_cogroup_matches_kernel(self, spark):
        from curator_spark.kernels.diarization import align_words_to_segments
        from curator_spark.operators.multimodal import merge_alignment_diarization

        rng = np.random.RandomState(21)
        wrows, srows = [], []
        for c in range(5):
            t = 0.0
            for k in range(30):
                dur = float(rng.uniform(0.1, 0.6))
                wrows.append((f"a{c}", f"w{k}", t, t + dur))
                t += dur + float(rng.uniform(0.0, 0.3))
            t = 0.0
            for k in range(6):
                dur = float(rng.uniform(1.0, 4.0))
                srows.append((f"a{c}", f"spk_{k % 2}", t, t + dur))
                t += dur + float(rng.uniform(0.0, 1.0))
        words = spark.createDataFrame(wrows, "audio_id string, word string, start double, end double")
        segs = spark.createDataFrame(srows, "audio_id string, speaker string, start double, end double")
        got = merge_alignment_diarization(words, segs).collect()

        for c in range(5):
            al = [{"word": w, "start": s, "end": e} for a, w, s, e in wrows if a == f"a{c}"]
            sg = [{"speaker": sp, "start": s, "end": e} for a, sp, s, e in srows if a == f"a{c}"]
            exp = align_words_to_segments(al, sg)
            rows = sorted((r for r in got if r.audio_id == f"a{c}"), key=lambda r: r.seg_idx)
            assert [r.text for r in rows] == [s["text"] for s in exp]
            assert [len(r.words) for r in rows] == [len(s["words"]) for s in exp]

    def test_segments_without_words_survive(self, spark):
        from curator_spark.operators.multimodal import merge_alignment_diarization

        words = spark.createDataFrame([], "audio_id string, word string, start double, end double")
        segs = spark.createDataFrame(
            [("a0", "s1", 0.0, 2.0)], "audio_id string, speaker string, start double, end double"
        )
        out = merge_alignment_diarization(words, segs).collect()
        assert len(out) == 1 and out[0].text == "" and out[0].words == []


@pytest.mark.slow
class TestNonSpeakerGaps:
    def test_gaps_and_chunking(self, spark):
        from curator_spark.operators.multimodal import add_non_speaker_segments

        segs = spark.createDataFrame(
            [("a", "s1", 2.0, 5.0), ("a", "s2", 7.0, 9.0), ("b", "s1", 0.0, 4.0)],
            "audio_id string, speaker string, start double, end double",
        )
        durs = spark.createDataFrame(
            [("a", 12.0), ("b", 4.0)], "audio_id string, duration_sec double"
        )
        rows = [(r.audio_id, r.speaker, r.start, r.end)
                for r in add_non_speaker_segments(segs, durs).collect()]
        assert rows == [
            ("a", "no-speaker", 0.0, 2.0), ("a", "s1", 2.0, 5.0),
            ("a", "no-speaker", 5.0, 7.0), ("a", "s2", 7.0, 9.0),
            ("a", "no-speaker", 9.0, 12.0), ("b", "s1", 0.0, 4.0),
        ]
        # chunked: silence split at 1.5 s, speaker spans untouched
        chunked = [(r.speaker, r.start, r.end)
                   for r in add_non_speaker_segments(segs, durs, max_length=1.5)
                   .where("audio_id = 'a'").collect()]
        assert ("s1", 2.0, 5.0) in chunked and ("s2", 7.0, 9.0) in chunked
        silence = [(s, e) for sp, s, e in chunked if sp == "no-speaker"]
        assert all(e - s <= 1.5 + 1e-9 for s, e in silence)
        assert (0.0, 1.5) in silence and (10.5, 12.0) in silence

    def test_overlapping_segments_use_prev_end_not_max(self, spark):
        from curator_spark.operators.multimodal import add_non_speaker_segments

        # reference tracks the PREVIOUS segment's end, not the running max:
        # s2 inside s1 makes prev_end=4.0 for s3, so a [4,6] gap appears
        # even though s1 covers to 8
        segs = spark.createDataFrame(
            [("a", "s1", 0.0, 8.0), ("a", "s2", 1.0, 4.0), ("a", "s3", 6.0, 10.0)],
            "audio_id string, speaker string, start double, end double",
        )
        durs = spark.createDataFrame([("a", 10.0)], "audio_id string, duration_sec double")
        rows = [(r.speaker, r.start, r.end)
                for r in add_non_speaker_segments(segs, durs).collect()]
        assert ("no-speaker", 4.0, 6.0) in rows


@pytest.mark.slow
class TestAudioDataFilterPipeline:
    def test_vad_combo_with_scorers(self, spark):
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.multimodal import audio_data_filter_pipeline

        clips = generate_clips(spark, 16, seed=8)

        def rms(samples, sr):
            return float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))

        # no scorers: plain VAD segments in original timeline
        base = audio_data_filter_pipeline(
            clips, enable_vad=True, output_sample_rate=16000,
            vad_min_duration_sec=0.2, vad_min_interval_ms=100,
        ).collect()
        assert base and all(r.end > r.start for r in base)
        assert set(r.clip_id for r in base) <= {f"clip{i:012d}" for i in range(16)}

        # one scorer with threshold=None keeps everything but attaches scores
        scored = audio_data_filter_pipeline(
            clips, enable_vad=True, output_sample_rate=16000,
            vad_min_duration_sec=0.2, vad_min_interval_ms=100,
            scorers={"rms": (rms, None, True)},
        ).collect()
        assert len(scored) == len(base)
        assert all(r.rms is not None and r.rms > 0 for r in scored)

        # a real threshold drops the quiet tail
        med = sorted(r.rms for r in scored)[len(scored) // 2]
        kept = audio_data_filter_pipeline(
            clips, enable_vad=True, output_sample_rate=16000,
            vad_min_duration_sec=0.2, vad_min_interval_ms=100,
            scorers={"rms": (rms, med, True)},
        ).collect()
        assert 0 < len(kept) <= len(scored)
        assert all(r.rms >= med for r in kept)

    def test_whole_clip_combo_and_speaker_combo(self, spark):
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.multimodal import audio_data_filter_pipeline

        clips = generate_clips(spark, 6, seed=8)
        whole = audio_data_filter_pipeline(clips, enable_vad=False).collect()
        assert len(whole) == 6 and all(r.start == 0.0 for r in whole)

        def diar(samples, sr):
            dur = len(samples) / sr
            return {"spk_a": [(0.0, dur / 2)], "spk_b": [(dur / 2, dur)]}

        spk = audio_data_filter_pipeline(
            clips, diarizer=diar, speaker_min_duration=0.0
        ).collect()
        assert spk and {r.speaker for r in spk} == {"spk_a", "spk_b"}


@pytest.mark.slow
class TestImageFeatures:
    def test_stub_and_injectable_decoder(self, spark):
        from curator_spark.operators.multimodal import image_features

        # raw "images": 4x3 grayscale ramps serialized as plain bytes
        rows = [(f"img{i}", bytes(range(i, i + 12)), "raw4x3") for i in range(5)]
        df = spark.createDataFrame(rows, "image_id string, bytes binary, format string")

        # no decoder: every row degrades to the honest STUB error
        stubbed = image_features(df).collect()
        assert all(r.decode_error and "STUB" in r.decode_error for r in stubbed)
        assert len(stubbed) == 5

        def decoder(raw, fmt):
            assert fmt == "raw4x3"
            return np.frombuffer(raw, dtype=np.uint8).reshape(4, 3)

        ok = {r.image_id: r for r in image_features(df, decoder=decoder).collect()}
        assert all(r.decode_error is None for r in ok.values())
        r0 = ok["img0"]
        assert (r0.width, r0.height, r0.n_channels) == (3, 4, 1)
        assert r0.mean_luma_micro == round(np.arange(12).mean() / 255.0 * 1e6)
        # content hash distinguishes the ramps
        assert len({r.content_hash for r in ok.values()}) == 5

        def broken(raw, fmt):
            raise ValueError("corrupt")

        bad = image_features(df, decoder=broken).collect()
        assert all("corrupt" in r.decode_error for r in bad)
