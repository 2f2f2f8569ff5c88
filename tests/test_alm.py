"""ALM window builder + overlap filter: kernel semantics, greedy
invariants, and Spark==kernel group equality.

Reference semantics under test: ``stages/audio/alm/alm_data_builder.py``
(greedy speaker-diverse window growth, word-level truncation, loss
stats) and ``alm_data_overlap.py`` (greedy overlap pruning keeping the
window closer to target duration).
"""

from __future__ import annotations

import numpy as np
import pytest

from curator_spark.kernels.alm import (
    build_alm_windows,
    filter_window_overlaps,
    overlap_ratio,
)


def seg(start, end, speaker="spk_a", bandwidth=10000, words=None, text=None):
    n = max(2, int((end - start) / 2))
    if words is None:
        bounds = np.linspace(start, end, n + 1)
        words = [
            {"word": f"w{k}", "start": float(bounds[k]), "end": float(bounds[k + 1])}
            for k in range(n)
        ]
    return {
        "start": float(start),
        "end": float(end),
        "speaker": speaker,
        "bandwidth": bandwidth,
        "text": text if text is not None else " ".join(w["word"] for w in words),
        "words": words,
    }


CFG = dict(target_window_duration=30.0, tolerance=0.2, min_bandwidth=8000,
           min_sample_rate=16000, min_speakers=2, max_speakers=3)


class TestBuilderKernel:
    def test_low_sample_rate_loses_everything(self):
        segs = [seg(0, 10), seg(10, 20, "spk_b")]
        windows, stats, tr = build_alm_windows(segs, 8000, **CFG)
        assert windows == [] and tr == 0
        assert stats["lost_sr"] == 2
        assert stats["dur_lost_sr"] == pytest.approx(20.0)
        assert stats["total_segments"] == 2

    def test_accepts_two_speaker_window_in_band(self):
        # 24..36 s is the accept band for target 30 / tol 0.2
        segs = [seg(0, 14, "spk_a"), seg(14, 28, "spk_b")]
        windows, stats, _ = build_alm_windows(segs, 16000, **CFG)
        assert len(windows) == 1
        w = windows[0]
        assert [s["start"] for s in w["segments"]] == [0.0, 14.0]
        assert w["speaker_durations"] == pytest.approx([14.0, 14.0, 0.0, 0.0, 0.0])
        # second start index yields a 14 s window -> too short -> lost_win
        assert stats["lost_win"] == 1
        # appended segments must not carry word payloads
        assert all("words" not in s for s in w["segments"])

    def test_low_bandwidth_start_is_lost_bw(self):
        segs = [seg(0, 14, bandwidth=4000), seg(14, 28, "spk_b")]
        _, stats, _ = build_alm_windows(segs, 16000, **CFG)
        assert stats["lost_bw"] == 1
        assert stats["dur_lost_bw"] == pytest.approx(14.0)

    def test_scan_breaks_at_low_bandwidth_segment(self):
        # third segment low-bw: scan from 0 stops before it -> 20 s window
        # (below 24 s floor) -> lost_win attributed to next_seg bandwidth
        segs = [seg(0, 10, "spk_a"), seg(10, 20, "spk_b"),
                seg(20, 30, "spk_a", bandwidth=5000), seg(30, 44, "spk_b")]
        _, stats, _ = build_alm_windows(segs, 16000, **CFG)
        assert stats["lost_win"] >= 1
        assert stats["lost_next_seg_bm"] >= 1

    def test_no_speaker_label_blocks_window(self):
        segs = [seg(0, 14, "spk_a"), seg(14, 27, "no-speaker"), seg(27, 40, "spk_b")]
        windows, stats, _ = build_alm_windows(segs, 16000, **CFG)
        # scan from 0 stops at the no-speaker segment: 14 s window rejected
        assert all(w["segments"][0]["start"] != 0.0 for w in windows)
        assert stats["lost_no_spkr"] >= 1

    def test_explicit_none_speaker_is_not_no_speaker_loss(self):
        """Reference parity: next_segment.get("speaker", "no-speaker")
        treats only a MISSING key or the literal "no-speaker" as
        no-speaker; an explicit None (or "") value falls through to the
        bandwidth attribution."""
        for bad_speaker in (None, ""):
            segs = [seg(0, 14, "spk_a"),
                    seg(14, 27, bad_speaker, bandwidth=4000),
                    seg(27, 41, "spk_b")]
            _, stats, _ = build_alm_windows(segs, 16000, **CFG)
            assert stats["lost_no_spkr"] == 0
            assert stats["lost_next_seg_bm"] >= 1
        # and a truly MISSING key still attributes to no-speaker: the
        # short scan ends ON the keyless segment (20 s < 24 s floor)
        s2 = seg(10, 20)
        del s2["speaker"]
        segs = [seg(0, 10, "spk_a"), s2]
        _, stats, _ = build_alm_windows(segs, 16000, **CFG)
        assert stats["lost_no_spkr"] >= 1

    def test_speaker_budget_overflow_breaks_scan(self):
        segs = [seg(i * 10, i * 10 + 10, s) for i, s in
                enumerate(["spk_a", "spk_b", "spk_c", "spk_d"])]
        windows, _, _ = build_alm_windows(segs, 16000, **CFG)  # max 3 speakers
        for w in windows:
            assert len({s["speaker"] for s in w["segments"]}) <= 3

    def test_single_speaker_window_rejected(self):
        segs = [seg(0, 14, "spk_a"), seg(14, 28, "spk_a")]
        windows, stats, _ = build_alm_windows(segs, 16000, **CFG)
        assert windows == []
        assert stats["lost_spk"] == 1

    def test_truncation_cuts_at_word_boundary(self):
        # second segment runs past the 36 s ceiling; words are 2 s each so
        # the cut lands on the last word ending <= 36
        words = [{"word": f"w{k}", "start": 20.0 + 2 * k, "end": 22.0 + 2 * k}
                 for k in range(15)]  # 20..50
        segs = [seg(0, 20, "spk_a"), seg(20, 50, "spk_b", words=words)]
        windows, _, tr = build_alm_windows(segs, 16000, **CFG)
        assert tr == 1
        assert len(windows) == 1
        part = windows[0]["segments"][-1]
        assert part["end"] == pytest.approx(36.0)
        assert part["text"].split() == [f"w{k}" for k in range(8)]

    def test_truncation_disabled_breaks_instead(self):
        words = [{"word": f"w{k}", "start": 20.0 + 2 * k, "end": 22.0 + 2 * k}
                 for k in range(15)]
        segs = [seg(0, 20, "spk_a"), seg(20, 50, "spk_b", words=words)]
        windows, _, tr = build_alm_windows(segs, 16000, truncation=False, **CFG)
        assert tr == 0 and windows == []  # 20 s window -> below floor

    def test_overlapping_windows_from_consecutive_starts(self):
        # four 8 s segments alternating speakers: starts 0 and 1 both give
        # in-band windows that overlap — the raw builder keeps both
        segs = [seg(i * 8, i * 8 + 8, "spk_a" if i % 2 == 0 else "spk_b")
                for i in range(5)]
        windows, _, _ = build_alm_windows(segs, 16000, **CFG)
        assert len(windows) >= 2


class TestOverlapKernel:
    def test_ratio_uses_smaller_span(self):
        assert overlap_ratio(0, 10, 5, 7) == pytest.approx(1.0)  # contained
        assert overlap_ratio(0, 10, 5, 15) == pytest.approx(0.5)
        assert overlap_ratio(0, 10, 10, 20) == 0.0
        assert overlap_ratio(0, 0, 0, 10) == 0.0  # zero-width guard

    def test_keeps_closer_to_target(self):
        spans = [(0.0, 30.0), (0.0, 25.0)]  # heavy overlap
        kept = filter_window_overlaps(spans, 0.5, target_duration=30.0)
        assert kept == [0]
        kept = filter_window_overlaps(spans, 0.5, target_duration=24.0)
        assert kept == [1]

    def test_tie_keeps_longer_then_earlier(self):
        # equal distance from target 27.5: 25 vs 30 -> longer (30) wins
        kept = filter_window_overlaps([(0.0, 25.0), (0.0, 30.0)], 0.5, 27.5)
        assert kept == [1]
        # identical spans: earlier-in-sort-order wins
        kept = filter_window_overlaps([(0.0, 30.0), (0.0, 30.0)], 0.5, 30.0)
        assert len(kept) == 1

    def test_disjoint_spans_untouched(self):
        spans = [(0.0, 10.0), (20.0, 30.0), (40.0, 55.0)]
        assert filter_window_overlaps(spans, 0.0, 30.0) == [0, 1, 2]

    def test_threshold_one_only_removes_containment(self):
        spans = [(0.0, 30.0), (25.0, 60.0), (5.0, 10.0)]
        kept = filter_window_overlaps(spans, 1.0, 30.0)
        # (5,10) is fully inside (0,30) -> one of them goes (the 30 s one
        # matches target exactly, so (5,10) is removed); partial overlap stays
        assert kept == [0, 1]

    def test_greedy_invariant_no_kept_pair_conflicts(self):
        rng = np.random.RandomState(7)
        for trial in range(50):
            spans = []
            for _ in range(30):
                s = float(rng.uniform(0, 200))
                spans.append((s, s + float(rng.uniform(1, 40))))
            thr = float(rng.choice([0.0, 0.25, 0.5, 0.9]))
            kept = filter_window_overlaps(spans, thr, target_duration=25.0)
            ks = [spans[i] for i in kept]
            # kept spans come back in (start, end) order
            assert ks == sorted(ks)
            for a in range(len(ks)):
                for b in range(a + 1, len(ks)):
                    r = overlap_ratio(*ks[a], *ks[b])
                    if ks[b][0] < ks[a][1]:  # pairs the greedy scan compares
                        assert r < thr or (thr == 0.0 and r == 0.0)


@pytest.mark.slow
class TestAlmSpark:
    def _segments(self, spark):
        from curator_spark.datagen import generate_alm_segments

        return generate_alm_segments(spark, 14, seed=3)

    def _kernel_windows(self, pdf_all, **cfg):
        out = {}
        for aid, pdf in pdf_all.groupby("audio_id"):
            pdf = pdf.sort_values("seg_idx")
            segs = [
                {
                    "start": r.start, "end": r.end, "speaker": r.speaker,
                    "bandwidth": int(r.bandwidth), "text": r.text,
                    "words": [dict(w) for w in r.words] if r.words is not None else None,
                }
                for r in pdf.itertuples(index=False)
            ]
            sr = int(pdf["sample_rate"].iloc[0])
            out[aid] = build_alm_windows(segs, sr, **cfg)
        return out

    def test_spark_windows_match_kernel(self, spark):
        from curator_spark.operators.alm import build_windows

        segments = self._segments(spark)
        cfg = dict(target_window_duration=30.0, tolerance=0.2, min_speakers=2,
                   max_speakers=4)
        got = {
            (r["audio_id"], r["window_idx"]): r
            for r in build_windows(segments, **cfg).collect()
        }
        expected = self._kernel_windows(segments.toPandas(), **cfg)
        n_expected = sum(len(w) for w, _, _ in expected.values())
        assert len(got) == n_expected and n_expected > 0
        for aid, (windows, _, _) in expected.items():
            for i, w in enumerate(windows):
                row = got[(aid, i)]
                assert row["window_start"] == pytest.approx(w["segments"][0]["start"])
                assert row["window_end"] == pytest.approx(w["segments"][-1]["end"])
                assert row["num_segments"] == len(w["segments"])
                assert list(row["speaker_durations"]) == pytest.approx(w["speaker_durations"])
                assert row["seg_texts"] == [s["text"] for s in w["segments"]]

    def test_spark_stats_match_kernel(self, spark):
        from curator_spark.kernels.alm import STAT_FIELDS
        from curator_spark.operators.alm import builder_stats

        segments = self._segments(spark)
        cfg = dict(target_window_duration=30.0, tolerance=0.2, min_speakers=2,
                   max_speakers=4)
        got = {r["audio_id"]: r for r in builder_stats(segments, **cfg).collect()}
        expected = self._kernel_windows(segments.toPandas(), **cfg)
        assert set(got) == set(expected)
        for aid, (_, stats, tr) in expected.items():
            for f in STAT_FIELDS:
                assert got[aid][f] == pytest.approx(stats[f]), (aid, f)
            assert got[aid]["truncation_events"] == tr
        # the 8 kHz file (i % 13 == 12) must lose everything to lost_sr
        low_sr = [a for a, (_, s, _) in expected.items() if s["lost_sr"] > 0]
        assert low_sr, "fixture no longer plants an 8 kHz file"

    def test_spark_overlap_filter_matches_kernel(self, spark):
        from curator_spark.operators.alm import (
            build_windows,
            filtered_duration,
            overlap_filter,
        )

        segments = self._segments(spark)
        windows = build_windows(
            segments, target_window_duration=30.0, tolerance=0.2,
            min_speakers=2, max_speakers=4,
        ).localCheckpoint()
        kept = overlap_filter(windows, overlap_percentage=0, target_duration=30.0)
        got = kept.toPandas()
        pdf = windows.toPandas()
        n_expected = 0
        for aid, g in pdf.groupby("audio_id"):
            spans = list(zip(g["window_start"], g["window_end"]))
            idx = filter_window_overlaps(spans, 0.0, 30.0)
            n_expected += len(idx)
            sub = got[got["audio_id"] == aid]
            assert sorted(sub["window_idx"]) == sorted(
                int(g.iloc[i]["window_idx"]) for i in idx
            ), aid
        assert len(got) == n_expected
        # pass-through schema and the aggregate helper agree with pandas
        assert list(got.columns) == list(pdf.columns)
        dur = {r["audio_id"]: r["filtered_dur"] for r in filtered_duration(kept).collect()}
        for aid, g in got.groupby("audio_id"):
            assert dur[aid] == pytest.approx(float((g["window_end"] - g["window_start"]).sum()))

    def test_overlap_filter_validates_params(self, spark):
        from curator_spark.operators.alm import overlap_filter

        df = spark.createDataFrame(
            [("a", 0, 0.0, 1.0)], "audio_id string, window_idx int, window_start double, window_end double"
        )
        with pytest.raises(ValueError):
            overlap_filter(df, overlap_percentage=101)
        with pytest.raises(ValueError):
            overlap_filter(df, target_duration=0.0)


class TestSnippetKernel:
    def test_gap_and_duration_splits(self):
        from curator_spark.kernels.alm import plan_snippets

        segs = [
            {"start": 0.0, "end": 5.0, "text": "a"},
            {"start": 6.0, "end": 12.0, "text": "b"},    # gap 1 -> same snippet
            {"start": 50.0, "end": 55.0, "text": "c"},   # gap 38 -> new snippet
            {"start": 56.0, "end": 295.0, "text": "d"},  # span from 50 would be 245 > max
        ]
        out, drops = plan_snippets(segs, max_duration_sec=240.0,
                                   min_duration_sec=1.0, max_segment_gap_sec=30.0)
        spans = [(s["start"], s["end"]) for s in out]
        assert spans == [(0.0, 12.0), (50.0, 55.0), (56.0, 295.0)]
        assert drops == {"too_long": 0, "too_short": 0, "no_text": 0}

    def test_drop_reasons(self):
        from curator_spark.kernels.alm import plan_snippets

        segs = [
            {"start": 0.0, "end": 700.0, "text": "long"},   # single too-long seg
            {"start": 800.0, "end": 800.2, "text": "tiny"}, # too short
            {"start": 900.0, "end": 910.0, "text": "  "},   # no text
            {"start": 950.0, "end": 960.0, "text": "ok"},
        ]
        out, drops = plan_snippets(segs, 600.0, 0.5, 30.0)
        assert [(s["start"], s["end"]) for s in out] == [(950.0, 960.0)]
        assert drops == {"too_long": 1, "too_short": 1, "no_text": 1}

    def test_empty_input(self):
        from curator_spark.kernels.alm import plan_snippets

        out, drops = plan_snippets([], 600.0, 0.5, 30.0)
        assert out == [] and drops == {"too_long": 0, "too_short": 0, "no_text": 0}

    def test_relativize_clamps_jitter(self):
        from curator_spark.kernels.alm import relativize_segments

        segs = [{
            "start": 9.99, "end": 20.0, "text": "x",
            "words": [{"word": "w", "start": 9.98, "end": 20.02}],
        }]
        rel = relativize_segments(segs, 10.0, 20.0)
        assert rel[0]["start"] == 0.0  # clamped up from -0.01
        assert rel[0]["end"] == 10.0
        w = rel[0]["words"][0]
        assert w["start"] == 0.0 and w["end"] == 10.0  # clamped both ends
        # input untouched (shallow copies)
        assert segs[0]["start"] == 9.99

    def test_max_ngram_count(self):
        from curator_spark.kernels.alm import max_ngram_count

        assert max_ngram_count("a b c a b c a b c".split(), 3) == 3
        assert max_ngram_count(["x", "y"], 3) == 0
        assert max_ngram_count([], 1) == 0
        assert max_ngram_count(["x", "x", "x"], 1) == 3
        with pytest.raises(ValueError):
            max_ngram_count(["x"], 0)


@pytest.mark.slow
class TestPlanningSpark:
    def test_overlap_drop_matches_bruteforce(self, spark):
        from curator_spark.operators.alm import drop_overlapping_segments

        rng = np.random.RandomState(11)
        rows = []
        for aid in range(8):
            for k in range(40):
                s = float(rng.uniform(0, 300))
                e = s + float(rng.uniform(0.0, 12.0))  # includes zero-width
                text = "" if rng.uniform() < 0.1 else f"t{k}"
                rows.append((f"a{aid}", k, s, e, text))
        df = spark.createDataFrame(
            rows, "audio_id string, seg_idx int, start double, end double, text string"
        )
        got = {(r.audio_id, r.seg_idx)
               for r in drop_overlapping_segments(df, min_overlap_sec=1.5).collect()}

        # brute-force replica of the reference rule
        expected = set()
        by_aid = {}
        for aid, k, s, e, text in rows:
            if text.strip():
                by_aid.setdefault(aid, []).append((k, s, e))
        for aid, segs in by_aid.items():
            for k, s, e in segs:
                bad = False
                for k2, s2, e2 in segs:
                    if k2 == k:
                        continue
                    if not (e > s2 and e2 > s):
                        continue
                    ov = min(e, e2) - max(s, s2)
                    contains = (s <= s2 and e >= e2) or (s2 <= s and e2 >= e)
                    if ov >= 1.5 or contains:
                        bad = True
                        break
                if not bad:
                    expected.add((aid, k))
        assert got == expected

    def test_plan_snippets_spark_matches_kernel(self, spark):
        from curator_spark.datagen import generate_alm_segments
        from curator_spark.kernels.alm import plan_snippets
        from curator_spark.operators.alm import plan_snippets_stage, snippet_plan_stats

        segments = generate_alm_segments(spark, 10, seed=5).select(
            "audio_id", "seg_idx", "start", "end", "text"
        )
        cfg = dict(max_duration_sec=60.0, min_duration_sec=5.0, max_segment_gap_sec=10.0)
        got = plan_snippets_stage(segments, **cfg).collect()
        stats = {r.audio_id: r for r in snippet_plan_stats(segments, **cfg).collect()}

        pdf = segments.toPandas()
        n_rows = 0
        for aid, g in pdf.groupby("audio_id"):
            g = g.sort_values(["start", "end"])
            segs = [{"start": r.start, "end": r.end, "text": r.text}
                    for r in g.itertuples(index=False)]
            snippets, drops = plan_snippets(
                segs, cfg["max_duration_sec"], cfg["min_duration_sec"],
                cfg["max_segment_gap_sec"])
            n_rows += len(snippets)
            rows = sorted([r for r in got if r.audio_id == aid],
                          key=lambda r: r.snippet_idx)
            assert [(r.start, r.end) for r in rows] == [
                (s["start"], s["end"]) for s in snippets]
            st = stats[aid]
            assert (st.planned, st.too_long, st.too_short, st.no_text) == (
                len(snippets), drops["too_long"], drops["too_short"], drops["no_text"])
            for r, sn in zip(rows, snippets):
                assert r.seg_starts_rel[0] == pytest.approx(0.0)
                assert r.seg_ends_rel[-1] == pytest.approx(sn["end"] - sn["start"])
        assert len(got) == n_rows and n_rows > 0

    def test_repetition_flags_jvm_matches_kernel(self, spark):
        from curator_spark.kernels.alm import max_ngram_count
        from curator_spark.operators.alm import repetition_flags

        rng = np.random.RandomState(3)
        vocab = ["aa", "bb", "cc", "dd"]
        texts = []
        for i in range(60):
            n = int(rng.randint(0, 25))
            texts.append((i, " ".join(vocab[int(j)] for j in rng.randint(0, 4, n))))
        texts += [(100, ""), (101, None), (102, "  aa   bb  ")]  # whitespace runs
        df = spark.createDataFrame(texts, "doc_id long, text string")
        for n, mx in [(3, 2), (1, 3), (5, 1)]:
            got = {r.doc_id: (r.max_ngram_count, r.is_repetitive)
                   for r in repetition_flags(df, ngram_n=n, ngram_max_count=mx).collect()}
            for doc_id, text in texts:
                toks = (text or "").split()
                exp = max_ngram_count(toks, n)
                assert got[doc_id] == (exp, exp > mx), (doc_id, n, text)

    def test_repetition_flags_injectable_tokenizer(self, spark):
        from curator_spark.operators.alm import repetition_flags

        df = spark.createDataFrame(
            [(0, "ab-ab-ab"), (1, "x-y-z")], "doc_id long, text string"
        )
        out = {r.doc_id: r.max_ngram_count for r in repetition_flags(
            df, ngram_n=1, ngram_max_count=2, tokenizer=lambda t: t.split("-")
        ).collect()}
        assert out == {0: 3, 1: 1}

    def test_plan_snippets_validates_params(self, spark):
        from curator_spark.operators.alm import plan_snippets_stage

        df = spark.createDataFrame(
            [("a", 0, 0.0, 1.0, "x")],
            "audio_id string, seg_idx int, start double, end double, text string",
        )
        for kwargs in [dict(max_duration_sec=0.0), dict(min_duration_sec=-1.0),
                       dict(min_duration_sec=700.0), dict(max_segment_gap_sec=-0.1)]:
            with pytest.raises(ValueError):
                plan_snippets_stage(df, **kwargs)


class TestLoudnessKernel:
    def test_kweighting_matches_spec_table_at_48k(self):
        import numpy as np

        from curator_spark.kernels.audio import _KW_HIPASS, _KW_SHELF

        # re-derive the coefficients the magnitude response is built from
        # and pin them to the BS.1770-4 printed 48 kHz table
        fs = 48000.0
        _, fc, q, g = _KW_SHELF
        K = np.tan(np.pi * fc / fs)
        Vh = 10.0 ** (g / 20.0)
        Vb = Vh**0.499666774155
        a0_ = 1.0 + K / q + K * K
        b = [(Vh + Vb * K / q + K * K) / a0_, 2.0 * (K * K - Vh) / a0_,
             (Vh - Vb * K / q + K * K) / a0_]
        assert b == pytest.approx(
            [1.53512485958697, -2.69169618940638, 1.19839281085285], abs=1e-10)
        _, fc2, q2, _ = _KW_HIPASS
        K = np.tan(np.pi * fc2 / fs)
        den = 1.0 + K / q2 + K * K
        assert [2.0 * (K * K - 1.0) / den, (1.0 - K / q2 + K * K) / den] == pytest.approx(
            [-1.99004745483398, 0.99007225036621], abs=1e-10)

    def test_spec_calibration_sine(self):
        import numpy as np

        from curator_spark.kernels.audio import integrated_loudness_lufs

        sr = 48000
        t = np.arange(sr * 3) / sr
        # BS.1770 calibration: 0 dBFS 1 kHz sine reads -3.01 LUFS
        assert integrated_loudness_lufs(np.sin(2 * np.pi * 1000 * t), sr) == pytest.approx(-3.01, abs=0.05)
        # gain linearity: -20 dB -> -23.01 LUFS
        assert integrated_loudness_lufs(0.1 * np.sin(2 * np.pi * 1000 * t), sr) == pytest.approx(-23.01, abs=0.05)
        # silence and too-short input
        assert integrated_loudness_lufs(np.zeros(sr), sr) == float("-inf")
        assert integrated_loudness_lufs(np.ones(100), sr) == float("-inf")

    def test_gating_ignores_silence_tail(self):
        import numpy as np

        from curator_spark.kernels.audio import integrated_loudness_lufs

        sr = 48000
        t = np.arange(sr * 5) / sr
        tone = np.sin(2 * np.pi * 1000 * t)
        padded = np.concatenate([tone, np.zeros(sr * 5)])
        # gated loudness barely moves when 5 s of silence is appended —
        # only the few blocks straddling the tone->silence edge shift it
        # (they legitimately pass the relative gate per BS.1770)
        a = integrated_loudness_lufs(tone, sr)
        b = integrated_loudness_lufs(padded, sr)
        assert abs(a - b) < 0.3
        # ungated mean over the padded signal would read ~3 dB lower
        assert b > a - 1.0

    def test_band_energy_profile(self):
        import numpy as np

        from curator_spark.kernels.audio import band_energy_features

        sr = 48000
        t = np.arange(sr * 2) / sr
        f = band_energy_features(np.sin(2 * np.pi * 440 * t), sr)
        bands = {k: v for k, v in f.items() if k.startswith("band_energy_")}
        assert max(bands, key=bands.get) == "band_energy_low1"
        # above-Nyquist bands at 16 kHz rate are -120
        f16 = band_energy_features(
            np.sin(2 * np.pi * 5000 * np.arange(16000) / 16000), 16000)
        assert f16["band_energy_high3"] == -120.0
        assert max(
            (k for k, v in f16.items() if k.startswith("band_energy_")),
            key=f16.get,
        ) == "band_energy_mid3"  # 5-6 kHz band
        # high-frequency attenuation applies only above 10 kHz
        g = band_energy_features(np.random.RandomState(0).randn(sr), sr)
        assert "band_energy_high8" in g and g["lufs"] > -100


@pytest.mark.slow
class TestBandSpark:
    def test_band_features_and_injectable_filter(self, spark):
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.multimodal import band_features, band_filter

        clips = generate_clips(spark, 20, seed=9)
        feats = band_features(clips).localCheckpoint()
        rows = feats.collect()
        assert len(rows) == 20
        ok = [r for r in rows if r.decode_error is None]
        assert ok, "all clips failed to decode"
        for r in ok:
            assert r.band_energy_low1 is not None
            # 16 kHz fixture clips: >= 16 kHz bands are above Nyquist
            assert r.band_energy_high3 == -120.0

        def rule(feats_dict):
            return "full_band" if feats_dict["band_energy_mid5"] > -80 else "narrow_band"

        kept = band_filter(clips, predictor=rule, band_value="full_band")
        assert 0 <= kept.count() <= 20
        assert set(kept.columns) == set(clips.columns)
        with pytest.raises(NotImplementedError):
            band_filter(clips, predictor=None)


@pytest.mark.slow
class TestAsrSeam:
    def test_injectable_recognizer_and_wer_shape(self, spark):
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.multimodal import asr_inference

        clips = generate_clips(spark, 10, seed=2)

        def fake_recognizer(batch):
            # deterministic stand-in: duration-keyed token string
            return [f"len{len(s)//1000}" for s, sr in batch]

        out = asr_inference(clips, recognizer=fake_recognizer, batch_size=4)
        rows = out.collect()
        assert len(rows) == 10
        assert all(r.asr_error is None for r in rows)
        assert all(r.pred_text.startswith("len") for r in rows)

        with pytest.raises(NotImplementedError):
            asr_inference(clips, recognizer=None)
        with pytest.raises(ValueError):
            asr_inference(clips, recognizer=fake_recognizer, batch_size=0)

    def test_recognizer_failure_is_auditable(self, spark):
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.multimodal import asr_inference

        clips = generate_clips(spark, 6, seed=2)

        def broken(batch):
            raise RuntimeError("model exploded")

        rows = asr_inference(clips, recognizer=broken, batch_size=2).collect()
        assert all(r.pred_text is None for r in rows)
        assert all("model exploded" in r.asr_error for r in rows)


class TestSplitPoints:
    def test_split_at_previous_pause(self):
        from curator_spark.kernels.alm import long_audio_split_points

        # ends: 50, 95, 140 with max 100 -> crossing at 140 cuts at 95
        assert long_audio_split_points([50.0, 95.0, 140.0], 100.0) == [95.0]
        # nothing over the limit -> no cuts
        assert long_audio_split_points([10.0, 20.0], 100.0) == []
        # repeated crossings cut repeatedly
        assert long_audio_split_points([90.0, 180.0, 270.0], 100.0) == [90.0, 180.0]
        assert long_audio_split_points([], 100.0) == []


@pytest.mark.slow
class TestSplitJoinSpark:
    def test_split_long_audio_spans(self, spark):
        from curator_spark.operators.alm import split_long_audio

        segs = spark.createDataFrame(
            [("a0", 0.0, 50.0), ("a0", 60.0, 95.0), ("a0", 100.0, 140.0),
             ("a1", 0.0, 30.0)],
            "audio_id string, start double, end double",
        )
        durs = spark.createDataFrame(
            [("a0", 150.0), ("a1", 40.0)], "audio_id string, duration_sec double"
        )
        got = {
            (r.audio_id, r.split_idx): (r.start, r.end)
            for r in split_long_audio(segs, durs, suggested_max_len=100.0).collect()
        }
        assert got == {
            ("a0", 0): (0.0, 95.0),
            ("a0", 1): (95.0, 150.0),
            ("a1", 0): (0.0, 40.0),
        }
        with pytest.raises(ValueError):
            split_long_audio(segs, durs, suggested_max_len=0.0)

    def test_min_len_folds_slivers(self, spark):
        from curator_spark.operators.alm import split_long_audio

        segs = spark.createDataFrame(
            [("a0", 0.0, 99.5), ("a0", 99.6, 101.0)],
            "audio_id string, start double, end double",
        )
        durs = spark.createDataFrame(
            [("a0", 100.0)], "audio_id string, duration_sec double"
        )
        # cut point at 99.5 leaves a 0.5 s tail < min_len -> folded back
        rows = split_long_audio(segs, durs, suggested_max_len=100.0, min_len=1.0).collect()
        assert [(r.start, r.end) for r in rows] == [(0.0, 100.0)]

    def test_join_split_alignment_column_exprs(self, spark):
        from curator_spark.operators.alm import join_split_alignment

        rows = [
            ("a0", 1, "world again", 100.0,
             [{"word": "world", "start": 0.0, "end": 0.5},
              {"word": "again", "start": 0.75, "end": 1.25}]),
            ("a0", 0, "hello", 0.0,
             [{"word": "hello", "start": 0.25, "end": 1.0}]),
            ("a0", 2, "", 200.0, []),  # empty transcript skipped in join
            ("a1", 0, "solo", 0.0,
             [{"word": "solo", "start": 0.0, "end": 0.5}]),
        ]
        df = spark.createDataFrame(
            rows,
            "audio_id string, split_idx int, text string, offset double, "
            "words array<struct<word string, start double, end double>>",
        )
        got = {r.audio_id: r for r in join_split_alignment(df).collect()}
        assert got["a0"].text == "hello world again"
        al = [(w.word, w.start, w.end) for w in got["a0"].alignment]
        assert al == [("hello", 0.25, 1.0), ("world", 100.0, 100.5),
                      ("again", 100.75, 101.25)]
        assert got["a1"].text == "solo"

    def test_join_split_alignment_null_words_split(self, spark):
        """A split with NULL words (ASR produced nothing) contributes []
        — Spark's flatten would otherwise nullify the whole file's
        alignment when ANY element array is null."""
        from curator_spark.operators.alm import join_split_alignment

        rows = [
            ("a", 0, "hello world", 0.0,
             [{"word": "hello", "start": 0.0, "end": 0.4},
              {"word": "world", "start": 0.5, "end": 0.9}]),
            ("a", 1, None, 10.0, None),  # null text AND null words
        ]
        df = spark.createDataFrame(
            rows,
            "audio_id string, split_idx int, text string, offset double, "
            "words array<struct<word string, start double, end double>>",
        )
        (row,) = join_split_alignment(df).collect()
        assert row.text == "hello world"
        assert row.alignment is not None
        assert [w.word for w in row.alignment] == ["hello", "world"]


def _mk_words(n=40, punct_every=8, spk_switch=20, dur=1.0, gap=0.1, bw=8000):
    words, t = [], 0.0
    for k in range(n):
        spk = "spk_a" if k < spk_switch else "spk_b"
        mark = "." if k % punct_every == punct_every - 1 else ""
        words.append({"word": f"w{k}{mark}", "start": t, "end": t + dur,
                      "speaker": spk, "bandwidth": bw})
        t += dur + gap
    return words


class TestPrepareModuleSegments:
    def test_tts_single_speaker_runs(self):
        from curator_spark.kernels.alm import prepare_module_segments

        out = prepare_module_segments(_mk_words(), "f1", module="tts")
        assert out, "no segments produced"
        for s in out:
            assert "," not in s["speaker"]
            assert s["end"] - s["start"] <= 20.0 + 1e-9
        # speaker boundary respected: no segment crosses word 19 -> 20
        for s in out:
            ws = [w["word"].rstrip(".") for w in s["words"]]
            assert not ({"w19", "w20"} <= set(ws))

    def test_asr_crosses_speakers_with_joined_label(self):
        from curator_spark.kernels.alm import prepare_module_segments

        out = prepare_module_segments(_mk_words(), "f1", module="asr")
        assert any("," in s["speaker"] for s in out)

    def test_asr_deterministic_per_id_but_varies_across_ids(self):
        from curator_spark.kernels.alm import prepare_module_segments

        words = _mk_words(n=120, punct_every=100)  # few puncts -> duration splits
        a1 = prepare_module_segments(words, "fileA", module="asr")
        a2 = prepare_module_segments(words, "fileA", module="asr")
        assert [(s["start"], s["end"]) for s in a1] == [(s["start"], s["end"]) for s in a2]
        b = prepare_module_segments(words, "fileB", module="asr")
        # different md5 seed -> different random ceilings (overwhelmingly)
        assert [(s["start"], s["end"]) for s in a1] != [(s["start"], s["end"]) for s in b]

    def test_tts_pause_split(self):
        from curator_spark.kernels.alm import prepare_module_segments

        words = _mk_words(n=12, punct_every=100, spk_switch=12)
        words[6]["start"] += 5.0  # 5 s pause after 6 words (~6.5 s span)
        for w in words[6:]:
            w["start"] += 5.0 if w is not words[6] else 0.0
            w["end"] += 5.0
        out = prepare_module_segments(words, "f1", module="tts",
                                      punctuation_split_only=False)
        assert len(out) >= 2
        assert out[0]["end"] <= words[6]["start"]

    def test_tts_bandwidth_split(self):
        from curator_spark.kernels.alm import prepare_module_segments

        words = _mk_words(n=16, punct_every=100, spk_switch=16)
        for w in words[8:]:
            w["bandwidth"] = 4000  # bandwidth change at word 8 (~8.7 s in)
        out = prepare_module_segments(words, "f1", module="tts")
        assert len(out) >= 2
        assert {w["bandwidth"] for w in out[0]["words"]} == {8000}

    def test_punctuation_split_only_without_puncts(self):
        from curator_spark.kernels.alm import prepare_module_segments

        words = _mk_words(n=10, punct_every=100, spk_switch=10)
        out = prepare_module_segments(words, "f1", module="tts",
                                      punctuation_split_only=True)
        assert out == []

    def test_single_overlong_word_invalid(self):
        from curator_spark.kernels.alm import prepare_module_segments

        words = [{"word": "loooong.", "start": 0.0, "end": 30.0,
                  "speaker": "spk_a", "bandwidth": 8000}]
        out = prepare_module_segments(words, "f1", module="tts", max_duration=20.0)
        assert out == []

    def test_module_validation(self):
        from curator_spark.kernels.alm import prepare_module_segments

        with pytest.raises(ValueError):
            prepare_module_segments([], "f1", module="nope")


@pytest.mark.slow
class TestPrepareModuleSpark:
    def test_stage_matches_kernel(self, spark):
        from curator_spark.kernels.alm import prepare_module_segments
        from curator_spark.operators.alm import prepare_module_segments_stage

        rows = []
        for c in range(4):
            for w in _mk_words(n=50, punct_every=7):
                rows.append((f"f{c}", w["word"], w["start"], w["end"],
                             w["speaker"], w["bandwidth"]))
        df = spark.createDataFrame(
            rows, "audio_id string, word string, start double, end double, "
                  "speaker string, bandwidth int")
        for module in ("tts", "asr"):
            got = prepare_module_segments_stage(df, module=module).collect()
            for c in range(4):
                exp = prepare_module_segments(_mk_words(n=50, punct_every=7),
                                              f"f{c}", module=module)
                mine = sorted((r for r in got if r.audio_id == f"f{c}"),
                              key=lambda r: r.seg_idx)
                assert [(r.start, r.end, r.speaker, r.text) for r in mine] == [
                    (s["start"], s["end"], s["speaker"], s["text"]) for s in exp
                ], (module, c)


@pytest.mark.slow
class TestAsrLengthMismatch:
    def test_short_recognizer_output_is_auditable(self, spark):
        """A recognizer returning fewer texts than inputs must surface an
        asr_error on every clip of that chunk — zip truncation previously
        produced null pred_text with null asr_error (indistinguishable
        from a legitimate empty transcription)."""
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.multimodal import asr_inference

        clips = generate_clips(spark, 6, seed=3).coalesce(1)

        def short_recognizer(batch):
            return ["x"] * (len(batch) - 1)  # drops one result

        rows = asr_inference(clips, recognizer=short_recognizer, batch_size=6).collect()
        assert len(rows) == 6
        assert all(r.pred_text is None for r in rows)
        assert all(r.asr_error and "returned" in r.asr_error for r in rows)
