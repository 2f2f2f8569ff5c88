"""Hypothesis property tests over the round-4 kernels: invariants that
hold for ALL inputs, not just the hand-built cases."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def spans(max_n=25):
    return st.lists(
        st.tuples(
            st.floats(0, 500, allow_nan=False, allow_infinity=False),
            st.floats(0.1, 60, allow_nan=False, allow_infinity=False),
        ),
        min_size=0,
        max_size=max_n,
    ).map(lambda xs: [(round(s, 3), round(s + d, 3)) for s, d in xs])


class TestPlanSnippetsProperties:
    @given(spans(), st.floats(5, 200), st.floats(0, 4), st.floats(0.5, 40))
    @settings(max_examples=150, deadline=None)
    def test_constraints_hold(self, segs, max_dur, min_dur, max_gap):
        from curator_spark.kernels.alm import plan_snippets

        segs = sorted(({"start": s, "end": e, "text": "t"} for s, e in segs),
                      key=lambda x: (x["start"], x["end"]))
        # planner precondition: non-overlapping
        clean = []
        for s in segs:
            if not clean or s["start"] >= clean[-1]["end"]:
                clean.append(s)
        out, drops = plan_snippets(clean, max_dur, min_dur, max_gap)
        covered = []
        for sn in out:
            dur = sn["end"] - sn["start"]
            assert min_dur <= dur <= max_dur + 1e-9
            # intra-snippet gaps never exceed max_gap
            ss = sn["segments"]
            for a, b in zip(ss, ss[1:]):
                assert b["start"] - a["end"] <= max_gap + 1e-9
            assert sn["start"] == ss[0]["start"] and sn["end"] == ss[-1]["end"]
            covered.extend(id(s) for s in ss)
        # every input segment lands in at most one snippet
        assert len(covered) == len(set(covered))
        # accounting: snippets + drops == candidate count
        assert len(out) + sum(drops.values()) >= len(out)

    @given(spans(), st.floats(0, 1), st.floats(1, 100))
    @settings(max_examples=150, deadline=None)
    def test_overlap_filter_survivors_conflict_free(self, sp, thr, target):
        from curator_spark.kernels.alm import filter_window_overlaps, overlap_ratio

        kept = filter_window_overlaps(sp, thr, target)
        ks = sorted(sp[i] for i in kept)
        for (s1, e1), (s2, e2) in zip(ks, ks[1:]):
            if s2 < e1:  # pairs the greedy scan compares
                r = overlap_ratio(s1, e1, s2, e2)
                assert r < thr or (thr == 0.0 and r == 0.0)


class TestLoudnessProperties:
    @given(st.integers(0, 2**31 - 1), st.floats(-30, 0))
    @settings(max_examples=25, deadline=None)
    def test_gain_linearity(self, seed, gain_db):
        from curator_spark.kernels.audio import integrated_loudness_lufs

        rng = np.random.RandomState(seed)
        sr = 16000
        x = np.clip(rng.randn(sr * 2) * 0.2, -1, 1)
        base = integrated_loudness_lufs(x, sr)
        if not np.isfinite(base):
            return
        shifted = integrated_loudness_lufs(x * 10 ** (gain_db / 20.0), sr)
        # gating can shift slightly when blocks cross the gates; allow 0.5 LU
        assert abs((shifted - base) - gain_db) < 0.5


class TestDiarizationProperties:
    @given(
        st.dictionaries(
            st.sampled_from(["a", "b"]),
            spans(max_n=8),
            min_size=1,
            max_size=2,
        )
    )
    @settings(max_examples=150, deadline=None)
    def test_clean_cut_two_speakers_disjoint_and_bounded(self, segs):
        from curator_spark.kernels.diarization import clean_cut_overlaps, merge_adjacent

        segs = {k: merge_adjacent(v, 0.0) for k, v in segs.items() if v}
        if not segs:
            return
        out = clean_cut_overlaps(segs)
        lo = min(s for v in segs.values() for s, _ in v)
        hi = max(e for v in segs.values() for _, e in v)
        flat = sorted(iv for sp in out.values() for iv in sp)
        for s, e in flat:
            assert lo - 1e-9 <= s < e <= hi + 1e-9
        for (s1, e1), (s2, e2) in zip(flat, flat[1:]):
            assert e1 <= s2 + 1e-9  # <=2 speakers: outputs pairwise disjoint

    @given(spans(max_n=15), st.floats(0, 5))
    @settings(max_examples=150, deadline=None)
    def test_merge_adjacent_partition_preserved(self, sp, gap):
        from curator_spark.kernels.diarization import merge_adjacent

        merged = merge_adjacent(sp, gap)
        # sorted, non-overlapping, gaps strictly greater than threshold
        for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
            assert s2 - e1 > gap
        # total covered time never shrinks
        def cover(xs):
            total, cur_s, cur_e = 0.0, None, None
            for s, e in sorted(xs):
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        total += cur_e - cur_s
                    cur_s, cur_e = s, e
                else:
                    cur_e = max(cur_e, e)
            if cur_e is not None:
                total += cur_e - cur_s
            return total
        assert cover(merged) >= cover(sp) - 1e-6


class TestWarcProperties:
    @given(st.binary(max_size=4096))
    @settings(max_examples=300, deadline=None)
    def test_parser_never_raises_on_garbage(self, raw):
        from curator_spark.kernels.warc import iter_warc_records, iter_warc_responses

        # arbitrary bytes (incl. fake gzip magic) must never escape the
        # corruption contract
        list(iter_warc_records(raw))
        list(iter_warc_responses(raw, "fuzz"))

    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["response", "request", "warcinfo"]),
                st.binary(max_size=200),
            ),
            min_size=0,
            max_size=8,
        ),
        st.booleans(),
    )
    @settings(max_examples=150, deadline=None)
    def test_roundtrip_arbitrary_payloads(self, recs, gz):
        from curator_spark.kernels.warc import build_warc, iter_warc_records

        built = [
            (t, {"WARC-Record-ID": f"<urn:uuid:r{i}>", "WARC-Target-URI": f"u{i}"}, p)
            for i, (t, p) in enumerate(recs)
        ]
        raw = build_warc(built, gzip_members=gz)
        out = list(iter_warc_records(raw))
        assert len(out) == len(recs)
        for (t, p), rec in zip(recs, out):
            assert rec["headers"]["warc-type"] == t
            assert rec["payload"] == p

    @given(st.binary(max_size=300), st.integers(0, 400))
    @settings(max_examples=150, deadline=None)
    def test_truncation_never_raises(self, payload, cut):
        from curator_spark.kernels.warc import build_warc, iter_warc_records

        raw = build_warc(
            [("response", {"WARC-Record-ID": "<urn:uuid:x>"}, payload)] * 2,
            gzip_members=True,
        )
        list(iter_warc_records(raw[: min(cut, len(raw))]))


class TestLatexKernelProperties:
    @given(st.lists(st.text(max_size=300), max_size=5))
    @settings(max_examples=200, deadline=None)
    def test_project_cleaning_never_raises(self, files):
        from curator_spark.kernels.latex import clean_tex_project

        out = clean_tex_project(files)
        assert out is None or isinstance(out, str)

    @given(st.lists(st.text(max_size=300), min_size=1, max_size=4))
    @settings(max_examples=200, deadline=None)
    def test_no_section_header_means_empty(self, files):
        from curator_spark.kernels.latex import clean_tex_project

        files = [f.replace("\\", "") for f in files]  # no commands at all
        out = clean_tex_project(files)
        assert out is None or out.strip() == ""

    @given(st.text(max_size=400))
    @settings(max_examples=200, deadline=None)
    def test_tail_and_line_comments_removed(self, body):
        from curator_spark.kernels.latex import clean_tex, clean_tex_project

        body = body.replace("\\", "")  # keep macro table empty
        tex = "preamble\n\\section{X}\n" + body + "\n\\appendix\nafter"
        out = clean_tex(tex, {})
        assert "\\appendix" not in out and "preamble" not in out
        # \n-only line semantics: the reference's (?m)^%.*\n? pattern
        # (extract.py:115-121) anchors ^ after \n, so a '%' following a
        # bare \r is NOT a comment line to the reference (or to us) —
        # splitlines() would wrongly treat \r as a boundary here
        assert not any(ln.startswith("%") for ln in out.split("\n"))
        assert clean_tex_project([tex]).startswith("\\section{X}")

    @given(st.text(max_size=40))
    @settings(max_examples=300, deadline=None)
    def test_arxiv_id_total_contract(self, stem):
        from curator_spark.kernels.latex import format_arxiv_id

        try:
            out = format_arxiv_id(stem)
        except ValueError:
            return
        assert isinstance(out, str) and out


class TestTranslationProperties:
    """Translation segmentation invariants (kernels/translation.py):
    the reference guarantees (segmentation.py:218-222) that fine-mode
    units reconstruct the input exactly, and that an identity
    translator makes segment->reassemble the identity on documents."""

    @given(st.text(max_size=500))
    @settings(max_examples=300, deadline=None)
    def test_fine_units_reconstruct_any_text(self, text):
        from curator_spark.kernels.translation import units_with_structure

        units = units_with_structure(text)
        assert "".join(u + s for u, s in units) == text

    @given(st.text(max_size=500))
    @settings(max_examples=300, deadline=None)
    def test_fine_identity_roundtrip(self, text):
        from curator_spark.kernels.translation import (
            _reassemble_fine,
            segment_fine,
        )

        segs, meta = segment_fine(text)
        assert _reassemble_fine(meta, segs) == text

    @given(st.text(max_size=500))
    @settings(max_examples=300, deadline=None)
    def test_coarse_identity_roundtrip(self, text):
        from curator_spark.kernels.translation import (
            _reassemble_coarse,
            segment_coarse,
        )

        segs, meta = segment_coarse(text)
        assert _reassemble_coarse(meta, segs) == text

    @given(st.text(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_coarse_translation_preserves_line_structure(self, text):
        """Any single-line per-segment rewrite yields the same line
        count as the original (translation never adds or removes
        template lines), and non-translatable lines survive verbatim."""
        from curator_spark.kernels.translation import (
            _reassemble_coarse,
            segment_coarse,
        )

        segs, meta = segment_coarse(text)
        rebuilt = _reassemble_coarse(meta, ["<TR>" for _ in segs])
        assert len(rebuilt.split("\n")) == len(text.split("\n"))
        for orig, new in zip(text.split("\n"), rebuilt.split("\n")):
            if new != "<TR>" and not new.endswith("<TR>"):
                assert new == orig


class TestTextQualityProperties:
    """Invariants of the chrF / sentence-BLEU kernels
    (kernels/textquality.py; Popović 2015 + mteval lineage)."""

    texts = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=120
    )

    @given(texts, texts)
    @settings(max_examples=200, deadline=None)
    def test_scores_bounded_and_total(self, hyp, ref):
        from curator_spark.kernels.textquality import (
            bleu_sentence_score,
            chrf_score,
        )

        for fn in (chrf_score, bleu_sentence_score):
            s = fn(hyp, ref)
            assert 0.0 <= s <= 100.0 + 1e-9

    @given(texts)
    @settings(max_examples=150, deadline=None)
    def test_identity_is_perfect(self, t):
        from curator_spark.kernels.textquality import (
            bleu_sentence_score,
            chrf_score,
        )

        assert chrf_score(t, t) == 100.0
        # BLEU: identical tokenized forms are perfect; whitespace-only
        # strings tokenize empty on both sides -> also 100
        assert bleu_sentence_score(t, t) == 100.0

    @given(texts, texts)
    @settings(max_examples=150, deadline=None)
    def test_chrf_whitespace_invariance(self, a, b):
        from curator_spark.kernels.textquality import chrf_score

        # default mode strips whitespace: injecting spaces changes nothing
        spaced = " ".join(a) if a else a
        assert chrf_score(spaced, b) == chrf_score(a, b)

    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_tokenize_13a_never_crashes_and_no_blank_tokens(self, t):
        from curator_spark.kernels.textquality import tokenize_13a

        toks = tokenize_13a(t)
        assert all(tok and not tok.isspace() for tok in toks)


class TestFaithExtractionProperties:
    """Invariants of the FAITH JSON extraction
    (kernels/translation.py extract_json_object / extract_faith_scores)."""

    @given(st.text(max_size=300))
    @settings(max_examples=300, deadline=None)
    def test_extract_never_crashes_and_result_is_balanced(self, t):
        from curator_spark.kernels.translation import extract_json_object

        got = extract_json_object(t)
        if got is not None:
            assert got[0] == "{" and got[-1] == "}"
            assert got in t

    @given(
        st.dictionaries(
            st.sampled_from(
                ["Fluency", "Accuracy", "Idiomaticity", "Terminology",
                 "Handling_of_Format", "Extra"]
            ),
            st.one_of(
                st.integers(-1, 5),
                st.floats(-1, 5, allow_nan=False),
                st.text(max_size=8),
            ),
            max_size=6,
        ),
        st.text(max_size=40),
        st.text(max_size=40),
    )
    @settings(max_examples=200, deadline=None)
    def test_roundtrip_through_noise(self, d, prefix, suffix):
        import json as _json

        from curator_spark.kernels.translation import (
            FAITH_DIMENSIONS,
            extract_faith_scores,
        )

        payload = _json.dumps(d)
        # sanitize the prefix: a stray '{' would hijack the balanced scan
        # and a stray '"' or '\' would put it in string state before the
        # payload — both by design (faith.py:61-103 string-state walk)
        noise_pre = (
            prefix.replace("{", "(")
            .replace("}", ")")
            .replace('"', "'")
            .replace("\\", "/")
        )
        scores, failed = extract_faith_scores(noise_pre + payload + suffix)
        assert failed is False
        for col, key in FAITH_DIMENSIONS.items():
            v = d.get(key)
            try:
                expect = float(v)
            except (TypeError, ValueError):
                expect = 0.0
            assert scores[key] == expect
