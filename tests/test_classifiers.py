"""Distributed text-classifier stages (reference
stages/text/classifiers/*)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from curator_spark.kernels import classifiers as ker
from curator_spark.operators.classifiers import (
    aegis_classifier,
    aegis_label_column,
    distributed_classifier,
    fineweb_edu_classifier,
    ptc_inference,
    sort_within_partitions_by_length,
    tokenize_for_classifier,
)


def make_fake_tokenizer():
    """Whitespace tokenizer: ids are word lengths, mask all-ones.
    Returned as a CLOSURE so cloudpickle serializes it by value —
    a module-level function of a test file pickles by module ref and
    executors raise ModuleNotFoundError."""

    def fake_tokenizer(texts):
        out = []
        for t in texts:
            words = t.split()
            out.append(([len(w) for w in words] or [0], [1] * max(1, len(words))))
        return out

    return fake_tokenizer


fake_tokenizer = make_fake_tokenizer()


class TestKernels:
    def test_fineweb_outputs_reference_replica(self):
        logits = [-1.0, 0.4, 0.5, 1.5, 2.49, 2.5, 3.5, 4.5, 5.7]
        floats, ints, labels = ker.fineweb_outputs(logits)
        # replica of fineweb_edu.py:110-122
        want_f = [min(5.0, max(0.0, x)) for x in logits]
        want_i = [round(max(0, min(x, 5))) for x in logits]
        want_l = ["high_quality" if x >= 2.5 else "low_quality" for x in logits]
        assert (floats, ints, labels) == (want_f, want_i, want_l)
        # banker's rounding: round(0.5)=0, round(1.5)=2, round(2.5)=2
        assert ints[2] == 0 and ints[3] == 2 and ints[5] == 2

    def test_argmax_labels(self):
        probs = np.array([[0.1, 0.7, 0.2], [0.6, 0.3, 0.1]])
        assert ker.argmax_labels(probs, ["a", "b", "c"]) == ["b", "a"]

    @pytest.mark.parametrize(
        "raw,want",
        [
            ("safe", "safe"),
            (" safe \nextra", "safe"),
            ("unsafe\nO3", "O3"),
            ("unsafe\n O13 ", "O13"),
            ("unsafe\nO99", "unknown"),
            ("unsafe", "unknown"),
            ("unsafe\nsafe", "unknown"),
            ("gibberish", "unknown"),
            ("", "unknown"),
        ],
    )
    def test_parse_aegis_response(self, raw, want):
        assert ker.parse_aegis_response(raw) == want

    def test_ptc_weighted_scores_replica(self):
        logits = np.array([[2.0, 0.5, -1.0], [0.0, 0.0, 0.0]])
        weights = [0.0, 0.5, 1.0]
        got = ker.ptc_weighted_scores(logits, weights, divisor=0.5)
        probs = ker.softmax(logits)
        want = [round(float((p * np.array(weights)).sum() / 0.5), 4) for p in probs]
        assert got == want

    def test_ptc_few_shots_floor(self):
        logits = np.array([[10.0, -10.0]])  # prob ~1 on class 0, weight 0
        got = ker.ptc_weighted_scores(logits, [0.0, 1.0], divisor=1.0, zero_floor=True)
        assert got == [0]

    def test_ptc_task_types_na_cut(self):
        m = {"0": "qa", "1": "gen", "2": "other"}
        # dominant class 1 -> second prob < 0.1 -> NA
        t1, t2, p = ker.ptc_task_types(np.array([[0.0, 9.0, -1.0]]), m)
        assert t1 == ["gen"] and t2 == ["NA"] and 0.99 <= p[0] <= 1.0
        # near-even split -> second kept
        t1, t2, p = ker.ptc_task_types(np.array([[1.0, 1.2, -9.0]]), m)
        assert (t1, t2) == (["gen"], ["qa"])

    def test_prompt_complexity_blend(self):
        got = ker.prompt_complexity_score([1.0], [1.0], [1.0], [1.0], [1.0], [1.0])
        assert got == [round(0.35 + 0.25 + 0.15 + 0.15 + 0.05 + 0.05, 5)] == [1.0]


class TestDistributedClassifier:
    def test_end_to_end_partition_invariant(self, spark):
        rows = [(f"doc {'x ' * (i % 7)}number {i}",) for i in range(20)]
        df = spark.createDataFrame(rows, "text string")

        def forward(ids, mask):
            # prob of class 1 grows with token count -> deterministic labels
            n = mask.sum(axis=1)
            p1 = (n % 2).astype(float)
            return np.stack([1 - p1, p1], axis=1)

        def run(d):
            out = distributed_classifier(
                d, fake_tokenizer, forward, labels=["even", "odd"],
                label_field="parity", score_field="prob", batch_size=3,
            )
            return sorted((r.text, r.parity, r.prob) for r in out.collect())

        got = run(df.coalesce(1))
        assert got == run(df.repartition(5))
        for text, parity, prob in got:
            want = "odd" if len(text.split()) % 2 else "even"
            assert parity == want and prob == 1.0

    def test_filter_by_is_declarative(self, spark):
        df = spark.createDataFrame([("a b",), ("c",)], "text string")

        def forward(ids, mask):
            n = mask.sum(axis=1)
            p1 = (n % 2).astype(float)
            return np.stack([1 - p1, p1], axis=1)

        out = distributed_classifier(
            df, fake_tokenizer, forward, labels=["even", "odd"], filter_by=["odd"]
        )
        assert [r.preds for r in out.collect()] == ["odd"]

    def test_max_chars_truncation_reaches_seam(self, spark):
        df = spark.createDataFrame([("abcdefghij",)], "text string")

        def len_tok(texts):
            # id 0 = received char count: proves the seam saw the CLIPPED text
            return [([len(t)], [1]) for t in texts]

        (row,) = tokenize_for_classifier(df, len_tok, max_chars=4).collect()
        assert row.input_ids == [4]

    def test_max_seq_length_clips_tokens(self, spark):
        df = spark.createDataFrame([("a b c d e f",)], "text string")
        out = tokenize_for_classifier(df, fake_tokenizer, max_seq_length=3).collect()
        assert len(out[0].input_ids) == 3 and len(out[0].attention_mask) == 3

    def test_seam_and_labels_required(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(NotImplementedError):
            tokenize_for_classifier(df, None)
        with pytest.raises(ValueError):
            distributed_classifier(df, fake_tokenizer, lambda i, m: None, labels=[])

    def test_length_sort_no_exchange_and_restore(self, spark):
        df = spark.createDataFrame(
            [(f"{'w ' * (20 - i)}",) for i in range(20)], "text string"
        ).repartition(2)
        toks = tokenize_for_classifier(df, fake_tokenizer)
        sorted_df = sort_within_partitions_by_length(toks)
        plan = sorted_df._jdf.queryExecution().executedPlan().toString()
        # repartition exchanges; the length sort itself must NOT
        assert plan.count("Exchange") == 1
        # idempotence: a second call is a no-op
        assert sort_within_partitions_by_length(sorted_df) is sorted_df


class TestFineWebEdu:
    def test_scores_match_kernel_including_bankers_rounding(self, spark):
        texts = [(f"{'tok ' * i}tail",) for i in range(9)]
        df = spark.createDataFrame(texts, "text string")
        logit_for = lambda n: float(n) - 2.5  # noqa: E731 - spans clamp+round grid

        def forward(ids, mask):
            return np.array([logit_for(n) for n in mask.sum(axis=1)])

        out = fineweb_edu_classifier(df, fake_tokenizer, forward).collect()
        for r in out:
            n = len(r.text.split())
            f_, i_, l_ = ker.fineweb_outputs([logit_for(n)])
            assert r["fineweb-edu-score-float"] == f_[0]
            assert r["fineweb-edu-score-int"] == i_[0]
            assert r["fineweb-edu-score-label"] == l_[0]


class TestFineMath:
    def test_center_crop_matches_reference_mid_slice(self, spark):
        from curator_spark.operators import center_crop_text

        def mid_slice(t, n):  # replica of finemath.py:57-60 _mid_slice
            m = len(t) // 2
            b, e = max(0, m - n), min(m + n, len(t))
            return t[b:e]

        texts = ["", "a", "ab", "abcdefghij", "x" * 31, "héllo wörld ünïcode" * 3]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        for n in (0, 1, 3, 5, 100):
            got = [r.text for r in center_crop_text(df, "text", n).orderBy(F.length("text"), "text").collect()]
            want = sorted((mid_slice(t, n) for t in texts), key=lambda t: (len(t), t)) if n > 0 else sorted(texts, key=lambda t: (len(t), t))
            assert got == want, n

    def test_crop_is_declarative(self, spark):
        from curator_spark.operators import center_crop_text

        df = spark.createDataFrame([("abc" * 100,)], "text string")
        plan = center_crop_text(df, "text", 10)._jdf.queryExecution().executedPlan().toString()
        assert "pythonUDF" not in plan and "ArrowEval" not in plan

    def test_scores_clip_round_no_label(self, spark):
        from curator_spark.operators import finemath_classifier

        texts = [(f"{'tok ' * i}tail",) for i in range(9)]
        df = spark.createDataFrame(texts, "text string")
        logit_for = lambda n: float(n) - 2.5  # noqa: E731

        def forward(ids, mask):
            return np.array([logit_for(n) for n in mask.sum(axis=1)])

        out = finemath_classifier(df, fake_tokenizer, forward).collect()
        for r in out:
            n = len(r.text.split())
            want_f = min(5.0, max(0.0, logit_for(n)))
            # np.round on the clipped float (finemath.py:139-141) — banker's
            assert r["finemath_scores"] == want_f
            assert r["finemath_int_scores"] == round(want_f)
            assert "finemath-score-label" not in r.asDict()

    def test_crop_feeds_tokenizer(self, spark):
        from curator_spark.operators import finemath_classifier

        # forward returns the tokenized WORD COUNT as the logit, so the
        # score reveals exactly which text reached the tokenizer
        forward = lambda i, m: m.sum(axis=1).astype(float)  # noqa: E731
        long_text = "left " * 50 + "MID " * 4 + "right " * 50
        df = spark.createDataFrame([(long_text,)], "text string")
        m = len(long_text) // 2
        cropped_words = len(long_text[max(0, m - 10) : m + 10].split())
        assert cropped_words < 5  # uncropped would clamp to 5.0
        (row,) = finemath_classifier(
            df, fake_tokenizer, forward, center_crop_chars=10
        ).collect()
        assert row["finemath_scores"] == float(cropped_words)
        (row_nocrop,) = finemath_classifier(
            df, fake_tokenizer, forward, center_crop_chars=None
        ).collect()
        assert row_nocrop["finemath_scores"] == 5.0

    def test_seam_required(self, spark):
        from curator_spark.operators import finemath_classifier

        df = spark.createDataFrame([("t",)], "text string")
        with pytest.raises(NotImplementedError, match="finemath_classifier"):
            finemath_classifier(df, fake_tokenizer, None)


class TestAegis:
    def test_column_parse_matches_kernel(self, spark):
        raws = [
            "safe", " safe \nmore", "unsafe\nO3", "unsafe\n O13 ",
            "unsafe\nO99", "unsafe", "unsafe\nsafe", "junk", "", None,
            # str.strip() parity beyond ASCII space: CRLF / tab
            # terminated lines (common from HTTP model backends)
            "safe\r\nmore", "unsafe\r\nO3\r", "\tsafe\t\nx", "unsafe\nO3\t",
        ]
        df = spark.createDataFrame([(r,) for r in raws], "raw string")
        got = [r.label for r in df.select(aegis_label_column(df["raw"]).alias("label")).collect()]
        want = [ker.parse_aegis_response(r or "") for r in raws]
        assert got == want

    def test_end_to_end_with_echoing_seam(self, spark):
        df = spark.createDataFrame(
            [("a nice doc",), ("a VIOLENT doc",), ("weird",)], "text string"
        )

        def generate(prompts):
            out = []
            for p in prompts:
                assert p.startswith("[INST]") and p.rstrip().endswith("[/INST]")
                if "VIOLENT" in p:
                    out.append(p + "unsafe\nO1")  # echoes the prompt
                elif "weird" in p:
                    out.append("mumble")
                else:
                    out.append("safe")
            return out

        got = {r.text: r.aegis_pred for r in aegis_classifier(df, generate).collect()}
        assert got == {"a nice doc": "safe", "a VIOLENT doc": "O1", "weird": "unknown"}

    def test_max_chars_and_filter_and_raw(self, spark):
        df = spark.createDataFrame([("x" * 50,), ("ok",)], "text string")

        def generate(prompts):
            # labels encode whether the prompt held MORE than max_chars
            return ["unsafe\nO1" if "x" * 11 in p else "unsafe\nO2" for p in prompts]

        got = {r.text: (r.aegis_pred, r._aegis_raw_pred) for r in aegis_classifier(
            df, generate, max_chars=10, filter_by=["O2"], keep_raw_output=True
        ).collect()}
        # both docs truncated to <= 10 chars -> O2 -> both survive the filter
        assert got == {
            "x" * 50: ("O2", "unsafe\nO2"),
            "ok": ("O2", "unsafe\nO2"),
        }

    def test_seam_required(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(NotImplementedError):
            aegis_classifier(df, None)


class TestPTC:
    def test_eleven_fields_and_blend_consistency(self, spark):
        df = spark.createDataFrame([(f"prompt {'z ' * i}",) for i in range(6)], "text string")
        task_map = {"0": "qa", "1": "gen", "2": "code"}
        heads = [
            "creativity_scope", "reasoning", "contextual_knowledge",
            "number_of_few_shots", "domain_knowledge", "no_label_reason",
            "constraint_ct",
        ]
        weights = {h: [0.0, 0.5, 1.0] for h in heads}
        divisors = {h: 1.0 for h in heads}

        def forward(ids, mask):
            n = mask.sum(axis=1).astype(float)
            tri = np.stack([n * 0.1, np.sin(n), np.cos(n)], axis=1)
            return [tri] * 8  # head 0 = task_type, 1..7 = score heads

        out = ptc_inference(
            df, forward, task_map, weights, divisors, tokenizer=fake_tokenizer
        )
        rows = out.collect()
        assert len(rows) == 6
        from curator_spark.operators.classifiers import PTC_OUTPUT_FIELDS

        for f in PTC_OUTPUT_FIELDS:
            assert f in out.columns
        for r in rows:
            want = ker.prompt_complexity_score(
                [r.creativity_scope], [r.reasoning], [r.constraint_ct],
                [r.domain_knowledge], [r.contextual_knowledge], [r.number_of_few_shots],
            )[0]
            assert r.prompt_complexity_score == pytest.approx(want)
            assert r.task_type_1 in task_map.values()
            assert r.task_type_2 in (*task_map.values(), "NA")

    def test_config_maps_required(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError):
            ptc_inference(df, lambda i, m: None, None, {"h": [1]}, {"h": 1.0})


class TestEmbeddingInference:
    def test_pooling_math_matches_reference_replica(self, spark):
        from curator_spark.operators.classifiers import embedding_inference

        rows = [("a bb ccc",), ("dd e",), ("f",)]
        df = spark.createDataFrame(rows, "text string")
        toks = tokenize_for_classifier(df, fake_tokenizer)

        def forward(ids, mask):
            # deterministic per-token embeddings: [id, 1, position]
            n, L = ids.shape
            pos = np.tile(np.arange(L, dtype=float), (n, 1))
            return np.stack([ids.astype(float), np.ones((n, L)), pos], axis=2)

        for pooling in ("mean_pooling", "last_token"):
            out = {r.text: np.array(r.embeddings) for r in
                   embedding_inference(toks, forward, pooling=pooling).collect()}
            for text, got in out.items():
                words = text.split()
                L = len(words)
                emb = np.stack(
                    [np.array([len(w), 1.0, i]) for i, w in enumerate(words)]
                )
                if pooling == "mean_pooling":
                    want = emb.mean(axis=0)
                else:
                    want = emb[-1]
                want = want / np.linalg.norm(want)
                assert np.allclose(got, want, atol=1e-6), (pooling, text)
                assert abs(np.linalg.norm(got) - 1.0) < 1e-6

    def test_last_token_under_left_padding(self, spark):
        from curator_spark.operators.classifiers import embedding_inference

        df = spark.createDataFrame([("a bb",), ("c dd eee",)], "text string").coalesce(1)
        toks = tokenize_for_classifier(df, fake_tokenizer)

        def forward(ids, mask):
            n, L = ids.shape
            pos = np.tile(np.arange(L, dtype=float), (n, 1))
            return np.stack([ids.astype(float), np.ones((n, L)), pos], axis=2)

        out = {r.text: np.array(r.embeddings) for r in embedding_inference(
            toks, forward, pooling="last_token", padding_side="left"
        ).collect()}
        # under left padding the last token sits at the FINAL column for
        # every row; its id is the last word's length
        for text, got in out.items():
            words = text.split()
            width = max(len(t.split()) for t in out)  # batch max
            want = np.array([len(words[-1]), 1.0, width - 1], dtype=float)
            want = want / np.linalg.norm(want)
            assert np.allclose(got, want, atol=1e-6), text

    def test_seam_and_pooling_validation(self, spark):
        from curator_spark.operators.classifiers import embedding_inference

        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(NotImplementedError):
            embedding_inference(df, None)
        with pytest.raises(ValueError, match="pooling"):
            embedding_inference(df, lambda i, m: None, pooling="cls")
