"""Nemotron-CC synthetic-data stages (reference
stages/synthetic/nemotron_cc/{base,nemotron_cc,prompts}.py and
stages/synthetic/qa_multilingual_synthetic.py)."""

from __future__ import annotations

import random

import pytest

from curator_spark.kernels import synthetic as ker
from curator_spark.operators.synthetic import (
    diverse_qa_generate,
    diverse_qa_postprocess,
    distill,
    knowledge_list_postprocess,
    qa_multilingual,
    synthesize,
)

PREFIX = ker.DIVERSE_QA_PREFIX


# ---------------------------------------------------------------------------
# literal replicas of the reference post-processors (nemotron_cc.py)


def ref_format_row(text, generated_text, rng, tokenizer=None, prefix=PREFIX, max_num_pairs=10):
    """Replica of DiverseQAPostProcessingStage._format_row with the
    global-RNG calls routed through ``rng``."""
    lines = [line.strip() for line in generated_text.split("\n") if line.strip()]
    if not lines:
        return ""
    lines = [line[2:].strip() if line.startswith("- ") else line for line in lines]
    if lines[0] == prefix:
        lines = lines[1:]
    qa_pairs = []
    for line in lines:
        if line.startswith("Question:"):
            qa_pairs.append(line)
        elif qa_pairs:
            qa_pairs[-1] += "\n" + line
        else:
            return ""
    if len(qa_pairs) == 0:
        return ""
    rng.shuffle(qa_pairs)
    if tokenizer is not None:
        num_tokens = len(tokenizer(text))
        qa_pairs = qa_pairs[: rng.randint(1, max(1, int(max_num_pairs * num_tokens / 150)))]
    else:
        qa_pairs = qa_pairs[: rng.randint(1, max_num_pairs)]
    return f"{text}\n\n" + "\n\n".join(qa_pairs)


def ref_format_knowledge(generated_text):
    """Replica of KnowledgeListPostProcessingStage._format_text."""
    lines = []
    for idx, line in enumerate(generated_text.split("\n")):
        if idx == 0 and not line.startswith("-"):
            continue
        if line.startswith(("  ", "- ")):
            lines.append(line[2:].strip())
        else:
            lines.append(line)
    return "\n".join(lines)


QA_GOOD = (
    PREFIX
    + "\n- Question: What is A? Answer: One\n"
    + "- Question: What is B? Answer: Two\n"
    + "continuation of answer two\n"
    + "- Question: What is C? Answer: Three\n"
)


class TestDiverseQAKernel:
    def test_parse_merges_continuations_and_strips(self):
        pairs = ker.parse_qa_pairs(QA_GOOD)
        assert pairs == [
            "Question: What is A? Answer: One",
            "Question: What is B? Answer: Two\ncontinuation of answer two",
            "Question: What is C? Answer: Three",
        ]

    @pytest.mark.parametrize(
        "gen",
        [
            "",
            "   \n  \n",
            "stray line before any question\n- Question: Q? Answer: A",
            PREFIX,  # prefix only -> zero pairs
        ],
    )
    def test_degenerate_rows_return_empty(self, gen):
        assert ker.format_diverse_qa("doc", gen) == ""

    def test_prefix_dropped_only_when_first(self):
        gen = "- Question: Q1? Answer: A1\n" + PREFIX
        # prefix NOT first -> it is a continuation line of the pair
        pairs = ker.parse_qa_pairs(gen)
        assert pairs == ["Question: Q1? Answer: A1\n" + PREFIX]

    @pytest.mark.parametrize("seed", [0, 1, 7, 99])
    @pytest.mark.parametrize("tok", [None, lambda t: t.split()])
    def test_reference_rng_parity_via_sampler_seam(self, seed, tok):
        """With the reference's shuffle/randint injected through the
        sampler seam, output is bit-identical to the replica."""
        text = "word " * 40

        def sampler(pairs, t, cap, _seed=seed):
            rng = random.Random(_seed)
            rng.shuffle(pairs)
            return pairs[: rng.randint(1, cap)]

        got = ker.format_diverse_qa(
            text, QA_GOOD, num_tokens=len(tok(text)) if tok else None, sampler=sampler
        )
        want = ref_format_row(text, QA_GOOD, random.Random(seed), tokenizer=tok)
        assert got == want

    def test_default_sampler_deterministic_and_bounded(self):
        out1 = ker.format_diverse_qa("doc text", QA_GOOD, max_num_pairs=2)
        out2 = ker.format_diverse_qa("doc text", QA_GOOD, max_num_pairs=2)
        assert out1 == out2 and out1.startswith("doc text\n\n")
        n_pairs = out1.count("Question:")
        assert 1 <= n_pairs <= 2

    def test_token_scaled_cap(self):
        # 30 tokens -> cap = max(1, int(10*30/150)) = 2
        out = ker.format_diverse_qa("w " * 30, QA_GOOD, num_tokens=30)
        assert 1 <= out.count("Question:") <= 2


class TestKnowledgeListKernel:
    @pytest.mark.parametrize(
        "gen",
        [
            "Here is the list:\n- fact one\n- fact two",
            "- starts with bullet\n  indented continuation\nplain line",
            "-tight dash first line\n- spaced",
            "",
            "no bullets at all\nsecond line",
            "- only\n",
        ],
    )
    def test_matches_reference_replica(self, gen):
        assert ker.knowledge_list_format(gen) == ref_format_knowledge(gen)

    def test_none_is_empty(self):
        assert ker.knowledge_list_format(None) == ref_format_knowledge("")


class TestSynthesizeSpark:
    def test_prompt_build_and_unwrap(self, spark):
        rows = spark.createDataFrame([("alpha beta",), ("gamma",)], "text string")

        def gen(batches):
            out = []
            for msgs in batches:
                assert msgs[0]["role"] == "system"
                assert msgs[0]["content"] == ker.NEMOTRON_CC_DISTILL_SYSTEM_PROMPT
                assert msgs[1]["role"] == "user"
                assert "paraphrase" in msgs[1]["content"]
                out.append("PARA::" + msgs[1]["content"].split("Here is the text:\n")[1].split("\n")[0])
            return out

        got = {r.text: r.distill for r in distill(rows, gen).collect()}
        assert got == {"alpha beta": "PARA::alpha beta", "gamma": "PARA::gamma"}

    def test_seam_required_and_missing_column(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(NotImplementedError):
            synthesize(df, None, "p {document}")
        with pytest.raises(ValueError):
            synthesize(df, lambda b: ["y"], "p {document}", input_field="nope")

    def test_poisoned_row_degrades_not_batch(self, spark):
        df = spark.createDataFrame([("ok",), ("POISON",)], "text string").coalesce(1)

        def gen(batches):
            out = []
            for msgs in batches:
                if "POISON" in msgs[-1]["content"]:
                    raise RuntimeError("backend exploded")
                out.append("fine")
            return out

        got = {r.text: r.synthetic for r in
               synthesize(df, gen, "echo {document}", output_field="synthetic").collect()}
        assert got == {"ok": "fine", "POISON": ""}

    def test_diverse_qa_end_to_end_partition_invariant(self, spark):
        rows = [(f"document number {i} " * 5,) for i in range(12)]
        df = spark.createDataFrame(rows, "text string")

        def gen(batches):
            return [QA_GOOD for _ in batches]

        def run(d):
            out = diverse_qa_postprocess(diverse_qa_generate(d, gen))
            return sorted((r.text, r.diverse_qa) for r in out.collect())

        assert run(df.coalesce(1)) == run(df.repartition(8))
        for text, qa in run(df):
            assert qa.startswith(text + "\n\n") and "Question:" in qa


class TestKnowledgeListSpark:
    def test_column_program_matches_kernel(self, spark):
        gens = [
            "Here is the list:\n- fact one\n- fact two",
            "- b1\n  cont\nplain",
            "-tight\n- spaced",
            "",
            None,
            "no bullet first\n- later",
            # str.strip() parity beyond ASCII space: tab / CR tails
            "- fact one\t\n- fact two\r",
            "-  padded \r\n  indented\t",
        ]
        df = spark.createDataFrame([(g,) for g in gens], "knowledge_list string")
        got = [r.knowledge_list for r in knowledge_list_postprocess(df).collect()]
        want = [ker.knowledge_list_format(g) for g in gens]
        assert got == want

    def test_no_python_in_plan(self, spark):
        df = spark.createDataFrame([("x",)], "knowledge_list string")
        plan = knowledge_list_postprocess(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # pure Column program, JVM codegen


class TestQAMultilingual:
    def test_language_pick_deterministic_and_star_strip(self, spark):
        langs = ["English", "German", "Hindi"]

        def gen(batches):
            return ["**{}**".format(m[0]["content"]) for m in batches]

        df = qa_multilingual(spark, "Write a QA pair in {language}.", langs, 9, gen)
        texts = sorted(r.text for r in df.collect())
        assert len(texts) == 9
        assert all("*" not in t for t in texts)
        assert all(any(lang in t for lang in langs) for t in texts)
        # deterministic: same picks on a re-run
        texts2 = sorted(r.text for r in
                        qa_multilingual(spark, "Write a QA pair in {language}.", langs, 9, gen).collect())
        assert texts == texts2

    def test_seam_and_languages_required(self, spark):
        with pytest.raises(NotImplementedError):
            qa_multilingual(spark, "p {language}", ["en"], 1, None)
        with pytest.raises(ValueError):
            qa_multilingual(spark, "p {language}", [], 1, lambda b: [""])


class TestDiverseQAProperties:
    def test_selection_bounds_and_determinism(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=80, deadline=None)
        @given(
            text=st.text(max_size=60),
            n_pairs=st.integers(1, 12),
            cap=st.integers(1, 10),
        )
        def check(text, n_pairs, cap):
            gen = PREFIX + "\n" + "\n".join(
                f"- Question: Q{i}? Answer: A{i}" for i in range(n_pairs)
            )
            out1 = ker.format_diverse_qa(text, gen, max_num_pairs=cap)
            out2 = ker.format_diverse_qa(text, gen, max_num_pairs=cap)
            assert out1 == out2  # pure function of (text, gen, cap)
            assert out1.startswith(text + "\n\n")
            k = out1.count("Question:")
            assert 1 <= k <= min(cap, n_pairs)
            # every selected pair is a real input pair
            body = out1[len(text) + 2:]
            assert all(p.startswith("Question: Q") for p in body.split("\n\n"))

        check()
