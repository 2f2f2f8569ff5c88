"""Token-budget chunking + chunk merge (math pipeline stages).

Reference: stages/math/modifiers/chunking.py (TokenSplitterStage) and
merge_chunks.py (ChunkMergeStage). The splitter is checked against a
direct python replica of the reference's greedy loop over randomized
documents; the merger against hand-built chunk tables covering every
filter/agg rule.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from curator_spark.operators.chunking import merge_chunks, token_splitter


def _reference_split(text, max_tokens, sep, count):
    """Straight transcription of TokenSplitterStage.process
    (chunking.py:76-121) for one document."""
    raw = text.split(sep)
    paragraphs = []
    for i, p in enumerate(raw):
        if p.strip():
            paragraphs.append(p if i == len(raw) - 1 else p + sep)
    chunks, cur, n = [], [], 0
    for p in paragraphs:
        k = count(p)
        if n + k > max_tokens and n > 0:
            chunks.append(("".join(cur), n))
            cur, n = [], 0
        cur.append(p)
        n += k
    if cur:
        chunks.append(("".join(cur), n))
    return chunks


def _ws_count(p):
    return len(p.strip().split())


def test_token_splitter_matches_reference_loop(spark):
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "x"]
    docs = []
    for i in range(40):
        paras = []
        for _ in range(rng.randint(0, 8)):
            if rng.random() < 0.15:
                paras.append("   ")  # whitespace-only paragraph: dropped
            else:
                paras.append(" ".join(rng.choices(words, k=rng.randint(1, 30))))
        docs.append((f"d{i}", "\n\n".join(paras)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = token_splitter(df, max_length_tokens=25, separator="\n\n")
    got = {
        (r.doc_id, r.chunk_id): (r.text, r.n_tokens) for r in out.collect()
    }
    want = {}
    for doc_id, text in docs:
        for ci, (t, n) in enumerate(
            _reference_split(text, 25, "\n\n", _ws_count)
        ):
            want[(doc_id, ci)] = (t, n)
    assert got == want
    # reassembling the chunks reproduces every kept paragraph in order
    for doc_id, text in docs:
        joined = "".join(
            got[(doc_id, ci)][0]
            for ci in range(sum(1 for k in got if k[0] == doc_id))
        )
        raw = text.split("\n\n")
        expect = "".join(
            p if i == len(raw) - 1 else p + "\n\n"
            for i, p in enumerate(raw)
            if p.strip()
        )
        assert joined == expect


def test_py_ws_class_equals_python_isspace():
    """The _PY_WS character class IS Python's str.isspace set — checked
    exhaustively over the BMP with Java-regex semantics (re module after
    translating \\x{..} escapes), so strip/split in the Column program
    match the reference's para.strip()/para.split() on any input."""
    import re as _re

    from curator_spark.operators.chunking import _PY_WS

    cls = _re.compile(
        "[" + _re.sub(
            r"\\x\{([0-9a-fA-F]+)\}",
            lambda m: "\\u" + m.group(1).rjust(4, "0"),
            _PY_WS,
        ) + "]"
    )
    for cp in range(0x10000):
        ch = chr(cp)
        assert bool(cls.match(ch)) == ch.isspace(), hex(cp)


def test_token_splitter_unicode_whitespace_parity(spark):
    """Same reference-loop parity as above, but the corpus is laced with
    every class of non-ASCII whitespace (NBSP, NEL, thin/em spaces, line
    and paragraph separators, ideographic space, FS..US, vertical tab):
    paragraph keep/drop and token counts must still match Python
    str.strip()/str.split() exactly."""
    ws = "\t\x0b\x0c\r\x1c\x1d\x1e\x1f\x85\xa0\u1680\u2000\u2007\u200a\u2028\u2029\u202f\u205f\u3000"
    rng = random.Random(23)
    words = ["word", "\u00e9t\u00e9", "data", "\u4e2d\u6587", "x"]
    docs = []
    for i in range(30):
        paras = []
        for _ in range(rng.randint(0, 7)):
            if rng.random() < 0.2:
                # whitespace-only paragraph from exotic chars: dropped
                paras.append("".join(rng.choices(ws, k=rng.randint(1, 5))))
            else:
                toks = rng.choices(words, k=rng.randint(1, 12))
                glue = lambda: "".join(  # noqa: E731
                    rng.choices(ws + " ", k=rng.randint(1, 3))
                )
                body = toks[0] + "".join(glue() + t for t in toks[1:])
                paras.append(glue() + body + glue() if rng.random() < 0.5 else body)
        docs.append((f"d{i}", "\n\n".join(paras)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.doc_id, r.chunk_id): (r.text, r.n_tokens)
        for r in token_splitter(df, max_length_tokens=9, separator="\n\n").collect()
    }
    want = {}
    for doc_id, text in docs:
        for ci, (t, n) in enumerate(_reference_split(text, 9, "\n\n", _ws_count)):
            want[(doc_id, ci)] = (t, n)
    assert got == want


def test_token_splitter_injectable_tokenizer(spark):
    """An injected tokenizer (chars-as-tokens fake) changes the packing;
    a single over-budget paragraph still forms its own chunk."""
    def char_tokenizer(texts):
        return [list(t) for t in texts]

    df = spark.createDataFrame(
        [("a", "xxxxx\n\nyy\n\nzzz")], ["id", "text"]
    )
    out = token_splitter(
        df, max_length_tokens=6, separator="\n\n", tokenizer=char_tokenizer
    ).collect()
    want = _reference_split("xxxxx\n\nyy\n\nzzz", 6, "\n\n", len)
    assert [(r.text, r.n_tokens) for r in sorted(out, key=lambda r: r.chunk_id)] == want
    # first paragraph + sep is already 7 > 6 tokens but starts the chunk
    assert out[0].n_tokens > 6


def test_token_splitter_blank_document_emits_no_rows(spark):
    df = spark.createDataFrame([("a", "  \n\n   "), ("b", "hi")], ["id", "text"])
    rows = token_splitter(df, max_length_tokens=5).collect()
    assert [(r.id, r.text) for r in rows] == [("b", "hi")]


def test_merge_chunks_rules(spark):
    """Dedup on (group, chunk_id) keeps the lexicographically-smallest
    remaining-column struct (deterministic stand-in for the reference's
    task-order keep="first"); no-content/empty chunks dropped; text
    fields concatenated in chunk order; sum columns summed; other columns
    from the lowest chunk id; over-long merged docs dropped
    (merge_chunks.py:84-133)."""
    rows = [
        # url, chunk_id, cleaned_text, text, num_generated_tokens, lang
        ("u1", 1, "world", "w0", 2, "en"),
        ("u1", 0, "hello", "h0", 3, "en"),
        ("u1", 1, "zz-DUPLICATE", "dup", 9, "xx"),   # dedup: min-struct (u1,1) wins
        ("u1", 2, "NO USEFUL CONTENT", "n0", 5, "en"),  # marker: dropped
        ("u2", 0, "", "e0", 1, "fr"),                 # empty: dropped -> u2 gone
        ("u3", 0, "x" * 30, "r0", 1, "de"),           # over max_text_length
        ("u4", 5, "tail", "t5", 1, "pt"),
        ("u4", 2, "head", "t2", 4, "pt"),
    ]
    df = spark.createDataFrame(
        rows, ["url", "chunk_id", "cleaned_text", "text", "num_generated_tokens", "lang"]
    )
    out = merge_chunks(df, max_text_length=20)
    got = {r.url: r for r in out.collect()}
    assert set(got) == {"u1", "u4"}
    assert got["u1"].cleaned_text == "hello\nworld"
    assert got["u1"].text == "h0\nw0"
    assert got["u1"].num_generated_tokens == 5
    assert got["u1"].lang == "en"
    assert got["u4"].cleaned_text == "head\ntail"
    assert got["u4"].num_generated_tokens == 5
    assert got["u4"].lang == "pt"


def test_merge_chunks_plan_single_shuffle(spark):
    """The merge is ONE hash aggregation on the group key — no window, no
    global sort (array_sort orders within each collected document)."""
    df = spark.createDataFrame(
        [("u", 0, "a", "r", 1, "en")],
        ["url", "chunk_id", "cleaned_text", "text", "num_generated_tokens", "lang"],
    )
    plan = merge_chunks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan.split("Exchange")[0] or "SortAggregate" not in plan
    assert plan.count("Exchange") <= 2  # dedup + groupBy on the same key


class TestLLMCleanup:
    def test_gate_sort_and_generate(self, spark):
        from curator_spark.operators.chunking import llm_cleanup

        rows = [(i, f"chunk {i}", (i + 1) * 100) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string, n_tokens long")

        def gen(prompts):
            return ["CLEAN::" + p for p in prompts]

        out = llm_cleanup(
            df, gen, system_prompt="Fix this: {text} (run {missing})",
            max_model_len=1000,
        ).collect()
        # gate: n_tokens < 800 -> 7 rows survive; missing key -> ''
        assert len(out) == 7
        assert "n_tokens" not in out[0].asDict()
        for r in out:
            assert r.cleaned_text == f"CLEAN::Fix this: {r.text} (run )"

    def test_gate_boundary_not_truncated(self, spark):
        """n_tokens=3276 with max_model_len=4096: 3276 < 3276.8 — the
        reference keeps it; an int() on the threshold would drop it."""
        from curator_spark.operators.chunking import llm_cleanup

        df = spark.createDataFrame(
            [(1, "keep", 3276), (2, "drop", 3277)],
            "doc_id long, text string, n_tokens long",
        )
        out = llm_cleanup(df, lambda p: list(p), system_prompt="{text}",
                          max_model_len=4096).collect()
        assert [r.text for r in out] == ["keep"]

    def test_gate_requires_max_model_len(self, spark):
        from curator_spark.operators.chunking import llm_cleanup

        df = spark.createDataFrame([(1, "t", 5)], "doc_id long, text string, n_tokens long")
        with pytest.raises(ValueError, match="max_model_len"):
            llm_cleanup(df, lambda p: p)

    def test_qwen3_no_think_switch_and_template_fallback(self, spark):
        from curator_spark.operators.chunking import llm_cleanup

        df = spark.createDataFrame([("doc",)], "text string")

        def gen(prompts):
            return list(prompts)  # echo: the prompt IS the output

        # qwen3-only model without a dot -> /no_think appended
        (r,) = llm_cleanup(
            df, gen, system_prompt="P {text}", model_name="Qwen3-32B"
        ).collect()
        assert r.cleaned_text == "P doc /no_think"
        # qwen3.5 dropped the switch
        (r,) = llm_cleanup(
            df, gen, system_prompt="P {text}", model_name="Qwen3.5-7B"
        ).collect()
        assert r.cleaned_text == "P doc"
        # chat_template applied; a failing template falls back to raw
        (r,) = llm_cleanup(
            df, gen, system_prompt="P {text}", model_name="Qwen3-32B",
            chat_template=lambda msgs: f"<sys>{msgs[0]['content']}</sys><u>{msgs[1]['content']}</u>",
        ).collect()
        assert r.cleaned_text == "<sys> /no_think</sys><u>P doc /no_think</u>"

        def bad_template(msgs):
            raise ValueError("no template")

        (r,) = llm_cleanup(
            df, gen, system_prompt="P {text}", chat_template=bad_template
        ).collect()
        assert r.cleaned_text == "P doc"

    def test_classification_mode_drops_text(self, spark):
        from curator_spark.operators.chunking import llm_cleanup

        df = spark.createDataFrame([("good doc",), ("bad doc",)], "text string")

        def gen(prompts):
            return ["keep" if "good" in p else "drop" for p in prompts]

        out = llm_cleanup(df, gen, system_prompt="{text}", classification=True)
        assert out.columns == ["label"]
        assert sorted(r.label for r in out.collect()) == ["drop", "keep"]

    def test_seam_required(self, spark):
        from curator_spark.operators.chunking import llm_cleanup

        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(NotImplementedError):
            llm_cleanup(df, None)
