"""Translation data-prep stages: kernels + Spark operators.

Reference semantics: stages/text/experimental/translation/ —
segmentation.py, reassembly.py, skipped_rows.py,
format_translation_output.py, merge_faith_scores.py, utils/field_paths.py,
utils/metadata.py.
"""

from __future__ import annotations

import json

import pytest

from curator_spark.kernels import translation as ker
from curator_spark.operators import translation as tr


# ---------------------------------------------------------------------------
# kernel: translatability + coarse segmentation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    ("line", "ok"),
    [
        ("plain words", True),
        ("  indented words  ", True),
        ("12345 67", False),  # no alphabetic char
        ("", False),
        ("   ", False),
        ("<tag>", False),
        ("<a href='x'>text</a>", False),  # starts < ends > — tag-shaped
        ("< not a tag", True),
        ('{"a": 1}', False),  # JSON object
        ("[1, 2, 3]", False),  # JSON array... no alpha anyway
        ('["a", "b"]', False),  # JSON array with alpha
        ("{not json}", True),  # brace-shaped but unparseable
        ("{}", False),  # parses, but no alpha either
        ('{"a": "text"}', False),
    ],
)
def test_is_line_translatable(line, ok):
    assert ker.is_line_translatable(line) is ok


def test_coarse_segment_grid():
    text = (
        "Intro line.\n"
        "```\n"
        "code stays verbatim\n"
        "```\n"
        "  two-space indent\n"
        "<tag>\n"
        '{"a": 1}\n'
        "12345\n"
        "\n"
        "tail"
    )
    segs, meta = ker.segment_coarse(text)
    assert segs == ["Intro line.", "two-space indent", "tail"]
    assert meta["leading_spaces"] == ["", "  ", ""]
    assert meta["original_stripped_lines"] == segs
    # template holds every non-translatable line verbatim, None per segment
    assert meta["template"] == [
        None, "```", "code stays verbatim", "```", None,
        "<tag>", '{"a": 1}', "12345", "", None,
    ]
    # identity translation reconstructs the original exactly
    assert ker._reassemble_coarse(meta, segs) == text


def test_coarse_unclosed_fence_freezes_tail():
    segs, meta = ker.segment_coarse("before\n```\nafter fence\nstill code")
    assert segs == ["before"]
    assert ker._reassemble_coarse(meta, ["BEFORE"]) == (
        "BEFORE\n```\nafter fence\nstill code"
    )


def test_coarse_trailing_whitespace_rides_in_segment():
    # the reference strips only the LEFT side: line[num_leading:]
    segs, meta = ker.segment_coarse("  padded both sides  ")
    assert segs == ["padded both sides  "]
    assert ker._reassemble_coarse(meta, segs) == "  padded both sides  "


def test_coarse_missing_segments_become_empty_lines():
    _, meta = ker.segment_coarse("one\ntwo")
    assert ker._reassemble_coarse(meta, ["ONE"]) == "ONE\n"


# ---------------------------------------------------------------------------
# kernel: fine segmentation (structure invariant)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text",
    [
        "One sentence. Another one! A third?",
        "Leading   spaces.  And trailing   ",
        "bullets • inline · and ○ more",
        "tabs\tand\nnewlines\nmix",
        "runs --- of === punctuation !! here",
        "no terminal punctuation at all",
        "",
        "   \n\t  ",
        "a.b (no space: one sentence) end.",
        "Ellipsis… then ...... dots.",
    ],
)
def test_fine_units_reconstruct_exactly(text):
    units = ker.units_with_structure(text)
    assert "".join(u + s for u, s in units) == text


def test_fine_special_separators_split_within_sentence():
    segs, meta = ker.segment_fine("alpha • beta\tgamma")
    assert segs == ["alpha", "beta", "gamma"]
    assert ker._reassemble_fine(meta, ["A", "B", "C"]) == "A • B\tC"


def test_fine_leading_whitespace_owns_empty_unit():
    # _append_stripped_unit: leading ws becomes its own ("", ws) unit
    segs, meta = ker.segment_fine("   padded unit   • next")
    assert segs == ["padded unit", "next"]
    rebuilt = ker._reassemble_fine(meta, segs)
    assert rebuilt == "   padded unit   • next"


def test_fine_nontranslatable_units_frozen():
    segs, meta = ker.segment_fine("Words here. 12345. <tag> end.")
    assert "12345." not in segs
    rebuilt = ker._reassemble_fine(meta, ["X." for _ in segs])
    assert "12345." in rebuilt and "X." in rebuilt


def test_fine_custom_sentencizer_seam():
    # a span source that halves the text — any span set keeps the invariant
    def halves(t):
        mid = len(t) // 2
        return [(0, mid), (mid, len(t))] if t else []

    text = "abcdef ghijkl"
    units = ker.units_with_structure(text, sentencizer=halves)
    assert "".join(u + s for u, s in units) == text


def test_fine_exhausted_segments_fall_back_to_original():
    segs, meta = ker.segment_fine("One two. Three four.")
    assert len(segs) == 2
    assert ker._reassemble_fine(meta, ["UNO."]) == "UNO. Three four."


# ---------------------------------------------------------------------------
# kernel: field paths
# ---------------------------------------------------------------------------


def test_wildcard_extract_and_set_roundtrip():
    rec = {"messages": [{"role": "u", "content": "hi"}, {"role": "a", "content": "yo"}]}
    got = ker.extract_nested_fields(rec, "messages.*.content")
    assert got == ["hi", "yo"]
    updated = ker.set_nested_fields(rec, "messages.*.content", ["HI", "YO"])
    assert [m["content"] for m in updated["messages"]] == ["HI", "YO"]
    assert rec["messages"][0]["content"] == "hi"  # deep copy


def test_nested_nonstring_leaves_skipped():
    rec = {"m": [{"c": "a"}, {"c": 7}, {"c": "b"}]}
    assert ker.extract_nested_fields(rec, "m.*.c") == ["a", "b"]
    updated = ker.set_nested_fields(rec, "m.*.c", ["A", "B"])
    assert [x["c"] for x in updated["m"]] == ["A", 7, "B"]


def test_parse_structured_value():
    assert ker.parse_structured_value('{"a": 1}') == {"a": 1}
    assert ker.parse_structured_value([1]) == [1]
    assert ker.parse_structured_value("5") is None  # scalar JSON rejected
    assert ker.parse_structured_value("not json") is None


# ---------------------------------------------------------------------------
# kernel: document segmentation + reassembly (multi-field)
# ---------------------------------------------------------------------------


def test_segment_document_multi_field_envelope_and_offsets():
    row = {
        "text": "first doc line\nsecond doc line",
        "messages": json.dumps(
            [{"content": "msg one"}, {"content": "msg two"}]
        ),
    }
    segs, meta_json = ker.segment_document(
        row, ["text", "messages.*.content"], mode="coarse"
    )
    assert segs == ["first doc line", "second doc line", "msg one", "msg two"]
    meta = json.loads(meta_json)
    assert [fm["field_path"] for fm in meta["field_metadatas"]] == [
        "text", "messages.*.content", "messages.*.content",
    ]
    # reassembly consumes segments in the same offset order
    out = ker.reassemble_document(
        meta_json, [s.upper() for s in segs], dict(row), text_field="text"
    )
    tmap = json.loads(out["_translation_map"])
    assert tmap["text"] == "FIRST DOC LINE\nSECOND DOC LINE"
    assert tmap["content"] == ["MSG ONE", "MSG TWO"]
    # multi-path payload serialized as JSON (typed-engine deviation)
    assert json.loads(out["translated_text"]) == tmap


def test_reassemble_single_nested_path_updates_structure():
    row = {"messages": json.dumps([{"content": "hello"}, {"content": "bye"}])}
    segs, meta_json = ker.segment_document(row, ["messages.*.content"])
    out = ker.reassemble_document(
        meta_json, [s.upper() for s in segs], dict(row),
        text_field="messages.*.content", replace_source_fields=True,
    )
    updated = json.loads(out["messages"])
    assert [m["content"] for m in updated] == ["HELLO", "BYE"]
    assert json.loads(out["translated_text"]) == updated


def test_min_segment_chars_passthrough():
    segs, meta_json = ker.segment_document(
        {"text": "tiny"}, ["text"], min_segment_chars=10
    )
    assert segs == ["tiny"]
    fm = json.loads(meta_json)["field_metadatas"][0]
    assert fm["mode"] == "passthrough" and fm["original_text"] == "tiny"
    out = ker.reassemble_document(meta_json, ["TINY"], {"text": "tiny"})
    assert out["translated_text"] == "TINY"


def test_count_segments_in_meta():
    assert ker.count_segments_in_meta({"mode": "passthrough"}) == 1
    assert ker.count_segments_in_meta(
        {"mode": "coarse", "template": [None, "x", None]}
    ) == 2
    assert ker.count_segments_in_meta(
        {"mode": "fine", "units": [{"translatable": True}, {"translatable": False}]}
    ) == 1
    assert ker.count_segments_in_meta({"mode": "???"}) == 0


# ---------------------------------------------------------------------------
# kernel: FAITH + metadata envelopes
# ---------------------------------------------------------------------------


def test_faith_averages_ignore_zero_scores():
    scores = [
        {"Fluency": 4.0, "Accuracy": 0.0},
        {"Fluency": 2.0, "Accuracy": 3.0},
    ]
    avg = ker.average_faith_scores(scores)
    assert avg["Fluency"] == 3.0
    assert avg["Accuracy"] == 3.0  # zero segment excluded from the mean
    assert avg["Idiomaticity"] == 0.0
    # faith_avg averages only the non-zero dimensions
    assert ker.compute_faith_avg(avg) == pytest.approx(3.0)
    assert ker.compute_faith_avg({}) == 0.0


def test_build_translation_metadata_json_shape():
    meta = ker.build_translation_metadata("de", translated_text="hallo")
    assert meta == (
        '{"target_lang": "de", "translation": {"content": "hallo"}, '
        '"segmented_translation": []}'
    )
    meta2 = ker.build_translation_metadata(
        "de", translation_map={"text": "x"}, segmented_translation_map={"text": []}
    )
    assert json.loads(meta2)["translation"] == {"text": "x"}


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("〘hallo welt〙", "hallo welt"),  # plain wrapper
        ("noise 〘a〙 trailing 〘b〙", "b"),  # last wrapper wins
        ("prefix 〘tail only", "tail only"),  # lone opener takes the tail
        ("no wrapper at all", "no wrapper at all"),  # passthrough
        ("〙 closer before 〘opener", "opener"),  # closer precedes opener
        ("", ""),
    ],
)
def test_unwrap_translation(raw, expected):
    assert ker.unwrap_translation(raw) == expected


def test_build_translation_messages_shape():
    msgs = ker.build_translation_messages("Guten Tag", "de", "en")
    assert [m["role"] for m in msgs] == ["system", "user"]
    assert msgs[0]["content"] == ker.TRANSLATE_SYSTEM_PROMPT
    body = msgs[1]["content"]
    # language names resolved, not raw codes; segment in the {src} slot
    assert "German source text to English" in body
    assert body.endswith("German: Guten Tag")
    assert "〘〙" in body  # wrapper instruction present
    # custom template override (the reference's prompt_path contract)
    custom = ker.build_translation_messages(
        "x", "zz", "en", user_template="{source_lang}->{target_lang}:{src}"
    )
    assert custom[1]["content"] == "zz->English:x"  # unknown code passes through


def test_get_language_name_fallbacks():
    assert ker.get_language_name("") == ""
    assert ker.get_language_name("DE") == "German"
    assert ker.get_language_name("tlh") == "tlh"  # unknown -> code itself


def test_make_llm_translator_adapter():
    calls = []

    def fake_llm(messages):
        calls.append(messages)
        src = messages[1]["content"].rsplit(": ", 1)[-1]
        return f"Sure! Here it is: 〘{src.upper()}〙"

    tr_fn = ker.make_llm_translator(fake_llm, "de", "en")
    assert tr_fn(["hallo welt", "zwei"]) == ["HALLO WELT", "ZWEI"]
    assert len(calls) == 2
    assert calls[0][0]["content"] == ker.TRANSLATE_SYSTEM_PROMPT


def test_make_llm_translator_through_spark(spark):
    df = spark.createDataFrame([(1, "one line\ntwo line")], ["doc_id", "text"])
    seg = tr.segment_documents(df, doc_id_field="doc_id")
    trn = tr.translate_segments(
        seg,
        translator=ker.make_llm_translator(
            lambda msgs: "〘" + msgs[1]["content"].rsplit(": ", 1)[-1].upper() + "〙",
            "en",
            "de",
        ),
    )
    out = tr.reassemble_documents(trn)
    assert out.collect()[0]["translated_text"] == "ONE LINE\nTWO LINE"


def test_merge_faith_scores_into_metadata():
    merged = ker.merge_faith_scores_into_metadata(
        '{"target_lang": "de"}', {"Fluency": 4.5, "average": 4.5}
    )
    obj = json.loads(merged)
    assert obj["target_lang"] == "de" and obj["faith_scores"]["average"] == 4.5
    assert json.loads(ker.merge_faith_scores_into_metadata("garbage{", {"a": 1})) == {
        "faith_scores": {"a": 1}
    }


def test_reconstruct_messages():
    msgs = [{"role": "u", "content": "a"}, {"role": "b", "content": "b"}]
    out = ker.reconstruct_messages_with_translation(msgs, "X\n---\nY")
    assert [m["content"] for m in out] == ["X", "Y"]
    # fewer parts than messages: later messages untouched
    out2 = ker.reconstruct_messages_with_translation(msgs, "only")
    assert [m["content"] for m in out2] == ["only", "b"]
    # structured payload replaces wholesale
    out3 = ker.reconstruct_messages_with_translation(
        msgs, '[{"role": "s", "content": "z"}]'
    )
    assert out3 == [{"role": "s", "content": "z"}]
    # JSON array of non-dicts is NOT structured messages -> text path
    out4 = ker.reconstruct_messages_with_translation(msgs, '["z"]')
    assert out4[0]["content"] == '["z"]'
    assert ker.reconstruct_messages_with_translation([], "x") == []


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


@pytest.fixture()
def docs_df(spark):
    text = (
        "Intro line.\n"
        "```\n"
        "code()\n"
        "```\n"
        "  indented body\n"
        "<tag>\n"
        '{"a": 1}\n'
        "tail line"
    )
    return spark.createDataFrame(
        [(1, text, 0), (2, "single line", 0), (3, "", 0), (4, "skip me", 7)],
        ["doc_id", "text", "flagged"],
    )


def test_spark_coarse_roundtrip_upper(spark, docs_df):
    seg = tr.segment_documents(
        docs_df, text_field="text", mode="coarse",
        skipme_field="flagged", doc_id_field="doc_id",
    )
    trn = tr.translate_segments(seg, translator=lambda xs: [x.upper() for x in xs])
    out = {
        r["doc_id"]: r
        for r in tr.reassemble_documents(trn, text_field="text").collect()
    }
    assert out[1]["translated_text"] == (
        "INTRO LINE.\n```\ncode()\n```\n  INDENTED BODY\n<tag>\n"
        '{"a": 1}\nTAIL LINE'
    )
    assert out[2]["translated_text"] == "SINGLE LINE"
    assert out[3]["translated_text"] == ""  # zero-segment doc
    assert out[4]["translated_text"] == ""  # skipme passthrough
    assert out[4]["flagged"] == 7  # original columns survive
    assert all(r["translation_errors"] == "" for r in out.values())


def test_spark_fine_identity_reconstructs_original(spark):
    texts = [
        "One sentence. Two sentences!  Three?",
        "bullets • and\ttabs\nnewlines --- runs",
        "no punctuation",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    seg = tr.segment_documents(df, mode="fine", doc_id_field="doc_id")
    trn = tr.translate_segments(seg, translator=lambda xs: list(xs))
    out = {
        r["doc_id"]: r["translated_text"]
        for r in tr.reassemble_documents(trn).collect()
    }
    assert [out[i] for i in range(len(texts))] == texts


def test_spark_dry_run_and_missing_translator(spark, docs_df):
    seg = tr.segment_documents(docs_df, doc_id_field="doc_id")
    dry = tr.translate_segments(seg, dry_run=True)
    assert {r["_translated"] for r in dry.collect()} == {""}
    with pytest.raises(NotImplementedError, match="translator"):
        tr.translate_segments(seg)


def test_spark_nontranslatable_segments_skip_backend(spark):
    """translate.py:222-227 — pure code/JSON/tag segments (reaching the
    translate stage via passthrough-mode texts) pass through VERBATIM
    without a backend call; empty segments come back as ''."""
    df = spark.createDataFrame(
        [
            (1, "12345\n67890"),  # numeric-only: no alpha
            (2, '{"tool": "lookup", "payload": {"model": "x"}}'),
            (3, "<hr/>"),
            (4, "real translatable words"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    # min_segment_chars large: every text is one passthrough segment,
    # so non-translatable content reaches the translator stage intact
    seg = tr.segment_documents(df, min_segment_chars=1000, doc_id_field="doc_id")

    def strict_upper(xs):
        # a non-translatable segment reaching the backend would raise,
        # surfacing as an error row + '' instead of the verbatim text
        for x in xs:
            if not any(c.isalpha() for c in x) or x.startswith(("<", "{")):
                raise AssertionError(f"backend saw gated segment: {x!r}")
        return [x.upper() for x in xs]

    out = {
        r["doc_id"]: r["translated_text"]
        for r in tr.reassemble_documents(
            tr.translate_segments(seg, translator=strict_upper)
        ).collect()
    }
    assert out[1] == "12345\n67890"  # verbatim, not uppercased
    assert out[2] == '{"tool": "lookup", "payload": {"model": "x"}}'
    assert out[3] == "<hr/>"
    assert out[4] == "REAL TRANSLATABLE WORDS"
    assert out[5] == ""


def test_spark_translator_error_capture(spark):
    df = spark.createDataFrame(
        [(1, "good line\npoison line\nfine line")], ["doc_id", "text"]
    )

    def flaky(xs):
        if any("poison" in x for x in xs):
            raise RuntimeError("boom")
        return [x.upper() for x in xs]

    seg = tr.segment_documents(df, doc_id_field="doc_id")
    out = tr.reassemble_documents(
        tr.translate_segments(seg, translator=flaky)
    ).collect()[0]
    # the poisoned segment becomes an empty line, the rest translate
    assert out["translated_text"] == "GOOD LINE\n\nFINE LINE"
    assert "RuntimeError: boom" in out["translation_errors"]


def test_spark_skip_and_restore(spark):
    df = spark.createDataFrame(
        [(1, "a", ""), (2, "b", "done already"), (3, "c", None)],
        ["doc_id", "text", "translated_text"],
    )
    todo, skipped = tr.skip_existing_translations(df)
    assert sorted(r["doc_id"] for r in todo.collect()) == [1, 3]
    assert [r["doc_id"] for r in skipped.collect()] == [2]

    translated = todo.withColumn(
        "translated_text", todo["text"]
    ).withColumn("translation_time", tr.F.lit(1.5))
    merged = tr.restore_skipped_rows(translated, skipped)
    rows = {r["doc_id"]: r for r in merged.collect()}
    assert rows[2]["translated_text"] == "done already"
    assert rows[2]["translation_time"] == 0.0  # reference default
    assert rows[1]["translation_time"] == 1.5

    # column absent -> everything needs translation, empty skipped side
    todo2, skipped2 = tr.skip_existing_translations(df.drop("translated_text"))
    assert todo2.count() == 3 and skipped2.count() == 0


def test_spark_format_output_modes(spark):
    df = spark.createDataFrame([(1, "src", "übersetzt")], ["doc_id", "text", "translated_text"])
    raw = tr.format_translation_output(df, target_lang="de", output_mode="raw")
    assert "translated_text" not in raw.columns
    meta = json.loads(raw.collect()[0]["translation_metadata"])
    assert meta == {
        "target_lang": "de",
        "translation": {"content": "übersetzt"},
        "segmented_translation": [],
    }
    # byte parity with json.dumps(..., ensure_ascii=False)
    assert raw.collect()[0]["translation_metadata"] == ker.build_translation_metadata(
        "de", translated_text="übersetzt"
    )

    both = tr.format_translation_output(df, target_lang="de", output_mode="both")
    assert {"translated_text", "translation_metadata"} <= set(both.columns)
    replaced = tr.format_translation_output(df, target_lang="de")
    assert "translation_metadata" not in replaced.columns

    with pytest.raises(ValueError, match="target_lang"):
        tr.format_translation_output(df, target_lang="  ")


def test_spark_helper_maps_feed_format(spark):
    df = spark.createDataFrame([(1, "line one\nline two")], ["doc_id", "text"])
    seg = tr.segment_documents(df, doc_id_field="doc_id")
    trn = tr.translate_segments(seg, translator=lambda xs: [x.upper() for x in xs])
    re_df = tr.reassemble_documents(trn, emit_metadata_helpers=True)
    formatted = tr.format_translation_output(re_df, target_lang="fr", output_mode="raw")
    meta = json.loads(formatted.collect()[0]["translation_metadata"])
    assert meta["translation"] == {"text": "LINE ONE\nLINE TWO"}
    assert meta["segmented_translation"]["text"] == [
        {"src": "line one", "tgt": "LINE ONE"},
        {"src": "line two", "tgt": "LINE TWO"},
    ]
    # helper columns are consumed, not leaked
    assert "_translation_map" not in formatted.columns


def test_spark_reconstruct_messages_and_wildcard(spark):
    messages = json.dumps(
        [{"role": "u", "content": "hello there"}, {"role": "a", "content": "general"}]
    )
    df = spark.createDataFrame([(1, messages)], ["doc_id", "messages"])
    seg = tr.segment_documents(
        df, text_field="messages.*.content", doc_id_field="doc_id"
    )
    trn = tr.translate_segments(seg, translator=lambda xs: [x.upper() for x in xs])
    re_df = tr.reassemble_documents(
        trn, text_field="messages.*.content", replace_source_fields=True
    )
    row = re_df.collect()[0]
    assert [m["content"] for m in json.loads(row["messages"])] == [
        "HELLO THERE", "GENERAL",
    ]
    formatted = tr.format_translation_output(
        re_df, target_lang="de", reconstruct_messages=True
    )
    rebuilt = json.loads(formatted.collect()[0]["translated_messages"])
    # translated payload is the updated JSON array -> structured replacement
    assert [m["content"] for m in rebuilt] == ["HELLO THERE", "GENERAL"]


def test_spark_faith_aggregation_and_merge(spark):
    df = spark.createDataFrame([(1, "one line\ntwo line")], ["doc_id", "text"])
    seg = tr.segment_documents(df, doc_id_field="doc_id")
    trn = tr.translate_segments(seg, translator=lambda xs: [x.upper() for x in xs])
    scored = (
        trn.withColumn(
            "faith_fluency",
            tr.F.when(tr.F.col("_seg_idx") == 0, 4.0).otherwise(2.0),
        )
        .withColumn("faith_accuracy", tr.F.lit(0.0))
        .withColumn("faith_idiomaticity", tr.F.lit(3.0))
        .withColumn("faith_terminology", tr.F.lit(0.0))
        .withColumn("faith_handling_of_format", tr.F.lit(0.0))
    )
    re_df = tr.reassemble_documents(scored, aggregate_faith_scores=True)
    row = re_df.collect()[0]
    assert row["faith_fluency"] == 3.0
    assert row["faith_accuracy"] == 0.0
    assert row["faith_avg"] == pytest.approx(3.0)
    assert len(json.loads(row["faith_segment_scores"])) == 2

    merged = tr.merge_faith_scores(
        tr.format_translation_output(re_df, target_lang="de", output_mode="both")
    )
    meta = json.loads(merged.collect()[0]["translation_metadata"])
    assert meta["faith_scores"]["Fluency"] == 3.0
    assert meta["faith_scores"]["average"] == pytest.approx(3.0)
    # no faith columns -> passthrough
    assert tr.merge_faith_scores(df).columns == df.columns


# ---------------------------------------------------------------------------
# kernel: FAITH evaluation (evaluation/faith.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    ("text", "expected"),
    [
        ('{"Fluency": 4}', '{"Fluency": 4}'),
        ('noise {"a": 1} tail', '{"a": 1}'),
        # brace inside a string literal must not anchor the scan
        ('message: "{pre}" scores: {"Fluency": 4}', '{"Fluency": 4}'),
        # nested object returns the OUTER balanced block
        ('{"scores": {"Fluency": 4}}', '{"scores": {"Fluency": 4}}'),
        # closing brace inside a value string must not unbalance
        ('{"a": "}"} tail', '{"a": "}"}'),
        # escaped quote inside a string
        ('{"a": "\\"}", "b": 1}', '{"a": "\\"}", "b": 1}'),
        ("no braces here", None),
        ('only "{in string}" braces', None),
        ('{"unbalanced": 1', None),
    ],
)
def test_extract_json_object(text, expected):
    assert ker.extract_json_object(text) == expected


def test_extract_faith_scores_happy_path():
    resp = (
        'Here you go: {"Fluency": 5, "Accuracy": 4, "Idiomaticity": 3,'
        ' "Terminology": 0, "Handling_of_Format": "2"}'
    )
    scores, failed = ker.extract_faith_scores(resp)
    assert failed is False
    assert scores == {
        "Fluency": 5.0,
        "Accuracy": 4.0,
        "Idiomaticity": 3.0,
        "Terminology": 0.0,
        "Handling_of_Format": 2.0,
    }
    # faith.py:336-340 — zero dims excluded from the average
    assert ker.compute_faith_avg(scores) == pytest.approx((5 + 4 + 3 + 2) / 4)


@pytest.mark.parametrize(
    "bad",
    ["", "no json at all", '{"Fluency": }', "[1, 2, 3]"],
)
def test_extract_faith_scores_parse_failures(bad):
    scores, failed = ker.extract_faith_scores(bad)
    assert failed is True
    assert set(scores) == set(ker.FAITH_DIMENSIONS.values())
    assert all(v == 0.0 for v in scores.values())


def test_extract_faith_scores_missing_and_nonnumeric_keys_zero():
    scores, failed = ker.extract_faith_scores('{"Fluency": "high", "Accuracy": 4}')
    assert failed is False
    assert scores["Fluency"] == 0.0  # non-numeric -> 0.0 (faith.py:477-479)
    assert scores["Accuracy"] == 4.0
    assert scores["Terminology"] == 0.0  # missing -> 0.0


def test_build_faith_messages_shape():
    msgs = ker.build_faith_messages("bonjour", "hello", "fr", "en")
    assert [m["role"] for m in msgs] == ["system", "user"]
    sys_c, usr_c = msgs[0]["content"], msgs[1]["content"]
    # language names resolved (faith.py:348-349)
    assert "French" in sys_c and "English" in sys_c
    # the {{ }} escapes render as literal JSON braces in the rubric
    assert '"Fluency": score' in sys_c and sys_c.rstrip().endswith("'}'.")
    assert "bonjour" in usr_c and "hello" in usr_c
    assert "Source text (French)" in usr_c
    assert "Translated text (English)" in usr_c


def test_make_llm_faith_scorer_adapter():
    seen = []

    def fake_llm(messages):
        seen.append(messages)
        return '{"Fluency": 4, "Accuracy": 4, "Idiomaticity": 4, "Terminology": 4, "Handling_of_Format": 4}'

    scorer = ker.make_llm_faith_scorer(fake_llm, "de", "en")
    out = scorer(["eins", "zwei"], ["one", "two"])
    assert len(out) == 2 and len(seen) == 2
    assert "eins" in seen[0][1]["content"] and "one" in seen[0][1]["content"]
    scores, failed = ker.extract_faith_scores(out[0])
    assert failed is False and scores["Fluency"] == 4.0


# ---------------------------------------------------------------------------
# Spark operators: score_faith / faith_threshold_filter
# ---------------------------------------------------------------------------


def _canned_scorer(calls=None):
    """Fake scorer seam: score by marker in the translated text."""

    def scorer(sources, translations):
        if calls is not None:
            calls.append((list(sources), list(translations)))
        out = []
        for t in translations:
            if "GOOD" in t:
                out.append(
                    '{"Fluency": 5, "Accuracy": 5, "Idiomaticity": 5,'
                    ' "Terminology": 5, "Handling_of_Format": 5}'
                )
            elif "BAD" in t:
                out.append(
                    '{"Fluency": 1, "Accuracy": 1, "Idiomaticity": 1,'
                    ' "Terminology": 1, "Handling_of_Format": 1}'
                )
            else:
                out.append("sorry, no JSON for you")
        return out

    return scorer


def test_score_faith_columns_filter_and_blank_skip(spark):
    df = spark.createDataFrame(
        [
            (1, "src a", "GOOD translation"),
            (2, "src b", "BAD translation"),
            (3, "src c", "mangled response"),  # parse-failed -> kept
            (4, "", ""),  # both blank -> never sent to scorer
        ],
        ["doc_id", "text", "translated_text"],
    )
    kept = tr.score_faith(df, scorer=_canned_scorer(), threshold=2.5)
    rows = {r["doc_id"]: r for r in kept.collect()}
    # BAD (avg 1.0) dropped; blank row (avg 0.0, not parse-failed) dropped
    assert set(rows) == {1, 3}
    assert rows[1]["faith_avg"] == pytest.approx(5.0)
    assert rows[1]["faith_fluency"] == 5.0
    assert rows[1]["faith_parse_failed"] is False
    assert rows[3]["faith_parse_failed"] is True
    assert rows[3]["faith_avg"] == 0.0


def test_score_faith_filter_disabled_keeps_all_and_skips_blank(spark):
    df = spark.createDataFrame(
        [(1, "s", "GOOD"), (2, "s", "BAD"), (3, "", "")],
        ["doc_id", "text", "translated_text"],
    ).coalesce(1)
    out = tr.score_faith(
        df, scorer=_canned_scorer(), filter_enabled=False
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["faith_avg"] == pytest.approx(1.0)
    # blank row scored all-zero WITHOUT a scorer call (faith.py:246-257):
    # had it been sent, the canned scorer's non-JSON fallback response
    # would have set parse_failed=True.
    assert rows[3]["faith_avg"] == 0.0
    assert rows[3]["faith_parse_failed"] is False


def test_score_faith_batch_failure_retries_per_row(spark):
    good = (
        '{"Fluency": 5, "Accuracy": 5, "Idiomaticity": 5,'
        ' "Terminology": 5, "Handling_of_Format": 5}'
    )

    def poisoned(sources, translations):
        if any("POISON" in t for t in translations):
            raise RuntimeError("batch down")
        return [good for _ in translations]

    df = spark.createDataFrame(
        [(1, "s", "GOOD"), (2, "s", "POISON")],
        ["doc_id", "text", "translated_text"],
    ).coalesce(1)
    out = tr.score_faith(df, scorer=poisoned, filter_enabled=False)
    rows = {r["doc_id"]: r for r in out.collect()}
    # GOOD row recovered via per-row retry; poisoned row -> "" response
    # -> zeros + parse_failed (faith.py:403-415)
    assert rows[1]["faith_avg"] == pytest.approx(5.0)
    assert rows[2]["faith_parse_failed"] is True
    assert rows[2]["faith_avg"] == 0.0


def test_score_faith_requires_scorer_and_columns(spark):
    df = spark.createDataFrame([(1, "a", "b")], ["doc_id", "text", "translated_text"])
    with pytest.raises(NotImplementedError):
        tr.score_faith(df)
    with pytest.raises(ValueError, match="missing column"):
        tr.score_faith(df.drop("translated_text"), scorer=_canned_scorer())


def test_faith_threshold_filter_predicates(spark):
    df = spark.createDataFrame(
        [
            (1, 4.0, False, '[{"Fluency": 4.0}]'),  # above -> keep
            (2, 1.0, False, '[{"Fluency": 1.0}]'),  # below -> drop
            (3, 0.0, True, "[]"),  # parse-failed -> keep
            (4, 0.0, False, "[]"),  # never scored -> keep (faith.py:505-509)
        ],
        ["doc_id", "faith_avg", "faith_parse_failed", "faith_segment_scores"],
    )
    kept = {r["doc_id"] for r in tr.faith_threshold_filter(df, 2.5).collect()}
    assert kept == {1, 3, 4}
    # without the segment-scores column, never-scored rows are NOT exempt
    kept2 = {
        r["doc_id"]
        for r in tr.faith_threshold_filter(
            df.drop("faith_segment_scores"), 2.5
        ).collect()
    }
    assert kept2 == {1, 3}
    with pytest.raises(ValueError, match="missing column"):
        tr.faith_threshold_filter(df.drop("faith_avg"))


# ---------------------------------------------------------------------------
# retry_with_backoff (backends/_retry.py)
# ---------------------------------------------------------------------------


def test_retry_with_backoff_success_after_transients():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return "ok"

    assert ker.retry_with_backoff(flaky, sleep=sleeps.append) == "ok"
    assert sleeps == [1.0, 2.0]  # 2**attempt, no sleep after success


def test_retry_with_backoff_nonretryable_and_exhaustion():
    sleeps = []

    def boom():
        raise ValueError("bad input")

    with pytest.raises(ValueError):
        ker.retry_with_backoff(boom, non_retryable=(ValueError,), sleep=sleeps.append)
    assert sleeps == []  # non-retryable: raised immediately

    with pytest.raises(RuntimeError, match="nmt: all 2 attempts"):
        ker.retry_with_backoff(
            lambda: 1 / 0, max_retries=2, backend_name="nmt", sleep=sleeps.append
        )
    assert sleeps == [1.0]  # one sleep between the two attempts


def test_retry_with_backoff_cap():
    sleeps = []
    with pytest.raises(RuntimeError):
        ker.retry_with_backoff(
            lambda: 1 / 0,
            max_retries=9,
            max_backoff_seconds=5.0,
            sleep=sleeps.append,
        )
    assert sleeps == [1.0, 2.0, 4.0, 5.0, 5.0, 5.0, 5.0, 5.0]


# ---------------------------------------------------------------------------
# translation_pipeline composite (pipeline.py TranslationStage)
# ---------------------------------------------------------------------------


def _make_faith_by_marker():
    """Deterministic segment-level FAITH scorer: 'good' in src -> 5s, else
    1s. Built fresh per test so cloudpickle serializes it by value (a
    module-level helper would pickle as an unimportable module ref on
    the Python workers)."""

    def scorer(srcs, dsts):
        out = []
        for s in srcs:
            v = 5 if "good" in s else 1
            out.append(
                '{"Fluency": %d, "Accuracy": %d, "Idiomaticity": %d,'
                ' "Terminology": %d, "Handling_of_Format": %d}' % ((v,) * 5)
            )
        return out

    return scorer


def test_translation_pipeline_faith_flow(spark):
    df = spark.createDataFrame(
        [
            (1, "good line one\ngood line two"),  # seg scores 5,5 -> kept
            (2, "bad line one\nbad line two"),  # seg scores 1,1 -> dropped
        ],
        ["doc_id", "text"],
    )
    out = tr.translation_pipeline(
        df,
        source_lang="en",
        target_lang="de",
        translator=lambda xs: [x.upper() for x in xs],
        enable_faith_eval=True,
        faith_scorer=_make_faith_by_marker(),
        faith_threshold=2.5,
        doc_id_field="doc_id",
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1}  # doc 2's aggregated faith_avg 1.0 < 2.5
    assert rows[1]["translated_text"] == "GOOD LINE ONE\nGOOD LINE TWO"
    assert rows[1]["faith_avg"] == pytest.approx(5.0)
    assert rows[1]["faith_fluency"] == pytest.approx(5.0)
    segs = json.loads(rows[1]["faith_segment_scores"])
    assert len(segs) == 2 and all(s["Fluency"] == 5.0 for s in segs)


def test_translation_pipeline_skip_and_merge_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "translate me", ""),
            (2, "already done", "fertig"),  # skipped, restored with defaults
        ],
        ["doc_id", "text", "translated_text"],
    )
    out = tr.translation_pipeline(
        df,
        source_lang="en",
        target_lang="de",
        translator=lambda xs: [x.upper() for x in xs],
        enable_faith_eval=True,
        faith_scorer=_make_faith_by_marker(),
        faith_threshold=2.5,
        filter_enabled=False,
        output_mode="both",
        merge_scores=True,
        skip_translated=True,
        doc_id_field="doc_id",
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["translated_text"] == "TRANSLATE ME"
    meta1 = json.loads(rows[1]["translation_metadata"])
    assert meta1["target_lang"] == "de"
    assert "faith_scores" in meta1  # merge_scores folded doc-level FAITH in
    # the skipped row bypassed translation and kept its original value
    assert rows[2]["translated_text"] == "fertig"
    assert rows[2]["faith_segment_scores"] == "[]"
    assert rows[2]["faith_avg"] == 0.0


def test_translation_pipeline_validations(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="source_lang"):
        tr.translation_pipeline(df, " ", "de", dry_run=True)
    with pytest.raises(ValueError, match="output_mode"):
        tr.translation_pipeline(df, "en", "de", dry_run=True, output_mode="xml")
    with pytest.raises(ValueError, match="translator"):
        tr.translation_pipeline(df, "en", "de")
    with pytest.raises(ValueError, match="faith_scorer"):
        tr.translation_pipeline(
            df, "en", "de", dry_run=True, enable_faith_eval=True
        )
    with pytest.raises(ValueError, match="merge_scores"):
        tr.translation_pipeline(
            df,
            "en",
            "de",
            dry_run=True,
            enable_faith_eval=True,
            faith_scorer=_make_faith_by_marker(),
            merge_scores=True,
        )
    # dry_run without faith runs end-to-end and yields empty translations
    out = tr.translation_pipeline(df, "en", "de", dry_run=True)
    assert out.collect()[0]["translated_text"] == ""


def test_faith_threshold_filter_pushdown_plan(spark, tmp_path):
    """The precomputed-score cut is a pure Column predicate: over a
    parquet score table it must reach the scan as PushedFilters (the
    100-TB posture — a re-scored corpus is re-filtered without a Python
    stage or a full-column read)."""
    path = str(tmp_path / "faith_scores.parquet")
    spark.createDataFrame(
        [(i, float(i % 5), i % 7 == 0, "[]") for i in range(100)],
        ["doc_id", "faith_avg", "faith_parse_failed", "faith_segment_scores"],
    ).write.parquet(path)
    out = tr.faith_threshold_filter(
        spark.read.parquet(path).drop("faith_segment_scores"), 2.5
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # the OR predicate itself can't push (parse_failed side), but the
    # plan must stay entirely JVM-side: no Python evaluation anywhere
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert out.count() == sum(
        1 for i in range(100) if float(i % 5) >= 2.5 or i % 7 == 0
    )


def test_load_prompt_template(tmp_path):
    """utils/prompt_loader.py contract: builtin names resolve to the
    packaged prompts; absolute paths load user YAML with the reference's
    validation/exception types."""
    assert ker.load_prompt_template("translate.yaml") == (
        ker.TRANSLATE_SYSTEM_PROMPT, ker.TRANSLATE_USER_TEMPLATE
    )
    assert ker.load_prompt_template("faith_eval.yaml") == (
        ker.FAITH_EVAL_SYSTEM_PROMPT, ker.FAITH_EVAL_USER_TEMPLATE
    )
    with pytest.raises(FileNotFoundError):
        ker.load_prompt_template("nope.yaml")

    good = tmp_path / "p.yaml"
    good.write_text("system: SYS {target_language}\nuser: USR {source_text}\n")
    assert ker.load_prompt_template(str(good)) == (
        "SYS {target_language}", "USR {source_text}"
    )
    with pytest.raises(FileNotFoundError):
        ker.load_prompt_template(str(tmp_path / "missing.yaml"))
    bad = tmp_path / "list.yaml"
    bad.write_text("- just\n- a list\n")
    with pytest.raises(TypeError, match="top-level mapping"):
        ker.load_prompt_template(str(bad))
    partial = tmp_path / "partial.yaml"
    partial.write_text("system: only system\n")
    with pytest.raises(KeyError, match="user"):
        ker.load_prompt_template(str(partial))
    malformed = tmp_path / "malformed.yaml"
    malformed.write_text("system: [unclosed\n")
    with pytest.raises(ValueError, match="Malformed"):
        ker.load_prompt_template(str(malformed))


def test_segment_skipme_null_flag_not_skipped(spark):
    """A NULL skip flag must mean NOT skipped (it arrives as NaN in the
    Arrow batch for nullable numeric columns; NaN != 0 is True)."""
    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("flagged", IntegerType(), True),
        ]
    )
    df = spark.createDataFrame(
        [(1, "translate me", None), (2, "skip me", 1), (3, "also do me", 0)],
        schema,
    )
    seg = tr.segment_documents(df, skipme_field="flagged", doc_id_field="doc_id")
    trn = tr.translate_segments(seg, translator=lambda xs: [x.upper() for x in xs])
    out = tr.reassemble_documents(trn)
    rows = {r["doc_id"]: r["translated_text"] for r in out.collect()}
    assert rows[1] == "TRANSLATE ME"  # NULL flag -> translated
    assert rows[2] == ""  # real flag -> skipped
    assert rows[3] == "ALSO DO ME"  # zero flag -> translated


def test_reassemble_legacy_single_field_metadata(spark):
    """reassembly.py legacy branch: metadata WITHOUT the field_metadatas
    envelope (the kernel's single-field shape) must keep its translated
    segments instead of being zeroed as a pad row."""
    _, meta = ker.segment_coarse("hello line")
    legacy_meta = json.dumps(meta, ensure_ascii=False)
    df = spark.createDataFrame(
        [(1, "hello line", "d1", legacy_meta, 0, "hello line", "HELLO LINE", 0.0, "")],
        [
            "doc_id", "text", "_seg_doc_id", "_seg_metadata", "_seg_idx",
            "_seg_segments", "_translated", "_translation_time",
            "_translation_error",
        ],
    )
    out = tr.reassemble_documents(df)
    assert out.collect()[0]["translated_text"] == "HELLO LINE"


def test_kernel_wildcard_handles_arrow_ndarray():
    """Spark hands array<struct> columns to pandas UDFs as numpy object
    arrays; the wildcard walk must treat them as lists (a regression
    here is a whole-corpus silent no-op: zero segments extracted)."""
    import numpy as np

    msgs = np.array(
        [{"role": "u", "content": "hello"}, {"role": "a", "content": "there"}],
        dtype=object,
    )
    assert ker.parse_structured_value(msgs) == [
        {"role": "u", "content": "hello"},
        {"role": "a", "content": "there"},
    ]
    assert ker.extract_nested_fields(
        {"messages": ker.parse_structured_value(msgs)}, "messages.*.content"
    ) == ["hello", "there"]
    segs, meta = ker.segment_document({"messages": msgs}, ["messages.*.content"])
    assert [s for s in segs] == ["hello", "there"]
    assert json.loads(meta)["field_metadatas"]


def test_spark_wildcard_over_typed_struct_column(spark):
    """End-to-end over a NATIVELY TYPED messages column (array<struct>),
    not a JSON string: extraction, translation, and the JSON writeback
    into translated_text must all see the rows."""
    df = spark.createDataFrame(
        [(1, [{"role": "u", "content": "hello there"},
              {"role": "a", "content": "general"}])],
        "doc_id long, messages array<struct<role string, content string>>",
    )
    seg = tr.segment_documents(
        df, text_field="messages.*.content", doc_id_field="doc_id"
    )
    got = sorted(r["_seg_segments"] for r in seg.collect())
    assert got == ["general", "hello there"]
    trn = tr.translate_segments(seg, translator=lambda xs: [x.upper() for x in xs])
    out = tr.reassemble_documents(trn, text_field="messages.*.content")
    row = out.collect()[0]
    assert [m["content"] for m in json.loads(row["translated_text"])] == [
        "HELLO THERE", "GENERAL",
    ]
