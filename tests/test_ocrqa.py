"""Omni OCR synthetic-QA stages (reference stages/synthetic/omni/*).

The headline check here is DIRECT bit-parity: the reference's
model-free QA modules (ocr_dense_qa / ocr_conversationalize /
utils.conversation / tasks.ocr) are loaded from /root/reference with
their heavy package __init__ chain stubbed out, and our kernel must
reproduce tagged QA lists, conversations, prompts and parse results
byte-for-byte across seeded task_ids.
"""

from __future__ import annotations

import importlib.util
import json
import random
import sys
import types

import pytest

from curator_spark.kernels import ocrqa as ker

REF = "/root/reference/nemo_curator"


@pytest.fixture(scope="module")
def ref():
    """Load the reference QA modules without importing the nemo_curator
    package __init__ (which needs ray/cosmos deps absent here)."""

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    saved = {k: v for k, v in sys.modules.items() if k.startswith("nemo_curator")}
    try:
        for pkg in [
            "nemo_curator",
            "nemo_curator.tasks",
            "nemo_curator.utils",
            "nemo_curator.stages",
            "nemo_curator.stages.synthetic",
            "nemo_curator.stages.synthetic.omni",
            "nemo_curator.stages.synthetic.omni.utils",
        ]:
            m = types.ModuleType(pkg)
            m.__path__ = []
            sys.modules[pkg] = m
        perf = types.ModuleType("nemo_curator.utils.performance_utils")
        perf.StagePerfStats = type("StagePerfStats", (), {})
        sys.modules["nemo_curator.utils.performance_utils"] = perf
        t = load("nemo_curator.tasks.tasks", f"{REF}/tasks/tasks.py")
        sys.modules["nemo_curator.tasks"].Task = t.Task
        im = load("nemo_curator.tasks.image", f"{REF}/tasks/image.py")
        sys.modules["nemo_curator.tasks"].ImageTaskData = im.ImageTaskData
        ocr = load("nemo_curator.tasks.ocr", f"{REF}/tasks/ocr.py")
        sys.modules["nemo_curator.tasks"].ocr = ocr
        conv = load(
            "nemo_curator.stages.synthetic.omni.utils.conversation",
            f"{REF}/stages/synthetic/omni/utils/conversation.py",
        )
        sys.modules["nemo_curator.stages.synthetic.omni.utils"].conversation = conv
        convz = load(
            "nemo_curator.stages.synthetic.omni.ocr_conversationalize",
            f"{REF}/stages/synthetic/omni/ocr_conversationalize.py",
        )
        qa = load(
            "nemo_curator.stages.synthetic.omni.ocr_dense_qa",
            f"{REF}/stages/synthetic/omni/ocr_dense_qa.py",
        )
        yield types.SimpleNamespace(qa=qa, convz=convz, ocr=ocr)
    finally:
        for k in list(sys.modules):
            if k.startswith("nemo_curator"):
                del sys.modules[k]
        sys.modules.update(saved)


def _grid_items():
    """A corpus spanning the generator branches: duplicated texts
    (multi-bbox), all-caps (raw-escape coin), both quote kinds,
    backslashes, blank/malformed entries, invalid flags."""
    return [
        {"bbox_2d": [10, 20, 110, 60], "text_content": "Hello", "valid": True},
        {"bbox_2d": [200, 20, 330, 60], "text_content": "WORLD", "valid": True},
        {"bbox_2d": [10, 100, 110, 140], "text_content": "Hello", "valid": True},
        {"bbox_2d": [400, 100, 480, 140], "text_content": 'say "hi"', "valid": True},
        {"bbox_2d": [500, 500, 600, 560], "text_content": "it's", "valid": True},
        {"bbox_2d": [700, 500, 800, 560], "text_content": "a\\b", "valid": True},
        {"bbox_2d": [5, 5, 900, 900], "text_content": "WORLD", "valid": True},
        {"bbox_2d": [0, 0, 50, 50], "text_content": "   ", "valid": True},  # blank: skipped
        {"bbox_2d": [1, 2, 3], "text_content": "bad-box", "valid": True},   # malformed: skipped
        {"bbox_2d": [9, 9, 99, 99], "text_content": "dead", "valid": False},
    ]


def _to_ref_items(ref, items):
    return [
        ref.ocr.OCRDenseItem(
            bbox_2d=list(i["bbox_2d"]),
            text_content=i["text_content"],
            valid=i.get("valid", True),
        )
        for i in items
    ]


class TestReferenceBitParity:
    def test_prompt_constants_identical(self, ref):
        assert tuple(ref.convz.SDG_PROMPT_VARIATIONS) == ker.OCR_SDG_PROMPT_VARIATIONS
        assert ker.OCR_SCORING_PROMPT_TEMPLATE == ref_scoring_prompt_literal()

    def test_build_qa_tagged_and_conversation(self, ref):
        items = _grid_items()
        holder = types.SimpleNamespace(ocr_dense=_to_ref_items(ref, items))
        for tid in [f"task-{i}" for i in range(30)] + ["", "0", "img_αβ.png"]:
            ref_tagged, ref_rng = ref.qa.build_qa_tagged(holder, tid)
            my_tagged, my_rng = ker.build_qa_tagged(items, tid)
            assert my_tagged == ref_tagged, tid
            ref_conv = ref.qa.build_conversation(ref_tagged, ref_rng, "img.png")
            my_conv = ker.build_conversation(my_tagged, my_rng, "img.png")
            assert my_conv == (ref_conv.to_dict() if ref_conv else None), tid

    def test_invalid_flood_disables_locate_modes(self, ref):
        # >= 5 invalid items -> only modes 0/1 remain
        items = _grid_items() + [
            {"bbox_2d": [i, i, i + 1, i + 1], "text_content": f"x{i}", "valid": False}
            for i in range(5)
        ]
        holder = types.SimpleNamespace(ocr_dense=_to_ref_items(ref, items))
        for tid in ["a", "b", "c", "flood-7"]:
            ref_tagged, _ = ref.qa.build_qa_tagged(holder, tid)
            my_tagged, _ = ker.build_qa_tagged(items, tid)
            assert my_tagged == ref_tagged
            assert {t for t, _, _ in my_tagged} <= {"bbox_to_text", "point_to_text"}

    def test_dense_conversation_parity(self, ref):
        items = [i for i in _grid_items() if len(i["bbox_2d"]) == 4][:6]
        holder_items = _to_ref_items(ref, items)
        for tid in ["d0", "d1", "d2", "dense-42"]:
            ref_conv = ref.qa.build_dense_conversation(
                holder_items, random.Random(tid), "pic.jpg"
            )
            my_conv = ker.build_dense_conversation(items, random.Random(tid), "pic.jpg")
            assert my_conv == ref_conv.to_dict(), tid

    def test_balanced_sampler_parity_over_quota(self, ref):
        tagged = [
            (typ, f"q{typ}{i}", f"a{typ}{i}")
            for typ in ("bbox_to_text", "point_to_text", "text_to_bbox")
            for i in range([40, 70, 10][("bbox_to_text", "point_to_text", "text_to_bbox").index(typ)])
        ]
        for seed in ["s1", "s2", "s3"]:
            got = ker.balanced_sample_qa(list(tagged), 100, random.Random(seed))
            want = ref.qa._balanced_sample_qa(list(tagged), 100, random.Random(seed))
            assert got == want
            assert len(got) == 100

    def test_word_output_formats_parity(self, ref):
        items = [i for i in _grid_items() if len(i["bbox_2d"]) == 4][:5]
        ref_items = _to_ref_items(ref, items)
        assert len(ker.WORD_OUTPUT_FORMATS) == len(ref.convz.WORD_OUTPUT_FORMATS) == 11
        for mine, theirs in zip(ker.WORD_OUTPUT_FORMATS, ref.convz.WORD_OUTPUT_FORMATS):
            assert mine(items) == theirs(ref_items)


def ref_scoring_prompt_literal():
    """Extract the reference's _PROMPT literal via ast — no import."""
    import ast

    tree = ast.parse(open(f"{REF}/stages/synthetic/omni/ocr_scoring_qa.py").read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and getattr(node.targets[0], "id", "") == "_PROMPT":
            return ast.literal_eval(node.value)
    raise AssertionError("_PROMPT not found")


class TestScoringKernels:
    def test_to_dense_item_y_swap(self):
        got = ker.to_dense_item(
            {"left": 0.1, "right": 0.5, "upper": 0.8, "lower": 0.2, "text": 42}
        )
        assert got == {
            "bbox_2d": [100, 200, 500, 800],
            "text_content": "42",
            "valid": True,
        }

    def test_scoring_prompt_swaps_axes_and_skips_malformed(self):
        items = [
            {"bbox_2d": [1, 2, 3, 4], "text_content": "a"},
            {"bbox_2d": [9, 9, 9], "text_content": "bad"},
            {"bbox_2d": None, "text_content": "none"},
            {"bbox_2d": [5, 6, 7, 8], "text_content": None},
        ]
        prompt = ker.scoring_prompt(items)
        payload = json.loads(prompt.split("normalised grid):\n")[1].rsplit("\n\nOnly output", 1)[0])
        assert payload == [
            {"idx": 0, "bbox_2d": [2, 1, 4, 3], "text": "a"},
            {"idx": 3, "bbox_2d": [6, 5, 8, 7], "text": ""},
        ]

    @pytest.mark.parametrize(
        "raw,want",
        [
            ('{"a": 1}', {"a": 1}),
            ('```json\n{"a": 1}\n```', {"a": 1}),
            ('reasoning text {"a": {"b": 2}} trailing', {"a": {"b": 2}}),
            ("[1, 2]", None),           # list, not object
            ("no json here", None),
            ('{"broken": ', None),
            # greedy span first-{..last-}: inner valid object is NOT
            # retried once the greedy span fails to parse (ref behavior)
            ('{oops {"a": 1} oops}', None),
        ],
    )
    def test_parse_json_object(self, raw, want):
        assert ker.parse_json_object(raw) == want

    def test_apply_scoring_valid_cut_and_malformed_entries(self):
        items = [
            {"bbox_2d": [0, 0, 1, 1], "text_content": "t0", "valid": True},
            {"bbox_2d": [0, 0, 1, 1], "text_content": "t1", "valid": True},
            {"bbox_2d": [0, 0, 1, 1], "text_content": "t2", "valid": True},
            {"bbox_2d": [0, 0, 1, 1], "text_content": "t3", "valid": True},
        ]
        result = {
            "ocr_mode": "line",
            "text": [
                {"idx": 0, "bbox_match": 10, "text_errors": 0},   # valid
                {"idx": 1, "bbox_match": 4, "text_errors": 0},    # below match cut
                {"idx": 2, "bbox_match": "ten", "text_errors": 0},  # malformed
                # idx 3 missing -> invalid
            ],
            "missing_text": [{"text": "m", "bbox_2d": [1, 2, 3, 4]}],
        }
        scored, mode, missing, is_word = ker.apply_scoring(items, result, 5, 0)
        assert [w["valid"] for w in scored] == [True, False, False, False]
        assert scored[0]["bbox_match"] == 10 and scored[1]["bbox_match"] == 4
        assert mode == "line" and is_word is False and len(missing) == 1
        # word mode + unknown mode
        assert ker.apply_scoring(items, {"ocr_mode": "word", "text": []}, 5, 0)[3] is True
        assert ker.apply_scoring(items, {"text": []}, 5, 0)[3] is None


def _fake_verifier(score_plan):
    """Verifier seam returning a JSON response whose per-idx scores come
    from score_plan(text) — deterministic, picklable by value."""

    def verifier(prompts, paths):
        out = []
        for prompt in prompts:
            payload = json.loads(
                prompt.split("normalised grid):\n")[1].rsplit("\n\nOnly output", 1)[0]
            )
            text_entries = []
            for e in payload:
                m, er = score_plan(e["text"])
                text_entries.append(
                    {"idx": e["idx"], "is_word": True, "is_line": False,
                     "bbox_match": m, "text_errors": er}
                )
            out.append(json.dumps({"ocr_mode": "word", "text": text_entries, "missing_text": []}))
        return out

    return verifier


class TestSparkStages:
    COLS = (
        "image_path string, image_id string, ocr_dense string, "
        "is_valid boolean, error string"
    )

    def _rows(self):
        items = _grid_items()
        return [
            ("/data/img0.png", "img0", json.dumps(items), True, None),
            ("/data/img1.png", "img1", json.dumps(items[:2]), True, None),
            ("/data/empty.png", "img2", json.dumps([]), True, None),   # SkipSample
            ("/data/bad.png", "img3", None, False, "earlier failure"),  # pre-invalid
        ]

    def test_scoring_qa_end_to_end_matches_kernel(self, spark):
        from curator_spark.operators import ocr_scoring_qa

        verifier = _fake_verifier(lambda t: (10, 0) if len(t) % 2 == 0 else (0, 0))
        df = spark.createDataFrame(self._rows(), self.COLS)
        out = {r.image_id: r for r in ocr_scoring_qa(df, verifier).collect()}

        # pre-invalid and empty rows pass through untouched
        assert out["img3"].is_valid is False and out["img3"].conversation is None
        assert out["img2"].is_valid is True and out["img2"].ocr_scoring_prompt is None

        # scored row: rebuild expectations with the kernel
        items = _grid_items()
        resp = verifier([ker.scoring_prompt(items)], ["x"])[0]
        scored, mode, missing, _ = ker.apply_scoring(items, ker.parse_json_object(resp))
        assert json.loads(out["img0"].ocr_dense) == scored
        assert out["img0"].ocr_scoring_mode == "word"
        assert out["img0"].ocr_is_word_level is True
        rng = random.Random("img0")
        assert rng.random() >= 0.05  # multi-turn path for this seed
        tagged, rng2 = ker.build_qa_tagged(scored, "img0")
        want_conv = ker.build_conversation(tagged, rng2, "img0.png")
        assert json.loads(out["img0"].conversation) == want_conv

    def test_no_valid_bbox_invalidates_image(self, spark):
        from curator_spark.operators import ocr_scoring_qa

        verifier = _fake_verifier(lambda t: (0, 9))  # everything fails the cut
        df = spark.createDataFrame(self._rows()[:1], self.COLS)
        (row,) = ocr_scoring_qa(df, verifier).collect()
        assert row.is_valid is False
        assert "no bboxes passed quality threshold" in row.error
        assert row.conversation is None

    def test_fail_on_missing_text(self, spark):
        from curator_spark.operators import ocr_scoring_qa

        def verifier(prompts, paths):
            return [
                json.dumps(
                    {"ocr_mode": "word",
                     "text": [{"idx": i, "bbox_match": 10, "text_errors": 0} for i in range(10)],
                     "missing_text": [{"text": "m", "bbox_2d": [0, 0, 1, 1]}]}
                )
                for _ in prompts
            ]

        df = spark.createDataFrame(self._rows()[:1], self.COLS)
        (row,) = ocr_scoring_qa(df, verifier, fail_on_missing_text=True).collect()
        assert row.is_valid is False and "missing text region" in row.error
        # default: missing text only disables the dense dump
        (row2,) = ocr_scoring_qa(df, verifier, dense_dump_prob=1.0).collect()
        assert row2.is_valid is True
        conv = json.loads(row2.conversation)
        assert len(conv["conversation"]) > 2  # multi-turn, not dense dump

    def test_dense_dump_probability_path(self, spark):
        from curator_spark.operators import ocr_scoring_qa

        verifier = _fake_verifier(lambda t: (10, 0))
        df = spark.createDataFrame(self._rows()[:1], self.COLS)
        (row,) = ocr_scoring_qa(df, verifier, dense_dump_prob=1.0).collect()
        conv = json.loads(row.conversation)
        assert len(conv["conversation"]) == 2  # single-turn dense dump
        # parity with the kernel's dense build under the same seed
        items = _grid_items()
        resp = verifier([ker.scoring_prompt(items)], ["x"])[0]
        scored, _, _, _ = ker.apply_scoring(items, ker.parse_json_object(resp))
        valid = [w for w in scored if w["valid"]]
        rng = random.Random("img0")
        assert rng.random() < 1.0
        assert conv == ker.build_dense_conversation(valid, rng, "img0.png")

    def test_empty_and_unparseable_responses(self, spark):
        from curator_spark.operators import ocr_scoring_qa

        df = spark.createDataFrame(self._rows()[:2], self.COLS)
        out = {r.image_id: r for r in ocr_scoring_qa(
            df, lambda p, paths: ["" if "img0" in ip else "total garbage" for ip in paths]
        ).collect()}
        assert out["img0"].is_valid is False
        assert "empty response" in out["img0"].error
        assert out["img1"].is_valid is False
        assert "could not parse JSON" in out["img1"].error

    def test_poisoned_batch_degrades_rowwise(self, spark):
        from curator_spark.operators import ocr_scoring_qa

        good = _fake_verifier(lambda t: (10, 0))

        def flaky(prompts, paths):
            if len(prompts) > 1:
                raise RuntimeError("batch boom")
            if "img1" in paths[0]:
                raise RuntimeError("row boom")
            return good(prompts, paths)

        df = spark.createDataFrame(self._rows()[:2], self.COLS).coalesce(1)
        out = {r.image_id: r for r in ocr_scoring_qa(df, flaky).collect()}
        assert out["img0"].is_valid is True and out["img0"].conversation
        assert out["img1"].is_valid is False and "empty response" in out["img1"].error

    def test_first_choice_rng_collapses_generation(self, spark):
        from curator_spark.operators import ocr_scoring_qa

        verifier = _fake_verifier(lambda t: (10, 0))
        df = spark.createDataFrame(self._rows()[:1], self.COLS)
        (row,) = ocr_scoring_qa(
            df, verifier, rng_factory=ker.first_choice_rng
        ).collect()
        conv = json.loads(row.conversation)
        # every text draws mode 0 / template 0: the first question is
        # always the bbox_to_text template 0 for the first kept text
        q0 = conv["conversation"][0]["fragments"][1]
        assert q0 == "What text is in the bounding box [10, 20, 110, 60]?"
        assert conv["conversation"][1]["fragments"] == ["Hello"]

    def test_partition_invariance(self, spark):
        from curator_spark.operators import ocr_scoring_qa

        verifier = _fake_verifier(lambda t: (10, 0))
        rows = [
            (f"/d/im{i}.png", f"im{i}", json.dumps(_grid_items()), True, None)
            for i in range(12)
        ]
        df = spark.createDataFrame(rows, self.COLS)
        a = sorted(
            (r.image_id, r.conversation)
            for r in ocr_scoring_qa(df.coalesce(1), verifier).collect()
        )
        b = sorted(
            (r.image_id, r.conversation)
            for r in ocr_scoring_qa(df.repartition(7), verifier).collect()
        )
        assert a == b

    def test_ocr_dense_stage_seam_and_audit(self, spark):
        from curator_spark.operators import ocr_dense_stage

        def model(paths):
            out = []
            for p in paths:
                if "bad" in p:
                    raise RuntimeError("decode failed")
                out.append(
                    [{"left": 0.0, "right": 0.1, "upper": 0.3, "lower": 0.1, "text": "w"}]
                )
            return out

        df = spark.createDataFrame(
            [("/d/a.png", "a"), ("/d/bad.png", "b")], "image_path string, image_id string"
        )
        out = {r.image_id: r for r in ocr_dense_stage(df, model).collect()}
        assert json.loads(out["a"].ocr_dense) == [
            {"bbox_2d": [0, 100, 100, 300], "text_content": "w", "valid": True}
        ]
        assert out["b"].is_valid is False and "decode failed" in out["b"].error

    def test_malformed_scores_invalidate_row_not_task(self, spark):
        # reference _handle_response_one (base.py:109-118): a
        # parseable-but-malformed response degrades to ONE audit row
        from curator_spark.operators import ocr_scoring_qa

        def verifier(prompts, paths):
            return [
                json.dumps({"ocr_mode": "word", "text": [{"idx": "n/a"}],
                            "missing_text": []})
                if "img0" in ip
                else json.dumps({"ocr_mode": "word", "text": {"idx": 1},
                                 "missing_text": []})
                for ip in paths
            ]

        df = spark.createDataFrame(self._rows()[:2], self.COLS).coalesce(1)
        out = {r.image_id: r for r in ocr_scoring_qa(df, verifier).collect()}
        assert out["img0"].is_valid is False
        assert out["img0"].error.startswith("ocr_scoring_qa:")
        assert out["img1"].is_valid is False

    def test_dense_stage_rerun_on_own_output(self, spark):
        from curator_spark.operators import ocr_dense_stage

        def model(paths):
            return [
                [{"left": 0.0, "right": 0.1, "upper": 0.2, "lower": 0.1, "text": "w"}]
                for _ in paths
            ]

        df = spark.createDataFrame([("/d/a.png", "a")], "image_path string, image_id string")
        once = ocr_dense_stage(df, model)
        twice = ocr_dense_stage(once, model)  # no duplicate-column schema
        assert twice.columns.count("ocr_dense") == 1
        (row,) = twice.collect()
        assert json.loads(row.ocr_dense)[0]["text_content"] == "w"

    def test_seams_required(self, spark):
        from curator_spark.operators import ocr_dense_stage, ocr_scoring_qa

        df = spark.createDataFrame([("p", "i")], "image_path string, image_id string")
        with pytest.raises(NotImplementedError, match="ocr_dense_stage"):
            ocr_dense_stage(df, None)
        with pytest.raises(NotImplementedError, match="ocr_scoring_qa"):
            ocr_scoring_qa(df, None)


class TestOcrDenseBatching:
    def test_one_seam_call_per_batch(self, spark):
        """The seam contract is list[paths] -> list[list[pred]]: a healthy
        partition must reach the model as ONE batched call (per Arrow
        batch), not one call per image."""
        from curator_spark.operators import ocr_dense_stage

        def model(paths):
            # encode the observed call batch size into every prediction:
            # the spy must survive the worker-process boundary
            return [
                [{"left": 0.0, "right": 0.1, "upper": 0.3, "lower": 0.1,
                  "text": f"bs={len(paths)}"}]
                for _ in paths
            ]

        df = spark.createDataFrame(
            [(f"/d/{i}.png", str(i)) for i in range(6)],
            "image_path string, image_id string",
        ).coalesce(1)
        out = {r.image_id: r for r in ocr_dense_stage(df, model).collect()}
        assert len(out) == 6 and all(r.is_valid for r in out.values())
        # one partition, one Arrow batch -> one batched call with all paths
        sizes = {json.loads(r.ocr_dense)[0]["text_content"] for r in out.values()}
        assert sizes == {"bs=6"}

    def test_poisoned_batch_degrades_rowwise(self, spark):
        """A batch-level failure retries row-by-row so only the poisoned
        image gets an audit row; healthy rows keep their predictions."""
        from curator_spark.operators import ocr_dense_stage

        def model(paths):
            if any("bad" in p for p in paths):
                raise RuntimeError("poisoned batch")
            return [
                [{"left": 0.0, "right": 0.1, "upper": 0.3, "lower": 0.1,
                  "text": "w"}]
                for _ in paths
            ]

        df = spark.createDataFrame(
            [("/d/a.png", "a"), ("/d/bad.png", "b"), ("/d/c.png", "c")],
            "image_path string, image_id string",
        ).coalesce(1)
        out = {r.image_id: r for r in ocr_dense_stage(df, model).collect()}
        assert out["a"].is_valid and out["c"].is_valid
        assert json.loads(out["a"].ocr_dense)[0]["text_content"] == "w"
        assert out["b"].is_valid is False and "poisoned batch" in out["b"].error

    def test_length_mismatch_degrades_rowwise(self, spark):
        """A seam returning the wrong count must not misalign rows."""
        from curator_spark.operators import ocr_dense_stage

        def model(paths):
            if len(paths) > 1:  # batched call: wrong length
                return [[]]
            return [[{"left": 0.0, "right": 0.1, "upper": 0.3,
                      "lower": 0.1, "text": "ok"}]]

        df = spark.createDataFrame(
            [("/d/a.png", "a"), ("/d/b.png", "b")],
            "image_path string, image_id string",
        ).coalesce(1)
        out = {r.image_id: r for r in ocr_dense_stage(df, model).collect()}
        assert all(r.is_valid for r in out.values())
        assert json.loads(out["a"].ocr_dense)[0]["text_content"] == "ok"
