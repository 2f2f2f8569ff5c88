"""Omni OCR synthetic-QA stages, Spark-first (reference
``stages/synthetic/omni/{ocr_nemotron_v2,ocr_scoring_qa,
ocr_conversationalize,base}.py``).

The reference pipeline runs per-image Ray tasks: a word-level OCR model
populates ``ocr_dense``, then one verifier-VLM call per image scores
every bbox and the model-free QA builder assembles up to 100 multi-turn
VQA pairs. Here each stage is ONE ``mapInPandas`` pass — no shuffle at
all: every row is independent, so corpus-level parallelism is just the
partition count, and both model calls are injectable seams:

- ``ocr_model(paths: list[str]) -> list[list[pred]]`` — the
  NemotronOCR-v2 slot (``nemotron_ocr`` package + GPU, absent here);
  predictions convert via ``kernels/ocrqa.to_dense_item``.
- ``verifier(prompts: list[str], image_paths: list[str]) ->
  list[str]`` — the Nemotron-Nano-Omni verifier slot (NVIDIA Inference
  API client); batch failures degrade row-by-row through the shared
  ``generate_with_rowwise_fallback`` contract, and an empty response
  marks just that row invalid (ocr_scoring_qa.py:228-231).

Everything around the seams — prompt build, JSON extraction, score
application, image-level validity, the seeded conversation build — is
the pure kernel (``kernels/ocrqa.py``), reproduced BIT-FOR-BIT: the
reference seeds ``random.Random(task_id)``, already a pure function of
the row, so generation is identical under any partitioning or task
retry. ``ocr_dense`` / ``ocr_scoring_missing`` / ``conversation``
travel as JSON strings (stable schema, driver-canonicalizable, the same
wire shape as the reference's JSONL writer, omni/io.py:203-283).
"""

from __future__ import annotations

import json
import random
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from ..kernels.llmseam import generate_with_rowwise_fallback
from ..kernels.ocrqa import (
    apply_scoring,
    build_conversation,
    build_dense_conversation,
    build_qa_tagged,
    parse_json_object,
    scoring_prompt,
    to_dense_item,
)

__all__ = ["ocr_dense_stage", "ocr_scoring_qa"]

_DEFAULT_VERIFIER_MODEL = "nvidia/nemotron-3-nano-omni-30b-a3b-reasoning"


def _basename(path: str) -> str:
    """Path(...).name — the image name embedded in the conversation
    (ocr_scoring_qa.py:288)."""
    return str(path).replace("\\", "/").rstrip("/").rsplit("/", 1)[-1]


def ocr_dense_stage(
    df: DataFrame,
    ocr_model: Callable | None = None,
    path_field: str = "image_path",
) -> DataFrame:
    """OCRNemotronV2Stage (ocr_nemotron_v2.py:57-143): run the word-level
    OCR model over each image path and emit ``ocr_dense`` as a JSON list
    of 0-1000-grid items. Rows already invalid skip the model; a per-row
    model failure becomes an audit row (``is_valid`` False + ``error``),
    never a task failure — the reference's process_batch contract."""
    if ocr_model is None:
        raise NotImplementedError(
            "ocr_dense_stage requires an ocr_model(paths) -> list[list[pred]] "
            "callable; the reference backend is the nemotron-ocr package "
            "(GPU checkpoint) absent in this sandbox — inject one"
        )
    in_fields = [
        f for f in df.schema.fields if f.name not in ("ocr_dense", "is_valid", "error")
    ]
    out_schema = StructType(
        in_fields
        + [
            StructField("ocr_dense", StringType()),
            StructField("is_valid", BooleanType()),
            StructField("error", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            valid = (
                pdf["is_valid"].fillna(True).astype(bool)
                if "is_valid" in pdf.columns
                else pd.Series([True] * n, index=pdf.index)
            )
            errors = (
                pdf["error"].astype(object)
                if "error" in pdf.columns
                else pd.Series([None] * n, index=pdf.index, dtype=object)
            )
            dense = pd.Series([None] * n, index=pdf.index, dtype=object)
            todo = list(pdf.index[valid])
            # ONE batched seam call per Arrow batch (the seam contract is
            # list[paths] -> list[list[pred]]); only on a batch-level
            # failure or length mismatch retry row-by-row, so a single
            # poisoned image degrades to its own audit row while healthy
            # batches keep the model's batching throughput.
            paths = [str(pdf.at[idx, path_field]) for idx in todo]
            batch_preds: list | None = None
            if todo:
                try:
                    batch_preds = list(ocr_model(paths))
                    if len(batch_preds) != len(todo):
                        raise ValueError(
                            f"ocr_model returned {len(batch_preds)} results "
                            f"for {len(todo)} paths"
                        )
                except Exception:  # noqa: BLE001 - degrade to row-by-row
                    batch_preds = None
            for pos, idx in enumerate(todo):
                try:
                    if batch_preds is not None:
                        preds = batch_preds[pos]
                    else:
                        (preds,) = ocr_model([paths[pos]])
                    dense.at[idx] = json.dumps([to_dense_item(p) for p in preds])
                except Exception as e:  # noqa: BLE001 - audit row, not job failure
                    valid.at[idx] = False
                    errors.at[idx] = f"ocr_nemotron_v2: {e}"
            res = pdf.copy()
            res["ocr_dense"] = dense
            res["is_valid"] = valid
            res["error"] = errors
            yield res[[f.name for f in out_schema.fields]]

    return df.mapInPandas(run, schema=out_schema)


def ocr_scoring_qa(  # noqa: PLR0913 - the reference stage's own knobs
    df: DataFrame,
    verifier: Callable | None = None,
    model_id: str = _DEFAULT_VERIFIER_MODEL,
    min_bbox_match: int = 5,
    max_text_errors: int = 0,
    fail_on_missing_text: bool = False,
    dense_dump_prob: float = 0.05,
    task_id_field: str = "image_id",
    path_field: str = "image_path",
    rng_factory=random.Random,
) -> DataFrame:
    """OCRScoringQAStage (ocr_scoring_qa.py:121-299): one verifier call
    per image scores every bbox, low-quality boxes flip ``valid=False``
    (below ``min_bbox_match`` or above ``max_text_errors``), and the
    seeded QA builder emits the multi-turn ``conversation`` — or, for
    ~``dense_dump_prob`` of provably-complete images (no missing text
    reported), a single-turn dense dump.

    Row contracts mirror the reference exactly: already-invalid rows
    skip the verifier; rows with no ``ocr_dense`` items are
    SkipSample — passed through untouched; an empty verifier response
    or unparseable JSON invalidates the row with the reference's error
    strings; ``fail_on_missing_text`` and the no-valid-bbox rule
    invalidate at image level before any conversation is built.

    ``rng_factory`` (default ``random.Random`` — reference-exact,
    seeded with the row's ``task_id``) is injectable;
    ``kernels/ocrqa.first_choice_rng`` collapses every draw to the
    first option so the SQL value-oracle can replay generation."""
    if verifier is None:
        raise NotImplementedError(
            "ocr_scoring_qa requires a verifier(prompts, image_paths) -> "
            "list[str] callable; the reference backend is the NVIDIA "
            "Inference API (Nemotron-Nano-Omni) absent in this sandbox — "
            "inject one"
        )
    in_fields = [
        f
        for f in df.schema.fields
        if f.name
        not in (
            "ocr_dense",
            "is_valid",
            "error",
            "ocr_is_word_level",
            "ocr_scoring_prompt",
            "ocr_scoring_model",
            "ocr_scoring_response_raw",
            "ocr_scoring_mode",
            "ocr_scoring_missing",
            "conversation",
        )
    ]
    out_schema = StructType(
        in_fields
        + [
            StructField("ocr_dense", StringType()),
            StructField("is_valid", BooleanType()),
            StructField("error", StringType()),
            StructField("ocr_is_word_level", BooleanType()),
            StructField("ocr_scoring_prompt", StringType()),
            StructField("ocr_scoring_model", StringType()),
            StructField("ocr_scoring_response_raw", StringType()),
            StructField("ocr_scoring_mode", StringType()),
            StructField("ocr_scoring_missing", StringType()),
            StructField("conversation", StringType()),
        ]
    )
    keep_cols = [f.name for f in in_fields]

    def _score_row(row: dict, response: str) -> None:
        """handle_response (ocr_scoring_qa.py:222-299) over one row dict."""
        if not response:
            row["is_valid"] = False
            row["error"] = "ocr_scoring_qa: empty response from model"
            return
        row["ocr_scoring_response_raw"] = response
        result = parse_json_object(response)
        if result is None:
            row["is_valid"] = False
            row["error"] = f"ocr_scoring_qa: could not parse JSON: {response[:200]!r}"
            return
        items = row.pop("_items")
        scored, mode, missing, is_word = apply_scoring(
            items, result, min_bbox_match, max_text_errors
        )
        row["ocr_dense"] = json.dumps(scored)
        row["ocr_scoring_mode"] = mode
        row["ocr_scoring_missing"] = json.dumps(missing)
        if is_word is not None:
            row["ocr_is_word_level"] = is_word
        valid_words = [w for w in scored if w.get("valid", True)]
        if fail_on_missing_text and missing:
            row["is_valid"] = False
            row["error"] = f"ocr_scoring_qa: {len(missing)} missing text region(s)"
            return
        if scored and not valid_words:
            row["is_valid"] = False
            row["error"] = (
                f"ocr_scoring_qa: no bboxes passed quality threshold "
                f"(min_bbox_match={min_bbox_match}, max_text_errors={max_text_errors})"
            )
            return
        image_name = _basename(row["_path"])
        task_id = row["_task_id"]
        rng = rng_factory(task_id)
        ocr_complete = not missing
        if ocr_complete and rng.random() < dense_dump_prob:
            conv = build_dense_conversation(valid_words, rng, image_name)
        else:
            qa_tagged, rng = build_qa_tagged(scored, task_id, rng_factory)
            conv = build_conversation(qa_tagged, rng, image_name)
        row["conversation"] = json.dumps(conv) if conv is not None else None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            call_rows: list[int] = []
            prompts: list[tuple] = []
            for r in pdf.to_dict("records"):
                row = {c: r.get(c) for c in keep_cols}
                row["ocr_dense"] = r.get("ocr_dense")
                row["is_valid"] = bool(r.get("is_valid")) if r.get("is_valid") is not None else True
                row["error"] = r.get("error")
                wl = r.get("ocr_is_word_level")
                row["ocr_is_word_level"] = bool(wl) if wl is not None else True
                for c in (
                    "ocr_scoring_prompt",
                    "ocr_scoring_model",
                    "ocr_scoring_response_raw",
                    "ocr_scoring_mode",
                    "ocr_scoring_missing",
                    "conversation",
                ):
                    row[c] = None
                row["_path"] = str(r.get(path_field) or "")
                row["_task_id"] = str(r.get(task_id_field) or "")
                if row["is_valid"]:
                    raw = row["ocr_dense"]
                    # pandas nulls surface as NaN floats — only a real
                    # JSON string carries items
                    items = json.loads(raw) if isinstance(raw, str) and raw else []
                    if items:  # empty -> SkipSample: pass through untouched
                        row["_items"] = items
                        prompt = scoring_prompt(items)
                        row["ocr_scoring_prompt"] = prompt
                        row["ocr_scoring_model"] = model_id
                        call_rows.append(len(rows))
                        prompts.append((prompt, row["_path"]))
                rows.append(row)
            if prompts:
                responses = generate_with_rowwise_fallback(
                    lambda pairs: verifier([p for p, _ in pairs], [ip for _, ip in pairs]),
                    prompts,
                )
                for i, resp in zip(call_rows, responses):
                    try:
                        _score_row(rows[i], resp)
                    except Exception as e:  # noqa: BLE001 - reference
                        # _handle_response_one contract (base.py:109-118):
                        # a malformed-but-parseable response invalidates
                        # ONE row, never the task
                        rows[i]["is_valid"] = False
                        rows[i]["error"] = f"ocr_scoring_qa: {e}"
            for row in rows:
                row.pop("_items", None)
                row.pop("_path", None)
                row.pop("_task_id", None)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)
