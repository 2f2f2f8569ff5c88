"""Translation data-prep stages: segment -> translate(seam) -> reassemble.

Reference: ``stages/text/experimental/translation/stages/`` —

- ``segmentation.py:256-461`` SegmentationStage (explode documents into
  translatable segments with JSON reconstruction metadata);
- ``translate.py:46-…`` SegmentTranslationStage (the LLM call — here an
  injectable ``translator(list[str]) -> list[str]`` seam, same convention
  as the ASR/diarizer/scorer slots, with the reference's ``dry_run``);
- ``reassembly.py:63-128`` ReassemblyStage (collapse segment rows back
  into documents, FAITH aggregation);
- ``skipped_rows.py:32-172`` Skip/Restore already-translated rows;
- ``format_translation_output.py:35-148`` output shaping;
- ``merge_faith_scores.py:33-98`` FAITH -> metadata merge.

Spark-first shape
-----------------
The reference stages are pandas loops over Ray-scheduled batches with the
skipped-row stash living in *driver-side batch metadata*. Here:

- **segment**: one Arrow-batched UDF computes ``(segments, metadata)``
  per document, then a declarative ``posexplode`` fans out — the explode
  stays in the JVM, the per-row python is one kernel call. Segment order
  is made explicit in a ``_seg_idx`` column: the reference relies on
  pandas row order surviving the pipeline, which no distributed engine
  guarantees (documented deviation; the reassembly sorts on it).
- **doc identity**: ``_seg_doc_id`` comes from a real column when the
  caller has one (``doc_id_field``), else from
  ``monotonically_increasing_id()`` — unique per source row, exactly the
  role the reference's batch-local ``doc_idx`` plays, but stable across
  shuffles because it is materialized before the explode.
- **translate**: an Arrow-batched UDF around the seam; per-batch wall
  time is attributed evenly across the batch's rows (the reference times
  each LLM request; a batch seam cannot see request boundaries).
- **reassemble**: ``groupBy(_seg_doc_id).applyInPandas`` — one shuffle
  keyed on the document, the same unit the reference's batch loop uses.
- **skip/restore**: two filters and a ``unionByName`` — plain DataFrames
  instead of driver-held row stashes, so the split survives any executor
  count and the "stash" is just another distributed relation.
"""

from __future__ import annotations

import json
import time
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..kernels import translation as ker

__all__ = [
    "faith_threshold_filter",
    "format_translation_output",
    "merge_faith_scores",
    "reassemble_documents",
    "restore_skipped_rows",
    "score_faith",
    "segment_documents",
    "skip_existing_translations",
    "translate_segments",
    "translation_pipeline",
]

_SEG_COLS = ("_seg_segments", "_seg_metadata", "_seg_doc_id", "_seg_idx")
_INTERNAL = {
    *_SEG_COLS,
    "_translated",
    "_translation_time",
    "_translation_error",
}

# skipped_rows.py:104-118 — defaults for columns the translated side
# gained that the skipped rows never saw.
_RESTORE_DEFAULTS: dict[str, object] = {
    "faith_fluency": 0.0,
    "faith_accuracy": 0.0,
    "faith_idiomaticity": 0.0,
    "faith_terminology": 0.0,
    "faith_handling_of_format": 0.0,
    "faith_avg": 0.0,
    "faith_parse_failed": False,
    "faith_segment_scores": "[]",
    "_translation_time": 0.0,
    "_translation_error": "",
    "translation_time": 0.0,
    "translation_errors": "",
    "translation_metadata": "{}",
}


def segment_documents(
    df: DataFrame,
    text_field: str | list[str] = "text",
    mode: str = "coarse",
    min_segment_chars: int = 0,
    skipme_field: str | None = None,
    sentencizer: Callable[[str], list[tuple[int, int]]] | None = None,
    doc_id_field: str | None = None,
) -> DataFrame:
    """segmentation.py:256-461 — one output row per translatable segment,
    plus ``_seg_metadata`` (reconstruction JSON), ``_seg_doc_id`` and
    ``_seg_idx``. Documents with zero segments (and ``skipme``-flagged
    rows, segmentation.py:387-404) emit one row with an empty segment."""
    paths = ker.normalize_text_field(text_field)
    roots = sorted({p.split(".")[0] for p in paths})
    missing = [r for r in roots if r not in df.columns]
    if missing:
        raise ValueError(f"segment_documents: missing root column(s) {missing}")
    skip_col = skipme_field if skipme_field in df.columns else None
    needed = roots + ([skip_col] if skip_col and skip_col not in roots else [])
    min_chars = int(min_segment_chars)
    seg_mode = mode

    out_type = StructType(
        [
            StructField("segments", ArrayType(StringType())),
            StructField("metadata", StringType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _segment(block: pd.DataFrame) -> pd.DataFrame:
        segs_out, meta_out = [], []
        for rec in block.to_dict(orient="records"):
            if skip_col is not None:
                flag = rec.get(skip_col)
                # pd.notna: a nullable numeric column's NULLs arrive as
                # NaN, and NaN != 0 is True — a null flag must mean
                # "not skipped", same as None (segmentation.py:387-404)
                if flag is not None and pd.notna(flag) and flag != 0:
                    segs_out.append([])
                    meta_out.append(json.dumps({"mode": "skip"}, ensure_ascii=False))
                    continue
            segs, meta = ker.segment_document(
                rec, paths, mode=seg_mode, min_segment_chars=min_chars,
                sentencizer=sentencizer,
            )
            segs_out.append(segs)
            meta_out.append(meta)
        return pd.DataFrame({"segments": segs_out, "metadata": meta_out})

    doc_id = (
        F.col(doc_id_field)
        if doc_id_field is not None
        else F.monotonically_increasing_id()
    )
    staged = df.withColumn("_seg", _segment(F.struct(*needed))).withColumn(
        "_seg_doc_id", doc_id.cast("string")
    )
    segs = F.col("_seg")["segments"]
    # zero-segment documents still get one (empty) row: segmentation.py:452
    padded = F.when(F.size(segs) > 0, segs).otherwise(F.array(F.lit("")))
    return staged.select(
        *df.columns,
        "_seg_doc_id",
        F.col("_seg")["metadata"].alias("_seg_metadata"),
        F.posexplode(padded).alias("_seg_idx", "_seg_segments"),
    ).select(
        *df.columns,
        "_seg_doc_id",
        "_seg_metadata",
        F.col("_seg_idx").cast("long").alias("_seg_idx"),
        "_seg_segments",
    )


def translate_segments(
    df: DataFrame,
    translator: Callable[[list[str]], list[str]] | None = None,
    dry_run: bool = False,
) -> DataFrame:
    """translate.py — apply the translation backend to ``_seg_segments``,
    writing ``_translated`` / ``_translation_time`` / ``_translation_error``.

    ``translator`` is the injectable seam: ``list[str] -> list[str]``
    (an LLM client adapter, an MT model, or a test fake). ``dry_run=True``
    returns empty strings without a backend, as the reference does.

    Per-segment gating matches translate.py:222-227/312-324: empty or
    whitespace-only segments come back as ``""``, segments failing the
    translatability gate (pure code/JSON/tags reaching this stage via
    passthrough-mode texts) come back VERBATIM with zero time — the
    backend never sees either, which at 10^12-segment scale is the
    difference between paying the LLM for boilerplate or not. Only the
    translatable subset is sent, as one batch call; a batch-level
    failure retries segment-by-segment so one poisoned segment yields
    one error row, not a failed batch."""
    if translator is None and not dry_run:
        msg = (
            "translate_segments requires a translator callable "
            "(list[str] -> list[str]) unless dry_run=True; the reference "
            "backend is an LLM client (translate.py backend_type='llm')"
        )
        raise NotImplementedError(msg)

    out_type = StructType(
        [
            StructField("t", StringType()),
            StructField("sec", DoubleType()),
            StructField("err", StringType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _translate(col: pd.Series) -> pd.DataFrame:
        texts = ["" if t is None else str(t) for t in col]
        n = len(texts)
        if dry_run or not texts:
            return pd.DataFrame(
                {"t": [""] * n, "sec": [0.0] * n, "err": [""] * n}
            )
        out_t: list[str] = [""] * n
        out_s = [0.0] * n
        out_e = [""] * n
        idxs: list[int] = []
        subset: list[str] = []
        for i, s in enumerate(texts):
            if not s or not s.strip():
                out_t[i] = ""  # translate.py:222-223
            elif not ker.is_line_translatable(s):
                out_t[i] = s  # translate.py:225-227 — verbatim, no call
            else:
                idxs.append(i)
                subset.append(s)
        if subset:
            t0 = time.monotonic()
            try:
                translated = list(translator(subset))
                if len(translated) != len(subset):
                    raise ValueError(
                        f"translator returned {len(translated)} results "
                        f"for {len(subset)} segments"
                    )
                per = (time.monotonic() - t0) / len(subset)
                for i, r in zip(idxs, translated):
                    out_t[i] = r
                    out_s[i] = per
            except Exception:
                for i in idxs:  # per-segment retry + error capture
                    t1 = time.monotonic()
                    try:
                        (one,) = translator([texts[i]])
                        out_t[i] = one
                        out_s[i] = time.monotonic() - t1
                    except Exception as exc:
                        out_t[i] = ""
                        out_s[i] = time.monotonic() - t1
                        out_e[i] = f"{type(exc).__name__}: {exc}"
        return pd.DataFrame({"t": out_t, "sec": out_s, "err": out_e})

    res = F.col("_tr_res")
    return (
        df.withColumn("_tr_res", _translate(F.col("_seg_segments")))
        .withColumn("_translated", res["t"])
        .withColumn("_translation_time", res["sec"])
        .withColumn("_translation_error", res["err"])
        .drop("_tr_res")
    )


def reassemble_documents(
    df: DataFrame,
    text_field: str | list[str] = "text",
    output_field: str = "translated_text",
    replace_source_fields: bool = False,
    emit_metadata_helpers: bool = False,
    aggregate_faith_scores: bool = False,
) -> DataFrame:
    """reassembly.py:63-128 — collapse segment rows back into one row per
    document: one shuffle keyed on ``_seg_doc_id``, segments ordered by
    the explicit ``_seg_idx`` (the reference sorts on the pandas index)."""
    primary = ker.normalize_text_field(text_field)[0]
    base_fields = [f for f in df.schema.fields if f.name not in _INTERNAL]
    base_names = [f.name for f in base_fields]

    out_fields = list(base_fields) + [
        StructField(output_field, StringType()),
        StructField("translation_time", DoubleType()),
        StructField("translation_errors", StringType()),
    ]
    if emit_metadata_helpers:
        out_fields += [
            StructField("_translation_map", StringType()),
            StructField("_segmented_translation_map", StringType()),
        ]
    if aggregate_faith_scores:
        out_fields += [
            StructField(k, DoubleType()) for k in ker.FAITH_DIMENSIONS
        ] + [
            StructField("faith_avg", DoubleType()),
            StructField("faith_parse_failed", BooleanType()),
            StructField("faith_segment_scores", StringType()),
        ]
    # output_field may legitimately replace a source column of the same name
    seen: dict[str, int] = {}
    dedup_fields = []
    for fld in out_fields:
        if fld.name in seen:
            dedup_fields[seen[fld.name]] = fld
        else:
            seen[fld.name] = len(dedup_fields)
            dedup_fields.append(fld)
    out_schema = StructType(dedup_fields)
    out_names = [f.name for f in dedup_fields]
    text_paths = ker.normalize_text_field(text_field)
    faith_cols = list(ker.FAITH_DIMENSIONS)

    def _rebuild(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("_seg_idx")
        first = g.iloc[0]
        row = {name: first[name] for name in base_names}
        # reassembly.py:152-162 — summed time, joined non-blank errors
        row["translation_time"] = (
            float(g["_translation_time"].fillna(0.0).sum())
            if "_translation_time" in g.columns
            else 0.0
        )
        if "_translation_error" in g.columns:
            errs = [str(e) for e in g["_translation_error"] if e and str(e).strip()]
            row["translation_errors"] = "; ".join(errs)
        else:
            row["translation_errors"] = ""

        meta_json = first["_seg_metadata"]
        meta = json.loads(meta_json) if meta_json else {}
        if meta.get("mode") == "skip":
            segs: list[str] = []
        else:
            raw = g["_translated"] if "_translated" in g.columns else g["_seg_segments"]
            segs = ["" if s is None else str(s) for s in raw]
            # the pad row a zero-segment document carries is not a
            # segment — but only OUR segmenter's envelope (with
            # field_metadatas) has the pad-row convention; legacy
            # single-field metadata keeps its segments
            fms = meta.get("field_metadatas")
            if fms is not None:
                expected = sum(ker.count_segments_in_meta(fm) for fm in fms)
                if expected == 0:
                    segs = []
        built = ker.reassemble_document(
            meta_json or "{}",
            segs,
            row,
            text_field=primary,
            output_field=output_field,
            replace_source_fields=replace_source_fields,
        )
        for k, v in built.items():
            if k in out_names:
                row[k] = v
        if output_field not in row:
            row[output_field] = built.get(output_field, "")

        if aggregate_faith_scores:
            _fold_faith(row, g, faith_cols)
        return pd.DataFrame([{k: row.get(k) for k in out_names}])

    return df.groupBy("_seg_doc_id").applyInPandas(_rebuild, schema=out_schema)


def _fold_faith(row: dict, g: pd.DataFrame, faith_cols: list[str]) -> None:
    """reassembly.py:345-380 — document-level FAITH aggregation."""
    if not set(faith_cols).issubset(g.columns):
        for c in faith_cols:
            row[c] = 0.0
        row["faith_avg"] = 0.0
        row["faith_parse_failed"] = False
        row["faith_segment_scores"] = "[]"
        return
    seg_scores = [
        {
            key: float(rec.get(col) or 0.0)
            for col, key in ker.FAITH_DIMENSIONS.items()
        }
        for rec in g.to_dict(orient="records")
    ]
    avg = ker.average_faith_scores(seg_scores)
    for col, key in ker.FAITH_DIMENSIONS.items():
        row[col] = avg[key]
    row["faith_avg"] = ker.compute_faith_avg(avg)
    row["faith_parse_failed"] = (
        bool(g["faith_parse_failed"].fillna(False).any())
        if "faith_parse_failed" in g.columns
        else False
    )
    row["faith_segment_scores"] = json.dumps(seg_scores, ensure_ascii=False)


def score_faith(
    df: DataFrame,
    scorer: Callable[[list[str], list[str]], list[str]] | None = None,
    source_text_field: str = "text",
    translated_text_field: str = "translated_text",
    threshold: float = 2.5,
    filter_enabled: bool = True,
) -> DataFrame:
    """evaluation/faith.py:107-321 FaithEvalFilter — score each
    (source, translation) row on the five FAITH dimensions via the
    injectable ``scorer`` seam, attach ``faith_*`` columns, and (when
    ``filter_enabled``) drop rows with ``faith_avg < threshold`` while
    preserving parse failures (faith.py:312 keeps them explicitly).

    ``scorer`` is ``(list[source], list[translated]) -> list[raw_response]``
    — ``kernels.translation.make_llm_faith_scorer`` adapts a chat client
    into this shape; tests inject a fake. Parsing stays Spark-side
    (``extract_faith_scores``) so a malformed response is attributed to
    its row (``faith_parse_failed``) rather than poisoning the batch.

    Rows where BOTH texts are blank are never sent to the scorer and get
    all-zero scores with ``parse_failed=False`` (faith.py:246-257). A
    batch-level scorer failure retries row-by-row; a row-level failure
    degrades to the reference's empty response (-> zeros + parse_failed,
    faith.py:403-415). The threshold cut itself is a declarative Column
    filter, so at scale only the scoring UDF pays Python cost."""
    if scorer is None:
        msg = (
            "score_faith requires a scorer callable "
            "(list[str], list[str]) -> list[str]; the reference backend is "
            "an AsyncLLMClient (evaluation/faith.py:119) — adapt one with "
            "kernels.translation.make_llm_faith_scorer"
        )
        raise NotImplementedError(msg)
    for col in (source_text_field, translated_text_field):
        if col not in df.columns:
            raise ValueError(f"score_faith: missing column {col!r}")

    dim_cols = list(ker.FAITH_DIMENSIONS)
    dim_keys = list(ker.FAITH_DIMENSIONS.values())
    out_type = StructType(
        [StructField(c, DoubleType()) for c in dim_cols]
        + [
            StructField("faith_avg", DoubleType()),
            StructField("faith_parse_failed", BooleanType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _score(block: pd.DataFrame) -> pd.DataFrame:
        srcs = ["" if s is None else str(s) for s in block["s"]]
        dsts = ["" if t is None else str(t) for t in block["t"]]
        n = len(srcs)
        scores = [dict.fromkeys(dim_keys, 0.0) for _ in range(n)]
        failed = [False] * n
        idxs = [i for i in range(n) if srcs[i].strip() or dsts[i].strip()]
        if idxs:
            sub_s = [srcs[i] for i in idxs]
            sub_t = [dsts[i] for i in idxs]
            try:
                responses = [str(r) for r in scorer(sub_s, sub_t)]
                if len(responses) != len(idxs):
                    raise ValueError(
                        f"scorer returned {len(responses)} results "
                        f"for {len(idxs)} rows"
                    )
            except Exception:
                responses = []
                for i in idxs:  # per-row retry; failures -> "" (faith.py:413)
                    try:
                        (one,) = scorer([srcs[i]], [dsts[i]])
                        responses.append(str(one))
                    except Exception:
                        responses.append("")
            for i, resp in zip(idxs, responses):
                scores[i], failed[i] = ker.extract_faith_scores(resp)
        out = {
            c: [sc[k] for sc in scores]
            for c, k in ker.FAITH_DIMENSIONS.items()
        }
        out["faith_avg"] = [ker.compute_faith_avg(sc) for sc in scores]
        out["faith_parse_failed"] = failed
        return pd.DataFrame(out)

    res = F.col("_faith_res")
    out = df.withColumn(
        "_faith_res",
        _score(
            F.struct(
                F.col(source_text_field).cast("string").alias("s"),
                F.col(translated_text_field).cast("string").alias("t"),
            )
        ),
    )
    for c in [*dim_cols, "faith_avg", "faith_parse_failed"]:
        out = out.withColumn(c, res[c])
    out = out.drop("_faith_res")
    if filter_enabled:
        out = out.where(
            (F.col("faith_avg") >= F.lit(float(threshold)))
            | F.col("faith_parse_failed")
        )
    return out


def faith_threshold_filter(df: DataFrame, threshold: float = 2.5) -> DataFrame:
    """evaluation/faith.py:486-524 FaithThresholdFilterStage — drop rows
    below the FAITH threshold using PRECOMPUTED scores: pure Column
    predicate (JVM codegen, pushdown-eligible). Parse-failed rows are
    kept, and so are never-scored rows (``faith_segment_scores == "[]"``,
    faith.py:505-509) when that column exists."""
    for col in ("faith_avg", "faith_parse_failed"):
        if col not in df.columns:
            raise ValueError(f"faith_threshold_filter: missing column {col!r}")
    keep = (F.col("faith_avg") >= F.lit(float(threshold))) | F.col(
        "faith_parse_failed"
    )
    if "faith_segment_scores" in df.columns:
        keep = keep | (
            F.trim(F.col("faith_segment_scores").cast("string")) == F.lit("[]")
        )
    return df.where(keep)


def skip_existing_translations(
    df: DataFrame, translation_column: str = "translated_text"
) -> tuple[DataFrame, DataFrame]:
    """skipped_rows.py:32-95 — split into (needs-translation,
    already-translated). The reference stashes the skipped rows in
    driver-side batch metadata; here both halves are DataFrames, so the
    stash shuffles/persists like any other relation."""
    if translation_column not in df.columns:
        return df, df.limit(0)
    col = F.col(translation_column)
    done = col.isNotNull() & (F.trim(col.cast("string")) != "")
    return df.where(~done), df.where(done)


def restore_skipped_rows(
    translated: DataFrame,
    skipped: DataFrame,
    column_defaults: dict | None = None,
) -> DataFrame:
    """skipped_rows.py:99-172 — re-merge the skipped rows, filling columns
    the translation pipeline added with the reference's defaults (empty
    string when unlisted). Row order is not restored: a distributed
    relation has none (the reference's ``_skip_original_idx`` sort is a
    pandas artifact); callers needing an order should sort on their own
    key."""
    defaults = dict(_RESTORE_DEFAULTS)
    if column_defaults:
        defaults.update(column_defaults)
    filled = skipped
    for fld in translated.schema.fields:
        if fld.name not in skipped.columns:
            filled = filled.withColumn(
                fld.name, F.lit(defaults.get(fld.name, "")).cast(fld.dataType)
            )
    return translated.unionByName(filled, allowMissingColumns=True)


def format_translation_output(
    df: DataFrame,
    target_lang: str,
    output_mode: str = "replaced",
    output_field: str = "translated_text",
    reconstruct_messages: bool = False,
    messages_field: str = "messages",
    messages_content_field: str = "content",
) -> DataFrame:
    """format_translation_output.py:35-148 — shape the output columns:
    ``raw``/``both`` add a ``translation_metadata`` JSON envelope, ``raw``
    drops the plain text, ``reconstruct_messages`` splices translations
    back into chat messages. The JSON build runs in an Arrow batch for
    byte parity with the reference's ``json.dumps`` (``", "``/``": "``
    separators, which ``to_json`` would not reproduce)."""
    target = target_lang.strip()
    if not target:
        raise ValueError("format_translation_output requires a non-empty target_lang")
    out = df

    if output_mode in ("raw", "both"):

        @F.pandas_udf(StringType())
        def _meta(block: pd.DataFrame) -> pd.Series:
            vals = []
            for rec in block.to_dict(orient="records"):
                vals.append(
                    ker.build_translation_metadata(
                        target_lang=target,
                        translated_text=rec.get("t") or "",
                        translation_map=_opt_json_obj(rec.get("tm")),
                        segmented_translation_map=_opt_json_obj(rec.get("sm")),
                    )
                )
            return pd.Series(vals)

        tm = (
            F.col("_translation_map")
            if "_translation_map" in out.columns
            else F.lit(None).cast("string")
        )
        sm = (
            F.col("_segmented_translation_map")
            if "_segmented_translation_map" in out.columns
            else F.lit(None).cast("string")
        )
        text = (
            F.col(output_field)
            if output_field in out.columns
            else F.lit("").cast("string")
        )
        out = out.withColumn(
            "translation_metadata",
            _meta(F.struct(text.alias("t"), tm.alias("tm"), sm.alias("sm"))),
        )

    if reconstruct_messages and messages_field in out.columns:

        @F.pandas_udf(StringType())
        def _messages(block: pd.DataFrame) -> pd.Series:
            vals = []
            for rec in block.to_dict(orient="records"):
                raw = rec.get("m")
                parsed = None
                if isinstance(raw, str):
                    try:
                        parsed = json.loads(raw)
                    except (json.JSONDecodeError, TypeError):
                        parsed = None
                elif isinstance(raw, list):
                    parsed = raw
                if not isinstance(parsed, list):
                    vals.append("[]")
                    continue
                rebuilt = ker.reconstruct_messages_with_translation(
                    parsed, rec.get("t") or "", field_path=messages_content_field
                )
                vals.append(json.dumps(rebuilt, ensure_ascii=False))
            return pd.Series(vals)

        text = (
            F.col(output_field)
            if output_field in out.columns
            else F.lit("").cast("string")
        )
        out = out.withColumn(
            "translated_messages",
            _messages(F.struct(F.col(messages_field).alias("m"), text.alias("t"))),
        )

    if output_mode == "raw" and output_field in out.columns:
        out = out.drop(output_field)
    return out.drop("_translation_map", "_segmented_translation_map")


_VALID_OUTPUT_MODES = {"replaced", "raw", "both"}


def translation_pipeline(
    df: DataFrame,
    source_lang: str,
    target_lang: str,
    text_field: str | list[str] = "text",
    output_field: str = "translated_text",
    segmentation_mode: str = "coarse",
    min_segment_chars: int = 0,
    translator: Callable[[list[str]], list[str]] | None = None,
    dry_run: bool = False,
    enable_faith_eval: bool = False,
    faith_scorer: Callable[[list, list], list] | None = None,
    faith_threshold: float = 2.5,
    filter_enabled: bool = True,
    output_mode: str = "replaced",
    merge_scores: bool = False,
    reconstruct_messages: bool = False,
    messages_field: str = "messages",
    messages_content_field: str = "content",
    skip_translated: bool = False,
    translation_column: str = "translated_text",
    sentencizer: Callable[[str], list[tuple[int, int]]] | None = None,
    doc_id_field: str | None = None,
) -> DataFrame:
    """pipeline.py:46-251 TranslationStage — the composite that chains the
    whole translation surface in the reference's stage order
    (pipeline.py:161-247): optional skip of already-translated rows ->
    segmentation -> translate seam -> optional SEGMENT-level FAITH scoring
    (``source_text_field="_seg_segments"``/``"_translated"``,
    ``filter_enabled=False`` — pipeline.py:197-213) -> reassembly with
    FAITH aggregation -> document-level threshold filter -> restore
    skipped rows -> output formatting -> optional score merge.

    Validation mirrors pipeline.py:87-159 with the backend/client checks
    mapped onto the injectable seams: ``translator`` stands in for the
    reference's client+model pair, ``faith_scorer`` for its FAITH client.
    Every stage boundary is a DataFrame, so the composite inherits each
    member's scale shape (one explode, one scoring UDF pass, one
    reassembly shuffle keyed on the document)."""
    source_lang = source_lang.strip()
    target_lang = target_lang.strip()
    if not source_lang:
        raise ValueError("translation_pipeline requires a non-empty 'source_lang'")
    if not target_lang:
        raise ValueError("translation_pipeline requires a non-empty 'target_lang'")
    if output_mode not in _VALID_OUTPUT_MODES:
        raise ValueError(
            f"Invalid output_mode {output_mode!r}. "
            f"Must be one of: {sorted(_VALID_OUTPUT_MODES)}"
        )
    if translator is None and not dry_run:
        # pipeline.py:117-125 — the llm backend requires a client
        raise ValueError(
            "translation_pipeline requires a translator callable "
            "(list[str] -> list[str]) unless dry_run=True"
        )
    if enable_faith_eval and faith_scorer is None:
        # pipeline.py:127-147 — FAITH eval requires a scoring client
        raise ValueError(
            "translation_pipeline with enable_faith_eval=True requires a "
            "faith_scorer callable (list[src], list[dst]) -> list[str]"
        )
    if merge_scores and output_mode == "replaced":
        raise ValueError(
            "merge_scores=True requires output_mode in {'raw','both'}. "
            "Got output_mode='replaced'. Set output_mode='both' explicitly."
        )

    work = df
    skipped = None
    if skip_translated:
        work, skipped = skip_existing_translations(work, translation_column)

    work = segment_documents(
        work,
        text_field=text_field,
        mode=segmentation_mode,
        min_segment_chars=min_segment_chars,
        sentencizer=sentencizer,
        doc_id_field=doc_id_field,
    )
    work = translate_segments(work, translator=translator, dry_run=dry_run)

    if enable_faith_eval:
        # segment-level scoring, no cut yet: pipeline.py:197-213
        work = score_faith(
            work,
            scorer=faith_scorer,
            source_text_field="_seg_segments",
            translated_text_field="_translated",
            threshold=faith_threshold,
            filter_enabled=False,
        )

    work = reassemble_documents(
        work,
        text_field=text_field,
        output_field=output_field,
        replace_source_fields=output_mode in ("replaced", "both"),
        emit_metadata_helpers=output_mode in ("raw", "both"),
        aggregate_faith_scores=enable_faith_eval,
    )

    if enable_faith_eval and filter_enabled:
        work = faith_threshold_filter(work, faith_threshold)

    if skip_translated and skipped is not None:
        work = restore_skipped_rows(work, skipped)

    if output_mode != "replaced" or reconstruct_messages:
        work = format_translation_output(
            work,
            target_lang=target_lang,
            output_mode=output_mode,
            output_field=output_field,
            reconstruct_messages=reconstruct_messages,
            messages_field=messages_field,
            messages_content_field=messages_content_field,
        )
    else:
        work = work.drop("_translation_map", "_segmented_translation_map")

    if enable_faith_eval and merge_scores and output_mode in ("raw", "both"):
        work = merge_faith_scores(work)
    return work


def _opt_json_obj(value) -> dict | None:
    """format_translation_output.py:150-167."""
    if isinstance(value, dict):
        return value
    if isinstance(value, str) and value.strip():
        try:
            parsed = json.loads(value)
        except (json.JSONDecodeError, TypeError):
            return None
        if isinstance(parsed, dict):
            return parsed
    return None


def merge_faith_scores(df: DataFrame) -> DataFrame:
    """merge_faith_scores.py:33-98 — merge available document-level FAITH
    columns into the ``translation_metadata`` JSON (``faith_avg`` ->
    ``average``; unparseable metadata degrades to a fresh object)."""
    if "translation_metadata" not in df.columns:
        return df
    present = [c for c in [*ker.FAITH_DIMENSIONS, "faith_avg"] if c in df.columns]
    if not present:
        return df
    key_of = {c: k for c, k in ker.FAITH_DIMENSIONS.items()}
    key_of["faith_avg"] = "average"

    @F.pandas_udf(StringType())
    def _merge(block: pd.DataFrame) -> pd.Series:
        vals = []
        for rec in block.to_dict(orient="records"):
            scores = {
                key_of[c]: float(rec[c])
                for c in present
                if rec.get(c) is not None and pd.notna(rec[c])
            }
            vals.append(
                ker.merge_faith_scores_into_metadata(
                    str(rec.get("meta") or "{}"), scores
                )
            )
        return pd.Series(vals)

    cols = [F.col("translation_metadata").alias("meta")] + [F.col(c) for c in present]
    return df.withColumn("translation_metadata", _merge(F.struct(*cols)))
