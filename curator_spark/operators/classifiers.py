"""Distributed text-classifier stages, Spark-first (reference
``stages/text/classifiers/{base,utils,domain,quality,content_type,
fineweb_edu,aegis,prompt_task_complexity}.py``).

The reference decomposes each classifier into TokenizerStage →
SortByLengthStage → ModelStage (Ray actors, cuDF batches, a torch
checkpoint per GPU). The Spark re-expression keeps the same data flow
with the model slots as injectable seams:

- **tokenize_for_classifier** — ``max_chars`` truncation is a Column
  ``substring`` (JVM, pushed before any Python), then ONE Arrow-batched
  UDF around the injectable ``tokenizer(list[str]) ->
  list[(input_ids, attention_mask)]`` seam (the reference holds an
  ``AutoTokenizer``).
- **sort_within_partitions_by_length** — the reference sorts each batch
  by token length so model batches are length-uniform (less padding
  waste). Here that is ``sortWithinPartitions`` — NO shuffle, rows
  never leave their partition, and the captured ``_seq_order`` restores
  the exact partition-local order afterwards (utils.py:24-56's
  SEQ_ORDER_FIELD contract).
- **classifier_inference** — ``mapInPandas`` slicing Arrow batches into
  ``batch_size`` model batches, right/left padding to the batch max,
  the injectable ``forward(input_ids, attention_mask) -> probs`` seam,
  then base.py:139-151's argmax → label-table mapping.
- **fineweb_edu_classifier** — the regression head's post-processing is
  fully declarative: clamp via least/greatest, ``bround`` (HALF_EVEN —
  python ``round`` parity), the 2.5 label cut (fineweb_edu.py:110-122).
- **aegis_classifier** — the LlamaGuard prompt wrap is pure Column
  ``concat`` (the taxonomy is a literal), the generative model is the
  ``generate(list[prompt]) -> list[str]`` seam, and aegis.py:314-329's
  response parse is a Column program (split / trim / isin / when).
- **ptc_inference** — prompt-task-complexity's 8-head output math
  (kernels.classifiers) over the ``forward -> list[8 logit matrices]``
  seam, emitting the reference's 11 output fields.

At 10^12-row scale the knobs are partition count (model parallelism)
and ``batch_size`` (device batch); no driver state, so retried tasks
recompute identical rows.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernels import classifiers as ker

__all__ = [
    "center_crop_text",
    "finemath_classifier",
    "aegis_classifier",
    "embedding_inference",
    "aegis_label_column",
    "classifier_inference",
    "distributed_classifier",
    "fineweb_edu_classifier",
    "ptc_inference",
    "restore_seq_order",
    "sort_within_partitions_by_length",
    "tokenize_for_classifier",
]

_TOKENS_SCHEMA = StructType(
    [
        StructField("input_ids", ArrayType(IntegerType())),
        StructField("attention_mask", ArrayType(IntegerType())),
    ]
)


def _require(seam, who: str, shape: str):
    if seam is None:
        raise NotImplementedError(
            f"{who} requires a {shape} callable; the reference backend is a "
            "torch/HF checkpoint (stages/text/classifiers) absent in this "
            "sandbox — inject one"
        )


def tokenize_for_classifier(
    df: DataFrame,
    tokenizer: Callable | None = None,
    text_field: str = "text",
    max_chars: int | None = None,
    max_seq_length: int | None = None,
) -> DataFrame:
    """TokenizerStage (models/tokenizer.py via base.py:216-226):
    ``doc[:max_chars]`` then tokenize. Truncation happens as a Column
    ``substring`` so only the clipped text crosses into Python;
    ``tokenizer(list[str]) -> list[(input_ids, attention_mask)]`` is the
    injectable seam (an ``AutoTokenizer.__call__`` adapter drops in).
    ``max_seq_length`` clips token lists after the seam (the reference
    passes it to the tokenizer; enforcing it here keeps any seam
    honest)."""
    _require(tokenizer, "tokenize_for_classifier", "(list[str]) -> list[(ids, mask)]")
    if text_field not in df.columns:
        raise ValueError(f"tokenize_for_classifier: missing column {text_field!r}")
    src = F.col(text_field)
    if max_chars is not None:
        src = src.substr(1, int(max_chars))
    clip = max_seq_length

    @F.pandas_udf(_TOKENS_SCHEMA)
    def _tok(texts: pd.Series) -> pd.DataFrame:
        pairs = tokenizer(["" if t is None else str(t) for t in texts])
        ids = [list(map(int, p[0]))[: clip or None] for p in pairs]
        masks = [list(map(int, p[1]))[: clip or None] for p in pairs]
        return pd.DataFrame({"input_ids": ids, "attention_mask": masks})

    out = df.withColumn("_tokens", _tok(src))
    return out.select("*", "_tokens.input_ids", "_tokens.attention_mask").drop("_tokens")


def sort_within_partitions_by_length(
    df: DataFrame,
    attention_mask_field: str = "attention_mask",
    order_field: str = "_seq_order",
) -> DataFrame:
    """SortByLengthStage (utils.py:24-56): sort by token count so model
    batches are length-uniform. Spark-first: ``sortWithinPartitions`` —
    zero shuffle (a global sort would be a pointless exchange; padding
    waste is a per-batch property and batches never span partitions).
    ``order_field`` preserves the original order for
    :func:`restore_seq_order`; if it already exists the frame is
    returned unchanged (the reference's idempotence check)."""
    if order_field in df.columns:
        return df
    length = F.aggregate(
        F.col(attention_mask_field), F.lit(0), lambda acc, x: acc + x
    )
    return (
        df.withColumn(order_field, F.monotonically_increasing_id())
        .withColumn("_token_length", length)
        .sortWithinPartitions("_token_length")
        .drop("_token_length")
    )


def restore_seq_order(df: DataFrame, order_field: str = "_seq_order") -> DataFrame:
    """Undo :func:`sort_within_partitions_by_length` — rows never left
    their partition, so a within-partition sort on the captured id is an
    EXACT restore (the reference re-sorts by SEQ_ORDER_FIELD after
    inference, models/model.py ``has_seq_order``)."""
    if order_field not in df.columns:
        return df
    return df.sortWithinPartitions(order_field).drop(order_field)


def _pad_batch(ids: list, masks: list, padding_side: str) -> tuple:
    width = max((len(x) for x in ids), default=0)
    ii = np.zeros((len(ids), width), dtype=np.int64)
    mm = np.zeros((len(ids), width), dtype=np.int64)
    for r, (i, m) in enumerate(zip(ids, masks)):
        if padding_side == "left":
            ii[r, width - len(i):] = i
            mm[r, width - len(m):] = m
        else:
            ii[r, : len(i)] = i
            mm[r, : len(m)] = m
    return ii, mm


def _forward_batches(
    pdf: pd.DataFrame, forward: Callable, batch_size: int, padding_side: str
):
    """Shared pad/slice/forward loop for every model seam: yield
    ``(mask, forward_output)`` per ``batch_size`` slice of the Arrow
    batch, output as float64 ndarray. One fix here (padding, empty
    batches, dtype) reaches the classifier, both regression heads, and
    the embedder."""
    for lo in range(0, len(pdf), batch_size):
        chunk = pdf.iloc[lo : lo + batch_size]
        ii, mm = _pad_batch(
            [list(x) for x in chunk["input_ids"]],
            [list(x) for x in chunk["attention_mask"]],
            padding_side,
        )
        yield mm, np.asarray(forward(ii, mm), dtype=np.float64)


def _regression_logits_run(
    keep_cols: list, logit_col: str, forward: Callable, batch_size: int
):
    """mapInPandas body shared by the FineWeb-Edu / FineMath regression
    heads: one logit per row into ``logit_col``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            logits: list = []
            for _, out_arr in _forward_batches(pdf, forward, batch_size, "right"):
                logits.extend(out_arr.reshape(-1).tolist())
            res = pdf[keep_cols].copy()
            res[logit_col] = logits
            yield res

    return run


def classifier_inference(
    df: DataFrame,
    forward: Callable | None = None,
    labels: list | None = None,
    label_field: str = "preds",
    score_field: str | None = None,
    batch_size: int = 256,
    padding_side: str = "right",
    keep_tokens: bool = False,
) -> DataFrame:
    """ClassifierModelStage (base.py:69-162): slice into
    ``batch_size`` model batches, pad to the batch max (length-uniform
    after :func:`sort_within_partitions_by_length`, so padding waste is
    minimal), run the injectable ``forward(input_ids, attention_mask) ->
    probs`` seam, then argmax into the id-ordered ``labels`` table (the
    reference reads it from the model config). ``score_field`` attaches
    the winning-class probability."""
    _require(forward, "classifier_inference", "(ids, mask) -> probs")
    if not labels:
        raise ValueError("classifier_inference: labels table is required")
    fields = [f for f in df.schema.fields if keep_tokens or f.name not in ("input_ids", "attention_mask")]
    out_schema = StructType(
        fields
        + [StructField(label_field, StringType())]
        + ([StructField(score_field, DoubleType())] if score_field else [])
    )
    keep_cols = [f.name for f in fields]
    lbls, bs, side = list(labels), int(batch_size), padding_side

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            preds: list = []
            scores: list = []
            for _, probs in _forward_batches(pdf, forward, bs, side):
                preds.extend(ker.argmax_labels(probs, lbls))
                if score_field:
                    scores.extend(probs.max(axis=1).tolist())
            out = pdf[keep_cols].copy()
            out[label_field] = preds
            if score_field:
                out[score_field] = scores
            yield out

    return df.mapInPandas(run, schema=out_schema)


def distributed_classifier(
    df: DataFrame,
    tokenizer: Callable | None = None,
    forward: Callable | None = None,
    labels: list | None = None,
    label_field: str = "preds",
    score_field: str | None = None,
    text_field: str = "text",
    filter_by: list | None = None,
    max_chars: int | None = None,
    max_seq_length: int | None = 512,
    sort_by_length: bool = True,
    batch_size: int = 256,
    padding_side: str = "right",
    keep_tokens: bool = False,
) -> DataFrame:
    """DistributedDataClassifier (base.py:165-262) — the full composite:
    tokenize → length-sort → inference → optional categorical filter.
    DomainClassifier / QualityClassifier / ContentTypeClassifier are
    this composite with their model's config (labels, max_chars 2000,
    max_seq_length 512) — the checkpoints differ, the structure does
    not. The filter is a declarative ``isin`` Column (base.py:268-269),
    so Catalyst can push it."""
    out = tokenize_for_classifier(df, tokenizer, text_field, max_chars, max_seq_length)
    if sort_by_length:
        out = sort_within_partitions_by_length(out)
    out = classifier_inference(
        out, forward, labels, label_field, score_field, batch_size, padding_side, keep_tokens
    )
    if sort_by_length:
        out = restore_seq_order(out)
    if filter_by:
        out = out.where(F.col(label_field).isin(list(filter_by)))
    return out


def fineweb_edu_classifier(
    df: DataFrame,
    tokenizer: Callable | None = None,
    forward: Callable | None = None,
    label_field: str = "fineweb-edu-score-label",
    float_score_field: str = "fineweb-edu-score-float",
    int_score_field: str = "fineweb-edu-score-int",
    text_field: str = "text",
    max_chars: int | None = None,
    max_seq_length: int = 512,
    sort_by_length: bool = True,
    batch_size: int = 256,
) -> DataFrame:
    """FineWebEduClassifier family (fineweb_edu.py:40-190): a regression
    head — ``forward(ids, mask)`` returns ONE logit per row — whose
    post-processing runs as Column algebra (fineweb_edu.py:110-122):
    float score clamped to [0, 5]; int score ``bround`` (HALF_EVEN,
    matching python ``round``); high/low-quality label at 2.5."""
    _require(forward, "fineweb_edu_classifier", "(ids, mask) -> logits")
    out = tokenize_for_classifier(df, tokenizer, text_field, max_chars, max_seq_length)
    if sort_by_length:
        out = sort_within_partitions_by_length(out)
    fields = [f for f in out.schema.fields if f.name not in ("input_ids", "attention_mask")]
    keep_cols = [f.name for f in fields]
    out_schema = StructType(
        fields + [StructField("_fineweb_logit", DoubleType())]
    )
    out = out.mapInPandas(
        _regression_logits_run(keep_cols, "_fineweb_logit", forward, int(batch_size)),
        schema=out_schema,
    )
    if sort_by_length:
        out = restore_seq_order(out)
    clamped = F.least(F.lit(5.0), F.greatest(F.lit(0.0), F.col("_fineweb_logit")))
    return (
        out.withColumn(float_score_field, clamped)
        .withColumn(int_score_field, F.bround(clamped).cast("long"))
        .withColumn(
            label_field,
            F.when(F.col("_fineweb_logit") >= 2.5, F.lit("high_quality")).otherwise(
                F.lit("low_quality")
            ),
        )
        .drop("_fineweb_logit")
    )


def center_crop_text(
    df: DataFrame, text_field: str = "text", center_crop_chars: int = 10_000
) -> DataFrame:
    """CenterCropTextStage (math/classifiers/finemath.py:39-75): keep the
    middle ``2*center_crop_chars`` characters of the text —
    ``s[max(0, m-n):min(m+n, len(s))]`` with ``m = len(s)//2`` — so
    tokenization sees central context. Pure Column arithmetic (floor-div
    midpoint, greatest/least bounds, 1-based substring), JVM codegen;
    ``center_crop_chars <= 0`` is the reference's pass-through."""
    n = int(center_crop_chars)
    if n <= 0:
        return df
    length = F.length(F.col(text_field))
    mid = F.floor(length / F.lit(2))
    begin = F.greatest(F.lit(0), mid - F.lit(n))
    end = F.least(mid + F.lit(n), length)
    return df.withColumn(
        text_field,
        F.col(text_field).substr(
            (begin + F.lit(1)).cast("int"), (end - begin).cast("int")
        ),
    )


def finemath_classifier(
    df: DataFrame,
    tokenizer: Callable | None = None,
    forward: Callable | None = None,
    float_score_field: str = "finemath_scores",
    int_score_field: str = "finemath_int_scores",
    text_field: str = "text",
    max_chars: int | None = None,
    max_seq_length: int = 512,
    sort_by_length: bool = False,
    batch_size: int = 256,
    center_crop_chars: int | None = 10_000,
) -> DataFrame:
    """FineMathClassifier composite (math/classifiers/finemath.py:78-203):
    CenterCropTextStage -> TokenizerStage -> regression ModelStage. Same
    regression-head flow as ``fineweb_edu_classifier`` with FineMath's
    post-processing — ``np.clip(logits, 0, 5)`` float score and
    ``np.round`` (banker's, = ``bround``) int score, no label cut — and
    the center crop applied as Column algebra before tokenization.
    ``sort_by_length`` defaults False (finemath.py:166), matching the
    composite's ``has_seq_order=self.sort_by_length`` wiring."""
    _require(forward, "finemath_classifier", "(ids, mask) -> logits")
    out = df
    if center_crop_chars is not None and center_crop_chars > 0:
        out = center_crop_text(out, text_field, center_crop_chars)
    out = tokenize_for_classifier(out, tokenizer, text_field, max_chars, max_seq_length)
    if sort_by_length:
        out = sort_within_partitions_by_length(out)
    fields = [f for f in out.schema.fields if f.name not in ("input_ids", "attention_mask")]
    keep_cols = [f.name for f in fields]
    out_schema = StructType(fields + [StructField("_finemath_logit", DoubleType())])
    out = out.mapInPandas(
        _regression_logits_run(keep_cols, "_finemath_logit", forward, int(batch_size)),
        schema=out_schema,
    )
    if sort_by_length:
        out = restore_seq_order(out)
    clamped = F.least(F.lit(5.0), F.greatest(F.lit(0.0), F.col("_finemath_logit")))
    return (
        out.withColumn(float_score_field, clamped)
        .withColumn(int_score_field, F.bround(clamped).cast("long"))
        .drop("_finemath_logit")
    )


def aegis_label_column(raw: Column) -> Column:
    """aegis.py:314-329 ``_parse_response`` as ONE Column program:
    'safe' first line -> safe; 'unsafe' -> the second line when it is a
    known category (a missing second line is NULL, falls to unknown);
    anything else -> unknown. Pure JVM — no Python per row."""
    lines = F.split(F.coalesce(raw, F.lit("")), "\n")
    # str.strip() parity: F.trim removes only ASCII spaces, so a CRLF- or
    # tab-terminated response line ('safe\r') would misparse to unknown.
    def _strip(c: Column) -> Column:
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    first = _strip(lines[0])
    second = _strip(F.try_element_at(lines, F.lit(2)))
    return (
        F.when(first == "safe", F.lit("safe"))
        .when(
            (first == "unsafe") & second.isin(ker.AEGIS_LABELS[2:]),
            second,
        )
        .otherwise(F.lit("unknown"))
    )


def aegis_classifier(
    df: DataFrame,
    generate: Callable | None = None,
    label_field: str = "aegis_pred",
    raw_output_field: str = "_aegis_raw_pred",
    keep_raw_output: bool = False,
    text_field: str = "text",
    filter_by: list | None = None,
    max_chars: int = 6000,
) -> DataFrame:
    """AegisClassifier (aegis.py:370-520): LlamaGuard safety labels.
    The prompt wrap (aegis_utils.format_aegis over ``doc[:max_chars]``)
    is pure Column ``concat`` — the taxonomy is a literal — so prompt
    construction never enters Python. ``generate(list[prompt]) ->
    list[str]`` is the injectable generative seam returning the model's
    CONTINUATION (the reference slices the decoded tokens past the
    prompt length, aegis.py:331-343; a seam that echoes the prompt is
    handled by stripping it). The response parse is the declarative
    :func:`aegis_label_column`."""
    _require(generate, "aegis_classifier", "(list[prompt]) -> list[str]")
    if text_field not in df.columns:
        raise ValueError(f"aegis_classifier: missing column {text_field!r}")
    pre, post = ker.format_aegis("\x00").split("\x00")
    prompt = F.concat(
        F.lit(pre), F.coalesce(F.col(text_field), F.lit("")).substr(1, int(max_chars)), F.lit(post)
    )
    out = df.withColumn("_aegis_prompt", prompt)

    @F.pandas_udf("string")
    def _gen(prompts: pd.Series) -> pd.Series:
        from ..kernels.llmseam import generate_with_rowwise_fallback

        plist = ["" if p is None else str(p) for p in prompts]
        raw = generate_with_rowwise_fallback(generate, plist)
        # tolerate prompt-echoing seams (reference slices by prompt length)
        raw = [r[len(p):] if r.startswith(p) and p else r for r, p in zip(raw, plist)]
        return pd.Series(raw)

    out = out.withColumn(raw_output_field, _gen(F.col("_aegis_prompt"))).drop("_aegis_prompt")
    out = out.withColumn(label_field, aegis_label_column(F.col(raw_output_field)))
    if not keep_raw_output:
        out = out.drop(raw_output_field)
    if filter_by:
        out = out.where(F.col(label_field).isin(list(filter_by)))
    return out


PTC_OUTPUT_FIELDS = [
    "prompt_complexity_score",
    "task_type_1",
    "task_type_2",
    "task_type_prob",
    "creativity_scope",
    "reasoning",
    "contextual_knowledge",
    "number_of_few_shots",
    "domain_knowledge",
    "no_label_reason",
    "constraint_ct",
]


def ptc_inference(
    df: DataFrame,
    forward: Callable | None = None,
    task_type_map: dict | None = None,
    weights_map: dict | None = None,
    divisor_map: dict | None = None,
    text_field: str = "text",
    tokenizer: Callable | None = None,
    max_chars: int = 2000,
    max_seq_length: int = 512,
    sort_by_length: bool = True,
    batch_size: int = 256,
) -> DataFrame:
    """PromptTaskComplexityClassifier (prompt_task_complexity.py:47-369):
    a multi-headed model. ``forward(ids, mask) -> list[8 logit
    matrices]`` is the injectable seam (heads in the reference's order:
    task_type, creativity_scope, reasoning, contextual_knowledge,
    number_of_few_shots, domain_knowledge, no_label_reason,
    constraint_ct); the maps ride in the model config and are injected.
    Output math — top-2 task types with the 0.1 "NA" cut, weighted-sum
    scores, the few-shots floor, the fixed-weight complexity blend —
    is ``kernels.classifiers`` and emits the reference's 11 fields."""
    _require(forward, "ptc_inference", "(ids, mask) -> list[8 logit matrices]")
    for name, m in (("task_type_map", task_type_map), ("weights_map", weights_map), ("divisor_map", divisor_map)):
        if not m:
            raise ValueError(f"ptc_inference: {name} is required (model-config data)")
    out = tokenize_for_classifier(df, tokenizer, text_field, max_chars, max_seq_length)
    if sort_by_length:
        out = sort_within_partitions_by_length(out)
    fields = [f for f in out.schema.fields if f.name not in ("input_ids", "attention_mask")]
    keep_cols = [f.name for f in fields]
    typed = {
        "prompt_complexity_score": DoubleType(),
        "task_type_1": StringType(),
        "task_type_2": StringType(),
        "task_type_prob": DoubleType(),
        "number_of_few_shots": DoubleType(),
    }
    out_schema = StructType(
        fields + [StructField(f_, typed.get(f_, DoubleType())) for f_ in PTC_OUTPUT_FIELDS]
    )
    score_heads = PTC_OUTPUT_FIELDS[4:]  # creativity..constraint_ct, head order 1..7
    bs = int(batch_size)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc = {f_: [] for f_ in PTC_OUTPUT_FIELDS}
            for lo in range(0, len(pdf), bs):
                chunk = pdf.iloc[lo : lo + bs]
                ii, mm = _pad_batch(
                    [list(x) for x in chunk["input_ids"]],
                    [list(x) for x in chunk["attention_mask"]],
                    "right",
                )
                logits = forward(ii, mm)
                t1, t2, tp = ker.ptc_task_types(logits[0], task_type_map)
                acc["task_type_1"].extend(t1)
                acc["task_type_2"].extend(t2)
                acc["task_type_prob"].extend(tp)
                head_scores = {}
                for k, f_ in enumerate(score_heads, start=1):
                    head_scores[f_] = ker.ptc_weighted_scores(
                        logits[k],
                        weights_map[f_],
                        divisor_map[f_],
                        zero_floor=(f_ == "number_of_few_shots"),
                    )
                    acc[f_].extend(head_scores[f_])
                acc["prompt_complexity_score"].extend(
                    ker.prompt_complexity_score(
                        head_scores["creativity_scope"],
                        head_scores["reasoning"],
                        head_scores["constraint_ct"],
                        head_scores["domain_knowledge"],
                        head_scores["contextual_knowledge"],
                        head_scores["number_of_few_shots"],
                    )
                )
            res = pdf[keep_cols].copy()
            for f_ in PTC_OUTPUT_FIELDS:
                res[f_] = [float(x) for x in acc[f_]] if f_ not in ("task_type_1", "task_type_2") else acc[f_]
            yield res

    out = out.mapInPandas(run, schema=out_schema)
    if sort_by_length:
        out = restore_seq_order(out)
    return out


def _mean_pool(token_emb: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """text/embedders/base.py:88-94 — masked token mean, L2-normalized."""
    masked = token_emb * (mask[:, :, None] != 0)
    summed = masked.sum(axis=1)
    denom = np.clip(mask.sum(axis=1, keepdims=True), 1e-9, None)
    pooled = summed / denom
    norm = np.linalg.norm(pooled, axis=1, keepdims=True)
    return pooled / np.clip(norm, 1e-12, None)


def _last_token_pool(
    token_emb: np.ndarray, mask: np.ndarray, padding_side: str = "right"
) -> np.ndarray:
    """text/embedders/base.py:96-105 — last non-padded token embedding,
    L2-normalized. The reference's ``mask.sum()-1`` index is only the
    last token under RIGHT padding; under left padding the tokens occupy
    the rightmost positions, so the last token is the final column."""
    if padding_side == "left":
        idx = np.full(token_emb.shape[0], token_emb.shape[1] - 1, dtype=np.int64)
    else:
        idx = mask.sum(axis=1).astype(np.int64) - 1
    pooled = token_emb[np.arange(token_emb.shape[0]), np.clip(idx, 0, None)]
    norm = np.linalg.norm(pooled, axis=1, keepdims=True)
    return pooled / np.clip(norm, 1e-12, None)


def embedding_inference(
    df: DataFrame,
    forward: Callable | None = None,
    embedding_field: str = "embeddings",
    pooling: str = "mean_pooling",
    batch_size: int = 1024,
    padding_side: str = "right",
) -> DataFrame:
    """EmbeddingModelStage (reference text/embedders/base.py:19-105):
    the pooling + L2-normalization math around the injectable
    ``forward(input_ids, attention_mask) -> token_embeddings (n, L, D)``
    seam — ``mean_pooling`` (masked token mean) or ``last_token`` (the
    last non-padded position), both normalized, batched exactly like
    :func:`classifier_inference`. Compose with
    :func:`tokenize_for_classifier` + :func:`sort_within_partitions_by_length`
    for the reference's full EmbeddingCreatorStage; the embedding column
    feeds the existing semantic-dedup / ANN operators directly."""
    _require(forward, "embedding_inference", "(ids, mask) -> token embeddings")
    if pooling not in ("mean_pooling", "last_token"):
        raise ValueError(f"embedding_inference: unknown pooling {pooling!r}")
    fields = [f for f in df.schema.fields if f.name not in ("input_ids", "attention_mask")]
    keep_cols = [f.name for f in fields]
    from pyspark.sql.types import FloatType

    out_schema = StructType(fields + [StructField(embedding_field, ArrayType(FloatType()))])
    bs, side = int(batch_size), padding_side
    if pooling == "mean_pooling":
        pool = _mean_pool
    else:
        def pool(emb, mm):  # noqa: E306
            return _last_token_pool(emb, mm, side)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs: list = []
            for mm, token_emb in _forward_batches(pdf, forward, bs, side):
                embs.extend(pool(token_emb, mm).astype(np.float32).tolist())
            res = pdf[keep_cols].copy()
            res[embedding_field] = embs
            yield res

    return df.mapInPandas(run, schema=out_schema)
