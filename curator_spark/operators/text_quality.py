"""Round-trip translation quality metrics over two text columns.

Reference: ``stages/text/experimental/translation/evaluation/
text_quality.py`` TextQualityMetricStage (:57-122) — for each configured
metric ``{"type": ..., "threshold": ...}`` it writes ``score_<type>`` and
``score_<type>_passed`` columns, ANDs the passed flags into a
``pass_column``, and optionally filters to passing rows. The reference
computes every score through the sacrebleu library in a row-wise pandas
loop (text_quality.py:97-106).

Spark-first shape: ONE Arrow-batched UDF evaluates all configured
metrics per row (the string scan is inherent Python work; batching it
beats the reference's ``iterrows``), while everything downstream of the
raw scores — the threshold comparisons, the AND-fold, the filter — is
declarative Column algebra (JVM codegen, pushdown-eligible), so at scale
only the scoring itself pays Python cost. ``chrf``/``sacrebleu`` (BLEU)
have native published-definition kernels; ``ter`` (or bit-exact library
parity for any metric) is an injectable ``metric_fns`` seam, the same
convention as the ASR/diarizer/translator slots.
"""

from __future__ import annotations

from typing import Any, Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..kernels import textquality as ker

__all__ = ["compute_text_quality_metric", "text_quality_metrics"]

# metric types where a LOWER score is better: pass is score <= threshold
# (text_quality.py:50-51 — TER is an edit rate).
_LOWER_IS_BETTER = {"ter"}

_NATIVE: dict[str, Callable[[str, str], float]] = {
    # reference metric_type names (text_quality.py:44-51): "sacrebleu"
    # is sentence BLEU, "chrf" is sentence chrF.
    "sacrebleu": ker.bleu_sentence_score,
    "chrf": ker.chrf_score,
}


def compute_text_quality_metric(
    hypothesis: str,
    reference: str,
    metric_type: str,
    threshold: float,
    metric_fn: Callable[[str, str], float] | None = None,
) -> tuple[float, bool]:
    """text_quality.py:26-54 — one (score, passed) pair. ``metric_fn``
    overrides the native kernel (inject a sacrebleu wrapper for library
    parity, or anything for ``ter``, which has no native kernel here)."""
    fn = metric_fn or _NATIVE.get(metric_type)
    if fn is None:
        msg = (
            f"metric type {metric_type!r} needs an injected callable "
            "(hypothesis, reference) -> float: the reference computes it "
            "via the sacrebleu library (text_quality.py:34-40), which is "
            "not available in this environment"
            if metric_type == "ter"
            else f"Unsupported round-trip quality metric: {metric_type}"
        )
        raise (NotImplementedError if metric_type == "ter" else ValueError)(msg)
    score = float(fn(hypothesis, reference))
    if metric_type in _LOWER_IS_BETTER:
        return score, score <= threshold
    return score, score >= threshold


def text_quality_metrics(
    df: DataFrame,
    metrics: list[dict[str, Any]],
    reference_text_field: str = "text",
    hypothesis_text_field: str = "backtranslated_text",
    filter_enabled: bool = False,
    pass_column: str = "is_quality_metric_passed",
    metric_fns: dict[str, Callable[[str, str], float]] | None = None,
) -> DataFrame:
    """TextQualityMetricStage (text_quality.py:57-122) — score
    ``hypothesis_text_field`` against ``reference_text_field`` for every
    configured metric, add ``score_<type>`` / ``score_<type>_passed`` and
    the ANDed ``pass_column``, optionally keep only passing rows."""
    for col in (reference_text_field, hypothesis_text_field):
        if col not in df.columns:
            raise ValueError(f"text_quality_metrics: missing column {col!r}")
    if not metrics:
        # text_quality.py:80-87 — no metrics configured: everything passes
        return df.withColumn(pass_column, F.lit(True))

    types: list[str] = []
    thresholds: list[float] = []
    fns: list[Callable[[str, str], float]] = []
    for metric in metrics:
        mtype = str(metric["type"])
        fn = (metric_fns or {}).get(mtype) or _NATIVE.get(mtype)
        if fn is None:
            # surface the config error at plan time, not per task
            compute_text_quality_metric("", "", mtype, 0.0)
        if mtype in types:
            raise ValueError(f"duplicate metric type {mtype!r} in metrics")
        types.append(mtype)
        thresholds.append(float(metric["threshold"]))
        fns.append(fn)

    out_type = StructType(
        [StructField(f"score_{t}", DoubleType()) for t in types]
    )

    @F.pandas_udf(out_type)
    def _scores(block: pd.DataFrame) -> pd.DataFrame:
        hyps = ["" if h is None else str(h) for h in block["h"]]
        refs = ["" if r is None else str(r) for r in block["r"]]
        out = {
            f"score_{t}": [float(fn(h, r)) for h, r in zip(hyps, refs)]
            for t, fn in zip(types, fns)
        }
        return pd.DataFrame(out)

    res = F.col("_tq_res")
    out = df.withColumn(
        "_tq_res",
        _scores(
            F.struct(
                F.col(hypothesis_text_field).cast("string").alias("h"),
                F.col(reference_text_field).cast("string").alias("r"),
            )
        ),
    )
    passed_cols: list[str] = []
    for t, thr in zip(types, thresholds):
        score_col, passed_col = f"score_{t}", f"score_{t}_passed"
        out = out.withColumn(score_col, res[score_col])
        cmp = (
            F.col(score_col) <= F.lit(thr)
            if t in _LOWER_IS_BETTER
            else F.col(score_col) >= F.lit(thr)
        )
        out = out.withColumn(passed_col, cmp)
        passed_cols.append(passed_col)
    out = out.drop("_tq_res")

    pred = F.col(passed_cols[0])
    for c in passed_cols[1:]:
        pred = pred & F.col(c)
    out = out.withColumn(pass_column, pred)
    if filter_enabled:
        out = out.where(F.col(pass_column))
    return out
