"""WER/CER stage over (hypothesis, reference) transcript columns.

Reference: ComputeWERStage (stages/audio/metrics/wer.py:31-138) computes
per-entry WER + CER + ins/del/sub rates after clean_text normalization.
Spark-first: one Arrow-batched UDF emitting a metrics struct — the DP
alignment is per-row Python-level (like the reference, which loops rows
inside a Ray actor), but batches amortize serialization.

Fixed-point *_micro outputs keep downstream filters engine-stable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..kernels.wer import clean_text, word_error_rate_detail

MICRO = 1_000_000
_CAP = 10 * MICRO  # inf (empty reference) caps at 1000% like a sentinel

WER_FIELDS = StructType(
    [
        StructField("wer_micro", LongType(), False),
        StructField("cer_micro", LongType(), False),
        StructField("ref_tokens", LongType(), False),
        StructField("ins_micro", LongType(), False),
        StructField("del_micro", LongType(), False),
        StructField("sub_micro", LongType(), False),
    ]
)


def _micro(x: float) -> int:
    if x != x or x == float("inf"):
        return _CAP
    # half-UP (not Python banker's rounding): WER rates are exact
    # rationals, so x*1e6 lands on .5 for real token counts (e.g. 1/128)
    # and must round the same way as SQL round()
    import math

    return min(int(math.floor(x * MICRO + 0.5)), _CAP)


def compute_wer(
    df: DataFrame,
    hypothesis_field: str = "text",
    reference_field: str = "text_ref",
    normalize: bool = True,
) -> DataFrame:
    """Append (wer_micro, cer_micro, ref_tokens, ins/del/sub_micro)."""

    @F.pandas_udf(WER_FIELDS)
    def wer_udf(hyp: pd.Series, ref: pd.Series) -> pd.DataFrame:
        rows = []
        for h, r in zip(hyp.fillna(""), ref.fillna("")):
            if normalize:
                h, r = clean_text(h), clean_text(r)
            wer, n, ins, dele, sub = word_error_rate_detail(h, r, use_cer=False)
            cer, _, _, _, _ = word_error_rate_detail(h, r, use_cer=True)
            rows.append(
                (_micro(wer), _micro(cer), n, _micro(ins), _micro(dele), _micro(sub))
            )
        return pd.DataFrame(rows, columns=[f.name for f in WER_FIELDS.fields])

    m = wer_udf(F.col(hypothesis_field), F.col(reference_field))
    out = df.withColumn("_m", m)
    for f in WER_FIELDS.fields:
        out = out.withColumn(f.name, F.col(f"_m.{f.name}"))
    return out.drop("_m")
