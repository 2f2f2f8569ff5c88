"""fastText quality / language-ID filter seams.

Reference: ``stages/text/filters/fasttext/fasttext_filters.py``
(FastTextQualityFilter:23-57, FastTextLangId:60-93). Both wrap a
fasttext model binary that is not shippable here (no fasttext lib, no
model artifacts in this environment), so — like the ASR / diarizer /
ITN / opencc seams — the MODEL is an injected callable and everything
around it (text cleaning, label/score algebra, the keep rules, the
Arrow batching) is real and tested with fake predictors.

Predictor surface: either an object with fastText's ``predict`` method
(``predict(texts, k=1) -> (labels, scores)`` where labels is a list of
``["__label__x", ...]`` and scores a list of float arrays) or a plain
callable with the same signature.

Determinism note (documented deviation): the reference's quality keep
rule draws ``np.random.pareto(alpha)`` from GLOBAL numpy state seeded
once per actor — the sequence of draws depends on row order, which is
not reproducible on a distributed engine (different partitioning =>
different keep set). Here the pareto variate is derived per document
from ``xxhash64(text, seed)`` through the inverse CDF
(``(1-U)^(-1/alpha) - 1``) — the same marginal distribution, but the
decision for a given document is a pure function of (text, seed,
alpha), stable under any partitioning/retry — the property a 10^12-row
run actually needs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType

__all__ = [
    "fasttext_langid",
    "fasttext_langid_keep",
    "fasttext_quality_keep",
    "fasttext_quality_score",
]

_SEAM_MSG = (
    "needs an injected fastText-style predictor "
    "(e.g. fasttext.load_model(path)) — not available in this environment"
)


def _predict_fn(predictor):
    if predictor is None:
        raise NotImplementedError(f"fasttext filter {_SEAM_MSG}")
    return predictor.predict if hasattr(predictor, "predict") else predictor


def fasttext_quality_score(
    text: Column, predictor, label: str = "__label__hq"
) -> Column:
    """Per-document quality score in [0, 1] — the reference's
    ``score_document`` (fasttext_filters.py:42-52): newlines flattened,
    literal ``__label__`` neutralized, model predicts top label; the
    score is the predicted probability if the top label equals
    ``label``, else ``1 - probability``."""
    predict = _predict_fn(predictor)

    @F.pandas_udf(DoubleType())
    def _score(col: pd.Series) -> pd.Series:
        texts = [
            (t or "").replace("\n", " ").replace("__label__", " ") for t in col
        ]
        labels, scores = predict(texts)
        out = []
        for lab, sc in zip(labels, scores):
            s = float(sc[0])
            out.append(s if lab[0] == label else 1.0 - s)
        return pd.Series(out)

    return _score(text)


def fasttext_quality_keep(
    score: Column, text: Column, alpha: float = 3.0, seed: int = 42
) -> Column:
    """The reference's pareto-sampled keep rule
    (``keep_document``: ``np.random.pareto(alpha) > 1 - score``) with
    the variate derived per document instead of from global RNG state
    (see module docstring): U = uniform from ``xxhash64(text, seed)``,
    pareto = ``(1-U)^(-1/alpha) - 1``. Pure Column math — JVM-side,
    no UDF."""
    h = F.xxhash64(text, F.lit(seed))
    # map int64 -> U in [0, 1): shift to unsigned range in double space
    u = (h.cast("double") / F.lit(2.0**64)) + F.lit(0.5)
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return pareto > (F.lit(1.0) - score)


def fasttext_langid(text: Column, predictor) -> Column:
    """struct(score double, lang string) — the reference's
    ``FastTextLangId.score_document`` (fasttext_filters.py:77-88):
    strip + newline-flatten, predict k=1, language code = last two
    characters of the label upper-cased (``__label__en`` -> ``EN``).
    Returned as a real struct column instead of the reference's
    stringified ``"[score, 'EN']"`` (a Ray-backend serialization
    workaround Spark does not need)."""
    predict = _predict_fn(predictor)

    @F.pandas_udf(ArrayType(StringType()))
    def _pred(col: pd.Series) -> pd.Series:
        texts = [(t or "").strip().replace("\n", " ") for t in col]
        labels, scores = predict(texts)
        return pd.Series(
            [[str(float(sc[0])), lab[0][-2:].upper()] for lab, sc in zip(labels, scores)]
        )

    raw = _pred(text)
    return F.struct(
        F.element_at(raw, 1).cast("double").alias("score"),
        F.element_at(raw, 2).alias("lang"),
    )


def fasttext_langid_keep(langid: Column, min_score: float = 0.3) -> Column:
    """``keep_document``: score >= cutoff (fasttext_filters.py:90-93)."""
    return langid.getField("score") >= F.lit(min_score)
