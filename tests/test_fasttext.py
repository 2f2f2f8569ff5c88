"""fastText quality / language-ID filter seams.

Reference: stages/text/filters/fasttext/fasttext_filters.py. The model
is an injected predictor (lib + artifacts absent here); these tests
prove the seam surface, the label/score algebra, the struct output,
and the partitioning-stable pareto keep rule with fake predictors.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from curator_spark.functions import (
    fasttext_langid,
    fasttext_langid_keep,
    fasttext_quality_keep,
    fasttext_quality_score,
)


def test_seams_raise_without_predictor(spark):
    df = spark.createDataFrame([("x",)], ["text"])
    with pytest.raises(NotImplementedError, match="fasttext"):
        df.select(fasttext_quality_score(F.col("text"), None))
    with pytest.raises(NotImplementedError, match="fasttext"):
        df.select(fasttext_langid(F.col("text"), None))


def test_quality_score_label_algebra(spark):
    """Predicted-label == target -> p; mismatched label -> 1-p
    (fasttext_filters.py:48-52), newlines flattened before predict."""
    def fake_predict(texts):
        # texts containing 'good' -> __label__hq p=0.9; else lq p=0.8
        # (defined in-test so cloudpickle ships it by value to workers)
        labels, scores = [], []
        for t in texts:
            if "good" in t:
                labels.append(["__label__hq"])
                scores.append([0.9])
            else:
                labels.append(["__label__lq"])
                scores.append([0.8])
        return labels, scores

    df = spark.createDataFrame(
        [("a good\ndoc",), ("a bad doc",)], ["text"]
    )
    rows = df.select(
        "text",
        fasttext_quality_score(F.col("text"), fake_predict).alias("s"),
    ).collect()
    got = {r.text: round(r.s, 6) for r in rows}
    assert got == {"a good\ndoc": 0.9, "a bad doc": 0.2}


def test_quality_keep_partitioning_stable_and_calibrated(spark):
    """The hash-derived pareto keep decision is a pure function of
    (text, seed): identical keep sets at 1 and 16 partitions, and the
    keep RATE at a fixed score matches the pareto tail analytically
    (P[keep | score s] = (2 - s) ** -alpha)."""
    n, alpha, score = 4000, 3.0, 0.0
    df = spark.range(n).select(F.concat(F.lit("doc"), F.col("id")).alias("text"))
    keep = fasttext_quality_keep(F.lit(score), F.col("text"), alpha=alpha, seed=42)
    kept1 = {r.text for r in df.repartition(1).where(keep).collect()}
    kept16 = {r.text for r in df.repartition(16).where(keep).collect()}
    assert kept1 == kept16
    expected = (2.0 - score) ** -alpha  # 0.125 at score 0
    rate = len(kept1) / n
    assert math.isclose(rate, expected, abs_tol=0.02), (rate, expected)
    # monotone in score: everything kept at score 0 is kept at score 0.5
    keep_hi = fasttext_quality_keep(F.lit(0.5), F.col("text"), alpha=alpha, seed=42)
    kept_hi = {r.text for r in df.where(keep_hi).collect()}
    assert kept1 <= kept_hi


def test_langid_struct_and_cutoff(spark):
    """Language code = last 2 chars of the label uppercased; keep rule
    is score >= cutoff (fasttext_filters.py:84-93)."""
    class FakeModel:
        # object-style .predict surface (fastText's), shipped by value
        def predict(self, texts, k=1):
            labels, scores = [], []
            for t in texts:
                if t.startswith("bonjour"):
                    labels.append(["__label__fr"])
                    scores.append([0.95])
                else:
                    labels.append(["__label__en"])
                    scores.append([0.25])
            return labels, scores

    df = spark.createDataFrame(
        [(" bonjour le monde\n",), ("hello world",)], ["text"]
    )
    out = df.select(
        "text", fasttext_langid(F.col("text"), FakeModel()).alias("lid")
    )
    rows = {r.text: (r.lid.score, r.lid.lang) for r in out.collect()}
    assert rows[" bonjour le monde\n"] == (0.95, "FR")
    assert rows["hello world"] == (0.25, "EN")
    kept = [
        r.text
        for r in out.where(fasttext_langid_keep(F.col("lid"), 0.3)).collect()
    ]
    assert kept == [" bonjour le monde\n"]


def test_fasttext_label_modifier(spark):
    """FastTextLabelModifier parity (fasttext_label.py:23-26): newline
    flatten, __label__ neutralized, label prepended."""
    from curator_spark.functions import fasttext_label

    df = spark.createDataFrame([("a\nb __label__x c",)], ["text"])
    got = df.select(
        fasttext_label(F.col("text"), "__label__hq").alias("t")
    ).head().t
    assert got == "__label__hq a b  x c"
