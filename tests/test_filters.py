"""Tests for the heuristic filter family (functions/filters.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from curator_spark.functions.filters import (
    mean_word_length_micro,
    non_alpha_ratio_micro,
    repeated_top_ngram_ratio_micro,
    score_filter,
    symbol_to_word_ratio_micro,
    word_count,
)


def test_word_count_and_mean_len(spark):
    df = spark.createDataFrame([(1, "ab cd efgh")], "id long, text string")
    row = df.select(
        word_count(F.col("text")).alias("wc"),
        mean_word_length_micro(F.col("text")).alias("ml"),
    ).collect()[0]
    assert row["wc"] == 3
    assert row["ml"] == 2_666_666  # floor(8/3 * 1e6)


def test_symbol_and_non_alpha(spark):
    df = spark.createDataFrame([(1, "ab# cd# ef 12")], "id long, text string")
    row = df.select(
        symbol_to_word_ratio_micro(F.col("text"), symbols="#").alias("sym"),
        non_alpha_ratio_micro(F.col("text")).alias("na"),
    ).collect()[0]
    assert row["sym"] == 500_000  # 2 symbols / 4 words
    # non-alpha chars: '#','#','1','2' of 13 chars
    assert row["na"] == int(4 * 1_000_000 / 13)


def test_repeated_top_ngram(spark):
    df = spark.createDataFrame([(1, "x x x y z")], "id long, text string")
    row = df.select(repeated_top_ngram_ratio_micro(F.col("text")).alias("r")).collect()[0]
    assert row["r"] == 600_000  # 'x' appears 3/5


def test_score_filter_composition(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a b c d e")], "id long, text string")
    out = score_filter(df, word_count(F.col("text")), "wc", keep=F.col("wc") >= 3)
    rows = out.collect()
    assert [r["id"] for r in rows] == [2] and rows[0]["wc"] == 5
