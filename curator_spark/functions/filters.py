"""Heuristic document-filter family: the reference's Score / Filter /
ScoreFilter surface (text/filters/score_filter.py:29,123,219) and its most
load-bearing heuristic filters (text/filters/heuristic/), Spark-first.

Each heuristic is a Column expression (JVM, codegen); `score_filter`
composes (score -> predicate -> keep) the way the reference chains
ScoreFilter stages. At 100 TB these run in the scan stage — no shuffle,
full pushdown of any preceding predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def word_count(text: Column) -> Column:
    """WordCountFilter equivalent (heuristic/length.py family)."""
    return F.size(tokens(text)).cast("long")


def mean_word_length_micro(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
    return F.floor(total * F.lit(1_000_000) / F.size(toks)).cast("long")


def symbol_to_word_ratio_micro(text: Column, symbols: str = "#…") -> Column:
    """SymbolsToWordsFilter equivalent: symbol occurrences / words."""
    sym = sum(
        (F.length(text) - F.length(F.replace(text, F.lit(ch), F.lit("")))) for ch in symbols
    )
    return F.floor(sym * F.lit(1_000_000) / word_count(text)).cast("long")


def non_alpha_ratio_micro(text: Column) -> Column:
    """Share of characters that are not letters/spaces."""
    stripped = F.regexp_replace(text, r"[A-Za-z ]", "")
    return F.floor(F.length(stripped) * F.lit(1_000_000) / F.greatest(F.length(text), F.lit(1))).cast(
        "long"
    )


def repeated_top_ngram_ratio_micro(text: Column, n: int = 2) -> Column:
    """Approximation of RepeatingTopNGramsFilter: occurrences of the most
    frequent word / total words (n=1 form; JVM-only, no UDF)."""
    toks = tokens(text)
    distinct = F.array_distinct(toks)
    counts = F.transform(distinct, lambda w: F.size(F.filter(toks, lambda t: t == w)))
    return F.floor(F.array_max(counts) * F.lit(1_000_000) / F.size(toks)).cast("long")


def score_filter(
    df: DataFrame,
    score: Column,
    score_name: str,
    keep: Column | None = None,
) -> DataFrame:
    """ScoreFilter composition: attach the score column; filter when a
    keep-predicate (over F.col(score_name)) is given."""
    out = df.withColumn(score_name, score)
    if keep is not None:
        out = out.where(keep)
    return out
