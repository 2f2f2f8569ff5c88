"""Text-analysis column functions: token stats, quality scoring, language ID.

The reference ships ~40 heuristic document filters computing per-doc scalar
scores (word count, repetition, boilerplate, stopword density) at
/root/reference/nemo_curator/stages/text/filters/heuristic/ — the Spark-first
shape for all of them is a Column expression over built-in functions
(JVM-side, whole-stage codegen; no Python in the hot path). This module
implements the core family; every function returns plain Columns so Catalyst
can prune/push/fold around them.

Fixed-point convention: ratio-valued scores are returned as ``*_micro``
BIGINT columns (value * 1e6, rounded) so results hash identically across
engines (the driver's DuckDB oracle compares value hashes; float summation
order would otherwise flip low bits).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker-word profiles for the n-gram/stopword language-ID heuristic
# (public-knowledge stopword lists; the reference's heuristic filters use
# the same stopword-density idea, text/filters/heuristic/ family).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "un", "una", "por"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein", "zu", "mit", "den"),
    "fr": ("le", "la", "les", "de", "et", "un", "est", "une", "dans", "pour"),
    "zh": ("的", "是", "不", "了", "在", "有", "我", "他", "这", "个"),
}

DEFAULT_STOPWORDS: tuple[str, ...] = ("the", "a", "an", "and", "of", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split keeps parity with SQL string_split)."""
    return F.split(text, " ")


def token_stats(text: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> dict[str, Column]:
    """Per-document token statistics as named Columns.

    Keys: n_tokens, n_unique_tokens, mean_token_len_micro,
    stopword_ratio_micro, repetition_ratio_micro (1 - unique/total).
    """
    toks = tokens(text)
    n = F.size(toks)
    n_unique = F.size(F.array_distinct(toks))
    total_len = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    sw = F.array([F.lit(w) for w in stopwords])
    # occurrence count (not distinct membership): filter + size
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(sw, w)))
    # floor, not round: num/den is exact rational arithmetic, so floor is
    # bit-identical across engines while round has cross-engine .5-tie risk
    micro = lambda num, den: F.floor(num * F.lit(1_000_000) / den).cast("long")  # noqa: E731
    return {
        "n_tokens": n.cast("long"),
        "n_unique_tokens": n_unique.cast("long"),
        "mean_token_len_micro": micro(total_len, n),
        "stopword_ratio_micro": micro(n_stop, n),
        "repetition_ratio_micro": micro(n - n_unique, n),
    }


def quality_score_micro(
    text: Column,
    min_tokens: int = 20,
    max_tokens: int = 1000,
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
) -> Column:
    """Composite quality score in [0, 1e6] (micro fixed-point).

    score = 0.4 * length_ok + 0.3 * (1 - repetition) + 0.3 * min(1, 5 * stopword_ratio)
    — the reference's heuristic-filter recipe (length gate + repetition +
    stopword density) collapsed to one JVM-side expression. Computed in
    pure integer arithmetic on the micro fixed-points (no double rounding
    ties, bit-identical across engines).
    """
    s = token_stats(text, stopwords)
    n = s["n_tokens"]
    length_part = F.when((n >= min_tokens) & (n <= max_tokens), F.lit(400_000)).otherwise(F.lit(0))
    rep_part = F.floor((F.lit(1_000_000) - s["repetition_ratio_micro"]) * 3 / 10)
    stop_part = F.floor(F.least(F.lit(1_000_000), s["stopword_ratio_micro"] * 5) * 3 / 10)
    return (length_part + rep_part + stop_part).cast("long")


def lang_id_scores(text: Column, profiles: dict[str, tuple[str, ...]] | None = None) -> list[tuple[str, Column]]:
    """[(lang, marker-hit-count Column)] — the unpivoted score table."""
    profiles = profiles or LANG_PROFILES
    toks = tokens(text)
    def marker_count(markers: Column) -> Column:
        return F.size(F.filter(toks, lambda w: F.array_contains(markers, w))).cast("long")

    return [
        (lang, marker_count(F.array([F.lit(w) for w in profiles[lang]])))
        for lang in sorted(profiles)
    ]


def language_id(text: Column, profiles: dict[str, tuple[str, ...]] | None = None) -> Column:
    """argmax-score language (ties broken by lang name ascending) —
    deterministic, fully relational, oracle-expressible in ANSI SQL."""
    scored = lang_id_scores(text, profiles)
    # array of structs (score desc via negation, lang asc) -> sort -> first
    arr = F.array(*[F.struct((-s).alias("_neg"), F.lit(lang).alias("_lang")) for lang, s in scored])
    return F.sort_array(arr)[0]["_lang"]
