"""Heuristic document-filter family: the reference's Score / Filter /
ScoreFilter surface (text/filters/score_filter.py:29,123,219) and its most
load-bearing heuristic filters (text/filters/heuristic/), Spark-first.

Each heuristic is a Column expression (JVM, codegen); `score_filter`
composes (score -> predicate -> keep) the way the reference chains
ScoreFilter stages. At 100 TB these run in the scan stage — no shuffle,
full pushdown of any preceding predicates.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
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
    """Share of characters that are not letters/spaces (unicode \\p{L},
    matching the reference's regex-module [[:alpha:]] semantics)."""
    stripped = F.regexp_replace(text, r"[\p{L} ]", "")
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


# ---------------------------------------------------------------------------
# full heuristic family (reference stages/text/filters/heuristic/string.py;
# constants from stages/text/utils/constants.py:19-80; sentences = non-empty
# lines, paragraphs = "\n\n" blocks, text_utils.py:72-83). All pure Column
# expressions; unicode [[:alpha:]]/[[:digit:]] classes are narrowed to
# ASCII (the synthetic corpora are ASCII; swap the char class for full
# unicode parity on real data).
# ---------------------------------------------------------------------------

ELLIPSIS_MARKS = ("...", "[...]", "…", "(...)", "[…]", "-»", "read more..", "read more")
END_MARKS = (".", "?", "!", '"', "'")
BULLETS = ("•", "‣", "⁃", "⁌", "⁍", "∙", "○", "●", "◘", "◦", "⦾", "⦿")
COMMON_ENGLISH_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
POLICY_SUBSTRINGS = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "privacy overview",
    "use of cookies",
    "use cookies",
    "privacy & cookies policy",
    "privacy and cookies policy",
)
URL_REGEX = r"https?://(?:[A-Za-z0-9$\-_@.&+/:=?#~]|[!*\(\),]|(?:%[0-9A-Fa-f]{2}))+"


def _nchar(text: Column) -> Column:
    return F.greatest(F.length(text), F.lit(1))


def _sentences(text: Column) -> Column:
    """Non-empty lines (get_sentences, text_utils.py:79-83)."""
    return F.filter(F.split(text, "\n"), lambda s: F.length(F.trim(s)) > 0)


def _paragraphs(text: Column) -> Column:
    """Double-newline blocks (get_paragraphs, text_utils.py:72-76)."""
    return F.split(text, "\n\n")


def _any_startswith(s: Column, prefixes: tuple) -> Column:
    out = F.lit(False)
    for p in prefixes:
        out = out | s.startswith(p)
    return out


def _any_endswith(s: Column, suffixes: tuple) -> Column:
    out = F.lit(False)
    for p in suffixes:
        out = out | s.endswith(p)
    return out


def _ratio_micro(num: Column, den: Column) -> Column:
    return F.floor(num * F.lit(1_000_000) / den).cast("long")


def non_alpha_numeric_ratio_micro(text: Column) -> Column:
    """NonAlphaNumericFilter (string.py:40-58): share of chars outside
    [a-zA-Z0-9\\n?!,.]; empty doc scores 1.0. Keep: <= 0.25."""
    matches = F.length(text) - F.length(F.regexp_replace(text, r"[a-zA-Z0-9\n?!,.]", ""))
    return F.when(F.length(text) == 0, F.lit(1_000_000).cast("long")).otherwise(
        _ratio_micro(F.length(text) - matches, _nchar(text))
    )


def symbols_to_words_ratio_micro(text: Column) -> Column:
    """SymbolsToWordsFilter (string.py:61-90): words that are an ellipsis
    mark or whose '#'-RUN count exceeds 50% of their length (the reference
    counts maximal '#+' runs via regex_hash.findall, constants.py:80 —
    so '##' is one run over two chars, NOT a symbol word). Keep: <= 0.1."""
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0)
    hash_runs = lambda w: F.size(F.regexp_extract_all(w, F.lit("#+"), 0))  # noqa: E731
    sym = F.filter(
        words,
        lambda w: w.isin(*ELLIPSIS_MARKS) | (hash_runs(w) * 2 > F.length(w)),
    )
    return _ratio_micro(F.size(sym), F.greatest(F.size(words), F.lit(1)))


def numbers_ratio_micro(text: Column) -> Column:
    """NumbersFilter (string.py:93-109): digit chars / chars, unicode
    digits (\\p{Nd} — the reference's regex_digit is POSIX [[:digit:]] in
    unicode mode, constants.py:73). Keep: <= 0.15."""
    digits = F.length(text) - F.length(F.regexp_replace(text, r"\p{Nd}", ""))
    return F.when(F.length(text) == 0, F.lit(1_000_000).cast("long")).otherwise(
        _ratio_micro(digits, _nchar(text))
    )


def urls_ratio_micro(text: Column) -> Column:
    """UrlsFilter (string.py:112-143): URL chars / chars. Keep: <= 0.2."""
    url_chars = F.aggregate(
        F.regexp_extract_all(text, F.lit(URL_REGEX), 0),
        F.lit(0).cast("long"),
        lambda acc, u: acc + F.length(u),
    )
    return F.when(F.length(text) == 0, F.lit(1_000_000).cast("long")).otherwise(
        _ratio_micro(url_chars, _nchar(text))
    )


def bullet_lines_ratio_micro(text: Column) -> Column:
    """BulletsFilter (string.py:146-172): sentences starting with a bullet
    glyph. Keep: <= 0.9."""
    sents = _sentences(text)
    bullet = F.filter(sents, lambda s: _any_startswith(F.trim(s), BULLETS))
    return _ratio_micro(F.size(bullet), F.greatest(F.size(sents), F.lit(1)))


def white_space_ratio_micro(text: Column) -> Column:
    """WhiteSpaceFilter (string.py:175-194): whitespace chars / chars
    (\\t \\n \\r \\b space). Keep: <= 0.25."""
    ws = F.length(text) - F.length(F.regexp_replace(text, "[\t\n\r\b ]", ""))
    return F.when(F.length(text) == 0, F.lit(1_000_000).cast("long")).otherwise(
        _ratio_micro(ws, _nchar(text))
    )


def parentheses_ratio_micro(text: Column) -> Column:
    """ParenthesesFilter (string.py:197-213): {}⟨⟩[]() chars / chars.
    Keep: <= 0.1."""
    parens = F.length(text) - F.length(F.regexp_replace(text, r"[{}⟨⟩\[\]()]", ""))
    return F.when(F.length(text) == 0, F.lit(1_000_000).cast("long")).otherwise(
        _ratio_micro(parens, _nchar(text))
    )


def max_word_length(text: Column) -> Column:
    """LongWordFilter (string.py:216-238): longest word. Keep: <= 1000."""
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0)
    return F.coalesce(
        F.array_max(F.transform(words, lambda w: F.length(w).cast("long"))), F.lit(0).cast("long")
    )


def boilerplate_string_ratio_micro(text: Column) -> Column:
    """BoilerPlateStringFilter (string.py:265-302): paragraphs containing a
    policy substring / paragraphs; any 'lorem ipsum' scores 1.0.
    Keep: <= 0.4."""
    paras = _paragraphs(text)
    low = lambda p: F.lower(F.trim(p))  # noqa: E731

    def has_policy(p):
        out = F.lit(False)
        for s in POLICY_SUBSTRINGS:
            out = out | low(p).contains(s)
        return out

    n_boiler = F.size(F.filter(paras, has_policy))
    lorem = F.lower(text).contains("lorem ipsum")
    return F.when(lorem, F.lit(1_000_000).cast("long")).otherwise(
        _ratio_micro(n_boiler, F.greatest(F.size(paras), F.lit(1)))
    )


def punctuation_ratio_micro(text: Column) -> Column:
    """PunctuationFilter (string.py:334-354): sentences NOT ending with an
    end mark. Keep: <= 0.85."""
    sents = _sentences(text)
    bad = F.filter(sents, lambda s: ~_any_endswith(F.trim(s), END_MARKS))
    return _ratio_micro(F.size(bad), F.greatest(F.size(sents), F.lit(1)))


def ellipsis_lines_ratio_micro(text: Column) -> Column:
    """EllipsisFilter (string.py:357-381): sentences ending with an
    ellipsis mark. Keep: <= 0.3."""
    sents = _sentences(text)
    ell = F.filter(sents, lambda s: _any_endswith(F.lower(F.trim(s)), ELLIPSIS_MARKS))
    return _ratio_micro(F.size(ell), F.greatest(F.size(sents), F.lit(1)))


def common_english_words_count(text: Column) -> Column:
    """CommonEnglishWordsFilter (string.py:384-413): occurrences of the 8
    common lowercase words. Keep: >= 2."""
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0)
    return F.size(F.filter(words, lambda w: w.isin(*COMMON_ENGLISH_WORDS))).cast("long")


def words_with_alphabets_ratio_micro(text: Column) -> Column:
    """WordsWithoutAlphabetsFilter (string.py:416-442): words containing a
    letter / words. Keep: >= 0.8."""
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0)
    alpha = F.filter(words, lambda w: w.rlike(r"\p{L}"))
    return _ratio_micro(F.size(alpha), F.greatest(F.size(words), F.lit(1)))


def has_pornographic_url(text: Column) -> Column:
    """PornographicUrlsFilter (string.py:445-467): any URL containing
    'porn'. Keep: score == 0."""
    urls = F.regexp_extract_all(text, F.lit(URL_REGEX), 0)
    return (F.size(F.filter(urls, lambda u: u.contains("porn"))) > 0).cast("int").cast("long")


def substring_filter_score(text: Column, substring: str, position: str = "any") -> Column:
    """SubstringFilter (string.py:470-508): 1 iff substring at position."""
    if position == "prefix":
        hit = text.startswith(substring)
    elif position == "suffix":
        hit = text.endswith(substring)
    elif position == "any":
        hit = text.contains(substring)
    else:
        raise ValueError(f"Invalid position: {position}. Must be one of: prefix, suffix, any.")
    return hit.cast("int").cast("long")


# ---------------------------------------------------------------------------
# repetition family (heuristic/repetition/repetition.py — Gopher ratios)
# ---------------------------------------------------------------------------


def repeated_lines_ratio_micro(text: Column) -> Column:
    """RepeatedLinesFilter (repetition.py:24-43): distinct sentences /
    sentences. Keep: >= 0.7."""
    sents = _sentences(text)
    return _ratio_micro(F.size(F.array_distinct(sents)), F.greatest(F.size(sents), F.lit(1)))


def repeated_paragraphs_ratio_micro(text: Column) -> Column:
    """RepeatedParagraphsFilter (repetition.py:46-65). Keep: >= 0.7."""
    paras = _paragraphs(text)
    return _ratio_micro(F.size(F.array_distinct(paras)), F.greatest(F.size(paras), F.lit(1)))


def _char_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s))


def repeated_lines_char_ratio_micro(text: Column) -> Column:
    """RepeatedLinesByCharFilter (repetition.py:68-86): chars of distinct
    sentences / chars of all sentences. Keep: >= 0.8."""
    sents = _sentences(text)
    return _ratio_micro(_char_sum(F.array_distinct(sents)), F.greatest(_char_sum(sents), F.lit(1)))


def repeated_paragraphs_char_ratio_micro(text: Column) -> Column:
    """RepeatedParagraphsByCharFilter (repetition.py:91-108). Keep: >= 0.9."""
    paras = _paragraphs(text)
    return _ratio_micro(_char_sum(F.array_distinct(paras)), F.greatest(_char_sum(paras), F.lit(1)))


def _word_ngrams(text: Column, n: int) -> Column:
    """Space-joined word n-grams (text_utils.get_ngrams over the en word
    splitter)."""
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda w: F.length(w) > 0)
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def repeating_top_ngram_ratio_micro(text: Column, n: int = 2) -> Column:
    """RepeatingTopNGramsFilter (repetition.py:114-153): characters the
    most frequent word n-gram contributes / characters. Fewer than n
    words scores 1.0. Frequency ties break toward the lexicographically
    LARGEST n-gram (the reference's set-iteration tie-break is
    nondeterministic; ours is pinned so both engines agree).
    Keep (defaults): n=2 <= 0.2, n=3 <= 0.18, n=4 <= 0.16.

    Arrow-batched Counter pass, O(doc length) — the same shape as the
    reference's own loop (repetition.py:140-149). A pure-Column variant
    (array_max over transform/filter) re-evaluates the n-gram subtree per
    distinct gram in interpreted mode: O(L^2) per document, measured
    ~10 ms/doc on 215-char docs, quadratic in length — a scale-killer on
    multi-KB web text.

    Whitespace splitting is pinned to the ASCII class Java/RE2 `\\s`
    matches so Spark, DuckDB oracles, and this UDF agree byte-for-byte.
    """
    from pyspark.sql.types import LongType

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf(LongType())
    def top_ngram_udf(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts.fillna("")):
            words = [w for w in ws.split(t.strip()) if w]
            if len(words) < n:
                out[i] = 1_000_000
                continue
            grams = [" ".join(words[j : j + n]) for j in range(len(words) - n + 1)]
            counts = Counter(grams)
            top = max(counts.items(), key=lambda kv: (kv[1], kv[0]))[0]
            nchar = len(t)
            len_diff = nchar - len(t.replace(top, ""))
            out[i] = len_diff * 1_000_000 // max(nchar, 1)
        return pd.Series(out)

    return top_ngram_udf(text)


def repeating_duplicate_ngram_ratio_micro(
    df: DataFrame, n: int, text_field: str, out_field: str
) -> DataFrame:
    """RepeatingDuplicateNGramsFilter (repetition.py:158-203): characters
    inside REPEAT occurrences of any duplicate n-gram (overlap-aware
    sequential scan) / characters. The scan is stateful per document —
    the one repetition filter that is not a Column expression; runs as an
    Arrow-batched UDF with the reference's exact loop.
    Keep (defaults): n=5 <= 0.15 ... n=10 <= 0.10."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def dup_ngram_udf(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts.fillna(""):
            words = t.strip().split()
            nchar = len(t)
            if nchar == 0 or len(words) < n:
                out.append(1_000_000)
                continue
            ngrams = [tuple(words[i : i + n]) for i in range(len(words) - n + 1)]
            counts: dict = {}
            duplicated_nchar = 0
            overlapping = 0
            for ng in ngrams:
                counts[ng] = counts.get(ng, 0) + 1
                if counts[ng] > 1:
                    dup_chars = sum(len(g) for g in ng[overlapping:])
                    nspaces = min(n - overlapping, n - 1)
                    duplicated_nchar += dup_chars + nspaces
                    overlapping = n
                overlapping = max(overlapping - 1, 0)
            out.append(duplicated_nchar * 1_000_000 // nchar)
        return pd.Series(out, dtype="int64")

    return df.withColumn(out_field, dup_ngram_udf(F.col(text_field)))


DEFAULT_HISTOGRAM_CHARS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,!?'\"-:;()\n"
)


def histogram_char_ratio_score(
    text: Column,
    charset: str = DEFAULT_HISTOGRAM_CHARS,
    threshold_micro: int = 800_000,
) -> Column:
    """HistogramFilter (text/filters/histogram/histogram.py:24-121) — the
    NLLB paper's cheap language-ID: score 1 when the count of trusted-set
    characters in the STRIPPED text exceeds ``threshold`` x len(raw text),
    else 0 (keep == 1). Pure ``translate`` Column math, no UDF.

    The reference loads its per-language char set from the fairseq
    M2M-100 histogram artifact (a network download, unavailable here), so
    the set is injectable; the default approximates the English histogram
    with ASCII letters/digits/basic punctuation. Empty text scores 0 (the
    reference would divide by zero)."""
    stripped = F.trim(text)
    cnt = F.length(stripped) - F.length(F.translate(stripped, charset, ""))
    return F.when(F.length(text) == 0, F.lit(0).cast("long")).otherwise(
        (cnt * F.lit(1_000_000) > F.length(text) * F.lit(threshold_micro)).cast("long")
    )


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


# ---------------------------------------------------------------------------
# TokenCountFilter (text/filters/token/token_count.py:23-118)
# ---------------------------------------------------------------------------


def token_count(text: Column, tokenizer=None) -> Column:
    """TokenCountFilter's score. The reference counts tokens with a HF
    AutoTokenizer (token_count.py:96-101: ``len(tokenizer.encode(text))``)
    — model artifacts this sandbox legitimately lacks — so the tokenizer
    is an injectable ``str -> Sequence`` callable; the default counts
    ASCII-whitespace tokens as a pure Column expression (JVM, oracle-
    checkable). A callable tokenizer runs Arrow-batched."""
    if tokenizer is None:
        toks = F.filter(
            F.split(F.trim(text), r"[ \t\n\x0B\f\r]+"), lambda w: F.length(w) > 0
        )
        return F.size(toks).cast("long")
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _count(col: pd.Series) -> pd.Series:
        return col.map(lambda s: len(tokenizer(s)) if s is not None else 0).astype("int64")

    return _count(text)


class TokenCountFilter:
    """API-shape parity with the reference's TokenCountFilter
    (token_count.py:23-94): keep iff min_tokens <= count <= max_tokens.
    ``tokenizer``/``hf_model_name`` are mutually exclusive as in the
    reference (token_count.py:57-62); hf_model_name is unsupported here
    (no model downloads in this sandbox) and raises at construction."""

    def __init__(
        self,
        tokenizer=None,
        hf_model_name: str | None = None,
        min_tokens: int = 0,
        max_tokens: float = float("inf"),
    ):
        if tokenizer is not None and hf_model_name is not None:
            msg = "Either tokenizer or hf_model_name must be provided, not both"
            raise ValueError(msg)
        if hf_model_name is not None:
            msg = "hf_model_name requires HuggingFace model downloads, unavailable in this environment; pass a tokenizer callable"
            raise NotImplementedError(msg)
        self._tokenizer = tokenizer
        self._min = min_tokens
        self._max = max_tokens
        self.name = "token_count"

    def score(self, text: Column) -> Column:
        return token_count(text, self._tokenizer)

    def keep(self, score: Column) -> Column:
        out = score >= F.lit(self._min)
        if self._max != float("inf"):
            out = out & (score <= F.lit(int(self._max)))
        return out

    def apply(self, df: DataFrame, text_field: str = "text") -> DataFrame:
        return score_filter(
            df, self.score(F.col(text_field)), self.name, self.keep(F.col(self.name))
        )
