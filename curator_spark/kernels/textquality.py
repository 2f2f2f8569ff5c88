"""Sentence-level translation quality metrics: chrF and BLEU.

Reference surface: ``stages/text/experimental/translation/evaluation/
text_quality.py`` — ``compute_text_quality_metric`` dispatches to the
sacrebleu library (``sentence_bleu`` / ``sentence_chrf`` /
``sentence_ter``, text_quality.py:26-54). That library is absent in this
environment, so the two metrics with compact published definitions are
implemented here from their sources:

- **chrF** (Popović 2015, "chrF: character n-gram F-score for automatic
  MT evaluation", WMT15): character n-grams of order 1..6 on
  whitespace-stripped text, macro-averaged precision/recall across
  orders, F-beta with beta=2.
- **sentence BLEU** in the mteval lineage: the mteval-v13a tokenizer
  (public ``mteval-v13a.pl`` normalization regexes, also sacrebleu's
  default ``13a``), n-gram orders 1..4 capped at the hypothesis length
  (effective order), exponential smoothing for zero-match orders
  (Chen & Cherry 2014, smoothing method 3), and the standard brevity
  penalty.

Both return percentages in [0, 100] like the reference's library calls.
Known deviation (documented, not hidden): library-internal details such
as sacrebleu's epsilon smoothing for degenerate chrF orders may differ
in the last decimals; callers needing bit-exact library parity inject
their own metric callable through the operator's ``metric_fns`` seam —
the same convention as every other external-library slot. **TER** (shift
-based edit rate) has no compact published closed form and stays behind
that seam.
"""

from __future__ import annotations

import math
import re
from collections import Counter

__all__ = [
    "bleu_sentence_score",
    "chrf_score",
    "char_ngram_counts",
    "tokenize_13a",
]


def char_ngram_counts(text: str, order: int) -> Counter:
    """Multiset of character n-grams of exactly ``order`` in ``text``."""
    return Counter(text[i : i + order] for i in range(len(text) - order + 1))


def chrf_score(
    hypothesis: str,
    reference: str,
    char_order: int = 6,
    beta: float = 2.0,
    remove_whitespace: bool = True,
) -> float:
    """Popović 2015 chrF in [0, 100].

    Per order n=1..char_order: precision = matched/|hyp n-grams|,
    recall = matched/|ref n-grams| (matched = multiset intersection).
    Orders where BOTH sides have no n-grams (strings shorter than n) are
    skipped; an order where only one side is empty contributes 0 to that
    side's average. chrP/chrR macro-average the per-order values and
    combine as F-beta. Whitespace is stripped first (the paper's and
    sacrebleu's default for the character level)."""
    hyp = re.sub(r"\s+", "", hypothesis or "") if remove_whitespace else (hypothesis or "")
    ref = re.sub(r"\s+", "", reference or "") if remove_whitespace else (reference or "")
    if not hyp and not ref:
        return 100.0
    if not hyp or not ref:
        return 0.0
    precisions: list[float] = []
    recalls: list[float] = []
    for n in range(1, char_order + 1):
        h = char_ngram_counts(hyp, n)
        r = char_ngram_counts(ref, n)
        h_total = sum(h.values())
        r_total = sum(r.values())
        if h_total == 0 and r_total == 0:
            continue
        matched = sum(min(c, r[g]) for g, c in h.items())
        precisions.append(matched / h_total if h_total else 0.0)
        recalls.append(matched / r_total if r_total else 0.0)
    if not precisions:
        return 0.0
    chr_p = sum(precisions) / len(precisions)
    chr_r = sum(recalls) / len(recalls)
    denom = beta * beta * chr_p + chr_r
    if denom == 0.0:
        return 0.0
    return 100.0 * (1.0 + beta * beta) * chr_p * chr_r / denom


# mteval-v13a.pl normalization (public NIST script; sacrebleu's "13a").
_13A_SUBS = (
    (re.compile(r"<skipped>"), ""),
    (re.compile(r"-\n"), ""),
    (re.compile(r"\n"), " "),
    (re.compile(r"&quot;"), '"'),
    (re.compile(r"&amp;"), "&"),
    (re.compile(r"&lt;"), "<"),
    (re.compile(r"&gt;"), ">"),
    # tokenize punctuation
    (re.compile(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])"), r" \1 "),
    # tokenize period and comma unless preceded by a digit
    (re.compile(r"([^0-9])([\.,])"), r"\1 \2 "),
    # tokenize period and comma unless followed by a digit
    (re.compile(r"([\.,])([^0-9])"), r" \1 \2"),
    # tokenize dash when preceded by a digit
    (re.compile(r"([0-9])(-)"), r"\1 \2 "),
)


def tokenize_13a(text: str) -> list[str]:
    """mteval-v13a tokenization: entity unescape, mandatory space
    padding of the line (``$norm_text = " $norm_text "`` in the script —
    without it, punctuation at the string boundary adjacent to a digit,
    e.g. the final period of ``"costs 3.50."``, never splits), the
    punctuation-split regexes, then whitespace split."""
    out = text or ""
    for pat, rep in _13A_SUBS[:7]:
        out = pat.sub(rep, out)
    out = f" {out} "
    for pat, rep in _13A_SUBS[7:]:
        out = pat.sub(rep, out)
    return out.split()


def bleu_sentence_score(
    hypothesis: str,
    reference: str,
    max_order: int = 4,
    tokenizer=tokenize_13a,
) -> float:
    """Sentence BLEU in [0, 100], mteval lineage.

    Effective order = min(max_order, len(hyp tokens)) so a 2-token
    hypothesis is scored on 1- and 2-grams only; zero-match orders use
    exponential smoothing (Chen & Cherry 2014 method 3: the k-th
    zero-match order contributes ``1 / (2^k * total)``); geometric mean
    of the per-order precisions times the brevity penalty
    ``exp(1 - ref_len/hyp_len)`` when the hypothesis is shorter."""
    hyp = tokenizer(hypothesis or "")
    ref = tokenizer(reference or "")
    if not hyp and not ref:
        return 100.0
    if not hyp or not ref:
        return 0.0
    effective = min(max_order, len(hyp))
    smooth = 1.0
    log_sum = 0.0
    for n in range(1, effective + 1):
        h = Counter(tuple(hyp[i : i + n]) for i in range(len(hyp) - n + 1))
        r = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
        total = sum(h.values())
        matched = sum(min(c, r[g]) for g, c in h.items())
        if matched == 0:
            smooth *= 2.0
            p_n = 1.0 / (smooth * total)
        else:
            p_n = matched / total
        log_sum += math.log(p_n)
    geo_mean = math.exp(log_sum / effective)
    bp = 1.0 if len(hyp) >= len(ref) else math.exp(1.0 - len(ref) / len(hyp))
    return 100.0 * bp * geo_mean
