"""WER / CER text-metric kernel.

Reference: stages/audio/metrics/wer.py — ComputeWERStage cleans text
(clean_text, wer.py:151-175: fixed replace-with-space / replace-with-blank
/ replace-with-apostrophe character classes) and calls NeMo's public
``word_error_rate_detail`` (wer.py:211-226) for WER plus insertion /
deletion / substitution rates, and again with ``use_cer=True`` for CER.
The NeMo dependency is not in this container, so the metric itself —
Levenshtein alignment with operation counts, rates normalized by
reference token count — is implemented here from the standard published
definition (it predates NeMo; e.g. NIST sclite).

Kernel contract: pure python/numpy, no Spark imports — wrapped by
``operators.wer_stage.compute_wer`` in an Arrow-batched UDF.
"""

from __future__ import annotations

import numpy as np

_INVALID_CHARS = '/*":=_-{|}~¨«·»¡¿…‧‹›≪≫!:;ː→'  # wer.py:153
_PNC_CHARS = "،؟.、？¿!,?।"  # wer.py:47
_BLANK_PNC = "`¨´‘“”`ʻ‘“\"‘”"  # wer.py:156
_BLANK_NOPNC = "`¨´‘’“”`ʻ‘’“-\"‘”"  # wer.py:159
_APOS = "‘’ʻ‘’‘’’"  # wer.py:162


def clean_text(text: str, retain_pncs: bool = True, pnc_chars: str = _PNC_CHARS) -> str:
    """The reference's clean_text (wer.py:151-175)."""
    if retain_pncs:
        replace_with_space = _INVALID_CHARS
        replace_with_blank = _BLANK_PNC
    else:
        replace_with_space = _INVALID_CHARS + pnc_chars
        replace_with_blank = _BLANK_NOPNC
        text = text.lower()
    text = text.strip()
    for ch in replace_with_blank:
        text = text.replace(ch, "")
    for ch in replace_with_space:
        text = text.replace(ch, " ")
    for ch in _APOS:
        text = text.replace(ch, "'")
    if retain_pncs:
        # strip spaces before punctuation marks (wer.py:173)
        for p in pnc_chars:
            text = text.replace(" " + p, p)
    return " ".join(text.split())


def _edit_ops(ref: list, hyp: list) -> tuple[int, int, int]:
    """(insertions, deletions, substitutions) of a minimal-cost alignment
    (standard Wagner-Fischer DP with op backtrace counts)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m, 0, 0
    if m == 0:
        return 0, n, 0
    cost = np.zeros((n + 1, m + 1), dtype=np.int64)
    cost[:, 0] = np.arange(n + 1)
    cost[0, :] = np.arange(m + 1)
    hyp_arr = np.array(hyp)
    idx = np.arange(1, m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        prev = cost[i - 1]
        # candidate without the left-dependency: diag-sub or up-del
        c = np.minimum(prev[:-1] + (ref[i - 1] != hyp_arr), prev[1:] + 1)
        c[0] = min(c[0], cost[i][0] + 1)
        # row[j] = min_{k<=j} (c[k] + (j-k)) — running min with unit
        # drift, vectorized as accumulate(c - j) + j (the sequential
        # row[j-1]+1 term unrolled); ~30x the scalar inner loop
        cost[i, 1:] = np.minimum.accumulate(c - idx) + idx
    # backtrace for op counts
    i, j, ins, dele, sub = n, m, 0, 0, 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and cost[i][j] == cost[i - 1][j - 1] + (ref[i - 1] != hyp[j - 1]):
            if ref[i - 1] != hyp[j - 1]:
                sub += 1
            i, j = i - 1, j - 1
        elif j > 0 and cost[i][j] == cost[i][j - 1] + 1:
            ins += 1
            j -= 1
        else:
            dele += 1
            i -= 1
    return ins, dele, sub


def word_error_rate_detail(
    hypothesis: str, reference: str, use_cer: bool = False
) -> tuple[float, int, float, float, float]:
    """(rate, ref_tokens, ins_rate, del_rate, sub_rate) — the tuple shape
    of NeMo's word_error_rate_detail the reference consumes
    (wer.py:211-226). Rates are normalized by the reference token count;
    an empty reference with a non-empty hypothesis yields inf (NeMo
    convention)."""
    tok = (lambda s: list(s)) if use_cer else (lambda s: s.split())
    ref, hyp = tok(reference), tok(hypothesis)
    n = len(ref)
    ins, dele, sub = _edit_ops(ref, hyp)
    if n == 0:
        rate = float("inf") if hyp else 0.0
        return rate, 0, float("inf") if ins else 0.0, 0.0, 0.0
    return (ins + dele + sub) / n, n, ins / n, dele / n, sub / n
