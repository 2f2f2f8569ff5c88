"""Winnowing fingerprints + suffix arrays for the exact-substring pass.

The north rule requires a suffix-array substring stage (the reference repo
itself has none — SURVEY.md scope note; the algorithm follows Lee et al.
2022 "Deduplicating Training Data Makes Language Models Better", default
min match length L=50, and Schleimer et al. 2003 winnowing for scalable
candidate generation).

Two-phase Spark-first design:
1. candidate generation: winnowing fingerprints. With k-gram size ``k``
   and window ``w`` (k + w - 1 = L), any two docs sharing an exact
   substring of length >= L share at least one selected fingerprint
   (winnowing guarantee). Fingerprints explode -> groupBy -> candidate
   pairs, exactly like LSH buckets.
2. verification: per candidate pair, exact longest-common-substring via a
   generalized suffix array (Manber-Myers doubling, numpy) + Kasai LCP.
"""

from __future__ import annotations

import numpy as np

from .murmur3 import murmur3_x86_32_batch

DEFAULT_MIN_LENGTH = 50  # Lee et al. 2022 default
DEFAULT_KGRAM = 25
DEFAULT_WINDOW = DEFAULT_MIN_LENGTH - DEFAULT_KGRAM + 1  # k + w - 1 = L


def winnow_fingerprints(text: str, k: int = DEFAULT_KGRAM, w: int = DEFAULT_WINDOW, seed: int = 42) -> np.ndarray:
    """Selected k-gram hashes (uint32, deduped) of one text.

    Texts shorter than k yield no fingerprints (they cannot contain an
    L-char substring).
    """
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    n = len(b)
    if n < k:
        return np.empty(0, dtype=np.uint32)
    win = np.lib.stride_tricks.sliding_window_view(b, k)
    hashes = murmur3_x86_32_batch(np.ascontiguousarray(win), np.full(len(win), k, dtype=np.int64), seed=seed)
    if len(hashes) <= w:
        return np.unique(hashes.min(keepdims=True))
    mins = np.lib.stride_tricks.sliding_window_view(hashes, w).min(axis=1)
    return np.unique(mins)


def suffix_array(s: bytes) -> np.ndarray:
    """Suffix array by Manber-Myers prefix doubling (numpy-vectorized)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.frombuffer(s, dtype=np.uint8).astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        new_rank = np.zeros(n, dtype=np.int64)
        prev = order[:-1]
        cur = order[1:]
        bump = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        new_rank[order[1:]] = np.cumsum(bump)
        rank = new_rank
        sa = order
        if rank[order[-1]] == n - 1:
            break
        k <<= 1
    return sa


def lcp_kasai(s: bytes, sa: np.ndarray) -> np.ndarray:
    """LCP array (lcp[i] = LCP(sa[i], sa[i-1])), Kasai et al. 2001."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.zeros(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: str, b: str) -> int:
    """Length of the longest exact common substring (suffix-array based)."""
    ab = (a or "").encode("utf-8")
    bb = (b or "").encode("utf-8")
    if not ab or not bb:
        return 0
    # quick path: full containment
    if ab in bb or bb in ab:
        return min(len(ab), len(bb))
    s = ab + b"\x00" + bb
    sa = suffix_array(s)
    lcp = lcp_kasai(s, sa)
    boundary = len(ab)
    from_a = sa < boundary
    best = 0
    for i in range(1, len(sa)):
        if from_a[i] != from_a[i - 1]:
            # UTF-8 text can legally contain NUL bytes, so a raw LCP can
            # run ACROSS the \x00 separator when the content has its own
            # \x00 — cap the match at the a-side suffix's distance to the
            # separator so the reported LCS never spans both strings
            p_a = int(sa[i] if from_a[i] else sa[i - 1])
            best = max(best, min(int(lcp[i]), boundary - p_a))
    return best
