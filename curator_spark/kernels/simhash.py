"""SimHash-64 over char shingles (Charikar, STOC 2002).

The reference repo has no SimHash module (SURVEY.md scope note); the north
rule requires one for near-dup transcript filtering. We parameterize it
consistently with the reference MinHash: same character shingling
(``width`` chars, whole string if shorter), murmur3_x86_32 base hashes.

64-bit shingle hash = (murmur32(s, seed) << 32) | murmur32(s, seed ^ 0x5BD1E995).
Per-bit votes are weighted by shingle frequency; simhash bit i is 1 iff the
vote sum is > 0. Hamming distance <= k between simhashes ~ cosine similarity
of the shingle-frequency vectors.
"""

from __future__ import annotations

import numpy as np

from .minhash import _batch_shingle_hashes, _char_starts  # noqa: F401
from .murmur3 import murmur3_x86_32_batch

_SEED_XOR = 0x5BD1E995


def _shingle_hash64(texts: list, width: int, seed: int) -> tuple:
    """Returns (flat uint64 hashes, doc offsets) for a batch."""
    lo = _batch_shingle_hashes(texts, width, seed)
    hi = _batch_shingle_hashes(texts, width, seed ^ _SEED_XOR)
    counts = np.array([len(x) for x in lo], dtype=np.int64)
    offsets = np.zeros(len(lo), dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    flat = (np.concatenate(hi).astype(np.uint64) << np.uint64(32)) | np.concatenate(lo).astype(np.uint64)
    return flat, offsets


def simhash64(texts: list, width: int = 24, seed: int = 42) -> np.ndarray:
    """SimHash-64 per text. Returns (n,) int64 (bit pattern, sign-cast)."""
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    flat, offsets = _shingle_hash64([t or "" for t in texts], width, seed)
    # votes: (n_shingles, 64) in {-1, +1}
    bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int32)
    votes = np.add.reduceat(bits * 2 - 1, offsets, axis=0)
    sim = (votes > 0).astype(np.uint64)
    out = np.zeros(n, dtype=np.uint64)
    for b in range(64):
        out |= sim[:, b] << np.uint64(b)
    return out.view(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of XOR between two int64 arrays (test oracle; Spark side
    uses ``bit_count(s1 ^ s2)``)."""
    x = (a.view(np.uint64) ^ b.view(np.uint64)).copy()
    cnt = np.zeros(len(x), dtype=np.int64)
    for _ in range(64):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
    return cnt
