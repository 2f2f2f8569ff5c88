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


_CHUNK_SHINGLES = 1 << 14  # keep the (shingles x 64) vote matrices ~4 MB / chunk


def simhash64(texts: list, width: int = 24, seed: int = 42) -> np.ndarray:
    """SimHash-64 per text. Returns (n,) int64 (bit pattern, sign-cast).

    Chunked unpackbits/packbits: the per-shingle bit matrix is processed in
    cache-sized doc ranges (a single monolithic (n_shingles, 64) matrix
    goes superlinear from cache thrash at Arrow-batch sizes).
    """
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    flat, offsets = _shingle_hash64([t or "" for t in texts], width, seed)
    counts = np.diff(np.append(offsets, len(flat)))
    out = np.empty(n, dtype=np.uint64)
    i = 0
    while i < n:
        j = i + 1
        total = int(counts[i])
        while j < n and total + counts[j] <= _CHUNK_SHINGLES:
            total += int(counts[j])
            j += 1
        sl = flat[offsets[i] : offsets[i] + total]
        # (shingles, 64) bits, little bit order => column b == (h >> b) & 1
        bits = np.unpackbits(sl.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        local_off = (offsets[i:j] - offsets[i]).astype(np.int64)
        sums = np.add.reduceat(bits.astype(np.int32), local_off, axis=0)
        # vote > 0  <=>  2 * ones - count > 0
        sim = (2 * sums > counts[i:j, None]).astype(np.uint8)
        out[i:j] = np.packbits(sim, axis=1, bitorder="little").view(np.uint64)[:, 0]
        i = j
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
