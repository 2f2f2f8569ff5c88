"""Zero-copy shingle hashing from Arrow string buffers.

The pandas-UDF path materializes every transcript as a Python str and
every signature as a boxed numpy array (1M docs -> 2M+ Python objects per
batch wave). This module works directly on the Arrow layout instead: one
concatenated uint8 data buffer + an int offsets vector per RecordBatch.

:func:`minhash_concat` (the pipeline's signature kernel) slices the
shared data buffer into zero-copy per-doc views and delegates to
``kernels.minhash.minhash_signatures_bufs`` — the ASCII strided-gather
murmur + per-doc unique dedup + L2-blocked permute formulation that
superseded this module's sliding-word one (A/B in BENCH.md: 1.3x on
high-entropy text, 7x on repetitive transcripts). The sliding-word
machinery retained here (:func:`_words32`, :func:`_murmur32_sliding`,
:func:`shingle_hashes_concat`) is an independent formulation kept as
the parity cross-check for the fast path's shingle hashes.

Semantics are identical to kernels.minhash (same UTF-8 char-start
handling, same empty-string -> single-empty-shingle convention, same
seed schedule as the reference fuzzy/minhash.py:103-129).
"""

from __future__ import annotations

import numpy as np

from .minhash import minhash_signatures_bufs
from .murmur3 import _C1, _C2, _M5, _N, _U32

_TAIL_MASK32 = np.array([0, 0xFF, 0xFFFF, 0xFFFFFF], dtype=np.uint32)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U32(r)) | (x >> _U32(32 - r))


def _words32(data: np.ndarray) -> np.ndarray:
    """LE uint32 read at EVERY byte position of ``data`` (3-byte zero pad
    at the end so the last positions are safe)."""
    n = len(data)
    pad = np.zeros(n + 3, dtype=np.uint8)
    pad[:n] = data
    w = pad[:n].astype(np.uint32)
    w |= pad[1 : n + 1].astype(np.uint32) << _U32(8)
    w |= pad[2 : n + 2].astype(np.uint32) << _U32(16)
    w |= pad[3 : n + 3].astype(np.uint32) << _U32(24)
    return w


def _murmur32_sliding(
    w32: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int
) -> np.ndarray:
    """MurmurHash3_x86_32 of ``n`` byte ranges of one blob, via the
    per-position word array from :func:`_words32`. Vectorized across
    ranges; loops over 4-byte block positions (max_len/4 iterations)."""
    n = len(starts)
    nblocks = lengths >> 2
    max_blocks = int(nblocks.max()) if n else 0
    hi = max(len(w32) - 1, 0)  # clamp: inactive lanes still gather
    with np.errstate(over="ignore"):
        h1 = np.full(n, _U32(seed), dtype=np.uint32)
        for b in range(max_blocks):
            active = nblocks > b
            k1 = w32[np.minimum(starts + 4 * b, hi)] * _C1
            k1 = _rotl32(k1, 15)
            k1 *= _C2
            h1n = h1 ^ k1
            h1n = _rotl32(h1n, 13)
            h1n = h1n * _M5 + _N
            if active.all():
                h1 = h1n
            else:
                h1 = np.where(active, h1n, h1)
        tl = (lengths & 3).astype(np.int64)
        has_tail = tl > 0
        if has_tail.any():
            k1 = w32[np.minimum(starts + (nblocks << 2), hi)] & _TAIL_MASK32[tl]
            k1 *= _C1
            k1 = _rotl32(k1, 15)
            k1 *= _C2
            h1 = np.where(has_tail, h1 ^ k1, h1)
        h1 ^= lengths.astype(np.uint32)
        h1 ^= h1 >> _U32(16)
        h1 *= _U32(0x85EBCA6B)
        h1 ^= h1 >> _U32(13)
        h1 *= _U32(0xC2B2AE35)
        h1 ^= h1 >> _U32(16)
    return h1


def shingle_hashes_concat(
    data: np.ndarray, offsets: np.ndarray, width: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Shingle-hash a batch of UTF-8 strings stored concatenated.

    data:    (total_bytes,) uint8 — all docs back-to-back.
    offsets: (n_docs + 1,) int64 — doc i occupies data[offsets[i]:offsets[i+1]].
    Returns (hashes, sh_offsets): uint32 shingle hashes of all docs
    concatenated, and (n_docs + 1,) boundaries into it.
    """
    n_docs = len(offsets) - 1
    total = int(offsets[-1])
    # global char starts; char k spans [char_pos[k], char_pos[k+1]) — doc
    # boundaries coincide with char starts, so ends are correct across docs
    char_pos = np.flatnonzero((data[:total] & 0xC0) != 0x80).astype(np.int64)
    bounds = np.append(char_pos, total)
    # chars-per-doc via searchsorted on doc byte offsets
    first_char = np.searchsorted(char_pos, offsets[:-1], side="left")
    last_char = np.searchsorted(char_pos, offsets[1:], side="left")
    n_chars = last_char - first_char
    n_sh = np.maximum(1, n_chars - width + 1)
    sh_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_sh, out=sh_offsets[1:])
    total_sh = int(sh_offsets[-1])

    # global per-shingle char indices
    doc_of_sh = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
    pos_in_doc = np.arange(total_sh, dtype=np.int64) - sh_offsets[doc_of_sh]
    start_char = first_char[doc_of_sh] + pos_in_doc
    end_char = np.minimum(start_char + width, last_char[doc_of_sh])
    # empty docs: n_chars == 0 -> one empty shingle at the doc offset
    empty = n_chars[doc_of_sh] == 0
    if empty.any():
        sh_start = np.where(empty, offsets[:-1][doc_of_sh], bounds[np.minimum(start_char, len(bounds) - 1)])
        sh_end = np.where(empty, offsets[:-1][doc_of_sh], bounds[np.minimum(end_char, len(bounds) - 1)])
    else:
        sh_start = bounds[start_char]
        sh_end = bounds[end_char]
    hashes = _murmur32_sliding(_words32(data[:total]), sh_start, sh_end - sh_start, seed)
    return hashes, sh_offsets


def minhash_concat(
    data: np.ndarray,
    offsets: np.ndarray,
    seeds: np.ndarray,
    width: int,
    bit_width: int = 32,
) -> np.ndarray:
    """(n_docs, n_perm) minhash signatures from concatenated UTF-8 —
    uint32 for ``bit_width=32``, uint64 (61-bit values) for 64.

    Same permutation schedule as kernels.minhash.minhash_signatures
    (seeds[:,0]=a, seeds[:,1]=b, murmur seed = seeds[0][0], Mersenne
    prime 2^61-1 modulus, 32-bit mask on the 32-bit path). 64-bit:
    MurmurHash3_x64_128 base hash + full-width split-multiply mod
    2^61-1, the reference's use_64bit_hash path.

    Delegates to :func:`minhash_signatures_bufs` over zero-copy per-doc
    views of the Arrow data buffer. That kernel's ASCII strided-gather
    murmur + per-doc unique dedup + L2-blocked permute loop beat this
    module's earlier sliding-word formulation 1.3x on high-entropy text
    and 7x on repetitive transcripts (the dedup collapses the permute
    working set), with the same bounded-temporary discipline (~2 MB
    gather chunks, ~256 KB permute blocks)."""
    n_docs = len(offsets) - 1
    bufs = [data[int(offsets[k]) : int(offsets[k + 1])] for k in range(n_docs)]
    return minhash_signatures_bufs(bufs, seeds, width, bit_width=bit_width)
