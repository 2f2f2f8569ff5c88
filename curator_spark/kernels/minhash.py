"""Char-shingle MinHash signatures, bit-compatible with the reference config.

Reproduces the semantics of cuDF ``str.minhash(a, b, seed, width)`` as the
reference uses it (/root/reference/nemo_curator/stages/deduplication/fuzzy/
minhash.py:103-142):

- shingles: every sliding window of ``width`` *characters* (UTF-8 aware);
  strings shorter than ``width`` contribute one shingle = the whole string.
- base hash: MurmurHash3_x86_32 of the shingle's UTF-8 bytes, seeded with
  ``seeds[0][0]`` (the first permutation's ``a``).
- permutation i: ``((h * a_i + b_i) % (2**61 - 1)) & 0xFFFFFFFF`` with
  ``(a_i, b_i)`` drawn from ``np.random.RandomState(seed)`` as
  ``a=randint(1, 2**31-1), b=randint(0, 2**31-1)`` in uint32 —
  the exact seed schedule of the reference (minhash.py:103-129).
- signature[i] = min over shingles of permutation i.

Everything is numpy-vectorized: one gather builds the shingle byte matrix
for a whole Arrow batch, murmur is vectorized across shingles, and the
per-document minima use ``np.minimum.reduceat`` over document offsets.
"""

from __future__ import annotations

import numpy as np

from numpy.lib.stride_tricks import sliding_window_view

from .murmur3 import murmur3_x64_128_batch, murmur3_x86_32_batch, murmur3_x86_32_fixed

MERSENNE_61 = np.uint64((1 << 61) - 1)
_HASH_MASK_32 = np.uint64(0xFFFFFFFF)

# memory governor for a single kernel invocation (per Arrow batch, per task);
# sized so ~32 concurrent executor threads stay well under heap
_MAX_SHINGLE_BYTES = 32 << 20  # doc-chunk cap for the permute loop
_GATHER_BYTES = 2 << 20  # shingle gather matrix cap (small => temporaries reused)
_PERMUTE_BLOCK = 32768  # u64 hashes per permute sub-block (~256 KB, L2-resident)


def generate_seeds(n_permutations: int = 260, seed: int = 42, bit_width: int = 32) -> np.ndarray:
    """Reference seed schedule (fuzzy/minhash.py:103-129): (n_perm, 2) array
    of (a, b) with a in [1, P), b in [0, P), P = 2^31-1 (u32) or 2^61-1 (u64)."""
    gen = np.random.RandomState(seed)
    if bit_width == 32:
        prime = np.uint32((1 << 31) - 1)
        dtype = np.uint32
    elif bit_width == 64:
        prime = np.uint64((1 << 61) - 1)
        dtype = np.uint64
    else:
        raise ValueError("bit_width must be 32 or 64")
    return np.array(
        [(gen.randint(1, prime, dtype=dtype), gen.randint(0, prime, dtype=dtype)) for _ in range(n_permutations)],
        dtype=dtype,
    )


def _char_starts(buf: np.ndarray) -> np.ndarray:
    """Byte indices where a UTF-8 character starts (non-continuation bytes)."""
    return np.flatnonzero((buf & 0xC0) != 0x80)


def shingle_hashes(text: str, width: int, seed: int) -> np.ndarray:
    """All shingle murmur hashes of one text (test/oracle helper)."""
    sigs = _batch_shingle_hashes([text], width, seed)
    return sigs[0]


def _mulmod_m61(h: np.ndarray, a: int, b: int) -> np.ndarray:
    """(h * a + b) mod (2^61 - 1) for u64 ``h`` and 61-bit constants,
    without 128-bit integers: split both operands into 32-bit halves,
    reduce each partial product, and use 2^61 ≡ 1 (mod M) to fold the
    2^32 / 2^64 scale factors as cheap shifts."""
    M = MERSENNE_61

    def red(x: np.ndarray) -> np.ndarray:
        # x < 2^64 -> x mod M (one fold + conditional subtract)
        x = (x >> np.uint64(61)) + (x & M)
        return np.where(x >= M, x - M, x)

    a_lo, a_hi = np.uint64(a & 0xFFFFFFFF), np.uint64(a >> 32)
    h_lo = h & np.uint64(0xFFFFFFFF)
    h_hi = h >> np.uint64(32)
    p0 = red(a_lo * h_lo)
    mid = red(red(a_lo * h_hi) + red(a_hi * h_lo))  # x 2^32 pending
    # mid * 2^32 mod M: mid = hi29*2^29 + lo29 => hi29 + lo29*2^32
    mid32 = red(((mid & np.uint64((1 << 29) - 1)) << np.uint64(32)) + (mid >> np.uint64(29)))
    p3 = red(a_hi * h_hi)  # x 2^64 == x 8 (mod M)
    p38 = red(((p3 & np.uint64((1 << 58) - 1)) << np.uint64(3)) + (p3 >> np.uint64(58)))
    return red(red(p0 + mid32) + p38 + np.uint64(b))


def _batch_shingle_hashes(texts: list, width: int, seed: int, bit_width: int = 32) -> list:
    """Per-text arrays of uint32 shingle hashes.

    Two paths, bit-identical outputs:

    - ASCII fast path (docs that are pure ASCII with >= ``width`` chars —
      the overwhelming bulk of real transcripts): character windows ARE
      byte windows, every shingle is exactly ``width`` bytes, so the
      shingle matrix is ONE row gather out of ``sliding_window_view`` of
      the concatenated chunk (no per-column mask loop) and the murmur is
      the mask-free uniform-length variant. ~3x the generic path.
    - generic path (multi-byte UTF-8 or shorter-than-width docs):
      column-at-a-time masked gather over variable-length shingles.

    Both make one murmur batch call per gather chunk of shingles ACROSS
    docs (not per doc) — the vectorized murmur's Python-level block loop
    amortizes over the whole chunk, ~10x over per-doc calls. Chunks are
    kept small (~_GATHER_BYTES of shingle matrix) so the int64 index
    temporaries stay in allocator-reused blocks: first-touch of fresh
    multi-hundred-MB allocations is extremely slow on memory-ballooned
    hosts."""
    bufs = [np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8) for t in texts]
    return _shingle_hashes_bufs(bufs, width, seed, bit_width)


def _shingle_hashes_bufs(bufs: list, width: int, seed: int, bit_width: int = 32) -> list:
    """Bufs-based core of :func:`_batch_shingle_hashes` — each doc is a
    uint8 array (zero-copy views of an Arrow data buffer work)."""
    n = len(bufs)
    out: list = [None] * n
    fast = [k for k in range(n) if len(bufs[k]) >= width and not (bufs[k] & 0x80).any()]
    if fast:
        _fast_shingle_hashes(bufs, fast, width, seed, bit_width, out)
    slow = [k for k in range(n) if out[k] is None]
    if slow:
        _generic_shingle_hashes(bufs, slow, width, seed, bit_width, out)
    return out


def _fast_shingle_hashes(
    bufs: list, idxs: list, width: int, seed: int, bit_width: int, out: list
) -> None:
    """ASCII uniform-shingle path: fills ``out[k]`` for each k in idxs."""
    m = len(idxs)
    i = 0
    while i < m:
        j, est = i, 0
        while j < m and (j == i or est < _GATHER_BYTES):
            est += (len(bufs[idxs[j]]) - width + 1) * width
            j += 1
        sel = idxs[i:j]
        blob = np.concatenate([bufs[k] for k in sel])
        lens = np.array([len(bufs[k]) for k in sel], dtype=np.int64)
        counts = lens - width + 1
        doc_off = np.zeros(len(sel) + 1, dtype=np.int64)
        np.cumsum(lens, out=doc_off[1:])
        cum_excl = np.zeros(len(sel), dtype=np.int64)
        np.cumsum(counts[:-1], out=cum_excl[1:])
        total = int(counts.sum())
        # starts[p] = doc_off[t] + (p - cum_excl[t]) for p in doc t's range
        starts = np.repeat(doc_off[:-1] - cum_excl, counts) + np.arange(total)
        mat = sliding_window_view(blob, width)[starts]
        if bit_width == 32:
            hashes = murmur3_x86_32_fixed(mat, width, seed=seed)
        else:
            hashes = murmur3_x64_128_batch(mat, np.full(total, width, np.int64), seed=seed)
        for t, k in enumerate(sel):
            out[k] = hashes[cum_excl[t] : cum_excl[t] + counts[t]]
        i = j


def _generic_shingle_hashes(
    bufs: list, idxs: list, width: int, seed: int, bit_width: int, out: list
) -> None:
    """Variable-length masked-gather path: fills ``out[k]`` for k in idxs."""
    n = len(idxs)
    i = 0
    while i < n:
        # grow chunk [i, j) while the gather matrix stays bounded
        j, est = i, 0
        while j < n and (j == i or est < _GATHER_BYTES):
            est += max(1, len(bufs[idxs[j]])) * width
            j += 1
        sel = idxs[i:j]
        blob = np.concatenate([np.zeros(0, np.uint8), *(bufs[k] for k in sel)])
        doc_off = np.zeros(len(sel) + 1, dtype=np.int64)
        np.cumsum([len(bufs[k]) for k in sel], out=doc_off[1:])
        sh_start_parts, sh_end_parts, counts = [], [], np.empty(len(sel), dtype=np.int64)
        for t, k in enumerate(sel):
            b = bufs[k]
            starts = _char_starts(b)
            n_chars = len(starts)
            bounds = np.append(starts, len(b))
            n_sh = max(1, n_chars - width + 1)
            base = doc_off[t]
            sh_start_parts.append(bounds[np.arange(n_sh)] + base)
            sh_end_parts.append(bounds[np.minimum(np.arange(n_sh) + width, n_chars)] + base)
            counts[t] = n_sh
        sh_start = np.concatenate(sh_start_parts)
        sh_end = np.concatenate(sh_end_parts)
        lens = sh_end - sh_start
        maxlen = int(lens.max()) if len(lens) else 0
        mat = np.zeros((len(sh_start), max(maxlen, 1)), dtype=np.uint8)
        if maxlen and len(blob):
            # column-at-a-time gather: only (n_sh,) temporaries — a 2-D
            # (n_sh, maxlen) int64 index matrix would dominate runtime via
            # page-fault churn on memory-ballooned hosts
            for p in range(maxlen):
                col_idx = sh_start + p
                ok = col_idx < sh_end
                mat[ok, p] = blob[col_idx[ok]]
        murmur = murmur3_x86_32_batch if bit_width == 32 else murmur3_x64_128_batch
        hashes = murmur(mat, lens, seed=seed)
        splits = np.zeros(len(sel), dtype=np.int64)
        np.cumsum(counts[:-1], out=splits[1:])
        for t, k in enumerate(sel):
            out[k] = hashes[splits[t] : splits[t] + counts[t]]
        i = j


def minhash_signatures(
    texts: list,
    seeds: np.ndarray,
    width: int = 24,
    bit_width: int = 32,
) -> np.ndarray:
    """MinHash signatures for a batch of texts.

    Returns (n_docs, n_perm): uint32 for the default 32-bit path, uint64
    (61-bit values) for ``bit_width=64`` — the reference's
    ``use_64bit_hash`` path (cuDF str.minhash64, fuzzy/minhash.py:144-155:
    MurmurHash3_x64_128 base hash, u64 (a*h+b) mod 2^61-1 permutation,
    no 32-bit mask).
    """
    bufs = [np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8) for t in texts]
    return minhash_signatures_bufs(bufs, seeds, width, bit_width)


def minhash_signatures_bufs(
    bufs: list,
    seeds: np.ndarray,
    width: int = 24,
    bit_width: int = 32,
) -> np.ndarray:
    """:func:`minhash_signatures` over pre-encoded UTF-8 byte arrays —
    the zero-copy entry point for Arrow string buffers (each doc a
    uint8 view of the shared data buffer, no Python str boxing)."""
    if bit_width not in (32, 64):
        raise ValueError("bit_width must be 32 or 64")
    n_perm = len(seeds)
    murmur_seed = int(seeds[0][0])
    n_docs = len(bufs)
    sig = np.empty((n_docs, n_perm), dtype=np.uint32 if bit_width == 32 else np.uint64)

    a = seeds[:, 0].astype(np.uint64)
    b = seeds[:, 1].astype(np.uint64)

    # chunk documents so the shingle matrices stay bounded
    doc_i = 0
    while doc_i < n_docs:
        j = doc_i
        est = 0
        while j < n_docs and (j == doc_i or est < _MAX_SHINGLE_BYTES):
            est += max(1, len(bufs[j])) * width  # ~bytes in the shingle matrix
            j += 1
        per_doc = _shingle_hashes_bufs(bufs[doc_i:j], width, murmur_seed, bit_width=bit_width)
        # unique hashes per doc (repetitive text => far fewer permute ops)
        uniq = [np.unique(h) for h in per_doc]
        counts = np.array([len(u) for u in uniq], dtype=np.int64)
        flat = np.concatenate(uniq).astype(np.uint64) if uniq else np.empty(0, np.uint64)
        offsets = np.zeros(len(uniq), dtype=np.int64)
        np.cumsum(counts[:-1], out=offsets[1:])
        # perm-major 1-D loop over L2-sized doc-aligned sub-blocks: the
        # sub-block stays cache-resident across ALL permutations (~1.6x
        # over one full-chunk pass per perm, which streams the whole flat
        # array from memory 260 times; the (shingles x perms) broadcast is
        # worse still, ~6x, from cache thrash at Arrow-batch sizes)
        n_chunk_docs = len(uniq)
        d = 0
        with np.errstate(over="ignore"):
            while d < n_chunk_docs:
                d2 = d
                while d2 < n_chunk_docs and (d2 == d or offsets[d2] - offsets[d] < _PERMUTE_BLOCK):
                    d2 += 1
                s = offsets[d]
                e = offsets[d2] if d2 < n_chunk_docs else len(flat)
                sub = flat[s:e]
                off = offsets[d:d2] - s
                pv = np.empty_like(sub)
                hb = np.empty_like(sub)
                for i in range(n_perm):
                    if bit_width == 32:
                        # (h*a + b) fits u64: h < 2^32, a < 2^31 => < 2^63
                        np.multiply(sub, a[i], out=pv)
                        pv += b[i]
                        # x % (2^61-1) without division: x = hi*2^61 + lo =>
                        # x mod M = hi + lo (- M if needed); hi <= 3 here
                        np.right_shift(pv, np.uint64(61), out=hb)
                        pv &= MERSENNE_61
                        pv += hb
                        # branch-free conditional subtract: pv - M wraps
                        # ABOVE pv when pv < M, so min picks the reduced value
                        np.subtract(pv, MERSENNE_61, out=hb)
                        np.minimum(pv, hb, out=pv)
                        pv &= _HASH_MASK_32
                    else:
                        # full-width operands: split-multiply mod-M61
                        pv = _mulmod_m61(sub, int(a[i]), int(b[i]))
                    sig[doc_i + d : doc_i + d2, i] = np.minimum.reduceat(pv, off)
                d = d2
        doc_i = j
    return sig


def jaccard_char_shingles(t1: str, t2: str, width: int) -> float:
    """Exact Jaccard over char-shingle sets (test oracle, mirrors
    cuDF str.jaccard_index used by the reference minhash tests)."""

    def shingles(t: str) -> set:
        if len(t) < width:
            return {t}
        return {t[i : i + width] for i in range(len(t) - width + 1)}

    s1, s2 = shingles(t1), shingles(t2)
    if not s1 and not s2:
        return 1.0
    return len(s1 & s2) / len(s1 | s2)
