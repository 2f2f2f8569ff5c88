"""Zero-copy shingle hashing from Arrow string buffers.

The pandas-UDF path materializes every transcript as a Python str and
every signature as a boxed numpy array (1M docs -> 2M+ Python objects per
batch wave). This module works directly on the Arrow layout instead: one
concatenated uint8 data buffer + an int offsets vector per RecordBatch.

Design notes (all measured on this sandbox, see BENCH.md):

- **Sliding-window murmur, no gather matrix.** A little-endian uint32
  word is precomputed at every byte position of the blob (4 shifted adds
  over the blob, one pass), so MurmurHash3_x86_32 block k of the shingle
  starting at byte ``s`` is just ``w32[s + 4k]`` — 6 gathers per 24-byte
  shingle instead of building a right-padded ``(n_sh, 24)`` byte matrix
  (24 column gathers + zero-fill). Tail bytes come from the same word
  array masked to ``len % 4`` bytes.
- **No per-doc dedup.** min over the shingle-hash multiset equals min
  over the set, so the permutation loop runs ``np.minimum.reduceat``
  directly over the raw per-doc shingle hashes. The previous version's
  global lexsort + unique was the single largest allocator of per-batch
  temporaries (the sort's int64 order vector alone was 8 bytes/shingle)
  and is exactly the kind of fresh multi-MB allocation this host's
  serialized page-fault path punishes.
- **L2-blocked permutation loop.** Documents are processed in groups of
  at most ``_BLOCK_HASHES`` shingle hashes; each group's uint64 working
  buffers (~0.5 MB) are allocated once per worker and reused across
  groups AND across Arrow batches, so all 260 permutation passes stream
  L2-resident data instead of re-reading a ~10 MB chunk from shared
  memory 260 times. Multi-core scaling of the signature phase is
  bandwidth-bound at higher core counts; this is the fix.

Semantics are identical to kernels.minhash (same UTF-8 char-start
handling, same empty-string -> single-empty-shingle convention, same
seed schedule as the reference fuzzy/minhash.py:103-129).
"""

from __future__ import annotations

import numpy as np

from .minhash import _HASH_MASK_32, MERSENNE_61, _mulmod_m61
from .murmur3 import _C1, _C2, _C1_64, _C2_64, _M5, _N, _U32, _U64, _fmix64, _rotl64

# permutation working-set cap per group: 64K hashes x 8 B = 512 KB,
# L2-resident on this host's cores
_BLOCK_HASHES = 1 << 16

_TAIL_MASK32 = np.array([0, 0xFF, 0xFFFF, 0xFFFFFF], dtype=np.uint32)
# masks for 0..8 low bytes of a uint64
_TAIL_MASK64 = np.array(
    [0] + [(1 << (8 * i)) - 1 for i in range(1, 8)] + [0xFFFFFFFFFFFFFFFF], dtype=np.uint64
)


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


def _words64(data: np.ndarray) -> np.ndarray:
    """LE uint64 read at EVERY byte position of ``data`` (7-byte zero pad)."""
    n = len(data)
    pad = np.zeros(n + 7, dtype=np.uint8)
    pad[:n] = data
    w = pad[:n].astype(np.uint64)
    for byte in range(1, 8):
        w |= pad[byte : n + byte].astype(np.uint64) << _U64(byte * 8)
    return w


def _murmur64_sliding(
    w64: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int
) -> np.ndarray:
    """First 64 bits of MurmurHash3_x64_128 of ``n`` byte ranges of one
    blob, via the per-position word array from :func:`_words64`.
    Matches murmur3.murmur3_x64_128 (cuDF str.minhash64's base hash)."""
    n = len(starts)
    nblocks = lengths >> 4
    max_blocks = int(nblocks.max()) if n else 0
    hi = max(len(w64) - 1, 0)  # clamp: inactive lanes still gather
    with np.errstate(over="ignore"):
        h1 = np.full(n, _U64(seed), dtype=np.uint64)
        h2 = np.full(n, _U64(seed), dtype=np.uint64)
        for b in range(max_blocks):
            active = nblocks > b
            k1 = w64[np.minimum(starts + 16 * b, hi)] * _C1_64
            k1 = _rotl64(k1, 31)
            k1 *= _C2_64
            h1n = h1 ^ k1
            h1n = _rotl64(h1n, 27) + h2
            h1n = h1n * _U64(5) + _U64(0x52DCE729)
            k2 = w64[np.minimum(starts + 16 * b + 8, hi)] * _C2_64
            k2 = _rotl64(k2, 33)
            k2 *= _C1_64
            h2n = h2 ^ k2
            h2n = _rotl64(h2n, 31) + h1n
            h2n = h2n * _U64(5) + _U64(0x38495AB5)
            if active.all():
                h1, h2 = h1n, h2n
            else:
                h1 = np.where(active, h1n, h1)
                h2 = np.where(active, h2n, h2)
        tail_len = (lengths & 15).astype(np.int64)
        tail_start = starts + (nblocks << 4)
        m2 = tail_len > 8
        if m2.any():
            k2 = w64[np.minimum(tail_start + 8, hi)] & _TAIL_MASK64[np.clip(tail_len - 8, 0, 8)]
            k2 *= _C2_64
            k2 = _rotl64(k2, 33)
            k2 *= _C1_64
            h2 = np.where(m2, h2 ^ k2, h2)
        m1 = tail_len > 0
        if m1.any():
            k1 = w64[np.minimum(tail_start, hi)] & _TAIL_MASK64[np.minimum(tail_len, 8)]
            k1 *= _C1_64
            k1 = _rotl64(k1, 31)
            k1 *= _C2_64
            h1 = np.where(m1, h1 ^ k1, h1)
        h1 ^= lengths.astype(np.uint64)
        h2 ^= lengths.astype(np.uint64)
        h1 += h2
        h2 += h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 += h2
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


# per-worker reusable permutation buffers (uint64 x _BLOCK_HASHES each);
# module-level so they survive across Arrow batches within a task
_PERM_BUFS: list = []


def _perm_buffers() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    if not _PERM_BUFS:
        _PERM_BUFS.append(np.empty(_BLOCK_HASHES, dtype=np.uint64))
        _PERM_BUFS.append(np.empty(_BLOCK_HASHES, dtype=np.uint64))
        _PERM_BUFS.append(np.empty(_BLOCK_HASHES, dtype=np.uint64))
    return _PERM_BUFS[0], _PERM_BUFS[1], _PERM_BUFS[2]


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
    prime 2^61-1 modulus, 32-bit mask on the 32-bit path; min over the
    shingle-hash multiset == min over the set, so no dedup pass is
    needed). 64-bit: MurmurHash3_x64_128 base hash + full-width
    split-multiply mod 2^61-1, the reference's use_64bit_hash path.

    Fully blocked: shingle geometry, the per-position word array, the
    sliding murmur, and the 260 permutation passes all run per doc-group
    of <= _BLOCK_HASHES shingles, so no temporary exceeds ~0.5 MB —
    first-touch page faults on fresh multi-MB allocations are the
    dominant cost of the unblocked formulation on memory-ballooned
    hosts, and they serialize across processes.
    """
    n_docs = len(offsets) - 1
    n_perm = len(seeds)
    murmur_seed = int(seeds[0][0])
    total = int(offsets[-1])
    a = seeds[:, 0].astype(np.uint64)
    b = seeds[:, 1].astype(np.uint64)

    # per-doc char geometry (n_docs-sized + one O(total_chars) index)
    char_pos = np.flatnonzero((data[:total] & 0xC0) != 0x80).astype(np.int64)
    bounds = np.append(char_pos, total)
    first_char = np.searchsorted(char_pos, offsets[:-1], side="left")
    last_char = np.searchsorted(char_pos, offsets[1:], side="left")
    n_chars = last_char - first_char
    n_sh = np.maximum(1, n_chars - width + 1)
    sh_off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_sh, out=sh_off[1:])

    sig = np.empty((n_docs, n_perm), dtype=np.uint32 if bit_width == 32 else np.uint64)
    flat64, pv, hb = _perm_buffers()
    d0 = 0
    with np.errstate(over="ignore"):
        while d0 < n_docs:
            d1 = d0
            g0 = int(sh_off[d0])
            while d1 < n_docs and (d1 == d0 or int(sh_off[d1 + 1]) - g0 <= _BLOCK_HASHES):
                d1 += 1
            g1 = int(sh_off[d1])
            m = g1 - g0
            if m <= _BLOCK_HASHES:
                f = flat64[:m]
                p = pv[:m]
                h = hb[:m]
            else:  # single doc larger than the block cap
                f = np.empty(m, dtype=np.uint64)
                p = np.empty(m, dtype=np.uint64)
                h = np.empty(m, dtype=np.uint64)

            # group-local shingle geometry (all arrays m- or (d1-d0)-sized)
            goff = sh_off[d0:d1] - g0
            doc_of = np.repeat(np.arange(d0, d1, dtype=np.int64), n_sh[d0:d1])
            pos_in_doc = np.arange(m, dtype=np.int64) - goff[doc_of - d0]
            start_char = first_char[doc_of] + pos_in_doc
            end_char = np.minimum(start_char + width, last_char[doc_of])
            empty = n_chars[doc_of] == 0
            if empty.any():
                sh_start = np.where(
                    empty, offsets[:-1][doc_of], bounds[np.minimum(start_char, len(bounds) - 1)]
                )
                sh_end = np.where(
                    empty, offsets[:-1][doc_of], bounds[np.minimum(end_char, len(bounds) - 1)]
                )
            else:
                sh_start = bounds[start_char]
                sh_end = bounds[end_char]

            # group-local word array over just this group's byte span
            b0 = int(offsets[d0])
            b1 = int(offsets[d1])
            if bit_width == 32:
                w32 = _words32(data[b0:b1])
                hashes = _murmur32_sliding(w32, sh_start - b0, sh_end - sh_start, murmur_seed)
            else:
                w64 = _words64(data[b0:b1])
                hashes = _murmur64_sliding(w64, sh_start - b0, sh_end - sh_start, murmur_seed)

            f[:] = hashes
            for i in range(n_perm):
                if bit_width == 32:
                    np.multiply(f, a[i], out=p)
                    p += b[i]
                    # x % (2^61-1) without division: x = hi*2^61 + lo =>
                    # x mod M = hi + lo (- M if needed); hi <= 3 here
                    np.right_shift(p, np.uint64(61), out=h)
                    p &= MERSENNE_61
                    p += h
                    np.subtract(p, MERSENNE_61, out=p, where=p >= MERSENNE_61)
                    p &= _HASH_MASK_32
                    sig[d0:d1, i] = np.minimum.reduceat(p, goff)
                else:
                    # full-width operands: split-multiply mod-M61
                    sig[d0:d1, i] = np.minimum.reduceat(
                        _mulmod_m61(f, int(a[i]), int(b[i])), goff
                    )
            d0 = d1
    return sig
