"""Zero-copy shingle hashing from Arrow string buffers.

The pandas-UDF path materializes every transcript as a Python str and
every signature as a boxed numpy array (1M docs -> 2M+ Python objects per
batch wave). This module works directly on the Arrow layout instead: one
concatenated uint8 data buffer + an int offsets vector per RecordBatch,
shingled and murmur-hashed fully vectorized. Semantics are identical to
kernels.minhash._batch_shingle_hashes (same UTF-8 char-start handling,
same empty-string -> single-empty-shingle convention).
"""

from __future__ import annotations

import numpy as np

from .minhash import _GATHER_BYTES, _HASH_MASK_32, MERSENNE_61
from .murmur3 import murmur3_x86_32_batch


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
    char_pos = np.flatnonzero((data & 0xC0) != 0x80).astype(np.int64)
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
    sh_start = np.where(empty, offsets[:-1][doc_of_sh], bounds[np.minimum(start_char, len(bounds) - 1)])
    sh_end = np.where(empty, offsets[:-1][doc_of_sh], bounds[np.minimum(end_char, len(bounds) - 1)])
    lens = sh_end - sh_start

    # gather + murmur in bounded chunks (see kernels/minhash.py notes on
    # why chunks must stay small on this host)
    hashes = np.empty(total_sh, dtype=np.uint32)
    maxlen_global = int(lens.max()) if total_sh else 0
    chunk_rows = max(1, _GATHER_BYTES // max(maxlen_global, 1))
    for i in range(0, total_sh, chunk_rows):
        j = min(i + chunk_rows, total_sh)
        cl = lens[i:j]
        maxlen = int(cl.max()) if j > i else 0
        mat = np.zeros((j - i, max(maxlen, 1)), dtype=np.uint8)
        cs, ce = sh_start[i:j], sh_end[i:j]
        for p in range(maxlen):
            col = cs + p
            ok = col < ce
            mat[ok, p] = data[col[ok]]
        hashes[i:j] = murmur3_x86_32_batch(mat, cl, seed=seed)
    return hashes, sh_offsets


def minhash_concat(
    data: np.ndarray,
    offsets: np.ndarray,
    seeds: np.ndarray,
    width: int,
) -> np.ndarray:
    """(n_docs, n_perm) uint32 minhash signatures from concatenated UTF-8.

    Same permutation schedule as kernels.minhash.minhash_signatures
    (seeds[:,0]=a, seeds[:,1]=b, murmur seed = seeds[0][0], Mersenne
    prime 2^31-1 modulus, min over unique shingle hashes).
    """
    n_docs = len(offsets) - 1
    n_perm = len(seeds)
    murmur_seed = int(seeds[0][0])
    hashes, sh_off = shingle_hashes_concat(data, offsets, width, murmur_seed)
    a = seeds[:, 0].astype(np.uint64)
    b = seeds[:, 1].astype(np.uint64)

    # unique per doc, concatenated (sort within docs then dedup) — same
    # effect as the per-doc np.unique in minhash_signatures
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), np.diff(sh_off))
    order = np.lexsort((hashes, doc_of))
    srt, sdoc = hashes[order], doc_of[order]
    keep = np.ones(len(srt), dtype=bool)
    keep[1:] = (srt[1:] != srt[:-1]) | (sdoc[1:] != sdoc[:-1])
    uniq = srt[keep].astype(np.uint64)
    ucounts = np.bincount(sdoc[keep], minlength=n_docs)
    uoff = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(ucounts[:-1], out=uoff[1:])

    # identical permute schedule to minhash_signatures (perm-major,
    # mod 2^61-1 via shift-add, 32-bit mask)
    sig = np.empty((n_docs, n_perm), dtype=np.uint32)
    pv = np.empty_like(uniq)
    hb = np.empty_like(uniq)
    with np.errstate(over="ignore"):
        for i in range(n_perm):
            np.multiply(uniq, a[i], out=pv)
            pv += b[i]
            np.right_shift(pv, np.uint64(61), out=hb)
            pv &= MERSENNE_61
            pv += hb
            np.subtract(pv, MERSENNE_61, out=pv, where=pv >= MERSENNE_61)
            pv &= _HASH_MASK_32
            sig[:, i] = np.minimum.reduceat(pv, uoff)
    return sig
