"""Vectorized MurmurHash3_x86_32 (numpy) + scalar reference.

MurmurHash3 is public domain (Austin Appleby). The reference dedup stack
hashes every character shingle with MurmurHash3_x86_32 via cuDF
``str.minhash`` (see /root/reference/nemo_curator/stages/deduplication/
fuzzy/minhash.py:131-142); we reproduce the same hash here CPU-side so
signatures are comparable.

The vectorized variant hashes a *batch* of byte strings laid out in a
right-padded ``(n, max_len) uint8`` matrix with a per-row length vector.
It loops over 4-byte block indices (max_len/4 iterations) but is fully
vectorized across rows, which is what makes Arrow-batched minhashing
fast without per-row Python.
"""

from __future__ import annotations

import sys

import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_M5 = np.uint32(5)
_N = np.uint32(0xE6546B64)

_U32 = np.uint32


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U32(r)) | (x >> _U32(32 - r))


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Scalar reference implementation (used only in tests)."""
    length = len(data)
    nblocks = length // 4
    with np.errstate(over="ignore"):
        h1 = _U32(seed)
        for i in range(nblocks):
            k1 = _U32(int.from_bytes(data[i * 4 : i * 4 + 4], "little"))
            k1 = _U32(k1 * _C1)
            k1 = _rotl32(k1, 15)
            k1 = _U32(k1 * _C2)
            h1 = _U32(h1 ^ k1)
            h1 = _rotl32(h1, 13)
            h1 = _U32(h1 * _M5 + _N)
        k1 = _U32(0)
        tail = data[nblocks * 4 :]
        if len(tail) >= 3:
            k1 = _U32(k1 ^ _U32(tail[2]) << _U32(16))
        if len(tail) >= 2:
            k1 = _U32(k1 ^ _U32(tail[1]) << _U32(8))
        if len(tail) >= 1:
            k1 = _U32(k1 ^ _U32(tail[0]))
            k1 = _U32(k1 * _C1)
            k1 = _rotl32(k1, 15)
            k1 = _U32(k1 * _C2)
            h1 = _U32(h1 ^ k1)
        h1 = _U32(h1 ^ _U32(length))
        h1 = _U32(h1 ^ (h1 >> _U32(16)))
        h1 = _U32(h1 * _U32(0x85EBCA6B))
        h1 = _U32(h1 ^ (h1 >> _U32(13)))
        h1 = _U32(h1 * _U32(0xC2B2AE35))
        h1 = _U32(h1 ^ (h1 >> _U32(16)))
    return int(h1)


_U64 = np.uint64
_C1_64 = _U64(0x87C37B91114253D5)
_C2_64 = _U64(0x4CF5AD432745937F)
_F1_64 = _U64(0xFF51AFD7ED558CCD)
_F2_64 = _U64(0xC4CEB9FE1A85EC53)


def _rotl64(x, r: int):
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fmix64(k):
    k ^= k >> _U64(33)
    k *= _F1_64
    k ^= k >> _U64(33)
    k *= _F2_64
    k ^= k >> _U64(33)
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> int:
    """Scalar MurmurHash3_x64_128, first 64 bits (public domain, Austin
    Appleby) — the base hash of cuDF ``str.minhash64`` which the reference
    uses when ``use_64bit_hash=True`` (fuzzy/minhash.py:144-155). Test
    reference for the vectorized batch below."""
    length = len(data)
    nblocks = length // 16
    with np.errstate(over="ignore"):
        h1 = _U64(seed)
        h2 = _U64(seed)
        for i in range(nblocks):
            k1 = _U64(int.from_bytes(data[i * 16 : i * 16 + 8], "little"))
            k2 = _U64(int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little"))
            k1 = _U64(k1 * _C1_64); k1 = _rotl64(k1, 31); k1 = _U64(k1 * _C2_64)
            h1 = _U64(h1 ^ k1); h1 = _rotl64(h1, 27); h1 = _U64(h1 + h2)
            h1 = _U64(h1 * _U64(5) + _U64(0x52DCE729))
            k2 = _U64(k2 * _C2_64); k2 = _rotl64(k2, 33); k2 = _U64(k2 * _C1_64)
            h2 = _U64(h2 ^ k2); h2 = _rotl64(h2, 31); h2 = _U64(h2 + h1)
            h2 = _U64(h2 * _U64(5) + _U64(0x38495AB5))
        tail = data[nblocks * 16 :]
        k1 = _U64(0)
        k2 = _U64(0)
        for i in range(len(tail) - 1, 7, -1):  # bytes 8..14 -> k2
            k2 = _U64(k2 ^ (_U64(tail[i]) << _U64((i - 8) * 8)))
        if len(tail) > 8:
            k2 = _U64(k2 * _C2_64); k2 = _rotl64(k2, 33); k2 = _U64(k2 * _C1_64)
            h2 = _U64(h2 ^ k2)
        for i in range(min(len(tail), 8) - 1, -1, -1):  # bytes 0..7 -> k1
            k1 = _U64(k1 ^ (_U64(tail[i]) << _U64(i * 8)))
        if len(tail) > 0:
            k1 = _U64(k1 * _C1_64); k1 = _rotl64(k1, 31); k1 = _U64(k1 * _C2_64)
            h1 = _U64(h1 ^ k1)
        h1 = _U64(h1 ^ _U64(length)); h2 = _U64(h2 ^ _U64(length))
        h1 = _U64(h1 + h2); h2 = _U64(h2 + h1)
        h1 = _fmix64(h1); h2 = _fmix64(h2)
        h1 = _U64(h1 + h2)
    return int(h1)


def murmur3_x64_128_batch(mat: np.ndarray, lengths: np.ndarray, seed: int = 0) -> np.ndarray:
    """First 64 bits of MurmurHash3_x64_128 for ``n`` byte strings at once
    (same layout contract as murmur3_x86_32_batch). Vectorized across rows;
    loops over 16-byte block positions."""
    n, max_len = mat.shape
    lengths = lengths.astype(np.int64)
    nblocks = lengths // 16
    max_blocks = int(max_len) // 16

    with np.errstate(over="ignore"):
        h1 = np.full(n, _U64(seed), dtype=np.uint64)
        h2 = np.full(n, _U64(seed), dtype=np.uint64)
        if max_blocks:
            # two little-endian 8-byte lanes per 16-byte block position
            w = np.zeros((n, max_blocks * 2), dtype=np.uint64)
            for byte in range(8):
                w |= mat[:, byte : max_blocks * 16 : 8].astype(np.uint64) << _U64(byte * 8)
            for b in range(max_blocks):
                active = nblocks > b
                if not active.any():
                    break
                k1 = w[:, 2 * b] * _C1_64
                k1 = _rotl64(k1, 31)
                k1 *= _C2_64
                h1n = h1 ^ k1
                h1n = _rotl64(h1n, 27) + h2
                h1n = h1n * _U64(5) + _U64(0x52DCE729)
                k2 = w[:, 2 * b + 1] * _C2_64
                k2 = _rotl64(k2, 33)
                k2 *= _C1_64
                h2n = h2 ^ k2
                h2n = _rotl64(h2n, 31) + h1n
                h2n = h2n * _U64(5) + _U64(0x38495AB5)
                h1 = np.where(active, h1n, h1)
                h2 = np.where(active, h2n, h2)

        # tail (0-15 trailing bytes)
        tail_len = (lengths % 16).astype(np.int64)
        tail_start = nblocks * 16
        idx = np.arange(n)
        k1 = np.zeros(n, dtype=np.uint64)
        k2 = np.zeros(n, dtype=np.uint64)
        for byte in range(8, 15):
            m = tail_len > byte
            if m.any():
                k2[m] ^= mat[idx[m], tail_start[m] + byte].astype(np.uint64) << _U64((byte - 8) * 8)
        m2 = tail_len > 8
        if m2.any():
            kk = k2 * _C2_64
            kk = _rotl64(kk, 33)
            kk *= _C1_64
            h2 = np.where(m2, h2 ^ kk, h2)
        for byte in range(8):
            m = tail_len > byte
            if m.any():
                k1[m] ^= mat[idx[m], tail_start[m] + byte].astype(np.uint64) << _U64(byte * 8)
        m1 = tail_len > 0
        if m1.any():
            kk = k1 * _C1_64
            kk = _rotl64(kk, 31)
            kk *= _C2_64
            h1 = np.where(m1, h1 ^ kk, h1)

        h1 ^= lengths.astype(np.uint64)
        h2 ^= lengths.astype(np.uint64)
        h1 += h2
        h2 += h1
        h1 = _fmix64(h1)
        h2 = _fmix64(h2)
        h1 += h2
    return h1


def murmur3_x86_32_batch(mat: np.ndarray, lengths: np.ndarray, seed: int = 0) -> np.ndarray:
    """MurmurHash3_x86_32 of ``n`` byte strings at once.

    mat:     (n, max_len) uint8, right-padded with zeros.
    lengths: (n,) int — true byte length of each row.
    Returns (n,) uint32.
    """
    n, max_len = mat.shape
    lengths = lengths.astype(np.int64)
    nblocks = lengths // 4
    max_blocks = int(max_len) // 4

    with np.errstate(over="ignore"):
        h1 = np.full(n, _U32(seed), dtype=np.uint32)
        if max_blocks:
            # little-endian 4-byte words for every block position
            words = (
                mat[:, 0 : max_blocks * 4 : 4].astype(np.uint32)
                | (mat[:, 1 : max_blocks * 4 : 4].astype(np.uint32) << _U32(8))
                | (mat[:, 2 : max_blocks * 4 : 4].astype(np.uint32) << _U32(16))
                | (mat[:, 3 : max_blocks * 4 : 4].astype(np.uint32) << _U32(24))
            )
            for b in range(max_blocks):
                active = nblocks > b
                if not active.any():
                    break
                k1 = words[:, b] * _C1
                k1 = _rotl32(k1, 15)
                k1 *= _C2
                h1n = h1 ^ k1
                h1n = _rotl32(h1n, 13)
                h1n = h1n * _M5 + _N
                h1 = np.where(active, h1n, h1)

        # tail (0-3 trailing bytes)
        tail_len = (lengths % 4).astype(np.int64)
        tail_start = nblocks * 4
        k1 = np.zeros(n, dtype=np.uint32)
        idx = np.arange(n)
        has3 = tail_len == 3
        has2 = tail_len >= 2
        has1 = tail_len >= 1
        if has3.any():
            k1[has3] ^= mat[idx[has3], tail_start[has3] + 2].astype(np.uint32) << _U32(16)
        if has2.any():
            k1[has2] ^= mat[idx[has2], tail_start[has2] + 1].astype(np.uint32) << _U32(8)
        if has1.any():
            k1[has1] ^= mat[idx[has1], tail_start[has1]].astype(np.uint32)
            kk = k1 * _C1
            kk = _rotl32(kk, 15)
            kk *= _C2
            h1 = np.where(has1, h1 ^ kk, h1)

        h1 ^= lengths.astype(np.uint32)
        h1 ^= h1 >> _U32(16)
        h1 *= _U32(0x85EBCA6B)
        h1 ^= h1 >> _U32(13)
        h1 *= _U32(0xC2B2AE35)
        h1 ^= h1 >> _U32(16)
    return h1


def murmur3_x86_32_fixed(mat: np.ndarray, length: int, seed: int = 0) -> np.ndarray:
    """MurmurHash3_x86_32 of ``n`` byte strings that all share ONE length.

    mat: (n, length) uint8, C-contiguous. Bit-identical to
    ``murmur3_x86_32_batch(mat, full(n, length))`` but with every
    per-row mask / ``np.where`` select dropped (uniform rows are all
    active in every block) and the 4-byte little-endian words read as a
    single ``uint32`` view instead of four shifted ``astype`` columns.
    This is the hot call of the ASCII minhash fast path, where every
    character shingle is exactly ``width`` bytes.
    """
    n = mat.shape[0]
    nblocks = length // 4
    with np.errstate(over="ignore"):
        h1 = np.full(n, _U32(seed), dtype=np.uint32)
        if nblocks:
            if sys.byteorder == "little":
                words = np.ascontiguousarray(mat[:, : nblocks * 4]).view(np.uint32)
            else:  # murmur words are little-endian regardless of host
                words = (
                    mat[:, 0 : nblocks * 4 : 4].astype(np.uint32)
                    | (mat[:, 1 : nblocks * 4 : 4].astype(np.uint32) << _U32(8))
                    | (mat[:, 2 : nblocks * 4 : 4].astype(np.uint32) << _U32(16))
                    | (mat[:, 3 : nblocks * 4 : 4].astype(np.uint32) << _U32(24))
                )
            for b in range(nblocks):
                k1 = words[:, b] * _C1
                k1 = _rotl32(k1, 15)
                k1 *= _C2
                h1 ^= k1
                h1 = _rotl32(h1, 13)
                h1 = h1 * _M5 + _N
        tail = length % 4
        if tail:
            k1 = np.zeros(n, dtype=np.uint32)
            if tail == 3:
                k1 ^= mat[:, nblocks * 4 + 2].astype(np.uint32) << _U32(16)
            if tail >= 2:
                k1 ^= mat[:, nblocks * 4 + 1].astype(np.uint32) << _U32(8)
            k1 ^= mat[:, nblocks * 4].astype(np.uint32)
            k1 *= _C1
            k1 = _rotl32(k1, 15)
            k1 *= _C2
            h1 ^= k1
        h1 ^= _U32(length)
        h1 ^= h1 >> _U32(16)
        h1 *= _U32(0x85EBCA6B)
        h1 ^= h1 >> _U32(13)
        h1 *= _U32(0xC2B2AE35)
        h1 ^= h1 >> _U32(16)
    return h1
