"""Parity tests: Arrow-buffer minhash kernel vs the list-of-str kernel."""

from __future__ import annotations

import numpy as np

from curator_spark.kernels.arrowtext import minhash_concat, shingle_hashes_concat
from curator_spark.kernels.minhash import (
    _batch_shingle_hashes,
    generate_seeds,
    minhash_signatures,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "",
    "ab",
    "héllo wörld 🐟 unicode ünïcødé text",
    "x" * 500,
    "the quick brown fox jumps over the lazy dog",  # duplicate
    "word " * 120,
]


def _concat(docs):
    bufs = [d.encode("utf-8") for d in docs]
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    offsets = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum([len(b) for b in bufs], out=offsets[1:])
    return data, offsets


def test_shingle_hashes_parity():
    data, offsets = _concat(DOCS)
    for width in (5, 24):
        got, sh_off = shingle_hashes_concat(data, offsets, width, seed=1234)
        want = _batch_shingle_hashes(DOCS, width, 1234)
        assert len(want) == len(offsets) - 1
        for i, w in enumerate(want):
            g = got[sh_off[i] : sh_off[i + 1]]
            np.testing.assert_array_equal(g, w, err_msg=f"doc {i} width {width}")


def _ref_signatures(docs, seeds, width, bit_width):
    """Independent scalar oracle: python char slicing, the scalar murmur
    reference implementations (themselves pinned by published test
    vectors), and exact int arithmetic mod 2^61-1. minhash_concat and
    minhash_signatures both delegate to the same vectorized kernel, so
    comparing them to each other proves nothing — THIS is the oracle."""
    from curator_spark.kernels.murmur3 import murmur3_x64_128, murmur3_x86_32

    M = (1 << 61) - 1
    base = murmur3_x86_32 if bit_width == 32 else murmur3_x64_128
    seed0 = int(seeds[0][0])
    out = []
    for doc in docs:
        shingles = (
            [doc]
            if len(doc) < width
            else [doc[i : i + width] for i in range(len(doc) - width + 1)]
        )
        hs = [int(base(s.encode("utf-8"), seed0)) for s in shingles]
        sig = []
        for a, b in seeds:
            vals = ((h * int(a) + int(b)) % M for h in hs)
            if bit_width == 32:
                sig.append(min(v & 0xFFFFFFFF for v in vals))
            else:
                sig.append(min(vals))
        out.append(sig)
    return np.array(out, dtype=np.uint32 if bit_width == 32 else np.uint64)


def test_minhash_vs_scalar_reference():
    data, offsets = _concat(DOCS)
    for n_perm, width in ((16, 5), (24, 24)):
        seeds = generate_seeds(n_perm, seed=42)
        want = _ref_signatures(DOCS, seeds, width, 32)
        np.testing.assert_array_equal(minhash_concat(data, offsets, seeds, width), want)
        np.testing.assert_array_equal(minhash_signatures(DOCS, seeds, width=width), want)


def test_minhash_vs_scalar_reference_64bit():
    data, offsets = _concat(DOCS)
    for n_perm, width in ((16, 5), (24, 24)):
        seeds = generate_seeds(n_perm, seed=42, bit_width=64)
        want = _ref_signatures(DOCS, seeds, width, 64)
        got = minhash_concat(data, offsets, seeds, width, bit_width=64)
        assert got.dtype == np.uint64
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(
            minhash_signatures(DOCS, seeds, width=width, bit_width=64), want
        )


def test_minhash_vs_scalar_reference_64bit_long_random_docs():
    # byte lengths crossing many 16-byte block counts + odd tails
    rng = np.random.RandomState(7)
    docs = [
        "".join(chr(rng.randint(32, 0x2FF)) for _ in range(rng.randint(0, 120)))
        for _ in range(25)
    ]
    data, offsets = _concat(docs)
    seeds = generate_seeds(8, seed=3, bit_width=64)
    got = minhash_concat(data, offsets, seeds, 24, bit_width=64)
    np.testing.assert_array_equal(got, _ref_signatures(docs, seeds, 24, 64))
