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


def test_minhash_parity():
    data, offsets = _concat(DOCS)
    for n_perm, width in ((16, 5), (64, 24)):
        seeds = generate_seeds(n_perm, seed=42)
        got = minhash_concat(data, offsets, seeds, width)
        want = minhash_signatures(DOCS, seeds, width=width)
        np.testing.assert_array_equal(got, want)


def test_minhash_parity_64bit():
    data, offsets = _concat(DOCS)
    for n_perm, width in ((16, 5), (64, 24)):
        seeds = generate_seeds(n_perm, seed=42, bit_width=64)
        got = minhash_concat(data, offsets, seeds, width, bit_width=64)
        want = minhash_signatures(DOCS, seeds, width=width, bit_width=64)
        assert got.dtype == np.uint64
        np.testing.assert_array_equal(got, want)


def test_minhash_parity_64bit_long_random_docs():
    # byte lengths crossing many 16-byte block counts + odd tails
    rng = np.random.RandomState(7)
    docs = [
        "".join(chr(rng.randint(32, 0x2FF)) for _ in range(rng.randint(0, 120)))
        for _ in range(60)
    ]
    data, offsets = _concat(docs)
    seeds = generate_seeds(8, seed=3, bit_width=64)
    got = minhash_concat(data, offsets, seeds, 24, bit_width=64)
    want = minhash_signatures(docs, seeds, width=24, bit_width=64)
    np.testing.assert_array_equal(got, want)
