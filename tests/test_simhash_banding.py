"""Scale-safe SimHash candidate generation: generalized pigeonhole over
band pairs must be EXACT (recall 1.0 vs brute-force hamming)."""

from __future__ import annotations

import numpy as np
import pytest

from curator_spark.operators.simhash_stage import simhash_candidate_pairs


def _hash_df(spark, hashes):
    def signed(h: int) -> int:
        h &= 0xFFFFFFFFFFFFFFFF
        return h - (1 << 64) if h >= (1 << 63) else h

    return spark.createDataFrame(
        [(i, signed(h)) for i, h in enumerate(hashes)],
        "_curator_dedup_id long, _simhash long",
    )


def _brute_pairs(hashes, k):
    out = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            if bin((hashes[i] ^ hashes[j]) & 0xFFFFFFFFFFFFFFFF).count("1") <= k:
                out.add((i, j))
    return out


def _planted_corpus(seed=5, n=120, k=3, planted=25):
    rng = np.random.RandomState(seed)
    hashes = [int(rng.randint(0, 1 << 63)) for _ in range(n)]
    for t in range(planted):
        base = hashes[t]
        flips = rng.choice(64, size=rng.randint(0, k + 1), replace=False)
        h = base
        for f in flips:
            h ^= 1 << int(f)
        hashes.append(h)
    return hashes


@pytest.mark.parametrize("n_bands", [None, 8])
def test_band_pair_exact_recall(spark, n_bands):
    k = 3
    hashes = _planted_corpus(k=k)
    got = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in simhash_candidate_pairs(_hash_df(spark, hashes), k, n_bands=n_bands).collect()
    }
    want = _brute_pairs(hashes, k)
    assert got == want
    assert len(want) >= 25  # the planted pairs are all in the truth set


def test_max_hamming_zero_direct_equality(spark):
    hashes = [7, 7, 9, 7, 1 << 62]
    got = {
        (r.src, r.dst)
        for r in simhash_candidate_pairs(_hash_df(spark, hashes), 0).collect()
    }
    assert got == {(0, 1), (0, 3), (1, 3)}


def test_validation():
    with pytest.raises(ValueError):
        simhash_candidate_pairs(None, -1)
    with pytest.raises(ValueError):
        simhash_candidate_pairs(None, 3, n_bands=4)  # < k + 2
    with pytest.raises(ValueError):
        simhash_candidate_pairs(None, 3, n_bands=65)
