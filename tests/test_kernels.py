"""Kernel unit tests — mirror the reference's minhash/lsh fixture strategy
(tests/stages/deduplication/fuzzy/test_minhash.py) plus murmur3 test
vectors and audio/suffix-array invariants."""

from __future__ import annotations

import numpy as np
import pytest

from curator_spark.kernels import (
    decode_clip,
    encode_wav_pcm16,
    generate_seeds,
    hamming64,
    jaccard_char_shingles,
    longest_common_substring_len,
    minhash_signatures,
    murmur3_x86_32,
    murmur3_x86_32_batch,
    pcm_content_hash,
    simhash64,
    snr_db,
    winnow_fingerprints,
)

# 5-doc corpus from the reference minhash/workflow tests
# (test_minhash.py:51-65, test_fuzzy_workflow.py:74-94)
CORPUS = [
    "A test string",
    "A different test string",
    "A different object",
    "The quick brown fox jumps over the lazy dog",
    "The quick black cat jumps over the lazy dog",
]


class TestMurmur3:
    # published MurmurHash3_x86_32 test vectors
    VECTORS = [
        (b"", 0, 0),
        (b"", 1, 0x514E28B7),
        (b"", 0xFFFFFFFF, 0x81F16F39),
        (b"hello", 0, 0x248BFA47),
        (b"hello, world", 0, 0x149BBB7F),
        (b"The quick brown fox jumps over the lazy dog", 0x9747B28C, 0x2FA826CD),
        (b"abc", 0, 0xB3DD93FA),
    ]

    def test_scalar_vectors(self):
        for data, seed, expect in self.VECTORS:
            assert murmur3_x86_32(data, seed) == expect, data

    def test_batch_matches_scalar(self):
        rng = np.random.RandomState(0)
        blobs = [bytes(rng.randint(0, 256, size=rng.randint(0, 40), dtype=np.uint8)) for _ in range(200)]
        maxlen = max(max(len(b) for b in blobs), 1)
        mat = np.zeros((len(blobs), maxlen), dtype=np.uint8)
        lens = np.zeros(len(blobs), dtype=np.int64)
        for i, b in enumerate(blobs):
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
            lens[i] = len(b)
        got = murmur3_x86_32_batch(mat, lens, seed=42)
        want = np.array([murmur3_x86_32(b, 42) for b in blobs], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_fixed_matches_scalar_all_tail_lengths(self):
        from curator_spark.kernels.murmur3 import murmur3_x86_32_fixed

        rng = np.random.RandomState(1)
        for length in range(1, 30):  # covers every (nblocks, tail) combo
            mat = rng.randint(0, 256, size=(64, length), dtype=np.uint8)
            got = murmur3_x86_32_fixed(mat, length, seed=42)
            want = np.array(
                [murmur3_x86_32(bytes(row), 42) for row in mat], dtype=np.uint32
            )
            np.testing.assert_array_equal(got, want, err_msg=f"length={length}")


class TestMinHash:
    def test_seed_schedule_reference_shape(self):
        # fuzzy/minhash.py:103-129 — a in [1,P), b in [0,P), u32
        seeds = generate_seeds(260, seed=42, bit_width=32)
        assert seeds.shape == (260, 2)
        assert seeds.dtype == np.uint32
        assert seeds[:, 0].min() >= 1
        assert seeds.max() < (1 << 31) - 1
        # deterministic across calls
        np.testing.assert_array_equal(seeds, generate_seeds(260, seed=42, bit_width=32))

    def test_signature_shape_and_determinism(self):
        seeds = generate_seeds(260, seed=42)
        s1 = minhash_signatures(CORPUS, seeds, width=24)
        s2 = minhash_signatures(list(CORPUS), seeds, width=24)
        assert s1.shape == (5, 260)
        np.testing.assert_array_equal(s1, s2)

    def test_jaccard_approximation_bound(self):
        # reference test_minhash.py:115-151 — minhash estimate within 0.15
        # of exact char-shingle Jaccard for all corpus pairs
        seeds = generate_seeds(260, seed=42)
        for width in (5, 10):
            sigs = minhash_signatures(CORPUS, seeds, width=width)
            for i in range(len(CORPUS)):
                for j in range(i + 1, len(CORPUS)):
                    est = float(np.mean(sigs[i] == sigs[j]))
                    exact = jaccard_char_shingles(CORPUS[i], CORPUS[j], width)
                    assert abs(est - exact) <= 0.15, (i, j, width, est, exact)

    def test_ascii_fast_path_matches_generic(self):
        # the ASCII strided-gather path must be byte-for-byte the generic
        # masked-gather path on every doc it claims (pure ASCII, >= width
        # chars); mixed corpora route per doc, so signatures of a mixed
        # batch must equal the concatenation of per-path results
        from curator_spark.kernels.minhash import (
            _batch_shingle_hashes,
            _generic_shingle_hashes,
        )

        rng = np.random.RandomState(3)
        docs = []
        for i in range(120):
            n = int(rng.randint(0, 200))
            chars = [chr(int(c)) for c in rng.randint(32, 127, size=n)]
            if i % 4 == 0 and n:  # sprinkle multi-byte chars into some docs
                chars[int(rng.randint(0, n))] = "漢"
            docs.append("".join(chars))
        for width in (3, 24):
            for bit_width in (32, 64):
                got = _batch_shingle_hashes(docs, width, 1234, bit_width=bit_width)
                bufs = [np.frombuffer(t.encode("utf-8"), dtype=np.uint8) for t in docs]
                want: list = [None] * len(docs)
                _generic_shingle_hashes(
                    bufs, list(range(len(docs))), width, 1234, bit_width, want
                )
                for k in range(len(docs)):
                    np.testing.assert_array_equal(
                        got[k], want[k], err_msg=f"doc={k} width={width} bw={bit_width}"
                    )

    def test_short_and_empty_strings(self):
        seeds = generate_seeds(16, seed=42)
        sigs = minhash_signatures(["", "ab", "ab", "ba"], seeds, width=24)
        np.testing.assert_array_equal(sigs[1], sigs[2])  # identical shorts agree
        assert (sigs[1] != sigs[3]).any()

    def test_unicode(self):
        seeds = generate_seeds(16, seed=42)
        sigs = minhash_signatures(["héllo wörld ünïcode", "héllo wörld ünïcode"], seeds, width=5)
        np.testing.assert_array_equal(sigs[0], sigs[1])


class TestSimHash:
    def test_identical_zero_distance(self):
        h = simhash64([CORPUS[0], CORPUS[0]], width=5)
        assert hamming64(h[:1], h[1:])[0] == 0

    def test_similar_closer_than_dissimilar(self):
        h = simhash64(CORPUS, width=5)
        d_similar = hamming64(h[3:4], h[4:5])[0]  # quick brown fox vs black cat
        d_diff = hamming64(h[0:1], h[3:4])[0]  # test string vs fox
        assert d_similar < d_diff

    def test_deterministic(self):
        np.testing.assert_array_equal(simhash64(CORPUS), simhash64(CORPUS))


class TestAudio:
    def test_wav_roundtrip(self):
        rng = np.random.RandomState(42)
        samples = (rng.rand(16000) * 1.6 - 0.8).astype(np.float32)
        raw = encode_wav_pcm16(samples, 16000)
        dec, sr = decode_clip(raw, "pcm_s16le")
        assert sr == 16000
        assert snr_db(samples, dec) >= 30.0  # input_hint invariant bound

    def test_content_hash_framing_invariant(self):
        samples = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.5
        raw1 = encode_wav_pcm16(samples, 16000)
        # same PCM, extra RIFF chunk before data (different container bytes)
        import struct

        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        raw2 = raw1[:12] + extra + raw1[12:]
        assert raw1 != raw2
        assert pcm_content_hash(raw1, "pcm_s16le") == pcm_content_hash(raw2, "pcm_s16le")

    def test_unsupported_codec_stubbed(self):
        with pytest.raises(NotImplementedError):
            decode_clip(b"\x00" * 64, "opus")


class TestSubstring:
    def test_winnowing_guarantee(self):
        # docs sharing a >=L-char substring share a fingerprint
        shared = "x" * 0 + "the quick brown fox jumps over the lazy dog near the river bank"
        a = "PREFIX-A " + shared + " SUFFIX-A"
        b = "completely different start " + shared + " and end"
        fa = winnow_fingerprints(a, k=25, w=26)
        fb = winnow_fingerprints(b, k=25, w=26)
        assert len(np.intersect1d(fa, fb)) > 0

    def test_no_false_negative_only(self):
        fa = winnow_fingerprints("a" * 10, k=25, w=26)
        assert len(fa) == 0  # too short to contain an L-char substring

    def test_lcs_lengths(self):
        assert longest_common_substring_len("abcdef", "zzabcdzz") == 4
        assert longest_common_substring_len("hello", "hello") == 5
        assert longest_common_substring_len("abc", "xyz") == 0
        assert longest_common_substring_len("", "abc") == 0
        # containment fast path
        assert longest_common_substring_len("bcd", "abcde") == 3
        # content NUL bytes must not let a match run ACROSS the
        # suffix-array separator (overstating the LCS)
        assert longest_common_substring_len("qcd", "cd\x00zz") == 2
        # ...while a NUL genuinely shared by both strings still counts
        assert longest_common_substring_len("qa\x00bq", "xa\x00by") == 3

    def test_lcs_random_vs_bruteforce(self):
        rng = np.random.RandomState(1)
        alpha = "abcd"
        for _ in range(25):
            a = "".join(rng.choice(list(alpha)) for _ in range(rng.randint(1, 30)))
            b = "".join(rng.choice(list(alpha)) for _ in range(rng.randint(1, 30)))
            brute = 0
            for i in range(len(a)):
                for j in range(i + 1, len(a) + 1):
                    if a[i:j] in b:
                        brute = max(brute, j - i)
            assert longest_common_substring_len(a, b) == brute, (a, b)


class TestMinHash64:
    """use_64bit_hash parity path (fuzzy/minhash.py:144-155)."""

    def test_murmur_x64_scalar_vs_batch_all_tail_lengths(self):
        from curator_spark.kernels.murmur3 import murmur3_x64_128, murmur3_x64_128_batch

        rng = np.random.RandomState(9)
        blobs = [bytes(rng.randint(0, 256, size=n, dtype=np.uint8)) for n in range(0, 40)]
        blobs += [bytes(rng.randint(0, 256, size=n, dtype=np.uint8)) for n in (100, 1000)]
        maxlen = max(len(b) for b in blobs)
        mat = np.zeros((len(blobs), maxlen), dtype=np.uint8)
        lens = np.zeros(len(blobs), dtype=np.int64)
        for i, b in enumerate(blobs):
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
            lens[i] = len(b)
        got = murmur3_x64_128_batch(mat, lens, seed=42)
        want = np.array([murmur3_x64_128(b, 42) for b in blobs], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)
        # empty string, seed 0: canonical all-zero 128-bit hash => h1 == 0
        assert murmur3_x64_128(b"", 0) == 0

    def test_mulmod_m61_vs_bigint(self):
        from curator_spark.kernels.minhash import _mulmod_m61

        M = (1 << 61) - 1
        rng = np.random.RandomState(4)
        h = rng.randint(0, 1 << 63, size=200, dtype=np.int64).astype(np.uint64) * np.uint64(2)
        h += rng.randint(0, 2, size=200).astype(np.uint64)  # full 64-bit range
        for _ in range(10):
            a = int(rng.randint(1, M, dtype=np.uint64))
            b = int(rng.randint(0, M, dtype=np.uint64))
            got = _mulmod_m61(h, a, b)
            want = np.array([(int(x) * a + b) % M for x in h], dtype=np.uint64)
            np.testing.assert_array_equal(got, want)

    def test_seed_schedule_64(self):
        seeds = generate_seeds(16, seed=42, bit_width=64)
        assert seeds.dtype == np.uint64
        assert seeds[:, 0].min() >= 1
        assert int(seeds.max()) < (1 << 61) - 1

    def test_jaccard_approximation_bound_64(self):
        # mirrors the 32-bit bound test with use_64bit_hash semantics
        seeds = generate_seeds(260, seed=42, bit_width=64)
        for width in (5, 10):
            sigs = minhash_signatures(CORPUS, seeds, width=width, bit_width=64)
            assert sigs.dtype == np.uint64
            assert int(sigs.max()) < (1 << 61) - 1
            for i in range(len(CORPUS)):
                for j in range(i + 1, len(CORPUS)):
                    est = float(np.mean(sigs[i] == sigs[j]))
                    exact = jaccard_char_shingles(CORPUS[i], CORPUS[j], width)
                    assert abs(est - exact) <= 0.15, (i, j, width, est, exact)

    def test_64bit_determinism_and_distinct_from_32(self):
        seeds64 = generate_seeds(16, seed=42, bit_width=64)
        s1 = minhash_signatures(CORPUS, seeds64, width=10, bit_width=64)
        s2 = minhash_signatures(list(CORPUS), seeds64, width=10, bit_width=64)
        np.testing.assert_array_equal(s1, s2)
        seeds32 = generate_seeds(16, seed=42, bit_width=32)
        s32 = minhash_signatures(CORPUS, seeds32, width=10, bit_width=32)
        assert (s1.astype(np.uint64) != s32.astype(np.uint64)).any()


def test_vad_padding_never_overlaps():
    """ADVICE r03: padding must split the silence gap (Silero's
    silence//2-per-side rule) instead of applying speech_pad_ms
    unconditionally — segments separated by a gap between min_interval_ms
    and 2*speech_pad_ms, and max_duration split chunks (gap 0), must not
    overlap."""
    import numpy as np

    from curator_spark.kernels.audio import energy_vad_segments

    sr = 16000

    def tone(sec, f=440, amp=0.5):
        t = np.arange(int(sr * sec)) / sr
        return amp * np.sin(2 * np.pi * f * t)

    sil = lambda sec: np.zeros(int(sr * sec))  # noqa: E731

    # gap 0.55s: > min_interval (0.5s, no merge) but < 2*pad (0.6s) —
    # unconditional 300ms padding would overlap by 50ms
    near = np.concatenate([sil(1), tone(3), sil(0.55), tone(3), sil(1)])
    segs = energy_vad_segments(near, sr)
    assert len(segs) == 2
    assert segs[0][1] <= segs[1][0], segs
    # each side got ~gap//2 of padding, not the full 300ms
    gap = segs[1][0] - segs[0][1]
    assert 0 <= gap <= 60, segs

    # max_duration split: chunks share a boundary (gap 0) -> no overlap,
    # and outer edges still get the full pad
    long = np.concatenate([sil(1), tone(5), sil(1)])
    chunks = energy_vad_segments(long, sr, max_duration_sec=2.0, min_duration_sec=0.5)
    assert len(chunks) >= 2
    for a, b in zip(chunks, chunks[1:]):
        assert a[1] <= b[0], chunks
    assert chunks[0][0] <= 750  # leading pad survives (1000ms sil - 300ms pad)

    # far-apart segments keep the full symmetric pad (regression guard)
    far = np.concatenate([sil(1), tone(3), sil(2), tone(3), sil(1)])
    fsegs = energy_vad_segments(far, sr)
    assert len(fsegs) == 2
    assert fsegs[0][1] - fsegs[1][0] < 0
    assert abs(fsegs[0][0] - 700) <= 60 and abs(fsegs[0][1] - 4300) <= 60
