"""Pure-numpy signature kernels (engine-free, unit-tested first).

These run inside Arrow-batched pandas UDFs on executors; no Spark imports
here so they stay trivially serializable and testable.
"""

from .audio import decode_clip, encode_wav_pcm16, energy_vad_segments, estimate_bandwidth, pcm_content_hash, snr_db
from .fingerprint import longest_common_substring_len, winnow_fingerprints
from .minhash import generate_seeds, jaccard_char_shingles, minhash_signatures
from .murmur3 import murmur3_x86_32, murmur3_x86_32_batch
from .simhash import hamming64, simhash64
from .wer import clean_text, word_error_rate_detail

__all__ = [
    "clean_text",
    "decode_clip",
    "encode_wav_pcm16",
    "energy_vad_segments",
    "generate_seeds",
    "hamming64",
    "jaccard_char_shingles",
    "longest_common_substring_len",
    "estimate_bandwidth",
    "minhash_signatures",
    "murmur3_x86_32",
    "murmur3_x86_32_batch",
    "pcm_content_hash",
    "simhash64",
    "snr_db",
    "winnow_fingerprints",
    "word_error_rate_detail",
]
