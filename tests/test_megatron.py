"""Megatron .bin/.idx tokenized sink round-trip.

Reference: stages/text/io/writer/megatron_tokenizer.py (byte layout per
Megatron-LM's public indexed_dataset.py). The tokenizer is injected
(fake word-index tokenizer); the byte framing, pointers, dtype
selection, eod append, and commit protocol are verified exactly.
"""

from __future__ import annotations

import glob
import os
import struct

import numpy as np
import pytest

from curator_spark.io.megatron import (
    INDEX_HEADER,
    read_megatron_index,
    write_megatron,
)


def _vocab_tokenizer_local():
    # returned from a factory so cloudpickle ships it by VALUE to workers
    # (a module-level function in a test file pickles by reference and
    # fails to import there); deterministic fake: token id = word length
    def tok(texts):
        return [[len(w) for w in t.split()] for t in texts]
    return tok


def test_round_trip_and_index_layout(spark, tmp_path):
    docs = [("a b cc ddd",), ("hello world",), ("",), ("x",)]
    _vocab_tokenizer = _vocab_tokenizer_local()
    df = spark.createDataFrame(docs, ["text"]).repartition(2)
    out = str(tmp_path / "meg")
    summary = write_megatron(
        df, out, _vocab_tokenizer, vocab_size=1000, tokenization_batch_size=2
    ).collect()
    assert sum(r.num_docs for r in summary) == 4
    # no in-progress temp files survive the commit
    assert not glob.glob(os.path.join(out, ".*inprogress*"))
    got_tokens = []
    for r in sorted(summary, key=lambda r: r.file_prefix):
        parsed = read_megatron_index(r.file_prefix)
        assert parsed["dtype"] is np.uint16  # vocab 1000 -> 2-byte tokens
        # pointers are byte offsets: cumulative sum of 2*length
        expect_ptrs = [0]
        for ln in parsed["lengths"][:-1]:
            expect_ptrs.append(expect_ptrs[-1] + 2 * ln)
        assert parsed["pointers"] == expect_ptrs
        assert parsed["doc_indices"] == list(range(len(parsed["lengths"]) + 1))
        assert r.num_tokens == sum(parsed["lengths"])
        got_tokens.extend(tuple(t) for t in parsed["tokens"])
    want = [tuple(toks) for toks in _vocab_tokenizer([d[0] for d in docs])]
    assert sorted(got_tokens) == sorted(tuple(t) for t in want)
    # raw header sanity straight off the bytes
    first = sorted(summary, key=lambda r: r.file_prefix)[0].file_prefix
    with open(first + ".idx", "rb") as f:
        assert f.read(9) == INDEX_HEADER
        assert struct.unpack("<Q", f.read(8))[0] == 1
        assert struct.unpack("<B", f.read(1))[0] == 8  # uint16 dtype code


def test_eod_append_and_int32_dtype(spark, tmp_path):
    _vocab_tokenizer = _vocab_tokenizer_local()
    df = spark.createDataFrame([("a bb",)], ["text"]).coalesce(1)
    out = str(tmp_path / "meg32")
    summary = write_megatron(
        df, out, _vocab_tokenizer, vocab_size=100_000,
        append_eod=True, eod_token_id=70_000,
    ).collect()
    parsed = read_megatron_index(summary[0].file_prefix)
    assert parsed["dtype"] is np.int32  # vocab > 65536 -> 4-byte tokens
    assert parsed["tokens"] == [[1, 2, 70_000]]
    with open(summary[0].file_prefix + ".idx", "rb") as f:
        f.read(17)
        assert f.read(1) == bytes([4])  # int32 dtype code


def test_seam_and_validation(spark, tmp_path):
    _vocab_tokenizer = _vocab_tokenizer_local()
    df = spark.createDataFrame([("x",)], ["text"])
    with pytest.raises(NotImplementedError, match="tokenizer"):
        write_megatron(df, str(tmp_path / "o"), None, vocab_size=10)
    with pytest.raises(ValueError, match="eod_token_id"):
        write_megatron(
            df, str(tmp_path / "o"), _vocab_tokenizer, vocab_size=10,
            append_eod=True,
        )
