"""Megatron-ready tokenized dataset sink (.bin token stream + .idx index).

Reference: ``stages/text/io/writer/megatron_tokenizer.py`` (the whole
stage, 24-254) — tokenize each document and write Megatron-LM's indexed
dataset layout, the standard pretraining input format. The byte layout
is Megatron-LM's public ``indexed_dataset.py`` contract (cited at
megatron_tokenizer.py:121): ``MMIDIDX\\x00\\x00`` header, version 1, a
dtype code byte (8 = uint16, 4 = int32), sequence count, document
count, int32 sequence lengths, int64 byte pointers, int64 document
indices (``arange(n_seqs + 1)``).

Spark-first shape: one ``(prefix, .bin, .idx)`` pair per PARTITION,
written inside the task with the tar-shard commit protocol (hidden temp
names, atomic rename on success — a retried/speculative attempt
re-derives the same final name, so readers never see partials or
duplicates); the returned summary is one small row per partition. The
HF tokenizer is an injected callable (``list[str] -> list[list[int]]``,
the convention shared with TokenCountFilter / token_splitter) — the
transformers stack is not in this environment. Token dtype follows the
reference: uint16 when ``vocab_size`` fits 16 bits, else int32.
"""

from __future__ import annotations

import os
import struct
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

INDEX_HEADER = b"MMIDIDX\x00\x00"

SUMMARY_SCHEMA = (
    "file_prefix string, num_docs long, num_tokens long, token_size int"
)


def write_megatron(
    df: DataFrame,
    out_dir: str,
    tokenizer,
    vocab_size: int,
    text_field: str = "text",
    append_eod: bool = False,
    eod_token_id: int | None = None,
    prefix: str = "part",
    tokenization_batch_size: int = 1000,
) -> DataFrame:
    """Tokenize ``text_field`` and write one Megatron ``.bin``/``.idx``
    pair per partition under ``out_dir``; returns the per-partition
    summary (small eager action). ``append_eod`` appends
    ``eod_token_id`` to every document (megatron_tokenizer.py:181-184;
    required when set, matching the reference's disable-on-missing-eos
    fallback)."""
    if tokenizer is None:
        raise NotImplementedError(
            "write_megatron needs an injected tokenizer callable "
            "(e.g. an HF AutoTokenizer's batch encode) — the transformers "
            "stack is not available in this environment"
        )
    if append_eod and eod_token_id is None:
        raise ValueError("append_eod=True requires eod_token_id")
    token_dtype = np.uint16 if vocab_size <= np.iinfo(np.uint16).max + 1 else np.int32
    token_size = 2 if token_dtype is np.uint16 else 4
    dtype_code = 8 if token_size == 2 else 4  # Megatron-LM dtype codes
    os.makedirs(out_dir, exist_ok=True)
    slim = df.select(text_field)

    def run(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        file_prefix = os.path.join(out_dir, f"{prefix}-{pid:05d}")
        tmp_tag = uuid.uuid4().hex
        tmp_bin = os.path.join(out_dir, f".{prefix}-{pid:05d}.bin.inprogress-{tmp_tag}")
        tmp_idx = os.path.join(out_dir, f".{prefix}-{pid:05d}.idx.inprogress-{tmp_tag}")
        seq_lengths: list = []
        bin_file = None
        for pdf in batches:
            texts = pdf[text_field].tolist()
            if not texts:
                continue
            if bin_file is None:
                bin_file = open(tmp_bin, "wb")
            for lo in range(0, len(texts), tokenization_batch_size):
                tokens_batch = tokenizer(
                    [t if t is not None else "" for t in texts[lo : lo + tokenization_batch_size]]
                )
                if append_eod:
                    tokens_batch = [[*toks, eod_token_id] for toks in tokens_batch]
                seq_lengths.extend(len(toks) for toks in tokens_batch)
                flat = np.concatenate(
                    [np.asarray(toks, dtype=token_dtype) for toks in tokens_batch]
                ) if tokens_batch else np.array([], dtype=token_dtype)
                bin_file.write(flat.tobytes(order="C"))
        if bin_file is None:
            yield pd.DataFrame(
                [], columns=["file_prefix", "num_docs", "num_tokens", "token_size"]
            )
            return
        bin_file.close()
        lengths = np.asarray(seq_lengths, dtype=np.int32)
        pointers = np.zeros(len(lengths), dtype=np.int64)
        np.cumsum(lengths[:-1].astype(np.int64) * token_size, out=pointers[1:])
        with open(tmp_idx, "wb") as idx:
            idx.write(INDEX_HEADER)
            idx.write(struct.pack("<Q", 1))
            idx.write(struct.pack("<B", dtype_code))
            idx.write(struct.pack("<Q", len(lengths)))
            # the reference (and Megatron's _IndexWriter) records
            # len(document_indices) == n_seqs + 1 here
            idx.write(struct.pack("<Q", len(lengths) + 1))
            idx.write(lengths.tobytes(order="C"))
            idx.write(pointers.tobytes(order="C"))
            idx.write(np.arange(len(lengths) + 1, dtype=np.int64).tobytes(order="C"))
        os.replace(tmp_bin, file_prefix + ".bin")
        os.replace(tmp_idx, file_prefix + ".idx")
        yield pd.DataFrame(
            [
                {
                    "file_prefix": file_prefix,
                    "num_docs": len(lengths),
                    "num_tokens": int(lengths.sum()),
                    "token_size": token_size,
                }
            ]
        )

    return slim.mapInPandas(run, schema=SUMMARY_SCHEMA).localCheckpoint()


def read_megatron_index(file_prefix: str) -> dict:
    """Parse a ``.idx``/``.bin`` pair back into
    ``{dtype, lengths, pointers, doc_indices, tokens}`` — the
    verification-side reader used by the round-trip tests (pure python,
    no Megatron dependency)."""
    with open(file_prefix + ".idx", "rb") as f:
        header = f.read(9)
        if header != INDEX_HEADER:
            raise ValueError(f"bad index header {header!r}")
        (version,) = struct.unpack("<Q", f.read(8))
        if version != 1:
            raise ValueError(f"unsupported index version {version}")
        (code,) = struct.unpack("<B", f.read(1))
        dtype = {8: np.uint16, 4: np.int32}[code]
        (n_seq,) = struct.unpack("<Q", f.read(8))
        (n_doc,) = struct.unpack("<Q", f.read(8))
        lengths = np.frombuffer(f.read(4 * n_seq), dtype=np.int32)
        pointers = np.frombuffer(f.read(8 * n_seq), dtype=np.int64)
        doc_indices = np.frombuffer(f.read(8 * n_doc), dtype=np.int64)
    raw = np.fromfile(file_prefix + ".bin", dtype=dtype)
    tokens, pos = [], 0
    for ln in lengths:
        tokens.append(raw[pos : pos + ln].tolist())
        pos += int(ln)
    return {
        "dtype": dtype,
        "lengths": lengths.tolist(),
        "pointers": pointers.tolist(),
        "doc_indices": doc_indices.tolist(),
        "tokens": tokens,
    }
