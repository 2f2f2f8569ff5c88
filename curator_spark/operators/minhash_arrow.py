"""MinHash stage over raw Arrow batches (mapInArrow).

Same signature semantics as operators/minhash_stage.py, but the UDF
consumes the Arrow string buffers directly (kernels/arrowtext.py): no
per-doc Python str materialization on input and the signature matrix is
emitted as one flat FixedSizeList buffer on output.

Round-2's first cut of this stage lost its A/B against the pandas UDF
(111 s vs 146 s at 1M docs, local[8]) because the kernel built a global
gather matrix and lexsort-deduped — exactly the fresh multi-MB
allocations this host's serialized page-fault path punishes. The
round-3 kernel (kernels/arrowtext.py) blocks geometry + murmur +
permutations per <=64K-shingle doc group with reused buffers, and wins
~2x single-process with ~0.99 process-scaling 2->8 workers (BENCH.md).
This stage is now the pipeline default (config.minhash_impl) for both
bit widths. Bit-parity covered by tests/test_arrowtext.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType, StructField, StructType

from ..config import ID_FIELD, MINHASH_FIELD, FuzzyDedupConfig
from ..kernels.arrowtext import minhash_concat
from ..kernels.minhash import generate_seeds


def minhash_stage_arrow(
    df: DataFrame,
    cfg: FuzzyDedupConfig,
    text_field: str | None = None,
    id_field: str = ID_FIELD,
) -> DataFrame:
    """(id, text, ...) -> (id, _minhash_signature: array<int>[num_hashes]);
    array<long> (61-bit values) on the use_64bit_hash path."""
    text_field = text_field or cfg.text_field
    bit_width = 64 if cfg.use_64bit_hash else 32
    seeds = generate_seeds(cfg.num_hashes, seed=cfg.seed, bit_width=bit_width)
    width = cfg.char_ngrams
    n_perm = cfg.num_hashes
    elem = pa.int64() if cfg.use_64bit_hash else pa.int32()
    view_t = np.int64 if cfg.use_64bit_hash else np.int32

    out_schema = StructType(
        [
            StructField(id_field, LongType(), False),
            StructField(MINHASH_FIELD, ArrayType(LongType() if cfg.use_64bit_hash else IntegerType()), False),
        ]
    )

    def run(batches):
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1)
            n = len(texts)
            if n == 0:
                continue
            # normalize to a plain StringArray with its own buffers
            arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
            if pa.types.is_large_string(arr.type):
                arr = arr.cast(pa.string())
            arr = arr.fill_null("")
            bufs = arr.buffers()  # [validity, offsets(int32), data]
            off32 = np.frombuffer(bufs[1], dtype=np.int32, count=(arr.offset + n + 1))
            off = off32[arr.offset : arr.offset + n + 1].astype(np.int64)
            data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(off[-1])) if bufs[2] else np.empty(0, np.uint8)
            # slice to this array's span, rebase offsets
            base = int(off[0])
            data = data[base : int(off[-1])]
            off = off - base
            sig = minhash_concat(data, off, seeds, width, bit_width=bit_width).view(view_t).ravel()
            sig_arr = pa.FixedSizeListArray.from_arrays(pa.array(sig, type=elem), n_perm)
            yield pa.RecordBatch.from_arrays(
                [ids, sig_arr.cast(pa.list_(elem))], names=[id_field, MINHASH_FIELD]
            )

    return df.select(F.col(id_field), F.col(text_field)).mapInArrow(run, schema=out_schema)
