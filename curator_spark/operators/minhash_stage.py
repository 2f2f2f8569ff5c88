"""MinHash signature stage.

Spark plan: project (id, text) — nothing else reaches the UDF or the
shuffle (mirrors the reference's column pruning, fuzzy/minhash.py:314-317)
— then one Arrow-batched pandas UDF computing the whole signature column.
Signature math is the kernel library; seed schedule and shingle semantics
match cuDF str.minhash (see kernels/minhash.py docstring).

Storage type: 32-bit signatures are stored as ``array<int>`` carrying the
u32 bit pattern (the reference stores list<uint32>, fuzzy/minhash.py:131) —
at 260 hashes this halves the signature checkpoint + shuffle bytes vs
``array<long>`` (1.0 vs 2.1 GB per million rows), which is the dominant
IO of the signature phase at scale. 64-bit signatures (61-bit values) use
``array<long>``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

from ..config import ID_FIELD, MINHASH_FIELD, FuzzyDedupConfig
from ..kernels.minhash import generate_seeds, minhash_signatures


def minhash_stage(
    df: DataFrame,
    cfg: FuzzyDedupConfig,
    text_field: str | None = None,
    id_field: str = ID_FIELD,
    passthrough: tuple = (),
) -> DataFrame:
    """(id, text, ...) -> (id, *passthrough, _minhash_signature).

    ``passthrough`` names extra columns carried alongside the signature
    (e.g. an event-time column for the streaming path); everything else
    is projected away before the UDF."""
    text_field = text_field or cfg.text_field
    seeds = generate_seeds(cfg.num_hashes, seed=cfg.seed, bit_width=64 if cfg.use_64bit_hash else 32)
    width = cfg.char_ngrams
    bit_width = 64 if cfg.use_64bit_hash else 32
    elem = LongType() if cfg.use_64bit_hash else IntegerType()

    @F.pandas_udf(ArrayType(elem))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        sigs = minhash_signatures(texts.fillna("").tolist(), seeds, width=width, bit_width=bit_width)
        out = sigs.view(np.int32) if bit_width == 32 else sigs.view(np.int64)
        return pd.Series(list(out))

    return df.select(
        F.col(id_field),
        *[F.col(c) for c in passthrough],
        minhash_udf(F.col(text_field)).alias(MINHASH_FIELD),
    )
