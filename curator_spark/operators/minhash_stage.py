"""MinHash signature stage.

Spark plan: project (id, text) — nothing else reaches the UDF or the
shuffle (mirrors the reference's column pruning, fuzzy/minhash.py:314-317)
— then one Arrow-batched pandas UDF computing the whole signature column.
Signature math is the kernel library; seed schedule and shingle semantics
match cuDF str.minhash (see kernels/minhash.py docstring).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..config import ID_FIELD, MINHASH_FIELD, FuzzyDedupConfig
from ..kernels.minhash import generate_seeds, minhash_signatures


def minhash_stage(
    df: DataFrame,
    cfg: FuzzyDedupConfig,
    text_field: str | None = None,
    id_field: str = ID_FIELD,
) -> DataFrame:
    """(id, text, ...) -> (id, _minhash_signature: array<long>[num_hashes])."""
    text_field = text_field or cfg.text_field
    seeds = generate_seeds(cfg.num_hashes, seed=cfg.seed, bit_width=64 if cfg.use_64bit_hash else 32)
    width = cfg.char_ngrams
    bit_width = 64 if cfg.use_64bit_hash else 32

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(texts: pd.Series) -> pd.Series:
        sigs = minhash_signatures(texts.fillna("").tolist(), seeds, width=width, bit_width=bit_width)
        return pd.Series(list(sigs.astype(np.int64)))

    return df.select(F.col(id_field), minhash_udf(F.col(text_field)).alias(MINHASH_FIELD))
