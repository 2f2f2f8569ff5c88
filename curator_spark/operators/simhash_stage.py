"""SimHash near-dup transcript stage + candidate-edge filter.

No reference counterpart (the repo has no SimHash module — SURVEY.md scope
note); specified from Charikar 2002, parameterized with the reference's
char-shingle width. Two uses:

1. ``simhash_stage``: (id, text) -> (id, _simhash:long) — standalone
   near-dup signal (hamming <= k between simhashes).
2. ``filter_edges_by_simhash``: drop LSH candidate edges whose endpoint
   simhashes differ by more than ``max_hamming`` — a cheap JVM-side
   (xor + bit_count) false-positive filter before connected components.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..config import ID_FIELD, SIMHASH_FIELD, FuzzyDedupConfig
from ..kernels.simhash import simhash64


def simhash_stage(
    df: DataFrame,
    cfg: FuzzyDedupConfig,
    text_field: str | None = None,
    id_field: str = ID_FIELD,
) -> DataFrame:
    text_field = text_field or cfg.text_field
    width, seed = cfg.char_ngrams, cfg.seed

    @F.pandas_udf(LongType())
    def simhash_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash64(texts.fillna("").tolist(), width=width, seed=seed))

    return df.select(F.col(id_field), simhash_udf(F.col(text_field)).alias(SIMHASH_FIELD))


def simhash_candidate_pairs(
    simhashes: DataFrame,
    max_hamming: int,
    id_field: str = ID_FIELD,
) -> DataFrame:
    """(id, _simhash) -> pairs (src < dst) with hamming <= max_hamming.

    Scale path (no O(n^2) cross join): split the 64-bit simhash into
    ``max_hamming + 1`` disjoint bit-bands — by pigeonhole, any pair
    within the hamming budget agrees exactly on at least one band — then
    equi-join on (band index, band value) and verify the full hamming
    distance with ``bit_count(xor)``. Same band-then-verify shape as
    MinHash LSH, so the same salting/AQE skew handling applies.
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sh = F.col(SIMHASH_FIELD)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("_i"),
                F.shiftrightunsigned(sh, i * width)
                .bitwiseAND(
                    F.lit((1 << (width + (64 % n_bands if i == n_bands - 1 else 0))) - 1).cast("long")
                )
                .alias("_v"),
            )
            for i in range(n_bands)
        ]
    )
    melted = simhashes.select(
        F.col(id_field), sh.alias("_sh"), F.explode(bands).alias("_b")
    ).select(id_field, "_sh", F.col("_b._i").alias("_i"), F.col("_b._v").alias("_v"))
    a, b = melted.alias("a"), melted.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._i") == F.col("b._i"))
            & (F.col("a._v") == F.col("b._v"))
            & (F.col(f"a.{id_field}") < F.col(f"b.{id_field}")),
        )
        .where(F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh"))) <= F.lit(max_hamming))
        .select(F.col(f"a.{id_field}").alias("src"), F.col(f"b.{id_field}").alias("dst"))
    )
    return pairs.dropDuplicates(["src", "dst"])


def filter_edges_by_simhash(
    edges: DataFrame,
    simhashes: DataFrame,
    max_hamming: int,
    id_field: str = ID_FIELD,
) -> DataFrame:
    """Keep edges with hamming(simhash(src), simhash(dst)) <= max_hamming.

    Pure JVM plan: two equi-joins + ``bit_count(a ^ b)``.
    """
    sh = simhashes.select(F.col(id_field), F.col(SIMHASH_FIELD))
    out = (
        edges.join(sh.withColumnRenamed(id_field, "src").withColumnRenamed(SIMHASH_FIELD, "_sh_src"), "src")
        .join(sh.withColumnRenamed(id_field, "dst").withColumnRenamed(SIMHASH_FIELD, "_sh_dst"), "dst")
        .where(F.bit_count(F.expr("_sh_src ^ _sh_dst")) <= F.lit(max_hamming))
        .select("src", "dst")
    )
    return out
