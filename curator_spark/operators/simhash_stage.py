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
    n_bands: int | None = None,
) -> DataFrame:
    """(id, _simhash) -> pairs (src < dst) with hamming <= max_hamming.

    Scale path (no O(n^2) cross join), generalized pigeonhole: split the
    64 bits into ``m >= max_hamming + 2`` disjoint bands. A pair within
    the hamming budget has >= m - max_hamming >= 2 clean (exactly-equal)
    bands, so it agrees on at least one PAIR of bands — the join key is
    (band-pair index, band_p value, band_q value) over all C(m, 2)
    combinations, then exact hamming verification via ``bit_count(xor)``.

    Why pairs of bands: the naive k+1-band scheme has 64/(k+1)-bit keys
    (16 bits at k=3) — at 10^7+ docs every key value is a mega-bucket and
    the self-join degenerates toward O(n^2). Band-pair keys double the
    key width (~25 bits at m=5) at the cost of C(m,2)/m ~ 2x exploded
    rows, keeping expected bucket sizes ~n/2^25 — the same guarantee,
    quadratically better key space. ``n_bands`` widens keys further
    (C(m,2) grows, width 2*64/m shrinks — m=8 gives 28 pair-keys of
    16 bits... choose m so 2*(64/m) covers log2(n) + slack).

    ``max_hamming=0`` short-circuits to direct equality on the full hash.
    """
    if max_hamming < 0:
        raise ValueError("max_hamming must be >= 0")
    sh = F.col(SIMHASH_FIELD)
    if max_hamming == 0:
        # same double-execution hazard as the banded path below: both
        # equality-join sides would re-run the upstream simhash UDF
        slim = simhashes.select(F.col(id_field), sh.alias("_sh")).localCheckpoint(
            eager=False
        )
        a = slim.alias("a")
        b = slim.alias("b")
        return (
            a.join(
                b,
                (F.col("a._sh") == F.col("b._sh"))
                & (F.col(f"a.{id_field}") < F.col(f"b.{id_field}")),
            )
            .select(F.col(f"a.{id_field}").alias("src"), F.col(f"b.{id_field}").alias("dst"))
            .dropDuplicates(["src", "dst"])
        )

    m = n_bands if n_bands is not None else max_hamming + 2
    if m < max_hamming + 2:
        raise ValueError(f"n_bands must be >= max_hamming + 2 (got {m} < {max_hamming + 2})")
    if m > 64:
        raise ValueError("n_bands must be <= 64")
    # band i covers bits [offsets[i], offsets[i+1]) — widths differ by <= 1
    widths = [64 // m + (1 if i < 64 % m else 0) for i in range(m)]
    offsets = [0]
    for w in widths:
        offsets.append(offsets[-1] + w)

    def band_val(i: int):
        return F.shiftrightunsigned(sh, offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1).cast("long")
        )

    pair_keys = []
    key_idx = 0
    for p in range(m):
        for q in range(p + 1, m):
            pair_keys.append(
                F.struct(
                    F.lit(key_idx).alias("_i"),
                    band_val(p).alias("_v1"),
                    band_val(q).alias("_v2"),
                )
            )
            key_idx += 1
    melted = simhashes.select(
        F.col(id_field), sh.alias("_sh"), F.explode(F.array(*pair_keys)).alias("_b")
    ).select(id_field, "_sh", "_b._i", "_b._v1", "_b._v2")
    # materialize before the self-join: both join sides would otherwise
    # re-run the whole upstream plan (incl. the simhash UDF) once each
    melted = melted.localCheckpoint()
    a, b = melted.alias("a"), melted.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._i") == F.col("b._i"))
            & (F.col("a._v1") == F.col("b._v1"))
            & (F.col("a._v2") == F.col("b._v2"))
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
