"""Suffix-array exact-substring pass (Lee et al. 2022 semantics).

No reference counterpart in-repo (the Nemotron-CC recipe mentions
"substring deduplication" at README.md:92 but the module is external);
specified from the published algorithm: flag document pairs sharing an
exact substring of length >= L (default 50 chars).

Spark-first two-phase design (SURVEY §7.1-9):

1. candidates: winnowing fingerprints (k-gram hashes minimal in each
   window; k + w - 1 = L guarantees any shared >=L-char substring shares a
   selected fingerprint) explode to (id, fp) and bucket-join exactly like
   LSH bands — fully distributed, no quadratic scan.
2. verify: for each candidate pair, compute the true longest common
   substring with a generalized suffix array inside a grouped Arrow UDF;
   keep pairs with LCS >= L.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BooleanType, LongType

from ..config import ID_FIELD
from ..kernels.fingerprint import longest_common_substring_len, winnow_fingerprints


def substring_fingerprints(
    df: DataFrame,
    min_length: int = 50,
    kgram: int = 25,
    text_field: str = "transcript",
    id_field: str = ID_FIELD,
    seed: int = 42,
) -> DataFrame:
    """(id, text) -> (id, _fp:long) winnowed fingerprint long format."""
    window = min_length - kgram + 1
    if window < 1:
        raise ValueError("min_length must be >= kgram")

    @F.pandas_udf(ArrayType(LongType()))
    def fp_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [winnow_fingerprints(t or "", k=kgram, w=window, seed=seed).astype(np.int64) for t in texts]
        )

    return df.select(F.col(id_field), F.explode(fp_udf(F.col(text_field))).alias("_fp"))


def substring_candidate_edges(
    df: DataFrame,
    min_length: int = 50,
    kgram: int = 25,
    text_field: str = "transcript",
    id_field: str = ID_FIELD,
    max_bucket_size: int = 100,
) -> DataFrame:
    """Candidate pairs = clique per fingerprint bucket (unlike LSH, the
    winnowing guarantee is per-PAIR — a path graph would skip the A-C
    verification when B sits between them — so the self-join is required;
    AQE skew-join handles hot fingerprints). Buckets larger than
    ``max_bucket_size`` (mega-boilerplate) are dropped rather than
    exploded quadratically — same containment is then still caught through
    any of the pair's other shared fingerprints.
    """
    fps = substring_fingerprints(df, min_length, kgram, text_field, id_field)
    # three consumers below (count agg + both self-join sides) would each
    # re-run the winnowing pandas UDF over the full corpus — same hazard
    # the simhash banded path checkpoints against (simhash_stage.py)
    fps = fps.localCheckpoint(eager=False)
    counts = fps.groupBy("_fp").agg(F.count(F.lit(1)).alias("_n"))
    fps = fps.join(counts.where(F.col("_n").between(2, max_bucket_size)).select("_fp"), "_fp")
    left = fps.select(F.col("_fp"), F.col(id_field).alias("src"))
    right = fps.select(F.col("_fp"), F.col(id_field).alias("dst"))
    return (
        left.join(right, "_fp")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )


def verify_substring_edges(
    edges: DataFrame,
    docs: DataFrame,
    min_length: int = 50,
    text_field: str = "transcript",
    id_field: str = ID_FIELD,
) -> DataFrame:
    """Keep candidate edges whose true LCS >= min_length (suffix-array
    verified). Joins the two transcripts onto each edge then verifies in
    an Arrow-batched UDF — candidate sets are tiny relative to the corpus,
    so the join is the cheap part.
    """
    texts = docs.select(F.col(id_field), F.col(text_field))
    joined = (
        edges.join(texts.withColumnRenamed(id_field, "src").withColumnRenamed(text_field, "_t_src"), "src")
        .join(texts.withColumnRenamed(id_field, "dst").withColumnRenamed(text_field, "_t_dst"), "dst")
    )

    @F.pandas_udf(BooleanType())
    def lcs_ok(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [longest_common_substring_len(x or "", y or "") >= min_length for x, y in zip(a, b)]
        )

    return joined.where(lcs_ok(F.col("_t_src"), F.col("_t_dst"))).select("src", "dst")
