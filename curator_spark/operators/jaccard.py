"""Token-set Jaccard near-duplicate pairs (exact, relational).

The exact counterpart of the MinHash estimate (kernels/minhash.py):
Jaccard over distinct whitespace tokens, computed entirely with built-in
array functions — ``array_distinct``/``array_intersect``/``size`` —
JVM-side, oracle-expressible in ANSI SQL (DuckDB list_intersect).

Blocking keeps the pair space subquadratic: an equality block column
(e.g. language) bounds comparisons to same-block pairs; at web scale the
block would come from LSH buckets (operators/lsh.py) — this operator is
the *verify* step semantics, the candidate generation is LSH's job.

jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|)  over distinct token sets
(the identity avoids engine-specific union-dedup semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_jaccard_pairs(
    df: DataFrame,
    threshold_micro: int,
    id_field: str = "doc_id",
    text_field: str = "text",
    block_field: str | None = None,
) -> DataFrame:
    """(id, text[, block]) -> (src, dst, jaccard_micro) for pairs with
    distinct-token Jaccard * 1e6 >= threshold_micro, src < dst."""
    # split on whitespace RUNS and drop empties: a single-space split
    # yields '' tokens for doubled spaces/tabs, and a shared '' token
    # inflates Jaccard between unrelated documents. The class is spelled
    # explicitly (not \s) because Java's \s includes \x0B while RE2's
    # (DuckDB oracle) does not — the explicit class is engine-identical.
    toks = F.filter(
        F.array_distinct(F.split(F.col(text_field), r"[ \t\n\x0B\f\r]+")),
        lambda x: x != "",
    )
    cols = [F.col(id_field).alias("_id"), toks.alias("_toks")]
    if block_field:
        cols.append(F.col(block_field).alias("_blk"))
    base = df.select(*cols)
    cond = F.col("a._id") < F.col("b._id")
    if block_field:
        cond = cond & (F.col("a._blk") == F.col("b._blk"))
    joined = base.alias("a").join(base.alias("b"), cond)
    inter = F.size(F.array_intersect(F.col("a._toks"), F.col("b._toks")))
    union = F.size(F.col("a._toks")) + F.size(F.col("b._toks")) - inter
    return (
        joined.select(
            F.col("a._id").alias("src"),
            F.col("b._id").alias("dst"),
            F.floor(inter * F.lit(1_000_000) / union).cast("long").alias("jaccard_micro"),
        )
        .where(F.col("jaccard_micro") >= F.lit(threshold_micro))
    )
