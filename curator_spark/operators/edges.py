"""Candidate edges from LSH buckets.

Reference semantics: per bucket, sort member ids and emit *consecutive
pairs* — a path graph, not a clique; same connected components with O(n)
edges (fuzzy/lsh/lsh.py:256, buckets_to_edges.py:72-84). Singleton buckets
produce nothing (lsh/lsh.py:248-254).

Spark-first realization: a ``lag(id) OVER (PARTITION BY bucket ORDER BY
id)`` window — no ``collect_list`` arrays, so a mega-bucket streams
through the sorter (spilling) instead of materializing one giant array.
Singleton pruning falls out for free (lag is null).

Skew (north rule): boilerplate text creates hot buckets; with
``num_salts > 1`` a two-phase variant puts each member in a
``pmod(xxhash64(id), s)`` shard — phase 1 emits a path per (bucket, salt)
shard, phase 2 links the shard minima per bucket, so every shard of a
bucket stays one component while no single task sees more than ~1/s of a
hot key. The edge *set* differs from the reference's, the components are
identical (which is what recall is measured on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BUCKET_FIELDS, ID_FIELD


def edges_from_buckets(
    df: DataFrame,
    id_field: str = ID_FIELD,
    bucket_fields: tuple = BUCKET_FIELDS,
    num_salts: int = 1,
    assume_materialized: bool = False,
) -> DataFrame:
    """(id, *bucket) -> distinct undirected edges (src < dst).

    With ``num_salts > 1`` the plan self-unions two branches over ``df``
    (intra-shard paths + inter-shard links). Optimizing that union under a
    downstream join crashes Spark's constraint rewriting
    (``UnionBase.rewriteConstraints`` → "key not found: dst#N" — a
    constraint of one branch references an attribute missing from the
    union's child-output map) for in-memory/UDF-derived sources; parquet
    scans are unaffected. Workaround without touching session conf: each
    branch is ``localCheckpoint``-ed separately, so the union is over two
    flat LogicalRDDs and never enters the buggy rewrite. Callers whose
    ``df`` is already a fresh file scan pass ``assume_materialized=True``
    to skip the eager materialization entirely (no tax on checkpointed
    buckets). The final dropDuplicates is left lazy either way — it folds
    into the downstream consumer's first shuffle."""
    bcols = [F.col(c) for c in bucket_fields]
    if num_salts <= 1:
        w = Window.partitionBy(*bcols).orderBy(F.col(id_field))
        edges = (
            df.withColumn("_src", F.lag(id_field).over(w))
            .where(F.col("_src").isNotNull())
            .select(F.col("_src").alias("src"), F.col(id_field).alias("dst"))
        )
        return edges.dropDuplicates(["src", "dst"])

    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_field)), F.lit(num_salts)))
    w1 = Window.partitionBy(*bcols, F.col("_salt")).orderBy(F.col(id_field))
    intra = (
        salted.withColumn("_src", F.lag(id_field).over(w1))
        .where(F.col("_src").isNotNull())
        .select(F.col("_src").alias("src"), F.col(id_field).alias("dst"))
    )
    reps = salted.groupBy(*bcols, "_salt").agg(F.min(id_field).alias("_rep"))
    w2 = Window.partitionBy(*bcols).orderBy(F.col("_rep"))
    inter = (
        reps.withColumn("_src", F.lag("_rep").over(w2))
        .where(F.col("_src").isNotNull())
        .select(F.col("_src").alias("src"), F.col("_rep").alias("dst"))
    )
    if not assume_materialized:
        intra = intra.localCheckpoint()
        inter = inter.localCheckpoint()
    return intra.unionByName(inter).dropDuplicates(["src", "dst"])
