"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

The reference's semantic-dedup stage computes per-cluster pairwise max
cosine with batched matmuls (/root/reference/nemo_curator/stages/
deduplication/semantic/pairwise.py:37-71) after a k-means partitioning.
Spark-first shape:

- dot products / norms as JVM built-ins (``zip_with`` + ``aggregate`` over
  array<float> cast to double) — whole-stage codegen, no Python;
- brute-force top-k = broadcast the (small) query set against the corpus —
  one scan, no shuffle of the corpus;
- the scale path buckets vectors by random-hyperplane signs (Charikar 2002
  hyperplane LSH — the embedding analogue of the text SimHash) so candidate
  generation is an equi-join on bucket key instead of a cross join; probing
  multiple independent tables bounds recall loss.

Fixed-point: similarities are emitted as ``*_micro`` BIGINT (×1e6) so the
DuckDB oracle hashes identically (float output would differ in low bits).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_micro(a: Column, b: Column) -> Column:
    """cosine(a, b) * 1e6, rounded to BIGINT (deterministic across engines:
    both sides sum in index order in double precision)."""
    da, db = _as_double(a), _as_double(b)
    return F.round(dot(da, db) / (l2_norm(da) * l2_norm(db)) * 1_000_000).cast("long")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
) -> DataFrame:
    """Brute-force exact top-k: (query_id, match_id, cosine_micro), rank<=k.

    ``queries`` is broadcast (the small side); the corpus is scanned once
    with no shuffle until the final per-query top-k (a tiny agg). Excludes
    self-matches. Deterministic ranking: (cosine_micro desc, match_id asc).
    """
    q = F.broadcast(
        queries.select(F.col(id_field).alias("query_id"), F.col(vec_field).alias("_qv"))
    )
    c = corpus.select(F.col(id_field).alias("match_id"), F.col(vec_field).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("match_id"))
        .select("query_id", "match_id", cosine_micro(F.col("_qv"), F.col("_cv")).alias("cosine_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_micro").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine_micro", F.col("rank").cast("long").alias("rank"))
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold_micro: int,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
    block_field: str | None = None,
) -> DataFrame:
    """All pairs (src < dst) with cosine_micro >= threshold — embedding
    near-duplicate detection (reference: semantic/identify_duplicates.py
    eps-threshold pick). ``block_field`` restricts comparison to equal-key
    blocks (the reference blocks by k-means cluster id); without it the
    join is a full cross product — only for small inputs."""
    cols = [F.col(id_field), F.col(vec_field)]
    if block_field:
        cols.append(F.col(block_field))
    base = df.select(*cols)
    on = [F.col(f"a.{block_field}") == F.col(f"b.{block_field}")] if block_field else []
    cond = F.col(f"a.{id_field}") < F.col(f"b.{id_field}")
    for c in on:
        cond = cond & c
    joined = base.alias("a").join(base.alias("b"), cond)
    return (
        joined.select(
            F.col(f"a.{id_field}").alias("src"),
            F.col(f"b.{id_field}").alias("dst"),
            cosine_micro(F.col(f"a.{vec_field}"), F.col(f"b.{vec_field}")).alias("cosine_micro"),
        )
        .where(F.col("cosine_micro") >= F.lit(threshold_micro))
    )


def hyperplane_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """Pandas UDF: embedding -> array<long>[n_tables] of hyperplane-LSH
    bucket ids (Charikar 2002 — the embedding analogue of text SimHash).

    All tables' plane projections are ONE numpy matmul per Arrow batch
    (BLAS), instead of n_tables * n_planes chained JVM aggregate
    expressions — at 10^12 rows the projection is compute-bound, and
    batched matmul is the fastest shape for it. The plane matrix is a
    deterministic driver-side constant captured in the UDF closure.
    """
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables * n_planes, dim)  # (T*P, D)
    weights = (1 << np.arange(n_planes, dtype=np.int64))  # pack bits per table

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])  # (N, D)
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        proj = mat @ planes.T  # (N, T*P)
        bits = (proj >= 0).reshape(len(mat), n_tables, n_planes)
        ids = (bits * weights).sum(axis=2)  # (N, T)
        return pd.Series(list(ids.astype(np.int64)))

    return buckets


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    n_tables: int = 4,
    seed: int = 42,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    Candidates = corpus rows sharing a bucket with the query in ANY of the
    ``n_tables`` independent tables (posexplode + equi-join on
    (table, bucket), distinct), then exact cosine rank within candidates
    only. At 10^12 rows this replaces the O(|Q|*N) scan with one
    equi-join on a (int, long) key — shuffle-partitionable,
    AQE-skew-safe; recall tunes with (n_planes, n_tables)."""
    bucketer = hyperplane_buckets_udf(dim, n_planes, n_tables, seed)
    c = corpus.select(F.col(id_field).alias("match_id"), F.col(vec_field).alias("_cv"))
    q = queries.select(F.col(id_field).alias("query_id"), F.col(vec_field).alias("_qv"))
    cb = c.select("match_id", F.posexplode(bucketer(F.col("_cv"))).alias("_tbl", "_bkt"))
    qb = q.select("query_id", F.posexplode(bucketer(F.col("_qv"))).alias("_tbl", "_bkt"))
    cands = (
        qb.join(cb, ["_tbl", "_bkt"])
        .select("query_id", "match_id")
        .where(F.col("query_id") != F.col("match_id"))
        .dropDuplicates(["query_id", "match_id"])
    )
    scored = (
        cands.join(q, "query_id")
        .join(c, "match_id")
        .select("query_id", "match_id", cosine_micro(F.col("_qv"), F.col("_cv")).alias("cosine_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_micro").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine_micro", F.col("rank").cast("long").alias("rank"))
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_clusters: int | None = None,
    nprobe: int = 2,
    k: int = 5,
    sample_size: int = 16384,
    max_iter: int = 20,
    seed: int = 42,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: k-means
    partitions the corpus, each query probes its ``nprobe`` nearest
    centroids, and exact cosine ranks only within the probed cells.

    The second ANN scale path next to ``ann_lsh_topk``: candidate
    generation is an equi-join on the int centroid key (the corpus
    shuffles ONCE on centroid and the partitioning is reusable across
    query batches — the reference's semantic stage caches the same
    k-means layout, deduplication/semantic/kmeans.py:215-217). Recall
    tunes with ``nprobe``/``n_clusters``; centroids fit on a bounded
    id-ordered driver sample exactly like the semantic pipeline.

    ``n_clusters=None`` (default) derives ~sqrt(N) cells from the corpus
    count (clamped to [4, 65536]) — the standard IVF sizing that keeps
    expected cell size ~sqrt(N), so the per-query scan shrinks as the
    corpus grows instead of degenerating toward a full scan at a fixed
    toy cell count. Pass an explicit value to pin the layout (e.g. when
    reusing a cached assignment across query batches)."""
    from .semantic import SemanticDedupConfig, fit_centroids, kmeans_assign, sample_matrix

    if n_clusters is None:
        n_rows = corpus.count()
        n_clusters = int(min(max(4, round(math.sqrt(max(n_rows, 1)))), 65536))
    if not 1 <= nprobe <= n_clusters:
        raise ValueError("need 1 <= nprobe <= n_clusters")
    cfg = SemanticDedupConfig(
        n_clusters=n_clusters, sample_size=sample_size, max_iter=max_iter,
        seed=seed, id_field=id_field, vec_field=vec_field,
    )
    cents = fit_centroids(sample_matrix(corpus, cfg), n_clusters, max_iter=max_iter, seed=seed)
    cents64 = np.asarray(cents, dtype=np.float64)
    c2 = np.sum(cents64 * cents64, axis=1)

    assigned = kmeans_assign(corpus, cents, id_field=id_field, vec_field=vec_field).select(
        F.col(id_field).alias("match_id"),
        F.col(vec_field).alias("_cv"),
        F.col("centroid").alias("_cell"),
    )

    def probe(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_field].to_numpy()).astype(np.float64)
            n = np.linalg.norm(x, axis=1)
            n[n == 0] = 1.0
            # rank probe cells by the SAME metric kmeans_assign places
            # corpus rows with (squared-L2 to the raw, non-unit centroid
            # on a normalized vector): ranking by cosine-to-centroid
            # instead can probe a different cell than the one an exact
            # duplicate of the query was assigned to
            d2 = 1.0 + c2[None, :] - 2.0 * ((x / n[:, None]) @ cents64.T)
            cells = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
            yield pd.DataFrame(
                {
                    "query_id": pdf[id_field],
                    "_qv": pdf[vec_field],
                    "_cells": [row.astype("int32").tolist() for row in cells],
                }
            )

    qschema = (
        f"query_id {dict(corpus.select(id_field).dtypes)[id_field]}, "
        f"_qv {dict(corpus.select(vec_field).dtypes)[vec_field]}, _cells array<int>"
    )
    qprobed = queries.select(id_field, vec_field).mapInPandas(probe, qschema)
    qcells = qprobed.select("query_id", "_qv", F.explode("_cells").alias("_cell"))
    scored = (
        qcells.join(assigned, "_cell")
        .where(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            cosine_micro(F.col("_qv"), F.col("_cv")).alias("cosine_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_micro").desc(), F.col("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine_micro", F.col("rank").cast("long").alias("rank"))
    )
