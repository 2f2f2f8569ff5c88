"""Semantic dedup: k-means partitioning + in-cluster ranked pairwise
max-cosine + eps duplicate identification.

Reference semantics (all cited into /root/reference/nemo_curator/stages/
deduplication/semantic/):

- kmeans.py:48-115,199-204   L2-normalize embeddings, fit k-means, assign
                             each row a ``centroid`` label + distance-to-
                             centroid columns, partition output by centroid.
- pairwise.py:37-71          per cluster, rank rows, then for each row
                             compute the max cosine similarity to any
                             EARLIER row in the ranking (batched triu
                             matmul); emit (id, max_id, cosine_sim_score).
- ranking.py:21-28 +
  pairwise.py:280-302        which_to_keep: "hard" sorts by (distance
                             desc, id desc) — keep outliers; "easy" by
                             (asc, asc) — keep representatives; "random"
                             is a seeded shuffle.
- identify_duplicates.py:95-105  duplicates = rows with
                             cosine_sim_score >= 1 - eps.
- workflow.py:65-92          defaults: distance_metric="cosine",
                             which_to_keep="hard", random_state=42.

Spark-first shape:

- the FIT runs on a bounded deterministic sample (first ``sample_size``
  rows in id order — the reference's own ``fit_data_fraction`` sampling
  exists for the same memory reason, kmeans.py two-pass mode) with
  numpy Lloyd's + seeded k-means++ init on the driver: k*d and n_sample*d
  are tiny at any corpus scale, and a driver fit is bit-deterministic,
  which makes the DuckDB oracle possible. ``kmeans_fit_spark`` is the
  distributed alternative (full-data Lloyd's via partial sums) for when
  the sample is not representative.
- the ASSIGN is one scan: a pandas UDF doing a single (batch x k) matmul
  per Arrow batch — no shuffle, no Python-per-row.
- the PAIRWISE stage shuffles once on ``centroid`` and runs a batched
  numpy triu-max per cluster inside ``applyInPandas`` — identical memory
  shape to the reference (O(n_c * batch) per cluster, pairwise.py:37-49);
  like the reference, ``n_clusters`` must be sized so a cluster fits in
  one worker (workflow.py MIN_RECOMMENDED_N_CLUSTERS).

Fixed-point: scores/distances are ``*_micro`` BIGINT (x 1e6, rounded) so
ranking and the DuckDB oracle are engine-stable (double noise sits ~1e-9
below the rounding granularity).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

MICRO = 1_000_000


@dataclass(frozen=True)
class SemanticDedupConfig:
    n_clusters: int = 8
    eps: float = 0.07  # duplicate iff cosine_sim >= 1 - eps
    which_to_keep: str = "hard"  # hard | easy | random
    seed: int = 42
    sample_size: int = 16384  # driver-fit sample (id-ordered prefix)
    max_iter: int = 20
    id_field: str = "vec_id"
    vec_field: str = "embedding"

    @property
    def threshold_micro(self) -> int:
        return int(round((1.0 - self.eps) * MICRO))

    def config_hash(self) -> str:
        import hashlib
        import json
        from dataclasses import asdict

        return hashlib.sha256(json.dumps(asdict(self), sort_keys=True).encode()).hexdigest()[:16]


# ---------------------------------------------------------------------------
# fit
# ---------------------------------------------------------------------------


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    """L2-normalize rows (reference normalize_embeddings_col_in_df,
    kmeans.py:449-452). Norms use ordered sequential summation so any
    caller (Spark collect or pyarrow read) produces identical doubles."""
    mat = mat.astype(np.float64)
    norms = np.sqrt(np.add.reduce(mat * mat, axis=1))
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def fit_centroids(mat: np.ndarray, k: int, max_iter: int = 20, seed: int = 42) -> np.ndarray:
    """Numpy Lloyd's with seeded k-means++ init over L2-normalized rows.

    Deterministic for fixed input: same floats in, same centroids out —
    the property the cross-engine oracle relies on. Mirrors the
    reference's cuML fit on normalized embeddings (kmeans.py:211-218).
    """
    x = _normalize_rows(np.asarray(mat))
    n = len(x)
    k = min(k, n)
    rng = np.random.RandomState(seed)
    # k-means++ (Arthur & Vassilvitskii 2007)
    centroids = np.empty((k, x.shape[1]), dtype=np.float64)
    centroids[0] = x[rng.randint(n)]
    d2 = np.sum((x - centroids[0]) ** 2, axis=1)
    for i in range(1, k):
        total = d2.sum()
        if total <= 0:
            centroids[i:] = x[rng.randint(n, size=k - i)]
            break
        probs = d2 / total
        centroids[i] = x[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, np.sum((x - centroids[i]) ** 2, axis=1))
    for _ in range(max_iter):
        # assign by squared L2 (= cosine ordering up to centroid norm, the
        # same objective cuML optimizes on normalized data)
        dists = _dist2_to_centroids(x, centroids)
        labels = np.argmin(dists, axis=1)
        new = centroids.copy()
        for j in range(k):
            members = x[labels == j]
            if len(members):
                new[j] = members.mean(axis=0)
        if np.allclose(new, centroids):
            break
        centroids = new
    return centroids


def _dist2_to_centroids(x: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances: ||x||^2 + ||c||^2 - 2 x.c — one BLAS
    matmul, the standard trick the reference's cuML predict also uses."""
    x2 = np.sum(x * x, axis=1)[:, None]
    c2 = np.sum(centroids * centroids, axis=1)[None, :]
    return x2 + c2 - 2.0 * (x @ centroids.T)


def sample_matrix(df: DataFrame, cfg: SemanticDedupConfig) -> np.ndarray:
    """First ``sample_size`` rows in id order — a global TopK (no full
    sort) + driver collect of a bounded sample."""
    rows = (
        df.select(cfg.id_field, cfg.vec_field)
        .orderBy(cfg.id_field)
        .limit(cfg.sample_size)
        .collect()
    )
    return np.array([r[cfg.vec_field] for r in rows], dtype=np.float32)


def sample_matrix_parquet(path: str, cfg: SemanticDedupConfig) -> np.ndarray:
    """Same sample via pyarrow (no Spark) — used by the DuckDB-oracle
    generator; bit-identical to ``sample_matrix`` on the same file."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[cfg.id_field, cfg.vec_field])
    ids = t.column(cfg.id_field).to_numpy()
    order = np.argsort(ids, kind="stable")[: cfg.sample_size]
    vecs = t.column(cfg.vec_field).to_pylist()
    return np.array([vecs[i] for i in order], dtype=np.float32)


def kmeans_fit_spark(
    df: DataFrame,
    k: int,
    cfg: SemanticDedupConfig | None = None,
    n_iter: int = 10,
) -> np.ndarray:
    """Distributed Lloyd's over the FULL dataset: per Arrow batch, one
    matmul assigns rows to the current centroids and emits per-centroid
    partial (sum_vec, count); a tiny groupBy reduce + driver combine
    closes each round. One scan per iteration, k*d floats to the driver —
    the genuine at-scale path when a sample fit is not enough.

    Not bit-deterministic across partitionings (float summation order),
    so the oracle-checked query uses the sample fit; this is pytest-
    covered (planted blobs recovered, inertia non-increasing).
    """
    cfg = cfg or SemanticDedupConfig(n_clusters=k)
    centroids = fit_centroids(sample_matrix(df, cfg), k, max_iter=1, seed=cfg.seed)
    dim = centroids.shape[1]
    schema = StructType(
        [
            StructField("_c", IntegerType(), False),
            StructField("_cnt", LongType(), False),
            *[StructField(f"_s{d}", DoubleType(), False) for d in range(dim)],
        ]
    )
    vec_field = cfg.vec_field
    for _ in range(n_iter):
        cur = centroids

        def partials(batches, cur=cur):
            for pdf in batches:
                if not len(pdf):
                    continue
                x = _normalize_rows(np.vstack(pdf[vec_field].to_numpy()))
                labels = np.argmin(_dist2_to_centroids(x, cur), axis=1)
                out = {"_c": [], "_cnt": []}
                sums = []
                for j in np.unique(labels):
                    members = x[labels == j]
                    out["_c"].append(int(j))
                    out["_cnt"].append(len(members))
                    sums.append(members.sum(axis=0))
                res = pd.DataFrame(out)
                for d in range(dim):
                    res[f"_s{d}"] = [s[d] for s in sums]
                yield res

        agg = (
            df.select(vec_field)
            .mapInPandas(partials, schema=schema)
            .groupBy("_c")
            .agg(F.sum("_cnt").alias("_n"), *[F.sum(f"_s{d}").alias(f"_s{d}") for d in range(dim)])
            .collect()
        )
        new = centroids.copy()
        for r in agg:
            if r["_n"]:
                new[r["_c"]] = np.array([r[f"_s{d}"] for d in range(dim)]) / r["_n"]
        if np.allclose(new, centroids):
            break
        centroids = new
    return centroids


# ---------------------------------------------------------------------------
# assign
# ---------------------------------------------------------------------------

ASSIGN_FIELDS = [
    StructField("centroid", IntegerType(), False),
    StructField("l2_dist_micro", LongType(), False),
    StructField("cos_dist_micro", LongType(), False),
]


def kmeans_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
) -> DataFrame:
    """Add (centroid, l2_dist_micro, cos_dist_micro) — the reference's
    centroid / l2_dist_to_cent / cosine_dist_to_cent columns
    (kmeans.py:44-45,456-466) in cross-engine-stable fixed point.

    One (batch x k) matmul per Arrow batch; ties on the micro-rounded
    squared-L2 break toward the lowest centroid index in every engine.
    """
    cents = np.asarray(centroids, dtype=np.float64)
    c2 = np.sum(cents * cents, axis=1)
    cnorm = np.sqrt(c2)
    cnorm[cnorm == 0] = 1.0

    schema = StructType([*df.select(id_field, vec_field).schema.fields, *ASSIGN_FIELDS])

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = _normalize_rows(np.vstack(pdf[vec_field].to_numpy()))
            dots = x @ cents.T  # (n, k)
            d2_micro = np.round((1.0 + c2[None, :] - 2.0 * dots) * MICRO)
            labels = np.argmin(d2_micro, axis=1)  # first index wins ties
            rows = np.arange(len(x))
            out = pdf[[id_field, vec_field]].copy()
            out["centroid"] = labels.astype(np.int32)
            out["l2_dist_micro"] = d2_micro[rows, labels].astype(np.int64)
            out["cos_dist_micro"] = np.round(
                (1.0 - dots[rows, labels] / cnorm[labels]) * MICRO
            ).astype(np.int64)
            yield out

    return df.select(id_field, vec_field).mapInPandas(assign, schema=schema)


# ---------------------------------------------------------------------------
# ranked pairwise max-cosine per cluster
# ---------------------------------------------------------------------------


def _rank_order(pdf: pd.DataFrame, which_to_keep: str, id_field: str, seed: int) -> np.ndarray:
    """Row order per ranking.py:21-28 + pairwise.py:280-302. "random" ranks
    by md5(seed || id) — a seeded deterministic shuffle that DuckDB can
    reproduce (the reference's sample(frac=1, random_state) is equally
    arbitrary; only determinism matters for parity)."""
    # tie-break on the id via its ascending dense rank (double argsort):
    # identical ordering to +/-id for numeric ids, and it makes string ids
    # (e.g. clip_id keys in the tiered cascade) work too — np.lexsort
    # cannot negate strings
    ids = pdf[id_field].to_numpy()
    id_rank = np.argsort(np.argsort(ids, kind="stable"), kind="stable")
    if which_to_keep == "hard":
        return np.lexsort((-id_rank, -pdf["cos_dist_micro"].to_numpy()))
    if which_to_keep == "easy":
        return np.lexsort((id_rank, pdf["cos_dist_micro"].to_numpy()))
    if which_to_keep == "random":
        import hashlib

        keys = [
            hashlib.md5(f"{seed}|{v}".encode()).hexdigest() for v in pdf[id_field].to_numpy()
        ]
        return np.argsort(np.array(keys), kind="stable")
    raise ValueError(f"which_to_keep must be hard|easy|random, got {which_to_keep!r}")


def pairwise_max_similarity(
    assigned: DataFrame,
    which_to_keep: str = "hard",
    seed: int = 42,
    id_field: str = "vec_id",
    vec_field: str = "embedding",
    batch_size: int = 1024,
) -> DataFrame:
    """(id, vec, centroid, cos_dist_micro) -> (id, max_id,
    cosine_sim_micro, centroid): for each row, the max cosine to any
    earlier row in the cluster ranking (pairwise.py:37-71 batched triu).

    One shuffle on ``centroid``; per cluster the similarity matrix is
    computed in column batches so memory is O(n_c * batch_size), never
    O(n_c^2) — the reference's pairwise_cosine_similarity_batched shape.
    """
    out_schema = StructType(
        [
            StructField(id_field, assigned.schema[id_field].dataType, False),
            StructField("max_id", assigned.schema[id_field].dataType, True),
            StructField("cosine_sim_micro", LongType(), False),
            StructField("centroid", IntegerType(), False),
        ]
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        order = _rank_order(pdf, which_to_keep, id_field, seed)
        pdf = pdf.iloc[order].reset_index(drop=True)
        e = _normalize_rows(np.vstack(pdf[vec_field].to_numpy()))
        n = len(e)
        ids = pdf[id_field].to_numpy()
        best = np.zeros(n, dtype=np.int64)
        best_idx = np.zeros(n, dtype=np.int64)
        for start in range(0, n, batch_size):
            end = min(start + batch_size, n)
            sims = e @ e[start:end].T  # (n, b)
            # strictly-earlier mask: row j contributes to column i iff j < i
            cols = np.arange(start, end)
            mask = np.arange(n)[:, None] < cols[None, :]
            sims = np.where(mask, sims, -np.inf)
            has_prev = cols > 0
            col_best = np.argmax(sims, axis=0)
            col_val = np.round(sims[col_best, np.arange(end - start)] * MICRO)
            best[start:end] = np.where(has_prev, col_val, 0).astype(np.int64)
            best_idx[start:end] = np.where(has_prev, col_best, np.arange(start, end))
        return pd.DataFrame(
            {
                id_field: ids,
                "max_id": ids[best_idx],
                "cosine_sim_micro": best,
                "centroid": pdf["centroid"].to_numpy(),
            }
        )

    cols = [id_field, vec_field, "centroid", "cos_dist_micro"]
    return assigned.select(*cols).groupBy("centroid").applyInPandas(per_cluster, schema=out_schema)


def identify_semantic_duplicates(pairwise: DataFrame, eps: float) -> DataFrame:
    """ids to remove: cosine_sim >= 1 - eps (identify_duplicates.py:95-105)."""
    thr = int(round((1.0 - eps) * MICRO))
    return pairwise.where(F.col("cosine_sim_micro") >= F.lit(thr))


def semantic_dedup(
    df: DataFrame,
    cfg: SemanticDedupConfig,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """embeddings -> duplicate rows (id, max_id, cosine_sim_micro,
    centroid): the reference's 3-stage workflow (workflow.py:48-63) as one
    composed plan. Pass ``centroids`` to skip the sample fit."""
    if centroids is None:
        centroids = fit_centroids(
            sample_matrix(df, cfg), cfg.n_clusters, max_iter=cfg.max_iter, seed=cfg.seed
        )
    assigned = kmeans_assign(df, centroids, id_field=cfg.id_field, vec_field=cfg.vec_field)
    pairs = pairwise_max_similarity(
        assigned, which_to_keep=cfg.which_to_keep, seed=cfg.seed,
        id_field=cfg.id_field, vec_field=cfg.vec_field,
    )
    return identify_semantic_duplicates(pairs, cfg.eps)
