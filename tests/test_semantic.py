"""Semantic dedup tests (reference: stages/deduplication/semantic/,
fixture logic mirrored from tests/stages/deduplication/semantic/)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from curator_spark.operators.semantic import (
    SemanticDedupConfig,
    _dist2_to_centroids,
    _normalize_rows,
    fit_centroids,
    identify_semantic_duplicates,
    kmeans_assign,
    kmeans_fit_spark,
    pairwise_max_similarity,
    sample_matrix,
    sample_matrix_parquet,
    semantic_dedup,
)

MICRO = 1_000_000


def _blobs(
    n_per: int = 40, k: int = 4, dim: int = 16, seed: int = 3, dup_pairs: int = 3,
    noise: float = 0.3,
):
    """k well-separated gaussian blobs; the first ``dup_pairs`` rows of the
    matrix get a near-identical twin appended (planted semantic duplicates)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, dim) * 6
    rows, labels = [], []
    for j in range(k):
        pts = centers[j] + noise * rng.randn(n_per, dim)
        rows.append(pts)
        labels += [j] * n_per
    mat = np.vstack(rows)
    twins = mat[: dup_pairs] + 1e-5 * rng.randn(dup_pairs, mat.shape[1])
    mat = np.vstack([mat, twins]).astype(np.float32)
    labels += labels[:dup_pairs]
    return mat, np.array(labels)


def test_fit_centroids_recovers_blobs():
    mat, truth = _blobs()
    cents = fit_centroids(mat, k=4, max_iter=30, seed=42)
    labels = np.argmin(_dist2_to_centroids(_normalize_rows(mat), cents), axis=1)
    # every true blob maps to exactly one fitted centroid
    for j in range(4):
        got = labels[truth == j]
        assert len(set(got.tolist())) == 1
    assert len(set(labels.tolist())) == 4


def test_kmeans_assign_matches_numpy(spark):
    mat, _ = _blobs(n_per=20)
    cents = fit_centroids(mat, k=4, seed=42)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["centroid"] for r in kmeans_assign(df, cents).collect()}
    x = _normalize_rows(mat)
    d2_micro = np.round(
        (1.0 + np.sum(cents * cents, axis=1)[None, :] - 2.0 * (x @ cents.T)) * MICRO
    )
    want = np.argmin(d2_micro, axis=1)
    assert [got[i] for i in range(len(mat))] == want.tolist()


@pytest.mark.parametrize("which", ["hard", "easy", "random"])
def test_pairwise_matches_bruteforce(spark, which):
    mat, _ = _blobs(n_per=15, k=2)
    cfg = SemanticDedupConfig(n_clusters=2, which_to_keep=which)
    cents = fit_centroids(mat, 2, seed=42)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    assigned = kmeans_assign(df, cents)
    got = {
        r["vec_id"]: r["cosine_sim_micro"]
        for r in pairwise_max_similarity(assigned, which_to_keep=which).collect()
    }

    # brute-force oracle: same ranking rules, O(n^2) per cluster
    rows = assigned.collect()
    clusters = {}
    for r in rows:
        clusters.setdefault(r["centroid"], []).append(r)
    want = {}
    for members in clusters.values():
        if which == "hard":
            members.sort(key=lambda r: (-r["cos_dist_micro"], -r["vec_id"]))
        elif which == "easy":
            members.sort(key=lambda r: (r["cos_dist_micro"], r["vec_id"]))
        else:
            import hashlib

            members.sort(key=lambda r: hashlib.md5(f"42|{r['vec_id']}".encode()).hexdigest())
        e = _normalize_rows(np.array([m["embedding"] for m in members]))
        for i, m in enumerate(members):
            if i == 0:
                want[m["vec_id"]] = 0
            else:
                want[m["vec_id"]] = int(np.round(float(np.max(e[:i] @ e[i])) * MICRO))
    assert got == want


def test_semantic_dedup_finds_planted_twins(spark):
    # sparse blobs (15 points, sigma 0.15) keep the closest NON-twin pair
    # well below the eps threshold; twins sit at cosine ~ 1 - 1e-13
    mat, _ = _blobs(n_per=15, k=4, dup_pairs=5, noise=0.15)
    n_orig = len(mat) - 5
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    cfg = SemanticDedupConfig(n_clusters=4, eps=0.0001, sample_size=1000)
    dups = semantic_dedup(df, cfg)
    dup_ids = {r["vec_id"] for r in dups.collect()}
    # each twin pair contributes exactly one removal (the later-ranked one)
    planted = set(range(n_orig, n_orig + 5)) | set(range(5))
    assert len(dup_ids) == 5
    assert dup_ids <= planted


def test_identify_semantic_duplicates_threshold(spark):
    df = spark.createDataFrame(
        [(1, 990001), (2, 989999), (3, 1000000)], "vec_id long, cosine_sim_micro long"
    )
    got = {r["vec_id"] for r in identify_semantic_duplicates(df, eps=0.01).collect()}
    assert got == {1, 3}


def test_kmeans_fit_spark_blobs(spark):
    mat, truth = _blobs(n_per=30, k=3, dup_pairs=0)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    ).repartition(4)
    cents = kmeans_fit_spark(df, 3, SemanticDedupConfig(n_clusters=3, sample_size=20), n_iter=8)
    labels = np.argmin(_dist2_to_centroids(_normalize_rows(mat), cents), axis=1)
    for j in range(3):
        assert len(set(labels[truth == j].tolist())) == 1
    assert len(set(labels.tolist())) == 3


def test_sample_matrix_paths_bit_identical(spark, tmp_path):
    mat, _ = _blobs(n_per=10, k=2, dup_pairs=0)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    ).repartition(3)
    p = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(p)
    cfg = SemanticDedupConfig(sample_size=12)
    a = sample_matrix(spark.read.parquet(p), cfg)
    b = sample_matrix_parquet(p + "/" + [f for f in __import__("os").listdir(p) if f.endswith(".parquet")][0], cfg)
    assert a.shape == b.shape and (a == b).all()


def test_semantic_dedup_pipeline_resume(spark, tmp_path):
    from curator_spark.pipeline import SemanticDedupPipeline

    mat, _ = _blobs(n_per=15, k=4, dup_pairs=5, noise=0.15)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )
    cfg = SemanticDedupConfig(n_clusters=4, eps=0.0001, sample_size=1000)
    pipe = SemanticDedupPipeline(spark, cfg, str(tmp_path / "ck"))
    res = pipe.run(df)
    assert res["num_duplicates"] == 5
    survivors = pipe.remove(df)
    assert survivors.count() == len(mat) - 5
    # resume: second run hits all checkpoints, same result
    res2 = pipe.run(df)
    assert res2["num_duplicates"] == 5
    # a different config hash recomputes (no stale-checkpoint reuse)
    cfg2 = SemanticDedupConfig(n_clusters=4, eps=0.5, sample_size=1000)
    pipe2 = SemanticDedupPipeline(spark, cfg2, str(tmp_path / "ck"))
    assert pipe2.run(df)["num_duplicates"] != 5


@pytest.mark.slow
class TestIvfAnn:
    def test_recall_vs_exact_and_nprobe_monotonic(self, spark):
        import numpy as np

        from curator_spark.operators.similarity import ann_ivf_topk, cosine_topk

        rng = np.random.RandomState(3)
        # 4 well-separated blobs so IVF cells align with structure
        centers = rng.randn(4, 16) * 5
        rows = []
        for i in range(400):
            c = i % 4
            v = centers[c] + rng.randn(16) * 0.3
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        queries = df.where("vec_id < 12")

        exact = {(r.query_id, r.match_id)
                 for r in cosine_topk(df, queries, k=5).collect()}

        def recall(nprobe):
            got = {(r.query_id, r.match_id) for r in ann_ivf_topk(
                df, queries, n_clusters=8, nprobe=nprobe, k=5, seed=1
            ).collect()}
            return len(got & exact) / len(exact)

        r1, r4 = recall(1), recall(4)
        assert r4 >= r1
        assert r4 >= 0.9  # probing half the cells on blob data ~ exact
        assert r1 >= 0.5  # the home cell holds most true neighbors

    def test_validation(self, spark):
        from curator_spark.operators.similarity import ann_ivf_topk

        df = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError):
            ann_ivf_topk(df, df, n_clusters=4, nprobe=5)

    def test_default_n_clusters_scales_with_corpus(self, spark):
        """n_clusters=None derives ~sqrt(N) cells (clamped to >= 4), so a
        grown corpus gets more cells instead of a pinned toy layout, and
        the derived layout still recalls >= 0.9 vs exact on blob data."""
        import numpy as np

        from curator_spark.operators.similarity import ann_ivf_topk, cosine_topk

        rng = np.random.RandomState(7)
        centers = rng.randn(4, 16) * 5
        rows = [
            (i, [float(x) for x in centers[i % 4] + rng.randn(16) * 0.3])
            for i in range(400)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        queries = df.where("vec_id < 8")
        # sqrt(400) = 20 cells: max assigned cell index must reach past a
        # toy fixed-16 layout's range at least once in expectation — assert
        # structurally instead: the derived run must succeed AND recall
        got = {(r.query_id, r.match_id) for r in ann_ivf_topk(
            df, queries, nprobe=10, k=5, seed=1  # n_clusters=None -> 20
        ).collect()}
        exact = {(r.query_id, r.match_id)
                 for r in cosine_topk(df, queries, k=5).collect()}
        assert len(got & exact) / len(exact) >= 0.9
        # derivation formula, unit-level
        import math

        for n, want in [(0, 4), (10, 4), (400, 20), (10**8, 10000), (10**12, 65536)]:
            derived = int(min(max(4, round(math.sqrt(max(n, 1)))), 65536))
            assert derived == want


@pytest.mark.slow
class TestIvfProbeMetricParity:
    def test_probe_uses_assignment_metric(self, spark):
        """Probing must rank cells with the SAME squared-L2-to-raw-centroid
        metric the corpus assignment uses. With cosine probing, a cluster
        whose centroid has a small norm (wide cluster: mean of spread unit
        vectors) can out-rank the assignment cell, and an EXACT duplicate
        of the query becomes unreachable at nprobe=1."""
        import numpy as np

        from curator_spark.operators.similarity import ann_ivf_topk

        u = np.array([1.0, 0.0, 0.0])
        v = np.array([0.8, 0.6, 0.0])
        p1 = np.array([0.0, 0.0, 1.0])        # ⊥ v
        p2 = np.array([-0.6, 0.8, 0.0])       # ⊥ v
        # tight cluster around u (centroid norm ~1)
        tight = [u, *(0.995 * u + 0.0999 * w for w in (p1, -p1, p2, -p2))]
        tight = [t / np.linalg.norm(t) for t in tight]
        # wide cluster: unit vectors at cos 0.4 to v, mean = 0.4*v exactly
        s = np.sqrt(1 - 0.16)
        wide = [0.4 * v + s * p1, 0.4 * v - s * p1,
                0.4 * v + s * p2, 0.4 * v - s * p2]
        # query: x·u = 0.9 (assign cell -> tight), x·v = 0.95
        # (cos to wide centroid 0.95 > 0.9 -> cosine probing picks wide)
        x = np.array([0.9, 0.3833, 0.0])
        x[2] = np.sqrt(1 - x[0] ** 2 - x[1] ** 2)
        rows = [(i, [float(t) for t in vec])
                for i, vec in enumerate([*tight, *wide])]
        dup_id = len(rows)
        rows.append((dup_id, [float(t) for t in x]))  # exact duplicate of x
        corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        queries = spark.createDataFrame(
            [(100, [float(t) for t in x])], "vec_id long, embedding array<float>"
        )
        got = ann_ivf_topk(
            corpus, queries, n_clusters=2, nprobe=1, k=3, seed=5
        ).collect()
        matches = {r.match_id: r.cosine_micro for r in got}
        assert dup_id in matches, "exact duplicate missed: probe cell != assignment cell"
        assert matches[dup_id] == 1_000_000
