"""Fuzzy-dedup workflow: the reference's FuzzyDeduplicationWorkflow
(fuzzy/workflow.py:292-394), Spark-first.

Phases (each ends in a checkpoint, making every stage resumable — the
reference's stages exchange Parquet on shared storage, workflow.py:229-255):

  IdMapping       (clip_id, _curator_dedup_id)      [id lineage]
  MinHashStage    (id, _minhash_signature[260])
  Edges/band_L-H  (src, dst) per band range          [bands_per_iteration
                                                      driver loop]
  SubstringEdges  (src, dst) verified LCS>=L         [optional]
  ConnectedComponents (id, _duplicate_group_id)
  FuzzyDuplicateIds   (id)                           [keep-first removal]

Early exit when no candidate edges exist (workflow.py:366-369). Metrics
mirror WorkflowRunResult: minhash_time, lsh_time,
connected_components_pipeline_time, num_duplicates, total_time.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .config import GROUP_FIELD, ID_FIELD, ExactDedupConfig, FuzzyDedupConfig
from .io.checkpoint import CheckpointManager
from .operators.connected_components import connected_components
from .operators.duplicates import identify_duplicates, remove_duplicates
from .operators.edges import edges_from_buckets
from .operators.ids import assign_dedup_ids
from .operators.lsh import lsh_bucket_ids
from .operators.minhash_arrow import minhash_stage_arrow
from .operators.minhash_stage import minhash_stage
from .operators.simhash_stage import filter_edges_by_simhash, simhash_stage
from .operators.substring import substring_candidate_edges, verify_substring_edges


class FuzzyDedupPipeline:
    def __init__(
        self,
        spark: SparkSession,
        cfg: FuzzyDedupConfig,
        checkpoint_root: str,
        table_format: str = "parquet",
    ):
        cfg.validate()
        self.spark = spark
        self.cfg = cfg
        self.ckpt = CheckpointManager(checkpoint_root, table_format=table_format)
        self.chash = cfg.config_hash()

    # -- stage helpers ------------------------------------------------------
    def _stage(self, name: str, build) -> DataFrame:
        """Run ``build()`` and checkpoint unless an up-to-date checkpoint
        exists (resume path). Post-hoc stage metrics (e.g. the LSH
        collision stats) attach via ``ckpt.add_metrics``."""
        if self.ckpt.exists(name, self.chash):
            return self.ckpt.read(self.spark, name)
        df = build()
        self.ckpt.write(df, name, self.chash)
        return self.ckpt.read(self.spark, name)

    # -- the workflow ---------------------------------------------------------
    def run(self, df: DataFrame) -> dict:
        cfg = self.cfg
        t_start = time.time()
        if cfg.shuffle_partitions:
            self.spark.conf.set("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
        result: dict = {}

        # PHASE 1 — ids + minhash (project early: bytes never leave the scan;
        # mirrors minhash.py:315-317)
        t0 = time.time()
        slim = df.select(cfg.input_id_field, cfg.text_field)
        need_ids = not (
            self.ckpt.exists("IdMapping", self.chash) and self.ckpt.exists("MinHashStage", self.chash)
        )
        if need_ids:
            # localCheckpoint REGARDLESS of id scheme: with_ids is consumed
            # by two jobs (IdMapping write, MinHashStage write); an
            # unmaterialized monotonically_increasing_id plan re-evaluates
            # per job and, if the upstream partitioning is not
            # bit-deterministic (shuffle, AQE coalesce, non-file source),
            # the two jobs would silently see different ids and remove()
            # would anti-join wrong keys. localCheckpoint TRUNCATES the
            # lineage (persist alone does not): a lost cache block then
            # fails the job loudly instead of being silently recomputed
            # with different ids — the resume path recovers from the
            # durable stage checkpoints.
            id_caches: list = []
            with_ids = assign_dedup_ids(
                slim, contiguous=cfg.contiguous_ids, cache_handle=id_caches
            ).localCheckpoint()
            self.ckpt.write(with_ids.select(cfg.input_id_field, ID_FIELD), "IdMapping", self.chash)
            sig_stage = minhash_stage_arrow if cfg.minhash_impl == "arrow" else minhash_stage
            self.ckpt.write(sig_stage(with_ids, cfg), "MinHashStage", self.chash)
            with_ids.unpersist()
            for frame in id_caches:  # contiguous path's internal two-pass cache
                frame.unpersist()
        idmap = self.ckpt.read(self.spark, "IdMapping")
        sigs = self.ckpt.read(self.spark, "MinHashStage")
        result["minhash_time"] = time.time() - t0

        # PHASE 2 — LSH band loop; buckets materialize per range (the
        # reference writes cache/LSHStage/band_X-band_Y the same way,
        # lsh/stage.py:179-183) and edges derive from the materialized
        # buckets — also measurably faster than fusing bucket compute
        # under the edge window's sort
        t0 = time.time()
        edge_frames = []
        for lo in range(0, cfg.num_bands, cfg.bands_per_iteration):
            hi = min(lo + cfg.bands_per_iteration, cfg.num_bands)
            # occupancy-gated salting: measured bucket stats (fresh or from
            # the manifest on resume) drop the salted plan's extra
            # shuffle+checkpoint when no bucket is actually hot
            range_salts = cfg.num_salts
            if cfg.checkpoint_buckets:
                bname = f"LSHBuckets/band_{lo}-{hi}"
                fresh = not self.ckpt.exists(bname, self.chash)
                buckets = self._stage(
                    bname, lambda lo=lo, hi=hi: lsh_bucket_ids(sigs, cfg, band_range=(lo, hi))
                )
                if fresh and cfg.collision_metrics:
                    # collision metrics for the manifest (north rule):
                    # bucket occupancy tells whether salting is needed
                    stats = (
                        buckets.groupBy("_bh1", "_bh2")
                        .count()
                        .agg(
                            F.count(F.lit(1)).alias("num_buckets"),
                            F.max("count").alias("max_bucket_size"),
                            F.sum(F.when(F.col("count") > 1, 1).otherwise(0)).alias("colliding_buckets"),
                        )
                        .collect()[0]
                    )
                    # max/sum are NULL on an empty bucket frame (empty input)
                    self.ckpt.add_metrics(
                        bname, {k: int(v) for k, v in stats.asDict().items() if v is not None}
                    )
                if range_salts > 1 and cfg.salt_min_bucket_size > 0:
                    m = (self.ckpt.manifest(bname) or {}).get("metrics", {})
                    max_bucket = m.get("max_bucket_size")
                    if max_bucket is not None and max_bucket <= cfg.salt_min_bucket_size:
                        range_salts = 1
            elif cfg.num_salts > 1:
                # no bucket checkpoint: persist — the salted edge generator
                # consumes the bucket frame from multiple windows and a bare
                # plan would recompute all band hashes per consumer
                buckets = lsh_bucket_ids(sigs, cfg, band_range=(lo, hi)).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
            else:
                # unsalted + no checkpoint: single consumer — leave the
                # band-hash UDF fused directly under the edge window's
                # exchange (one pass, no materialization at all)
                buckets = lsh_bucket_ids(sigs, cfg, band_range=(lo, hi))
            edge_frames.append(
                self._stage(
                    f"Edges/band_{lo}-{hi}",
                    # checkpointed buckets are read back from parquet (fresh
                    # attributes) — edges_from_buckets skips its per-branch
                    # localCheckpoint for those (assume_materialized)
                    lambda b=buckets, s=range_salts, m=cfg.checkpoint_buckets: edges_from_buckets(
                        b, num_salts=s, assume_materialized=m
                    ),
                )
            )
            if not cfg.checkpoint_buckets:
                buckets.unpersist()
        edges = edge_frames[0]
        for e in edge_frames[1:]:
            edges = edges.unionByName(e)
        edges = edges.dropDuplicates(["src", "dst"])
        result["lsh_time"] = time.time() - t0

        # (id, text) frame shared by the SimHash and substring stages — built
        # once so the idmap-to-text join (a full-text shuffle on the string
        # key) is a single plan both stages reuse
        docs = idmap.join(slim, cfg.input_id_field)

        # optional SimHash false-positive filter on candidate edges
        if cfg.simhash_hamming_threshold > 0:
            simhashes = self._stage("SimHashStage", lambda: simhash_stage(docs, cfg))
            edges = filter_edges_by_simhash(edges, simhashes, cfg.simhash_hamming_threshold)

        # optional suffix-array exact-substring pass (adds containment edges)
        if cfg.substring_min_length > 0:
            sub_edges = self._stage(
                "SubstringEdges",
                lambda: verify_substring_edges(
                    substring_candidate_edges(
                        docs, min_length=cfg.substring_min_length, text_field=cfg.text_field
                    ),
                    docs,
                    min_length=cfg.substring_min_length,
                    text_field=cfg.text_field,
                ),
            )
            edges = edges.unionByName(sub_edges).dropDuplicates(["src", "dst"])

        # early exit: no candidates at all (workflow.py:366-369). Answer
        # it from the stage manifests' row counts when possible — union +
        # dropDuplicates cannot empty a nonzero edge set and the substring
        # pass only ADDS edges, so a full isEmpty() pass (an extra
        # map+shuffle over every edge) is only needed when the simhash
        # FILTER is on with a nonzero pre-filter count.
        t0 = time.time()
        manifest_rows = sum(
            (self.ckpt.manifest(f"Edges/band_{lo}-{hi}") or {}).get("row_count", 0)
            for lo in range(0, cfg.num_bands, cfg.bands_per_iteration)
            for hi in (min(lo + cfg.bands_per_iteration, cfg.num_bands),)
        )
        if cfg.substring_min_length > 0:
            manifest_rows += (self.ckpt.manifest("SubstringEdges") or {}).get("row_count", 0)
        if manifest_rows == 0:
            no_candidates = True
        elif cfg.simhash_hamming_threshold > 0:
            no_candidates = edges.isEmpty()
        else:
            no_candidates = False
        if no_candidates:
            # write empty components/removal checkpoints so consumers
            # (components()/remove()) work uniformly
            empty_comps = self.spark.createDataFrame([], f"{ID_FIELD} long, {GROUP_FIELD} long")
            self.ckpt.write(empty_comps, "ConnectedComponents", self.chash)
            self.ckpt.write(empty_comps.select(ID_FIELD), "FuzzyDuplicateIds", self.chash)
            result["num_duplicates"] = 0
            result["num_components"] = 0
            result["connected_components_pipeline_time"] = time.time() - t0
            result["total_time"] = time.time() - t_start
            return result

        # PHASE 3 — connected components + keep-first removal ids
        comps = self._stage(
            "ConnectedComponents",
            lambda: connected_components(edges, driver_max_edges=self.cfg.cc_driver_max_edges),
        )
        dup_ids = self._stage("FuzzyDuplicateIds", lambda: identify_duplicates(comps))
        result["num_duplicates"] = self.ckpt.manifest("FuzzyDuplicateIds")["row_count"]
        result["connected_components_pipeline_time"] = time.time() - t0
        result["total_time"] = time.time() - t_start
        # manifest row_count counts NODES in duplicate groups; each group
        # keeps exactly one survivor, so groups = nodes - duplicates. A
        # driver-side subtraction, no extra job.
        result["num_components"] = (
            self.ckpt.manifest("ConnectedComponents")["row_count"]
            - result["num_duplicates"]
        )
        return result

    # -- consumers ------------------------------------------------------------
    def _bucketed_stage(self, stage: str) -> DataFrame:
        """Checkpoint stage as a catalog table bucketed on the dedup id
        (``cfg.bucketed_id_joins`` buckets, per-bucket sorted), created
        lazily from the parquet checkpoint on first use and reused across
        sessions pointing at the same warehouse. Both sides of an
        id join read through here scan pre-hashed, so the join plan has
        ZERO Exchange (asserted in tests/test_pipeline.py)."""
        from .io.bucketed import read_bucketed, write_bucketed

        tbl = f"curator_{stage.lower()}_{self.chash}"
        if not self.spark.catalog.tableExists(tbl):
            write_bucketed(
                self.ckpt.read(self.spark, stage),
                tbl,
                ID_FIELD,
                self.cfg.bucketed_id_joins,
                sort_cols=ID_FIELD,
                path=os.path.join(self.ckpt.root, "bucketed", tbl),
            )
        return read_bucketed(self.spark, tbl)

    def components(self) -> DataFrame:
        """(clip_id, _curator_dedup_id, _duplicate_group_id)."""
        if self.cfg.bucketed_id_joins:
            idmap = self._bucketed_stage("IdMapping").hint("merge")
            comps = self._bucketed_stage("ConnectedComponents").hint("merge")
            return idmap.join(comps, ID_FIELD, "left")
        idmap = self.ckpt.read(self.spark, "IdMapping")
        comps = self.ckpt.read(self.spark, "ConnectedComponents")
        return idmap.join(comps, ID_FIELD, "left")

    def removal_ids(self) -> DataFrame:
        return self.ckpt.read(self.spark, "FuzzyDuplicateIds")

    def remove(self, df: DataFrame) -> DataFrame:
        """Input table -> cleaned table (survivors only)."""
        cfg = self.cfg
        if cfg.bucketed_id_joins:
            idmap = self._bucketed_stage("IdMapping").hint("merge")
            removal = self._bucketed_stage("FuzzyDuplicateIds").hint("merge")
            removal_keys = idmap.join(removal, ID_FIELD).select(cfg.input_id_field)
            return df.join(removal_keys, cfg.input_id_field, "left_anti")
        idmap = self.ckpt.read(self.spark, "IdMapping")
        removal_keys = idmap.join(self.removal_ids(), ID_FIELD).select(cfg.input_id_field)
        return df.join(removal_keys, cfg.input_id_field, "left_anti")


class ExactDedupPipeline:
    """The reference's ExactDeduplicationWorkflow (exact/workflow.py:195-287),
    Spark-first: one job — md5 over content fields -> keep-first per hash
    group -> removal-id checkpoint; removal is an anti-join
    (text/deduplication/removal.py:61-102).

    Stages/checkpoints: ExactIdMapping, ExactDuplicateIds.
    """

    def __init__(
        self,
        spark: SparkSession,
        cfg: ExactDedupConfig,
        checkpoint_root: str,
        table_format: str = "parquet",
    ):
        self.spark = spark
        self.cfg = cfg
        self.ckpt = CheckpointManager(checkpoint_root, table_format=table_format)
        self.chash = cfg.config_hash()

    def run(self, df: DataFrame) -> dict:
        from .operators.duplicates import exact_duplicates, identify_duplicates

        cfg = self.cfg
        t0 = time.time()
        cols = [cfg.input_id_field, *cfg.fields]
        if cfg.hash_audio_content:
            cols += ["bytes", "codec"]
        slim = df.select(*dict.fromkeys(cols))
        if not (
            self.ckpt.exists("ExactIdMapping", self.chash)
            and self.ckpt.exists("ExactDuplicateIds", self.chash)
        ):
            # localCheckpoint: with_ids feeds two checkpoint writes; see
            # FuzzyDedup phase 1 for why re-evaluating monotonic ids is
            # unsafe and why lineage truncation (not just persist) is the
            # guarantee
            with_ids = assign_dedup_ids(slim, contiguous=False).localCheckpoint()
            groups = exact_duplicates(
                with_ids, fields=cfg.fields, hash_audio_content=cfg.hash_audio_content
            )
            self.ckpt.write(with_ids.select(cfg.input_id_field, ID_FIELD), "ExactIdMapping", self.chash)
            self.ckpt.write(identify_duplicates(groups, group_field=GROUP_FIELD), "ExactDuplicateIds", self.chash)
            with_ids.unpersist()
        n_dups = self.ckpt.manifest("ExactDuplicateIds")["row_count"]
        return {"num_duplicates": n_dups, "total_time": time.time() - t0}

    def removal_ids(self) -> DataFrame:
        return self.ckpt.read(self.spark, "ExactDuplicateIds")

    def remove(self, df: DataFrame) -> DataFrame:
        idmap = self.ckpt.read(self.spark, "ExactIdMapping")
        keys = idmap.join(self.removal_ids(), ID_FIELD).select(self.cfg.input_id_field)
        return df.join(keys, self.cfg.input_id_field, "left_anti")


class SemanticDedupPipeline:
    """The reference's SemanticDeduplicationWorkflow
    (semantic/workflow.py:48-63): KMeansStage -> PairwiseStage ->
    IdentifyDuplicatesStage, each stage a resumable checkpoint.

    Stages/checkpoints:
      KMeansCentroids     (centroid_id, vector)   [the reference caches
                          kmeans_centroids.npy the same way, kmeans.py:215-217]
      KMeansAssignments   (id, vec, centroid, dist cols), written
                          partitioned by centroid — the reference's
                          partition_cols=["centroid"] layout so the
                          pairwise stage reads one cluster per task
      PairwiseScores      (id, max_id, cosine_sim_micro, centroid)
      SemanticDuplicateIds(id)
    """

    def __init__(self, spark, cfg, checkpoint_root: str, table_format: str = "parquet"):
        from .operators.semantic import SemanticDedupConfig  # noqa: F401

        self.spark = spark
        self.cfg = cfg
        self.ckpt = CheckpointManager(checkpoint_root, table_format=table_format)
        self.chash = cfg.config_hash()

    def run(self, df: DataFrame) -> dict:
        import numpy as np

        from .operators.semantic import (
            fit_centroids,
            identify_semantic_duplicates,
            kmeans_assign,
            pairwise_max_similarity,
            sample_matrix,
        )

        cfg = self.cfg
        t0 = time.time()
        result: dict = {}
        if not self.ckpt.exists("KMeansCentroids", self.chash):
            cents = fit_centroids(
                sample_matrix(df, cfg), cfg.n_clusters, max_iter=cfg.max_iter, seed=cfg.seed
            )
            cdf = self.spark.createDataFrame(
                [(i, [float(x) for x in row]) for i, row in enumerate(cents)],
                "centroid_id int, vector array<double>",
            )
            self.ckpt.write(cdf, "KMeansCentroids", self.chash)
        crows = self.ckpt.read(self.spark, "KMeansCentroids").orderBy("centroid_id").collect()
        cents = np.array([r["vector"] for r in crows])
        result["kmeans_fit_time"] = time.time() - t0

        t0 = time.time()
        if not self.ckpt.exists("KMeansAssignments", self.chash):
            assigned = kmeans_assign(df, cents, id_field=cfg.id_field, vec_field=cfg.vec_field)
            self.ckpt.write(assigned, "KMeansAssignments", self.chash, partition_by=["centroid"])
        assigned = self.ckpt.read(self.spark, "KMeansAssignments")
        result["kmeans_assign_time"] = time.time() - t0

        t0 = time.time()
        if not self.ckpt.exists("PairwiseScores", self.chash):
            pairs = pairwise_max_similarity(
                assigned, which_to_keep=cfg.which_to_keep, seed=cfg.seed,
                id_field=cfg.id_field, vec_field=cfg.vec_field,
            )
            self.ckpt.write(pairs, "PairwiseScores", self.chash)
        pairs = self.ckpt.read(self.spark, "PairwiseScores")
        if not self.ckpt.exists("SemanticDuplicateIds", self.chash):
            dup_ids = identify_semantic_duplicates(pairs, cfg.eps).select(cfg.id_field)
            self.ckpt.write(dup_ids, "SemanticDuplicateIds", self.chash)
        result["pairwise_time"] = time.time() - t0
        result["num_duplicates"] = self.ckpt.manifest("SemanticDuplicateIds")["row_count"]
        return result

    def removal_ids(self) -> DataFrame:
        return self.ckpt.read(self.spark, "SemanticDuplicateIds")

    def remove(self, df: DataFrame) -> DataFrame:
        return df.join(self.removal_ids(), self.cfg.id_field, "left_anti")


def dedup_pair_recall(found: DataFrame, expected: DataFrame, key: str, found_label: str, expected_label: str) -> float:
    """|pairs(found) ∩ pairs(expected)| / |pairs(expected)| over same-cluster
    pairs (label-invariant, SURVEY §7.0-5). Both inputs: (key, label)."""
    f = found.select(F.col(key), F.col(found_label).alias("_fl"))
    e = expected.select(F.col(key), F.col(expected_label).alias("_el"))
    e_pairs = (
        e.alias("a")
        .join(e.alias("b"), F.col(f"a._el") == F.col(f"b._el"))
        .where(F.col(f"a.{key}") < F.col(f"b.{key}"))
        .select(F.col(f"a.{key}").alias("k1"), F.col(f"b.{key}").alias("k2"))
    )
    f_pairs = (
        f.alias("a")
        .join(f.alias("b"), F.col(f"a._fl") == F.col(f"b._fl"))
        .where(F.col(f"a.{key}") < F.col(f"b.{key}"))
        .select(F.col(f"a.{key}").alias("k1"), F.col(f"b.{key}").alias("k2"))
    )
    total = e_pairs.count()
    if total == 0:
        return 1.0
    hit = e_pairs.join(f_pairs, ["k1", "k2"], "left_semi").count()
    return hit / total


class TieredDedupPipeline:
    """Tier dedup: exact -> fuzzy -> (optional) semantic, each tier
    running ONLY on the previous tier's survivors.

    The reference ships the three identification workflows separately
    (exact/workflow.py:195, fuzzy/workflow.py, semantic/workflow.py:48)
    and users chain them with TextDuplicatesRemovalWorkflow between
    (tutorials/math/5_deduplication.py:130-172); this class is that
    cascade as one resumable unit. Ordering is the whole point at scale:
    the O(1)-per-row exact hash pass shrinks the corpus before the
    MinHash/LSH tier pays per-shingle work, and the semantic tier (the
    only one needing embeddings) sees the smallest survivor set. Each
    tier keeps its own checkpoint namespace, so a resumed run skips
    every finished tier.

    ``run`` returns per-tier duplicate counts / times plus survivor
    counts; ``survivors`` returns the final deduplicated frame.
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_root: str,
        exact_cfg: ExactDedupConfig | None = None,
        fuzzy_cfg: FuzzyDedupConfig | None = None,
        semantic_cfg=None,
        table_format: str = "parquet",
    ):
        self.spark = spark
        self.exact = ExactDedupPipeline(
            spark, exact_cfg or ExactDedupConfig(), f"{checkpoint_root}/tier_exact",
            table_format=table_format,
        )
        self.fuzzy = (
            FuzzyDedupPipeline(
                spark, fuzzy_cfg, f"{checkpoint_root}/tier_fuzzy",
                table_format=table_format,
            )
            if fuzzy_cfg is not None
            else None
        )
        self.semantic = (
            SemanticDedupPipeline(
                spark, semantic_cfg, f"{checkpoint_root}/tier_semantic",
                table_format=table_format,
            )
            if semantic_cfg is not None
            else None
        )
        # Downstream tiers consume the UPSTREAM tiers' survivor sets, so
        # their checkpoint identity must fold in the upstream configs:
        # otherwise re-running with a changed exact_cfg against the same
        # checkpoint_root would let tier_fuzzy's manifests (keyed only on
        # fuzzy_cfg) serve stale results computed from the OLD survivors.
        import hashlib as _hl

        def _chain(own: str, *upstream: str) -> str:
            return _hl.sha256("|".join([own, *upstream]).encode()).hexdigest()[:16]

        if self.fuzzy is not None:
            self.fuzzy.chash = _chain(self.fuzzy.chash, self.exact.chash)
        if self.semantic is not None:
            up = [self.exact.chash] + (
                [self.fuzzy.chash] if self.fuzzy is not None else []
            )
            self.semantic.chash = _chain(self.semantic.chash, *up)
        self._final: DataFrame | None = None

    def run(self, df: DataFrame, embeddings: DataFrame | None = None) -> dict:
        """``df`` feeds the exact and fuzzy tiers; ``embeddings`` (id +
        vector, same id field) is required iff a semantic config was
        given — the semantic tier scores only ids that survived the
        earlier tiers (semi-join, never the full embedding table)."""
        result: dict = {}
        t0 = time.time()
        result["exact"] = self.exact.run(df)
        survivors = self.exact.remove(df)
        # materialize the survivor set once: it feeds the next tier's full
        # pipeline (many jobs) and the survivor count
        survivors = survivors.localCheckpoint()
        result["exact"]["survivors"] = survivors.count()

        if self.fuzzy is not None:
            result["fuzzy"] = self.fuzzy.run(survivors)
            survivors = self.fuzzy.remove(survivors).localCheckpoint()
            result["fuzzy"]["survivors"] = survivors.count()

        if self.semantic is not None:
            if embeddings is None:
                raise ValueError("semantic tier configured but no embeddings frame given")
            id_field = self.semantic.cfg.id_field
            surv_vecs = embeddings.join(
                survivors.select(F.col(self.exact.cfg.input_id_field).alias(id_field)),
                id_field,
                "left_semi",
            )
            result["semantic"] = self.semantic.run(surv_vecs)
            survivors = survivors.join(
                self.semantic.removal_ids().select(
                    F.col(id_field).alias(self.exact.cfg.input_id_field)
                ),
                self.exact.cfg.input_id_field,
                "left_anti",
            ).localCheckpoint()
            result["semantic"]["survivors"] = survivors.count()

        self._final = survivors
        result["total_time"] = time.time() - t0
        return result

    def survivors(self) -> DataFrame:
        if self._final is None:
            raise RuntimeError("run() has not completed")
        return self._final
