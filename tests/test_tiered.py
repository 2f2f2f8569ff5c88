"""Tiered dedup cascade: exact -> fuzzy (-> semantic) on survivors only.

The clips fixture plants, per block of 20 rows: an exact transcript
pair (0,1), a 3-row fuzzy cluster (2,3,4), a substring pair (5,6 — NOT
near-dup at J>=0.85), and a near-dup-audio pair with IDENTICAL
transcripts (7,8). So the exact tier must remove one of {0,1} and one
of {7,8}; the fuzzy tier must then remove two of {2,3,4}; substring
pairs survive both.
"""

from __future__ import annotations

import pytest


@pytest.mark.slow
class TestTieredDedup:
    def test_planted_clusters_fall_to_the_right_tier(self, spark, tmp_path):
        from curator_spark.config import ExactDedupConfig, FuzzyDedupConfig
        from curator_spark.datagen import generate_clips
        from curator_spark.pipeline import TieredDedupPipeline

        n = 100  # 5 blocks
        clips = generate_clips(spark, n, seed=5).select("clip_id", "transcript")
        pipe = TieredDedupPipeline(
            spark,
            str(tmp_path / "ckpt"),
            exact_cfg=ExactDedupConfig(fields=("transcript",)),
            fuzzy_cfg=FuzzyDedupConfig(
                char_ngrams=12, num_bands=20, minhashes_per_band=4
            ),
        )
        result = pipe.run(clips)
        blocks = n // 20
        # exact tier: one dup from the exact pair + one from the
        # identical-transcript audio pair, per block
        assert result["exact"]["num_duplicates"] == 2 * blocks
        assert result["exact"]["survivors"] == n - 2 * blocks
        # fuzzy tier: the 3-row cluster collapses to 1 per block (2 dups);
        # at 20 bands x 4 rows the substring pair (J ~ 0.5, containment)
        # is ALSO a candidate with ~72% probability per block, so it may
        # add up to one more removal per block. The exact pairs are GONE
        # already (tier ordering worked), so the floor is exact.
        assert 2 * blocks <= result["fuzzy"]["num_duplicates"] <= 3 * blocks
        assert result["fuzzy"]["survivors"] == n - 2 * blocks - result["fuzzy"]["num_duplicates"]

        surv = pipe.survivors()
        ids = {r.clip_id for r in surv.collect()}
        assert len(ids) == result["fuzzy"]["survivors"]
        # per planted block: exactly one of the exact pair, one of the
        # audio pair, one of the fuzzy cluster; at least one substring row
        for b in range(blocks):
            base = b * 20
            def cid(i):
                return f"clip{base + i:012d}"
            assert len(ids & {cid(0), cid(1)}) == 1
            assert len(ids & {cid(7), cid(8)}) == 1
            assert len(ids & {cid(2), cid(3), cid(4)}) == 1
            assert 1 <= len(ids & {cid(5), cid(6)}) <= 2
            # uniques always survive every tier
            assert {cid(i) for i in range(9, 20)} <= ids

    def test_resume_skips_finished_tiers(self, spark, tmp_path):
        from curator_spark.config import ExactDedupConfig, FuzzyDedupConfig
        from curator_spark.datagen import generate_clips
        from curator_spark.pipeline import TieredDedupPipeline

        clips = generate_clips(spark, 40, seed=5).select("clip_id", "transcript")
        root = str(tmp_path / "ckpt")
        cfgs = dict(
            exact_cfg=ExactDedupConfig(fields=("transcript",)),
            fuzzy_cfg=FuzzyDedupConfig(char_ngrams=12, num_bands=20, minhashes_per_band=4),
        )
        r1 = TieredDedupPipeline(spark, root, **cfgs).run(clips)
        r2 = TieredDedupPipeline(spark, root, **cfgs).run(clips)
        assert r2["exact"]["num_duplicates"] == r1["exact"]["num_duplicates"]
        assert r2["fuzzy"]["num_duplicates"] == r1["fuzzy"]["num_duplicates"]
        assert r2["fuzzy"]["survivors"] == r1["fuzzy"]["survivors"]

    def test_semantic_tier_requires_embeddings(self, spark, tmp_path):
        from curator_spark.config import ExactDedupConfig
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.semantic import SemanticDedupConfig
        from curator_spark.pipeline import TieredDedupPipeline

        clips = generate_clips(spark, 20, seed=5).select("clip_id", "transcript")
        pipe = TieredDedupPipeline(
            spark, str(tmp_path / "c"),
            exact_cfg=ExactDedupConfig(fields=("transcript",)),
            semantic_cfg=SemanticDedupConfig(n_clusters=2, id_field="clip_id"),
        )
        with pytest.raises(ValueError, match="embeddings"):
            pipe.run(clips)


@pytest.mark.slow
class TestSemanticTier:
    def test_semantic_tier_runs_on_survivors_only(self, spark, tmp_path):
        import numpy as np

        from curator_spark.config import ExactDedupConfig, FuzzyDedupConfig
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.semantic import SemanticDedupConfig
        from curator_spark.pipeline import TieredDedupPipeline

        n = 40  # 2 blocks
        clips = generate_clips(spark, n, seed=5).select("clip_id", "transcript")

        # embeddings: two planted near-identical vectors among SURVIVOR rows
        # (rows 9..19 are unique in every block and survive tiers 1-2);
        # rows removed earlier get distinctive vectors that would ALSO be
        # near-dups — the semantic tier must never see them
        rng = np.random.RandomState(0)
        rows = []
        for i in range(n):
            cid = f"clip{i:012d}"
            r, b = i % 20, i // 20
            # per-block ORTHOGONAL directions: cosine is scale-invariant, so
            # pairs planted in different blocks must not share a direction
            if r in (9, 10):       # planted semantic pair among survivors
                v = np.zeros(8)
                v[b] = 10.0
                v += rng.randn(8) * 1e-4
            elif r in (0, 1):      # exact-pair rows: near-dup vectors too
                v = np.zeros(8)
                v[4 + b] = 10.0
                v += rng.randn(8) * 1e-4
            else:
                v = rng.randn(8) * 3
            rows.append((cid, [float(x) for x in v]))
        emb = spark.createDataFrame(rows, "clip_id string, embedding array<float>")

        pipe = TieredDedupPipeline(
            spark,
            str(tmp_path / "ck"),
            exact_cfg=ExactDedupConfig(fields=("transcript",)),
            fuzzy_cfg=FuzzyDedupConfig(char_ngrams=12, num_bands=20, minhashes_per_band=4),
            semantic_cfg=SemanticDedupConfig(
                n_clusters=4, eps=0.01, id_field="clip_id", vec_field="embedding",
                sample_size=64, seed=1,
            ),
        )
        result = pipe.run(clips, embeddings=emb)
        # semantic tier removed one of each planted survivor pair (1/block)
        assert result["semantic"]["num_duplicates"] == 2
        ids = {r.clip_id for r in pipe.survivors().collect()}
        for b in range(2):
            pair = {f"clip{b * 20 + 9:012d}", f"clip{b * 20 + 10:012d}"}
            assert len(ids & pair) == 1
        assert result["semantic"]["survivors"] == result["fuzzy"]["survivors"] - 2


class TestTieredCheckpointIdentity:
    def test_upstream_config_change_invalidates_downstream_tier(
        self, spark, tmp_path
    ):
        """tier_fuzzy's checkpoints must fold in the exact tier's config:
        re-running with a different exact_cfg against the same root must
        NOT serve fuzzy results computed from the old survivor set."""
        from curator_spark.config import ExactDedupConfig, FuzzyDedupConfig
        from curator_spark.pipeline import TieredDedupPipeline

        fz = FuzzyDedupConfig(char_ngrams=12, num_bands=20, minhashes_per_band=4)
        root = str(tmp_path / "ck")
        p1 = TieredDedupPipeline(
            spark, root, exact_cfg=ExactDedupConfig(fields=("transcript",)),
            fuzzy_cfg=fz,
        )
        p2 = TieredDedupPipeline(
            spark, root, exact_cfg=ExactDedupConfig(fields=("transcript", "speaker")),
            fuzzy_cfg=fz,
        )
        # same fuzzy config, different upstream -> different fuzzy identity
        assert p1.fuzzy.chash != p2.fuzzy.chash
        # same configs -> stable identity (resume still works)
        p1b = TieredDedupPipeline(
            spark, root, exact_cfg=ExactDedupConfig(fields=("transcript",)),
            fuzzy_cfg=fz,
        )
        assert p1.fuzzy.chash == p1b.fuzzy.chash

    def test_num_components_counts_groups_not_nodes(self, spark, tmp_path):
        """num_components = distinct duplicate groups (one per cluster),
        not the node count of the components checkpoint."""
        from curator_spark.config import FuzzyDedupConfig
        from curator_spark.pipeline import FuzzyDedupPipeline

        # 3 identical transcripts (1 component of 3 nodes) + 2 identical
        # (1 component of 2 nodes) + unique rows
        base = "the quick brown fox jumps over the lazy dog " * 3
        rows = (
            [(f"a{i}", base) for i in range(3)]
            + [(f"b{i}", base.replace("quick", "rapid")) for i in range(2)]
            + [(f"u{i}", f"completely unrelated transcript {i} with words "
                          f"{'x'*i}") for i in range(4)]
        )
        df = spark.createDataFrame(rows, "clip_id string, transcript string")
        cfg = FuzzyDedupConfig(char_ngrams=12, num_bands=20, minhashes_per_band=4)
        pipe = FuzzyDedupPipeline(spark, cfg, str(tmp_path / "ck"))
        res = pipe.run(df)
        comps = pipe.components()
        n_nodes = comps.count()
        n_groups = comps.select("_duplicate_group_id").distinct().count()
        assert n_groups < n_nodes  # every group has >= 2 nodes
        assert res["num_components"] == n_groups
        assert res["num_duplicates"] == n_nodes - n_groups
