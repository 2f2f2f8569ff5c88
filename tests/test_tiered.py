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
