"""Fixed-stride video clip planning (reference
stages/video/clipping/clip_extraction_stages.py:350-416) and the
built-in uuid5 Column."""

from __future__ import annotations

import uuid

import pytest


def reference_replica(num_frames, framerate, clip_len, stride, min_len):
    """Direct python replica of FixedStrideExtractorStage.process, with
    k*stride instead of the reference's float accumulation (the operator's
    documented deviation)."""
    if not framerate or framerate <= 0:
        return []
    duration = num_frames / framerate
    out = []
    k = 0
    while k * stride < duration:
        s = k * stride
        e = min(s + clip_len, duration)
        if e - s >= min_len:
            out.append((s, e, int(s * framerate), int(e * framerate)))
        k += 1
    return out


class TestUuid5Column:
    def test_matches_stdlib_uuid5(self, spark):
        from pyspark.sql import functions as F

        from curator_spark.operators import uuid5_column

        names = ["v1_0_120", "файл_3_99", "a b/c_7_8", ""]
        df = spark.createDataFrame([(n,) for n in names], "name string")
        got = {r.name: r.u for r in df.select("name", uuid5_column(F.col("name")).alias("u")).collect()}
        for n in names:
            assert got[n] == str(uuid.uuid5(uuid.NAMESPACE_URL, n)), n


class TestFixedStrideClips:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "video_id string, num_frames long, framerate double"
        )

    def test_matches_replica_grid(self, spark):
        from curator_spark.operators import fixed_stride_clips

        rows = [
            ("v0", 3000, 25.0),    # 120 s
            ("v1", 299, 30.0),     # ~10 s, tail shorter than min
            ("v2", 100, 0.0),      # bad framerate -> no clips
            ("v3", 0, 24.0),       # empty video
            ("v4", 7501, 29.97),   # non-integral duration
            ("v5", 450, 15.0),     # exactly 30 s (duration == k*stride edge)
        ]
        out = fixed_stride_clips(
            self._df(spark, rows), clip_len_s=10.0, clip_stride_s=7.5,
            min_clip_length_s=2.0,
        ).collect()
        got = {
            (r.video_id, round(r.start, 9), round(r.end, 9), r.start_event, r.end_event)
            for r in out
        }
        expected = set()
        for vid, nf, fr in rows:
            for s, e, se, ee in reference_replica(nf, fr, 10.0, 7.5, 2.0):
                expected.add((vid, round(s, 9), round(e, 9), se, ee))
        assert got == expected
        # uuid is the reference's uuid5 over file_startevent_endevent
        by_events = {(r.video_id, r.start_event, r.end_event): r.clip_uuid for r in out}
        for (vid, se, ee), u in by_events.items():
            assert u == str(uuid.uuid5(uuid.NAMESPACE_URL, f"{vid}_{se}_{ee}"))

    def test_limit_clips_caps_per_video(self, spark):
        from curator_spark.operators import fixed_stride_clips

        df = self._df(spark, [("v", 30000, 25.0)])  # 1200 s -> 160 spans
        out = fixed_stride_clips(
            df, clip_len_s=10.0, clip_stride_s=7.5, min_clip_length_s=2.0,
            limit_clips=5,
        ).collect()
        assert len(out) == 5
        assert [r.start for r in out] == [0.0, 7.5, 15.0, 22.5, 30.0]

    def test_stride_validation(self, spark):
        from curator_spark.operators import fixed_stride_clips

        with pytest.raises(ValueError):
            fixed_stride_clips(self._df(spark, []), 10.0, 0.0, 1.0)

    def test_plan_has_no_shuffle_or_python(self, spark):
        from curator_spark.operators import fixed_stride_clips

        df = self._df(spark, [("v", 3000, 25.0)])
        plan = (
            fixed_stride_clips(df, 10.0, 7.5, 2.0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "PythonUDF" not in plan and "ArrowEval" not in plan
