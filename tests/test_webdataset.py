"""Snippet extraction + WebDataset tar shard sink/source.

Reference semantics: ``alm/pretrain/extraction.py`` (frame-exact slice,
mono, resample, per-replica tar shards), ``utils.py make_snippet_id``
(WebDataset-safe ids) and ``histogram_30s`` (dense duration bins).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from curator_spark.kernels.alm import (
    histogram_30s,
    make_snippet_id,
    slice_mono_resample,
)


class TestSnippetIdKernel:
    def test_format_and_sanitization(self):
        assert make_snippet_id("utt1", 11.708, 13.97) == "utt1-11_708-13_970"
        # '.' and path separators in the source id become '_'
        assert make_snippet_id("meeting.wav", 0.0, 1.0) == "meeting_wav-0_000-1_000"
        assert make_snippet_id("shard1/utt.2", 0.5, 2.25).startswith("shard1_utt_2-")
        sid = make_snippet_id("a\\b", 1.0, 2.0)
        assert "." not in sid and "/" not in sid and "\\" not in sid

    def test_millisecond_precision_avoids_collisions(self):
        a = make_snippet_id("x", 1.001, 2.0)
        b = make_snippet_id("x", 1.002, 2.0)
        assert a != b


class TestSliceKernel:
    def test_frame_exact_boundaries(self):
        sr = 1000
        samples = np.arange(sr, dtype=np.float32)
        out = slice_mono_resample(samples, sr, 0.1004, 0.2006, sr)
        assert out is not None
        sl, dur = out
        # floor(0.1004*1000)=100, ceil(0.2006*1000)=201
        assert sl[0] == 100.0 and sl[-1] == 200.0 and len(sl) == 101
        assert dur == pytest.approx(101 / 1000)

    def test_clamps_to_clip(self):
        sl, dur = slice_mono_resample(np.ones(50, np.float32), 100, -1.0, 99.0, 100)
        assert len(sl) == 50

    def test_empty_range_returns_none(self):
        assert slice_mono_resample(np.ones(100, np.float32), 100, 0.5, 0.5, 100) is None
        assert slice_mono_resample(np.ones(100, np.float32), 100, 0.9, 0.2, 100) is None

    def test_resample_halves_length(self):
        sl, dur = slice_mono_resample(np.ones(16000, np.float32), 16000, 0.0, 1.0, 8000)
        assert len(sl) == 8000 and dur == pytest.approx(1.0)


class TestHistogramKernel:
    def test_dense_bins_from_zero(self):
        assert histogram_30s([30.0]) == {"0-30": 0, "30-60": 1}
        assert histogram_30s([]) == {}
        assert histogram_30s([5, 65, 65]) == {"0-30": 1, "30-60": 0, "60-90": 2}

    def test_custom_bin_width(self):
        assert histogram_30s([0.0, 9.9, 10.0], bin_width=10) == {"0-10": 2, "10-20": 1}


@pytest.mark.slow
class TestExtractAndShards:
    @pytest.fixture()
    def snippets(self, spark):
        from curator_spark.datagen import generate_clips
        from curator_spark.operators.alm import extract_snippets

        clips = generate_clips(spark, 30, seed=7).withColumnRenamed(
            "clip_id", "audio_id"
        )
        plan = spark.createDataFrame(
            [(f"clip{i:012d}", 0.05, 0.25) for i in range(30)],
            "audio_id string, start double, end double",
        )
        return extract_snippets(clips, plan, target_sample_rate=8000).localCheckpoint()

    def test_extract_matches_kernel(self, spark, snippets):
        from curator_spark.datagen import generate_clips
        from curator_spark.kernels.alm import make_snippet_id, slice_mono_resample
        from curator_spark.kernels.audio import decode_clip, decode_wav_pcm16

        rows = {r.audio_id: r for r in snippets.collect()}
        assert len(rows) == 30
        clips = {r.clip_id: r for r in generate_clips(spark, 30, seed=7).collect()}
        for aid, r in rows.items():
            assert r.extract_error is None
            assert r.snippet_id == make_snippet_id(aid, 0.05, 0.25)
            samples, sr = decode_clip(bytes(clips[aid].bytes), clips[aid].codec)
            exp, exp_dur = slice_mono_resample(samples, sr, 0.05, 0.25, 8000)
            got, got_sr = decode_wav_pcm16(bytes(r.bytes))
            assert got_sr == 8000
            assert r.duration_sec == pytest.approx(exp_dur)
            assert np.allclose(got, exp, atol=1.5 / 32767)

    def test_extract_rejects_unsupported_format(self, spark, snippets):
        from curator_spark.operators.alm import extract_snippets

        with pytest.raises(NotImplementedError):
            extract_snippets(snippets, snippets, output_format="flac")

    def test_tar_shard_roundtrip(self, spark, snippets, tmp_path):
        from curator_spark.io.webdataset import (
            read_tar_samples,
            read_tar_shards,
            write_tar_shards,
        )

        out = str(tmp_path / "shards")
        summary = write_tar_shards(
            snippets.repartition(4), out, "snippet_id",
            {"bytes": "wav"}, meta_cols=["audio_id", "duration_sec"],
        ).collect()
        assert sum(r.n_samples for r in summary) == 30
        assert sum(r.n_members for r in summary) == 60  # wav + json each
        assert all(os.path.getsize(r.shard_path) == r.bytes_written for r in summary)

        long = read_tar_shards(spark, out + "/*.tar")
        assert long.count() == 60
        samples = {r.key: r for r in read_tar_samples(spark, out + "/*.tar").collect()}
        orig = {r.snippet_id: r for r in snippets.collect()}
        assert set(samples) == set(orig)
        import json as _json

        for key, s in samples.items():
            assert sorted(s.exts) == ["json", "wav"]
            wav = dict(zip(s.exts, s.payloads))["wav"]
            assert bytes(wav) == bytes(orig[key].bytes)
            meta = _json.loads(s.meta_json)
            assert meta["audio_id"] == orig[key].audio_id

    def test_write_rejects_bad_keys(self, spark, tmp_path):
        from curator_spark.io.webdataset import write_tar_shards

        df = spark.createDataFrame([("a.b", b"x")], "key string, data binary")
        with pytest.raises(Exception, match="sample key"):
            write_tar_shards(df, str(tmp_path), "key", {"data": "bin"}).collect()

    def test_duration_histogram_operator(self, spark):
        from curator_spark.operators.alm import duration_histogram

        import pyspark.sql.functions as F

        df = spark.createDataFrame([(30.0,), (5.0,), (65.0,), (65.5,)], "d double")
        got = {r.bin_idx: r.n for r in duration_histogram(df, "d").collect()}
        assert got == {0: 1, 1: 1, 2: 2}
        labels = {r.bin_idx: r.bin_label for r in duration_histogram(df, "d").collect()}
        assert labels[2] == "60-90"
        with pytest.raises(ValueError):
            duration_histogram(df, "d", bin_width=0)


@pytest.mark.slow
class TestReconcile:
    def test_drops_missing_and_unreadable(self, spark, tmp_path):
        from curator_spark.io.webdataset import reconcile_manifest, write_tar_shards
        from curator_spark.kernels.audio import encode_wav_pcm16

        good = encode_wav_pcm16(np.ones(800, np.float32) * 0.1, 8000)
        rows = [
            ("snip-ok", good),
            ("snip-corrupt", b"not a wav payload"),
            ("snip-empty", encode_wav_pcm16(np.zeros(0, np.float32), 8000)),
        ]
        df = spark.createDataFrame(rows, "snippet_id string, bytes binary")
        out = str(tmp_path / "sh")
        write_tar_shards(df, out, "snippet_id", {"bytes": "wav"}).collect()

        manifest = spark.createDataFrame(
            [("snip-ok", "a"), ("snip-corrupt", "b"),
             ("snip-empty", "c"), ("snip-missing", "d")],
            "snippet_id string, payload string",
        )
        kept = reconcile_manifest(manifest, spark, out + "/*.tar").collect()
        assert [r.snippet_id for r in kept] == ["snip-ok"]
        # manifest schema passes through untouched
        assert kept[0].payload == "a"


@pytest.mark.slow
def test_tar_shard_commit_protocol(spark, tmp_path):
    """Task-attempt safety: shard names are deterministic per partition
    (a retry overwrites, never duplicates), and an abandoned in-progress
    temp file is invisible to the reader glob."""
    import os

    from curator_spark.io.webdataset import read_tar_shards, write_tar_shards

    df = spark.createDataFrame(
        [(f"k{i}", b"x" * 10) for i in range(20)], "key string, data binary"
    ).repartition(3)
    out = str(tmp_path / "shards")
    first = sorted(r.shard_path for r in write_tar_shards(df, out, "key", {"data": "bin"}).collect())
    assert all(os.path.basename(p).startswith("shard-") and p.endswith(".tar") for p in first)
    # simulate an abandoned attempt: stray in-progress file in out_dir
    stray = os.path.join(out, ".shard-99999.inprogress-deadbeef")
    with open(stray, "wb") as f:
        f.write(b"partial garbage")
    # re-run (the "retry"): same deterministic names, same count
    second = sorted(r.shard_path for r in write_tar_shards(df, out, "key", {"data": "bin"}).collect())
    assert second == first
    rows = read_tar_shards(spark, out + "/*.tar").collect()
    assert sorted({r.key for r in rows}) == sorted(f"k{i}" for i in range(20))
    assert len(rows) == 20  # no duplicated samples despite two write passes


@pytest.mark.slow
def test_tar_shard_rerun_with_fewer_partitions_clears_stale(spark, tmp_path):
    """Cross-RUN overwrite: a re-run that produces fewer partitions must
    not leave the previous run's higher-numbered shards for the glob
    reader to silently mix in."""
    import os

    from curator_spark.io.webdataset import read_tar_shards, write_tar_shards

    out = str(tmp_path / "shards")
    df8 = spark.createDataFrame(
        [(f"old{i}", b"x") for i in range(16)], "key string, data binary"
    ).repartition(8)
    write_tar_shards(df8, out, "key", {"data": "bin"}).collect()
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == 8

    df2 = spark.createDataFrame(
        [(f"new{i}", b"y") for i in range(4)], "key string, data binary"
    ).repartition(2)
    write_tar_shards(df2, out, "key", {"data": "bin"}).collect()
    tars = [f for f in os.listdir(out) if f.endswith(".tar")]
    assert len(tars) == 2, tars  # stale shard-00002..00007 are gone
    rows = read_tar_shards(spark, out + "/*.tar").collect()
    assert sorted(r.key for r in rows) == sorted(f"new{i}" for i in range(4))
