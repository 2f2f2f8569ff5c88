"""JSONL IO, audio manifests, AddId/Splitter/Joiner, WER stage."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from curator_spark.io import (
    read_audio_manifest,
    read_jsonl,
    write_audio_manifest,
    write_jsonl,
)
from curator_spark.operators import add_id, compute_wer, document_joiner, document_splitter


def test_jsonl_roundtrip(spark, tmp_path):
    rows = [(1, "héllo wörld", "en"), (2, "ça va 🎉", "fr"), (3, None, "de")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    p = str(tmp_path / "out_jsonl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, schema="doc_id long, text string, lang string")
    got = {(r.doc_id, r.text, r.lang) for r in back.collect()}
    assert got == set(rows)  # UTF-8 preserved (force_ascii=False contract)


def test_read_jsonl_projection_and_ids(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        for i in range(10):
            f.write(json.dumps({"doc_id": i, "text": f"t{i}", "extra": "x"}) + "\n")
    df = read_jsonl(spark, p, columns=["doc_id", "text"], schema="doc_id long, text string, extra string", assign_id=True)
    assert set(df.columns) == {"doc_id", "text", "_curator_dedup_id"}
    assert df.count() == 10
    assert df.select("_curator_dedup_id").distinct().count() == 10


def test_audio_manifest_roundtrip(spark, tmp_path):
    p = str(tmp_path / "manifest.jsonl")
    entries = [
        {"audio_filepath": "/a/1.wav", "text": "hello", "duration": 1.5},
        {"audio_filepath": "/a/2.wav", "text": "wörld", "duration": 2.0, "lang": "de"},
    ]
    with open(p, "w") as f:
        for e in entries:
            f.write(json.dumps(e, ensure_ascii=False) + "\n")
    df = read_audio_manifest(spark, p)
    got = {(r.audio_filepath, r.text, r.duration, r.lang) for r in df.collect()}
    assert got == {("/a/1.wav", "hello", 1.5, None), ("/a/2.wav", "wörld", 2.0, "de")}
    out = str(tmp_path / "manifest_out")
    write_audio_manifest(df, out)
    back = read_audio_manifest(spark, out)
    assert back.count() == 2


def test_add_id_prefix_unique(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "v long").repartition(5)
    out = add_id(df, id_field="doc_id", prefix="corpus")
    ids = [r.doc_id for r in out.collect()]
    assert len(set(ids)) == 500
    assert all(i.startswith("corpus_") for i in ids)
    with pytest.raises(ValueError):
        add_id(out, id_field="doc_id", prefix="x")
    assert add_id(out, id_field="doc_id", overwrite=True).count() == 500


def test_splitter_joiner_inverse(spark):
    rows = [(1, "Hello\n\nWorld\n\n!"), (2, "single"), (3, "a\n\nb")]
    df = spark.createDataFrame(rows, "id long, text string")
    segs = document_splitter(df, "\n\n")
    assert segs.where(F.col("id") == 1).count() == 3
    assert {r.segment_id for r in segs.where(F.col("id") == 1).collect()} == {0, 1, 2}
    joined = document_joiner(segs, "\n\n", document_id_field="id")
    got = {(r.id, r.text) for r in joined.collect()}
    assert got == set(rows)


def test_joiner_max_length_rechunk(spark):
    # reference joiner.py:95-140 greedy accumulation incl. separator length
    rows = [(1, i, t, len(t)) for i, t in enumerate(["aaaa", "bbbb", "cccc", "dd"])]
    df = spark.createDataFrame(rows, "id long, segment_id long, text string, length long")
    out = document_joiner(
        df, "-", document_id_field="id", max_length=9, length_field="length",
        drop_segment_id_field=False,
    ).orderBy("segment_id")
    got = [(r.text, r.length, r.segment_id) for r in out.collect()]
    # aaaa-bbbb (len 9), cccc-dd (len 7)
    assert got == [("aaaa-bbbb", 9, 0), ("cccc-dd", 7, 1)]


def test_wer_stage(spark):
    from curator_spark.kernels.wer import clean_text, word_error_rate_detail

    # hand-computed: ref "a b c d", hyp "a x c" -> 1 sub (b->x) + 1 del (d)
    wer, n, ins, dele, sub = word_error_rate_detail("a x c", "a b c d")
    assert (wer, n, ins, dele, sub) == (0.5, 4, 0.0, 0.25, 0.25)
    assert word_error_rate_detail("same text", "same text")[0] == 0.0
    assert word_error_rate_detail("", "a b")[0] == 1.0  # 2 deletions / 2
    assert word_error_rate_detail("a b", "")[0] == float("inf")
    assert clean_text("  héllo :  wörld ! ") == "héllo wörld"

    df = spark.createDataFrame(
        [("a x c", "a b c d"), ("same", "same")], "text string, text_ref string"
    )
    out = {r.text: r for r in compute_wer(df).collect()}
    assert out["a x c"].wer_micro == 500_000
    assert out["a x c"].ref_tokens == 4
    assert out["same"].wer_micro == 0 and out["same"].cer_micro == 0


def test_read_parquet_partitioning_controls(spark, tmp_path):
    from curator_spark.io import read_parquet
    from pyspark.sql import functions as F

    src = str(tmp_path / "multi")
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    df.repartition(8).write.parquet(src)  # 8 part files

    out = read_parquet(spark, src, columns=["id"])
    assert out.columns == ["id"] and out.count() == 1000

    # limit truncates the file list (whole-file pruning)
    limited = read_parquet(spark, src, limit=3)
    assert 0 < limited.count() < 1000
    assert limited.rdd.getNumPartitions() <= 3 + 1

    # files_per_partition packs whole files into exact groups: 8 files at
    # fpp=4 -> exactly 2 partitions (a count the default planner, which
    # gives one split per small file, cannot produce)
    packed = read_parquet(spark, src, files_per_partition=4)
    assert packed.count() == 1000
    assert packed.rdd.getNumPartitions() == 2
    assert read_parquet(spark, src, files_per_partition=1).rdd.getNumPartitions() == 8
    assert read_parquet(spark, src, files_per_partition=3).rdd.getNumPartitions() == 3

    # blocksize groups by cumulative size: cap of one file's size -> one
    # group per file; huge cap -> a single group
    import glob
    import os

    sizes = [os.path.getsize(f) for f in glob.glob(src + "/*.parquet")]
    assert read_parquet(spark, src, blocksize=max(sizes)).rdd.getNumPartitions() == 8
    assert read_parquet(spark, src, blocksize=1 << 30).rdd.getNumPartitions() == 1

    with_ids = read_parquet(spark, src, assign_id=True)
    assert with_ids.select("_curator_dedup_id").distinct().count() == 1000


def test_id_range_ops(spark):
    from curator_spark.operators import filter_by_id_range, id_range

    df = spark.range(5, 105).withColumnRenamed("id", "_curator_dedup_id")
    lo, hi = id_range(df)
    assert (lo, hi) == (5, 104)
    assert filter_by_id_range(df, 10, 19).count() == 10


def test_checkpoint_manifest_per_file_lineage(spark, tmp_path):
    from curator_spark.io.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    df = spark.range(1000).repartition(4)
    manifest = ckpt.write(df, "Stage", "cfg0")
    assert manifest["row_count"] == 1000
    assert manifest["num_files"] == 4
    # per-partition lineage: every data file carries its own footer row
    # count, and they reconcile with the stage total
    assert all(f["rows"] > 0 for f in manifest["files"])
    assert sum(f["rows"] for f in manifest["files"]) == 1000
    assert ckpt.exists("Stage", "cfg0") and not ckpt.exists("Stage", "cfg1")


def test_read_parquet_mixed_listable_and_glob_raises(spark, tmp_path):
    from curator_spark.io.readers import read_parquet

    """A path list mixing locally-listable dirs with glob/remote entries
    must refuse loudly — the old behavior silently dropped the entries
    the local lister couldn't walk."""
    import pytest as _pytest

    d = tmp_path / "p1"
    spark.range(5).write.parquet(str(d))
    with _pytest.raises(ValueError, match="cannot mix"):
        read_parquet(spark, [str(d), str(tmp_path / "nope" / "*.parquet")])


def test_read_file_groups_column_order_by_name(spark, tmp_path):
    from curator_spark.io.readers import read_parquet

    """Two files with the SAME fields in DIFFERENT physical order must
    read back with values under the right names (the old positional
    pairing silently swapped castable columns)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    f1 = str(tmp_path / "a.parquet")
    f2 = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"id": ["i1"], "text": ["t1"]}), f1)
    pq.write_table(
        pa.Table.from_arrays(
            [pa.array(["t2"]), pa.array(["i2"])], names=["text", "id"]
        ),
        f2,
    )
    out = read_parquet(spark, [f1, f2], files_per_partition=2)
    got = {r.id: r.text for r in out.collect()}
    assert got == {"i1": "t1", "i2": "t2"}
