"""Interleaved (MINT-1T-style) WebDataset shard round trip (reference
stages/interleaved/io/{readers,writers}/webdataset.py)."""

from __future__ import annotations

import json
import os
import tarfile

import pytest

from curator_spark.io import read_interleaved_webdataset, write_interleaved_webdataset

SCHEMA = (
    "sample_id string, position int, modality string, "
    "text_content string, binary_content binary, content_type string"
)


def sample_rows():
    png = b"\x89PNG-fake-bytes-1"
    jpg = b"\xff\xd8-fake-bytes-2"
    return [
        # sample A: text(0), image(1), text(2), metadata
        ("A", -1, "metadata", None, None, "application/json"),
        ("A", 0, "text", "first para", None, "text/plain"),
        ("A", 1, "image", None, png, "image/png"),
        ("A", 2, "text", "second para", None, "text/plain"),
        # sample with dots/slashes in the id (escape path) and a hole at 1
        ("b.c/d", 0, "image", None, jpg, "image/jpeg"),
        ("b.c/d", 2, "text", "tail", None, "text/plain"),
        # image with unknown content type -> .bin member
        ("E", 0, "image", None, b"opaque", None),
    ]


class TestRoundTrip:
    def test_write_then_read_back(self, spark, tmp_path):
        df = spark.createDataFrame(sample_rows(), schema=SCHEMA)
        out = str(tmp_path / "shards")
        summary = write_interleaved_webdataset(df, out).collect()
        assert sum(r.n_samples for r in summary) == 3
        back = read_interleaved_webdataset(spark, out + "/*.tar").collect()
        got = {
            (r.sample_id, r.position, r.modality, r.text_content,
             bytes(r.binary_content) if r.binary_content is not None else None,
             r.content_type)
            for r in back
        }
        expected = {
            ("A", -1, "metadata", None, None, "application/json"),
            ("A", 0, "text", "first para", None, "text/plain"),
            ("A", 1, "image", None, b"\x89PNG-fake-bytes-1", "image/png"),
            ("A", 2, "text", "second para", None, "text/plain"),
            ("b.c/d", -1, "metadata", None, None, "application/json"),
            ("b.c/d", 0, "image", None, b"\xff\xd8-fake-bytes-2", "image/jpeg"),
            ("b.c/d", 2, "text", "tail", None, "text/plain"),
            ("E", -1, "metadata", None, None, "application/json"),
            ("E", 0, "image", None, b"opaque", "application/octet-stream"),
        }
        assert got == expected

    def test_tar_layout_is_mint1t_shaped(self, spark, tmp_path):
        df = spark.createDataFrame(sample_rows(), schema=SCHEMA).where("sample_id = 'A'")
        out = str(tmp_path / "layout")
        [s] = [r for r in write_interleaved_webdataset(df, out).collect() if r.n_samples]
        with tarfile.open(s.shard_path) as tar:
            names = sorted(tar.getnames())
            meta = json.loads(tar.extractfile("A.json").read())
        assert names == ["A.00001.png", "A.json"]
        assert meta == {"images": [None, "00001.png", None],
                        "texts": ["first para", None, "second para"]}

    def test_colocation_survives_scattered_input(self, spark, tmp_path):
        """Rows of one sample scattered over many input partitions must
        still produce exactly one json member per sample."""
        rows = [
            (f"s{i % 5}", j, "text", f"t{i}-{j}", None, "text/plain")
            for i in range(20) for j in [2 * (i // 5), 2 * (i // 5) + 1]
        ]
        df = spark.createDataFrame(rows, schema=SCHEMA).repartition(8)
        out = str(tmp_path / "scatter")
        summary = write_interleaved_webdataset(df, out).collect()
        assert sum(r.n_samples for r in summary) == 5
        back = read_interleaved_webdataset(spark, out + "/*.tar")
        n_meta = back.where("modality = 'metadata'").count()
        n_text = back.where("modality = 'text'").count()
        assert (n_meta, n_text) == (5, 40)

    def test_commit_protocol_rerun_and_stray_temp(self, spark, tmp_path):
        df = spark.createDataFrame(sample_rows(), schema=SCHEMA)
        out = str(tmp_path / "commit")
        write_interleaved_webdataset(df, out).collect()
        (tmp_path / "commit" / ".ileave-99999.inprogress-dead").write_bytes(b"junk")
        first = sorted(p.name for p in (tmp_path / "commit").glob("*.tar"))
        write_interleaved_webdataset(df, out).collect()
        second = sorted(p.name for p in (tmp_path / "commit").glob("*.tar"))
        assert first == second
        back = read_interleaved_webdataset(spark, out + "/*.tar")
        assert back.count() == 9  # stray temp invisible, no duplicates

    def test_no_self_union_in_reader_plan(self, spark, tmp_path):
        df = spark.createDataFrame(sample_rows(), schema=SCHEMA)
        out = str(tmp_path / "plan")
        write_interleaved_webdataset(df, out).collect()
        back = read_interleaved_webdataset(spark, out + "/*.tar")
        assert "Union" not in back._jdf.queryExecution().optimizedPlan().toString()

    def test_same_key_in_two_shards_no_cross_join(self, spark, tmp_path):
        """WebDataset keys are only unique per shard: the same sample id
        written into two shards (two writer runs, one directory) must
        read back as two independent samples — the member join is
        shard-qualified, so image bytes never cross shards."""
        out = str(tmp_path / "collide")
        a = spark.createDataFrame(
            [("K", 0, "image", None, b"shard-one-bytes", "image/png")],
            schema=SCHEMA,
        )
        b = spark.createDataFrame(
            [("K", 0, "image", None, b"shard-two-bytes", "image/png")],
            schema=SCHEMA,
        )
        write_interleaved_webdataset(a, out, prefix="run1").collect()
        write_interleaved_webdataset(b, out, prefix="run2").collect()
        back = read_interleaved_webdataset(spark, out + "/*.tar").collect()
        images = [r for r in back if r.modality == "image"]
        metas = [r for r in back if r.modality == "metadata"]
        # one image row per shard (NOT four from a cross-join), one
        # metadata row per shard (NOT doubled through the json join)
        assert len(images) == 2 and len(metas) == 2
        assert sorted(bytes(r.binary_content) for r in images) == [
            b"shard-one-bytes",
            b"shard-two-bytes",
        ]


class TestForeignShardRobustness:
    def test_missing_modality_key_keeps_sample(self, spark, tmp_path):
        """A foreign shard whose .json lacks the images (or texts) key
        must still yield the present modality + metadata row — concat()
        over a NULL from from_json previously dropped the whole sample."""
        import io as _io
        import json as _json
        import tarfile as _tar

        shard = str(tmp_path / "f" / "shard-00000.tar")
        os.makedirs(os.path.dirname(shard))
        with _tar.open(shard, "w") as tf:
            meta = _json.dumps({"texts": ["a", "b"]}).encode()  # no images
            ti = _tar.TarInfo("s1.json"); ti.size = len(meta)
            tf.addfile(ti, _io.BytesIO(meta))
        rows = read_interleaved_webdataset(
            spark, str(tmp_path / "f" / "*.tar")
        ).collect()
        mods = sorted((r.modality, r.position) for r in rows)
        assert mods == [("metadata", -1), ("text", 0), ("text", 1)]

    def test_null_sample_id_raises_not_silently_dropped(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(None, 0, "text", "x", None, "text/plain")], schema=SCHEMA
        )
        with pytest.raises(Exception, match="NULL sample_id"):
            write_interleaved_webdataset(df, str(tmp_path / "w")).collect()
