"""WebDataset-style tar shard sink and source.

The reference's ALM extraction pipeline writes snippets into per-worker
tar shards (``alm/pretrain/extraction.py:144-151`` opens one
``tarfile`` per replica; ``finalize.py:219`` merges shards) following
the WebDataset / Energon convention: every sample is a group of members
``<key>.<ext>`` living at the tar root, where the key is everything
before the FIRST ``.`` of the member name.

Spark shape: one shard per partition, written inside ``mapInPandas`` —
every task streams its own rows into its own tar with zero driver
involvement, so the sink scales with executor count exactly like the
reference's per-replica shards. There is no merge step: controlling the
shard count is a ``repartition(n)`` on the input (a deliberate Spark
re-expression of ``finalize``'s small-shard merging, which exists only
because Ray replicas can't re-partition upstream). The reader maps the
binaryFile source, so shard decode also parallelizes per file.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WRITE_SUMMARY_SCHEMA = StructType(
    [
        StructField("shard_path", StringType(), False),
        StructField("n_samples", LongType(), False),
        StructField("n_members", LongType(), False),
        StructField("bytes_written", LongType(), False),
    ]
)

READ_SCHEMA = StructType(
    [
        StructField("shard_path", StringType(), False),
        StructField("key", StringType(), False),
        StructField("ext", StringType(), False),
        StructField("data", BinaryType(), False),
    ]
)


def _check_key(key: str) -> str:
    if not key or "." in key or "/" in key or "\\" in key:
        raise ValueError(
            f"WebDataset sample key must be non-empty and free of './\\\\', got {key!r}"
            " (use kernels.alm.make_snippet_id)"
        )
    return key


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    data_cols: dict[str, str],
    meta_cols: list[str] | None = None,
    prefix: str = "shard",
) -> DataFrame:
    """Write one tar shard per partition; returns the per-shard summary
    (an eager, small action — one row per partition).

    ``data_cols`` maps binary columns to member extensions (e.g.
    ``{"bytes": "wav"}``); ``meta_cols`` (non-binary) are bundled into
    one ``<key>.json`` member per sample. Null binaries are skipped
    member-wise, so a sample can legitimately have metadata only.
    """
    meta_cols = list(meta_cols or [])
    for ext in data_cols.values():
        if not ext or ext.startswith("."):
            raise ValueError(f"extension must be bare (no dot), got {ext!r}")
    os.makedirs(out_dir, exist_ok=True)
    # Cross-RUN overwrite semantics: deterministic per-partition names
    # make retries within one job safe, but a re-run that produces FEWER
    # partitions would otherwise leave the previous run's higher-numbered
    # shards behind, and a glob reader would silently mix generations
    # (read_tar_samples would even merge same-key members across runs).
    # Clear this prefix's shards and any abandoned temp files up front.
    for stale in os.listdir(out_dir):
        if (
            stale.startswith(f"{prefix}-") and stale.endswith(".tar")
        ) or stale.startswith(f".{prefix}-"):
            os.unlink(os.path.join(out_dir, stale))
    cols = [key_col, *data_cols.keys(), *meta_cols]
    slim = df.select(*cols)
    data_items = list(data_cols.items())

    def run(batches):
        # Commit protocol: stream into a hidden temp name, atomically
        # rename to the deterministic per-partition name on success.
        # A failed/killed attempt leaves only the temp file (no reader
        # glob matches '*.inprogress-*'); a retried or speculative
        # attempt re-derives the SAME final name and os.replace makes
        # last-writer-wins atomic — either attempt's file is complete,
        # so the reader never sees a partial or duplicate shard
        # (reference finalize's merge+reconcile step, done Spark-side).
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        shard_path = os.path.join(out_dir, f"{prefix}-{pid:05d}.tar")
        tmp_path = os.path.join(
            out_dir, f".{prefix}-{pid:05d}.inprogress-{uuid.uuid4().hex}"
        )
        n_samples = n_members = 0
        tar = None
        for pdf in batches:
            if tar is None:
                tar = tarfile.open(tmp_path, "w")
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                key = _check_key(str(d[key_col]))
                n_samples += 1
                for col, ext in data_items:
                    payload = d[col]
                    if payload is None:
                        continue
                    payload = bytes(payload)
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
                    n_members += 1
                if meta_cols:
                    meta = json.dumps(
                        {c: _jsonable(d[c]) for c in meta_cols}, sort_keys=True
                    ).encode()
                    info = tarfile.TarInfo(name=f"{key}.json")
                    info.size = len(meta)
                    tar.addfile(info, io.BytesIO(meta))
                    n_members += 1
        if tar is None:
            yield pd.DataFrame(
                [], columns=[f.name for f in WRITE_SUMMARY_SCHEMA.fields]
            )
            return
        tar.close()
        os.replace(tmp_path, shard_path)
        yield pd.DataFrame(
            [
                {
                    "shard_path": shard_path,
                    "n_samples": n_samples,
                    "n_members": n_members,
                    "bytes_written": os.path.getsize(shard_path),
                }
            ],
            columns=[f.name for f in WRITE_SUMMARY_SCHEMA.fields],
        )

    summary = slim.mapInPandas(run, schema=WRITE_SUMMARY_SCHEMA)
    # small (one row per partition): cache via localCheckpoint so callers
    # can both inspect and re-aggregate without re-writing shards
    return summary.localCheckpoint()


def _jsonable(v):
    if hasattr(v, "item"):
        return v.item()
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def read_tar_shards(spark: SparkSession, path_or_glob: str) -> DataFrame:
    """Read tar shards back as long-format rows (shard, key, ext, data);
    group on ``key`` downstream to reassemble samples. One input file per
    task via the ``binaryFile`` source."""
    files = spark.read.format("binaryFile").load(path_or_glob).select(
        "path", "content"
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for member in tar.getmembers():
                        if not member.isfile():
                            continue
                        name = os.path.basename(member.name)
                        key, _, ext = name.partition(".")
                        rows.append(
                            (path, key, ext, tar.extractfile(member).read())
                        )
            yield pd.DataFrame(rows, columns=[f.name for f in READ_SCHEMA.fields])

    return files.mapInPandas(run, schema=READ_SCHEMA)


def read_tar_samples(spark: SparkSession, path_or_glob: str) -> DataFrame:
    """Samples reassembled per WebDataset key: (key, exts array,
    payloads array, meta json string if a ``.json`` member exists)."""
    long = read_tar_shards(spark, path_or_glob)
    return (
        long.groupBy("key")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ext", "data"))
            ).alias("_members"),
        )
        .select(
            "key",
            F.expr("transform(_members, m -> m.ext)").alias("exts"),
            F.expr("transform(_members, m -> m.data)").alias("payloads"),
            F.expr(
                "aggregate(_members, cast(null as string),"
                " (acc, m) -> CASE WHEN m.ext = 'json' THEN cast(m.data as string) ELSE acc END)"
            ).alias("meta_json"),
        )
    )


def reconcile_manifest(
    manifest: DataFrame,
    spark: SparkSession,
    shards_glob: str,
    key_col: str = "snippet_id",
    audio_ext: str = "wav",
) -> DataFrame:
    """Drop manifest rows whose audio member is missing from the shards
    or fails a header decode with positive frames/samplerate — the
    reference's post-merge reconciliation
    (``alm/pretrain/finalize.py:329-434``), re-expressed as a semi-join
    against the validated member set instead of a driver-side tar walk.
    Orphan tar members are left in place (same rationale: consumers
    iterate the manifest, rewriting archives is O(archive)).

    Adds nothing to the manifest schema; returns the kept rows plus a
    small ``observe``-free companion you can count for drop accounting:
    ``reconcile_manifest(...).count()`` vs ``manifest.count()``.
    """
    members = read_tar_shards(spark, shards_glob).where(F.col("ext") == audio_ext)

    def check(batches):
        from ..kernels.audio import decode_wav_pcm16

        for pdf in batches:
            keys = []
            for key, data in zip(pdf["key"], pdf["data"]):
                try:
                    samples, sr = decode_wav_pcm16(bytes(data))
                    if len(samples) > 0 and sr > 0:
                        keys.append(key)
                except Exception:  # noqa: BLE001 - unreadable header = drop
                    continue
            yield pd.DataFrame({"_ok_key": keys})

    valid = members.select("key", "data").mapInPandas(check, "_ok_key string")
    return manifest.join(
        valid, manifest[key_col] == valid["_ok_key"], "left_semi"
    )
