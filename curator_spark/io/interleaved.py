"""Interleaved (MINT-1T-style) WebDataset shards <-> row-wise frames.

The reference reads MINT-1T shards into its row-wise interleaved schema
(``stages/interleaved/io/readers/webdataset.py:69-260``: per sample one
``.json`` member holding position-parallel ``texts`` / ``images``
arrays — a null entry means "the other modality owns this position" —
plus the image bytes as sibling tar members) and writes the same layout
back (``io/writers/webdataset.py``: percent-encoded sample key as the
member stem, content-type-derived extensions, per-task shards).

Spark shapes:

- ``write_interleaved_webdataset``: ONE exchange on ``sample_id`` to
  co-locate each sample's rows, then a streaming per-partition tar
  writer (rows arrive sample-sorted; a carry-over buffer flushes each
  sample as its id changes) reusing the tar-shard commit protocol
  (hidden temp name + atomic rename, retry/speculation-safe).
- ``read_interleaved_webdataset``: ``read_tar_shards`` (binaryFile, one
  archive per task) -> ``from_json`` on the ``.json`` members -> ONE
  union-free explode of [metadata] ++ texts ++ images piece structs ->
  a left join back to the member rows for image bytes. Everything but
  the percent-decode of the sample key is declarative.

Deliberately out of scope (documented, like the reference's own
fallbacks): per-modality passthrough fields, multi-frame TIFF
``frame_index`` fan-out, and byte-range ``source_ref`` locators — the
bytes ride inline in ``binary_content`` here, which IS the reference's
``materialize_on_read=True`` mode.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import urllib.parse
import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .webdataset import WRITE_SUMMARY_SCHEMA, read_tar_shards

__all__ = ["write_interleaved_webdataset", "read_interleaved_webdataset"]

# reference io/writers/webdataset.py:36-44 _CONTENT_TYPE_TO_EXT
_CT_TO_EXT = {
    "image/jpeg": "jpg",
    "image/png": "png",
    "image/tiff": "tiff",
    "image/webp": "webp",
    "image/gif": "gif",
    "image/bmp": "bmp",
    "image/avif": "avif",
}
_EXT_TO_CT = {v: k for k, v in _CT_TO_EXT.items()}


def _escape_key(sample_id: str) -> str:
    """Percent-encode a sample id for use as a tar member stem
    (reference ``_escape_key``), additionally escaping '.' — the
    WebDataset first-dot split makes a dot in the stem change the
    sample key, which the reference's plain quote() leaves unescaped."""
    return urllib.parse.quote(str(sample_id), safe="").replace(".", "%2E")


def write_interleaved_webdataset(
    df: DataFrame,
    out_dir: str,
    prefix: str = "ileave",
    assume_colocated: bool = False,
) -> DataFrame:
    """Write interleaved rows (sample_id, position, modality,
    text_content, binary_content[, content_type]) as MINT-1T-style
    shards: per sample a ``<key>.json`` member with position-parallel
    ``texts``/``images`` arrays and one ``<key>.<pos>.<ext>`` member per
    image. Returns the per-shard summary frame (one small row per
    partition). Shard count = input partition count after the
    co-locating exchange (``repartition`` upstream to control it);
    ``assume_colocated=True`` skips the exchange when the caller already
    partitioned by sample_id."""
    os.makedirs(out_dir, exist_ok=True)
    has_ct = "content_type" in df.columns
    slim = df.select(
        F.col("sample_id").cast("string"),
        F.col("position").cast("int"),
        "modality",
        "text_content",
        "binary_content",
        (F.col("content_type") if has_ct else F.lit(None).cast("string")).alias(
            "content_type"
        ),
    )
    if not assume_colocated:
        slim = slim.repartition("sample_id")
    slim = slim.sortWithinPartitions("sample_id", "position")

    def run(batches):
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        shard_path = os.path.join(out_dir, f"{prefix}-{pid:05d}.tar")
        tmp_path = os.path.join(
            out_dir, f".{prefix}-{pid:05d}.inprogress-{uuid.uuid4().hex}"
        )
        state = {"tar": None, "n_samples": 0, "n_members": 0}
        # distinct sentinel object: a row with sample_id=NULL must not
        # compare equal to the 'no current sample' marker (it would
        # accumulate under the unset group and be silently discarded)
        _UNSET = object()
        cur_id, cur_rows = _UNSET, []

        def flush():
            if cur_id is _UNSET:
                return
            if cur_id is None:
                raise ValueError(
                    "write_interleaved_webdataset: NULL sample_id row "
                    "(sample keys must be non-null)"
                )
            esc = _escape_key(cur_id)
            max_pos = max((p for p, *_ in cur_rows if p >= 0), default=-1)
            texts = [None] * (max_pos + 1)
            images = [None] * (max_pos + 1)
            members = []
            for pos, modality, text, raw, ct in cur_rows:
                if modality == "text" and pos >= 0:
                    texts[pos] = text
                elif modality == "image" and pos >= 0:
                    ext = _CT_TO_EXT.get(ct, "bin")
                    member = f"{pos:05d}.{ext}"
                    images[pos] = member
                    if raw is not None:
                        members.append((f"{esc}.{member}", bytes(raw)))
                # metadata rows carry no payload: the json member IS the
                # sample's metadata row on read-back
            meta = json.dumps(
                {"texts": texts, "images": images}, ensure_ascii=False, sort_keys=True
            ).encode()
            tar = state["tar"]
            for name, payload in [(f"{esc}.json", meta), *members]:
                info = tarfile.TarInfo(name=name)
                info.size = len(payload)
                tar.addfile(info, io.BytesIO(payload))
                state["n_members"] += 1
            state["n_samples"] += 1

        for pdf in batches:
            if state["tar"] is None and len(pdf):
                state["tar"] = tarfile.open(tmp_path, "w")
            for row in pdf.itertuples(index=False):
                if row.sample_id != cur_id:
                    flush()
                    cur_id, cur_rows = row.sample_id, []
                cur_rows.append(
                    (
                        int(row.position),
                        row.modality,
                        row.text_content,
                        row.binary_content,
                        row.content_type,
                    )
                )
        flush()
        if state["tar"] is None:
            yield pd.DataFrame([], columns=[f.name for f in WRITE_SUMMARY_SCHEMA.fields])
            return
        state["tar"].close()
        os.replace(tmp_path, shard_path)
        yield pd.DataFrame(
            [
                {
                    "shard_path": shard_path,
                    "n_samples": state["n_samples"],
                    "n_members": state["n_members"],
                    "bytes_written": os.path.getsize(shard_path),
                }
            ],
            columns=[f.name for f in WRITE_SUMMARY_SCHEMA.fields],
        )

    return slim.mapInPandas(run, schema=WRITE_SUMMARY_SCHEMA).localCheckpoint()


@F.pandas_udf(StringType())
def _unquote(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else urllib.parse.unquote(v))


def read_interleaved_webdataset(spark: SparkSession, path_or_glob: str) -> DataFrame:
    """MINT-1T shards -> interleaved rows (sample_id, position,
    modality, content_type, text_content, binary_content): one metadata
    row per sample (position -1), one text row per non-null ``texts``
    entry, one image row per non-null ``images`` entry with the member
    bytes joined in (the reference's ``materialize_on_read``). The
    metadata/text/image fan-out is ONE explode of a concatenated piece
    array — no self-union."""
    long = read_tar_shards(spark, path_or_glob)
    meta = (
        long.where(F.col("ext") == "json")
        .select(
            "shard_path",
            "key",
            F.from_json(
                F.col("data").cast("string"),
                "texts array<string>, images array<string>",
            ).alias("m"),
        )
    )
    def _piece(p, mod, ct, t, tok):
        return (
            "named_struct('position', cast(%s as int), 'modality', %s, "
            "'content_type', %s, 'text_content', %s, 'token', %s)"
            % (p, mod, ct, t, tok)
        )

    null_s = "cast(null as string)"
    # coalesce each modality list to []: a foreign shard whose .json lacks
    # the texts or images key makes from_json yield NULL for that field,
    # and concat() null-propagates — the whole sample (metadata row AND
    # the present modality) would silently vanish from the explode
    pieces = F.expr(
        "concat("
        + " array(" + _piece("-1", "'metadata'", "'application/json'", null_s, null_s) + "),"
        + " filter(transform(coalesce(m.texts, array()), (t, i) -> "
        + _piece("i", "'text'", "'text/plain'", "t", null_s)
        + " ), x -> x.text_content is not null),"
        + " filter(transform(coalesce(m.images, array()), (tok, i) -> "
        + _piece("i", "'image'", null_s, null_s, "tok")
        + " ), x -> x.token is not null)"
        + ")"
    )
    rows = meta.select("shard_path", "key", F.explode(pieces).alias("p")).select(
        "shard_path",
        "key",
        F.col("p.position").alias("position"),
        F.col("p.modality").alias("modality"),
        F.col("p.content_type").alias("content_type"),
        F.col("p.text_content").alias("text_content"),
        F.col("p.token").alias("token"),
    )
    members = long.where(F.col("ext") != "json").select(
        F.col("shard_path").alias("_ms"),
        F.col("key").alias("_mk"),
        F.col("ext").alias("_mext"),
        F.col("data").alias("binary_content"),
    )
    ext_ct = F.element_at(
        F.create_map(*[F.lit(x) for kv in _EXT_TO_CT.items() for x in kv]),
        F.regexp_extract(F.col("token"), r"\.([^.]+)$", 1),
    )
    return (
        rows.join(
            members,
            # shard-qualified: WebDataset keys are only unique PER
            # SHARD (foreign MINT-1T shards, or two writer runs into
            # one directory) — without the shard term a repeated key
            # cross-joins image bytes between shards
            (rows["shard_path"] == members["_ms"])
            & (rows["key"] == members["_mk"])
            & (rows["token"] == members["_mext"]),
            "left",
        )
        .select(
            _unquote(F.col("key")).alias("sample_id"),
            "position",
            "modality",
            F.when(F.col("modality") == "image", F.coalesce(ext_ct, F.lit("application/octet-stream")))
            .otherwise(F.col("content_type"))
            .alias("content_type"),
            "text_content",
            "binary_content",
        )
    )
