"""ArXiv bulk-source ingestion, Spark-first (reference
``stages/text/download/arxiv/iterator.py`` ArxivIterator + the
``arxiv_extract`` operator for ``extract.py`` ArxivExtractor; both
derive from the public RedPajama-Data arxiv prep).

An arXiv bulk file is an outer tar of per-paper members, each member
itself a gzip — either a gzipped tar of the paper's source tree or a
single gzipped tex file. The reference extracts the outer tar to a
temp directory and walks it; here each task STREAMS its outer tar
(``tarfile mode='r|'`` — strictly sequential, one member in memory at
a time) and opens the nested tar/gzip from bytes, so no scratch disk
and peak task memory is one paper's source tree. The scan lists file
PATHS only (binaryFile content pruned — the 2 GiB cap never applies);
parallelism is one task per bulk tar, the right unit for arXiv's
~0.5 GiB chunks at 10^4-file scale.

Failure contract matches the reference: a paper whose nested archive
is unreadable or whose tex is not utf-8 is skipped (no row, never a
job failure); the arxiv id falls back to the raw member stem when it
does not parse."""

from __future__ import annotations

import gzip
import io
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from ..kernels.latex import clean_tex_project, format_arxiv_id
from .readers import posix_local_path

__all__ = ["read_arxiv_tars", "arxiv_extract"]

ARXIV_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("source_id", StringType(), False),
        StructField("content", ArrayType(StringType()), False),
    ]
)


def _tex_files_from_member(raw: bytes) -> list | None:
    """Nested member bytes -> list of utf-8 tex file contents
    (reference ``_tex_proj_loader``): tar first (collect ``*.tex``
    members; any non-utf-8 tex poisons the whole project -> None),
    gzip single-file fallback, None when neither parses."""
    try:
        with tarfile.open(fileobj=io.BytesIO(raw)) as sub:
            out = []
            for member in sub.getmembers():
                if member.name.endswith(".tex"):
                    data = sub.extractfile(member).read()
                    try:
                        out.append(data.decode("utf-8"))
                    except UnicodeDecodeError:
                        return None
            return out
    except tarfile.ReadError:
        pass
    except Exception:  # noqa: BLE001 - unreadable member: skip paper
        return None
    try:
        data = gzip.decompress(raw)
    except Exception:  # noqa: BLE001
        return None
    try:
        return [data.decode("utf-8")]
    except UnicodeDecodeError:
        return None


def read_arxiv_tars(
    spark: SparkSession,
    path_or_glob: str,
    max_rows_per_batch: int = 200,
) -> DataFrame:
    """Outer bulk tars -> one row per paper: (id, source_id,
    content array<string> of tex files) — the ArxivIterator output
    contract (``iterator.py:141-155``)."""
    files = spark.read.format("binaryFile").load(path_or_glob).select("path")

    def run(batches):
        rows: list = []
        for pdf in batches:
            for path in pdf["path"]:
                local = posix_local_path(path, "read_arxiv_tars")
                bname = os.path.basename(local)
                with open(local, "rb") as f, tarfile.open(fileobj=f, mode="r|*") as tar:
                    for member in tar:
                        if not member.isfile():
                            continue
                        raw = tar.extractfile(member).read()
                        tex = _tex_files_from_member(raw)
                        if tex is None:
                            continue
                        stem = os.path.splitext(os.path.basename(member.name))[0]
                        try:
                            aid = format_arxiv_id(stem)
                        except Exception:  # noqa: BLE001 - reference warns + keeps raw
                            aid = stem
                        rows.append((aid, bname, tex))
                        if len(rows) >= max_rows_per_batch:
                            yield pd.DataFrame(
                                rows, columns=[f.name for f in ARXIV_SCHEMA.fields]
                            )
                            rows = []
        yield pd.DataFrame(rows, columns=[f.name for f in ARXIV_SCHEMA.fields])

    return files.mapInPandas(run, schema=ARXIV_SCHEMA)


def arxiv_extract(df: DataFrame, content_col: str = "content") -> DataFrame:
    """ArxivExtractor as an Arrow-batched map: project-wide macro
    collection + per-file cleaning + newline join; papers whose cleaned
    text is empty emit no row (reference ``extract.py:171-200``). Adds
    ``text`` and drops the raw ``content`` arrays (projected away
    before any shuffle)."""
    passthrough = [c for c in df.columns if c != content_col]
    schema = StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [StructField("text", StringType(), False)]
    )

    def run(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                content = d[content_col]
                text = clean_tex_project(
                    [] if content is None else [str(c) for c in content]
                )
                if not text:
                    continue
                out.append(tuple(d[c] for c in passthrough) + (text,))
            yield pd.DataFrame(out, columns=[*passthrough, "text"])

    return df.mapInPandas(run, schema=schema)
