"""Wikipedia XML-dump source, Spark-first (reference
``stages/text/download/wikipedia/iterator.py`` WikipediaIterator —
pure stdlib bz2 + streaming ElementTree, ported whole; only the Ray
task plumbing changes).

Each task streams ONE ``pages-articles`` ``.bz2`` (or plain ``.xml``)
dump file: the scan lists paths only, ``ET.iterparse`` walks the XML
incrementally and every consumed ``<page>`` element is cleared, so peak
task memory is one article regardless of dump size (the same
bounded-memory contract as ``read_warc_stream``). Skips mirror the
reference exactly: non-main namespaces (``ns != 0``), redirects, empty
revisions. Output columns are the iterator's contract: (title, id,
url, language, source_id, raw_content)."""

from __future__ import annotations

import bz2
import codecs
import os
import xml.etree.ElementTree as ET
from urllib.parse import quote

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["read_wikipedia_dump"]

WIKIPEDIA_SCHEMA = StructType(
    [
        StructField("title", StringType(), False),
        StructField("id", StringType(), False),
        StructField("url", StringType(), False),
        StructField("language", StringType(), False),
        StructField("source_id", StringType(), False),
        StructField("raw_content", StringType(), False),
    ]
)


def _iter_articles(fileobj, language: str, source_id: str):
    """Stream (title, id, url, language, source_id, raw_content) rows
    from an open XML stream (reference iterator.py:89-141)."""
    for _event, elem in ET.iterparse(fileobj, events=("end",)):
        if not elem.tag.endswith("page"):
            continue
        namespace = elem.tag[:-4]

        def txt(tag, _e=elem, _ns=namespace):
            node = _e.find(f"./{_ns}{tag}")
            return node.text if node is not None else None

        title, ns, id_ = txt("title"), txt("ns"), txt("id")
        redirect = elem.find(f"./{namespace}redirect")
        raw = None
        rev = elem.find(f"./{namespace}revision")
        if rev is not None:
            tnode = rev.find(f"./{namespace}text")
            raw = tnode.text if tnode is not None else None
        elem.clear()  # bounded memory: drop the consumed page subtree
        if not all([title, ns, id_]):
            continue
        if ns != "0" or redirect is not None or raw is None:
            continue
        url = f"https://{language}.wikipedia.org/wiki/{quote(title)}"
        yield (title, id_, url, language, source_id, raw)


def read_wikipedia_dump(
    spark: SparkSession,
    path_or_glob: str,
    language: str = "en",
    max_rows_per_batch: int = 500,
) -> DataFrame:
    """One row per main-namespace, non-redirect article."""
    files = spark.read.format("binaryFile").load(path_or_glob).select("path")

    def run(batches):
        for pdf in batches:
            rows: list = []
            for path in pdf["path"]:
                local = path[5:] if path.startswith("file:") else path
                if "://" in local:
                    raise ValueError(
                        f"read_wikipedia_dump needs a POSIX-visible path, got {path!r}"
                    )
                bname = os.path.basename(local)
                opener = bz2.BZ2File if local.endswith(".bz2") else open
                with opener(local, "rb") as f:
                    stream = codecs.getreader("utf-8")(f)
                    for row in _iter_articles(stream, language, bname):
                        rows.append(row)
                        if len(rows) >= max_rows_per_batch:
                            yield pd.DataFrame(
                                rows,
                                columns=[f.name for f in WIKIPEDIA_SCHEMA.fields],
                            )
                            rows = []
            yield pd.DataFrame(
                rows, columns=[f.name for f in WIKIPEDIA_SCHEMA.fields]
            )

    return files.mapInPandas(run, schema=WIKIPEDIA_SCHEMA)
