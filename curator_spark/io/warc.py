"""Spark-first WARC source for Common Crawl-style ingestion.

The reference iterates WARC files one-per-Ray-task
(``stages/text/download/common_crawl/warc_iterator.py``); here the
``binaryFile`` source hands each archive to one Spark task and the
pure-python kernel (``kernels/warc.py``) parses it inside
``mapInPandas`` — ingestion parallelism == file count, no driver I/O.
Common Crawl segments are ~1 GiB gzip each, well inside task memory;
a corrupt record skips, never fails the scan task (the at-scale
contract shared with every decode stage in this repo).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_id string, source_id string, content binary"


def read_warc(spark: SparkSession, path_or_glob: str) -> DataFrame:
    """(url, warc_id, source_id, content) rows for every ``response``
    record, HTTP envelope stripped — the reference iterator's columns
    (warc_iterator.py:64,69-70)."""
    files = spark.read.format("binaryFile").load(path_or_glob).select(
        "path", "content"
    )

    def run(batches):
        from ..kernels.warc import iter_warc_responses

        for pdf in batches:
            rows = []
            for path, raw in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    (r["url"], r["warc_id"], r["source_id"], r["content"])
                    for r in iter_warc_responses(
                        bytes(raw), os.path.basename(path)
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_id", "source_id", "content"]
            )

    return files.mapInPandas(run, schema=WARC_SCHEMA)
