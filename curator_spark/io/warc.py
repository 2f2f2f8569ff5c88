"""Spark-first WARC source for Common Crawl-style ingestion.

The reference iterates WARC files one-per-Ray-task
(``stages/text/download/common_crawl/warc_iterator.py``); here the
``binaryFile`` source hands each archive to one Spark task and the
pure-python kernel (``kernels/warc.py``) parses it inside
``mapInPandas`` — ingestion parallelism == file count, no driver I/O.
Common Crawl segments are ~1 GiB gzip each, well inside task memory;
a corrupt record skips, never fails the scan task (the at-scale
contract shared with every decode stage in this repo).

Memory bound: the parser is a true generator (one gzip member at a
time) and ``read_warc`` flushes a pandas frame every
``max_records_per_batch`` records / ``max_bytes_per_batch`` payload
bytes, so the ~4-5x decompressed text of a segment is never held
whole — peak extra memory per task is one archive's raw bytes (the
``binaryFile`` source materializes the file; it also caps files at
2 GiB — Common Crawl's ~1 GiB segment layout fits, but re-shard
anything larger upstream).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = "url string, warc_id string, source_id string, content binary"


_COLS = ["url", "warc_id", "source_id", "content"]


def read_warc(
    spark: SparkSession,
    path_or_glob: str,
    max_records_per_batch: int = 2000,
    max_bytes_per_batch: int = 64 << 20,
) -> DataFrame:
    """(url, warc_id, source_id, content) rows for every ``response``
    record, HTTP envelope stripped — the reference iterator's columns
    (warc_iterator.py:64,69-70). Output is emitted incrementally: a
    frame per ``max_records_per_batch`` records or
    ``max_bytes_per_batch`` payload bytes, whichever trips first, so a
    multi-GiB decompressed archive never sits in one Python list."""
    files = spark.read.format("binaryFile").load(path_or_glob).select(
        "path", "content"
    )

    def run(batches):
        from ..kernels.warc import iter_warc_responses

        rows: list = []
        nbytes = 0
        for pdf in batches:
            for path, raw in zip(pdf["path"], pdf["content"]):
                for r in iter_warc_responses(bytes(raw), os.path.basename(path)):
                    rows.append(
                        (r["url"], r["warc_id"], r["source_id"], r["content"])
                    )
                    nbytes += len(r["content"] or b"")
                    if len(rows) >= max_records_per_batch or nbytes >= max_bytes_per_batch:
                        yield pd.DataFrame(rows, columns=_COLS)
                        rows, nbytes = [], 0
        if rows:
            yield pd.DataFrame(rows, columns=_COLS)

    return files.mapInPandas(run, schema=WARC_SCHEMA)
