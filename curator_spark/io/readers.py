"""File-partitioned parquet reader: the reference's FilePartitioningStage
+ ParquetReaderStage surface, Spark-first.

Reference (stages/file_partitioning.py:32-120): list files under path(s),
group into tasks by ``files_per_partition`` OR ``blocksize`` (default cap
512 MB), optional ``limit`` on the number of file groups; the reader stage
then loads each group with optional column projection and id assignment
(text/io/reader/base.py, deduplication/io_utils.py:43-47).

Spark mapping: split planning is Catalyst's job — the knobs translate to
``spark.sql.files.maxPartitionBytes`` (blocksize) and
``spark.sql.files.openCostInBytes``; ``files_per_partition`` is expressed
as a blocksize derived from the actual file sizes, and ``limit`` truncates
the sorted file list before the scan (pruning whole files, exactly like
dropping FileGroupTasks). Everything downstream (projection pushdown,
predicate pushdown) stays declarative.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.ids import assign_dedup_ids

DEFAULT_BLOCKSIZE = 512 << 20  # file_partitioning.py default cap


def _list_files(path: str, extensions: tuple = (".parquet",)) -> list:
    if os.path.isfile(path):
        return [path]
    out = []
    for dirpath, _dirs, names in os.walk(path):
        for n in sorted(names):
            if any(n.endswith(e) for e in extensions) and not n.startswith(("_", ".")):
                out.append(os.path.join(dirpath, n))
    return sorted(out)


def read_parquet(
    spark: SparkSession,
    path: str | list,
    columns: list | None = None,
    assign_id: bool = False,
    blocksize: int | None = None,
    files_per_partition: int | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Read parquet with FilePartitioningStage-style planning controls.

    ``blocksize``/``files_per_partition`` set the target split size;
    ``limit`` truncates the (sorted) file list — the reference's
    debug/sampling knob (file_partitioning.py ``limit``).
    """
    paths = path if isinstance(path, list) else [path]
    files: list = []
    for p in paths:
        files.extend(_list_files(p))
    if not files:  # glob/remote path — fall back to Spark's own listing
        reader = spark.read
        df = reader.parquet(*paths)
    else:
        if limit is not None:
            files = files[:limit]
        if files_per_partition:
            sizes = [os.path.getsize(f) for f in files]
            # blocksize such that ~files_per_partition files fill one split
            blocksize = max(1 << 20, files_per_partition * max(sizes) + 1)
        opts = {}
        if blocksize:
            opts = {
                "spark.sql.files.maxPartitionBytes": str(int(blocksize)),
                "spark.sql.files.openCostInBytes": "0",
            }
        prev = {k: spark.conf.get(k, None) for k in opts}
        try:
            for k, v in opts.items():
                spark.conf.set(k, v)
            df = spark.read.parquet(*files)
            if opts:
                # force split planning under the overridden confs (the
                # file index is built at logical-plan creation)
                df.schema  # noqa: B018
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    if columns:
        df = df.select(*columns)
    if assign_id:
        df = assign_dedup_ids(df, contiguous=False)
    return df
