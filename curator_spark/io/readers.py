"""File-partitioned parquet reader: the reference's FilePartitioningStage
+ ParquetReaderStage surface, Spark-first.

Reference (stages/file_partitioning.py:32-120): list files under path(s),
group into tasks by ``files_per_partition`` OR ``blocksize`` (default cap
512 MB), optional ``limit`` on the number of file groups; the reader stage
then loads each group with optional column projection and id assignment
(text/io/reader/base.py, deduplication/io_utils.py:43-47).

Spark mapping: explicit whole-file grouping — files are packed into
groups (count-bounded by ``files_per_partition`` or size-bounded by
``blocksize``), the group list is parallelized one-group-per-partition,
and each partition streams its files through pyarrow inside
``mapInArrow``. This reproduces the reference's planning unit exactly
(whole files grouped into tasks read by workers,
file_partitioning.py:84-118), yields exact partition counts, and mutates
no session state. Two rejected designs, for the record: flipping
``spark.sql.files.maxPartitionBytes`` around ``spark.read`` is a no-op
(Spark reads those confs at action-time physical planning, not plan
creation), and union-of-``coalesce(1)`` branches collapses to ONE
partition on Spark 4 (``spark.sql.unionOutputPartitioning`` zips
same-partitioned union children via SQLPartitioningAwareUnionRDD).

Column projection is pushed into the pyarrow reader (only requested
column chunks are read). Predicates are applied by Catalyst above the
scan — if you need footer-level predicate pushdown, skip these knobs and
use the plain ``spark.read`` path, where Spark's own split planner
(maxPartitionBytes at session build) is the right tool.

``limit`` truncates the sorted file list before the scan (pruning whole
files, exactly like dropping FileGroupTasks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.ids import assign_dedup_ids

DEFAULT_BLOCKSIZE = 512 << 20  # file_partitioning.py default cap


def posix_local_path(path: str, caller: str) -> str:
    """Strip Spark's ``file:`` URI prefix and reject non-local URIs —
    the one shared guard for kernels that must ``open()`` a path on the
    worker (WARC streaming, wikipedia dumps, arXiv tars). Any future
    handling of ``file://host/`` forms or percent-encoded paths lands
    here once instead of per-reader."""
    local = path[5:] if path.startswith("file:") else path
    if "://" in local:
        raise ValueError(f"{caller} needs a POSIX-visible path, got {path!r}")
    return local


def _list_files(path: str, extensions: tuple = (".parquet",)) -> list:
    if os.path.isfile(path):
        return [path]
    out = []
    for dirpath, _dirs, names in os.walk(path):
        for n in sorted(names):
            if any(n.endswith(e) for e in extensions) and not n.startswith(("_", ".")):
                out.append(os.path.join(dirpath, n))
    return sorted(out)


def group_files(
    files: list,
    files_per_partition: int | None = None,
    blocksize: int | None = None,
) -> list:
    """Pack a sorted file list into whole-file groups, the reference's
    planning unit (file_partitioning.py:84-118): fixed-count groups for
    ``files_per_partition``, greedy cumulative-size groups capped at
    ``blocksize`` otherwise (a file larger than blocksize gets its own
    group — files are never split, matching the reference)."""
    if files_per_partition:
        return [
            files[i : i + files_per_partition]
            for i in range(0, len(files), files_per_partition)
        ]
    cap = blocksize or DEFAULT_BLOCKSIZE
    groups: list = []
    cur: list = []
    cur_bytes = 0
    for f in files:
        sz = os.path.getsize(f)
        if cur and cur_bytes + sz > cap:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


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

    ``blocksize``/``files_per_partition`` control the file-group planning
    unit (one output partition per group, whole files only);
    ``limit`` truncates the (sorted) file list — the reference's
    debug/sampling knob (file_partitioning.py ``limit``).
    """
    paths = path if isinstance(path, list) else [path]
    files: list = []
    unlisted: list = []  # glob patterns / remote URIs _list_files can't walk
    for p in paths:
        got = _list_files(p)
        if got:
            files.extend(got)
        else:
            unlisted.append(p)
    if unlisted and files:
        # a MIXED path list (local dirs + globs/remote URIs) must not
        # silently drop the unlistable entries: planning controls need the
        # full file inventory, so refuse loudly instead
        raise ValueError(
            "read_parquet: cannot mix locally-listable paths with "
            f"glob/remote entries {unlisted!r}; pass them in a separate call"
        )
    if not files:  # glob/remote path — fall back to Spark's own listing
        df = spark.read.parquet(*paths)
    else:
        if limit is not None:
            files = files[:limit]
        if files_per_partition or blocksize:
            groups = group_files(files, files_per_partition, blocksize)
            df = _read_file_groups(spark, groups, columns)
            columns = None  # projection already applied inside the reader
        else:
            df = spark.read.parquet(*files)
    if columns:
        df = df.select(*columns)
    if assign_id:
        df = assign_dedup_ids(df, contiguous=False)
    return df


def _read_file_groups(spark: SparkSession, groups: list, columns: list | None) -> DataFrame:
    """One Spark partition per file group; each partition streams its
    files through ``pyarrow.parquet.iter_batches`` (memory-bounded, column
    projection pushed to the column-chunk level)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    arrow_schema = pq.read_schema(groups[0][0])
    if columns:
        arrow_schema = pa.schema([arrow_schema.field(c) for c in columns])
    spark_schema = from_arrow_schema(arrow_schema)
    cols = list(columns) if columns else None

    # parallelize with one slice per group pins group->partition 1:1
    paths_df = spark.createDataFrame(
        spark.sparkContext.parallelize([(g,) for g in groups], len(groups)),
        "paths: array<string>",
    )

    want = [arrow_schema.field(i).name for i in range(len(arrow_schema))]

    def read_group(batches):
        for b in batches:
            for paths in b.column(0).to_pylist():
                for path in paths:
                    for rb in pq.ParquetFile(path).iter_batches(columns=cols):
                        # select columns BY NAME against the group-leader
                        # schema: a file with the same fields in a
                        # different order would otherwise have its values
                        # silently assigned to the wrong columns
                        by_name = {
                            rb.schema.field(i).name: rb.column(i)
                            for i in range(rb.num_columns)
                        }
                        yield pa.RecordBatch.from_arrays(
                            [
                                by_name[n].cast(arrow_schema.field(j).type)
                                for j, n in enumerate(want)
                            ],
                            schema=arrow_schema,
                        )

    return paths_df.mapInArrow(read_group, spark_schema)
