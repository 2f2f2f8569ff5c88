"""Deterministic contiguous int64 dedup ids — the reference IdGenerator,
Spark-style.

The reference assigns contiguous ``np.arange(min_id, min_id+n)`` ranges per
file batch through a centralized actor (stages/deduplication/
id_generator.py:30-59, io_utils.py:61-71). The Spark-native equivalent
needs no actor and no shuffle: count rows per partition, cumsum the counts
on the driver (a few KB at any scale), then add ``offset[pid] + local_idx``
inside ``mapInPandas``. Ids are deterministic for a fixed input file list /
split plan; the (id, natural-key) mapping is checkpointed by the pipeline
for lineage (same role as fuzzy_id_generator.json, fuzzy/workflow.py:347-352).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..config import ID_FIELD


def id_range(df: DataFrame, id_field: str = ID_FIELD) -> tuple:
    """(min_id, max_id) of the id column — the reference computes this to
    push ranged filters into removal-id parquet reads (its IdGenerator
    tracks per-batch ranges, id_generator.py:30-59). One tiny agg."""
    row = df.agg(F.min(id_field).alias("lo"), F.max(id_field).alias("hi")).collect()[0]
    return (row["lo"], row["hi"])


def filter_by_id_range(df: DataFrame, lo, hi, id_field: str = ID_FIELD) -> DataFrame:
    """Ranged id predicate — expressed as a plain where so parquet
    row-group min/max statistics prune at the scan (PushedFilters)."""
    return df.where((F.col(id_field) >= lo) & (F.col(id_field) <= hi))


def assign_dedup_ids(df: DataFrame, id_field: str = ID_FIELD, contiguous: bool = True) -> DataFrame:
    """Add a deterministic int64 ``id_field`` column, no shuffle.

    ``contiguous=False`` (the at-scale path): ``monotonically_increasing_id``
    — ONE pass, no driver round-trip. Ids are ``pid << 33 | local_idx``:
    sparse, but ordered identically to the contiguous scheme ((partition,
    local index) lexicographic), so min-id component labels and keep-first
    survivor picks are unchanged. ``contiguous=True`` mirrors the
    reference's contiguous np.arange ranges (id_generator.py:30-59) at the
    cost of an extra counting pass; use it when ranged id pushdown or
    external id contracts matter.
    """
    if not contiguous:
        return df.withColumn(id_field, F.monotonically_increasing_id())
    # contiguous ids take TWO passes over the input (count, then assign);
    # persist the partitioned frame so both passes see the identical
    # partitioning even when the upstream plan is nondeterministic
    # (shuffle, sample, AQE re-coalesce) — without this, per-partition
    # counts could disagree with the second pass and ids would collide
    from pyspark.storagelevel import StorageLevel

    pid_col = "__cur_pid"
    with_pid = df.withColumn(pid_col, F.spark_partition_id()).persist(StorageLevel.MEMORY_AND_DISK)
    counts = dict(with_pid.groupBy(pid_col).count().collect())
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType([*df.schema.fields, StructField(id_field, LongType(), False)])

    def add_ids(batches):
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.drop(columns=[pid_col])
                continue
            pid = int(pdf[pid_col].iloc[0])
            base = offsets[pid] + local
            out = pdf.drop(columns=[pid_col])
            out[id_field] = range(base, base + len(pdf))
            local += len(pdf)
            yield out

    return with_pid.mapInPandas(add_ids, schema=out_schema)
