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


def hash_file_batch(files) -> str:
    """Deterministic uuid5 lineage key for a file batch — the reference's
    IdGenerator.hash_files (deduplication/id_generator.py:47-49):
    ``uuid5(NAMESPACE_URL, ";".join(paths))``. The exact formula IS the
    spec — checkpoints written by either engine key to the same ids."""
    import uuid

    files = files if isinstance(files, list) else [files]
    return str(uuid.uuid5(uuid.NAMESPACE_URL, ";".join(files)))


class BatchIdRegistry:
    """Driver-side {batch_hash: (min_id, max_id)} registry mirroring the
    reference's IdGenerator actor (id_generator.py:30-59): contiguous id
    ranges per registered file batch, idempotent re-registration, JSON
    save/load for resume lineage (the role of fuzzy_id_generator.json,
    fuzzy/workflow.py:347-352). State is a few KB per thousand batches —
    driver-resident at any scale."""

    def __init__(self, start_id: int = 0, batch_registry: dict | None = None):
        self.next_id = start_id
        self.batch_registry = dict(batch_registry or {})

    def register_batch(self, files, count: int) -> int:
        key = hash_file_batch(files)
        if key in self.batch_registry:
            return self.batch_registry[key][0]
        lo = self.next_id
        self.next_id += count
        self.batch_registry[key] = (lo, self.next_id - 1)
        return lo

    def get_batch_range(self, files=None, key=None) -> tuple:
        if (files is None) == (key is None):
            raise ValueError("Either files or key must be provided")
        if files is not None:
            key = hash_file_batch(files)
        lo, hi = self.batch_registry[key]
        return (lo, hi)

    def to_json(self, path: str) -> None:
        import json

        with open(path, "w") as f:
            json.dump({"next_id": self.next_id, "batches": self.batch_registry}, f)

    @classmethod
    def from_json(cls, path: str) -> "BatchIdRegistry":
        import json

        with open(path) as f:
            d = json.load(f)
        return cls(d["next_id"], {k: tuple(v) for k, v in d["batches"].items()})


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


def assign_dedup_ids(
    df: DataFrame,
    id_field: str = ID_FIELD,
    contiguous: bool = True,
    cache_handle: list | None = None,
) -> DataFrame:
    """Add a deterministic int64 ``id_field`` column, no shuffle.

    ``contiguous=False`` (the at-scale path): ``monotonically_increasing_id``
    — ONE pass, no driver round-trip. Ids are ``pid << 33 | local_idx``:
    sparse, but ordered identically to the contiguous scheme ((partition,
    local index) lexicographic), so min-id component labels and keep-first
    survivor picks are unchanged. ``contiguous=True`` mirrors the
    reference's contiguous np.arange ranges (id_generator.py:30-59) at the
    cost of an extra counting pass; use it when ranged id pushdown or
    external id contracts matter.

    The contiguous path must persist an internal frame so its two passes
    see identical partitioning; pass ``cache_handle=[]`` to receive that
    frame and ``.unpersist()`` it once the result has been written/consumed
    (otherwise it stays cached for the session — fine for short-lived jobs,
    a leak in a long-lived one).
    """
    if not contiguous:
        return df.withColumn(id_field, F.monotonically_increasing_id())
    # contiguous ids take TWO passes over the input (count, then assign);
    # localCheckpoint the partitioned frame so both passes see the
    # identical partitioning even when the upstream plan is
    # nondeterministic (shuffle, sample, AQE re-coalesce) — without this,
    # per-partition counts could disagree with the second pass and ids
    # would collide. Lineage truncation (not just persist) makes a lost
    # cache block a loud job failure instead of a silent recompute with
    # different partitioning.
    pid_col = "__cur_pid"
    with_pid = df.withColumn(pid_col, F.spark_partition_id()).localCheckpoint()
    if cache_handle is not None:
        cache_handle.append(with_pid)
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
                out = pdf.drop(columns=[pid_col])
                out[id_field] = []  # keep the declared output schema
                yield out
                continue
            pid = int(pdf[pid_col].iloc[0])
            base = offsets[pid] + local
            out = pdf.drop(columns=[pid_col])
            out[id_field] = range(base, base + len(pdf))
            local += len(pdf)
            yield out

    return with_pid.mapInPandas(add_ids, schema=out_schema)
