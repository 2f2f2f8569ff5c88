"""Weakly-connected components via iterative DataFrame self-joins.

The reference calls cuGraph's WCC (fuzzy/connected_components.py:106-154);
the north rule forbids a graph library, so we implement the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014): O(log n) rounds regardless of component
diameter — which matters because LSH path-graph edges make a k-duplicate
cluster a path of diameter k-1 (naive label propagation would need k
rounds).

Each round is two joins + two aggregations, with ``localCheckpoint`` to
truncate lineage (per-round plans would otherwise grow unboundedly).
Convergence = the small-star edge set reaches a fixpoint (checked with a
count + order-invariant xxhash64 checksum, one tiny agg per round).
At the fixpoint every component is a star rooted at its minimum id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import GROUP_FIELD, ID_FIELD


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.select("src", "dst").union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(F.min("dst").alias("_mn"))
    mins = mins.select("src", F.least(F.col("_mn"), F.col("src")).alias("_m"))
    out = (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    )
    return out.distinct()


def _small_star(edges: DataFrame) -> DataFrame:
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("_m"))
    neighbor_edges = oriented.join(mins, "src").select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
    self_edges = mins.select("src", F.col("_m").alias("dst"))
    return neighbor_edges.union(self_edges).where(F.col("src") != F.col("dst")).distinct()


def _checksum(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),  # ANSI-safe
    ).collect()[0]
    return (row["n"], row["h"])


class _Scratch:
    """Tracks parquet scratch dirs created by the localCheckpoint fallback
    so each round's scratch is deleted once the NEXT round has materialized
    (the returned frame reads its own dir lazily, so only strictly older
    dirs are safe to remove). Any dirs still alive when the final result is
    consumed are removed at interpreter exit."""

    def __init__(self, root: str | None):
        import atexit

        self.root = root
        self.dirs: list[str] = []
        atexit.register(self.cleanup_all)

    def mkdir(self) -> str:
        import tempfile

        if self.root:
            os.makedirs(self.root, exist_ok=True)
        d = tempfile.mkdtemp(prefix="cc_round_", dir=self.root)
        self.dirs.append(d)
        return d

    def cleanup_older_than_latest(self) -> None:
        import shutil

        while len(self.dirs) > 1:
            shutil.rmtree(self.dirs.pop(0), ignore_errors=True)

    def cleanup_all(self) -> None:
        import shutil

        while self.dirs:
            shutil.rmtree(self.dirs.pop(), ignore_errors=True)


def _materialize(df: DataFrame, scratch: "_Scratch") -> DataFrame:
    """Truncate lineage: localCheckpoint, falling back to a scratch
    parquet round-trip (the reference's own strategy — its stages
    exchange parquet, workflow.py:229-255). The fallback exists because
    localCheckpoint in long sessions can hit a Catalyst
    attribute-resolution bug ("key not found: dst#N") when the session
    holds reused-exchange state from earlier queries.

    On a multi-node cluster pass ``scratch_dir`` (shared storage) to
    ``connected_components``; driver-local /tmp is only correct in local
    mode. Scratch dirs are tracked and cleaned (see _Scratch)."""
    try:
        return df.localCheckpoint()
    except Exception:
        d = scratch.mkdir()
        df.write.mode("overwrite").parquet(d + "/e")
        # the returned frame reads from the dir lazily (an eager
        # re-checkpoint would re-enter the same buggy code path)
        return df.sparkSession.read.parquet(d + "/e")


def _round_with_observation(cur: DataFrame, scratch: "_Scratch"):
    """One large-star/small-star round, materialized by localCheckpoint,
    with the convergence checksum piggybacked on the SAME pass via
    ``observe`` — one job per round instead of two."""
    from pyspark.sql import Observation

    obs = Observation()
    nxt = _small_star(_large_star(cur)).observe(
        obs,
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
    )
    try:
        nxt = nxt.localCheckpoint()  # eager: triggers the job, fills the observation
        got = obs.get
        return nxt, (got["n"], got["h"])
    except Exception:
        nxt = _materialize(_small_star(_large_star(cur)), scratch)
        return nxt, _checksum(nxt)


def connected_components(
    edges: DataFrame,
    id_field: str = ID_FIELD,
    group_field: str = GROUP_FIELD,
    max_iterations: int = 50,
    scratch_dir: str | None = None,
) -> DataFrame:
    """Undirected edges (src, dst) -> (id_field, group_field) labels.

    Component label = minimum member id (deterministic; the reference's
    labels are arbitrary — recall compares same-cluster *pairs*, which is
    label-invariant, SURVEY §7.0-5). Nodes with no edges don't appear
    (singletons are their own component by construction, as in the
    reference where CC consumes only the edge list).
    """
    # Spark's UnionBase.rewriteConstraints can crash ("key not found:
    # src#N") when a round's self-union (large-star symmetrization) is
    # optimized under the round's joins, for memory-sink/streaming-result
    # inputs (parquet sources are unaffected). Sessions built by
    # curator_spark.session.get_spark pin constraintPropagation off, which
    # sidesteps it; on foreign sessions the try/except parquet-scratch
    # fallback in _materialize/_round_with_observation absorbs the crash.
    # No session conf is flipped here (a scoped set/restore is a race on a
    # shared session).
    scratch = _Scratch(scratch_dir)
    cur = _materialize(
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"]),
        scratch,
    )
    prev_sum = None
    for _ in range(max_iterations):
        cur, s = _round_with_observation(cur, scratch)
        scratch.cleanup_older_than_latest()
        if s == prev_sum:
            break
        prev_sum = s
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")

    # fixpoint is a star (child -> root); roots label themselves
    children = cur.select(F.col("src").alias(id_field), F.col("dst").alias(group_field))
    roots = cur.select(F.col("dst").alias(id_field)).distinct().withColumn(group_field, F.col(id_field))
    return children.union(roots).dropDuplicates([id_field])
