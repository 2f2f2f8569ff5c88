"""Adaptive small-graph driver fast path for connected components:
value-identical labels vs the distributed large-star/small-star path
(reference analogue: cuGraph WCC consumes the same edge list,
fuzzy/connected_components.py:106-154 — label choice there is
arbitrary; ours is pinned to min member id on BOTH paths)."""

from __future__ import annotations

import random

import numpy as np
import pytest

from curator_spark.operators.connected_components import (
    _driver_components,
    connected_components,
)


def _groups(rows):
    """{frozenset(component members)} from (id, group) rows."""
    by = {}
    for r in rows:
        by.setdefault(r[1], set()).add(r[0])
    return {frozenset(v) for v in by.values()}


# ---------------------------------------------------------------------------
# pure numpy kernel


def test_kernel_path_graph_min_label():
    # path 10-11-12-13: one component labeled by its min
    ids, grp = _driver_components(
        np.array([10, 11, 12], dtype=np.int64), np.array([11, 12, 13], dtype=np.int64)
    )
    assert dict(zip(ids.tolist(), grp.tolist())) == {10: 10, 11: 10, 12: 10, 13: 10}


def test_kernel_two_components_and_reversed_edges():
    src = np.array([5, 2, 9, 8], dtype=np.int64)  # 5-1, 2-1 | 9-8
    dst = np.array([1, 1, 8, 9], dtype=np.int64)
    ids, grp = _driver_components(src, dst)
    m = dict(zip(ids.tolist(), grp.tolist()))
    assert m == {1: 1, 2: 1, 5: 1, 8: 8, 9: 8}


def test_kernel_empty():
    ids, grp = _driver_components(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    assert ids.size == 0 and grp.size == 0


def test_kernel_long_path_converges_logarithmically():
    # a 2000-node path has diameter 1999 — pointer jumping must make the
    # outer loop logarithmic, not linear (this test is instant when it is)
    n = 2000
    ids, grp = _driver_components(
        np.arange(n - 1, dtype=np.int64), np.arange(1, n, dtype=np.int64)
    )
    assert (grp == 0).all()


def test_kernel_matches_bruteforce_random():
    rng = random.Random(7)
    for trial in range(20):
        n = rng.randint(2, 60)
        edges = [
            (rng.randrange(n) * 7 + 3, rng.randrange(n) * 7 + 3)
            for _ in range(rng.randint(1, 2 * n))
        ]
        src = np.array([e[0] for e in edges], dtype=np.int64)
        dst = np.array([e[1] for e in edges], dtype=np.int64)
        ids, grp = _driver_components(src, dst)
        # brute-force union-find
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = {}
        for x in set(src.tolist()) | set(dst.tolist()):
            r = find(x)
            expect.setdefault(r, set()).add(x)
        expect_min = {x: min(members) for members in expect.values() for x in members}
        got = dict(zip(ids.tolist(), grp.tolist()))
        assert got == expect_min, f"trial {trial}"


# ---------------------------------------------------------------------------
# Spark operator: fast path == distributed path, plan shape, threshold


@pytest.fixture()
def edge_df(spark):
    rng = random.Random(13)
    rows = [(rng.randrange(400), rng.randrange(400)) for _ in range(300)]
    rows += [(1000 + i, 1001 + i) for i in range(30)]  # a long path
    rows += [(5, 5), (7, 7)]  # self loops (dropped)
    return spark.createDataFrame(rows, "src long, dst long")


def test_fast_equals_distributed(spark, edge_df):
    fast = connected_components(edge_df).collect()
    dist = connected_components(edge_df, driver_max_edges=0).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, dist))
    assert _groups(fast) == _groups(dist)


def _is_distributed_star_plan(df) -> bool:
    # the distributed path's final star emit is a Generate(explode) over
    # the checkpointed edge frame; the fast path returns a local/RDD scan
    # of driver-computed labels with no Generate anywhere
    return "Generate explode" in df._jdf.queryExecution().toString()


def test_fast_path_plan_is_local_scan(spark, edge_df):
    assert not _is_distributed_star_plan(connected_components(edge_df))
    assert _is_distributed_star_plan(connected_components(edge_df, driver_max_edges=0))


def test_threshold_boundary_forces_distributed(spark):
    # 3 deduped edges with a 2-edge budget -> distributed path runs
    df = spark.createDataFrame([(1, 2), (2, 3), (7, 8), (2, 1)], "src long, dst long")
    out = connected_components(df, driver_max_edges=2)
    assert _is_distributed_star_plan(out)
    assert _groups(out.collect()) == {frozenset({1, 2, 3}), frozenset({7, 8})}


def test_fast_path_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    out = connected_components(df)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["_curator_dedup_id", "_duplicate_group_id"]


def test_custom_field_names_fast_path(spark):
    df = spark.createDataFrame([(4, 2)], "src long, dst long")
    rows = connected_components(df, id_field="doc_id", group_field="g").collect()
    assert sorted((r["doc_id"], r["g"]) for r in rows) == [(2, 2), (4, 2)]
