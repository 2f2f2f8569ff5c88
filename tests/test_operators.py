"""Operator tests against the reference's own fixtures (FIXTURES.md F3-F7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from curator_spark.config import GROUP_FIELD, ID_FIELD, MINHASH_FIELD, FuzzyDedupConfig
from curator_spark.operators import (
    assign_dedup_ids,
    connected_components,
    edges_from_buckets,
    exact_duplicates,
    identify_duplicates,
    lsh_bucket_ids,
    remove_duplicates,
)


def _pairs_from_components(comp_rows):
    """Same-cluster id pairs from (id, group) rows — label-invariant."""
    from collections import defaultdict

    groups = defaultdict(list)
    for r in comp_rows:
        groups[r[1]].append(r[0])
    pairs = set()
    for ids in groups.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


# F3: test_lsh_stage.py:40-116 fixture
LSH_SIGS = [
    (1, [1, 2, 1, 2, 1, 2]),
    (2, [1, 2, 3, 4, 5, 6]),
    (3, [3, 2, 1, 4, 5, 6]),
    (4, [9, 8, 7, 6, 5, 4]),
    (5, [3, 1, 2, 4, 5, 4]),
]


@pytest.mark.parametrize("num_salts", [1, 4])
def test_lsh_candidate_pairs_fixture(spark, num_salts):
    cfg = FuzzyDedupConfig(num_bands=3, minhashes_per_band=2)
    df = spark.createDataFrame(LSH_SIGS, [ID_FIELD, MINHASH_FIELD])
    buckets = lsh_bucket_ids(df, cfg)
    edges = edges_from_buckets(buckets, num_salts=num_salts)
    got = {(min(r.src, r.dst), max(r.src, r.dst)) for r in edges.collect()}
    assert got == {(1, 2), (2, 3), (4, 5)}


def test_lsh_band_range_loop_equivalent(spark):
    cfg = FuzzyDedupConfig(num_bands=3, minhashes_per_band=2, bands_per_iteration=1)
    df = spark.createDataFrame(LSH_SIGS, [ID_FIELD, MINHASH_FIELD])
    all_at_once = set(map(tuple, lsh_bucket_ids(df, cfg).collect()))
    looped = set()
    for lo in range(0, cfg.num_bands, cfg.bands_per_iteration):
        hi = min(lo + cfg.bands_per_iteration, cfg.num_bands)
        looped |= set(map(tuple, lsh_bucket_ids(df, cfg, band_range=(lo, hi)).collect()))
    assert looped == all_at_once


def test_lsh_arrow_impl_matches_numpy(spark, tmp_path):
    """The mapInArrow bucket-id path (zero pandas boxing) must emit the
    exact rows of the mapInPandas path — full set, band ranges, and when
    the signatures arrive through a parquet round trip (the pipeline's
    actual layout: checkpointed list<int> column)."""
    cfg = FuzzyDedupConfig(num_bands=3, minhashes_per_band=2)
    df = spark.createDataFrame(LSH_SIGS, [ID_FIELD, MINHASH_FIELD])
    for src in (df,):
        a = sorted(map(tuple, lsh_bucket_ids(src, cfg, impl="numpy").collect()))
        b = sorted(map(tuple, lsh_bucket_ids(src, cfg, impl="arrow").collect()))
        assert a == b and len(a) == len(LSH_SIGS) * cfg.num_bands
    df.write.parquet(str(tmp_path / "sigs"))
    pq = spark.read.parquet(str(tmp_path / "sigs"))
    a = sorted(map(tuple, lsh_bucket_ids(pq, cfg, impl="numpy", band_range=(1, 3)).collect()))
    b = sorted(map(tuple, lsh_bucket_ids(pq, cfg, impl="arrow", band_range=(1, 3)).collect()))
    assert a == b


# F4: buckets -> consecutive-pair edges (buckets_to_edges.py:76-78)
def test_buckets_to_edges_consecutive_pairs(spark):
    rows = [
        ("bucket_1", i) for i in [0, 1, 2]
    ] + [("bucket_2", i) for i in [1, 3, 4]] + [("bucket_3", 5)] + [
        ("bucket_4", i) for i in [2, 6, 7, 8]
    ] + [("bucket_5", i) for i in [3, 4, 10, 11]] + [("bucket_6", i) for i in [7, 12, 13]] + [
        ("bucket_7", i) for i in [11, 15, 16]
    ]
    df = spark.createDataFrame(rows, ["_bucket", ID_FIELD])
    edges = edges_from_buckets(df, bucket_fields=("_bucket",))
    got = {(r.src, r.dst) for r in edges.collect()}
    expected = set()
    for members in ([0, 1, 2], [1, 3, 4], [2, 6, 7, 8], [3, 4, 10, 11], [7, 12, 13], [11, 15, 16]):
        expected |= set(zip(members, members[1:]))
    assert got == expected  # bucket_3 (singleton) contributes nothing


# F5: connected-components fixtures (test_connected_components_stage.py:93-147)
def test_connected_components_fixture(spark):
    comp_a = [10, 11, 12, 13, 120]
    comp_b = [14, 15, 110]
    edges = list(zip(comp_a, comp_a[1:])) + list(zip(comp_b, comp_b[1:]))
    df = spark.createDataFrame(edges, ["src", "dst"])
    comps = connected_components(df)
    got = _pairs_from_components([(r[0], r[1]) for r in comps.collect()])
    want = _pairs_from_components([(i, "a") for i in comp_a] + [(i, "b") for i in comp_b])
    assert got == want


def test_connected_components_extra_file(spark):
    comp_a = [10, 11, 12, 13, 120]
    comp_b = [14, 15, 16, 17, 18, 19, 110, 111]
    edges = list(zip(comp_a, comp_a[1:])) + list(zip(comp_b, comp_b[1:]))
    df = spark.createDataFrame(edges, ["src", "dst"])
    comps = connected_components(df)
    got = _pairs_from_components([(r[0], r[1]) for r in comps.collect()])
    want = _pairs_from_components([(i, "a") for i in comp_a] + [(i, "b") for i in comp_b])
    assert got == want
    # deterministic labels: component min
    labels = {r[0]: r[1] for r in comps.collect()}
    assert labels[120] == 10
    assert labels[111] == 14


def test_connected_components_random_vs_union_find(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    n = 400
    edges = [(int(rng.randint(0, n)), int(rng.randint(0, n))) for _ in range(350)]
    edges = [e for e in edges if e[0] != e[1]]
    # union-find oracle
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    touched = {a for e in edges for a in e}
    want = _pairs_from_components([(i, find(i)) for i in touched])

    df = spark.createDataFrame(edges, ["src", "dst"])
    comps = connected_components(df)
    got = _pairs_from_components([(r[0], r[1]) for r in comps.collect()])
    assert got == want


# F6: exact dedup (test_identification.py:63-92)
def test_exact_duplicates_fixture(spark):
    rows = [(1, "Small String"), (2, "Large String"), (300, "Medium String"), (4, "Large String"), (-1, "Small String")]
    df = spark.createDataFrame(rows, [ID_FIELD, "text"])
    groups = exact_duplicates(df, fields=("text",))
    got = _pairs_from_components([(r[0], r[1]) for r in groups.collect()])
    assert got == {(-1, 1), (2, 4)}
    removal = identify_duplicates(groups)
    survivors = remove_duplicates(df, removal)
    # one survivor per group + the non-duplicated row
    texts = sorted(r.text for r in survivors.collect())
    assert texts == ["Large String", "Medium String", "Small String"]


def test_exact_duplicates_negative(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "aba"), (300, "abb")], [ID_FIELD, "content"])
    assert exact_duplicates(df, fields=("content",)).count() == 0


# F7: removal semantics (test_removal.py:30-80)
def test_removal_ignores_missing_ids(spark):
    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(1, 6)], [ID_FIELD, "text"])
    removal = spark.createDataFrame([(2,), (4,), (6,)], [ID_FIELD])
    kept = remove_duplicates(docs, removal)
    assert sorted(r[ID_FIELD] for r in kept.collect()) == [1, 3, 5]


def test_salted_edges_over_udf_plan_hot_corpus(spark):
    """Round-1 regression: the salted edge variant self-unions two branches
    over one mapInPandas bucket frame, which used to fail analysis
    ("key not found: dst#N"). edges_from_buckets now materializes the
    frame internally. Semantics: on a corpus with one hot bucket (30% of
    rows share a transcript verbatim), salted and unsalted runs must
    produce IDENTICAL components."""
    from curator_spark.datagen import generate_hot_clips
    from curator_spark.operators import minhash_stage

    cfg_base = dict(char_ngrams=12, num_bands=4, minhashes_per_band=3)
    docs = generate_hot_clips(spark, 300, hot_fraction=0.3, seed=11)
    docs = assign_dedup_ids(docs, contiguous=False)
    sigs = minhash_stage(docs, FuzzyDedupConfig(**cfg_base)).localCheckpoint()

    def components_with(num_salts):
        cfg = FuzzyDedupConfig(**cfg_base, num_salts=num_salts)
        # bare mapInPandas bucket frame — NOT checkpointed (the bug path)
        edges = edges_from_buckets(lsh_bucket_ids(sigs, cfg), num_salts=num_salts)
        comps = connected_components(edges)
        return _pairs_from_components([(r[0], r[1]) for r in comps.collect()])

    unsalted = components_with(1)
    salted = components_with(4)
    # the hot 90 rows must be one component in both
    assert len(unsalted) >= 90 * 89 // 2
    assert salted == unsalted


def test_fuzzy_64bit_hash_end_to_end(spark):
    """use_64bit_hash=True (fuzzy/minhash.py:144-155) through the full
    minhash -> LSH -> edges -> components path; on a corpus whose only
    duplicates are verbatim, 64- and 32-bit runs give the same components."""
    from curator_spark.datagen import generate_hot_clips
    from curator_spark.operators import minhash_stage

    docs = assign_dedup_ids(generate_hot_clips(spark, 120, hot_fraction=0.25, seed=13), contiguous=False)
    docs = docs.localCheckpoint()

    def comps_with(use64):
        cfg = FuzzyDedupConfig(char_ngrams=12, num_bands=4, minhashes_per_band=3, use_64bit_hash=use64)
        edges = edges_from_buckets(lsh_bucket_ids(minhash_stage(docs, cfg), cfg))
        return _pairs_from_components([(r[0], r[1]) for r in connected_components(edges).collect()])

    c64 = comps_with(True)
    assert len(c64) >= 30 * 29 // 2  # hot rows clustered
    assert c64 == comps_with(False)


def test_assign_dedup_ids_contiguous_unique(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(1000)], ["clip_id"]).repartition(7)
    out = assign_dedup_ids(df)
    ids = sorted(r[ID_FIELD] for r in out.collect())
    assert ids == list(range(1000))
    # key column intact
    assert out.where(F.col("clip_id") == "k5").count() == 1


def test_preserve_by_value(spark):
    from curator_spark.operators import preserve_by_value

    df = spark.createDataFrame(
        [("a", 10.0), ("b", 3.5), ("c", 10.0), ("d", 20.0)], "clip_id string, dur double"
    )
    assert {r.clip_id for r in preserve_by_value(df, "dur", 10.0, "eq").collect()} == {"a", "c"}
    assert {r.clip_id for r in preserve_by_value(df, "dur", 10.0, "lt").collect()} == {"b"}
    assert {r.clip_id for r in preserve_by_value(df, "dur", 10.0, "ge").collect()} == {"a", "c", "d"}
    assert {r.clip_id for r in preserve_by_value(df, "clip_id", "b", "ne").collect()} == {"a", "c", "d"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        preserve_by_value(df, "dur", 1, "between")


def test_batch_id_registry(tmp_path):
    import uuid

    from curator_spark.operators import BatchIdRegistry, hash_file_batch

    # the uuid5 formula is the reference spec (id_generator.py:47-49)
    assert hash_file_batch(["/a.parquet", "/b.parquet"]) == str(
        uuid.uuid5(uuid.NAMESPACE_URL, "/a.parquet;/b.parquet")
    )
    assert hash_file_batch("/a.parquet") == hash_file_batch(["/a.parquet"])

    reg = BatchIdRegistry()
    assert reg.register_batch(["/a.parquet"], 100) == 0
    assert reg.register_batch(["/b.parquet", "/c.parquet"], 50) == 100
    # idempotent re-registration returns the existing range start
    assert reg.register_batch(["/a.parquet"], 100) == 0
    assert reg.next_id == 150
    assert reg.get_batch_range(files=["/b.parquet", "/c.parquet"]) == (100, 149)

    p = str(tmp_path / "idreg.json")
    reg.to_json(p)
    back = BatchIdRegistry.from_json(p)
    assert back.next_id == 150
    assert back.get_batch_range(files=["/a.parquet"]) == (0, 99)
    # resume continues the id sequence
    assert back.register_batch(["/d.parquet"], 10) == 150


def test_exact_hash_key_injection_proof(spark):
    """Length-prefixed field encoding: control characters in field values
    must not let distinct rows collide across field boundaries."""
    rows = [
        (1, "x\x1fy", "z"),       # would concat-collide with row 2 under
        (2, "x", "y\x1fz"),       # a plain '\x1f' separator
        (3, "a", None),            # NULL vs the literal sentinel string
        (4, "a", "\x00null"),
        (5, "same", "same"),       # genuine duplicates still group
        (6, "same", "same"),
    ]
    df = spark.createDataFrame(rows, [ID_FIELD, "f1", "f2"])
    groups = exact_duplicates(df, fields=("f1", "f2"))
    got = _pairs_from_components([(r[0], r[1]) for r in groups.collect()])
    assert got == {(5, 6)}


def test_datagen_lite_transcript_invariant():
    """lite=True must change ONLY audio synthesis cost: clip ids,
    durations (/10) and TRANSCRIPTS identical to the full table — the
    invariant the scaling campaign's lite tables rely on. The block RNG
    draws all fixed-count materials before the duration-dependent randn,
    so a smaller n_samp cannot shift the transcript stream."""
    from curator_spark.datagen import BLOCK, _row

    for i in range(3 * BLOCK):
        full = _row(i, seed=42, lite=False)
        lite = _row(i, seed=42, lite=True)
        assert full[0] == lite[0]            # clip_id
        assert full[5] == lite[5], i         # transcript
        assert lite[3] == full[3] // 10      # dur_ms scaled, not redrawn
