"""File-level pruning in copy-on-write MERGE (plans/merge.py file_prune +
laketable._merge_key_prunable). The within-bucket refinement of bucket
pruning: files whose bounds/bloom prove no staged merge key is present
survive the commit byte-identical — never read, never rewritten. Contract
mirrors the other skip paths: absence of proof degrades to whole-bucket
behavior, never to a wrong result; NULL staged keys only match files not
proven null-free; MOR-dirty buckets rewrite whole."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.operators.lww import lww_dedup
from embulk_output_databricks_spark.plans.merge import (merge_apply,
                                                        merge_apply_mor)
from embulk_output_databricks_spark.sources.laketable import (LakeCatalog,
                                                              ROW_ID)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _mk(spark, warehouse, name="t", props=None, slices=(0, 100, 200, 300)):
    """Table with per-bucket files of DISJOINT key ranges (one append per
    range slice), so bounds can prove key absence."""
    cat = LakeCatalog(spark, f"{warehouse}/fp")
    p = {"merge_keys": "k"}
    p.update(props or {})
    t = cat.create_table(name, SCHEMA, n_buckets=2, bucket_key="k",
                         properties=p)
    for lo in slices:
        t.append(spark.createDataFrame(
            [(i, f"v{i}") for i in range(lo, lo + 100)], SCHEMA))
    return t


def _state(t):
    return {(r["k"], r["v"]) for r in t.read().collect()}


def test_prune_keeps_unmatched_files_verbatim(spark, warehouse):
    t = _mk(spark, warehouse)
    files0 = {f["path"] for f in t.manifest().files}
    assert len(files0) == 8  # 4 slices x 2 buckets
    batch = spark.createDataFrame(
        [(i, f"N{i}") for i in range(10)] + [(1000, "INS")], SCHEMA)
    m1 = merge_apply(t, batch, ["k"])
    kept = files0 & {f["path"] for f in m1.files}
    # at most the two files covering 0..99 (one per bucket) rewrite
    assert len(kept) >= 6
    assert _state(t) == ({(i, f"N{i}") for i in range(10)}
                         | {(i, f"v{i}") for i in range(10, 400)}
                         | {(1000, "INS")})


def test_prune_matches_unpruned_result_and_lineage(spark, warehouse):
    ta = _mk(spark, warehouse, "a")
    tb = _mk(spark, warehouse, "b")
    rid0 = {r["k"]: r[ROW_ID]
            for r in ta.read(with_row_ids=True).collect()}
    batch = spark.createDataFrame(
        [(5, "X"), (205, "Y"), (999, "Z")], SCHEMA)
    merge_apply(ta, batch, ["k"])                    # pruned
    merge_apply(tb, batch, ["k"], file_prune=False)  # whole-bucket
    assert _state(ta) == _state(tb)
    # pruned-file rows keep their row ids (files untouched); updated
    # rows keep identity through the rewrite
    rid1 = {r["k"]: r[ROW_ID]
            for r in ta.read(with_row_ids=True).collect()}
    for k in (0, 7, 150, 399, 5, 205):
        assert rid1[k] == rid0[k]


def test_prune_with_deletes_and_guard(spark, warehouse):
    t = _mk(spark, warehouse, props={"merge_keys": "k"})
    files0 = {f["path"] for f in t.manifest().files}
    # mixed batch: delete k=3, update k=7, insert k=777 (all in slice 0)
    op_schema = T.StructType(list(SCHEMA.fields)
                             + [T.StructField("op", T.StringType())])
    batch = spark.createDataFrame(
        [(3, None, "D"), (7, "UP", "U"), (777, "NEW", "U")], op_schema)
    m1 = merge_apply(t, batch, ["k"], support_deletes=True)
    assert len(files0 & {f["path"] for f in m1.files}) >= 6
    st = _state(t)
    assert (3, "v3") not in st and (7, "UP") in st and (777, "NEW") in st
    assert not any(k == 3 for k, _ in st)


def test_guard_col_with_pruning(spark, warehouse):
    sch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("seq", T.LongType()),
    ])
    cat = LakeCatalog(spark, f"{warehouse}/g")
    t = cat.create_table("t", sch, n_buckets=2, bucket_key="k",
                         properties={"merge_keys": "k"})
    for lo in (0, 100):
        t.append(spark.createDataFrame(
            [(i, f"v{i}", 10) for i in range(lo, lo + 100)], sch))
    files0 = {f["path"] for f in t.manifest().files}
    # staged seq 5 < committed 10: stale, row must keep committed state
    batch = spark.createDataFrame([(5, "STALE", 5), (6, "FRESH", 20)], sch)
    m1 = merge_apply(t, batch, ["k"], guard_col="seq")
    assert len(files0 & {f["path"] for f in m1.files}) >= 2
    rows = {r["k"]: (r["v"], r["seq"]) for r in t.read().collect()}
    assert rows[5] == ("v5", 10) and rows[6] == ("FRESH", 20)


def test_mor_dirty_bucket_rewrites_whole(spark, warehouse):
    t = _mk(spark, warehouse)
    # park a MOR delta on key 0 -> its bucket becomes resolution-dirty
    merge_apply_mor(t, spark.createDataFrame([(0, "MOR0")], SCHEMA), ["k"])
    m0 = t.manifest()
    b_dirty = next(f["bucket"] for f in m0.files if f.get("kind") == "delta")
    clean0 = {f["path"] for f in m0.files
              if f.get("kind") != "delta" and f["bucket"] != b_dirty}
    batch = spark.createDataFrame([(0, "COW0"), (1, "COW1")], SCHEMA)
    m1 = merge_apply(t, batch, ["k"])
    files1 = {f["path"] for f in m1.files}
    # the dirty bucket rewrote whole (no delta survives);
    # the clean bucket still pruned (only its 0..99 file rewrote)
    assert not any(f.get("kind") == "delta" for f in m1.files)
    assert len(clean0 & files1) >= 3
    st = _state(t)
    assert (0, "COW0") in st and (1, "COW1") in st
    assert len(st) == 400


def test_bloom_prunes_when_bounds_overlap(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/bl")
    t = cat.create_table("t", SCHEMA, n_buckets=1, bucket_key="k",
                         properties={"merge_keys": "k",
                                     "bloom_columns": "k"})
    # interleaved slices: every file spans [~0, ~400) so bounds never
    # prune, but values are disjoint mod 4 -> bloom proves absence
    for j in range(4):
        t.append(spark.createDataFrame(
            [(i, f"v{i}") for i in range(j, 400, 4)], SCHEMA))
    files0 = {f["path"] for f in t.manifest().files}
    batch = spark.createDataFrame([(8, "N8"), (16, "N16")], SCHEMA)
    m1 = merge_apply(t, batch, ["k"])
    # staged keys are ≡0 mod 4: the three other files survive by bloom
    assert len(files0 & {f["path"] for f in m1.files}) == 3
    st = _state(t)
    assert (8, "N8") in st and (16, "N16") in st and len(st) == 400


def test_null_staged_key_is_conservative(spark, warehouse):
    t = _mk(spark, warehouse, slices=(0, 100))
    # a row with NULL key lives in some file (appended separately)
    t.append(spark.createDataFrame([(None, "nullrow")], SCHEMA))
    batch = spark.createDataFrame([(None, "NULLUP")], SCHEMA)
    merge_apply(t, batch, ["k"])
    st = _state(t)
    # NULL-safe match: the NULL-keyed row updated, everything else kept
    assert (None, "NULLUP") in st and (None, "nullrow") not in st
    assert len(st) == 201


def test_fileprune_off_threshold(spark, warehouse):
    t = _mk(spark, warehouse, slices=(0, 100))
    files0 = {f["path"] for f in t.manifest().files}
    batch = spark.createDataFrame([(5, "X")], SCHEMA)
    m1 = merge_apply(t, batch, ["k"], file_prune_max_keys=0)
    # gate at 0 keys: falls back to whole-bucket behavior
    kept = files0 & {f["path"] for f in m1.files}
    assert len(kept) == 2  # the other bucket's two files only
    assert (5, "X") in _state(t)
