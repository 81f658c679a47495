"""Equality-delete sidecars (LakeTable.delete_keys — Iceberg v2
equality-delete analog). The reference's only delete is truncate-everything
(README.md:58-61); delete_keys removes a set of keys with ZERO data-file IO
at delete time: one small sidecar of deleted key tuples, applied centrally
at read (_df_for_files), folded away by compaction.

Semantics under test mirror Iceberg's sequence-number rule via explicit
target lists: the delete hits every data+delta file live at commit time;
rows appended afterwards resurrect the key.
"""
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.sources.laketable import (
    CommitConflict,
    LakeCatalog,
    SchemaEvolutionError,
)

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("v", T.StringType()),
])


@pytest.fixture()
def cat(spark, tmp_path):
    return LakeCatalog(spark, str(tmp_path / uuid.uuid4().hex))


def _table(cat, spark, rows=20, n_buckets=4):
    t = cat.create_table("t", SCHEMA, n_buckets=n_buckets,
                         bucket_key="user_id",
                         properties={"merge_keys": "user_id"})
    t.append(cat.spark.createDataFrame(
        [(i, f"v{i}") for i in range(rows)], SCHEMA))
    return t


def _ids(t):
    return sorted(r.user_id for r in t.read().collect())


def test_delete_keys_zero_data_io(cat, spark):
    t = _table(cat, spark)
    before = {f["path"] for f in t.manifest().files}
    m = t.delete_keys(spark.createDataFrame(
        [(i,) for i in range(0, 20, 3)], "user_id long"))
    # the commit touched NO data file — only a sidecar was added
    assert {f["path"] for f in m.files if f.get("kind") != "eqdel"} == before
    assert m.properties["operation"] == "delete_keys"
    assert m.properties["eqdel_keys"] == 7
    assert _ids(t) == [i for i in range(20) if i % 3 != 0]
    # row_count stays exact (IO-assisted over targeted files only)
    assert t.row_count() == 13


def test_later_append_resurrects(cat, spark):
    t = _table(cat, spark)
    t.delete_keys(spark.createDataFrame([(0,), (3,)], "user_id long"))
    t.append(spark.createDataFrame([(0, "back")], SCHEMA))
    got = {r.user_id: r.v for r in t.read().collect()}
    assert got[0] == "back" and 3 not in got


def test_old_delta_dies_new_delta_resurrects(cat, spark):
    t = _table(cat, spark, rows=4)
    # delta upsert BEFORE the delete: targeted, must die with the key
    t.append_delta(spark.createDataFrame([(2, "b2")], SCHEMA),
                   merge_keys=["user_id"])
    t.delete_keys(spark.createDataFrame([(2,)], "user_id long"))
    assert _ids(t) == [0, 1, 3]
    assert t.row_count() == 3
    # delta upsert AFTER the delete: outside the target set, resurrects
    t.append_delta(spark.createDataFrame([(2, "b3")], SCHEMA),
                   merge_keys=["user_id"])
    got = {r.user_id: r.v for r in t.read().collect()}
    assert got[2] == "b3"


def test_bucket_scoped_targets(cat, spark):
    # one key -> targets prune to that key's bucket, not the whole table
    t = _table(cat, spark, rows=64, n_buckets=8)
    n_files = len(t.manifest().files)
    m = t.delete_keys(spark.createDataFrame([(1,)], "user_id long"))
    e = next(f for f in m.files if f.get("kind") == "eqdel")
    assert len(e["targets"]) < n_files
    assert 1 not in _ids(t) and 2 in _ids(t)


def test_compact_folds_eqdel(cat, spark):
    t = _table(cat, spark)
    t.delete_keys(spark.createDataFrame([(5,), (7,)], "user_id long"))
    assert t.eqdel_file_count() == 1
    assert t.compact(min_files_per_bucket=1) is not None
    assert t.eqdel_file_count() == 0
    assert _ids(t) == [i for i in range(20) if i not in (5, 7)]
    # folded -> manifest-only row_count path again
    assert t.row_count() == 18


def test_rename_and_widen_keep_matching(cat, spark):
    t = _table(cat, spark, rows=6)
    t.delete_keys(spark.createDataFrame([(4,)], "user_id long"))
    t.rename_column("user_id", "uid")  # key recorded by field id
    assert sorted(r.uid for r in t.read().collect()) == [0, 1, 2, 3, 5]
    # merge_keys property followed the rename (MOR still resolvable)
    t.append_delta(spark.createDataFrame(
        [(5, "nv")], "uid long, v string"), merge_keys=["uid"])
    got = {r.uid: r.v for r in t.read().collect()}
    assert got[5] == "nv"


def test_drop_column_guard(cat, spark):
    t = _table(cat, spark, rows=4)
    t.delete_keys(spark.createDataFrame([("v1",)], "v string"))
    with pytest.raises(SchemaEvolutionError, match="equality-delete"):
        t.drop_column("v")
    t.compact(min_files_per_bucket=1)
    t.drop_column("v")  # folded -> drop is legal again


def test_eqdel_and_posdel_mix(cat, spark):
    t = _table(cat, spark)
    t.delete_keys(spark.createDataFrame([(1,), (2,)], "user_id long"))
    # posdel on top (predicate delete in MOR mode) — both kinds coexist
    t.delete_where({"user_id": (10, 12)}, mode="mor")
    assert _ids(t) == [0, 3, 4, 5, 6, 7, 8, 9, 13, 14, 15, 16, 17, 18, 19]
    assert t.row_count() == 15


def test_changelog_and_added_rows_refuse_eqdel_interval(cat, spark):
    t = _table(cat, spark, rows=4)
    v0 = t.manifest().version
    t.delete_keys(spark.createDataFrame([(1,)], "user_id long"))
    with pytest.raises(ValueError, match="equality-delete"):
        t.added_rows(v0)
    with pytest.raises(ValueError, match="equality-delete"):
        t.changelog(v0)
    # diff() is the strategy-agnostic feed and must see the delete
    d = t.diff(v0, keys=["user_id"])
    ops = {(r["user_id"], r["__op"]) for r in d.collect()}
    assert ops == {(1, "D")}


def test_concurrent_rewrite_conflicts_append_commutes(cat, spark):
    t = _table(cat, spark)
    name, root = t.name, t.root

    # writer A stages a delete against the current snapshot, writer B
    # compacts (rewrites every targeted file) first -> A must conflict
    a = LakeCatalog(spark, cat.warehouse).load(name)
    stale = a.manifest()
    t.compact(min_files_per_bucket=1)
    with pytest.raises(CommitConflict):
        a._commit(stale, stale.files + [a._write_eqdel_file(
            spark.createDataFrame([(0,)], "user_id long"),
            ["user_id"], [stale.schema_version.fields[0]["id"]], ["bigint"],
            sorted(__import__("os").path.basename(f["path"])
                   for f in stale.files), stale)],
            {"operation": "delete_keys"})

    # append race commutes: B appends, A's delete rebases; the appended
    # row is NOT targeted and survives
    stale2 = a.manifest()
    t.append(spark.createDataFrame([(100, "new")], SCHEMA))
    m = a._commit(stale2, stale2.files + [a._write_eqdel_file(
        spark.createDataFrame([(0,)], "user_id long"),
        ["user_id"], [stale2.schema_version.fields[0]["id"]], ["bigint"],
        sorted(__import__("os").path.basename(f["path"])
               for f in stale2.files), stale2)],
        {"operation": "delete_keys"})
    assert m.properties.get("commit_retries", 0) >= 1
    ids = _ids(t)
    assert 0 not in ids and 100 in ids


def test_empty_keys_and_empty_table_are_noops(cat, spark):
    t = _table(cat, spark, rows=4)
    v = t.manifest().version
    m = t.delete_keys(spark.createDataFrame([], "user_id long"))
    assert m.version == v  # no commit
    t2 = cat.create_table("empty", SCHEMA, n_buckets=2, bucket_key="user_id")
    m2 = t2.delete_keys(spark.createDataFrame([(1,)], "user_id long"))
    assert m2.version == t2.manifest().version


def test_composite_key_delete(cat, spark):
    t = _table(cat, spark, rows=6)
    # two-column equality: only the exact (user_id, v) pair dies
    t.delete_keys(spark.createDataFrame([(3, "v3")],
                                        "user_id long, v string"))
    assert _ids(t) == [0, 1, 2, 4, 5]
    t.append(spark.createDataFrame([(3, "other")], SCHEMA))
    got = {(r.user_id, r.v) for r in t.read().collect()}
    assert (3, "other") in got and (3, "v3") not in got


def test_merge_delete_only_batch_fast_path(cat, spark):
    """A deduped CDC batch that is ALL deletes commits an eqdel sidecar —
    zero target-bucket IO — instead of joining + rewriting (merge_apply's
    delete-only fast path). Final state must equal the regular plan's."""
    from embulk_output_databricks_spark.plans.merge import merge_apply

    t = _table(cat, spark)
    before = {f["path"] for f in t.manifest().files}
    staged = spark.createDataFrame(
        [(2, None, "D"), (5, None, "D")], "user_id long, v string, op string")
    m = merge_apply(t, staged, keys=["user_id"],
                    properties={"batch_id": 7})
    assert m.properties["operation"] == "merge-eqdel"
    assert m.properties["batch_id"] == 7  # fence stamp rides the snapshot
    assert {f["path"] for f in m.files if f.get("kind") != "eqdel"} == before
    assert _ids(t) == [i for i in range(20) if i not in (2, 5)]
    # mixed batch must NOT take the fast path
    staged2 = spark.createDataFrame(
        [(1, None, "D"), (50, "new", "U")],
        "user_id long, v string, op string")
    m2 = merge_apply(t, staged2, keys=["user_id"])
    assert m2.properties["operation"] == "merge"
    ids = _ids(t)
    assert 1 not in ids and 50 in ids


def test_merge_delete_only_on_empty_table_still_commits(cat, spark):
    """Fall-through: nothing to delete -> the regular plan commits anyway,
    so the fence's batch_id stamp always lands on a snapshot."""
    from embulk_output_databricks_spark.plans.merge import merge_apply

    t = cat.create_table("e", SCHEMA, n_buckets=2, bucket_key="user_id",
                         properties={"merge_keys": "user_id"})
    v0 = t.manifest().version
    staged = spark.createDataFrame([(1, None, "D")],
                                   "user_id long, v string, op string")
    m = merge_apply(t, staged, keys=["user_id"], properties={"batch_id": 1})
    assert m.version > v0
    assert m.properties["batch_id"] == 1
    assert t.read().count() == 0


def test_null_keys_never_match(cat, spark):
    t = cat.create_table("n", SCHEMA, n_buckets=2, bucket_key="user_id")
    t.append(spark.createDataFrame([(1, "a"), (2, None)], SCHEMA))
    m = t.delete_keys(spark.createDataFrame([(None,)], "v string"))
    # NULL key row dropped from the sidecar -> no commit at all
    assert m.version == t.manifest().version or t.eqdel_file_count() == 0
    assert sorted(r.user_id for r in t.read().collect()) == [1, 2]
