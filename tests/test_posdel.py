"""Positional-delete sidecars (Iceberg v2 position-delete analog;
delete_where(mode='mor')). Invariants: boundary files keep their exact
paths and the sidecar is O(matched rows); reads/merges/updates/diffs all
resolve posdels (applied centrally in _df_for_files); (file,pos) pairs
dedup at write so manifest row accounting stays exact; compact() folds
posdels away; physical-replay feeds (added_rows/changelog) refuse
intervals containing posdels instead of silently dropping deletes."""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from tests.test_laketable import seq_rows


def _mk(spark, warehouse, name="pd", **kw):
    cat = LakeCatalog(spark, warehouse)
    kw.setdefault("n_buckets", 2)
    kw.setdefault("bucket_key", "doc_id")
    return cat.create_table(name, SEQUENCES_SCHEMA, **kw)


def test_mor_delete_keeps_boundary_paths_and_row_accounting(spark, warehouse):
    t = _mk(spark, warehouse)
    t.append(seq_rows(spark, range(0, 100)))
    t.append(seq_rows(spark, range(100, 200)))
    t.append(seq_rows(spark, range(200, 300)))
    before = {f["path"] for f in t.manifest().files}
    # slice 0 fully matches (metadata drop), slice 1 straddles (posdel,
    # NOT rewritten), slice 2 disjoint (untouched)
    m = t.delete_where({"doc_id": (None, "doc00000149")}, mode="mor")
    assert m.properties["delete_dropped_files"] >= 1
    assert m.properties["delete_rewritten_files"] == 0
    assert m.properties["delete_posdel_files"] >= 1
    assert m.properties["delete_posdel_rows"] == 50
    # every surviving data file kept its exact path (zero data IO)
    data_after = {f["path"] for f in m.files if f.get("kind") != "posdel"}
    assert data_after <= before
    got = {r["doc_id"] for r in t.read().collect()}
    assert got == {f"doc{i:08d}" for i in range(150, 300)}
    assert t.row_count() == 150
    # re-running the same delete adds NO posdel rows (pair dedup at write)
    m2 = t.delete_where({"doc_id": (None, "doc00000149")}, mode="mor")
    assert m2.properties["delete_posdel_rows"] == 0
    assert t.row_count() == 150


def test_posdels_fold_away_on_compact(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 50)))
    t.append(seq_rows(spark, range(50, 100)))
    t.delete_where({"doc_id": ("doc00000020", "doc00000069")}, mode="mor")
    assert t.posdel_file_count() >= 1
    t.compact(min_files_per_bucket=1)
    assert t.posdel_file_count() == 0
    got = {r["doc_id"] for r in t.read().collect()}
    assert got == {f"doc{i:08d}" for i in range(100) if not 20 <= i <= 69}
    assert t.row_count() == 50


def test_merge_over_posdeleted_rows(spark, warehouse):
    from embulk_output_databricks_spark.plans.merge import merge_apply

    t = _mk(spark, warehouse)
    t.append(seq_rows(spark, range(0, 40), src="old"))
    t.delete_where({"doc_id": ("doc00000010", "doc00000019")}, mode="mor")
    # upsert re-inserts one deleted key and updates one live key
    staged = spark.createDataFrame(
        [("doc00000012", [9], 1, "back"), ("doc00000030", [9], 1, "upd")],
        SEQUENCES_SCHEMA)
    merge_apply(t, staged, keys=["doc_id"])
    got = {r["doc_id"]: r["source"] for r in t.read().collect()}
    assert got["doc00000012"] == "back"
    assert got["doc00000030"] == "upd"
    assert "doc00000015" not in got          # still deleted
    assert len(got) == 31                    # 40 - 10 deleted + 1 reinserted
    # merge rewrote the affected buckets -> no posdel should survive
    # targeting rewritten files; any remaining posdel targets only files
    # that still exist
    alive = {f["path"].split("/")[-1] for f in t.manifest().files
             if f.get("kind") != "posdel"}
    for p in t.manifest().files:
        if p.get("kind") == "posdel":
            assert set(p["targets"]) <= alive


def test_update_where_does_not_resurrect_posdeleted_rows(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 30)))
    t.delete_where({"doc_id": ("doc00000005", "doc00000009")}, mode="mor")
    t.update_where({"doc_id": (None, "doc00000014")}, {"source": "'upd'"})
    got = {r["doc_id"]: r["source"] for r in t.read().collect()}
    assert len(got) == 25
    assert "doc00000007" not in got
    assert got["doc00000003"] == "upd" and got["doc00000012"] == "upd"
    assert got["doc00000020"] == "web"
    assert t.posdel_file_count() == 0  # the rewrite folded them in


def test_mor_update_keeps_boundary_paths(spark, warehouse):
    t = _mk(spark, warehouse)
    t.append(seq_rows(spark, range(0, 100)))
    t.append(seq_rows(spark, range(100, 200)))
    before = {f["path"] for f in t.manifest().files}
    # straddles the first slice: boundary files posdel'd + re-appended,
    # second slice disjoint (zero IO)
    m = t.update_where({"doc_id": (None, "doc00000049")},
                       {"source": "'upd'", "n_tok": "n_tok + 100"},
                       mode="mor")
    assert m.properties["update_rewritten_files"] == 0
    assert m.properties["update_posdel_files"] >= 1
    assert m.properties["update_posdel_rows"] == 50
    assert m.properties["update_skipped_files"] >= 1
    # every pre-existing data file kept its exact path
    assert before <= {f["path"] for f in m.files}
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert len(got) == 200 and t.row_count() == 200
    assert got["doc00000010"]["source"] == "upd"
    assert got["doc00000010"]["n_tok"] == 103  # SET saw the pre-update row (3+100)
    assert got["doc00000150"]["source"] == "web"


def test_mor_update_after_mor_delete_and_compact_folds(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 30)))
    t.delete_where({"doc_id": ("doc00000005", "doc00000009")}, mode="mor")
    # deleted rows stay dead: neither resurrected nor re-posdel'd
    m = t.update_where({"doc_id": (None, "doc00000014")}, {"source": "'upd'"},
                       mode="mor")
    assert m.properties["update_posdel_rows"] == 10  # 15 in range - 5 dead
    got = {r["doc_id"]: r["source"] for r in t.read().collect()}
    assert len(got) == 25 and t.row_count() == 25
    assert "doc00000007" not in got
    assert got["doc00000003"] == "upd" and got["doc00000012"] == "upd"
    assert got["doc00000020"] == "web"
    # idempotent re-run: rows already equal target values still re-update
    # (SQL semantics), pairs target the NEW files now, accounting stays exact
    t.update_where({"doc_id": (None, "doc00000014")}, {"source": "'upd'"},
                   mode="mor")
    assert t.row_count() == 25 and t.read().count() == 25
    t.compact(min_files_per_bucket=1)
    assert t.posdel_file_count() == 0
    assert {r["doc_id"] for r in t.read().collect()} == \
        {f"doc{i:08d}" for i in range(30) if not 5 <= i <= 9}


def test_stats_skip_and_time_travel_with_posdels(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 50)))
    v_before = t.manifest().version
    t.delete_where({"doc_id": ("doc00000000", "doc00000004")}, mode="mor")
    # bounds-skip still exact: deleted rows cannot resurrect via skipping
    got = {r["doc_id"] for r in
           t.read(stats_filter={"doc_id": (None, "doc00000009")}).collect()}
    assert got == {f"doc{i:08d}" for i in range(5, 10)}
    # time travel to the pre-delete snapshot sees all rows
    assert t.read(version=v_before).count() == 50
    # diff reports exactly the deleted keys as 'D'
    d = t.diff(v_before, keys=["doc_id"])
    ops = {r["doc_id"]: r["__op"] for r in d.collect()}
    assert ops == {f"doc{i:08d}": "D" for i in range(5)}


def test_physical_feeds_refuse_posdel_intervals(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1,
            properties={"merge_keys": "doc_id"})
    t.append(seq_rows(spark, range(0, 20)))
    v0 = t.manifest().version
    t.delete_where({"doc_id": (None, "doc00000004")}, mode="mor")
    with pytest.raises(ValueError, match="positional-delete"):
        t.added_rows(v0)
    with pytest.raises(ValueError, match="positional-delete"):
        t.changelog(v0)


def test_posdel_survives_rename_and_applies_by_basename(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 20)))
    t.delete_where({"doc_id": (None, "doc00000004")}, mode="mor")
    t.rename_column("doc_id", "document_id")
    got = {r["document_id"] for r in t.read().collect()}
    assert got == {f"doc{i:08d}" for i in range(5, 20)}
    assert t.row_count() == 15


def test_mor_delete_with_nulls_never_drops_null_rows(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    rows = [(f"doc{i:08d}", [i], 1, None if i % 2 else "web") for i in range(10)]
    t.append(spark.createDataFrame(rows, SEQUENCES_SCHEMA))
    m = t.delete_where({"source": ("web", "web")}, mode="mor")
    assert m.properties["delete_dropped_files"] == 0
    assert m.properties["delete_posdel_rows"] == 5
    got = t.read().collect()
    assert {r["doc_id"] for r in got} == {f"doc{i:08d}" for i in range(10) if i % 2}
    assert all(r["source"] is None for r in got)


def test_compact_posdels_consolidates_sidecars(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1, name="pdc")
    t.append(seq_rows(spark, range(0, 40)))
    t.append(seq_rows(spark, range(40, 80)))
    # three separate MOR deletes -> three sidecars
    for lo, hi in ((5, 9), (45, 49), (70, 74)):
        t.delete_where({"doc_id": (f"doc{lo:08d}", f"doc{hi:08d}")},
                       mode="mor")
    assert t.posdel_file_count() == 3
    before_rows = {r["doc_id"] for r in t.read().collect()}
    before_data = {f["path"] for f in t.manifest().files
                   if f.get("kind") not in ("posdel", "eqdel")}
    v_pre = t.current_version()
    m = t.compact_posdels()
    assert m is not None and m.properties["posdels_merged"] == 3
    assert t.posdel_file_count() == 1
    # zero data IO: every data file kept its exact path
    after_data = {f["path"] for f in t.manifest().files
                  if f.get("kind") not in ("posdel", "eqdel")}
    assert after_data == before_data
    # reads identical; merged pair count = sum of the three deletes
    assert {r["doc_id"] for r in t.read().collect()} == before_rows
    assert t.row_count() == 80 - 15
    [pd] = [f for f in t.manifest().files if f.get("kind") == "posdel"]
    assert pd["rows"] == 15
    # time travel to the pre-consolidation snapshot still resolves
    assert len(t.read(version=v_pre).collect()) == 65
    # idempotent: nothing left to merge
    assert t.compact_posdels() is None


def test_compact_posdels_drops_dead_pairs(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1, name="pdd")
    t.append(seq_rows(spark, range(0, 30)))
    t.append(seq_rows(spark, range(30, 60)))
    t.delete_where({"doc_id": ("doc00000005", "doc00000009")}, mode="mor")
    t.delete_where({"doc_id": ("doc00000035", "doc00000039")}, mode="mor")
    # COW delete of the whole first slice: its file (and the first
    # sidecar's pairs) die, but the sidecar survives for the second file
    t.delete_where({"doc_id": (None, "doc00000029")})
    assert t.posdel_file_count() >= 1
    m = t.compact_posdels()
    if m is not None:  # merged: only still-live pairs must remain
        [pd] = [f for f in t.manifest().files if f.get("kind") == "posdel"]
        assert pd["rows"] == 5
    assert {r["doc_id"] for r in t.read().collect()} == {
        f"doc{i:08d}" for i in range(30, 60) if not 35 <= i <= 39}
