"""Predicate delete planned from manifest bounds (Iceberg metadata-delete
analog; the reference has no delete story — its truncate mode drops
everything, README.md:58-61). Invariants: result always equals the
full-scan anti-filter; files proven disjoint keep their exact paths
(zero IO); files proven fully-matching vanish without being read; NULL
rows never match (SQL range semantics), so a file containing NULLs in a
predicate column is never dropped wholesale; MOR deltas force winner
resolution before the predicate applies."""

from pyspark.sql import functions as F

from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.sources.laketable import _pred_classify
from tests.test_laketable import seq_rows


def _mk(spark, warehouse, name="d", **kw):
    cat = LakeCatalog(spark, warehouse)
    kw.setdefault("n_buckets", 2)
    kw.setdefault("bucket_key", "doc_id")
    return cat.create_table(name, SEQUENCES_SCHEMA, **kw)


def test_retention_delete_drops_and_rewrites_minimally(spark, warehouse):
    t = _mk(spark, warehouse)
    # three disjoint doc_id slices -> tight per-file bounds
    t.append(seq_rows(spark, range(0, 100)))
    t.append(seq_rows(spark, range(100, 200)))
    t.append(seq_rows(spark, range(200, 300)))
    before = {f["path"] for f in t.manifest().files}
    # delete doc00000000..doc00000149: slice 0 fully matches (drop, no IO),
    # slice 1 straddles (rewrite), slice 2 disjoint (untouched)
    m = t.delete_where({"doc_id": (None, "doc00000149")})
    after = {f["path"] for f in m.files}
    assert m.properties["delete_dropped_files"] >= 1
    # disjoint slice-2 files survived byte-identically (same paths)
    slice2 = {f["path"] for f in t.manifest(m.version).files
              if f["stats"]["doc_id"][0] >= "doc00000200"}
    assert slice2 and slice2 <= before
    got = {r["doc_id"] for r in t.read().collect()}
    assert got == {f"doc{i:08d}" for i in range(150, 300)}
    # a second identical delete is a no-op on the rows
    t.delete_where({"doc_id": (None, "doc00000149")})
    assert t.row_count() == 150
    assert after  # paths recorded


def test_classification_matrix(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 100)))
    f = t.manifest().files[0]
    m = t.manifest()
    assert _pred_classify(m, f, {"doc_id": ("doc00000500", None)}) == "none"
    assert _pred_classify(m, f, {"doc_id": (None, "doc00000049")}) == "some"
    assert _pred_classify(m, f, {"doc_id": (None, "doc00000099")}) == "all"
    # conjunction: any disjoint column makes the whole predicate 'none'
    assert _pred_classify(
        m, f, {"doc_id": (None, "doc00000099"), "n_tok": (10, 20)}) == "none"
    # missing bounds degrade 'all' to 'some', never to a wrong drop
    stripped = {k: v for k, v in f.items() if k != "stats"}
    assert _pred_classify(m, stripped, {"doc_id": (None, "zzz")}) == "some"


def test_null_rows_never_match_and_block_whole_file_drop(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    rows = [(f"doc{i:08d}", [i], 1, None if i % 2 else "web") for i in range(10)]
    t.append(spark.createDataFrame(rows, SEQUENCES_SCHEMA))
    for f in t.manifest().files:
        assert "source" not in f.get("nn", ())  # null-free proof withheld
    # source bounds are ["web","web"] and the predicate covers them, but
    # the NULL rows must survive: the file is rewritten, not dropped
    m = t.delete_where({"source": ("web", "web")})
    assert m.properties["delete_dropped_files"] == 0
    got = t.read().collect()
    assert {r["doc_id"] for r in got} == {f"doc{i:08d}" for i in range(10) if i % 2}
    assert all(r["source"] is None for r in got)


def test_delete_survives_rename_via_field_ids(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 100)))       # bounds stored as "doc_id"
    t.rename_column("doc_id", "document_id")
    m = t.delete_where({"document_id": (None, "doc00000049")})
    assert m.properties["delete_dropped_files"] == 0  # boundary file: rewrite
    got = {r["document_id"] for r in t.read().collect()}
    assert got == {f"doc{i:08d}" for i in range(50, 100)}


def test_delete_on_column_added_after_file_is_noop(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(10)))
    t.add_column("score", "double")
    before = {f["path"] for f in t.manifest().files}
    # old files are all-NULL in score: provably no row matches, zero IO
    m = t.delete_where({"score": (0.0, None)})
    assert {f["path"] for f in m.files} == before
    assert t.row_count() == 10


def test_update_where_skips_disjoint_files_and_sees_old_row(spark, warehouse):
    t = _mk(spark, warehouse)
    t.append(seq_rows(spark, range(0, 100)))        # slice 0
    t.append(seq_rows(spark, range(100, 200)))      # slice 1 (disjoint)
    before = {f["path"] for f in t.manifest().files}
    slice1 = {f["path"] for f in t.manifest().files
              if f["stats"]["doc_id"][0] >= "doc00000100"}
    # both SET expressions must see the PRE-update row: n_tok doubles and
    # source captures the OLD n_tok — sequential withColumn would leak the
    # doubled value into source
    m = t.update_where(
        {"doc_id": (None, "doc00000049")},
        {"n_tok": "n_tok * 2", "source": "concat('was_', cast(n_tok as string))"})
    assert m.properties["update_skipped_files"] >= 1
    assert slice1 <= {f["path"] for f in m.files}  # disjoint files untouched
    assert before - {f["path"] for f in m.files}   # some file rewritten
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["doc00000007"]["n_tok"] == 6 and rows["doc00000007"]["source"] == "was_3"
    assert rows["doc00000060"]["n_tok"] == 3  # boundary-file row out of range: untouched
    assert rows["doc00000150"]["source"] == "web"


def test_update_where_rejects_bucket_key_and_unknown_column(spark, warehouse):
    import pytest

    t = _mk(spark, warehouse)
    t.append(seq_rows(spark, range(10)))
    with pytest.raises(ValueError, match="bucket-key"):
        t.update_where({"n_tok": (1, 1)}, {"doc_id": "'x'"})
    with pytest.raises(ValueError, match="unknown"):
        t.update_where({"n_tok": (1, 1)}, {"nope": "1"})


def test_update_where_null_rows_never_match(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    rows = [(f"doc{i:08d}", [i], 1, None if i % 2 else "web") for i in range(10)]
    t.append(spark.createDataFrame(rows, SEQUENCES_SCHEMA))
    t.update_where({"source": ("web", "web")}, {"n_tok": "99"})
    got = {r["doc_id"]: r for r in t.read().collect()}
    for i in range(10):
        r = got[f"doc{i:08d}"]
        assert r["n_tok"] == (1 if i % 2 else 99)


def test_update_where_resolves_mor_deltas_first(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=2)
    t.append(seq_rows(spark, range(0, 20), src="old"))
    # delta flips doc..03 out of the matching range before the update runs
    delta = spark.createDataFrame(
        [("doc00000003", [3], 1, "new")], SEQUENCES_SCHEMA)
    t.append_delta(delta, merge_keys=["doc_id"])
    t.update_where({"source": ("old", "old")}, {"n_tok": "n_tok + 100"})
    got = {r["doc_id"]: r["n_tok"] for r in t.read().collect()}
    assert got["doc00000003"] == 1          # delta winner 'new': untouched
    assert got["doc00000005"] == 103        # old rows updated
    assert t.delta_file_count() == 0


def test_delete_resolves_mor_deltas_first(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=2)
    t.append(seq_rows(spark, range(0, 20), src="old"))
    # delta moves doc..03 OUT of the doomed range and doc..15 INTO it
    delta = spark.createDataFrame(
        [("doc00000003", [3], 1, "new"), ("doc00000015", [15], 1, "old")],
        SEQUENCES_SCHEMA)
    t.append_delta(delta, merge_keys=["doc_id"])
    t.delete_where({"source": ("old", "old")})
    got = {r["doc_id"]: r["source"] for r in t.read().collect()}
    assert got == {"doc00000003": "new"}  # sole survivor; no delta files left
    assert t.delta_file_count() == 0


def test_overwrite_where_atomic_slice_restatement(spark, warehouse):
    """Iceberg overwriteByRowFilter analog: delete-matching + insert in ONE
    snapshot. Disjoint files keep exact paths; the restated slice replaces
    the old one atomically (single version bump)."""
    t = _mk(spark, warehouse)
    t.append(seq_rows(spark, range(0, 100), src="old"))
    t.append(seq_rows(spark, range(100, 200), src="old"))
    v0 = t.current_version()
    before = {f["path"] for f in t.manifest().files}
    restated = seq_rows(spark, range(0, 80), src="restated")
    m = t.overwrite_where({"doc_id": (None, "doc00000099")}, restated)
    assert t.current_version() == v0 + 1          # one atomic commit
    assert m.properties["operation"] == "overwrite_where"
    assert m.properties["delete_dropped_files"] >= 1
    # the untouched slice's files kept their exact paths
    kept = {f["path"] for f in m.files} & before
    assert kept
    got = {r["doc_id"]: r["source"] for r in t.read().collect()}
    assert len(got) == 80 + 100
    assert got["doc00000010"] == "restated"
    assert "doc00000090" not in got               # deleted, not restated
    assert got["doc00000150"] == "old"
    # time travel to v0 still sees the pre-restatement slice
    assert t.read(version=v0).count() == 200


def test_overwrite_where_mor_keeps_boundary_paths(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 100), src="old"))  # one file, boundary
    before = {f["path"] for f in t.manifest().files}
    m = t.overwrite_where({"doc_id": ("doc00000020", "doc00000049")},
                          seq_rows(spark, range(20, 50), src="new"),
                          mode="mor")
    assert m.properties["delete_rewritten_files"] == 0
    assert m.properties["delete_posdel_files"] >= 1
    assert before <= {f["path"] for f in m.files}
    got = {r["doc_id"]: r["source"] for r in t.read().collect()}
    assert len(got) == 100 and t.row_count() == 100
    assert got["doc00000030"] == "new" and got["doc00000060"] == "old"
