"""CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT analog; the
reference validates config shape only, never data —
DatabricksOutputPlugin.java:135-148). Enforcement rides the write job via
the Observation API: no extra pass, a violating batch rejected whole with
no snapshot commit, on every write path (append, COW merge result, MOR
delta) — plus conflict rules so a check change never races a write.
"""

import os

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.sources.laketable import (
    CommitConflict, ConstraintViolation, SchemaEvolutionError)
from tests.test_laketable import seq_rows


def _table(spark, warehouse, name="chk", **kw):
    cat = LakeCatalog(spark, warehouse)
    kw.setdefault("n_buckets", 2)
    kw.setdefault("bucket_key", "doc_id")
    return cat.create_table(name, SEQUENCES_SCHEMA, **kw)


def _no_staging_left(t):
    return not [d for d in os.listdir(os.path.join(t.root, "data"))
                if d.startswith(".tmp-")]


def test_violating_append_rejected_whole(spark, warehouse):
    t = _table(spark, warehouse)
    t.add_check("tok_positive", "n_tok > 0")
    assert t.checks() == {"tok_positive": "n_tok > 0"}
    t.append(seq_rows(spark, range(5)))
    v = t.current_version()

    bad = seq_rows(spark, range(5, 10)).withColumn(
        "n_tok", F.when(F.col("doc_id") == "doc00000007", -1)
                  .otherwise(F.col("n_tok")))
    with pytest.raises(ConstraintViolation, match="tok_positive.*1 row"):
        t.append(bad)
    # rejected WHOLE: no snapshot, no rows, no staging debris
    assert t.current_version() == v
    assert t.row_count() == 5
    assert _no_staging_left(t)

    t.append(seq_rows(spark, range(5, 10)))  # clean batch lands
    assert t.row_count() == 10


def test_null_passes_sql_check_semantics(spark, warehouse):
    t = _table(spark, warehouse, name="chknull")
    t.add_check("tok_positive", "n_tok > 0")
    rows = seq_rows(spark, range(3)).withColumn(
        "n_tok", F.when(F.col("doc_id") == "doc00000001", F.lit(None))
                  .otherwise(F.col("n_tok")))
    t.append(rows)  # NULL is unknown, not a violation
    assert t.row_count() == 3


def test_add_check_validates_existing_data(spark, warehouse):
    t = _table(spark, warehouse, name="chkexist")
    t.append(seq_rows(spark, range(3), src="bad"))
    with pytest.raises(ConstraintViolation, match="3 existing row"):
        t.add_check("good_source", "source <> 'bad'")
    assert t.checks() == {}
    with pytest.raises(Exception):  # unknown column fails analysis up front
        t.add_check("broken", "no_such_col > 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_check("a", "n_tok > 0") and t.add_check("a", "n_tok > 1")


def test_merge_rule_violation_rejected(spark, warehouse):
    t = _table(spark, warehouse, name="chkmerge")
    t.add_check("tok_positive", "n_tok > 0")
    t.append(seq_rows(spark, range(4)))
    staged = seq_rows(spark, [1, 2])
    with pytest.raises(ConstraintViolation, match="tok_positive"):
        merge_apply(t, staged, keys=["doc_id"],
                    merge_rules={"n_tok": "T.n_tok - 100"})
    assert t.row_count() == 4
    assert {r["n_tok"] for r in t.read().collect()} == {3}


def test_mor_delete_markers_skip_payload_checks(spark, warehouse):
    t = _table(spark, warehouse, name="chkmor",
               properties={"merge_keys": "doc_id"})
    t.add_check("good_source", "source <> 'bad'")
    t.append(seq_rows(spark, range(4), src="web"))
    # a delete marker's payload is not data: must pass the check
    dels = seq_rows(spark, [1], src="bad").withColumn("__op", F.lit("D"))
    t.append_delta(dels, merge_keys=["doc_id"])
    got = {r["doc_id"] for r in t.read().collect()}
    assert got == {"doc00000000", "doc00000002", "doc00000003"}
    # but an UPSERT delta row is data and must be checked
    ups = seq_rows(spark, [2], src="bad").withColumn("__op", F.lit("U"))
    with pytest.raises(ConstraintViolation, match="good_source"):
        t.append_delta(ups, merge_keys=["doc_id"])


def test_evolution_guards_and_drop_check(spark, warehouse):
    t = _table(spark, warehouse, name="chkevo")
    t.add_check("tok_positive", "n_tok > 0")
    with pytest.raises(SchemaEvolutionError, match="referenced by check"):
        t.drop_column("n_tok")
    with pytest.raises(SchemaEvolutionError, match="referenced by check"):
        t.rename_column("n_tok", "token_count")
    t.rename_column("source", "origin")  # unreferenced columns still evolve
    t.drop_check("tok_positive")
    with pytest.raises(ValueError, match="no such check"):
        t.drop_check("tok_positive")
    t.rename_column("n_tok", "token_count")
    t.append(seq_rows(spark, range(2)).withColumnsRenamed(
        {"n_tok": "token_count", "source": "origin"})
        .withColumn("token_count", F.lit(-5)))
    assert t.row_count() == 2


def test_check_change_conflicts_with_concurrent_write(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t1 = cat.create_table("cc", SEQUENCES_SCHEMA, n_buckets=2,
                          bucket_key="doc_id")
    t2 = cat.load("cc")
    t1.append(seq_rows(spark, range(3)))
    # (a) a write staged before the check landed must NOT rebase past it:
    # its files were validated against the old (empty) constraint set
    base = t1.manifest()
    staged = base.files + t1._write_data_files(
        seq_rows(spark, range(3, 6)).withColumn("n_tok", F.lit(-1)), base)
    t2.add_check("tok_positive", "n_tok > 0")
    with pytest.raises(CommitConflict, match="check-constraint"):
        t1._commit(base, staged, {"operation": "append"})
    # (b) a check staged before a rival write must not silently rebase
    base2 = t2.manifest()
    t1.append(seq_rows(spark, range(10, 13)))
    import json
    props = {"checks": json.dumps({"more": "n_tok < 100"}),
             "operation": "add_check"}
    with pytest.raises(CommitConflict):
        t2._commit(base2, base2.files, props,
                   next_field_id=base2.next_field_id)
