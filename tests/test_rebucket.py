"""Bucket-spec evolution (LakeTable.rebucket): metadata-only commit,
per-spec exact pruning, MOR correctness across specs, lazy migration via
compaction. The at-scale rationale: a bucket count chosen at 1 TB
throttles merge parallelism at 100 TB, and the only affordable fix is a
metadata-only spec change + incremental rewrite (Iceberg partition-spec
evolution; no reference counterpart — the plugin delegates layout to
Databricks entirely)."""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.plans.merge import merge_apply, merge_apply_mor
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.sources.laketable import _file_nb, bucket_expr
from embulk_output_databricks_spark.streaming.replay import ReplayDriver
from embulk_output_databricks_spark.synth import synth_binlog
from tests.test_laketable import seq_rows
from tests.test_replay import python_oracle, table_state


def _doc_sources(t):
    return {r["doc_id"]: r["source"] for r in t.read().collect()}


def test_rebucket_is_metadata_only(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=4, bucket_key="doc_id")
    t.append(seq_rows(spark, range(100)))
    v_pre = t.current_version()
    paths = {f["path"] for f in t.manifest().files}
    before = {r["doc_id"] for r in t.read().collect()}
    m = t.rebucket(16)
    assert m.n_buckets == 16
    assert {f["path"] for f in m.files} == paths  # zero data files written
    assert all(f["nb"] == 4 for f in m.files)  # old spec stamped per file
    assert {r["doc_id"] for r in t.read().collect()} == before
    # time travel across the spec change: the old snapshot still reads
    assert t.row_count(version=v_pre) == 100


def test_rebucket_guards(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("u", SEQUENCES_SCHEMA, n_buckets=4)  # no bucket key
    with pytest.raises(ValueError, match="bucketed"):
        t.rebucket(8)
    b = cat.create_table("b", SEQUENCES_SCHEMA, n_buckets=4, bucket_key="doc_id")
    v0 = b.current_version()
    assert b.rebucket(4).version == v0  # same spec: no-op, no commit
    with pytest.raises(ValueError, match=">= 1"):
        b.rebucket(0)


def test_merge_after_rebucket_prunes_exactly_per_spec(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=16, bucket_key="doc_id")
    t.append(seq_rows(spark, range(200)))
    t.rebucket(64)
    old_paths = {f["path"] for f in t.manifest().files}
    staged = seq_rows(spark, range(5), src="upd").withColumn("op", F.lit("U"))
    merge_apply(t, staged, keys=["doc_id"])
    m = t.manifest()
    rows = _doc_sources(t)
    assert len(rows) == 200
    assert all(rows[f"doc{i:08d}"] == "upd" for i in range(5))
    assert all(rows[f"doc{i:08d}"] == "web" for i in range(5, 200))
    # pruning stayed exact across specs: every surviving old-spec file's
    # bucket (under ITS OWN spec) misses the staged keys' old-spec buckets
    touched16 = {
        r["b"] for r in staged.select(
            bucket_expr("doc_id", 16).alias("b")).distinct().collect()
    }
    kept_old = [f for f in m.files if f["path"] in old_paths]
    assert kept_old, "unaffected old-spec files must survive the merge"
    assert all(f["nb"] == 16 and f["bucket"] not in touched16 for f in kept_old)
    # rewritten output was produced under the CURRENT spec
    assert all(_file_nb(m, f) == 64 for f in m.files if f["path"] not in old_paths)


def test_mor_across_rebucket_resolves_and_compacts(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=4, bucket_key="doc_id")
    t.append(seq_rows(spark, range(50)))
    merge_apply_mor(t, seq_rows(spark, range(10), src="d1"), keys=["doc_id"])
    t.rebucket(16)
    merge_apply_mor(t, seq_rows(spark, range(5, 15), src="d2"), keys=["doc_id"])
    rows = _doc_sources(t)  # read resolves deltas from BOTH specs
    assert len(rows) == 50
    assert all(rows[f"doc{i:08d}"] == "d1" for i in range(5))
    assert all(rows[f"doc{i:08d}"] == "d2" for i in range(5, 15))
    assert all(rows[f"doc{i:08d}"] == "web" for i in range(15, 50))
    t.compact_deltas()
    m = t.manifest()
    assert not any(f.get("kind") == "delta" for f in m.files)
    # compaction migrated every rewritten file to the current spec
    assert all(_file_nb(m, f) == 16 for f in m.files)
    assert _doc_sources(t) == rows


def test_compact_migrates_old_spec_files(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=4, bucket_key="doc_id")
    t.append(seq_rows(spark, range(120)))
    before = _doc_sources(t)
    t.rebucket(8)
    # min_files threshold alone selects nothing, but old-spec files are
    # unconditional victims: compaction IS the incremental spec migration
    m = t.compact(min_files_per_bucket=999)
    assert m is not None
    assert all(_file_nb(m, f) == 8 for f in m.files)
    assert {f["bucket"] for f in m.files} <= set(range(8))
    assert _doc_sources(t) == before
    # converged table: nothing left to migrate or bin-pack
    assert t.compact(min_files_per_bucket=999) is None


def test_auto_rebucket_grows_layout_during_replay(spark, warehouse):
    # target_rows_per_bucket: the driver grows the layout (metadata-only)
    # once the table outgrows it — creation-time n_buckets never freezes
    # the merge parallelism of a growing table
    drv = ReplayDriver(
        LakeCatalog(spark, f"{warehouse}/ar"),
        JobConfig(mode="merge", n_buckets=2, target_rows_per_bucket=50))
    binlog = synth_binlog(spark, 900, 300, 300, delete_frac=0.05).cache()
    recs = drv.replay(binlog)
    assert drv.table.manifest().n_buckets == 8  # 2 -> 8 (next 4x fit)
    assert any("rebucketed_to" in (r.get("metrics") or {}) for r in recs)
    assert table_state(drv.table) == python_oracle(
        [r.asDict() for r in binlog.collect()])
    binlog.unpersist()


def test_replay_rebucket_mid_stream_matches_oracle(spark, warehouse):
    binlog = synth_binlog(spark, 1200, 80, 400, delete_frac=0.1).cache()
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/rb"),
                       JobConfig(mode="merge", n_buckets=4))
    drv.run_batch(binlog.filter(F.col("batch_id") == 0), 0)
    drv.table.rebucket(32)  # grow the layout between batches
    drv.run_batch(binlog.filter(F.col("batch_id") == 1), 1)
    drv.run_batch(binlog.filter(F.col("batch_id") == 2), 2)
    assert table_state(drv.table) == python_oracle(
        [r.asDict() for r in binlog.collect()])
    binlog.unpersist()
