"""Broadcast vs shuffle COW merge plans (plans/merge.py): identical final
state across the upsert / rules / delete / composite-key / null-key matrix,
and replay equivalence. The broadcast plan never shuffles the target (the
steady-state small-batch regime); threshold 0 forces the full-outer
shuffle join."""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.replay import ReplayDriver
from embulk_output_databricks_spark.synth import synth_binlog
from embulk_output_databricks_spark.operators.lww import lww_dedup
from tests.test_replay import python_oracle, table_state


def _staged(spark, n, start=0, delete_frac=0.0):
    ev = synth_binlog(spark, n, max(10, n // 5), n, start=start,
                      delete_frac=delete_frac)
    return lww_dedup(ev).select("doc_id", "tokens", "n_tok", "source", "op")


@pytest.mark.parametrize("rules", [None, {"n_tok": "T.n_tok + S.n_tok"}])
def test_broadcast_and_shuffle_plans_agree(spark, warehouse, rules):
    results = []
    for i, thresh in enumerate((10**9, 0)):  # broadcast, then forced shuffle
        cat = LakeCatalog(spark, f"{warehouse}/p{i}")
        tbl = cat.create_table("t", SEQUENCES_SCHEMA, n_buckets=4,
                               bucket_key="doc_id")
        tbl.append(_staged(spark, 120).drop("op"))
        merge_apply(tbl, _staged(spark, 150, start=60, delete_frac=0.2),
                    keys=["doc_id"], merge_rules=rules,
                    broadcast_threshold_rows=thresh)
        results.append(table_state(tbl))
    assert results[0] == results[1]
    assert len(results[0]) > 0


def test_replay_identical_under_both_plans(spark, warehouse):
    binlog = synth_binlog(spark, 1200, 80, 400, hot_frac=0.1,
                          delete_frac=0.1).cache()
    states = []
    for i, thresh in enumerate((10**9, 0)):
        drv = ReplayDriver(
            LakeCatalog(spark, f"{warehouse}/r{i}"),
            JobConfig(mode="merge", n_buckets=4,
                      broadcast_merge_threshold=thresh))
        drv.replay(binlog)
        states.append(table_state(drv.table))
    assert states[0] == states[1] == python_oracle(
        [r.asDict() for r in binlog.collect()])
    binlog.unpersist()


def test_null_op_rows_insert_under_both_plans(spark, warehouse):
    """A staged row whose op is NULL (e.g. a permissively-parsed event) must
    INSERT when unmatched under BOTH plans — the broadcast insert filter
    once dropped it (~NULL is NULL, filter discards)."""
    states = []
    base_keys = {r["doc_id"] for r in _staged(spark, 50).collect()}
    batch = _staged(spark, 80, start=20).withColumn(
        "op", F.when(F.col("n_tok") % 2 == 0, None).otherwise(F.col("op")))
    null_unmatched = {r["doc_id"] for r in batch.collect()
                      if r["op"] is None and r["doc_id"] not in base_keys}
    assert null_unmatched  # the scenario under test actually occurs
    for i, thresh in enumerate((10**9, 0)):
        cat = LakeCatalog(spark, f"{warehouse}/no{i}")
        tbl = cat.create_table("t", SEQUENCES_SCHEMA, n_buckets=4,
                               bucket_key="doc_id")
        tbl.append(_staged(spark, 50).drop("op"))
        merge_apply(tbl, batch, keys=["doc_id"], broadcast_threshold_rows=thresh)
        states.append(table_state(tbl))
    assert states[0] == states[1]
    # the NULL-op unmatched rows were INSERTED, not dropped
    assert null_unmatched <= set(states[0])


def test_broadcast_plan_composite_keys_with_nulls(spark, warehouse):
    """eqNullSafe parity: NULL key components match each other under both
    plans (composite key with a nullable component)."""
    states = []
    for i, thresh in enumerate((10**9, 0)):
        cat = LakeCatalog(spark, f"{warehouse}/n{i}")
        tbl = cat.create_table("t", SEQUENCES_SCHEMA, n_buckets=4,
                               bucket_key="doc_id")
        base = _staged(spark, 100).drop("op").withColumn(
            "source", F.when(F.col("n_tok") % 3 == 0, None)
            .otherwise(F.col("source")))
        tbl.append(base)
        batch = _staged(spark, 100, start=40).withColumn(
            "source", F.when(F.col("n_tok") % 3 == 0, None)
            .otherwise(F.col("source")))
        merge_apply(tbl, batch, keys=["doc_id", "source"],
                    broadcast_threshold_rows=thresh)
        states.append({(r["doc_id"], r["source"]): (list(r["tokens"]), r["n_tok"])
                       for r in tbl.read().collect()})
    assert states[0] == states[1] and len(states[0]) > 0