"""Cross-batch stale-writer guard (plans/merge.py guard_col): the
`WHEN MATCHED AND S.seq > T.seq` pattern. The batch fence makes EXACT
replays no-ops; the guard covers the remaining redelivery mode — a
failover re-read under a FRESH batch_id whose range partially overlaps
already-committed later batches. A matched row updates/deletes only when
the staged guard strictly beats the target's; stale rows keep committed
payload, _row_id and _last_seq. Both physical plans (broadcast + forced
shuffle) are pinned to the same matrix."""

import pytest
from pyspark.sql import functions as F, types as T

from embulk_output_databricks_spark.config import ConfigError, JobConfig
from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.sources.laketable import LakeCatalog

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("seq", T.LongType()),
    T.StructField("v", T.StringType()),
])

BOTH_PLANS = (10**9, 0)  # broadcast threshold, then forced shuffle


def _df(spark, rows, with_op=False):
    fields = list(SCHEMA.fields)
    if with_op:
        fields = fields + [T.StructField("op", T.StringType())]
    return spark.createDataFrame(rows, T.StructType(fields))


def _state(tbl):
    return {r["k"]: (r["seq"], r["v"]) for r in tbl.read().collect()}


def _mk(spark, warehouse, tag, rows):
    cat = LakeCatalog(spark, f"{warehouse}/{tag}")
    tbl = cat.create_table("t", SCHEMA, n_buckets=4, bucket_key="k")
    if rows:
        tbl.append(_df(spark, rows))
    return tbl


@pytest.mark.parametrize("thresh", BOTH_PLANS)
def test_guard_matrix(spark, warehouse, thresh):
    """stale blocked / equal blocked / newer wins / insert unguarded /
    NULL staged never wins / NULL target loses to non-NULL staged."""
    tbl = _mk(spark, warehouse, f"m{thresh}", [
        ("stale", 10, "committed"),
        ("equal", 10, "committed"),
        ("newer", 10, "committed"),
        ("snull", 10, "committed"),
        ("tnull", None, "committed"),
    ])
    staged = _df(spark, [
        ("stale", 9, "redelivered"),
        ("equal", 10, "redelivered"),
        ("newer", 11, "applied"),
        ("snull", None, "redelivered"),
        ("tnull", 5, "applied"),
        ("insert", 1, "applied"),
    ])
    merge_apply(tbl, staged, keys=["k"], guard_col="seq",
                broadcast_threshold_rows=thresh)
    assert _state(tbl) == {
        "stale": (10, "committed"),
        "equal": (10, "committed"),
        "newer": (11, "applied"),
        "snull": (10, "committed"),
        "tnull": (5, "applied"),
        "insert": (1, "applied"),
    }


@pytest.mark.parametrize("thresh", BOTH_PLANS)
def test_guard_gates_deletes(spark, warehouse, thresh):
    """A stale 'D' must NOT drop a newer committed row; a winning 'D'
    still deletes; an unmatched 'D' stays a no-op."""
    tbl = _mk(spark, warehouse, f"d{thresh}", [
        ("keep", 10, "committed"),
        ("drop", 10, "committed"),
    ])
    staged = _df(spark, [
        ("keep", 9, None, "D"),
        ("drop", 11, None, "D"),
        ("ghost", 99, None, "D"),
    ], with_op=True)
    merge_apply(tbl, staged, keys=["k"], guard_col="seq",
                broadcast_threshold_rows=thresh)
    assert _state(tbl) == {"keep": (10, "committed")}


@pytest.mark.parametrize("thresh", BOTH_PLANS)
def test_guard_preserves_lineage_of_stale_matches(spark, warehouse, thresh):
    """A matched-but-stale row is a KEPT row: same _row_id, same _last_seq
    (an unguarded merge would have rewritten both)."""
    tbl = _mk(spark, warehouse, f"l{thresh}", [("a", 10, "x"), ("b", 10, "x")])
    before = {r["k"]: (r["_row_id"], r["_last_seq"])
              for r in tbl.read(with_row_ids=True).collect()}
    staged = _df(spark, [("a", 9, "stale"), ("b", 11, "new")])
    merge_apply(tbl, staged, keys=["k"], guard_col="seq",
                broadcast_threshold_rows=thresh)
    after = {r["k"]: (r["_row_id"], r["_last_seq"])
             for r in tbl.read(with_row_ids=True).collect()}
    assert after["a"] == before["a"]          # untouched identity + recency
    assert after["b"][0] == before["b"][0]    # update keeps row identity...
    assert after["b"][1] > before["b"][1]     # ...but takes the new commit


def test_guard_makes_overlapping_redelivery_idempotent(spark, warehouse):
    """The motivating scenario end-to-end: batch2 commits seq 20; a
    failover re-read redelivers batch1's range (seq 10) under a fresh
    batch id. Guarded apply leaves the final state identical to the
    in-order replay."""
    tbl = _mk(spark, warehouse, "redeliver", [])
    b1 = _df(spark, [("u1", 10, "b1"), ("u2", 10, "b1")])
    b2 = _df(spark, [("u1", 20, "b2")])
    for b in (b1, b2, b1):  # in-order, then the overlapping redelivery
        merge_apply(tbl, b, keys=["k"], guard_col="seq")
    assert _state(tbl) == {"u1": (20, "b2"), "u2": (10, "b1")}


def test_guard_col_must_exist(spark, warehouse):
    tbl = _mk(spark, warehouse, "nocol", [("a", 1, "x")])
    with pytest.raises(ValueError, match="guard_col"):
        merge_apply(tbl, _df(spark, [("a", 2, "y")]), keys=["k"],
                    guard_col="nope")


def test_guard_config_rejects_mor():
    with pytest.raises(ConfigError, match="merge_guard_col"):
        JobConfig(merge_strategy="mor", merge_guard_col="seq")


def test_replay_driver_guarded_overlapping_redelivery(spark, warehouse):
    """End-to-end through the ReplayDriver: after batches 0-2 commit, a
    failover re-read redelivers the batch-0/1 LSN range under a FRESH
    batch_id. The fence passes (new id), the in-batch LWW winners are
    valid, but they are older than committed state — with
    JobConfig.merge_guard_col the apply leaves the table bit-identical."""
    from pyspark.sql import types as T

    from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog
    from embulk_output_databricks_spark.streaming.replay import ReplayDriver
    from embulk_output_databricks_spark.synth import synth_binlog

    guard_schema = T.StructType(
        list(SEQUENCES_SCHEMA.fields)
        + [T.StructField("seq_lsn", T.LongType())])
    binlog = synth_binlog(spark, 600, 40, 200).cache()  # 3 batches
    drv = ReplayDriver(
        LakeCatalog(spark, warehouse),
        JobConfig(mode="merge", merge_keys=["doc_id"], n_buckets=4,
                  merge_guard_col="seq_lsn"),
        target_schema=guard_schema)
    drv.replay(binlog)
    before = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["seq_lsn"])
              for r in drv.table.read().collect()}
    # overlapping redelivery: lsns 0..299 (spans batches 0 and 1) under a
    # fresh batch id — the fence cannot catch it, the guard must
    redelivered = (binlog.filter(F.col("seq_lsn") < 300)
                   .withColumn("batch_id", F.lit(100)))
    assert drv.run_batch(redelivered, 100) is not None  # fence passes
    after = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["seq_lsn"])
             for r in drv.table.read().collect()}
    binlog.unpersist()
    assert after == before
