"""Multi-table replay: routing, per-table fences, crash mid-fan-out, mixed
apply modes, per-table evolution (streaming/multi.py)."""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import ConfigError, JobConfig
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.multi import MultiTableReplayDriver
from embulk_output_databricks_spark.streaming.replay import EvolutionOp, InjectedCrash
from embulk_output_databricks_spark.synth import synth_binlog
from tests.test_replay import python_oracle, table_state


def tagged_binlog(spark, n=1200, docs=80, per_batch=400):
    """Deterministic two-table stream: route by doc hash parity."""
    b = synth_binlog(spark, n, docs, per_batch, delete_frac=0.1)
    return b.withColumn(
        "table",
        F.when(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0, F.lit("seq_a"))
        .otherwise(F.lit("seq_b")),
    )


def oracles(binlog):
    rows = [r.asDict() for r in binlog.collect()]
    return {
        t: python_oracle([r for r in rows if r["table"] == t])
        for t in ("seq_a", "seq_b")
    }


@pytest.fixture()
def cat(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def test_fan_out_matches_per_table_oracles(spark, cat):
    binlog = tagged_binlog(spark).cache()
    mt = MultiTableReplayDriver(
        cat,
        [JobConfig(table="seq_a", mode="merge", n_buckets=4),
         JobConfig(table="seq_b", mode="merge", n_buckets=4)],
    )
    recs = mt.replay(binlog)
    assert len(recs) == 3 and all(set(r) == {"seq_a", "seq_b"} for r in recs)
    want = oracles(binlog)
    for t, drv in mt.drivers.items():
        assert table_state(drv.table) == want[t]
        # lsn contiguity is a whole-stream invariant; a per-table slice has
        # gaps by construction — per-table the invariant is batch completeness
        assert drv.ckpt.committed_batch_ids() == [0, 1, 2]
    # full rerun: every (table, batch) fenced, no new snapshots anywhere
    vs = {t: d.table.current_version() for t, d in mt.drivers.items()}
    assert mt.replay(binlog) == []
    assert {t: d.table.current_version() for t, d in mt.drivers.items()} == vs
    binlog.unpersist()


def test_crash_mid_fan_out_resumes_remaining_tables(spark, cat):
    binlog = tagged_binlog(spark).cache()
    cfgs = [JobConfig(table="seq_a", mode="merge", n_buckets=4),
            JobConfig(table="seq_b", mode="merge", n_buckets=4)]
    mt = MultiTableReplayDriver(cat, cfgs)
    b0 = binlog.filter("batch_id = 0")
    # crash after seq_a committed batch 0, before seq_b saw it
    with pytest.raises(InjectedCrash):
        mt.run_batch(b0, 0, crash_after_table="seq_a")
    # fresh driver (process restart): seq_a fenced, seq_b applied
    mt2 = MultiTableReplayDriver(cat, cfgs)
    recs = mt2.run_batch(b0, 0)
    assert recs["seq_a"] is None and recs["seq_b"] is not None
    mt2.replay(binlog)  # remaining batches
    want = oracles(binlog)
    for t, drv in mt2.drivers.items():
        assert table_state(drv.table) == want[t]
    binlog.unpersist()


def test_mixed_modes_and_per_table_evolution(spark, cat):
    binlog = tagged_binlog(spark, n=800, per_batch=400).cache()
    mt = MultiTableReplayDriver(
        cat,
        [JobConfig(table="seq_a", mode="merge", n_buckets=4),
         JobConfig(table="seq_b", mode="insert", n_buckets=4)],
    )
    plan = {1: {"seq_a": [EvolutionOp("add", name="lang", type="string")]}}
    mt.replay(binlog, evolution_plan=plan)
    a, b = mt.drivers["seq_a"].table, mt.drivers["seq_b"].table
    assert "lang" in a.read().columns and "lang" not in b.read().columns
    # insert mode appends every event (bag semantics, no dedup)
    assert b.read().count() == binlog.filter("table = 'seq_b'").count()
    binlog.unpersist()


def test_parallel_fan_out_matches_sequential(spark, cat, warehouse):
    """parallel=True applies per-table from concurrent driver threads;
    state and fences must match the sequential result."""
    binlog = tagged_binlog(spark).cache()
    want = oracles(binlog)
    mt = MultiTableReplayDriver(
        LakeCatalog(spark, f"{warehouse}/par"),
        [JobConfig(table="seq_a", mode="merge", n_buckets=4),
         JobConfig(table="seq_b", mode="merge", n_buckets=4)],
    )
    for b in (0, 1, 2):
        recs = mt.run_batch(binlog.filter(F.col("batch_id") == b), b,
                            parallel=True, collect_metrics="light")
        assert set(recs) == {"seq_a", "seq_b"}
        assert all(r is not None for r in recs.values())
    for t, drv in mt.drivers.items():
        assert table_state(drv.table) == want[t]
        assert drv.ckpt.committed_batch_ids() == [0, 1, 2]
    binlog.unpersist()


def test_mixed_cow_and_mor_targets(spark, cat):
    """Per-table strategies compose: one copy-on-write target, one
    merge-on-read target, same stream, same per-slice oracles."""
    binlog = tagged_binlog(spark).cache()
    mt = MultiTableReplayDriver(
        cat,
        [JobConfig(table="seq_a", mode="merge", n_buckets=4),
         JobConfig(table="seq_b", mode="merge", n_buckets=4,
                   merge_strategy="mor", mor_compact_every=2)],
    )
    mt.replay(binlog)
    want = oracles(binlog)
    assert table_state(mt.drivers["seq_a"].table) == want["seq_a"]
    assert table_state(mt.drivers["seq_b"].table) == want["seq_b"]
    assert mt.drivers["seq_a"].table.delta_file_count() == 0  # cow: no deltas
    binlog.unpersist()


def test_kafka_frames_fan_out_to_tables(spark, cat):
    """Debezium-shaped end-to-end: a Kafka topic whose JSON payloads carry a
    `table` discriminator, parsed JVM-side and fanned out to per-table
    merge targets."""
    from embulk_output_databricks_spark.sources.kafka_tail import (
        encode_kafka_frame, parse_change_events)

    binlog = tagged_binlog(spark, n=600, per_batch=300).cache()
    parsed = parse_change_events(encode_kafka_frame(binlog), binlog.schema)
    mt = MultiTableReplayDriver(
        cat,
        [JobConfig(table="seq_a", mode="merge", n_buckets=4),
         JobConfig(table="seq_b", mode="merge", n_buckets=4)],
    )
    mt.replay(parsed)
    want = oracles(binlog)
    for t, drv in mt.drivers.items():
        assert table_state(drv.table) == want[t]
    binlog.unpersist()


def test_unknown_table_events_fail_loud(spark, cat, warehouse):
    """Events for an unconfigured table must fail the batch by default and
    be droppable only by explicit opt-out."""
    binlog = tagged_binlog(spark, n=200, per_batch=200).withColumn(
        "table",
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(10)) == 0, F.lit("seq_c"))
        .otherwise(F.col("table")),
    ).cache()
    cfgs = [JobConfig(table="seq_a", mode="merge", n_buckets=4),
            JobConfig(table="seq_b", mode="merge", n_buckets=4)]
    mt = MultiTableReplayDriver(LakeCatalog(spark, f"{warehouse}/uk1"), cfgs)
    with pytest.raises(ValueError, match="seq_c"):
        mt.run_batch(binlog, 0)
    loose = MultiTableReplayDriver(LakeCatalog(spark, f"{warehouse}/uk2"),
                                   cfgs, unknown_tables="ignore")
    recs = loose.run_batch(binlog, 0)
    assert all(r is not None for r in recs.values())
    binlog.unpersist()


def test_duplicate_targets_rejected(spark, cat):
    with pytest.raises(ConfigError, match="duplicate"):
        MultiTableReplayDriver(
            cat, [JobConfig(table="t"), JobConfig(table="t")]
        )


# ---------------- transactional fan-out (sources/txn.py integration) ----


def test_txn_fan_out_atomic_and_fenced(spark, cat):
    binlog = tagged_binlog(spark).cache()
    mt = MultiTableReplayDriver(
        cat,
        [JobConfig(table="seq_a", mode="merge", n_buckets=4),
         JobConfig(table="seq_b", mode="merge", n_buckets=4)],
    )
    for b in (0, 1, 2):
        recs = mt.run_batch_txn(binlog.filter(F.col("batch_id") == b), b)
        assert set(recs) == {"seq_a", "seq_b"}
        assert all(r is not None for r in recs.values())
    want = oracles(binlog)
    for t, drv in mt.drivers.items():
        assert table_state(drv.table) == want[t]
        assert drv.ckpt.committed_batch_ids() == [0, 1, 2]
        assert drv.table.list_branches() == []  # txn branches cleaned
    # rerun: fully fenced, rollback path (nothing staged), no new versions
    vs = {t: d.table.current_version() for t, d in mt.drivers.items()}
    recs = mt.run_batch_txn(binlog.filter(F.col("batch_id") == 1), 1)
    assert all(r is None for r in recs.values())
    assert {t: d.table.current_version() for t, d in mt.drivers.items()} == vs
    binlog.unpersist()


def test_txn_crash_before_publish_leaves_nothing(spark, cat):
    binlog = tagged_binlog(spark).cache()
    mt = MultiTableReplayDriver(
        cat,
        [JobConfig(table="seq_a", mode="merge", n_buckets=4),
         JobConfig(table="seq_b", mode="merge", n_buckets=4)],
    )
    mt.run_batch_txn(binlog.filter(F.col("batch_id") == 0), 0)
    vs = {t: d.table.current_version() for t, d in mt.drivers.items()}
    with pytest.raises(InjectedCrash):
        mt.run_batch_txn(binlog.filter(F.col("batch_id") == 1), 1,
                         crash_before_publish=True)
    # nothing visible on main, batch unfenced on every table
    for t, drv in mt.drivers.items():
        assert drv.table.current_version() == vs[t]
        assert drv.ckpt.committed_batch_ids() == [0]
    cat.recover_transactions(reap_abandoned_after_s=0)
    assert all(d.table.list_branches() == [] for d in mt.drivers.values())
    # rerun completes the batch everywhere
    recs = mt.run_batch_txn(binlog.filter(F.col("batch_id") == 1), 1)
    assert all(r is not None for r in recs.values())
    mt.run_batch_txn(binlog.filter(F.col("batch_id") == 2), 2)
    want = oracles(binlog)
    for t, drv in mt.drivers.items():
        assert table_state(drv.table) == want[t]
    binlog.unpersist()


def test_txn_crash_before_checkpoints_reconciles(spark, cat, warehouse):
    binlog = tagged_binlog(spark).cache()
    cfgs = [JobConfig(table="seq_a", mode="merge", n_buckets=4),
            JobConfig(table="seq_b", mode="merge", n_buckets=4)]
    mt = MultiTableReplayDriver(cat, cfgs)
    mt.run_batch_txn(binlog.filter(F.col("batch_id") == 0), 0)
    with pytest.raises(InjectedCrash):
        mt.run_batch_txn(binlog.filter(F.col("batch_id") == 1), 1,
                         crash_before_checkpoints=True)
    # data IS published (the txn committed) but the fences are torn
    # "restart": fresh drivers -> CheckpointStore reconciliation trusts the
    # snapshots' batch stamps and repairs both fences
    mt2 = MultiTableReplayDriver(cat, cfgs)
    for t, drv in mt2.drivers.items():
        assert drv.ckpt.committed_batch_ids() == [0, 1]
    recs = mt2.run_batch_txn(binlog.filter(F.col("batch_id") == 1), 1)
    assert all(r is None for r in recs.values())  # fenced, no double-apply
    mt2.run_batch_txn(binlog.filter(F.col("batch_id") == 2), 2)
    want = oracles(binlog)
    for t, drv in mt2.drivers.items():
        assert table_state(drv.table) == want[t]
    binlog.unpersist()


def test_txn_refuses_side_table_maintenance(spark, cat):
    mt = MultiTableReplayDriver(
        cat,
        [JobConfig(table="seq_a", mode="merge", n_buckets=4,
                   rollups=[{"name": "r", "group_by": ["source"],
                             "sums": ["n_tok"]}]),
         JobConfig(table="seq_b", mode="merge", n_buckets=4)],
    )
    with pytest.raises(ConfigError, match="transactional fan-out"):
        mt.run_batch_txn(tagged_binlog(spark, n=40, docs=10, per_batch=40), 0)
