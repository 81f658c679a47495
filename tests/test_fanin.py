"""Multi-source fan-in: N sharded binlog streams (disjoint key ranges —
the standard sharded-CDC layout) applied into ONE table, each source with
its own batch-id sequence, fence namespace, and crash reconciliation
(ReplayDriver(source_id=...) / CheckpointStore(source_id=...)).

Complements streaming/multi.py (one stream -> N tables). Invariants:
overlapping batch ids across sources never cross-fence; a torn commit
(snapshot landed, checkpoint missing) is recovered for ITS source even
when other sources advanced the head afterwards; a retracted fence is a
durable tombstone that survives reconciliation walks.
"""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.streaming.checkpoint import CheckpointStore
from embulk_output_databricks_spark.streaming.replay import InjectedCrash, ReplayDriver
from embulk_output_databricks_spark.synth import synth_binlog

from test_replay import python_oracle, table_state


@pytest.fixture()
def cat(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def _shards(binlog, n=2):
    """Split by doc hash into disjoint key ranges (each source owns one)."""
    return [binlog.filter(F.abs(F.hash("doc_id")) % n == i) for i in range(n)]


def test_two_sources_interleaved_disjoint_keys(spark, cat):
    binlog = synth_binlog(spark, 1600, 120, 400, delete_frac=0.1).cache()
    s0, s1 = _shards(binlog)
    cfg = JobConfig(mode="merge", n_buckets=8)
    d0 = ReplayDriver(cat, cfg, source_id="s0")
    d1 = ReplayDriver(cat, cfg, table=d0.table, source_id="s1")
    # interleave batches; batch ids OVERLAP across sources on purpose
    for b in range(4):
        d0.run_batch(s0.filter(F.col("batch_id") == b), b)
        d1.run_batch(s1.filter(F.col("batch_id") == b), b)
    oracle = python_oracle([r.asDict() for r in binlog.collect()])
    assert table_state(d0.table) == oracle
    # fences are per-source: replaying s0's batches is a no-op...
    for b in range(4):
        assert d0.run_batch(s0.filter(F.col("batch_id") == b), b) is None
    # ...and never blocked s1's same-numbered batches (they applied above)
    assert sorted(d0.ckpt.committed_batch_ids()) == [0, 1, 2, 3]
    assert sorted(d1.ckpt.committed_batch_ids()) == [0, 1, 2, 3]
    assert table_state(d0.table) == oracle
    binlog.unpersist()


def test_torn_commit_recovers_per_source_past_other_sources(spark, cat):
    binlog = synth_binlog(spark, 800, 60, 200, delete_frac=0.1).cache()
    s0, s1 = _shards(binlog)
    cfg = JobConfig(mode="merge", n_buckets=4)
    d0 = ReplayDriver(cat, cfg, source_id="s0")
    d1 = ReplayDriver(cat, cfg, table=d0.table, source_id="s1")
    d0.run_batch(s0.filter(F.col("batch_id") == 0), 0)
    # s1's batch 0 commits its snapshot but crashes before the checkpoint
    with pytest.raises(InjectedCrash):
        d1.run_batch(s1.filter(F.col("batch_id") == 0), 0,
                     crash_before_checkpoint=True)
    # s0 keeps going — the torn s1 snapshot is no longer the head
    d0.run_batch(s0.filter(F.col("batch_id") == 1), 1)
    # a fresh s1 store walks the parent chain past s0's commits and
    # re-derives the torn batch record from ITS snapshot properties
    ck1 = CheckpointStore(d0.table, source_id="s1")
    assert ck1.is_committed(0)
    assert ck1.read(0)["recovered"] is True
    # rerun of the torn batch is now a fence hit, not a double apply
    d1b = ReplayDriver(cat, cfg, table=d0.table, source_id="s1")
    assert d1b.run_batch(s1.filter(F.col("batch_id") == 0), 0) is None
    d1b.run_batch(s1.filter(F.col("batch_id") == 1), 1)
    oracle = python_oracle(
        [r.asDict() for r in binlog.filter("batch_id <= 1").collect()])
    assert table_state(d0.table) == oracle
    binlog.unpersist()


def test_retract_tombstone_survives_reconciliation(spark, cat):
    binlog = synth_binlog(spark, 400, 40, 120, delete_frac=0.0).cache()
    (s0,) = _shards(binlog, 1)
    cfg = JobConfig(mode="merge", n_buckets=4)
    d = ReplayDriver(cat, cfg, source_id="s0")
    d.run_batch(s0.filter(F.col("batch_id") == 0), 0)
    v_good = d.table.current_version()
    d.run_batch(s0.filter(F.col("batch_id") == 1), 1)  # the "bad" batch
    d.table.rollback(v_good)
    assert d.ckpt.retract(1) is True
    # the bad snapshot is still retained history; a fresh store must NOT
    # resurrect its fence out of the parent chain (tombstone wins)
    ck = CheckpointStore(d.table, source_id="s0")
    assert not ck.is_committed(1)
    # re-applying the corrected batch under the same id works
    d2 = ReplayDriver(cat, cfg, table=d.table, source_id="s0")
    rec = d2.run_batch(s0.filter(F.col("batch_id") == 1), 1)
    assert rec is not None and d2.ckpt.is_committed(1)
    oracle = python_oracle(
        [r.asDict() for r in s0.filter("batch_id <= 1").collect()])
    assert table_state(d.table) == oracle
    binlog.unpersist()
