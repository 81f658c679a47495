"""Checkpoint folding (streaming/checkpoint.py fold): old per-batch fence
files collapse into one span file — recovery/reporting/contiguity audits
stay O(1) over a 10^5-batch tail — without weakening any fence guarantee:
the fence answer, the contiguity proof, retract tombstones, and crash
reconciliation are identical before and after a fold."""

import os

from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.checkpoint import CheckpointStore
from embulk_output_databricks_spark.streaming.replay import ReplayDriver
from embulk_output_databricks_spark.synth import synth_binlog


def _mk(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    tbl = cat.create_table("t", SEQUENCES_SCHEMA, n_buckets=2,
                           bucket_key="doc_id")
    return CheckpointStore(tbl), tbl


def _commit_n(ck, n, start=0, lsn0=0, per=10):
    for i in range(start, start + n):
        ck.commit(i, lsn0 + (i - start) * per, lsn0 + (i - start + 1) * per,
                  snapshot_version=i + 1, lineage=[])


def _batch_files(ck):
    return [fn for fn in os.listdir(ck.dir) if fn.startswith("batch-")]


def test_fold_preserves_fence_and_contiguity(spark, warehouse):
    ck, _ = _mk(spark, warehouse)
    _commit_n(ck, 20)
    before = ck.committed_batch_ids()
    out = ck.fold(keep_last=4)
    assert out["folded"] == 16 and out["spans"] == 1
    assert len(_batch_files(ck)) == 4          # only the newest 4 remain
    assert ck.committed_batch_ids() == before  # reporting identical
    assert all(ck.is_committed(b) for b in range(20))
    assert not ck.is_committed(20)
    ck.validate_contiguous()                   # chained LSNs survive folding
    # folding twice is a no-op for already-folded ids
    out2 = ck.fold(keep_last=4)
    assert out2["folded"] == 0 and out2["spans"] == 1


def test_retract_overrides_fold_and_folds_away(spark, warehouse):
    ck, _ = _mk(spark, warehouse)
    _commit_n(ck, 10)
    ck.fold(keep_last=0)
    assert ck.is_committed(3)
    # tombstone written AFTER the fold wins over the fold's span
    assert ck.retract(3) is True
    assert not ck.is_committed(3)
    assert 3 not in ck.committed_batch_ids()
    # the tombstone itself folds away without resurrecting the batch
    ck.fold(keep_last=0)
    assert not ck.is_committed(3)
    assert 3 not in ck.committed_batch_ids()
    assert _batch_files(ck) == []


def test_crash_recovery_consults_fold(spark, warehouse):
    """A head snapshot whose batch_id was FOLDED must not be re-recovered
    as a duplicate checkpoint record on restart."""
    ck, tbl = _mk(spark, warehouse)
    df = spark.range(5).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.array(F.lit(1)).alias("tokens"), F.lit(1).alias("n_tok"),
        F.lit("s").alias("source"))
    tbl.append(df, properties={"batch_id": 0, "lsn_from": 0, "lsn_to": 10})
    ck.commit(0, 0, 10, snapshot_version=tbl.current_version(), lineage=[])
    ck.fold(keep_last=0)
    assert _batch_files(ck) == []
    ck2 = CheckpointStore(tbl)  # fresh store runs _recover()
    assert _batch_files(ck2) == []          # nothing re-materialized
    assert ck2.is_committed(0)


def test_gap_still_detected_across_fold_boundary(spark, warehouse):
    ck, _ = _mk(spark, warehouse)
    _commit_n(ck, 5)                         # lsn 0..50 contiguous
    ck.fold(keep_last=0)
    ck.commit(5, 60, 70, snapshot_version=6, lineage=[])  # gap 50->60
    try:
        ck.validate_contiguous()
        raise RuntimeError("gap not detected")
    except AssertionError as e:
        assert "gap/overlap" in str(e)


def test_driver_auto_fold(spark, warehouse):
    binlog = synth_binlog(spark, 1200, 40, 100).cache()  # 12 batches
    drv = ReplayDriver(
        LakeCatalog(spark, warehouse),
        JobConfig(mode="merge", n_buckets=2, checkpoint_fold_every=2))
    drv.replay(binlog)
    binlog.unpersist()
    ck = drv.ckpt
    n_batches = len(ck.committed_batch_ids())
    assert n_batches >= 10  # enough to exceed fold()'s keep_last=8 window
    assert os.path.exists(ck._fold_path())
    assert len(_batch_files(ck)) < n_batches  # old files folded away
    ck.validate_contiguous()
    # a replayed already-committed batch still fences to a no-op
    assert all(ck.is_committed(b) for b in ck.committed_batch_ids())
