"""Apply-level dead letter (JobConfig.quarantine): envelope-invalid rows
(NULL merge key, op outside I/U/D) park under the table root with a
reason instead of silently applying; the final state equals a replay of
only the valid rows, counts ride the batch metrics, and a crashed batch
re-parks the identical set."""

import os

from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.replay import ReplayDriver
from embulk_output_databricks_spark.synth import synth_binlog
from tests.test_replay import python_oracle, table_state


def _corrupt(binlog):
    # every 7th event loses its key; every 11th gets a junk op
    return binlog.withColumn(
        "doc_id",
        F.when(F.col("seq_lsn") % 7 == 0, F.lit(None)).otherwise(F.col("doc_id")),
    ).withColumn(
        "op",
        F.when(F.col("seq_lsn") % 11 == 0, F.lit("Z")).otherwise(F.col("op")),
    )


def test_quarantine_matches_valid_only_replay(spark, warehouse):
    binlog = synth_binlog(spark, 600, 40, 200).cache()
    bad = _corrupt(binlog)
    drv = ReplayDriver(
        LakeCatalog(spark, warehouse),
        JobConfig(mode="merge", n_buckets=4, quarantine=True))
    recs = drv.replay(bad)
    valid = bad.filter(
        F.col("doc_id").isNotNull() & F.col("op").isin("I", "U", "D"))
    want = python_oracle([r.asDict() for r in valid.collect()])
    assert table_state(drv.table) == want
    n_bad = bad.count() - valid.count()
    assert sum(r["metrics"].get("quarantined", 0) for r in recs) == n_bad
    # parked rows are inspectable with their reason
    q = spark.read.parquet(os.path.join(drv.table.root, "quarantine", "*"))
    assert q.count() == n_bad
    reasons = {r["__reason"] for r in q.select("__reason").distinct().collect()}
    assert reasons == {"null_merge_key", "invalid_op"}
    binlog.unpersist()


def test_quarantine_off_applies_everything(spark, warehouse):
    """Default posture unchanged: with quarantine off, a NULL key is a
    legitimate LWW key and nothing is parked."""
    binlog = synth_binlog(spark, 200, 20, 200, delete_frac=0.0).cache()
    bad = binlog.withColumn(
        "doc_id",
        F.when(F.col("seq_lsn") % 7 == 0, F.lit(None)).otherwise(F.col("doc_id")))
    drv = ReplayDriver(
        LakeCatalog(spark, warehouse),
        JobConfig(mode="merge", n_buckets=4))
    drv.replay(bad)
    assert not os.path.exists(os.path.join(drv.table.root, "quarantine"))
    has_null = any(r["doc_id"] is None
                   for r in drv.table.read().select("doc_id").collect())
    # the corrupted stream carries live NULL-key upserts; they applied
    assert has_null
    binlog.unpersist()


def test_quarantine_rerun_is_idempotent(spark, warehouse):
    """Crash after apply, before checkpoint: the rerun re-parks the same
    rows (overwrite per batch dir) and converges to the same state."""
    from embulk_output_databricks_spark.streaming.replay import InjectedCrash

    binlog = synth_binlog(spark, 200, 20, 200).cache()
    bad = _corrupt(binlog)
    drv = ReplayDriver(
        LakeCatalog(spark, warehouse),
        JobConfig(mode="merge", n_buckets=4, quarantine=True, retry_limit=0))
    try:
        drv.run_batch(bad, 0, crash_before_checkpoint=True)
        raise RuntimeError("crash not injected")
    except InjectedCrash:
        pass
    drv2 = ReplayDriver(
        LakeCatalog(spark, warehouse),
        JobConfig(mode="merge", n_buckets=4, quarantine=True))
    drv2.replay(bad, batch_ids=[0])
    valid = bad.filter(
        F.col("doc_id").isNotNull() & F.col("op").isin("I", "U", "D"))
    assert table_state(drv2.table) == python_oracle(
        [r.asDict() for r in valid.collect()])
    q = spark.read.parquet(os.path.join(drv2.table.root, "quarantine", "*"))
    assert q.count() == bad.count() - valid.count()  # no duplicates
    binlog.unpersist()
