"""Stage-ahead pipelining (VERDICT r2 item 5): the prefetch thread builds
the whole APPLY-READY frame — LWW dedup + merge pre-pass aggregation —
one batch early, so the apply chain keeps only join+write+commit. Every
fence/crash/evolution property of the serial loop must hold unchanged,
and a stale prestage (schema evolved, specs changed) must fall back to
fresh staging — never a wrong result.
"""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.streaming import ReplayDriver
from embulk_output_databricks_spark.streaming.replay import EvolutionOp
from embulk_output_databricks_spark.synth import synth_binlog
from tests.test_replay import python_oracle, table_state


@pytest.fixture()
def cat(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def test_stage_ahead_matches_sequential(spark, cat, warehouse):
    binlog = synth_binlog(spark, 2400, 120, 400, delete_frac=0.1).cache()
    seq = ReplayDriver(LakeCatalog(spark, warehouse + "_seq"),
                       JobConfig(mode="merge", n_buckets=4))
    recs_seq = seq.replay(binlog, collect_metrics="light")
    sa = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    recs_sa = sa.replay(binlog, read_ahead=2, stage_ahead=True,
                        collect_metrics="light")
    assert table_state(sa.table) == table_state(seq.table)
    assert [r["batch_id"] for r in recs_sa] == [r["batch_id"] for r in recs_seq]
    # the prestaged light metrics must carry real lsn stats
    assert all(r["metrics"] is not None for r in recs_sa)
    sa.ckpt.validate_contiguous()
    binlog.unpersist()


def test_stage_ahead_is_fenced(spark, cat):
    binlog = synth_binlog(spark, 1000, 60, 250).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, read_ahead=2, stage_ahead=True, collect_metrics="light")
    v = drv.table.current_version()
    assert drv.replay(binlog, read_ahead=2, stage_ahead=True,
                      collect_metrics="light") == []
    assert drv.table.current_version() == v
    binlog.unpersist()


def test_stage_ahead_with_evolution_falls_back(spark, cat):
    """A batch carrying schema DDL cannot consume a prestage built against
    the old schema: the sv gate rejects it and the batch stages fresh —
    the final state must equal the sequential evolved replay."""
    binlog = synth_binlog(spark, 900, 60, 300, delete_frac=0.0) \
        .withColumn("lang", F.lit("en")).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    recs = drv.replay(
        binlog, read_ahead=2, stage_ahead=True, collect_metrics="light",
        evolution_plan={1: [EvolutionOp("add", name="lang", type="string")]})
    assert len(recs) == 3
    final = drv.table.read()
    assert "lang" in final.columns
    # rows applied before the DDL read NULL; later batches carry 'en'
    assert final.filter(F.col("lang") == "en").count() > 0
    binlog.unpersist()


def test_stage_ahead_under_fifo_warns_and_falls_back(spark, cat, caplog,
                                                     monkeypatch):
    """Under a FIFO scheduler the pre-pass jobs submitted by the prefetch
    thread hold the cluster and the apply chain queues behind them —
    measured WORSE than serial (BASELINE.md). The guard (VERDICT r3 #4)
    must warn loudly and fall back to plain source read-ahead, with the
    result unchanged."""
    import logging

    from embulk_output_databricks_spark.streaming import replay as R

    monkeypatch.setattr(R, "_scheduler_is_fair", lambda sc: False)
    binlog = synth_binlog(spark, 1200, 80, 300, delete_frac=0.1).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    with caplog.at_level(logging.WARNING):
        drv.replay(binlog, read_ahead=2, stage_ahead=True,
                   collect_metrics="light")
    assert drv.stage_ahead_active is False
    assert any("FAIR scheduler" in r.message for r in caplog.records)
    assert table_state(drv.table) == \
        python_oracle([r.asDict() for r in binlog.collect()])
    binlog.unpersist()


def test_stage_ahead_active_flag_under_fair(spark, cat):
    """The test session runs FAIR (conftest): stage_ahead=True must keep
    the staged path on and say so via stage_ahead_active."""
    binlog = synth_binlog(spark, 900, 60, 300, delete_frac=0.0).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, read_ahead=1, stage_ahead=True,
               collect_metrics="light")
    assert drv.stage_ahead_active is True
    binlog.unpersist()


def test_stage_ahead_respects_delete_semantics(spark, cat):
    binlog = synth_binlog(spark, 3000, 150, 500, delete_frac=0.25).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, read_ahead=1, stage_ahead=True, collect_metrics="light")
    assert table_state(drv.table) == \
        python_oracle([r.asDict() for r in binlog.collect()])
    binlog.unpersist()
