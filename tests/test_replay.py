"""End-to-end replay tests: exactly-once fence, crash/resume, schema
evolution mid-replay, oracle equality (FIXTURES.md S10-S15, S21, F6).

The oracle is an independent pure-Python sequential replay of the same
events — the role the live-warehouse query-back plays in the reference's
e2e tests (AbstractTestDatabricksOutputPlugin.java:105-130).
"""

import pytest

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.streaming import ReplayDriver
from embulk_output_databricks_spark.streaming.replay import EvolutionOp, InjectedCrash
from embulk_output_databricks_spark.synth import synth_binlog


def python_oracle(rows):
    """Sequential LWW replay: ground truth for merge mode."""
    state = {}
    for r in sorted(rows, key=lambda r: (r["seq_lsn"], r["event_id"])):
        if r["op"] == "D":
            state.pop(r["doc_id"], None)
        else:
            state[r["doc_id"]] = (list(r["tokens"]), r["n_tok"], r["source"])
    return state


def table_state(t):
    return {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in t.read().collect()}


@pytest.fixture()
def cat(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def test_full_replay_matches_oracle(spark, cat):
    binlog = synth_binlog(spark, 3000, 150, 500, hot_frac=0.05, delete_frac=0.1).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=8))
    recs = drv.replay(binlog)
    assert len(recs) == 6
    oracle = python_oracle([r.asDict() for r in binlog.collect()])
    got = table_state(drv.table)
    assert got == oracle  # row-by-row token-array equality (F6 invariant 1)
    # F6 invariant 2: n_tok == len(tokens)
    assert all(len(v[0]) == v[1] for v in got.values())
    drv.ckpt.validate_contiguous()  # F6 invariant 3
    binlog.unpersist()


def test_replay_is_idempotent_fence(spark, cat):
    binlog = synth_binlog(spark, 1000, 80, 250).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog)
    v = drv.table.current_version()
    # replay the whole binlog again: every batch fenced, zero new snapshots
    again = drv.replay(binlog)
    assert again == [] and drv.table.current_version() == v
    binlog.unpersist()


def test_crash_between_commit_and_checkpoint_then_resume(spark, cat):
    # S11 — the 'genuinely subtle piece' (SURVEY.md §7.4)
    binlog = synth_binlog(spark, 900, 60, 300).cache()
    cfg = JobConfig(mode="merge", n_buckets=4)
    drv = ReplayDriver(cat, cfg)
    drv.run_batch(binlog.filter("batch_id = 0"), 0)
    with pytest.raises(InjectedCrash):
        drv.run_batch(binlog.filter("batch_id = 1"), 1, crash_before_checkpoint=True)
    # batch 1's snapshot committed but its checkpoint did not -> new driver
    # (process restart) must reconcile from snapshot properties, fence batch 1,
    # and continue with batch 2 only.
    drv2 = ReplayDriver(cat, cfg)
    assert drv2.ckpt.is_committed(1) and drv2.ckpt.read(1).get("recovered")
    v = drv2.table.current_version()
    recs = drv2.replay(binlog)
    assert [r["batch_id"] for r in recs] == [2]
    assert drv2.table.current_version() == v + 1
    oracle = python_oracle([r.asDict() for r in binlog.collect()])
    assert table_state(drv2.table) == oracle
    drv2.ckpt.validate_contiguous()
    binlog.unpersist()


def test_schema_evolution_mid_replay(spark, cat):
    # S13/S14/S15: add column, widen, rename between batches
    binlog = synth_binlog(spark, 600, 50, 200, delete_frac=0.0).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    plan = {
        1: [EvolutionOp("add", name="lang", type="string")],
        2: [EvolutionOp("widen", name="n_tok", type="bigint"),
            EvolutionOp("rename", old="source", new="origin")],
    }
    drv.replay(binlog, evolution_plan=plan)
    df = drv.table.read()
    assert "lang" in df.columns and "origin" in df.columns and "source" not in df.columns
    assert dict(df.dtypes)["n_tok"] == "bigint"
    # values survived evolution: compare against oracle modulo renames
    oracle = python_oracle([r.asDict() for r in binlog.collect()])
    got = {r["doc_id"]: (list(r["tokens"]), int(r["n_tok"]), r["origin"]) for r in df.collect()}
    assert got == oracle
    binlog.unpersist()


def test_lineage_metrics_recorded(spark, cat):
    binlog = synth_binlog(spark, 400, 40, 200).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    recs = drv.replay(binlog)
    for rec in recs:
        assert sum(p["events_in"] for p in rec["lineage"]) == 200
        assert rec["lsn_to"] - rec["lsn_from"] == 200
        # snapshot-commit-latency metrics ride the checkpoint record
        assert rec["metrics"]["apply_s"] > 0
        assert 0 < rec["metrics"]["snapshot_commit_s"] <= rec["metrics"]["apply_s"]
        assert drv.ckpt.read(rec["batch_id"])["metrics"] == rec["metrics"]
    binlog.unpersist()


def test_replay_parallelism_invariance(spark, cat, warehouse):
    # S21 smoke: identical final state at 2 vs 16 input partitions
    states = []
    for i, parts in enumerate((2, 16)):
        c = LakeCatalog(spark, f"{warehouse}/p{parts}")
        binlog = synth_binlog(spark, 2000, 100, 500, hot_frac=0.05, partitions=parts)
        drv = ReplayDriver(c, JobConfig(mode="merge", n_buckets=4, dedup_strategy="salted"))
        drv.replay(binlog)
        states.append(table_state(drv.table))
    assert states[0] == states[1]


def test_light_lineage_observation_mode(spark, cat):
    """'light' metrics piggy-back on the apply job (Observation API): the
    checkpoint record carries the exact lsn range/count with NO dedicated
    metrics pass, and the final state matches the full-metrics replay."""
    binlog = synth_binlog(spark, 400, 40, 200).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    recs = [drv.run_batch(binlog.filter(binlog.batch_id == b), b,
                          collect_metrics="light") for b in (0, 1)]
    for b, rec in enumerate(recs):
        assert rec["lineage"] == []
        assert rec["lsn_from"] == b * 200 and rec["lsn_to"] == (b + 1) * 200
    drv.ckpt.validate_contiguous()
    # same final state as a full-metrics replay
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog as LC
    c2 = LC(spark, cat.warehouse + "_full")
    drv2 = ReplayDriver(c2, JobConfig(mode="merge", n_buckets=4))
    drv2.replay(binlog, batch_ids=[0, 1])
    assert table_state(drv.table) == table_state(drv2.table)
    binlog.unpersist()


def test_rollback_bad_batch_then_reapply(spark, cat):
    """Operational rollback story: bad batch lands -> rollback (metadata
    only, history preserved) -> retract its fence -> corrected batch
    re-applies under the same batch_id; final state == clean replay."""
    binlog = synth_binlog(spark, 2000, 100, 1000, delete_frac=0.1).cache()
    b0 = binlog.filter(binlog.batch_id == 0)
    b1 = binlog.filter(binlog.batch_id == 1)

    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.run_batch(b0, 0)
    v_good = drv.table.current_version()
    good_state = table_state(drv.table)

    # "bad" batch 1: same ids, corrupted payload
    from pyspark.sql import functions as F
    bad = b1.withColumn("tokens", F.array(F.lit(-1)))
    drv.run_batch(bad, 1)
    bad_version = drv.table.current_version()
    assert table_state(drv.table) != good_state

    m = drv.table.rollback(v_good)
    assert m.properties["operation"] == "rollback"
    assert table_state(drv.table) == good_state
    # history preserved: the bad snapshot is still time-travelable
    assert drv.table.read(version=bad_version).count() > 0
    # fence must be cleared or the corrected batch is a no-op
    assert drv.ckpt.retract(1) is True
    assert drv.run_batch(b1, 1) is not None
    # crash reconciliation after rollback must NOT resurrect the bad fence
    from embulk_output_databricks_spark.streaming.checkpoint import (
        CheckpointStore,
    )
    CheckpointStore(drv.table)  # fresh recovery pass

    clean = ReplayDriver(LakeCatalog(spark, drv.table.root + "_clean"),
                         JobConfig(mode="merge", n_buckets=4))
    clean.run_batch(b0, 0)
    clean.run_batch(b1, 1)
    assert table_state(drv.table) == table_state(clean.table)


def test_auto_evolve_adds_batch_columns(spark, cat):
    """Delta mergeSchema analog (JobConfig.auto_evolve): a batch carrying a
    column the target lacks adds it metadata-only before the apply; rows
    whose winner predates the column read NULL. Off by default."""
    from pyspark.sql import functions as F

    binlog = synth_binlog(spark, 400, 40, 200, delete_frac=0.0).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4,
                                      auto_evolve=True))
    drv.run_batch(binlog.filter("batch_id = 0"), 0)
    assert "lang" not in drv.table.read().columns
    b1 = binlog.filter("batch_id = 1").withColumn("lang", F.lit("en"))
    drv.run_batch(b1, 1)
    b1_keys = {r["doc_id"] for r in b1.select("doc_id").distinct().collect()}
    got = {r["doc_id"]: r["lang"] for r in drv.table.read().collect()}
    assert got and all(
        v == ("en" if k in b1_keys else None) for k, v in got.items())
    # default posture: unknown batch columns are DROPPED, not added
    drv2 = ReplayDriver(cat, JobConfig(table="noevolve", mode="merge",
                                       n_buckets=4))
    drv2.run_batch(binlog.filter("batch_id = 0")
                   .withColumn("extra", F.lit(1)), 0)
    assert "extra" not in drv2.table.read().columns
    binlog.unpersist()
