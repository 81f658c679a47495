"""Snapshot branches + write-audit-publish (FIXTURES.md S44).

Iceberg branch-ref/WAP analog; no reference counterpart — its loads land
straight in the target with no audit gate. A branch is a second head
pointer over the SAME global snapshot sequence: commits to it are ordinary
atomic manifest commits that advance only the branch file; publish is an
atomic fast-forward of main's pointer; nothing is ever copied.
"""

import pytest

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.sources.laketable import CommitConflict
from embulk_output_databricks_spark.streaming import ReplayDriver
from embulk_output_databricks_spark.synth import synth_binlog

from test_replay import python_oracle, table_state


@pytest.fixture()
def cat(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def test_branch_isolation_and_publish(spark, cat):
    # doc universe >> docs-per-batch and buckets >> docs-per-batch, so the
    # branch's batches provably leave some of main's buckets untouched —
    # those buckets' files must be SHARED with the branch (commits copy
    # metadata, never data)
    binlog = synth_binlog(spark, 1200, 500, 300, delete_frac=0.1).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=256))
    drv.replay(binlog, batch_ids=[0, 1])
    main = drv.table
    v_main = main.current_version()
    state_before = table_state(main)

    audit = main.create_branch("audit")
    bdrv = ReplayDriver(cat, drv.cfg, table=audit)
    bdrv.replay(binlog, batch_ids=[2, 3])

    # isolation: main frozen, branch ahead, data files shared (no copy)
    assert main.current_version() == v_main
    assert audit.current_version() > v_main
    assert table_state(main) == state_before
    main_paths = {f["path"] for f in main.manifest().files}
    branch_paths = {f["path"] for f in audit.manifest().files}
    assert main_paths & branch_paths  # untouched buckets are shared files

    # publish: atomic fast-forward; final state == exactly-once full replay
    main.publish_branch("audit")
    assert main.current_version() == audit.current_version()
    oracle = python_oracle([r.asDict() for r in binlog.collect()])
    assert table_state(main) == oracle
    binlog.unpersist()


def test_publish_refuses_diverged_heads(spark, cat):
    binlog = synth_binlog(spark, 600, 40, 150).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, batch_ids=[0])
    main = drv.table
    audit = main.create_branch("audit")
    ReplayDriver(cat, drv.cfg, table=audit).replay(binlog, batch_ids=[1])
    # main advances independently -> fast-forward would drop that commit
    drv.run_batch(binlog.filter("batch_id = 2"), 2)
    with pytest.raises(CommitConflict):
        main.publish_branch("audit")
    binlog.unpersist()


def test_failed_audit_drop_branch_keeps_main_clean(spark, cat):
    from pyspark.sql import functions as F

    binlog = synth_binlog(spark, 600, 40, 150).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, batch_ids=[0])
    main = drv.table
    state = table_state(main)

    audit = main.create_branch("audit")
    bad = binlog.filter("batch_id = 1").withColumn("source", F.lit("CORRUPT"))
    bdrv = ReplayDriver(cat, drv.cfg, table=audit)
    bdrv.run_batch(bad, 1)
    assert audit.read().filter("source = 'CORRUPT'").count() > 0
    # audit fails -> discard the branch; the bad batch's fence must be
    # retracted so the corrected batch can re-apply on main
    main.drop_branch("audit")
    assert bdrv.ckpt.retract(1)
    assert table_state(main) == state
    assert main.list_branches() == []

    drv.replay(binlog, batch_ids=[1, 2, 3])
    oracle = python_oracle([r.asDict() for r in binlog.collect()])
    assert table_state(main) == oracle
    binlog.unpersist()


def test_branch_refs_and_errors(spark, cat):
    binlog = synth_binlog(spark, 300, 20, 80).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, batch_ids=[0])
    t = drv.table
    b = t.create_branch("x")
    assert t.list_branches() == ["x"]
    with pytest.raises(ValueError):
        t.create_branch("x")  # no silent re-fork
    with pytest.raises(ValueError):
        t.create_branch("bad name")
    with pytest.raises(ValueError):
        t.branch("nope")
    # a no-change publish is a no-op, not an error
    t.publish_branch("x")
    # expire_snapshots never reclaims a snapshot a live branch points at
    v_branch = b.current_version()
    drv.replay(binlog, batch_ids=[1, 2])
    t.expire_snapshots(keep_last=1)
    assert b.manifest(v_branch).version == v_branch  # still readable
    t.drop_branch("x")
    with pytest.raises(ValueError):
        t.drop_branch("x")
    binlog.unpersist()


def test_tags_pin_reproducible_snapshots(spark, cat):
    """Iceberg tag-ref analog: an immutable named snapshot survives
    expire_snapshots (exactly that version; the untagged history between
    tag and head still expires) and its files survive orphan GC — the
    reproducible `table@tag` handle for a training run."""
    binlog = synth_binlog(spark, 400, 30, 100, delete_frac=0.1).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, batch_ids=[0])
    t = drv.table
    v_tagged = t.create_tag("train-v1")
    assert t.tags() == {"train-v1": v_tagged}
    tagged_state = {r["doc_id"]: r["tokens"] for r in t.read_tag("train-v1").collect()}
    with pytest.raises(ValueError):
        t.create_tag("train-v1")  # immutable
    with pytest.raises(ValueError):
        t.tag_version("nope")
    drv.replay(binlog, batch_ids=[1, 2, 3])
    expired = t.expire_snapshots(keep_last=1)
    assert v_tagged not in expired            # pinned
    assert any(v > v_tagged for v in expired)  # in-between history expired
    t.remove_orphan_files()
    # byte-identical read-back after expiry + GC
    assert {r["doc_id"]: r["tokens"]
            for r in t.read_tag("train-v1").collect()} == tagged_state
    # dropping the tag releases the pin: next expiry reclaims it
    t.drop_tag("train-v1")
    with pytest.raises(ValueError):
        t.drop_tag("train-v1")
    assert v_tagged in t.expire_snapshots(keep_last=1)
    binlog.unpersist()


def test_refs_metadata_table(spark, cat):
    binlog = synth_binlog(spark, 200, 20, 60).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, batch_ids=[0])
    t = drv.table
    t.create_branch("audit")
    v_tag = t.create_tag("train-v1")
    got = {(r["name"], r["type"]): r["version"] for r in t.refs().collect()}
    assert got[("main", "head")] == t.current_version()
    assert got[("audit", "branch")] == t.current_version()
    assert got[("train-v1", "tag")] == v_tag
    binlog.unpersist()
