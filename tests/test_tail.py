"""Structured Streaming tail over a binlog directory -> fenced replay.

Covers: drain-with-availableNow produces the same final state as batch
replay (LWW across all files), incremental tailing picks up only new
files, and an epoch redelivery is fenced (exactly-once on streams).
"""

import time

from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.schema import BINLOG_SCHEMA
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.replay import ReplayDriver
from embulk_output_databricks_spark.streaming.tail import tail_binlog_dir
from embulk_output_databricks_spark.synth import synth_binlog


def _write_binlog_slice(spark, path, start, n, n_docs=50):
    df = synth_binlog(spark, n, n_docs, events_per_batch=n, start=start,
                      partitions=2)
    df.write.mode("overwrite").parquet(path)


def _driver(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    cfg = JobConfig(table="t", mode="merge", merge_keys=["doc_id"], n_buckets=4)
    return ReplayDriver(cat, cfg)


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


class TestTail:
    def test_drain_matches_batch_replay(self, spark, tmp_path):
        binlog_dir = str(tmp_path / "binlog")
        _write_binlog_slice(spark, f"{binlog_dir}/part0", 0, 400)
        _write_binlog_slice(spark, f"{binlog_dir}/part1", 400, 400)

        d_stream = _driver(spark, str(tmp_path / "wh_stream"))
        q = tail_binlog_dir(spark, f"{binlog_dir}/part*", d_stream,
                            str(tmp_path / "ckpt"), max_files_per_trigger=2)
        _drain(q)

        # oracle: one-shot batch replay of the full range
        d_batch = _driver(spark, str(tmp_path / "wh_batch"))
        full = synth_binlog(spark, 800, 50, events_per_batch=800, partitions=2)
        d_batch.run_batch(full, 0)

        a, b = d_stream.table.read(), d_batch.table.read()
        assert a.count() == b.count() > 0
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
        # stream committed at least one fenced epoch with lineage
        assert d_stream.ckpt.committed_batch_ids()

    def test_incremental_pickup(self, spark, tmp_path):
        binlog_dir = str(tmp_path / "binlog")
        _write_binlog_slice(spark, f"{binlog_dir}/a", 0, 300)
        d = _driver(spark, str(tmp_path / "wh"))
        ckpt = str(tmp_path / "ckpt")

        _drain(tail_binlog_dir(spark, f"{binlog_dir}/*", d, ckpt))
        rows1 = d.table.read().count()
        epochs1 = set(d.ckpt.committed_batch_ids())
        assert rows1 > 0

        # second drain with NO new files: no new epochs with data applied
        _drain(tail_binlog_dir(spark, f"{binlog_dir}/*", d, ckpt))
        v1 = d.table.current_version()

        # add a later slice; only it is processed
        _write_binlog_slice(spark, f"{binlog_dir}/b", 300, 300)
        _drain(tail_binlog_dir(spark, f"{binlog_dir}/*", d, ckpt))
        assert d.table.current_version() > v1
        assert set(d.ckpt.committed_batch_ids()) > epochs1

        # final state equals batch replay of the full range
        d_batch = _driver(spark, str(tmp_path / "wh_batch"))
        d_batch.run_batch(
            synth_binlog(spark, 600, 50, events_per_batch=600, partitions=2), 0)
        a, b = d.table.read(), d_batch.table.read()
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_epoch_redelivery_is_fenced(self, spark, tmp_path):
        binlog_dir = str(tmp_path / "binlog")
        _write_binlog_slice(spark, f"{binlog_dir}/a", 0, 200)
        d = _driver(spark, str(tmp_path / "wh"))
        _drain(tail_binlog_dir(spark, f"{binlog_dir}/*", d,
                               str(tmp_path / "ckpt")))
        v = d.table.current_version()
        # simulate Spark redelivering epoch 0 after a checkpoint rollback
        ev = synth_binlog(spark, 200, 50, events_per_batch=200, partitions=2)
        assert d.run_batch(ev, 0) is None  # fence hit
        assert d.table.current_version() == v


def test_table_follower_emits_changes_and_resumes(spark, warehouse, tmp_path):
    from embulk_output_databricks_spark.plans.merge import merge_apply
    from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
    from embulk_output_databricks_spark.streaming.tail import TableFollower
    from tests.test_laketable import seq_rows

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("followed", SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    t.append(seq_rows(spark, range(0, 6)))
    cursor = str(tmp_path / "cursor.json")
    # from_version=0: first poll delivers the whole current state
    f = TableFollower(t, cursor, from_version=0)
    got = f.poll()
    assert got is not None
    df, lo, hi = got
    assert {r["doc_id"] for r in df.collect()} == {
        f"doc{i:08d}" for i in range(6)}
    f.advance(hi)
    assert f.poll() is None  # caught up
    # a merge: only the touched keys surface on the next poll
    staged = (seq_rows(spark, range(4, 9))
              .withColumn("source", F.lit("patched")))
    merge_apply(t, staged, keys=["doc_id"])
    df, lo, hi = f.poll()
    assert {r["doc_id"] for r in df.collect()} == {
        f"doc{i:08d}" for i in range(4, 9)}
    # crash before advance: a NEW follower on the same cursor re-delivers
    # the same interval (at-least-once; keyed upserts make re-apply a no-op)
    f2 = TableFollower(t, cursor)
    df2, lo2, hi2 = f2.poll()
    assert (lo2, hi2) == (lo, hi)
    assert {r["doc_id"] for r in df2.collect()} == {
        f"doc{i:08d}" for i in range(4, 9)}
    f2.advance(hi2)
    assert f2.poll() is None
    # compaction moves the head but changes no rows: empty frame
    t.compact(min_files_per_bucket=1)
    got = f2.poll()
    if got is not None:
        df3, _, hi3 = got
        assert df3.count() == 0
        f2.advance(hi3)
    # default from_version (no existing cursor) = current head: quiet
    f3 = TableFollower(t, str(tmp_path / "c2.json"))
    assert f3.poll() is None


def test_table_follower_propagates_deletes(spark, warehouse, tmp_path):
    """keys mode: poll() emits the interval diff with __op, so a replica
    applying upserts AND deletes converges to the table state even when
    keys vanish — the delete-completing twin of the upsert-only feed."""
    from embulk_output_databricks_spark.plans.merge import merge_apply
    from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog
    from embulk_output_databricks_spark.streaming.tail import TableFollower
    from pyspark.sql import functions as F
    from tests.test_laketable import seq_rows

    cat = LakeCatalog(spark, f"{warehouse}/follow_del")
    t = cat.create_table("t", SEQUENCES_SCHEMA, n_buckets=4,
                         bucket_key="doc_id")
    t.append(seq_rows(spark, range(30)))
    f = TableFollower(t, str(tmp_path / "c.json"), from_version=0,
                      keys=["doc_id"])

    replica: dict = {}

    def apply_feed():
        out = f.poll()
        if out is None:
            return
        df, _frm, to = out
        for r in df.collect():
            if r["__op"] == "D":
                replica.pop(r["doc_id"], None)
            else:
                replica[r["doc_id"]] = (list(r["tokens"]), r["n_tok"])
        f.advance(to)

    apply_feed()  # initial state
    # a batch that deletes some keys and updates others
    staged = (seq_rows(spark, range(10, 40))
              .withColumn("op", F.when(F.col("doc_id") < "doc00000020",
                                       F.lit("D")).otherwise(F.lit("U"))))
    merge_apply(t, staged, keys=["doc_id"], support_deletes=True)
    apply_feed()
    want = {r["doc_id"]: (list(r["tokens"]), r["n_tok"])
            for r in t.read().collect()}
    assert replica == want
    assert any(k < "doc00000020" for k in
               {f"doc{i:08d}" for i in range(10, 20)}) \
        and all(k not in replica for k in
                {f"doc{i:08d}" for i in range(10, 20)})
    # crash before advance: identical interval re-delivered, idempotent
    t.append(seq_rows(spark, range(50, 55)))
    out1 = f.poll()
    rows1 = {(r["doc_id"], r["__op"]) for r in out1[0].collect()}
    out2 = f.poll()  # no advance happened
    assert {(r["doc_id"], r["__op"]) for r in out2[0].collect()} == rows1


def test_table_follower_cursor_expiry(spark, warehouse, tmp_path):
    """A cursor predating retained history (expire_snapshots reclaimed
    its manifest) raises CursorExpired instead of a raw file error;
    resync() hands back the full current state for truncate-and-load and
    the follower then resumes incrementally."""
    import pytest as _pytest

    from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog
    from embulk_output_databricks_spark.streaming.tail import (
        CursorExpired, TableFollower)
    from tests.test_laketable import seq_rows

    cat = LakeCatalog(spark, f"{warehouse}/follow_exp")
    t = cat.create_table("t", SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    t.append(seq_rows(spark, range(10)))
    f = TableFollower(t, str(tmp_path / "c.json"), keys=["doc_id"])
    cursor_v = f.position
    t.append(seq_rows(spark, range(10, 20)))
    t.append(seq_rows(spark, range(20, 30)))
    t.expire_snapshots(keep_last=1)
    with _pytest.raises(CursorExpired, match=f"v{cursor_v}"):
        f.poll()
    full, head = f.resync()
    replica = {r["doc_id"]: r["n_tok"] for r in full.collect()
               if r["__op"] != "D"}
    f.advance(head)
    assert len(replica) == 30 and f.poll() is None
    # incremental consumption resumes normally after the resync
    t.append(seq_rows(spark, range(30, 35)))
    df, _frm, to = f.poll()
    assert {r["doc_id"] for r in df.collect()} == {
        f"doc{i:08d}" for i in range(30, 35)}
    f.advance(to)


def test_table_follower_rate_limited_catchup(spark, warehouse, tmp_path):
    """max_versions / max_files bound each frame (maxFilesPerTrigger
    analog): a consumer far behind drains the backlog in several bounded
    polls whose union equals the unthrottled feed, and an oversized single
    commit still advances one version (no stall)."""
    from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
    from embulk_output_databricks_spark.streaming.tail import TableFollower
    from tests.test_laketable import seq_rows

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("ratelim", SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    v0 = t.current_version()
    for j in range(6):  # 6 commits x 2 files each
        t.append(seq_rows(spark, range(j * 10, j * 10 + 10)))
    head = t.current_version()

    # max_versions: frames span <= 2 commits; drain = 3 polls
    f = TableFollower(t, str(tmp_path / "mv.json"), from_version=v0,
                      max_versions=2)
    seen, frames = set(), 0
    while (got := f.poll()) is not None:
        df, lo, hi = got
        assert hi - lo <= 2
        seen.update(r["doc_id"] for r in df.collect())
        f.advance(hi)
        frames += 1
    assert frames == 3 and f.position == head
    assert seen == {f"doc{i:08d}" for i in range(60)}

    # max_files: each frame's committed-file count fits the cap
    f = TableFollower(t, str(tmp_path / "mf.json"), from_version=v0,
                      max_files=4)
    seen, frames = set(), 0
    while (got := f.poll()) is not None:
        df, lo, hi = got
        assert hi - lo <= 2  # 2 files/commit -> at most 2 commits/frame
        seen.update(r["doc_id"] for r in df.collect())
        f.advance(hi)
        frames += 1
    assert frames >= 3 and f.position == head
    assert seen == {f"doc{i:08d}" for i in range(60)}

    # oversized single commit (> max_files files) still progresses
    f = TableFollower(t, str(tmp_path / "big.json"), max_files=1)
    t.append(seq_rows(spark, range(100, 110)))  # 2 files in one commit
    df, lo, hi = f.poll()
    assert hi == lo + 1 and df.count() == 10
    f.advance(hi)
    assert f.poll() is None
