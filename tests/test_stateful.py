"""Stateful streaming LWW changelog (streaming/stateful.py,
applyInPandasWithState): cross-micro-batch state, delete propagation,
stale-event suppression across a checkpointed restart."""

from pyspark.sql import functions as F

from embulk_output_databricks_spark.operators.lww import lww_dedup
from embulk_output_databricks_spark.schema import BINLOG_SCHEMA
from embulk_output_databricks_spark.streaming.stateful import streaming_lww_changelog
from embulk_output_databricks_spark.synth import synth_binlog


def _drain(spark, src_dir, ckpt, files_per_trigger=2):
    """Drain the dir stream through the stateful operator; returns emitted
    changelog rows. foreachBatch sink so the checkpoint supports restart."""
    rows = []
    stream = (
        spark.readStream.schema(BINLOG_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    q = (
        streaming_lww_changelog(stream)
        .writeStream.foreachBatch(lambda df, _eid: rows.extend(df.collect()))
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def _winners(rows):
    best = {}
    for r in rows:
        k = (r["seq_lsn"], r["event_id"])
        if r["doc_id"] not in best or k > (best[r["doc_id"]]["seq_lsn"],
                                           best[r["doc_id"]]["event_id"]):
            best[r["doc_id"]] = r
    return {
        d: (r["seq_lsn"], r["op"], r["event_id"],
            None if r["tokens"] is None else list(r["tokens"]))
        for d, r in best.items()
    }


def test_changelog_winners_match_batch_lww(spark, tmp_path):
    binlog = synth_binlog(spark, 600, 40, 200, delete_frac=0.1).cache()
    src = str(tmp_path / "src")
    binlog.repartition(6).write.parquet(src)
    rows = _drain(spark, src, str(tmp_path / "ck"))

    # the true winner per key is always emitted (when first seen, at latest)
    want = {
        r["doc_id"]: (r["seq_lsn"], r["op"], r["event_id"],
                      None if r["tokens"] is None else list(r["tokens"]))
        for r in lww_dedup(binlog).collect()
    }
    assert _winners(rows) == want
    # deletes propagate as op='D' changelog rows
    assert any(v[1] == "D" for v in want.values())
    # changelog is minimal-ish: never more rows than events, at least one per key
    assert len(want) <= len(rows) <= binlog.count()
    binlog.unpersist()


def test_stale_events_suppressed_across_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    fresh = synth_binlog(spark, 200, 20, 200, delete_frac=0.0, start=1000)
    fresh.coalesce(1).write.parquet(src)
    rows1 = _drain(spark, src, ckpt)
    assert len(rows1) > 0

    # phase 2: ONLY stale events — the same rows with seq_lsn shifted below
    # everything already applied (same doc ids by construction); the
    # restarted query recovers state from the checkpoint and must emit 0
    stale = fresh.withColumn("seq_lsn", F.col("seq_lsn") - 1000)
    stale.coalesce(1).write.mode("append").parquet(src)
    rows2 = _drain(spark, src, ckpt)
    assert rows2 == []