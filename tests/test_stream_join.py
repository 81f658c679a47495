"""Watermarked stream-stream interval join (streaming/stream_join.py):
single-batch result equals the batch interval join; across micro-batches
the watermark evicts old left state, so a late right row joins nothing."""

import datetime

from pyspark.sql import types as T

from embulk_output_databricks_spark.streaming.stream_join import interval_join

L_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])
R_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])


def _ts(minute, sec=0):
    return datetime.datetime(2024, 1, 1, 0, minute, sec)


def _write(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("append").parquet(path)


def _drain(spark, lsrc, rsrc, ckpt, **kw):
    rows = []
    ls = spark.readStream.schema(L_SCHEMA).parquet(lsrc)
    rs = spark.readStream.schema(R_SCHEMA).parquet(rsrc)
    q = (
        interval_join(ls, rs, key="user_id", within="1 minute",
                      watermark="1 minute", **kw)
        .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def test_single_batch_equals_batch_join(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt = str(tmp_path / "ck")
    _write(spark, [(1, _ts(0)), (1, _ts(5)), (2, _ts(0))], L_SCHEMA, lsrc)
    _write(spark, [
        (1, _ts(0, 30), 10.0),   # joins click@0 (within 1 min)
        (1, _ts(0, 0), 99.0),    # strictly-after violated: no join
        (1, _ts(6, 1), 7.0),     # outside the 1-min window of click@5
        (2, _ts(0, 59), 5.0),    # joins user 2's click@0
        (3, _ts(0, 10), 1.0),    # no left side
    ], R_SCHEMA, rsrc)
    rows = _drain(spark, lsrc, rsrc, ckpt)
    got = {(r["user_id"], r["L_ts"].minute, r["R_value"]) for r in rows}
    assert got == {(1, 0, 10.0), (2, 0, 5.0)}


def test_late_right_row_joins_nothing(spark, tmp_path):
    """After the watermark advances far past a left row, its state is
    evicted; a late matching right row must emit no pair (the bounded-
    disorder contract)."""
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt = str(tmp_path / "ck")
    _write(spark, [(1, _ts(0)), (1, _ts(30))], L_SCHEMA, lsrc)
    _write(spark, [(1, _ts(30, 10), 2.0)], R_SCHEMA, rsrc)
    rows1 = _drain(spark, lsrc, rsrc, ckpt)
    assert {(r["user_id"], r["L_ts"].minute) for r in rows1} == {(1, 30)}
    # watermark is now ~ minute 29 on both sides; a right row targeting
    # the minute-0 left row is hopelessly late
    _write(spark, [(1, _ts(0, 20), 123.0)], R_SCHEMA, rsrc)
    rows2 = _drain(spark, lsrc, rsrc, ckpt)
    assert rows2 == []


def test_rejects_unknown_join_type(spark, tmp_path):
    import pytest

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    _write(spark, [(1, _ts(0))], L_SCHEMA, lsrc)
    _write(spark, [(1, _ts(0), 1.0)], R_SCHEMA, rsrc)
    ls = spark.readStream.schema(L_SCHEMA).parquet(lsrc)
    rs = spark.readStream.schema(R_SCHEMA).parquet(rsrc)
    with pytest.raises(ValueError, match="join type"):
        interval_join(ls, rs, key="user_id", how="cross")


def test_left_outer_emits_null_for_unmatched_left(spark, tmp_path):
    """leftOuter: a left row with no match emits once with NULL right
    columns — only after the watermark proves no match can still arrive
    (a later micro-batch advances it past the join window)."""
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    ckpt = str(tmp_path / "ck")
    _write(spark, [(1, _ts(0))], L_SCHEMA, lsrc)             # never matched
    _write(spark, [(2, _ts(0, 30), 5.0)], R_SCHEMA, rsrc)    # different key
    rows = _drain(spark, lsrc, rsrc, ckpt, how="leftOuter")
    got = {(r["user_id"], r["R_value"]) for r in rows}
    # the unmatched left row may not flush until the watermark advances;
    # feed a much later batch on both sides and drain again
    _write(spark, [(9, _ts(30))], L_SCHEMA, lsrc)
    _write(spark, [(9, _ts(30, 10), 7.0)], R_SCHEMA, rsrc)
    rows2 = _drain(spark, lsrc, rsrc, ckpt, how="leftOuter")
    got |= {(r["user_id"], r["R_value"]) for r in rows2}
    assert (1, None) in got        # unmatched left surfaced with NULL right
    assert (9, 7.0) in got         # matched pair joined normally
