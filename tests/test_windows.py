"""Watermarked tumbling windows (streaming/windows.py): exactly-once window
emission in append mode and late-data dropping across a checkpointed
restart."""

from pyspark.sql import types as T

from embulk_output_databricks_spark.streaming.windows import tumbling_counts

SCHEMA = T.StructType([
    T.StructField("ts", T.TimestampType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_tok", T.IntegerType()),
])


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _drain(spark, src, ckpt):
    rows = []
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        tumbling_counts(stream)
        .writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return rows


def _ts(minute, sec=0):
    import datetime

    return datetime.datetime(2024, 1, 1, 0, minute, sec)


def test_windows_emit_once_and_late_data_dropped(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    # three files -> three micro-batches; the watermark advances between
    # them, so W0=[0,1) and W1=[1,2) finalize during the drain
    _write(spark, [(_ts(0, 10), "web", 5), (_ts(0, 40), "web", 7),
                   (_ts(1, 20), "book", 3)], src)
    _write(spark, [(_ts(5, 0), "web", 1)], src)
    _write(spark, [(_ts(6, 0), "web", 1)], src)
    rows1 = _drain(spark, src, ckpt)
    got = {(r["w_start"].minute, r["source"]): (r["n_events"], r["n_tok_sum"])
           for r in rows1}
    assert got[(0, "web")] == (2, 12)   # W0 finalized with both events
    assert got[(1, "book")] == (1, 3)
    # append mode: every emitted window appears exactly once
    assert len(rows1) == len(got)

    # restart with ONLY late data for W0 (watermark ~ 4min by now) plus a
    # fresh event; the late row must NOT re-open or re-emit W0
    _write(spark, [(_ts(0, 50), "web", 100), (_ts(7, 0), "web", 1)], src)
    rows2 = _drain(spark, src, ckpt)
    assert all(r["w_start"].minute != 0 for r in rows2)
    # and the finalized W0 result was not altered anywhere
    all_w0 = [r for r in rows1 + rows2 if r["w_start"].minute == 0]
    assert len(all_w0) == 1 and all_w0[0]["n_events"] == 2

def test_session_window_boundary_merges_and_streaming_matches_batch(spark, tmp_path):
    """Pin Spark's session_window gap semantics: an event at EXACTLY
    prev + gap merges into the session (strict-> islands), which is what
    lets events_session_stream share the lag-based sessionize oracle. Also
    checks the streaming drain equals the batch session_window result."""
    import datetime

    from pyspark.sql import functions as F

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0 + datetime.timedelta(minutes=30)),        # merges
        (1, t0 + datetime.timedelta(minutes=60, seconds=1)),      # splits
        (2, t0), (2, t0 + datetime.timedelta(minutes=29, seconds=59)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    batch = (df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
             .agg(F.count(F.lit(1)).alias("n")))
    got = {(r["user_id"], r["w"]["start"]): r["n"] for r in batch.collect()}
    assert got[(1, t0)] == 2                 # exact-boundary event merged
    assert len([k for k in got if k[0] == 1]) == 2
    assert got[(2, t0)] == 2

    src, ck, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    agg = (stream.withWatermark("ts", "1 minute")
           .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
           .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream
         .foreachBatch(lambda d, _e: d.select("user_id", "w.start", "n")
                       .write.mode("overwrite").parquet(out))
         .outputMode("complete")
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    sgot = {(r["user_id"], r["start"]): r["n"]
            for r in spark.read.parquet(out).collect()}
    assert sgot == got
