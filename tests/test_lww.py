"""LWW dedup: all four strategies agree and obey the S10 tie-break."""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.operators import lww_dedup
from embulk_output_databricks_spark.schema import BINLOG_SCHEMA
from embulk_output_databricks_spark.synth import synth_binlog


def ev(lsn, doc, toks, eid, op="U", batch=0):
    return (lsn, batch, op, doc, toks, len(toks) if toks else None, "web", eid)


@pytest.mark.parametrize("strategy", ["maxby", "maxstruct", "salted", "window"])
def test_lww_highest_lsn_wins(spark, strategy):
    df = spark.createDataFrame(
        [ev(1, "a", [1], "e1"), ev(5, "a", [5], "e5"), ev(3, "a", [3], "e3"),
         ev(2, "b", [2], "e2")],
        BINLOG_SCHEMA,
    )
    out = {r["doc_id"]: r for r in lww_dedup(df, strategy=strategy).collect()}
    assert out["a"]["tokens"] == [5] and out["a"]["seq_lsn"] == 5
    assert out["b"]["tokens"] == [2]


@pytest.mark.parametrize("strategy", ["maxby", "maxstruct", "salted", "window"])
def test_lww_tie_broken_by_event_id(spark, strategy):
    # equal seq_lsn: highest event_id wins deterministically (S10)
    df = spark.createDataFrame(
        [ev(7, "a", [1], "aaa"), ev(7, "a", [2], "zzz"), ev(7, "a", [3], "mmm")],
        BINLOG_SCHEMA,
    )
    out = lww_dedup(df, strategy=strategy).collect()
    assert len(out) == 1 and out[0]["tokens"] == [2]


def test_strategies_agree_on_skewed_synth(spark):
    df = synth_binlog(spark, 5000, 200, 5000, hot_frac=0.05).cache()
    a = lww_dedup(df, strategy="maxstruct")
    d = lww_dedup(df, strategy="maxby")
    b = lww_dedup(df, strategy="salted", salt=4)
    c = lww_dedup(df, strategy="window")
    ha = a.select(F.sum(F.xxhash64(*a.columns)).alias("h")).collect()[0]["h"]
    hb = b.select(F.sum(F.xxhash64(*b.columns)).alias("h")).collect()[0]["h"]
    hc = c.select(F.sum(F.xxhash64(*c.columns)).alias("h")).collect()[0]["h"]
    hd = d.select(F.sum(F.xxhash64(*d.columns)).alias("h")).collect()[0]["h"]
    assert ha == hb == hc == hd
    assert a.count() == df.select("doc_id").distinct().count()
    df.unpersist()


def test_synth_deterministic_across_parallelism(spark):
    d1 = synth_binlog(spark, 2000, 100, 500, partitions=2)
    d2 = synth_binlog(spark, 2000, 100, 500, partitions=16)
    h1 = d1.select(F.sum(F.xxhash64(*d1.columns)).alias("h")).collect()[0]["h"]
    h2 = d2.select(F.sum(F.xxhash64(*d2.columns)).alias("h")).collect()[0]["h"]
    assert h1 == h2 and d1.count() == 2000
