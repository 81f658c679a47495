"""Identifier-quoting torture fixture (VERDICT r1 item 9): a LITERAL
backtick inside a column name must survive the whole write path — the
reference pins this with quoteIdentifierString doubling backticks
(DatabricksOutputConnection.java:125-131, golden fixture
TestDatabricksOutputConnection.java:46-54). The DataFrame API PARSES
column-name strings in F.col/select/groupBy, so unquoted engine-internal
references would raise INVALID_ATTRIBUTE_NAME_SYNTAX; qcol/qname
(sources/laketable.py) apply the same doubling rule.
"""

import pytest
from pyspark.sql import types as T

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.operators.lww import lww_dedup
from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.sources.laketable import (
    LakeCatalog,
    qname,
)
from embulk_output_databricks_spark.streaming.replay import ReplayDriver

TICK = "val`ue"  # the reference fixture's shape: backtick mid-identifier

SCH = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField(TICK, T.LongType()),
])


def _mk(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/tick")
    return cat, cat.create_table("t", SCH, n_buckets=2, bucket_key="doc_id")


def _state(t):
    return sorted((r["doc_id"], r[TICK]) for r in t.read().collect())


def test_qname_doubles_backticks():
    assert qname(TICK) == "`val``ue`"
    assert qname("plain") == "`plain`"
    assert qname("a`b`c") == "`a``b``c`"


def test_append_read_merge_with_backtick_payload(spark, warehouse):
    cat, t = _mk(spark, warehouse)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCH))
    assert _state(t) == [("a", 1), ("b", 2)]
    merge_apply(t, spark.createDataFrame([("a", 10), ("c", 3)], SCH),
                keys=["doc_id"])
    assert _state(t) == [("a", 10), ("b", 2), ("c", 3)]


def test_backtick_merge_key(spark, warehouse):
    """The pathological case: the MERGE KEY itself carries a backtick
    (key refs flow through bucket_expr, key pruning, and the join)."""
    cat = LakeCatalog(spark, f"{warehouse}/tickkey")
    sch = T.StructType([T.StructField(TICK, T.StringType()),
                        T.StructField("v", T.LongType())])
    t = cat.create_table("t", sch, n_buckets=2, bucket_key=TICK)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], sch))
    merge_apply(t, spark.createDataFrame([("a", 10), ("c", 3)], sch),
                keys=[TICK])
    assert sorted((r[TICK], r["v"]) for r in t.read().collect()) == \
        [("a", 10), ("b", 2), ("c", 3)]


@pytest.mark.parametrize("strategy", ["maxby", "maxstruct", "salted", "window"])
def test_lww_strategies_with_backtick_payload(spark, strategy):
    ev = spark.createDataFrame(
        [("a", 5, 1, "e1"), ("a", 6, 2, "e2"), ("b", 7, 1, "e3")],
        T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField(TICK, T.LongType()),
            T.StructField("seq_lsn", T.LongType()),
            T.StructField("event_id", T.StringType()),
        ]))
    out = lww_dedup(ev, keys=["doc_id"], order=["seq_lsn", "event_id"],
                    strategy=strategy).collect()
    got = sorted((r["doc_id"], r[TICK]) for r in out)
    assert got == [("a", 6), ("b", 7)]


def test_replay_driver_end_to_end_with_backtick_column(spark, warehouse):
    """Full batch path: fence + LWW + MERGE + checkpoint over a schema
    whose payload column carries a backtick."""
    sch = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField(TICK, T.LongType()),
    ])
    cat = LakeCatalog(spark, f"{warehouse}/tickdrv")
    drv = ReplayDriver(cat, JobConfig(mode="merge", merge_keys=["doc_id"],
                                      n_buckets=2), target_schema=sch)
    ev = spark.createDataFrame(
        [("a", 1, 1, "e1", 0, "U"), ("a", 2, 2, "e2", 0, "U"),
         ("b", 3, 3, "e3", 0, "U")],
        T.StructType([
            T.StructField("doc_id", T.StringType()),
            T.StructField(TICK, T.LongType()),
            T.StructField("seq_lsn", T.LongType()),
            T.StructField("event_id", T.StringType()),
            T.StructField("batch_id", T.LongType()),
            T.StructField("op", T.StringType()),
        ]))
    assert drv.run_batch(ev, 0) is not None
    assert sorted((r["doc_id"], r[TICK]) for r in drv.table.read().collect()) \
        == [("a", 2), ("b", 3)]
    # fence: replaying the same batch is a no-op
    assert drv.run_batch(ev, 0) is None
