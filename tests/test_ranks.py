"""Distributed global ranking (operators/ranks.py).

The plain-window rank is the semantic oracle; the operator must be
value-equal while never moving the data through a single-partition window
(the plan pin). Tie-heavy inputs exercise the cross-partition rank /
dense_rank offset correction; tiny inputs exercise ntile's n < k edge.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from embulk_output_databricks_spark.operators.ranks import global_ranks


def _plain(df, ntile):
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    return df.select(
        "id", "v",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(ntile).over(w).alias("quartile"),
    )


def _ranked(df, ntile, parts=None):
    return global_ranks(
        df, order=[("v", "desc"), ("id", "asc")], ntile=ntile,
        num_partitions=parts,
    ).select("id", "v", "rn", "rnk", "drnk", "quartile")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("n,mod,k,parts", [
    (1000, 7, 4, 8),     # heavy ties spanning many range partitions
    (1000, 1000, 5, 8),  # all-distinct keys
    (1000, 1, 3, 8),     # ONE tie group = the whole input (worst skew)
    (3, 2, 4, 4),        # n < k ntile edge (floor bucket size is 0)
    (1, 1, 4, 2),        # single row
])
def test_matches_plain_window(spark, n, mod, k, parts):
    df = spark.range(n).select(
        F.col("id"), (F.col("id") % mod).alias("v"))
    assert _rows(_ranked(df, k, parts)) == _rows(_plain(df, k))


def test_more_partitions_than_rows(spark):
    df = spark.range(5).select(F.col("id"), (F.col("id") % 2).alias("v"))
    assert _rows(_ranked(df, 4, parts=32)) == _rows(_plain(df, 4))


def test_default_partitions_and_extra_columns_survive(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 9).alias("v"),
        (F.col("id") * 2).alias("payload"))
    out = global_ranks(df, order=[("v", "asc"), ("id", "asc")])
    assert set(out.columns) == {"id", "v", "payload", "rn", "rnk", "drnk"}
    got = {r["id"]: (r["rn"], r["payload"]) for r in out.collect()}
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = {r["id"]: (r["rn"], r["id"] * 2)
            for r in df.select("id", F.row_number().over(w).alias("rn")).collect()}
    assert got == want


def test_plan_has_no_single_partition_data_window(spark):
    """Pin the physical shape: the data reaches its window via range + hash
    exchanges; the only SinglePartition exchange feeds the per-partition
    summary (one row per partition), never the data."""
    df = spark.range(10_000).select(F.col("id"), (F.col("id") % 11).alias("v"))
    plan = _ranked(df, 4, parts=8)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # every SinglePartition exchange must sit below the summary aggregate
    # (count/count_distinct per __pid), i.e. appear only after the first
    # HashAggregate over __pid in the tree dump
    for i, line in enumerate(plan.splitlines()):
        if "SinglePartition" in line:
            above = "\n".join(plan.splitlines()[:i])
            assert "__pid" in above or "__rows" in above, (
                "SinglePartition exchange on the data path:\n" + plan)
