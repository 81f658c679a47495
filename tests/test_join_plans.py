"""Pin the physical plan shape of the non-equi join operators: the whole
point of the union-tag as-of and the banded range join is what they DON'T
do (range explosion / cartesian product / extra shuffles), so regressions
here are silent correctness-of-scale bugs even when values stay right.
"""

from pyspark.sql import functions as F

from embulk_output_databricks_spark.operators.joins import (
    asof_join,
    range_join_banded,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_join_is_single_exchange_no_join_node(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"))
    right = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("t"),
        F.col("id").alias("v"))
    out = asof_join(left, right, key="k", ts="t", right_payload=["v"])
    plan = _plan(out)
    # no join operator at all — the as-of is a union + one windowed pass
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"{bad} leaked into as-of plan:\n{plan}"
    # exactly one hash-partitioning exchange (on the key), however Spark
    # formats it; rangepartitioning would mean a global sort snuck in
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"want 1 shuffle, got {n_exchanges}:\n{plan}"
    assert "rangepartitioning" not in plan


def test_range_join_banded_is_equi_join_not_cartesian(spark):
    pts = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("t"))
    ivs = spark.range(20).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 40).alias("lo"),
        (F.col("id") * 40 + 60).alias("hi"))
    out = range_join_banded(pts, ivs, key="k", point_ts="t",
                            lo="lo", hi="hi", band_width=64)
    plan = _plan(out)
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"{bad} in banded range-join plan:\n{plan}"
    # the band join must be a hash-based equi join on (k, band)
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan), plan


def test_components_rounds_scale_log_not_linear(spark):
    """A 64-hop chain must converge in <= ~log2(64)+slack rounds — guards
    the pointer-jumping step (without it, convergence needs 64 rounds and
    max_rounds=20 would raise)."""
    from embulk_output_databricks_spark.operators.dedupe import (
        neardup_components,
    )

    n = 64
    e = spark.createDataFrame([(i, i + 1) for i in range(n)],
                              "doc_a bigint, doc_b bigint")
    v = spark.createDataFrame([(i,) for i in range(n + 1)], "doc_id bigint")
    out = neardup_components(e, v, max_rounds=10)
    assert {r["cluster_id"] for r in out.collect()} == {0}
