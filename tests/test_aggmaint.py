"""Incremental aggregate maintenance (streaming/aggmaint.py): a rollup
table kept in sync from LakeTable.diff(include_old=True) must equal the
rollup recomputed from the base table after every step — including group
migration, deletes, brand-new groups, and delete-on-empty-group."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.aggmaint import maintain_agg

BASE = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("grp", T.StringType()),
    T.StructField("v", T.LongType()),
])
AGG = T.StructType([
    T.StructField("grp", T.StringType()),
    T.StructField("n_rows", T.LongType()),
    T.StructField("sum_v", T.LongType()),
])

MEASURES = {"sum_v": ("v", lambda c: c)}


def _mk(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/am")
    base = cat.create_table("base", BASE, n_buckets=4, bucket_key="k")
    agg = cat.create_table("agg", AGG, n_buckets=2, bucket_key="grp")
    return base, agg


def _recompute(base):
    return base.read().groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v"))


def _state(df):
    return sorted(tuple(r) for r in df.select("grp", "n_rows", "sum_v").collect())


def _staged(spark, rows):
    return spark.createDataFrame(
        rows, "k long, grp string, v long, op string")


def test_maintained_rollup_tracks_base(spark, warehouse):
    base, agg = _mk(spark, warehouse)
    base.append(spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20), (3, "B", 30)], BASE))
    agg.append(_recompute(base))
    v1 = base.current_version()

    # migration (k2 A->B), delete (k3), new group (k4 C)
    merge_apply(base, _staged(spark, [
        (2, "B", 25, "U"), (3, "B", 30, "D"), (4, "C", 40, "U"),
    ]), keys=["k"], support_deletes=True)
    maintain_agg(base, agg, since_version=v1, keys=["k"],
                 group_cols=["grp"], measures=MEASURES)
    assert _state(agg.read()) == [("A", 1, 10), ("B", 1, 25), ("C", 1, 40)]
    assert _state(agg.read()) == _state(_recompute(base))

    # second interval: group A empties (its row must disappear), C updates
    v2 = base.current_version()
    merge_apply(base, _staged(spark, [
        (1, "A", 10, "D"), (4, "C", 45, "U"),
    ]), keys=["k"], support_deletes=True)
    maintain_agg(base, agg, since_version=v2, keys=["k"],
                 group_cols=["grp"], measures=MEASURES)
    assert _state(agg.read()) == [("B", 1, 25), ("C", 1, 45)]
    assert _state(agg.read()) == _state(_recompute(base))


def test_value_only_update_keeps_count(spark, warehouse):
    base, agg = _mk(spark, warehouse)
    base.append(spark.createDataFrame([(1, "A", 5), (2, "A", 7)], BASE))
    agg.append(_recompute(base))
    v1 = base.current_version()
    merge_apply(base, _staged(spark, [(1, "A", 50, "U")]),
                keys=["k"], support_deletes=True)
    maintain_agg(base, agg, since_version=v1, keys=["k"],
                 group_cols=["grp"], measures=MEASURES)
    assert _state(agg.read()) == [("A", 2, 57)]


def test_noop_interval_changes_nothing(spark, warehouse):
    base, agg = _mk(spark, warehouse)
    base.append(spark.createDataFrame([(1, "A", 5)], BASE))
    agg.append(_recompute(base))
    v1 = base.current_version()
    # re-merge the identical row: diff is empty, rollup must not move
    merge_apply(base, _staged(spark, [(1, "A", 5, "U")]),
                keys=["k"], support_deletes=True)
    maintain_agg(base, agg, since_version=v1, keys=["k"],
                 group_cols=["grp"], measures=MEASURES)
    assert _state(agg.read()) == [("A", 1, 5)]


def test_diff_include_old_columns(spark, warehouse):
    base, _ = _mk(spark, warehouse)
    base.append(spark.createDataFrame([(1, "A", 10), (2, "B", 20)], BASE))
    v1 = base.current_version()
    merge_apply(base, _staged(spark, [
        (1, "A", 11, "U"), (2, "B", 20, "D"), (3, "C", 30, "U"),
    ]), keys=["k"], support_deletes=True)
    d = {r["k"]: r.asDict()
         for r in base.diff(v1, keys=["k"], include_old=True).collect()}
    assert d[1]["__op"] == "U" and d[1]["v"] == 11 and d[1]["__old_v"] == 10
    assert d[2]["__op"] == "D" and d[2]["__old_v"] == 20
    assert d[3]["__op"] == "I" and d[3]["v"] == 30 and d[3]["__old_v"] is None


# ---------------- driver integration (cfg.rollups) ----------------

from embulk_output_databricks_spark.config import ConfigError, JobConfig  # noqa: E402
from embulk_output_databricks_spark.streaming.aggmaint import (  # noqa: E402
    WATERMARK_PROP,
)
from embulk_output_databricks_spark.streaming.replay import (  # noqa: E402
    InjectedCrash,
    ReplayDriver,
)
from embulk_output_databricks_spark.synth import synth_binlog  # noqa: E402

ROLLUP_CFG = [{"name": "by_source", "group_by": ["source"], "sums": ["n_tok"]}]


def _rollup_state(t):
    return sorted(tuple(r) for r in t.read().collect())


def _recompute_state(base):
    return sorted(tuple(r) for r in base.read().groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_tok").alias("sum_n_tok")).collect())


def test_driver_maintained_rollup_tracks_replay(spark, warehouse):
    import pytest as _pytest
    binlog = synth_binlog(spark, 1200, 80, 400, delete_frac=0.1).cache()
    cfg = JobConfig(mode="merge", n_buckets=4, rollups=ROLLUP_CFG)
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/ri"), cfg)
    drv.replay(binlog)
    agg, _, _ = drv.rollups[0]
    assert agg.name == "sequences__by_source"
    assert _rollup_state(agg) == _recompute_state(drv.table)
    assert int(agg.manifest().properties[WATERMARK_PROP]) == \
        drv.table.current_version()
    binlog.unpersist()
    # rollups demand the keyed diff -> merge mode only
    with _pytest.raises(ConfigError):
        JobConfig(mode="insert", rollups=ROLLUP_CFG)


def test_rollup_self_heals_after_crash_and_fence_replay(spark, warehouse):
    import pytest as _pytest
    b1 = synth_binlog(spark, 400, 50, 400)
    b2 = synth_binlog(spark, 400, 50, 400, start=400)
    cfg = JobConfig(mode="merge", n_buckets=4, rollups=ROLLUP_CFG)
    cat = LakeCatalog(spark, f"{warehouse}/rc")
    drv = ReplayDriver(cat, cfg)
    drv.run_batch(b1, 0)
    assert _rollup_state(drv.rollups[0][0]) == _recompute_state(drv.table)
    with _pytest.raises(InjectedCrash):
        drv.run_batch(b2, 1, crash_before_checkpoint=True)
    # crash landed between the apply commit and the rollup sync: stale
    agg = drv.rollups[0][0]
    assert int(agg.manifest().properties[WATERMARK_PROP]) < \
        drv.table.current_version()
    # restart: the fence reconciles batch 1 to committed (no re-apply) and
    # the rollup catches up on the fence-hit path
    drv2 = ReplayDriver(cat, cfg)
    assert drv2.run_batch(b2, 1) is None
    agg2 = drv2.rollups[0][0]
    assert _rollup_state(agg2) == _recompute_state(drv2.table)
    assert int(agg2.manifest().properties[WATERMARK_PROP]) == \
        drv2.table.current_version()
