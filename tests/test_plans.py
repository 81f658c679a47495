"""Physical-plan quality gates (task brief: '.explain the plan and iterate
until it's the plan you'd want').

These are regression tests over the OPTIMIZED/physical plan text so a
refactor cannot silently introduce a slow plan:
  * column pruning reaches the parquet scan (ReadSchema)
  * LWW maxstruct dedup does map-side partial aggregation (partial_max
    before the shuffle — the skew-proof property SURVEY.md §2.C relies on)
  * dimension joins broadcast
  * JVM-path queries contain no row-at-a-time Python eval
  * whole-stage codegen covers the hot stages

Plus the north-rule source audit: no per-row Python primitives anywhere in
the engine package (input_hint; SURVEY.md §7.4 'enforce by grep in CI').
"""

import os
import re

from pyspark.sql import functions as F

from embulk_output_databricks_spark.operators.lww import lww_dedup
from embulk_output_databricks_spark.queries import (
    q_pricing_summary,
    q_text_profile,
    q_top_revenue_orders,
)
from tests.conftest import SF001

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "embulk_output_databricks_spark")


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


class TestPlanQuality:
    def test_column_pruning_reaches_scan(self, spark):
        ev = spark.read.parquet(f"{SF001}/events.parquet")
        df = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        plan = _plan(df)
        m = re.search(r"ReadSchema: (.*)", plan)
        assert m, plan
        # only the grouped column is read, not value/props/ts/...
        assert "event_type" in m.group(1)
        assert "props" not in m.group(1) and "value" not in m.group(1)

    def test_filter_pushdown_reaches_scan(self, spark):
        ev = spark.read.parquet(f"{SF001}/events.parquet")
        df = ev.filter(F.col("user_id") == 7).select("event_id")
        plan = _plan(df)
        m = re.search(r"PushedFilters: \[(.*)\]", plan)
        assert m and "user_id" in m.group(1), plan

    def test_lww_maxstruct_has_mapside_combine(self, spark):
        ev = spark.read.parquet(f"{SF001}/events.parquet").select(
            "user_id", F.col("event_id").cast("long").alias("seq"), "event_type"
        )
        out = lww_dedup(ev, keys=["user_id"], order=["seq"], strategy="maxstruct")
        plan = _plan(out)
        # partial aggregate before the exchange = map-side combine
        assert "partial_max" in plan, plan
        # exactly one shuffle (each op appears once in tree + once in detail)
        assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan

    def test_lww_maxby_has_mapside_combine(self, spark):
        """Default strategy: partial_max_by pre-reduces hot keys per input
        partition; exactly one shuffle."""
        ev = spark.read.parquet(f"{SF001}/events.parquet").select(
            "user_id", F.col("event_id").cast("long").alias("seq"), "event_type"
        )
        out = lww_dedup(ev, keys=["user_id"], order=["seq"], strategy="maxby")
        plan = _plan(out)
        assert "partial_max_by" in plan, plan
        assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan

    def test_dimension_join_broadcasts(self, spark):
        plan = _plan(q_top_revenue_orders(spark, SF001))
        assert "BroadcastHashJoin" in plan, plan

    def test_no_python_eval_in_jvm_queries(self, spark):
        for q in (q_pricing_summary, q_text_profile):
            plan = _plan(q(spark, SF001))
            assert "BatchEvalPython" not in plan and "PythonUDF" not in plan, plan

    def test_wholestage_codegen_present(self, spark):
        df = q_pricing_summary(spark, SF001)
        df.collect()  # finalize the AQE plan so codegen ids are annotated
        plan = _plan(df)
        assert "codegen id" in plan, plan

    def test_kafka_parse_is_shuffle_free_projection(self, spark):
        """Wire-frame parse must pipeline into whatever follows: a pure
        from_json projection — zero exchanges, zero Python."""
        from embulk_output_databricks_spark.sources.kafka_tail import (
            encode_kafka_frame, parse_change_events)
        from embulk_output_databricks_spark.synth import synth_binlog

        frame = encode_kafka_frame(synth_binlog(spark, 100, 10, 100))
        # plan of parse applied to a materialized frame (parquet round-trip
        # stands in for the kafka scan)
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            frame.write.parquet(f"{d}/f")
            parsed = parse_change_events(spark.read.parquet(f"{d}/f"))
            plan = _plan(parsed)
            assert "Exchange" not in plan, plan
            assert "BatchEvalPython" not in plan and "PythonUDF" not in plan, plan

    def test_mor_read_resolution_single_shuffle(self, spark, tmp_path):
        """MOR read = base∪delta -> one maxby shuffle with map-side combine;
        a second exchange would mean the resolution re-shuffles the union."""
        from embulk_output_databricks_spark.config import JobConfig
        from embulk_output_databricks_spark.sources.laketable import LakeCatalog
        from embulk_output_databricks_spark.streaming.replay import ReplayDriver
        from embulk_output_databricks_spark.synth import synth_binlog

        drv = ReplayDriver(LakeCatalog(spark, str(tmp_path / "wh")),
                           JobConfig(mode="merge", merge_strategy="mor", n_buckets=4))
        drv.replay(synth_binlog(spark, 400, 30, 200))
        plan = _plan(drv.table.read())
        assert "partial_max_by" in plan, plan
        assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1, plan


class TestNoPerRowPython:
    """North-rule audit: the engine package must not use per-row Python.
    Allowed Python-side compute: pandas_udf / mapInPandas / applyInPandas
    (Arrow-batched). Forbidden: row-wise F.udf, RDD map/flatMap, driver-side
    toLocalIterator loops over data."""

    FORBIDDEN = [
        re.compile(r"\bF\.udf\("),
        re.compile(r"\budf\(\s*lambda"),
        re.compile(r"\.rdd\b"),
        re.compile(r"\.toLocalIterator\("),
        re.compile(r"\bUserDefinedFunction\b"),
    ]

    def test_no_forbidden_primitives(self):
        offenders = []
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                path = os.path.join(root, fn)
                with open(path) as f:
                    src = f.read()
                for pat in self.FORBIDDEN:
                    if pat.search(src):
                        offenders.append((path, pat.pattern))
        assert not offenders, offenders
