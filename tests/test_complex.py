"""Complex-type payloads (struct / array / map) through the table format.

The reference rejects ARRAY/MAP/STRUCT outright — COPY INTO cannot cast
STRING to complex (TestDatabricksOutputPluginByUnsupported.java:33-119
asserts the exact server errors). Spark + parquet store nested types
natively, so the engine carries them through every path the scalar tests
pin: append, COW merge, MOR delta resolution, compaction rewrite, schema
evolution add, plain-parquet export.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.sources.laketable import LakeCatalog

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("addr", T.StructType([
        T.StructField("city", T.StringType()),
        T.StructField("zip", T.IntegerType())])),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("attrs", T.MapType(T.StringType(), T.DoubleType())),
])


def _df(spark, lo, hi, city="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.struct(F.lit(city).alias("city"),
                 F.pmod(F.col("id"), F.lit(100)).cast("int").alias("zip"))
        .alias("addr"),
        F.array(F.lit(city), F.format_string("t%d", F.col("id") % 3))
        .alias("tags"),
        F.create_map(F.lit("v"), (F.col("id") * 1.5)).alias("attrs"))


def _flat(df):
    return sorted(
        (r.doc_id, r.addr.city, r.addr.zip, tuple(r.tags), r.attrs["v"])
        for r in df.collect())


def _mk(spark, warehouse, **kw):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("cx", SCHEMA, n_buckets=4, bucket_key="doc_id",
                         **kw)
    t.append(_df(spark, 0, 200))
    return t


def test_cow_merge_carries_nested(spark, warehouse):
    t = _mk(spark, warehouse)
    merge_apply(t, _df(spark, 100, 300, city="b"), keys=["doc_id"])
    got = _flat(t.read())
    assert len(got) == 300
    assert got[50] == (50, "a", 50, ("a", "t2"), 75.0)
    assert got[150] == (150, "b", 50, ("b", "t0"), 225.0)


def test_mor_delta_resolves_nested(spark, warehouse):
    t = _mk(spark, warehouse, properties={"merge_keys": "doc_id"})
    upd = _df(spark, 0, 10, city="m").withColumn("__op", F.lit("U"))
    t.append_delta(upd, merge_keys=["doc_id"])
    got = _flat(t.read())
    assert got[0] == (0, "m", 0, ("m", "t0"), 0.0)
    assert got[10][1] == "a"


def test_compaction_rewrites_nested(spark, warehouse):
    t = _mk(spark, warehouse)
    t.append(_df(spark, 200, 400, city="c"))
    before = _flat(t.read())
    assert t.compact() is not None
    assert _flat(t.read()) == before


def test_evolution_add_nested_column(spark, warehouse):
    t = _mk(spark, warehouse)
    t.add_column("extra", "array<int>")
    t.append(_df(spark, 200, 210, city="d")
             .withColumn("extra", F.array(F.lit(1), F.lit(2))))
    rows = {r.doc_id: r.extra for r in t.read().collect()}
    assert rows[205] == [1, 2] and rows[5] is None


def test_export_carries_nested(spark, warehouse, tmp_path):
    t = _mk(spark, warehouse)
    t.delete_where({"doc_id": (0, 9)}, mode="mor")  # force a rewrite leg
    dest = str(tmp_path / "exp")
    rec = t.export_snapshot(dest)
    assert rec["rewritten_files"] > 0
    assert _flat(spark.read.parquet(dest)) == _flat(t.read())


def test_stats_ignore_nested_but_prune_scalars(spark, warehouse):
    t = _mk(spark, warehouse)
    t.append(_df(spark, 1000, 1200))
    # bounds on the scalar bucket key still prune; nested cols have no
    # footer bounds harvested (path_in_schema is addr.city, not addr)
    got = t.read(stats_filter={"doc_id": (1000, 1199)})
    assert got.count() == 200
    for f in t.manifest().files:
        assert "addr" not in f.get("stats", {})
        assert "tags" not in f.get("stats", {})
