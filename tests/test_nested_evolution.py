"""Nested struct field evolution (Iceberg nested-field analog): add /
rename / widen / drop INSIDE a struct column, all metadata-only. Nested
ids are allocated at create/add time (_fields_with_ids); projection
resolves children by id (_project_field), so old files read renamed /
widened / defaulted children without a rewrite and NULL struct values
survive reconstruction. The reference rejects STRUCT columns outright
(TestDatabricksOutputPluginByUnsupported.java:99-117); token arrays
already forced this engine past that, and nested evolution completes
the family."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import merge_apply, merge_apply_mor
from embulk_output_databricks_spark.sources.laketable import (
    LakeCatalog,
    SchemaEvolutionError,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("meta", T.StructType([
        T.StructField("a", T.IntegerType()),
        T.StructField("b", T.StringType()),
        T.StructField("inner", T.StructType([
            T.StructField("x", T.IntegerType()),
        ])),
    ])),
])


def _mk(spark, warehouse, name="t"):
    cat = LakeCatalog(spark, f"{warehouse}/ne")
    t = cat.create_table(name, SCHEMA, n_buckets=2, bucket_key="k",
                         properties={"merge_keys": "k"})
    t.append(spark.createDataFrame(
        [(1, (10, "one", (7,))), (2, None), (3, (30, "three", None))],
        SCHEMA))
    return t


def test_create_allocates_nested_ids(spark, warehouse):
    t = _mk(spark, warehouse)
    m = t.manifest()
    assert m.next_field_id == 6  # k, meta, a, b, inner, x
    meta = next(f for f in m.schema_version.fields if f["name"] == "meta")
    assert [c["name"] for c in meta["fields"]] == ["a", "b", "inner"]
    assert meta["fields"][2]["fields"][0]["name"] == "x"


def test_nested_add_with_default_is_metadata_only(spark, warehouse):
    t = _mk(spark, warehouse)
    files0 = {f["path"] for f in t.manifest().files}
    t.add_column("meta.c", "double", default=1.5)
    assert {f["path"] for f in t.manifest().files} == files0  # zero rewrite
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert rows[1]["c"] == 1.5 and rows[2] is None  # NULL struct stays NULL
    # post-add writes carry the physical child
    t.append(spark.createDataFrame([(4, (40, "four", (9,), 4.5))],
                                   t.manifest().schema()))
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert rows[4]["c"] == 4.5 and rows[1]["c"] == 1.5


def test_nested_rename_and_widen_resolve_by_id(spark, warehouse):
    t = _mk(spark, warehouse)
    t.rename_column("meta.a", "alpha")
    t.widen_column("meta.alpha", "bigint")
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert rows[1]["alpha"] == 10 and rows[3]["alpha"] == 30
    sch = t.manifest().schema()
    meta_t = dict(zip(sch["meta"].dataType.names,
                      sch["meta"].dataType.fields))
    assert isinstance(meta_t["alpha"].dataType, T.LongType)
    # deep nesting: add inside inner, old rows read the default
    t.add_column("meta.inner.y", "string", default="dy")
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert rows[1]["inner"]["y"] == "dy"
    assert rows[3]["inner"] is None  # NULL inner struct stays NULL


def test_nested_drop_and_readd_never_resurrects(spark, warehouse):
    t = _mk(spark, warehouse)
    t.drop_column("meta.b")
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert "b" not in rows[1].asDict()
    # re-adding the same name allocates a FRESH id: old values stay dead
    t.add_column("meta.b", "string")
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert rows[1]["b"] is None


def test_merge_and_mor_across_nested_evolution(spark, warehouse):
    t = _mk(spark, warehouse)
    t.add_column("meta.c", "double", default=1.5)
    t.rename_column("meta.a", "alpha")
    sch = t.manifest().schema()
    merge_apply(t, spark.createDataFrame(
        [(1, (100, "ONE", (9,), 9.9)), (5, (50, "five", (5,), 5.5))], sch),
        ["k"])
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert rows[1]["alpha"] == 100 and rows[5]["c"] == 5.5
    assert rows[3]["alpha"] == 30 and rows[3]["c"] == 1.5
    merge_apply_mor(t, spark.createDataFrame(
        [(3, (300, "THREE", (3,), 3.3))], sch), ["k"])
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert rows[3]["alpha"] == 300
    t.compact_deltas()
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert rows[3]["alpha"] == 300 and rows[1]["alpha"] == 100


def test_compaction_migrates_old_nested_layout(spark, warehouse):
    t = _mk(spark, warehouse)
    t.rename_column("meta.a", "alpha")
    t.add_column("meta.c", "double", default=2.0)
    t.compact(cluster_by=["k"])  # forced rewrite migrates the layout
    m = t.manifest()
    assert all(f["sv"] == m.current_sv for f in m.files)
    rows = {r["k"]: r["meta"] for r in t.read().collect()}
    assert rows[1]["alpha"] == 10 and rows[1]["c"] == 2.0 and rows[2] is None


def test_nested_refusals(spark, warehouse):
    t = _mk(spark, warehouse)
    with pytest.raises(SchemaEvolutionError, match="already exists"):
        t.add_column("meta.a", "int")
    with pytest.raises(SchemaEvolutionError, match="no such"):
        t.rename_column("meta.zz", "y")
    with pytest.raises(SchemaEvolutionError, match="widen"):
        t.widen_column("meta.a", "string")
    with pytest.raises(SchemaEvolutionError, match="struct field"):
        t.widen_column("meta.inner", "bigint")
    with pytest.raises(SchemaEvolutionError):
        t.add_column("meta.a.z", "int")  # into a scalar
    with pytest.raises(SchemaEvolutionError, match="last field"):
        t.drop_column("meta.inner.x")
    # checks referencing the top column block nested rename/drop
    t.add_check("pos", "k >= 0 OR meta IS NULL")
    with pytest.raises(SchemaEvolutionError, match="check"):
        t.rename_column("meta.a", "alpha")
    with pytest.raises(SchemaEvolutionError, match="check"):
        t.drop_column("meta.b")


def test_array_struct_stays_opaque(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/arr")
    sch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("items", T.ArrayType(T.StructType([
            T.StructField("q", T.IntegerType()),
        ]))),
    ])
    t = cat.create_table("t", sch, n_buckets=1, bucket_key="k")
    t.append(spark.createDataFrame([(1, [(5,)])], sch))
    with pytest.raises(SchemaEvolutionError, match="not an evolvable"):
        t.add_column("items.r", "int")
    assert t.read().collect()[0]["items"][0]["q"] == 5


def test_nested_evolution_survives_export_and_diff(spark, warehouse):
    t = _mk(spark, warehouse)
    v0 = t.manifest().version
    t.rename_column("meta.a", "alpha")
    sch = t.manifest().schema()
    merge_apply(t, spark.createDataFrame([(1, (111, "u", (1,)))], sch), ["k"])
    d = t.diff(v0, keys=["k"])
    ops = {(r["k"]): r["__op"] for r in d.collect()}
    assert ops[1] == "U"
