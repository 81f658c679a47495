"""Per-file KMV distinct-count sketches + LakeTable.analyze()
(sources/sketch.py — the Iceberg Puffin / ANALYZE analog). Contracts:
exact below k, bounded error above, merge(file sketches) bit-identical
to build(all values), harvest is O(files missing a sketch) and
persist=True makes the next analyze pure metadata, field-id resolution
survives renames, defaults of later-added columns count."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.sources import sketch
from embulk_output_databricks_spark.sources.laketable import LakeCatalog

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("cat", T.StringType()),
    T.StructField("v", T.LongType()),
    T.StructField("toks", T.ArrayType(T.IntegerType())),
])


def _rows(n, cats=5, vocab=100):
    return [(f"k{i:05d}", f"c{i % cats}", i, [i % vocab, (i * 7) % vocab])
            for i in range(n)]


def _mk(spark, warehouse, name, props=None):
    cat = LakeCatalog(spark, f"{warehouse}/ndv")
    return cat.create_table(name, SCHEMA, n_buckets=2, bucket_key="k",
                            properties=props)


def test_kmv_exact_below_k():
    est, exact = sketch.estimate(sketch.build(range(100)))
    assert (est, exact) == (100.0, True)
    # duplicates collapse; NULL handling is the caller's (harvest drops them)
    est, exact = sketch.estimate(sketch.build(["a", "b", "a", "b"]))
    assert (est, exact) == (2.0, True)


def test_kmv_bounded_error_above_k():
    vals = [f"x{i}" for i in range(20000)]
    est, exact = sketch.estimate(sketch.build(vals, k=256))
    assert not exact
    assert abs(est - 20000) / 20000 < 0.2  # stderr ~ 1/sqrt(k-2) ~ 6%


def test_kmv_merge_is_order_free_and_equals_global_build():
    vals = [f"x{i}" for i in range(5000)]
    chunks = [vals[i::4] for i in range(4)]
    parts = [sketch.build(c, k=256) for c in chunks]
    assert sketch.merge(parts, k=256) == sketch.build(vals, k=256)
    assert sketch.merge(reversed(parts), k=256) == sketch.build(vals, k=256)
    # overlapping inputs: union, not sum
    est, exact = sketch.estimate(
        sketch.merge([sketch.build(vals[:50]), sketch.build(vals[25:75])]))
    assert (est, exact) == (75.0, True)


def test_kmv_merge_degrades_to_smallest_truncated_k():
    vals = [f"x{i}" for i in range(5000)]
    small = sketch.build(vals, k=64)       # truncated hard
    big = sketch.build(vals[:3000], k=1024)  # truncated at 1024
    est, exact = sketch.estimate(sketch.merge([small, big], k=1024))
    assert not exact
    assert abs(est - 5000) / 5000 < 0.35   # k_eff=64 -> ~13% stderr


def test_analyze_writeside_harvest_exact(spark, warehouse):
    t = _mk(spark, warehouse, "a", {"ndv_columns": "cat,toks"})
    df = spark.createDataFrame(_rows(600), SCHEMA)
    for j in range(3):
        t.append(df.filter(F.col("v") % 3 == j))
    got = t.analyze()
    assert got["cat"] == {"ndv": 5, "exact": True,
                          "files_from_sketch": got["cat"]["files_from_sketch"],
                          "files_scanned": 0}
    assert got["cat"]["files_from_sketch"] == len(t.manifest().files)
    # array column: distinct ELEMENTS (vocabulary size), not array identities
    assert got["toks"]["ndv"] == 100 and got["toks"]["exact"]
    assert got["toks"]["files_scanned"] == 0


def test_analyze_scans_only_missing_then_persist(spark, warehouse):
    t = _mk(spark, warehouse, "b")  # no ndv property: nothing harvested
    df = spark.createDataFrame(_rows(400), SCHEMA)
    t.append(df.filter(F.col("v") < 200))
    n_pre = len(t.manifest().files)
    got = t.analyze(cols=["cat"])
    assert got["cat"]["ndv"] == 5 and got["cat"]["exact"]
    assert got["cat"]["files_scanned"] == n_pre  # all lacked sketches
    # not persisted: same files scan again
    assert t.analyze(cols=["cat"])["cat"]["files_scanned"] == n_pre
    t.analyze(cols=["cat"], persist=True)
    got = t.analyze(cols=["cat"])
    assert got["cat"] == {"ndv": 5, "exact": True,
                          "files_from_sketch": n_pre, "files_scanned": 0}
    # new files after set_ndv_columns carry sketches at write: analyze
    # stays zero-scan through appends
    t.set_ndv_columns(["cat"])
    t.append(df.filter(F.col("v") >= 200))
    got = t.analyze()
    assert got["cat"]["ndv"] == 5 and got["cat"]["files_scanned"] == 0
    # exact distinct matches Spark's own answer
    exact = t.read().select("cat").distinct().count()
    assert got["cat"]["ndv"] == exact


def test_analyze_survives_rename_and_counts_defaults(spark, warehouse):
    t = _mk(spark, warehouse, "c", {"ndv_columns": "cat"})
    t.append(spark.createDataFrame(_rows(100), SCHEMA))
    t.rename_column("cat", "category")
    got = t.analyze(cols=["category"])
    assert got["category"] == {"ndv": 5, "exact": True,
                               "files_from_sketch": got["category"]["files_from_sketch"],
                               "files_scanned": 0}
    # later-added column: pre-add files contribute the initial default
    t.add_column("tier", "string", default="std")
    evolved = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("v", T.LongType()),
        T.StructField("toks", T.ArrayType(T.IntegerType())),
        T.StructField("tier", T.StringType()),
    ])
    t.append(spark.createDataFrame(
        [(f"n{i}", "c9", 10_000 + i, [1], "pro" if i % 2 else "std")
         for i in range(10)], evolved))
    got = t.analyze(cols=["tier"])
    assert got["tier"]["ndv"] == 2 and got["tier"]["exact"]
    assert got["tier"]["ndv"] == t.read().select("tier").distinct().count()


def test_analyze_unsupported_and_unknown(spark, warehouse):
    t = _mk(spark, warehouse, "d")
    t.append(spark.createDataFrame(_rows(10), SCHEMA))
    with pytest.raises(ValueError, match="unknown"):
        t.analyze(cols=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        t.analyze()
    with pytest.raises(ValueError, match="not in schema"):
        t.set_ndv_columns(["nope"])


def test_compact_migrates_sketches(spark, warehouse):
    t = _mk(spark, warehouse, "e")
    t.append(spark.createDataFrame(_rows(200), SCHEMA))
    t.set_ndv_columns(["cat"])
    assert t.analyze()["cat"]["files_scanned"] > 0
    assert t.compact(min_files_per_bucket=1) is not None
    got = t.analyze()
    assert got["cat"]["files_scanned"] == 0
    assert got["cat"]["ndv"] == 5 and got["cat"]["exact"]


def test_maintain_fires_analyze_until_complete(spark, warehouse):
    t = _mk(spark, warehouse, "f")
    t.append(spark.createDataFrame(_rows(200), SCHEMA))
    t.set_ndv_columns(["cat"])
    rep = t.maintain(max_files_per_bucket=100)  # only the analyze leg fires
    assert rep["analyze"]["files_scanned"] > 0
    assert rep["analyze"]["ndv"] == {"cat": 5}
    # sketches persisted: the next pass is pure metadata, no action logged
    assert "analyze" not in t.maintain(max_files_per_bucket=100)


def test_set_ndv_rejects_unsketchable_types(spark, warehouse):
    # map/struct/timestamp columns cannot be KMV-hashed: reject at config
    # time instead of crashing every later maintain() (round-1 advice)
    cat = LakeCatalog(spark, f"{warehouse}/ndv")
    sch = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        T.StructField("ts", T.TimestampType()),
    ])
    t = cat.create_table("badtypes", sch, n_buckets=2, bucket_key="k")
    for col in ("m", "ts"):
        with pytest.raises(ValueError, match="unsketchable"):
            t.set_ndv_columns([col])
    t.set_ndv_columns(["k"])  # sketchable ones still fine


def test_analyze_and_maintain_skip_legacy_unsupported_column(spark, warehouse):
    # simulate a legacy table whose ndv_columns predate type validation:
    # analyze reports the column unsupported, maintain() notes it and
    # keeps running instead of raising on every pass
    cat = LakeCatalog(spark, f"{warehouse}/ndv")
    sch = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
    ])
    t = cat.create_table("legacy", sch, n_buckets=2, bucket_key="k")
    t.append(spark.createDataFrame([("a", {"x": 1}), ("b", {"y": 2})], sch))
    m = t.manifest()
    t._commit(m, m.files, {"ndv_columns": "k,m",
                           "operation": "legacy-ndv-config"})
    got = t.analyze()
    assert got["m"]["unsupported"] and got["m"]["ndv"] is None
    assert got["k"]["ndv"] == 2
    rep = t.maintain(max_files_per_bucket=100)
    assert rep["analyze"]["unsupported"] == ["m"]
    assert rep["analyze"]["ndv"] == {"k": 2}
    # second pass: k's sketches persisted, m still skipped, never raises
    rep2 = t.maintain(max_files_per_bucket=100)
    assert rep2.get("analyze", {}).get("unsupported") == ["m"]
