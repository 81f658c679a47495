"""scan_stats: EXPLAIN for the manifest-level scan plan — what read()
would open and why, zero data IO. Mirrors read()'s selection (bucket
split, lineage floor, MOR clean/dirty, bounds then bloom) so the numbers
are the plan, not an estimate."""

from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import merge_apply_mor
from embulk_output_databricks_spark.sources.laketable import LakeCatalog

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _mk(spark, warehouse, n_buckets=2, props=None, slices=4):
    cat = LakeCatalog(spark, f"{warehouse}/ss")
    p = {"merge_keys": "k"}
    p.update(props or {})
    t = cat.create_table("t", SCHEMA, n_buckets=n_buckets, bucket_key="k",
                         properties=p)
    for j in range(slices):
        lo = j * 100
        t.append(spark.createDataFrame(
            [(i, f"v{i}") for i in range(lo, lo + 100)], SCHEMA))
    return t


def test_bounds_and_bytes_accounting(spark, warehouse):
    t = _mk(spark, warehouse)
    s = t.scan_stats()
    assert s["files_live"] == s["files_read"] == 8
    assert s["rows_live"] == s["rows_read"] == 400
    assert s["bytes_live"] == s["bytes_read"] > 0
    assert s["bytes_unknown_files"] == 0
    # one slice's band: 6 of 8 files pruned by bounds
    s = t.scan_stats(stats_filter={"k": (100, 199)})
    assert s["pruned_bounds"] == 6 and s["files_read"] == 2
    assert s["rows_read"] == 100 and s["bytes_read"] < s["bytes_live"]
    # the plan matches the actual read
    assert t.read(stats_filter={"k": (100, 199)}).count() == 100


def test_bucket_and_bloom_accounting(spark, warehouse):
    t = _mk(spark, warehouse, props={"bloom_columns": "v"})
    s = t.scan_stats(buckets={0})
    assert s["pruned_bucket"] > 0
    assert s["files_read"] + s["pruned_bucket"] == s["files_live"]
    # bloom: lookup value exists in exactly one slice file per bucket
    s = t.scan_stats(eq_filter={"v": "v250"})
    assert s["pruned_bloom"] >= 6 and s["files_read"] <= 2
    assert {r["k"] for r in t.read(eq_filter={"v": "v250"}).collect()} == {250}


def test_mor_and_lineage_accounting(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1)
    v_seed = t.manifest().version
    merge_apply_mor(t, spark.createDataFrame([(5, "M5")], SCHEMA), ["k"])
    s = t.scan_stats()
    # bounds-refined MOR split: only the 0..99 file pays resolution
    assert s["delta_files"] == 1 and s["mor_dirty_files"] == 1
    assert s["files_read"] == 5  # 3 clean + 1 dirty + 1 delta
    # lineage floor: only files committed after v_seed qualify (+ deltas)
    s = t.scan_stats(min_commit_seq=v_seed)
    assert s["pruned_lineage"] == 4 and s["files_read"] == 1
