"""agg_push: metadata-accelerated COUNT/MIN/MAX (Iceberg aggregate-pushdown
analog). The answer must be EXACT under every table state — clean appends
answer from manifest stats alone; anything the metadata cannot prove
(boundary files, null-count unknowns, string bounds, delete sidecars,
MOR-dirty buckets) falls back to scanning exactly those files."""

import pyspark.sql.functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import merge_apply_mor
from embulk_output_databricks_spark.sources.laketable import LakeCatalog

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("val", T.DoubleType()),
    T.StructField("name", T.StringType()),
])

AGGS = [("count", "*"), ("count", "val"), ("min", "k"), ("max", "k"),
        ("min", "val"), ("max", "val")]


def _mk(spark, warehouse, slices=4, rows=100, with_nulls=False, n_buckets=2):
    cat = LakeCatalog(spark, f"{warehouse}/ap")
    t = cat.create_table("t", SCHEMA, n_buckets=n_buckets, bucket_key="k",
                         properties={"merge_keys": "k"})
    for j in range(slices):
        lo = j * rows
        data = [(i,
                 None if (with_nulls and i % 7 == 0) else float(i) * 1.5,
                 f"n{i:05d}")
                for i in range(lo, lo + rows)]
        t.append(spark.createDataFrame(data, SCHEMA))
    return t


def _oracle(t, pred=None):
    df = t.read()
    if pred:
        for c, (lo, hi) in pred.items():
            if lo is not None:
                df = df.filter(F.col(c) >= lo)
            if hi is not None:
                df = df.filter(F.col(c) <= hi)
    r = df.agg(F.count(F.lit(1)), F.count("val"), F.min("k"), F.max("k"),
               F.min("val"), F.max("val")).first()
    return {"count_star": r[0], "count_val": r[1], "min_k": r[2],
            "max_k": r[3], "min_val": r[4], "max_val": r[5]}


def _check(t, pred=None, aggs=AGGS):
    got = t.agg_push(aggs, pred=pred)
    want = _oracle(t, pred)
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    return got


def test_clean_appends_pure_metadata(spark, warehouse):
    t = _mk(spark, warehouse)
    got = _check(t)
    # every live file answered from metadata, zero IO
    assert got["files"]["metadata"] == got["files"]["live"] == 8
    assert got["files"]["scanned"] == 0


def test_band_predicate_prunes_and_scans_boundaries(spark, warehouse):
    t = _mk(spark, warehouse)  # slices 0-99,100-199,200-299,300-399 per bucket
    got = _check(t, pred={"k": (150, 249)})
    # slice 0 and 3 pruned outright; 1 and 2 straddle -> scanned
    assert got["files"]["pruned"] == 4
    assert got["files"]["scanned"] == 4
    got = _check(t, pred={"k": (100, 199)})  # exactly slice 1: covered whole
    assert got["files"]["metadata"] >= 2 and got["files"]["pruned"] == 6


def test_null_counts_force_scan_but_stay_exact(spark, warehouse):
    t = _mk(spark, warehouse, with_nulls=True)
    got = _check(t)
    # count(val) can't be proven from metadata (nulls present) -> scan
    assert got["files"]["scanned"] == got["files"]["live"]
    assert got["count_val"] < got["count_star"]


def test_string_min_max_scans(spark, warehouse):
    t = _mk(spark, warehouse)
    got = t.agg_push([("min", "name"), ("max", "name")])
    assert got["min_name"] == "n00000" and got["max_name"] == "n00399"
    assert got["files"]["scanned"] == got["files"]["live"]  # truncation risk


def test_delete_sidecars_stay_exact(spark, warehouse):
    t = _mk(spark, warehouse)
    t.delete_where({"k": (0, 9)}, mode="mor")  # posdel sidecar
    t.delete_keys(spark.createDataFrame([(399,)], "k long"))  # eqdel sidecar
    got = _check(t)
    assert got["count_star"] == 400 - 10 - 1
    assert got["files"]["scanned"] >= 1  # targeted files read, rest metadata
    _check(t, pred={"k": (0, 49)})


def test_mor_dirty_buckets_resolve(spark, warehouse):
    t = _mk(spark, warehouse)
    # delta upsert: k=5 changes val (shadow, not add), k=1000 is new
    merge_apply_mor(t, spark.createDataFrame(
        [(5, 999.0, "upd"), (1000, 1.0, "new")], SCHEMA), ["k"])
    got = _check(t)
    assert got["count_star"] == 401
    assert got["max_val"] == 999.0
    _check(t, pred={"k": (0, 10)})


def test_pre_add_default_column_is_metadata_only(spark, warehouse):
    t = _mk(spark, warehouse, slices=2)
    t.add_column("score", "int", default=7)
    got = t.agg_push([("count", "score"), ("min", "score"), ("max", "score"),
                      ("count", "*")])
    assert got["count_score"] == got["count_star"] == 200
    assert got["min_score"] == 7 and got["max_score"] == 7
    assert got["files"]["scanned"] == 0
    t.add_column("note", "string")  # no default: all-NULL
    got = t.agg_push([("count", "note"), ("min", "note")])
    assert got["count_note"] == 0 and got["min_note"] is None
    assert got["files"]["scanned"] == 0


def test_rename_resolves_by_field_id(spark, warehouse):
    t = _mk(spark, warehouse, slices=2)
    t.rename_column("k", "key_id")
    got = t.agg_push([("min", "key_id"), ("max", "key_id")],
                     pred={"key_id": (50, 149)})
    assert got["min_key_id"] == 50 and got["max_key_id"] == 149


def test_validation_errors(spark, warehouse):
    t = _mk(spark, warehouse, slices=1)
    for bad in ([("sum", "k")], [("min", "*")]):
        try:
            t.agg_push(bad)
            raise AssertionError("accepted bad agg")
        except ValueError:
            pass
    try:
        t.agg_push([("count", "nope")])
        raise AssertionError("accepted unknown column")
    except ValueError:
        pass
