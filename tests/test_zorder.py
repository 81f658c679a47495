"""Z-order clustering (functions/zorder.py + compact(cluster_mode="zorder")).

The Morton key must interleave quantized bits correctly (golden values),
and z-ordered compaction must turn per-file bounds into a MULTI-dimensional
index: pruning works on every clustered dimension, where lexicographic
cluster_by only prunes on the leading one. State is always preserved."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.functions.zorder import zorder_key
from embulk_output_databricks_spark.sources.laketable import (
    LakeCatalog,
    _stats_keep,
)

GRID = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
])


def test_morton_golden_values(spark):
    # bits=2 over bounds (0,3): quantization is the identity on 0..3
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x long, y long")
    z = {(r["x"], r["y"]): r["z"] for r in df.select(
        "x", "y",
        zorder_key({"x": (0, 3), "y": (0, 3)}, bits=2).alias("z")).collect()}
    # LSB-first interleave, x at bit 0: z = x0 + 2*y0 + 4*x1 + 8*y1
    assert z[(0, 0)] == 0
    assert z[(1, 0)] == 1
    assert z[(0, 1)] == 2
    assert z[(1, 1)] == 3
    assert z[(2, 2)] == 12
    assert z[(3, 3)] == 15
    assert z[(1, 2)] == 9


def test_nulls_and_clamping(spark):
    df = spark.createDataFrame([(None, 5), (100, 5), (-100, 5)], "x int, y int")
    vals = [r["z"] for r in df.select(
        zorder_key({"x": (0, 3), "y": (5, 5)}, bits=2).alias("z")).collect()]
    # NULL and below-lo quantize to 0; above-hi clamps to top (3)
    assert vals[0] == vals[2] == 0 + 0   # y degenerate bounds -> 0
    assert vals[1] == 1 + 4              # x=0b11 interleaved at bits 0,2


def test_zorder_key_validation():
    with pytest.raises(ValueError):
        zorder_key({})
    with pytest.raises(ValueError):
        zorder_key({c: (0, 1) for c in "abcde"}, bits=16)  # 80 bits


def _grid_table(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/z")
    t = cat.create_table("t", GRID, n_buckets=1, bucket_key="k")
    rows = [(f"k{x:02d}_{y:02d}", x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, GRID)
    t.append(df.filter("(x + y) % 2 = 0"))
    t.append(df.filter("(x + y) % 2 = 1"))
    return t


def _kept(t, col, lo, hi):
    m = t.manifest()
    return len(_stats_keep(m, m.files, {col: (lo, hi)})), len(m.files)


def test_zorder_prunes_both_dimensions(spark, warehouse):
    t = _grid_table(spark, warehouse)
    # unsorted parity appends: every file spans both full ranges
    for col in ("x", "y"):
        kept, total = _kept(t, col, 0, 7)
        assert kept == total
    before = sorted(tuple(r) for r in t.read().collect())
    assert t.compact(cluster_by=["x", "y"], rows_per_file=64,
                     cluster_mode="zorder") is not None
    for col in ("x", "y"):
        kept, total = _kept(t, col, 0, 7)
        assert total >= 8 and kept < total, f"no pruning on {col}"
    # exactness: stats_filter result == full-scan filter, state preserved
    got = sorted(tuple(r) for r in
                 t.read(stats_filter={"y": (0, 7)}).collect())
    assert got == [r for r in before if 0 <= r[2] <= 7]
    assert sorted(tuple(r) for r in t.read().collect()) == before


def test_lexicographic_sort_only_prunes_leading_dim(spark, warehouse):
    t = _grid_table(spark, warehouse)
    assert t.compact(cluster_by=["x", "y"], rows_per_file=64) is not None
    kept_x, total = _kept(t, "x", 0, 7)
    kept_y, _ = _kept(t, "y", 0, 7)
    assert kept_x < total          # leading dim: range index works
    assert kept_y == total         # trailing dim: every file spans full y


def test_unknown_cluster_mode_rejected(spark, warehouse):
    t = _grid_table(spark, warehouse)
    with pytest.raises(ValueError):
        t.compact(cluster_by=["x"], cluster_mode="hilbert")
