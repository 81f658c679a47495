"""Bytes-aware bin-packing (compact(target_file_bytes=...), Iceberg
rewrite_data_files target-size / Delta OPTIMIZE analog): victim buckets are
chosen by file SIZES — >=2 undersized files pack, an oversized file splits,
a bucket already at target is left alone — and rows_per_file derives from
the victims' observed bytes/row so rewritten files land near the target."""

from pyspark.sql import types as T

from embulk_output_databricks_spark.sources.laketable import (
    LakeCatalog, _live_data)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("payload", T.StringType()),
])


def _rows(spark, lo, n):
    # pseudo-random-ish payload so parquet compression can't flatten sizes
    data = [(i, f"{i * 2654435761 % 2**32:x}" * 16) for i in range(lo, lo + n)]
    return spark.createDataFrame(data, SCHEMA)


def _mk(spark, warehouse, appends, rows=200, properties=None):
    cat = LakeCatalog(spark, f"{warehouse}/bp")
    t = cat.create_table("t", SCHEMA, n_buckets=1, bucket_key="k",
                         properties=properties)
    for j in range(appends):
        t.append(_rows(spark, j * rows, rows))
    return t


def _live(t):
    return _live_data(t.manifest().files)


def test_pack_small_files(spark, warehouse):
    t = _mk(spark, warehouse, appends=4)
    assert len(_live(t)) == 4
    m = t.compact(target_file_bytes=64 * 1024 * 1024)
    assert m is not None
    fs = _live(t)
    assert len(fs) == 1
    assert sum(f["rows"] for f in fs) == 800
    assert t.read().count() == 800


def test_at_target_bucket_untouched(spark, warehouse):
    t = _mk(spark, warehouse, appends=2)
    b = max(f["bytes"] for f in _live(t))
    # both files within [3/4 target, 9/5 target]: nothing to gain
    assert t.compact(target_file_bytes=b) is None
    # count-based selection would have packed them
    assert t.compact(min_files_per_bucket=2) is not None


def test_split_oversized_file(spark, warehouse):
    t = _mk(spark, warehouse, appends=1, rows=4000)
    (f0,) = _live(t)
    target = f0["bytes"] // 4
    m = t.compact(target_file_bytes=target)
    assert m is not None
    fs = _live(t)
    assert len(fs) >= 3  # derived rows_per_file split the rewrite
    assert all(f["bytes"] < f0["bytes"] for f in fs)
    assert sum(f["rows"] for f in fs) == 4000
    assert t.read().count() == 4000


def test_property_driven_default(spark, warehouse):
    t = _mk(spark, warehouse, appends=0)
    t.append(_rows(spark, 0, 200))
    t.append(_rows(spark, 200, 200))
    b = max(f["bytes"] for f in _live(t))
    cat = LakeCatalog(spark, f"{warehouse}/bp2")
    t2 = cat.create_table("t2", SCHEMA, n_buckets=1, bucket_key="k",
                          properties={"target_file_bytes": str(b)})
    t2.append(_rows(spark, 0, 200))
    t2.append(_rows(spark, 200, 200))
    # plain compact() reads the table property: both files at target -> None
    assert t2.compact() is None
    # explicit argument overrides the property
    assert t2.compact(target_file_bytes=4 * b) is not None
    assert len(_live(t2)) == 1 and t2.read().count() == 400
