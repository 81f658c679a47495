"""Full-snapshot reconciliation (plans/merge.py snapshot_sync): the
`MERGE … WHEN NOT MATCHED BY SOURCE THEN DELETE` analog. Final state must
equal the source snapshot exactly, while the WRITE stays O(changed
buckets): identical rows are dropped from the plan by the null-safe
compare join, untouched buckets keep their exact files, kept rows keep
_row_id/_last_seq."""

import pytest
from pyspark.sql import functions as F, types as T

from embulk_output_databricks_spark.plans.merge import snapshot_sync
from embulk_output_databricks_spark.sources.laketable import (
    LakeCatalog, bucket_expr)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("toks", T.ArrayType(T.IntegerType())),
    T.StructField("v", T.StringType()),
])

N_BUCKETS = 8


def _base(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.sequence(F.lit(0), (F.col("id") % 5).cast("int")).alias("toks"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )


def _mk(spark, warehouse, tag):
    cat = LakeCatalog(spark, f"{warehouse}/{tag}")
    tbl = cat.create_table("t", SCHEMA, n_buckets=N_BUCKETS, bucket_key="k")
    tbl.append(_base(spark))
    return tbl


def _rows(df):
    return {r["k"]: (list(r["toks"]), r["v"]) for r in df.collect()}


@pytest.mark.parametrize("compare", ["exact", "hash"])
def test_final_state_equals_source(spark, warehouse, compare):
    """Deletes (k%7==0), updates (k%7==1, array AND scalar change),
    inserts (new key range), identical keeps — one commit, state == src.
    Both compare modes: exact full-width join and the O(keys)-shuffle
    hash compare."""
    tbl = _mk(spark, warehouse, f"state{compare}")
    base = _base(spark)
    src = (base.filter(F.col("k") % 7 != 0)
           .withColumn("toks", F.when(F.col("k") % 7 == 1,
                                      F.array(F.lit(99)))
                       .otherwise(F.col("toks")))
           .unionByName(_base(spark).filter(F.col("k") % 7 == 2)
                        .withColumn("k", F.col("k") + 100000)))
    snapshot_sync(tbl, src, keys=["k"], compare=compare)
    assert _rows(tbl.read()) == _rows(src)
    assert tbl.manifest().properties.get("operation") == "snapshot-sync"


def test_unchanged_buckets_keep_their_files(spark, warehouse):
    """Changes confined to bucket 0: every other bucket's files are
    byte-identical (same paths) after the sync — the O(changed buckets)
    write claim."""
    tbl = _mk(spark, warehouse, "prune")
    base = _base(spark)
    in_b0 = bucket_expr("k", N_BUCKETS) == 0
    src = base.withColumn(
        "v", F.when(in_b0, F.concat(F.col("v"), F.lit("!")))
        .otherwise(F.col("v")))
    before = {f["path"] for f in tbl.manifest().files}
    snapshot_sync(tbl, src, keys=["k"])
    after = {f["path"] for f in tbl.manifest().files}
    kept = before & after
    # at least the non-touched buckets' files survive untouched
    assert kept and before - after  # something kept, something swapped
    assert _rows(tbl.read()) == _rows(src)


@pytest.mark.parametrize("compare", ["exact", "hash"])
def test_identical_source_writes_nothing(spark, warehouse, compare):
    tbl = _mk(spark, warehouse, f"noop{compare}")
    before = {f["path"] for f in tbl.manifest().files}
    snapshot_sync(tbl, _base(spark), keys=["k"], compare=compare)
    assert {f["path"] for f in tbl.manifest().files} == before


def test_kept_rows_keep_lineage(spark, warehouse):
    """Unchanged rows survive with _row_id and _last_seq intact; updated
    rows keep identity but take the new commit's sequence."""
    tbl = _mk(spark, warehouse, "lineage")
    before = {r["k"]: (r["_row_id"], r["_last_seq"])
              for r in tbl.read(with_row_ids=True).collect()}
    src = _base(spark).withColumn(
        "v", F.when(F.col("k") == 3, F.lit("changed")).otherwise(F.col("v")))
    snapshot_sync(tbl, src, keys=["k"])
    after = {r["k"]: (r["_row_id"], r["_last_seq"])
             for r in tbl.read(with_row_ids=True).collect()}
    # rows outside the rewritten bucket are bit-identical in lineage
    same = [k for k in before if k != 3 and after[k] == before[k]]
    assert len(same) >= len(before) // 2
    assert after[3][0] == before[3][0]   # identity survives the update
    assert after[3][1] > before[3][1]    # recency moves to the new commit


def test_key_only_table(spark, warehouse):
    """No non-key payload: a matched key is by definition unchanged; the
    sync reduces to pure inserts + deletes."""
    cat = LakeCatalog(spark, f"{warehouse}/keys")
    sch = T.StructType([T.StructField("k", T.LongType())])
    tbl = cat.create_table("t", sch, n_buckets=4, bucket_key="k")
    tbl.append(spark.range(10).select(F.col("id").alias("k")))
    src = spark.range(5, 15).select(F.col("id").alias("k"))
    snapshot_sync(tbl, src, keys=["k"])
    assert sorted(r["k"] for r in tbl.read().collect()) == list(range(5, 15))


def test_rejects_unknown_keys(spark, warehouse):
    tbl = _mk(spark, warehouse, "badkeys")
    with pytest.raises(ValueError, match="merge keys"):
        snapshot_sync(tbl, _base(spark), keys=["nope"])
    with pytest.raises(ValueError, match="compare"):
        snapshot_sync(tbl, _base(spark), keys=["k"], compare="fuzzy")


@pytest.mark.parametrize("compare", ["exact", "hash"])
def test_map_payload_compares_via_json(spark, warehouse, compare):
    """Spark can neither order nor hash maps: both modes compare map
    columns through their JSON rendering (worst case a spurious rewrite,
    never a missed change) and converge to the source."""
    cat = LakeCatalog(spark, f"{warehouse}/maps")
    sch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("mp", T.MapType(T.StringType(), T.LongType())),
    ])
    tbl = cat.create_table("t", sch, n_buckets=2, bucket_key="k")
    base = spark.range(20).select(
        F.col("id").alias("k"),
        F.create_map(F.lit("a"), F.col("id")).alias("mp"))
    tbl.append(base)
    src = spark.range(5, 25).select(
        F.col("id").alias("k"),
        F.create_map(F.lit("a"), F.col("id") * 2).alias("mp"))
    snapshot_sync(tbl, src, keys=["k"], compare=compare)
    got = {r["k"]: dict(r["mp"]) for r in tbl.read().collect()}
    assert got == {i: {"a": i * 2} for i in range(5, 25)}
