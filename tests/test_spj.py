"""Storage-partitioned join (operators/spj.py): correctness vs the plain
shuffled join, zero-shuffle plan shape, nested payloads through the
Acero-side key/index join, and every eligibility gate falling back (or
raising) exactly when the manifest says the fast path is unsound.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.operators.spj import (
    bucket_join,
    spj_eligibility,
)
from embulk_output_databricks_spark.sources.laketable import LakeCatalog

L_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("tag", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
])
R_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("tag", T.StringType()),
    T.StructField("v", T.DoubleType()),
])


def _pair(spark, warehouse, n_buckets=4, rn_buckets=None, lrows=None,
          rrows=None):
    cat = LakeCatalog(spark, warehouse)
    left = cat.create_table("l", L_SCHEMA, n_buckets=n_buckets,
                            bucket_key="k")
    right = cat.create_table("r", R_SCHEMA,
                             n_buckets=rn_buckets or n_buckets,
                             bucket_key="k")
    if lrows is None:
        lrows = [(i, f"l{i}", [i, i + 1, i + 2]) for i in range(40)] + \
                [(None, "lnull", [0])]
    if rrows is None:
        # keys 20..59: half overlap; tags deliberately collide with left's
        rrows = [(i + 20, f"l{i}", float(i)) for i in range(40)] + \
                [(None, "rnull", -1.0)]
    left.append(spark.createDataFrame(lrows, L_SCHEMA))
    right.append(spark.createDataFrame(rrows, R_SCHEMA))
    return left, right


def _reference(left, right, how):
    lf = left.read()
    rf = right.read().withColumnRenamed("tag", "tag_r")
    return lf.join(rf, on="k", how=how)


def _rows(df):
    return sorted(
        (tuple(r[c] if not isinstance(r[c], list) else tuple(r[c])
               for c in sorted(df.columns)) for r in df.collect()),
        key=repr)


@pytest.mark.parametrize("how", ["inner", "left", "full"])
def test_matches_shuffled_join(spark, warehouse, how):
    left, right = _pair(spark, warehouse)
    assert spj_eligibility(left, "k") is None
    assert spj_eligibility(right, "k") is None
    got = bucket_join(left, right, on="k", how=how, fallback=False)
    want = _reference(left, right, how)
    assert sorted(got.columns) == sorted(want.columns)
    assert _rows(got) == _rows(want)


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_existence_joins_match_shuffled(spark, warehouse, how):
    left, right = _pair(spark, warehouse)
    got = bucket_join(left, right, on="k", how=how, fallback=False)
    want = left.read().join(right.read().select("k"), on="k",
                            how="left_" + how)
    assert got.columns == left.read().columns
    assert _rows(got) == _rows(want)
    # anti keeps the null-key left row (matches nothing); semi drops it
    nulls = got.filter(F.col("k").isNull()).count()
    assert nulls == (1 if how == "anti" else 0)
    fresh = bucket_join(left, right, on="k", how=how, fallback=False)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and plan.count("Exchange") == 1, plan


def test_existence_rejects_right_projection(spark, warehouse):
    left, right = _pair(spark, warehouse)
    with pytest.raises(ValueError, match="left rows only"):
        bucket_join(left, right, on="k", how="semi", right_columns=["v"])


def test_anti_passes_through_right_empty_bucket(spark, warehouse):
    # right holds a single key -> most buckets have no right files; anti
    # must still emit those buckets' left rows (rpaths == [])
    rrows = [(7, "only", 7.0)]
    left, right = _pair(spark, warehouse, rrows=rrows)
    got = bucket_join(left, right, on="k", how="anti", fallback=False)
    assert got.count() == 40  # 41 left rows minus the k=7 match
    assert got.filter(F.col("k") == 7).count() == 0


def test_null_keys_match_nothing(spark, warehouse):
    left, right = _pair(spark, warehouse)
    inner = bucket_join(left, right, on="k", fallback=False)
    assert inner.filter(F.col("k").isNull()).count() == 0
    full = bucket_join(left, right, on="k", how="full", fallback=False)
    # both null rows survive a full join, unmatched
    assert full.filter(F.col("k").isNull()).count() == 2


def test_nested_payload_survives(spark, warehouse):
    left, right = _pair(spark, warehouse)
    got = bucket_join(left, right, on="k", fallback=False,
                      left_columns=["tokens"], right_columns=["v"])
    want = {(r["k"], r["v"]): r["tokens"] for r in
            _reference(left, right, "inner")
            .select("k", "v", "tokens").collect()}
    out = {(r["k"], r["v"]): r["tokens"] for r in got.collect()}
    assert out == want and any(len(t) == 3 for t in out.values())


def test_single_metadata_exchange_no_join_node(spark, warehouse):
    left, right = _pair(spark, warehouse)
    out = bucket_join(left, right, on="k", fallback=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, f"{bad} leaked into SPJ plan:\n{plan}"
    # the only Exchange is the round-robin of n_buckets metadata rows
    assert plan.count("Exchange") == 1, plan
    assert "roundrobin" in plan.lower(), plan


def test_projection_and_suffix(spark, warehouse):
    left, right = _pair(spark, warehouse)
    got = bucket_join(left, right, on="k", fallback=False,
                      left_columns=["tag"], right_columns=["tag", "v"])
    assert got.columns == ["k", "tag", "tag_r", "v"]
    with pytest.raises(ValueError, match="unknown columns"):
        bucket_join(left, right, on="k", left_columns=["nope"])


def test_bucket_count_mismatch_raises(spark, warehouse):
    left, right = _pair(spark, warehouse, rn_buckets=8)
    with pytest.raises(ValueError, match="bucket count mismatch"):
        bucket_join(left, right, on="k", fallback=False)


def test_wrong_key_falls_back_correctly(spark, warehouse):
    left, right = _pair(spark, warehouse)
    assert "bucketed on" in spj_eligibility(left, "tag")
    with pytest.raises(ValueError, match="fast path unavailable"):
        bucket_join(left, right, on="tag", fallback=False)
    got = bucket_join(left, right, on="tag")  # fallback path
    assert got.count() == 40  # right tags l0..l39 all hit left's
    assert "k_r" in got.columns  # collision suffix applied in fallback too


def test_mor_and_sidecar_state_disqualify(spark, warehouse):
    left, right = _pair(spark, warehouse)
    right.append_delta(
        spark.createDataFrame([(20, "upd", 99.0)], R_SCHEMA),
        merge_keys=["k"])
    assert "MOR delta" in spj_eligibility(right, "k")
    # fallback resolves the delta winner like any read
    got = bucket_join(left, right, on="k")
    r20 = got.filter(F.col("k") == 20).select("tag_r", "v").collect()
    assert {(r["tag_r"], r["v"]) for r in r20} == {("upd", 99.0)}

    left.delete_where({"k": (20, 25)}, mode="mor")
    assert "delete sidecars" in spj_eligibility(left, "k")
    # force every maintenance action so both fast paths are restored
    left.maintain(max_files_per_bucket=0, max_delta_files=0,
                  max_posdel_files=0)
    right.maintain(max_files_per_bucket=0, max_delta_files=0,
                   max_posdel_files=0)
    assert spj_eligibility(left, "k") is None
    assert spj_eligibility(right, "k") is None
    fast = bucket_join(left, right, on="k", fallback=False)
    assert fast.filter(F.col("k").between(20, 25)).count() == 0
    assert {(r["tag_r"], r["v"]) for r in
            fast.filter(F.col("k") == 26).select("tag_r", "v").collect()
            } == {("l6", 6.0)}


def test_schema_evolution_disqualifies_until_compact(spark, warehouse):
    left, right = _pair(spark, warehouse)
    left.add_column("extra", "int", default=7)
    assert "old schema versions" in spj_eligibility(left, "k")
    got = bucket_join(left, right, on="k")  # fallback, default visible
    assert got.filter(F.col("extra") != 7).count() == 0
    left.compact(min_files_per_bucket=1)
    assert spj_eligibility(left, "k") is None
    fast = bucket_join(left, right, on="k", fallback=False)
    assert fast.filter(F.col("extra") != 7).count() == 0
    assert _rows(fast) == _rows(got)


# ---------------------------------------------------------------- bucket_agg

def _agg_pair(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("a", L_SCHEMA, n_buckets=4, bucket_key="k")
    rows = [(i % 13, f"t{i % 3}", [i]) for i in range(60)] + \
           [(None, "tnull", [0]), (None, None, [1])]
    t.append(spark.createDataFrame(rows, L_SCHEMA))
    return t


AGGS = {
    "n": ("*", "count"),
    "n_tags": ("tag", "count"),
    "d_tags": ("tag", "count_distinct"),
    "min_tag": ("tag", "min"),
    "max_tag": ("tag", "max"),
}


def test_bucket_agg_matches_shuffled(spark, warehouse):
    from embulk_output_databricks_spark.operators.spj import bucket_agg

    t = _agg_pair(spark, warehouse)
    got = bucket_agg(t, ["k"], AGGS, fallback=False)
    want = t.read().groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.count("tag").alias("n_tags"),
        F.countDistinct("tag").alias("d_tags"),
        F.min("tag").alias("min_tag"), F.max("tag").alias("max_tag"))
    assert got.columns == ["k", "n", "n_tags", "d_tags", "min_tag",
                           "max_tag"]
    assert dict(zip(got.columns, [f.dataType for f in got.schema])) == \
        dict(zip(want.columns, [f.dataType for f in want.schema]))
    assert _rows(got) == _rows(want)
    # null key forms a group; count skips its null tag, count(*) doesn't
    nk = got.filter(F.col("k").isNull()).collect()
    assert len(nk) == 1 and nk[0]["n"] == 2 and nk[0]["n_tags"] == 1
    fresh = bucket_agg(t, ["k"], AGGS, fallback=False)
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan and plan.count("Exchange") == 1, plan
    assert "HashAggregate" not in plan, plan


def test_bucket_agg_composite_keys_and_sum_types(spark, warehouse):
    from embulk_output_databricks_spark.operators.spj import bucket_agg

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("i", T.IntegerType()),
        T.StructField("x", T.DoubleType()),
    ])
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("c", schema, n_buckets=4, bucket_key="k")
    rows = [(i % 7, f"g{i % 2}", i, i / 4) for i in range(40)]
    t.append(spark.createDataFrame(rows, schema))
    aggs = {"si": ("i", "sum"), "sx": ("x", "sum"), "mx": ("x", "mean"),
            "mi": ("i", "min")}
    got = bucket_agg(t, ["k", "grp"], aggs, fallback=False)
    want = t.read().groupBy("k", "grp").agg(
        F.sum("i").alias("si"), F.sum("x").alias("sx"),
        F.avg("x").alias("mx"), F.min("i").alias("mi"))
    # sum(int)->long, mean->double, min(int)->int: identical to Spark
    assert got.schema == want.schema
    assert _rows(got) == _rows(want)


def test_bucket_agg_fallback_and_validation(spark, warehouse):
    from embulk_output_databricks_spark.operators.spj import bucket_agg

    t = _agg_pair(spark, warehouse)
    # grouping keys without the bucket key -> not bucket-local
    with pytest.raises(ValueError, match="do not include bucket key"):
        bucket_agg(t, ["tag"], {"n": ("*", "count")}, fallback=False)
    got = bucket_agg(t, ["tag"], {"n": ("*", "count")})  # shuffled fallback
    want = t.read().groupBy("tag").agg(F.count(F.lit(1)).alias("n"))
    assert _rows(got) == _rows(want)
    with pytest.raises(ValueError, match="unknown column"):
        bucket_agg(t, ["k"], {"n": ("nope", "sum")})
    with pytest.raises(ValueError, match="collides with a key"):
        bucket_agg(t, ["k"], {"k": ("tag", "count")})
    with pytest.raises(ValueError, match="'\\*' only combines"):
        bucket_agg(t, ["k"], {"n": ("*", "sum")})


def test_bucket_agg_mor_state_falls_back_correctly(spark, warehouse):
    from embulk_output_databricks_spark.operators.spj import bucket_agg

    t = _agg_pair(spark, warehouse)
    t.delete_where({"k": (0, 5)}, mode="mor")
    got = bucket_agg(t, ["k"], {"n": ("*", "count")})
    assert got.filter(F.col("k") <= 5).count() == 0
    with pytest.raises(ValueError, match="fast path unavailable"):
        bucket_agg(t, ["k"], {"n": ("*", "count")}, fallback=False)
    t.maintain(max_files_per_bucket=0, max_delta_files=0,
               max_posdel_files=0)
    fast = bucket_agg(t, ["k"], {"n": ("*", "count")}, fallback=False)
    assert _rows(fast) == _rows(got)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_split_rows_skew_valve(spark, warehouse, how):
    # one bucket, two left files: the hot-bucket split must fan the join
    # out to one task per chunk while emitting the identical disjoint
    # union of rows
    cat = LakeCatalog(spark, warehouse)
    left = cat.create_table("l", L_SCHEMA, n_buckets=1, bucket_key="k")
    right = cat.create_table("r", R_SCHEMA, n_buckets=1, bucket_key="k")
    left.append(spark.createDataFrame(
        [(i, f"l{i}", [i]) for i in range(20)], L_SCHEMA))
    left.append(spark.createDataFrame(
        [(i, f"l{i}", [i]) for i in range(20, 40)], L_SCHEMA))
    right.append(spark.createDataFrame(
        [(i * 2, "r", float(i)) for i in range(15)], R_SCHEMA))
    kw = dict(on="k", how=how, fallback=False)
    split = bucket_join(left, right, split_rows=1, **kw)
    whole = bucket_join(left, right, **kw)
    assert split.rdd.getNumPartitions() == 2  # one task per left file
    assert whole.rdd.getNumPartitions() == 1
    assert _rows(split) == _rows(whole)


def test_full_join_never_splits(spark, warehouse):
    left, right = _pair(spark, warehouse)
    left.append(spark.createDataFrame([(100, "x", [1])], L_SCHEMA))
    split = bucket_join(left, right, on="k", how="full", fallback=False,
                        split_rows=1)
    whole = bucket_join(left, right, on="k", how="full", fallback=False)
    assert split.rdd.getNumPartitions() == whole.rdd.getNumPartitions()
    assert _rows(split) == _rows(whole)


def test_zero_shuffle_derived_pipeline_write_back(spark, warehouse):
    """read -> bucket_agg -> append(bucket_local=True): the rollup lands
    in a co-bucketed derived table with ONE file per bucket and no
    write-side shuffle — the end-to-end derived-table maintenance path
    moves no data at any stage."""
    from embulk_output_databricks_spark.operators.spj import bucket_agg
    from embulk_output_databricks_spark.sources.laketable import _live_data

    t = _agg_pair(spark, warehouse)
    rollup = bucket_agg(t, ["k"], AGGS, fallback=False)
    dst_schema = T.StructType([
        T.StructField("k", T.LongType()),
        *[T.StructField(n, d, True) for n, d in
          zip(rollup.columns[1:], [f.dataType for f in rollup.schema][1:])],
    ])
    cat = LakeCatalog(spark, warehouse + "/derived")
    dst = cat.create_table("rollup", dst_schema, n_buckets=4,
                           bucket_key="k")
    dst.append(rollup, bucket_local=True)
    got = dst.read()
    want = bucket_agg(t, ["k"], AGGS, fallback=False)
    assert _rows(got) == _rows(want)
    files = _live_data(dst.manifest().files)
    # bucket-pure tasks -> exactly one file per non-empty bucket (a
    # shuffle-skipping write from impure partitions would fan out to
    # up to tasks x buckets files)
    per_bucket = {}
    for f in files:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert per_bucket and all(n == 1 for n in per_bucket.values()), per_bucket
    # null grouping key hashes into some bucket like any value; spot-check
    assert got.filter(F.col("k").isNull()).count() == 1
