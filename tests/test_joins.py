"""As-of join, banded range join, connected components, snapshot diff.

Mirrors the reference's golden-expectation style (SURVEY §5.1: exact
expected outputs on handcrafted inputs) for the operators the reference
lacks entirely (SURVEY §2.C); the sf-scale parity with DuckDB is covered
by the driver gate via queries.py.
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.operators.dedupe import neardup_components
from embulk_output_databricks_spark.operators.joins import (
    asof_join,
    range_join_banded,
)


def _left(spark):
    return spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 50, "c"), (3, 10, "d")],
        "k bigint, t bigint, tag string",
    )


def _right(spark):
    return spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 15.0), (2, 49, 4.9), (9, 1, 0.1)],
        "k bigint, t bigint, v double",
    )


def test_asof_strict_excludes_equal_ts(spark):
    out = asof_join(_left(spark), _right(spark), key="k", ts="t",
                    right_payload=["t", "v"], strict=True)
    got = {r["tag"]: (r["prior_t"], r["prior_v"]) for r in out.collect()}
    assert got == {
        "a": (None, None),        # right@100 is equal-ts -> excluded
        "b": (150, 15.0),         # latest of {100,150}
        "c": (49, 4.9),
        "d": (None, None),        # key 3 has no right rows at all
    }


def test_asof_nonstrict_includes_equal_ts(spark):
    out = asof_join(_left(spark), _right(spark), key="k", ts="t",
                    right_payload=["t", "v"], strict=False)
    got = {r["tag"]: r["prior_t"] for r in out.collect()}
    assert got == {"a": 100, "b": 150, "c": 49, "d": None}


def test_asof_preserves_left_rowcount(spark):
    l, r = _left(spark), _right(spark)
    assert asof_join(l, r, "k", "t", ["v"]).count() == l.count()


def test_range_join_matches_naive_theta_join(spark):
    import random

    rng = random.Random(7)
    pts = spark.createDataFrame(
        [(rng.randrange(3), rng.randrange(1000), i) for i in range(300)],
        "k bigint, t bigint, pid bigint",
    )
    ivs = spark.createDataFrame(
        [
            (k, lo, lo + ln, 100 * k + j)
            for k in range(3)
            for j, (lo, ln) in enumerate(
                (rng.randrange(1000), rng.randrange(1, 400)) for _ in range(10)
            )
        ],
        "k bigint, lo bigint, hi bigint, iid bigint",
    )
    banded = range_join_banded(pts, ivs, key="k", point_ts="t",
                               lo="lo", hi="hi", band_width=64)
    naive = pts.join(ivs, "k").filter(
        (F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
    expect = {(r["pid"], r["iid"]) for r in naive.collect()}
    got = [(r["pid"], r["iid"]) for r in banded.collect()]
    assert len(got) == len(set(got)), "banding must not duplicate matches"
    assert set(got) == expect


def test_range_join_interval_spanning_many_bands(spark):
    pts = spark.createDataFrame([(1, t, t) for t in range(0, 1000, 37)],
                                "k bigint, t bigint, pid bigint")
    ivs = spark.createDataFrame([(1, 10, 990, 1)],
                                "k bigint, lo bigint, hi bigint, iid bigint")
    out = range_join_banded(pts, ivs, "k", "t", "lo", "hi", band_width=50)
    assert out.count() == sum(1 for t in range(0, 1000, 37) if 10 <= t < 990)


def _components(spark, edges, verts):
    e = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    v = spark.createDataFrame([(x,) for x in verts], "doc_id bigint")
    out = neardup_components(e, v)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_components_chain_triangle_singleton(spark):
    # chain 1-2-3-4, triangle 10-11-12 (+redundant edge), singleton 99
    got = _components(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        [1, 2, 3, 4, 10, 11, 12, 99],
    )
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_components_long_chain_converges_logarithmically(spark):
    # pointer jumping must close a 40-hop chain well inside max_rounds
    n = 40
    got = _components(spark, [(i, i + 1) for i in range(n)], list(range(n + 1)))
    assert set(got.values()) == {0}


def test_laketable_diff_classifies_iud(spark, warehouse):
    from embulk_output_databricks_spark.plans.merge import merge_apply
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    cat = LakeCatalog(spark, warehouse)
    tbl = cat.create_table("t", schema, n_buckets=4, bucket_key="k")
    tbl.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema))
    v1 = tbl.current_version()
    staged = spark.createDataFrame(
        [(2, "B", "U"), (3, "c", "D"), (4, "d", "U")], "k bigint, v string, op string")
    merge_apply(tbl, staged, keys=["k"], support_deletes=True)
    got = {r["k"]: (r["__op"], r["v"]) for r in tbl.diff(v1, keys=["k"]).collect()}
    # k=1 unchanged -> absent; k=2 updated; k=3 deleted (old value); k=4 new
    assert got == {2: ("U", "B"), 3: ("D", "c"), 4: ("I", "d")}


def test_laketable_diff_across_schema_evolution(spark, warehouse):
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    cat = LakeCatalog(spark, warehouse)
    tbl = cat.create_table("t", schema, n_buckets=2, bucket_key="k")
    tbl.append(spark.createDataFrame([(1, "a")], schema))
    v1 = tbl.current_version()
    tbl.add_column("extra", "long")
    new = T.StructType(schema.fields + [T.StructField("extra", T.LongType())])
    tbl.append(spark.createDataFrame([(2, "b", 7)], new))
    got = {r["k"]: (r["__op"], r["extra"]) for r in tbl.diff(v1, keys=["k"]).collect()}
    # old row reads NULL for the added col on BOTH sides -> no spurious 'U'
    assert got == {2: ("I", 7)}


def test_asof_bucketed_matches_plain_asof(spark):
    import random

    from embulk_output_databricks_spark.operators.joins import (
        asof_join_bucketed,
    )

    rng = random.Random(11)
    # unique (k, t) on the right for determinism; left-only buckets and a
    # hot key (k=0 gets 10x the rows) both exercised
    right_rows = {(rng.randrange(4), rng.randrange(5000)) for _ in range(300)}
    left_rows = [(0 if i % 2 == 0 else rng.randrange(4),
                  rng.randrange(5000), i) for i in range(400)]
    r = spark.createDataFrame(
        [(k, t, float(t)) for k, t in right_rows], "k bigint, t bigint, v double")
    l = spark.createDataFrame(left_rows, "k bigint, t bigint, pid bigint")
    for strict in (True, False):
        a = asof_join(l, r, "k", "t", ["t", "v"], strict=strict)
        b = asof_join_bucketed(l, r, "k", "t", ["t", "v"], bucket_width=100,
                               strict=strict)
        ra = {r_["pid"]: (r_["prior_t"], r_["prior_v"]) for r_ in a.collect()}
        rb = {r_["pid"]: (r_["prior_t"], r_["prior_v"]) for r_ in b.collect()}
        assert ra == rb


def test_asof_bucketed_left_only_bucket_sees_carry(spark):
    from embulk_output_databricks_spark.operators.joins import (
        asof_join_bucketed,
    )

    # right only in bucket 0, left in bucket 2 (no right rows there)
    l = spark.createDataFrame([(1, 250, 1)], "k bigint, t bigint, pid bigint")
    r = spark.createDataFrame([(1, 10, 1.0)], "k bigint, t bigint, v double")
    out = asof_join_bucketed(l, r, "k", "t", ["v"], bucket_width=100)
    assert out.collect()[0]["prior_v"] == 1.0


def test_laketable_diff_over_mor_interval(spark, warehouse):
    """diff() must be strategy-agnostic: a merge-on-read interval (delta
    files, no bucket rewrite) yields the same I/U/D answer as COW."""
    from embulk_output_databricks_spark.plans.merge import merge_apply_mor
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    cat = LakeCatalog(spark, warehouse)
    tbl = cat.create_table("t", schema, n_buckets=4, bucket_key="k")
    tbl.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema))
    v1 = tbl.current_version()
    staged = spark.createDataFrame(
        [(2, "B", "U"), (3, "c", "D"), (4, "d", "U")], "k bigint, v string, op string")
    merge_apply_mor(tbl, staged, keys=["k"], support_deletes=True)
    assert tbl.delta_file_count() > 0  # really took the MOR path
    got = {r["k"]: (r["__op"], r["v"]) for r in tbl.diff(v1, keys=["k"]).collect()}
    assert got == {2: ("U", "B"), 3: ("D", "c"), 4: ("I", "d")}
