"""Incremental join-view maintenance (streaming/joinmaint.py): V = fact ⟕
dim kept in sync from both tables' diffs, exactly-once via two consumed-
version watermarks riding the view's own commits. Invariant everywhere:
the maintained view equals a full recompute of the join over the final
states."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.joinmaint import (
    ensure_join_view,
    sync_join_view,
)

FACT = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("fk", T.StringType()),
    T.StructField("v", T.StringType()),
])
DIM = T.StructType([
    T.StructField("dk", T.StringType()),
    T.StructField("code", T.LongType()),
])


def _setup(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/jm")
    fact = cat.create_table("fact", FACT, n_buckets=2, bucket_key="k",
                            properties={"merge_keys": "k"})
    dim = cat.create_table("dim", DIM, n_buckets=2, bucket_key="dk",
                           properties={"merge_keys": "dk"})
    fact.append(spark.createDataFrame(
        [(i, f"d{i % 3}", f"v{i}") for i in range(20)], FACT))
    dim.append(spark.createDataFrame(
        [("d0", 100), ("d1", 101)], DIM))  # d2 intentionally missing
    view = ensure_join_view(cat, fact, dim, "v", "k", "fk", "dk", ["code"])
    return cat, fact, dim, view


def _recompute(fact, dim):
    f = fact.read().alias("A")
    d = dim.read().select(F.col("dk").alias("__dk"), "code").alias("B")
    j = f.join(d, F.col("A.fk") == F.col("B.__dk"), "left_outer")
    return {(r["k"], r["fk"], r["v"], r["code"])
            for r in j.select("A.*", "B.code").collect()}


def _state(view):
    return {(r["k"], r["fk"], r["v"], r["code"])
            for r in view.read().collect()}


def _sync(fact, dim, view):
    return sync_join_view(fact, dim, view, "k", "fk", "dk", ["code"])


def test_seed_matches_full_join(spark, warehouse):
    _cat, fact, dim, view = _setup(spark, warehouse)
    assert _state(view) == _recompute(fact, dim)
    # missing dim key -> NULL enrichment (left join semantics)
    assert any(c is None for (_, fk, _, c) in _state(view) if fk == "d2")
    # nothing to consume: sync is a no-op
    assert _sync(fact, dim, view) is None


def test_fact_churn_propagates(spark, warehouse):
    _cat, fact, dim, view = _setup(spark, warehouse)
    op = T.StructType(list(FACT.fields) + [T.StructField("op", T.StringType())])
    merge_apply(fact, spark.createDataFrame(
        [(1, "d1", "UPD", "U"),          # update payload
         (2, "d0", None, "D"),           # delete
         (99, "d0", "NEW", "U")], op),   # insert
        ["k"], support_deletes=True)
    assert _sync(fact, dim, view) is not None
    st = _state(view)
    assert st == _recompute(fact, dim)
    assert (1, "d1", "UPD", 101) in st and (99, "d0", "NEW", 100) in st
    assert not any(k == 2 for (k, *_rest) in st)


def test_dim_churn_fans_out(spark, warehouse):
    _cat, fact, dim, view = _setup(spark, warehouse)
    op = T.StructType(list(DIM.fields) + [T.StructField("op", T.StringType())])
    merge_apply(dim, spark.createDataFrame(
        [("d0", 999, "U"),     # update: every d0 fact row re-enriches
         ("d1", None, "D"),    # delete: d1 fact rows go NULL
         ("d2", 202, "U")], op),  # late-arriving dim: d2 rows fill in
        ["dk"], support_deletes=True)
    _sync(fact, dim, view)
    st = _state(view)
    assert st == _recompute(fact, dim)
    codes = {fk: c for (_, fk, _, c) in st}
    assert codes["d0"] == 999 and codes["d1"] is None and codes["d2"] == 202


def test_fk_change_moves_enrichment(spark, warehouse):
    _cat, fact, dim, view = _setup(spark, warehouse)
    merge_apply(fact, spark.createDataFrame([(3, "d1", "v3")], FACT), ["k"])
    _sync(fact, dim, view)
    st = _state(view)
    assert (3, "d1", "v3", 101) in st
    assert st == _recompute(fact, dim)


def test_overlap_stages_once_and_is_exact(spark, warehouse):
    _cat, fact, dim, view = _setup(spark, warehouse)
    # the SAME fact row changes while its dim also changes
    merge_apply(fact, spark.createDataFrame([(0, "d0", "BOTH")], FACT), ["k"])
    op = T.StructType(list(DIM.fields) + [T.StructField("op", T.StringType())])
    merge_apply(dim, spark.createDataFrame([("d0", 555, "U")], op),
                ["dk"], support_deletes=True)
    _sync(fact, dim, view)
    st = _state(view)
    assert st == _recompute(fact, dim)
    assert (0, "d0", "BOTH", 555) in st
    assert len(st) == 20  # no duplicate k=0 from the two legs


def test_watermarks_ride_commits(spark, warehouse):
    _cat, fact, dim, view = _setup(spark, warehouse)
    merge_apply(fact, spark.createDataFrame([(5, "d0", "x")], FACT), ["k"])
    m = _sync(fact, dim, view)
    assert m.properties["join_upto_fact"] == str(fact.current_version())
    assert m.properties["join_upto_dim"] == str(dim.current_version())
    # replaying sync with nothing new: no-op, no snapshot
    v = view.current_version()
    assert _sync(fact, dim, view) is None
    assert view.current_version() == v
    # dim churn touching no live fk: watermark-only advance
    merge_apply(dim, spark.createDataFrame([("zzz", 7, )], DIM), ["dk"])
    m2 = _sync(fact, dim, view)
    assert m2.properties["join_upto_dim"] == str(dim.current_version())
    assert _state(view) == _recompute(fact, dim)


def test_sync_mor_strategy_equivalence_and_write_amp(spark, warehouse):
    """strategy='mor' appends the sync's staged rows as delta files —
    O(churn) written, zero rewritten — and read() resolves to exactly the
    COW-synced (and full-recompute) state, deletes included."""
    cat, fact, dim, view = _setup(spark, warehouse)
    # churn both sides + a fact delete (op-column envelope)
    fop = T.StructType(list(FACT.fields) + [T.StructField("op",
                                                          T.StringType())])
    merge_apply(fact, spark.createDataFrame(
        [(5, "d1", "v5x", "U"), (21, "d2", "v21", "U"),
         (7, "d1", None, "D")], fop), keys=["k"])
    merge_apply(dim, spark.createDataFrame(
        [("d0", 200)], DIM), keys=["dk"])
    m = sync_join_view(fact, dim, view, "k", "fk", "dk", ["code"],
                       strategy="mor")
    assert m is not None
    assert _state(view) == _recompute(fact, dim)
    last = view.snapshots().orderBy(F.desc("version")).limit(1).collect()[0]
    assert last["removed_rows"] == 0  # pure delta append
    # the view carries its sort order from creation (file-prune aid)
    assert view.manifest().properties.get("sort_order")
    # a second, COW sync after more churn still converges
    merge_apply(fact, spark.createDataFrame(
        [(0, "d1", "v0x")], FACT), keys=["k"])
    sync_join_view(fact, dim, view, "k", "fk", "dk", ["code"])
    assert _state(view) == _recompute(fact, dim)
