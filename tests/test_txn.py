"""Catalog-level multi-table transactions (sources/txn.py): staged
branch writes are invisible until commit; commit publishes every table
or none; a foreign main-head write turns into TransactionConflict with a
clean rollback; a crash after the intent point rolls FORWARD across
restart; an abandoned begin() reaps with nothing ever visible."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.sources.txn import (
    TransactionConflict,
    _txlog_dir,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.LongType()),
])


def _mk(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/tx")
    a = cat.create_table("a", SCHEMA, n_buckets=2, bucket_key="k")
    b = cat.create_table("b", SCHEMA, n_buckets=2, bucket_key="k")
    a.append(spark.createDataFrame([(1, 10), (2, 20)], SCHEMA))
    b.append(spark.createDataFrame([(1, 100)], SCHEMA))
    return cat, a, b


def _rows(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_commit_is_all_or_nothing_and_invisible_until_publish(spark, warehouse):
    cat, a, b = _mk(spark, warehouse)
    txn = cat.begin(["a", "b"])
    txn.table("a").append(spark.createDataFrame([(3, 30)], SCHEMA))
    merge_apply(txn.table("b"),
                spark.createDataFrame([(1, 101, "U"), (2, 200, "U")],
                                      "k long, v long, op string"),
                keys=["k"])
    # staged commits are invisible on main
    assert _rows(a) == [(1, 10), (2, 20)] and _rows(b) == [(1, 100)]
    heads = txn.commit()
    assert set(heads) == {"a", "b"}
    assert _rows(cat.load("a")) == [(1, 10), (2, 20), (3, 30)]
    assert _rows(cat.load("b")) == [(1, 101), (2, 200)]
    # fully cleaned: no txn branches, no intent records
    assert all(not br.startswith("txn-")
               for n in ("a", "b") for br in cat.load(n).list_branches())
    assert os.listdir(_txlog_dir(cat)) == []
    with pytest.raises(RuntimeError, match="already committed"):
        txn.commit()


def test_rollback_leaves_no_trace(spark, warehouse):
    cat, a, b = _mk(spark, warehouse)
    txn = cat.begin(["a", "b"])
    txn.table("a").append(spark.createDataFrame([(9, 90)], SCHEMA))
    txn.rollback()
    assert _rows(a) == [(1, 10), (2, 20)]
    assert cat.load("a").list_branches() == []
    assert os.listdir(_txlog_dir(cat)) == []


def test_foreign_write_conflicts_and_rolls_back(spark, warehouse):
    cat, a, b = _mk(spark, warehouse)
    txn = cat.begin(["a", "b"])
    txn.table("a").append(spark.createDataFrame([(3, 30)], SCHEMA))
    # a writer bypasses the open transaction on table b's MAIN head
    b.append(spark.createDataFrame([(7, 70)], SCHEMA))
    with pytest.raises(TransactionConflict, match="main advanced"):
        txn.commit()
    # rolled back: a's staged row never published, branches gone
    assert _rows(cat.load("a")) == [(1, 10), (2, 20)]
    assert _rows(cat.load("b")) == [(1, 100), (7, 70)]
    assert cat.load("a").list_branches() == []


def test_crash_after_intent_rolls_forward(spark, warehouse):
    cat, a, b = _mk(spark, warehouse)
    txn = cat.begin(["a", "b"])
    txn.table("a").append(spark.createDataFrame([(3, 30)], SCHEMA))
    txn.table("b").append(spark.createDataFrame([(8, 80)], SCHEMA))
    # simulate a crash right after the commit point: intent written,
    # only table a published, nothing cleaned up
    heads = {n: txn.table(n).current_version() for n in ("a", "b")}
    intent = {"txid": txn.txid, "branch": txn.branch, "tables": heads,
              "committed_at_us": 0}
    with open(os.path.join(_txlog_dir(cat), f"{txn.branch}.json"), "w") as f:
        json.dump(intent, f)
    a.publish_branch(txn.branch)
    # restart: recovery publishes the remainder and cleans up
    out = cat.recover_transactions()
    assert out == {txn.txid: "published"}
    assert _rows(cat.load("a")) == [(1, 10), (2, 20), (3, 30)]
    assert _rows(cat.load("b")) == [(1, 100), (8, 80)]
    assert os.listdir(_txlog_dir(cat)) == []
    assert cat.load("b").list_branches() == []
    # recovery is idempotent
    assert cat.recover_transactions() == {}


def test_abandoned_begin_reaps_invisible(spark, warehouse):
    cat, a, b = _mk(spark, warehouse)
    txn = cat.begin(["a"])
    txn.table("a").append(spark.createDataFrame([(9, 90)], SCHEMA))
    del txn  # process died before commit: no intent record exists
    out = cat.recover_transactions(reap_abandoned_after_s=0)
    assert list(out.values()) == ["reaped"]
    assert _rows(cat.load("a")) == [(1, 10), (2, 20)]
    assert cat.load("a").list_branches() == []


def test_begin_validation(spark, warehouse):
    cat, a, b = _mk(spark, warehouse)
    with pytest.raises(ValueError):
        cat.begin([])
    with pytest.raises(ValueError):
        cat.begin(["a", "a"])
    with pytest.raises(ValueError):
        cat.begin(["a", "nope"])
    # a failed begin leaves no branches behind
    assert cat.load("a").list_branches() == []
    txn = cat.begin(["a"])
    with pytest.raises(ValueError, match="not in this transaction"):
        txn.table("b")
    txn.rollback()
