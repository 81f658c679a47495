"""Catalog-level ops (SURVEY B10/B12): list/rename tables, age-based
snapshot retention — the metadata-probe and cleanup surface the reference
drives through JDBC DatabaseMetaData + staging-cleanup flags.
"""

import time

import pytest

from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from tests.test_laketable import seq_rows


def test_list_and_rename_tables(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    a = cat.create_table("alpha", SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    cat.create_table("beta", SEQUENCES_SCHEMA, n_buckets=2,
                     bucket_key="doc_id")
    assert cat.list_tables() == ["alpha", "beta"]
    a.append(seq_rows(spark, range(5)))
    v = a.current_version()

    g = cat.rename_table("alpha", "gamma")
    assert cat.list_tables() == ["beta", "gamma"]
    # one directory move: snapshots, data, and time travel all intact
    assert g.row_count() == 5
    assert g.current_version() == v
    with pytest.raises(ValueError, match="no such table"):
        cat.load("alpha")
    with pytest.raises(ValueError, match="no such table"):
        cat.rename_table("alpha", "delta")
    with pytest.raises(ValueError, match="already exists"):
        cat.rename_table("beta", "gamma")


def test_expire_snapshots_by_age(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("age", SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    for i in range(4):                       # v1..v4
        t.append(seq_rows(spark, [i]))
    at_v3 = t.manifest(3).properties["committed_at_us"]

    # nothing is older than a timestamp before every commit (the create
    # snapshot v0 is stamped too)
    assert t.expire_snapshots(keep_last=1, older_than_us=at_v3 - 10**9) == []
    # v0..v2 committed before v3's instant expire; v3 survives on age,
    # v4 via keep_last
    assert t.expire_snapshots(keep_last=1, older_than_us=at_v3) == [0, 1, 2]
    assert t.row_count(version=3) == 3       # retained: still travelable
    with pytest.raises(Exception):
        t.manifest(2)

    # keep_last floors retention regardless of age: with v3,v4 left an
    # everything-is-old timestamp still keeps the newest two
    now_us = int(time.time() * 1_000_000) + 10**9
    assert t.expire_snapshots(keep_last=2, older_than_us=now_us) == []
    assert t.expire_snapshots(keep_last=1, older_than_us=now_us) == [3]
    assert t.row_count() == 4


def test_pin_snapshot_consistent_multi_table_read(spark, warehouse):
    """pin_snapshot: a multi-table read set pinned at one instant is
    immune to every commit that lands afterwards — per-table snapshot
    atomicity lifted to a read-only transaction."""
    cat = LakeCatalog(spark, f"{warehouse}/pin")
    a = cat.create_table("a", SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    b = cat.create_table("b", SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    a.append(seq_rows(spark, range(3)))
    b.append(seq_rows(spark, range(5)))

    pin = cat.pin_snapshot()          # default: every table
    assert pin.versions() == {"a": a.current_version(),
                              "b": b.current_version()}
    # writers race ahead on both tables
    a.append(seq_rows(spark, range(3, 10)))
    b.append(seq_rows(spark, range(5, 6)))
    # the pin still serves the old instant, live reads see the new one
    assert pin.read("a").count() == 3 and pin.read("b").count() == 5
    assert a.read().count() == 10 and b.read().count() == 6
    # read kwargs pass through (pruning surface intact under the pin)
    assert pin.read("a", buckets={0}).count() <= 3
    with pytest.raises(ValueError, match="not in this snapshot pin"):
        cat.pin_snapshot(["a"]).read("b")


def test_pin_snapshot_sql_and_maintain_prunes_cdf(spark, warehouse):
    """pin.sql(): multi-table SQL planned against the pinned versions; and
    maintain(expire_keep_last=...) drops change-feed sidecars that fall
    below the retained-snapshot floor."""
    import os

    from pyspark.sql import functions as F

    from embulk_output_databricks_spark.streaming.cdf import apply_with_cdf

    cat = LakeCatalog(spark, f"{warehouse}/pinsql")
    a = cat.create_table("ta", SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    a.append(seq_rows(spark, range(4)))
    pin = cat.pin_snapshot(["ta"])
    for i in range(3):
        apply_with_cdf(a, seq_rows(spark, range(4 + i, 5 + i))
                       .withColumn("op", F.lit("U")),
                       keys=["doc_id"])
    # SQL over the pin sees the pinned instant, not the new commits
    assert pin.sql("SELECT count(*) AS c FROM ta").first()["c"] == 4
    assert a.read().count() == 7
    # retention: cdf sidecars below the retained floor are pruned
    n_before = len(os.listdir(os.path.join(a.root, "cdf")))
    rep = a.maintain(expire_keep_last=1)
    assert rep["expire"]["cdf_pruned"] >= 1
    assert len(os.listdir(os.path.join(a.root, "cdf"))) < n_before
