"""Regression pins for the round-2 ADVICE.md findings.

1. q_ann_recall emits a (method, hits=0) row even when an LSH variant
   recovers zero exact-top-k pairs (queries.recall_hits — the oracle's
   plain COUNT aggregate always emits one row).
2. ensure_table buckets non-merge auto-creates when n_buckets is set even
   though merge_keys defaults to None (bucket pruning must not silently
   disappear).
3. ReplayDriver must not mutate the caller's JobConfig when resolving
   merge keys: one config reused for two targets with different
   identifier_fields must not leak keys between them.
4. A metadata-only commit (props/bloom/analyze housekeeping) carries zero
   change rows and must NOT uncover a CDF interval — neither for
   change_feed consumers nor for the tokmaint cost model (which would
   force a full recompute for a housekeeping commit).
5. replay_pipelined retries a transiently-failing prefetch under the same
   policy as the serial path instead of aborting the replay.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.config import ApplyMode, JobConfig
from embulk_output_databricks_spark.plans.apply import ensure_table
from embulk_output_databricks_spark.queries import recall_hits
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.streaming import ReplayDriver
from embulk_output_databricks_spark.synth import synth_binlog
from tests.test_replay import python_oracle, table_state


@pytest.fixture()
def cat(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def test_recall_hits_emits_row_on_zero_hits(spark):
    pairs = "query_id long, neighbor_id long"
    brute = spark.createDataFrame([(0, 1), (0, 2)], pairs)
    empty = spark.createDataFrame([], pairs)
    rows = recall_hits(brute, empty, "lsh").collect()
    assert [(r["method"], r["hits"]) for r in rows] == [("lsh", 0)]
    some = spark.createDataFrame([(0, 2), (5, 7)], pairs)
    rows = recall_hits(brute, some, "mp").collect()
    assert [(r["method"], r["hits"]) for r in rows] == [("mp", 1)]


def test_non_merge_autocreate_keeps_bucketing(spark, cat):
    cfg = JobConfig(mode="insert", n_buckets=4)  # merge_keys defaults None
    t = ensure_table(cat, cfg, SEQUENCES_SCHEMA)
    m = t.manifest()
    assert m.bucket_key == "doc_id" and m.n_buckets == 4


def test_non_merge_autocreate_without_doc_id_is_unbucketed(spark, cat):
    schema = T.StructType([T.StructField("k", T.StringType()),
                           T.StructField("v", T.LongType())])
    t = ensure_table(cat, JobConfig(table="kv", mode="insert", n_buckets=4),
                     schema)
    assert t.manifest().bucket_key is None


def test_driver_does_not_mutate_shared_config(spark, cat):
    t1 = cat.create_table("s1", SEQUENCES_SCHEMA, n_buckets=4,
                          properties={"identifier_fields": "doc_id,source"})
    t2 = cat.create_table("s2", SEQUENCES_SCHEMA, n_buckets=4,
                          properties={"identifier_fields": "source"})
    cfg = JobConfig(mode="merge", merge_keys=None, n_buckets=4)
    d1 = ReplayDriver(cat, cfg, table=t1)
    assert cfg.merge_keys is None          # caller's object untouched
    d2 = ReplayDriver(cat, cfg, table=t2)  # second target re-discovers
    assert d1.cfg.merge_keys == ["doc_id", "source"]
    assert d2.cfg.merge_keys == ["source"]
    assert cfg.merge_keys is None


def test_metadata_only_commit_keeps_cdf_interval_covered(spark, cat):
    from embulk_output_databricks_spark.streaming.cdf import (
        apply_with_cdf, change_feed, data_files_changed)
    from embulk_output_databricks_spark.streaming.tokmaint import (
        _cdf_interval, ensure_token_histogram, sync_token_histogram)

    base = cat.create_table("base", T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ]), n_buckets=4, bucket_key="doc_id")
    base.append(spark.createDataFrame(
        [(f"d{i}", [i % 7, 1]) for i in range(50)],
        "doc_id string, tokens array<int>"))
    hist = ensure_token_histogram(cat, base, "hist")
    v0 = base.current_version()

    staged = spark.createDataFrame([("d0", [99, 1], "U")],
                                   "doc_id string, tokens array<int>, op string")
    apply_with_cdf(base, staged, keys=["doc_id"])
    base.update_properties({"note": "housekeeping"})    # metadata-only
    base.set_bloom_columns(["doc_id"])                  # metadata-only
    assert not data_files_changed(base, base.current_version())

    covered, captured = _cdf_interval(base, v0, base.current_version())
    assert covered and captured == 1
    feed = change_feed(base, v0)
    assert feed is not None and feed.count() == 1

    m = sync_token_histogram(base, hist, keys=["doc_id"])
    assert m.properties.get("operation") != "token-histogram-recompute"
    expect = (base.read().select(F.explode("tokens").alias("token"))
              .groupBy("token").agg(F.count(F.lit(1)).alias("n_rows")))
    assert sorted(tuple(r) for r in hist.read().collect()) == \
        sorted(tuple(r) for r in expect.collect())


def test_metadata_only_interval_yields_empty_feed(spark, cat):
    from embulk_output_databricks_spark.streaming.cdf import (
        apply_with_cdf, change_feed)

    base = cat.create_table("base", T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ]), n_buckets=4, bucket_key="doc_id")
    staged = spark.createDataFrame([("d0", [1], "U")],
                                   "doc_id string, tokens array<int>, op string")
    apply_with_cdf(base, staged, keys=["doc_id"])
    v = base.current_version()
    base.update_properties({"note": "only-metadata"})
    feed = change_feed(base, v)
    assert feed is not None and feed.count() == 0
    assert "__op" in feed.columns and "__commit_version" in feed.columns


def test_pipelined_prefetch_retries_transient_failure(spark, cat):
    per = 300
    fails = {1: 1}  # batch 1's source build fails once, then succeeds

    def mk(b):
        def thunk():
            if fails.get(b, 0) > 0:
                fails[b] -= 1
                raise RuntimeError("transient source failure")
            return synth_binlog(spark, per, 50, per, start=b * per,
                                delete_frac=0.1)
        return thunk

    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4,
                                      retry_wait_s=0.01))
    recs = drv.replay_pipelined([(b, mk(b)) for b in range(3)], read_ahead=1)
    assert [r["batch_id"] for r in recs] == [0, 1, 2]
    full = synth_binlog(spark, 3 * per, 50, per, delete_frac=0.1)
    assert table_state(drv.table) == \
        python_oracle([r.asDict() for r in full.collect()])
