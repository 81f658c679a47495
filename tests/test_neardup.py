"""Incrementally-maintained near-dup index (streaming/neardup.py): the
signature table must track the base exactly (vs a full recompute) through
inserts, text updates, and deletes, resume from its watermark after a
reopen, and answer the per-batch candidate-pair probe.
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import OP_COL, merge_apply
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.streaming.neardup import (
    NearDupIndex, signature_rows)

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("props", T.StringType()),
])


def _rows(spark, d):
    return spark.createDataFrame(sorted(d.items()), SCHEMA)


def _mk(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    base = cat.create_table("base", SCHEMA, n_buckets=2,
                            bucket_key="user_id")
    return cat, base


def _state(tbl):
    return {(r["user_id"], r["band"], r["bh"]) for r in tbl.read().collect()}


def _recompute(base):
    return {(r["user_id"], r["band"], r["bh"])
            for r in signature_rows(base.read(), "user_id",
                                    "props").collect()}


def test_sync_tracks_recompute_through_iud(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, {
        1: "alpha beta gamma delta epsilon zeta",
        3: "one two three four five six seven",
    }))
    idx = NearDupIndex(cat, base, "sigs", "user_id", "props")
    assert _state(idx.sigs) == _recompute(base)
    assert idx.watermark() == base.current_version()
    assert idx.sync() is None  # already current

    # one batch: insert 2 and 4, rewrite 3's text, delete 1
    staged = (_rows(spark, {
        2: "alpha beta gamma delta epsilon eta",
        3: "rewritten totally new words for three",
        4: "unrelated content goes right here now",
    }).withColumn(OP_COL, F.lit("U"))
      .unionByName(_rows(spark, {1: None}).withColumn(OP_COL, F.lit("D"))))
    merge_apply(base, staged, keys=["user_id"], support_deletes=True)

    assert idx.sync() is not None
    assert idx.watermark() == base.current_version()
    assert _state(idx.sigs) == _recompute(base)
    # deleted key left NO residue rows
    assert idx.sigs.read().filter(F.col("user_id") == 1).count() == 0

    # reopened from catalog: watermark persisted, nothing to redo
    idx2 = NearDupIndex(cat, base, "sigs", "user_id", "props")
    assert idx2.sync() is None

    # several base commits, ONE catch-up sync covers the whole interval
    base.append(_rows(spark, {5: "more fresh text arrives in this row"}))
    merge_apply(base, _rows(spark, {
        4: "unrelated content goes right here again"}), keys=["user_id"])
    assert idx2.sync() is not None
    assert _state(idx2.sigs) == _recompute(base)


def test_candidate_pairs_probe(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    dup = "identical sentences hash to identical bands always"
    base.append(_rows(spark, {
        1: dup, 2: dup,
        3: "completely different text lives in this row",
    }))
    idx = NearDupIndex(cat, base, "sigs", "user_id", "props")
    allp = {(r["key_a"], r["key_b"])
            for r in idx.candidate_pairs().collect()}
    assert allp == {(1, 2)}
    probe = spark.createDataFrame([(3,)], "user_id long")
    assert idx.candidate_pairs(probe).count() == 0
    probe = spark.createDataFrame([(2,)], "user_id long")
    got = {(r["key_a"], r["key_b"])
           for r in idx.candidate_pairs(probe).collect()}
    assert got == {(1, 2)}
