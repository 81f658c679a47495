"""Incrementally-maintained token-frequency histogram
(streaming/tokmaint.py): the histogram synced from LakeTable.diff must
equal a full explode+count recompute of the base table after every
interval — including edits that shift counts between tokens, deletes
that empty a token's count (group must disappear), brand-new token ids,
NULL arrays, and churn-only intervals (watermark advances with ZERO data
files written)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.tokmaint import (
    WATERMARK_PROP,
    ensure_token_histogram,
    sync_token_histogram,
    token_histogram_schema,
)

BASE = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
])


def _mk(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/tm")
    base = cat.create_table("base", BASE, n_buckets=4, bucket_key="doc_id")
    return cat, base


def _rows(spark, rows):
    return spark.createDataFrame(rows, BASE)


def _staged(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>, op string")


def _recompute(base):
    return (base.read()
            .select(F.explode("tokens").alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("n_rows")))


def _state(df):
    return sorted(tuple(r) for r in df.select("token", "n_rows").collect())


def test_histogram_tracks_base_through_edit_delete_insert(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [("a", [1, 1, 2]), ("b", [2, 3])]))
    hist = ensure_token_histogram(cat, base, "hist")
    assert _state(hist.read()) == [(1, 2), (2, 2), (3, 1)]

    # edit a (1,1,2 -> 1,4): retract one 1 and the 2, add new token 4;
    # delete b: token 3's count reaches zero -> its group row must vanish;
    # insert c with a brand-new token id (new group through the MERGE)
    merge_apply(base, _staged(spark, [
        ("a", [1, 4], "U"), ("b", None, "D"), ("c", [5, 5], "U"),
    ]), keys=["doc_id"], support_deletes=True)
    assert sync_token_histogram(base, hist, keys=["doc_id"]) is not None
    assert _state(hist.read()) == [(1, 1), (4, 1), (5, 2)]
    assert _state(hist.read()) == _state(_recompute(base))
    assert int(hist.manifest().properties[WATERMARK_PROP]) == \
        base.current_version()


def test_churn_only_interval_is_metadata_only(spark, warehouse):
    """Metadata-only churn advance holds on the CDF-covered incremental
    path (the cost model's choice for covered+small intervals); without
    coverage the cost model deliberately recomputes instead of paying the
    O(table) diff compare (see test_cost_based_plan_choice)."""
    from embulk_output_databricks_spark.streaming.cdf import apply_with_cdf

    cat, base = _mk(spark, warehouse)
    # enough filler rows that a 1-row change stays under the cost model's
    # recompute_ratio (captured << base): the covered path must be chosen
    base.append(_rows(spark, [("a", [7, 8]), ("b", [8, 7])]
                      + [(f"f{i}", [100 + i]) for i in range(20)]))
    hist = ensure_token_histogram(cat, base, "hist")
    snap = {f["path"] for f in hist.manifest().files}
    # permute a's array: the ROW changes (capture emits a U) but every
    # token's net delta is zero -> watermark advances, no data written
    apply_with_cdf(base, _staged(spark, [("a", [8, 7], "U")]),
                   keys=["doc_id"])
    assert sync_token_histogram(base, hist, keys=["doc_id"]) is not None
    assert {f["path"] for f in hist.manifest().files} == snap
    assert int(hist.manifest().properties[WATERMARK_PROP]) == \
        base.current_version()
    assert _state(hist.read()) == _state(_recompute(base))
    # the uncovered equivalent (cost_based off forces the diff path):
    # still metadata-only, still correct
    merge_apply(base, _staged(spark, [("b", [7, 8], "U")]),
                keys=["doc_id"], support_deletes=True)
    assert sync_token_histogram(base, hist, keys=["doc_id"],
                                cost_based=False) is not None
    assert {f["path"] for f in hist.manifest().files} == snap
    assert _state(hist.read()) == _state(_recompute(base))


def test_cost_based_plan_choice(spark, warehouse):
    """The sync picks its plan from cheap estimates: uncovered interval ->
    full recompute (the diff compare is O(table), measured 0.39x a plain
    recompute); covered + small batch -> CDF delta sync; covered but
    restatement-sized -> recompute. Every path converges to the true
    histogram and advances the watermark."""
    from embulk_output_databricks_spark.streaming.cdf import apply_with_cdf

    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [(f"d{i}", [i % 7, 7 + i % 3])
                              for i in range(40)]))
    hist = ensure_token_histogram(cat, base, "hist")
    # 1) plain merge (no CDF sidecar) -> recompute overwrite
    merge_apply(base, _staged(spark, [("d0", [99], "U")]),
                keys=["doc_id"], support_deletes=True)
    m = sync_token_histogram(base, hist, keys=["doc_id"])
    assert m.properties["operation"] == "token-histogram-recompute"
    assert _state(hist.read()) == _state(_recompute(base))
    # 2) CDF-covered small batch -> incremental MERGE (not a recompute)
    apply_with_cdf(base, _staged(spark, [("d1", [98], "U")]),
                   keys=["doc_id"])
    m = sync_token_histogram(base, hist, keys=["doc_id"])
    assert m.properties["operation"] != "token-histogram-recompute"
    assert _state(hist.read()) == _state(_recompute(base))
    # 3) CDF-covered but most rows changed -> recompute despite coverage
    apply_with_cdf(base, _staged(
        spark, [(f"d{i}", [50 + i % 5], "U") for i in range(40)]),
        keys=["doc_id"])
    m = sync_token_histogram(base, hist, keys=["doc_id"])
    assert m.properties["operation"] == "token-histogram-recompute"
    assert _state(hist.read()) == _state(_recompute(base))
    assert int(hist.manifest().properties[WATERMARK_PROP]) == \
        base.current_version()


def test_null_arrays_contribute_nothing(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [("a", None), ("b", [9])]))
    hist = ensure_token_histogram(cat, base, "hist")
    assert _state(hist.read()) == [(9, 1)]
    # NULL -> [9] adds one 9; [9] -> NULL retracts it: histogram unchanged
    merge_apply(base, _staged(spark, [("a", [9], "U"), ("b", None, "U")]),
                keys=["doc_id"], support_deletes=True)
    sync_token_histogram(base, hist, keys=["doc_id"])
    assert _state(hist.read()) == [(9, 1)]
    assert _state(hist.read()) == _state(_recompute(base))


def test_already_current_and_missing_watermark(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [("a", [1])]))
    hist = ensure_token_histogram(cat, base, "hist")
    assert sync_token_histogram(base, hist, keys=["doc_id"]) is None
    # a plain table (no watermark property) is not a maintained histogram
    other = cat.create_table(
        "plain", token_histogram_schema(BASE), n_buckets=2, bucket_key="token")
    with pytest.raises(ValueError, match=WATERMARK_PROP):
        sync_token_histogram(base, other, keys=["doc_id"])


def test_schema_builder_rejects_non_array(spark):
    with pytest.raises(ValueError, match="not an array"):
        token_histogram_schema(BASE, token_col="doc_id")
    with pytest.raises(ValueError, match="not in base schema"):
        token_histogram_schema(BASE, token_col="nope")


def test_ensure_is_idempotent_and_seed_matches_recompute(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [("a", [1, 2, 2]), ("b", [2])]))
    h1 = ensure_token_histogram(cat, base, "hist")
    h2 = ensure_token_histogram(cat, base, "hist")  # load, not re-seed
    assert h1.name == h2.name
    assert _state(h2.read()) == [(1, 1), (2, 3)]
