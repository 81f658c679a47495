"""Incrementally-maintained exact inverted token index
(streaming/invindex.py): the posting set synced from the base table's
change feed must equal a full explode+distinct recompute after every
interval — edits that move tokens between documents, deletes that drop
every posting of a document, duplicate tokens within one array (ONE
posting), NULL arrays, churn-only intervals (zero data files written) —
and a probe must file-skip to its token's postings."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.invindex import (
    WATERMARK_PROP,
    ensure_inverted_index,
    inverted_index_schema,
    posting_deltas,
    probe,
    sync_inverted_index,
)

BASE = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
])


def _mk(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/iv")
    base = cat.create_table("base", BASE, n_buckets=4, bucket_key="doc_id")
    return cat, base


def _rows(spark, rows):
    return spark.createDataFrame(rows, BASE)


def _staged(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, op string")


def _recompute(base):
    return (base.read()
            .select("doc_id",
                    F.explode(F.array_distinct("tokens")).alias("token")))


def _state(df):
    return sorted((r["token"], r["doc_id"])
                  for r in df.select("token", "doc_id").collect())


def test_index_tracks_base_through_edit_delete_insert(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [("a", [1, 1, 2]), ("b", [2, 3])]))
    idx = ensure_inverted_index(cat, base, "idx", keys=["doc_id"])
    # duplicate 1s in doc a are ONE posting
    assert _state(idx.read()) == [(1, "a"), (2, "a"), (2, "b"), (3, "b")]

    # edit a (1,1,2 -> 1,4): posting (2,a) dies, (4,a) appears, (1,a)
    # survives untouched; delete b: both its postings die; insert c
    merge_apply(base, _staged(spark, [
        ("a", [1, 4], "U"), ("b", None, "D"), ("c", [5, 5, 1], "U"),
    ]), keys=["doc_id"], support_deletes=True)
    assert sync_inverted_index(base, idx, keys=["doc_id"]) is not None
    want = [(1, "a"), (1, "c"), (4, "a"), (5, "c")]
    assert _state(idx.read()) == want
    assert _state(idx.read()) == _state(_recompute(base))
    assert int(idx.manifest().properties[WATERMARK_PROP]) == \
        base.current_version()
    # every live posting's liveness count is exactly 1
    assert idx.read().filter(F.col("n_rows") != 1).count() == 0


def test_unchanged_tokens_write_nothing(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [("a", [7, 8]), ("b", [8])]))
    idx = ensure_inverted_index(cat, base, "idx", keys=["doc_id"])
    files_before = idx.files().count()
    # permute + duplicate within a's array: the row diffs (U) but the
    # posting SET is identical -> watermark advances metadata-only
    merge_apply(base, _staged(spark, [("a", [8, 7, 7], "U")]),
                keys=["doc_id"], support_deletes=True)
    assert sync_inverted_index(base, idx, keys=["doc_id"]) is not None
    assert idx.files().count() == files_before
    assert _state(idx.read()) == [(7, "a"), (8, "a"), (8, "b")]


def test_probe_file_skips_and_is_exact(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    # disjoint vocab slices across several appends -> sorted, bloom-indexed
    # posting files with narrow token ranges
    idx = None
    for s in range(4):
        base.append(_rows(spark, [
            (f"d{s}{i}", [s * 1000 + i, s * 1000 + i + 1]) for i in range(40)]))
        if idx is None:
            idx = ensure_inverted_index(cat, base, "idx", keys=["doc_id"],
                                        n_buckets=2)
        else:
            sync_inverted_index(base, idx, keys=["doc_id"])
    st = idx.scan_stats(eq_filter={"token": 2005})
    assert st["files_read"] < st["files_live"], "probe read the whole index"
    got = probe(idx, 2005, keys=["doc_id"])
    assert _state(got) == [(2005, "d24"), (2005, "d25")]
    # multi-token probe == union of singles
    multi = probe(idx, [5, 3001], keys=["doc_id"])
    assert _state(multi) == sorted(
        _state(probe(idx, 5, keys=["doc_id"]))
        + _state(probe(idx, 3001, keys=["doc_id"])))


def test_null_arrays_and_guards(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [("a", None), ("b", [9])]))
    idx = ensure_inverted_index(cat, base, "idx", keys=["doc_id"])
    assert _state(idx.read()) == [(9, "b")]
    merge_apply(base, _staged(spark, [("a", [9], "U"), ("b", None, "U")]),
                keys=["doc_id"], support_deletes=True)
    sync_inverted_index(base, idx, keys=["doc_id"])
    assert _state(idx.read()) == [(9, "a")]
    assert sync_inverted_index(base, idx, keys=["doc_id"]) is None
    plain = cat.create_table(
        "plain", inverted_index_schema(BASE, ["doc_id"]),
        n_buckets=2, bucket_key="token")
    with pytest.raises(ValueError, match=WATERMARK_PROP):
        sync_inverted_index(base, plain, keys=["doc_id"])
    with pytest.raises(ValueError, match="not in base schema"):
        inverted_index_schema(BASE, ["nope"])


def test_ensure_is_idempotent(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [("a", [1, 2, 2])]))
    i1 = ensure_inverted_index(cat, base, "idx", keys=["doc_id"])
    i2 = ensure_inverted_index(cat, base, "idx", keys=["doc_id"])
    assert i1.name == i2.name
    assert _state(i2.read()) == [(1, "a"), (2, "a")]


def test_probe_bucket_prunes_and_matches_unpruned_read(spark, warehouse):
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [(f"d{i}", [i, i + 100]) for i in range(60)]))
    idx = ensure_inverted_index(cat, base, "idx", keys=["doc_id"],
                                n_buckets=8)
    got = _state(probe(idx, [7, 33], keys=["doc_id"]))
    want = _state(idx.read()
                  .filter(F.col("token").isin([7, 33])))
    assert got == want and len(got) == 2
    # the probed buckets are a strict subset at this bucket count
    from embulk_output_databricks_spark.sources.laketable import bucket_expr
    from pyspark.sql import types as TT
    bks = {r[0] for r in spark.createDataFrame(
        [(7,), (33,)], TT.StructType([TT.StructField("token", TT.IntegerType())]))
        .select(bucket_expr("token", 8)).collect()}
    st = idx.scan_stats(buckets=bks, eq_filter={"token": [7, 33]})
    assert st["pruned_bucket"] > 0
    # NULL probe values match nothing and don't break bucket computation
    assert probe(idx, [None, 7], keys=["doc_id"]).count() == 1


def test_posting_deltas_requires_old_column(spark, warehouse):
    # an exact postings index corrupts silently if a U row lacks the old
    # array (adds and retracts cancel): the helper must reject, not guess
    cat, base = _mk(spark, warehouse)
    base.append(_rows(spark, [("a", [1, 2])]))
    merge_apply(base, _staged(spark, [("a", [2, 3], "U")]),
                keys=["doc_id"], support_deletes=True)
    d = base.diff(0, keys=["doc_id"], include_old=False)
    with pytest.raises(ValueError, match="__old_tokens"):
        posting_deltas(d, keys=["doc_id"])
