"""Optimistic concurrency: _commit retries a lost same-head race by
rebasing the commit's file delta onto the winner (Iceberg
retry-with-validation analog). Commuting histories succeed — pure
appends over anything, rewrites over appends to OTHER buckets or over
disjoint rewrites; non-commuting histories (rewrite of what we read,
append into a bucket we rewrote, double MOR-delta append's __dseq tie,
concurrent schema change) must still surface CommitConflict.

Races are staged deterministically through the same internals the public
ops use: read base -> write data files -> let the rival commit -> commit
against the stale base.
"""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.sources.laketable import (
    _DOP_COL, _DSEQ_COL, CommitConflict)
from tests.test_laketable import seq_rows


def _pair(spark, warehouse, name="cc", **kw):
    cat = LakeCatalog(spark, warehouse)
    kw.setdefault("n_buckets", 2)
    kw.setdefault("bucket_key", "doc_id")
    t1 = cat.create_table(name, SEQUENCES_SCHEMA, **kw)
    t2 = cat.load(name)
    return t1, t2


def _stale_append(t, df):
    """First half of append(): read base, write files. Caller lets a rival
    commit before finishing with _commit against the stale base."""
    base = t.manifest()
    new = t._write_data_files(df, base)
    return base, base.files + new


def test_concurrent_appends_rebase(spark, warehouse):
    t1, t2 = _pair(spark, warehouse)
    t1.append(seq_rows(spark, range(0, 10)))
    base, files = _stale_append(t1, seq_rows(spark, range(10, 20)))
    t2.append(seq_rows(spark, range(20, 30)))  # rival wins the head
    m = t1._commit(base, files, {"operation": "append"})
    assert m.properties["commit_retries"] == 1
    assert {r["doc_id"] for r in t1.read().collect()} == \
        {f"doc{i:08d}" for i in range(30)}
    assert t1.row_count() == 30
    # the per-commit marker does not leak into later commits
    m2 = t1.append(seq_rows(spark, range(30, 35)))
    assert "commit_retries" not in m2.properties


def test_append_rebases_over_concurrent_delete(spark, warehouse):
    t1, t2 = _pair(spark, warehouse, n_buckets=1)
    t1.append(seq_rows(spark, range(0, 50)))
    base, files = _stale_append(t1, seq_rows(spark, range(50, 60)))
    t2.delete_where({"doc_id": (None, "doc00000049")})  # drops whole file
    m = t1._commit(base, files, {"operation": "append"})
    assert m.properties["commit_retries"] == 1
    # the rival's delete survives AND our rows land
    assert {r["doc_id"] for r in t1.read().collect()} == \
        {f"doc{i:08d}" for i in range(50, 60)}


def test_rewrite_conflicts_with_append_into_same_bucket(spark, warehouse):
    t1, t2 = _pair(spark, warehouse, n_buckets=1)
    t1.append(seq_rows(spark, range(0, 20)))
    base = t1.manifest()
    victim = base.files[0]
    rewritten = t1._write_data_files(
        t1._df_for_files(base, [victim]).filter(F.col("n_tok") > 0), base)
    t2.append(seq_rows(spark, range(20, 25)))  # same bucket (n_buckets=1)
    with pytest.raises(CommitConflict, match="bucket this commit rewrote"):
        t1._commit(base, [f for f in base.files if f is not victim] + rewritten,
                   {"operation": "compact"})


def test_rewrite_rebases_over_append_to_other_bucket(spark, warehouse):
    t1, t2 = _pair(spark, warehouse, n_buckets=2)
    t1.append(seq_rows(spark, range(0, 40)))
    docs_b1 = [r["doc_id"] for r in t1.read(buckets={1}).collect()]
    assert docs_b1, "fixture needs rows in bucket 1"
    base = t1.manifest()
    victim = next(f for f in base.files if f["bucket"] == 0)
    rewritten = t1._write_data_files(t1._df_for_files(base, [victim]), base)
    # rival appends rows that hash into bucket 1 only
    ids = [int(d[3:]) for d in docs_b1]
    t2.append(seq_rows(spark, ids))
    m = t1._commit(base, [f for f in base.files if f is not victim] + rewritten,
                   {"operation": "compact"})
    assert m.properties["commit_retries"] == 1
    got = [r["doc_id"] for r in t1.read().collect()]
    assert len(got) == 40 + len(ids)  # bag append kept + rewrite lost nothing
    assert set(got) == {f"doc{i:08d}" for i in range(40)}


def test_rewrite_conflicts_with_rewrite_of_same_file(spark, warehouse):
    t1, t2 = _pair(spark, warehouse, n_buckets=1)
    t1.append(seq_rows(spark, range(0, 20)))
    base = t1.manifest()
    victim = base.files[0]
    rewritten = t1._write_data_files(t1._df_for_files(base, [victim]), base)
    t2.delete_where({"doc_id": (None, "doc00000004")})  # rewrites the file
    with pytest.raises(CommitConflict, match="this commit resolved"):
        t1._commit(base, [f for f in base.files if f is not victim] + rewritten,
                   {"operation": "compact"})


def _stale_delta(t, df, legacy=False):
    """First half of append_delta(): write delta files against the current
    base. legacy=True mimics pre-entry-dseq files (physical __dseq stamp)."""
    base = t.manifest()
    df = df.withColumn(_DOP_COL, F.lit("U"))
    extra = [(_DOP_COL, "string")]
    if legacy:
        df = df.withColumn(_DSEQ_COL, F.lit(base.version + 1).cast("bigint"))
        extra = [(_DSEQ_COL, "bigint"), (_DOP_COL, "string")]
    new = t._write_data_files(df, base, extra_fields=extra)
    for e in new:
        e["kind"] = "delta"
        if not legacy:
            e["dseq"] = base.version + 1
    return base, base.files + new


def test_concurrent_delta_appends_rebase_serialized_by_commit_order(spark, warehouse):
    t1, t2 = _pair(spark, warehouse, n_buckets=1,
                   properties={"merge_keys": "doc_id"})
    t1.append(seq_rows(spark, range(0, 10), src="base"))
    base, files = _stale_delta(t1, seq_rows(spark, range(0, 3), src="d1"))
    t2.append_delta(seq_rows(spark, range(0, 6), src="d2"),
                    merge_keys=["doc_id"])  # rival wins the head
    m = t1._commit(base, files,
                   {"operation": "append-delta", "merge_keys": "doc_id"})
    assert m.properties["commit_retries"] == 1
    # entry-level dseq renumbered: the rebased commit serializes AFTER the
    # winner, so d1 beats d2 on the overlapping keys, d2 keeps the rest
    got = {r["doc_id"]: r["source"] for r in t1.read().collect()}
    assert len(got) == 10
    assert got["doc00000001"] == "d1"
    assert got["doc00000004"] == "d2"
    assert got["doc00000008"] == "base"


def test_concurrent_legacy_delta_appends_still_conflict(spark, warehouse):
    t1, t2 = _pair(spark, warehouse, n_buckets=1,
                   properties={"merge_keys": "doc_id"})
    t1.append(seq_rows(spark, range(0, 10)))
    base, files = _stale_delta(t1, seq_rows(spark, range(0, 3), src="d1"),
                               legacy=True)
    t2.append_delta(seq_rows(spark, range(3, 6), src="d2"),
                    merge_keys=["doc_id"])
    with pytest.raises(CommitConflict, match="tie"):
        t1._commit(base, files,
                   {"operation": "append-delta", "merge_keys": "doc_id"})


def test_concurrent_schema_change_conflicts(spark, warehouse):
    t1, t2 = _pair(spark, warehouse)
    t1.append(seq_rows(spark, range(0, 10)))
    base, files = _stale_append(t1, seq_rows(spark, range(10, 20)))
    t2.rename_column("source", "origin")
    with pytest.raises(CommitConflict, match="schema"):
        t1._commit(base, files, {"operation": "append"})


def test_posdel_consolidation_commutes_with_append_conflicts_with_rewrite(
        spark, warehouse):
    import os

    from embulk_output_databricks_spark.sources.laketable import (
        _live_data, _posdel_entries)

    for rival_op, expect_conflict in (("append", False), ("compact", True)):
        t1, t2 = _pair(spark, warehouse, name=f"pdc_{rival_op}", n_buckets=1)
        t1.append(seq_rows(spark, range(0, 30)))
        t1.delete_where({"doc_id": ("doc00000002", "doc00000004")}, mode="mor")
        t1.delete_where({"doc_id": ("doc00000010", "doc00000012")}, mode="mor")
        assert t1.posdel_file_count() == 2
        # stage compact_posdels' commit, then let the rival win the head
        base = t1.manifest()
        pds = _posdel_entries(base.files)
        live = sorted({os.path.basename(f["path"])
                       for f in _live_data(base.files)})
        targets = sorted(set().union(*(p["targets"] for p in pds)) & set(live))
        keep = [f for f in base.files if f.get("kind") != "posdel"]
        pd_df = (t1._posdel_df(pds)
                 .filter(F.col("_file").isin(targets)).distinct())
        new = t1._write_posdel_files(pd_df, targets)
        if rival_op == "append":
            t2.append(seq_rows(spark, range(30, 35)))
        else:  # rewrites the targeted data files -> our pairs would dangle
            t2.compact(min_files_per_bucket=1)
        if expect_conflict:
            with pytest.raises(CommitConflict):
                t1._commit(base, keep + new,
                           {"operation": "compact_posdels"})
        else:
            m = t1._commit(base, keep + new, {"operation": "compact_posdels"})
            assert m.properties["commit_retries"] == 1
            assert t1.posdel_file_count() == 1
            got = {r["doc_id"] for r in t1.read().collect()}
            assert got == {f"doc{i:08d}" for i in range(35)
                           if i not in (2, 3, 4, 10, 11, 12)}


# ---- full-op merge races (plan->commit window + key-disjoint commute) ----

from embulk_output_databricks_spark.plans.merge import merge_apply  # noqa: E402


def _merge_race_pair(spark, warehouse, name):
    """Same-bucket table with per-slice files of disjoint doc_id ranges,
    two handles; merges are file-pruned so concurrent merges on disjoint
    key bands remove disjoint files of the SAME bucket."""
    t1, t2 = _pair(spark, f"{warehouse}/{name}", name, n_buckets=1)
    for lo in (0, 100, 200):
        t1.append(seq_rows(spark, range(lo, lo + 100)))
    return t1, t2


def _racing(t1, t2, rival_batch):
    """Interleave deterministically: t2's merge lands between t1's merge
    PLANNING read and its commit (t1.replace_files wrapped)."""
    real = t1.replace_files

    def wrapped(sel, df, props=None, **kw):
        t1.replace_files = real  # rival races only the first commit
        merge_apply(t2, rival_batch, ["doc_id"])
        return real(sel, df, props, **kw)

    t1.replace_files = wrapped


def test_merge_race_disjoint_keys_commutes(spark, warehouse):
    t1, t2 = _merge_race_pair(spark, warehouse, "mc")
    _racing(t1, t2, seq_rows(spark, range(100, 110), src="rival"))
    m = merge_apply(t1, seq_rows(spark, range(0, 10), src="mine"), ["doc_id"])
    # t1's commit lost the head race, rebased, and the rival's added file
    # (keys 100-109, bounds-disjoint from t1's staged 0-9) commuted
    assert m.properties["commit_retries"] == 1
    by_src = {}
    for r in t1.read().collect():
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert by_src["mine"] == {f"doc{i:08d}" for i in range(10)}
    assert by_src["rival"] == {f"doc{i:08d}" for i in range(100, 110)}
    assert t1.row_count() == 300


def test_merge_race_same_file_conflicts(spark, warehouse):
    t1, t2 = _merge_race_pair(spark, warehouse, "ms")
    # rival rewrites the SAME key band -> same file in both read-sets
    _racing(t1, t2, seq_rows(spark, range(5, 15), src="rival"))
    with pytest.raises(CommitConflict, match="rewrote files"):
        merge_apply(t1, seq_rows(spark, range(0, 10), src="mine"), ["doc_id"])


def test_merge_race_overlapping_insert_conflicts(spark, warehouse):
    t1, t2 = _merge_race_pair(spark, warehouse, "mi")
    # both writers INSERT doc 900: the rival's added file provably holds
    # t1's staged key, so the histories do not commute
    _racing(t1, t2, seq_rows(spark, [900, 901], src="rival"))
    with pytest.raises(CommitConflict, match="bucket this"):
        merge_apply(t1, seq_rows(spark, [900, 0], src="mine"), ["doc_id"])


def test_merge_race_without_key_proof_conflicts(spark, warehouse):
    # file pruning off -> no staged-key values travel with the commit ->
    # a rival append into the rewritten bucket must conservatively conflict
    t1, t2 = _merge_race_pair(spark, warehouse, "mn")
    _racing(t1, t2, seq_rows(spark, range(100, 110), src="rival"))
    # the unpruned merge READ every file of the bucket, so the rival's
    # (file-pruned) rewrite overlaps its read-set
    with pytest.raises(CommitConflict, match="rewrote files|bucket this"):
        merge_apply(t1, seq_rows(spark, range(0, 10), src="mine"),
                    ["doc_id"], file_prune=False)
