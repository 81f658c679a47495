"""Row lineage (Iceberg v3 row-id analog): every data/delta file gets a
first_row_id ("fr") at commit time from the manifest's next_row_id counter;
a row's _row_id = coalesce(physical __row_id, fr + position). Rewrites
(compact, COW merge/update/delete, MOR fold, MOR update re-append) carry
ids by materializing __row_id; NULL ids in a carried file (merge inserts)
inherit fr + position — the v3 null-inheritance rule.

The reference has no row-identity concept at all (each Embulk run is a
fire-and-forget bulk load, README.md:50-69); lineage is what lets a
100 TB training pipeline attribute any sample back to the exact ingest
batch and survive compaction-heavy table maintenance.
"""

from pyspark.sql import Row, functions as F

from embulk_output_databricks_spark.plans.merge import merge_apply, merge_apply_mor
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.sources.laketable import LAST_SEQ, ROW_ID
from tests.test_concurrency import _stale_append
from tests.test_laketable import seq_rows


def _tbl(spark, warehouse, name="rid", **kw):
    cat = LakeCatalog(spark, warehouse)
    kw.setdefault("n_buckets", 2)
    kw.setdefault("bucket_key", "doc_id")
    return cat.create_table(name, SEQUENCES_SCHEMA, **kw)


def _ids(t, **kw):
    rows = t.read(with_row_ids=True, **kw).select("doc_id", ROW_ID).collect()
    return {r["doc_id"]: r[ROW_ID] for r in rows}


def _staged(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=d, tokens=tok, n_tok=len(tok) if tok else None,
             source=None if op == "D" else "s", op=op) for d, tok, op in rows],
        "doc_id string, tokens array<int>, n_tok int, source string, op string")


def test_append_assigns_contiguous_unique_ids(spark, warehouse):
    t = _tbl(spark, warehouse)
    t.append(seq_rows(spark, range(0, 7)))
    ids = _ids(t)
    assert sorted(ids.values()) == list(range(7))
    # second append continues the counter — no reuse, prior ids stable
    t.append(seq_rows(spark, range(7, 12)))
    ids2 = _ids(t)
    assert sorted(ids2.values()) == list(range(12))
    assert all(ids2[d] == v for d, v in ids.items())
    assert t.manifest().next_row_id == 12
    # ids are versioned facts: time travel reproduces the old view
    assert _ids(t, version=1) == ids
    # plain read stays clean — lineage is opt-in
    assert ROW_ID not in t.read().columns


def test_files_metadata_exposes_first_row_id(spark, warehouse):
    t = _tbl(spark, warehouse)
    t.append(seq_rows(spark, range(0, 9)))
    rows = t.files().select("rows", "first_row_id").collect()
    starts = sorted(r["first_row_id"] for r in rows)
    assert starts[0] == 0
    # fr ranges tile [0, total) without overlap
    spans = sorted((r["first_row_id"], r["rows"]) for r in rows)
    nxt = 0
    for fr, n in spans:
        assert fr == nxt
        nxt += n
    assert nxt == 9


def test_cow_merge_preserves_update_ids_and_mints_insert_ids(spark, warehouse):
    t = _tbl(spark, warehouse)
    t.append(seq_rows(spark, range(0, 6)))
    before = _ids(t)
    staged = _staged(spark, [
        ("doc00000001", [9, 9], "U"),      # update
        ("doc00000002", None, "D"),        # delete
        ("docNEW00001", [1], "U"),         # insert
    ])
    merge_apply(t, staged, keys=["doc_id"])
    after = _ids(t)
    assert after["doc00000001"] == before["doc00000001"]  # identity continues
    assert "doc00000002" not in after
    assert after["docNEW00001"] >= 6                      # minted fresh
    kept = {d for d in before if d != "doc00000002"}
    assert all(after[d] == before[d] for d in kept)
    assert len(set(after.values())) == len(after)


def test_cow_merge_both_plans_carry(spark, warehouse):
    # same staged batch through the broadcast and the shuffle plan: ids of
    # carried rows must agree (inserts mint per-plan, so compare carried)
    for thresh, name in ((10**6, "bc"), (0, "sh")):
        t = _tbl(spark, warehouse, name=name)
        t.append(seq_rows(spark, range(0, 5)))
        before = _ids(t)
        staged = _staged(spark, [("doc00000000", [7], "U"),
                                 ("docNEW00001", [8], "U")])
        merge_apply(t, staged, keys=["doc_id"], broadcast_threshold_rows=thresh)
        after = _ids(t)
        assert all(after[d] == before[d] for d in before), name
        assert len(set(after.values())) == len(after), name


def test_compact_preserves_ids(spark, warehouse):
    t = _tbl(spark, warehouse)
    t.append(seq_rows(spark, range(0, 4)))
    t.append(seq_rows(spark, range(4, 8)))
    before = _ids(t)
    assert t.compact(min_files_per_bucket=1) is not None
    assert _ids(t) == before
    # and through a clustered (sorted, split) compaction too
    t2 = _tbl(spark, warehouse, name="rid2")
    t2.append(seq_rows(spark, range(0, 8)))
    b2 = _ids(t2)
    t2.compact(min_files_per_bucket=1, cluster_by=["doc_id"], rows_per_file=2)
    assert _ids(t2) == b2


def test_mor_delta_rows_get_ids_and_fold_carries(spark, warehouse):
    t = _tbl(spark, warehouse)
    t.append(seq_rows(spark, range(0, 4)))
    base_ids = _ids(t)
    merge_apply_mor(t, _staged(spark, [("doc00000001", [5], "U"),
                                       ("docNEW00001", [6], "U")]),
                    keys=["doc_id"])
    ids = _ids(t)
    # the delta winner carries the DELTA row's own id (a new row version),
    # untouched base rows keep theirs
    assert ids["doc00000001"] >= 4
    assert ids["docNEW00001"] >= 4
    assert ids["doc00000000"] == base_ids["doc00000000"]
    assert len(set(ids.values())) == len(ids)
    # folding deltas into base files preserves the resolved ids
    t.compact_deltas()
    assert t.delta_file_count() == 0
    assert _ids(t) == ids


def test_update_where_cow_and_mor_preserve_ids(spark, warehouse):
    for mode in ("cow", "mor"):
        t = _tbl(spark, warehouse, name=f"upd_{mode}", n_buckets=1)
        t.append(seq_rows(spark, range(0, 6)))
        before = _ids(t)
        t.update_where({"doc_id": ("doc00000002", "doc00000004")},
                       {"source": "'patched'"}, mode=mode)
        after = _ids(t)
        assert after == before, mode  # UPDATE never mints or drops rows
        patched = {r["doc_id"] for r in t.read().collect()
                   if r["source"] == "patched"}
        assert patched == {f"doc{i:08d}" for i in (2, 3, 4)}, mode


def test_delete_where_preserves_survivor_ids(spark, warehouse):
    t = _tbl(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 10)))
    before = _ids(t)
    t.delete_where({"doc_id": ("doc00000003", "doc00000005")})
    after = _ids(t)
    gone = {f"doc{i:08d}" for i in (3, 4, 5)}
    assert set(after) == set(before) - gone
    assert all(after[d] == before[d] for d in after)


def test_concurrent_appends_rebase_renumbers(spark, warehouse):
    # both writers stamped their files from the same base counter; the
    # loser's rebase must re-stamp so id ranges never collide
    cat = LakeCatalog(spark, warehouse)
    t1 = cat.create_table("race", SEQUENCES_SCHEMA, n_buckets=2,
                          bucket_key="doc_id")
    t2 = cat.load("race")
    t1.append(seq_rows(spark, range(0, 5)))
    base, files = _stale_append(t1, seq_rows(spark, range(5, 10)))
    t2.append(seq_rows(spark, range(10, 15)))  # rival wins the head
    m = t1._commit(base, files, {"operation": "append"})
    assert m.properties["commit_retries"] == 1
    ids = _ids(t1)
    assert len(ids) == 15
    assert sorted(ids.values()) == list(range(15))  # contiguous, no overlap


def test_empty_table_read_has_row_id_column(spark, warehouse):
    t = _tbl(spark, warehouse)
    df = t.read(with_row_ids=True)
    assert ROW_ID in df.columns
    assert LAST_SEQ in df.columns
    assert df.count() == 0


# ---- _last_updated_sequence_number analog (second half of v3 lineage) ----


def _ls(t, **kw):
    rows = t.read(with_row_ids=True, **kw).select("doc_id", LAST_SEQ).collect()
    return {r["doc_id"]: r[LAST_SEQ] for r in rows}


def test_append_stamps_commit_seq(spark, warehouse):
    t = _tbl(spark, warehouse)
    t.append(seq_rows(spark, range(0, 4)))
    v1 = t.current_version()
    t.append(seq_rows(spark, range(4, 8)))
    v2 = t.current_version()
    ls = _ls(t)
    assert all(ls[f"doc{i:08d}"] == v1 for i in range(4))
    assert all(ls[f"doc{i:08d}"] == v2 for i in range(4, 8))


def test_cow_merge_bumps_updated_and_inserted_only(spark, warehouse):
    for thresh, name in ((10**6, "lsbc"), (0, "lssh")):
        t = _tbl(spark, warehouse, name=name)
        t.append(seq_rows(spark, range(0, 6)))
        v1 = t.current_version()
        merge_apply(t, _staged(spark, [("doc00000001", [9], "U"),
                                       ("docNEW00001", [1], "U")]),
                    keys=["doc_id"], broadcast_threshold_rows=thresh)
        v2 = t.current_version()
        ls = _ls(t)
        assert ls["doc00000001"] == v2, name   # updated: bumped
        assert ls["docNEW00001"] == v2, name   # inserted: this commit
        others = {d: s for d, s in ls.items()
                  if d not in ("doc00000001", "docNEW00001")}
        assert set(others.values()) == {v1}, name  # untouched: kept


def test_compact_and_delete_preserve_last_seq(spark, warehouse):
    t = _tbl(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 4)))
    t.append(seq_rows(spark, range(4, 8)))
    before = _ls(t)
    t.compact(min_files_per_bucket=1)
    assert _ls(t) == before            # maintenance is not an update
    t.delete_where({"doc_id": ("doc00000002", "doc00000003")})
    after = _ls(t)
    assert after == {d: s for d, s in before.items()
                     if d not in ("doc00000002", "doc00000003")}


def test_update_where_bumps_matched_rows(spark, warehouse):
    for mode in ("cow", "mor"):
        t = _tbl(spark, warehouse, name=f"lsupd_{mode}", n_buckets=1)
        t.append(seq_rows(spark, range(0, 6)))
        before = _ls(t)
        t.update_where({"doc_id": ("doc00000002", "doc00000004")},
                       {"source": "'patched'"}, mode=mode)
        v2 = t.current_version()
        after = _ls(t)
        hit = {f"doc{i:08d}" for i in (2, 3, 4)}
        assert all(after[d] == v2 for d in hit), mode
        assert all(after[d] == before[d] for d in after if d not in hit), mode


def test_changed_since_row_exact_and_file_pruned(spark, warehouse):
    t = _tbl(spark, warehouse)
    t.append(seq_rows(spark, range(0, 6)))
    v1 = t.current_version()
    t.append(seq_rows(spark, range(6, 9)))
    # only the second append's rows, and only its FILES are scanned
    ch = t.changed_since(v1)
    assert {r["doc_id"] for r in ch.collect()} == {
        f"doc{i:08d}" for i in range(6, 9)}
    v1_files = {f["path"] for f in t.manifest(v1).files}
    scanned = {p.split(t.root + "/")[-1] for p in ch.inputFiles()}
    assert not scanned & v1_files
    # a COW merge: the feed is row-exact (added_rows would replay the
    # whole rewritten bucket), and carried rows stay excluded after compact
    v2 = t.current_version()
    merge_apply(t, _staged(spark, [("doc00000001", [9], "U"),
                                   ("docNEW00001", [1], "U")]),
                keys=["doc_id"])
    changed = {r["doc_id"] for r in t.changed_since(v2).collect()}
    assert changed == {"doc00000001", "docNEW00001"}
    t.compact(min_files_per_bucket=1)
    assert {r["doc_id"] for r in t.changed_since(v2).collect()} == changed
    # floor at the head -> empty; floor 0 -> everything
    assert t.changed_since(t.current_version()).count() == 0
    assert t.changed_since(0).count() == 10


def test_changed_since_mor_old_delta_still_wins(spark, warehouse):
    # an OLD delta must not be pruned out of the resolution: it can beat a
    # newer base append (base rows rank dseq=0), and the feed must agree
    # with the full read on every emitted row
    t = _tbl(spark, warehouse, n_buckets=1)
    t.append(seq_rows(spark, range(0, 3)))
    merge_apply_mor(t, _staged(spark, [("doc00000001", [7, 7], "U")]),
                    keys=["doc_id"])
    v_delta = t.current_version()
    t.append(seq_rows(spark, range(1, 2)))  # newer base row, same key: loses
    full = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert full["doc00000001"] == [7, 7]
    ch = {r["doc_id"]: r["tokens"] for r in t.changed_since(v_delta).collect()}
    # the re-appended base row is hidden by the older delta winner, whose
    # own _last_seq <= floor: nothing changed since v_delta
    assert ch == {}
    ch0 = {r["doc_id"]: r["tokens"] for r in t.changed_since(0).collect()}
    assert ch0 == full


def test_mor_delta_winner_carries_its_commit_seq(spark, warehouse):
    t = _tbl(spark, warehouse)
    t.append(seq_rows(spark, range(0, 4)))
    v1 = t.current_version()
    merge_apply_mor(t, _staged(spark, [("doc00000001", [5], "U"),
                                       ("docNEW00001", [6], "U")]),
                    keys=["doc_id"])
    v2 = t.current_version()
    ls = _ls(t)
    assert ls["doc00000001"] == v2     # winner is the delta row
    assert ls["docNEW00001"] == v2
    assert ls["doc00000000"] == v1     # base loser rows untouched
    t.compact_deltas()                 # fold materializes, values stable
    assert _ls(t) == ls
