"""Two-tier snapshot metadata (Iceberg manifest-list analog): a commit
writes only the file entries it ADDED (one immutable segment) plus a
tombstone list, not the full table listing — commit IO is O(changed
files). Chains and tombstone sets fold back into a single segment past a
threshold (rewrite_manifests analog), and expire+orphan maintenance
GCs unreachable segments."""

import json
import os

from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from tests.test_laketable import seq_rows


def _mdir(t):
    return t._meta()


def _vjson(t, v=None):
    v = t.current_version() if v is None else v
    with open(t._meta(f"v{v:012d}.json")) as f:
        return json.load(f)


def test_commit_writes_only_the_delta(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    for i in range(10):
        t.append(seq_rows(spark, range(i * 10, i * 10 + 10)))
    d = _vjson(t)
    assert d["files"] is None  # listing lives in segments, not the snapshot
    assert len(d["segments"]) == 10  # one per append
    last_seg = t._read_segment(d["segments"][-1])
    assert len(last_seg) == 2  # ONLY the files the last commit added
    assert t.row_count() == 100  # materialized listing is complete
    assert len(t.manifest().files) == 20


def test_tombstone_growth_folds(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    t._FOLD_REMOVED_MIN = 0  # drop the small-table floor so folds trigger here
    t.append(seq_rows(spark, range(200)))
    # each overwrite tombstones the previous generation: removed outgrows
    # files//2 immediately -> every such commit folds to one fresh segment
    for i in range(3):
        t.overwrite(seq_rows(spark, range(i * 5, i * 5 + 5), src=f"g{i}"))
    d = _vjson(t)
    # the policy invariant: tombstones stay bounded by the fold threshold
    # (zero right after a fold, never more than max(floor, files//2))
    n_files = len(t.manifest().files)
    assert len(d["removed"]) <= max(t._FOLD_REMOVED_MIN, n_files // 2)
    assert len(d["segments"]) <= 2  # folds kept the chain short
    assert {r["source"] for r in t.read().collect()} == {"g2"}


def test_long_chain_folds(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=1, bucket_key="doc_id")
    for i in range(40):  # > _FOLD_SEGMENTS appends of one file each
        t.append(seq_rows(spark, [i]))
    d = _vjson(t)
    assert len(d["segments"]) <= t._FOLD_SEGMENTS + 1
    assert t.row_count() == 40


def test_legacy_inline_manifest_upgrades_in_place(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    t.append(seq_rows(spark, range(20)))
    # simulate a pre-segment-era snapshot: full inline file listing
    m = t.manifest()
    legacy = {k: v for k, v in _vjson(t).items()
              if k not in ("segments", "removed")}
    legacy["files"] = m.files
    legacy["version"] = m.version + 1
    legacy["parent"] = m.version
    with open(t._meta(f"v{legacy['version']:012d}.json"), "w") as f:
        json.dump(legacy, f)
    with open(t._meta("CURRENT"), "w") as f:
        f.write(str(legacy["version"]))
    assert t.row_count() == 20  # inline listing still loads
    t.append(seq_rows(spark, range(100, 110)))  # commit on a legacy parent
    d = _vjson(t)
    assert d["files"] is None and len(d["segments"]) == 1  # folded forward
    assert t.row_count() == 30


def test_expire_then_orphan_gc_reclaims_segments(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    for i in range(5):
        t.overwrite(seq_rows(spark, range(i * 3, i * 3 + 3), src=f"g{i}"))
    rows = {(r["doc_id"], r["source"]) for r in t.read().collect()}
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files()
    on_disk = {fn for fn in os.listdir(_mdir(t)) if fn.startswith("seg-")}
    live = set(_vjson(t)["segments"])
    assert on_disk == live  # every unreachable segment reclaimed
    assert {(r["doc_id"], r["source"]) for r in t.read().collect()} == rows
