"""Merge-on-read (MOR) apply strategy: delta appends + read-side resolution
+ compaction (sources/laketable.py append_delta/compact_deltas,
plans/merge.py merge_apply_mor). Final-state semantics must be identical to
copy-on-write, which is itself pinned to the python oracle."""

import pytest

from embulk_output_databricks_spark.config import ConfigError, JobConfig
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.replay import ReplayDriver
from embulk_output_databricks_spark.streaming.replay import EvolutionOp, InjectedCrash
from embulk_output_databricks_spark.synth import synth_binlog
from tests.test_replay import python_oracle, table_state


def _cfg(**kw):
    kw.setdefault("mode", "merge")
    kw.setdefault("merge_strategy", "mor")
    kw.setdefault("n_buckets", 4)
    return JobConfig(**kw)


def test_mor_matches_oracle_and_cow(spark, warehouse):
    binlog = synth_binlog(spark, 1500, 100, 500, hot_frac=0.1, delete_frac=0.1).cache()
    oracle = python_oracle([r.asDict() for r in binlog.collect()])
    mor = ReplayDriver(LakeCatalog(spark, f"{warehouse}/mor"), _cfg())
    mor.replay(binlog)
    assert mor.table.delta_file_count() > 0  # appends, no bucket rewrites
    assert table_state(mor.table) == oracle
    cow = ReplayDriver(LakeCatalog(spark, f"{warehouse}/cow"),
                       _cfg(merge_strategy="cow"))
    cow.replay(binlog)
    assert table_state(cow.table) == table_state(mor.table)
    binlog.unpersist()


def test_mor_compaction_preserves_state(spark, warehouse):
    binlog = synth_binlog(spark, 900, 60, 300, delete_frac=0.1).cache()
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/c"), _cfg())
    drv.replay(binlog)
    before = table_state(drv.table)
    assert drv.table.compact_deltas() is not None
    assert drv.table.delta_file_count() == 0
    assert table_state(drv.table) == before
    assert drv.table.compact_deltas() is None  # nothing left to fold
    # deltas continue to work on top of the compacted base
    more = synth_binlog(spark, 300, 60, 300, start=900)
    drv.run_batch(more, 3)
    oracle = python_oracle(
        [r.asDict() for r in binlog.collect()] + [r.asDict() for r in more.collect()])
    assert table_state(drv.table) == oracle
    binlog.unpersist()


def test_mor_auto_compact_every(spark, warehouse):
    binlog = synth_binlog(spark, 1200, 80, 300, delete_frac=0.05).cache()
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/a"),
                       _cfg(mor_compact_every=2))
    drv.replay(binlog)  # 4 batches -> compactions after batch 1 and 3
    assert drv.table.delta_file_count() == 0
    assert table_state(drv.table) == python_oracle(
        [r.asDict() for r in binlog.collect()])
    binlog.unpersist()


def test_mor_fence_and_crash_reconcile(spark, warehouse):
    binlog = synth_binlog(spark, 600, 40, 300).cache()
    cat = LakeCatalog(spark, f"{warehouse}/f")
    drv = ReplayDriver(cat, _cfg())
    drv.run_batch(binlog.filter("batch_id = 0"), 0)
    with pytest.raises(InjectedCrash):
        drv.run_batch(binlog.filter("batch_id = 1"), 1, crash_before_checkpoint=True)
    drv2 = ReplayDriver(cat, _cfg())  # restart: reconcile from snapshot props
    assert drv2.ckpt.is_committed(1) and drv2.ckpt.read(1).get("recovered")
    assert drv2.replay(binlog) == []  # everything fenced
    assert table_state(drv2.table) == python_oracle(
        [r.asDict() for r in binlog.collect()])
    binlog.unpersist()


def test_mor_schema_evolution_mid_replay(spark, warehouse):
    binlog = synth_binlog(spark, 600, 50, 200, delete_frac=0.0).cache()
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/e"), _cfg())
    plan = {1: [EvolutionOp("add", name="lang", type="string")],
            2: [EvolutionOp("rename", old="source", new="origin")]}
    drv.replay(binlog, evolution_plan=plan)
    df = drv.table.read()
    assert "lang" in df.columns and "origin" in df.columns
    oracle = python_oracle([r.asDict() for r in binlog.collect()])
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["origin"])
           for r in df.collect()}
    assert got == oracle
    binlog.unpersist()


def test_mor_clean_buckets_bypass_resolution(spark, warehouse):
    """After compaction, a delta touching ONE key must not re-shuffle the
    other buckets: their base files are unioned in directly. State must
    still match the oracle exactly."""
    from pyspark.sql import functions as F

    binlog = synth_binlog(spark, 800, 60, 800, delete_frac=0.05).cache()
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/cb"), _cfg(n_buckets=8))
    drv.replay(binlog)
    drv.table.compact_deltas()
    one_doc = synth_binlog(spark, 40, 60, 40, delete_frac=0.0, start=800) \
        .withColumn("doc_id", F.lit("doc00000007"))
    drv.run_batch(one_doc, 1)
    hot = {f["bucket"] for f in drv.table.manifest().files
           if f.get("kind") == "delta"}
    assert len(hot) == 1  # a single bucket holds deltas
    oracle = python_oracle(
        [r.asDict() for r in binlog.collect()]
        + [r.asDict() for r in one_doc.collect()])
    assert table_state(drv.table) == oracle
    binlog.unpersist()


import pytest as _pytest


@_pytest.mark.parametrize("thresh", [10**9, 0])
def test_mor_compaction_broadcast_and_shuffle_paths_agree(spark, warehouse, thresh):
    """compact_deltas folds via the broadcast plan (small backlog) or the
    resolved-read shuffle (large); both must produce the same state."""
    binlog = synth_binlog(spark, 900, 60, 300, delete_frac=0.1).cache()
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/cp{thresh}"), _cfg())
    drv.replay(binlog)
    before = table_state(drv.table)
    assert drv.table.compact_deltas(broadcast_threshold_rows=thresh) is not None
    assert drv.table.delta_file_count() == 0
    assert table_state(drv.table) == before == python_oracle(
        [r.asDict() for r in binlog.collect()])
    binlog.unpersist()


def test_mor_changelog_between_snapshots(spark, warehouse):
    """changelog(v1, v2) returns exactly the interval's delta rows with op
    and commit sequence — an applyable upsert/delete feed."""
    binlog = synth_binlog(spark, 600, 40, 200, delete_frac=0.1).cache()
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/cl"), _cfg())
    drv.run_batch(binlog.filter("batch_id = 0"), 0)
    v1 = drv.table.current_version()
    drv.run_batch(binlog.filter("batch_id = 1"), 1)
    drv.run_batch(binlog.filter("batch_id = 2"), 2)
    feed = drv.table.changelog(v1).collect()
    assert {"__op", "__dseq"} <= set(feed[0].asDict())
    assert {r["__dseq"] for r in feed} == {v1 + 1, v1 + 2}
    # the feed is the LWW-deduped slice of batches 1-2 (one row per key/batch)
    from embulk_output_databricks_spark.operators.lww import lww_dedup

    want = lww_dedup(binlog.filter("batch_id in (1, 2)"),
                     keys=["doc_id", "batch_id"]).count()
    assert len(feed) == want
    # replaying the feed onto a copy of snapshot v1 reproduces the table
    state_v1 = {r["doc_id"]: r for r in drv.table.read(version=v1).collect()}
    for r in sorted(feed, key=lambda r: r["__dseq"]):
        if r["__op"] == "D":
            state_v1.pop(r["doc_id"], None)
        else:
            state_v1[r["doc_id"]] = r
    got = {d: (list(r["tokens"]), r["n_tok"], r["source"])
           for d, r in state_v1.items()}
    assert got == table_state(drv.table)
    binlog.unpersist()


def test_mor_rejects_merge_rules(spark):
    with pytest.raises(ConfigError, match="merge_rules"):
        JobConfig(mode="merge", merge_strategy="mor",
                  merge_rules={"value": "T.value + S.value"})


def test_mor_rejects_non_merge_key_bucketing(spark, warehouse):
    """Deltas must co-locate with their base rows: bucketing by a non-key
    column would leave stale base rows in 'clean' buckets."""
    from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA

    cat = LakeCatalog(spark, f"{warehouse}/bk")
    tbl = cat.create_table("t", SEQUENCES_SCHEMA, n_buckets=4,
                           bucket_key="source")
    df = synth_binlog(spark, 10, 5, 10).select(
        "doc_id", "tokens", "n_tok", "source")
    with pytest.raises(ValueError, match="bucket key"):
        tbl.append_delta(df, merge_keys=["doc_id"])


def test_added_rows_refuses_mor_interval(spark, warehouse):
    """added_rows would strip the op envelope and surface deletes as
    upserts; it must refuse and point at changelog()."""
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/ar"), _cfg())
    drv.run_batch(synth_binlog(spark, 200, 20, 200), 0)
    v1 = drv.table.current_version()
    drv.run_batch(synth_binlog(spark, 200, 20, 200, start=200), 1)
    with pytest.raises(ValueError, match="changelog"):
        drv.table.added_rows(v1)
    assert drv.table.changelog(v1).count() > 0


def test_auto_compact_counts_applied_batches_not_ids(spark, warehouse):
    """Sparse batch ids (e.g. even-only) must still compact every N applies."""
    binlog = synth_binlog(spark, 600, 40, 150)  # batch ids 0..3
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/sp"),
                       _cfg(mor_compact_every=2))
    # apply only even ids: (id+1) % 2 == 1 forever under id-arithmetic
    from pyspark.sql import functions as F

    for b in (0, 2):
        drv.run_batch(binlog.filter(F.col("batch_id") == b), b)
    assert drv.table.delta_file_count() == 0  # compacted after 2 applies


# ---- bounds-based clean/dirty split (_mor_split key-disjoint proof) ----

from pyspark.sql import types as T  # noqa: E402

from embulk_output_databricks_spark.plans.merge import merge_apply_mor  # noqa: E402
from embulk_output_databricks_spark.sources.laketable import LakeTable  # noqa: E402

_KV = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _ranged_table(spark, warehouse, name="t", slices=(0, 100, 200, 300)):
    """One bucket, one file per disjoint key-range slice — footer bounds
    can prove a delta key-disjoint from the cold files."""
    cat = LakeCatalog(spark, f"{warehouse}/morsplit")
    t = cat.create_table(name, _KV, n_buckets=1, bucket_key="k",
                         properties={"merge_keys": "k"})
    for lo in slices:
        t.append(spark.createDataFrame(
            [(i, f"v{i}") for i in range(lo, lo + 100)], _KV))
    return t


def test_mor_split_bounds_prove_cold_files_clean(spark, warehouse):
    t = _ranged_table(spark, warehouse)
    merge_apply_mor(t, spark.createDataFrame(
        [(i, f"M{i}") for i in range(5)], _KV), ["k"])
    m = t.manifest()
    deltas = [f for f in m.files if f.get("kind") == "delta"]
    clean, dirty = LakeTable._mor_split(m, m.files, deltas)
    # the delta spans keys 0..4: only the 0..99 file pays resolution
    assert len(clean) == 3 and len(dirty) == 1
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert got == ({(i, f"M{i}") for i in range(5)}
                   | {(i, f"v{i}") for i in range(5, 400)})


def test_mor_split_delete_only_dirties_overlapping_file(spark, warehouse):
    t = _ranged_table(spark, warehouse, "d")
    sch = T.StructType(list(_KV.fields) + [T.StructField("op", T.StringType())])
    merge_apply_mor(t, spark.createDataFrame([(350, None, "D")], sch), ["k"])
    m = t.manifest()
    deltas = [f for f in m.files if f.get("kind") == "delta"]
    clean, dirty = LakeTable._mor_split(m, m.files, deltas)
    assert len(clean) == 3 and len(dirty) == 1
    ks = {r["k"] for r in t.read().collect()}
    assert 350 not in ks and len(ks) == 399


def test_mor_split_null_keys_stay_conservative(spark, warehouse):
    t = _ranged_table(spark, warehouse, "n", slices=(0,))
    # a base file whose key column contains a NULL (not null-free)
    t.append(spark.createDataFrame([(None, "base-null"), (500, "v500")], _KV))
    # delta with a NULL key and a far-away range: bounds are disjoint from
    # the NULL-holding file's [500,500], but NULL==NULL must still match
    merge_apply_mor(t, spark.createDataFrame(
        [(None, "delta-null"), (900, "v900")], _KV), ["k"])
    m = t.manifest()
    deltas = [f for f in m.files if f.get("kind") == "delta"]
    clean, dirty = LakeTable._mor_split(m, m.files, deltas)
    # the NULL-holding base file must NOT be proven clean
    assert any(f["rows"] == 2 for f in dirty)
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert (None, "delta-null") in got and (None, "base-null") not in got
    assert (500, "v500") in got and (900, "v900") in got


def test_mor_compaction_folds_only_overlapping_files(spark, warehouse):
    t = _ranged_table(spark, warehouse, "f")
    cold = {f["path"] for f in t.manifest().files
            if f.get("stats", {}).get("k", [0, 0])[0] >= 100}
    merge_apply_mor(t, spark.createDataFrame(
        [(7, "M7")], _KV), ["k"])
    t.compact_deltas()
    m = t.manifest()
    assert not any(f.get("kind") == "delta" for f in m.files)
    # the three cold files survived the fold byte-identical
    assert cold <= {f["path"] for f in m.files}
    got = {(r["k"], r["v"]) for r in t.read().collect()}
    assert (7, "M7") in got and len(got) == 400
