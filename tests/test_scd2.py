"""SCD2 (type-2) history maintenance: full per-key version history from a
CDC stream — the history the reference's UPDATE-in-place merge destroys
(DatabricksOutputConnection.java:180-232).

Oracle: pandas/SQL-style recompute — for each key, events ordered by
(ts, tie); every non-delete event is a version row with valid_to = the
next event's ts (any op), open when none follows.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.scd2 import (
    IS_CURRENT, VALID_FROM, VALID_TO, ensure_scd2, scd2_apply, scd2_as_of,
    scd2_current)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("tie", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("op", T.StringType()),
])


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, ts, tie, v, op) for (k, ts, tie, v, op) in rows], SCHEMA)


def _oracle(all_rows):
    """Reference recompute: per key, sort by (ts, tie); non-delete events
    become (k, ts, tie, v, valid_from, valid_to, is_current)."""
    out = []
    keys = {r[0] for r in all_rows}
    for k in sorted(keys):
        evs = sorted([r for r in all_rows if r[0] == k],
                     key=lambda r: (r[1], r[2]))
        for i, (kk, ts, tie, v, op) in enumerate(evs):
            if op == "D":
                continue
            nxt = evs[i + 1][1] if i + 1 < len(evs) else None
            out.append((kk, ts, tie, v, ts, nxt, nxt is None))
    return sorted(out)


def _state(tbl):
    return sorted(tuple(r) for r in tbl.read().select(
        "k", "ts", "tie", "v", VALID_FROM, VALID_TO, IS_CURRENT).collect())


def _mk(spark, warehouse, name="hist"):
    cat = LakeCatalog(spark, warehouse)
    return ensure_scd2(cat, name, SCHEMA, keys=["k"], ts_col="ts",
                       n_buckets=2)


def test_scd2_multi_batch_chaining(spark, warehouse):
    """Three ordered batches: versions chain across batch boundaries — the
    open row closes at the NEXT batch's first event for its key; final
    history equals the single-pass oracle over all events."""
    t = _mk(spark, warehouse)
    b1 = [(1, 10, 100, "a", "U"), (2, 10, 101, "x", "U"),
          (1, 20, 102, "b", "U")]
    b2 = [(1, 30, 200, "c", "U"), (3, 30, 201, "n", "U")]
    b3 = [(2, 40, 300, "y", "U")]
    for b in (b1, b2, b3):
        scd2_apply(t, _df(spark, b), keys=["k"], ts_col="ts", tie_col="tie")
    assert _state(t) == _oracle(b1 + b2 + b3)
    cur = {(r["k"], r["v"]) for r in scd2_current(t).collect()}
    assert cur == {(1, "c"), (2, "y"), (3, "n")}


def test_scd2_delete_closes_and_reopen(spark, warehouse):
    """A delete closes the open row without materializing one; a later
    upsert re-opens with a gap — delete-then-recreate renders as two
    disjoint version intervals."""
    t = _mk(spark, warehouse)
    b1 = [(1, 10, 100, "a", "U")]
    b2 = [(1, 20, 200, None, "D")]
    b3 = [(1, 40, 300, "b", "U")]
    for b in (b1, b2, b3):
        scd2_apply(t, _df(spark, b), keys=["k"], ts_col="ts", tie_col="tie")
    assert _state(t) == _oracle(b1 + b2 + b3)
    # the gap: nothing true at ts=30, old version true at ts=15
    assert scd2_as_of(t, 30).count() == 0
    assert [r["v"] for r in scd2_as_of(t, 15).collect()] == ["a"]
    assert [r["v"] for r in scd2_as_of(t, 40).collect()] == ["b"]
    # delete-only key is absent from current state
    b4 = [(1, 50, 400, None, "D")]
    scd2_apply(t, _df(spark, b4), keys=["k"], ts_col="ts", tie_col="tie")
    assert scd2_current(t).count() == 0
    assert _state(t) == _oracle(b1 + b2 + b3 + b4)


def test_scd2_intra_batch_and_ties(spark, warehouse):
    """Several events for one key inside ONE batch chain correctly, and
    equal-ts events order by the tie column (zero-width interval for the
    loser, deterministic winner)."""
    t = _mk(spark, warehouse)
    b1 = [(1, 10, 100, "a", "U"), (1, 10, 101, "b", "U"),
          (1, 20, 102, "c", "U"), (2, 10, 103, "x", "U"),
          (2, 15, 104, None, "D")]
    scd2_apply(t, _df(spark, b1), keys=["k"], ts_col="ts", tie_col="tie")
    assert _state(t) == _oracle(b1)
    # zero-width version: valid_from == valid_to for the tie loser
    zw = [r for r in t.read().collect() if r["tie"] == 100][0]
    assert zw[VALID_FROM] == zw[VALID_TO] == 10


def test_scd2_redelivery_idempotent(spark, warehouse):
    """At-least-once safety: re-applying the SAME batch (and an overlapping
    suffix batch) leaves the history bit-identical — re-sent events rewrite
    their own rows by (key, tie), and the open row is never closed by an
    event at-or-before itself."""
    t = _mk(spark, warehouse)
    b1 = [(1, 10, 100, "a", "U"), (1, 20, 101, "b", "U")]
    b2 = [(1, 20, 101, "b", "U"), (1, 30, 102, "c", "U")]  # overlaps b1
    scd2_apply(t, _df(spark, b1), keys=["k"], ts_col="ts", tie_col="tie")
    scd2_apply(t, _df(spark, b1), keys=["k"], ts_col="ts", tie_col="tie")
    after_dup = _state(t)
    assert after_dup == _oracle(b1)
    scd2_apply(t, _df(spark, b2), keys=["k"], ts_col="ts", tie_col="tie")
    scd2_apply(t, _df(spark, b2), keys=["k"], ts_col="ts", tie_col="tie")
    assert _state(t) == _oracle(b1 + [(1, 30, 102, "c", "U")])


def test_scd2_composite_key_semijoin_path(spark, warehouse):
    """Composite keys exercise the semi-join open-row lookup (the eq_filter
    IN-list fast path is single-key only)."""
    cat = LakeCatalog(spark, warehouse)
    schema = T.StructType([
        T.StructField("k1", T.LongType()),
        T.StructField("k2", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("tie", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    t = ensure_scd2(cat, "h2", schema, keys=["k1", "k2"], ts_col="ts",
                    n_buckets=2)
    b1 = spark.createDataFrame([(1, "a", 10, 1, "p"), (1, "b", 10, 2, "q")],
                               schema)
    b2 = spark.createDataFrame([(1, "a", 20, 3, "r")], schema)
    scd2_apply(t, b1, keys=["k1", "k2"], ts_col="ts", tie_col="tie")
    scd2_apply(t, b2, keys=["k1", "k2"], ts_col="ts", tie_col="tie")
    rows = {(r["k1"], r["k2"], r["tie"]): (r[VALID_TO], r[IS_CURRENT])
            for r in t.read().collect()}
    assert rows == {(1, "a", 1): (20, False), (1, "b", 2): (None, True),
                    (1, "a", 3): (None, True)}


# ---------------- driver integration (cfg.history) ----------------

from embulk_output_databricks_spark.config import ConfigError, JobConfig  # noqa: E402
from embulk_output_databricks_spark.streaming.replay import (  # noqa: E402
    InjectedCrash,
    ReplayDriver,
)
from embulk_output_databricks_spark.synth import synth_binlog  # noqa: E402

HISTORY_CFG = {"name": "versions"}
PAYLOAD = ["doc_id", "n_tok", "source"]


def _hist_oracle(binlog_rows):
    """Per key: events ordered by (seq_lsn, event_id); every non-delete is a
    version closed by the key's next event (any op)."""
    out = []
    by_key: dict = {}
    for r in binlog_rows:
        by_key.setdefault(r["doc_id"], []).append(r)
    for k, evs in by_key.items():
        evs.sort(key=lambda r: (r["seq_lsn"], r["event_id"]))
        for i, e in enumerate(evs):
            if e["op"] == "D":
                continue
            nxt = evs[i + 1]["seq_lsn"] if i + 1 < len(evs) else None
            out.append((k, e["n_tok"], e["source"], e["seq_lsn"], nxt,
                        nxt is None))
    return sorted(out)


def test_driver_maintained_history_tracks_replay(spark, warehouse):
    binlog = synth_binlog(spark, 600, 60, 200, delete_frac=0.1).cache()
    cfg = JobConfig(mode="merge", n_buckets=4, history=HISTORY_CFG)
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/hi"), cfg)
    drv.replay(binlog)
    hist = drv.history[0]
    assert hist.name == "sequences__versions"
    got = sorted(
        (r["doc_id"], r["n_tok"], r["source"], r[VALID_FROM], r[VALID_TO],
         r[IS_CURRENT])
        for r in hist.read().collect())
    assert got == _hist_oracle(binlog.collect())
    # the history's current slice IS the main table's state
    cur = sorted(tuple(r) for r in
                 scd2_current(hist).select(*PAYLOAD).collect())
    base = sorted(tuple(r) for r in drv.table.read().select(*PAYLOAD).collect())
    assert cur == base
    binlog.unpersist()
    with pytest.raises(ConfigError):
        JobConfig(mode="insert", history=HISTORY_CFG)
    with pytest.raises(ConfigError):
        JobConfig(mode="merge", history={})


def test_history_heals_on_fence_hit_and_fences_stale_batches(spark, warehouse):
    """Crash between the reconciled apply commit and the history merge →
    the rerun lands on the fence-hit path and the history catches up there.
    A stale OLD batch redelivered later is fenced out by the consumed-batch
    watermark (re-applying it would reopen closed versions)."""
    b1 = synth_binlog(spark, 300, 40, 300, delete_frac=0.1).cache()
    b2 = synth_binlog(spark, 300, 40, 300, delete_frac=0.1, start=300).cache()
    cfg = JobConfig(mode="merge", n_buckets=4, history=HISTORY_CFG)
    cat = LakeCatalog(spark, f"{warehouse}/hc")
    drv = ReplayDriver(cat, cfg)
    drv.run_batch(b1, 0)
    with pytest.raises(InjectedCrash):
        drv.run_batch(b2, 1, crash_before_checkpoint=True)
    # crash landed after the apply snapshot but before the history merge
    hist = drv.history[0]
    assert hist.manifest().properties["scd2_consumed_batch"] == "0"
    # restart: fence reconciles batch 1 as committed; history heals here
    drv2 = ReplayDriver(cat, cfg)
    assert drv2.run_batch(b2, 1) is None
    hist2 = drv2.history[0]
    assert hist2.manifest().properties["scd2_consumed_batch"] == "1"
    oracle = _hist_oracle(b1.collect() + b2.collect())
    got = sorted(
        (r["doc_id"], r["n_tok"], r["source"], r[VALID_FROM], r[VALID_TO],
         r[IS_CURRENT])
        for r in hist2.read().collect())
    assert got == oracle
    # stale redelivery of batch 0: fence no-op, history untouched
    v_before = hist2.current_version()
    assert drv2.run_batch(b1, 0) is None
    assert hist2.current_version() == v_before
    b1.unpersist(); b2.unpersist()


def test_history_heals_on_auto_read_ahead_resume(spark, warehouse):
    """Regression (round-4 ADVICE, replay.py auto fence short-circuit):
    a crash between the apply commit and the history merge, resumed via
    replay_pipelined(read_ahead='auto'), must still run the fence-hit
    catch-up for the committed probe batch. The old metadata-only
    short-circuit skipped _history_apply; the NEXT batch's fold then
    advanced the consumed-batch watermark past it, permanently losing
    the probe batch's rows from the SCD2 history."""
    b1 = synth_binlog(spark, 300, 40, 300, delete_frac=0.1).cache()
    b2 = synth_binlog(spark, 300, 40, 300, delete_frac=0.1, start=300).cache()
    b3 = synth_binlog(spark, 300, 40, 300, delete_frac=0.1, start=600).cache()
    cfg = JobConfig(mode="merge", n_buckets=4, history=HISTORY_CFG)
    cat = LakeCatalog(spark, f"{warehouse}/ha")
    drv = ReplayDriver(cat, cfg)
    drv.run_batch(b1, 0)
    with pytest.raises(InjectedCrash):
        drv.run_batch(b2, 1, crash_before_checkpoint=True)
    assert drv.history[0].manifest().properties["scd2_consumed_batch"] == "0"
    # resume with auto: probe batch 1 is committed — must go through the
    # serial fence-hit path (catch-up), not the metadata-only skip
    drv2 = ReplayDriver(cat, cfg)
    recs = drv2.replay_pipelined(
        [(1, lambda: b2), (2, lambda: b3)], read_ahead="auto")
    assert len(recs) == 1  # only batch 2 actually applied
    hist = drv2.history[0]
    assert hist.manifest().properties["scd2_consumed_batch"] == "2"
    oracle = _hist_oracle(b1.collect() + b2.collect() + b3.collect())
    got = sorted(
        (r["doc_id"], r["n_tok"], r["source"], r[VALID_FROM], r[VALID_TO],
         r[IS_CURRENT])
        for r in hist.read().collect())
    assert got == oracle
    # the no-history case keeps the cheap metadata-only short-circuit:
    # resume over a fully-committed prefix must not materialize sources
    cfg_nh = JobConfig(mode="merge", n_buckets=4)
    cat_nh = LakeCatalog(spark, f"{warehouse}/ha_nh")
    drv_nh = ReplayDriver(cat_nh, cfg_nh)
    drv_nh.run_batch(b1, 0)

    def _boom():
        raise AssertionError("committed probe source must not be built")

    recs_nh = drv_nh.replay_pipelined(
        [(0, _boom), (1, lambda: b2)], read_ahead="auto")
    assert len(recs_nh) == 1
    b1.unpersist(); b2.unpersist(); b3.unpersist()


def test_scd2_schema_validation(spark, warehouse):
    from embulk_output_databricks_spark.streaming.scd2 import scd2_schema
    with pytest.raises(ValueError, match="ts column"):
        scd2_schema(SCHEMA, "nope")
    s = scd2_schema(SCHEMA, "ts")
    assert [f.name for f in s.fields][-3:] == [VALID_FROM, VALID_TO,
                                               IS_CURRENT]
    assert "op" not in [f.name for f in s.fields]  # envelope consumed


def test_scd2_mor_strategy_equivalence_and_write_amp(spark, warehouse):
    """strategy='mor' appends the fold as delta files — write cost
    O(batch) with ZERO rewritten rows even when the touched keys are
    scattered across every file — and read() resolves to exactly the
    COW-maintained state. Also pins the sort order ensure_scd2 now sets:
    without it a COW apply rewrote the whole history regardless of batch
    size (round-5 measurement: 5k docs into 805k rows = 805k rewritten)."""
    rows1 = [(k, 10, k, f"a{k}", "U") for k in range(200)]
    rows2 = [(k, 20, 1000 + k, f"b{k}", "U") for k in range(0, 200, 7)]
    cat = LakeCatalog(spark, warehouse)
    cow = ensure_scd2(cat, "cow", SCHEMA, keys=["k"], ts_col="ts",
                      n_buckets=2)
    mor = ensure_scd2(cat, "mor", SCHEMA, keys=["k"], ts_col="ts",
                      n_buckets=2)
    # sort order is set at creation (metadata commit, advisory)
    assert cow.manifest().properties.get("sort_order")
    for tbl, strat in ((cow, "cow"), (mor, "mor")):
        scd2_apply(tbl, _df(spark, rows1), keys=["k"], ts_col="ts",
                   tie_col="tie", strategy=strat)
        scd2_apply(tbl, _df(spark, rows2), keys=["k"], ts_col="ts",
                   tie_col="tie", strategy=strat)
    assert _state(cow) == _state(mor) == sorted(_oracle(rows1 + rows2))
    # MOR batch 2: appended only, nothing rewritten
    last = mor.snapshots().orderBy(F.desc("version")).limit(1).collect()[0]
    assert last["removed_rows"] == 0
    # 29 closed rows re-keyed + 29 new versions
    assert last["added_rows"] == 2 * len(rows2)
    # and current-state reads still resolve winners per (k, tie)
    cur = {r["k"]: r["v"] for r in scd2_current(mor).collect()}
    assert cur[0] == "b0" and cur[1] == "a1"
