"""Cost-based regime auto-selection (VERDICT r2 item 2).

merge_strategy='auto' picks COW vs MOR per batch from metadata only,
scoring the FULL sync cycle (apply + consumer-read resolution tax +
amortized fold — r4 fix, VERDICT r3 item 2): MOR only when the table
dwarfs the batch enough (~40x at default cadence) that the saved rewrite
beats both deferred taxes, COW otherwise. read_ahead='auto' enables
prefetch only when the first batch's measured source-build wall is a
real share of its apply wall. Both choices must leave the replayed state
byte-identical to either manual strategy.
"""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import ConfigError, JobConfig
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.streaming import ReplayDriver
from embulk_output_databricks_spark.streaming.replay import AUTO_COMPACT_HORIZON
from embulk_output_databricks_spark.synth import synth_binlog
from tests.test_replay import python_oracle, table_state


@pytest.fixture()
def cat(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def _strategies(recs):
    return [r["metrics"]["strategy"] for r in recs]


def test_steady_small_batches_flip_to_mor(spark, cat):
    """Bootstrap lands as COW (no size estimate, empty table); once the
    table dwarfs the batch the tail flips to MOR delta appends."""
    n_docs = 4000
    boot = synth_binlog(spark, 8000, n_docs, 8000, delete_frac=0.0)
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4,
                                      merge_strategy="auto"))
    recs = [drv.run_batch(boot, 0)]
    # small tail batches: 50 events << 4000-row table / horizon
    for b in range(1, 4):
        tail = synth_binlog(spark, 50, n_docs, 50, start=8000 + b * 50,
                            delete_frac=0.0)
        recs.append(drv.run_batch(tail, b))
    assert _strategies(recs) == ["cow", "cow", "mor", "mor"]
    assert drv.table.delta_file_count() > 0


def test_large_batches_stay_cow(spark, cat):
    """Batches comparable to the table (restatement/backfill regime) must
    keep copy-on-write — delta appends would churn most groups anyway."""
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4,
                                      merge_strategy="auto"))
    recs = []
    for b in range(3):
        ev = synth_binlog(spark, 2000, 500, 2000, start=b * 2000,
                          delete_frac=0.1)
        recs.append(drv.run_batch(ev, b))
    assert _strategies(recs) == ["cow", "cow", "cow"]
    assert drv.table.delta_file_count() == 0


def test_steady_small_25x_ratio_stays_cow(spark, cat):
    """BENCH_r03's missed regime (VERDICT r3 #2): table ~25x the batch.
    The write-only ratio rule picked MOR, but the full-cycle score (apply
    + consumer-read resolution + amortized fold) makes COW 1.33x faster —
    the model must keep COW below the ~40x crossover."""
    n_docs = 5000
    boot = synth_binlog(spark, 10000, n_docs, 10000, delete_frac=0.0)
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4,
                                      merge_strategy="auto"))
    recs = [drv.run_batch(boot, 0)]
    for b in range(1, 3):
        ev = synth_binlog(spark, 200, n_docs, 200, start=10000 + b * 200,
                          delete_frac=0.0)  # table/batch = 25
        recs.append(drv.run_batch(ev, b))
    assert _strategies(recs) == ["cow", "cow", "cow"]
    assert drv.table.delta_file_count() == 0


def test_registered_consumers_force_cow(spark, cat):
    """A job that re-reads the resolved table every batch (maintained
    rollup) puts MOR's winner-resolution tax on the apply critical path —
    auto must stay COW even deep in MOR's table>>batch territory."""
    n_docs = 4000
    boot = synth_binlog(spark, 8000, n_docs, 8000, delete_frac=0.0)
    drv = ReplayDriver(cat, JobConfig(
        mode="merge", n_buckets=4, merge_strategy="auto",
        rollups=[{"name": "by_source", "group_by": ["source"],
                  "sums": ["n_tok"]}]))
    recs = [drv.run_batch(boot, 0)]
    for b in range(1, 3):
        ev = synth_binlog(spark, 50, n_docs, 50, start=8000 + b * 50,
                          delete_frac=0.0)  # table/batch = 80: MOR without
        recs.append(drv.run_batch(ev, b))   # the consumer term
    assert _strategies(recs) == ["cow", "cow", "cow"]


def test_auto_state_matches_manual_cow(spark, cat, warehouse):
    """Whatever mix of regimes auto picks, the final state equals the
    all-COW replay of the same binlog (and the python LWW oracle)."""
    n_docs = 800
    binlog = synth_binlog(spark, 4000, n_docs, 1000, delete_frac=0.1).cache()
    batches = [0, 1, 2, 3]
    auto = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4,
                                       merge_strategy="auto"))
    auto.replay(binlog, batch_ids=batches)
    cow = ReplayDriver(LakeCatalog(spark, warehouse + "_cow"),
                       JobConfig(mode="merge", n_buckets=4))
    cow.replay(binlog, batch_ids=batches)
    assert table_state(auto.table) == table_state(cow.table)
    assert table_state(auto.table) == \
        python_oracle([r.asDict() for r in binlog.collect()])
    binlog.unpersist()


def test_auto_compacts_at_horizon(spark, cat):
    """auto with mor_compact_every=0 still folds deltas every
    AUTO_COMPACT_HORIZON mor batches — the cadence its cost model assumes;
    unbounded delta accumulation would silently degrade reads."""
    n_docs = 4000
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4,
                                      merge_strategy="auto"))
    drv.run_batch(synth_binlog(spark, 8000, n_docs, 8000, delete_frac=0.0), 0)
    compacted = []
    for b in range(1, AUTO_COMPACT_HORIZON + 3):
        ev = synth_binlog(spark, 40, n_docs, 40, start=8000 + b * 40,
                          delete_frac=0.0)
        rec = drv.run_batch(ev, b)
        compacted.append("compact_s" in rec["metrics"])
    assert any(compacted)
    assert drv.table.delta_file_count() == 0 or \
        compacted.index(True) >= AUTO_COMPACT_HORIZON - 2


def test_auto_rejects_cow_only_features(spark):
    with pytest.raises(ConfigError):
        JobConfig(mode="merge", merge_strategy="auto",
                  merge_rules={"value": "T.value + S.value"})
    with pytest.raises(ConfigError):
        JobConfig(mode="merge", merge_strategy="auto", merge_guard_col="seq_lsn")
    with pytest.raises(ConfigError):
        JobConfig(mode="merge", merge_strategy="auto", change_feed=True)


def test_read_ahead_auto_cheap_source_disables_prefetch(spark, cat):
    """A cheap synthesized source (build << apply) must leave prefetch off
    — the persist build would be pure overhead."""
    per = 400
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    recs = drv.replay_pipelined(
        [(b, (lambda b=b: synth_binlog(spark, per, 60, per, start=b * per,
                                       delete_frac=0.1)))
         for b in range(3)],
        read_ahead="auto")
    assert [r["batch_id"] for r in recs] == [0, 1, 2]
    assert drv.auto_read_ahead == 0
    full = synth_binlog(spark, 3 * per, 60, per, delete_frac=0.1)
    assert table_state(drv.table) == \
        python_oracle([r.asDict() for r in full.collect()])


def test_read_ahead_auto_slow_source_enables_prefetch(spark, cat):
    """An expensive source build (simulated Kafka-decode latency) must
    turn prefetch on; state and fencing are unchanged."""
    import time as _time

    per = 300

    def mk(b):
        def thunk():
            _time.sleep(2.0)  # stand-in for decode/cold-scan latency
            return synth_binlog(spark, per, 50, per, start=b * per,
                                delete_frac=0.0)
        return thunk

    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    recs = drv.replay_pipelined([(b, mk(b)) for b in range(3)],
                                read_ahead="auto")
    assert [r["batch_id"] for r in recs] == [0, 1, 2]
    assert drv.auto_read_ahead == 1  # depth 1 since r4 (2 over-contends)
    full = synth_binlog(spark, 3 * per, 50, per, delete_frac=0.0)
    assert table_state(drv.table) == \
        python_oracle([r.asDict() for r in full.collect()])


def test_read_ahead_auto_fenced_probe_disables_prefetch(spark, cat):
    """A resumed replay whose first probe batch is fence-rejected measured
    a no-op, not an apply — auto must NOT conclude 'apply is fast,
    prefetch everything' (the serial path never materializes committed
    batches' sources at all)."""
    per = 300
    binlog = synth_binlog(spark, 3 * per, 50, per, delete_frac=0.0).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog)  # commit everything
    recs = drv.replay(binlog, read_ahead="auto")  # resume: all fenced
    assert recs == []
    assert drv.auto_read_ahead == 0
    binlog.unpersist()
