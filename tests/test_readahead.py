"""Batch read-ahead in the replay loop (VERDICT r1 item 5): overlap
synthesizing/reading batch k+1 with the apply of batch k — the analog of
the reference's encode(k+1) ∥ upload(k) ∥ COPY(k−1) pipelining
(DatabricksCopyBatchInsert.java:88-93,120-184). Applies stay strictly
ordered (exactly-once needs serial MERGEs); only SOURCE materialization
moves off the critical path, so every fence/crash/evolution property of
the sequential loop must hold unchanged.
"""

import pytest
from pyspark.sql import functions as F

from embulk_output_databricks_spark.config import JobConfig
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.streaming import ReplayDriver
from embulk_output_databricks_spark.streaming.replay import EvolutionOp
from embulk_output_databricks_spark.synth import synth_binlog
from tests.test_replay import python_oracle, table_state


@pytest.fixture()
def cat(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def test_pipelined_replay_matches_sequential(spark, cat, warehouse):
    binlog = synth_binlog(spark, 2400, 120, 400, delete_frac=0.1).cache()
    seq = ReplayDriver(LakeCatalog(spark, warehouse + "_seq"),
                       JobConfig(mode="merge", n_buckets=4))
    recs_seq = seq.replay(binlog)
    ra = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    recs_ra = ra.replay(binlog, read_ahead=2)
    assert table_state(ra.table) == table_state(seq.table)
    assert [r["batch_id"] for r in recs_ra] == [r["batch_id"] for r in recs_seq]
    ra.ckpt.validate_contiguous()
    binlog.unpersist()


def test_pipelined_replay_is_fenced(spark, cat):
    binlog = synth_binlog(spark, 1000, 60, 250).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, read_ahead=2)
    v = drv.table.current_version()
    assert drv.replay(binlog, read_ahead=2) == []
    assert drv.table.current_version() == v
    binlog.unpersist()


def test_pipelined_source_thunks(spark, cat):
    """replay_pipelined takes (batch_id, thunk) pairs — the bench/synth
    shape where each batch is generated, not filtered; thunks for future
    batches run on the prefetch thread while the current batch applies."""
    per = 300
    calls = []

    def mk(b):
        def thunk():
            calls.append(b)
            return synth_binlog(spark, per, 50, per, start=b * per,
                                delete_frac=0.1)
        return thunk

    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    recs = drv.replay_pipelined([(b, mk(b)) for b in range(4)], read_ahead=1)
    assert [r["batch_id"] for r in recs] == [0, 1, 2, 3]
    assert sorted(calls) == [0, 1, 2, 3]
    full = synth_binlog(spark, 4 * per, 50, per, delete_frac=0.1)
    assert table_state(drv.table) == \
        python_oracle([r.asDict() for r in full.collect()])


def test_pipelined_with_evolution_plan(spark, cat):
    """Schema DDL rides the apply point, not the prefetch point: a column
    added before batch 1 must be visible to batch 1's apply even though
    batch 1's source may have materialized during batch 0."""
    binlog = synth_binlog(spark, 900, 60, 300, delete_frac=0.0) \
        .withColumn("lang", F.lit("en")).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    recs = drv.replay(
        binlog, read_ahead=2,
        evolution_plan={1: [EvolutionOp("add", name="lang", type="string")]})
    assert len(recs) == 3
    cols = [f.name for f in drv.table.manifest().schema().fields]
    assert "lang" in cols
    # batches 1+ carry the column; batch 0 rows read NULL
    langs = {r["lang"] for r in drv.table.read().collect()}
    assert langs <= {"en", None} and "en" in langs
    binlog.unpersist()


def test_prefetch_cache_is_released(spark, cat):
    # delta-based: the shared test session may carry other fixtures'
    # caches; the invariant is that replay() leaves NO NEW persisted RDDs
    sc = spark.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    binlog = synth_binlog(spark, 800, 50, 200).cache()
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    drv.replay(binlog, read_ahead=3)
    binlog.unpersist(blocking=True)
    assert sc._jsc.sc().getPersistentRDDs().size() <= before


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# pipeline configs: prefetch width (0 = serial, 'auto' = probed),
# stage-ahead flag, number of batches, delete mix — any combination must
# reproduce the serial exactly-once replay bit-for-bit
_pipeline_cfgs = st.tuples(
    st.sampled_from([0, 1, 2, 3, "auto"]),
    st.booleans(),
    st.integers(min_value=2, max_value=4),
    st.sampled_from([0.0, 0.15]),
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_pipeline_cfgs)
def test_pipelined_equivalence_random_configs(spark, tmp_path_factory, cfg):
    """For ANY (read_ahead width, stage_ahead, batch count, delete mix)
    the pipelined replay equals the python LWW oracle and the fence
    still no-ops a full redelivery — pipelining may only change
    scheduling, never results (the r4 probe/guard changes widen this
    config space: auto may resolve to 0 or 1, stage-ahead may fall back
    under FIFO)."""
    width, sa, n_batches, del_frac = cfg
    wh = str(tmp_path_factory.mktemp("pipe_prop"))
    cat = LakeCatalog(spark, wh)
    drv = ReplayDriver(cat, JobConfig(mode="merge", n_buckets=4))
    per = 400
    binlog = synth_binlog(spark, per * n_batches, 60, per,
                          delete_frac=del_frac).cache()
    recs = drv.replay(binlog, read_ahead=width, stage_ahead=sa,
                      collect_metrics="light")
    assert [r["batch_id"] for r in recs] == sorted(r["batch_id"] for r in recs)
    assert table_state(drv.table) == \
        python_oracle([r.asDict() for r in binlog.collect()])
    v = drv.table.current_version()
    assert drv.replay(binlog, read_ahead=width, stage_ahead=sa,
                      collect_metrics="light") == []
    assert drv.table.current_version() == v
    drv.ckpt.validate_contiguous()
    binlog.unpersist()
