"""Apply-mode e2e matrix — mirror of TestDatabricksOutputPluginByMode.java
(FIXTURES.md S1-S9, S12, S16), run against the LakeTable instead of a live
Databricks warehouse.
"""

import pytest
from pyspark.sql import types as T

from embulk_output_databricks_spark.config import ApplyMode, ConfigError, JobConfig
from embulk_output_databricks_spark.plans import apply_batch
from embulk_output_databricks_spark.plans.apply import ensure_table
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog

# staged batch shape: payload nullable (delete events carry no payload)
STAGED_SCHEMA = T.StructType(
    [T.StructField(f.name, f.dataType, True) for f in SEQUENCES_SCHEMA.fields]
    + [T.StructField("op", T.StringType(), True)]
)


def staged(spark, rows):
    return spark.createDataFrame(rows, STAGED_SCHEMA)


def state(t):
    return {r["doc_id"]: (r["tokens"], r["n_tok"], r["source"]) for r in t.read().collect()}


@pytest.fixture()
def cat(spark, warehouse):
    return LakeCatalog(spark, warehouse)


def mk(cat, cfg, pre=None):
    t = ensure_table(cat, cfg, SEQUENCES_SCHEMA)
    if pre is not None:
        t.append(pre)
    return t


def test_s1_insert_new_table(spark, cat):
    cfg = JobConfig(mode="insert")
    t = mk(cat, cfg)
    apply_batch(t, staged(spark, [(f"d{i}", [i], 1, "web", "I") for i in range(100)]), cfg)
    assert t.row_count() == 100


def test_s2_insert_existing_bag_semantics(spark, cat):
    cfg = JobConfig(mode="insert")
    t = mk(cat, cfg, staged(spark, [(f"d{i}", [i], 1, "old", None) for i in range(50)]).drop("op"))
    apply_batch(t, staged(spark, [("d0", [9], 1, "new", "I"), ("d1", [9], 1, "new", "I")]), cfg)
    # duplicates coexist: UNION ALL is a bag union (ref B2)
    assert t.row_count() == 52
    assert t.read().filter("doc_id = 'd0'").count() == 2


def test_s3_truncate_insert(spark, cat):
    cfg = JobConfig(mode="truncate_insert")
    t = mk(cat, cfg, staged(spark, [(f"old{i}", [i], 1, "old", None) for i in range(50)]).drop("op"))
    apply_batch(t, staged(spark, [(f"new{i}", [i], 1, "new", "I") for i in range(100)]), cfg)
    s = state(t)
    assert len(s) == 100 and all(k.startswith("new") for k in s)


def test_s4_replace(spark, cat):
    cfg = JobConfig(mode="replace")
    t = mk(cat, cfg, staged(spark, [("old", [0], 1, "old", None)]).drop("op"))
    apply_batch(t, staged(spark, [("new", [1], 1, "new", "I")]), cfg)
    assert set(state(t)) == {"new"}


def test_s5_merge_new_table(spark, cat):
    cfg = JobConfig(mode="merge")
    t = mk(cat, cfg)
    apply_batch(t, staged(spark, [(f"d{i}", [i], 1, "web", "I") for i in range(100)]), cfg)
    assert t.row_count() == 100


def test_s6_merge_existing_single_key(spark, cat):
    # pre-seed {doc0, doc1}; batch updates doc1, inserts doc2
    # (ref TestDatabricksOutputPluginByMode.java:96-102)
    cfg = JobConfig(mode="merge")
    t = mk(cat, cfg, staged(spark, [("doc0", [0], 1, "old", None), ("doc1", [1], 1, "old", None)]).drop("op"))
    apply_batch(t, staged(spark, [("doc1", [11], 1, "new", "U"), ("doc2", [2], 1, "new", "I")]), cfg)
    s = state(t)
    assert s == {
        "doc0": ([0], 1, "old"),
        "doc1": ([11], 1, "new"),
        "doc2": ([2], 1, "new"),
    }


def test_s7_merge_composite_key(spark, cat):
    # overlap on one key component only must NOT match (ref :104-110)
    cfg = JobConfig(mode="merge", merge_keys=["doc_id", "source"])
    t = mk(cat, cfg, staged(spark, [("a", [1], 1, "web", None)]).drop("op"))
    apply_batch(t, staged(spark, [("a", [2], 1, "book", "U")]), cfg)
    rows = sorted((r["doc_id"], r["source"], r["tokens"]) for r in t.read().collect())
    assert rows == [("a", "book", [2]), ("a", "web", [1])]
    apply_batch(t, staged(spark, [("a", [3], 1, "web", "U")]), cfg)
    rows = sorted((r["doc_id"], r["source"], r["tokens"]) for r in t.read().collect())
    assert rows == [("a", "book", [2]), ("a", "web", [3])]


def test_s8_merge_rules(spark, cat):
    # merge_rule expressions over T./S. (ref :112-128,
    # DatabricksOutputConnection.java:207-213)
    cfg = JobConfig(
        mode="merge",
        merge_rules={
            "tokens": "concat(T.tokens, S.tokens)",
            "source": "concat(T.source, '+', S.source)",
            "n_tok": "T.n_tok + S.n_tok",
        },
    )
    t = mk(cat, cfg, staged(spark, [("a", [1, 2], 2, "web", None)]).drop("op"))
    apply_batch(t, staged(spark, [("a", [3], 1, "book", "U"), ("b", [9], 1, "wiki", "I")]), cfg)
    s = state(t)
    assert s["a"] == ([1, 2, 3], 3, "web+book")  # rules on matched
    assert s["b"] == ([9], 1, "wiki")            # plain insert on unmatched


def test_s9_merge_keys_defaulted(spark, cat):
    # merge_keys omitted (None) -> discovery: no identifier_fields on the
    # target, so the ['doc_id'] default applies at apply time (ref B7;
    # discovery itself is pinned by tests/test_identifier_keys.py)
    cfg = JobConfig(mode="merge")
    assert cfg.merge_keys is None
    t = mk(cat, cfg, staged(spark, [("x", [0], 1, "old", None)]).drop("op"))
    apply_batch(t, staged(spark, [("x", [1], 1, "new", "U")]), cfg)
    assert state(t)["x"] == ([1], 1, "new")


def test_s12_delete_op(spark, cat):
    cfg = JobConfig(mode="merge")
    t = mk(cat, cfg, staged(spark, [("a", [1], 1, "web", None), ("b", [2], 1, "web", None)]).drop("op"))
    apply_batch(
        t,
        staged(spark, [("a", None, None, None, "D"), ("zz", None, None, None, "D")]),
        cfg,
    )
    # matched delete removes; unmatched delete is a no-op
    assert set(state(t)) == {"b"}


def test_s16_null_vs_empty_string(spark, cat):
    # NULL and '' are distinct and preserved (ref README.md:76,
    # TestDatabricksOutputPluginByNullOrEmptyString.java:19-49)
    cfg = JobConfig(mode="merge")
    t = mk(cat, cfg)
    apply_batch(t, staged(spark, [("n", [1], 1, None, "I"), ("e", [1], 1, "", "I")]), cfg)
    s = state(t)
    assert s["n"][2] is None and s["e"][2] == ""


def test_s19_invalid_config_rejected():
    with pytest.raises(ConfigError):
        JobConfig(mode="merge_direct")
    with pytest.raises(ConfigError):
        JobConfig(mode="bogus")
    with pytest.raises(ConfigError):
        JobConfig(mode="merge", merge_keys=[])
    with pytest.raises(ConfigError):
        JobConfig(column_types={"x": "map<int,int>"})
    assert JobConfig(mode="insert").mode is ApplyMode.INSERT


def test_column_types_override_on_create(spark, cat, warehouse):
    """cfg.column_types types the auto-created target (ref
    column_options.type, README.md:40-41): n_tok created as bigint, values
    preserved through replay; unknown column names rejected fail-fast."""
    from embulk_output_databricks_spark.streaming.replay import ReplayDriver
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog
    from embulk_output_databricks_spark.synth import synth_binlog

    cfg = JobConfig(mode="merge", n_buckets=4,
                    column_types={"n_tok": "bigint", "tokens": "array<bigint>"})
    drv = ReplayDriver(LakeCatalog(spark, f"{warehouse}/ct"), cfg)
    df = drv.table.read()
    assert dict(df.dtypes)["n_tok"] == "bigint"
    assert dict(df.dtypes)["tokens"] == "array<bigint>"
    binlog = synth_binlog(spark, 200, 20, 200)
    drv.run_batch(binlog, 0)
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"])
           for r in drv.table.read().collect()}
    assert all(len(t) == n for t, n in got.values()) and got

    with pytest.raises(ConfigError, match="unknown columns"):
        ReplayDriver(LakeCatalog(spark, f"{warehouse}/ct2"),
                     JobConfig(table="t2", mode="merge",
                               column_types={"nope": "bigint"}))


def test_hooks_run(spark, cat):
    cfg = JobConfig(mode="insert", before_load="SELECT count(*) FROM sequences",
                    after_load="SELECT 1")
    t = mk(cat, cfg)
    apply_batch(t, staged(spark, [("a", [1], 1, "web", "I")]), cfg)
    assert t.row_count() == 1
