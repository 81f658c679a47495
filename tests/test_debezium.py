"""Debezium-envelope decode + transactional batch gate (sources/debezium.py).

Mirrors the reference's wire-format-less gap: the plugin consumes Embulk
pages only (DatabricksOutputPlugin.java:189-205); a real CDC tail arrives
as Debezium envelopes. These tests pin the published envelope semantics:
op mapping (c/r/u upsert, d delete-with-before-image), tombstone elision,
LSN fallback (source.lsn else ts_ms*1e6+pos), and the transaction-marker
completeness gate.
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.sources.debezium import (
    TXN_MARKER_SCHEMA,
    complete_transactions,
    encode_debezium,
    parse_debezium,
)

PAYLOAD = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("n_tok", T.IntegerType()),
])


def _raw(spark, rows):
    return spark.createDataFrame(
        [(json.dumps(r) if r is not None else None,) for r in rows],
        T.StructType([T.StructField("value", T.StringType())]))


def _env(op, image, lsn=None, ts_ms=None, pos=None, txn=None):
    p = {"op": op, "source": {"table": "sequences"}}
    if lsn is not None:
        p["source"]["lsn"] = lsn
    if ts_ms is not None:
        p["source"]["ts_ms"] = ts_ms
    if pos is not None:
        p["source"]["pos"] = pos
    if txn is not None:
        p["transaction"] = {"id": txn}
    p["before" if op == "d" else "after"] = image
    return {"payload": p}


def test_op_mapping_and_images(spark):
    rows = [
        _env("c", {"doc_id": "a", "n_tok": 3}, lsn=10),
        _env("r", {"doc_id": "b", "n_tok": 5}, lsn=11),   # snapshot read
        _env("u", {"doc_id": "a", "n_tok": 4}, lsn=12),
        _env("d", {"doc_id": "b", "n_tok": 5}, lsn=13),   # before image
        None,                                             # kafka tombstone
    ]
    out = parse_debezium(_raw(spark, rows), PAYLOAD)
    got = {(r.doc_id, r.op, r.seq_lsn, r.n_tok) for r in out.collect()}
    assert got == {
        ("a", "U", 10, 3), ("b", "U", 11, 5),
        ("a", "U", 12, 4), ("b", "D", 13, 5),
    }


def test_lsn_fallback_to_binlog_position(spark):
    # MySQL connectors carry no lsn; order = ts_ms*1e6 + binlog pos
    rows = [
        _env("c", {"doc_id": "x", "n_tok": 1}, ts_ms=1000, pos=7),
        _env("u", {"doc_id": "x", "n_tok": 2}, ts_ms=1000, pos=9),
    ]
    out = parse_debezium(_raw(spark, rows), PAYLOAD)
    lsns = sorted(r.seq_lsn for r in out.collect())
    assert lsns == [1_000_000_007, 1_000_000_009]


def test_encode_parse_roundtrip_with_deletes(spark):
    src = spark.createDataFrame(
        [("a", 3, "U", 100), ("b", 5, "U", 101), ("a", 0, "D", 102)],
        "doc_id string, n_tok int, op string, seq_lsn long")
    framed = encode_debezium(src, ["doc_id", "n_tok"],
                             op_col="op", lsn_col="seq_lsn")
    back = parse_debezium(framed, PAYLOAD)
    got = {(r.doc_id, r.n_tok, r.op, r.seq_lsn) for r in back.collect()}
    assert got == {("a", 3, "U", 100), ("b", 5, "U", 101), ("a", 0, "D", 102)}


def test_transaction_gate_holds_incomplete(spark):
    rows = [
        _env("c", {"doc_id": "a", "n_tok": 1}, lsn=1, txn="t1"),
        _env("u", {"doc_id": "a", "n_tok": 2}, lsn=2, txn="t1"),
        _env("c", {"doc_id": "b", "n_tok": 1}, lsn=3, txn="t2"),  # t2: 1 of 2
        _env("c", {"doc_id": "c", "n_tok": 9}, lsn=4),            # no txn meta
        _env("c", {"doc_id": "d", "n_tok": 7}, lsn=5, txn="t3"),  # no END yet
    ]
    ev = parse_debezium(_raw(spark, rows), PAYLOAD)
    markers = spark.createDataFrame(
        [("END", "t1", 2), ("END", "t2", 2)], TXN_MARKER_SCHEMA)
    complete, held = complete_transactions(ev, markers)
    assert {r.doc_id for r in complete.collect()} == {"a", "c"}
    assert {r.doc_id for r in held.collect()} == {"b", "d"}


def test_decode_is_pure_projection(spark):
    """Plan audit: decode must not shuffle — a projection over the wire
    scan, pipelined into whatever follows (the 100 TB property)."""
    rows = [_env("c", {"doc_id": "a", "n_tok": 1}, lsn=1)]
    out = parse_debezium(_raw(spark, rows), PAYLOAD)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_driver_query_matches_duckdb_oracle(spark):
    import duckdb

    from embulk_output_databricks_spark.queries import (
        ORACLE_SQL, SPARK_QUERIES)

    sf = "/root/testdata/sf0.001"
    got = SPARK_QUERIES["cdc_debezium_replay"](spark, sf).orderBy("user_id")
    rows = [(r.user_id, r.ts_us, r.event_type, round(r.value, 6), r.props)
            for r in got.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = [(u, t, e, round(v, 6), p) for u, t, e, v, p in con.execute(
        ORACLE_SQL["cdc_debezium_replay"] + " ORDER BY user_id").fetchall()]
    assert rows == want


def test_diff_to_debezium_roundtrip(spark, warehouse):
    """CDC out: a LakeTable interval diff re-emitted as envelopes must
    round-trip through parse_debezium with true before/after images."""
    from embulk_output_databricks_spark.plans.merge import merge_apply
    from embulk_output_databricks_spark.sources.debezium import (
        diff_to_debezium,
    )
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    cat = LakeCatalog(spark, warehouse)
    tbl = cat.create_table("t", schema, n_buckets=2, bucket_key="doc_id")
    tbl.append(spark.createDataFrame(
        [("a", 1, "s0"), ("b", 2, "s0"), ("c", 3, "s0")], schema))
    v1 = tbl.current_version()
    staged = spark.createDataFrame(
        [("b", 20, "s1", "U"), ("c", 3, "s1", "D"), ("d", 4, "s1", "U")],
        T.StructType([*schema.fields, T.StructField("op", T.StringType())]))
    merge_apply(tbl, staged, keys=["doc_id"], support_deletes=True)

    feed = diff_to_debezium(tbl, v1, keys=["doc_id"]).collect()
    by_key = {json.loads(r["key"])["doc_id"]: json.loads(r["value"])
              for r in feed}
    assert set(by_key) == {"b", "c", "d"}  # 'a' untouched -> no record
    b, c, d = by_key["b"], by_key["c"], by_key["d"]
    assert b["payload"]["op"] == "u"
    assert b["payload"]["before"] == {"doc_id": "b", "n_tok": 2,
                                      "source": "s0"}
    assert b["payload"]["after"] == {"doc_id": "b", "n_tok": 20,
                                     "source": "s1"}
    assert c["payload"]["op"] == "d" and "after" not in c["payload"]
    assert c["payload"]["before"]["n_tok"] == 3
    assert d["payload"]["op"] == "c" and "before" not in d["payload"]
    assert d["payload"]["source"]["lsn"] == tbl.current_version()
    assert d["payload"]["source"]["table"] == "t"

    # a downstream engine consumes the feed exactly like a connector topic
    events = parse_debezium(
        diff_to_debezium(tbl, v1, keys=["doc_id"]), schema)
    got = {(r["doc_id"], r["op"], r["n_tok"], r["seq_lsn"])
           for r in events.collect()}
    assert got == {("b", "U", 20, tbl.current_version()),
                   ("d", "U", 4, tbl.current_version()),
                   ("c", "D", 3, tbl.current_version())}
