"""Debezium-envelope change-event decoding.

The reference consumes an Embulk page stream (DatabricksOutputPlugin.java:
189-205) — it has no wire-format story at all. Real binlog/WAL tails
overwhelmingly arrive as Debezium envelopes (the de-facto CDC wire format:
MySQL binlog, Postgres WAL, Mongo oplog connectors all emit it), so an
ingest engine that stops at a bespoke JSON frame cannot sit behind a real
upstream. This module decodes the standard envelope

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "source": {"ts_ms":…, "lsn":…, "table":…, "txId":…},
                 "op": "c"|"r"|"u"|"d", "ts_ms": …,
                 "transaction": {"id":…, "total_order":…,
                                 "data_collection_order":…}|null}}

into the engine's normalized change events (payload columns + `op` U/D +
monotone `seq_lsn`), entirely JVM-side (`from_json` + struct projection —
no per-row Python, per the input_hint mandate). Decode rules follow the
published Debezium semantics:

  * op c/r/u  -> upsert carrying the AFTER image ("r" is snapshot read —
    Debezium emits it during initial snapshot; it is an upsert like "c");
  * op d      -> delete carrying the BEFORE image (only the key matters
    downstream, but the full before-row is projected so merge_rules and
    auditing can see it);
  * Kafka tombstone (value NULL / no payload) -> dropped. Debezium emits a
    tombstone AFTER the 'd' record purely for Kafka log compaction; it
    carries no change and must not be interpreted as an event;
  * seq_lsn   -> source.lsn when present (Postgres), else
    source.ts_ms * 1_000_000 + source.pos (MySQL binlog file offset), so
    ordering is total per upstream. Callers replaying mixed upstreams pass
    their own order columns to lww_dedup.

Transaction boundaries: with `provide.transaction.metadata=true` Debezium
brackets each upstream transaction with BEGIN/END markers on a side topic
(id, status, event_count). A CDC apply that wants transactional batches
must hold back events of transactions whose END marker has not arrived —
otherwise a batch boundary can split an upstream transaction and expose a
half-applied state. `complete_transactions` implements that gate as pure
DataFrame ops: count events per txn, inner-join to END markers, keep txns
whose observed count == the marker's event_count (late/partial txns spill
to the next batch). O(#txns) agg + one broadcast-able semi join — no state
store, no per-row Python.

Scale notes (10^10 events): decode is a pure projection over the wire scan
(no shuffle, pipelined straight into the dedup shuffle that follows);
the txn gate adds one partial-aggregated count keyed by txn id (orders of
magnitude fewer rows than events) and one semi join that AQE broadcasts
whenever a batch holds few distinct transactions — the common CDC case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# source block fields we consume; connectors add more (db, schema, file…)
# — from_json ignores extras, so this is forward-compatible by design.
_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("ts_ms", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("pos", T.LongType()),
        T.StructField("txId", T.StringType()),
        T.StructField("table", T.StringType()),
    ]
)

_TXN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("total_order", T.LongType()),
        T.StructField("data_collection_order", T.LongType()),
    ]
)

# END/BEGIN marker record from the transaction-metadata topic
TXN_MARKER_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType()),  # BEGIN | END
        T.StructField("id", T.StringType()),
        T.StructField("event_count", T.LongType()),  # END only
    ]
)


def envelope_schema(payload_schema: T.StructType) -> T.StructType:
    """The Debezium value schema for a table with the given row schema."""
    return T.StructType(
        [
            T.StructField("payload", T.StructType([
                T.StructField("before", payload_schema),
                T.StructField("after", payload_schema),
                T.StructField("source", _SOURCE_SCHEMA),
                T.StructField("op", T.StringType()),
                T.StructField("ts_ms", T.LongType()),
                T.StructField("transaction", _TXN_SCHEMA),
            ])),
        ]
    )


def encode_debezium(
    events: DataFrame,
    payload_cols: list[str],
    op_col: str = "op",
    lsn_col: str = "seq_lsn",
    txn_col: str | None = None,
) -> DataFrame:
    """Deterministic change events -> Debezium envelope JSON strings
    (tests/bench synthesis; real deployments get envelopes from Kafka).
    `op_col` holds engine ops U/D; rows become 'u' / 'd' envelopes with the
    image in after / before respectively. All JVM-side (to_json)."""
    img = F.struct(*[F.col(c) for c in payload_cols])
    is_del = (F.col(op_col) == "D") if op_col in events.columns else F.lit(False)
    src = F.struct(
        (F.col(lsn_col) / 1000).cast("long").alias("ts_ms"),
        F.col(lsn_col).cast("long").alias("lsn"),
        F.lit(None).cast("long").alias("pos"),
        (F.col(txn_col).cast("string") if txn_col else F.lit(None).cast("string")
         ).alias("txId"),
        F.lit("sequences").alias("table"),
    )
    txn = (
        F.struct(
            F.col(txn_col).cast("string").alias("id"),
            F.lit(None).cast("long").alias("total_order"),
            F.lit(None).cast("long").alias("data_collection_order"),
        )
        if txn_col
        else F.lit(None).cast(_TXN_SCHEMA)
    )
    payload = F.struct(
        F.when(is_del, img).alias("before"),
        F.when(~is_del, img).alias("after"),
        src.alias("source"),
        F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
        (F.col(lsn_col) / 1000).cast("long").alias("ts_ms"),
        txn.alias("transaction"),
    )
    return events.select(
        F.to_json(F.struct(payload.alias("payload"))).alias("value"))


def diff_to_debezium(
    table,
    from_version: int,
    keys: list[str],
    to_version: int | None = None,
) -> DataFrame:
    """CDC *out* in the standard wire format: the resolved-state diff of a
    LakeTable interval (LakeTable.diff — strategy-agnostic across COW /
    MOR / compaction / evolution commits) re-emitted as Debezium envelope
    JSON, one record per changed key, with TRUE before/after images:

      * I -> op 'c', after = new row, before = null;
      * U -> op 'u', after = new row, before = the from_version row
        (diff's __old_* retract columns);
      * D -> op 'd', before = last-seen row, after = null.

    `key` is the JSON of the merge-key struct (Debezium's Kafka message
    key, what log compaction compacts on); `source.lsn` carries the target
    snapshot version (monotone per table), `ts_ms` its commit stamp. The
    output round-trips through parse_debezium, so a downstream engine —
    including this one — can consume the feed exactly as it consumes a
    real connector topic. All JVM-side (to_json over structs); cost is the
    diff itself.
    """
    m = table.manifest(to_version)
    val_cols = [f["name"] for f in m.schema_version.fields
                if f["name"] not in keys]
    d = table.diff(from_version, keys, to_version, include_old=True)
    op = F.col("__op")
    # diff contract: D rows carry the old values in the MAIN columns,
    # I/U rows the new values; __old_* holds the from_version state
    img = F.struct(*[F.col(c) for c in [*keys, *val_cols]])
    old_img = F.struct(
        *[F.col(k) for k in keys],
        *[F.col(f"__old_{c}").alias(c) for c in val_cols])
    ts_ms = int(m.properties.get(
        "committed_at_us", 0)) // 1000 or None
    src = F.struct(
        F.lit(ts_ms).cast("long").alias("ts_ms"),
        F.lit(m.version).cast("long").alias("lsn"),
        F.lit(None).cast("long").alias("pos"),
        F.lit(None).cast("string").alias("txId"),
        F.lit(table.name).alias("table"),
    )
    payload = F.struct(
        F.when(op == "D", img).when(op == "U", old_img).alias("before"),
        F.when(op != "D", img).alias("after"),
        src.alias("source"),
        F.when(op == "D", F.lit("d")).when(op == "I", F.lit("c"))
        .otherwise(F.lit("u")).alias("op"),
        F.lit(ts_ms).cast("long").alias("ts_ms"),
        F.lit(None).cast(_TXN_SCHEMA).alias("transaction"),
    )
    return d.select(
        F.to_json(F.struct(*[F.col(k) for k in keys])).alias("key"),
        F.to_json(F.struct(payload.alias("payload"))).alias("value"))


def parse_debezium(
    raw: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """Envelope JSON -> normalized change events.

    Output columns: the payload columns (after-image for c/r/u, before-image
    for d), plus `op` ("U"/"D" — the engine's merge ops), `seq_lsn`
    (monotone per upstream: source.lsn, else ts_ms*1e6+pos), and `txn_id`
    (NULL unless transaction metadata was enabled). Tombstones and
    undecodable values are dropped — route the raw frame through a
    dead-letter filter first if they must be audited (kafka_tail.py does)."""
    env = envelope_schema(payload_schema)
    p = F.from_json(F.col(value_col).cast("string"), env)["payload"]
    parsed = raw.select(p.alias("p")).filter(
        F.col("p").isNotNull() & F.col("p.op").isNotNull())
    is_del = F.col("p.op") == "d"
    img = F.when(is_del, F.col("p.before")).otherwise(F.col("p.after"))
    seq = F.coalesce(
        F.col("p.source.lsn"),
        F.col("p.source.ts_ms") * F.lit(1_000_000)
        + F.coalesce(F.col("p.source.pos"), F.lit(0)),
    )
    cols = [img[f.name].alias(f.name) for f in payload_schema.fields]
    return parsed.select(
        *cols,
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        seq.cast("long").alias("seq_lsn"),
        F.coalesce(F.col("p.transaction.id"), F.col("p.source.txId"))
        .alias("txn_id"),
    )


def complete_transactions(
    events: DataFrame,
    markers: DataFrame,
    txn_col: str = "txn_id",
) -> tuple[DataFrame, DataFrame]:
    """Transactional batch gate: split events into (complete, held).

    `markers` carries TXN_MARKER_SCHEMA rows (the Debezium transaction
    topic). A transaction is complete when an END marker exists AND the
    batch holds exactly `event_count` of its events; anything else —
    no END yet, or fewer events than the marker promises (stragglers still
    in flight) — is held back for the next batch. Events with NULL txn id
    (non-transactional upstreams) pass through as complete.

    Plan shape: one partial-aggregated count per txn id + one equi-join of
    two txn-sized sides, then a join back to events on txn id — the txn
    side is tiny (#transactions per batch), so AQE broadcasts it."""
    ends = (
        markers.filter(F.col("status") == "END")
        .select(F.col("id").alias(txn_col), "event_count")
    )
    seen = events.filter(F.col(txn_col).isNotNull()).groupBy(txn_col).agg(
        F.count(F.lit(1)).alias("__seen"))
    done = (
        seen.join(ends, txn_col)
        .filter(F.col("__seen") == F.col("event_count"))
        .select(txn_col)
    )
    # semi/anti pair on the same tiny `done` side; NULL-txn rows are
    # unconditionally complete so they are unioned onto the semi branch
    with_txn = events.filter(F.col(txn_col).isNotNull())
    no_txn = events.filter(F.col(txn_col).isNull())
    complete = with_txn.join(F.broadcast(done), txn_col, "left_semi") \
                       .unionByName(no_txn)
    held = with_txn.join(F.broadcast(done), txn_col, "left_anti")
    return complete, held
