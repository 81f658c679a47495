"""Engine StructTypes (SURVEY.md §1.3, FIXTURES.md F1-F4).

The reference's fixed org.embulk.spi.Schema (DatabricksOutputPlugin.java:14,166)
becomes StructType constants. The target-table shape is BASELINE.json's
input_hint verbatim; the change-event shape adds the binlog envelope.
"""

from __future__ import annotations

from pyspark.sql import types as T

# F1 — target table of pre-tokenized training sequences (input_hint).
SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), containsNull=False), nullable=False),
        T.StructField("n_tok", T.IntegerType(), nullable=False),
        T.StructField("source", T.StringType(), nullable=True),
    ]
)

# F2 — change-event envelope (synthetic WAL tail).
BINLOG_SCHEMA = T.StructType(
    [
        T.StructField("seq_lsn", T.LongType(), nullable=False),
        T.StructField("batch_id", T.LongType(), nullable=False),
        T.StructField("op", T.StringType(), nullable=False),  # I | U | D
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), containsNull=False), nullable=True),
        T.StructField("n_tok", T.IntegerType(), nullable=True),
        T.StructField("source", T.StringType(), nullable=True),
        T.StructField("event_id", T.StringType(), nullable=False),  # LWW tie-break
    ]
)

# F3 — checkpoint/offset record (stored as JSON per committed batch).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), nullable=False),
        T.StructField("lsn_from", T.LongType(), nullable=False),
        T.StructField("lsn_to", T.LongType(), nullable=False),
        T.StructField("committed_at", T.TimestampType(), nullable=False),
        T.StructField("snapshot_version", T.LongType(), nullable=False),
        T.StructField("status", T.StringType(), nullable=False),
    ]
)

# F4 — per-partition lineage/metrics record.
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), nullable=False),
        T.StructField("partition_id", T.IntegerType(), nullable=False),
        T.StructField("events_in", T.LongType(), nullable=False),
        T.StructField("events_deduped", T.LongType(), nullable=False),
        T.StructField("n_tok_sum", T.LongType(), nullable=False),
    ]
)

# Payload (non-envelope) columns of the target table, in order.
PAYLOAD_COLUMNS = [f.name for f in SEQUENCES_SCHEMA.fields]
DEFAULT_MERGE_KEYS = ["doc_id"]
