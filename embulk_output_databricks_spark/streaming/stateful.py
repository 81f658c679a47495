"""Stateful streaming LWW — a custom stateful operator on Spark's state
store (applyInPandasWithState), the true-streaming counterpart of
operators/lww.py.

The batch engine dedups per batch and lets MERGE reconcile across batches;
this operator instead keeps each key's current winner IN STATE across
micro-batches and emits a row only when a key's winner changes. The output
is therefore a minimal upsert/delete changelog: downstream sinks apply it
directly without re-deduplication, and a key that receives only stale
events (lower seq_lsn than the stored winner) emits nothing at all.

The reference has no streaming surface whatsoever (batch-only plugin,
"Resumable: No" in every mode — reference README.md:50-69); this is part of
the engine's from-scratch streaming leg next to tail.py (foreachBatch) and
kafka_tail.py.

Scale notes: state is one small row per live key, hash-partitioned by key
across executors by the streaming aggregation exchange; per micro-batch
work is proportional to the batch, not to the table. Arrow moves the
grouped batches into pandas (no per-row Python pickling); the per-group
python work is a vectorized idxmax.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Emitted changelog row = current winner per key (op 'U' upsert / 'D' delete).
CHANGELOG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("seq_lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("event_id", T.StringType()),
    ]
)

# State = the winner's full row minus the key (the grouping key is implicit).
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq_lsn", T.LongType()),
        T.StructField("event_id", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


def _lww_update(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # batch winner: vectorized O(n) argmax on (seq_lsn, event_id) — event_id
    # is a fixed-width hex digest, so string order is a valid tie-break (S10)
    best = None
    for pdf in pdfs:
        top = pdf[pdf["seq_lsn"] == pdf["seq_lsn"].max()]
        row = top.loc[top["event_id"].idxmax()]
        if best is None or (row["seq_lsn"], row["event_id"]) > (best["seq_lsn"], best["event_id"]):
            best = row
    if best is None:  # no data for this key this batch (timeout path, unused)
        return
    if state.exists:
        cur_seq, cur_eid = state.get[0], state.get[1]
        if (int(best["seq_lsn"]), str(best["event_id"])) <= (cur_seq, cur_eid):
            return  # stale: winner unchanged, emit nothing
    tokens = None if best["tokens"] is None else [int(x) for x in best["tokens"]]
    n_tok = None if pd.isna(best["n_tok"]) else int(best["n_tok"])
    state.update((
        int(best["seq_lsn"]), str(best["event_id"]), str(best["op"]),
        tokens, n_tok,
        None if best["source"] is None else str(best["source"]),
    ))
    yield pd.DataFrame(
        {
            "doc_id": [key[0]],
            "seq_lsn": [int(best["seq_lsn"])],
            "op": [str(best["op"])],
            "tokens": [tokens],
            "n_tok": [n_tok],
            "source": [None if best["source"] is None else str(best["source"])],
            "event_id": [str(best["event_id"])],
        }
    )


def streaming_lww_changelog(events: DataFrame) -> DataFrame:
    """events: a STREAMING DataFrame with BINLOG_SCHEMA columns. Returns the
    per-key winner changelog (CHANGELOG_SCHEMA, update output mode)."""
    return (
        events.groupBy("doc_id")
        .applyInPandasWithState(
            _lww_update,
            outputStructType=CHANGELOG_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
