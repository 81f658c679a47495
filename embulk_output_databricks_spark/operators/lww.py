"""Last-writer-wins dedup per key (north rule core; SURVEY.md §2.C windows).

The reference has no in-batch dedup — its MERGE sources are UNION ALL folds
of per-task staging tables (DatabricksOutputConnection.java:234-248) and a
key collision inside one run is undefined behavior. The CDC engine must pick
exactly one event per key per batch, totally ordered by (seq_lsn, event_id)
(tie-break pinned by FIXTURES.md S10), or replay is nondeterministic.

Four strategies, selectable per JobConfig.dedup_strategy:

  maxby      groupBy(keys).agg(max_by(struct(payload), struct(order))).
             Associative argmax: partial_max_by pre-reduces every hot key
             inside each input partition before the single shuffle
             (skew-proof), and the aggregate compares only the small
             ordering struct — measured ~3x faster than maxstruct at 2M
             events because maxstruct's buffer updates compare/copy the
             full payload struct (token arrays included). THE DEFAULT.
  maxstruct  groupBy(keys).agg(max(struct(order..., payload...))) —
             lexicographic max over the whole struct; same single-shuffle
             map-side-combine shape, slower constant factor; kept as the
             simplest-semantics reference implementation.
  salted     explicit two-phase reduce: groupBy(keys, salt) then groupBy(keys)
             — the associativity spelled out; useful when one key is so hot
             that even partial aggregation buffers need fan-out.
  window     row_number over Window.partitionBy(keys).orderBy(desc order)==1 —
             the textbook plan; kept for parity/testing because a hot key
             serializes into one window partition (AQE cannot split it).

All return one row per key with the original column set. The order columns
must totally order events within a key (tie-break via a unique event_id,
FIXTURES.md S10) — with ties, maxby's pick among equals is unspecified.

Column references go through qcol/qname (sources/laketable.py): every
name here is user data, and parsed contexts (F.col, select/groupBy
strings) would otherwise choke on a literal backtick in a column name —
the identifier-quoting parity with the reference's quoteIdentifierString.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.laketable import qcol, qname

_W = "__lww"
_SALT = "__salt"


def _order_struct(df: DataFrame, keys: list[str], order: list[str]) -> "F.Column":
    payload = [c for c in df.columns if c not in keys and c not in order]
    return F.struct(*[qcol(c) for c in order], *[qcol(c) for c in payload])


def _unpack(agg: DataFrame, df_cols: list[str], keys: list[str]) -> DataFrame:
    others = [c for c in df_cols if c not in keys]
    return agg.select(
        *[qcol(k) for k in keys],
        *[F.col(f"{_W}.{qname(c)}").alias(c) for c in others],
    ).select(*[qcol(c) for c in df_cols])


def lww_dedup(
    df: DataFrame,
    keys: list[str] | None = None,
    order: list[str] | None = None,
    strategy: str = "maxby",
    salt: int = 8,
) -> DataFrame:
    keys = keys or ["doc_id"]
    order = order or ["seq_lsn", "event_id"]
    if strategy == "window":
        w = Window.partitionBy(*[qcol(k) for k in keys]) \
            .orderBy(*[qcol(c).desc() for c in order])
        return (
            df.withColumn(_W, F.row_number().over(w))
            .filter(F.col(_W) == 1)
            .drop(_W)
        )
    if strategy == "maxby":
        others = [c for c in df.columns if c not in keys]
        agg = df.groupBy(*[qcol(k) for k in keys]).agg(
            F.max_by(F.struct(*[qcol(c) for c in others]),
                     F.struct(*[qcol(c) for c in order])).alias(_W)
        )
        return _unpack(agg, df.columns, keys)
    s = _order_struct(df, keys, order)
    if strategy == "salted":
        phase1 = (
            df.withColumn(_SALT, F.pmod(
                F.xxhash64(*[qcol(c) for c in order]), F.lit(salt)))
            .groupBy(*[qcol(k) for k in keys], _SALT)
            .agg(F.max(s).alias(_W))
        )
        # re-expand the struct to columns so phase 2 reuses the same shape
        mid = _unpack(phase1.drop(_SALT), df.columns, keys)
        agg = mid.groupBy(*[qcol(k) for k in keys]).agg(
            F.max(_order_struct(mid, keys, order)).alias(_W))
        return _unpack(agg, df.columns, keys)
    if strategy != "maxstruct":
        raise ValueError(f"unknown lww strategy {strategy!r}")
    agg = df.groupBy(*[qcol(k) for k in keys]).agg(F.max(s).alias(_W))
    return _unpack(agg, df.columns, keys)
