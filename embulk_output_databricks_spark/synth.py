"""Deterministic synthetic binlog generator (FIXTURES.md F2).

All generation is spark.range-based arithmetic — fully distributed, seeded,
zero external data, identical output at any parallelism (the property the
N-vs-4N scaling benchmark depends on). Token payloads follow FIXTURES.md F1:
tokens[j] = (i*2654435761 + j*40503) % 50257.

Skew: doc assignment uses a power-law-ish transform of a hash-uniform u in
[0,1) (doc = floor(D * u^alpha)), plus an optional pinned hot key receiving
`hot_frac` of all events (FIXTURES.md: doc00000000 ~5%) to exercise the
salted dedup path (SURVEY.md §2.C window-functions note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KNUTH = 2654435761  # Knuth multiplicative hash constant (public)
VOCAB = 50257


def _u01(col):
    """Deterministic hash-uniform double in [0,1) from a long column."""
    return (F.pmod(col * F.lit(KNUTH) + F.lit(12345), F.lit(2**31)) / F.lit(float(2**31)))


def synth_binlog(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    events_per_batch: int,
    seed: int = 42,
    alpha: float = 3.0,
    hot_frac: float = 0.0,
    delete_frac: float = 0.05,
    max_tok: int = 64,
    partitions: int | None = None,
    start: int = 0,
) -> DataFrame:
    """Binlog of upsert/delete change events, BINLOG_SCHEMA-shaped.

    seq_lsn is globally monotone (the range index); batch_id = lsn // events_per_batch.
    op: first sighting of a doc behaves as I, later ones U, a deterministic
    delete_frac slice becomes D (engine extension, FIXTURES.md S12).

    `start` generates only the slice [start, start + n_events) — every event
    is a pure function of its absolute lsn, so slicing commutes with
    generation. This is the analog of partition-pruned binlog reads: a
    replay batch synthesizes exactly its offset range instead of scanning
    the whole stream and filtering.
    """
    rng = spark.range(start, start + n_events, 1, partitions) \
        if partitions else spark.range(start, start + n_events)
    i = F.col("id")
    u = _u01(i + F.lit(seed * 1_000_003))
    # power-law doc index; hot key: a deterministic hot_frac slice pinned to doc 0
    doc_idx = F.floor(F.pow(u, F.lit(alpha)) * F.lit(n_docs)).cast("long")
    if hot_frac > 0:
        hot = _u01(i + F.lit(seed * 7_777_777)) < F.lit(hot_frac)
        doc_idx = F.when(hot, F.lit(0)).otherwise(doc_idx)
    n_tok = (F.pmod(i * F.lit(40503) + F.lit(seed), F.lit(max_tok)) + F.lit(1)).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - F.lit(1)),
        lambda j: F.pmod(i * F.lit(KNUTH) + j.cast("long") * F.lit(40503), F.lit(VOCAB)).cast("int"),
    )
    is_del = _u01(i + F.lit(seed * 31337)) < F.lit(delete_frac)
    src = F.element_at(F.array(F.lit("web"), F.lit("book"), F.lit("code"), F.lit("wiki")),
                       (F.pmod(doc_idx, F.lit(4)) + F.lit(1)).cast("int"))
    return rng.select(
        i.alias("seq_lsn"),
        (i / F.lit(events_per_batch)).cast("long").alias("batch_id"),
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.format_string("doc%08d", doc_idx).alias("doc_id"),
        F.when(is_del, F.lit(None)).otherwise(tokens).alias("tokens"),
        F.when(is_del, F.lit(None)).otherwise(n_tok).alias("n_tok"),
        F.when(is_del, F.lit(None)).otherwise(src).alias("source"),
        F.sha1(F.concat_ws("|", i.cast("string"), F.lit(seed).cast("string"))).alias("event_id"),
    )
