"""Watermarked event-time windowing over the change-event stream.

The reference has no streaming surface at all (batch plugin, "Resumable:
No" — reference README.md:50-69); the engine's batch analogs are the
events_tumbling / events_sessionize queries. This module is the TRUE
streaming form: Structured Streaming built-ins only — `withWatermark` +
`window()` — so late data beyond the watermark is dropped by the engine,
windows are emitted exactly once when the watermark passes their end
(append mode), and state is bounded (the watermark lets Spark evict
closed windows).

Scale notes: the windowed aggregation is a standard partial-agg shuffle
keyed by (window, key); watermark eviction keeps the state store bounded
by (active windows x keys), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tumbling_counts(
    events: DataFrame,
    time_col: str = "ts",
    key_col: str = "source",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(window, key) event counts and token sums with late-data
    dropping. `events` is a STREAMING DataFrame carrying an event-time
    timestamp column; use append output mode so each window emits once,
    finalized, when the watermark passes its end."""
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce(F.col("n_tok"), F.lit(0))).alias("n_tok_sum"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            key_col,
            "n_events",
            "n_tok_sum",
        )
    )
