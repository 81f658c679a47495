"""Watermarked stream-stream interval join (Structured Streaming built-in).

The reference has no streaming surface and no join beyond the MERGE
equi-join it ships to Databricks (reference
DatabricksOutputConnection.java:180-232); attribution questions over a
live change stream — "which purchase followed this click within the
window" — need a true stream-stream join. Spark supports it natively
when BOTH sides carry watermarks and the join condition bounds event-time
distance; this module only assembles that shape.

Scale notes: state is keyed by the join key and bounded by the watermark
horizon — each side buffers only rows younger than
(watermark - interval), evicted by the engine, so state is
O(arrival_rate x (watermark + interval)), independent of stream length.
The join itself is the standard shuffled symmetric-hash stream join keyed
on the equi-key; skewed keys split across partitions exactly as in the
batch plans (AQE does not apply to streaming state, so the key should be
the high-cardinality side, e.g. user/doc id, never a low-cardinality
type column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join streaming `left` to streaming `right` on `key` where the right
    event lands strictly after the left one and within `within` of it:
        R.key = L.key AND L.ts < R.ts <= L.ts + within
    Both inputs must be STREAMING DataFrames with event-time columns;
    output mode append (a joined pair emits once, when both sides are
    final under the watermark). Late rows beyond the watermark join
    nothing: the matching opposite-side state has been evicted — the
    streaming analog of the LWW pipeline's bounded-disorder contract.
    Columns are disambiguated with L_/R_ prefixes (key + timestamps keep
    one canonical copy)."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"unsupported join type {how!r}")
    lw = left.withWatermark(left_ts, watermark).alias("L")
    rw = right.withWatermark(right_ts, watermark).alias("R")
    cond = (
        (F.col(f"L.{key}") == F.col(f"R.{key}"))
        & (F.col(f"R.{right_ts}") > F.col(f"L.{left_ts}"))
        & (F.col(f"R.{right_ts}")
           <= F.col(f"L.{left_ts}") + F.expr(f"INTERVAL {within}"))
    )
    j = lw.join(rw, cond, how)
    out = [F.col(f"L.{key}").alias(key),
           F.col(f"L.{left_ts}").alias(f"L_{left_ts}"),
           F.col(f"R.{right_ts}").alias(f"R_{right_ts}")]
    taken = {key, left_ts}
    out += [F.col(f"L.{c}").alias(f"L_{c}") for c in left.columns
            if c not in taken]
    taken = {key, right_ts}
    out += [F.col(f"R.{c}").alias(f"R_{c}") for c in right.columns
            if c not in taken]
    return j.select(*out)
