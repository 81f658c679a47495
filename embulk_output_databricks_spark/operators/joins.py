"""Scalable non-equi joins the reference cannot express (its only join is
the MERGE equi-join, DatabricksOutputConnection.java:180-232) but that a
CDC/analytics engine needs as first-class operators (SURVEY.md §2.C):

  asof_join           point-in-time lookup ("most recent right row at or
                      before each left row per key") — the join used to
                      attach the last-known dimension/state version to a
                      change event during replay.
  range_join_banded   point-in-interval join without a cross product —
                      intervals are replicated onto fixed-width time bands
                      and the join becomes an equi-join on (key, band)
                      followed by an exact residual filter.

Both are implemented as single-shuffle compositions of built-in DataFrame
ops (no UDFs, no per-row Python), so they stay inside whole-stage codegen
and scale by partitioning on the join key:

  * asof_join is the union-tag trick: tag both sides, sort each key
    partition once by (ts, tag), and carry the last non-null right payload
    forward with last(..., ignorenulls=True). One shuffle on the key, no
    range explosion, no per-left-row probe — at 10^10 rows this is the
    only shape that works (a naive theta-join is quadratic per key).
  * range_join_banded replicates each interval to the ceil(len/band)+1
    bands it covers (2 rows for intervals shorter than a band), so the
    shuffle volume is O(points + intervals * bands_per_interval), and AQE
    plans the band equi-join like any other join (broadcast if the
    interval side is small).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payload: Sequence[str],
    strict: bool = True,
    prefix: str = "prior_",
) -> DataFrame:
    """For each left row, attach the most recent right row of the same key
    with right.ts < left.ts (strict) or <= (non-strict). Left rows with no
    prior right row keep NULL payloads (left-outer as-of semantics).

    Plan shape: union-tag + one window over (key ORDER BY ts, tag) — a
    single hash shuffle on `key`; the sort inside each partition is the
    same sort a sort-merge join would do, minus the join explosion.
    """
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in right_payload])
    # tag orders equal-ts rows: strict => left sorts BEFORE right at equal
    # ts (so an equal-ts right row is not visible to it); non-strict after.
    left_tag, right_tag = (0, 1) if strict else (1, 0)
    lt = left.withColumn("_tag", F.lit(left_tag)).withColumn(
        "_pay", F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType)
    )
    rt = right.select(
        F.col(key), F.col(ts), F.lit(right_tag).alias("_tag"),
        payload.alias("_pay"),
    )
    for c in lcols:
        if c not in (key, ts):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt.select(*lcols, "_tag", "_pay"))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_last", F.last("_pay", ignorenulls=True).over(w))
    out = carried.filter(F.col("_tag") == left_tag).select(
        *lcols,
        *[F.col("_last")[c].alias(f"{prefix}{c}") for c in right_payload],
    )
    return out


def range_join_banded(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    lo: str,
    hi: str,
    band_width: int,
) -> DataFrame:
    """Join each point to every interval of the same key with
    lo <= point_ts < hi, without a per-key cross product.

    `band_width` should be >= the typical interval length so most
    intervals land on <= 2 bands; the residual BETWEEN filter restores
    exactness. Returns points ⋈ intervals with all columns of both.
    """
    bands = intervals.withColumn(
        "_band",
        F.explode(
            F.sequence(
                (F.col(lo) / band_width).cast("bigint"),
                # hi is exclusive: a point at exactly hi never matches, so
                # the last covered band is the one containing hi-1
                ((F.col(hi) - 1) / band_width).cast("bigint"),
            )
        ),
    )
    pts = points.withColumn(
        "_band", (F.col(point_ts) / band_width).cast("bigint")
    )
    joined = pts.join(bands, on=[key, "_band"]).filter(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi))
    )
    return joined.drop("_band")
