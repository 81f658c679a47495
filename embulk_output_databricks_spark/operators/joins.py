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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_payload: Sequence[str],
    bucket_width: int,
    strict: bool = True,
    prefix: str = "prior_",
) -> DataFrame:
    """Skew-robust two-phase as-of join, value-identical to asof_join.

    asof_join's window is sequential per key: a hot key (30% of a 10^10-row
    stream on one id) serializes through one task. Here the timeline is cut
    into `bucket_width` buckets and the work splits into:

      1. per-(key, bucket) summary: the LAST right payload in each bucket —
         an associative max_by aggregate (map-side combine, skew-immune);
      2. carry-in: per key, a window over the per-bucket summaries ordered
         by bucket — sequential, but over #buckets rows per key, not
         #events (a 10^9-event hot key with daily buckets is ~365 rows);
      3. intra-bucket union-tag window partitioned by (key, bucket) — a hot
         key's events now spread across as many tasks as it has buckets —
         seeded with the carry-in where the bucket has no earlier right row.

    Exactness: the most recent right row before a left row is either in the
    same bucket (phase 3 window) or the latest row of some earlier bucket
    (phase 2 carry), never anything else.
    """
    lcols = left.columns
    pay_t = right.select(
        F.struct(*[F.col(c) for c in right_payload]).alias("p")
    ).schema["p"].dataType
    bkt = lambda c: (F.col(c) / bucket_width).cast("bigint")  # noqa: E731

    # phase 1+2: carry-in per (key, bucket) from strictly-earlier buckets.
    # The carry must cover every bucket the LEFT side touches too: a left
    # row in a bucket with no right rows at all still needs the latest
    # payload of an earlier bucket.
    rb = right.select(
        F.col(key), F.col(ts), bkt(ts).alias("_b"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_pay"),
    )
    bucket_last = rb.groupBy(key, "_b").agg(
        F.max_by("_pay", F.col(ts)).alias("_last_in_bucket"))
    left_tag, right_tag = (0, 1) if strict else (1, 0)
    lt = (
        left.withColumn("_b", bkt(ts))
        .withColumn("_tag", F.lit(left_tag))
        .withColumn("_pay", F.lit(None).cast(pay_t))
    )
    all_buckets = (
        lt.select(key, "_b").unionByName(rb.select(key, "_b")).distinct()
    )
    summaries = all_buckets.join(bucket_last, [key, "_b"], "left")
    wprev = (
        Window.partitionBy(key).orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.select(
        key, "_b",
        F.last("_last_in_bucket", ignorenulls=True).over(wprev).alias("_carry"),
    )

    # phase 3: union-tag window inside each (key, bucket)
    rt = rb.select(F.col(key), F.col(ts), "_b",
                   F.lit(right_tag).alias("_tag"), "_pay")
    for c in lcols:
        if c not in (key, ts):
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt.select(*lcols, "_b", "_tag", "_pay"))
    w = (
        Window.partitionBy(key, "_b")
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_bucket = u.withColumn("_local", F.last("_pay", ignorenulls=True).over(w))
    out = (
        in_bucket.filter(F.col("_tag") == left_tag)
        .join(carry, [key, "_b"], "left")
        .withColumn("_last", F.coalesce("_local", "_carry"))
    )
    return out.select(
        *lcols,
        *[F.col("_last")[c].alias(f"{prefix}{c}") for c in right_payload],
    )
