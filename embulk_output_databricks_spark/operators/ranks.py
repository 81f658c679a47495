"""Distributed global ranking — the scale path for ORDER-BY-the-world.

A plain `Window.orderBy(...)` with no partition key funnels the whole
dataset through ONE task (Spark even warns "Moving all data to a single
partition"); at 10^9 rows that is the job. The reference has no ranking at
all (its only ordering is ORDER BY in test read-backs,
src/test/.../AbstractTestDatabricksOutputPlugin.java:105-130), so this is a
§2.C engine-completeness operator built the way Spark's own global sort
works: range-partition on the sort key, rank locally, then correct each
partition's ranks by prefix offsets computed from a per-partition summary
that is tiny (one row per partition).

Why the pieces are safe at scale:
  * `repartitionByRange` samples the sort key and co-locates equal keys in
    one partition, so no tie group ever spans a partition boundary —
    local rank/dense_rank are globally correct after adding offsets.
  * the only single-partition window runs over the SUMMARY (#partitions
    rows, not data rows); it is broadcast-joined back on partition id.
  * total = sum of partition counts rides the same summary, giving exact
    global ntile without a second pass over the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID, _RN, _RNK, _DRNK = "__pid", "__l_rn", "__l_rnk", "__l_drnk"
_ROWS_B, _KEYS_B, _TOTAL = "__rows_before", "__keys_before", "__total"


def _sort_cols(order: list[tuple[str, str]]) -> list[Column]:
    out = []
    for name, direction in order:
        if direction not in ("asc", "desc"):
            raise ValueError(f"direction must be asc|desc, got {direction!r}")
        c = F.col(name)
        out.append(c.desc() if direction == "desc" else c.asc())
    return out


def global_ranks(
    df: DataFrame,
    order: list[tuple[str, str]],
    ntile: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append global `rn` (row_number), `rnk` (rank), `drnk` (dense_rank)
    and, if `ntile` is given, `quartile` (ntile bucket) columns, ranked by
    `order` = [(column, "asc"|"desc"), ...] over the WHOLE DataFrame —
    without ever shuffling the data to a single partition.

    `order` must be a total order (add a unique tie-break column) or rn is
    nondeterministic, exactly as with the plain window.
    """
    sort = _sort_cols(order)
    ranged = df.repartitionByRange(*sort) if num_partitions is None \
        else df.repartitionByRange(num_partitions, *sort)
    # pid must be stamped on the range exchange's output, before the
    # window's hash exchange re-partitions by it
    local = ranged.withColumn(_PID, F.spark_partition_id())
    w = Window.partitionBy(_PID).orderBy(*sort)
    key = F.struct(*[F.col(name) for name, _ in order])
    local = (
        local.withColumn(_RN, F.row_number().over(w))
        .withColumn(_RNK, F.rank().over(w))
        .withColumn(_DRNK, F.dense_rank().over(w))
    )
    # one row per partition: row count + distinct sort-key count
    summary = local.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__rows"),
        F.count_distinct(key).alias("__nkeys"),
    )
    before = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    everything = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    offsets = summary.select(
        _PID,
        F.coalesce(F.sum("__rows").over(before), F.lit(0)).alias(_ROWS_B),
        F.coalesce(F.sum("__nkeys").over(before), F.lit(0)).alias(_KEYS_B),
        F.sum("__rows").over(everything).alias(_TOTAL),
    )
    out = local.join(F.broadcast(offsets), _PID)
    rn = (F.col(_RN) + F.col(_ROWS_B)).cast("int")
    cols = [
        rn.alias("rn"),
        (F.col(_RNK) + F.col(_ROWS_B)).cast("int").alias("rnk"),
        (F.col(_DRNK) + F.col(_KEYS_B)).cast("int").alias("drnk"),
    ]
    if ntile is not None:
        cols.append(_ntile_bucket(rn, F.col(_TOTAL), ntile).alias("quartile"))
    drop = [_PID, _RN, _RNK, _DRNK, _ROWS_B, _KEYS_B, _TOTAL]
    return out.select(*[c for c in out.columns if c not in drop], *cols)


def _ntile_bucket(rn: Column, total: Column, k: int) -> Column:
    """Exact ntile(k) from the global row number: the first (total % k)
    buckets hold ceil(total/k) rows, the rest floor(total/k) — Spark's and
    the SQL-standard tiling. total >= rn >= 1; when total < k the `big`
    branch covers every row, so the floor-sized branch (q could be 0)
    never divides."""
    q = F.floor(total / k)
    r = total % k
    big = r * (q + 1)  # rows living in the ceil-sized buckets
    return (
        F.when(rn <= big, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - big - 1) / F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
