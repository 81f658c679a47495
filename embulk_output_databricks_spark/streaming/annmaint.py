"""Incrementally-maintained ANN index over a CDC-managed embedding table.

`ann_lsh_topk` / `ann_ivf_topk` (operators/similarity.py) answer the
one-shot question — approximate neighbors over a STATIC corpus. A
CDC-managed corpus changes batch by batch, and re-hashing every vector
(re-assigning every cell) over 100 TB per batch is the anti-pattern the
change feed exists to avoid (the reference has no incremental story at
all: README.md:50-69 "Resumable: No"). This module keeps a derived CELL
table `(key, cell, vector)` exactly in sync with its base table:

    base.diff(watermark)             # I/U/D rows of changed keys
      -> cell assignment (I/U rows)  # one SRP hash per changed vector
       + one delete row per D key
      -> keyed MERGE into the index  # upserts move keys between cells

Cell assignment is sign-random-projection (portable.f_srp_bucket): a pure
function of the vector — unlike centroid-based IVF there is NO auxiliary
state that itself needs maintenance, so an edited vector re-assigns from
its bytes alone. The index table is the search structure: bucketed on the
key (so the maintenance MERGE stays bucket-pruned and a moved key's old
row is found in place), write-sorted on `cell` and bloom-indexed on
`cell`, so a probe reads only the files whose footer range / bloom admits
the probed cells — the scan cost is O(cell), not O(corpus), and survives
CDC churn because the sort order rides every rewrite.

The consumed-version watermark rides the SAME snapshot commit as the
MERGE (snapshot properties are atomic with the snapshot), so a crash
anywhere re-derives precisely the missed interval — the aggmaint
exactly-once contract, applied to a per-row derived table (the neardup
index's contract, for vectors).

`topk(queries, k)` probes the index: queries hash to cells driver-side
(<= 2^planes distinct values — a bounded collect at any corpus size), the
candidate read is file-skipped to those cells, and the exact cosine +
rank runs only inside them — the same in-cell semantics as the static
`srp_bucketed_topk`, served from maintained state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import portable as P
from ..plans.merge import OP_COL, merge_apply
from ..sources.laketable import LakeTable

WATERMARK_PROP = "ann_upto_version"
CELL_COL = "cell"


class AnnIndex:
    """Maintained SRP-cell vector index: construct over (catalog, base
    table); `sync()` after every base commit batch (any interval catches
    up); `topk(queries, k)` for the search question."""

    def __init__(self, catalog, base: LakeTable, name: str,
                 key_col: str, vec_col: str,
                 planes: int = 4, dim: int = 64, n_buckets: int = 8,
                 rows_per_file: int | None = None,
                 merge_strategy: str = "cow"):
        if merge_strategy not in ("cow", "mor"):
            raise ValueError(f"unknown merge_strategy {merge_strategy!r}")
        self.base = base
        self.key_col, self.vec_col = key_col, vec_col
        self.planes, self.dim = planes, dim
        self.merge_strategy = merge_strategy
        if catalog.table_exists(name):
            self.index = catalog.load(name)
            props = self.index.manifest().properties
            if WATERMARK_PROP not in props:
                raise ValueError(f"{name}: not an ANN index table")
            self.merge_strategy = props.get("ann_strategy", merge_strategy)
            return
        by_name = {f.name: f for f in base.manifest().schema().fields}
        for c in (key_col, vec_col):
            if c not in by_name:
                raise ValueError(f"column {c!r} not in base schema")
        if not isinstance(by_name[vec_col].dataType, T.ArrayType):
            raise ValueError(f"vector column {vec_col!r} is not an array "
                             f"(got {by_name[vec_col].dataType.simpleString()})")
        schema = T.StructType([
            T.StructField(key_col, by_name[key_col].dataType),
            T.StructField(CELL_COL, T.IntegerType()),
            T.StructField(vec_col, by_name[vec_col].dataType),
        ])
        self.index = catalog.create_table(
            name, schema, n_buckets=n_buckets, bucket_key=key_col,
            properties={"merge_keys": key_col,
                        "ann_planes": str(planes), "ann_dim": str(dim),
                        "ann_strategy": merge_strategy})
        # probe-side skipping: every write clusters its bucket by cell
        # (footer bounds become a live per-file cell range) and harvests a
        # cell bloom — both ride all future merge rewrites, so the probe
        # path never degrades with churn
        self.index.set_sort_order([CELL_COL], rows_per_file=rows_per_file)
        self.index.set_bloom_columns([CELL_COL])
        v = base.current_version()
        self.index.append(
            self._cell_rows(base.read(version=v)),
            properties={WATERMARK_PROP: str(v), "operation": "ann-seed"})

    def _cell(self, vec):
        return P.f_srp_bucket(vec, self.planes, self.dim).cast("int")

    def _cell_rows(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.key_col),
            self._cell(F.col(self.vec_col)).alias(CELL_COL),
            F.col(self.vec_col),
        )

    def watermark(self) -> int:
        return int(self.index.manifest().properties[WATERMARK_PROP])

    def sync(self):
        """Advance the index to the base's current version; returns the
        new manifest, or None when already current. The hash work runs
        only over changed vectors; a changed assignment MOVES the key
        between cells through the ordinary keyed MERGE (old row updated in
        place — the key, not the cell, is the identity).

        merge_strategy='mor' writes the sync as O(batch) delta appends
        instead of COW bucket rewrites — the right posture at scale, where
        a batch's keys hash into EVERY index bucket and COW would rewrite
        the whole index per sync. Cost moves to the probe (delta-holding
        buckets resolve winners and skip nothing) until `compact()` folds
        the deltas back and restores sorted, bloom-indexed files."""
        upto, cur = self.watermark(), self.base.current_version()
        if cur <= upto:
            return None
        from .cdf import keyed_changes  # write-time CDF when available
        d = keyed_changes(self.base, upto, [self.key_col], to_version=cur,
                          include_old=False, dedup_last_per_key=True)
        ups = (self._cell_rows(d.filter(F.col("__op").isin("I", "U")))
               .withColumn(OP_COL, F.lit("U")))
        vec_t = next(f.dataType for f in self.index.manifest().schema().fields
                     if f.name == self.vec_col)
        dels = d.filter(F.col("__op") == "D").select(
            self.key_col,
            F.lit(None).cast("int").alias(CELL_COL),
            F.lit(None).cast(vec_t).alias(self.vec_col),
            F.lit("D").alias(OP_COL),
        )
        props = {WATERMARK_PROP: str(cur), "operation": "ann-sync"}
        staged = ups.unionByName(dels)
        if self.merge_strategy == "mor":
            from ..plans.merge import merge_apply_mor

            return merge_apply_mor(self.index, staged, keys=[self.key_col],
                                   support_deletes=True, properties=props)
        return merge_apply(self.index, staged, keys=[self.key_col],
                           support_deletes=True, properties=props)

    def compact(self):
        """Fold outstanding MOR deltas back into sorted, bloom-indexed base
        files (probe skipping fully restored). No-op for a COW index."""
        return self.index.compact_deltas()

    def probe_cells(self, queries: DataFrame, vec_col: str) -> list[int]:
        """Distinct cells the query batch hashes to — bounded by 2^planes,
        so the driver-side collect is safe at any corpus size."""
        q = queries.select(self._cell(F.col(vec_col)).alias(CELL_COL))
        return sorted(r[0] for r in q.distinct().collect())

    def topk(self, queries: DataFrame, k: int,
             id_col: str = "query_id", vec_col: str = "qv") -> DataFrame:
        """In-cell cosine top-k for a batch of query vectors:
        (query_id, neighbor_id, rank, cos), ties broken by neighbor id.
        A query whose own key is indexed never matches itself (identity
        by key equality, applied when the id types line up). The candidate
        read is file-skipped to the probed cells (bloom + sorted bounds);
        the join is an equi-join on cell — shuffle-partitionable, with the
        same semantics as the static srp_bucketed_topk."""
        cells = self.probe_cells(queries, vec_col)
        if not cells:  # empty query batch: empty result, zero index IO
            empty = self.index.read().limit(0)
            return (empty.select(
                F.col(self.key_col).alias("query_id"),
                F.col(self.key_col).alias("neighbor_id"))
                .withColumn("rank", F.lit(0))
                .withColumn("cos", F.lit(0.0)).limit(0))
        q = queries.select(
            F.col(id_col).alias("__qid"),
            F.col(vec_col).alias("__qv"),
            self._cell(F.col(vec_col)).alias(CELL_COL),
        )
        cand = self.index.read(eq_filter={CELL_COL: cells}).select(
            F.col(self.key_col).alias("__nid"),
            F.col(self.vec_col).alias("__nv"),
            CELL_COL,
        )
        scored = (
            q.join(cand, CELL_COL)
            .filter(~F.col("__qid").eqNullSafe(F.col("__nid")))
            .withColumn("cos", P.f_cosine(F.col("__qv"), F.col("__nv")))
        )
        w = Window.partitionBy("__qid").orderBy(F.col("cos").desc(),
                                                F.col("__nid"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select(F.col("__qid").alias("query_id"),
                        F.col("__nid").alias("neighbor_id"),
                        "rank", "cos"))
