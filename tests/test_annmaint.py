"""Incrementally-maintained ANN index (streaming/annmaint.py): the cell
table synced from LakeTable.diff must equal a full re-assignment of the
final base state after every interval (edits MOVE keys between cells,
deletes drop them, inserts appear); topk served from the maintained index
must equal the static in-cell search over the same corpus; and the probe
read must actually SKIP files for cells it does not probe (bloom + sorted
bounds), or the index is not an index."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.functions import portable as P
from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.sources.laketable import LakeCatalog
from embulk_output_databricks_spark.streaming.annmaint import (
    CELL_COL,
    WATERMARK_PROP,
    AnnIndex,
)

PLANES, DIM = 4, 8

BASE = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def _vectors(spark, n, dim=DIM, offset=0):
    """Deterministic spread of unit-ish vectors (seeded by id, no RNG)."""
    return spark.range(offset, offset + n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.sin(F.col("id") * i + i * i).cast("float"),
        ).alias("embedding"),
    )


def _mk(spark, warehouse, n=60, **idx_kw):
    cat = LakeCatalog(spark, f"{warehouse}/ann")
    base = cat.create_table("base", BASE, n_buckets=4, bucket_key="vec_id")
    base.append(_vectors(spark, n))
    idx = AnnIndex(cat, base, "idx", key_col="vec_id", vec_col="embedding",
                   planes=PLANES, dim=DIM, **idx_kw)
    return cat, base, idx


def _staged(spark, df, op):
    return df.withColumn("op", F.lit(op))


def _assignments(base):
    return base.read().select(
        "vec_id",
        P.f_srp_bucket(F.col("embedding"), PLANES, DIM).cast("int").alias(CELL_COL),
        "embedding",
    )


def _state(df):
    return sorted(
        (r["vec_id"], r[CELL_COL], tuple(r["embedding"]))
        for r in df.collect()
    )


def test_index_tracks_base_through_edit_delete_insert(spark, warehouse):
    cat, base, idx = _mk(spark, warehouse)
    assert _state(idx.index.read()) == _state(_assignments(base))

    # negate a third of the vectors (every SRP sign flips -> the key MOVES
    # to the complement cell), delete a third, insert brand-new keys
    ev = base.read()
    edit = ev.filter(F.col("vec_id") % 3 == 0).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
    dels = ev.filter(F.col("vec_id") % 3 == 1).select(
        "vec_id", F.lit(None).cast(BASE["embedding"].dataType).alias("embedding"))
    ins = _vectors(spark, 10, offset=1000)
    merge_apply(base,
                _staged(spark, edit, "U")
                .unionByName(_staged(spark, dels, "D"))
                .unionByName(_staged(spark, ins, "U")),
                keys=["vec_id"], support_deletes=True)
    assert idx.sync() is not None
    assert _state(idx.index.read()) == _state(_assignments(base))
    assert idx.watermark() == base.current_version()
    # second sync is a no-op
    assert idx.sync() is None


def test_topk_matches_static_in_cell_search(spark, warehouse):
    from embulk_output_databricks_spark.operators.similarity import (
        srp_bucketed_topk,
    )

    cat, base, idx = _mk(spark, warehouse, n=80)
    # churn first so the answer comes from maintained state, not the seed
    edit = base.read().filter(F.col("vec_id") % 5 == 0).select(
        "vec_id", F.reverse("embedding").alias("embedding"))
    merge_apply(base, _staged(spark, edit, "U"), keys=["vec_id"],
                support_deletes=True)
    idx.sync()

    queries = base.read().filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    got = sorted(tuple(r) for r in idx.topk(queries, k=3).collect())
    want = sorted(tuple(r) for r in srp_bucketed_topk(
        base.read(), n_queries=8, k=3, planes=PLANES, dim=DIM).collect())
    assert got == want and len(got) > 0


def test_probe_skips_unprobed_cells(spark, warehouse):
    # small files (sorted by cell) so a one-cell probe can prove skipping
    cat, base, idx = _mk(spark, warehouse, n=120, n_buckets=2,
                         rows_per_file=10)
    cells = [r[0] for r in idx.index.read()
             .groupBy(CELL_COL).count().orderBy(F.col("count").desc())
             .limit(1).collect()]
    st = idx.index.scan_stats(eq_filter={CELL_COL: cells})
    assert st["files_read"] < st["files_live"]
    assert st["pruned_bounds"] + st["pruned_bloom"] > 0
    # the skipped read returns exactly the probed cell's rows
    got = idx.index.read(eq_filter={CELL_COL: cells})
    assert got.filter(F.col(CELL_COL) != cells[0]).count() == 0
    full = idx.index.read().filter(F.col(CELL_COL) == cells[0]).count()
    assert got.count() == full > 0


def test_not_an_index_and_bad_columns(spark, warehouse):
    cat, base, idx = _mk(spark, warehouse, n=10)
    with pytest.raises(ValueError, match="not an ANN index"):
        AnnIndex(cat, base, "base", key_col="vec_id", vec_col="embedding")
    with pytest.raises(ValueError, match="not in base schema"):
        AnnIndex(cat, base, "idx2", key_col="vec_id", vec_col="nope")
    with pytest.raises(ValueError, match="not an array"):
        AnnIndex(cat, base, "idx3", key_col="embedding", vec_col="vec_id")


def test_mor_index_tracks_and_compacts(spark, warehouse):
    cat, base, _ = _mk(spark, warehouse, n=50)
    idx = AnnIndex(cat, base, "idx_mor", key_col="vec_id",
                   vec_col="embedding", planes=PLANES, dim=DIM,
                   merge_strategy="mor")
    ev = base.read()
    edit = ev.filter(F.col("vec_id") % 4 == 0).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding"))
    dels = ev.filter(F.col("vec_id") % 4 == 1).select(
        "vec_id", F.lit(None).cast(BASE["embedding"].dataType).alias("embedding"))
    merge_apply(base, _staged(spark, edit, "U")
                .unionByName(_staged(spark, dels, "D")),
                keys=["vec_id"], support_deletes=True)
    assert idx.sync() is not None
    # MOR: the sync appended deltas, never rewrote base index files
    assert any(f.get("kind") == "delta"
               for f in idx.index.manifest().files)
    assert _state(idx.index.read()) == _state(_assignments(base))
    # compaction folds deltas away; resolved state unchanged
    idx.compact()
    assert not any(f.get("kind") == "delta"
                   for f in idx.index.manifest().files)
    assert _state(idx.index.read()) == _state(_assignments(base))
    # reload restores the strategy from table properties
    again = AnnIndex(cat, base, "idx_mor", key_col="vec_id",
                     vec_col="embedding")
    assert again.merge_strategy == "mor"


def test_reload_keeps_watermark(spark, warehouse):
    cat, base, idx = _mk(spark, warehouse, n=10)
    again = AnnIndex(cat, base, "idx", key_col="vec_id", vec_col="embedding",
                     planes=PLANES, dim=DIM)
    assert again.watermark() == idx.watermark()
