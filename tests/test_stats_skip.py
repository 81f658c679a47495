"""Per-file column bounds + manifest-level file skipping (Iceberg
data-file min/max stats analog). Bounds are harvested for free from the
parquet footers the writer already opens; skipping happens before any IO
and must stay exact across schema evolution (field-id resolution) and
merge-on-read (deltas can hide in-range base rows)."""

from pyspark.sql import functions as F

from embulk_output_databricks_spark.plans.merge import merge_apply_mor
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.sources.laketable import _stats_keep
from tests.test_laketable import seq_rows


def _mk(spark, warehouse, **kw):
    cat = LakeCatalog(spark, warehouse)
    return cat.create_table("s", SEQUENCES_SCHEMA, **kw)


def test_bounds_recorded_for_primitive_columns(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=4, bucket_key="doc_id")
    t.append(seq_rows(spark, range(50)))
    for f in t.manifest().files:
        st = f["stats"]
        assert set(st) <= {"doc_id", "n_tok", "source"}  # tokens: array, no bounds
        assert st["n_tok"] == [3, 3]
        lo, hi = st["doc_id"]
        assert lo.startswith("doc") and hi.startswith("doc") and lo <= hi


def test_skipping_prunes_disjoint_files_exactly(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1, bucket_key="doc_id")
    t.append(seq_rows(spark, range(0, 100)))       # doc00000000..99
    t.append(seq_rows(spark, range(500, 600)))     # doc00000500..599
    m = t.manifest()
    kept = _stats_keep(m, m.files, {"doc_id": ("doc00000500", None)})
    assert len(kept) < len(m.files)  # the low-range file is skipped pre-IO
    got = {r["doc_id"] for r in
           t.read(stats_filter={"doc_id": ("doc00000500", None)}).collect()}
    assert got == {f"doc{i:08d}" for i in range(500, 600)}
    # both bounds
    got = t.read(stats_filter={"doc_id": ("doc00000010", "doc00000019")}).count()
    assert got == 10


def test_missing_bounds_are_conservative(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1, bucket_key="doc_id")
    t.append(seq_rows(spark, range(10)))
    m = t.manifest()
    stripped = [{k: v for k, v in f.items() if k != "stats"} for f in m.files]
    # no bounds -> file cannot be proven disjoint -> kept
    assert _stats_keep(m, stripped, {"doc_id": ("zzz", None)}) == stripped
    # with bounds the same predicate skips it
    assert _stats_keep(m, m.files, {"doc_id": ("zzz", None)}) == []


def test_skipping_survives_rename_via_field_ids(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1, bucket_key="doc_id")
    t.append(seq_rows(spark, range(10)))          # bounds recorded as "source"
    t.rename_column("source", "origin")
    # filter by the CURRENT name; bounds were written under the old one
    assert t.read(stats_filter={"origin": ("web", "web")}).count() == 10
    m = t.manifest()
    assert _stats_keep(m, m.files, {"origin": ("aaa", "avro")}) == []


def test_files_predating_a_column_are_skipped(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=1, bucket_key="doc_id")
    t.append(seq_rows(spark, range(10)))  # written before `lang` exists
    t.add_column("lang", "string")
    df = seq_rows(spark, range(100, 105)).withColumn("lang", F.lit("en"))
    t.append(df)
    m = t.manifest()
    kept = _stats_keep(m, m.files, {"lang": ("en", "en")})
    assert len(kept) == 1  # pre-evolution file: all-null lang, provably out
    got = {r["doc_id"] for r in t.read(stats_filter={"lang": ("en", "en")}).collect()}
    assert got == {f"doc{i:08d}" for i in range(100, 105)}


def test_mor_delta_outside_range_hides_inrange_base_row(spark, warehouse):
    t = _mk(spark, warehouse, n_buckets=2, bucket_key="doc_id")
    t.append(seq_rows(spark, range(20)))  # n_tok == 3 everywhere
    # delta moves doc0..4 to n_tok=99 (out of the probed range)
    upd = seq_rows(spark, range(5)).withColumn("n_tok", F.lit(99)) \
        .withColumn("tokens", F.expr("array_repeat(7, 99)"))
    merge_apply_mor(t, upd, keys=["doc_id"])
    got = {r["doc_id"] for r in t.read(stats_filter={"n_tok": (3, 3)}).collect()}
    # updated keys are OUT (their winners have n_tok=99) even though their
    # base rows still sit in files whose bounds say n_tok==3
    assert got == {f"doc{i:08d}" for i in range(5, 20)}
    # and the out-of-range probe finds exactly the updated keys
    got99 = {r["doc_id"] for r in t.read(stats_filter={"n_tok": (99, 99)}).collect()}
    assert got99 == {f"doc{i:08d}" for i in range(5)}


def test_cluster_compaction_builds_range_index_within_bucket(spark, warehouse):
    """compact(cluster_by=...) sorts each bucket and splits it into
    consecutive files, so stats_filter prunes WITHIN the bucket."""
    import random

    from pyspark.sql import types as T

    t = _mk(spark, warehouse, n_buckets=1, bucket_key="doc_id")
    rows = [(f"doc{i:05d}", [i], n, "s")
            for i, n in enumerate(random.Random(3).sample(range(300), 300))]
    df = spark.createDataFrame(rows, T.StructType(SEQUENCES_SCHEMA.fields))
    t.append(df.limit(150))
    t.append(df.subtract(df.limit(150)))
    m0 = t.manifest()
    # unsorted appends: every file spans ~the full n_tok range -> no skipping
    assert len(_stats_keep(m0, m0.files, {"n_tok": (0, 49)})) == len(m0.files)

    assert t.compact(cluster_by=["n_tok"], rows_per_file=100) is not None
    m1 = t.manifest()
    data_files = [f for f in m1.files if f.get("kind") != "delta"]
    assert len(data_files) >= 3  # split by rows_per_file
    kept = _stats_keep(m1, data_files, {"n_tok": (0, 49)})
    assert len(kept) == 1  # the range index: one 100-row file covers 0..99
    # exactness unchanged
    got = {r["n_tok"] for r in t.read(stats_filter={"n_tok": (0, 49)}).collect()}
    assert got == set(range(50))
    assert t.row_count() == 300
