"""Initial-default column values (Iceberg v3 initial-default analog).

A column added with `default=` is a metadata-only backfill: rows written
BEFORE the add read the literal (never NULL), rows written after carry the
physical value. Mirrors the reference's column_options defaulting posture
(missing source values materialize per-column policy, README.md:40-44)
without any rewrite — the 100 TB add-a-column primitive.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.sources.laketable import SchemaEvolutionError

SCHEMA = "doc_id string, n_tok int"
_STRUCT = T.StructType([T.StructField("doc_id", T.StringType()),
                        T.StructField("n_tok", T.IntegerType())])


def _t(spark, warehouse, name="d", n_buckets=2):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table(name, _STRUCT, n_buckets=n_buckets, bucket_key="doc_id")
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], SCHEMA))
    return t


def test_old_rows_read_default_new_rows_physical(spark, warehouse):
    t = _t(spark, warehouse)
    files = {f["path"] for f in t.manifest().files}
    t.add_column("lang", "string", default="en")
    assert {f["path"] for f in t.manifest().files} == files  # zero rewrite
    t.append(spark.createDataFrame([("c", 3, "fr")], SCHEMA + ", lang string"))
    got = {r["doc_id"]: r["lang"] for r in t.read().collect()}
    assert got == {"a": "en", "b": "en", "c": "fr"}
    # filters see the default too (post-projection semantics)
    assert t.read().filter(F.col("lang") == "en").count() == 2


def test_default_must_fit_type(spark, warehouse):
    t = _t(spark, warehouse)
    with pytest.raises(SchemaEvolutionError, match="does not fit"):
        t.add_column("k", "int", default="not-an-int")


def test_default_survives_rename_and_widen(spark, warehouse):
    t = _t(spark, warehouse)
    t.add_column("score", "int", default=7)
    t.rename_column("score", "rank")
    t.widen_column("rank", "bigint")
    row = t.read().filter(F.col("doc_id") == "a").first()
    assert row["rank"] == 7


def test_array_default(spark, warehouse):
    t = _t(spark, warehouse)
    t.add_column("tags", "array<int>", default=[1, 2])
    assert t.read().first()["tags"] == [1, 2]


def test_stats_skip_on_defaulted_column(spark, warehouse):
    """Pre-add files are constant-valued [d, d] for skipping: a range that
    misses the default prunes them; one that contains it keeps them."""
    t = _t(spark, warehouse, n_buckets=1)
    t.add_column("v", "int", default=50)
    t.append(spark.createDataFrame([("c", 3, 500)], SCHEMA + ", v int"))
    # miss the default entirely -> pre-add file pruned, only c survives
    got = t.read(stats_filter={"v": (400, 600)}).collect()
    assert {r["doc_id"] for r in got} == {"c"}
    # contain the default -> pre-add rows come back with v=50
    got = t.read(stats_filter={"v": (40, 60)}).collect()
    assert {(r["doc_id"], r["v"]) for r in got} == {("a", 50), ("b", 50)}


def test_no_default_still_prunes_as_all_null(spark, warehouse):
    t = _t(spark, warehouse, n_buckets=1)
    t.add_column("v", "int")
    assert t.read(stats_filter={"v": (0, 100)}).count() == 0


def test_delete_where_classifies_default_files(spark, warehouse):
    """delete_where on a defaulted column: pre-add files drop WHOLE with
    zero IO when the default is covered, stay untouched when disjoint."""
    t = _t(spark, warehouse, n_buckets=1)
    t.add_column("age", "int", default=10)
    before = {f["path"] for f in t.manifest().files}
    # disjoint: nothing deleted, files untouched
    m = t.delete_where({"age": (100, None)})
    assert {f["path"] for f in m.files} == before
    assert t.read().count() == 2
    # covered: both pre-add rows die; the file drops without being read
    m = t.delete_where({"age": (None, 20)})
    assert t.read().count() == 0
    assert not {f["path"] for f in m.files if f.get("kind") not in
                ("posdel", "eqdel")} & before


def test_bloom_skip_respects_default(spark, warehouse):
    t = _t(spark, warehouse, n_buckets=1)
    t.add_column("lang", "string", default="en")
    t.set_bloom_columns(["lang"])
    t.append(spark.createDataFrame([("c", 3, "fr")], SCHEMA + ", lang string"))
    # lookup != default: pre-add file pruned, bloom prunes nothing else
    assert {r["doc_id"] for r in t.read(eq_filter={"lang": "fr"}).collect()} == {"c"}
    # lookup == default: pre-add rows must come back
    assert {r["doc_id"] for r in t.read(eq_filter={"lang": "en"}).collect()} == {"a", "b"}


def test_merge_sees_defaults(spark, warehouse):
    """The MERGE read leg funnels through _df_for_files, so a merge over a
    defaulted column updates against the default-visible state."""
    from embulk_output_databricks_spark.plans.merge import merge_apply

    t = _t(spark, warehouse)
    t.update_properties({"merge_keys": "doc_id"})
    t.add_column("lang", "string", default="en")
    staged = spark.createDataFrame([("a", 9, "de"), ("z", 0, "pt")],
                                   SCHEMA + ", lang string")
    merge_apply(t, staged, keys=["doc_id"])
    got = {r["doc_id"]: r["lang"] for r in t.read().collect()}
    assert got == {"a": "de", "b": "en", "z": "pt"}
