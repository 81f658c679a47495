"""export_snapshot: plain-parquet materialization of one snapshot
(the outbound twin of add_files; tests mirror test_add_files.py's
inode-identity zero-rewrite assertions in the other direction).
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.sources.laketable import LakeCatalog

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_tok", T.IntegerType()),
    T.StructField("source", T.StringType()),
])


def _rows(df):
    return sorted((r.doc_id, r.n_tok, r.source) for r in df.collect())


def _mk(spark, warehouse, n=400, **kw):
    cat = LakeCatalog(spark, warehouse)
    tbl = cat.create_table("seqs", SCHEMA, n_buckets=4, bucket_key="doc_id",
                           **kw)
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("int").alias("n_tok"),
        F.concat(F.lit("src"), F.col("id") % 3).alias("source"))
    tbl.append(df)
    return tbl


def test_clean_table_exports_by_hardlink(spark, warehouse, tmp_path):
    tbl = _mk(spark, warehouse)
    dest = str(tmp_path / "exp")
    rec = tbl.export_snapshot(dest)
    assert rec["rewritten_files"] == 0 and rec["linked"] > 0
    # zero-copy proof: every exported parquet shares an inode with the table
    table_inodes = {os.stat(os.path.join(tbl.root, f["path"])).st_ino
                    for f in tbl.manifest().files}
    for fn in os.listdir(dest):
        if fn.endswith(".parquet"):
            assert os.stat(os.path.join(dest, fn)).st_ino in table_inodes
    assert _rows(spark.read.parquet(dest)) == _rows(tbl.read())


def test_posdel_and_schema_evolution_force_rewrite(spark, warehouse, tmp_path):
    tbl = _mk(spark, warehouse)
    # second append with a disjoint doc_id range: its files' bounds prove
    # the delete below cannot touch them, so they stay linkable
    tbl.append(spark.range(1000, 1400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("int").alias("n_tok"),
        F.concat(F.lit("src"), F.col("id") % 3).alias("source")))
    # MOR delete marks first-append files posdel-targeted; rename leaves all
    # files at an old schema version -> nothing may be linked verbatim after
    tbl.delete_where({"doc_id": (0, 9)}, mode="mor")
    dest1 = str(tmp_path / "exp1")
    rec1 = tbl.export_snapshot(dest1)
    assert rec1["rewritten_files"] > 0 and rec1["linked"] > 0
    assert _rows(spark.read.parquet(dest1)) == _rows(tbl.read())

    tbl.rename_column("source", "origin")
    dest2 = str(tmp_path / "exp2")
    rec2 = tbl.export_snapshot(dest2)
    assert rec2["linked"] == 0  # every file needs the rename projection
    got = spark.read.parquet(dest2)
    assert "origin" in got.columns and "source" not in got.columns
    assert sorted((r.doc_id, r.n_tok, r.origin) for r in got.collect()) == \
        sorted((r.doc_id, r.n_tok, r.origin) for r in tbl.read().collect())


def test_mor_deltas_resolve_in_export(spark, warehouse, tmp_path):
    tbl = _mk(spark, warehouse, properties={"merge_keys": "doc_id"})
    upd = spark.createDataFrame(
        [(1, 999, "srcX", "U"), (2, 0, "", "D")],
        "doc_id long, n_tok int, source string, __op string")
    tbl.append_delta(upd, merge_keys=["doc_id"])
    dest = str(tmp_path / "exp")
    tbl.export_snapshot(dest)
    got = {r.doc_id: r.n_tok for r in spark.read.parquet(dest).collect()}
    assert got[1] == 999 and 2 not in got
    assert _rows(spark.read.parquet(dest)) == _rows(tbl.read())


def test_export_pins_old_version(spark, warehouse, tmp_path):
    tbl = _mk(spark, warehouse)
    v0 = tbl.manifest().version
    tbl.delete_where({"doc_id": (0, 199)})
    dest = str(tmp_path / "exp")
    rec = tbl.export_snapshot(dest, version=v0)
    assert rec["rows"] == 400
    assert spark.read.parquet(dest).count() == 400


def _more(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("int").alias("n_tok"),
        F.concat(F.lit("src"), F.col("id") % 3).alias("source"))


def test_sync_append_only_is_pure_links(spark, warehouse, tmp_path):
    tbl = _mk(spark, warehouse)
    dest = str(tmp_path / "exp")
    tbl.export_snapshot(dest)
    before = set(os.listdir(dest))
    tbl.append(_more(spark, 1000, 1400))
    rec = tbl.sync_export(dest)
    # pure-link sync: old links kept untouched, no rewrite, new files added
    assert rec["removed"] == 0 and rec["rewritten_files"] == 0
    assert rec["linked_added"] > 0 and rec["kept"] == len(
        [f for f in before if f.endswith(".parquet")])
    assert rec["rewrite_reused"]
    assert _rows(spark.read.parquet(dest)) == _rows(tbl.read())


def test_sync_compaction_delete_and_reuse(spark, warehouse, tmp_path):
    tbl = _mk(spark, warehouse)
    dest = str(tmp_path / "exp")
    tbl.append(_more(spark, 1000, 1400))
    tbl.export_snapshot(dest)
    # compaction materializes __row_id lineage ("ridc"): the old links die
    # and the compacted files land via the rewrite path, not links
    assert tbl.compact() is not None
    rec = tbl.sync_export(dest)
    assert rec["removed"] > 0 and rec["linked_added"] == 0
    assert rec["rewritten_files"] > 0 and not rec["rewrite_reused"]
    assert _rows(spark.read.parquet(dest)) == _rows(tbl.read())
    # append after compaction: the new file links in while the rewrite
    # artifacts (compacted ridc files, untouched) are reused verbatim
    tbl.append(_more(spark, 2000, 2400))
    rec2 = tbl.sync_export(dest)
    assert rec2["linked_added"] > 0 and rec2["removed"] == 0
    assert rec2["rewrite_reused"]
    assert _rows(spark.read.parquet(dest)) == _rows(tbl.read())
    # a MOR posdel invalidates the rewrite fingerprint -> re-resolve
    tbl.delete_where({"doc_id": (0, 9)}, mode="mor")
    rec3 = tbl.sync_export(dest)
    assert rec3["rewritten_files"] > 0 and not rec3["rewrite_reused"]
    assert _rows(spark.read.parquet(dest)) == _rows(tbl.read())
    # idempotent re-sync at the same version: nothing moves
    rec4 = tbl.sync_export(dest)
    assert (rec4["removed"], rec4["linked_added"]) == (0, 0)
    assert rec4["rewrite_reused"]
    assert _rows(spark.read.parquet(dest)) == _rows(tbl.read())


def test_sync_refuses_foreign_and_unexported_dirs(spark, warehouse, tmp_path):
    tbl = _mk(spark, warehouse, n=10)
    with pytest.raises(ValueError, match="export_snapshot"):
        tbl.sync_export(str(tmp_path / "nowhere"))
    dest = str(tmp_path / "exp")
    tbl.export_snapshot(dest)
    cat = LakeCatalog(spark, warehouse)
    other = cat.create_table("other", SCHEMA, n_buckets=2,
                             bucket_key="doc_id")
    other.append(_more(spark, 0, 5))
    with pytest.raises(ValueError, match="belongs to table"):
        other.sync_export(dest)


def test_refuses_nonempty_dest(spark, warehouse, tmp_path):
    tbl = _mk(spark, warehouse, n=10)
    dest = tmp_path / "exp"
    dest.mkdir()
    (dest / "junk").write_text("x")
    with pytest.raises(ValueError, match="not empty"):
        tbl.export_snapshot(str(dest))


def test_export_reads_in_external_engines(spark, warehouse, tmp_path):
    """The mirror is PLAIN parquet: any engine must read it with no
    knowledge of this engine — proven with DuckDB over a dirty table
    (MOR delete outstanding at export time, so some files are rewritten
    artifacts, some hardlinks)."""
    import duckdb

    tbl = _mk(spark, warehouse)
    tbl.delete_where({"doc_id": (0, 49)}, mode="mor")
    dest = str(tmp_path / "exp")
    tbl.export_snapshot(dest)
    got = duckdb.sql(
        f"SELECT doc_id, n_tok, source FROM read_parquet('{dest}/*.parquet')"
    ).fetchall()
    assert sorted(got) == _rows(tbl.read())
    assert len(got) == 350
