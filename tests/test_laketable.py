"""Storage-layer tests: atomic snapshots, bucket pruning, schema evolution.

Mirrors the reference's golden-SQL layer (TestDatabricksOutputConnection.java)
in spirit: the commit/DDL building blocks are pinned before any e2e replay.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.sources.laketable import SchemaEvolutionError


def seq_rows(spark, ids, src="web"):
    rows = [(f"doc{i:08d}", [i, i + 1, i + 2], 3, src) for i in ids]
    return spark.createDataFrame(rows, SEQUENCES_SCHEMA)


def test_create_append_read(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, n_buckets=4, bucket_key="doc_id")
    assert cat.table_exists("sequences")
    t.append(seq_rows(spark, range(10)))
    assert t.row_count() == 10
    got = {r["doc_id"] for r in t.read().collect()}
    assert got == {f"doc{i:08d}" for i in range(10)}
    # bag semantics: append same rows again -> duplicates coexist (ref B2)
    t.append(seq_rows(spark, range(3)))
    assert t.row_count() == 13


def test_overwrite_and_replace_atomic(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, n_buckets=4, bucket_key="doc_id")
    t.append(seq_rows(spark, range(5), src="old"))
    v1 = t.current_version()
    t.overwrite(seq_rows(spark, range(100, 103), src="new"))
    assert t.row_count() == 3
    assert {r["source"] for r in t.read().collect()} == {"new"}
    # time travel: the pre-overwrite snapshot is intact
    assert t.row_count(version=v1) == 5


def test_drop_column_metadata_only_no_resurrection(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    t.append(seq_rows(spark, range(5)))
    files = {f["path"] for f in t.manifest().files}
    t.drop_column("source")
    assert {f["path"] for f in t.manifest().files} == files  # metadata-only
    assert "source" not in t.read().columns
    # re-adding the same name allocates a FRESH field id: the old values
    # must NOT resurrect out of the existing data files
    t.add_column("source", "string")
    assert {r["source"] for r in t.read().collect()} == {None}
    with pytest.raises(SchemaEvolutionError, match="bucket key"):
        t.drop_column("doc_id")
    with pytest.raises(SchemaEvolutionError, match="no such column"):
        t.drop_column("nope")


def test_drop_merge_key_rejected_on_merge_managed_table(spark, warehouse):
    from embulk_output_databricks_spark.plans.merge import merge_apply_mor

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("s", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    t.append(seq_rows(spark, range(5)))
    merge_apply_mor(t, seq_rows(spark, range(2), src="u"),
                    keys=["doc_id", "source"])
    with pytest.raises(SchemaEvolutionError, match="merge key"):
        t.drop_column("source")


def test_bucket_pruning_reads_only_touched_buckets(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, n_buckets=8, bucket_key="doc_id")
    t.append(seq_rows(spark, range(200)))
    m = t.manifest()
    buckets = {f["bucket"] for f in m.files}
    assert buckets == set(range(8))  # 200 keys cover all 8 buckets
    one = sorted(buckets)[0]
    df = t.read(buckets={one})
    # every row read really belongs to the pruned bucket
    from embulk_output_databricks_spark.sources.laketable import bucket_expr
    bad = df.withColumn("b", bucket_expr("doc_id", 8)).filter(F.col("b") != one).count()
    assert bad == 0
    assert 0 < df.count() < 200


def test_schema_evolution_add_rename_widen(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    t.append(seq_rows(spark, range(4)))
    t.add_column("lang", "string")
    assert [r["lang"] for r in t.read().collect()] == [None] * 4  # S13
    t.rename_column("source", "origin")  # S15: metadata-only, by field id
    got = t.read()
    assert "origin" in got.columns and "source" not in got.columns
    assert {r["origin"] for r in got.collect()} == {"web"}
    t.widen_column("n_tok", "bigint")  # S14
    assert dict(t.read().dtypes)["n_tok"] == "bigint"
    assert sorted(r["n_tok"] for r in t.read().collect()) == [3, 3, 3, 3]
    # old files (written pre-evolution) and new files coexist
    t.append(
        spark.createDataFrame(
            [("docX", [1], 1, "book", "en")],
            T.StructType(
                [
                    T.StructField("doc_id", T.StringType()),
                    T.StructField("tokens", T.ArrayType(T.IntegerType())),
                    T.StructField("n_tok", T.LongType()),
                    T.StructField("origin", T.StringType()),
                    T.StructField("lang", T.StringType()),
                ]
            ),
        )
    )
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["docX"]["lang"] == "en" and rows["doc00000001"]["lang"] is None


def test_widen_narrowing_rejected(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    with pytest.raises(SchemaEvolutionError):
        t.widen_column("n_tok", "smallint")  # S20: narrowing rejected
    with pytest.raises(SchemaEvolutionError):
        t.rename_column("nope", "x")


def test_non_ascii_identifiers_and_values(spark, warehouse):
    # analog of TestDatabricksOutputPluginByNonAscii.java:29-114
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    df = spark.createDataFrame([("あいう", [1, 2], 2, "本")], SEQUENCES_SCHEMA)
    t.append(df)
    t.add_column("い", "string")
    r = t.read().collect()[0]
    assert r["doc_id"] == "あいう" and r["source"] == "本" and r["い"] is None


def test_replace_with_new_schema(spark, warehouse):
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    t.append(seq_rows(spark, range(3)))
    new_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.LongType())),
            T.StructField("n_tok", T.LongType()),
        ]
    )
    df = spark.createDataFrame([("z", [9], 1)], new_schema)
    t.replace(df, schema=new_schema)
    assert t.read().columns == ["doc_id", "tokens", "n_tok"]
    assert t.row_count() == 1


def test_expire_snapshots_and_remove_orphans(spark, warehouse):
    """B12 maintenance: expiry bounds manifest growth; orphan removal
    reclaims data files only old snapshots referenced; the current snapshot
    stays fully readable."""
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("m", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    for i in range(3):
        t.overwrite(spark.createDataFrame([(f"d{i}", [i], 1, "web")], SEQUENCES_SCHEMA))
    rows_before = [tuple(r) for r in t.read().collect()]
    assert t.current_version() == 3

    expired = t.expire_snapshots(keep_last=1)
    assert expired == [0, 1, 2]
    removed = t.remove_orphan_files()
    assert len(removed) == 2  # the two superseded overwrite files

    # current snapshot intact
    assert [tuple(r) for r in t.read().collect()] == rows_before
    # old versions are gone
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        t.manifest(1)
    # nothing else to reclaim on a second pass
    assert t.remove_orphan_files() == []


def test_compact_bin_packs_small_files(spark, warehouse):
    """Small-file maintenance: N per-batch appends leave N files per bucket;
    compact() rewrites them into one file set per bucket, same rows, one
    atomic snapshot; buckets below the threshold are untouched."""
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("c", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    for i in range(4):
        t.append(spark.createDataFrame(
            [(f"d{i}", [i, i + 1], 2, "web")], SEQUENCES_SCHEMA))
    rows_before = sorted(tuple(r) for r in t.read().collect())
    files_before = len(t.manifest().files)
    assert files_before == 4

    m = t.compact(min_files_per_bucket=2)
    assert m is not None
    files_after = len(t.manifest().files)
    assert files_after < files_before
    assert sorted(tuple(r) for r in t.read().collect()) == rows_before
    # idempotent second pass: nothing left to compact
    assert t.compact(min_files_per_bucket=2) is None
    # reclaimed space
    assert len(t.remove_orphan_files()) == 0  # old snapshots still reference
    t.expire_snapshots(keep_last=1)
    assert len(t.remove_orphan_files()) == 4


def test_metadata_tables_snapshots_and_files(spark, warehouse):
    """Iceberg tbl.snapshots / tbl.files analog (SURVEY B10): lineage and
    scan-planning facts as queryable DataFrames, each commit stamped with
    its own operation."""
    import json as _json

    from embulk_output_databricks_spark.plans.merge import (merge_apply,
                                                            merge_apply_mor)
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("md", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    t.append(seq_rows(spark, range(10)))
    merge_apply(t, seq_rows(spark, range(3), src="u").withColumn("op", F.lit("U")),
                keys=["doc_id"])
    t.rebucket(8)
    snaps = {r["version"]: r for r in t.snapshots().collect()}
    assert [snaps[v]["operation"] for v in (1, 2, 3)] == \
        ["append", "merge", "rebucket"]
    assert snaps[2]["parent"] == 1
    assert (snaps[2]["n_buckets"], snaps[3]["n_buckets"]) == (2, 8)
    # snapshot-summary deltas (Iceberg added/deleted-data-files analog):
    # root append adds everything, COW merge both adds and removes files,
    # metadata-only rebucket moves no data.
    assert (snaps[1]["added_rows"], snaps[1]["removed_files"]) == (10, 0)
    assert snaps[2]["added_files"] > 0 and snaps[2]["removed_files"] > 0
    assert (snaps[3]["added_files"], snaps[3]["removed_files"]) == (0, 0)
    fr = t.files().collect()
    assert all(r["kind"] == "base" and r["n_buckets"] == 2 for r in fr)
    assert sum(r["rows"] for r in fr) == 10
    st = _json.loads(next(r["stats"] for r in fr if r["stats"]))
    assert "n_tok" in st  # recorded bounds are queryable
    merge_apply_mor(t, seq_rows(spark, range(2), src="m"), keys=["doc_id"])
    assert {r["kind"] for r in t.files().collect()} == {"base", "delta"}
    assert {r["version"]: r["operation"] for r in t.snapshots().collect()}[4] \
        == "merge-mor"


def test_concurrent_commit_race(spark, warehouse):
    """Two writers racing from the same base: commuting commits (distinct
    appends) BOTH land — the loser rebases onto the winner (optimistic
    concurrency, tests/test_concurrency.py has the full matrix); a
    non-commuting race (rewrite of a file the winner also rewrote) still
    raises CommitConflict instead of corrupting state."""
    from embulk_output_databricks_spark.sources.laketable import (
        CommitConflict, LakeCatalog)

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("race", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    df1 = spark.createDataFrame([("a", [1], 1, "web")], SEQUENCES_SCHEMA)
    df2 = spark.createDataFrame([("b", [2], 1, "web")], SEQUENCES_SCHEMA)
    base = t.manifest()          # both writers read the same base...
    f1 = t._write_data_files(df1, base)
    f2 = t._write_data_files(df2, base)
    t._commit(base, base.files + f1, {})   # writer 1 wins the head
    m = t._commit(base, base.files + f2, {})  # writer 2 rebases
    assert m.properties["commit_retries"] == 1
    assert t.row_count() == 2
    # non-commuting: both rewrite the SAME file -> loser must fail
    base = t.manifest()
    victim = base.files[0]
    r1 = t._write_data_files(t._df_for_files(base, [victim]), base)
    r2 = t._write_data_files(t._df_for_files(base, [victim]), base)
    rest = [f for f in base.files if f is not victim]
    t._commit(base, rest + r1, {})
    with pytest.raises(CommitConflict):
        t._commit(base, rest + r2, {})
    assert t.row_count() == 2


def test_merge_rules_non_ascii_columns(spark, warehouse):
    """Reference parity: merge_rule expressions over non-ASCII column names
    (TestDatabricksOutputPluginByNonAscii.java:69-74,123-131)."""
    from embulk_output_databricks_spark.plans.merge import merge_apply
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    schema = T.StructType([
        T.StructField("キー", T.StringType()),
        T.StructField("値", T.LongType()),
        T.StructField("メモ", T.StringType()),
    ])
    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("日本語テーブル", schema, n_buckets=2, bucket_key="キー")
    t.append(spark.createDataFrame([("あ", 1, "x"), ("い", 2, "y")], schema))
    staged = spark.createDataFrame([("あ", 10, "z"), ("う", 30, "w")], schema)
    merge_apply(t, staged, keys=["キー"],
                merge_rules={"値": "T.`値` + S.`値`",
                             "メモ": "concat(T.`メモ`, 'test', S.`メモ`)"})
    got = {r["キー"]: (r["値"], r["メモ"]) for r in t.read().collect()}
    assert got == {"あ": (11, "xtestz"), "い": (2, "y"), "う": (30, "w")}


def test_torn_write_invisible_and_reclaimed(spark, warehouse):
    """Crash-during-write safety: data files that never made it into a
    committed manifest are invisible to readers and reclaimed by
    remove_orphan_files (the write path stages under data/ only after the
    parquet job completes; the manifest commit is the only publish point)."""
    import os

    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("torn", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    t.append(spark.createDataFrame([("a", [1], 1, "web")], SEQUENCES_SCHEMA))
    # simulate a torn write: orphan parquet bytes in data/ with no manifest
    orphan = os.path.join(t.root, "data", "deadbeef.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not a committed file")
    assert t.read().count() == 1           # invisible to readers
    assert t.remove_orphan_files() == ["data/deadbeef.parquet"]
    assert t.read().count() == 1


def test_timestamp_time_travel(spark, warehouse):
    """Iceberg TIMESTAMP AS OF analog: every commit stamps committed_at_us;
    version_as_of resolves the newest retained snapshot at-or-before it."""
    import time as _time

    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("ttt", SEQUENCES_SCHEMA, n_buckets=2, bucket_key="doc_id")
    t.append(seq_rows(spark, range(0, 10)))
    v1 = t.current_version()
    ts1 = t.manifest().properties["committed_at_us"]
    _time.sleep(0.01)
    t.append(seq_rows(spark, range(10, 20)))
    assert t.version_as_of(ts1) == v1
    assert t.read(version=t.version_as_of(ts1)).count() == 10
    now = int(_time.time() * 1_000_000)
    assert t.version_as_of(now) == t.current_version()
    with pytest.raises(ValueError):
        t.version_as_of(ts1 - 10_000_000_000)  # long before the first commit


def test_partitions_metadata_table(spark, warehouse):
    """Iceberg tbl.partitions analog: per-bucket files/rows/delta summary."""
    from embulk_output_databricks_spark.plans.merge import merge_apply_mor

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("parts", SEQUENCES_SCHEMA, n_buckets=4,
                         bucket_key="doc_id")
    t.append(seq_rows(spark, range(0, 200)))
    merge_apply_mor(t, seq_rows(spark, range(0, 10), src="u"), keys=["doc_id"])
    got = {r["bucket"]: r for r in t.partitions().collect()}
    assert set(got) == set(range(4))
    assert sum(r["rows"] for r in got.values()) == t.row_count()
    assert sum(r["delta_files"] for r in got.values()) == t.delta_file_count()
    assert all(r["n_buckets"] == 4 for r in got.values())


def test_maintain_policy_pass(spark, warehouse):
    from embulk_output_databricks_spark.plans.merge import merge_apply_mor

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("mnt", SEQUENCES_SCHEMA, n_buckets=1,
                         bucket_key="doc_id",
                         properties={"merge_keys": "doc_id"})
    # healthy table: nothing fires
    t.append(seq_rows(spark, range(0, 10)))
    assert t.maintain() == {}
    # file backlog: 5 appends in one bucket crosses max_files_per_bucket=4
    for i in range(1, 5):
        t.append(seq_rows(spark, range(i * 10, i * 10 + 10)))
    state = {r["doc_id"] for r in t.read().collect()}
    rep = t.maintain(max_files_per_bucket=4)
    assert "compact" in rep and "compact_deltas" not in rep
    assert {r["doc_id"] for r in t.read().collect()} == state
    # MOR delta backlog: threshold 0 folds even one delta, and the fold
    # runs BEFORE the bin-pack so the report carries both versions ordered
    merge_apply_mor(t, seq_rows(spark, range(100, 105))
                    .withColumn("op", F.lit("U")), keys=["doc_id"])
    assert t.delta_file_count() == 1
    rep = t.maintain(max_delta_files=0, max_files_per_bucket=1)
    assert "compact_deltas" in rep
    assert t.delta_file_count() == 0
    # retention leg: trim history to the head, reclaim unreferenced files
    rep = t.maintain(expire_keep_last=1)
    assert rep["expire"]["snapshots_dropped"] >= 1
    assert {r["doc_id"] for r in t.read().collect()} == state | {
        f"doc{i:08d}" for i in range(100, 105)}


def test_write_compression_property(spark, warehouse):
    import pyarrow.parquet as pq
    import os

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table("sequences", SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    t.append(seq_rows(spark, range(500)))
    with pytest.raises(ValueError, match="unknown codec"):
        t.set_write_compression("brotli9000")
    files_before = {f["path"] for f in t.manifest().files}
    t.set_write_compression("snappy")  # metadata-only: no file touched
    assert {f["path"] for f in t.manifest().files} == files_before
    t.append(seq_rows(spark, range(500, 1000)))

    def codec_of(path):
        md = pq.ParquetFile(os.path.join(t.root, path)).metadata
        return md.row_group(0).column(0).compression

    codecs = {f["path"]: codec_of(f["path"]) for f in t.manifest().files}
    assert {codecs[p] for p in files_before} == {"ZSTD"}  # zstd default
    assert {c for p, c in codecs.items() if p not in files_before} == {"SNAPPY"}
    # readers are codec-agnostic across the mixed table
    assert t.row_count() == 1000
    # compaction migrates the old zstd files to the current codec
    assert t.compact(min_files_per_bucket=1) is not None
    assert {codec_of(f["path"]) for f in t.manifest().files} == {"SNAPPY"}
    assert t.row_count() == 1000


def test_diff_bucket_pruning(spark, tmp_path):
    """diff() reads only buckets whose manifest entries changed; judged
    with zero IO from entry identity (immutable files)."""
    from embulk_output_databricks_spark.sources.laketable import (
        LakeCatalog,
        _diff_changed_buckets,
    )

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.IntegerType()),
    ])
    cat = LakeCatalog(spark, str(tmp_path))
    tbl = cat.create_table("t", schema, n_buckets=8, bucket_key="k",
                           properties={"merge_keys": "k"})
    tbl.append(spark.createDataFrame(
        [(i, i) for i in range(200)], schema))
    v1 = tbl.current_version()
    m1 = tbl.manifest()

    # touch exactly one key -> one bucket's entries change
    tbl.append(spark.createDataFrame([(7, 700)], schema))
    m2 = tbl.manifest()
    changed = _diff_changed_buckets(m1, m2)
    assert changed is not None and len(changed) == 1
    d = tbl.diff(v1, keys=["k"]).collect()
    # bag-append makes k=7 a duplicate key; diff sees SOME change for it
    assert {r["k"] for r in d} == {7}

    # identical snapshots -> empty changed set AND empty diff
    assert _diff_changed_buckets(m2, m2) == set()
    assert tbl.diff(tbl.current_version(), keys=["k"]).count() == 0

    # equality-delete sidecar marks only its targets' buckets
    tbl2 = cat.create_table("t2", schema, n_buckets=8, bucket_key="k",
                            properties={"merge_keys": "k"})
    tbl2.append(spark.createDataFrame([(i, i) for i in range(200)], schema))
    v1 = tbl2.current_version()
    ma = tbl2.manifest()
    tbl2.delete_keys(spark.createDataFrame([(3,)], "k long"))
    mb = tbl2.manifest()
    ch = _diff_changed_buckets(ma, mb)
    assert ch is not None and 1 <= len(ch) <= 8
    d = tbl2.diff(v1, keys=["k"]).collect()
    assert [(r["__op"], r["k"]) for r in d] == [("D", 3)]

    # schema change in the interval -> pruning unsound -> full fallback,
    # but the COMPARISON projects the old snapshot forward by field id
    # (read(schema_as_of=...)): a metadata-only add-with-default applies
    # to both sides, so no row is spuriously flagged — only k=7 (really
    # appended in the interval) surfaces, and its row carries the default
    tbl.add_column("extra", "int", default=5)
    m3 = tbl.manifest()
    assert _diff_changed_buckets(m2, m3) is None
    full = tbl.diff(v1, keys=["k"]).collect()
    assert {r["k"] for r in full} == {7}
    assert all(r["extra"] == 5 for r in full)
    # a pure RENAME in the interval flags nothing at all (tbl2: unique
    # keys — tbl's duplicated k=7 would fan out in the compare join)
    vb = tbl2.current_version()
    tbl2.rename_column("v", "val")
    assert tbl2.diff(vb, keys=["k"]).count() == 0

    # bucket-spec change -> unsound
    tbl2.rebucket(16)
    assert _diff_changed_buckets(mb, tbl2.manifest()) is None
