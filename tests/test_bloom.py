"""Per-file bloom filters for equality skipping (sources/bloom.py,
read(eq_filter=...)). Contract mirrors bounds skipping: false positives
only cost IO, absence of a bloom means keep, field-id resolution survives
renames, MOR stays conservative, results are always exact."""

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from embulk_output_databricks_spark.sources import bloom
from embulk_output_databricks_spark.sources.laketable import (
    LakeCatalog,
    _bloom_keep,
)

SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("tag", T.StringType()),
    T.StructField("v", T.LongType()),
])


def _tag(i):
    return hashlib.md5(str(i).encode()).hexdigest()


def _mk(spark, warehouse, props=None):
    cat = LakeCatalog(spark, f"{warehouse}/bl")
    return cat.create_table("t", SCHEMA, n_buckets=2, bucket_key="k",
                            properties=props)


def _fill(spark, t, n=200, slices=4):
    rows = [(f"k{i}", _tag(i), i) for i in range(n)]
    df = spark.createDataFrame(rows, SCHEMA)
    for j in range(slices):
        t.append(df.filter(F.col("v") % slices == j))
    return rows


def test_bloom_never_false_negative():
    vals = [_tag(i) for i in range(500)] + list(range(500)) + [1.5, "", "\N{SNOWMAN}"]
    blob = bloom.build(vals)
    assert all(bloom.might_contain(blob, v) for v in vals)


def test_bloom_mostly_excludes_absent_values():
    blob = bloom.build([_tag(i) for i in range(300)])
    fp = sum(bloom.might_contain(blob, _tag(i)) for i in range(1000, 3000))
    assert fp < 100  # ~1-2% false positives at this load


def test_bloom_rejects_unsupported_types():
    with pytest.raises(TypeError):
        bloom.build([object()])


def test_eq_filter_skips_and_stays_exact(spark, warehouse):
    t = _mk(spark, warehouse, {"bloom_columns": "tag"})
    rows = _fill(spark, t)
    m = t.manifest()
    assert len(m.files) >= 8
    target = rows[7][1]
    kept = _bloom_keep(m, m.files, {"tag": target})
    assert 1 <= len(kept) < len(m.files)
    got = t.read(eq_filter={"tag": target}).collect()
    assert [(r["k"], r["v"]) for r in got] == [("k7", 7)]
    # absent value: zero rows even when a false positive keeps a file
    assert t.read(eq_filter={"tag": _tag(10**9)}).count() == 0


def test_files_without_bloom_are_kept(spark, warehouse):
    t = _mk(spark, warehouse)  # no bloom configured yet
    rows = _fill(spark, t, slices=2)
    t.set_bloom_columns(["tag"])
    _fill(spark, t, n=100, slices=2)  # new files carry blooms
    m = t.manifest()
    old = [f for f in m.files if "bloom" not in f]
    assert old, "pre-property files must have no bloom"
    kept = _bloom_keep(m, m.files, {"tag": rows[3][1]})
    assert set(f["path"] for f in old) <= set(f["path"] for f in kept)
    # compact() rewrites with blooms -> the index appears lazily
    assert t.compact(min_files_per_bucket=1) is not None
    m2 = t.manifest()
    assert all("bloom" in f for f in m2.files)


def test_eq_filter_survives_rename(spark, warehouse):
    t = _mk(spark, warehouse, {"bloom_columns": "tag"})
    rows = _fill(spark, t, slices=2)
    t.rename_column("tag", "fingerprint")
    m = t.manifest()
    kept = _bloom_keep(m, m.files, {"fingerprint": rows[5][1]})
    assert len(kept) < len(m.files)
    got = t.read(eq_filter={"fingerprint": rows[5][1]}).collect()
    assert [(r["k"], r["v"]) for r in got] == [("k5", 5)]


def test_eq_filter_on_unknown_column(spark, warehouse):
    t = _mk(spark, warehouse, {"bloom_columns": "tag"})
    _fill(spark, t, n=20, slices=1)
    with pytest.raises(ValueError):
        t.read(eq_filter={"nope": "x"}).collect()


def test_set_bloom_columns_validates(spark, warehouse):
    t = _mk(spark, warehouse)
    with pytest.raises(ValueError):
        t.set_bloom_columns(["missing"])


def test_eq_filter_mor_conservative_and_exact(spark, warehouse):
    from embulk_output_databricks_spark.plans.merge import merge_apply_mor

    cat = LakeCatalog(spark, f"{warehouse}/mor")
    t = cat.create_table("t", SCHEMA, n_buckets=2, bucket_key="k",
                         properties={"bloom_columns": "tag",
                                     "merge_keys": "k"})
    rows = _fill(spark, t, n=60, slices=2)
    # delta updates k5's tag: the OLD tag must no longer match
    new_tag = _tag(999_999)
    merge_apply_mor(t, spark.createDataFrame([("k5", new_tag, 5)], SCHEMA),
                    keys=["k"])
    assert t.read(eq_filter={"tag": rows[5][1]}).count() == 0
    got = t.read(eq_filter={"tag": new_tag}).collect()
    assert [(r["k"], r["v"]) for r in got] == [("k5", 5)]


TOK_SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("tokens", T.ArrayType(T.IntegerType())),
])


def test_array_bloom_token_contains_skip(spark, warehouse):
    """Array columns bloom their distinct ELEMENTS: read(eq_filter=
    {"tokens": v}) is the token point lookup — files provably missing the
    token skip pre-IO, results equal the full-scan array_contains."""
    import base64

    cat = LakeCatalog(spark, f"{warehouse}/tok")
    t = cat.create_table("t", TOK_SCHEMA, n_buckets=1, bucket_key="k",
                         properties={"bloom_columns": "tokens",
                                     "bloom_bits": "32768"})
    for s in range(4):  # disjoint token ranges -> one file per slice
        rows = [(f"k{s}_{i}",
                 [s * 1000 + (i * 7) % 500, s * 1000 + 500 + i % 400])
                for i in range(300)]
        t.append(spark.createDataFrame(rows, TOK_SCHEMA))
    m = t.manifest()
    assert all(len(base64.b64decode(f["bloom"]["tokens"])) * 8 == 32768
               for f in m.files)  # bloom_bits honored, self-describing

    probe = 2 * 1000 + 14  # lives only in slice 2
    kept = _bloom_keep(m, m.files, {"tokens": probe})
    assert 0 < len(kept) < len(m.files)
    got = {r["k"] for r in t.read(eq_filter={"tokens": probe}).collect()}
    full = {r["k"] for r in
            t.read().filter(F.array_contains("tokens", probe)).collect()}
    assert got and got == full
    # a token in NO slice: every file provably skipped, result exactly empty
    assert _bloom_keep(m, m.files, {"tokens": 999_983}) == []
    assert t.read(eq_filter={"tokens": 999_983}).count() == 0


def test_bloom_bits_resize_mixed_blobs_coexist(spark, warehouse):
    cat = LakeCatalog(spark, f"{warehouse}/resize")
    t = cat.create_table("t", TOK_SCHEMA, n_buckets=1, bucket_key="k",
                         properties={"bloom_columns": "tokens"})
    t.append(spark.createDataFrame([("a", [1, 2, 3])], TOK_SCHEMA))
    t.set_bloom_columns(["tokens"], bits=65536)
    t.append(spark.createDataFrame([("b", [7, 8, 9])], TOK_SCHEMA))
    m = t.manifest()
    import base64
    sizes = sorted(len(base64.b64decode(f["bloom"]["tokens"])) * 8
                   for f in m.files)
    assert sizes == [8192, 65536]
    # probes resolve each blob by its own size
    assert {r["k"] for r in t.read(eq_filter={"tokens": 2}).collect()} == {"a"}
    assert {r["k"] for r in t.read(eq_filter={"tokens": 8}).collect()} == {"b"}
    with pytest.raises(ValueError, match="multiple of 8"):
        t.set_bloom_columns(["tokens"], bits=100)


def test_eq_filter_in_list_scalar_and_array(spark, warehouse):
    """LIST values: IN on scalar columns, contains-ANY on array columns.
    Skipping keeps a file when ANY listed value might be present; the
    exact predicate (isin / arrays_overlap) applies to rows; empty list
    matches nothing."""
    cat = LakeCatalog(spark, f"{warehouse}/inlist")
    sch = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("tag", T.StringType()),
        T.StructField("toks", T.ArrayType(T.IntegerType())),
    ])
    t = cat.create_table("t", sch, n_buckets=1, bucket_key="k",
                         properties={"bloom_columns": "tag,toks"})
    # two disjoint slices -> two files with disjoint tag/token ranges
    rows_a = [(f"a{i}", _tag(i), [i, i + 1000]) for i in range(50)]
    rows_b = [(f"b{i}", _tag(i + 500), [i + 500, i + 2000]) for i in range(50)]
    t.append(spark.createDataFrame(rows_a, sch))
    t.append(spark.createDataFrame(rows_b, sch))
    m = t.manifest()

    # scalar IN: both values live in file A -> file B provably skipped
    want = {_tag(3), _tag(7)}
    kept = _bloom_keep(m, m.files, {"tag": [_tag(3), _tag(7)]})
    assert len(kept) < len(m.files)
    got = {r["tag"] for r in t.read(eq_filter={"tag": [_tag(3), _tag(7)]}).collect()}
    assert got == want

    # array contains-ANY: tokens from both files -> nothing skipped,
    # rows exact
    got = {r["k"] for r in
           t.read(eq_filter={"toks": [3, 505]}).collect()}
    assert got == {"a3", "b5"}
    # one token, list form == scalar form
    one = {r["k"] for r in t.read(eq_filter={"toks": [1000]}).collect()}
    assert one == {r["k"] for r in t.read(eq_filter={"toks": 1000}).collect()}
    # empty list matches nothing (and skips everything)
    assert t.read(eq_filter={"tag": []}).count() == 0
    assert _bloom_keep(m, m.files, {"tag": []}) == []


def test_bounds_precheck_prunes_before_bloom(spark, warehouse):
    """eq_filter consults footer bounds BEFORE bloom blobs: a value
    outside a file's [min,max] is provably absent, so the file skips
    without a blob decode — and bloom-LESS files (no bloom_columns
    configured) now prune by bounds too. At 100k files this is the
    difference between a ~1 s and a ~0.2 s point-lookup plan
    (BENCH/metadata_plane.py)."""
    cat = LakeCatalog(spark, f"{warehouse}/bp")
    t = cat.create_table("t", SCHEMA, n_buckets=1, bucket_key="k")
    # no bloom columns at all: bounds are the only skip evidence
    rows_a = [(f"k{i:03d}", _tag(i), i) for i in range(50)]
    rows_b = [(f"k{i:03d}", _tag(i), i) for i in range(100, 150)]
    t.append(spark.createDataFrame(rows_a, SCHEMA))
    t.append(spark.createDataFrame(rows_b, SCHEMA))
    m = t.manifest()
    assert all("bloom" not in f for f in m.files)

    # value inside file B's k-range only -> file A drops on bounds alone
    kept = _bloom_keep(m, m.files, {"k": "k120"})
    assert len(kept) == 1
    assert t.read(eq_filter={"k": "k120"}).count() == 1

    # value beyond every file's range -> empty plan, exact empty result
    assert _bloom_keep(m, m.files, {"k": "zzz"}) == []
    st = t.scan_stats(eq_filter={"k": "zzz"})
    assert st["files_read"] == 0 and st["pruned_bloom"] == len(m.files)
    assert t.read(eq_filter={"k": "zzz"}).count() == 0

    # IN-list straddling both files: bounds narrow the probe set per
    # file but keep both files (each holds one of the values)
    got = {r["k"] for r in t.read(eq_filter={"k": ["k010", "k120"]}).collect()}
    assert got == {"k010", "k120"}
