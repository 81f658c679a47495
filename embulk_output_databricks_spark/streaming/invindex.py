"""Incrementally-maintained exact inverted token index (token -> postings).

"Which sequences contain token X" is THE point lookup of a token corpus.
The engine already answers it two ways: per-file element blooms
(cdc_token_lookup — probabilistic file pruning, then a scan of the
surviving files) and the frequency histogram (streaming/tokmaint.py —
counts, no document identity). The inverted index is the exact,
O(posting-list) answer: a derived LakeTable of (token, key...) posting
rows, bucketed by token and write-sorted + bloom-indexed on it, so a
probe file-skips straight to its token's postings through any churn —
IO proportional to matched postings, never to the corpus. Lucene keeps
this structure per segment; warehouses usually don't have it because
their answer is the scan, which at 100 TB is the anti-pattern.

Maintenance is the tokmaint contract with PRESENCE instead of counts —
aggmaint's delete-on-zero MERGE applied to the group (token, *keys),
whose maintained row count is always exactly 1 while the posting lives:

    base.diff/CDF (include_old)  ->  per-(token, key) transitions
      token in new array only    ->  +1   (posting inserted)
      token in old array only    ->  -1   (posting deleted)
      token in both              ->  net 0, filtered: NO write

so an edit that keeps most of its array costs writes only for tokens
that actually entered or left the document — steady-state write IO is
O(changed postings). Presence is per-document DISTINCT (a token
appearing 3x in one doc is one posting), matching the recompute's
explode+DISTINCT. Exactly-once by the consumed-version watermark riding
the index's own MERGE commit (the aggmaint contract; crash between base
apply and sync re-derives precisely the missed interval).

The reference has nothing in this family: it is a write-only sink with
no read, index, or incremental story (README.md:50-69).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.laketable import LakeTable
from .aggmaint import N_COL, WATERMARK_PROP, apply_agg_deltas
from .tokmaint import TOKEN_COL, _element_type


def inverted_index_schema(base_schema: T.StructType, keys: list[str],
                          token_col: str = "tokens") -> T.StructType:
    """(token, *key cols, n_rows): token typed as the array element, key
    columns copied from the base schema, n_rows the aggmaint liveness
    tracker (always 1 for a live posting; zero deletes it)."""
    by_name = {f.name: f for f in base_schema.fields}
    missing = [k for k in keys if k not in by_name]
    if missing:
        raise ValueError(f"key columns not in base schema: {missing}")
    return T.StructType(
        [T.StructField(TOKEN_COL, _element_type(base_schema, token_col))]
        + [T.StructField(k, by_name[k].dataType) for k in keys]
        + [T.StructField(N_COL, T.LongType())])


def posting_deltas(diff_df: DataFrame, keys: list[str],
                   token_col: str = "tokens") -> DataFrame:
    """Per-(token, key) presence transitions from a keyed diff
    (include_old=True). NULL arrays contribute nothing on either side;
    per-document duplicates collapse via array_distinct, so a +1 here
    means "posting appears" and -1 "posting disappears" — tokens present
    in both versions of an edited document cancel and write nothing."""
    old_col = f"__old_{token_col}"
    if old_col not in diff_df.columns:
        # tokmaint's histogram can tolerate a lenient fallback (net counts
        # still cancel); an EXACT postings index cannot: without the old
        # array, a 'U' row's adds and retracts explode the SAME array and
        # cancel, so updates would write nothing and the index silently
        # diverges from the base. Reject instead (include_old=True is the
        # documented contract; sync_inverted_index always passes it).
        raise ValueError(
            f"posting_deltas requires the {old_col!r} column "
            "(diff/keyed_changes with include_old=True): without old "
            "values, updates and deletes would corrupt the index")
    adds = (diff_df.filter(F.col("__op").isin("I", "U"))
            .select(*keys,
                    F.explode(F.array_distinct(token_col)).alias(TOKEN_COL))
            .withColumn(N_COL, F.lit(1).cast("long")))
    rets = (diff_df.filter(F.col("__op").isin("U", "D"))
            .select(*keys,
                    F.explode(F.array_distinct(old_col)).alias(TOKEN_COL))
            .withColumn(N_COL, F.lit(-1).cast("long")))
    return (adds.unionByName(rets)
            .groupBy(TOKEN_COL, *keys).agg(F.sum(N_COL).alias(N_COL))
            .filter(F.col(N_COL) != 0))


def _recompute(base: LakeTable, keys: list[str], token_col: str,
               version=None) -> DataFrame:
    return (base.read(version=version)
            .select(*keys,
                    F.explode(F.array_distinct(token_col)).alias(TOKEN_COL))
            .withColumn(N_COL, F.lit(1).cast("long")))


def ensure_inverted_index(catalog, base: LakeTable, name: str,
                          keys: list[str],
                          token_col: str = "tokens",
                          n_buckets: int = 8,
                          rows_per_file: int | None = None) -> LakeTable:
    """Create (or load) the index for `base`. Seeded by ONE
    explode+distinct pass over the current base state — the only full
    pass it will ever take — then stamped with the base version it
    represents. Layout IS the search structure: bucketed on token (a
    probe prunes to one bucket), write-sorted on token (footer bounds
    skip within the bucket), bloom-indexed on token (point skip even
    through unclustered churn) — the annmaint cell-table pattern applied
    to exact postings."""
    if catalog.table_exists(name):
        return catalog.load(name)
    schema = inverted_index_schema(base.manifest().schema(), keys, token_col)
    props = {"sort_order": TOKEN_COL, "bloom_columns": TOKEN_COL}
    if rows_per_file is not None:
        # split each bucket's sorted postings into files of this many rows
        # so footer bounds cover narrow token ranges — the probe's skip
        # granularity (sort_rows_per_file rides every later write too)
        props["sort_rows_per_file"] = str(rows_per_file)
    t = catalog.create_table(
        name, schema, n_buckets=n_buckets, bucket_key=TOKEN_COL,
        properties=props)
    v = base.current_version()
    t.append(_recompute(base, keys, token_col, version=v),
             properties={WATERMARK_PROP: str(v),
                         "operation": "inverted-index-seed"})
    return t


def sync_inverted_index(base: LakeTable, idx: LakeTable, keys: list[str],
                        token_col: str = "tokens"):
    """Advance the index to the base table's current version — exactly
    once, crash-safe (watermark rides the MERGE commit). Returns the new
    manifest, or None when already current; a churn-only interval (every
    posting survived) advances the watermark metadata-only."""
    upto = idx.manifest().properties.get(WATERMARK_PROP)
    if upto is None:
        raise ValueError(f"{idx.name}: not a maintained index "
                         f"(missing {WATERMARK_PROP})")
    upto, cur = int(upto), base.current_version()
    if cur <= upto:
        return None
    from .cdf import keyed_changes  # write-time CDF when available
    d = keyed_changes(base, upto, keys, to_version=cur)
    deltas = posting_deltas(d, keys, token_col).persist()
    try:
        props = {WATERMARK_PROP: str(cur)}
        if deltas.count() == 0:
            return idx.update_properties(props)
        return apply_agg_deltas(idx, deltas, [TOKEN_COL, *keys],
                                properties=props)
    finally:
        deltas.unpersist()


def probe(idx: LakeTable, tokens, keys: list[str]) -> DataFrame:
    """Posting lookup: (token, *keys) rows for the probed token(s), at the
    full skip stack — the probe values' buckets are computed with the
    write side's own hash (one trivial Spark job over the probe list, so
    the type-sensitive xxhash64 can never drift from routing), then
    bounds+bloom prune within the surviving buckets. IO O(posting
    lists), not O(index); files under an old bucket spec stay
    conservatively selected (the rebucket contract)."""
    vals = list(tokens) if isinstance(tokens, (list, tuple, set)) else [tokens]
    # NULL never equals anything: drop it from the probe set (an all-NULL
    # probe becomes the empty IN-list, which matches nothing)
    vals = [v for v in vals if v is not None]
    m = idx.manifest()
    buckets = None
    if vals and m.bucket_key == TOKEN_COL:
        from ..sources.laketable import _type_of, bucket_expr

        tok_type = next(f["type"] for f in m.schema_version.fields
                        if f["name"] == TOKEN_COL)
        sch = T.StructType([T.StructField(TOKEN_COL, _type_of(tok_type))])
        buckets = {r[0] for r in
                   idx.spark.createDataFrame([(v,) for v in vals], sch)
                   .select(bucket_expr(TOKEN_COL, m.n_buckets)).collect()}
    return (idx.read(buckets=buckets, eq_filter={TOKEN_COL: vals})
            .select(TOKEN_COL, *keys))
