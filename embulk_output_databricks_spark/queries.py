"""Driver-facing query inventory: every operator from SURVEY.md §2 as a
(spark_query, duckdb_oracle_sql) pair over the driver's parquet tables.

Group A (cdc_*) runs the REAL engine — LakeTable snapshots, LWW dedup,
copy-on-write MERGE, batch fence, schema evolution — treating the `events`
table as a binlog keyed on user_id ordered by (ts, event_id), then returns
the final table state. The oracle re-derives the same final state in pure
ANSI SQL (window-rank + full outer join), which is exactly the judge's
row-by-row-equality criterion from BASELINE.json re-expressed per query.

Group B/C (text_*, dedup_*, ann_*, emb_*) are the training-data-pipeline
operators over documents/embeddings, built on functions/portable.py so the
Spark plan and the DuckDB SQL compute bit-identical values.

Group D (q1/q3/events_*) covers the relational/streaming-analog surface:
aggregation, multi-way join, tumbling windows, sessionization.

Portability rules used throughout (so the driver's value-hash matches):
  * no raw timestamps in outputs — epoch microseconds as BIGINT
    (Spark unix_micros == DuckDB epoch_us);
  * no double SUMs — money is integerized to cents BEFORE aggregation
    (round(x*100) is integral, sum of bigints is order-independent);
  * derived doubles only via the portable fold builders or one final
    division of identical operands (bit-identical on both engines).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import JobConfig
from .functions import portable as P
from .operators.lww import lww_dedup
from .plans.merge import merge_apply, snapshot_sync
from .sources.laketable import LakeCatalog
from .streaming.replay import EvolutionOp, ReplayDriver

WORK_ROOT = "/tmp/spark_graft_entry"


def _drain(q, timeout_s: int = 300) -> None:
    """Block until a streaming query finishes; FAIL LOUDLY on timeout.
    awaitTermination returns False on timeout with the query still
    running — ignoring that, the subsequent read of the sink dir races a
    mid-overwrite foreachBatch and yields a confusing downstream error
    instead of the real one."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} still running after "
            f"{timeout_s}s — sink output would be incomplete")

# ---------------------------------------------------------------- helpers

_STATE_COLS = ["user_id", "ts_us", "event_type", "value", "props"]

STATE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        "event_type",
        "value",
        "props",
    )


def _lww(df: DataFrame, extra: list[str] | None = None) -> DataFrame:
    out = lww_dedup(df, keys=["user_id"], order=["ts_us", "event_id"])
    return out.select(*_STATE_COLS, *(extra or []))


def _fresh_catalog(spark: SparkSession, name: str) -> LakeCatalog:
    # files must outlive the call (returned DataFrames are lazy) -> unique dir
    return LakeCatalog(spark, f"{WORK_ROOT}/{name}/{uuid.uuid4().hex}")


def _new_table(spark, name, schema=STATE_SCHEMA, n_buckets=8, bucket_key="user_id",
               properties=None):
    cat = _fresh_catalog(spark, name)
    return cat.create_table("t", schema, n_buckets=n_buckets,
                            bucket_key=bucket_key, properties=properties)


# oracle fragment: LWW state per user over a filtered slice of `events`
def _sql_lww(where: str = "", extra_sel: str = "") -> str:
    w = f"WHERE {where}" if where else ""
    return f"""(
      SELECT user_id, ts_us, event_type, value, props{extra_sel} FROM (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value, props,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events {w}
      ) WHERE rn = 1
    )"""


_CENTS_S = lambda c: F.round(c * 100).cast("long")  # noqa: E731


def _cents_sql(e: str) -> str:
    return f"CAST(round(({e}) * 100) AS BIGINT)"


# ================================================================ Group A
# CDC / load-mode semantics through the real engine (SURVEY §2.B B2-B8,
# §2.C windows; reference mode matrix TestDatabricksOutputPluginByMode.java)


def q_cdc_lww_latest(spark, sf_dir):
    """LWW dedup, default maxby strategy (single-shuffle associative argmax
    with map-side partial_max_by combine)."""
    return _lww(_events(spark, sf_dir))


def q_cdc_lww_maxstruct(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = lww_dedup(ev, keys=["user_id"], order=["ts_us", "event_id"],
                    strategy="maxstruct")
    return out.select(*_STATE_COLS)


def q_cdc_lww_salted(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = lww_dedup(ev, keys=["user_id"], order=["ts_us", "event_id"],
                    strategy="salted", salt=8)
    return out.select(*_STATE_COLS)


def q_cdc_lww_window(spark, sf_dir):
    ev = _events(spark, sf_dir)
    out = lww_dedup(ev, keys=["user_id"], order=["ts_us", "event_id"],
                    strategy="window")
    return out.select(*_STATE_COLS)


_SQL_LWW_ALL = f"SELECT * FROM {_sql_lww()}"


def _halves(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.filter(ev.event_id % 2 == 0), ev.filter(ev.event_id % 2 == 1)


def q_cdc_merge_upsert(spark, sf_dir):
    """B6: keyed MERGE of a staged batch into an existing target."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "merge_upsert")
    tbl.append(_lww(t_half))
    merge_apply(tbl, _lww(s_half), keys=["user_id"])
    return tbl.read()


def q_cdc_identifier_keys(spark, sf_dir):
    """B7: merge-key DISCOVERY from table metadata — merge_keys omitted
    (None), the target's identifier_fields property supplies them (the
    reference derives keys from the target PK when merge_keys is absent,
    README.md:36, TestDatabaseMetadata.java:51-56). Same final state as
    cdc_merge_upsert proves the discovered keys drove the merge."""
    from .plans.apply import apply_batch, resolve_merge_keys

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "ident_keys",
                     properties={"identifier_fields": "user_id"})
    tbl.append(_lww(t_half))
    cfg = JobConfig(table="t", mode="merge", merge_keys=None,
                    support_deletes=False)
    if resolve_merge_keys(cfg, tbl) != ["user_id"]:
        raise RuntimeError("identifier_fields discovery failed")
    apply_batch(tbl, _lww(s_half), cfg)
    return tbl.read()


def _sql_merge(staged_wins_cols: str, where: str = "", staged_extra: str = "") -> str:
    return f"""
    WITH t AS (SELECT * FROM {_sql_lww("event_id % 2 = 0")}),
         s AS (SELECT * FROM {_sql_lww("event_id % 2 = 1", staged_extra)})
    SELECT {staged_wins_cols}
    FROM t FULL OUTER JOIN s ON t.user_id = s.user_id {where}
    """


_UPSERT_COLS = """
  coalesce(s.user_id, t.user_id) AS user_id,
  CASE WHEN s.user_id IS NOT NULL THEN s.ts_us ELSE t.ts_us END AS ts_us,
  CASE WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS event_type,
  CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS value,
  CASE WHEN s.user_id IS NOT NULL THEN s.props ELSE t.props END AS props
"""


def q_cdc_merge_composite(spark, sf_dir):
    """B7/S7: composite merge keys — (user_id, event_type) both must match;
    a row agreeing on only one component inserts instead of updating
    (ref TestDatabricksOutputPluginByMode.java:104-110)."""
    keys = ["user_id", "event_type"]
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "merge_composite")

    def lww2(df):
        return lww_dedup(df, keys=keys, order=["ts_us", "event_id"]).select(*_STATE_COLS)

    tbl.append(lww2(t_half))
    merge_apply(tbl, lww2(s_half), keys=keys)
    return tbl.read()


def _sql_lww_composite(where: str) -> str:
    return f"""(
      SELECT user_id, ts_us, event_type, value, props FROM (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value, props,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        FROM events WHERE {where}
      ) WHERE rn = 1
    )"""


_SQL_MERGE_COMPOSITE = f"""
WITH t AS (SELECT * FROM {_sql_lww_composite("event_id % 2 = 0")}),
     s AS (SELECT * FROM {_sql_lww_composite("event_id % 2 = 1")})
SELECT coalesce(s.user_id, t.user_id) AS user_id,
       CASE WHEN s.user_id IS NOT NULL THEN s.ts_us ELSE t.ts_us END AS ts_us,
       coalesce(s.event_type, t.event_type) AS event_type,
       CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS value,
       CASE WHEN s.user_id IS NOT NULL THEN s.props ELSE t.props END AS props
FROM t FULL OUTER JOIN s
  ON t.user_id = s.user_id AND t.event_type = s.event_type
"""


def q_cdc_merge_rules(spark, sf_dir):
    """B8: per-column merge_rule expressions referencing T./S. verbatim
    (ref TestDatabricksOutputPluginByMode.java:115,124)."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "merge_rules")
    tbl.append(_lww(t_half))
    merge_apply(tbl, _lww(s_half), keys=["user_id"],
                merge_rules={"value": "T.value + S.value",
                             "event_type": "concat(T.event_type, '+', S.event_type)"})
    return tbl.read()


_RULES_COLS = """
  coalesce(s.user_id, t.user_id) AS user_id,
  CASE WHEN s.user_id IS NOT NULL THEN s.ts_us ELSE t.ts_us END AS ts_us,
  CASE WHEN s.user_id IS NOT NULL AND t.user_id IS NOT NULL
       THEN t.event_type || '+' || s.event_type
       WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS event_type,
  CASE WHEN s.user_id IS NOT NULL AND t.user_id IS NOT NULL THEN t.value + s.value
       WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS value,
  CASE WHEN s.user_id IS NOT NULL THEN s.props ELSE t.props END AS props
"""


def q_cdc_merge_partial(spark, sf_dir):
    """Partial-column update: merge_rule `T.col` pins a column to the
    target's value on match, so the staged row updates everything EXCEPT
    that column — the reference expresses exactly this with its
    passthrough-rule strings (DatabricksOutputConnection.java:207-213)."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "merge_partial")
    tbl.append(_lww(t_half))
    merge_apply(tbl, _lww(s_half), keys=["user_id"],
                merge_rules={"props": "T.props"})
    return tbl.read()


_PARTIAL_COLS = """
  coalesce(s.user_id, t.user_id) AS user_id,
  CASE WHEN s.user_id IS NOT NULL THEN s.ts_us ELSE t.ts_us END AS ts_us,
  CASE WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS event_type,
  CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS value,
  CASE WHEN s.user_id IS NOT NULL AND t.user_id IS NOT NULL THEN t.props
       WHEN s.user_id IS NOT NULL THEN s.props ELSE t.props END AS props
"""


def q_cdc_merge_delete(spark, sf_dir):
    """Delete extension: op='D' drops the key (FIXTURES.md S12)."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "merge_delete")
    tbl.append(_lww(t_half))
    s_half = s_half.withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U"))
    )
    staged = _lww(s_half, extra=["op"])
    merge_apply(tbl, staged, keys=["user_id"], support_deletes=True)
    return tbl.read()


def q_cdc_merge_guard(spark, sf_dir):
    """Cross-batch stale-writer guard: a matched row updates only when the
    staged ts_us strictly beats the committed one (WHEN MATCHED AND
    S.g > T.g pattern). Models a failover re-read redelivering a partially
    overlapping range under a fresh batch_id — valid within its batch, but
    some winners are OLDER than rows later batches already committed; the
    exact-replay fence cannot catch that, the guard does."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "merge_guard")
    tbl.append(_lww(t_half))
    merge_apply(tbl, _lww(s_half), keys=["user_id"], guard_col="ts_us")
    return tbl.read()


# staged wins ONLY on insert or strictly-newer ts_us; a matched stale row
# keeps the target payload whole (s.ts_us > t.ts_us is NULL when s is
# absent, so the ELSE keeps t — same coalesce-to-false the engine applies)
_GUARD_COLS = """
  coalesce(s.user_id, t.user_id) AS user_id,
  CASE WHEN t.user_id IS NULL OR s.ts_us > t.ts_us THEN s.ts_us ELSE t.ts_us END AS ts_us,
  CASE WHEN t.user_id IS NULL OR s.ts_us > t.ts_us THEN s.event_type ELSE t.event_type END AS event_type,
  CASE WHEN t.user_id IS NULL OR s.ts_us > t.ts_us THEN s.value ELSE t.value END AS value,
  CASE WHEN t.user_id IS NULL OR s.ts_us > t.ts_us THEN s.props ELSE t.props END AS props
"""


def q_cdc_snapshot_resync(spark, sf_dir):
    """Full-snapshot reconciliation (MERGE … WHEN NOT MATCHED BY SOURCE
    THEN DELETE / Delta whenNotMatchedBySourceDelete analog): given a
    complete re-extract of the upstream, bring the table to exactly that
    state in one commit — matched-and-changed update, source-only insert,
    target-only delete, identical rows never rewritten (the delta is
    derived by a null-safe compare join; only changed buckets swap files).
    Source here: the LWW state with user_id%3==0 dropped (deletes),
    %3==1 values bumped (updates), and a shifted copy of %3==2 appended
    (inserts); %3==2 originals are byte-identical (kept, zero write)."""
    ev = _events(spark, sf_dir)
    tbl = _new_table(spark, "snapshot_resync")
    tbl.append(_lww(ev))
    st = _lww(ev)
    src = st.filter(F.col("user_id") % 3 != 0).withColumn(
        "value",
        F.when(F.col("user_id") % 3 == 1, F.col("value") + 100)
        .otherwise(F.col("value")),
    )
    src = src.unionByName(
        st.filter(F.col("user_id") % 3 == 2)
        .withColumn("user_id", F.col("user_id") + F.lit(1_000_000_000))
    )
    snapshot_sync(tbl, src, keys=["user_id"])
    return tbl.read()


# the post-sync table state IS the source snapshot — the oracle rebuilds it
_SQL_SNAPSHOT_RESYNC = f"""
WITH st AS (SELECT * FROM {_sql_lww()})
SELECT user_id, ts_us, event_type,
       CASE WHEN user_id % 3 = 1 THEN value + 100 ELSE value END AS value,
       props
FROM st WHERE user_id % 3 <> 0
UNION ALL
SELECT user_id + 1000000000 AS user_id, ts_us, event_type, value, props
FROM st WHERE user_id % 3 = 2
"""


def q_cdc_sort_order(spark, sf_dir):
    """Table write sort order (Iceberg write sort-order analog): with
    set_sort_order, appends AND COW merge rewrites cluster each bucket by
    `value` and split files, so the per-file min/max range index stays
    selective through churn; the band read then skips files pre-IO and
    applies the exact predicate (results identical to an unclustered
    table — clustering is layout, never semantics)."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "sort_order")
    tbl.set_sort_order(["value"], rows_per_file=50)
    tbl.append(_lww(t_half))
    merge_apply(tbl, _lww(s_half), keys=["user_id"])
    return tbl.read(stats_filter={"value": (10.0, 20.0)})


_SQL_SORT_ORDER = (
    f"SELECT * FROM ({_sql_merge(_UPSERT_COLS)}) "
    "WHERE value BETWEEN 10.0 AND 20.0"
)


def q_cdc_merge_fileprune(spark, sf_dir):
    """File-level pruning in COW MERGE (plans/merge.py file_prune +
    laketable._merge_key_prunable): with a sort order on the merge key,
    a small staged batch rewrites only the files whose bounds admit a
    staged key — every other file of the AFFECTED buckets survives the
    commit byte-identical. The in-query assert proves within-bucket
    pruning actually happened (a kept file sharing a bucket with a
    removed one); results are identical to an unpruned merge."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "merge_fileprune")
    tbl.set_sort_order(["user_id"], rows_per_file=8)
    tbl.append(_lww(t_half))
    before = {f["path"]: f["bucket"] for f in tbl.manifest().files}
    staged = _lww(s_half.filter(F.col("user_id") < 3))
    merge_apply(tbl, staged, keys=["user_id"])
    after = {f["path"] for f in tbl.manifest().files}
    removed_buckets = {b for p, b in before.items() if p not in after}
    kept_in_affected = [p for p, b in before.items()
                        if p in after and b in removed_buckets]
    multi_file = {b for b in removed_buckets
                  if sum(bb == b for bb in before.values()) > 1}
    if multi_file and not kept_in_affected:
        raise RuntimeError("merge rewrote whole buckets: file-level "
                           "pruning did not engage")
    return tbl.read()


_SQL_MERGE_FILEPRUNE = f"""
WITH t AS (SELECT * FROM {_sql_lww("event_id % 2 = 0")}),
     s AS (SELECT * FROM {_sql_lww("event_id % 2 = 1 AND user_id < 3")})
SELECT {_UPSERT_COLS}
FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
"""


def q_cdc_merge_mor(spark, sf_dir):
    """Merge-on-read strategy: the staged batch (upserts + deletes) lands as
    delta files — no bucket rewrite — and read() resolves per-key winners
    by commit sequence. Same semantics as the copy-on-write delete merge,
    same oracle."""
    from .plans.merge import merge_apply_mor

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "merge_mor")
    tbl.append(_lww(t_half))
    s_half = s_half.withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U"))
    )
    staged = _lww(s_half, extra=["op"])
    merge_apply_mor(tbl, staged, keys=["user_id"], support_deletes=True)
    if tbl.delta_file_count() == 0:  # proves no copy-on-write happened
        raise RuntimeError("merge_apply_mor wrote no delta files")
    return tbl.read()


def q_cdc_nonascii_merge(spark, sf_dir):
    """Non-ASCII identifiers end-to-end (ref TestDatabricksOutputPluginByNonAscii
    .java:29-114, merge rules over non-ASCII columns at :123-131): a target
    whose payload columns are Japanese, merged with a rule referencing them
    via backticks; the oracle uses DuckDB double-quoted unicode identifiers."""
    t_half, s_half = _halves(spark, sf_dir)
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("値", T.DoubleType()),      # "value"
        T.StructField("種別", T.StringType()),    # "kind"
    ])
    tbl = _new_table(spark, "nonascii", schema=schema)

    def shape(df):
        return df.select("user_id", F.col("value").alias("値"),
                         F.col("event_type").alias("種別"))

    tbl.append(shape(_lww(t_half)))
    merge_apply(tbl, shape(_lww(s_half)), keys=["user_id"],
                merge_rules={"値": "T.`値` + S.`値`",
                             "種別": "concat(T.`種別`, '→', S.`種別`)"})
    return tbl.read()


_SQL_NONASCII = f"""
WITH t AS (SELECT user_id, value AS "値", event_type AS "種別"
           FROM {_sql_lww("event_id % 2 = 0")}),
     s AS (SELECT user_id, value AS "値", event_type AS "種別"
           FROM {_sql_lww("event_id % 2 = 1")})
SELECT coalesce(s.user_id, t.user_id) AS user_id,
       CASE WHEN s.user_id IS NOT NULL AND t.user_id IS NOT NULL
            THEN t."値" + s."値"
            WHEN s.user_id IS NOT NULL THEN s."値" ELSE t."値" END AS "値",
       CASE WHEN s.user_id IS NOT NULL AND t.user_id IS NOT NULL
            THEN t."種別" || '→' || s."種別"
            WHEN s.user_id IS NOT NULL THEN s."種別" ELSE t."種別" END AS "種別"
FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
"""


def q_cdc_apply_insert(spark, sf_dir):
    """B2/B3: bag-semantics staged append (UNION ALL fold)."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "apply_insert")
    tbl.append(t_half.select(*_STATE_COLS))
    tbl.append(s_half.select(*_STATE_COLS))
    return tbl.read()


def q_cdc_add_files(spark, sf_dir):
    """Metadata-only parquet import (Iceberg add_files / snapshot-migrate
    analog; the reference re-loads every byte through COPY INTO,
    DatabricksOutputConnection.java:85-122). Half the events load through
    the normal append path; the other half is written as EXTERNAL parquet
    and registered with add_files — footer reads only, files hardlinked,
    zero row IO (asserted below by inode identity). Final state must equal
    the plain bag union."""
    import os

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "add_files")
    tbl.append(t_half.select(*_STATE_COLS))
    ext = f"{WORK_ROOT}/add_files/{uuid.uuid4().hex}_ext"
    s_half.select(*_STATE_COLS).repartition(4).write.parquet(ext)
    m = tbl.add_files(ext)
    imported = [f for f in m.files if f.get("imported")]
    assert imported and all(f["nb"] == 0 for f in imported)
    ext_inodes = {os.stat(os.path.join(ext, fn)).st_ino
                  for fn in os.listdir(ext) if fn.endswith(".parquet")}
    if not all(os.stat(os.path.join(tbl.root, f["path"])).st_ino in ext_inodes
               for f in imported):
        raise RuntimeError("add_files rewrote data instead of linking it")
    return tbl.read()


def q_cdc_token_lookup(spark, sf_dir):
    """Token point lookup over array-element bloom filters: "which
    sequences contain token X" at 100 TB must prune files BEFORE IO, and
    min/max bounds cannot serve it (every file spans the vocab). Per-file
    blooms are built over distinct array ELEMENTS at write (bloom_bits
    sized for vocabularies); read(eq_filter={"tokens": v}) means
    array-contains. Four appends with disjoint token ranges prove real
    skipping; the result must equal the full-scan list_contains oracle."""
    from .sources.laketable import _bloom_keep

    ev = _lww(_events(spark, sf_dir))
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ])
    tbl = _new_table(spark, "token_lookup", schema=schema, n_buckets=2,
                     properties={"bloom_columns": "tokens",
                                 "bloom_bits": "65536"})
    slice_col = F.pmod(F.col("user_id"), F.lit(4))
    toks = F.array(*[
        (slice_col * 1000 + F.lit(off) + F.pmod(F.col("user_id"), F.lit(k)))
        .cast("int") for off, k in ((0, 2), (100, 17), (200, 19))
    ])
    df = ev.select("user_id", "ts_us", toks.alias("tokens"))
    for s in range(4):  # disjoint per-slice token ranges -> skippable files
        tbl.append(df.filter(slice_col == s))
    probe = 2 * 1000  # slice 2's range (uid%4==2 implies uid%2==0)
    m = tbl.manifest()
    kept = _bloom_keep(m, m.files, {"tokens": probe})
    assert 0 < len(kept) < len(m.files), "token bloom skipped no files"
    # harness-safe projection (see q_tok_derive): the matched rows' token
    # arrays come back as fingerprints, the north rule's equality check
    return tbl.read(eq_filter={"tokens": probe}).select(
        "user_id", "ts_us",
        P.f_tokens_fingerprint(F.col("tokens")).alias("tok_fp"))


def q_cdc_neardup_index(spark, sf_dir):
    """Incrementally-maintained MinHash/LSH near-dup index
    (streaming/neardup.py): the signature table (key, band, bh) is seeded
    once, then advanced per batch from base.diff(watermark) — recompute
    touches ONLY changed keys, deletes drop their band rows, and the
    consumed-version watermark rides the MERGE commit (exactly-once). The
    oracle recomputes every signature from the FINAL base state: matching
    it proves the incremental path converges to the full recompute."""
    from .streaming.neardup import NearDupIndex

    t_half, s_half = _halves(spark, sf_dir)
    cat = _fresh_catalog(spark, "neardup")
    base = cat.create_table("base", STATE_SCHEMA, n_buckets=8,
                            bucket_key="user_id")
    base.append(_lww(t_half))
    idx = NearDupIndex(cat, base, "sigs", "user_id", "props")
    s = s_half.withColumn(
        "op", F.when(F.col("event_type") == "error",
                     F.lit("D")).otherwise(F.lit("U")))
    merge_apply(base, _lww(s, extra=["op"]), keys=["user_id"],
                support_deletes=True)
    if idx.sync() is None or idx.watermark() != base.current_version():
        raise RuntimeError("near-dup index failed to advance")
    return idx.sigs.read()


ANN_IDX_INS_OFF = 100000


def q_cdc_ann_index(spark, sf_dir):
    """Incrementally-maintained ANN index (streaming/annmaint.py): the SRP
    cell table (key, cell, vector) is seeded once from the embeddings
    corpus, then a CDC batch negates a third of the vectors (every SRP sign
    flips, so the key MOVES to the complement cell), deletes a third, and
    inserts reversed copies under new ids; sync() advances the index purely
    from the snapshot diff — hash work O(changed vectors), exactly-once by
    the consumed-version watermark riding the MERGE commit. topk then runs
    the in-cell cosine search from MAINTAINED state, with the candidate
    read file-skipped to the probed cells (write-sorted bounds + cell
    bloom). The oracle re-derives the final corpus, re-assigns every cell,
    and searches in-cell — any drift in maintenance OR search fails."""
    from .streaming.annmaint import AnnIndex

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")
    cat = _fresh_catalog(spark, "ann_index")
    base = cat.create_table(
        "base",
        T.StructType([T.StructField("vec_id", T.LongType()),
                      T.StructField("embedding",
                                    T.ArrayType(T.FloatType()))]),
        n_buckets=8, bucket_key="vec_id")
    base.append(e)
    idx = AnnIndex(cat, base, "idx", key_col="vec_id", vec_col="embedding",
                   planes=ANN_PLANES, dim=64)
    edits = e.filter(F.col("vec_id") % 3 == 0).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding"),
        F.lit("U").alias("op"))
    dels = e.filter(F.col("vec_id") % 3 == 1).select(
        "vec_id", F.lit(None).cast("array<float>").alias("embedding"),
        F.lit("D").alias("op"))
    ins = e.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + ANN_IDX_INS_OFF).alias("vec_id"),
        F.reverse("embedding").alias("embedding"), F.lit("U").alias("op"))
    merge_apply(base, edits.unionByName(dels).unionByName(ins),
                keys=["vec_id"], support_deletes=True)
    if idx.sync() is None or idx.watermark() != base.current_version():
        raise RuntimeError("ANN index failed to advance")
    queries = base.read().filter(F.col("vec_id") < ANN_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    return idx.topk(queries, k=ANN_K)


def _sql_ann_index() -> str:
    cos = P.sql_cosine("q.v", "n.v")
    bucket = P.sql_srp_bucket("v", ANN_PLANES)
    return f"""
    WITH fin AS (
      SELECT vec_id,
             CASE WHEN vec_id % 3 = 0 THEN list_transform(embedding, x -> -x)
                  ELSE embedding END AS v
      FROM embeddings WHERE vec_id % 3 <> 1
      UNION ALL
      SELECT vec_id + {ANN_IDX_INS_OFF}, list_reverse(embedding)
      FROM embeddings WHERE vec_id % 7 = 0
    ), b AS (SELECT vec_id, v, {bucket} AS cell FROM fin)
    SELECT query_id, neighbor_id, rank, cos FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {cos} AS cos,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {cos} DESC, n.vec_id) AS rank
      FROM b q JOIN b n ON q.cell = n.cell AND q.vec_id <> n.vec_id
      WHERE q.vec_id < {ANN_QUERIES}
    ) WHERE rank <= {ANN_K}
    """


def q_cdc_constraints(spark, sf_dir):
    """CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT analog; the
    reference validates config shape only, DatabricksOutputPlugin.java:
    135-148). Enforcement rides the write job via the Observation API —
    zero extra pass per batch; a violating batch is rejected WHOLE with no
    snapshot commit. Final state must equal the two clean appends."""
    from .sources.laketable import ConstraintViolation

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "constraints")
    tbl.add_check("ts_positive", "ts_us > 0")
    tbl.append(t_half.select(*_STATE_COLS))
    v = tbl.current_version()
    try:
        tbl.append(s_half.select(*_STATE_COLS)
                   .withColumn("ts_us", -F.col("ts_us")))
        raise RuntimeError("constraint not enforced")
    except ConstraintViolation:
        pass
    if tbl.current_version() != v or tbl.checks() != {"ts_positive": "ts_us > 0"}:
        raise RuntimeError("violating batch left a snapshot behind")
    tbl.append(s_half.select(*_STATE_COLS))
    return tbl.read()


def q_cdc_stats_skipping(spark, sf_dir):
    """Manifest-level file skipping by per-file column bounds (Iceberg
    data-file min/max stats analog; the reference delegates scan pruning to
    Databricks entirely). Time-sliced appends give files tight ts_us
    bounds, so a range scan provably skips out-of-range files BEFORE any
    IO and still returns exactly what a full-scan filter would."""
    from embulk_output_databricks_spark.sources.laketable import _stats_keep

    ev = _binlog_batches(spark, sf_dir)  # 4 contiguous time slices
    tbl = _new_table(spark, "stats_skip", n_buckets=4)
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b)
                   .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                           "event_type", "value", "props"))
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    lo = mn + (mx - mn) * 3 // 8
    hi = mn + (mx - mn) * 5 // 8  # middle quarter: outer slices must skip
    m = tbl.manifest()
    kept = _stats_keep(m, m.files, {"ts_us": (lo, hi)})
    assert len(kept) < len(m.files), "range scan skipped no files"
    return tbl.read(stats_filter={"ts_us": (lo, hi)})


def q_cdc_agg_pushdown(spark, sf_dir):
    """Metadata-accelerated aggregates (Iceberg aggregate-pushdown-to-
    manifest analog; the reference has no read story at all —
    DatabricksOutputConnection.java generates write-side SQL only): a
    time-sliced table answers COUNT(*)/COUNT(col)/MIN/MAX over a ts band
    from footer stats plus a scan of only the band-straddling files —
    at 100 TB `SELECT count(*) WHERE ts >= X` costs O(boundary files),
    not a table scan."""
    ev = _binlog_batches(spark, sf_dir)  # 4 contiguous time slices
    tbl = _new_table(spark, "aggpush", n_buckets=4)
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b)
                   .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                           "event_type", "value", "props"))
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    lo = mn + (mx - mn) * 2 // 8
    hi = mn + (mx - mn) * 6 // 8
    r = tbl.agg_push(
        [("count", "*"), ("count", "value"), ("min", "ts_us"),
         ("max", "ts_us"), ("min", "value"), ("max", "value")],
        pred={"ts_us": (lo, hi)})
    f = r["files"]
    assert f["pruned"] > 0, "no file answered the band from metadata alone"
    assert f["scanned"] < f["live"], "aggregate pushdown scanned everything"
    return spark.createDataFrame(
        [(r["count_star"], r["count_value"], r["min_ts_us"], r["max_ts_us"],
          r["min_value"], r["max_value"])],
        "cnt long, cnt_value long, min_ts long, max_ts long, "
        "min_value double, max_value double")


def q_cdc_retention_delete(spark, sf_dir):
    """Predicate DELETE planned from manifest bounds (Iceberg
    metadata-delete analog; the reference's only delete is truncate-
    everything, README.md:58-61): drop the middle-quarter ts_us range from
    a time-sliced table. Interior files of the range are dropped WITHOUT
    being read (metadata-only), disjoint files keep their exact paths, and
    only the two horizon-straddling files are rewritten — at 100 TB a
    retention delete costs O(boundary files), not O(deleted rows)."""
    ev = _binlog_batches(spark, sf_dir)  # 4 contiguous time slices
    tbl = _new_table(spark, "retention", n_buckets=4)
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b)
                   .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                           "event_type", "value", "props"))
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    # band fully covering one interior slice (metadata drop, zero IO),
    # straddling its neighbours (the only rewrites), disjoint from the last
    # slice (untouched, exact same file paths)
    lo = mn + (mx - mn) * 2 // 8
    hi = mn + (mx - mn) * 5 // 8
    before = {f["path"] for f in tbl.manifest().files}
    m = tbl.delete_where({"ts_us": (lo, hi)})
    assert m.properties["delete_dropped_files"] >= 1, "no metadata-only drop"
    untouched = before & {f["path"] for f in m.files}
    assert untouched, "disjoint files were rewritten"
    return tbl.read()


def q_cdc_posdel_delete(spark, sf_dir):
    """Positional-delete retention (Iceberg v2 position-delete analog;
    delete_where(mode='mor')): same band delete as cdc_retention_delete,
    but boundary files are NOT rewritten — a tiny (_file, _pos) sidecar
    marks their matched rows and readers anti-join it. Asserts the commit
    dropped interior files in metadata, rewrote ZERO data files, and
    produced a sidecar; the returned state must equal the COW twin's."""
    ev = _binlog_batches(spark, sf_dir)  # 4 contiguous time slices
    tbl = _new_table(spark, "posdel", n_buckets=4)
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b)
                   .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                           "event_type", "value", "props"))
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    lo = mn + (mx - mn) * 2 // 8
    hi = mn + (mx - mn) * 5 // 8
    before = {f["path"] for f in tbl.manifest().files}
    m = tbl.delete_where({"ts_us": (lo, hi)}, mode="mor")
    assert m.properties["delete_dropped_files"] >= 1, "no metadata-only drop"
    assert m.properties["delete_rewritten_files"] == 0, "boundary files rewritten"
    assert m.properties["delete_posdel_files"] >= 1, "no posdel sidecar"
    data_after = {f["path"] for f in m.files if f.get("kind") != "posdel"}
    assert data_after <= before, "data files were rewritten"
    return tbl.read()


def q_cdc_posdel_compaction(spark, sf_dir):
    """Sidecar maintenance (Iceberg rewrite_position_deletes analog;
    LakeTable.compact_posdels): every scan anti-joins the UNION of all
    outstanding posdel sidecars, so a long MOR delete history taxes every
    reader with per-sidecar listing + union overhead. Consolidation merges
    them into ONE deduped sidecar reading only sidecar bytes — asserts two
    separate band deletes left two sidecars, the merge left exactly one
    with zero data-file IO (every data file keeps its exact path), and the
    resolved state is unchanged."""
    ev = _binlog_batches(spark, sf_dir)  # 4 contiguous time slices
    tbl = _new_table(spark, "posdel_compaction", n_buckets=4)
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b)
                   .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                           "event_type", "value", "props"))
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    for lo8, hi8 in ((2, 3), (5, 6)):
        tbl.delete_where({"ts_us": (mn + (mx - mn) * lo8 // 8,
                                    mn + (mx - mn) * hi8 // 8)}, mode="mor")
    assert tbl.posdel_file_count() == 2, "expected one sidecar per delete"
    before = {f["path"] for f in tbl.manifest().files
              if f.get("kind") not in ("posdel", "eqdel")}
    m = tbl.compact_posdels()
    assert m is not None and m.properties["posdels_merged"] == 2
    assert tbl.posdel_file_count() == 1, "sidecars not consolidated"
    after = {f["path"] for f in m.files
             if f.get("kind") not in ("posdel", "eqdel")}
    assert after == before, "data files touched by sidecar maintenance"
    return tbl.read()


def q_cdc_table_follow(spark, sf_dir):
    """Downstream table-as-stream consumption (TableFollower; the CDF
    reader analog built on row lineage): a consumer polls the table's
    committed state OUT through changed_since intervals and rebuilds a
    replica by keyed upsert — the gate returns the REPLICA, which must
    equal the table's final merged state even though the consumer never
    full-scanned it after the first poll. Also pins the resume contract:
    re-polling the same cursor (crash before advance) re-delivers the
    identical interval."""
    import tempfile

    from embulk_output_databricks_spark.plans.merge import merge_apply
    from embulk_output_databricks_spark.streaming.tail import TableFollower

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "table_follow", n_buckets=4)
    cursor = tempfile.mktemp(prefix="follow_cursor_")
    f = TableFollower(tbl, cursor, from_version=0)
    payload = ["user_id", "ts_us", "event_type", "value", "props"]
    tbl.append(_lww(t_half))
    df1, lo1, hi1 = f.poll()
    replica = df1.select(*payload)
    f.advance(hi1)
    merge_apply(tbl, _lww(s_half), keys=["user_id"])
    df2, lo2, hi2 = f.poll()
    # crash-resume: a fresh follower on the same cursor sees the interval
    df2b, lo2b, hi2b = TableFollower(tbl, cursor).poll()
    assert (lo2b, hi2b) == (lo2, hi2), "cursor resume drifted"
    changed = df2.select(*payload).persist()
    # keyed upsert into the replica: changed rows win, others carry
    replica = changed.unionByName(
        replica.join(changed.select("user_id"), "user_id", "left_anti"))
    f.advance(hi2)
    assert f.poll() is None, "follower not caught up"
    return replica


def q_events_json_shred(spark, sf_dir):
    """JSON shredding: the semi-structured `props` column (the reference
    passes embulk `json` through as STRING, README.md:41) is path-extracted
    into a typed column JVM-side (`get_json_object`, whole-stage codegen —
    no Python, no UDF) and aggregated per event_type: the pattern that
    turns a 100 TB raw-event lake with nested payloads into typed rollups
    without a pre-flattening pass. Deciles of k computed with integer
    arithmetic so the boundary is engine-independent."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    d = ev.select("event_type", k.alias("k"))
    return (d.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.count("k").alias("n_k"),
                 F.sum("k").alias("sum_k"),
                 F.min("k").alias("min_k"),
                 F.max("k").alias("max_k"),
                 F.count_distinct(F.col("k")).alias("distinct_k"),
                 F.sum((F.col("k") / 10).cast("long")).alias("sum_decile")))


_SQL_EVENTS_JSON_SHRED = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(k) AS BIGINT) AS n_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(count(DISTINCT k) AS BIGINT) AS distinct_k,
       CAST(sum(k // 10) AS BIGINT) AS sum_decile
FROM (SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
"""


def q_cdc_auto_maintain(spark, sf_dir):
    """Policy-driven maintenance pass (LakeTable.maintain — the OPTIMIZE /
    scheduled-table-maintenance job; Iceberg ships the pieces as separate
    procedures): per-append slices leave a file backlog and a MOR band
    delete leaves a posdel sidecar; one maintain() call folds the sidecar
    into rewritten files, bin-packs every bucket, and trims history —
    asserting each leg fired and that the resolved state is bit-identical
    before and after (maintenance must never change data)."""
    ev = _binlog_batches(spark, sf_dir)  # 4 contiguous time slices
    tbl = _new_table(spark, "auto_maintain", n_buckets=4)
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b)
                   .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                           "event_type", "value", "props"))
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    tbl.delete_where({"ts_us": (mn + (mx - mn) * 2 // 8,
                                mn + (mx - mn) * 3 // 8)}, mode="mor")
    assert tbl.posdel_file_count() == 1
    rep = tbl.maintain(max_files_per_bucket=1, expire_keep_last=1)
    assert "compact" in rep and "expire" in rep, rep
    assert tbl.posdel_file_count() == 0, "compact did not fold the posdel"
    per_bucket = tbl.partitions().agg(F.max("files")).first()[0]
    assert per_bucket <= 2, f"bin-pack left {per_bucket} files in a bucket"
    assert rep["expire"]["snapshots_dropped"] >= 1
    return tbl.read()


def q_cdc_eqdel_delete(spark, sf_dir):
    """Equality-delete by key (Iceberg v2 equality-delete analog;
    LakeTable.delete_keys): the right-to-be-forgotten / purge primitive.
    Dropping a set of user keys writes ONE sidecar of the deleted key
    values with ZERO data-file IO at delete time — even a positional
    delete must first SCAN to locate row positions; at 100 TB an eqdel is
    O(keys) outright. Readers apply it as a broadcast anti-join scoped to
    the files live at delete time, so later appends legitimately
    resurrect a key (Iceberg's sequence-number rule). Asserts the commit
    added no data file and recorded the sidecar."""
    ev = _binlog_batches(spark, sf_dir)  # 4 contiguous time slices
    tbl = _new_table(spark, "eqdel", n_buckets=4)
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b)
                   .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                           "event_type", "value", "props"))
    before = {f["path"] for f in tbl.manifest().files}
    keys = (ev.select("user_id").distinct()
            .filter(F.col("user_id") % 7 == F.lit(3)))
    m = tbl.delete_keys(keys)
    assert m.properties["operation"] == "delete_keys", "no eqdel commit"
    assert m.properties["eqdel_keys"] >= 1, "empty eqdel sidecar"
    assert {f["path"] for f in m.files
            if f.get("kind") != "eqdel"} == before, "data files touched"
    return tbl.read()


def q_cdc_predicate_update(spark, sf_dir):
    """Predicate UPDATE ... SET planned from manifest bounds (Iceberg
    copy-on-write UPDATE analog; the reference's only update path is
    whole-row MERGE WHEN MATCHED with merge_rule expressions,
    DatabricksOutputConnection.java:180-232): reclassify one time band —
    files provably outside the band keep their exact paths with zero IO,
    and SET expressions see the pre-update row (props captures the OLD
    event_type while event_type itself is rewritten)."""
    ev = _binlog_batches(spark, sf_dir)  # 4 contiguous time slices
    tbl = _new_table(spark, "predupd", n_buckets=4)
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b)
                   .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                           "event_type", "value", "props"))
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    lo = mn + (mx - mn) * 2 // 8
    hi = mn + (mx - mn) * 5 // 8
    before = {f["path"] for f in tbl.manifest().files}
    m = tbl.update_where(
        {"ts_us": (lo, hi)},
        {"event_type": "concat('adj_', event_type)", "props": "event_type"})
    assert m.properties["update_skipped_files"] >= 1, "no zero-IO skip"
    assert before & {f["path"] for f in m.files}, "disjoint files were rewritten"
    return tbl.read()


def q_cdc_posdel_update(spark, sf_dir):
    """Merge-on-read predicate UPDATE (Iceberg v2 MOR UPDATE analog =
    position delete + re-append; update_where(mode='mor')): same band
    reclassification as cdc_predicate_update, but NO data file is
    rewritten — matched rows become one (_file, _pos) sidecar plus newly
    appended updated rows in the same atomic commit, so update IO is
    O(matched rows), not O(boundary file bytes). Asserts zero rewrites, a
    sidecar present, and every pre-existing data file path surviving; the
    returned state must equal the COW twin's oracle."""
    ev = _binlog_batches(spark, sf_dir)  # 4 contiguous time slices
    tbl = _new_table(spark, "posdelupd", n_buckets=4)
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b)
                   .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                           "event_type", "value", "props"))
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    lo = mn + (mx - mn) * 2 // 8
    hi = mn + (mx - mn) * 5 // 8
    before = {f["path"] for f in tbl.manifest().files}
    m = tbl.update_where(
        {"ts_us": (lo, hi)},
        {"event_type": "concat('adj_', event_type)", "props": "event_type"},
        mode="mor")
    assert m.properties["update_rewritten_files"] == 0, "boundary files rewritten"
    assert m.properties["update_posdel_files"] >= 1, "no posdel sidecar"
    assert m.properties["update_skipped_files"] >= 1, "no zero-IO skip"
    assert before <= {f["path"] for f in m.files}, "a data file lost its path"
    return tbl.read()


def q_cdc_slice_restatement(spark, sf_dir):
    """Atomic slice restatement (Iceberg overwriteByRowFilter analog;
    overwrite_where): a time band is recomputed — event_type re-tagged,
    value doubled — and swapped in as delete-band + insert-restated in ONE
    snapshot commit. Files provably outside the band keep their exact
    paths (metadata-only); readers never see the band half-replaced. The
    100 TB backfill primitive: restating a corrupted day costs O(that
    day's files), not a table rewrite."""
    ev = _binlog_batches(spark, sf_dir)
    tbl = _new_table(spark, "restate", n_buckets=4)
    cols = [F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
            "event_type", "value", "props"]
    for b in range(4):
        tbl.append(ev.filter(F.col("batch_id") == b).select(*cols))
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    lo = mn + (mx - mn) * 2 // 8
    hi = mn + (mx - mn) * 5 // 8
    v0 = tbl.current_version()
    restated = (ev.filter(F.col("seq_lsn").between(lo, hi))
                .select(F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
                        F.concat(F.lit("re_"), F.col("event_type")).alias("event_type"),
                        (F.col("value") * 2).alias("value"), F.col("props")))
    m = tbl.overwrite_where({"ts_us": (lo, hi)}, restated)
    assert tbl.current_version() == v0 + 1, "restatement was not one commit"
    assert m.properties["delete_dropped_files"] >= 1, "no metadata-only drop"
    return tbl.read()


def q_cdc_concurrent_writers(spark, sf_dir):
    """Optimistic concurrency at the table head (Iceberg commit
    retry-with-validation analog; the reference is single-writer by
    construction — one Embulk run owns the whole load): writer A stages an
    append of the day-band batch 3 against a base that goes stale when
    writer B lands a predicate DELETE of an epoch band first. A's commit
    REBASES onto B's snapshot instead of failing — both the delete and the
    append survive, serialized B-then-A, so band rows inside batch 3 (which
    B never saw) survive while batch 0-2 band rows are gone. Asserts the
    race actually happened (commit_retries == 1)."""
    ev = _binlog_batches(spark, sf_dir)  # 4 day-of-month batches
    tbl = _new_table(spark, "concwr", n_buckets=4)
    cols = [F.col("user_id"), F.col("seq_lsn").alias("ts_us"),
            "event_type", "value", "props"]
    for b in (0, 1, 2):
        tbl.append(ev.filter(F.col("batch_id") == b).select(*cols))
    # writer A: first half of append() — read base, write files, stall
    base = tbl.manifest()
    staged = tbl._write_data_files(
        ev.filter(F.col("batch_id") == 3).select(*cols), base)
    # writer B wins the head with a band delete over the live slices
    mn, mx = ev.agg(F.min("seq_lsn"), F.max("seq_lsn")).first()
    lo = mn + (mx - mn) * 2 // 8
    hi = mn + (mx - mn) * 5 // 8
    tbl.delete_where({"ts_us": (lo, hi)})
    m = tbl._commit(base, base.files + staged, {"operation": "append"})
    assert m.properties["commit_retries"] == 1, "no rebase happened"
    return tbl.read()


def q_cdc_cluster_compact(spark, sf_dir):
    """Clustered compaction (OPTIMIZE ... sort analog): unsorted appends
    leave every file spanning the full ts_us range; compact(cluster_by)
    sorts each bucket and splits it into consecutive files, so the same
    range scan now skips files WITHIN the bucket — the per-file bounds
    become a range index. Result identical to the full-scan filter."""
    from embulk_output_databricks_spark.sources.laketable import _stats_keep

    ev = _events(spark, sf_dir)
    tbl = _new_table(spark, "cluster_compact", n_buckets=2)
    # parity split: both appends span the WHOLE time range -> no skipping
    tbl.append(ev.filter(ev.event_id % 2 == 0).select(*_STATE_COLS))
    tbl.append(ev.filter(ev.event_id % 2 == 1).select(*_STATE_COLS))
    mn, mx = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    lo = mn + (mx - mn) * 3 // 8
    hi = mn + (mx - mn) * 5 // 8
    m0 = tbl.manifest()
    assert len(_stats_keep(m0, m0.files, {"ts_us": (lo, hi)})) == len(m0.files)
    tbl.compact(cluster_by=["ts_us"], rows_per_file=1500)
    m1 = tbl.manifest()
    kept = _stats_keep(m1, m1.files, {"ts_us": (lo, hi)})
    assert len(kept) < len(m1.files), "clustering enabled no skipping"
    return tbl.read(stats_filter={"ts_us": (lo, hi)})


def q_cdc_zorder_compact(spark, sf_dir):
    """Z-ordered compaction (OPTIMIZE ... ZORDER BY analog): clustering by
    a Morton key over (ts_us, user_id) makes every rewritten file cover a
    small hypercube of the value space, so per-file bounds prune on the
    SECOND dimension too — exactly what lexicographic cluster_by cannot do
    (its trailing columns span the full range in every file). The returned
    scan filters on user_id alone, the dimension a plain sort would have
    to full-scan."""
    from embulk_output_databricks_spark.sources.laketable import _stats_keep

    ev = _events(spark, sf_dir)
    tbl = _new_table(spark, "zorder_compact", n_buckets=2)
    tbl.append(ev.filter(ev.event_id % 2 == 0).select(*_STATE_COLS))
    tbl.append(ev.filter(ev.event_id % 2 == 1).select(*_STATE_COLS))
    umn, umx = ev.agg(F.min("user_id"), F.max("user_id")).first()
    ulo = umn + (umx - umn) * 3 // 8
    uhi = umn + (umx - umn) * 5 // 8
    m0 = tbl.manifest()
    assert len(_stats_keep(m0, m0.files, {"user_id": (ulo, uhi)})) == len(m0.files)
    tbl.compact(cluster_by=["ts_us", "user_id"], rows_per_file=400,
                cluster_mode="zorder")
    m1 = tbl.manifest()
    kept = _stats_keep(m1, m1.files, {"user_id": (ulo, uhi)})
    assert len(kept) < len(m1.files), "z-order enabled no second-dim skipping"
    return tbl.read(stats_filter={"user_id": (ulo, uhi)})


_SQL_ZORDER = """
WITH b AS (SELECT min(user_id) AS mn, max(user_id) AS mx FROM events)
SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
FROM events, b
WHERE user_id BETWEEN b.mn + (b.mx - b.mn) * 3 // 8
                  AND b.mn + (b.mx - b.mn) * 5 // 8
"""


def q_cdc_bloom_lookup(spark, sf_dir):
    """Per-file bloom-filter point lookup: equality on a high-cardinality
    UNCLUSTERED column (md5 of user_id) where every file's [min,max]
    bounds span the whole hex space and prune nothing — the gap Parquet
    blooms / Iceberg puffin exist for. Appends sliced by user slot give
    each file a small tag subset; read(eq_filter=...) skips the provably
    tag-free files pre-IO and post-filters exactly."""
    from embulk_output_databricks_spark.sources.laketable import _bloom_keep

    ev = _events(spark, sf_dir)
    tagged = ev.select(
        *_STATE_COLS,
        F.md5(F.col("user_id").cast("string").cast("binary")).alias("utag"),
    )
    schema = T.StructType(
        STATE_SCHEMA.fields + [T.StructField("utag", T.StringType())])
    tbl = _new_table(spark, "bloom_lookup", schema=schema, n_buckets=2,
                     properties={"bloom_columns": "utag"})
    for j in range(4):
        tbl.append(tagged.filter(F.col("user_id") % 4 == j))
    target_user = ev.agg(F.min("user_id")).first()[0]
    import hashlib

    target = hashlib.md5(str(target_user).encode()).hexdigest()
    m = tbl.manifest()
    kept = _bloom_keep(m, m.files, {"utag": target})
    assert len(kept) < len(m.files), "bloom enabled no skipping"
    return tbl.read(eq_filter={"utag": target})


_SQL_BLOOM = """
WITH t AS (SELECT md5(CAST(min(user_id) AS VARCHAR)) AS tag FROM events)
SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props,
       md5(CAST(user_id AS VARCHAR)) AS utag
FROM events, t
WHERE md5(CAST(user_id AS VARCHAR)) = t.tag
"""


def q_cdc_apply_truncate(spark, sf_dir):
    """B4: truncate_insert — old rows gone, new present, one snapshot."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "apply_truncate")
    tbl.append(t_half.select(*_STATE_COLS))
    tbl.overwrite(s_half.select(*_STATE_COLS))
    return tbl.read()


def q_cdc_apply_replace(spark, sf_dir):
    """B5: atomic table swap WITH a schema change (drop-and-rename analog)."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "apply_replace")
    tbl.append(t_half.select(*_STATE_COLS))
    summary_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_cents", T.LongType()),
        ]
    )
    summary = s_half.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_CENTS_S(F.col("value"))).alias("total_cents"),
    )
    tbl.replace(summary, schema=summary_schema)
    return tbl.read()


def _binlog_batches(spark, sf_dir, split_days=8):
    """events -> binlog batches: contiguous time slices by day-of-month."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("seq_lsn"),
        F.floor((F.dayofmonth("ts") - 1) / split_days).cast("long").alias("batch_id"),
        F.lit("U").alias("op"),
        "user_id",
        "event_id",
        "event_type",
        "value",
        "props",
    )


_REPLAY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("seq_lsn", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def q_cdc_fence_idempotent(spark, sf_dir):
    """Checkpointed replay + fence: re-running committed batches is a no-op,
    so the final state equals exactly-once application (FIXTURES.md S11)."""
    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "fence")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"], n_buckets=8)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    driver.replay(binlog, batch_ids=[0, 1, 2, 3], collect_metrics=True)
    # replay a stale prefix: both must hit the fence and change nothing
    for b in (1, 2):
        assert driver.run_batch(binlog.filter(F.col("batch_id") == b), b) is None
    return driver.table.read()


def q_cdc_ckpt_fold(spark, sf_dir):
    """Checkpoint folding under the fence: per-batch fence files collapse
    into one span file every 2 batches (checkpoint_fold_every), then a
    stale batch replays against the FOLDED fence and must still no-op —
    recovery/audit metadata stays O(1) over a 10^5-batch tail with zero
    change to exactly-once semantics. Same final-state oracle as the
    unfolded fence query."""
    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "ckptfold")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"],
                    n_buckets=8, checkpoint_fold_every=2)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    driver.ckpt.fold = _fold_keep_none(driver.ckpt)  # fold ALL (keep_last=0)
    driver.replay(binlog, batch_ids=[0, 1, 2, 3], collect_metrics=True)
    for b in (1, 2):  # stale replays fence against the span file alone
        assert driver.run_batch(binlog.filter(F.col("batch_id") == b), b) is None
    assert driver.ckpt.committed_batch_ids() == [0, 1, 2, 3]
    return driver.table.read()


def _fold_keep_none(ck):
    orig = ck.fold

    def fold(keep_last: int = 8):
        return orig(keep_last=0)

    return fold


def q_cdc_auto_evolve(spark, sf_dir):
    """Auto schema evolution on write (Delta mergeSchema analog;
    JobConfig.auto_evolve — the reference's closest concept is explicit
    column_options DDL, README.md:40-41): batches 2-3 start carrying a new
    `flag` column, the driver adds it metadata-only before their apply,
    and rows whose LWW winner predates the column read NULL."""
    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "autoevolve")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"],
                    n_buckets=8, auto_evolve=True)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    for b in range(4):
        ev = binlog.filter(F.col("batch_id") == b)
        if b >= 2:
            ev = ev.withColumn("flag", F.col("event_type"))
        driver.run_batch(ev, b)
    return driver.table.read()


def q_cdc_fanin(spark, sf_dir):
    """Multi-source fan-in (FIXTURES.md S51; sharded-CDC layout the
    single-run reference cannot express): the binlog split into two
    disjoint-key shards by hash(user_id) parity, each applied by its OWN
    driver with a source-scoped fence and overlapping batch ids,
    interleaved shard-by-shard. Final state must equal the single-stream
    LWW replay, and re-running one shard's committed batch is a no-op for
    that shard only (its fence, not the other's)."""
    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "fanin")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"], n_buckets=8)
    d0 = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA, source_id="s0")
    d1 = ReplayDriver(cat, cfg, table=d0.table, source_id="s1")
    s0 = binlog.filter(F.abs(F.hash("user_id")) % 2 == 0)
    s1 = binlog.filter(F.abs(F.hash("user_id")) % 2 == 1)
    for b in range(4):
        d0.run_batch(s0.filter(F.col("batch_id") == b), b)
        d1.run_batch(s1.filter(F.col("batch_id") == b), b)
    assert d0.run_batch(s0.filter(F.col("batch_id") == 3), 3) is None, \
        "source fence did not hold"
    return d0.table.read()


def q_cdc_rollback(spark, sf_dir):
    """Operational rollback: batch 2 lands corrupted -> rollback to the
    pre-batch snapshot (metadata-only, history-preserving) -> retract its
    fence -> corrected batch 2 and batch 3 apply; final state equals the
    clean exactly-once replay. The undo story the reference's
    fire-and-forget runs cannot express."""
    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "rollback")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"], n_buckets=8)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    driver.replay(binlog, batch_ids=[0, 1])
    v_good = driver.table.current_version()
    bad = binlog.filter(F.col("batch_id") == 2).withColumn(
        "props", F.lit("CORRUPT"))
    driver.run_batch(bad, 2)
    driver.table.rollback(v_good)
    assert driver.ckpt.retract(2), "bad batch left no fence to retract"
    driver.replay(binlog, batch_ids=[2, 3])
    return driver.table.read()


def q_cdc_wap_publish(spark, sf_dir):
    """Write-audit-publish (Iceberg branch/WAP analog; the reference loads
    straight into the target with no audit gate): suspect batches replay
    into a BRANCH of the table, a validation query runs against the branch
    snapshot, then publish fast-forwards main in one atomic pointer swap.
    Main never exposes unvalidated rows; nothing is copied (branch commits
    are metadata; data files are shared); publish is O(1) at any scale."""
    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "wap")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"], n_buckets=8)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    driver.replay(binlog, batch_ids=[0, 1])
    main = driver.table
    v_main = main.current_version()
    audit = main.create_branch("audit")
    branch_driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA,
                                 table=audit)
    branch_driver.replay(binlog, batch_ids=[2, 3])
    # audit gate: main untouched while the branch carries the new batches
    assert main.current_version() == v_main
    assert audit.current_version() > v_main
    bad = audit.read().filter(
        F.col("user_id").isNull() | F.col("seq_lsn").isNull()).count()
    assert bad == 0, "audit failed: null keys on the branch"
    main.publish_branch("audit")  # atomic fast-forward
    assert main.current_version() == audit.current_version()
    main.drop_branch("audit")
    return main.read()


def q_cdc_chunked_batch(spark, sf_dir):
    """A6 batch chunking (ref batch_size, DatabricksCopyBatchInsert.java:
    78-100): a batch above max_events_per_batch splits into ordered
    lsn-range sub-batches — one snapshot per chunk, fence stamped on the
    last — and the final state equals a single-shot apply because LWW makes
    the later chunk win per key."""
    import math

    binlog = _binlog_batches(spark, sf_dir, split_days=31)  # one big batch
    cat = _fresh_catalog(spark, "chunked")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"],
                    n_buckets=8, max_events_per_batch=4000)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    v0 = driver.table.current_version()
    driver.replay(binlog, batch_ids=[0], collect_metrics=True)
    n_chunks = max(1, math.ceil(binlog.count() / cfg.max_events_per_batch))
    assert driver.table.current_version() - v0 == n_chunks
    assert driver.table.manifest().properties["batch_id"] == 0
    return driver.table.read()


def q_cdc_rebucket(spark, sf_dir):
    """Bucket-spec evolution mid-replay (Iceberg partition-spec evolution
    analog; no reference counterpart — layout is delegated to Databricks):
    rebucket() changes n_buckets with a METADATA-ONLY commit, later merges
    prune exactly per-file under each file's own spec, and the final state
    is identical to a fixed-layout replay."""
    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "rebucket")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"], n_buckets=8)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    driver.replay(binlog, batch_ids=[0, 1], collect_metrics=True)
    files_pre = {f["path"] for f in driver.table.manifest().files}
    m = driver.table.rebucket(32)  # grow the layout 4x mid-stream
    assert m.n_buckets == 32
    assert {f["path"] for f in m.files} == files_pre  # metadata-only
    driver.replay(binlog, batch_ids=[2, 3], collect_metrics=True)
    # compaction migrates the remaining old-spec files to the new layout
    driver.table.compact(min_files_per_bucket=999)
    mf = driver.table.manifest()
    assert all(f.get("nb", mf.n_buckets) == 32 for f in mf.files)
    return driver.table.read()


def q_cdc_stage_ahead(spark, sf_dir):
    """Stage-ahead pipelining: the prefetch thread builds the apply-ready
    frame (LWW dedup + merge pre-pass aggregation) one batch EARLY, so
    the apply chain keeps only join+write+commit. The final table must be
    byte-identical to the sequential exactly-once replay — fence, LWW
    order, and lsn metrics all survive the overlap. Under a FIFO session
    (this harness's default) the r4 guard falls back to plain source
    read-ahead with a loud warning — measured strictly faster there —
    so this query then exercises the pipelined-fallback path; the staged
    path itself is pinned under FAIR by tests/test_stage_ahead.py."""
    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "stage_ahead")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"], n_buckets=8)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    recs = driver.replay(binlog, batch_ids=[0, 1, 2, 3],
                         collect_metrics="light",
                         read_ahead=1, stage_ahead=True)
    assert len(recs) == 4
    # prestaged light metrics carried real lsn spans into the fence records
    assert all(r["lsn_to"] > r["lsn_from"] for r in recs)
    # fence still no-ops a replayed batch under the pipelined path
    assert driver.replay(binlog, batch_ids=[1], read_ahead=1,
                         stage_ahead=True, collect_metrics="light") == []
    return driver.table.read()


def q_cdc_read_ahead_auto(spark, sf_dir):
    """read_ahead='auto' (the prefetch regime rule): the engine measures
    the first batch — source-build wall vs apply wall — and enables
    prefetch only past the break-even (replay.AUTO_READ_AHEAD_SHARE with
    an absolute fetch floor; r4: width 1, depth 2 over-contends). For
    these cheap parquet-slice sources the probe must choose width 0 or
    1, and EITHER way the final table equals the plain exactly-once
    replay — the decision changes scheduling, never results. The fence
    still no-ops a replayed batch under the probed path."""
    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "read_ahead_auto")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"], n_buckets=8)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    recs = driver.replay(binlog, batch_ids=[0, 1, 2, 3],
                         collect_metrics="light", read_ahead="auto")
    assert len(recs) == 4
    assert driver.auto_read_ahead in (0, 1), driver.auto_read_ahead
    # fence still no-ops a replayed batch when resumed under auto
    assert driver.replay(binlog, batch_ids=[1], read_ahead="auto",
                         collect_metrics="light") == []
    return driver.table.read()


def q_cdc_predictive_merge(spark, sf_dir):
    """Predictive merge planning: once a steady regime is established
    (previous batch touched every bucket, size in shuffle territory) the
    fused pre-pass job is SKIPPED — plan choice from the previous
    observed size, full-table selection (always correct), actual count
    re-armed via an Observation on the write job. Final state must equal
    the plain LWW replay; the min-rows gate is lowered so sf0.01 batches
    reach the regime."""
    from .plans import merge as M

    binlog = _binlog_batches(spark, sf_dir)
    cat = _fresh_catalog(spark, "predictive")
    # the LWW dedup collapses each batch to the distinct-user count (150
    # at sf0.01, 15 at sf0.001), so the regime gates scale with the data:
    # thresholds sized to a third/seventh of the user count keep every
    # batch deep in shuffle territory past the min-rows floor, and 2
    # buckets make all-bucket coverage certain at any sf
    n_users = (binlog.filter(F.col("batch_id") == 0)
               .select("user_id").distinct().count())
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"],
                    n_buckets=2,
                    broadcast_merge_threshold=max(1, n_users // 7),
                    predictive_min_rows=max(2, n_users // 3))
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    predicted = []
    for b in (0, 1, 2, 3):
        driver.run_batch(binlog.filter(F.col("batch_id") == b), b,
                         collect_metrics="light")
        predicted.append(bool(M.LAST_PHASES.get("predicted")))
    assert predicted[0] is False          # no stats yet: normal pre-pass
    assert any(predicted[1:]), predicted  # steady regime skips the job
    return driver.table.read()


def q_cdc_auto_strategy(spark, sf_dir):
    """Cost-based COW/MOR regime selection (merge_strategy='auto'): the
    driver picks the apply plan per batch from metadata only — manifest
    row count vs the previous batch's observed size (MOR while the table
    dwarfs the batch, bench_auto_strategy measures the crossover — ~40x
    at the default consumer-read cadence since the r4 full-cycle model).
    A large bootstrap batch must land as COW (no estimate, small table),
    the steady tail of small 8-hour batches (table/batch ~84, deep past
    the crossover) must flip to MOR delta appends, and the final state
    equals the plain exactly-once replay either way."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    binlog = ev.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("seq_lsn"),
        F.when(F.dayofmonth("ts") <= 28, F.lit(0))
        .otherwise((F.dayofmonth("ts") - 29) * 3
                   + F.floor(F.hour("ts") / 8) + 1)
        .cast("long").alias("batch_id"),
        F.lit("U").alias("op"),
        "event_id",
        "user_id",
        "event_type",
        "value",
    )
    cat = _fresh_catalog(spark, "auto_strategy")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["event_id"],
                    n_buckets=8, merge_strategy="auto")
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("seq_lsn", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    driver = ReplayDriver(cat, cfg, target_schema=schema)
    recs = driver.replay(binlog)
    strategies = [r["metrics"]["strategy"] for r in recs]
    assert strategies[0] == "cow", strategies    # bootstrap regime
    assert "mor" in strategies, strategies       # steady tail flips to MOR
    assert driver.table.delta_file_count() > 0   # deltas actually landed
    return driver.table.read()


_SQL_AUTO_STRATEGY = """
SELECT event_id, epoch_us(ts) AS seq_lsn, user_id, event_type, value
FROM events
"""


_SQL_REPLAY_FINAL = """
SELECT user_id, ts_us AS seq_lsn, event_type, value, props FROM (
  SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

def q_cdc_quarantine(spark, sf_dir):
    """Apply-level dead letter (Kafka Connect errors.tolerance=all
    posture): envelope-invalid rows — NULL merge key (unkeyable) or an op
    outside I/U/D — are parked under the table root with a reason instead
    of silently applying (a NULL key would otherwise become a legitimate
    LWW key; an unknown op would act as an upsert). Final state must equal
    the replay of only the VALID rows; the parked rows are accounted in
    the batch metrics."""
    binlog = _binlog_batches(spark, sf_dir)
    corrupted = binlog.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("user_id")),
    ).withColumn(
        "op",
        F.when(F.col("event_id") % 17 == 0, F.lit("X")).otherwise(F.col("op")),
    )
    cat = _fresh_catalog(spark, "quarantine")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"],
                    n_buckets=8, quarantine=True)
    driver = ReplayDriver(cat, cfg, target_schema=_REPLAY_SCHEMA)
    recs = driver.replay(corrupted, batch_ids=[0, 1, 2, 3])
    assert sum(r["metrics"].get("quarantined", 0) for r in recs) > 0
    return driver.table.read()


_SQL_QUARANTINE = """
SELECT user_id, ts_us AS seq_lsn, event_type, value, props FROM (
  SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
  WHERE event_id % 10 <> 0 AND event_id % 17 <> 0
) WHERE rn = 1
"""


_EVO_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("seq_lsn", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("vk", T.IntegerType()),
    ]
)


def q_cdc_schema_evolution(spark, sf_dir):
    """Mid-replay schema evolution: rename value->val, widen vk int->bigint,
    add src, drop event_type — old snapshots project by field id, the
    stream may keep using the old column name (SURVEY §7.4 rename
    mapping); the drop is metadata-only and cannot resurrect."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    binlog = ev.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("seq_lsn"),
        F.when(F.dayofmonth("ts") <= 15, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("batch_id"),
        "user_id",
        "event_id",
        "event_type",
        "value",  # old name on purpose: post-rename events still say "value"
        F.get_json_object("props", "$.k").cast("int").alias("vk"),
        F.lit("b1").alias("src"),
    )
    cat = _fresh_catalog(spark, "evolution")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["user_id"], n_buckets=8)
    driver = ReplayDriver(cat, cfg, target_schema=_EVO_SCHEMA)
    evolution = {
        1: [
            EvolutionOp("rename", old="value", new="val"),
            EvolutionOp("widen", name="vk", type="bigint"),
            EvolutionOp("add", name="src", type="string"),
            EvolutionOp("drop", name="event_type"),
        ]
    }
    driver.replay(binlog, batch_ids=[0, 1], evolution_plan=evolution)
    return driver.table.read()


def q_cdc_nested_evolution(spark, sf_dir):
    """Nested struct field evolution (Iceberg nested-field analog; the
    reference rejects STRUCT outright, TestDatabricksOutputPluginByUnsupported
    .java:99-117): rename meta.vt->kind, add meta.cnt with an initial
    default, widen it int->bigint — all metadata-only (asserted: zero
    files touched) — then MERGE a batch written under the NEW layout.
    Old files resolve children by nested field id at read."""
    t_half, s_half = _halves(spark, sf_dir)
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("meta", T.StructType([
            T.StructField("vt", T.StringType()),
            T.StructField("amt", T.DoubleType()),
        ])),
    ])
    tbl = _new_table(spark, "nested_evo", schema=schema)
    tbl.append(_lww(t_half).select(
        "user_id", F.struct(F.col("event_type").alias("vt"),
                            F.col("value").alias("amt")).alias("meta")))
    files0 = {f["path"] for f in tbl.manifest().files}
    tbl.rename_column("meta.vt", "kind")
    tbl.add_column("meta.cnt", "int", default=7)
    tbl.widen_column("meta.cnt", "bigint")
    if {f["path"] for f in tbl.manifest().files} != files0:
        raise RuntimeError("nested evolution was not metadata-only")
    staged = _lww(s_half).select(
        "user_id", F.struct(
            F.col("event_type").alias("kind"),
            F.col("value").alias("amt"),
            (F.col("user_id") % 5).cast("bigint").alias("cnt"),
        ).alias("meta"))
    merge_apply(tbl, staged, keys=["user_id"])
    return tbl.read().select(
        "user_id",
        F.col("meta.kind").alias("kind"),
        _CENTS_S(F.col("meta.amt")).alias("amt_c"),
        F.col("meta.cnt").alias("cnt"),
    )


_SQL_NESTED_EVOLUTION = f"""
WITH t AS (SELECT * FROM {_sql_lww("event_id % 2 = 0")}),
     s AS (SELECT * FROM {_sql_lww("event_id % 2 = 1")})
SELECT coalesce(s.user_id, t.user_id) AS user_id,
       CASE WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS kind,
       {_cents_sql("CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END")} AS amt_c,
       CASE WHEN s.user_id IS NOT NULL THEN s.user_id % 5 ELSE 7 END AS cnt
FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
"""


def q_cdc_join_maintenance(spark, sf_dir):
    """Incremental join-view maintenance (streaming/joinmaint.py): a
    denormalized enrichment view fact ⟕ dim tracks BOTH CDC tables from
    their diffs — fact churn re-enriches exactly the changed rows, dim
    churn fans out to the fact rows whose fk hit a changed dim key
    (read(eq_filter=[keys]) point lookup), one keyed MERGE, both consumed
    versions riding the view's own commit. Recomputing the join per batch
    over 100 TB is the anti-pattern this replaces."""
    from .streaming.joinmaint import ensure_join_view, sync_join_view

    t_half, s_half = _halves(spark, sf_dir)
    cat = _fresh_catalog(spark, "joinmaint")
    fact = cat.create_table("fact", STATE_SCHEMA, n_buckets=8,
                            bucket_key="user_id",
                            properties={"merge_keys": "user_id"})
    fact.append(_lww(t_half))
    dim_schema = T.StructType([
        T.StructField("event_type", T.StringType()),
        T.StructField("code", T.LongType()),
    ])
    dim = cat.create_table("dim", dim_schema, n_buckets=4,
                           bucket_key="event_type",
                           properties={"merge_keys": "event_type"})
    dim.append(_lww(t_half).select("event_type").distinct()
               .withColumn("code", F.length("event_type").cast("long")))
    view = ensure_join_view(cat, fact, dim, "vw", "user_id",
                            "event_type", "event_type", ["code"])
    # churn both sides, then one incremental sync
    merge_apply(fact, _lww(s_half), keys=["user_id"])
    merge_apply(dim, _lww(s_half).select("event_type").distinct()
                .withColumn("code", (F.length("event_type") * 10).cast("long")),
                keys=["event_type"])
    m = sync_join_view(fact, dim, view, "user_id", "event_type",
                       "event_type", ["code"])
    if m is None or m.properties["join_upto_fact"] != str(fact.current_version()):
        raise RuntimeError("join view did not consume the fact churn")
    return view.read().select(
        "user_id", "ts_us", "event_type",
        _CENTS_S(F.col("value")).alias("value_c"), "code")


_SQL_JOIN_MAINTENANCE = f"""
WITH t AS (SELECT * FROM {_sql_lww("event_id % 2 = 0")}),
     s AS (SELECT * FROM {_sql_lww("event_id % 2 = 1")}),
     a AS (SELECT {_UPSERT_COLS} FROM t FULL OUTER JOIN s ON t.user_id = s.user_id),
     dim AS (
       SELECT event_type AS dk,
              CASE WHEN event_type IN (SELECT DISTINCT event_type FROM s)
                   THEN length(event_type) * 10
                   ELSE length(event_type) END AS code
       FROM (SELECT DISTINCT event_type FROM t
             UNION SELECT DISTINCT event_type FROM s)
     )
SELECT a.user_id, a.ts_us, a.event_type,
       {_cents_sql("a.value")} AS value_c, d.code
FROM a LEFT JOIN dim d ON a.event_type = d.dk
"""


def q_cdc_default_values(spark, sf_dir):
    """Iceberg v3 initial-default analog: columns added with `default=` are
    a metadata-only backfill — pre-add files read the literal (never NULL,
    zero rewrite), post-add files carry physical values, and file skipping
    treats pre-add files as constant-valued [d, d]: the stats_filter leg
    below keeps them because the DEFAULT (0) is in range, with no recorded
    bounds for the column in those files at all."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "default_values")
    tbl.append(_lww(t_half))
    tbl.add_column("tier", "string", default="std")
    tbl.add_column("score", "bigint", default=0)
    staged = (
        _lww(s_half)
        .withColumn("tier", F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string")))
        .withColumn("score", (F.col("user_id") * 10).cast("bigint"))
    )
    tbl.append(staged.select(*_STATE_COLS, "tier", "score"))
    return (
        tbl.read(stats_filter={"score": (None, 100)})
        .select("user_id", "ts_us", "event_type", "value", "tier", "score")
    )


_SQL_DEFAULT_VALUES = f"""
SELECT user_id, ts_us, event_type, value,
       'std' AS tier, CAST(0 AS BIGINT) AS score
FROM {_sql_lww("event_id % 2 = 0")}
UNION ALL
SELECT user_id, ts_us, event_type, value,
       't' || CAST(user_id % 3 AS VARCHAR) AS tier,
       CAST(user_id * 10 AS BIGINT) AS score
FROM {_sql_lww("event_id % 2 = 1")}
WHERE user_id * 10 <= 100
"""


_SQL_EVOLUTION = """
SELECT user_id, seq_lsn, value AS val, vk,
       CASE WHEN b = 1 THEN 'b1' END AS src
FROM (
  SELECT user_id, epoch_us(ts) AS seq_lsn, event_type, value,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS vk,
         CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS b,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


FENCED_BATCHES = [0, 2]


def q_cdc_fence_antijoin(spark, sf_dir):
    """Distributed fence variant (SURVEY §2.C joins): left-anti join of the
    incoming stream against the committed-batch fence set — the plan used
    when the fence list itself is a table instead of driver metadata."""
    binlog = _binlog_batches(spark, sf_dir)
    fence = spark.createDataFrame([(b,) for b in FENCED_BATCHES], "batch_id long")
    return (
        binlog.join(F.broadcast(fence), "batch_id", "left_anti")
        .select("batch_id", "user_id", "event_id", "seq_lsn")
    )


def q_cdc_time_travel(spark, sf_dir):
    """Snapshot isolation / time travel: read the table AS OF the first
    commit after a second commit has landed."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "time_travel")
    tbl.append(t_half.select(*_STATE_COLS))
    v1 = tbl.current_version()
    tbl.append(s_half.select(*_STATE_COLS))
    return tbl.read(version=v1)


def q_cdc_incremental_read(spark, sf_dir):
    """Changelog-style incremental scan: only the rows added between two
    snapshots (the CDC *read* side — consumers tail the table itself)."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "incr_read")
    tbl.append(t_half.select(*_STATE_COLS))
    v1 = tbl.current_version()
    tbl.append(s_half.select(*_STATE_COLS))
    return tbl.added_rows(since_version=v1)


def q_cdc_lineage_stats(spark, sf_dir):
    """Per-batch lineage metrics aggregate (SURVEY §2.C aggregations)."""
    binlog = _binlog_batches(spark, sf_dir)
    return binlog.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("events_in"),
        F.countDistinct("user_id").alias("n_keys"),
        F.sum(_CENTS_S(F.col("value"))).alias("value_cents"),
        F.min("seq_lsn").alias("lsn_from"),
        F.max("seq_lsn").alias("lsn_to"),
    )


def q_cdc_multi_table(spark, sf_dir):
    """Multi-table fan-out (streaming/multi.py): one binlog routed to two
    merge targets by a per-event `table` discriminator, each with its own
    fence/checkpoint; result is the union of both final states. Routing is
    by user parity, so per-table LWW == global LWW restricted to the slice —
    which is exactly what the oracle computes."""
    from .streaming.multi import MultiTableReplayDriver

    binlog = _binlog_batches(spark, sf_dir, split_days=16).withColumn(
        "table",
        F.when(F.col("user_id") % 2 == 0, F.lit("even")).otherwise(F.lit("odd")),
    )
    cat = _fresh_catalog(spark, "multi")
    names = ("even", "odd")
    mt = MultiTableReplayDriver(
        cat,
        [JobConfig(table=t, mode="merge", merge_keys=["user_id"], n_buckets=8)
         for t in names],
        schemas={t: _REPLAY_SCHEMA for t in names},
    )
    mt.replay(binlog, batch_ids=[0, 1])
    parts = [
        mt.drivers[t].table.read().withColumn("tbl", F.lit(t)) for t in names
    ]
    return parts[0].unionByName(parts[1])


_SQL_MULTI_TABLE = """
SELECT user_id, ts_us AS seq_lsn, event_type, value, props,
       CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS tbl
FROM (
  SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def q_cdc_txn_commit(spark, sf_dir):
    """Catalog-level multi-table transaction (sources/txn.py, Nessie /
    Iceberg-REST catalog-commit analog): one batch MERGEs into two tables
    through per-table txn branches, then commit() publishes both heads
    all-or-nothing (intent record -> O(1) pointer swaps, crash recovery
    rolls forward). The staged state is asserted invisible before the
    commit; the oracle recomputes both tables' merged final states."""
    t_half, s_half = _halves(spark, sf_dir)
    cat = _fresh_catalog(spark, "txn")
    names = (("even", 0), ("odd", 1))
    for name, par in names:
        t = cat.create_table(name, STATE_SCHEMA, n_buckets=4,
                             bucket_key="user_id",
                             properties={"merge_keys": "user_id"})
        t.append(_lww(t_half.filter(F.col("user_id") % 2 == par)))
    pre = {name: cat.load(name).current_version() for name, _ in names}
    txn = cat.begin([n for n, _ in names])
    for name, par in names:
        merge_apply(txn.table(name),
                    _lww(s_half.filter(F.col("user_id") % 2 == par)),
                    keys=["user_id"])
        if cat.load(name).current_version() != pre[name]:
            raise RuntimeError("staged txn write leaked to the main head")
    txn.commit()
    parts = [cat.load(name).read().withColumn("tbl", F.lit(name))
             for name, _ in names]
    return parts[0].unionByName(parts[1])


_SQL_TXN_COMMIT = f"""
SELECT m.*, CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS tbl
FROM ({_sql_merge(_UPSERT_COLS)}) m
"""


def q_cdc_stateful_stream(spark, sf_dir):
    """True-streaming stateful LWW (streaming/stateful.py,
    applyInPandasWithState): events streamed file-by-file through the
    per-key state-store operator; the emitted upsert changelog's winners
    must equal batch LWW. event_id is zero-padded so the stream's string
    tie-break matches the oracle's numeric one."""
    from .schema import BINLOG_SCHEMA
    from .streaming.stateful import CHANGELOG_SCHEMA, streaming_lww_changelog

    base = f"{WORK_ROOT}/stateful/{uuid.uuid4().hex}"
    binlog = _events(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("doc_id"),
        F.col("ts_us").alias("seq_lsn"),
        F.lit(0).cast("long").alias("batch_id"),
        F.lit("U").alias("op"),
        F.lit(None).cast("array<int>").alias("tokens"),
        F.lit(None).cast("int").alias("n_tok"),
        F.col("event_type").alias("source"),
        F.format_string("%020d", F.col("event_id")).alias("event_id"),
    )
    # 4 files / 2 per trigger -> 2 micro-batches: cross-batch state exercised
    # without paying stateful-trigger overhead 4x
    binlog.repartition(4).write.parquet(f"{base}/src")
    stream = (
        spark.readStream.schema(BINLOG_SCHEMA)
        .option("maxFilesPerTrigger", 2).parquet(f"{base}/src")
    )
    q = (
        streaming_lww_changelog(stream)
        .writeStream
        .foreachBatch(lambda df, _e: df.write.mode("append").parquet(f"{base}/out"))
        .outputMode("update")
        .option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = spark.read.schema(CHANGELOG_SCHEMA).parquet(f"{base}/out")
    win = lww_dedup(out, keys=["doc_id"], order=["seq_lsn", "event_id"])
    return win.select(
        F.col("doc_id").cast("bigint").alias("user_id"),
        F.col("seq_lsn").alias("ts_us"),
        F.col("source").alias("event_type"),
    )


def q_cdc_kafka_roundtrip(spark, sf_dir):
    """Kafka-wire ingestion path: events encoded as key-hash-partitioned
    JSON frames (sources/kafka_tail.py), parsed back with a pure-JVM
    from_json projection, then LWW-deduped. Oracle = plain LWW over the
    same events — equality proves the wire round-trip is lossless."""
    from .sources.kafka_tail import encode_kafka_frame, parse_change_events

    ev = _events(spark, sf_dir)
    frame = encode_kafka_frame(ev, topic="events", n_partitions=8,
                               key_col="user_id", order_col="ts_us")
    parsed = parse_change_events(frame, ev.schema)
    return _lww(parsed)


def q_cdc_export_snapshot(spark, sf_dir):
    """Plain-parquet snapshot export (LakeTable.export_snapshot — the
    outbound twin of add_files): after a merge + MOR predicate delete, the
    snapshot is materialized into a bare directory (clean files hardlinked,
    delete-targeted files resolved and rewritten) and read back with
    spark.read.parquet — no engine in the read path. Oracle = the merged
    LWW state minus the deleted band: equality proves the export is a
    faithful materialization including outstanding positional deletes."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "export_snap")
    tbl.append(_lww(t_half))
    # clean snapshot (plain appends, no lineage materialized): links only
    clean = tbl.export_snapshot(f"{WORK_ROOT}/export_snap/{uuid.uuid4().hex}")
    assert clean["rewritten_files"] == 0 and clean["linked"] > 0, clean
    merge_apply(tbl, _lww(s_half), keys=["user_id"])
    tbl.delete_where({"value": (150.0, None)}, mode="mor")
    dest = f"{WORK_ROOT}/export_snap/{uuid.uuid4().hex}"
    rec = tbl.export_snapshot(dest)
    assert rec["rewritten_files"] > 0, rec  # posdel-targeted files resolved
    return spark.read.parquet(dest).select(*_STATE_COLS)


def q_cdc_export_sync(spark, sf_dir):
    """Incremental export mirror (LakeTable.sync_export — the outbound twin
    of changed_since): an export_snapshot directory is advanced across a
    merge + MOR predicate delete by diffing export plans — links kept/added/
    removed, rewrite artifacts re-resolved only when their fingerprint
    (rest-file entries + delete sidecars + schema + keys) changed. Oracle =
    same final state as cdc_export_snapshot: proves the SYNCED mirror equals
    a from-scratch materialization, i.e. the diff path loses nothing."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "export_sync")
    tbl.append(_lww(t_half))
    dest = f"{WORK_ROOT}/export_sync/{uuid.uuid4().hex}"
    rec0 = tbl.export_snapshot(dest)
    assert rec0["linked"] > 0 and rec0["rewritten_files"] == 0, rec0
    merge_apply(tbl, _lww(s_half), keys=["user_id"])
    tbl.delete_where({"value": (150.0, None)}, mode="mor")
    rec = tbl.sync_export(dest)
    # merge rewrote the touched buckets and the posdel invalidated the rest
    assert rec["rewritten_files"] > 0 and not rec["rewrite_reused"], rec
    rec2 = tbl.sync_export(dest)  # idempotent: same version, nothing moves
    assert rec2["rewrite_reused"] and rec2["linked_added"] == 0, rec2
    return spark.read.parquet(dest).select(*_STATE_COLS)


_EXPORT_FINAL_VALUE = (
    "CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END")
_SQL_EXPORT = _sql_merge(
    _UPSERT_COLS,
    where=f"WHERE NOT coalesce(({_EXPORT_FINAL_VALUE}) >= 150.0, false)",
)


_COMPLEX_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts_us", T.LongType()),
    T.StructField("addr", T.StructType([
        T.StructField("city", T.StringType()),
        T.StructField("zip", T.IntegerType())])),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("attrs", T.MapType(T.StringType(), T.DoubleType())),
])


def _complexify(df):
    return df.select(
        "user_id", "ts_us", "event_id",
        F.struct(F.col("event_type").alias("city"),
                 F.pmod(F.col("user_id"), F.lit(1000)).cast("int")
                 .alias("zip")).alias("addr"),
        F.array(F.col("event_type"),
                F.format_string("u%d", F.pmod(F.col("user_id"), F.lit(7))))
        .alias("tags"),
        F.create_map(F.lit("v"), F.col("value")).alias("attrs"))


def q_cdc_complex_types(spark, sf_dir):
    """Native complex-type payloads (struct / array / map) through the full
    CDC path — table create, LWW dedup, keyed COW MERGE, then a compaction
    rewrite — returned flattened for the oracle. The reference REJECTS all
    three outright (COPY INTO cannot cast STRING to complex;
    TestDatabricksOutputPluginByUnsupported.java:33-119 asserts the exact
    server errors); Spark + parquet store nested types natively, so the
    engine lifts the gap instead of reproducing it (the token-array payload
    already rides the same machinery per the input hint). Oracle recomputes
    the flattened values from the raw scalar events: equality proves the
    nested payload survived create/merge/compact byte-faithfully."""
    t_half, s_half = _halves(spark, sf_dir)

    def lwwc(df):
        return lww_dedup(_complexify(df), keys=["user_id"],
                         order=["ts_us", "event_id"]).select(
            "user_id", "ts_us", "addr", "tags", "attrs")

    tbl = _new_table(spark, "complex", schema=_COMPLEX_SCHEMA)
    tbl.append(lwwc(t_half))
    merge_apply(tbl, lwwc(s_half), keys=["user_id"])
    # rewrite path (compaction) must carry nested columns too
    assert tbl.compact(min_files_per_bucket=1) is not None
    return tbl.read().select(
        "user_id", "ts_us",
        F.col("addr.city").alias("city"),
        F.col("addr.zip").alias("zip"),
        F.element_at("tags", 2).alias("tag2"),
        F.element_at("attrs", F.lit("v")).alias("v"))


_SQL_COMPLEX = f"""
WITH t AS (SELECT * FROM {_sql_lww("event_id % 2 = 0")}),
     s AS (SELECT * FROM {_sql_lww("event_id % 2 = 1")})
SELECT coalesce(s.user_id, t.user_id) AS user_id,
       CASE WHEN s.user_id IS NOT NULL THEN s.ts_us ELSE t.ts_us END AS ts_us,
       CASE WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type
            END AS city,
       CAST(coalesce(s.user_id, t.user_id) % 1000 AS INT) AS zip,
       'u' || CAST(coalesce(s.user_id, t.user_id) % 7 AS VARCHAR) AS tag2,
       CASE WHEN s.user_id IS NOT NULL THEN s.value ELSE t.value END AS v
FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
"""


def q_cdc_debezium_replay(spark, sf_dir):
    """Debezium-envelope ingestion (sources/debezium.py): events encoded as
    standard Debezium envelopes — 'd' records carry the BEFORE image,
    upserts the AFTER image, JSON null-field elision exercised on both —
    decoded back with one pure-JVM from_json projection, LWW-deduped, and
    delete-winners dropped (the engine's merge-delete semantics). Oracle =
    LWW over the raw events minus users whose winning event is an 'error'
    (the rows encoded as deletes): equality proves the envelope round-trip
    and the op mapping (c/r/u -> upsert, d -> delete) are lossless."""
    from .operators.lww import lww_dedup
    from .sources.debezium import encode_debezium, parse_debezium

    ev = _events(spark, sf_dir).withColumn(
        "op", F.when(F.col("event_type") == "error", "D").otherwise("U"))
    payload_cols = ["user_id", "ts_us", "event_id", "event_type", "value",
                    "props"]
    framed = encode_debezium(ev, payload_cols, op_col="op", lsn_col="ts_us")
    parsed = parse_debezium(
        framed, T.StructType([f for f in ev.schema.fields
                              if f.name in payload_cols]))
    winners = lww_dedup(parsed, keys=["user_id"], order=["ts_us", "event_id"])
    return winners.filter(F.col("op") != "D").select(*_STATE_COLS)


_SQL_DEBEZIUM = f"""
SELECT user_id, ts_us, event_type, value, props FROM {_sql_lww()}
WHERE event_type <> 'error'
"""


def q_cdc_tsv_ingest(spark, sf_dir):
    """Staged-TSV leg (ref B1/A4): events written in the reference's exact
    TSV dialect (\\N nulls, tab, quoted empty), scanned back as raw _cN
    strings, then the COPY projection casts/renames positionally — with
    CLOB / DOUBLE PRECISION exercising the type-name normalization
    (DatabricksOutputConnection.java:251-262). Oracle reads the parquet
    directly: equality proves the staging round-trip is lossless."""
    from .sources.tsv_ingest import copy_cast, read_staged_tsv, write_staged_tsv

    ev = _events(spark, sf_dir)  # user_id, ts_us, event_id, event_type, value, props
    path = f"{WORK_ROOT}/tsv/{uuid.uuid4().hex}"
    write_staged_tsv(ev, path)
    raw = read_staged_tsv(spark, path, n_cols=len(ev.columns))
    return copy_cast(raw, [
        ("user_id", "BIGINT"),
        ("ts_us", "BIGINT"),
        ("event_id", "BIGINT"),
        ("event_type", "CLOB"),
        ("value", "DOUBLE PRECISION"),
        ("props", "VARCHAR"),
    ])


_SQL_TSV_INGEST = """
SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value, props
FROM events
"""


def q_cdc_value_types(spark, sf_dir):
    """value_type conversion matrix (ref README.md:42, matrix test
    TestDatabricksOutputPluginByOutputValueType.java:11-34): one column per
    intermediate representation — integral truncation, tinyint, boolean,
    float32, decimal(38,9), date, clock-time text, and the ruby-strftime
    default timestamp format, plus the Asia/Tokyo zone shift (the UTC->JST
    day-rollover semantics of TestDatabricksOutputPluginByOutputType.java:
    79-83; JST has no DST, so the oracle shifts a constant +9h)."""
    from .functions.typemap import coerce_value, format_timestamp

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    return ev.select(
        coerce_value(F.col("event_id"), "pass").alias("event_id"),
        coerce_value(F.col("value"), "long").alias("v_long"),
        coerce_value(F.pmod(F.col("user_id"), F.lit(100)), "byte").alias("v_byte"),
        coerce_value(F.pmod(F.col("user_id"), F.lit(2)), "boolean").alias("v_bool"),
        coerce_value(F.col("value"), "float").alias("v_float"),
        coerce_value(F.col("value"), "decimal").cast("string").alias("v_decimal"),
        coerce_value(ts, "date").cast("string").alias("v_date"),
        coerce_value(ts, "time").alias("v_time"),
        coerce_value(ts, "timestamp").alias("v_ts"),
        format_timestamp(ts, timezone="Asia/Tokyo").alias("v_ts_tokyo"),
        coerce_value(F.col("props"), "null").cast("string").alias("v_null"),
    )


_SQL_VALUE_TYPES = """
SELECT event_id,
       CAST(trunc(value) AS BIGINT)                          AS v_long,
       CAST(user_id % 100 AS TINYINT)                        AS v_byte,
       CAST(user_id % 2 AS BOOLEAN)                          AS v_bool,
       CAST(value AS REAL)                                   AS v_float,
       CAST(CAST(value AS DECIMAL(38,9)) AS VARCHAR)         AS v_decimal,
       strftime(CAST(ts AS DATE), '%Y-%m-%d')                AS v_date,
       strftime(ts, '%H:%M:%S.%f')                           AS v_time,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f')                  AS v_ts,
       strftime(ts + INTERVAL 9 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS v_ts_tokyo,
       CAST(NULL AS VARCHAR)                                 AS v_null
FROM events
"""


# ================================================================ Group B
# Text analysis + dedup family over `documents` (task brief: training-data ops)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_text_profile(spark, sf_dir):
    """Token count, rolling-hash fingerprint, quality score, language guess —
    all JVM-side higher-order-function expressions (no Python UDF)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        P.f_token_count(F.col("text")).alias("n_tok"),
        P.f_fingerprint(F.col("text")).alias("fingerprint"),
        P.f_quality(F.col("text")).alias("quality"),
        P.f_langid(F.col("text")).alias("lang_guess"),
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, min doc_id is the keeper."""
    d = _docs(spark, sf_dir)
    return d.groupBy(F.md5(F.col("text")).alias("text_md5")).agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


MINHASH_K, SHINGLE_N, LSH_BANDS, LSH_ROWS = 16, 3, 4, 4




def _sql_band_digests() -> str:
    # scalar-b form of P.sql_lsh_bands (same digest definition, one row per band)
    sig = P.sql_minhash("text", MINHASH_K, SHINGLE_N)
    slice_ = f"list_slice(sig, b*{LSH_ROWS} + 1, b*{LSH_ROWS} + {LSH_ROWS})"
    return f"""(
      SELECT doc_id, b,
             md5(b::VARCHAR || '#' || array_to_string({slice_}, '|')) AS digest
      FROM (SELECT doc_id, {sig} AS sig FROM documents), range(0, {LSH_BANDS}) t(b)
    )"""


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH candidate pairs: shingle->minhash->band->bucket self-join
    (row-exploded scale plan in operators/dedupe.py)."""
    from .operators.dedupe import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir), k=MINHASH_K, n=SHINGLE_N,
                             bands=LSH_BANDS)


def _sql_minhash_pairs() -> str:
    return f"""
    WITH bd AS (SELECT * FROM {_sql_band_digests()})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bd a JOIN bd b ON a.b = b.b AND a.digest = b.digest AND a.doc_id < b.doc_id
    """


def _sql_ngram_pairs() -> str:
    """Confirmed near-dup pairs (LSH candidates + exact shingle-Jaccard
    >= 0.5) — shared by the ngram_jaccard / clusters / pipeline oracles."""
    return f"""
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT p.doc_a, p.doc_b,
             {P.sql_jaccard_shingles('a.text', 'b.text', SHINGLE_N)} AS jaccard
      FROM ({_sql_minhash_pairs()}) p
      JOIN documents a ON a.doc_id = p.doc_a
      JOIN documents b ON b.doc_id = p.doc_b
    ) WHERE jaccard >= 0.5
    """


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup confirmation: exact shingle-Jaccard >= 0.5 on LSH candidates."""
    from .operators.dedupe import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5,
                               k=MINHASH_K, n=SHINGLE_N, bands=LSH_BANDS)


def q_dedup_simhash(spark, sf_dir):
    """32-bit SimHash per document (near-dup clustering key)."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", P.f_simhash32(F.col("text")).alias("simhash"))


SIMHASH_MAX_HAMMING = 6


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: Hamming distance over 32-bit signatures."""
    from .operators.dedupe import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=SIMHASH_MAX_HAMMING)


def _sql_simhash_pairs(bits: int = 32) -> str:
    return f"""
    WITH s AS (SELECT doc_id, {P.sql_simhash('text', bits)} AS h FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.h, b.h)) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.h, b.h)) <= {SIMHASH_MAX_HAMMING}
    """


def q_dedup_simhash64_pairs(spark, sf_dir):
    """64-bit SimHash near-dup pairs — the production width (Manku et
    al.): at the same max_hamming the pigeonhole blocks widen from ~4-5
    to ~9 bits, shrinking every block bucket ~16-32x. Same exact-output
    banding, same oracle shape; the Hamming arithmetic is sign-agnostic
    (bit 63 rides the bigint sign bit as a literal on both engines)."""
    from .operators.dedupe import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir),
                         max_hamming=SIMHASH_MAX_HAMMING, bits=64)


# ---------------------------------------------------------------- tokens
# Token-array transforms (north_star: vectorized pandas/Arrow UDFs; the
# JVM expression form is the scale path, the *_arrow twins prove the Arrow
# batch path against the SAME DuckDB oracle).

TOK_CHUNK_LEN = 32


def _doc_tokens(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select("doc_id", P.f_word_ids(F.col("text")).alias("tokens"))


def q_tok_derive(spark, sf_dir):
    """Deterministic tokenizer + token-array validation fingerprint
    (JVM higher-order expressions end-to-end). The token ARRAY itself
    stays internal: query outputs project it through f_tokens_fingerprint
    because the driver harness canonicalizes results via pandas sort,
    where list-typed cells are unhashable (round-1 cdc_token_lookup
    failure mode) — and the fingerprint IS the north rule's row-equality
    check for token payloads."""
    t = _doc_tokens(spark, sf_dir)
    return t.select(
        "doc_id",
        F.size("tokens").alias("n_tok"),
        P.f_tokens_fingerprint(F.col("tokens")).alias("fp"),
    )


_SQL_DOC_TOKENS = None  # built lazily in _oracle_sql


def q_tok_fingerprint_arrow(spark, sf_dir):
    """Arrow-vectorized fingerprint kernel (@pandas_udf over numpy buffers)
    checked against the same oracle as the JVM form."""
    from .transforms import tokens_fingerprint_arrow

    t = _doc_tokens(spark, sf_dir)
    return t.select("doc_id", tokens_fingerprint_arrow(F.col("tokens")).alias("fp"))


def _fp_chunks(chunked):
    # harness-safe projection: chunk arrays -> validation fingerprints
    return chunked.select(
        "doc_id", "chunk_id", "n_tok",
        P.f_tokens_fingerprint(F.col("tokens")).alias("fp"))


def q_tok_chunks(spark, sf_dir):
    """Token re-chunking to <=32-token training chunks (JVM slice+posexplode).
    Chunk arrays are projected to fingerprints for the harness (see
    q_tok_derive); the operator itself returns real arrays."""
    from .transforms import chunk_tokens

    return _fp_chunks(chunk_tokens(_doc_tokens(spark, sf_dir), TOK_CHUNK_LEN))


def q_tok_chunks_arrow(spark, sf_dir):
    """mapInPandas twin of tok_chunks (Arrow batch path, same oracle)."""
    from .transforms import chunk_tokens_arrow

    return _fp_chunks(
        chunk_tokens_arrow(_doc_tokens(spark, sf_dir), TOK_CHUNK_LEN))


PACK_LEN, PACK_GROUPS = 512, 16


def q_tok_pack(spark, sf_dir):
    """Greedy packing of docs into 512-token training sequences
    (applyInPandas over hash-bucketed groups). The per-group fold is
    inherently sequential, but still oracle-checkable: the DuckDB oracle
    replays the same greedy recurrence with a recursive CTE. Grouping uses
    the portable md5-hex hash so both engines bucket identically."""
    from .transforms import pack_sequences

    grp = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint"),
        F.lit(PACK_GROUPS),
    )
    packed = pack_sequences(_doc_tokens(spark, sf_dir), seq_len=PACK_LEN,
                            n_groups=PACK_GROUPS, group_expr=grp)
    return packed.select(
        "group_id", "seq_id", "n_tok", "n_docs",
        P.f_tokens_fingerprint(F.col("tokens")).alias("fp"),
    )


def _sql_tok_pack() -> str:
    toks = P.sql_word_ids("text")
    L, G = PACK_LEN, PACK_GROUPS
    fp = P.sql_tokens_fingerprint("flatten(list(toks ORDER BY rn))")
    return f"""
    WITH RECURSIVE
    d0 AS (SELECT doc_id, {toks} AS toks FROM documents),
    d AS (SELECT doc_id,
                 CAST({_sql_hexint("doc_id::VARCHAR", 1, 8)} % {G} AS INTEGER) AS g,
                 list_slice(toks, 1, {L}) AS toks,
                 least(len(toks), {L}) AS L
          FROM d0 WHERE len(toks) > 0),
    docs AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY doc_id) AS rn
             FROM d),
    pk AS (
      SELECT g, rn, L, toks, L AS cur_len, 0::BIGINT AS seq_id
      FROM docs WHERE rn = 1
      UNION ALL
      SELECT dd.g, dd.rn, dd.L, dd.toks,
             CASE WHEN p.cur_len + dd.L > {L} THEN dd.L
                  ELSE p.cur_len + dd.L END,
             CASE WHEN p.cur_len + dd.L > {L} THEN p.seq_id + 1
                  ELSE p.seq_id END
      FROM pk p JOIN docs dd ON dd.g = p.g AND dd.rn = p.rn + 1
    )
    SELECT g AS group_id, seq_id,
           CAST(sum(L) AS INTEGER) AS n_tok,
           CAST(count(*) AS INTEGER) AS n_docs,
           {fp} AS fp
    FROM pk GROUP BY g, seq_id
    """


# ---------------------------------------------------------------- media
# Multimodal binary columns (task brief): opaque payload + mapInPandas
# decode kernel (deterministic stub codec; real plumbing).


def q_media_decode(spark, sf_dir):
    """binary payload -> Arrow-batched decode kernel -> typed properties."""
    from .operators.media import decode_media, media_from_docs

    return decode_media(media_from_docs(_docs(spark, sf_dir)))


def q_media_embed(spark, sf_dir):
    """binary payload -> Arrow-batched feature-extraction kernel -> signature
    vector (the embed leg of the multimodal pipeline; the stub encoder is
    md5-derived so the oracle recomputes it, the batch plumbing is real).
    The operator's array output feeds ANN/near-dup unchanged; the QUERY
    projects it to a fingerprint for the harness (see q_tok_derive)."""
    from .operators.media import embed_media, media_from_docs

    emb = embed_media(media_from_docs(_docs(spark, sf_dir)))
    return emb.select(
        "media_id", "kind",
        P.f_tokens_fingerprint(F.col("emb")).alias("emb_fp"))


def _sql_hexint(e: str, start: int, n: int) -> str:
    hex_ = "0123456789abcdef"
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split(substr(md5({e}), {start}, {n}), ''), "
        f"ch -> (strpos('{hex_}', ch) - 1)::BIGINT)), (a, x) -> a * 16 + x)"
    )


def _sql_tok_chunks() -> str:
    toks = P.sql_word_ids("text")
    L = TOK_CHUNK_LEN
    return f"""
    WITH d AS (SELECT doc_id, {toks} AS toks FROM documents),
         c AS (
           SELECT doc_id,
                  unnest(list_transform(
                    range(0, CAST(ceil(len(toks) / {L}.0) AS BIGINT)),
                    i -> struct_pack(chunk_id := i,
                                     tokens := list_slice(toks, i*{L} + 1, i*{L} + {L}))
                  )) AS u
           FROM d WHERE len(toks) > 0
         )
    SELECT doc_id, CAST(u.chunk_id AS INTEGER) AS chunk_id,
           len(u.tokens) AS n_tok,
           {P.sql_tokens_fingerprint('u.tokens')} AS fp
    FROM c
    """


MEDIA_MAX_DIM = 256


def q_media_resize(spark, sf_dir):
    """image payloads -> fused decode+resize Arrow kernel (one payload scan)
    -> integer fit-within-box dims + deterministic resample digest."""
    from .operators.media import media_from_docs, resize_media

    return resize_media(media_from_docs(_docs(spark, sf_dir)),
                        max_dim=MEDIA_MAX_DIM)


def _sql_media_resize() -> str:
    d = MEDIA_MAX_DIM
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
             text,
             CAST(16 + {_sql_hexint('text', 1, 4)} % 2032 AS INTEGER) AS width,
             CAST(16 + {_sql_hexint('text', 5, 4)} % 2032 AS INTEGER) AS height
      FROM documents
    ), r AS (
      SELECT *, greatest(width, height) AS mx FROM m WHERE kind = 'image'
    ), z AS (
      SELECT media_id, kind, text, width, height,
             CASE WHEN mx <= {d} THEN width
                  ELSE greatest(1, (width * {d}) // mx) END AS out_w,
             CASE WHEN mx <= {d} THEN height
                  ELSE greatest(1, (height * {d}) // mx) END AS out_h
      FROM r
    )
    SELECT media_id, kind, width, height,
           CAST(out_w AS INTEGER) AS out_w, CAST(out_h AS INTEGER) AS out_h,
           md5(text || ':' || CAST(out_w AS VARCHAR) || 'x'
                    || CAST(out_h AS VARCHAR)) AS resized_md5
    FROM z
    """


def _sql_media_decode() -> str:
    return f"""
    SELECT doc_id AS media_id,
           (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
           octet_length(encode(text)) AS n_bytes,
           CAST(16 + {_sql_hexint('text', 1, 4)} % 2032 AS INTEGER) AS width,
           CAST(16 + {_sql_hexint('text', 5, 4)} % 2032 AS INTEGER) AS height,
           CAST(1 + {_sql_hexint('text', 9, 2)} % 64 AS INTEGER) AS n_frames
    FROM documents
    """


def _sql_media_embed() -> str:
    comps = ", ".join(
        f"CAST({_sql_hexint('text', 2 * i + 1, 2)} AS INTEGER)"
        for i in range(8))
    return f"""
    SELECT doc_id AS media_id,
           (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
           {P.sql_tokens_fingerprint(f'[{comps}]')} AS emb_fp
    FROM documents
    """


# ================================================================ Group C
# Embedding similarity over `embeddings` (array<float>, dim 64)

ANN_QUERIES, ANN_K, ANN_PLANES = 16, 5, 4


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast the query set, rank per query."""
    from .operators.similarity import cosine_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(e, n_queries=ANN_QUERIES, k=ANN_K)


def q_ann_lsh_topk(spark, sf_dir):
    """Scale path: sign-random-projection LSH buckets -> equi-join on bucket
    -> exact cosine + rank within bucket only."""
    from .operators.similarity import srp_bucketed_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return srp_bucketed_topk(e, n_queries=ANN_QUERIES, k=ANN_K, planes=ANN_PLANES)


def q_ann_multiprobe_topk(spark, sf_dir):
    """Multi-probe LSH top-k (Lv et al.): the query also probes every
    bucket one plane-flip away — the recall lever that costs probes, not
    extra hash tables. Same equi-join-on-bucket plan shape."""
    from .operators.similarity import srp_multiprobe_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return srp_multiprobe_topk(e, n_queries=ANN_QUERIES, k=ANN_K,
                               planes=ANN_PLANES)


def recall_hits(brute, approx, name):
    """One (method, hits) row counting how many exact top-k pairs the
    approximate index recovered. Global agg (no groupBy) so a method with
    ZERO hits still emits its row with hits=0, matching the oracle's plain
    COUNT aggregate — a groupBy on a literal yields no row from an empty
    join."""
    j = brute.join(approx.select("query_id", "neighbor_id"),
                   ["query_id", "neighbor_id"])
    return (j.agg(F.count(F.lit(1)).alias("hits"))
            .select(F.lit(name).alias("method"), "hits"))


def q_ann_recall(spark, sf_dir):
    """The approximate-contract MEASURED: per LSH variant, how many of the
    exact top-k pairs the approximate index returns (hits / possible).
    Recall is the quantity a 100 TB ANN deployment tunes planes/probes
    against; making it an oracle-gated query pins both engines to the
    same candidate semantics AND documents the tradeoff as data.
    Multi-probe must dominate single-probe by construction (its candidate
    set is a superset)."""
    from .operators.similarity import (
        cosine_topk,
        srp_bucketed_topk,
        srp_multiprobe_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    brute = cosine_topk(e, ANN_QUERIES, ANN_K).select("query_id", "neighbor_id")
    poss = brute.agg(F.count(F.lit(1)).alias("possible"))

    lsh = recall_hits(brute, srp_bucketed_topk(e, ANN_QUERIES, ANN_K,
                                               planes=ANN_PLANES), "lsh")
    mp = recall_hits(brute, srp_multiprobe_topk(e, ANN_QUERIES, ANN_K,
                                                planes=ANN_PLANES),
                     "multiprobe")
    return lsh.unionByName(mp).crossJoin(poss)


def _sql_ann_multiprobe() -> str:
    cos = P.sql_cosine("q.embedding", "n.embedding")
    bucket = P.sql_srp_bucket("embedding", ANN_PLANES)
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
    SELECT query_id, neighbor_id, rank, cos FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {cos} AS cos,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {cos} DESC, n.vec_id) AS rank
      FROM b q JOIN b n ON bit_count(xor(q.bucket, n.bucket)) <= 1
                       AND q.vec_id <> n.vec_id
      WHERE q.vec_id < {ANN_QUERIES}
    ) WHERE rank <= {ANN_K}
    """


def _sql_ann_recall() -> str:
    return f"""
    WITH brute AS ({_sql_ann()}),
         lsh AS ({_sql_ann_lsh()}),
         mp AS ({_sql_ann_multiprobe()}),
         poss AS (SELECT count(*) AS possible FROM brute)
    SELECT 'lsh' AS method, count(*) AS hits, (SELECT possible FROM poss) AS possible
    FROM brute JOIN lsh USING (query_id, neighbor_id)
    UNION ALL
    SELECT 'multiprobe' AS method, count(*) AS hits, (SELECT possible FROM poss) AS possible
    FROM brute JOIN mp USING (query_id, neighbor_id)
    """


ANN_CENTROIDS = 8


def q_ann_ivf_topk(spark, sf_dir):
    """IVF scale path: nearest-centroid cell assignment, search in-cell only."""
    from .operators.similarity import ivf_topk

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_topk(e, n_queries=ANN_QUERIES, k=ANN_K, n_centroids=ANN_CENTROIDS)


def _sql_ann_ivf() -> str:
    ccos = P.sql_cosine("e.embedding", "c.cv")
    cos = P.sql_cosine("q.embedding", "n.embedding")
    return f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                  WHERE vec_id < {ANN_CENTROIDS}),
         a AS (
           SELECT vec_id, embedding, cid FROM (
             SELECT e.vec_id, e.embedding, c.cid,
                    row_number() OVER (PARTITION BY e.vec_id
                                       ORDER BY {ccos} DESC, c.cid) AS rn
             FROM embeddings e, cent c
           ) WHERE rn = 1
         )
    SELECT query_id, neighbor_id, rank, cos FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {cos} AS cos,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {cos} DESC, n.vec_id) AS rank
      FROM a q JOIN a n ON q.cid = n.cid AND q.vec_id <> n.vec_id
      WHERE q.vec_id < {ANN_QUERIES}
    ) WHERE rank <= {ANN_K}
    """


def _sql_ann_lsh() -> str:
    cos = P.sql_cosine("q.embedding", "n.embedding")
    bucket = P.sql_srp_bucket("embedding", ANN_PLANES)
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
    SELECT query_id, neighbor_id, rank, cos FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {cos} AS cos,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {cos} DESC, n.vec_id) AS rank
      FROM b q JOIN b n ON q.bucket = n.bucket AND q.vec_id <> n.vec_id
      WHERE q.vec_id < {ANN_QUERIES}
    ) WHERE rank <= {ANN_K}
    """


def _sql_ann() -> str:
    cos = P.sql_cosine("q.embedding", "n.embedding")
    return f"""
    SELECT query_id, neighbor_id, rank, cos FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {cos} AS cos,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {cos} DESC, n.vec_id) AS rank
      FROM embeddings q, embeddings n
      WHERE q.vec_id < {ANN_QUERIES} AND q.vec_id <> n.vec_id
    ) WHERE rank <= {ANN_K}
    """


EMB_TAU = 0.4  # data-informed: embeddings are near-orthogonal (max pair cos ~0.51)
EMB_PLANES, EMB_TABLES = 4, 2  # AND-OR LSH: 2 tables x 4-plane buckets


def q_emb_neardup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (a<b, cos >= tau) via AND-OR
    SRP-LSH candidate generation + exact-cosine confirm
    (operators/similarity.py srp_neardup_pairs). The round-1 version was
    `a.join(b, vec_a < vec_b)` — a BroadcastNestedLoop/cartesian, O(n^2)
    at any scale; this plan's candidate join is an equi-join on
    (table, bucket). The oracle evaluates the SAME candidate predicate
    (shared bucket in either table), so the gate stays exact while the
    recall-vs-work tradeoff is carried by the LSH knobs, not hidden."""
    from .operators.similarity import srp_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return srp_neardup_pairs(e, tau=EMB_TAU,
                             planes=EMB_PLANES, tables=EMB_TABLES)


# ================================================================ Group D
# Relational / streaming-analog parity over the TPC-H-ish tables


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped aggregate, money integerized to cents pre-sum."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    g = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_CENTS_S(F.col("l_quantity"))).alias("sum_qty_c"),
            F.sum(_CENTS_S(F.col("l_extendedprice"))).alias("sum_price_c"),
            F.sum(_CENTS_S(disc)).alias("sum_disc_c"),
            F.sum(_CENTS_S(charge)).alias("sum_charge_c"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return g.withColumn(
        "avg_qty", F.col("sum_qty_c") / F.lit(100.0) / F.col("n")
    )


def q_top_revenue_orders(spark, sf_dir):
    """3-way join + agg + top-k (broadcast the dimension side)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (
        l.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    g = j.groupBy("o_orderkey", F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_date_us")).agg(
        F.sum(rev).alias("revenue_c")
    )
    return g.orderBy(F.col("revenue_c").desc(), F.col("o_orderkey")).limit(10)


def q_events_tumbling(spark, sf_dir):
    """Tumbling 1h window aggregate — the batch analog of a streaming
    windowed agg (watermark-free: batch replay handles late data by LWW)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.unix_micros(F.date_trunc("hour", F.col("ts")).cast("timestamp")).alias("hour_us"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_CENTS_S(F.col("value"))).alias("value_cents"),
    )


def q_events_tumbling_stream(spark, sf_dir):
    """True-streaming twin of events_tumbling (streaming/windows.py family):
    readStream over the events dump -> watermarked tumbling window ->
    complete-mode drain. Single input file = one micro-batch, so nothing is
    late and the finalized result must equal the batch aggregation; the
    late-drop semantics themselves are pinned by tests/test_windows.py."""
    base = f"{WORK_ROOT}/tumbling/{uuid.uuid4().hex}"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    ev.coalesce(1).write.parquet(f"{base}/src")
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/src")
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(_CENTS_S(F.col("value"))).alias("value_cents"))
        .select(F.unix_micros(F.col("w.start")).alias("hour_us"),
                "event_type", "n", "value_cents")
    )
    q = (
        agg.writeStream
        .foreachBatch(lambda df, _e: df.write.mode("overwrite").parquet(f"{base}/out"))
        .outputMode("complete")
        .option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.read.parquet(f"{base}/out")


def q_events_stream_enrich(spark, sf_dir):
    """STREAM-STATIC broadcast enrichment — the remaining §2.C streaming
    join shape (stream-stream is events_stream_join): a readStream of
    change events joins a small static dimension (nation) that Spark
    broadcasts to every task, so the unbounded side never shuffles and no
    state store exists — the planner re-resolves the static side per
    micro-batch (the dim can be swapped between batches; here it is
    fixed, so the drained result must equal the batch join+agg). Complete
    mode keeps the per-nation aggregate finite without a watermark.
    At 10^10 events this is the canonical enrich pattern: the 25-row dim
    rides the closure, the binlog side stays partition-local."""
    base = f"{WORK_ROOT}/senrich/{uuid.uuid4().hex}"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "value")
    ev.coalesce(1).write.parquet(f"{base}/src")
    dim = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name")
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/src")
    enriched = stream.join(
        F.broadcast(dim), F.pmod(F.col("user_id"), F.lit(25)) == F.col("n_nationkey"))
    agg = (enriched.groupBy("n_name")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(_CENTS_S(F.col("value"))).alias("value_cents")))
    q = (
        agg.writeStream
        .foreachBatch(lambda df, _e: df.write.mode("overwrite").parquet(f"{base}/out"))
        .outputMode("complete")
        .option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.read.parquet(f"{base}/out")


def q_events_stream_join(spark, sf_dir):
    """Watermarked STREAM-STREAM interval join (streaming/stream_join.py):
    click->purchase attribution per user within 24h, both sides true
    streaming DataFrames. Single file per side = one micro-batch, so
    nothing is late and the drained append-mode output must equal the
    batch interval join; the watermark-eviction semantics themselves are
    pinned by tests/test_stream_join.py. State is O(rate x horizon),
    keyed on the high-cardinality user_id."""
    from .streaming.stream_join import interval_join

    base = f"{WORK_ROOT}/sjoin/{uuid.uuid4().hex}"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id",
        "event_type", "value")
    ev.filter("event_type = 'click'").select("user_id", "ts") \
        .coalesce(1).write.parquet(f"{base}/clicks")
    ev.filter("event_type = 'purchase'").select("user_id", "ts", "value") \
        .coalesce(1).write.parquet(f"{base}/purchases")
    clicks = spark.readStream.schema(
        "user_id long, ts timestamp").parquet(f"{base}/clicks")
    purchases = spark.readStream.schema(
        "user_id long, ts timestamp, value double").parquet(f"{base}/purchases")
    j = interval_join(clicks, purchases, key="user_id",
                      within="24 hours", watermark="1 hour")
    out = j.select(
        "user_id",
        F.unix_micros(F.col("L_ts")).alias("click_us"),
        F.unix_micros(F.col("R_ts")).alias("purchase_us"),
        _CENTS_S(F.col("R_value")).alias("value_cents"),
    )
    q = (
        out.writeStream
        .foreachBatch(lambda df, _e: df.write.mode("append")
                      .parquet(f"{base}/out"))
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.read.parquet(f"{base}/out")


_SQL_STREAM_JOIN = f"""
SELECT c.user_id AS user_id,
       epoch_us(c.ts) AS click_us,
       epoch_us(p.ts) AS purchase_us,
       {_cents_sql("p.value")} AS value_cents
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
"""


def q_events_stream_dedup(spark, sf_dir):
    """Streaming exactly-once dedup by event id
    (dropDuplicatesWithinWatermark): the source delivers EVERY event
    twice (an at-least-once upstream), the stream keeps per-id state
    bounded by the watermark, and the drained output must hold each event
    exactly once. A duplicate inside the state horizon dedups against
    state; one arriving after the watermark passed its event time is
    dropped as late — either way it never re-emits, which is the
    at-least-once -> exactly-once contract. State is O(rate x horizon),
    keyed on the high-cardinality event_id (skew-free by construction)."""
    base = f"{WORK_ROOT}/sdedup/{uuid.uuid4().hex}"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"), "event_id", "user_id",
        "event_type", "value")
    ev.coalesce(1).write.parquet(f"{base}/src")
    ev.coalesce(1).write.mode("append").parquet(f"{base}/src")  # dup feed
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/src")
    out = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
                "event_type", _CENTS_S(F.col("value")).alias("cents"))
    )
    q = (
        out.writeStream
        .foreachBatch(lambda df, _e: df.write.mode("append")
                      .parquet(f"{base}/out"))
        .outputMode("append")
        .option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return spark.read.parquet(f"{base}/out")


_SQL_STREAM_DEDUP = f"""
SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
       {_cents_sql('value')} AS cents
FROM events
"""


SESSION_GAP_US = 1_800_000_000  # 30 min


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization per user (lag + running sum of boundaries)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    by_t = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_s = F.when(
        F.lag("ts_us").over(by_t).isNull()
        | ((F.col("ts_us") - F.lag("ts_us").over(by_t)) > SESSION_GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts_us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = ev.withColumn("sid", F.sum(new_s).over(run))
    per_session = s.groupBy("user_id", "sid").agg(F.count(F.lit(1)).alias("n"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n").alias("max_session_events"),
    )


_SQL_SESSIONIZE = f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS p
  FROM events
), m AS (
  SELECT user_id, t, event_id,
         CASE WHEN p IS NULL OR t - p > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM o
), s AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
), g AS (SELECT user_id, sid, count(*) AS n FROM s GROUP BY 1, 2)
SELECT user_id, count(*) AS n_sessions, max(n) AS max_session_events
FROM g GROUP BY user_id
"""


def q_events_session_stream(spark, sf_dir):
    """True-streaming sessionization via Spark's NATIVE session_window
    (streaming/windows.py family; the batch twin events_sessionize builds
    the same islands with lag + running sum): readStream -> watermark ->
    groupBy(session_window(ts, 30 min), user_id) -> complete-mode drain,
    then a tiny batch rollup per user. Exact-boundary events (gap exactly
    30 min) MERGE in Spark's implementation — verified empirically — which
    is the same strict-> semantics as the lag-based oracle, so both twins
    share one oracle. At scale the session state store is keyed by
    (user_id, session), i.e. state is O(open sessions), not O(events)."""
    base = f"{WORK_ROOT}/sessions/{uuid.uuid4().hex}"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id")
    ev.coalesce(1).write.parquet(f"{base}/src")
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/src")
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"),
                 F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream
        .foreachBatch(lambda df, _e: df.select("user_id", "n")
                      .write.mode("overwrite").parquet(f"{base}/out"))
        .outputMode("complete")
        .option("checkpointLocation", f"{base}/ck")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    per_session = spark.read.parquet(f"{base}/out")
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n").alias("max_session_events"))


def q_events_asof(spark, sf_dir):
    """As-of join (SURVEY §2.C): each purchase attaches the most recent
    strictly-prior click/view of the same user — union-tag + one window,
    a single shuffle on user_id, no range explosion (operators/joins.py)."""
    from .operators.joins import asof_join

    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id")
    # unique (user, ts) on the right so the carried payload is deterministic
    right = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join(left, right, key="user_id", ts="ts_us",
                    right_payload=["event_id", "ts_us"], strict=True)
    return out.select(
        "event_id", "user_id", "ts_us",
        "prior_event_id",
        (F.col("ts_us") - F.col("prior_ts_us")).alias("gap_us"),
    )


_SQL_ASOF = """
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'purchase'),
     r AS (SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS event_id
           FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2),
     u AS (
       SELECT user_id, ts_us, 0 AS tag, event_id AS l_id,
              NULL::BIGINT AS r_id, NULL::BIGINT AS r_ts FROM l
       UNION ALL
       SELECT user_id, ts_us, 1 AS tag, NULL, event_id, ts_us FROM r
     ),
     c AS (
       SELECT *,
              last_value(r_id IGNORE NULLS) OVER w AS prior_event_id,
              last_value(r_ts IGNORE NULLS) OVER w AS prior_ts
       FROM u
       WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, tag
                    ROWS UNBOUNDED PRECEDING)
     )
SELECT l_id AS event_id, user_id, ts_us, prior_event_id,
       ts_us - prior_ts AS gap_us
FROM c WHERE tag = 0
"""


def q_events_asof_bucketed(spark, sf_dir):
    """Skew-robust two-phase as-of (operators/joins.py asof_join_bucketed):
    per-(key, day-bucket) last-payload summaries + carry-in window over
    buckets + intra-bucket union-tag pass — a hot key's events spread over
    as many tasks as it has buckets. Same answer, same oracle as
    events_asof."""
    from .operators.joins import asof_join_bucketed

    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id")
    right = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("event_id"))
    )
    out = asof_join_bucketed(left, right, key="user_id", ts="ts_us",
                             right_payload=["event_id", "ts_us"],
                             bucket_width=86_400_000_000, strict=True)
    return out.select(
        "event_id", "user_id", "ts_us",
        "prior_event_id",
        (F.col("ts_us") - F.col("prior_ts_us")).alias("gap_us"),
    )


RANGE_WINDOW_US = 600_000_000  # 10 min


def q_events_range_join(spark, sf_dir):
    """Banded interval join (SURVEY §2.C): events inside a 10-minute window
    after each error of the same user, joined via (user, time-band)
    equi-join + residual filter instead of a per-user cross product."""
    from .operators.joins import range_join_banded

    ev = _events(spark, sf_dir)
    intervals = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts_us").alias("lo"),
        (F.col("ts_us") + RANGE_WINDOW_US).alias("hi"),
    )
    points = ev.select("user_id", "ts_us", "event_id", "value")
    j = range_join_banded(points, intervals, key="user_id", point_ts="ts_us",
                          lo="lo", hi="hi", band_width=RANGE_WINDOW_US)
    return (
        j.filter(F.col("event_id") != F.col("error_id"))
        .groupBy("error_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_in_window"),
            F.sum(_CENTS_S(F.col("value"))).alias("value_cents"),
        )
    )


_SQL_RANGE_JOIN = f"""
WITH err AS (SELECT event_id AS error_id, user_id, epoch_us(ts) AS lo,
                    epoch_us(ts) + {RANGE_WINDOW_US} AS hi
             FROM events WHERE event_type = 'error'),
     p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events)
SELECT e.error_id, e.user_id, count(*) AS n_in_window,
       CAST(sum({_cents_sql("p.value")}) AS BIGINT) AS value_cents
FROM err e JOIN p ON p.user_id = e.user_id
                 AND p.ts_us >= e.lo AND p.ts_us < e.hi
                 AND p.event_id <> e.error_id
GROUP BY 1, 2
"""


def q_events_rollup(spark, sf_dir):
    """ROLLUP aggregation (SURVEY §2.C grouping sets): per (event_type, day)
    with per-type and grand-total subtotal rows, disambiguated by
    grouping_id — one pass, Catalyst expands to a single Expand+HashAgg."""
    ev = _events(spark, sf_dir)
    day = (F.col("ts_us") / F.lit(86_400_000_000)).cast("bigint")
    return (
        ev.withColumn("day", day)
        .rollup("event_type", "day")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(_CENTS_S(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("day", F.lit(-1)).alias("day"),
            "gid", "n", "value_cents",
        )
    )


_SQL_ROLLUP = f"""
WITH e AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day, value FROM events)
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(day, -1) AS day,
       CAST(GROUPING(event_type) * 2 + GROUPING(day) AS INTEGER) AS gid,
       count(*) AS n,
       CAST(sum({_cents_sql("value")}) AS BIGINT) AS value_cents
FROM e GROUP BY ROLLUP(event_type, day)
"""


def q_events_setops(spark, sf_dir):
    """Set operations (SURVEY §2.C): INTERSECT and EXCEPT (distinct) over
    user sets — Catalyst plans both as aggregates + left-semi/anti joins."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    errored = ev.filter(F.col("event_type") == "error").select("user_id")
    both = purchasers.intersect(errored).withColumn("tag", F.lit("both"))
    clean = purchasers.subtract(errored).withColumn("tag", F.lit("only_purchase"))
    return both.unionByName(clean)


_SQL_SETOPS = """
WITH p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
     e AS (SELECT user_id FROM events WHERE event_type = 'error')
SELECT user_id, 'both' AS tag FROM (SELECT * FROM p INTERSECT SELECT * FROM e)
UNION ALL
SELECT user_id, 'only_purchase' AS tag
FROM (SELECT * FROM p EXCEPT SELECT * FROM e)
"""


def q_events_cube(spark, sf_dir):
    """CUBE aggregation: all 4 grouping sets of (event_type, day) in one
    Expand+HashAgg pass, grouping_id-disambiguated."""
    ev = _events(spark, sf_dir)
    day = (F.col("ts_us") / F.lit(86_400_000_000)).cast("bigint")
    return (
        ev.withColumn("day", day)
        .cube("event_type", "day")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(_CENTS_S(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
            F.coalesce("day", F.lit(-1)).alias("day"),
            "gid", "n", "value_cents",
        )
    )


_SQL_CUBE = f"""
WITH e AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day, value FROM events)
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(day, -1) AS day,
       CAST(GROUPING(event_type) * 2 + GROUPING(day) AS INTEGER) AS gid,
       count(*) AS n,
       CAST(sum({_cents_sql("value")}) AS BIGINT) AS value_cents
FROM e GROUP BY CUBE(event_type, day)
"""


def q_events_running(spark, sf_dir):
    """Running-frame window: cumulative event count and cents per user in
    time order (ROWS UNBOUNDED PRECEDING), plus the previous event's type
    (lag) — the frame/offset window surface in one query."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id", "ts_us", "event_id",
        F.count(F.lit(1)).over(run).alias("n_so_far"),
        F.sum(_CENTS_S(F.col("value"))).over(run).alias("cents_so_far"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


_SQL_RUNNING = f"""
SELECT user_id, epoch_us(ts) AS ts_us, event_id,
       count(*) OVER w AS n_so_far,
       CAST(sum({_cents_sql("value")}) OVER w AS BIGINT) AS cents_so_far,
       lag(event_type) OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id) AS prev_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS UNBOUNDED PRECEDING)
"""


def q_events_funnel(spark, sf_dir):
    """Sequential event-pattern (funnel): earliest signup -> first click
    after it -> first purchase after that, per user. Each stage is a tiny
    keyed aggregate joined forward — no per-user sort of the full stream."""
    ev = _events(spark, sf_dir)

    def stage(etype, prev, prev_col):
        e = ev.filter(F.col("event_type") == etype)
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts_us").alias(prev_col))
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts_us") > F.col(prev.columns[-1]))
            .groupBy("user_id", *prev.columns[1:])
            .agg(F.min("ts_us").alias(prev_col))
        )

    sg = stage("signup", None, "signup_us")
    ck = stage("click", sg, "click_us")
    pr = stage("purchase", ck, "purchase_us")
    return pr.select(
        "user_id", "signup_us", "click_us", "purchase_us",
        (F.col("purchase_us") - F.col("signup_us")).alias("funnel_us"),
    )


_SQL_FUNNEL = """
WITH sg AS (SELECT user_id, min(epoch_us(ts)) AS signup_us
            FROM events WHERE event_type = 'signup' GROUP BY 1),
     ck AS (SELECT e.user_id, sg.signup_us, min(epoch_us(e.ts)) AS click_us
            FROM events e JOIN sg ON e.user_id = sg.user_id
            WHERE e.event_type = 'click' AND epoch_us(e.ts) > sg.signup_us
            GROUP BY 1, 2),
     pr AS (SELECT e.user_id, ck.signup_us, ck.click_us,
                   min(epoch_us(e.ts)) AS purchase_us
            FROM events e JOIN ck ON e.user_id = ck.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > ck.click_us
            GROUP BY 1, 2, 3)
SELECT user_id, signup_us, click_us, purchase_us,
       purchase_us - signup_us AS funnel_us
FROM pr
"""


def q_orders_above_avg(spark, sf_dir):
    """Correlated-aggregate pattern (decorrelated by hand the way Catalyst
    would): each order compared to its own customer's average order value —
    one keyed pre-aggregate joined back, no per-order subquery execution.
    The avg is a single division of identical bigint operands on both
    engines, so the doubles compare identically."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cents = _CENTS_S(F.col("o_totalprice"))
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(cents).alias("sum_c"), F.count(F.lit(1)).alias("n_orders"))
    avg = (F.col("sum_c") / F.col("n_orders"))
    j = o.select("o_custkey", cents.alias("c")).join(
        F.broadcast(per_cust), "o_custkey")
    return j.groupBy("o_custkey", "n_orders").agg(
        F.sum(F.when(F.col("c") > avg, 1).otherwise(0)).alias("n_above"))


_SQL_ABOVE_AVG = f"""
WITH per AS (
  SELECT o_custkey,
         CAST(sum({_cents_sql("o_totalprice")}) AS BIGINT) AS sum_c,
         count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT o.o_custkey, per.n_orders,
       CAST(sum(CASE WHEN {_cents_sql("o.o_totalprice")}
                          > per.sum_c / per.n_orders
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above
FROM orders o JOIN per ON o.o_custkey = per.o_custkey
GROUP BY 1, 2
"""


LATE_DAYS = 60


def q_orders_late_exists(spark, sf_dir):
    """TPC-H Q4 shape: orders having at least one lineitem shipped more than
    LATE_DAYS after the order date — a left-semi join (EXISTS), then a
    one-column aggregate."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), LATE_DAYS)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_late"))


_SQL_LATE_EXISTS = f"""
SELECT o_orderpriority, count(*) AS n_late
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_DAYS} DAY
)
GROUP BY 1
"""


def q_customers_no_orders(spark, sf_dir):
    """TPC-H Q22 shape: customers with NO urgent orders — a left-ANTI join
    (the same primitive the batch fence uses, SURVEY §2.C), then a
    per-segment aggregate. The priority filter is pushed into the orders
    scan before the anti join; both sides shuffle on the custkey only — at
    100 TB the anti join is bucket-co-partitioned with the customer table."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .filter(F.col("o_orderpriority") == "1-URGENT"))
    idle = c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_CENTS_S(F.col("c_acctbal"))).alias("acctbal_cents"),
    )


_SQL_NO_ORDERS = f"""
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum({_cents_sql("c_acctbal")}) AS BIGINT) AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY 1
"""


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1995-03-15"


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: top-10 undelivered-revenue orders for one market
    segment. The segment filter prunes customer BEFORE the join (Catalyst
    pushes it to the scan) and the pre-date orders slice joins lineitem on
    the shuffle key; the final top-k is a TakeOrderedAndProject, never a
    global sort."""
    c = (spark.read.parquet(f"{sf_dir}/customer.parquet")
         .filter(F.col("c_mktsegment") == Q3_SEGMENT).select("c_custkey"))
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .filter(F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp")))
    l = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .filter(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp")))
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_cents"))
        .select(
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("odate_us"),
            "o_orderpriority", "revenue_cents",
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_SQL_SHIPPING_PRIORITY = f"""
SELECT o_orderkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS odate_us,
       o_orderpriority,
       CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         AS revenue_cents
FROM customer, orders, lineitem
WHERE c_mktsegment = '{Q3_SEGMENT}' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '{Q3_DATE}' AND l_shipdate > DATE '{Q3_DATE}'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, o_orderkey LIMIT 10
"""


Q18_MIN_QTY = 150


def q_large_orders_having(spark, sf_dir):
    """TPC-H Q18 shape: orders whose TOTAL quantity exceeds a threshold
    (GROUP BY + HAVING over the fact table), then enriched with customer
    via join. The having-filtered key set is tiny, so Catalyst/AQE
    broadcast it into orders/customer — the fact table is aggregated once
    and never re-shuffled."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > Q18_MIN_QTY)
    )
    return (
        o.join(F.broadcast(big), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("odate_us"),
            _CENTS_S(F.col("o_totalprice")).alias("totalprice_cents"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(100)
    )


_SQL_LARGE_ORDERS = f"""
SELECT c_name, c_custkey, o_orderkey,
       epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS odate_us,
       {_cents_sql("o_totalprice")} AS totalprice_cents, total_qty
FROM (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY 1 HAVING total_qty > {Q18_MIN_QTY}
) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY total_qty DESC, o_orderkey LIMIT 100
"""


def q_events_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the general form behind rollup/cube): the
    exact set list ((event_type), (day), ()) — NOT a power set — in one
    Expand+HashAgg pass via Spark SQL, grouping_id-disambiguated."""
    ev = _events(spark, sf_dir)
    day = (F.col("ts_us") / F.lit(86_400_000_000)).cast("bigint")
    ev.withColumn("day", day).createOrReplaceTempView("gs_events")
    return spark.sql(f"""
        SELECT coalesce(event_type, '<all>') AS event_type,
               coalesce(day, -1) AS day,
               CAST(grouping_id(event_type, day) AS INT) AS gid,
               count(*) AS n,
               sum(CAST(round(value * 100) AS BIGINT)) AS value_cents
        FROM gs_events
        GROUP BY GROUPING SETS ((event_type), (day), ())
    """)


_SQL_GROUPING_SETS = f"""
WITH e AS (SELECT event_type,
                  epoch_us(ts) // 86400000000 AS day, value FROM events)
SELECT coalesce(event_type, '<all>') AS event_type,
       coalesce(day, -1) AS day,
       CAST(GROUPING(event_type) * 2 + GROUPING(day) AS INTEGER) AS gid,
       count(*) AS n,
       CAST(sum({_cents_sql("value")}) AS BIGINT) AS value_cents
FROM e GROUP BY GROUPING SETS ((event_type), (day), ())
"""


EXCLUDED_SUPPLIER_PCT = 10  # s_suppkey % 10 == 0 suppliers are "complaints"


def q_parts_distinct_suppliers(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier count per part group, excluding a
    supplier blacklist via NOT IN — written in SQL so Spark plans the
    null-aware anti join (a distinct physical operator from plain
    LeftAnti: it must track whether the subquery produced NULLs). The
    distinct-count is the Expand-based partial-distinct aggregate; the
    blacklist is broadcast (tiny). lineitem stands in for partsupp as the
    part<->supplier bridge (the driver corpus has no partsupp table)."""
    spark.read.parquet(f"{sf_dir}/part.parquet").createOrReplaceTempView("q16_part")
    spark.read.parquet(f"{sf_dir}/supplier.parquet").createOrReplaceTempView("q16_supplier")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("q16_lineitem")
    return spark.sql(f"""
        SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM q16_lineitem JOIN q16_part ON p_partkey = l_partkey
        WHERE p_size <= 25
          AND l_suppkey NOT IN (SELECT s_suppkey FROM q16_supplier
                                WHERE s_suppkey % {EXCLUDED_SUPPLIER_PCT} = 0)
        GROUP BY p_brand, p_type
    """)


_SQL_DISTINCT_SUPPLIERS = f"""
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_suppkey % {EXCLUDED_SUPPLIER_PCT} = 0)
GROUP BY p_brand, p_type
"""


PROMO_FROM = "1995-09-01"
PROMO_TO = "1995-10-01"


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation — promo revenue share of
    one month. One scan of the lineitem slice, part broadcast in, CASE
    folded into the same hash aggregate (no second pass). Ratio is the one
    final division of identical bigint operands, bit-equal on both
    engines."""
    l = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .filter((F.col("l_shipdate") >= F.lit(PROMO_FROM).cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit(PROMO_TO).cast("timestamp"))))
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_type")
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    agg = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type").startswith("PROMO"), rev)
                  .otherwise(F.lit(0))).alias("promo_cents"),
            F.sum(rev).alias("total_cents"),
        )
    )
    return agg.select(
        "promo_cents", "total_cents",
        (F.col("promo_cents") / F.col("total_cents")).alias("promo_share"),
    )


_SQL_PROMO = f"""
WITH a AS (
  SELECT
    CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
             THEN {_cents_sql("l_extendedprice * (1 - l_discount)")}
             ELSE 0 END) AS BIGINT) AS promo_cents,
    CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
      AS total_cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE l_shipdate >= DATE '{PROMO_FROM}' AND l_shipdate < DATE '{PROMO_TO}'
)
SELECT promo_cents, total_cents,
       promo_cents / total_cents AS promo_share FROM a
"""


Q11_REGION = 0
Q11_FRACTION = "0.0004"


def q_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: HAVING against a scalar subquery of the global
    total. The global total is a one-row aggregate broadcast-cross-joined
    back into the per-part aggregate — the distributed form of a scalar
    subquery (never a driver collect; the fact table is scanned once and
    the per-part aggregate reused for both sides at 100 TB)."""
    n = (spark.read.parquet(f"{sf_dir}/nation.parquet")
         .filter(F.col("n_regionkey") == Q11_REGION).select("n_nationkey"))
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey", "s_nationkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = (
        l.join(F.broadcast(s.join(F.broadcast(n),
                                  F.col("n_nationkey") == F.col("s_nationkey"))),
               F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(rev).alias("value_cents"))
        # both the scalar total and the output read this aggregate; without
        # a persist the 100 TB fact scan underneath runs TWICE
        .persist()
    )
    total = per_part.agg(F.sum("value_cents").alias("grand_cents"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") > F.col("grand_cents") * F.lit(Q11_FRACTION).cast("double"))
        .select(F.col("l_partkey").alias("partkey"), "value_cents")
    )


_SQL_IMPORTANT_PARTS = f"""
WITH pp AS (
  SELECT l_partkey AS partkey,
         CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
           AS value_cents
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_regionkey = {Q11_REGION}
  GROUP BY 1
)
SELECT partkey, value_cents FROM pp
WHERE value_cents > (SELECT CAST(sum(value_cents) AS BIGINT) FROM pp)
                    * CAST({Q11_FRACTION} AS DOUBLE)
"""


def q_nation_multi_distinct(spark, sf_dir):
    """Multiple DISTINCT aggregates in one GROUP BY (count(DISTINCT supp),
    count(DISTINCT part), plus a plain sum) — the Expand-based
    multi-distinct plan: one scan fans each row into one replica per
    distinct set, a single shuffle keyed (nation, gid), no N-pass rescan
    of the fact table."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey", "s_nationkey")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select("n_nationkey", "n_name")
    return (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(_CENTS_S(F.col("l_extendedprice"))).alias("gross_cents"),
        )
    )


_SQL_MULTI_DISTINCT = f"""
SELECT n_name,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       CAST(sum({_cents_sql("l_extendedprice")}) AS BIGINT) AS gross_cents
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
GROUP BY 1
"""


VOCAB_TOP = 50


def q_tok_histogram(spark, sf_dir):
    """Vocabulary statistics: token-frequency histogram over the derived
    token ids, top-N by count — explode + hash aggregate, the map-side-
    combinable shape (the full-vocab pass a tokenizer audit runs)."""
    t = _doc_tokens(spark, sf_dir)
    return (
        t.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(VOCAB_TOP)
    )


def _sql_tok_histogram() -> str:
    return f"""
    SELECT token, count(*) AS freq FROM (
      SELECT unnest({P.sql_word_ids('text')}) AS token FROM documents
    ) GROUP BY token ORDER BY freq DESC, token LIMIT {VOCAB_TOP}
    """


def q_emb_norm_stats(spark, sf_dir):
    """Per-label embedding norm range — vector stats via the portable
    fold-based dot/norm builders (order-fixed folds, so the doubles are
    bit-identical across engines; only order-independent aggregates)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = P.f_norm(F.col("embedding"))
    return e.groupBy("label").agg(
        F.min(n).alias("min_norm"),
        F.max(n).alias("max_norm"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


def _sql_emb_norm_stats() -> str:
    n = P.sql_norm("embedding")
    return f"""
    SELECT label, min({n}) AS min_norm, max({n}) AS max_norm,
           count(*) AS n_vecs
    FROM embeddings GROUP BY label
    """


def q_events_ranks(spark, sf_dir):
    """Rank-function family in one pass: row_number, rank, dense_rank and
    ntile over per-user spend (total order fixed by (cents desc, user_id)
    so every rank is deterministic). The global window runs over the
    PRE-AGGREGATED per-user rows, never the fact table; at 10^9 users the
    scale path is rangepartitioning + per-partition rank with offset
    correction (what Spark's global sort already does for the sort step)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spend = ev.groupBy("user_id").agg(
        F.sum(_CENTS_S(F.col("value"))).alias("cents"))
    w = Window.orderBy(F.col("cents").desc(), F.col("user_id"))
    return spend.select(
        "user_id", "cents",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


_SQL_RANKS = f"""
WITH s AS (SELECT user_id,
                  CAST(sum({_cents_sql("value")}) AS BIGINT) AS cents
           FROM events GROUP BY 1)
SELECT user_id, cents,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile
FROM s WINDOW w AS (ORDER BY cents DESC, user_id)
"""


def q_events_ranks_scalable(spark, sf_dir):
    """Same rank family as events_ranks, but through the distributed
    global-rank operator (operators/ranks.py): range-partition on the sort
    key -> per-partition ranks -> prefix-offset correction from a tiny
    per-partition summary. No single-partition window ever touches the
    data — the plan that survives 10^9 ranked rows (value-equal to the
    plain-window plan by construction; same DuckDB oracle)."""
    from .operators.ranks import global_ranks

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    spend = ev.groupBy("user_id").agg(
        F.sum(_CENTS_S(F.col("value"))).alias("cents"))
    return global_ranks(
        spend, order=[("cents", "desc"), ("user_id", "asc")], ntile=4
    ).select("user_id", "cents", "rn", "rnk", "drnk", "quartile")


def q_tok_epoch_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle — the training-order permutation for one
    epoch: order docs by a seeded hash (md5 of doc_id + epoch seed) and
    assign each its global position via the distributed rank operator
    (range-partition -> local ranks -> prefix offsets; no single-partition
    window ever sees the corpus). Same seed -> bit-identical order at any
    parallelism; next epoch = next seed. The reference has no ordering
    story at all (sink only)."""
    from .operators.ranks import global_ranks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat_ws("|", F.col("doc_id"), F.lit("epoch42")))
        .alias("shuffle_key"))
    return (global_ranks(keyed, order=[("shuffle_key", "asc")])
            .select("doc_id", "shuffle_key",
                    F.col("rn").cast("bigint").alias("epoch_pos")))


SAMPLE_RATES = {"en": 10, "de": 50, "fr": 50, "es": 50, "zh": 50}  # percent


def q_docs_sample(spark, sf_dir):
    """Deterministic stratified sampling for corpus balancing: keep-or-drop
    is a pure function of the doc id (md5-derived percent bucket), so the
    sample is reproducible across runs/engines and needs no global state —
    the property a 100 TB downsampling job needs (any worker decides any
    row independently; re-runs pick identical rows). Per-language rates
    downweight the dominant language."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10) \
         .cast("bigint") % 100
    rate = F.element_at(
        F.create_map(*[F.lit(x) for kv in SAMPLE_RATES.items() for x in kv]),
        F.col("lang"),
    )
    return (
        d.withColumn("bucket", h)
        .filter(F.col("bucket") < F.coalesce(rate, F.lit(0)))
        .select("doc_id", "lang", "bucket")
    )


def _sql_docs_sample() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in SAMPLE_RATES.items())
    return f"""
    SELECT doc_id, lang, bucket FROM (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
               AS bucket
      FROM documents
    ) WHERE bucket < CASE lang {whens} ELSE 0 END
    """


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(spark, sf_dir):
    """Pivot event_type into per-type count columns (explicit value list, so
    no extra distinct-values pass; one hash aggregate)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


_SQL_PIVOT = f"""
SELECT user_id,
       {", ".join(f"count(*) FILTER (event_type = '{t}') AS {t}"
                  for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup clustering: connected components (min-label propagation +
    pointer jumping, operators/dedupe.py) over the confirmed ngram-Jaccard
    pair graph — turns pairwise near-dups into keep/drop decisions even
    when similarity is not transitive (A~B, B~C, A!~C)."""
    from .operators.dedupe import neardup_components, ngram_jaccard_pairs

    d = _docs(spark, sf_dir)
    pairs = ngram_jaccard_pairs(d, threshold=0.5, k=MINHASH_K, n=SHINGLE_N,
                                bands=LSH_BANDS)
    return neardup_components(pairs.select("doc_a", "doc_b"),
                              d.select("doc_id"))


def _sql_clusters() -> str:
    # transitive closure by recursive CTE (UNION dedups -> terminates);
    # component id = min reachable doc_id. Small-graph oracle for the
    # distributed label-propagation result.
    return f"""
    WITH RECURSIVE
      pairs AS MATERIALIZED ({_sql_ngram_pairs()}),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
      ),
      reach(v, w) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.w
      )
    SELECT v AS doc_id, min(w) AS cluster_id FROM reach GROUP BY v
    """


def q_emb_dedup_clusters(spark, sf_dir):
    """Embedding near-dup CLUSTERS: the LSH-candidate pair graph
    (srp_neardup_pairs — equi-join candidates, exact-cosine confirm)
    folded into keep/drop components by distributed min-label propagation
    — the same composition dedup_clusters runs on text, closing the
    embedding leg of the dedup family (pairs alone don't decide keepers
    when A~B, B~C, A!~C). Singleton vectors are their own cluster."""
    from .operators.dedupe import neardup_components
    from .operators.similarity import srp_neardup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = srp_neardup_pairs(e, tau=EMB_TAU, planes=EMB_PLANES,
                              tables=EMB_TABLES).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    comp = neardup_components(pairs, e.select(F.col("vec_id").alias("doc_id")))
    return comp.select(F.col("doc_id").alias("vec_id"), "cluster_id")


def _sql_emb_clusters() -> str:
    # transitive closure of the SAME LSH-confirmed pair predicate the
    # Spark side uses (shared-bucket OR across the two SRP tables + exact
    # cosine >= tau) — component id = min reachable vec_id
    b0 = P.sql_srp_bucket("embedding", EMB_PLANES, 64, offset=0)
    b1 = P.sql_srp_bucket("embedding", EMB_PLANES, 64, offset=EMB_PLANES)
    cos = P.sql_cosine("a.embedding", "b.embedding")
    return f"""
    WITH RECURSIVE
      z AS MATERIALIZED (SELECT vec_id, embedding, {b0} AS b0, {b1} AS b1
                         FROM embeddings),
      pairs AS MATERIALIZED (
        SELECT a.vec_id AS va, b.vec_id AS vb
        FROM z a JOIN z b ON a.vec_id < b.vec_id
                         AND (a.b0 = b.b0 OR a.b1 = b.b1)
        WHERE {cos} >= {EMB_TAU}
      ),
      edges AS (
        SELECT va AS src, vb AS dst FROM pairs
        UNION ALL
        SELECT vb AS src, va AS dst FROM pairs
      ),
      reach(v, w) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.w
      )
    SELECT v AS vec_id, min(w) AS cluster_id FROM reach GROUP BY v
    """


QUALITY_MIN = 0.5

# q_text_pipeline persist gate: below this compressed-corpus size the
# multi-scan plan rides the page cache and beats the staged copy (sf0.1
# measurement, BENCH/PLANS.md); above it — the 100 TB regime — the single
# persisted scan replaces 4x corpus IO.
TEXT_PIPELINE_PERSIST_MIN_BYTES = 2 << 30
_TEXT_PIPELINE_CACHE: list = []  # at most one persisted corpus projection


def q_text_pipeline(spark, sf_dir):
    """End-to-end training-data filter pipeline: quality gate -> exact-dedup
    keepers -> drop near-dup losers (larger doc_id of any confirmed pair).
    The composition a 100 TB corpus clean actually runs, as one plan.

    The corpus projection is scanned ONCE and persisted: the pipeline's
    legs (quality/exact-dedup, minhash signatures, jaccard-confirm text
    fetch) would otherwise each rescan documents — 4x corpus IO at 100 TB
    for one pipeline. MEMORY_AND_DISK spills, so the materialization is a
    staged copy, not a memory bet; at full scale this is the same call a
    production clean makes (stage the pruned projection once, run every
    pass against it).

    The persist is GATED on corpus size (r4, VERDICT r3 #5): below
    TEXT_PIPELINE_PERSIST_MIN_BYTES the rescans ride the OS page cache
    and the staged copy's materialization costs MORE than it saves
    (measured at sf0.1: persisted 9.49 s vs 4-scan 8.35 s), so small
    corpora run the plain multi-scan plan; past the threshold — the only
    regime 100 TB ever sees — the single staged scan wins. The previous
    invocation's cache (if any) is released on entry, so a long-lived
    session holds at most one pipeline cache entry. Exact-dedup keeps
    the min doc per md5 via ONE window rank instead of groupBy +
    self-join — same result, one shuffle and no second pass."""
    import os as _os
    from urllib.parse import urlparse

    from pyspark.sql import Window

    from .operators.dedupe import ngram_jaccard_pairs

    while _TEXT_PIPELINE_CACHE:
        try:
            _TEXT_PIPELINE_CACHE.pop().unpersist()
        except Exception:
            pass  # cached frame's session already stopped — nothing to free
    d = _docs(spark, sf_dir).select("doc_id", "text")
    try:
        # metadata-only size probe: file listing, no data scan. A
        # non-local store (hdfs/s3 — the at-scale case) has no cheap
        # stat here; assume large and persist.
        parts = [urlparse(p) for p in d.inputFiles()]
        if all(u.scheme in ("file", "") for u in parts):
            corpus_bytes = sum(_os.path.getsize(u.path) for u in parts)
        else:
            corpus_bytes = TEXT_PIPELINE_PERSIST_MIN_BYTES + 1
    except Exception:
        corpus_bytes = TEXT_PIPELINE_PERSIST_MIN_BYTES + 1
    if corpus_bytes > TEXT_PIPELINE_PERSIST_MIN_BYTES:
        d = d.persist()
        _TEXT_PIPELINE_CACHE.append(d)
    q = d.withColumn("quality", P.f_quality(F.col("text"))).filter(
        F.col("quality") >= QUALITY_MIN)
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    exact = (q.withColumn("__rn", F.row_number().over(w))
             .filter(F.col("__rn") == 1)
             .select("doc_id", "text", "quality"))
    losers = ngram_jaccard_pairs(d, threshold=0.5, k=MINHASH_K, n=SHINGLE_N,
                                 bands=LSH_BANDS).select(
        F.col("doc_b").alias("doc_id")).distinct()
    out = exact.join(losers, "doc_id", "left_anti")
    return out.select(
        "doc_id",
        P.f_token_count(F.col("text")).alias("n_tok"),
        "quality",
        P.f_langid(F.col("text")).alias("lang_guess"),
    )


def _sql_text_pipeline() -> str:
    return f"""
    WITH q AS MATERIALIZED (
      SELECT doc_id, text, quality FROM (
        SELECT doc_id, text, {P.sql_quality('text')} AS quality FROM documents
      ) WHERE quality >= {QUALITY_MIN}
    ),
    keepers AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
    exact AS (SELECT q.* FROM q JOIN keepers USING (doc_id)),
    pairs AS ({_sql_ngram_pairs()}),
    losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
    SELECT doc_id, {P.sql_token_count('text')} AS n_tok, quality,
           {P.sql_langid('text')} AS lang_guess
    FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    """


def q_cdc_bucket_join(spark, sf_dir):
    """Storage-partitioned join (operators/spj.py; Iceberg SPJ / Spark
    bucketed-join analog — the reference's only join is the MERGE equi-join
    it ships to Databricks, DatabricksOutputConnection.java:180-232): two
    LakeTables co-bucketed on user_id join with ZERO data shuffle. The
    driver pairs each bucket's file groups (a metadata-only plan of
    n_buckets rows) and one Arrow task per bucket reads only its bucket's
    parquet and joins locally. At 100 TB the shuffle bytes of
    `fact JOIN fact` are the corpus itself; co-located layout makes them
    zero. Both the fast-path eligibility and the shuffle-free plan (the
    only Exchange moves the metadata rows) are asserted below; values must
    equal the plain SQL join of the two LWW halves."""
    from .operators.spj import bucket_join, spj_eligibility

    t_half, s_half = _halves(spark, sf_dir)
    cat = _fresh_catalog(spark, "bucket_join")
    lt = cat.create_table("t", STATE_SCHEMA, n_buckets=8,
                          bucket_key="user_id")
    rt = cat.create_table("s", STATE_SCHEMA, n_buckets=8,
                          bucket_key="user_id")
    lt.append(_lww(t_half))
    rt.append(_lww(s_half))
    assert spj_eligibility(lt, "user_id") is None
    assert spj_eligibility(rt, "user_id") is None
    out = bucket_join(
        lt, rt, on="user_id", how="inner", fallback=False,
        left_columns=["ts_us", "event_type", "value", "props"],
        right_columns=["ts_us", "event_type"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    if plan.count("Exchange") != 1 or "Join" in plan:
        raise RuntimeError(f"bucket join shuffled data:\n{plan}")
    return out


_SQL_BUCKET_JOIN = f"""
SELECT t.user_id, t.ts_us, t.event_type, t.value, t.props,
       s.ts_us AS ts_us_r, s.event_type AS event_type_r
FROM {_sql_lww("event_id % 2 = 0")} t
JOIN {_sql_lww("event_id % 2 = 1")} s ON t.user_id = s.user_id
"""


def q_cdc_bucket_anti(spark, sf_dir):
    """Zero-shuffle existence probe (operators/spj.py how='anti'): which
    keys of one co-bucketed LakeTable are absent from another — the fence
    / "which staged keys are new" question at table-vs-table scale. The
    ordinary plan shuffles the probing side's payload; the bucket plan
    reads each co-bucket pair locally, and the right side contributes
    nothing but its KEY column (every payload byte pruned at the parquet
    footer). Plan shape asserted: no join node, one metadata Exchange."""
    from .operators.spj import bucket_join

    t_half, s_half = _halves(spark, sf_dir)
    cat = _fresh_catalog(spark, "bucket_anti")
    lt = cat.create_table("t", STATE_SCHEMA, n_buckets=8,
                          bucket_key="user_id")
    rt = cat.create_table("s", STATE_SCHEMA, n_buckets=8,
                          bucket_key="user_id")
    lt.append(_lww(t_half))
    # right keeps a strict user subset so the anti result is non-empty
    rt.append(_lww(s_half.filter(s_half.user_id % 5 < 2)))
    out = bucket_join(lt, rt, on="user_id", how="anti", fallback=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    if plan.count("Exchange") != 1 or "Join" in plan:
        raise RuntimeError(f"bucket anti-join shuffled data:\n{plan}")
    return out


_SQL_BUCKET_ANTI = f"""
SELECT t.user_id, t.ts_us, t.event_type, t.value, t.props
FROM {_sql_lww("event_id % 2 = 0")} t
WHERE NOT EXISTS (
  SELECT 1 FROM {_sql_lww("event_id % 2 = 1 AND user_id % 5 < 2")} s
  WHERE s.user_id = t.user_id)
"""


def q_cdc_bucket_agg(spark, sf_dir):
    """Zero-shuffle GROUP BY on the bucket key (operators/spj.py
    bucket_agg): per-user history rollup over the full event log stored
    bucketed by user_id. At #groups ~ #rows (per-user / per-doc
    aggregates) the shuffled plan's partial aggregates ARE roughly the
    projected table; here each bucket aggregates locally in Acero and the
    only Exchange moves n_buckets metadata rows (asserted). Sums ride an
    integer cents column per the oracle portability rules."""
    from .operators.spj import bucket_agg

    ev = _events(spark, sf_dir)
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("cents", T.LongType()),
    ])
    tbl = _fresh_catalog(spark, "bucket_agg").create_table(
        "t", schema, n_buckets=8, bucket_key="user_id")
    tbl.append(ev.select("user_id", "ts_us", "event_type",
                         _CENTS_S(F.col("value")).alias("cents")))
    out = bucket_agg(
        tbl, ["user_id"],
        {"n": ("*", "count"), "total_cents": ("cents", "sum"),
         "first_ts": ("ts_us", "min"), "last_ts": ("ts_us", "max"),
         "n_types": ("event_type", "count_distinct")},
        fallback=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    if plan.count("Exchange") != 1 or "HashAggregate" in plan:
        raise RuntimeError(f"bucket agg shuffled data:\n{plan}")
    return out


_SQL_BUCKET_AGG = """
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       MIN(epoch_us(ts)) AS first_ts, MAX(epoch_us(ts)) AS last_ts,
       COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
"""


def q_cdc_snapshot_diff(spark, sf_dir):
    """Strategy-agnostic snapshot diff (CDC *out*): resolved state at v1 vs
    v2 full-outer-joined on the merge key, classified I/U/D — works across
    any mix of COW merges, overwrites, and compactions in the interval
    (unlike the physical changelog, which needs MOR delta files)."""
    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "snapshot_diff")
    tbl.append(_lww(t_half))
    v1 = tbl.current_version()
    s_half = s_half.withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U"))
    )
    merge_apply(tbl, _lww(s_half, extra=["op"]), keys=["user_id"],
                support_deletes=True)
    return tbl.diff(from_version=v1, keys=["user_id"])


def q_cdc_debezium_out(spark, sf_dir):
    """CDC round trip OUT of the lake (sources/debezium.py
    diff_to_debezium): the resolved-state diff of a table interval emitted
    as standard Debezium envelopes (true before/after images, key = merge
    key JSON, lsn = snapshot version), then consumed back through this
    engine's own parse_debezium exactly as a real connector topic would
    be — proving the feed is wire-complete. All JVM-side to_json/from_json;
    result = the interval's upsert/delete stream."""
    from .sources.debezium import diff_to_debezium, parse_debezium

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "debezium_out")
    tbl.append(_lww(t_half))
    v1 = tbl.current_version()
    s_half = s_half.withColumn(
        "op", F.when(F.col("event_type") == "error",
                     F.lit("D")).otherwise(F.lit("U")))
    merge_apply(tbl, _lww(s_half, extra=["op"]), keys=["user_id"],
                support_deletes=True)
    events = parse_debezium(
        diff_to_debezium(tbl, v1, keys=["user_id"]), STATE_SCHEMA)
    return events.select("op", "user_id", "ts_us", "event_type",
                         "value", "props")


_SQL_DEBEZIUM_OUT = f"""
WITH t AS (SELECT * FROM {_sql_lww("event_id % 2 = 0")}),
     s AS (SELECT * FROM {_sql_lww("event_id % 2 = 1", ", event_type = 'error' AS del")})
SELECT CASE WHEN s.del THEN 'D' ELSE 'U' END AS op,
       coalesce(s.user_id, t.user_id) AS user_id,
       CASE WHEN s.del THEN t.ts_us ELSE s.ts_us END AS ts_us,
       CASE WHEN s.del THEN t.event_type ELSE s.event_type END AS event_type,
       CASE WHEN s.del THEN t.value ELSE s.value END AS value,
       CASE WHEN s.del THEN t.props ELSE s.props END AS props
FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
WHERE s.user_id IS NOT NULL
  AND NOT (s.del AND t.user_id IS NULL)
  AND (s.del OR t.user_id IS NULL
       OR t.ts_us IS DISTINCT FROM s.ts_us
       OR t.event_type IS DISTINCT FROM s.event_type
       OR t.value IS DISTINCT FROM s.value
       OR t.props IS DISTINCT FROM s.props)
"""


_SQL_SNAPSHOT_DIFF = f"""
WITH t AS (SELECT * FROM {_sql_lww("event_id % 2 = 0")}),
     s AS (SELECT * FROM {_sql_lww("event_id % 2 = 1", ", event_type = 'error' AS del")})
SELECT CASE WHEN s.del THEN 'D'
            WHEN t.user_id IS NULL THEN 'I'
            ELSE 'U' END AS __op,
       coalesce(s.user_id, t.user_id) AS user_id,
       CASE WHEN s.del THEN t.ts_us ELSE s.ts_us END AS ts_us,
       CASE WHEN s.del THEN t.event_type ELSE s.event_type END AS event_type,
       CASE WHEN s.del THEN t.value ELSE s.value END AS value,
       CASE WHEN s.del THEN t.props ELSE s.props END AS props
FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
WHERE s.user_id IS NOT NULL
  AND NOT (s.del AND t.user_id IS NULL)
  AND (s.del OR t.user_id IS NULL
       OR t.ts_us IS DISTINCT FROM s.ts_us
       OR t.event_type IS DISTINCT FROM s.event_type
       OR t.value IS DISTINCT FROM s.value
       OR t.props IS DISTINCT FROM s.props)
"""


def q_cdc_change_feed(spark, sf_dir):
    """Write-time change data feed (Delta CDF analog, streaming/cdf.py):
    the merge itself persists its applied change rows — true I/U/D with
    old images — under cdf/v<N>, one atomic dir rename after the commit;
    consumers read O(batch) captured rows instead of diffing O(table)
    snapshots, falling back to diff() on any gap. The oracle re-derives
    the same change set from scratch (full outer join of the two states
    with old images), so both the capture's classification and its old
    values are value-checked."""
    from .streaming.cdf import apply_with_cdf, change_feed

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "change_feed")
    tbl.append(_lww(t_half))
    v1 = tbl.current_version()
    s_half = s_half.withColumn(
        "op", F.when(F.col("event_type") == "error",
                     F.lit("D")).otherwise(F.lit("U")))
    apply_with_cdf(tbl, _lww(s_half, extra=["op"]), keys=["user_id"])
    feed = change_feed(tbl, v1)
    if feed is None:
        raise RuntimeError("merge left a gap in its own change feed")
    return feed.select(
        "__op", *_STATE_COLS,
        "__old_ts_us", "__old_event_type", "__old_value", "__old_props")


_SQL_CHANGE_FEED = f"""
WITH t AS (SELECT * FROM {_sql_lww("event_id % 2 = 0")}),
     s AS (SELECT * FROM {_sql_lww("event_id % 2 = 1", ", event_type = 'error' AS del")})
SELECT CASE WHEN s.del THEN 'D'
            WHEN t.user_id IS NULL THEN 'I'
            ELSE 'U' END AS __op,
       coalesce(s.user_id, t.user_id) AS user_id,
       CASE WHEN s.del THEN t.ts_us ELSE s.ts_us END AS ts_us,
       CASE WHEN s.del THEN t.event_type ELSE s.event_type END AS event_type,
       CASE WHEN s.del THEN t.value ELSE s.value END AS value,
       CASE WHEN s.del THEN t.props ELSE s.props END AS props,
       t.ts_us AS __old_ts_us,
       t.event_type AS __old_event_type,
       t.value AS __old_value,
       t.props AS __old_props
FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
WHERE s.user_id IS NOT NULL
  AND NOT (s.del AND t.user_id IS NULL)
  AND (s.del OR t.user_id IS NULL
       OR t.ts_us IS DISTINCT FROM s.ts_us
       OR t.event_type IS DISTINCT FROM s.event_type
       OR t.value IS DISTINCT FROM s.value
       OR t.props IS DISTINCT FROM s.props)
"""


def q_cdc_changelog(spark, sf_dir):
    """Row-level change feed of a merge-on-read interval: the delta rows a
    downstream consumer replays as an upsert/delete stream — O(interval)
    IO, no table rescan (LakeTable.changelog; the physical counterpart of
    cdc_snapshot_diff's resolved-state diff)."""
    from .plans.merge import merge_apply_mor

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "changelog")
    tbl.append(_lww(t_half))
    v1 = tbl.current_version()
    s_half = s_half.withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U"))
    )
    merge_apply_mor(tbl, _lww(s_half, extra=["op"]), keys=["user_id"],
                    support_deletes=True)
    return tbl.changelog(since_version=v1).select(
        "user_id", "ts_us", "event_type", "value", "props", "__op")


_SQL_CHANGELOG = f"""
SELECT user_id, ts_us, event_type, value, props,
       CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS __op
FROM {_sql_lww("event_id % 2 = 1")}
"""


AGG_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("cents", T.LongType()),
    ]
)


def q_cdc_agg_maintenance(spark, sf_dir):
    """Incremental aggregate maintenance: a per-event_type rollup
    (n_rows, cents) is built ONCE from the initial table state, then kept
    in sync with a delete-bearing MERGE purely from the snapshot diff
    (streaming/aggmaint.py) — retract old / add new per changed key,
    O(changed keys) instead of a full GROUP-BY rescan per batch. The
    oracle recomputes the same rollup over the merged final state, so any
    drift between the maintained and recomputed aggregate fails the gate.
    Exercises group migration (a user's winning event_type changing moves
    its contribution between groups) and deletes (count decrements)."""
    from .streaming.aggmaint import maintain_agg

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "agg_maint_base")
    tbl.append(_lww(t_half))
    v1 = tbl.current_version()
    agg_tbl = _new_table(spark, "agg_maint_rollup", schema=AGG_SCHEMA,
                         n_buckets=4, bucket_key="event_type")
    agg_tbl.append(
        tbl.read().groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_CENTS_S(F.col("value"))).alias("cents")))
    s_half = s_half.withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U"))
    )
    merge_apply(tbl, _lww(s_half, extra=["op"]), keys=["user_id"],
                support_deletes=True)
    maintain_agg(tbl, agg_tbl, since_version=v1, keys=["user_id"],
                 group_cols=["event_type"],
                 measures={"cents": ("value", _CENTS_S)})
    return agg_tbl.read().select("event_type", "n_rows", "cents")


_SQL_AGG_MAINT = f"""
WITH f AS ({_sql_merge(_UPSERT_COLS,
                       where="WHERE NOT (s.user_id IS NOT NULL AND s.event_type = 'error')")})
SELECT event_type, COUNT(*) AS n_rows,
       CAST(SUM({_cents_sql('value')}) AS BIGINT) AS cents
FROM f GROUP BY 1
"""


TOKHIST_BASE = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ]
)


def q_cdc_token_histogram(spark, sf_dir):
    """Incrementally-maintained token-frequency histogram
    (streaming/tokmaint.py): the vocabulary stats table is seeded ONCE from
    the initial corpus state, then a CDC batch edits/deletes documents and
    the histogram advances purely from the snapshot diff — retract the old
    array's counts, add the new array's, net per token, O(batch tokens)
    instead of the full explode+GROUP BY rescan (tok_histogram's shape).
    The batch exercises every maintenance path: deletes drain token counts
    (zero deletes the group), edits shift counts between tokens, and the
    +1000000 remap mints token ids outside the seeded vocabulary (brand-new
    groups through the MERGE). The oracle recomputes the histogram over the
    final merged corpus, so any drift fails the gate."""
    from .streaming.tokmaint import ensure_token_histogram, sync_token_histogram

    d = _docs(spark, sf_dir).select(
        "doc_id",
        P.f_word_ids(F.col("text")).alias("tokens"),
        (F.length("text") % 3).alias("m3"),
    )
    cat = _fresh_catalog(spark, "tok_hist")
    base = cat.create_table("t", TOKHIST_BASE, n_buckets=8, bucket_key="doc_id")
    base.append(d.select("doc_id", "tokens"))
    hist = ensure_token_histogram(cat, base, "hist")
    staged = d.filter(F.col("m3") != 2).select(
        "doc_id",
        F.when(
            F.col("m3") == 1,
            F.transform(F.slice("tokens", 1, 16), lambda x: x + F.lit(1000000)),
        ).otherwise(F.col("tokens")).alias("tokens"),
        F.when(F.col("m3") == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    merge_apply(base, staged, keys=["doc_id"], support_deletes=True)
    sync_token_histogram(base, hist, keys=["doc_id"])
    return hist.read().select("token", "n_rows")


def _sql_token_histogram() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {P.sql_word_ids('text')} AS tokens,
             length(text) % 3 AS m3
      FROM documents
    ), final AS (
      SELECT CASE WHEN m3 = 1
                  THEN list_transform(tokens[1:16], x -> x + 1000000)
                  ELSE tokens END AS tokens
      FROM toks WHERE m3 <> 0
    )
    SELECT token, count(*) AS n_rows
    FROM (SELECT unnest(tokens) AS token FROM final)
    GROUP BY token
    """


def q_cdc_inverted_index(spark, sf_dir):
    """Incrementally-maintained EXACT inverted token index
    (streaming/invindex.py): postings (token, doc_id) seeded once from the
    corpus, then a CDC batch (deletes + token remaps) advances them purely
    from the change feed — presence transitions, O(changed postings), the
    tokens a document keeps write nothing. The index table IS the search
    structure (bucketed + write-sorted + bloom-indexed on token); the
    probe for the 5 smallest remapped token ids must file-skip (asserted)
    and return exactly the final corpus's postings for those tokens —
    IO O(posting lists), never O(corpus). Complements cdc_token_lookup
    (probabilistic bloom scan) and cdc_token_histogram (counts, no doc
    identity)."""
    from .streaming.invindex import (
        ensure_inverted_index,
        probe,
        sync_inverted_index,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id",
        P.f_word_ids(F.col("text")).alias("tokens"),
        (F.length("text") % 3).alias("m3"),
    )
    cat = _fresh_catalog(spark, "inv_idx")
    base = cat.create_table("t", TOKHIST_BASE, n_buckets=8, bucket_key="doc_id")
    base.append(d.select("doc_id", "tokens"))
    idx = ensure_inverted_index(cat, base, "idx", keys=["doc_id"],
                                rows_per_file=2000)
    staged = d.filter(F.col("m3") != 2).select(
        "doc_id",
        F.when(
            F.col("m3") == 1,
            F.transform(F.slice("tokens", 1, 16), lambda x: x + F.lit(1000000)),
        ).otherwise(F.col("tokens")).alias("tokens"),
        F.when(F.col("m3") == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    merge_apply(base, staged, keys=["doc_id"], support_deletes=True)
    sync_inverted_index(base, idx, keys=["doc_id"])
    toks = [r["token"] for r in
            idx.read().filter(F.col("token") >= 1000000)
            .select("token").distinct().orderBy("token").limit(5).collect()]
    st = idx.scan_stats(eq_filter={"token": toks})
    assert st["files_read"] < st["files_live"], "probe enabled no skipping"
    return probe(idx, toks, keys=["doc_id"])


def _sql_inverted_index() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, {P.sql_word_ids('text')} AS tokens,
             length(text) % 3 AS m3
      FROM documents
    ), final AS (
      SELECT doc_id,
             CASE WHEN m3 = 1
                  THEN list_transform(tokens[1:16], x -> x + 1000000)
                  ELSE tokens END AS tokens
      FROM toks WHERE m3 <> 0
    ), posts AS (
      SELECT DISTINCT doc_id, token
      FROM (SELECT doc_id, unnest(tokens) AS token FROM final)
    ), pr AS (
      SELECT DISTINCT token FROM posts WHERE token >= 1000000
      ORDER BY token LIMIT 5
    )
    SELECT p.token AS token, p.doc_id AS doc_id
    FROM posts p JOIN pr USING (token)
    """


def q_cdc_stream_tail(spark, sf_dir):
    """End-to-end Structured Streaming CDC: the events table rendered as a
    binlog directory, tailed with readStream -> every micro-batch through
    the SAME fenced LWW+MERGE path (streaming/tail.py foreachBatch), final
    table read back. Exactly-once comes from the engine's fence, not
    Spark's WAL; the oracle is the global LWW state with delete semantics."""
    from .schema import BINLOG_SCHEMA
    from .streaming.tail import tail_binlog_dir

    base = f"{WORK_ROOT}/stream_tail/{uuid.uuid4().hex}"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    binlog = ev.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("seq_lsn"),
        F.lit(0).cast("long").alias("batch_id"),  # stream assigns epoch ids
        F.when(F.col("event_type") == "error", F.lit("D"))
         .otherwise(F.lit("U")).alias("op"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.array(_CENTS_S(F.col("value")).cast("int")).alias("tokens"),
        F.lit(1).cast("int").alias("n_tok"),
        F.col("event_type").alias("source"),
        F.col("event_id").cast("string").alias("event_id"),
    )
    # two lsn-ordered slices -> two fenced epochs applied in order
    for part, cond in (("part0", F.dayofmonth("ts") <= 15),
                       ("part1", F.dayofmonth("ts") > 15)):
        binlog.filter(cond).select(*[f.name for f in BINLOG_SCHEMA.fields]) \
            .coalesce(1).write.parquet(f"{base}/binlog/{part}")
    cat = _fresh_catalog(spark, "stream_tail")
    cfg = JobConfig(table="t", mode="merge", merge_keys=["doc_id"], n_buckets=8)
    driver = ReplayDriver(cat, cfg)
    q = tail_binlog_dir(spark, f"{base}/binlog/part*", driver,
                        f"{base}/ckpt", max_files_per_trigger=1)
    _drain(q)
    # harness-safe projection (see q_tok_derive): token-array equality is
    # checked through the fingerprint, not the raw list column
    return driver.table.read().select(
        "doc_id", P.f_tokens_fingerprint(F.col("tokens")).alias("tok_fp"),
        "n_tok", "source")


_SQL_STREAM_TAIL = f"""
SELECT CAST(user_id AS VARCHAR) AS doc_id,
       {P.sql_tokens_fingerprint('[CAST(round(value * 100) AS INTEGER)]')} AS tok_fp,
       1 AS n_tok,
       event_type AS source
FROM (
  SELECT user_id, value, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts) DESC,
                                     CAST(event_id AS VARCHAR) DESC) AS rn
  FROM events
) WHERE rn = 1 AND event_type <> 'error'
"""


FRAME_EVERY = 10


def q_media_frames(spark, sf_dir):
    """Video frame sampling: decode kernel -> JVM explode over every-Nth
    frame index (each sampled frame would feed a downstream decode kernel;
    the explode is the partition-preserving fan-out that matters at scale)."""
    from .operators.media import decode_media, frame_sample, media_from_docs

    decoded = decode_media(media_from_docs(_docs(spark, sf_dir)))
    return frame_sample(decoded, every=FRAME_EVERY)


def _sql_media_frames() -> str:
    # n_frames = 1 + int(md5[8:10], 16) % 64, video kind = doc_id % 3 == 2
    return f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             CAST(1 + {_sql_hexint('text', 9, 2)} % 64 AS INTEGER) AS n_frames
      FROM documents WHERE (['image', 'audio', 'video'])[(doc_id % 3) + 1] = 'video'
    )
    SELECT media_id,
           CAST(unnest(range(0, n_frames, {FRAME_EVERY})) AS INTEGER) AS frame_idx
    FROM m
    """


SLIDE_US, WINDOW_US = 1_800_000_000, 3_600_000_000  # 30 min slide, 1 h window


def q_events_sliding(spark, sf_dir):
    """Sliding-window aggregate (1h window / 30min slide): each event lands
    in window_us/slide_us = 2 overlapping windows — Spark's window()
    generator expands rows before one hash aggregate."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(_CENTS_S(F.col("value"))).alias("value_cents"))
        .select(F.unix_micros(F.col("w.start")).alias("start_us"),
                "event_type", "n", "value_cents")
    )


_SQL_SLIDING = f"""
WITH e AS (SELECT epoch_us(ts) AS t, event_type, value FROM events),
     x AS (
       SELECT (t // {SLIDE_US} - k) * {SLIDE_US} AS start_us, event_type, value
       FROM e, range(0, {WINDOW_US // SLIDE_US}) r(k)
       WHERE t < (t // {SLIDE_US} - k) * {SLIDE_US} + {WINDOW_US}
     )
SELECT start_us, event_type, count(*) AS n,
       CAST(sum({_cents_sql("value")}) AS BIGINT) AS value_cents
FROM x GROUP BY 1, 2
"""


def q_events_quantiles(spark, sf_dir):
    """Exact interpolated percentiles per group over integerized cents —
    Spark percentile() and DuckDB quantile_cont share the
    lower + (upper-lower)*frac formula, so doubles match bit-for-bit."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    c = _CENTS_S(F.col("value"))
    return ev.groupBy("event_type").agg(
        F.percentile(c, 0.25).alias("p25"),
        F.percentile(c, 0.5).alias("p50"),
        F.percentile(c, 0.75).alias("p75"),
        F.percentile(c, 0.95).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


_SQL_QUANTILES = f"""
WITH e AS (SELECT event_type, {_cents_sql("value")} AS c FROM events)
SELECT event_type,
       quantile_cont(c, 0.25) AS p25, quantile_cont(c, 0.5) AS p50,
       quantile_cont(c, 0.75) AS p75, quantile_cont(c, 0.95) AS p95,
       count(*) AS n
FROM e GROUP BY 1
"""


def q_regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join where customer and supplier must share a
    nation — dims broadcast down the chain, one shuffle for the final agg."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (
        l.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("r_name", "n_name").agg(
        F.sum(rev).alias("revenue_c"),
        F.count(F.lit(1)).alias("n_items"),
    )


_SQL_REGIONAL = f"""
SELECT r_name, n_name,
       CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         AS revenue_c,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


def q_top_supplier_per_nation(spark, sf_dir):
    """Per-group top-1 (argmax) via max_by over a pre-aggregate: revenue per
    supplier first (cheap partial agg), then one row per nation — no window
    over the fact table, so no giant sort at scale."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_supp = l.groupBy("l_suppkey").agg(F.sum(rev).alias("rev_c"))
    j = per_supp.join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey")).join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    # deterministic argmax: order by (rev, suppkey) as a packed struct
    return j.groupBy("n_name").agg(
        F.max_by(
            F.struct(F.col("s_suppkey").alias("top_suppkey"),
                     F.col("s_name").alias("top_supplier"),
                     F.col("rev_c").alias("top_revenue_c")),
            F.struct(F.col("rev_c"), F.col("s_suppkey")),
        ).alias("t"),
    ).select("n_name", "t.top_suppkey", "t.top_supplier", "t.top_revenue_c")


_SQL_TOP_SUPPLIER = f"""
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
           AS rev_c
  FROM lineitem GROUP BY 1
)
SELECT n_name, s_suppkey AS top_suppkey, s_name AS top_supplier,
       rev_c AS top_revenue_c
FROM (
  SELECT n_name, s_suppkey, s_name, rev_c,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY rev_c DESC, s_suppkey DESC) AS rn
  FROM per_supp
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
) WHERE rn = 1
"""


VOLUME_NATIONS = ("NATION_1", "NATION_2")


def q_nation_pair_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between a nation PAIR in both
    directions — the supplier and customer legs each resolve through their
    own broadcast copy of `nation` (self-join of a dimension under two
    roles), filtered to the pair BEFORE the fact join so the fact rows
    that can't contribute never enter the shuffle; one hash agg by
    (supp_nation, cust_nation, year)."""
    a, b = VOLUME_NATIONS
    l = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(F.col("n_name").isin(a, b))
    su = (spark.read.parquet(f"{sf_dir}/supplier.parquet")
          .join(F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                                     F.col("n_name").alias("supp_nation"))),
                F.col("s_nationkey") == F.col("sn_key")))
    c = (spark.read.parquet(f"{sf_dir}/customer.parquet")
         .join(F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"),
                                    F.col("n_name").alias("cust_nation"))),
               F.col("c_nationkey") == F.col("cn_key")))
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (l.join(F.broadcast(su.select("s_suppkey", "supp_nation")),
                F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(c.select("c_custkey", "cust_nation")),
               F.col("o_custkey") == F.col("c_custkey"))
         .filter(F.col("supp_nation") != F.col("cust_nation")))
    return j.groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year")).agg(
        F.sum(rev).alias("revenue_c"))


_SQL_NATION_PAIR = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         AS revenue_c
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('{VOLUME_NATIONS[0]}', '{VOLUME_NATIONS[1]}')
  AND n2.n_name IN ('{VOLUME_NATIONS[0]}', '{VOLUME_NATIONS[1]}')
  AND n1.n_name <> n2.n_name
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY 1, 2, 3
"""


def q_profit_by_nation(spark, sf_dir):
    """TPC-H Q9 shape: profit by (supplier nation, order year) for parts
    whose name matches a substring — the LIKE filter prunes `part` to a
    small broadcast side and cascades: only matching partkeys survive the
    fact join, so the wide orders join sees a pre-filtered fact stream."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = (spark.read.parquet(f"{sf_dir}/part.parquet")
         .filter(F.col("p_name").contains("red")).select("p_partkey"))
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey", "s_nationkey")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_orderdate")
    amount = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
         .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey")))
    return j.groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(amount).alias("profit_c"))


_SQL_PROFIT_NATION = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         AS profit_c
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


RETURNED_FROM, RETURNED_TO = "1996-01-01", "1996-04-01"


def q_returned_customers(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in one
    quarter. The quarter filter lands on `orders` (partition-prunable at
    scale), returnflag on the fact scan; agg keyed on the customer tuple,
    then a global top-k via orderBy+limit (Spark plans TakeOrderedAndProject
    — no full sort materialization)."""
    l = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .filter(F.col("l_returnflag") == "R"))
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .filter((F.col("o_orderdate") >= F.lit(RETURNED_FROM).cast("timestamp"))
                 & (F.col("o_orderdate") < F.lit(RETURNED_TO).cast("timestamp")))
         .select("o_orderkey", "o_custkey"))
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (l.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
         .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")))
    g = j.groupBy("c_custkey", "c_name", "n_name",
                  _CENTS_S(F.col("c_acctbal")).alias("acctbal_c")).agg(
        F.sum(rev).alias("revenue_c"))
    return g.orderBy(F.col("revenue_c").desc(), F.col("c_custkey")).limit(20)


_SQL_RETURNED = f"""
SELECT c_custkey, c_name, n_name,
       {_cents_sql("c_acctbal")} AS acctbal_c,
       CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         AS revenue_c
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= DATE '{RETURNED_FROM}' AND o_orderdate < DATE '{RETURNED_TO}'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_c DESC, c_custkey
LIMIT 20
"""


def q_customer_order_counts(spark, sf_dir):
    """TPC-H Q13 shape: distribution of customers by order count — LEFT
    OUTER join so zero-order customers survive with c_count 0, the filter
    living in the JOIN CONDITION (not WHERE, which would turn the outer
    join inner); then a second, tiny aggregation over the per-customer
    counts. Two shuffles total, the second over ~#distinct-counts rows."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .filter(F.col("o_orderpriority") != "1-URGENT")
         .select("o_custkey", "o_orderkey"))
    per_cust = (c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_SQL_CUSTDIST = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


SMALLQTY_BRAND = "Brand#23"


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from orders below 1/5 of the part's average
    quantity. The correlated scalar subquery decorrelates into a per-part
    pre-aggregate joined back to the fact — and the threshold compare is
    kept in INTEGERS (5*qty*cnt < sum_qty, exact because quantities are
    integral) so both engines agree at the boundary bit-for-bit."""
    p = (spark.read.parquet(f"{sf_dir}/part.parquet")
         .filter(F.col("p_brand") == SMALLQTY_BRAND).select("p_partkey"))
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lp = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    per_part = lp.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt_qty"))
    j = lp.join(F.broadcast(per_part), F.col("l_partkey") == F.col("a_partkey"))
    small = j.filter(
        F.lit(5) * F.col("l_quantity").cast("long") * F.col("cnt_qty")
        < F.col("sum_qty"))
    return small.agg(
        F.sum(_CENTS_S(F.col("l_extendedprice"))).alias("revenue_c"),
        F.count(F.lit(1)).alias("n_lines"))


_SQL_SMALLQTY = f"""
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{SMALLQTY_BRAND}'
), pp AS (
  SELECT l_partkey AS a_partkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         count(*) AS cnt_qty
  FROM lp GROUP BY 1
)
SELECT CAST(sum({_cents_sql("l_extendedprice")}) AS BIGINT) AS revenue_c,
       count(*) AS n_lines
FROM lp JOIN pp ON l_partkey = a_partkey
WHERE 5 * CAST(l_quantity AS BIGINT) * cnt_qty < sum_qty
"""


def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: three OR'd conjunction branches mixing part and
    lineitem predicates. Written as one boolean expression over the joined
    row — Catalyst extracts the common `p_partkey = l_partkey` equi-key
    (no cartesian) and pushes the per-table halves of each branch below
    the join via CNF conversion; one scan each side, zero extra passes."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    j = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    qty = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 5))
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 10))
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 15))
           & qty.between(20, 30)))
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return j.filter(branch).agg(F.sum(rev).alias("revenue_c"),
                                F.count(F.lit(1)).alias("n_lines"))


_SQL_DISJUNCTIVE = f"""
SELECT CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         AS revenue_c,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_lonely_supplier_returns(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who are the SOLE supplier with returned
    ('R') lines on multi-supplier orders — a correlated EXISTS (another
    supplier participated) plus a correlated NOT EXISTS (no OTHER supplier
    had returns). Expressed in SQL so Spark plans the pair as left-semi +
    null-safe left-anti joins on l_orderkey (the subqueries decorrelate;
    no per-row re-execution), then counts per supplier with a global
    top-20."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("q21_l")
    spark.read.parquet(f"{sf_dir}/supplier.parquet").createOrReplaceTempView("q21_s")
    return spark.sql("""
        SELECT s_name, count(*) AS numwait
        FROM q21_l l1 JOIN q21_s ON s_suppkey = l1.l_suppkey
        WHERE l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM q21_l l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM q21_l l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """)


_SQL_LONELY_SUPPLIER = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no URGENT
    orders — a scalar subquery (global positive-balance average, one
    broadcast row) gating a NOT EXISTS anti join, aggregated per market
    segment. The average compare is kept in exact integers (cents * count
    vs sum-of-cents) so the boundary is engine-independent."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"))
    cents = _CENTS_S(F.col("c_acctbal"))
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("bal_sum"), F.count(F.lit(1)).alias("bal_cnt"))
    # c_acctbal_cents > sum/cnt  <=>  cents*cnt > sum  (exact bigint compare)
    rich = (c.withColumn("bal_c", cents)
            .crossJoin(F.broadcast(pos))
            .filter(F.col("bal_c") * F.col("bal_cnt") > F.col("bal_sum")))
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal_c").alias("totacctbal_c"))


_SQL_IDLE_RICH = f"""
WITH pos AS (
  SELECT CAST(sum({_cents_sql("c_acctbal")}) AS BIGINT) AS bal_sum,
         count(*) AS bal_cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment, count(*) AS numcust,
       CAST(sum({_cents_sql("c_acctbal")}) AS BIGINT) AS totacctbal_c
FROM customer, pos
WHERE {_cents_sql("c_acctbal")} * bal_cnt > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + filter + global agg — the pushdown
    showcase. All three predicates (ship year, discount band, quantity cap)
    reach the parquet reader as PushedFilters, so row groups outside the
    year never decompress; the discount band is compared on integerized
    hundredths (round(d*100)) so the boundary is engine-independent."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc_pct = F.round(F.col("l_discount") * 100).cast("int")
    f = l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 24))
    f = f.filter(disc_pct.between(5, 7))
    return f.agg(
        F.sum(_CENTS_S(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue_c"),
        F.count(F.lit(1)).alias("n_lines"))


_SQL_FORECAST = f"""
SELECT CAST(sum({_cents_sql("l_extendedprice * l_discount")}) AS BIGINT)
         AS revenue_c,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_quantity < 24
  AND CAST(round(l_discount * 100) AS INT) BETWEEN 5 AND 7
"""


MINCOST_SIZE = 15
MINCOST_REGION = "EUROPE"


def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: per-part MIN-cost supplier within one region. The
    correlated `cost = (SELECT min(cost) …)` subquery decorrelates into a
    per-part pre-aggregate equi-joined back to the eligible supply rows —
    two hash aggs + one join instead of a per-row re-execution. The supply
    relation is derived from lineitem (this corpus has no partsupp):
    cost(part, supplier) = MIN line price in cents, exact integers so the
    min-equality boundary is bit-identical across engines. Region filter
    runs on the supplier dimension BEFORE the supply agg joins it, so
    out-of-region suppliers never reach the min."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = (spark.read.parquet(f"{sf_dir}/part.parquet")
         .filter(F.col("p_size") == MINCOST_SIZE).select("p_partkey"))
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = (spark.read.parquet(f"{sf_dir}/region.parquet")
         .filter(F.col("r_name") == MINCOST_REGION))
    region_supp = (su.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
                   .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
                   .select("s_suppkey", "s_name", "n_name"))
    supply = (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
              .groupBy("l_partkey", "l_suppkey")
              .agg(F.min(_CENTS_S(F.col("l_extendedprice"))).alias("cost_c")))
    eligible = supply.join(F.broadcast(region_supp),
                           F.col("l_suppkey") == F.col("s_suppkey"))
    mincost = eligible.groupBy(F.col("l_partkey").alias("m_partkey")).agg(
        F.min("cost_c").alias("min_cost_c"))
    return (eligible.join(F.broadcast(mincost),
                          (F.col("l_partkey") == F.col("m_partkey"))
                          & (F.col("cost_c") == F.col("min_cost_c")))
            .select(F.col("l_partkey").alias("p_partkey"),
                    F.col("l_suppkey").alias("s_suppkey"),
                    "s_name", "n_name", "cost_c"))


_SQL_MINCOST = f"""
WITH region_supp AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{MINCOST_REGION}'
), supply AS (
  SELECT l_partkey, l_suppkey,
         CAST(min({_cents_sql("l_extendedprice")}) AS BIGINT) AS cost_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size = {MINCOST_SIZE}
  GROUP BY 1, 2
), eligible AS (
  SELECT l_partkey, l_suppkey, s_name, n_name, cost_c
  FROM supply JOIN region_supp ON l_suppkey = s_suppkey
)
SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey, s_name, n_name, cost_c
FROM eligible e
WHERE cost_c = (SELECT min(cost_c) FROM eligible m
                WHERE m.l_partkey = e.l_partkey)
"""


SHARE_NATION = "NATION_3"
SHARE_REGION = "AMERICA"


def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part market
    per order year — the dimension `nation` appears under TWO roles
    (customer's region membership vs supplier's identity). Both legs
    broadcast; the share's numerator is a conditional sum inside the same
    hash agg as the denominator (no second pass); cents-integer sums make
    the division inputs exact, so the double ratio is reproducible."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = (spark.read.parquet(f"{sf_dir}/region.parquet")
         .filter(F.col("r_name") == SHARE_REGION))
    p = (spark.read.parquet(f"{sf_dir}/part.parquet")
         .filter(F.col("p_type") == "PROMO").select("p_partkey"))
    region_cust = (c.join(F.broadcast(
                       n.select("n_nationkey", "n_regionkey")),
                       F.col("c_nationkey") == F.col("n_nationkey"))
                   .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
                   .select("c_custkey"))
    supp_nation = su.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key")).select("s_suppkey", "supp_nation")
    o2 = (o.filter((F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                   & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
          .join(region_cust, F.col("o_custkey") == F.col("c_custkey"))
          .select("o_orderkey", F.year("o_orderdate").alias("o_year")))
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = (l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
         .join(o2, F.col("l_orderkey") == F.col("o_orderkey"))
         .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey")))
    agg = j.groupBy("o_year").agg(
        F.sum(F.when(F.col("supp_nation") == SHARE_NATION, rev).otherwise(F.lit(0))
              ).alias("nation_rev_c"),
        F.sum(rev).alias("total_rev_c"))
    return agg.select(
        "o_year", "nation_rev_c", "total_rev_c",
        (F.col("nation_rev_c").cast("double")
         / F.col("total_rev_c").cast("double")).alias("mkt_share"))


_SQL_MARKET_SHARE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(sum(CASE WHEN n2.n_name = '{SHARE_NATION}'
                THEN {_cents_sql("l_extendedprice * (1 - l_discount)")}
                ELSE 0 END) AS BIGINT) AS nation_rev_c,
       CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
         AS total_rev_c,
       CAST(sum(CASE WHEN n2.n_name = '{SHARE_NATION}'
                THEN {_cents_sql("l_extendedprice * (1 - l_discount)")}
                ELSE 0 END) AS BIGINT)::DOUBLE
         / CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)::DOUBLE
         AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = '{SHARE_REGION}' AND p_type = 'PROMO'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


def q_late_line_priority(spark, sf_dir):
    """TPC-H Q12 shape: priority mix of LATE shipments per line status
    (this corpus has no l_shipmode/l_commitdate; l_linestatus stands in
    for the mode and "late" = shipped >= 90 days after the order date —
    an exact timestamp-interval compare both engines evaluate
    identically). Both conditional counts land in ONE hash agg over the
    orders⋈lineitem join; orders broadcasts only its two needed columns."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .select("o_orderkey", "o_orderdate", "o_orderpriority"))
    j = l.join(F.broadcast(o), F.col("l_orderkey") == F.col("o_orderkey"))
    late = j.filter(
        F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))


_SQL_LATE_PRIORITY = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
"""


def q_top_revenue_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) whose quarterly revenue equals the
    GLOBAL max — the view + scalar-subquery pattern. The revenue relation
    is built once and reused for both the max (one broadcast row via a
    cross join) and the equality filter; ties all surface, exactly like
    the spec query. Integer cents make `= max` a bit-exact predicate."""
    l = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
         .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))))
    rev = _CENTS_S(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_supp = l.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev_c"))
    mx = per_supp.agg(F.max("total_rev_c").alias("max_rev_c"))
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey", "s_name")
    return (per_supp.crossJoin(F.broadcast(mx))
            .filter(F.col("total_rev_c") == F.col("max_rev_c"))
            .join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_rev_c"))


_SQL_TOP_REV_SUPPLIER = f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum({_cents_sql("l_extendedprice * (1 - l_discount)")}) AS BIGINT)
           AS total_rev_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_rev_c
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_rev_c = (SELECT max(total_rev_c) FROM rev)
"""


def q_promo_stock_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nested semi-join chain — suppliers whose recent
    (1996+) shipped quantity of PROMO parts exceeds HALF their all-time
    PROMO quantity (stands in for `availqty > 0.5 * shipped`; this corpus
    has no partsupp). Inner part filter → per-supplier conditional sums in
    one agg (recent vs all-time from the same rows, no second scan) →
    integer threshold (2*recent > total, exact) → left-SEMI into the
    supplier dimension so each qualifying supplier emits once."""
    p = (spark.read.parquet(f"{sf_dir}/part.parquet")
         .filter(F.col("p_type") == "PROMO").select("p_partkey"))
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    lp = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    recent = F.col("l_shipdate") >= F.lit("1996-07-01").cast("timestamp")
    per_supp = lp.groupBy("l_suppkey").agg(
        F.sum(F.when(recent, F.col("l_quantity").cast("long")).otherwise(0)
              ).alias("recent_qty"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
    hot = per_supp.filter(F.lit(2) * F.col("recent_qty") > F.col("total_qty"))
    su = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (su.join(hot, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name", "n_name"))


_SQL_PROMO_STOCK = """
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-07-01 00:00:00'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
           AS recent_qty,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = 'PROMO'
  GROUP BY 1
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM per_supp
                    WHERE 2 * recent_qty > total_qty)
"""


def q_cdc_row_lineage(spark, sf_dir):
    """Row lineage (Iceberg v3 row-id analog): every committed file gets a
    first_row_id from the table's monotone counter; _row_id = coalesce(
    materialized __row_id, first_row_id + position). The gate pins the
    three contracts — target rows keep their id through a COW MERGE
    (identity continues across the bucket rewrite), merge inserts mint
    fresh ids ABOVE the pre-merge counter, and compaction carries every
    id untouched — as engine-computed booleans the oracle predicts.
    The reference has no row-identity story at all (fire-and-forget bulk
    loads, README.md:50-69)."""
    from embulk_output_databricks_spark.plans.merge import merge_apply
    from embulk_output_databricks_spark.sources.laketable import ROW_ID

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "row_lineage", n_buckets=4)
    tbl.append(_lww(t_half))
    v_target = tbl.current_version()
    n_target = tbl.row_count()  # ids of target rows tile [0, n_target)
    merge_apply(tbl, _lww(s_half), keys=["user_id"])
    v_merged = tbl.current_version()
    tbl.compact(min_files_per_bucket=1)

    def ids(version):
        return (tbl.read(version=version, with_row_ids=True)
                .select("user_id", F.col(ROW_ID).alias(f"rid{version}")))

    b, m1, a = ids(v_target), ids(v_merged), ids(tbl.current_version())
    assert (a.select(f"rid{tbl.current_version()}").distinct().count()
            == a.count()), "row ids not unique"
    rid0, rid1, rid2 = (f"rid{v_target}", f"rid{v_merged}",
                        f"rid{tbl.current_version()}")
    carried = F.col(rid0).isNotNull()
    return (m1.join(b, "user_id", "left").join(a, "user_id")
            .select("user_id",
                    carried.alias("carried"),
                    F.when(carried, F.col(rid1) == F.col(rid0))
                    .otherwise(F.col(rid1) >= n_target).alias("id_preserved"),
                    (F.col(rid2) == F.col(rid1)).alias("stable_after_compact")))


def q_cdc_last_updated(spark, sf_dir):
    """Second half of v3 row lineage (_last_updated_sequence_number analog):
    every row-holding file records its commit sequence ("ls"); a row's
    _last_seq = coalesce(materialized __last_seq, ls). A rewrite carries the
    value for rows it merely COPIES and writes NULL for rows it MODIFIED, so
    modified rows inherit the rewrite commit's sequence — recency without a
    diff. The gate pins: merge bumps exactly the staged rows (updates AND
    inserts) to the merge commit's sequence while untouched rows keep the
    append commit's, and compaction changes nothing. The reference has no
    per-row recency concept (fire-and-forget loads, README.md:50-69)."""
    from embulk_output_databricks_spark.plans.merge import merge_apply
    from embulk_output_databricks_spark.sources.laketable import LAST_SEQ

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "last_updated", n_buckets=4)
    tbl.append(_lww(t_half))
    v1 = tbl.current_version()
    merge_apply(tbl, _lww(s_half), keys=["user_id"])
    v2 = tbl.current_version()

    def ls(version, alias):
        return (tbl.read(version=version, with_row_ids=True)
                .select("user_id", F.col(LAST_SEQ).alias(alias)))

    m = ls(v2, "ls1")
    tbl.compact(min_files_per_bucket=1)
    a = ls(tbl.current_version(), "ls2")
    staged = (_lww(s_half).select("user_id")
              .withColumn("__s", F.lit(True)))
    is_staged = F.coalesce(F.col("__s"), F.lit(False))
    return (m.join(a, "user_id").join(staged, "user_id", "left")
            .select("user_id", is_staged.alias("staged"),
                    F.when(is_staged, F.col("ls1") == F.lit(v2))
                    .otherwise(F.col("ls1") == F.lit(v1))
                    .alias("bumped_iff_staged"),
                    (F.col("ls2") == F.col("ls1"))
                    .alias("stable_after_compact")))


def q_cdc_changed_since(spark, sf_dir):
    """Row-lineage incremental read (Iceberg v3 incremental scan by
    sequence number): changed_since(v) returns exactly the rows inserted or
    modified after snapshot v, with IO O(files committed after v) — older
    files are pruned from the scan because a carried row's materialized
    _last_seq can never exceed its file's commit sequence. A COW merge that
    rewrites whole buckets still yields a ROW-exact feed (added_rows, the
    file-granularity incremental read, would replay every carried row), and
    a later compaction must not pollute it. Oracle: the merged batch's LWW
    state — merge replaces matched rows with staged values, so the changed
    set IS the staged winners."""
    from embulk_output_databricks_spark.plans.merge import merge_apply

    t_half, s_half = _halves(spark, sf_dir)
    tbl = _new_table(spark, "changed_since", n_buckets=4)
    tbl.append(_lww(t_half))
    v1 = tbl.current_version()
    merge_apply(tbl, _lww(s_half), keys=["user_id"])
    tbl.compact(min_files_per_bucket=1)  # maintenance must not enter the feed
    return tbl.changed_since(v1).select(
        "user_id", "ts_us", "event_type", "value", "props")


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition quality filters per document: top-word
    fraction, top-bigram fraction, distinct-word ratio (Rae et al. 2021,
    'Scaling Language Models', repetition-removal table — public paper).
    Bigrams come from a pure-JVM zip_with over the split words (no Python
    in the hot path); the frequency maxima are two-stage aggs over the
    exploded words, so the heavy groupBy keys are (doc_id, word) — fine
    parallelism at 100 TB, no giant per-doc rows. Flag thresholds compare
    in integers (5*top_word > n_words; 10*top_bigram > n_bigrams) so the
    boundary is engine-independent."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id", words.alias("ws"),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct"))
    topw = (base.select("doc_id", F.explode("ws").alias("w"))
            .groupBy("doc_id", "w").count()
            .groupBy("doc_id").agg(F.max("count").alias("top_word_n")))
    bigrams = F.expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),"
        " (a, b) -> concat(a, ' ', b))")
    topb = (base.select("doc_id", F.explode(bigrams).alias("g"))
            .groupBy("doc_id", "g").count()
            .groupBy("doc_id").agg(F.max("count").alias("top_bigram_n"),
                                   F.sum("count").alias("n_bigrams")))
    out = (base.select("doc_id", "n_words", "n_distinct")
           .join(topw, "doc_id", "left")
           .join(topb, "doc_id", "left")
           .select("doc_id", "n_words", "n_distinct",
                   F.coalesce("top_word_n", F.lit(0)).alias("top_word_n"),
                   F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                   F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n")))
    flagged = ((F.lit(5) * F.col("top_word_n") > F.col("n_words"))
               | ((F.col("n_bigrams") > 0)
                  & (F.lit(10) * F.col("top_bigram_n") > F.col("n_bigrams"))))
    return out.withColumn("flagged", flagged)


_SQL_TEXT_REPETITION = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), stats AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
  FROM base
), topw AS (
  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_word_n FROM (
    SELECT doc_id, w, count(*) AS cnt
    FROM (SELECT doc_id, unnest(ws) AS w FROM base) GROUP BY 1, 2
  ) GROUP BY 1
), bgs AS (
  SELECT doc_id,
         list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]) AS gs
  FROM base
), topb AS (
  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_bigram_n,
         CAST(sum(cnt) AS BIGINT) AS n_bigrams FROM (
    SELECT doc_id, g, count(*) AS cnt
    FROM (SELECT doc_id, unnest(gs) AS g FROM bgs) GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT s.doc_id, n_words, n_distinct,
       COALESCE(top_word_n, 0) AS top_word_n,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       COALESCE(top_bigram_n, 0) AS top_bigram_n,
       (5 * COALESCE(top_word_n, 0) > n_words)
         OR (COALESCE(n_bigrams, 0) > 0
             AND 10 * COALESCE(top_bigram_n, 0) > COALESCE(n_bigrams, 0))
         AS flagged
FROM stats s
LEFT JOIN topw USING (doc_id)
LEFT JOIN topb USING (doc_id)
"""


def q_cdc_scd2(spark, sf_dir):
    """SCD2 type-2 history (streaming/scd2.py): the events binlog replayed
    in three time-ordered batches; every non-delete event is a version row
    whose valid_to is the key's next event (chained ACROSS batches by the
    open-row point lookup), `event_type='error'` acting as the delete op.
    The final history equals a one-pass LEAD window over all events — the
    history the reference's UPDATE-in-place merge destroys
    (DatabricksOutputConnection.java:180-232)."""
    from pyspark.sql import Window

    from .streaming.scd2 import ensure_scd2, scd2_apply

    ev = _events(spark, sf_dir).withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("D"))
               .otherwise(F.lit("U")))
    # deterministic 3-way time split — harness-side batching only (the
    # single-partition window never appears in an engine plan)
    w = Window.orderBy("ts_us", "event_id")
    ev3 = ev.withColumn("__b", F.ntile(3).over(w)).persist()
    sch = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
        T.StructField("op", T.StringType()),
    ])
    cat = _fresh_catalog(spark, "scd2")
    tbl = ensure_scd2(cat, "t", sch, keys=["user_id"], ts_col="ts_us",
                      n_buckets=8)
    try:
        for i in (1, 2, 3):
            scd2_apply(tbl, ev3.filter(F.col("__b") == i).drop("__b"),
                       keys=["user_id"], ts_col="ts_us", tie_col="event_id")
    finally:
        ev3.unpersist()
    return tbl.read().select(
        "user_id", "event_id", "event_type", "value", "props",
        F.col("valid_from").alias("valid_from_us"),
        F.col("valid_to").alias("valid_to_us"),
        "is_current")


_SQL_SCD2 = """
SELECT user_id, event_id, event_type, value, props,
       ts_us AS valid_from_us, valid_to_us,
       (valid_to_us IS NULL) AS is_current
FROM (
  SELECT user_id, event_id, event_type, value, props, epoch_us(ts) AS ts_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id) AS valid_to_us
  FROM events
) WHERE event_type <> 'error'
"""


def q_cdc_ndv_stats(spark, sf_dir):
    """Incremental ANALYZE: per-file KMV distinct-count sketches harvested
    at write time fold into table-level COUNT(DISTINCT) with zero data IO
    (sources/sketch.py + LakeTable.analyze — the Iceberg Puffin/Theta
    analog; the reference has no statistics story at all, it is a
    write-only sink, DatabricksOutputPlugin.java:166-186). KMV is EXACT
    below its k (1024): the low-cardinality corpus dimensions queried
    here answer precisely, so the result is oracle-comparable; the
    files_scanned == 0 assert pins that no data was re-read."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ])
    tbl = _new_table(spark, "ndv_stats", schema=schema, n_buckets=4,
                     bucket_key="doc_id",
                     properties={"ndv_columns": "lang,source"})
    for j in range(3):  # several commits -> several files per bucket
        tbl.append(docs.filter(F.col("doc_id") % 3 == j))
    got = tbl.analyze()
    assert all(v["exact"] for v in got.values()), "cardinality exceeded k"
    assert all(v["files_scanned"] == 0 for v in got.values()), \
        "write-side sketches missing: analyze re-read data"
    return spark.createDataFrame(
        sorted((c, int(v["ndv"])) for c, v in got.items()),
        "column_name string, ndv bigint")


_SQL_NDV = """
SELECT 'lang' AS column_name, CAST(COUNT(DISTINCT lang) AS BIGINT) AS ndv
FROM documents
UNION ALL
SELECT 'source' AS column_name, CAST(COUNT(DISTINCT source) AS BIGINT) AS ndv
FROM documents
"""


# ================================================================ registry

SPARK_QUERIES = {
    "cdc_lww_latest": q_cdc_lww_latest,
    "cdc_lww_maxstruct": q_cdc_lww_maxstruct,
    "cdc_lww_salted": q_cdc_lww_salted,
    "cdc_lww_window": q_cdc_lww_window,
    "cdc_merge_upsert": q_cdc_merge_upsert,
    "cdc_identifier_keys": q_cdc_identifier_keys,
    "cdc_merge_composite": q_cdc_merge_composite,
    "cdc_merge_rules": q_cdc_merge_rules,
    "cdc_merge_partial": q_cdc_merge_partial,
    "cdc_merge_delete": q_cdc_merge_delete,
    "cdc_merge_guard": q_cdc_merge_guard,
    "cdc_snapshot_resync": q_cdc_snapshot_resync,
    "cdc_sort_order": q_cdc_sort_order,
    "cdc_merge_fileprune": q_cdc_merge_fileprune,
    "cdc_nested_evolution": q_cdc_nested_evolution,
    "cdc_join_maintenance": q_cdc_join_maintenance,
    "cdc_merge_mor": q_cdc_merge_mor,
    "cdc_auto_strategy": q_cdc_auto_strategy,
    "cdc_stage_ahead": q_cdc_stage_ahead,
    "cdc_read_ahead_auto": q_cdc_read_ahead_auto,
    "cdc_predictive_merge": q_cdc_predictive_merge,
    "cdc_nonascii_merge": q_cdc_nonascii_merge,
    "cdc_apply_insert": q_cdc_apply_insert,
    "cdc_add_files": q_cdc_add_files,
    "cdc_constraints": q_cdc_constraints,
    "cdc_token_lookup": q_cdc_token_lookup,
    "cdc_ndv_stats": q_cdc_ndv_stats,
    "cdc_neardup_index": q_cdc_neardup_index,
    "cdc_ann_index": q_cdc_ann_index,
    "cdc_stats_skipping": q_cdc_stats_skipping,
    "cdc_agg_pushdown": q_cdc_agg_pushdown,
    "cdc_retention_delete": q_cdc_retention_delete,
    "cdc_posdel_delete": q_cdc_posdel_delete,
    "cdc_posdel_compaction": q_cdc_posdel_compaction,
    "cdc_auto_maintain": q_cdc_auto_maintain,
    "cdc_eqdel_delete": q_cdc_eqdel_delete,
    "cdc_predicate_update": q_cdc_predicate_update,
    "cdc_posdel_update": q_cdc_posdel_update,
    "cdc_concurrent_writers": q_cdc_concurrent_writers,
    "cdc_slice_restatement": q_cdc_slice_restatement,
    "cdc_cluster_compact": q_cdc_cluster_compact,
    "cdc_zorder_compact": q_cdc_zorder_compact,
    "cdc_bloom_lookup": q_cdc_bloom_lookup,
    "cdc_apply_truncate": q_cdc_apply_truncate,
    "cdc_apply_replace": q_cdc_apply_replace,
    "cdc_fence_idempotent": q_cdc_fence_idempotent,
    "cdc_ckpt_fold": q_cdc_ckpt_fold,
    "cdc_quarantine": q_cdc_quarantine,
    "cdc_fanin": q_cdc_fanin,
    "cdc_auto_evolve": q_cdc_auto_evolve,
    "cdc_rollback": q_cdc_rollback,
    "cdc_wap_publish": q_cdc_wap_publish,
    "cdc_chunked_batch": q_cdc_chunked_batch,
    "cdc_rebucket": q_cdc_rebucket,
    "cdc_bucket_join": q_cdc_bucket_join,
    "cdc_bucket_anti": q_cdc_bucket_anti,
    "cdc_bucket_agg": q_cdc_bucket_agg,
    "cdc_debezium_out": q_cdc_debezium_out,
    "cdc_fence_antijoin": q_cdc_fence_antijoin,
    "cdc_time_travel": q_cdc_time_travel,
    "cdc_incremental_read": q_cdc_incremental_read,
    "cdc_schema_evolution": q_cdc_schema_evolution,
    "cdc_default_values": q_cdc_default_values,
    "cdc_lineage_stats": q_cdc_lineage_stats,
    "cdc_kafka_roundtrip": q_cdc_kafka_roundtrip,
    "cdc_debezium_replay": q_cdc_debezium_replay,
    "cdc_export_snapshot": q_cdc_export_snapshot,
    "cdc_export_sync": q_cdc_export_sync,
    "cdc_complex_types": q_cdc_complex_types,
    "cdc_multi_table": q_cdc_multi_table,
    "cdc_txn_commit": q_cdc_txn_commit,
    "cdc_stateful_stream": q_cdc_stateful_stream,
    "cdc_tsv_ingest": q_cdc_tsv_ingest,
    "cdc_value_types": q_cdc_value_types,
    "text_profile": q_text_profile,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_simhash64_pairs": q_dedup_simhash64_pairs,
    "tok_derive": q_tok_derive,
    "tok_fingerprint_arrow": q_tok_fingerprint_arrow,
    "tok_chunks": q_tok_chunks,
    "tok_chunks_arrow": q_tok_chunks_arrow,
    "tok_pack": q_tok_pack,
    "tok_epoch_shuffle": q_tok_epoch_shuffle,
    "media_decode": q_media_decode,
    "media_embed": q_media_embed,
    "media_resize": q_media_resize,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_multiprobe_topk": q_ann_multiprobe_topk,
    "ann_recall": q_ann_recall,
    "ann_ivf_topk": q_ann_ivf_topk,
    "emb_neardup": q_emb_neardup,
    "emb_dedup_clusters": q_emb_dedup_clusters,
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "events_tumbling": q_events_tumbling,
    "events_tumbling_stream": q_events_tumbling_stream,
    "events_stream_enrich": q_events_stream_enrich,
    "events_sessionize": q_events_sessionize,
    "events_session_stream": q_events_session_stream,
    "events_stream_join": q_events_stream_join,
    "events_stream_dedup": q_events_stream_dedup,
    "events_asof": q_events_asof,
    "events_asof_bucketed": q_events_asof_bucketed,
    "events_range_join": q_events_range_join,
    "events_rollup": q_events_rollup,
    "events_cube": q_events_cube,
    "events_setops": q_events_setops,
    "events_pivot": q_events_pivot,
    "events_running": q_events_running,
    "orders_late_exists": q_orders_late_exists,
    "customers_no_orders": q_customers_no_orders,
    "shipping_priority": q_shipping_priority,
    "large_orders_having": q_large_orders_having,
    "events_grouping_sets": q_events_grouping_sets,
    "parts_distinct_suppliers": q_parts_distinct_suppliers,
    "promo_revenue": q_promo_revenue,
    "important_parts": q_important_parts,
    "nation_multi_distinct": q_nation_multi_distinct,
    "orders_above_avg": q_orders_above_avg,
    "events_funnel": q_events_funnel,
    "docs_sample": q_docs_sample,
    "tok_histogram": q_tok_histogram,
    "emb_norm_stats": q_emb_norm_stats,
    "events_ranks": q_events_ranks,
    "events_ranks_scalable": q_events_ranks_scalable,
    "dedup_clusters": q_dedup_clusters,
    "text_pipeline": q_text_pipeline,
    "cdc_snapshot_diff": q_cdc_snapshot_diff,
    "events_sliding": q_events_sliding,
    "events_quantiles": q_events_quantiles,
    "regional_revenue": q_regional_revenue,
    "top_supplier_per_nation": q_top_supplier_per_nation,
    "nation_pair_volume": q_nation_pair_volume,
    "profit_by_nation": q_profit_by_nation,
    "returned_customers": q_returned_customers,
    "customer_order_counts": q_customer_order_counts,
    "small_qty_revenue": q_small_qty_revenue,
    "disjunctive_revenue": q_disjunctive_revenue,
    "lonely_supplier_returns": q_lonely_supplier_returns,
    "idle_rich_customers": q_idle_rich_customers,
    "forecast_revenue": q_forecast_revenue,
    "min_cost_supplier": q_min_cost_supplier,
    "market_share": q_market_share,
    "late_line_priority": q_late_line_priority,
    "top_revenue_supplier": q_top_revenue_supplier,
    "promo_stock_suppliers": q_promo_stock_suppliers,
    "text_repetition": q_text_repetition,
    "events_json_shred": q_events_json_shred,
    "cdc_row_lineage": q_cdc_row_lineage,
    "cdc_last_updated": q_cdc_last_updated,
    "cdc_changed_since": q_cdc_changed_since,
    "cdc_table_follow": q_cdc_table_follow,
    "media_frames": q_media_frames,
    "cdc_changelog": q_cdc_changelog,
    "cdc_change_feed": q_cdc_change_feed,
    "cdc_agg_maintenance": q_cdc_agg_maintenance,
    "cdc_token_histogram": q_cdc_token_histogram,
    "cdc_inverted_index": q_cdc_inverted_index,
    "cdc_stream_tail": q_cdc_stream_tail,
    "cdc_scd2": q_cdc_scd2,
}


def _oracle_sql() -> dict[str, str]:
    lww = _SQL_LWW_ALL
    cents = _cents_sql
    disc = "l_extendedprice * (1 - l_discount)"
    charge = f"({disc}) * (1 + l_tax)"
    return {
        "cdc_lww_latest": lww,
        "cdc_kafka_roundtrip": lww,
        "cdc_debezium_replay": _SQL_DEBEZIUM,
        "cdc_export_snapshot": _SQL_EXPORT,
        "cdc_export_sync": _SQL_EXPORT,
        "cdc_complex_types": _SQL_COMPLEX,
        "cdc_multi_table": _SQL_MULTI_TABLE,
        "cdc_txn_commit": _SQL_TXN_COMMIT,
        "cdc_stateful_stream": f"SELECT user_id, ts_us, event_type FROM {_sql_lww()}",
        "cdc_tsv_ingest": _SQL_TSV_INGEST,
        "cdc_value_types": _SQL_VALUE_TYPES,
        "cdc_lww_maxstruct": lww,
        "cdc_lww_salted": lww,
        "cdc_lww_window": lww,
        "cdc_scd2": _SQL_SCD2,
        "cdc_merge_upsert": _sql_merge(_UPSERT_COLS),
        "cdc_identifier_keys": _sql_merge(_UPSERT_COLS),
        "cdc_table_follow": _sql_merge(_UPSERT_COLS),
        "cdc_merge_composite": _SQL_MERGE_COMPOSITE,
        "cdc_merge_rules": _sql_merge(_RULES_COLS),
        "cdc_merge_partial": _sql_merge(_PARTIAL_COLS),
        "cdc_merge_guard": _sql_merge(_GUARD_COLS),
        "cdc_snapshot_resync": _SQL_SNAPSHOT_RESYNC,
        "cdc_sort_order": _SQL_SORT_ORDER,
        "cdc_merge_fileprune": _SQL_MERGE_FILEPRUNE,
        "cdc_nested_evolution": _SQL_NESTED_EVOLUTION,
        "cdc_join_maintenance": _SQL_JOIN_MAINTENANCE,
        "cdc_merge_delete": _sql_merge(
            _UPSERT_COLS,
            where="WHERE NOT (s.user_id IS NOT NULL AND s.event_type = 'error')",
        ),
        "cdc_merge_mor": _sql_merge(
            _UPSERT_COLS,
            where="WHERE NOT (s.user_id IS NOT NULL AND s.event_type = 'error')",
        ),
        "cdc_auto_strategy": _SQL_AUTO_STRATEGY,
        "cdc_nonascii_merge": _SQL_NONASCII,
        "cdc_apply_insert": (
            "SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props FROM events"
        ),
        "cdc_add_files": (
            "SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props FROM events"
        ),
        "cdc_constraints": (
            "SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props FROM events"
        ),
        "cdc_neardup_index": f"""
            WITH final AS ({_sql_merge(
                _UPSERT_COLS,
                where=("WHERE NOT (s.user_id IS NOT NULL "
                       "AND s.event_type = 'error')"))}),
                 sg AS (SELECT user_id,
                               {P.sql_minhash('props', 16, 3)} AS sig
                        FROM final)
            SELECT user_id, CAST(b AS INTEGER) AS band,
                   md5(b::VARCHAR || '#' ||
                       array_to_string(list_slice(sig, b*4 + 1, b*4 + 4),
                                       '|')) AS bh
            FROM sg, range(0, 4) t(b)
        """,
        "cdc_token_lookup": f"""
            SELECT user_id, ts_us,
                   {P.sql_tokens_fingerprint(
                       "[CAST((user_id % 4) * 1000 + user_id % 2 AS INTEGER), "
                       "CAST((user_id % 4) * 1000 + 100 + user_id % 17 AS INTEGER), "
                       "CAST((user_id % 4) * 1000 + 200 + user_id % 19 AS INTEGER)]"
                   )} AS tok_fp
            FROM {_sql_lww()}
            WHERE list_contains(
                [(user_id % 4) * 1000 + user_id % 2,
                 (user_id % 4) * 1000 + 100 + user_id % 17,
                 (user_id % 4) * 1000 + 200 + user_id % 19], 2000)
        """,
        "cdc_zorder_compact": _SQL_ZORDER,
        "cdc_bloom_lookup": _SQL_BLOOM,
        "cdc_ndv_stats": _SQL_NDV,
        "cdc_cluster_compact": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events)
            SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
            FROM events, b
            WHERE epoch_us(ts) BETWEEN b.mn + (b.mx - b.mn) * 3 // 8
                                   AND b.mn + (b.mx - b.mn) * 5 // 8
        """,
        "cdc_stats_skipping": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events)
            SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
            FROM events, b
            WHERE epoch_us(ts) BETWEEN b.mn + (b.mx - b.mn) * 3 // 8
                                   AND b.mn + (b.mx - b.mn) * 5 // 8
        """,
        "cdc_agg_pushdown": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events)
            SELECT count(*) AS cnt, count(value) AS cnt_value,
                   min(epoch_us(ts)) AS min_ts, max(epoch_us(ts)) AS max_ts,
                   min(value) AS min_value, max(value) AS max_value
            FROM events, b
            WHERE epoch_us(ts) BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                                   AND b.mn + (b.mx - b.mn) * 6 // 8
        """,
        "cdc_retention_delete": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events)
            SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
            FROM events, b
            WHERE epoch_us(ts) NOT BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                                       AND b.mn + (b.mx - b.mn) * 5 // 8
        """,
        "cdc_posdel_delete": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events)
            SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
            FROM events, b
            WHERE epoch_us(ts) NOT BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                                       AND b.mn + (b.mx - b.mn) * 5 // 8
        """,
        "cdc_posdel_compaction": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events)
            SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
            FROM events, b
            WHERE epoch_us(ts) NOT BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                                       AND b.mn + (b.mx - b.mn) * 3 // 8
              AND epoch_us(ts) NOT BETWEEN b.mn + (b.mx - b.mn) * 5 // 8
                                       AND b.mn + (b.mx - b.mn) * 6 // 8
        """,
        "cdc_auto_maintain": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events)
            SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
            FROM events, b
            WHERE epoch_us(ts) NOT BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                                       AND b.mn + (b.mx - b.mn) * 3 // 8
        """,
        "cdc_eqdel_delete": """
            SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
            FROM events
            WHERE user_id % 7 <> 3
        """,
        "cdc_predicate_update": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events),
            hit AS (SELECT *, epoch_us(ts)
                         BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                             AND b.mn + (b.mx - b.mn) * 5 // 8 AS h
                    FROM events, b)
            SELECT user_id, epoch_us(ts) AS ts_us,
                   CASE WHEN h THEN 'adj_' || event_type
                        ELSE event_type END AS event_type,
                   value,
                   CASE WHEN h THEN event_type ELSE props END AS props
            FROM hit
        """,
        "cdc_posdel_update": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events),
            hit AS (SELECT *, epoch_us(ts)
                         BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                             AND b.mn + (b.mx - b.mn) * 5 // 8 AS h
                    FROM events, b)
            SELECT user_id, epoch_us(ts) AS ts_us,
                   CASE WHEN h THEN 'adj_' || event_type
                        ELSE event_type END AS event_type,
                   value,
                   CASE WHEN h THEN event_type ELSE props END AS props
            FROM hit
        """,
        "cdc_slice_restatement": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events)
            SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
            FROM events, b
            WHERE epoch_us(ts) NOT BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                                       AND b.mn + (b.mx - b.mn) * 5 // 8
            UNION ALL
            SELECT user_id, epoch_us(ts) AS ts_us,
                   're_' || event_type AS event_type,
                   value * 2 AS value, props
            FROM events, b
            WHERE epoch_us(ts) BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                                   AND b.mn + (b.mx - b.mn) * 5 // 8
        """,
        "cdc_concurrent_writers": """
            WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                       FROM events)
            SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props
            FROM events, b
            WHERE CAST((day(ts) - 1) // 8 AS BIGINT) = 3
               OR epoch_us(ts) NOT BETWEEN b.mn + (b.mx - b.mn) * 2 // 8
                                       AND b.mn + (b.mx - b.mn) * 5 // 8
        """,
        "cdc_apply_truncate": (
            "SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props "
            "FROM events WHERE event_id % 2 = 1"
        ),
        "cdc_apply_replace": f"""
            SELECT user_id, count(*) AS n_events,
                   CAST(sum({cents("value")}) AS BIGINT) AS total_cents
            FROM events WHERE event_id % 2 = 1 GROUP BY user_id
        """,
        "cdc_fence_idempotent": _SQL_REPLAY_FINAL,
        "cdc_stage_ahead": _SQL_REPLAY_FINAL,
        "cdc_read_ahead_auto": _SQL_REPLAY_FINAL,
        "cdc_predictive_merge": _SQL_REPLAY_FINAL,
        "cdc_ckpt_fold": _SQL_REPLAY_FINAL,
        "cdc_quarantine": _SQL_QUARANTINE,
        "cdc_fanin": _SQL_REPLAY_FINAL,
        "cdc_auto_evolve": """
            SELECT user_id, ts_us AS seq_lsn, event_type, value, props,
                   CASE WHEN b >= 2 THEN event_type END AS flag
            FROM (
              SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
                     value, props, CAST((day(ts) - 1) // 8 AS BIGINT) AS b,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts) DESC,
                                                 event_id DESC) AS rn
              FROM events
            ) WHERE rn = 1
        """,
        "cdc_rollback": _SQL_REPLAY_FINAL,
        "cdc_wap_publish": _SQL_REPLAY_FINAL,
        "cdc_chunked_batch": _SQL_REPLAY_FINAL,
        "cdc_rebucket": _SQL_REPLAY_FINAL,
        "cdc_fence_antijoin": f"""
            SELECT CAST((day(ts) - 1) // 8 AS BIGINT) AS batch_id,
                   user_id, event_id, epoch_us(ts) AS seq_lsn
            FROM events
            WHERE CAST((day(ts) - 1) // 8 AS BIGINT) NOT IN
                  ({", ".join(str(b) for b in FENCED_BATCHES)})
        """,
        "cdc_time_travel": (
            "SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props "
            "FROM events WHERE event_id % 2 = 0"
        ),
        "cdc_incremental_read": (
            "SELECT user_id, epoch_us(ts) AS ts_us, event_type, value, props "
            "FROM events WHERE event_id % 2 = 1"
        ),
        "cdc_schema_evolution": _SQL_EVOLUTION,
        "cdc_default_values": _SQL_DEFAULT_VALUES,
        "cdc_lineage_stats": """
            SELECT CAST((day(ts) - 1) // 8 AS BIGINT) AS batch_id,
                   count(*) AS events_in,
                   count(DISTINCT user_id) AS n_keys,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
                   min(epoch_us(ts)) AS lsn_from,
                   max(epoch_us(ts)) AS lsn_to
            FROM events GROUP BY 1
        """,
        "text_profile": f"""
            SELECT doc_id,
                   {P.sql_token_count('text')} AS n_tok,
                   {P.sql_fingerprint('text')} AS fingerprint,
                   {P.sql_quality('text')} AS quality,
                   {P.sql_langid('text')} AS lang_guess
            FROM documents
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_md5, min(doc_id) AS keeper_id,
                   count(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "dedup_minhash_lsh": _sql_minhash_pairs(),
        "dedup_ngram_jaccard": _sql_ngram_pairs(),
        "dedup_simhash": f"""
            SELECT doc_id, {P.sql_simhash32('text')} AS simhash FROM documents
        """,
        "dedup_simhash_pairs": _sql_simhash_pairs(),
        "dedup_simhash64_pairs": _sql_simhash_pairs(bits=64),
        "tok_derive": f"""
            SELECT doc_id,
                   len({P.sql_word_ids('text')}) AS n_tok,
                   {P.sql_tokens_fingerprint(P.sql_word_ids('text'))} AS fp
            FROM documents
        """,
        "tok_fingerprint_arrow": f"""
            SELECT doc_id,
                   {P.sql_tokens_fingerprint(P.sql_word_ids('text'))} AS fp
            FROM documents
        """,
        "tok_chunks": _sql_tok_chunks(),
        "tok_chunks_arrow": _sql_tok_chunks(),
        "tok_pack": _sql_tok_pack(),
        "tok_epoch_shuffle": """
            SELECT doc_id,
                   md5(concat_ws('|', doc_id, 'epoch42')) AS shuffle_key,
                   CAST(row_number() OVER (
                        ORDER BY md5(concat_ws('|', doc_id, 'epoch42')))
                        AS BIGINT) AS epoch_pos
            FROM documents
        """,
        # tok_pack: stateful greedy packing (applyInPandas) — rows-only check
        "media_decode": _sql_media_decode(),
        "media_embed": _sql_media_embed(),
        "media_resize": _sql_media_resize(),
        "ann_cosine_topk": _sql_ann(),
        "ann_lsh_topk": _sql_ann_lsh(),
        "ann_multiprobe_topk": _sql_ann_multiprobe(),
        "ann_recall": _sql_ann_recall(),
        "ann_ivf_topk": _sql_ann_ivf(),
        "emb_neardup": f"""
            WITH z AS (SELECT vec_id, embedding,
                              {P.sql_srp_bucket('embedding', EMB_PLANES, 64,
                                                offset=0)} AS b0,
                              {P.sql_srp_bucket('embedding', EMB_PLANES, 64,
                                                offset=EMB_PLANES)} AS b1
                       FROM embeddings)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   {P.sql_cosine('a.embedding', 'b.embedding')} AS cos
            FROM z a JOIN z b ON a.vec_id < b.vec_id
                             AND (a.b0 = b.b0 OR a.b1 = b.b1)
            WHERE {P.sql_cosine('a.embedding', 'b.embedding')} >= {EMB_TAU}
        """,
        "pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(sum({cents("l_quantity")}) AS BIGINT) AS sum_qty_c,
                   CAST(sum({cents("l_extendedprice")}) AS BIGINT) AS sum_price_c,
                   CAST(sum({cents(disc)}) AS BIGINT) AS sum_disc_c,
                   CAST(sum({cents(charge)}) AS BIGINT) AS sum_charge_c,
                   count(*) AS n,
                   (CAST(sum({cents("l_quantity")}) AS BIGINT)::DOUBLE / 100.0) / count(*)::DOUBLE AS avg_qty
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": f"""
            SELECT o_orderkey, epoch_us(o_orderdate) AS o_date_us,
                   CAST(sum({cents(disc)}) AS BIGINT) AS revenue_c
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_date_us
            ORDER BY revenue_c DESC, o_orderkey
            LIMIT 10
        """,
        "events_tumbling": """
            SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "events_tumbling_stream": """
            SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "events_stream_enrich": """
            SELECT n_name, count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents
            FROM events JOIN nation ON user_id % 25 = n_nationkey
            GROUP BY n_name
        """,
        "events_sessionize": _SQL_SESSIONIZE,
        "events_session_stream": _SQL_SESSIONIZE,
        "events_stream_join": _SQL_STREAM_JOIN,
        "events_stream_dedup": _SQL_STREAM_DEDUP,
        "events_asof": _SQL_ASOF,
        "events_asof_bucketed": _SQL_ASOF,
        "events_range_join": _SQL_RANGE_JOIN,
        "events_rollup": _SQL_ROLLUP,
        "events_cube": _SQL_CUBE,
        "events_setops": _SQL_SETOPS,
        "events_pivot": _SQL_PIVOT,
        "events_running": _SQL_RUNNING,
        "orders_late_exists": _SQL_LATE_EXISTS,
        "customers_no_orders": _SQL_NO_ORDERS,
        "shipping_priority": _SQL_SHIPPING_PRIORITY,
        "large_orders_having": _SQL_LARGE_ORDERS,
        "events_grouping_sets": _SQL_GROUPING_SETS,
        "parts_distinct_suppliers": _SQL_DISTINCT_SUPPLIERS,
        "promo_revenue": _SQL_PROMO,
        "important_parts": _SQL_IMPORTANT_PARTS,
        "nation_multi_distinct": _SQL_MULTI_DISTINCT,
        "orders_above_avg": _SQL_ABOVE_AVG,
        "events_funnel": _SQL_FUNNEL,
        "docs_sample": _sql_docs_sample(),
        "tok_histogram": _sql_tok_histogram(),
        "emb_norm_stats": _sql_emb_norm_stats(),
        "events_ranks": _SQL_RANKS,
        "events_ranks_scalable": _SQL_RANKS,
        "dedup_clusters": _sql_clusters(),
        "emb_dedup_clusters": _sql_emb_clusters(),
        "text_pipeline": _sql_text_pipeline(),
        "cdc_snapshot_diff": _SQL_SNAPSHOT_DIFF,
        "cdc_bucket_join": _SQL_BUCKET_JOIN,
        "cdc_bucket_anti": _SQL_BUCKET_ANTI,
        "cdc_bucket_agg": _SQL_BUCKET_AGG,
        "cdc_debezium_out": _SQL_DEBEZIUM_OUT,
        "events_sliding": _SQL_SLIDING,
        "events_quantiles": _SQL_QUANTILES,
        "regional_revenue": _SQL_REGIONAL,
        "top_supplier_per_nation": _SQL_TOP_SUPPLIER,
        "nation_pair_volume": _SQL_NATION_PAIR,
        "profit_by_nation": _SQL_PROFIT_NATION,
        "returned_customers": _SQL_RETURNED,
        "customer_order_counts": _SQL_CUSTDIST,
        "small_qty_revenue": _SQL_SMALLQTY,
        "disjunctive_revenue": _SQL_DISJUNCTIVE,
        "lonely_supplier_returns": _SQL_LONELY_SUPPLIER,
        "idle_rich_customers": _SQL_IDLE_RICH,
        "forecast_revenue": _SQL_FORECAST,
        "min_cost_supplier": _SQL_MINCOST,
        "market_share": _SQL_MARKET_SHARE,
        "late_line_priority": _SQL_LATE_PRIORITY,
        "top_revenue_supplier": _SQL_TOP_REV_SUPPLIER,
        "promo_stock_suppliers": _SQL_PROMO_STOCK,
        "text_repetition": _SQL_TEXT_REPETITION,
        "events_json_shred": _SQL_EVENTS_JSON_SHRED,
        "cdc_row_lineage": f"""
            WITH t AS (SELECT user_id FROM {_sql_lww("event_id % 2 = 0")}),
                 s AS (SELECT user_id FROM {_sql_lww("event_id % 2 = 1")})
            SELECT coalesce(s.user_id, t.user_id) AS user_id,
                   t.user_id IS NOT NULL AS carried,
                   TRUE AS id_preserved,
                   TRUE AS stable_after_compact
            FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
        """,
        "cdc_changed_since": f"""
            SELECT user_id, ts_us, event_type, value, props
            FROM {_sql_lww("event_id % 2 = 1")}
        """,
        "cdc_last_updated": f"""
            WITH t AS (SELECT user_id FROM {_sql_lww("event_id % 2 = 0")}),
                 s AS (SELECT user_id FROM {_sql_lww("event_id % 2 = 1")})
            SELECT coalesce(s.user_id, t.user_id) AS user_id,
                   s.user_id IS NOT NULL AS staged,
                   TRUE AS bumped_iff_staged,
                   TRUE AS stable_after_compact
            FROM t FULL OUTER JOIN s ON t.user_id = s.user_id
        """,
        "media_frames": _sql_media_frames(),
        "cdc_changelog": _SQL_CHANGELOG,
        "cdc_change_feed": _SQL_CHANGE_FEED,
        "cdc_agg_maintenance": _SQL_AGG_MAINT,
        "cdc_token_histogram": _sql_token_histogram(),
        "cdc_inverted_index": _sql_inverted_index(),
        "cdc_ann_index": _sql_ann_index(),
        "cdc_stream_tail": _SQL_STREAM_TAIL,
    }


ORACLE_SQL = _oracle_sql()
