"""Storage-partitioned join: join two co-bucketed LakeTables with ZERO
data shuffle (Iceberg storage-partitioned-join / Spark SPJ analog).

The reference's only join is the MERGE equi-join it ships to Databricks
(DatabricksOutputConnection.java:180-232); it has no table-to-table read
story at all. At 100 TB the dominant cost of `fact JOIN fact ON key` is
shuffling BOTH payloads across the cluster — for token-array payloads the
shuffle bytes are the corpus itself. But both LakeTables already persist
their rows hash-bucketed on the key (bucket_expr: pmod(xxhash64(key), n)),
so equal keys provably live in the same bucket id on both sides: the join
decomposes into n_buckets independent bucket-local joins with no exchange
of data at all.

Vanilla open-source Spark can only exploit this through catalog bucketed
tables (DSv1 `bucketBy`) or a DSv2 connector that reports its output
partitioning — neither is reachable for our manifest-managed parquet from
Python. So the operator builds the physical SPJ plan itself:

  * driver: pair up each bucket's file groups from the two manifests —
    a metadata-only plan of n_buckets rows (bucket, left paths, right
    paths), pruning buckets the join type makes irrelevant (inner/semi:
    either side empty; left/anti: left empty);
  * executors: `mapInArrow` over the plan, one task per bucket — each
    task reads ONLY its bucket's parquet (column-pruned at the footer)
    and joins locally with Acero's C++ hash join (pa.Table.join, SQL
    null-key semantics: NULL matches nothing, exactly like Spark's
    equi-join).

Acero refuses nested payload columns (list/struct/map) inside a join, and
token arrays are our core payload — so the join itself only ever sees
(keys, row_index) per side, and every payload column (nested or scalar)
is gathered afterwards with one vectorized `take` per column. That also
means join memory is O(bucket keys), not O(bucket bytes).

The only Exchange in the physical plan is the round-robin of the
n_buckets PLAN rows (pure metadata); tests/test_spj.py asserts exactly
that. Shuffle bytes for the data: zero. Scale: parallelism == n_buckets
(rebucket() the tables to re-size it), per-task memory == one bucket of
each side — the same contract Spark's own SPJ imposes.

Fast-path eligibility (checked per side; `fallback=True` degrades to the
ordinary shuffled `read().join(read())` so callers are never wrong,
`fallback=False` raises with the reason):
  * the table is bucketed on the join key, with the SAME key column
    name, Spark type, and n_buckets on both sides (same hash => same
    bucket id for equal keys);
  * every live file sits under the current bucket spec (no pending
    rebucket migration, no unbucketed add_files imports);
  * no outstanding merge-on-read state: delta files, positional- or
    equality-delete sidecars (their resolution is a keyed shuffle by
    design — `maintain()` folds them away, restoring the fast path);
  * every live file is at the current schema version (compact() migrates
    stragglers; renames/widens would otherwise need per-file projection
    inside the task).
"""

from __future__ import annotations

import os
from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.laketable import (
    LakeTable,
    _eqdel_entries,
    _file_nb,
    _live_data,
    _posdel_entries,
)

_JOIN_TYPES = {"inner": "inner", "left": "left outer", "full": "full outer",
               "semi": "left semi", "anti": "left anti"}
# semi/anti emit left rows only; the right side contributes its KEY column
# alone, so the per-bucket read prunes every right payload byte at the
# footer — the scale case is the fence/existence probe (which staged keys
# already live in the target), where the ordinary plan shuffles the corpus
_EXISTENCE = {"semi", "anti"}


def spj_eligibility(table: LakeTable, key: str) -> str | None:
    """None if `table` qualifies for the zero-shuffle fast path on `key`,
    else a human-readable disqualification reason."""
    m = table.manifest()
    if m.bucket_key != key:
        return f"{table.name}: bucketed on {m.bucket_key!r}, join key {key!r}"
    if _posdel_entries(m.files) or _eqdel_entries(m.files):
        return f"{table.name}: outstanding delete sidecars (run maintain())"
    live = _live_data(m.files)
    if any(f.get("kind") == "delta" for f in live):
        return f"{table.name}: outstanding MOR delta files (run maintain())"
    if any(_file_nb(m, f) != m.n_buckets for f in live):
        return f"{table.name}: files under an old bucket spec (run compact())"
    if any(f["sv"] != m.current_sv for f in live):
        return f"{table.name}: files at old schema versions (run compact())"
    return None


def bucket_join(
    left: LakeTable,
    right: LakeTable,
    on: str,
    how: str = "inner",
    left_columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    suffix: str = "_r",
    fallback: bool = True,
    batch_rows: int = 1 << 16,
    split_rows: int | None = None,
) -> DataFrame:
    """Equi-join two LakeTables on their shared bucket key without
    shuffling a byte of data (see module docstring). `left_columns` /
    `right_columns` project payloads (the key is always included) —
    pruned at the parquet footer, never read. Right payload columns whose
    name collides with a left output column get `suffix`. `how='semi'` /
    `'anti'` are existence probes emitting left rows only: the right side
    reads nothing but its key column, so "which staged keys already exist
    in the target" costs the key bytes of each co-bucket, not a shuffle
    of either payload. `split_rows` is the skew valve: a bucket whose
    LEFT side exceeds it becomes ceil(rows/split_rows) tasks (manifest
    row counts, no IO) instead of one straggler — any join type except
    full, whose right-unmatched rows must be emitted exactly once per
    bucket."""
    if how not in _JOIN_TYPES:
        raise ValueError(f"how={how!r}; one of {sorted(_JOIN_TYPES)}")
    existence = how in _EXISTENCE
    if existence and right_columns:
        raise ValueError(f"how={how!r} emits left rows only; "
                         "right_columns cannot be projected")
    spark = left.spark

    reason = spj_eligibility(left, on) or spj_eligibility(right, on)
    if reason is not None:
        if not fallback:
            raise ValueError(f"bucket_join fast path unavailable: {reason}")
        lf = left.read().select(on, *_payload(left, on, left_columns))
        if existence:
            return lf.join(right.read().select(on), on=on, how="left_" + how)
        rf = right.read().select(on, *_payload(right, on, right_columns))
        for c in rf.columns:
            if c != on and c in lf.columns:
                rf = rf.withColumnRenamed(c, c + suffix)
        return lf.join(rf, on=on, how=how)

    ml, mr = left.manifest(), right.manifest()
    ltype = next(f["type"] for f in ml.schema_version.fields if f["name"] == on)
    rtype = next(f["type"] for f in mr.schema_version.fields if f["name"] == on)
    if ltype != rtype:
        raise ValueError(
            f"join key type mismatch: {left.name}.{on}:{ltype} vs "
            f"{right.name}.{on}:{rtype} (xxhash64 buckets differ by type)")
    if ml.n_buckets != mr.n_buckets:
        raise ValueError(
            f"bucket count mismatch: {left.name}={ml.n_buckets} vs "
            f"{right.name}={mr.n_buckets} (rebucket() one side)")

    lpay = _payload(left, on, left_columns)
    rpay = [] if existence else _payload(right, on, right_columns)

    # output schema: key, left payload, right payload (suffix collisions)
    lfields = {f["name"]: f for f in ml.schema_version.fields}
    rfields = {f["name"]: f for f in mr.schema_version.fields}
    taken = {on, *lpay}
    rout = []
    for c in rpay:
        name = c + suffix if c in taken else c
        taken.add(name)
        rout.append((c, name))
    out_schema = T.StructType(
        [_sfield(lfields[on])]
        + [_sfield(lfields[c]) for c in lpay]
        + [_sfield(rfields[c], rename=name) for c, name in rout]
    )
    from pyspark.sql.pandas.types import to_arrow_schema

    out_arrow = to_arrow_schema(out_schema)
    l_arrow = to_arrow_schema(T.StructType(
        [_sfield(lfields[c]) for c in [on, *lpay]]))
    r_arrow = to_arrow_schema(T.StructType(
        [_sfield(rfields[c]) for c in [on, *rpay]]))

    lgroups = _by_bucket(left, ml)
    rgroups = _by_bucket(right, mr)
    plan_rows = []
    for b in sorted(set(lgroups) | set(rgroups)):
        lp, rp = lgroups.get(b, []), rgroups.get(b, [])
        if how in ("inner", "semi") and (not lp or not rp):
            continue
        if how in ("left", "anti") and not lp:
            continue
        rpaths = _paths(rp)
        if how == "full":
            # right-unmatched rows must be emitted exactly once per
            # bucket -> a full join never splits
            plan_rows.append((b, _paths(lp), rpaths))
        else:
            # left rows partition across chunks, so the output is a
            # disjoint union; each chunk re-reads its right bucket group
            # (keys only for semi/anti)
            for chunk in _chunks(lp, split_rows):
                plan_rows.append((b, chunk, rpaths))
    plan_schema = T.StructType([
        T.StructField("bucket", T.IntegerType()),
        T.StructField("lpaths", T.ArrayType(T.StringType())),
        T.StructField("rpaths", T.ArrayType(T.StringType())),
    ])
    if not plan_rows:
        return spark.createDataFrame([], out_schema)

    join_type = _JOIN_TYPES[how]
    rrenames = dict(rout)

    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        def side(paths, schema, cols):
            if not paths:
                return schema.empty_table()
            t = pq.read_table(list(paths), columns=[on, *cols])
            return t.select([on, *cols]).cast(schema)

        for batch in batches:
            for row in batch.to_pylist():
                lt = side(row["lpaths"], l_arrow, lpay)
                rt = side(row["rpaths"], r_arrow, rpay)
                # join sees only (key, row index): Acero rejects nested
                # payloads, and this keeps join memory O(keys) anyway
                li = pa.table({on: lt[on],
                               "__li": pa.array(range(len(lt)), pa.int64())})
                if existence:
                    j = li.join(rt.select([on]), keys=on,
                                join_type=join_type)
                else:
                    ri = pa.table(
                        {on: rt[on],
                         "__ri": pa.array(range(len(rt)), pa.int64())})
                    j = li.join(ri, keys=on, join_type=join_type,
                                coalesce_keys=True)
                cols = {out_arrow.field(0).name: j[on].combine_chunks()}
                liv = j["__li"].combine_chunks()
                for c in lpay:
                    cols[c] = pc.take(lt[c].combine_chunks(), liv)
                if not existence:
                    riv = j["__ri"].combine_chunks()
                    for c in rpay:
                        cols[rrenames[c]] = pc.take(
                            rt[c].combine_chunks(), riv)
                out = pa.table(cols).cast(out_arrow)
                yield from out.to_batches(max_chunksize=batch_rows)

    plan = spark.createDataFrame(plan_rows, plan_schema)
    # one bucket per task: the repartition moves n_buckets METADATA rows —
    # the only Exchange in the whole plan
    return plan.repartition(len(plan_rows)).mapInArrow(run, out_schema)


# fn name -> (arrow aggregate, spark fallback builder)
_AGG_FNS = {
    "sum": ("sum", F.sum),
    "count": ("count", F.count),
    "count_distinct": ("count_distinct", F.countDistinct),
    "min": ("min", F.min),
    "max": ("max", F.max),
    "mean": ("mean", F.avg),
}


def bucket_agg(
    table: LakeTable,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    fallback: bool = True,
    batch_rows: int = 1 << 16,
) -> DataFrame:
    """GROUP BY over a LakeTable with ZERO shuffle of the data. When the
    grouping keys include the bucket key, every group lives wholly inside
    one bucket, so the aggregation decomposes into n_buckets independent
    local group-bys — one Arrow task per bucket, Acero's hash aggregate.
    The shuffled plan's cost at high key cardinality (per-doc / per-user
    aggregates, where #groups ~ #rows) is a full exchange of the partial
    aggregates, i.e. roughly the projected table; here the only Exchange
    moves n_buckets metadata rows.

    `aggs`: {out_name: (column, fn)} with fn in sum / count /
    count_distinct / min / max / mean; `("*", "count")` counts rows.
    Null grouping keys form a group and null inputs are skipped by
    count/count_distinct — identical to Spark SQL. Ineligible layouts
    (`fallback=True`) degrade to the ordinary shuffled groupBy."""
    m = table.manifest()
    bad = [k for k in keys if k not in
           {f["name"] for f in m.schema_version.fields}]
    if bad:
        raise ValueError(f"{table.name}: unknown key columns {bad}")
    names = {f["name"] for f in m.schema_version.fields}
    specs = []
    for out, (c, fn) in aggs.items():
        if out in keys:
            raise ValueError(f"output name {out!r} collides with a key")
        if fn not in _AGG_FNS:
            raise ValueError(f"{out}: fn {fn!r}; one of {sorted(_AGG_FNS)}")
        if c == "*" and fn != "count":
            raise ValueError(f"{out}: '*' only combines with 'count'")
        if c != "*" and c not in names:
            raise ValueError(f"{out}: unknown column {c!r}")
        specs.append((out, c, fn))

    reason = (spj_eligibility(table, m.bucket_key)
              or (None if m.bucket_key in keys else
                  f"{table.name}: grouping keys {keys} do not include "
                  f"bucket key {m.bucket_key!r}"))
    if reason is not None:
        if not fallback:
            raise ValueError(f"bucket_agg fast path unavailable: {reason}")
        exprs = [
            (F.count(F.lit(1)) if c == "*" else _AGG_FNS[fn][1](c))
            .alias(out) for out, c, fn in specs]
        return table.read().groupBy(*keys).agg(*exprs)

    in_cols = sorted({c for _, c, _ in specs if c != "*"} - set(keys))
    fields = {f["name"]: f for f in m.schema_version.fields}
    from pyspark.sql.pandas.types import from_arrow_type, to_arrow_schema

    side_arrow = to_arrow_schema(T.StructType(
        [_sfield(fields[c]) for c in [*keys, *in_cols]]))

    # arrow names the outputs <col>_<fn> / count_all; derive the result
    # schema (incl. arrow's sum/count upcasts) by aggregating zero rows
    arrow_spec, arrow_names, seen = [], [], set()
    for out, c, fn in specs:
        spec, nm = ((([], "count_all"), "count_all") if c == "*" else
                    ((c, _AGG_FNS[fn][0]), f"{c}_{_AGG_FNS[fn][0]}"))
        if nm not in seen:  # two outputs may share one arrow aggregate
            seen.add(nm)
            arrow_spec.append(spec)
        arrow_names.append(nm)
    probe = side_arrow.empty_table().group_by(keys).aggregate(arrow_spec)
    out_schema = T.StructType(
        [_sfield(fields[k]) for k in keys]
        + [T.StructField(out, from_arrow_type(probe.schema.field(nm).type),
                         nullable=True)
           for (out, _, _), nm in zip(specs, arrow_names)])
    out_arrow = to_arrow_schema(out_schema)
    groups = _by_bucket(table, m)
    if not groups:
        return table.spark.createDataFrame([], out_schema)
    plan_schema = T.StructType([
        T.StructField("bucket", T.IntegerType()),
        T.StructField("paths", T.ArrayType(T.StringType())),
    ])
    plan_rows = [(b, _paths(g)) for b, g in sorted(groups.items())]
    outs = [s[0] for s in specs]

    def run(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for batch in batches:
            for row in batch.to_pylist():
                t = pq.read_table(list(row["paths"]),
                                  columns=[*keys, *in_cols])
                t = t.select([*keys, *in_cols]).cast(side_arrow)
                g = t.group_by(keys).aggregate(arrow_spec)
                cols = {k: g[k] for k in keys}
                for out, nm in zip(outs, arrow_names):
                    cols[out] = g[nm]
                yield from (pa.table(cols).cast(out_arrow)
                            .to_batches(max_chunksize=batch_rows))

    plan = table.spark.createDataFrame(plan_rows, plan_schema)
    return plan.repartition(len(plan_rows)).mapInArrow(run, out_schema)


def _payload(table: LakeTable, on: str, columns: list[str] | None) -> list[str]:
    names = [f["name"] for f in table.manifest().schema_version.fields]
    if columns is None:
        return [c for c in names if c != on]
    missing = set(columns) - set(names)
    if missing:
        raise ValueError(f"{table.name}: unknown columns {sorted(missing)}")
    return [c for c in columns if c != on]


def _sfield(f: dict, rename: str | None = None) -> T.StructField:
    return T.StructField(rename or f["name"],
                         _parse_type(f["type"]), nullable=True)


def _parse_type(s: str) -> T.DataType:
    from embulk_output_databricks_spark.sources.laketable import _type_of

    return _type_of(s)


def _by_bucket(table: LakeTable, m) -> dict[int, list[tuple[str, int]]]:
    groups: dict[int, list[tuple[str, int]]] = defaultdict(list)
    for f in _live_data(m.files):
        groups[f["bucket"]].append(
            (os.path.join(table.root, f["path"]), f["rows"]))
    return dict(groups)


def _paths(group: list[tuple[str, int]]) -> list[str]:
    return [p for p, _ in group]


def _chunks(group: list[tuple[str, int]],
            split_rows: int | None) -> list[list[str]]:
    """Split one bucket's file list into chunks of <= split_rows manifest
    rows (each chunk at least one file) — the skew valve: a hot bucket
    becomes several tasks instead of one straggler."""
    if not split_rows:
        return [_paths(group)]
    out, cur, cur_rows = [], [], 0
    for p, r in group:
        if cur and cur_rows + r > split_rows:
            out.append(cur)
            cur, cur_rows = [], 0
        cur.append(p)
        cur_rows += r
    if cur:
        out.append(cur)
    return out
