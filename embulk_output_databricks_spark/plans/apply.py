"""Apply-mode dispatch — the reference's five load modes over a LakeTable.

Mode semantics pinned by the reference's e2e matrix
(TestDatabricksOutputPluginByMode.java:24-139, README.md:50-69):

  insert           staged append, atomic           (B2)
  insert_direct    unstaged append; the reference marks it non-transactional
                   (README.md:54-57) — our commit is atomic anyway, but the
                   mode is kept distinct: it skips dedup/fence in the replay
                   driver, i.e. at-least-once (B3)
  truncate_insert  old rows gone, new present, one snapshot (B4)
  replace          atomic table swap, may change schema (B5)
  merge            keyed upsert with merge_rules (B6/B8), deletes as extension

before_load / after_load SQL hooks (B9, README.md:45-46) run against a temp
view of the target named after the table; their results are discarded, they
exist for side-effect parity (e.g. auditing queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pyspark.sql import types as T

from ..config import ApplyMode, ConfigError, JobConfig
from ..sources.laketable import LakeCatalog, LakeTable, Manifest, _type_of
from .merge import merge_apply, merge_apply_mor


def _run_hook(table: LakeTable, sql: str | None) -> None:
    if not sql:
        return
    table.read().createOrReplaceTempView(table.name)
    table.spark.sql(sql).collect()


DEFAULT_MERGE_KEYS = ["doc_id"]


def resolve_merge_keys(cfg: JobConfig, table: LakeTable | None) -> list[str]:
    """Merge-key discovery (ref README.md:36 derives keys from the target
    PK when merge_keys is omitted, TestDatabaseMetadata.java:51-56): the
    lake analog reads the Iceberg-style `identifier_fields` table
    property. Precedence: explicit config > table property > ["doc_id"].
    Property names are validated against the live schema so a stale
    annotation fails fast instead of merging on a ghost column."""
    if cfg.merge_keys is not None:
        return cfg.merge_keys
    if table is not None:
        m = table.manifest()
        prop = m.properties.get("identifier_fields")
        if prop:
            keys = [c.strip() for c in prop.split(",") if c.strip()]
            names = {f["name"] for f in m.schema_version.fields}
            missing = [k for k in keys if k not in names]
            if missing:
                raise ConfigError(
                    f"identifier_fields names columns not in the target "
                    f"schema: {missing} (property {prop!r})")
            return keys
    return list(DEFAULT_MERGE_KEYS)


def ensure_table(catalog: LakeCatalog, cfg: JobConfig, schema) -> LakeTable:
    """Auto-create the target when missing (ref B11: auto-create target,
    README.md:51,55,67). cfg.column_types overrides per-column types at
    create time — the engine's column_options.type (ref README.md:40-41,
    type matrix TestDatabricksOutputPluginByOutputType.java:14-102); data
    conforms automatically because every write casts to the manifest
    schema."""
    if catalog.table_exists(cfg.table):
        return catalog.load(cfg.table)
    if cfg.column_types:
        known = {f.name for f in schema.fields}
        unknown = set(cfg.column_types) - known
        if unknown:
            raise ConfigError(f"column_types for unknown columns: {sorted(unknown)}")
        schema = T.StructType([
            T.StructField(f.name, _type_of(cfg.column_types[f.name]), f.nullable)
            if f.name in cfg.column_types else f
            for f in schema.fields
        ])
    if cfg.mode is ApplyMode.MERGE:
        keys = resolve_merge_keys(cfg, None)
    elif cfg.merge_keys:
        keys = cfg.merge_keys
    elif cfg.n_buckets and DEFAULT_MERGE_KEYS[0] in {f.name for f in schema.fields}:
        # merge_keys defaults to None (discovery), but a non-merge
        # auto-create still wants bucketing — fall back to the default key
        # so bucket pruning isn't silently lost (this restores the
        # pre-discovery default, where merge_keys=['doc_id'] bucketed
        # every auto-create). The write-side co-locating shuffle is the
        # price of pruned reads; an append-only pipeline that wants the
        # unbucketed layout sets n_buckets=0 explicitly.
        keys = list(DEFAULT_MERGE_KEYS)
    else:
        keys = []
    bucket_key = keys[0] if keys else None
    props = None
    if cfg.mode is ApplyMode.MERGE and keys:
        # advertise the merge keys on the created table (identifier_fields)
        # so a later job with merge_keys omitted discovers the same keys —
        # the metadata round-trip the reference gets from the PK catalog
        props = {"identifier_fields": ",".join(keys)}
    return catalog.create_table(cfg.table, schema, n_buckets=cfg.n_buckets,
                                bucket_key=bucket_key, properties=props)


def apply_batch(
    table: LakeTable,
    staged: DataFrame,
    cfg: JobConfig,
    properties: dict | None = None,
    hook_before: bool = True,
    hook_after: bool = True,
    prepass_row=None,
) -> Manifest:
    """Commit one staged batch to the target under cfg.mode.

    `staged` carries the target payload columns (plus `op` for merge).
    For merge, run operators.lww_dedup on the raw events first — this
    function applies, it does not deduplicate.

    hook_before/hook_after let a chunked caller (replay A6) run
    before_load once before the first chunk and after_load once after the
    last — the reference brackets the whole load, not each COPY
    (DatabricksOutputConnection.java:150-152,166-168).
    """
    if hook_before:
        _run_hook(table, cfg.before_load)
    mode = cfg.mode
    if mode in (ApplyMode.INSERT, ApplyMode.INSERT_DIRECT):
        drop = [c for c in staged.columns if c == "op"]
        m = table.append(staged.drop(*drop), properties)
    elif mode is ApplyMode.TRUNCATE_INSERT:
        drop = [c for c in staged.columns if c == "op"]
        m = table.overwrite(staged.drop(*drop), properties)
    elif mode is ApplyMode.REPLACE:
        drop = [c for c in staged.columns if c == "op"]
        m = table.replace(staged.drop(*drop), properties=properties)
    elif mode is ApplyMode.MERGE:
        keys = resolve_merge_keys(cfg, table)
        if cfg.merge_strategy == "mor":
            m = merge_apply_mor(
                table,
                staged,
                keys=keys,
                support_deletes=cfg.support_deletes,
                properties=properties,
            )
        elif cfg.change_feed:
            from ..streaming.cdf import apply_with_cdf

            m = apply_with_cdf(
                table,
                staged,
                keys=keys,
                support_deletes=cfg.support_deletes,
                properties=properties,
                broadcast_threshold_rows=cfg.broadcast_merge_threshold,
            )
        else:
            m = merge_apply(
                table,
                staged,
                keys=keys,
                merge_rules=cfg.merge_rules,
                support_deletes=cfg.support_deletes,
                properties=properties,
                broadcast_threshold_rows=cfg.broadcast_merge_threshold,
                guard_col=cfg.merge_guard_col,
                predictive=cfg.predictive_merge,
                predictive_min_rows=cfg.predictive_min_rows,
                prepass_row=prepass_row,
            )
    else:  # pragma: no cover
        raise ValueError(f"unhandled mode {mode}")
    if hook_after:
        _run_hook(table, cfg.after_load)
    return m
