"""Checkpointed micro-batch replay driver — the engine's EP1/EP2/EP3
(lifecycle design in SURVEY.md §3).

Per batch:  fence check -> schema-evolution DDL -> LWW dedup -> apply
(merge/append/...) -> checkpoint+lineage. The checkpoint write is strictly
after the snapshot commit; CheckpointStore reconciles the crash window
between them, so re-running any prefix of the binlog is idempotent
(FIXTURES.md S11).

The reference's analog of this loop is `transaction()` fanning out loader
tasks then running one commit SQL (DatabricksOutputPlugin.java:166-186);
its per-file upload/COPY pipelining (DatabricksCopyBatchInsert.java:88-93)
maps to Spark task parallelism inside each batch here.

Scale notes (100 TB / 10^10 events):
  * the binlog scan is filtered by batch_id before anything else — with a
    batch_id-partitioned binlog source this is partition pruning, so each
    micro-batch reads only its slice.
  * dedup is the associative max-struct aggregate (map-side combine ->
    single shuffle on doc_id); merge shuffles only the bucket-pruned target
    slice. No driver-side data ever exceeds O(#partitions) metric rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import ApplyMode, JobConfig
from ..operators.lww import lww_dedup
from ..plans.apply import apply_batch, ensure_table, resolve_merge_keys
from ..schema import BINLOG_SCHEMA, PAYLOAD_COLUMNS, SEQUENCES_SCHEMA
from ..sources.laketable import LakeCatalog, LakeTable, qcol
from .checkpoint import CheckpointStore


class InjectedCrash(RuntimeError):
    """Test hook: simulated crash between snapshot commit and checkpoint."""


# read_ahead='auto': enable prefetch (width 1) when the measured
# source-build wall is at least this share of the first batch's apply
# wall. The persist materialization is an EXTRA cost the serial path
# never pays (its lazy scan rides the apply job), so a floor is needed —
# but the r3 threshold of 0.5 was calibrated against a depth-2 fixed leg
# that over-contends: the r4 like-for-like bench (depth 1, shared warm
# start, min-over-repeats) measured a 1.37x win at fetch/apply ~0.35,
# which the 0.5 rule refused. 0.2 keeps prefetch off for genuinely
# trivial sources (where the overlap cannot recoup the persist) and on
# wherever the measured depth-1 record says it pays. The ratio alone is
# not enough: at tiny batch sizes BOTH walls are fixed-job-overhead
# dominated and the ratio is noise, so a sub-second absolute floor also
# gates — a source that builds in under a second cannot amortize the
# prefetch thread + cache entry it would occupy.
AUTO_READ_AHEAD_SHARE = 0.2
AUTO_READ_AHEAD_MIN_FETCH_S = 1.0

# merge_strategy='auto' compaction horizon when mor_compact_every is 0:
# the cost model assumes deltas are folded every N mor batches, so auto
# mode enforces that cadence itself rather than letting resolution cost
# grow without bound
AUTO_COMPACT_HORIZON = 8

# merge_strategy='auto' FULL-CYCLE cost model (r4: the write-side-only
# ratio rule picked MOR in a regime where COW won the bench's sync-cycle
# score — BENCH_r03 auto_strategy.steady_small, auto_vs_best 0.75).
# Per-row cost weights RELATIVE to the COW merge-rewrite unit cost,
# calibrated from the driver-filed BENCH_r03 steady_small record
# (t=750k, b=30k, 64 buckets, local[32]):
#   cow apply  = fixed + c_w*(t+b)        c_w = 2.64e-6 s/row
#   mor fold   = 11.97 s over ~870k rows  -> 5.2x c_w per row
#   mor read   = +5.92 s over ~870k rows  -> 2.6x c_w per row resolution
# MOR's deferred costs per batch: winner-resolution tax on every consumer
# read of the live table (reads/batch u, unknowable a priori — default
# AUTO_CONSUMER_READS_PER_BATCH, forced to 1.0 when the job itself reads
# per batch via rollups/history) plus the amortized compaction
# fold (every `horizon` batches). Both scale with (table + avg backlog),
# backlog ~ horizon/2 x batch. Crossover at the defaults lands at
# table/batch ~ 40 — vs the old write-only rule's 2.
AUTO_MOR_READ_WEIGHT = 2.6   # per-row MOR winner-resolution vs cow rewrite
AUTO_MOR_FOLD_WEIGHT = 5.2   # per-row compaction fold vs cow rewrite
AUTO_CONSUMER_READS_PER_BATCH = 0.1  # assumed external read cadence


def _scheduler_is_fair(sc) -> bool:
    """True when the session was started with the FAIR scheduler (the
    stage-ahead precondition — see replay_pipelined's FIFO guard)."""
    return sc.getConf().get(
        "spark.scheduler.mode", "FIFO").upper() == "FAIR"


class EvolutionOp:
    """Schema-change instruction carried by the stream (applied before the
    batch's data events — the column_options-DDL leg, SURVEY.md M2)."""

    def __init__(self, kind: str, **kw):
        assert kind in ("add", "rename", "widen", "drop")
        self.kind = kind
        self.kw = kw

    def apply(self, table: LakeTable) -> None:
        if self.kind == "add":
            table.add_column(self.kw["name"], self.kw["type"],
                             default=self.kw.get("default"))
        elif self.kind == "rename":
            table.rename_column(self.kw["old"], self.kw["new"])
        elif self.kind == "drop":
            table.drop_column(self.kw["name"])
        else:
            table.widen_column(self.kw["name"], self.kw["type"])


class ReplayDriver:
    def __init__(self, catalog: LakeCatalog, cfg: JobConfig,
                 target_schema=SEQUENCES_SCHEMA, table: LakeTable | None = None,
                 source_id: str = ""):
        self.catalog = catalog
        self.cfg = cfg
        # `table` injects an existing handle — e.g. a BRANCH handle for the
        # write-audit-publish flow (LakeTable.create_branch); default is the
        # catalog-managed main table. The fence store lives under the shared
        # table root either way, so batches audited on a branch stay fenced
        # after publish.
        # `source_id` enables multi-source fan-in: N sharded binlog streams
        # (disjoint key ranges) into ONE table, each source with its own
        # batch-id sequence, fence namespace, and crash reconciliation.
        self.table = table if table is not None else ensure_table(
            catalog, cfg, target_schema)
        if cfg.merge_keys is None:
            # merge-key discovery (ref README.md:36 PK-derivation analog):
            # resolve ONCE against the live target and pin the result on a
            # PRIVATE copy of the config — every later consumer (dedup,
            # quarantine, SCD2, rollups) sees the same concrete key list,
            # and re-resolving mid-run could not change it anyway
            # (identifier_fields is a creation-time stamp). The copy keeps
            # the caller's JobConfig untouched: one config reused for two
            # drivers/tables with different identifier_fields must not
            # leak the first target's discovered keys into the second.
            import dataclasses

            self.cfg = cfg = dataclasses.replace(
                cfg, merge_keys=resolve_merge_keys(cfg, self.table))
        self.source_id = source_id
        self.stage_ahead_active = False  # observability: FIFO guard result
        self.ckpt = CheckpointStore(self.table, source_id=source_id)
        # merge_strategy='auto': pre-built per-strategy config variants the
        # per-batch cost model picks from (they carry the resolved merge
        # keys and every other knob verbatim)
        self._strategy_cfgs: dict[str, JobConfig] = {}
        if cfg.merge_strategy == "auto":
            import dataclasses

            self._strategy_cfgs = {
                s: dataclasses.replace(cfg, merge_strategy=s)
                for s in ("cow", "mor")
            }
        self._last_batch_rows: int | None = None  # auto cost-model input
        self._applied_since_compact = 0  # mor auto-compact cadence counter
        self._committed_since_fold = 0   # checkpoint-fold cadence counter
        self._events_per_sec: float | None = None  # EWMA apply rate
                                                   # (adaptive chunking)
        # maintained downstream rollups (cfg.rollups): created/seeded here,
        # advanced after every batch by their own consumed-version watermark
        self.rollups: list[tuple] = []
        if cfg.rollups:
            from .aggmaint import ensure_rollup

            for r in cfg.rollups:
                name = f"{cfg.table}__{r['name']}"  # per-target namespace
                agg = ensure_rollup(catalog, self.table, name,
                                    r["group_by"], r.get("sums", []))
                self.rollups.append((agg, r["group_by"], r.get("sums", [])))
        # maintained SCD2 history (cfg.history): full per-key version
        # history of the stream, applied per batch BEFORE the fence
        # checkpoint — crash-rerun safe because scd2_apply is idempotent
        # by (merge_keys, tie) identity (streaming/scd2.py)
        self.history: tuple | None = None
        if cfg.history:
            from pyspark.sql import types as T

            from .scd2 import ensure_scd2

            ts_col = cfg.history.get("ts_col", "seq_lsn")
            tie_col = cfg.history.get("tie_col", "event_id")
            sch = self.table.manifest().schema()
            fields = list(sch.fields)
            have = {f.name for f in fields}
            envelope = {f.name: f.dataType for f in BINLOG_SCHEMA.fields}
            for c in (ts_col, tie_col):
                if c not in have:
                    fields.append(T.StructField(
                        c, envelope.get(c, T.LongType())))
            hist = ensure_scd2(
                catalog, f"{cfg.table}__{cfg.history['name']}",
                T.StructType(fields), keys=cfg.merge_keys, ts_col=ts_col,
                n_buckets=self.table.manifest().n_buckets)
            self.history = (hist, ts_col, tie_col)

    def _choose_strategy(self) -> str:
        """Per-batch COW-vs-MOR choice for merge_strategy='auto' — the
        tokmaint cost-model pattern applied to the apply path, scored on
        the FULL sync cycle (apply + consumer-read resolution tax +
        amortized compaction fold — exactly what bench_auto_strategy
        charges), not bare apply throughput. Inputs are metadata only
        (manifest row count + the previous batch's observed size). MOR
        wins only when the table dwarfs the batch enough that the saved
        rewrite exceeds BOTH deferred taxes; COW wins otherwise —
        including the bootstrap batch (no size estimate yet, table small
        anyway), restatement/backfill batches comparable to the table,
        and ANY regime where the job itself re-reads the live table every
        batch (rollups/history force the read cadence to 1)."""
        if self.cfg.merge_strategy != "auto":
            return self.cfg.merge_strategy
        if self.cfg.mode is not ApplyMode.MERGE:
            return "cow"
        est = self._last_batch_rows
        if not est or est <= 0:
            return "cow"
        # manifest-only estimate, NEVER IO: row_count() must count
        # targeted files when equality-delete sidecars are outstanding,
        # which would put a data job on the apply critical path; the
        # estimate's upper-bound slack is fine for a crossover heuristic
        t = self.table.row_count_estimate()
        h = self.cfg.mor_compact_every or AUTO_COMPACT_HORIZON
        # maintained rollups/history read the resolved table every batch:
        # MOR's resolution tax lands on the apply critical path itself
        u = (1.0 if (self.rollups or self.history)
             else AUTO_CONSUMER_READS_PER_BATCH)
        live = t + (h / 2) * est  # avg resolved-read size between folds
        cow_cost = t + est        # join + rewrite touched buckets
        mor_cost = est + (u * AUTO_MOR_READ_WEIGHT
                          + AUTO_MOR_FOLD_WEIGHT / h) * live
        return "mor" if mor_cost < cow_cost else "cow"

    def _payload_cols(self) -> list[str]:
        return [f["name"] for f in self.table.manifest().schema_version.fields]

    def _event_names(self) -> dict[str, list[str]]:
        """current column name -> candidate event column names, newest first.

        After a rename the upstream stream may still emit the old name for a
        while (SURVEY.md §7.4: 'the event stream must carry old->new
        mapping'); field ids in the manifest give us that mapping for free.
        """
        m = self.table.manifest()
        hist: dict[int, list[str]] = {}
        for sv in sorted(m.schema_versions, key=lambda s: s.sv):
            for f in sv.fields:
                names = hist.setdefault(f["id"], [])
                if f["name"] not in names:
                    names.append(f["name"])
        return {hist[f["id"]][-1]: list(reversed(hist[f["id"]]))
                for f in m.schema_version.fields}

    def _staged_frame(self, events: DataFrame) -> DataFrame:
        """The apply-ready frame for one batch (or chunk): event columns
        mapped to current names (renames resolved via field-id history),
        LWW dedup for merge mode. Used by run_batch and by the
        stage-ahead prefetcher (replay_pipelined), which builds it one
        batch EARLY on a background thread — staleness is caught at
        consume time by the schema-version gate (any evolution bumps sv)
        and merge_apply's bucket-spec coverage check."""
        name_map = self._event_names()
        cols = []
        for cur, candidates in name_map.items():
            src = next((n for n in candidates if n in events.columns), None)
            cols.append(qcol(src).alias(cur) if src else F.lit(None).alias(cur))
        if "op" in events.columns:
            cols.append(F.col("op"))
        if self.cfg.mode is ApplyMode.MERGE:
            return lww_dedup(
                events, keys=self.cfg.merge_keys, order=["seq_lsn", "event_id"],
                strategy=self.cfg.dedup_strategy, salt=self.cfg.dedup_salt,
            ).select(*cols)
        return events.select(*cols)

    def _lineage(self, events: DataFrame) -> tuple[list[dict], int, int, int]:
        """One distributed pass: per-partition metrics + lsn offset range."""
        n_tok = F.col("n_tok") if "n_tok" in events.columns else F.lit(0)
        rows = (
            events.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(
                F.count(F.lit(1)).alias("events_in"),
                F.sum(F.coalesce(n_tok, F.lit(0))).alias("n_tok_sum"),
                F.min("seq_lsn").alias("lo"),
                F.max("seq_lsn").alias("hi"),
            )
            .collect()
        )
        if not rows:
            return [], 0, -1, 0
        lineage = [
            {"partition_id": r["partition_id"], "events_in": r["events_in"],
             "n_tok_sum": int(r["n_tok_sum"] or 0)}
            for r in rows
        ]
        lo = min(r["lo"] for r in rows)
        hi = max(r["hi"] for r in rows)
        total = sum(r["events_in"] for r in rows)
        return lineage, lo, hi, total

    def _quarantine(self, events: DataFrame, batch_id: int
                    ) -> tuple[DataFrame, int]:
        """Split envelope-invalid rows out of the batch, park them under
        <table root>/quarantine/batch-<id>/ with a __reason column, and
        return (valid rows, quarantined count). The park write is
        mode=overwrite per batch dir, so a crash-and-rerun rewrites the
        identical set (idempotent, like everything else on the batch path);
        the count rides the park job's own Observation — no extra pass."""
        import os as _os

        from pyspark.sql import Observation

        null_key = F.lit(False)
        if self.cfg.mode is ApplyMode.MERGE:
            for k in self.cfg.merge_keys:
                if k in events.columns:
                    null_key = null_key | qcol(k).isNull()
        bad_op = (F.col("op").isNotNull() & ~F.col("op").isin("I", "U", "D")) \
            if "op" in events.columns else F.lit(False)
        invalid = null_key | bad_op
        reason = (F.when(null_key, F.lit("null_merge_key"))
                  .otherwise(F.lit("invalid_op")))
        qdir = _os.path.join(self.table.root, "quarantine",
                             f"batch-{self.source_id or 'default'}-{batch_id:012d}")
        obs = Observation(f"quarantine-{batch_id}-{self.table.name}")
        (events.filter(invalid).withColumn("__reason", reason)
         .observe(obs, F.count(F.lit(1)).alias("n"))
         .write.mode("overwrite").parquet(qdir))
        return events.filter(~invalid), int(obs.get["n"] or 0)

    def run_batch(self, events: DataFrame, batch_id: int,
                  evolution: list[EvolutionOp] | None = None,
                  crash_before_checkpoint: bool = False,
                  collect_metrics: bool | str = True,
                  defer_checkpoint: bool = False,
                  prestaged: dict | None = None) -> dict | None:
        """Apply one batch exactly once. Returns the checkpoint record, or
        None if the fence rejected a replayed batch.

        collect_metrics: True/'full' runs a dedicated per-partition lineage
        pass; 'light' piggy-backs (count, lsn range) on the apply job itself
        via the Observation API — ZERO extra passes over the batch, the
        steady-state production mode; False skips metrics entirely.

        defer_checkpoint: apply everything but do NOT write the fence
        checkpoint; instead return a pending record the caller later hands
        to commit_deferred(). The transactional fan-out uses this: the
        apply lands on a txn branch, the catalog publish makes it visible,
        and only THEN may the fence say "committed" (a fence written
        before publish would skip a batch whose data never became
        visible). The crash window publish->checkpoint stays safe the same
        way as ever: reconciliation trusts the snapshot's batch stamp.
        """
        if self.cfg.merge_strategy == "auto" and collect_metrics is False:
            # the cost model needs the batch's observed size; the light
            # observation rides the apply job itself — zero extra passes
            collect_metrics = "light"
        fenced = self.cfg.mode is not ApplyMode.INSERT_DIRECT
        if fenced and self.ckpt.is_committed(batch_id):
            # fence hit: replayed batch is a no-op (S11). Rollups still
            # catch up — a crash after the apply but before the rollup sync
            # lands here on rerun, and the watermark makes this a no-op
            # whenever they are already current. The SCD2 history catches
            # up the same way: a crash between the reconciled apply commit
            # and the history merge lands here with a stale consumed-batch
            # watermark, and _history_apply folds exactly this batch in.
            self.sync_rollups()
            if self.history:
                self._history_apply(events, batch_id)
            return None

        for op in evolution or []:
            op.apply(self.table)

        if self.cfg.auto_evolve:
            # Delta mergeSchema analog: batch columns the target lacks are
            # added (metadata-only, old rows read NULL) instead of dropped.
            # Names any historical schema version ever used (renames!) and
            # the change-event envelope are NOT new columns.
            known: set[str] = set()
            for cands in self._event_names().values():
                known.update(cands)
            envelope = {"op", "seq_lsn", "event_id", "batch_id", "table"}
            for f in events.schema.fields:
                if f.name not in known and f.name not in envelope:
                    self.table.add_column(f.name, f.dataType.simpleString())

        # apply-level dead letter: rows whose change-event ENVELOPE is
        # invalid (NULL merge key — unkeyable; op outside I/U/D) are split
        # out BEFORE metrics/dedup and parked under the table root with a
        # reason column, instead of silently applying garbage (a NULL key
        # would otherwise become a legitimate LWW key; an unknown op would
        # act as an upsert). The Kafka wire layer dead-letters unparseable
        # FRAMES (sources/kafka_tail.py); this catches well-formed frames
        # carrying broken envelopes — Kafka Connect's errors.tolerance=all
        # posture, opt-in because dropping input is policy, not a default.
        q_n = 0
        if self.cfg.quarantine:
            events, q_n = self._quarantine(events, batch_id)

        # stage-ahead consume gate (replay_pipelined prefetch): the bundle
        # was built against an earlier manifest on a background thread.
        # Valid iff the schema version is unchanged (EVERY evolution —
        # explicit ops above, auto_evolve adds — bumps sv, so a stale name
        # mapping cannot slip through), quarantine did not rewrite the
        # events, and no full-metrics chunking (which stages per chunk).
        # Invalid -> fall through to the normal path using the raw events.
        pre = None
        if (prestaged is not None
                and self.cfg.mode is ApplyMode.MERGE
                and not self.cfg.quarantine
                and collect_metrics is not True
                and prestaged.get("sv") == self.table.manifest().current_sv):
            pre = prestaged

        # the batch is consumed by up to two passes (lineage metrics + the
        # dedup/apply plan). Caching is opt-in: columnar cache build costs
        # more than a rescan for cheap sources (seeded synth / pruned
        # parquet slice), and those are the common case here.
        if self.cfg.persist_source and pre is None:
            events = events.persist()

        obs = None
        lineage, lo, hi, n_in = [], -1, -1, -1
        if pre is not None:
            # light metrics were computed by the prefetch thread's own agg
            lrow = pre["light"]
            n_in = int(lrow["events_in"] or 0)
            lo = lrow["lo"] if lrow["lo"] is not None else -1
            hi = lrow["hi"] if lrow["hi"] is not None else -1
        elif collect_metrics == "light":
            from pyspark.sql import Observation

            # name carries the table: concurrent per-table applies (multi.py
            # parallel mode) must not collide on observation identity
            obs = Observation(f"batch-{batch_id}-{self.table.name}")
            events = events.observe(
                obs,
                F.count(F.lit(1)).alias("events_in"),
                F.min("seq_lsn").alias("lo"),
                F.max("seq_lsn").alias("hi"),
            )
        elif collect_metrics:
            lineage, lo, hi, n_in = self._lineage(events)

        stage = self._staged_frame

        # A6 chunking (ref batch_size, DatabricksCopyBatchInsert.java:78-100):
        # an oversized batch splits into lsn-range sub-batches applied in
        # order. Correct for append modes trivially and for merge because a
        # later chunk's writer wins per key — same final state as one apply.
        # The fence stamp rides ONLY the last chunk's snapshot, so a crash
        # mid-chunks leaves the batch unfenced and the rerun (idempotent by
        # LWW order) completes it. Needs known (n, lo, hi): full-metrics
        # mode only; chunking does not apply to truncate_insert/replace
        # (each overwrite would clobber the previous chunk).
        nmax = self.cfg.max_events_per_batch
        # adaptive chunk sizing (target_apply_seconds): size chunks from
        # the observed apply rate so each lands near the wall-clock
        # target — bounded commit latency whatever the upstream delivers
        # (a backfill burst chunks finer, a steady tail coarser). The
        # static max_events_per_batch stays the hard ceiling; the first
        # batch (no rate yet) uses it unchanged.
        if (self.cfg.target_apply_seconds > 0
                and self._events_per_sec is not None):
            adaptive = max(int(self._events_per_sec
                               * self.cfg.target_apply_seconds), 1)
            nmax = min(nmax, adaptive) if nmax else adaptive
        ranges: list[tuple[int, int] | None] = [None]
        if (nmax and collect_metrics is True and n_in > nmax
                and self.cfg.mode in (ApplyMode.MERGE, ApplyMode.INSERT,
                                      ApplyMode.INSERT_DIRECT)):
            import math
            n_chunks = math.ceil(n_in / nmax)
            span = (hi - lo + 1) / n_chunks
            bounds = [lo + round(i * span) for i in range(n_chunks)] + [hi + 1]
            ranges = [(bounds[i], bounds[i + 1]) for i in range(n_chunks)]

        # batch_id is the fence anchor and MUST ride the snapshot commit
        # itself (crash reconciliation reads it back); lsn stats are
        # informational and may be filled post-action from the observation
        # (a crash-recovered light batch simply has no lsn stats).
        # source_id is set UNCONDITIONALLY (empty = single-stream): snapshot
        # properties inherit, so a later source-less batch must not wear an
        # earlier source's tag in crash reconciliation
        props = {"batch_id": batch_id, "source_id": self.source_id}
        if obs is None:
            props.update({"lsn_from": lo, "lsn_to": hi + 1, "events_in": n_in})
        import time as _time

        chosen = self._choose_strategy()
        apply_cfg = self._strategy_cfgs.get(chosen, self.cfg)
        t_apply = _time.monotonic()
        try:
            for i, rng in enumerate(ranges):
                ev_i = events if rng is None else events.filter(
                    (F.col("seq_lsn") >= rng[0]) & (F.col("seq_lsn") < rng[1]))
                last = i == len(ranges) - 1
                # interim chunks commit WITHOUT the fence props (properties
                # are inherited across snapshots; only the completing chunk
                # may stamp batch_id); before/after_load hooks bracket the
                # whole batch, not each chunk (ref runs them once per load,
                # DatabricksOutputConnection.java:150-152,166-168)
                m = apply_batch(self.table,
                                pre["staged"] if pre is not None else stage(ev_i),
                                apply_cfg,
                                properties=props if last else None,
                                hook_before=(i == 0), hook_after=last,
                                prepass_row=(pre["row"] if pre is not None
                                             else None))
        except BaseException:
            if not self.cfg.keep_staging_on_error:
                self.table.clean_staging()  # ref delete_stage_on_error (A3)
            raise
        finally:
            if self.cfg.persist_source and pre is None:
                events.unpersist()
        apply_s = _time.monotonic() - t_apply
        if obs is not None:
            got = obs.get  # ready: the apply action executed the observed plan
            lo, hi, n_in = got["lo"], got["hi"], got["events_in"]
        if n_in is not None and n_in > 0:
            # next batch's auto cost-model estimate (steady-state batches
            # are similar-sized; a backfill burst flips the choice one
            # batch late, which the crossover rule tolerates)
            self._last_batch_rows = int(n_in)

        if crash_before_checkpoint:
            raise InjectedCrash(f"crash after snapshot v{m.version}, before checkpoint")
        # capture the APPLY commit's latency before compaction can overwrite it
        metrics = {
            "apply_s": round(apply_s, 6),
            "snapshot_commit_s": round(self.table.last_commit_s, 6),
        }
        if self.cfg.merge_strategy == "auto":
            metrics["strategy"] = chosen
        if len(ranges) > 1:
            metrics["chunks"] = len(ranges)
        if n_in > 0 and apply_s > 0:
            # EWMA-smoothed apply rate feeds the next batch's adaptive
            # chunk sizing (one slow batch must not collapse chunk size)
            rate = n_in / apply_s
            self._events_per_sec = (rate if self._events_per_sec is None
                                    else 0.5 * self._events_per_sec
                                    + 0.5 * rate)
        if q_n:
            metrics["quarantined"] = q_n
        # MOR housekeeping: fold deltas into base every N APPLIED batches
        # (a counter, not batch_id arithmetic — batch ids may be sparse).
        # Runs before the checkpoint write, which is crash-safe: snapshot
        # properties are inherited across commits, so reconciliation still
        # sees this batch_id on the compaction snapshot.
        ce = self.cfg.mor_compact_every
        if self.cfg.merge_strategy == "auto" and ce == 0:
            ce = AUTO_COMPACT_HORIZON  # auto enforces the horizon it models
        if chosen == "mor" and ce > 0:
            self._applied_since_compact += 1
            if self._applied_since_compact >= ce:
                t_c = _time.monotonic()
                self.table.compact_deltas(
                    broadcast_threshold_rows=self.cfg.broadcast_merge_threshold)
                metrics["compact_s"] = round(_time.monotonic() - t_c, 6)
                self._applied_since_compact = 0
        # auto bucket-spec evolution: grow the layout (metadata-only) once
        # rows outgrow target_rows_per_bucket * n_buckets, so a table created
        # small never freezes its creation-time parallelism; compaction
        # migrates old-spec files lazily. Crash-safe before the checkpoint
        # for the same reason as compaction: snapshot properties are
        # inherited, so reconciliation still sees this batch_id.
        trb = self.cfg.target_rows_per_bucket
        if trb > 0:
            mfst = self.table.manifest()
            if mfst.bucket_key:
                rows = self.table.row_count()
                n_new = mfst.n_buckets
                while rows > trb * n_new:
                    n_new *= 4
                if n_new != mfst.n_buckets:
                    self.table.rebucket(n_new)
                    metrics["rebucketed_to"] = n_new
        if self.rollups:
            t_r = _time.monotonic()
            self.sync_rollups()
            metrics["rollup_s"] = round(_time.monotonic() - t_r, 6)
        if self.history:
            t_h = _time.monotonic()
            if self._history_apply(events, batch_id):
                metrics["history_s"] = round(_time.monotonic() - t_h, 6)
        if fenced:
            if defer_checkpoint:
                return {"__deferred__": True, "batch_id": batch_id,
                        "lsn_from": lo, "lsn_to": hi + 1,
                        "snapshot_version": m.version,
                        "lineage": lineage, "metrics": metrics}
            rec = self.ckpt.commit(batch_id, lo, hi + 1, m.version, lineage,
                                   metrics=metrics)
            self._after_checkpoint()
            return rec
        return {"batch_id": batch_id, "snapshot_version": m.version,
                "lineage": lineage, "metrics": metrics}

    def commit_deferred(self, pending: dict) -> dict:
        """Write the fence checkpoint for a defer_checkpoint apply — call
        strictly AFTER the apply's commits became visible (txn publish)."""
        rec = self.ckpt.commit(pending["batch_id"], pending["lsn_from"],
                               pending["lsn_to"],
                               pending["snapshot_version"],
                               pending["lineage"],
                               metrics=pending["metrics"])
        self._after_checkpoint()
        return rec

    def _after_checkpoint(self) -> None:
        # fence-metadata housekeeping: collapse old per-batch files into
        # the span file so recovery/audits stay O(1) over a long tail
        fe = self.cfg.checkpoint_fold_every
        if fe > 0:
            self._committed_since_fold += 1
            if self._committed_since_fold >= fe:
                self.ckpt.fold()
                self._committed_since_fold = 0

    def _history_apply(self, events: DataFrame, batch_id: int) -> bool:
        """Fold this batch into the maintained SCD2 history iff the history
        hasn't consumed it yet. Exactly-once via a per-source consumed-batch
        watermark riding the history table's OWN merge commit (the aggmaint
        contract): re-running the NEWEST batch is idempotent by
        (merge_keys, tie) identity, while a stale redelivered OLD batch is
        fenced out by the watermark — it MUST not re-apply, because its
        intra-batch lead() would mark its last version per key open again
        and clobber closes written by later batches."""
        hist, ts_col, tie_col = self.history
        prop = (f"scd2_consumed_batch.{self.source_id}" if self.source_id
                else "scd2_consumed_batch")
        wm = hist.manifest().properties.get(prop)
        if wm is not None and int(wm) >= batch_id:
            return False
        from .scd2 import scd2_apply

        name_map = self._event_names()
        cols = []
        for cur, candidates in name_map.items():
            src = next((n for n in candidates if n in events.columns), None)
            cols.append(qcol(src).alias(cur) if src else F.lit(None).alias(cur))
        if "op" in events.columns:
            cols.append(F.col("op"))
        for c in (ts_col, tie_col):
            if c not in name_map and c in events.columns:
                cols.append(F.col(c))
        scd2_apply(hist, events.select(*cols), keys=self.cfg.merge_keys,
                   ts_col=ts_col, tie_col=tie_col,
                   properties={prop: str(batch_id)})
        return True

    def sync_rollups(self) -> None:
        """Advance every maintained rollup to the base table's current
        version (no-op when already current; exactly-once via each
        rollup's own watermark, see streaming/aggmaint.py)."""
        if not self.rollups:
            return
        from .aggmaint import sync_rollup

        for agg, group_by, sums in self.rollups:
            sync_rollup(self.table, agg, self.cfg.merge_keys, group_by, sums)

    def replay(self, binlog: DataFrame, batch_ids: list[int] | None = None,
               evolution_plan: dict[int, list[EvolutionOp]] | None = None,
               collect_metrics: bool = True,
               read_ahead: int | str = 0,
               stage_ahead: bool = False) -> list[dict]:
        """Replay the binlog batch by batch (resumes past committed batches).

        read_ahead > 0 overlaps MATERIALIZING batch k+1..k+read_ahead's
        source slice with the apply of batch k (replay_pipelined below) —
        the analog of the reference's encode ∥ upload ∥ COPY pipeline
        (DatabricksCopyBatchInsert.java:88-93). Applies stay strictly
        ordered; only source reads move off the critical path.
        read_ahead='auto' decides from a first-batch measurement (see
        replay_pipelined)."""
        if batch_ids is None:
            batch_ids = [r["batch_id"] for r in
                         binlog.select("batch_id").distinct().orderBy("batch_id").collect()]
        return self.replay_pipelined(
            [(b, (lambda b=b: binlog.filter(F.col("batch_id") == b)))
             for b in batch_ids],
            read_ahead=read_ahead, evolution_plan=evolution_plan,
            collect_metrics=collect_metrics, stage_ahead=stage_ahead)

    def replay_pipelined(self, batches, read_ahead: int | str = 1,
                         evolution_plan: dict[int, list[EvolutionOp]] | None = None,
                         collect_metrics: bool = True,
                         stage_ahead: bool = False) -> list[dict]:
        """Apply (batch_id, thunk) pairs in order, PREFETCHING future
        batches' sources on a background thread pool — the reference
        overlaps encode(k+1) ∥ upload(k) ∥ COPY(k−1) per file
        (DatabricksCopyBatchInsert.java:88-93,120-184); here the unit is
        the micro-batch and the overlap is source materialization
        (synthesize / pruned scan / Kafka decode + the cluster-side cache
        build) against the previous batch's dedup+MERGE+commit.

        What may NOT overlap: the applies themselves. Exactly-once and
        LWW ordering require batch k's snapshot to commit before batch
        k+1's merge plans against it, so the apply chain stays serial —
        exactly the reference's posture (one COPY at a time, uploads
        pipelined). Spark's scheduler is thread-safe: prefetch jobs run
        concurrently with the apply job from a second driver thread.

        Each prefetched source is persisted (MEMORY_AND_DISK) and counted
        to force materialization, then unpersisted after its apply —
        crash/retry semantics are unchanged because the fence, not the
        prefetch, decides what applies. A thunk is called once (plus
        retries of a failed build); read_ahead bounds both the thread pool
        and the cached batches.

        read_ahead='auto' measures the first batch — source build wall vs
        apply wall — and enables prefetch only when the build is a real
        share of the batch (the BENCH/BASELINE.md regime rule: read-ahead
        pays for expensive sources [Kafka decode, cold scans], and HURTS
        cheap ones, where the persist cost is pure overhead).

        stage_ahead=True extends the prefetch boundary from the SOURCE to
        the whole staged frame: the background thread also runs the LWW
        dedup, persists the apply-ready frame, and executes the merge
        pre-pass aggregation — so the apply's critical path keeps only
        the join+write+commit. This moves the measured driver-serial
        share of a batch (plan analysis + job round-trips of the pre-pass
        job) off the chain, which is the Amdahl term capping N-vs-4N
        scaling. Correctness gates at consume time (run_batch): schema
        version must be unchanged (any evolution bumps sv) and
        merge_apply re-validates bucket-spec coverage; any staleness
        falls back to staging from the persisted source — never wrong,
        merely unoverlapped."""
        items = list(batches)
        # observability flag reset per call: the serial path (read_ahead
        # <= 0, including auto probes that resolve to width 0) returns
        # before the staging guard below runs, and a stale True from an
        # earlier pipelined call would misreport a replay that did no
        # staging
        self.stage_ahead_active = False
        if read_ahead == "auto":
            if not items:
                return []
            import time as _time

            from pyspark import StorageLevel

            b0, t0 = items[0]
            if self.ckpt.is_committed(b0):
                # metadata-only fence short-circuit: a resumed replay's
                # probe batch would otherwise persist+count the ENTIRE
                # first-batch source just for run_batch to no-op it —
                # cache build the serial path never pays. No measurement
                # is possible on a no-op, so prefetch stays off (same
                # decision as the fence-rejected-probe path below).
                # ONLY safe when no maintained rollups/history ride the
                # fence-hit branch: the serial path's run_batch does
                # rollup sync + SCD2 history catch-up on committed
                # batches (run_batch fence hit), and skipping it here
                # after a crash between the apply commit and the history
                # merge would advance the consumed-batch watermark past
                # this batch on the NEXT fold, losing its rows from the
                # history forever. With rollups/history configured,
                # route the committed batch through the serial path.
                self.auto_read_ahead = 0
                if not self.rollups and self.history is None:
                    return self.replay_pipelined(
                        items[1:], read_ahead=0,
                        evolution_plan=evolution_plan,
                        collect_metrics=collect_metrics,
                        stage_ahead=stage_ahead)
                return self.replay_pipelined(
                    items, read_ahead=0,
                    evolution_plan=evolution_plan,
                    collect_metrics=collect_metrics,
                    stage_ahead=stage_ahead)
            # Concurrent probe (round-5, VERDICT r4 #3): the old probe
            # persisted+counted the FIRST batch inline — a full extra
            # source pass the serial path never pays, costing ~7% even
            # when auto correctly chose width 0. Now batch 0 runs exactly
            # like the serial path (source streams straight into the
            # apply, nothing persisted) while batch 1's source
            # materializes on a prefetch thread; the two walls decide.
            # Batch 1's cache is then consumed whichever width wins — its
            # build cost was already paid, overlapped with batch 0's
            # apply — so the probe's only residual cost vs sequential is
            # a cache write+count that ran on otherwise-idle slots.
            if len(items) == 1:
                # no probe partner: nothing to overlap anyway
                self.auto_read_ahead = 0
                return self.replay_pipelined(
                    items, read_ahead=0,
                    evolution_plan=evolution_plan,
                    collect_metrics=collect_metrics,
                    stage_ahead=stage_ahead)
            from concurrent.futures import ThreadPoolExecutor

            from pyspark.errors import AnalysisException

            from ..config import ConfigError

            b1, t1 = items[1]
            sc = self.table.spark.sparkContext
            box: dict = {}

            def probe_prefetch():
                # prefetch pool tag: under FAIR scheduling the probe
                # yields slots to the apply chain (no-op under FIFO)
                sc.setLocalProperty("spark.scheduler.pool", "prefetch")
                t = _time.monotonic()
                df = t1().persist(StorageLevel.MEMORY_AND_DISK)
                try:
                    df.count()
                except BaseException:
                    # a transient failure inside _retrying would
                    # otherwise leak one cache entry per attempt
                    df.unpersist()
                    raise
                box["fetch_s"] = _time.monotonic() - t
                return df

            pool = ThreadPoolExecutor(max_workers=1,
                                      thread_name_prefix="replay-probe")
            fut = pool.submit(self._retrying, probe_prefetch)
            sc.setLocalProperty("spark.scheduler.pool", "apply")
            t_a = _time.monotonic()
            try:
                rec0 = self._retrying(lambda: self.run_batch(
                    t0(), b0, evolution=(evolution_plan or {}).get(b0),
                    collect_metrics=collect_metrics))
            except BaseException:
                # batch 0 failed permanently: drain the probe and release
                # its cache before propagating
                try:
                    fut.result().unpersist()
                except BaseException:
                    pass
                pool.shutdown(wait=False)
                raise
            total0_s = _time.monotonic() - t_a
            try:
                df1 = fut.result()
                fetch_s = box["fetch_s"]
            except (InjectedCrash, AnalysisException, ConfigError):
                pool.shutdown(wait=False)
                raise  # deterministic/plan-time: not retryable
            except Exception:
                # transient prefetch failure after retries: no
                # measurement, stay serial; batch 1 rebuilds under the
                # serial retry policy in the continuation below
                df1, fetch_s = None, 0.0
            pool.shutdown(wait=False)
            if rec0 is None:
                # fence-rejected probe: total0_s measured a no-op, not an
                # apply — a resumed replay over committed batches must NOT
                # conclude "apply is fast, prefetch everything" (the
                # serial path never even materializes those sources)
                read_ahead = 0
            else:
                # batch 0's wall includes its own (serial) source build;
                # subtracting the concurrently-measured build estimates
                # the bare apply, preserving the original share
                # calibration. Width 1, not 2: depth 2 over-contends
                # (BENCH/BASELINE.md — the prefetch threads steal apply
                # slots faster than the overlap pays them back).
                apply_est = max(
                    total0_s - (fetch_s if df1 is not None else 0.0), 1e-6)
                read_ahead = (1 if (fetch_s >= AUTO_READ_AHEAD_SHARE * apply_est
                                    and fetch_s >= AUTO_READ_AHEAD_MIN_FETCH_S)
                              else 0)
            self.auto_read_ahead = read_ahead  # observability (tests/bench)
            if df1 is not None:
                try:
                    rec1 = self._retrying(lambda: self.run_batch(
                        df1, b1, evolution=(evolution_plan or {}).get(b1),
                        collect_metrics=collect_metrics))
                finally:
                    df1.unpersist()
                head = [r for r in (rec0, rec1) if r is not None]
                tail_items = items[2:]
            else:
                head = [rec0] if rec0 is not None else []
                tail_items = items[1:]
            rest = self.replay_pipelined(
                tail_items, read_ahead=read_ahead,
                evolution_plan=evolution_plan,
                collect_metrics=collect_metrics, stage_ahead=stage_ahead)
            return head + rest
        if read_ahead <= 0:
            out = []
            for b, thunk in items:
                rec = self._retrying(lambda b=b, thunk=thunk: self.run_batch(
                    thunk(), b, evolution=(evolution_plan or {}).get(b),
                    collect_metrics=collect_metrics,
                ))
                if rec is not None:
                    out.append(rec)
            return out
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import StorageLevel
        from pyspark.errors import AnalysisException

        from ..config import ConfigError

        # stage-ahead applies only where run_batch can consume it: merge
        # mode, no quarantine rewrite, no full-metrics chunking
        stage_ok = (stage_ahead
                    and self.cfg.mode is ApplyMode.MERGE
                    and not self.cfg.quarantine
                    and collect_metrics is not True)

        sc = self.table.spark.sparkContext
        if stage_ok and not _scheduler_is_fair(sc):
            # MEASURED to be WORSE than serial under FIFO (BASELINE.md:
            # 12.9 s/batch vs 11.0 serial at local[16]): the pre-pass jobs
            # submitted early by the prefetch thread hold the whole
            # cluster while the apply chain queues behind them — FIFO
            # serializes exactly the overlap stage-ahead exists to
            # create. scheduler.mode is a cluster-start conf (cannot be
            # set post-session), so fall back to plain read-ahead and say
            # so loudly instead of silently degrading (VERDICT r3 #4).
            import logging

            logging.getLogger(__name__).warning(
                "stage_ahead=True requires the FAIR scheduler "
                "(SPARK_GRAFT_SCHEDULER=FAIR before session start); "
                "spark.scheduler.mode is FIFO — falling back to plain "
                "source read-ahead, which is strictly faster here.")
            self.stage_ahead_active = False
            stage_ok = False
        else:
            self.stage_ahead_active = bool(stage_ok)

        def fetch(thunk, do_stage):
            # thread-local pool tag: under FAIR scheduling prefetch work
            # yields slots to the apply chain (no-op under FIFO)
            sc.setLocalProperty("spark.scheduler.pool", "prefetch")
            held: list = []  # persisted frames to release on failure —
                             # the retry path would otherwise leak one
                             # cache entry per failed attempt
            try:
                if not do_stage:
                    ev = thunk().persist(StorageLevel.MEMORY_AND_DISK)
                    held.append(ev)
                    ev.count()  # force the build off the critical path
                    return {"events": ev, "__persisted": [ev]}
                from pyspark.sql import Observation

                from ..plans.merge import prepass_aggs

                # the RAW source is NOT persisted here — a 9M-event batch
                # of token arrays is GBs of cache the sequential path
                # never materializes (it streams the source straight into
                # the dedup). Only the deduped STAGED frame (one row per
                # key) is cached; the raw-event light metrics ride an
                # Observation on the single source scan the staged build
                # performs.
                # capture the schema version BEFORE building the name map:
                # if a concurrent evolution lands between the two manifest
                # reads, the recorded sv is the OLD one and the consume
                # gate rejects the bundle (fail-safe). Recording sv after
                # the map would let a NEW sv ride an old-schema frame
                # through the gate.
                sv = self.table.manifest().current_sv
                ev = thunk()
                lobs = Observation()
                staged = self._staged_frame(
                    ev.observe(lobs,
                               F.count(F.lit(1)).alias("events_in"),
                               F.min("seq_lsn").alias("lo"),
                               F.max("seq_lsn").alias("hi"))
                ).persist(StorageLevel.MEMORY_AND_DISK)
                held.append(staged)
                m = self.table.manifest()
                aggs, _nbs, _dpo, _b = prepass_aggs(
                    m, self.cfg.merge_keys, "op" in staged.columns,
                    self.cfg.support_deletes, self.cfg.merge_rules,
                    self.cfg.merge_guard_col)
                row = staged.agg(*aggs).collect()[0]
                return {"events": ev, "staged": staged, "row": row,
                        "sv": sv, "light": lobs.get,
                        "__persisted": [staged]}
            except BaseException:
                for df in held:
                    try:
                        df.unpersist()
                    except Exception:
                        pass
                raise

        def release(bundle):
            for df in bundle.get("__persisted", []):
                df.unpersist()

        pool = ThreadPoolExecutor(max_workers=read_ahead,
                                  thread_name_prefix="replay-prefetch")
        futures: dict[int, object] = {}
        out: list[dict] = []
        sc.setLocalProperty("spark.scheduler.pool", "apply")
        try:
            for i, (b, _t) in enumerate(items):
                # keep the window [i, i+read_ahead] submitted (the current
                # batch's own fetch rides the pool too on the first turn)
                for j in range(i, min(i + read_ahead + 1, len(items))):
                    bj, tj = items[j]
                    if bj not in futures:
                        # a batch with pending evolution ops cannot be
                        # pre-staged (its sv gate would reject it anyway)
                        ds = stage_ok and not (evolution_plan or {}).get(bj)
                        futures[bj] = pool.submit(fetch, tj, ds)
                try:
                    bundle = futures.pop(b).result()
                except (InjectedCrash, AnalysisException, ConfigError):
                    raise  # deterministic/plan-time: not retryable (matches
                           # _retrying's policy)
                except Exception:
                    # transient prefetch failure: rebuild this batch's
                    # source under the same retry policy the serial path
                    # gives thunk() — pipelining must not reduce fault
                    # tolerance vs read_ahead=0. fetch() tags the calling
                    # thread 'prefetch'; restore the apply tag afterwards
                    # or every later apply job runs at prefetch weight.
                    try:
                        bundle = self._retrying(
                            lambda t=_t, b_=b: fetch(
                                t, stage_ok
                                and not (evolution_plan or {}).get(b_)))
                    finally:
                        sc.setLocalProperty("spark.scheduler.pool", "apply")
                try:
                    rec = self._retrying(
                        lambda b=b, bundle=bundle: self.run_batch(
                            bundle["events"], b,
                            evolution=(evolution_plan or {}).get(b),
                            collect_metrics=collect_metrics,
                            prestaged=(bundle if "staged" in bundle
                                       else None),
                        ))
                finally:
                    release(bundle)
                if rec is not None:
                    out.append(rec)
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)
            for f in futures.values():
                f.cancel()
            pool.shutdown(wait=True)
            for f in futures.values():  # release outstanding prefetch cache
                if f.done() and not f.cancelled():
                    try:
                        release(f.result())
                    except Exception:
                        pass
        return out

    def _retrying(self, fn):
        """Replay-level retry with doubling backoff (ref retry_limit 12 /
        retry_wait 1000ms -> max_retry_wait 30min, README.md:32-34, inherited
        AbstractJdbcOutputConnector via DatabricksOutputConnector.java:12).
        Re-running the whole batch is safe: if the failed attempt's snapshot
        committed, the fence (or crash reconciliation) turns the retry into a
        no-op; if it didn't, the retry applies from scratch. Deterministic
        plan-time errors (bad merge-rule SQL, config errors) are NOT retried
        — only runtime failures, the analog of retryable SQLExceptions."""
        import time

        from pyspark.errors import AnalysisException

        from ..config import ConfigError

        wait = self.cfg.retry_wait_s
        attempt = 0
        while True:
            try:
                return fn()
            except (InjectedCrash, AnalysisException, ConfigError):
                raise
            except Exception:
                if attempt >= self.cfg.retry_limit:
                    raise
                attempt += 1
                time.sleep(wait)
                wait = min(wait * 2, self.cfg.max_retry_wait_s)
