"""Multi-table replay: one binlog fanned out to several target tables.

The reference loads exactly one table per Embulk run (`transaction()` takes
a single target, DatabricksOutputPlugin.java:166-186); a real CDC tail
carries changes for MANY tables in one stream (one topic/WAL, a `table`
discriminator per event — the Debezium envelope shape). This driver routes
each batch's events to per-table ReplayDrivers, so every target keeps its
OWN fence + checkpoint lineage:

  * exactly-once is per (table, batch_id) — a crash after table A committed
    batch k but before table B did resumes with A fenced and B applied,
    which is the multi-table generalization of the reference's
    "all work in intermediates, one final statement per table".
  * tables are independent: different apply modes, merge keys, schemas, and
    evolution plans per target are allowed.

Scale notes (10^10 events): the per-table slice is a filter on the route
column — on a binlog source partitioned (or sorted/z-ordered) by `table`
this is partition pruning, so each target's apply scans only its own
events. Targets are applied sequentially per batch to bound peak cluster
memory; the per-table plans are independent, so a deployment that prefers
latency over isolation can submit them from concurrent driver threads in
separate Spark scheduler pools without code changes here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import ConfigError, JobConfig
from ..schema import SEQUENCES_SCHEMA
from ..sources.laketable import LakeCatalog
from .replay import EvolutionOp, InjectedCrash, ReplayDriver


class MultiTableReplayDriver:
    def __init__(
        self,
        catalog: LakeCatalog,
        configs: list[JobConfig],
        schemas: dict[str, object] | None = None,
        table_col: str = "table",
        unknown_tables: str = "error",
    ):
        names = [c.table for c in configs]
        if len(set(names)) != len(names):
            raise ConfigError(f"duplicate target tables in configs: {names}")
        if unknown_tables not in ("error", "ignore"):
            raise ConfigError(f"unknown_tables must be 'error'|'ignore', got {unknown_tables!r}")
        self.table_col = table_col
        self.unknown_tables = unknown_tables
        self.catalog = catalog
        self._schemas = {
            c.table: (schemas or {}).get(c.table, SEQUENCES_SCHEMA)
            for c in configs
        }
        # deterministic apply order (sorted) so crash/resume points are stable
        self.drivers: dict[str, ReplayDriver] = {
            c.table: ReplayDriver(
                catalog, c, (schemas or {}).get(c.table, SEQUENCES_SCHEMA)
            )
            for c in sorted(configs, key=lambda c: c.table)
        }

    def run_batch(
        self,
        events: DataFrame,
        batch_id: int,
        evolution: dict[str, list[EvolutionOp]] | None = None,
        crash_after_table: str | None = None,
        collect_metrics: bool | str = True,
        parallel: bool = False,
    ) -> dict[str, dict | None]:
        """Apply one batch to every target. Returns {table: checkpoint record
        or None-if-fenced}. A crash mid-fan-out leaves committed targets
        fenced; re-running the batch completes only the remainder.

        parallel=True submits each target's apply from its own driver thread
        (Spark schedules the independent jobs concurrently) — the latency
        lever when targets are many and small. Per-table fences make a
        partial failure resumable exactly as in sequential mode, just
        without a deterministic completion order; crash_after_table (a test
        hook) requires sequential mode.

        Events whose discriminator matches no configured target fail the
        batch (unknown_tables='error', the default) rather than vanishing —
        a new upstream table or a typo'd config name must be loud. Pass
        unknown_tables='ignore' to drop them deliberately."""
        if self.unknown_tables == "error":
            # cheap probe: discriminator column only, first offender stops the scan
            stray = (
                events.filter(~F.col(self.table_col).isin(list(self.drivers)))
                .select(self.table_col).limit(1).collect()
            )
            if stray:
                raise ValueError(
                    f"batch {batch_id}: events for unconfigured table "
                    f"{stray[0][0]!r} (configured: {sorted(self.drivers)}); "
                    "add a target or construct the driver with "
                    "unknown_tables='ignore'"
                )
        slices = {
            name: events.filter(F.col(self.table_col) == name).drop(self.table_col)
            for name in self.drivers
        }
        if parallel:
            if crash_after_table is not None:
                raise ValueError("crash_after_table requires sequential mode")
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(self.drivers)) as ex:
                futs = {
                    name: ex.submit(
                        drv.run_batch, slices[name], batch_id,
                        evolution=(evolution or {}).get(name),
                        collect_metrics=collect_metrics,
                    )
                    for name, drv in self.drivers.items()
                }
            return {name: f.result() for name, f in futs.items()}
        out: dict[str, dict | None] = {}
        for name, drv in self.drivers.items():
            out[name] = drv.run_batch(
                slices[name],
                batch_id,
                evolution=(evolution or {}).get(name),
                collect_metrics=collect_metrics,
            )
            if crash_after_table == name:
                raise InjectedCrash(
                    f"crash after table {name!r} committed batch {batch_id}"
                )
        return out

    def run_batch_txn(
        self,
        events: DataFrame,
        batch_id: int,
        evolution: dict[str, list[EvolutionOp]] | None = None,
        collect_metrics: bool | str = True,
        crash_before_publish: bool = False,
        crash_before_checkpoints: bool = False,
    ) -> dict[str, dict | None]:
        """run_batch, but ATOMIC across targets: every table's apply lands
        on a catalog-transaction branch, one publish makes them all
        visible together (sources/txn.py), and only then are the per-table
        fence checkpoints written. A reader (or a crash) can no longer
        observe table A carrying batch k while table B does not — the
        cross-table torn state run_batch documents away is gone.

        Crash matrix: before publish -> branches reap, nothing visible,
        rerun applies everything fresh; after publish before checkpoints ->
        every table's reconciliation trusts its snapshot's batch stamp and
        repairs its fence on the next driver startup (or the fence-miss
        path of this rerun). Exactly-once either way.

        Maintained side tables (cfg.rollups / cfg.history) write OUTSIDE
        the transaction and are refused — sync them from the published
        state instead."""
        for name, drv in self.drivers.items():
            if drv.cfg.rollups or drv.cfg.history:
                raise ConfigError(
                    f"{name}: transactional fan-out does not support "
                    "rollups/history (they commit to side tables outside "
                    "the transaction)")
        if self.unknown_tables == "error":
            stray = (
                events.filter(~F.col(self.table_col).isin(list(self.drivers)))
                .select(self.table_col).limit(1).collect()
            )
            if stray:
                raise ValueError(
                    f"batch {batch_id}: events for unconfigured table "
                    f"{stray[0][0]!r} (configured: {sorted(self.drivers)})")
        txn = self.catalog.begin(sorted(self.drivers))
        pend: dict[str, dict | None] = {}
        try:
            for name, drv in self.drivers.items():
                bdrv = ReplayDriver(self.catalog, drv.cfg,
                                    self._schemas[name],
                                    table=txn.table(name),
                                    source_id=drv.source_id)
                pend[name] = bdrv.run_batch(
                    events.filter(F.col(self.table_col) == name)
                    .drop(self.table_col),
                    batch_id,
                    evolution=(evolution or {}).get(name),
                    collect_metrics=collect_metrics,
                    defer_checkpoint=True,
                )
            if crash_before_publish:
                raise InjectedCrash(
                    f"crash before publishing txn batch {batch_id}")
            if all(p is None for p in pend.values()):
                txn.rollback()   # every table fenced: nothing staged
                return pend
            txn.commit()
        except InjectedCrash:
            raise            # simulated process death: leave state torn
        except BaseException:
            txn.rollback()
            raise
        if crash_before_checkpoints:
            raise InjectedCrash(
                f"crash after publishing txn batch {batch_id}, "
                "before checkpoints")
        out: dict[str, dict | None] = {}
        for name, p in pend.items():
            out[name] = (self.drivers[name].commit_deferred(p)
                         if p is not None and p.get("__deferred__") else p)
        return out

    def replay(
        self,
        binlog: DataFrame,
        batch_ids: list[int] | None = None,
        evolution_plan: dict[int, dict[str, list[EvolutionOp]]] | None = None,
        collect_metrics: bool | str = True,
    ) -> list[dict[str, dict | None]]:
        if batch_ids is None:
            batch_ids = [
                r["batch_id"]
                for r in binlog.select("batch_id").distinct().orderBy("batch_id").collect()
            ]
        out = []
        for b in batch_ids:
            recs = self.run_batch(
                binlog.filter(F.col("batch_id") == b),
                b,
                evolution=(evolution_plan or {}).get(b),
                collect_metrics=collect_metrics,
            )
            if any(r is not None for r in recs.values()):
                out.append(recs)
        return out
