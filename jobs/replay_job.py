"""spark-submit entry point: checkpointed CDC replay (north rule:
"the job ships as spark-submit --py-files").

Ship:
    tools/make_pyfiles.sh                       # -> dist/engine.zip
    spark-submit --master local[32] \
        --py-files dist/engine.zip jobs/replay_job.py \
        --warehouse /tmp/wh --events 4000000 --batches 5

On a real cluster, swap --master/--num-executors and point --warehouse at
shared storage; the engine itself is master-agnostic (all parallelism comes
from the DataFrame plans; config.JobConfig carries the knobs).

Prints one JSON line: per-batch seconds, sustained events/sec (post-warmup),
final table row count, and per-partition lineage totals — the measurement
record BENCH/scaling.py consumes for the N-vs-4N efficiency protocol.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="checkpointed CDC replay job")
    p.add_argument("--warehouse", required=True, help="LakeCatalog root dir")
    p.add_argument("--table", default="sequences")
    p.add_argument("--mode", default="merge",
                   choices=["insert", "insert_direct", "truncate_insert", "replace", "merge"])
    p.add_argument("--merge-keys", default="doc_id",
                   help="comma-separated key columns, or 'auto' to discover "
                        "from the target's identifier_fields table property "
                        "(falls back to doc_id; ref PK-derivation analog)")
    p.add_argument("--read-ahead", type=int, default=0,
                   help="prefetch N future batches' sources on a background "
                        "thread while the current batch applies (the "
                        "reference's encode/upload/COPY overlap). Pays when "
                        "source materialization is a real share of the "
                        "batch (COW merges, remote sources); skip for "
                        "short MOR appends")
    p.add_argument("--stage-ahead", action="store_true",
                   help="with --read-ahead: the prefetch thread also runs "
                        "the LWW dedup and merge pre-pass one batch early, "
                        "leaving only join+write+commit on the apply chain "
                        "(driver-serial shave; falls back safely on any "
                        "schema/spec staleness)")
    p.add_argument("--events", type=int, default=1_000_000)
    p.add_argument("--docs", type=int, default=0, help="0 -> events/20")
    p.add_argument("--batches", type=int, default=5)
    p.add_argument("--warmup-batches", type=int, default=1)
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--dedup-strategy", default="maxby",
                   choices=["maxby", "maxstruct", "salted", "window"])
    p.add_argument("--merge-strategy", default="cow",
                   choices=["cow", "mor", "auto"],
                   help="cow: copy-on-write bucket rewrite (read-optimized); "
                        "mor: merge-on-read delta appends (write-optimized); "
                        "auto: per-batch metadata-only cost model (MOR while "
                        "the table dwarfs the batch, COW otherwise)")
    p.add_argument("--mor-compact-every", type=int, default=0,
                   help="mor only: fold deltas into base every N batches")
    p.add_argument("--merge-guard-col", default=None,
                   help="cross-batch stale-writer guard column (matched rows "
                        "update only when S.col > T.col); COW only")
    p.add_argument("--checkpoint-fold-every", type=int, default=0,
                   help="fold per-batch fence files into the span file every "
                        "N committed batches (0 = never)")
    p.add_argument("--quarantine", action="store_true",
                   help="park envelope-invalid rows (NULL merge key, bad op) "
                        "under <table>/quarantine/ instead of applying them")
    p.add_argument("--hot-frac", type=float, default=0.05)
    p.add_argument("--partitions", type=int, default=0, help="binlog partitions; 0 -> default")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lineage", default="light", choices=["full", "light", "none"],
                   help="full: dedicated per-partition metrics pass; "
                        "light: piggy-back on the apply job (Observation); "
                        "none: skip")
    args = p.parse_args(argv)

    # Imports deferred until after arg parsing so --help works without a JVM;
    # under spark-submit the package arrives via --py-files.
    from embulk_output_databricks_spark.config import JobConfig
    from embulk_output_databricks_spark.session import build_session
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog
    from embulk_output_databricks_spark.streaming.replay import ReplayDriver
    from embulk_output_databricks_spark.synth import synth_binlog

    if args.stage_ahead:
        # stage-ahead REQUIRES FAIR pools (measured WORSE than serial
        # under FIFO: prefetch pre-pass jobs hold the cluster while the
        # apply chain queues). This job owns session creation, so set the
        # scheduler itself rather than relying on the engine's
        # warn-and-fall-back guard.
        import os

        os.environ.setdefault("SPARK_GRAFT_SCHEDULER", "FAIR")
    spark = build_session(app_name="cdc-replay")
    n_docs = args.docs or max(1000, args.events // 20)
    events_per_batch = args.events // args.batches
    cat = LakeCatalog(spark, args.warehouse)
    cfg = JobConfig(table=args.table, mode=args.mode,
                    merge_keys=(None if args.merge_keys == "auto"
                                else args.merge_keys.split(",")),
                    n_buckets=args.n_buckets, dedup_strategy=args.dedup_strategy,
                    merge_strategy=args.merge_strategy,
                    mor_compact_every=args.mor_compact_every,
                    merge_guard_col=args.merge_guard_col,
                    checkpoint_fold_every=args.checkpoint_fold_every,
                    quarantine=args.quarantine)
    driver = ReplayDriver(cat, cfg)

    metrics = {"full": True, "light": "light", "none": False}[args.lineage]

    def batch_slice(b):
        # generate exactly this batch's offset slice (pruned binlog read)
        return synth_binlog(
            spark, events_per_batch, n_docs, events_per_batch,
            seed=args.seed, hot_frac=args.hot_frac,
            partitions=args.partitions or None,
            start=b * events_per_batch,
        )

    per_batch, lineage_totals = [], []
    if args.read_ahead > 0:
        # run warmup and timed batches as separate pipelined calls so the
        # warmup's plan/codegen cost cannot leak into the timed window —
        # batches overlap their source builds inside each call, so only
        # the amortized per-batch rate is meaningful
        recs = []
        # at least one batch stays in the timed call
        w = min(args.warmup_batches, max(args.batches - 1, 0))
        if w:
            t0 = time.perf_counter()
            recs += driver.replay_pipelined(
                [(b, (lambda b=b: batch_slice(b))) for b in range(w)],
                read_ahead=args.read_ahead, collect_metrics=metrics,
                stage_ahead=args.stage_ahead)
            per_batch += [round((time.perf_counter() - t0) / w, 3)] * w
        if args.batches > w:
            t0 = time.perf_counter()
            recs += driver.replay_pipelined(
                [(b, (lambda b=b: batch_slice(b)))
                 for b in range(w, args.batches)],
                read_ahead=args.read_ahead, collect_metrics=metrics,
                stage_ahead=args.stage_ahead)
            wall = time.perf_counter() - t0
            per_batch += [round(wall / (args.batches - w), 3)] \
                * (args.batches - w)
        for rec in recs:
            lineage_totals.append(
                sum(x["events_in"] for x in rec["lineage"])
                if rec["lineage"] else rec.get("lsn_to", 0) - rec.get("lsn_from", 0)
            )
    else:
        for b in range(args.batches):
            events = batch_slice(b)
            t0 = time.perf_counter()
            rec = driver.run_batch(events, b, collect_metrics=metrics)
            per_batch.append(round(time.perf_counter() - t0, 3))
            if rec:
                lineage_totals.append(
                    sum(x["events_in"] for x in rec["lineage"])
                    if rec["lineage"] else rec.get("lsn_to", 0) - rec.get("lsn_from", 0)
                )
    # clamp: at least one timed batch survives (warmup >= batches would
    # otherwise divide by zero AFTER the whole replay ran)
    timed = per_batch[min(args.warmup_batches, len(per_batch) - 1):]
    total = sum(timed)
    out = {
        "job": "cdc-replay",
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "events": args.events,
        "docs": n_docs,
        "batches": args.batches,
        "events_per_batch": events_per_batch,
        "batch_sec": per_batch,
        "timed_sec": round(total, 3),
        "events_per_sec": round(events_per_batch * len(timed) / total, 1),
        "final_rows": (driver.table.read().count()
                       if args.merge_strategy == "mor"
                       else driver.table.row_count()),
        "lineage_events_in": lineage_totals,
        "checkpoints": driver.ckpt.committed_batch_ids(),
    }
    driver.ckpt.validate_contiguous()
    print(json.dumps(out))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
