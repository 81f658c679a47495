"""spark-submit entry point: Structured Streaming binlog tail.

The continuous twin of jobs/replay_job.py — tails a DIRECTORY of binlog
parquet files with readStream and funnels every micro-batch through the
same fenced LWW+MERGE apply (streaming/tail.py), so a file-drop pipeline
becomes a live CDC ingest without code changes. Exactly-once comes from
the engine's fence (epoch redelivery after a crash is a no-op), not from
Spark's WAL.

Ship:
    tools/make_pyfiles.sh                       # -> dist/engine.zip
    spark-submit --master local[32] \
        --py-files dist/engine.zip jobs/tail_job.py \
        --warehouse /tmp/wh --binlog-dir /data/binlog \
        --stream-checkpoint /tmp/ckpt --drain

--drain processes everything currently in the directory and exits (the
batch-friendly availableNow mode); without it the query runs until killed,
picking up new files per trigger. Prints one JSON line on exit.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="streaming binlog tail job")
    p.add_argument("--warehouse", required=True, help="LakeCatalog root dir")
    p.add_argument("--binlog-dir", required=True,
                   help="directory (or glob) of binlog parquet files")
    p.add_argument("--stream-checkpoint", required=True,
                   help="Spark streaming checkpoint location")
    p.add_argument("--table", default="sequences")
    p.add_argument("--merge-keys", default="doc_id")
    p.add_argument("--n-buckets", type=int, default=32)
    p.add_argument("--dedup-strategy", default="maxby",
                   choices=["maxby", "maxstruct", "salted", "window"])
    p.add_argument("--merge-strategy", default="cow", choices=["cow", "mor"])
    p.add_argument("--max-files-per-trigger", type=int, default=8)
    p.add_argument("--drain", action="store_true",
                   help="availableNow: drain current files then stop")
    p.add_argument("--timeout-sec", type=int, default=0,
                   help="await at most N seconds (0 = forever)")
    args = p.parse_args(argv)

    from embulk_output_databricks_spark.config import JobConfig
    from embulk_output_databricks_spark.session import build_session
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog
    from embulk_output_databricks_spark.streaming.replay import ReplayDriver
    from embulk_output_databricks_spark.streaming.tail import tail_binlog_dir

    spark = build_session(app_name="cdc-tail")
    cat = LakeCatalog(spark, args.warehouse)
    cfg = JobConfig(table=args.table, mode="merge",
                    merge_keys=args.merge_keys.split(","),
                    n_buckets=args.n_buckets,
                    dedup_strategy=args.dedup_strategy,
                    merge_strategy=args.merge_strategy)
    driver = ReplayDriver(cat, cfg)
    q = tail_binlog_dir(spark, args.binlog_dir, driver,
                        args.stream_checkpoint,
                        max_files_per_trigger=args.max_files_per_trigger,
                        available_now=args.drain)
    q.awaitTermination(args.timeout_sec or None)
    if q.isActive:
        q.stop()
    rec = {
        "job": "cdc-tail",
        "drained": args.drain,
        "epochs_committed": driver.ckpt.committed_batch_ids(),
        "final_rows": driver.table.row_count(),
        "final_version": driver.table.current_version(),
    }
    json.dump(rec, sys.stdout)
    print()


if __name__ == "__main__":
    main()
