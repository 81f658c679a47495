"""spark-submit entry point: scheduled table maintenance.

The OPTIMIZE-job half of the operations story (replay_job.py is the
ingest half): one shippable job a scheduler runs between or alongside
replay batches. It loads the table, runs the policy-driven
LakeTable.maintain() pass (fold MOR deltas -> bin-pack/clustered
compaction -> consolidate posdels -> persist NDV sketches -> snapshot
expiry + orphan GC + change-feed pruning), and prints the {action:
outcome} lineage record as one JSON line — nothing fires on a healthy
table, every action is its own atomic snapshot, and a crash between
actions leaves a consistent table for the next run.

Ship:
    tools/make_pyfiles.sh                         # -> dist/engine.zip
    spark-submit --master local[32] \
        --py-files dist/engine.zip jobs/maintain_job.py \
        --warehouse /tmp/wh --table sequences \
        --expire-keep-last 10 --max-files-per-bucket 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="policy-driven table maintenance")
    p.add_argument("--warehouse", required=True, help="LakeCatalog root dir")
    p.add_argument("--table", default="sequences")
    p.add_argument("--max-files-per-bucket", type=int, default=8)
    p.add_argument("--max-delta-files", type=int, default=8)
    p.add_argument("--max-posdel-files", type=int, default=8)
    p.add_argument("--expire-keep-last", type=int, default=None,
                   help="snapshot retention; omit to skip expiry/GC")
    p.add_argument("--expire-older-than-hours", type=float, default=None,
                   help="age bound on top of --expire-keep-last")
    p.add_argument("--cluster-by", default=None,
                   help="comma-separated columns for clustered compaction")
    p.add_argument("--rows-per-file", type=int, default=None)
    p.add_argument("--target-file-bytes", type=int, default=None,
                   help="bytes-aware bin-packing target")
    args = p.parse_args(argv)

    from embulk_output_databricks_spark.session import build_session
    from embulk_output_databricks_spark.sources.laketable import LakeCatalog

    spark = build_session(app_name=f"maintain-{args.table}")
    try:
        t = LakeCatalog(spark, args.warehouse).load(args.table)
        older_us = None
        if args.expire_older_than_hours is not None:
            older_us = int((time.time()
                            - args.expire_older_than_hours * 3600) * 1_000_000)
        t0 = time.perf_counter()
        report = t.maintain(
            max_files_per_bucket=args.max_files_per_bucket,
            max_delta_files=args.max_delta_files,
            max_posdel_files=args.max_posdel_files,
            expire_keep_last=args.expire_keep_last,
            expire_older_than_us=older_us,
            cluster_by=(args.cluster_by.split(",")
                        if args.cluster_by else None),
            rows_per_file=args.rows_per_file,
            target_file_bytes=args.target_file_bytes,
        )
        print(json.dumps({
            "table": args.table,
            "version": t.current_version(),
            "wall_sec": round(time.perf_counter() - t0, 3),
            "actions": report,
        }))
        sys.stdout.flush()
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
