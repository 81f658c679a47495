"""Hardware-ceiling control for the N-vs-4N scaling evidence.

The replay job's 4->16-core efficiency (BENCH/BASELINE.md) is bounded by
what this single box can physically deliver at 16 threads — a local[N]
sweep shares one memory subsystem, unlike a real 4x-executor cluster.
This control runs two minimal jobs at each level to locate that ceiling:

  * cpu: an iterated xxhash64 chain over spark.range — embarrassingly
    parallel, register-resident, near-zero memory traffic. Its efficiency
    IS the core-scaling ceiling of the VM (scheduler + turbo effects only).
  * shuffle: repartition + per-partition sort of the same row count with
    replay-shaped columns — the memory/shuffle profile of the MERGE apply.

E(job) / E(cpu-control) isolates what the JOB leaves on the table vs what
the hardware refuses to give anyone.

Usage: python BENCH/hw_control.py [--rows 60000000] [--levels 4,16]
       [--repeats 2]   (one fresh JVM per level x repeat, interleaved)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(cpus: int, rows: int) -> dict:
    """Child mode: run both controls once in this JVM, print one JSON line."""
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from embulk_output_databricks_spark.session import build_session

    spark = build_session(f"hw_control_{cpus}")
    try:
        parts = cpus * 4

        # fresh plan objects per run: re-collecting the SAME DataFrame
        # reuses its shuffle map outputs across jobs, which would time only
        # the final reduce stage
        def cpu_plan():
            col = F.col("id")
            for _ in range(24):
                col = F.xxhash64(col)
            return (spark.range(rows, numPartitions=parts)
                    .select(col.alias("h")).agg(F.sum("h")))

        def shuffle_plan():
            ev = spark.range(rows, numPartitions=parts).select(
                F.col("id").alias("seq_lsn"),
                F.format_string(
                    "doc%08d", F.pmod(F.col("id") * 2654435761,
                                      F.lit(rows // 4))).alias("doc_id"),
                (F.pmod(F.col("id"), F.lit(64)) + 1).cast("int")
                .alias("n_tok"),
                F.format_string("src%d", F.pmod(F.col("id"), F.lit(5)))
                .alias("source"))
            return (ev.repartition(64, "doc_id")
                    .sortWithinPartitions("doc_id", "seq_lsn")
                    .agg(F.count(F.lit(1)).alias("n"),
                         F.max("doc_id").alias("mx")))

        cpu_plan().collect()  # warmup: codegen + JIT
        t0 = time.perf_counter()
        cpu_plan().collect()
        cpu_s = time.perf_counter() - t0

        shuffle_plan().collect()
        t0 = time.perf_counter()
        shuffle_plan().collect()
        shuf_s = time.perf_counter() - t0
        print(json.dumps({"cpus": cpus, "rows": rows,
                          "cpu_s": round(cpu_s, 3),
                          "shuffle_s": round(shuf_s, 3)}))
        sys.stdout.flush()
    finally:
        spark.stop()
    return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60_000_000)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--child-cpus", type=int, default=0)
    args = ap.parse_args()
    if args.child_cpus:
        run_one(args.child_cpus, args.rows)
        return
    levels = [int(x) for x in args.levels.split(",")]
    best: dict[int, dict[str, float]] = {
        lv: {"cpu_s": float("inf"), "shuffle_s": float("inf")}
        for lv in levels}
    for rep in range(args.repeats):  # interleave: noise spreads evenly
        for lv in levels:
            env = dict(os.environ)
            env["SPARK_GRAFT_CPUS"] = str(lv)
            env["SPARK_GRAFT_MASTER"] = f"local[{lv}]"
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child-cpus", str(lv), "--rows", str(args.rows)],
                capture_output=True, text=True, cwd=REPO, env=env)
            if out.returncode != 0:
                raise SystemExit(out.stderr[-2000:])
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            rec = json.loads(line)
            print(f"rep{rep} local[{lv}]: {rec}", file=sys.stderr)
            for k in ("cpu_s", "shuffle_s"):
                best[lv][k] = min(best[lv][k], rec[k])
    result: dict = {"rows": args.rows, "levels": {
        str(lv): best[lv] for lv in levels}}
    for a, b in zip(levels, levels[1:]):
        ratio = b / a
        result[f"cpu_eff_{a}_{b}"] = round(
            best[a]["cpu_s"] / (ratio * best[b]["cpu_s"]), 3)
        result[f"shuffle_eff_{a}_{b}"] = round(
            best[a]["shuffle_s"] / (ratio * best[b]["shuffle_s"]), 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
