#!/usr/bin/env python
"""Metadata-plane (driver/planner) scaling benchmark.

At 10^10 events / ~100 TB, the table holds on the order of 10^5 data
files; every read, merge and commit first pays a DRIVER-side planning
cost over the manifest (load segments, bucket split, bounds skip, bloom
skip, diff against parent, write the new segment). The reference has no
client-side planner at all (it ships SQL text), so this cost has no
reference analog — but it is exactly the axis where a naive "one JSON
blob per snapshot" design stops scaling, which is why the table keeps
two-tier segmented manifests (SURVEY.md §8). This bench measures that
plane in isolation: REAL planner code (`manifest()`, `scan_stats`,
`_commit`/`_write_manifest`, fold, `version_as_of`) over
SYNTHETIC-but-shape-identical file entries (same keys, realistic stats
ranges, real 1 KiB bloom blobs built by sources/bloom.build). Zero data
IO by construction — planning must never open a data file.

Prints ONE JSON line:
  {"files": N, "load_cold_s": ..., "plan_full_s": ..., "plan_bounds_s": ...,
   "plan_bloom_s": ..., "plan_bucket_s": ..., "commit_append_s": ...,
   "fold_s": ..., "version_as_of_s": ..., ...per-plan files_read...}

Usage: python BENCH/metadata_plane.py [--files 100000] [--buckets 256]
                                      [--commits 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA  # noqa: E402
from embulk_output_databricks_spark.session import build_session  # noqa: E402
from embulk_output_databricks_spark.sources import bloom  # noqa: E402
from embulk_output_databricks_spark.sources.laketable import (  # noqa: E402
    LakeCatalog,
    LakeTable,
)

ROWS_PER_FILE = 50_000
BYTES_PER_FILE = 64 * 2**20  # ~64 MiB parquet => 100k files ~ 6 TB payload


def fabricate_entries(n: int, n_buckets: int, start: int = 0) -> list[dict]:
    """File entries shape-identical to real appends: disjoint sorted
    doc_id ranges (bounds prune-able), per-file bloom over a sample of the
    file's keys (bloom prune-able), realistic rows/bytes. Paths are fake —
    the planner never opens them."""
    out = []
    for i in range(start, start + n):
        lo, hi = i * ROWS_PER_FILE, (i + 1) * ROWS_PER_FILE - 1
        keys = [f"d{k:012d}" for k in range(lo, hi + 1, ROWS_PER_FILE // 64)]
        out.append({
            "path": f"data/fab{i:08d}.parquet",
            "bucket": i % n_buckets,
            "rows": ROWS_PER_FILE,
            "sv": 0,
            "bytes": BYTES_PER_FILE,
            "stats": {"doc_id": [f"d{lo:012d}", f"d{hi:012d}"],
                      "n_tok": [1, 2048],
                      "source": ["web", "web"]},
            "nn": ["doc_id", "n_tok", "source"],
            "bloom": {"doc_id": bloom.build(keys)},
        })
    return out


def timeit(fn, repeat: int = 3) -> float:
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100_000)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--commits", type=int, default=32,
                    help="spread the fabricated files over this many "
                         "commits (segment-accumulation realism)")
    args = ap.parse_args()

    spark = build_session("metadata-plane-bench")
    wh = tempfile.mkdtemp(prefix="meta_bench_")
    try:
        cat = LakeCatalog(spark, wh)
        t = cat.create_table("seq", SEQUENCES_SCHEMA, bucket_key="doc_id",
                             n_buckets=args.buckets,
                             properties={"bloom_columns": "doc_id"})

        # Accrete the fabricated history through the REAL commit path so
        # segment layout (incl. automatic folds) is what production writes
        # produce, and time the last commit = append latency at ~N files.
        per = args.files // args.commits
        build_t0 = time.perf_counter()
        commit_last_s = None
        for c in range(args.commits):
            n = per if c < args.commits - 1 else args.files - per * (args.commits - 1)
            ents = fabricate_entries(n, args.buckets, start=c * per)
            base = t.manifest()
            t0 = time.perf_counter()
            t._commit(base, base.files + ents)
            commit_last_s = time.perf_counter() - t0
        build_s = time.perf_counter() - build_t0

        m = t.manifest()
        assert len(m.files) == args.files, len(m.files)

        # one more single-file append on top of the full table: the
        # steady-state per-batch commit cost (segment diff + tiny write)
        base = t.manifest()
        one = fabricate_entries(1, args.buckets, start=args.files)
        t0 = time.perf_counter()
        t._commit(base, base.files + one)
        commit_one_s = time.perf_counter() - t0

        def cold_load():
            fresh = LakeTable(spark, t.root, t.name)
            fresh.manifest()

        load_cold_s = timeit(cold_load, repeat=3)

        plans = {}
        full = {}

        def plan(name, **kw):
            s = {}
            def run():
                s.update(t.scan_stats(**kw))
            plans[name + "_s"] = timeit(run)
            plans[name + "_files_read"] = s["files_read"]
            full[name] = s

        mid = (args.files // 2) * ROWS_PER_FILE
        plan("plan_full")
        plan("plan_bounds",
             stats_filter={"doc_id": (f"d{mid:012d}", f"d{mid + 10:012d}")})
        plan("plan_bloom", eq_filter={"doc_id": f"d{mid:012d}"})
        plan("plan_bucket", buckets={3})

        # forced full fold: worst-case maintenance rewrite of the whole
        # manifest (the rewrite_manifests analog) at N files
        base = t.manifest()
        saved = t._FOLD_SEGMENTS
        t._FOLD_SEGMENTS = 0
        t0 = time.perf_counter()
        t._commit(base, base.files)
        fold_s = time.perf_counter() - t0
        t._FOLD_SEGMENTS = saved

        as_of_s = timeit(
            lambda: t.version_as_of(int(time.time() * 1_000_000)), repeat=1)

        print(json.dumps({
            "bench": "metadata_plane",
            "files": args.files,
            "buckets": args.buckets,
            "commits": args.commits,
            "payload_tb_equiv": round(args.files * BYTES_PER_FILE / 2**40, 2),
            "build_total_s": round(build_s, 3),
            "commit_batch_last_s": round(commit_last_s, 3),
            "commit_append_one_s": round(commit_one_s, 3),
            "load_cold_s": round(load_cold_s, 3),
            **{k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in plans.items()},
            "fold_s": round(fold_s, 3),
            "version_as_of_s": round(as_of_s, 4),
            "note": "real planner code over synthetic shape-identical "
                    "entries; zero data IO",
        }))
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
