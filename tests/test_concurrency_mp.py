"""TRUE multiprocess optimistic concurrency (VERDICT r4 #5): two OS
processes — separate JVMs, separate SparkSessions — commit merges with
bounds-disjoint key bands concurrently against ONE table. The manifest
commit protocol (laketable._write_manifest: open(path, 'x') O_EXCL +
atomic head publish) must serialize them; lost head races rebase
(_rebase_files) because the bands' file bounds are provably disjoint.

Asserts serial-order equivalence — the final state is exactly what ANY
serial interleaving of the two writers' commit sequences produces (each
writer's own rounds are ordered; cross-writer rows are disjoint) — plus
commit_retries accounting on every returned manifest, contiguous version
numbering, and at least one observed lost-race rebase across the run
(re-raced on a fresh table up to 3 times, barrier-started, so a zero-race
run is vanishingly unlikely to repeat).

The in-process interleaved races stay in tests/test_concurrency.py; this
file only pins that the same guarantees hold across real process
boundaries (file-locking semantics, no shared Python state).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_ROUNDS = 5
BAND = 40  # keys per writer

_WRITER = r'''
import json, os, sys, time
# under `python -c`, argv[0] is '-c' and the passed args start at argv[1]:
# warehouse name prefix n barrier out repo band
sys.path.insert(0, sys.argv[7])
warehouse, name, prefix, n, barrier, out = sys.argv[1:7]
n = int(n)
from embulk_output_databricks_spark.session import build_session
from embulk_output_databricks_spark.sources import LakeCatalog
from embulk_output_databricks_spark.plans.merge import merge_apply
from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA

spark = build_session(f"mp-writer-{prefix}", master="local[4]",
                      shuffle_partitions=4)
t = LakeCatalog(spark, warehouse).load(name)
with open(out + ".ready", "w") as f:
    f.write("r")
while not os.path.exists(barrier):
    time.sleep(0.02)
res = []
for i in range(n):
    rows = [(f"{prefix}{k:08d}", [k, i], 2, f"{prefix}-r{i}")
            for k in range(int(sys.argv[8]))]
    df = spark.createDataFrame(rows, SEQUENCES_SCHEMA)
    m = merge_apply(t, df, ["doc_id"])
    res.append({"version": m.version,
                "retries": int(m.properties.get("commit_retries", 0)),
                "has_marker": "commit_retries" in m.properties})
with open(out, "w") as f:
    json.dump(res, f)
spark.stop()
'''


def _race_once(spark, warehouse, name):
    """One barrier-started two-process race; returns (results_a, results_b)."""
    from embulk_output_databricks_spark.schema import SEQUENCES_SCHEMA
    from embulk_output_databricks_spark.sources import LakeCatalog

    cat = LakeCatalog(spark, warehouse)
    t = cat.create_table(name, SEQUENCES_SCHEMA, n_buckets=2,
                         bucket_key="doc_id")
    # seed each band in its OWN commit so no data file mixes bands —
    # file bounds stay band-disjoint and concurrent rewrites commute
    for prefix in ("a", "b"):
        rows = [(f"{prefix}{k:08d}", [k], 1, "seed") for k in range(BAND)]
        t.append(spark.createDataFrame(rows, SEQUENCES_SCHEMA))

    tmp = tempfile.mkdtemp(prefix="mp_race_")
    barrier = os.path.join(tmp, "go")
    outs, procs = [], []
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_SCHEDULER", None)  # writers are plain serial
    for prefix in ("a", "b"):
        out = os.path.join(tmp, f"{prefix}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WRITER, warehouse, name, prefix,
             str(N_ROUNDS), barrier, out, REPO, str(BAND)],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            text=True))
    deadline = time.time() + 300
    while not all(os.path.exists(o + ".ready") for o in outs):
        for p in procs:
            if p.poll() is not None and p.returncode != 0:
                raise AssertionError(p.stderr.read())
        assert time.time() < deadline, "writers never became ready"
        time.sleep(0.1)
    with open(barrier, "w") as f:
        f.write("go")  # both sessions warm: release simultaneously
    for p in procs:
        assert p.wait(timeout=300) == 0, p.stderr.read()
    res = []
    for out in outs:
        with open(out) as f:
            res.append(json.load(f))
    return res


def test_two_process_disjoint_band_merges(spark, warehouse):
    total_retries = 0
    for attempt in range(3):
        name = f"mp{attempt}"
        res_a, res_b = _race_once(spark, warehouse, name)
        # retries accounting: marker present iff the commit rebased
        for res in (res_a, res_b):
            assert len(res) == N_ROUNDS
            for r in res:
                assert r["has_marker"] == (r["retries"] > 0)
        # serial-order equivalence: every band key carries its writer's
        # LAST round; no rows lost, none duplicated
        from embulk_output_databricks_spark.sources import LakeCatalog
        t = LakeCatalog(spark, warehouse).load(name)
        rows = {r["doc_id"]: r for r in t.read().collect()}
        assert len(rows) == 2 * BAND
        assert t.row_count() == 2 * BAND
        last = f"r{N_ROUNDS - 1}"
        for prefix in ("a", "b"):
            for k in range(BAND):
                r = rows[f"{prefix}{k:08d}"]
                assert r["source"] == f"{prefix}-{last}", r
                assert list(r["tokens"]) == [k, N_ROUNDS - 1]
        # contiguous version numbering: create + 2 seeds + 2n merges,
        # every lost race rebased onto the next head (no burned numbers)
        versions = sorted([r["version"] for r in res_a]
                          + [r["version"] for r in res_b])
        assert versions == list(range(3, 3 + 2 * N_ROUNDS)), versions
        assert t.manifest().version == 2 + 2 * N_ROUNDS
        total_retries += sum(r["retries"] for r in res_a + res_b)
        if total_retries:
            break
    # barrier-started writers over 5 rounds each: at least one same-head
    # race must have been observed (re-raced up to 3x above)
    assert total_retries >= 1
