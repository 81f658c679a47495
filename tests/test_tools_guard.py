"""The two self-rewriting tools must not truncate their output files on
subset invocations (VERDICT r4 #8):

* tools/plan_audit.py with query args used to rewrite BENCH/PLANS.md with
  only those queries' sections;
* BENCH/scaling.py with a subset --levels / non-headline pipeline used to
  rewrite BENCH/results.json + BASELINE.md's headline with the subset.

Both now guard: plan_audit merges re-audited sections into the existing
file; scaling diverts non-headline runs to results_partial.json. These are
pure-logic tests — no Spark session.
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plan_audit_merge_keeps_untouched_sections():
    pa = _load(os.path.join(REPO, "tools", "plan_audit.py"), "plan_audit")
    text = (
        "# Physical-plan audit\n\nheader prose, kept verbatim.\n\n"
        "## q_alpha\n- joins: none\n- shuffles: 2\n\n"
        "## q_beta\n- joins: BroadcastHashJoin\n- shuffles: 1\n\n"
        "## q_gamma\n- joins: SortMergeJoin\n- shuffles: 4\n"
    )
    merged = pa.merge_sections(
        text, {"q_beta": ["## q_beta", "- joins: none", "- shuffles: 0"]},
        audited=["q_alpha", "q_beta", "q_gamma"])
    # untouched sections survive byte-for-byte content
    assert "## q_alpha\n- joins: none\n- shuffles: 2" in merged
    assert "## q_gamma\n- joins: SortMergeJoin\n- shuffles: 4" in merged
    # the re-audited section is replaced, not duplicated
    assert merged.count("## q_beta") == 1
    assert "- shuffles: 0" in merged
    assert "BroadcastHashJoin" not in merged
    assert merged.startswith("# Physical-plan audit")
    assert "header prose, kept verbatim." in merged
    # a brand-new section (not in AUDITED) appends rather than vanishing
    merged2 = pa.merge_sections(
        merged, {"q_new": ["## q_new", "- joins: none"]},
        audited=["q_alpha", "q_beta", "q_gamma"])
    assert merged2.rstrip().endswith("## q_new\n- joins: none")
    assert merged2.count("## q_alpha") == 1


def test_scaling_headline_guard():
    sc = _load(os.path.join(REPO, "BENCH", "scaling.py"), "bench_scaling")
    prev = {"levels": {"1": {}, "4": {}, "16": {}}, "pipeline": "serial",
            "events_per_batch": 9_000_000}
    ok = sc.is_headline_request
    # the canonical protocol may rewrite the headline
    assert ok(prev, [1, 4, 16], "serial", 9_000_000)
    assert ok(prev, [16, 1, 4], "serial", 9_000_000)  # order-insensitive
    # subset levels, different pipeline, different batch size: diverted
    assert not ok(prev, [4, 16], "serial", 9_000_000)
    assert not ok(prev, [1, 4, 16], "ra1+sa", 9_000_000)
    assert not ok(prev, [1, 4, 16], "serial", 1_000_000)
    # no recorded headline yet: first run establishes it
    assert ok(None, [4, 16], "ra1", 123)
    # malformed record never blocks (fail-open, matches old behavior)
    assert ok({"levels": "garbage"}, [1], "serial", 1)


def test_scaling_cli_subset_writes_partial(tmp_path, monkeypatch):
    """End-to-end CLI shape: a subset --repeats 0 invocation recomputing
    from history must leave results.json and BASELINE.md untouched and
    write results_partial.json instead."""
    import json
    import shutil
    import subprocess
    import sys

    bench = tmp_path / "BENCH"
    bench.mkdir()
    shutil.copy(os.path.join(REPO, "BENCH", "scaling.py"), bench / "scaling.py")
    # minimal history covering levels 4 and 16 at one batch size
    epb = 9_000_000
    with open(bench / "history.jsonl", "w") as f:
        for c, t in ((1, 40.0), (4, 12.0), (16, 9.0)):
            f.write(json.dumps({
                "ts": 0, "cpus": c, "events": 5 * epb, "batches": 5,
                "events_per_batch": epb, "merge_strategy": "cow",
                "pipeline": "serial", "timed_batch_sec": [t, t],
                "final_rows": 111}) + "\n")
    headline = {"levels": {"1": {}, "4": {}, "16": {}},
                "pipeline": "serial", "events_per_batch": epb}
    with open(bench / "results.json", "w") as f:
        json.dump(headline, f)
    with open(bench / "BASELINE.md", "w") as f:
        f.write("HEADLINE MD SENTINEL\n")
    r = subprocess.run(
        [sys.executable, str(bench / "scaling.py"), "--repeats", "0",
         "--levels", "4,16", "--events", str(5 * epb)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert (bench / "results_partial.json").exists()
    with open(bench / "results.json") as f:
        assert json.load(f) == headline  # untouched
    with open(bench / "BASELINE.md") as f:
        assert f.read() == "HEADLINE MD SENTINEL\n"  # untouched
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["headline_untouched"] is True
