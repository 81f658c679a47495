"""Inner-plan tap for the physical-plan audit (tools/plan_audit.py).

Iterative and multi-commit operators (pointer-jumping connected
components, the per-batch MERGE inside a checkpointed replay) execute
their expensive plans INSIDE the query function — the final returned
DataFrame is a checkpoint-cut or post-replay frame whose plan says
nothing about where the cost lives, so an audit of only that frame would
miss a regression in the loop (VERDICT r2: dedup_clusters and
cdc_fence_idempotent reported "joins: none, shuffles: 0").

Operators call `tap(name, df)` at their hot points. When no audit is
running (TAP is None — always, outside tools/plan_audit.py) the call is
a no-op costing one attribute check; when the audit enables it, the
JVM QueryExecution handle is recorded and stringified at DRAIN time —
after the operator's action ran — so AQE-replanned frames report their
FINAL physical plan (broadcast-vs-shuffle as executed), not the initial
pre-AQE shape (ADVICE r3: plan-build-time stringification recorded
initial plans). A tapped frame whose action never ran still stringifies,
as its initial plan. Never enabled in production paths.
"""

from __future__ import annotations

# None = disabled (production). tools/plan_audit.py sets this to a list
# around each audited query and drains it via drain_plans().
TAP: list | None = None


def tap(name: str, df) -> None:
    if TAP is None:
        return
    jqe = df._jdf.queryExecution()
    # keep BOTH: the plan as shaped at tap time (always available) and
    # the live QE handle for a post-execution re-read
    TAP.append((name, jqe.executedPlan().toString(), jqe))


def drain_plans(taps: list) -> list[tuple[str, str]]:
    """Stringify tapped QueryExecutions (call AFTER the query's actions
    ran). A tapped frame the operator executed directly reports its
    AQE-FINAL plan (`isFinalPlan=true`); a frame consumed via a derived
    twin (e.g. the merge result is written through a renamed copy, so
    THIS QE never runs) keeps the build-time string — the best shape
    that exists for it."""
    out = []
    for name, build_str, jqe in taps:
        try:
            drained = jqe.executedPlan().toString()
        except Exception:
            drained = build_str
        out.append((name,
                    drained if "isFinalPlan=true" in drained else build_str))
    return out
