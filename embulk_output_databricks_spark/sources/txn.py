"""Catalog-level multi-table transactions (Nessie / Iceberg-REST catalog
commit analog).

Single-table commits are atomic snapshot swaps, but a CDC batch that
touches several tables (fact + its dimension, corpus + its quarantine,
the multi-table fan-out's N targets) publishes them one by one — a reader
between two of those commits sees a cross-table state that never
logically existed, and a crash strands half the batch. The lake world's
answer is a CATALOG commit: stage every table's changes off to the side,
then flip all the pointers as one unit. This module composes that from
primitives the engine already has:

    txn = catalog.begin(["fact", "dim"])    # branch txn-<id> per table
    txn.table("fact").append(...)           # writes advance ONLY branches
    txn.table("dim") .merge...              #   (main readers see nothing)
    txn.commit()                            # intent record -> publish all
                                            #   (O(1) pointer swaps)

Commit protocol and crash matrix:
  1. validate every table's main head is still the fork base (cheap
     all-or-nothing failure BEFORE anything becomes visible);
  2. write one intent record `_txlog/txn-<id>.json` (tmp + atomic rename)
     naming every (table, branch head) — the transaction's commit POINT;
  3. publish each branch (ancestry-checked fast-forward, already
     idempotent: a re-publish of a published head is a no-op);
  4. drop branches, remove the intent record.

Crash before 2: nothing visible; `recover_transactions()` reaps the
abandoned txn- branches (age-gated so an in-flight begin() is safe).
Crash during/after 2: the intent record IS the decision — recovery rolls
FORWARD, re-publishing whatever remains, then cleans up. So the published
state is all-or-nothing at the intent boundary, exactly once, across any
number of crashes.

Isolation contract (documented, not magical): writers must not commit to
a txn table's MAIN head while the transaction is open — step 1/3's
ancestry check turns such interference into a TransactionConflict (and a
conflict AFTER the intent point, i.e. a rogue writer racing recovery,
surfaces as a conflict needing operator resolution rather than silent
data loss). Readers combine this with `LakeCatalog.pin_snapshot()` for
consistent cross-table reads: pin before, or after, never half-way —
the pin captures versions at one instant and published pointer swaps are
atomic per table, so a pin taken at any moment sees each table either
entirely before or entirely after the transaction's publishes land...
with full atomicity for pins taken outside the (microseconds-long)
publish window of step 3. True reader-side atomicity INSIDE that window
would need every read to resolve through a catalog version pointer —
the Nessie design — which this single-warehouse engine trades away for
zero read-path indirection.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from .laketable import CommitConflict, LakeTable


class TransactionConflict(RuntimeError):
    """Main head of a transaction table moved while the txn was open."""


TXLOG_DIR = "_txlog"
BRANCH_PREFIX = "txn-"


def _txlog_dir(catalog) -> str:
    p = os.path.join(catalog.warehouse, TXLOG_DIR)
    os.makedirs(p, exist_ok=True)
    return p


class CatalogTransaction:
    """One open multi-table transaction. Use via LakeCatalog.begin()."""

    def __init__(self, catalog, names: list[str]):
        if not names:
            raise ValueError("transaction needs at least one table")
        if len(set(names)) != len(names):
            raise ValueError("duplicate table in transaction")
        self.catalog = catalog
        self.txid = uuid.uuid4().hex[:12]
        self.branch = f"{BRANCH_PREFIX}{self.txid}"
        self._tables: dict[str, tuple[LakeTable, LakeTable, int]] = {}
        self._done = False
        try:
            for n in names:
                t = catalog.load(n)
                b = t.create_branch(self.branch)
                self._tables[n] = (t, b, t.current_version())
        except BaseException:
            self._drop_branches()
            raise

    # -- staging handles --

    def table(self, name: str) -> LakeTable:
        """Branch handle: every write through it advances ONLY the
        transaction's branch; main readers see nothing until commit."""
        self._check_open()
        if name not in self._tables:
            raise ValueError(f"table {name!r} not in this transaction")
        return self._tables[name][1]

    def tables(self) -> list[str]:
        return sorted(self._tables)

    # -- lifecycle --

    def commit(self) -> dict[str, int]:
        """Publish every table's staged commits as one unit; returns
        {table: published head version}. All-or-nothing at the intent
        boundary; raises TransactionConflict (after rolling back) if any
        main head moved since begin()."""
        self._check_open()
        heads: dict[str, int] = {}
        for n, (t, b, base) in self._tables.items():
            cur = t.current_version()
            if cur != base:
                self.rollback()
                raise TransactionConflict(
                    f"{n}: main advanced v{base} -> v{cur} while the "
                    f"transaction was open")
            heads[n] = b.current_version()
        intent = {"txid": self.txid, "branch": self.branch,
                  "tables": heads,
                  "committed_at_us": int(time.time() * 1_000_000)}
        path = os.path.join(_txlog_dir(self.catalog), f"{self.branch}.json")
        tmp = f"{path}.tmp-{self.txid}"
        with open(tmp, "w") as f:
            json.dump(intent, f)
        os.replace(tmp, path)  # ---- the transaction's commit point ----
        _publish_intent(self.catalog, intent)
        os.unlink(path)
        self._done = True
        return heads

    def rollback(self) -> None:
        """Discard every staged commit (branch drops; data files reclaimed
        by orphan GC once unreferenced). Nothing ever became visible."""
        self._check_open()
        self._drop_branches()
        self._done = True

    def _drop_branches(self) -> None:
        for n, (t, _b, _base) in self._tables.items():
            try:
                t.drop_branch(self.branch)
            except ValueError:
                pass  # never created / already dropped

    def _check_open(self) -> None:
        if self._done:
            raise RuntimeError("transaction already committed or rolled back")


def _publish_intent(catalog, intent: dict) -> None:
    """Roll the intent forward: publish every named branch head (skipping
    the already-published — publish is idempotent by ancestry), then drop
    the branches. Shared by commit() and crash recovery."""
    branch = intent["branch"]
    for n, head in intent["tables"].items():
        t = catalog.load(n)
        cur = t.current_version()
        if cur == head or t._is_ancestor(head, cur):
            pass  # already published (recovery re-run)
        else:
            try:
                t.publish_branch(branch)
            except (CommitConflict, FileNotFoundError) as e:
                raise TransactionConflict(
                    f"{n}: cannot roll transaction {intent['txid']} "
                    f"forward to v{head} (head v{cur} diverged) — a writer "
                    f"bypassed the open transaction; resolve manually"
                ) from e
        try:
            t.drop_branch(branch)
        except ValueError:
            pass


def recover_transactions(catalog, reap_abandoned_after_s: float = 3600
                         ) -> dict[str, str]:
    """Crash recovery, call at startup: every intent record in _txlog is
    rolled FORWARD (its transaction reached the commit point) and removed;
    txn- branches with NO intent record older than `reap_abandoned_after_s`
    are reaped (a begin() that died before commit — nothing was visible).
    Returns {txid: 'published' | 'reaped'}."""
    out: dict[str, str] = {}
    logdir = _txlog_dir(catalog)
    for fn in sorted(os.listdir(logdir)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(logdir, fn)) as f:
            intent = json.load(f)
        _publish_intent(catalog, intent)
        os.unlink(os.path.join(logdir, fn))
        out[intent["txid"]] = "published"
    for n in catalog.list_tables():
        t = catalog.load(n)
        for b in t.list_branches():
            if not b.startswith(BRANCH_PREFIX):
                continue
            if f"{b}.json" in os.listdir(logdir):
                continue  # intent exists: handled above / being committed
            ref_path = t._meta(f"BRANCH-{b}")
            try:
                age = time.time() - os.path.getmtime(ref_path)
            except OSError:
                continue
            if age > reap_abandoned_after_s:
                t.drop_branch(b)
                out.setdefault(b[len(BRANCH_PREFIX):], "reaped")
    return out
