"""Batch fencing + checkpoint/lineage store — the exactly-once half of the
north rule.

The reference is explicitly NOT resumable (every mode: "Resumable: No",
reference README.md:50-69); its atomicity trick is "all work in intermediate
tables, one final statement" (DatabricksOutputConnection.java:133-171). We
keep that trick (one atomic snapshot per batch) and add what it lacks:

  * fence: a batch_id is applied at most once. The target snapshot itself
    carries `properties["batch_id"]`, so the fence survives anything that
    survives the table.
  * checkpoint: one JSON record per committed batch under the table's meta
    dir (offset range, snapshot version, per-partition lineage metrics) —
    FIXTURES.md F3/F4.
  * crash reconciliation (SURVEY.md §7.4 'the one genuinely subtle piece'):
    the write order is  MERGE-snapshot-commit  ->  checkpoint write.
    If we crash between the two, on restart the target's current snapshot
    names a batch_id the checkpoint store has no record of; the store
    re-derives that record from the snapshot properties instead of
    re-applying the batch. Re-running a committed batch is therefore a no-op
    (fence hit), and a torn run never double-applies: exactly-once.

Checkpoint records are driver-side metadata (one per batch, thousands at
most) — tiny by design; the data plane never touches them.
"""

from __future__ import annotations

import json
import os
import time

from ..sources.laketable import LakeTable


class CheckpointStore:
    def __init__(self, table: LakeTable, source_id: str = ""):
        """`source_id` namespaces the fence for MULTI-SOURCE FAN-IN: N
        independent binlog shards (each owning a disjoint key range, the
        standard sharded-CDC layout) apply into ONE table, each with its
        own batch-id sequence, fence files, and crash reconciliation.
        Empty source_id is the single-stream layout (legacy file names)."""
        if source_id and not source_id.replace("-", "").replace("_", "").isalnum():
            raise ValueError(f"source_id {source_id!r} must be filename-safe")
        self.table = table
        self.source_id = source_id
        self.dir = os.path.join(table.root, "meta", "ckpt")
        os.makedirs(self.dir, exist_ok=True)
        self._recover()

    def _path(self, batch_id: int) -> str:
        if self.source_id:
            return os.path.join(
                self.dir, f"batch-{self.source_id}-{batch_id:012d}.json")
        return os.path.join(self.dir, f"batch-{batch_id:012d}.json")

    def _recover(self) -> None:
        """Crash reconciliation: trust the snapshot, repair the checkpoint.

        Single-stream: the torn batch (snapshot committed, checkpoint not
        written) is by construction the HEAD snapshot. Source-scoped: other
        sources may have committed after the crash, so walk the parent
        chain to this source's LATEST batch snapshot (at most one in-flight
        batch per source process). A file already present — committed OR
        retracted tombstone — is never overwritten, so a rolled-back batch
        cannot resurrect out of retained history."""
        try:
            m = self.table.manifest()
        except FileNotFoundError:
            return
        while m is not None:
            bid = m.properties.get("batch_id")
            src = m.properties.get("source_id") or ""
            if bid is not None and src == self.source_id:
                if not os.path.exists(self._path(int(bid))):
                    rec = {
                        "batch_id": int(bid),
                        "source_id": self.source_id,
                        "lsn_from": m.properties.get("lsn_from"),
                        "lsn_to": m.properties.get("lsn_to"),
                        "snapshot_version": m.version,
                        "committed_at": m.properties.get("committed_at"),
                        "status": "committed",
                        "lineage": m.properties.get("lineage", []),
                        "recovered": True,
                    }
                    self._write(rec)
                return
            if not self.source_id:
                return  # single-stream: only the head is a candidate
            try:
                m = (self.table.manifest(m.parent)
                     if m.parent is not None else None)
            except FileNotFoundError:
                return  # history expired past this source's last batch

    def _write(self, rec: dict) -> None:
        tmp = self._path(rec["batch_id"]) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._path(rec["batch_id"]))

    # ---- fence ----

    def is_committed(self, batch_id: int) -> bool:
        p = self._path(batch_id)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return json.load(f).get("status") == "committed"

    def committed_batch_ids(self) -> list[int]:
        prefix = f"batch-{self.source_id}-" if self.source_id else "batch-"
        out = []
        for fn in os.listdir(self.dir):
            if not (fn.startswith(prefix) and fn.endswith(".json")):
                continue
            tail = fn[len(prefix):-len(".json")]
            if not tail.isdigit():  # another source's file under legacy prefix
                continue
            with open(os.path.join(self.dir, fn)) as f:
                if json.load(f).get("status") == "committed":
                    out.append(int(tail))
        return sorted(out)

    def last_committed(self) -> int | None:
        ids = self.committed_batch_ids()
        return ids[-1] if ids else None

    def retract(self, batch_id: int) -> bool:
        """Remove a batch's fence entry — the pairing step of
        LakeTable.rollback(): after rolling the table back past a bad
        batch, retracting its fence lets the replay loop re-apply the
        corrected batch under the same batch_id. Returns whether a
        committed entry existed. Writes a RETRACTED tombstone (not a
        delete): crash reconciliation never overwrites an existing file,
        so the tombstone keeps the bad batch from resurrecting out of
        retained snapshot history."""
        was = self.is_committed(batch_id)
        self._write({"batch_id": batch_id, "source_id": self.source_id,
                     "status": "retracted"})
        return was

    # ---- commit ----

    def commit(self, batch_id: int, lsn_from: int, lsn_to: int,
               snapshot_version: int, lineage: list[dict],
               metrics: dict | None = None) -> dict:
        rec = {
            "batch_id": batch_id,
            "source_id": self.source_id,
            "lsn_from": lsn_from,
            "lsn_to": lsn_to,
            "snapshot_version": snapshot_version,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "status": "committed",
            "lineage": lineage,
        }
        if metrics:
            rec["metrics"] = metrics
        self._write(rec)
        return rec

    def read(self, batch_id: int) -> dict:
        with open(self._path(batch_id)) as f:
            return json.load(f)

    def validate_contiguous(self) -> None:
        """FIXTURES.md F6 invariant 3: batch ids strictly increasing, offset
        ranges contiguous, no gaps/overlaps."""
        prev_to = None
        for bid in self.committed_batch_ids():
            rec = self.read(bid)
            if rec["lsn_from"] is None:  # crash-recovered light record
                prev_to = None
                continue
            if prev_to is not None and rec["lsn_from"] != prev_to:
                raise AssertionError(
                    f"checkpoint gap/overlap at batch {bid}: from={rec['lsn_from']} prev_to={prev_to}"
                )
            prev_to = rec["lsn_to"]
