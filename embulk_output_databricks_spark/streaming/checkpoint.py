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
    def __init__(self, table: LakeTable):
        self.table = table
        self.dir = os.path.join(table.root, "meta", "ckpt")
        os.makedirs(self.dir, exist_ok=True)
        self._recover()

    def _path(self, batch_id: int) -> str:
        return os.path.join(self.dir, f"batch-{batch_id:012d}.json")

    def _recover(self) -> None:
        """Crash reconciliation: trust the snapshot, repair the checkpoint."""
        try:
            m = self.table.manifest()
        except FileNotFoundError:
            return
        bid = m.properties.get("batch_id")
        if bid is not None and not os.path.exists(self._path(int(bid))):
            rec = {
                "batch_id": int(bid),
                "lsn_from": m.properties.get("lsn_from"),
                "lsn_to": m.properties.get("lsn_to"),
                "snapshot_version": m.version,
                "committed_at": m.properties.get("committed_at"),
                "status": "committed",
                "lineage": m.properties.get("lineage", []),
                "recovered": True,
            }
            self._write(rec)

    def _write(self, rec: dict) -> None:
        tmp = self._path(rec["batch_id"]) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._path(rec["batch_id"]))

    # ---- fence ----

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._path(batch_id))

    def committed_batch_ids(self) -> list[int]:
        return sorted(
            int(fn[len("batch-"):-len(".json")])
            for fn in os.listdir(self.dir)
            if fn.startswith("batch-") and fn.endswith(".json")
        )

    def last_committed(self) -> int | None:
        ids = self.committed_batch_ids()
        return ids[-1] if ids else None

    def retract(self, batch_id: int) -> bool:
        """Remove a batch's fence entry — the pairing step of
        LakeTable.rollback(): after rolling the table back past a bad
        batch, retracting its fence lets the replay loop re-apply the
        corrected batch under the same batch_id. Returns whether an entry
        existed."""
        p = self._path(batch_id)
        if os.path.exists(p):
            os.unlink(p)
            return True
        return False

    # ---- commit ----

    def commit(self, batch_id: int, lsn_from: int, lsn_to: int,
               snapshot_version: int, lineage: list[dict],
               metrics: dict | None = None) -> dict:
        rec = {
            "batch_id": batch_id,
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
