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

    # ---- fold (fence metadata stays O(1), not O(batches)) ----

    def _fold_path(self) -> str:
        return os.path.join(self.dir, f"fold-{self.source_id or 'default'}.json")

    def _load_fold(self) -> dict:
        try:
            with open(self._fold_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"source_id": self.source_id, "spans": [], "retracted": []}

    @staticmethod
    def _fold_covers(fold: dict, batch_id: int) -> bool:
        return (batch_id in fold.get("retracted", [])
                or any(sp["from"] <= batch_id <= sp["to"]
                       for sp in fold.get("spans", [])))

    def fold(self, keep_last: int = 8) -> dict:
        """Merge old per-batch fence files into ONE span file (the
        checkpoint analog of manifest-segment folding). At 10^10 events
        the fence dir holds one tiny JSON per batch — 10^5+ files whose
        LISTING (startup recovery, reporting, contiguity audits) grows
        linearly while the per-batch fence check stays O(1). fold()
        collapses every committed record except the newest `keep_last`
        into consecutive-id spans carrying the chained LSN range (the
        contiguity proof survives folding), absorbs retracted tombstones
        into the fold's retract set, then deletes the per-batch files.
        Crash-safe: the span file is written atomically BEFORE any delete,
        and both sources agreeing is consistent — a leftover file is
        simply re-absorbed (and deduped) by the next fold. Resurrection
        stays impossible: _recover and the fence consult the fold exactly
        like a file."""
        recs: dict[int, dict] = {}
        prefix = f"batch-{self.source_id}-" if self.source_id else "batch-"
        for fn in os.listdir(self.dir):
            if not (fn.startswith(prefix) and fn.endswith(".json")):
                continue
            tail = fn[len(prefix):-len(".json")]
            if not tail.isdigit():
                continue
            with open(os.path.join(self.dir, fn)) as f:
                recs[int(tail)] = json.load(f)
        committed = sorted(b for b, r in recs.items()
                           if r.get("status") == "committed")
        fold_ids = committed[:-keep_last] if keep_last else committed
        gone_ids = sorted(b for b, r in recs.items()
                          if r.get("status") == "retracted")
        fold = self._load_fold()
        for bid in fold_ids:
            if self._fold_covers(fold, bid):
                continue  # crash leftover from a previous fold: dedupe
            r = recs[bid]
            spans = fold["spans"]
            last = spans[-1] if spans else None
            chains = (last is not None and bid == last["to"] + 1
                      and last.get("lsn_to") is not None
                      and r.get("lsn_from") == last["lsn_to"])
            if chains:
                last["to"] = bid
                last["lsn_to"] = r.get("lsn_to")
            else:
                spans.append({"from": bid, "to": bid,
                              "lsn_from": r.get("lsn_from"),
                              "lsn_to": r.get("lsn_to")})
        fold["retracted"] = sorted(set(fold.get("retracted", [])) | set(gone_ids))
        tmp = self._fold_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(fold, f)
        os.replace(tmp, self._fold_path())
        for bid in list(fold_ids) + gone_ids:
            try:
                os.unlink(self._path(bid))
            except FileNotFoundError:
                pass
        return {"folded": len(fold_ids), "retracted_folded": len(gone_ids),
                "spans": len(fold["spans"])}

    def _has_record(self, batch_id: int) -> bool:
        return (os.path.exists(self._path(batch_id))
                or self._fold_covers(self._load_fold(), batch_id))

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
                if not self._has_record(int(bid)):
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
        if os.path.exists(p):
            # per-batch file is the NEWER truth: a retract tombstone written
            # after a fold overrides the fold's committed span
            with open(p) as f:
                return json.load(f).get("status") == "committed"
        fold = self._load_fold()
        if batch_id in fold.get("retracted", []):
            return False
        return any(sp["from"] <= batch_id <= sp["to"]
                   for sp in fold.get("spans", []))

    def committed_batch_ids(self) -> list[int]:
        prefix = f"batch-{self.source_id}-" if self.source_id else "batch-"
        committed: set[int] = set()
        retracted_files: set[int] = set()
        for fn in os.listdir(self.dir):
            if not (fn.startswith(prefix) and fn.endswith(".json")):
                continue
            tail = fn[len(prefix):-len(".json")]
            if not tail.isdigit():  # another source's file under legacy prefix
                continue
            with open(os.path.join(self.dir, fn)) as f:
                if json.load(f).get("status") == "committed":
                    committed.add(int(tail))
                else:
                    retracted_files.add(int(tail))
        fold = self._load_fold()
        dead = set(fold.get("retracted", [])) | retracted_files
        for sp in fold.get("spans", []):
            committed.update(b for b in range(sp["from"], sp["to"] + 1)
                             if b not in dead)
        return sorted(committed - retracted_files)

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
        ranges contiguous, no gaps/overlaps. Folded spans carry the chained
        LSN range of their batches (verified when the span was extended),
        so the proof survives folding: chain spans and per-batch files in
        one id-ordered pass."""
        fold = self._load_fold()
        items = [(sp["from"], sp.get("lsn_from"), sp.get("lsn_to"))
                 for sp in fold.get("spans", [])]
        for bid in self.committed_batch_ids():
            if self._fold_covers(fold, bid):
                continue  # represented by its span
            rec = self.read(bid)
            items.append((bid, rec["lsn_from"], rec["lsn_to"]))
        prev_to = None
        for bid, lsn_from, lsn_to in sorted(items):
            if lsn_from is None:  # crash-recovered light record
                prev_to = None
                continue
            if prev_to is not None and lsn_from != prev_to:
                raise AssertionError(
                    f"checkpoint gap/overlap at batch {bid}: from={lsn_from} prev_to={prev_to}"
                )
            prev_to = lsn_to
