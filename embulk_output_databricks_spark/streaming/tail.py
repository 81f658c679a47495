"""Structured Streaming front-end for the replay engine.

The reference is strictly batch ("Resumable: No" in every mode, reference
README.md:50-69); the engine's native loop is checkpointed batch replay
(replay.py). This module adds the true streaming entry: a binlog DIRECTORY
is tailed with spark.readStream and every micro-batch is funneled through
the SAME fenced run_batch path via foreachBatch — so exactly-once comes
from the engine's fence/checkpoint, not from Spark's own WAL (Spark's
epoch id maps to our batch_id; a replayed epoch after a crash hits the
fence and is a no-op).

Scale notes: the stream source lists only new files per trigger
(maxFilesPerTrigger bounds batch size); everything downstream is the
identical dedup->merge plan, so streaming and batch replay share one code
path and one performance profile.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..schema import BINLOG_SCHEMA
from .replay import ReplayDriver


def tail_binlog_dir(
    spark: SparkSession,
    binlog_dir: str,
    driver: ReplayDriver,
    stream_checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    available_now: bool = True,
):
    """Tail a directory of binlog parquet files into the target table.

    Returns the StreamingQuery; with available_now=True the stream drains
    everything currently in the directory and stops (the testable mode),
    otherwise it runs continuously.

    Batch identity: each micro-batch applies as batch_id = epoch_id. Spark
    may redeliver an epoch after a crash; the engine fence makes the
    redelivery a no-op, which is exactly the exactly-once contract of
    FIXTURES.md S11 lifted onto streaming.
    """
    src = (
        spark.readStream
        .schema(BINLOG_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(binlog_dir)
    )

    def apply_epoch(df, epoch_id: int) -> None:
        driver.run_batch(df, int(epoch_id))

    writer = src.writeStream.foreachBatch(apply_epoch).option(
        "checkpointLocation", stream_checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


class CursorExpired(RuntimeError):
    """The follower's cursor predates retained snapshot history
    (expire_snapshots reclaimed the from-version manifest), so the
    interval diff is unrecoverable — the CDF "cursor too old" condition.
    Recover with TableFollower.resync(): truncate-and-load the full
    current state, then advance to its version."""


class TableFollower:
    """Downstream table-as-stream consumer (change-data-feed reader analog,
    built on row lineage): the OTHER side of the pipeline from
    tail_binlog_dir — not events INTO the table but the table's own
    committed state OUT to a consumer (a training job tailing the corpus).

    poll() returns (df, from_version, to_version) with exactly the rows
    inserted or modified in the interval (LakeTable.changed_since: IO is
    O(files committed in the interval), row-exact across COW merges and
    compactions) or None when the head hasn't moved. The consumer calls
    advance(to_version) only after it has durably processed the frame —
    emit-then-advance ordering means a crash can only replay a suffix, and
    because the feed is keyed upsert rows, downstream re-apply is
    idempotent (the same at-least-once-plus-idempotence contract the
    ingest fence provides on the way in). The cursor is one JSON file, so
    a restarted consumer resumes exactly where it left off.

    Default mode is upsert-only: rows deleted in the interval simply
    don't appear. Pass `keys` (the table's merge keys) to get the FULL
    change feed instead: poll() then emits the interval's diff() rows
    with `__op` in {'I','U','D'} — 'D' rows carry the last-seen old
    values, so a downstream replica can delete by key. Cost stays
    bucket-pruned either way (diff reads only buckets whose manifest
    entries changed); re-delivery after a crash stays idempotent because
    keyed upserts AND keyed deletes are both idempotent on re-apply.

    Frames are rate-limited like Delta's maxFilesPerTrigger: `max_versions`
    caps how many commits one poll() spans (O(1), no metadata reads) and
    `max_files` shrinks that window further until the files the frame would
    read fit the cap — a consumer waking up behind a week of commits drains
    the backlog in bounded, checkpointable frames instead of one giant read
    (at 100 TB an unbounded catch-up frame is an OOM, not a batch). A single
    commit larger than `max_files` still advances one version — the feed
    can never stall.
    """

    def __init__(self, table, cursor_path: str, from_version: int | None = None,
                 keys: list[str] | None = None,
                 max_versions: int | None = None,
                 max_files: int | None = None):
        import json
        import os

        self.table = table
        self.keys = keys
        self.max_versions = max_versions
        self.max_files = max_files
        self.cursor_path = cursor_path
        if not os.path.exists(cursor_path):
            start = (table.current_version() if from_version is None
                     else from_version)
            with open(cursor_path, "w") as f:
                json.dump({"version": start}, f)

    @property
    def position(self) -> int:
        import json

        with open(self.cursor_path) as f:
            return json.load(f)["version"]

    def poll(self):
        cur = self.position
        head = self.table.current_version()
        if head <= cur:
            return None
        try:
            self.table.manifest(cur)  # cursor must still be retained
        except FileNotFoundError:
            raise CursorExpired(
                f"{self.table.name}: cursor v{cur} predates retained history "
                f"(head v{head}); call resync()") from None
        to = head
        if self.max_versions is not None:
            to = min(to, cur + self.max_versions)
        if self.max_files is not None:
            # shrink the window until the frame's read set fits the cap:
            # count live entries committed after the cursor at each candidate
            # version, keep the last one within budget. Always spans at least
            # one version so an oversized single commit cannot stall the feed.
            from embulk_output_databricks_spark.sources.laketable import _live_data

            best = cur + 1
            for v in range(cur + 1, to + 1):
                n = sum(1 for f in _live_data(self.table.manifest(v).files)
                        if (f.get("ls") or 0) > cur)
                if v > cur + 1 and n > self.max_files:
                    break
                best = v
            to = best
        if self.keys:
            from .cdf import keyed_changes  # write-time CDF when available

            return (keyed_changes(self.table, cur, self.keys, to_version=to,
                                  include_old=False, dedup_last_per_key=True),
                    cur, to)
        return self.table.changed_since(cur, version=to), cur, to

    def resync(self):
        """Full-state recovery for an expired cursor: (df, head_version)
        where df is the complete current state — 'I'-tagged in keys mode so
        the same apply loop works. The consumer must TRUNCATE its replica
        before applying (rows deleted upstream during the lost interval are
        absent here, not tombstoned), then advance(head_version)."""
        from pyspark.sql import functions as F

        head = self.table.current_version()
        df = self.table.read(version=head)
        if self.keys:
            df = df.withColumn("__op", F.lit("I"))
        return df, head

    def advance(self, version: int) -> None:
        import json
        import os

        tmp = f"{self.cursor_path}.tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self.cursor_path)  # atomic: cursor never torn
