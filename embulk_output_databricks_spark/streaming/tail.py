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
