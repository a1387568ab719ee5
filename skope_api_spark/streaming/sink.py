"""Exactly-once streaming file sink via batchId-keyed idempotent commits.

Structured Streaming's checkpoint gives every micro-batch a stable
``batchId`` that is REPLAYED with identical contents after a crash between
the sink write and the checkpoint commit (the offsets log is written before
the batch runs; the commit marker after). A sink is therefore exactly-once
iff re-writing the same (batchId, data) is a no-op — the idempotent-
``foreachBatch`` recipe from the Structured Streaming programming guide.

Here each micro-batch overwrites its OWN partition directory
``{path}/batch_id={batchId}``: a replayed batch rewrites the same directory
instead of appending a second copy, so duplicates cannot survive a replay.
Readers see a normal partitioned parquet table (``batch_id`` becomes a
partition column via directory discovery).

Contract precisely stated: at-least-once attempts + idempotent per-batch
overwrite = exactly-once OBSERVED results after the stream recovers. A
crash mid-overwrite can transiently leave a partial batch directory; the
recovery replay rewrites it before the batch is ever marked committed, so
a reader coordinating on committed batches (or simply reading after
recovery) never observes duplicates. Kill-and-replay is proven in
``tests/test_streaming.py`` by deleting the checkpoint's last commit
marker — forcing Spark to re-run the final batch — and hash-comparing the
sink contents before and after.

Scale notes: one directory per micro-batch keeps commits O(1) metadata
renames (no global file listing); compact with
``sources/maintenance.compact_small_files`` if micro-batches are small.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def idempotent_batch_writer(path: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function writing each micro-batch to its own
    ``batch_id=N`` directory with overwrite semantics — replay-safe."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(path, f"batch_id={batch_id}")
        )

    return write_batch


def write_stream_exactly_once(
    stream_df: DataFrame,
    *,
    path: str,
    checkpoint: str,
    query_name: str = "exactly_once_sink",
) -> None:
    """Drain everything currently available into the idempotent parquet
    sink (availableNow trigger) and stop. Restarting after ANY failure —
    including a kill between the parquet write and the checkpoint commit —
    converges to exactly one copy of every input row."""
    q = (
        stream_df.writeStream.foreachBatch(idempotent_batch_writer(path))
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """The sink as a table; ``batch_id`` surfaces as a partition column."""
    return spark.read.parquet(path)
