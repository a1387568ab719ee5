"""Lake maintenance: partition statistics and small-file compaction.

At 100 TB the silent killer is file-count creep — streaming ingestion and
per-request writes leave thousands of KB-sized files per partition, and
scan planning cost grows with file count (driver-side listing + one task
per split floor). ``partition_report`` measures it; ``compact`` rewrites a
partition directory to a target file count.

Compaction is write-to-sibling-then-swap: Spark cannot safely overwrite a
path it is reading, so the rewrite lands in ``<path>.__compact_tmp`` and
directories are swapped only after the write commits. Crash before the
swap leaves the original untouched.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def partition_report(spark: SparkSession, path: str) -> DataFrame:
    """Files/rows/bytes per parquet file under ``path`` (one row per file).

    Uses ``input_file_name`` so the report comes from one scan — no
    driver-side directory walking over object-store listings.
    """
    df = spark.read.parquet(path)
    per_file = df.groupBy(F.input_file_name().alias("file")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    sizes = [
        (os.path.join(root, f), os.path.getsize(os.path.join(root, f)))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    ]
    sizes_df = spark.createDataFrame(sizes, "path string, n_bytes long")
    # input_file_name() yields a file:// URI; join on the (unique) basename
    basename = lambda c: F.element_at(F.split(c, "/"), -1)  # noqa: E731
    return per_file.join(
        sizes_df, basename(per_file["file"]) == basename(sizes_df["path"]), "left"
    ).select("path", "n_rows", "n_bytes")


def compact(
    spark: SparkSession,
    path: str,
    *,
    target_files: int = 1,
    sort_by: tuple[str, ...] = (),
) -> int:
    """Rewrite ``path`` to ``target_files`` parquet files (optionally
    re-sorted so min/max stats stay tight). Returns the file count after.

    Safe swap: writes to a sibling temp dir, verifies row count, then
    replaces the original directory. The two renames are NOT atomic
    together: a crash between them leaves no live data at ``path`` but the
    full dataset intact at ``<path>.__compact_old`` — recovery (automatic,
    below) renames it back. Stale ``.__compact_tmp`` dirs from a crashed
    write are discarded at entry (the original was still live then).
    """
    tmp_stale = path.rstrip("/") + ".__compact_tmp"
    old_stale = path.rstrip("/") + ".__compact_old"
    if os.path.exists(old_stale) and not os.path.exists(path):
        # crashed mid-swap last run: the old dir is the only complete copy
        os.rename(old_stale, path)
    shutil.rmtree(tmp_stale, ignore_errors=True)
    shutil.rmtree(old_stale, ignore_errors=True)

    df = spark.read.parquet(path)
    n_before = df.count()
    out = df.repartition(target_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    tmp = path.rstrip("/") + ".__compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch: {n_before} -> {n_after}; aborted"
        )
    old = path.rstrip("/") + ".__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
