"""Bucketed-table layout: pre-shuffled storage for co-located joins.

The biggest repeated cost in a 100 TB warehouse is re-shuffling the same
fact table on the same key for every join. Bucketing pays that shuffle
ONCE at write time: ``bucketBy(n, key)`` hash-partitions rows into a fixed
number of buckets per file-write task and records the layout in the
catalog; a join of two tables bucketed on the join key with compatible
bucket counts then plans with NO Exchange on either side — Spark trusts
the stored hash partitioning (``spark.sql.sources.bucketing.enabled``,
on by default). ``sortBy`` within buckets additionally removes the
per-partition Sort before a SortMergeJoin.

Rules that make it work (asserted in ``tests/test_bucketing.py``):
- join keys must equal (or be a superset of) the bucket columns;
- bucket counts must match, or one must divide the other
  (``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- bucketed writes require ``saveAsTable`` (the catalog carries the
  layout; a bare parquet path write silently loses it).

Pick the bucket count once per table: ~target-file-size buckets per
write-task at the largest expected SF (buckets too few → giant files and
skew; too many → small-file explosion multiplied by write parallelism).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog-managed bucketed parquet table.

    The one-time shuffle that every future equi-join on ``bucket_cols``
    no longer pays.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key.

    Plans shuffle-free when both tables are bucketed on ``on`` with
    compatible counts — verify with ``assert_no_shuffle_join``.
    """
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def _walk_plan(node):
    """Depth-first walk over a SparkPlan, descending through the AQE
    wrappers (AdaptiveSparkPlan / QueryStage) that hide their subtrees
    from ``children()``."""
    yield node
    cname = node.getClass().getName()
    if "AdaptiveSparkPlanExec" in cname:
        yield from _walk_plan(node.executedPlan())
        return
    if "QueryStageExec" in cname:
        yield from _walk_plan(node.plan())
        return
    children = node.children()
    for i in range(children.size()):
        yield from _walk_plan(children.apply(i))


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if any join in the executed plan is fed by a hash-partition
    shuffle — the regression guard for bucket-layout drift (e.g. a write
    path that dropped ``bucketBy``, or mismatched bucket counts).

    Walks the actual plan TREE and inspects only each join node's
    descendants, so operators elsewhere in the plan — a downstream
    aggregation above the join, or a sibling branch of a union that
    legitimately exchanges on a non-bucket key — cannot false-alarm
    (string-scoped versions of this guard misattributed those)."""
    root = df._jdf.queryExecution().executedPlan()
    joins = [n for n in _walk_plan(root) if "Join" in n.nodeName()]
    for j in joins:
        for d in _walk_plan(j):
            if d is j:
                continue
            if "Exchange" in d.nodeName() and "hashpartitioning" in d.simpleString(
                100
            ):
                raise AssertionError(
                    "join re-shuffles despite bucketed layout:\n"
                    + root.toString()
                )
