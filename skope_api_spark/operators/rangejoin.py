"""Interval-overlap (range) join via time bucketing.

Spark has no native range join: ``a.start <= b.end AND b.start <= a.end``
alone plans as BroadcastNestedLoopJoin / cartesian — O(|A|·|B|) comparisons,
unrunnable at scale. The standard distributed shape (Flink/Databricks
range-join optimization) equi-joins on coarse time buckets so only pairs
sharing a bucket are compared:

- each interval explodes to the bucket indexes it covers
  (``floor(unix_seconds/width)`` — integer math, no calendar alignment);
- the equi-join on bucket index is an ordinary shuffle/broadcast hash join
  Catalyst can plan and AQE can size;
- the exact overlap predicate filters within buckets;
- each overlapping pair is emitted ONCE without a distinct: only the
  first bucket both intervals share — ``greatest(floor(a.start),
  floor(b.start))`` — may emit (that bucket is shared iff the intervals
  overlap), so no post-join dedup shuffle.

Cost model: an interval of length L explodes to ~L/width + 1 rows. Pick
``bucket`` near the typical interval length — too small multiplies the
fan-out, too large multiplies the per-bucket comparison count. Long-tail
intervals (≫ width) are the skew/memory hazard: a single row spanning B
buckets asks ``sequence()`` to materialize a B-element array in one task
(a year-long interval at 1 s buckets is a 3·10⁷-long array) before the
shuffle spreads the fan-out. ``max_buckets_per_interval`` bounds that:
long intervals are first split into sub-ranges of at most that many
buckets (one cheap explode over ⌈B/cap⌉ indexes), then each sub-range
explodes its own ≤ cap buckets — same exploded rows, but no array ever
exceeds max(⌈B/cap⌉, cap) elements and the generated rows pipeline
through codegen instead of materializing per source row. Every split row
carries the ORIGINAL start/end, so the overlap predicate and the
first-shared-bucket emission rule are untouched — each bucket of an
interval is covered by exactly one sub-range, so pairs still emit exactly
once with no dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from skope_api_spark.operators.windows import parse_gap_ms


def _bucket_idx(ts_col: Column, width_ms: int) -> Column:
    return F.floor(F.unix_millis(ts_col) / F.lit(width_ms)).cast("long")


def _exploded_buckets(
    df: DataFrame,
    start: str,
    end: str,
    width_ms: int,
    cap: int | None,
    out: str,
) -> DataFrame:
    """``df`` with one row per covered bucket index in ``out``. With a
    ``cap``, a two-level explode (sub-range index, then buckets within the
    sub-range) bounds every generated ``sequence()`` array to ``cap``
    elements regardless of interval length."""
    b0 = _bucket_idx(F.col(start), width_ms)
    b1 = _bucket_idx(F.col(end), width_ms)
    if cap is None:
        return df.withColumn(out, F.explode(F.sequence(b0, b1)))
    cap = int(cap)
    if cap < 1:
        raise ValueError("max_buckets_per_interval must be >= 1")
    sub = df.withColumn(
        "__sub",
        F.explode(F.sequence(F.lit(0).cast("long"), F.floor((b1 - b0) / cap))),
    )
    s0 = b0 + F.col("__sub") * cap
    s1 = F.least(s0 + (cap - 1), b1)
    return sub.withColumn(out, F.explode(F.sequence(s0, s1))).drop("__sub")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: str = "1 hour",
    keys: list[tuple[str, str]] | None = None,
    extra_condition: Column | None = None,
    max_buckets_per_interval: int | None = 4096,
) -> DataFrame:
    """All (left, right) pairs whose CLOSED intervals overlap:
    ``l.start <= r.end AND r.start <= l.end``.

    Column names must be disjoint between the two sides (alias before
    calling). ``keys`` lists (left_col, right_col) equality pairs that are
    part of the match (e.g. same user); they join as HASH KEYS alongside
    the bucket index, shrinking candidates from everything-in-the-bucket
    to per-(key, bucket). (Catalyst extracts plain ``==`` conjuncts from
    ``extra_condition`` into hash keys too — verified on the executed
    plan — so ``keys`` is the declarative spelling of the same plan, and
    ``extra_condition`` remains for predicates with no equi form.) Emits
    each pair exactly once via the first-shared-bucket rule — no
    post-join distinct. ``max_buckets_per_interval`` (default 4096) bounds
    the per-row explode array for long-tail intervals — see the module
    docstring; pass None to disable the split level.
    """
    width_ms = parse_gap_ms(bucket)
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(f"ambiguous columns on both sides: {sorted(overlap)}")

    l_bucketed = _exploded_buckets(
        left, left_start, left_end, width_ms, max_buckets_per_interval, "__lb"
    )
    r_bucketed = _exploded_buckets(
        right, right_start, right_end, width_ms, max_buckets_per_interval, "__rb"
    )
    first_shared = F.greatest(
        _bucket_idx(F.col(left_start), width_ms),
        _bucket_idx(F.col(right_start), width_ms),
    )
    cond = (
        (F.col("__lb") == F.col("__rb"))
        & (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (F.col("__lb") == first_shared)
    )
    for lk, rk in keys or ():
        cond = cond & (F.col(lk) == F.col(rk))
    if extra_condition is not None:
        cond = cond & extra_condition
    return l_bucketed.join(r_bucketed, cond).drop("__lb", "__rb")


def point_in_range_join(
    points: DataFrame,
    ranges: DataFrame,
    *,
    point_col: str,
    range_start: str,
    range_end: str,
    bucket_width: int,
    max_buckets_per_range: int | None = None,
) -> DataFrame:
    """Point-in-interval equi-join over LONG domains — the CIDR/IP
    enrichment, ID-block lookup, and genomic-interval shape.

    Each point lands in exactly ONE bucket (no dedup needed, unlike the
    interval-overlap join); each range explodes to its covered buckets
    (two-level explode under ``max_buckets_per_range`` so a /8 CIDR
    block cannot produce an unbounded array next to /24s). The join is a
    plain bucket equi-join (hash, never BNLJ) with the exact
    ``start <= p <= end`` residual. CLOSED ranges.

    Returns all point columns + all range columns for matching pairs
    (inner join; anti-join the result against points for the unmatched
    side). Column names must be disjoint.
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    overlap = set(points.columns) & set(ranges.columns)
    if overlap:
        raise ValueError(f"overlapping column names: {sorted(overlap)}")
    p = F.col(point_col).cast("long")
    pb = points.withColumn("__pb", F.floor(p / bucket_width).cast("long"))
    b0 = F.floor(F.col(range_start).cast("long") / bucket_width).cast("long")
    b1 = F.floor(F.col(range_end).cast("long") / bucket_width).cast("long")
    if max_buckets_per_range is None:
        rb = ranges.withColumn("__rb", F.explode(F.sequence(b0, b1)))
    else:
        cap = int(max_buckets_per_range)
        if cap < 1:
            raise ValueError("max_buckets_per_range must be >= 1")
        sub = ranges.withColumn(
            "__sub",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.floor((b1 - b0) / cap))
            ),
        )
        s0 = b0 + F.col("__sub") * cap
        s1 = F.least(s0 + (cap - 1), b1)
        rb = sub.withColumn("__rb", F.explode(F.sequence(s0, s1))).drop(
            "__sub"
        )
    joined = pb.join(rb, pb["__pb"] == rb["__rb"]).where(
        (F.col(range_start) <= p) & (p <= F.col(range_end))
    )
    return joined.drop("__pb", "__rb")
