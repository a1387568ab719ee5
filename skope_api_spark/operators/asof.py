"""As-of join — nearest-preceding-event join, a time-series staple Spark
lacks natively.

Implementation is the union-merge trick, which is the scale-correct shape:
tag left/right rows, union, ONE shuffle on the join key, and a running
``last(payload, ignorenulls=True)`` window carries the latest right row
forward to each left row. No range explosion, no per-row subquery, state
is one payload struct per partition — this is how a merge-based as-of
join behaves in kdb/QuestDB/DuckDB, expressed in DataFrame ops.

Tie semantics: a right row at the same timestamp as a left row IS matched
(``right.ts <= left.ts``), reproduced by sorting right rows before left
rows at equal timestamps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_matched",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` key group (LEFT OUTER: unmatched left rows keep NULLs):

    - ``backward`` (default): latest right with ``right_ts <= left_ts``;
    - ``forward``: earliest right with ``right_ts >= left_ts``
      (implemented as the same merge scanned in descending time order).

    Equal timestamps match in both directions. ``right_cols`` are the
    right-side columns to carry, renamed with ``suffix`` (default: all
    non-key, non-ts right columns).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    right_cols = list(right_cols) or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    left_rest = [c for c in left.columns if c not in on]

    payload_t = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        payload_t.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_rest],
    )
    l = left.select(  # noqa: E741
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left_rest,
    )
    # right rows sort FIRST at equal ts (desc flag) so exact-ts rows match;
    # forward direction = the same running carry over a descending time scan
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        W.partitionBy(*on)
        .orderBy(ts_order, F.col("__is_right").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = r.unionByName(l).withColumn(
        "__matched", F.last("__payload", ignorenulls=True).over(w)
    )
    return carried.where(F.col("__is_right") == 0).select(
        *on,
        *left_rest,
        *[F.col("__matched").getField(c).alias(f"{c}{suffix}") for c in right_cols],
    )
