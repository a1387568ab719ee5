"""Frequency sketches as DataFrames (no custom UDAFs).

Count-Min Sketch (Cormode & Muthukrishnan 2005) realized as a plain
aggregation: the sketch IS a (depth × width) counter table built by one
group-by, and a point estimate is a join + min over the depth rows. Two
properties make this the Spark-native shape:

- building is a single map-side-combinable aggregation over (row, col)
  — the sketch table is depth·width rows regardless of corpus size, so
  at 100 TB it is a broadcastable summary (like the IVF codebook);
- estimates never underestimate (every hash row only adds), and the
  overestimate is bounded by ~2N/width per row, so ``min`` across
  independent rows gives the usual (ε, δ) guarantee.

Hashes are the shared md5 recipe (``operators.dedup.md5_long``), so the
DuckDB oracle replays the identical sketch bit-for-bit — deterministic
contract, not a tolerance check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skope_api_spark.operators.dedup import md5_long


def _cms_col(tok_col, row: int, width: int):
    """Column expression: hash row ``row``'s bucket for a token."""
    return md5_long(F.concat(F.lit(f"cms{row}:"), tok_col)) % width


def cms_build(
    df: DataFrame,
    token_col: str = "tok",
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the sketch table: (row, col, n) — depth·width rows max.

    One in-projection array explode (``depth`` rows per token) feeding
    one map-side-combinable aggregation: the shuffle carries at most
    depth·width (row, col) groups regardless of corpus size.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_col(F.col(token_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.row", "cell.col")
    return cells.groupBy("row", "col").agg(F.count(F.lit(1)).alias("n"))


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    token_col: str = "tok",
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate each query token: min over its depth cells.

    The sketch side is bounded (depth·width rows) → broadcast; the query
    side fans out to ``depth`` rows and min-aggregates back. Returns
    (tok, cms_count).
    """
    probes = queries.select(
        F.col(token_col).alias("tok"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_col(F.col(token_col), r, width).alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("tok", "cell.row", "cell.col")
    return (
        probes.join(F.broadcast(cms), ["row", "col"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce("n", F.lit(0))).alias("cms_count"))
    )
