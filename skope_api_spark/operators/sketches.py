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


def kmv_bottomk(
    df: DataFrame,
    value_col: str,
    *,
    k: int = 64,
) -> DataFrame:
    """Bottom-k KMV sketch of a column's DISTINCT values: the k smallest
    md5-derived 60-bit hashes (the engine-shared ``md5_long`` recipe), so
    any engine rebuilds the identical sketch. Returns (hv) rows, ≤ k.

    The corpus collapses to distinct hashes (one partial-aggregatable
    shuffle); the bottom-k cut is a TakeOrdered — no global sort."""
    from skope_api_spark.operators.dedup import md5_long

    if k < 2:
        raise ValueError("k must be >= 2")
    return (
        df.select(md5_long(F.col(value_col).cast("string")).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_overlap(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    k: int = 64,
) -> DataFrame:
    """Set algebra on two KMV sketches (Beyer et al. 2007, public): the
    union sketch is the bottom-k of the merged hash sets; with
    ``rho`` = |{union sketch} ∩ A ∩ B| / k,

    - distinct-union estimate   = (k−1) / (kth_min / 2^60)
    - Jaccard estimate          = rho
    - intersection estimate     = rho · union_estimate

    Everything is md5-deterministic: both engines compute bit-identical
    sketches, so the estimates themselves are oracle-checkable (unlike
    engine-native HLL). All inputs are ≤ k rows — driver-free, broadcast
    joins, cost independent of corpus size once the sketches exist."""
    both = sketch_a.select("hv").unionAll(sketch_b.select("hv")).distinct()
    union_sk = both.orderBy("hv").limit(k)
    in_a = sketch_a.select(F.col("hv").alias("hv_a"))
    in_b = sketch_b.select(F.col("hv").alias("hv_b"))
    marked = (
        union_sk.join(in_a, F.col("hv") == F.col("hv_a"), "left")
        .join(in_b, F.col("hv") == F.col("hv_b"), "left")
        .select(
            "hv",
            (
                F.col("hv_a").isNotNull() & F.col("hv_b").isNotNull()
            ).alias("in_both"),
        )
    )
    agg = marked.agg(
        F.count(F.lit(1)).alias("__n"),
        F.max("hv").alias("__kth"),
        F.count(F.when(F.col("in_both"), 1)).alias("__shared"),
    )
    # try_divide throughout: on EMPTY sketches __n = 0 and a plain
    # division is an ANSI DIVIDE_BY_ZERO job failure; NULL estimates are
    # the correct empty-input answer (DuckDB x/0 is NULL too)
    full = F.col("__n") >= k
    union_est = F.when(
        full,
        F.round(
            F.try_divide(F.lit(k - 1), F.col("__kth") / F.lit(float(1 << 60)))
        ),
    ).otherwise(F.col("__n").cast("double"))
    rho = F.try_divide(F.col("__shared").cast("double"), F.col("__n"))
    return agg.select(
        union_est.cast("long").alias("union_estimate"),
        rho.alias("jaccard_estimate"),
        F.round(rho * union_est).cast("long").alias("intersection_estimate"),
    )
