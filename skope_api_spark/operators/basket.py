"""Market-basket analysis: pairwise association rules
(support / confidence / lift).

The co-occurrence workhorse behind "frequently bought together" and — in
the training-data world — document/tag co-occurrence weighting. Plan
shape, all equi-joins co-located on the basket key:

- distinct (basket, item) first: duplicate lines of the same item in one
  basket must not inflate counts;
- pair generation is a SELF-JOIN on the basket key with ``item_a <
  item_b`` — cost Σ c(c−1)/2 over basket sizes c, the operator's
  inherent output; basket sizes are naturally small (the hot-basket
  pathological case is a data bug the hot-key detector flags, not a plan
  problem);
- item counts and pair counts are plain partial-aggregatable groupBys;
  the rule metrics join pair counts to the two item counts (skinny
  tables) and to the 1-row basket total (broadcast);
- support/confidence/lift are single IEEE divisions of exact integer
  counts — bit-identical cross-engine, no rounding needed.

Metrics (standard definitions, both rule directions emitted a->b with
a < b kept once; confidence reported for a->b):
  support(a,b)    = n_ab / N
  confidence(a->b)= n_ab / n_a
  lift(a,b)       = n_ab * N / (n_a * n_b)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(
    df: DataFrame, *, basket_col: str, item_col: str
) -> DataFrame:
    """Distinct (basket, item) pairs — the normalized basket table."""
    return df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()


def association_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Top-k item pairs by lift (ties: item_a, item_b ascending).

    Returns (item_a, item_b, n_pairs, n_a, n_b, support, confidence_a_b,
    lift) with item_a < item_b.
    """
    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    items = basket_items(df, basket_col=basket_col, item_col=item_col)
    total = items.agg(F.countDistinct("basket").alias("__nb"))
    item_counts = items.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .where(F.col("n_pairs") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
    )
    cb = item_counts.select(
        F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
    )
    scored = (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "n_pairs",
            "n_a",
            "n_b",
            (
                F.col("n_pairs").cast("double") / F.col("__nb")
            ).alias("support"),
            (
                F.col("n_pairs").cast("double") / F.col("n_a")
            ).alias("confidence_a_b"),
            (
                (F.col("n_pairs") * F.col("__nb")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "item_a", "item_b").limit(top_k)
