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


def item_item_cosine(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    k: int = 5,
) -> DataFrame:
    """Item-item collaborative-filtering neighbors: cosine similarity
    over binary basket incidence vectors — sim(a,b) = cooc(a,b) /
    sqrt(n_a · n_b), the classic item-kNN recommender statistic
    (Sarwar et al. 2001, public). Returns the top-k neighbors PER item
    (both directions), deterministic tie-break (cosine desc, neighbor
    asc).

    Same scale shape as ``association_rules``: basket-co-located pair
    self-join (cost = the operator's inherent co-occurrence output),
    skinny item-count joins left to AQE, per-item top-k via one ranked
    window over the pair table (|pairs| rows, already collapsed — never
    the raw corpus). The one float per row is a single division of
    exact integers: bit-identical cross-engine."""
    from pyspark.sql import Window as W

    if min_pair_count < 1:
        raise ValueError("min_pair_count must be >= 1")
    # normalize ONCE: three consumers (both self-join sides + the item
    # counts) would otherwise each re-scan the raw corpus
    items = basket_items(
        df, basket_col=basket_col, item_col=item_col
    ).localCheckpoint(eager=True)
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
    scored = pairs.join(ca, "item_a").join(cb, "item_b").select(
        "item_a",
        "item_b",
        "n_pairs",
        (
            F.col("n_pairs").cast("double")
            / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
        ).alias("cosine"),
    )
    # symmetrize: every pair serves both items' neighbor lists — the
    # union consumes `scored` twice, so materialize the skinny pair table
    # rather than doubling its whole upstream
    scored = scored.localCheckpoint(eager=True)
    both = scored.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("neighbor"),
        "n_pairs",
        "cosine",
    ).unionByName(
        scored.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("neighbor"),
            "n_pairs",
            "cosine",
        )
    )
    w = W.partitionBy("item").orderBy(F.desc("cosine"), "neighbor")
    return (
        both.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
        .select("item", "rk", "neighbor", "n_pairs", "cosine")
    )
