"""Inference-statistics contract queries: grouped OLS regression and
hash-deterministic bootstrap resampling (operators/stats.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skope_api_spark.contract.registry import query
from skope_api_spark.tables import load


@query(
    "stats_ols_price_by_flag",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 8) AS r2
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def stats_ols_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag simple OLS of extendedprice on quantity — six
    algebraic sums in ONE hash aggregate, closed-form slope/intercept/R²
    in the projection (operators/stats.py:grouped_ols). The oracle is
    DuckDB's native regr_* family; both sides are population-moment
    formulas, 6-dp rounded against accumulation-order noise."""
    from skope_api_spark.operators.stats import grouped_ols

    li = load(spark, sf_dir, "lineitem")
    out = grouped_ols(
        li, y="l_extendedprice", x="l_quantity", by=["l_returnflag"]
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 8).alias("r2"),
    ).orderBy("l_returnflag")


_BOOT_B = 24
_BOOT_MEMBER = (
    "('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':{b}'), 1, 15))"
    "::BIGINT % 1000000 < 500000"
)


def _boot_oracle() -> str:
    reps = "\nUNION ALL\n".join(
        f"""SELECT {b} AS replicate,
       CAST(COUNT(CASE WHEN {_BOOT_MEMBER.format(b=b)} THEN 1 END) AS BIGINT)
         AS n_rows,
       CAST(SUM(CASE WHEN {_BOOT_MEMBER.format(b=b)}
                THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
         / COUNT(CASE WHEN {_BOOT_MEMBER.format(b=b)} THEN 1 END) AS mean
FROM orders"""
        for b in range(_BOOT_B)
    )
    return f"SELECT * FROM (\n{reps}\n) ORDER BY replicate"


@query("stats_bootstrap_means_totalprice", oracle=_boot_oracle())
def stats_bootstrap_means_totalprice(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """24 hash-deterministic half-subsample bootstrap replicates of
    mean(o_totalprice) in ONE scan — membership is the shared md5_long
    chain on (o_orderkey, replicate), so the oracle replays the exact
    sample sets; each replicate mean is an exact decimal(18,2) sum
    followed by one double division (bit-identical cross-engine, no
    rounding needed). The DuckDB side is a 24-way UNION ALL only because
    SQL lacks the loop — DuckDB still folds it into scans of the same
    table; Spark runs a genuinely single-pass 48-aggregate plan
    (operators/stats.py:bootstrap_replicate_means)."""
    from skope_api_spark.operators.stats import bootstrap_replicate_means

    orders = load(spark, sf_dir, "orders")
    out = bootstrap_replicate_means(
        orders,
        value_col="o_totalprice",
        id_col="o_orderkey",
        replicates=_BOOT_B,
        frac=0.5,
        value_decimals=2,
    )
    return out.orderBy("replicate")
