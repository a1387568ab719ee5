"""Relational core: scan → filter → project → join → aggregate → sort → top-k.

The reference engine has no general relational operators (SURVEY.md §2.3
notes the three implicit join shapes J1–J3); Spark provides them natively.
These queries exercise the full relational surface on the TESTDATA star
schema so the engine's coverage is verifiable against a DuckDB oracle.

Scale notes (100 TB design point):
- only the fixed-cardinality dims (region: 5 rows, nation: 25 rows) are
  force-broadcast; customer/supplier/part grow with scale factor, so their
  join strategy is left to AQE + autoBroadcastJoinThreshold (a forced
  broadcast of a scale-proportional table OOMs executors at 100 TB);
- aggregates are expressed declaratively so partial (map-side) aggregation
  happens before the shuffle;
- top-k is ORDER BY + LIMIT, which Spark executes as TakeOrderedAndProject
  (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skope_api_spark.contract.registry import (
    money_ticks,
    query,
    round_nz,
    safe_corr,
)
from skope_api_spark.tables import load


# --- Q1: pricing summary (filter → groupBy → multi-agg → sort) -------------
@query(
    "q1_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
  ROUND(AVG(l_discount), 4)                                        AS avg_disc,
  CAST(COUNT(*) AS BIGINT)                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q3: shipping priority (3-way join → agg → deterministic top-k) --------
@query(
    "q3_shipping_priority",
    oracle="""
SELECT
  l_orderkey,
  CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                 AS BIGINT)) * 2 + 100) // 200 AS DOUBLE) / 100.0 AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT)) DESC, o_orderdate, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # registry money-sum rule (money_ticks): exact BIGINT ten-thousandth
    # accumulation; the 2dp contract value is integer HALF_UP of the
    # exact ticks ((2a+100) DIV 200 cents) — the r16 tie audit found a
    # repr-tie group (151818.235, pre-LIMIT) where the legacy
    # ROUND(SUM(double), 2) diverges cross-engine. Order by the INTEGER
    # sum so the top-k can never flip on double conversion.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                money_ticks(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("__ticks")
        )
        .select(
            "l_orderkey",
            (
                F.expr("(__ticks * 2 + 100) DIV 200").cast("double") / F.lit(100.0)
            ).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
            "__ticks",
        )
        .orderBy(F.desc("__ticks"), "o_orderdate", "l_orderkey")
        .limit(10)
        .drop("__ticks")
    )


# --- Q5: local supplier volume (6-way join through dims) -------------------
@query(
    "q5_local_supplier_volume",
    oracle="""
SELECT
  n_name,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# --- top-k by revenue per brand (join + agg + rank) -------------------------
@query(
    "top_parts_by_revenue",
    oracle="""
SELECT p_brand, p_partkey, revenue, rk FROM (
  SELECT
    p_brand,
    p_partkey,
    CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY p_brand
      ORDER BY SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                        AS BIGINT)) DESC, p_partkey
    ) AS INT) AS rk
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, p_partkey
) WHERE rk <= 3
ORDER BY p_brand, rk
""",
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per brand. Revenue follows the registry
    money-sum rule via integer ten-thousandths (``money_ticks``): the
    r07 sf1 step-up caught the old ROUND(SUM(double), 2) on a half-cent
    tie — one group in 200k landed exactly on a .005 boundary where
    Spark and DuckDB round differently. The exact BIGINT accumulation
    keeps that exactness (same rational value as the r07 DECIMAL(18,4)
    sum, so identical output doubles) at plain long-add speed — the
    decimal128 aggregation was this query's 1.9× r07 regression. The
    rank window orders by the INTEGER sum, so ranking can never flip on
    double conversion."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    per_part = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(
            F.sum(
                money_ticks(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("__ticks")
        )
    )
    w = W.partitionBy("p_brand").orderBy(F.desc("__ticks"), "p_partkey")
    return (
        per_part.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            (F.col("__ticks") / F.lit(10000.0)).alias("revenue"),
            "rk",
        )
        .orderBy("p_brand", "rk")
    )


# --- semi / anti joins ------------------------------------------------------
@query(
    "semi_join_customers_with_high_value_orders",
    oracle="""
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
ORDER BY c_custkey
""",
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "anti_join_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
""",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- outer join with null handling ------------------------------------------
@query(
    "left_join_order_counts",
    oracle="""
SELECT
  c_custkey,
  CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
  ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
ORDER BY c_custkey
""",
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spent"
            ),
        )
        .orderBy("c_custkey")
    )


# --- distinct aggregation ----------------------------------------------------
@query(
    "distinct_agg_suppliers_per_brand",
    oracle="""
SELECT
  p_brand,
  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
""",
)
def distinct_agg_suppliers_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .orderBy("p_brand")
    )


# --- rollup / cube / grouping sets -------------------------------------------
@query(
    "rollup_order_totals",
    oracle="""
SELECT
  o_orderstatus,
  o_orderpriority,
  ROUND(SUM(o_totalprice), 2) AS total,
  CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "cube_lineitem_flags",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter → single agg; every predicate reaches
    the parquet scan (the data-skipping showcase)."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.05)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


@query(
    "q14_promo_revenue_share",
    oracle="""
SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount) END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
""",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio over a join."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev))
            / F.sum(rev),
            4,
        ).alias("promo_share_pct")
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive cross-table predicates —
    the optimizer must keep the join equi-key and evaluate the OR as a
    post-join filter without falling into a cartesian plan."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#7")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#13")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "statistical_aggregates",
    oracle="""
WITH mu AS (
  SELECT l_returnflag, AVG(l_extendedprice) AS mp
  FROM lineitem GROUP BY l_returnflag
), mom AS (
  -- two-pass POPULATION central moments: DuckDB's skewness()/kurtosis()
  -- are the bias-corrected SAMPLE estimators while Spark's are
  -- population, a ~1/n divergence that rounding hides at sf0.01 but
  -- not at sf0.001 (same trap stats_moments_battery documents)
  SELECT l.l_returnflag,
         AVG(POWER(l.l_extendedprice - mu.mp, 2)) AS m2,
         AVG(POWER(l.l_extendedprice - mu.mp, 3)) AS m3,
         AVG(POWER(l.l_extendedprice - mu.mp, 4)) AS m4
  FROM lineitem l JOIN mu USING (l_returnflag)
  GROUP BY l.l_returnflag
), base AS (
  SELECT l_returnflag,
         corr(l_quantity, l_extendedprice) AS c,
         covar_pop(l_quantity, l_extendedprice) AS cv,
         var_pop(l_discount) AS dv
  FROM lineitem GROUP BY l_returnflag
)
SELECT b.l_returnflag,
       ROUND(b.c, 6) AS qty_price_corr,
       ROUND(b.cv, 4) AS qty_price_covar,
       ROUND(m.m3 / POWER(m.m2, 1.5), 5) AS price_skew,
       ROUND(m.m4 / (m.m2 * m.m2) - 3.0, 4) AS price_kurt,
       ROUND(b.dv, 8) AS disc_var
FROM base b JOIN mom m USING (l_returnflag)
ORDER BY l_returnflag
""",
)
def statistical_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-/higher-moment aggregates: corr, population covariance and
    variance, skewness, excess kurtosis. Oracle recomputes skew/kurt
    from two-pass POPULATION central moments — DuckDB's builtins are
    the bias-corrected sample estimators (a ~1/n divergence that
    sf0.001 exposes); corr via safe_corr (NULL, not ANSI error, on a
    zero-variance group)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(safe_corr("l_quantity", "l_extendedprice"), 6).alias(
                "qty_price_corr"
            ),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
                "qty_price_covar"
            ),
            F.round(F.skewness("l_extendedprice"), 5).alias("price_skew"),
            F.round(F.kurtosis("l_extendedprice"), 4).alias("price_kurt"),
            F.round(F.var_pop("l_discount"), 8).alias("disc_var"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "grouping_sets_order_matrix",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       ROUND(SUM(o_totalprice), 2) AS total,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def grouping_sets_order_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube sugar over)
    with grouping_id to disambiguate real NULL keys from subtotal rows."""
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
               ROUND(SUM(o_totalprice), 2) AS total,
               COUNT(*) AS n
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


# --- set operators ------------------------------------------------------------
@query(
    "setop_nation_keys",
    oracle="""
WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS membership FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
UNION ALL
SELECT nationkey, 'customer_only' AS membership FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
ORDER BY membership, nationkey
""",
)
def setop_nation_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cn.intersect(sn).withColumn("membership", F.lit("both"))
    conly = cn.exceptAll(sn).withColumn("membership", F.lit("customer_only"))
    return both.unionByName(conly).orderBy("membership", "nationkey")


# --- scalar function sweep (date / string / math) ------------------------------
@query(
    "scalar_functions_sweep",
    oracle="""
SELECT
  o_orderkey,
  CAST(YEAR(o_orderdate) AS INT)                       AS order_year,
  CAST(MONTH(o_orderdate) AS INT)                      AS order_month,
  CAST(QUARTER(o_orderdate) AS INT)                    AS order_quarter,
  UPPER(o_orderpriority)                               AS priority_upper,
  SUBSTR(o_orderpriority, 1, 1)                        AS priority_code,
  CAST(LENGTH(o_orderstatus) AS INT)                   AS status_len,
  ROUND(SQRT(o_totalprice), 4)                         AS price_sqrt,
  ROUND(LN(o_totalprice + 1), 6)                       AS price_ln,
  CAST(FLOOR(o_totalprice) AS BIGINT) % 97             AS price_mod,
  CASE WHEN o_totalprice > 300000 THEN 'high'
       WHEN o_totalprice > 100000 THEN 'mid'
       ELSE 'low' END                                  AS price_band
FROM orders
WHERE o_orderkey % 10 = 0
ORDER BY o_orderkey
""",
)
def scalar_functions_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.upper("o_orderpriority").alias("priority_upper"),
            F.substring("o_orderpriority", 1, 1).alias("priority_code"),
            F.length("o_orderstatus").alias("status_len"),
            F.round(F.sqrt("o_totalprice"), 4).alias("price_sqrt"),
            F.round(F.log(F.col("o_totalprice") + 1), 6).alias("price_ln"),
            (F.floor("o_totalprice").cast("bigint") % 97).alias("price_mod"),
            F.when(F.col("o_totalprice") > 300000, "high")
            .when(F.col("o_totalprice") > 100000, "mid")
            .otherwise("low")
            .alias("price_band"),
        )
        .orderBy("o_orderkey")
    )


# --- HAVING -------------------------------------------------------------------
@query(
    "having_large_order_customers",
    oracle="""
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
ORDER BY n_orders DESC, o_custkey
""",
)
def having_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ROUND(SUM, 2), not ROUND(AVG, 2): a rounded double average can flip the
    # last cent across engines on accumulation-order boundaries; the rounded
    # sum is stable (inputs are exact 2-decimal prices).
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .where(F.col("n_orders") >= 15)
        .orderBy(F.desc("n_orders"), "o_custkey")
    )


# --- Bloom-pruned join --------------------------------------------------------
@query(
    "join_bloom_pruned_revenue",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_suppkey IN (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def join_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by ship mode for one nation's suppliers, computed through the
    Bloom runtime-filter path: the filtered supplier keys build a 1 KiB
    bloom (1-row broadcast), the lineitem scan drops non-matching rows in
    the projection BEFORE any shuffle, and the exact left-semi join removes
    the bloom's false positives — exactness is independent of bloom size,
    which only tunes wasted shuffle rows. The engine-side equivalent of
    Spark's internal runtime bloom filter (not publicly callable), usable
    on shapes the automatic rule misses. ``min_fact_bytes=0`` forces the
    bloom path here so the driver keeps exercising it at test scale; a
    blind production call gets the costing guard's plain-join fall-through
    below DEFAULT_MIN_FACT_BYTES (joins.py)."""
    from skope_api_spark.operators.joins import bloom_pruned_semi_join

    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .where(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    pruned = bloom_pruned_semi_join(
        li,
        dim,
        "l_suppkey",
        "s_suppkey",
        num_bits=1024,
        num_hashes=5,
        min_fact_bytes=0,
    )
    return (
        pruned.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


# --- UNPIVOT / melt -----------------------------------------------------------
@query(
    "unpivot_priority_price_stats",
    oracle="""
WITH agg AS (
  SELECT o_orderpriority,
         ROUND(MIN(o_totalprice), 2) AS min_price,
         ROUND(MAX(o_totalprice), 2) AS max_price,
         ROUND(SUM(o_totalprice), 2) AS sum_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'min_price' AS metric, min_price AS value FROM agg
UNION ALL
SELECT o_orderpriority, 'max_price', max_price FROM agg
UNION ALL
SELECT o_orderpriority, 'sum_price', sum_price FROM agg
ORDER BY o_orderpriority, metric
""",
)
def unpivot_priority_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape via DataFrame.unpivot (Spark 3.4 melt): per-priority
    price stats unpivoted to (priority, metric, value) rows — the inverse of
    pivot_orders_by_priority. Unpivot is a zero-shuffle projection (each
    input row fans out to n_metrics rows in place)."""
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )
    return agg.unpivot(
        ["o_orderpriority"],
        ["min_price", "max_price", "sum_price"],
        "metric",
        "value",
    ).orderBy("o_orderpriority", "metric")


# --- argmin-per-group join (TPC-H q2 shape) -----------------------------------
@query(
    "q2_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
), best AS (
  SELECT l_partkey, l_suppkey, unit_price FROM (
    SELECT l_partkey, l_suppkey, unit_price,
           ROW_NUMBER() OVER (
             PARTITION BY l_partkey ORDER BY unit_price, l_suppkey
           ) AS rk
    FROM unit
  ) WHERE rk = 1
)
SELECT b.l_partkey AS partkey, b.l_suppkey AS suppkey,
       b.unit_price
FROM best b
WHERE b.l_partkey % 37 = 0
ORDER BY partkey
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2's core shape — for each part, the supplier offering the
    minimum unit price — WITHOUT the window sort-shuffle: one
    ``groupBy(min(struct(unit_price, suppkey)))``. The struct's lexical
    order makes the argmin deterministic on ties (lowest suppkey), and the
    aggregate partially reduces map-side, so only one candidate row per
    (partition, partkey) reaches the shuffle — the window formulation
    shuffles and sorts every scored row. Same result, checked against the
    window-form oracle.

    The unit price is emitted UNROUNDED: a single IEEE division is
    bit-identical across engines, so the 9-significant-digit contract
    compare is exact — while ROUND(x, 4) applied different tie rules to
    quotients landing exactly on a half (caught by the r07 sf1 step-up:
    3946.165/20 = 197.30825 rounded .3083 in Spark, .3082 in DuckDB)."""
    li = load(spark, sf_dir, "lineitem")
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    best = unit.groupBy("l_partkey").agg(
        F.min(F.struct("unit_price", "l_suppkey")).alias("b")
    )
    return (
        best.where(F.col("l_partkey") % 37 == 0)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("b.l_suppkey").alias("suppkey"),
            F.col("b.unit_price").alias("unit_price"),
        )
        .orderBy("partkey")
    )


# --- conditional aggregation battery ------------------------------------------
@query(
    "conditional_agg_battery",
    oracle="""
SELECT l_linestatus,
  CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_high_disc,
  bool_and(l_quantity > 0) AS all_qty_pos,
  bool_or(l_tax = 0) AS any_tax_zero,
  ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2)
    AS returned_price
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def conditional_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregates: count_if, bool_and/bool_or, and
    SUM(CASE WHEN) — the SQL FILTER-clause surface. All partial-aggregate
    friendly (one shuffle of 4 scalars per group)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.count_if(F.col("l_discount") > 0.05).alias("n_high_disc"),
            F.bool_and(F.col("l_quantity") > 0).alias("all_qty_pos"),
            F.bool_or(F.col("l_tax") == 0).alias("any_tax_zero"),
            F.round(
                F.sum(
                    F.when(
                        F.col("l_returnflag") == "R", F.col("l_extendedprice")
                    ).otherwise(0.0)
                ),
                2,
            ).alias("returned_price"),
        )
        .orderBy("l_linestatus")
    )


# --- TPC-H q21 shape: exists + not-exists correlated pair ---------------------
@query(
    "q21_waiting_supplier",
    oracle="""
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY) AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT l1.l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
WHERE l1.is_late
  AND EXISTS (
    SELECT 1 FROM late l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.is_late
  )
GROUP BY l1.l_suppkey
ORDER BY numwait DESC, suppkey
LIMIT 20
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21's shape — suppliers who alone held up multi-supplier
    orders (late := shipped >80 days after order date; the testdata has no
    commit/receipt dates). The oracle states it with the classic
    EXISTS / NOT EXISTS correlated pair; the Spark plan is the
    aggregation form of the same predicate — one groupBy(l_orderkey)
    computing (distinct suppliers, distinct LATE suppliers), joined back
    to the late rows, keeping orders with >1 supplier and exactly 1 late
    one. Two shuffles total, both partial-aggregated map-side — no
    correlated-subquery re-scans of lineitem, and provably equivalent
    (the contract hash-checks it)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    late = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 80)
        ).alias("is_late"),
    )
    per_order = late.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    return (
        late.where("is_late")
        .join(
            per_order.where(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "suppkey")
        .limit(20)
    )


# --- TPC-H q22 shape: scalar subquery + anti join -----------------------------
@query(
    "q22_dormant_rich_customers",
    oracle="""
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS total_acctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= DATE '1998-01-01'
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22's shape — above-average-balance customers with no recent
    orders, by nation. The global average is a 1-row aggregate broadcast
    into the filter (scalar-subquery equivalent); the NOT EXISTS is a
    left-anti join against the distinct recent-order customer keys. Both
    sides partial-aggregate; nothing correlates per-row."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = (
        o.where(F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("c_nationkey")
    )


# --- TPC-H q13 shape: filtered left-outer join + distribution -----------------
@query(
    "q13_customer_order_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority NOT LIKE '%LOW%'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13's shape — the customer order-count distribution
    (reference parity: the last uncovered TPC-H-expressible query
    shape; the synthetic orders table has no o_comment, so the NOT LIKE
    exclusion runs on o_orderpriority with identical plan shape). The
    defining trick is that the exclusion predicate lives in the JOIN
    condition, not a WHERE — customers whose every order is excluded
    must survive with c_count = 0, so a pushed-down filter on the
    orders SIDE is correct but a post-join WHERE would not be. Spark
    plan: filter pushes into the orders scan (it is a single-side
    predicate), left-outer hash join on the key, two cascaded
    partial-aggregating groupBys (custkey, then c_count — the second
    input is one row per customer, tiny). No correlation, no window."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        ~F.col("o_orderpriority").like("%LOW%")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --- TPC-H q17 shape: per-group scalar correlated subquery --------------------
@query(
    "q17_small_quantity_revenue",
    oracle="""
SELECT p.p_brand,
       ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
FROM lineitem l JOIN part p ON p_partkey = l_partkey
WHERE l.l_quantity < (
  SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
GROUP BY p.p_brand
ORDER BY p.p_brand
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17's shape — revenue from below-half-average-quantity line
    items, per brand. The oracle keeps the correlated per-part scalar
    subquery; the Spark plan decorrelates it into one groupBy(l_partkey)
    average joined back to the fact — a single extra shuffle of one
    (partkey, avg) row per part instead of a correlated re-scan per fact
    row. The lineitem→part join is left to AQE (part is broadcastable at
    test SF, shuffle-join at 100 TB)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    half_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("__half_avg_qty")
    )
    return (
        li.join(half_avg, "l_partkey")
        .where(F.col("l_quantity") < F.col("__half_avg_qty"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
        .orderBy("p_brand")
    )


# --- TPC-H q7 shape: two-nation volume by year --------------------------------
@query(
    "q7_nation_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_14')
   OR (n1.n_name = 'NATION_14' AND n2.n_name = 'NATION_3')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7's shape — bilateral trade volume by year. Five-way join:
    the two nation dims are force-broadcast (fixed 25 rows); orders/
    customer/supplier strategies are left to AQE. The disjunctive
    nation-pair predicate lands after both nation joins, prunable into
    each side's semi-filter by Catalyst."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_14")
    ) | (
        (F.col("supp_nation") == "NATION_14")
        & (F.col("cust_nation") == "NATION_3")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- TPC-H q10 shape: returned-item revenue top customers ---------------------
@query(
    "q10_returned_item_customers",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                     AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
       c_acctbal, n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
             AS BIGINT)) DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10's shape — top customers by returned-item revenue in a
    quarter. Date + returnflag filters push into the scans; per the
    registry money-sum rule the revenue is an EXACT BIGINT
    ten-thousandths sum (``money_ticks``; converted to double once at
    output), so the top-20 ordering — taken on the integer sum, then
    custkey — is deterministic across engines with no rounding step;
    orderBy().limit() compiles to TakeOrderedAndProject."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("date"))
            & (F.col("l_returnflag") == "R")
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            # DON'T round to cents: price (2dp) x discount-complement
            # (2dp) is exactly 4 decimal places, so half-cent ties are
            # common and the engines' tie rules differ; the BIGINT
            # ten-thousandths sum is exact and converts to the identical
            # double on both engines
            F.sum(
                money_ticks(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("__ticks")
        )
        .orderBy(F.desc("__ticks"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col("__ticks") / F.lit(10000.0)).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


# --- TPC-H q8 shape: market-share ratio by year -------------------------------
@query(
    "q8_market_share",
    oracle="""
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
         CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 10000)
              AS BIGINT) AS volume,
         n.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = 'PROMO'
)
SELECT o_year,
  (ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                       ELSE 0 END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE), 6) + 0.0) AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8's shape — one nation's share of a part-type's trade volume
    per year: conditional sum over exact BIGINT ten-thousandths
    accumulation (registry money-sum rule, ``money_ticks``), ratio taken
    in double AFTER both exact sums — the common 10000 scale cancels in
    the ratio, so no rescale is needed. Part type filter pushes into the
    part scan; nation is broadcast."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part")
    vol = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            p.where(F.col("p_type") == "PROMO"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            money_ticks(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("volume"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            round_nz(
                F.sum(
                    F.when(
                        F.col("supp_nation") == "NATION_7", F.col("volume")
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --- TPC-H q16 shape: NOT IN (null-aware anti join) + distinct count ----------
@query(
    "q16_supplier_diversity",
    oracle="""
SELECT p_brand, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY p_brand
ORDER BY p_brand
""",
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16's shape — distinct suppliers per brand excluding a flagged
    set, written with SQL NOT IN on the Spark side too (spark.sql), which
    plans as a null-aware anti join: the semantics differ from left_anti
    when the subquery can yield NULL (one NULL empties the result), and
    the contract documents that the keys here are non-null so the two
    coincide. Distinct count partial-aggregates per (brand, suppkey)
    before the final count."""
    for t in ("lineitem", "part", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"__q16_{t}")
    return spark.sql(
        """
        SELECT p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM __q16_lineitem
        JOIN __q16_part ON p_partkey = l_partkey
        WHERE l_suppkey NOT IN (
          SELECT s_suppkey FROM __q16_supplier WHERE s_acctbal < 0
        )
        GROUP BY p_brand
        ORDER BY p_brand
        """
    )


# --- TPC-H q4 shape: EXISTS + date window -------------------------------------
@query(
    "q4_order_priority_check",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1997-01-01'
  AND o.o_orderdate <  DATE '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4's shape — orders in a quarter with at least one late line
    (shipped >60 days after the order date; the testdata has no commit/
    receipt dates), counted by priority. The correlated EXISTS (it
    references o_orderdate, not just the key) compiles to ONE left-semi
    hash join on the equi key with the date comparison as the join's
    residual filter — no re-scan of lineitem per order, and semi-join
    short-circuits on the first matching line. The quarter filter pushes
    into the orders scan before the join."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- TPC-H q9 shape: multi-join profit rollup ---------------------------------
@query(
    "q9_product_type_profit",
    oracle="""
SELECT nation, o_year,
       CAST(SUM(amount) AS DOUBLE) / 10000 AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
         CAST(ROUND(
           (l.l_extendedprice * (1 - l.l_discount)
             - 0.1 * p.p_retailprice * l.l_quantity) * 10000
         ) AS BIGINT) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9's shape — profit by supplier nation and order year over a
    part-name filter. The testdata has no partsupp, so supply cost is
    modeled as 10% of p_retailprice per unit; the profit expression is
    exact at 4 decimal places (2dp price x 2dp rate; 3dp cost x integral
    quantity), so per the registry money-sum rule it accumulates as an
    exact BIGINT ten-thousandths sum (``money_ticks``; profit can be
    negative — ROUND of a near-integer negative double recovers the
    same exact integer on both engines). Five-way join: nation force-broadcast (25
    rows); the p_name LIKE filter prunes part BEFORE its join so only
    matching partkeys reach the fact; everything else left to AQE."""
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    amount = money_ticks(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            (F.sum(amount).cast("double") / F.lit(10000.0)).alias(
                "sum_profit"
            )
        )
        .orderBy("nation", F.desc("o_year"))
    )


# --- TPC-H q11 shape: group HAVING vs global-share scalar ---------------------
@query(
    "q11_important_part_value",
    oracle="""
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT)) AS val
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, CAST(val AS DOUBLE) / 10000 AS part_value
FROM pv
WHERE CAST(val AS DOUBLE) > (
  SELECT CAST(SUM(val) AS DOUBLE) * 0.002 FROM pv
)
ORDER BY val DESC, partkey
""",
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11's shape — parts whose revenue through one nation's
    suppliers exceeds a fraction of that nation's total (group-HAVING
    against a global-share scalar subquery). The per-part aggregation runs
    ONCE and is reused for both the rows and the scalar (same lazy plan;
    Spark evaluates the 1-row global sum as a broadcast cross join, the
    decorrelated form of the scalar subquery). Both sides accumulate
    exact BIGINT ten-thousandths (``money_ticks``) and compare as
    identical doubles, so the threshold cannot flip on accumulation
    order; the 10000 scale cancels in the > comparison (both sides
    scaled), and the final ordering is on the integer value."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    pv = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("n_name") == "NATION_3")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                money_ticks(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("val")
        )
    )
    threshold = pv.agg(
        (F.sum("val").cast("double") * 0.002).alias("__threshold")
    )
    return (
        pv.crossJoin(F.broadcast(threshold))
        .where(F.col("val").cast("double") > F.col("__threshold"))
        .orderBy(F.desc("val"), "l_partkey")
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("val").cast("double") / F.lit(10000.0)).alias(
                "part_value"
            ),
        )
    )


# --- TPC-H q12 shape: CASE aggregation over a join ----------------------------
@query(
    "q12_priority_line_counts",
    oracle="""
SELECT l_returnflag AS flag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= DATE '1997-01-01'
  AND l_shipdate <  DATE '1998-01-01'
GROUP BY flag
ORDER BY flag
""",
)
def q12_priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12's shape — urgent vs non-urgent line counts among slow
    shipments in a year (the testdata has no l_shipmode/receiptdate, so
    the mode column is l_returnflag and 'late' is shipped >30 days after
    ordering). The two CASE sums are a single-pass conditional
    aggregation — one shuffle, partial-aggregated map-side; the year
    window pushes into the lineitem scan, the cross-table date comparison
    runs as the join's residual filter."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate >= F.date_add(o.o_orderdate, 30)),
        )
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("flag")
    )


# --- TPC-H q15 shape: max over an aggregated view -----------------------------
@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                  AS BIGINT)) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01'
    AND l_shipdate <  DATE '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(total_rev AS DOUBLE) / 10000 AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15's shape — the supplier(s) with the maximum quarterly
    revenue, via a reused aggregated view and a max-over-it scalar. The
    revenue view computes once; the 1-row MAX broadcasts back over it
    (decorrelated scalar subquery). The equality filter is on the EXACT
    BIGINT ten-thousandths totals (``money_ticks``) — with double sums,
    accumulation-order noise could make the winner fail its own max
    comparison cross-engine; exact integers make `= MAX` deterministic.
    Ties all surface, ordered by suppkey."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                money_ticks(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("total_rev")
        )
    )
    best = revenue.agg(F.max("total_rev").alias("__max_rev"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("total_rev") == F.col("__max_rev"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_rev").cast("double") / F.lit(10000.0)).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


# --- TPC-H q18 shape: IN over a grouped HAVING --------------------------------
@query(
    "q18_large_volume_customers",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       ROUND(o_totalprice, 2) AS total_price,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 140
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY total_price DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18's shape — customers with very-large-quantity orders: an
    IN over a grouped HAVING subquery on the same fact table. The
    qualifying-orderkey set is one partial-aggregated groupBy producing a
    skinny (orderkey) relation; the IN becomes a left-semi join on it, so
    the fact is scanned twice but shuffled only on the join keys. Top-100
    compiles to TakeOrderedAndProject; o_totalprice is a raw column (not
    a cross-engine sum), so ROUND is tie-safe."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 140)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(big_orders, "o_orderkey", "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(100)
    )


# --- TPC-H q20 shape: nested two-level semi join ------------------------------
@query(
    "q20_part_supplier_shortlist",
    oracle="""
SELECT s_name, s_suppkey
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (
    SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
  )
    AND l_shipdate >= DATE '1997-01-01'
    AND l_shipdate <  DATE '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(l_quantity) > 60
)
ORDER BY s_suppkey
""",
)
def q20_part_supplier_shortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20's shape — suppliers who moved real volume of 'red' parts
    in a year: a two-level nested semi join (supplier <- lineitem <- part)
    with a per-(supplier, part) HAVING between the levels (the testdata
    has no partsupp, so the availability predicate becomes shipped-volume
    > 60). Inner level: the part-name filter prunes part to a skinny key
    set semi-joined into the fact; middle: one partial-aggregated groupBy
    on the composite key; outer: left-semi onto supplier. No level
    materializes more than keys."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    red_parts = p.where(F.col("p_name").like("red%")).select(
        F.col("p_partkey").alias("l_partkey")
    )
    qualified = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .join(red_parts, "l_partkey", "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 60)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(qualified, "s_suppkey", "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )


@query(
    "grouping_sets_order_mix",
    oracle="""
SELECT
  o_orderstatus,
  o_orderpriority,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
    AS gid,
  ROUND(SUM(o_totalprice), 2) AS total,
  CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def grouping_sets_order_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the grouping shape ROLLUP/CUBE can't
    express (disjoint single-column sets + grand total, no pair set).
    grouping_id disambiguates real NULL keys from subtotal rows; Spark
    evaluates this as one Expand + single aggregation, same as its
    rollup/cube plans."""
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__gs_orders")
    return orders.sparkSession.sql("""
        SELECT
          o_orderstatus,
          o_orderpriority,
          CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
               AS BIGINT) AS gid,
          ROUND(SUM(o_totalprice), 2) AS total,
          COUNT(*) AS n
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus NULLS FIRST,
                 o_orderpriority NULLS FIRST
    """)


@query(
    "ts_mom_yoy_revenue_growth",
    oracle="""
WITH monthly AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
)
SELECT CAST(month AS DATE) AS month, ROUND(rev, 2) AS revenue,
       (ROUND(rev / LAG(rev, 1) OVER (ORDER BY month) - 1.0, 6) + 0.0) AS mom_growth,
       (ROUND(rev / LAG(rev, 12) OVER (ORDER BY month) - 1.0, 6) + 0.0) AS yoy_growth
FROM monthly
ORDER BY month
""",
)
def ts_mom_yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth — the everyday BI report: monthly
    revenue (exact decimal sums, so the series is bit-identical
    cross-engine) with month-over-month and year-over-year growth from
    one lag window pass. Single-series ORDER BY window over ~80 monthly
    rows — the aggregation already collapsed the corpus, so the
    single-partition window is over the report, not the data."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    w = W.orderBy("m")
    return monthly.select(
        F.to_date("m").alias("month"),
        F.round("rev", 2).alias("revenue"),
        round_nz(F.col("rev") / F.lag("rev", 1).over(w) - 1.0, 6).alias(
            "mom_growth"
        ),
        round_nz(F.col("rev") / F.lag("rev", 12).over(w) - 1.0, 6).alias(
            "yoy_growth"
        ),
    ).orderBy("month")


@query(
    "topn_parts_per_brand",
    oracle="""
WITH rev AS (
  SELECT p.p_brand, l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS part_rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand, l.l_partkey
), ranked AS (
  SELECT p_brand, l_partkey, part_rev,
         DENSE_RANK() OVER (PARTITION BY p_brand
                            ORDER BY part_rev DESC, l_partkey) AS rk
  FROM rev
)
SELECT p_brand, CAST(rk AS INT) AS rk, l_partkey,
       CAST(part_rev AS DOUBLE) AS part_rev
FROM ranked WHERE rk <= 3
ORDER BY p_brand, rk, l_partkey
""",
)
def topn_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue within every brand — THE top-N-per-group
    shape (window rank + filter; revenue as exact decimal sums with an
    id tie-break so ranks are total). The per-brand window distributes on
    the brand key; no global sort."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "part_rev"
            )
        )
    )
    w = W.partitionBy("p_brand").orderBy(
        F.desc("part_rev"), F.col("l_partkey")
    )
    return (
        rev.withColumn("rk", F.dense_rank().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "p_brand",
            F.col("rk").cast("int").alias("rk"),
            "l_partkey",
            F.col("part_rev").cast("double").alias("part_rev"),
        )
        .orderBy("p_brand", "rk", "l_partkey")
    )


@query(
    "pareto_revenue_concentration",
    oracle="""
WITH rev AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS part_rev
  FROM lineitem GROUP BY l_partkey
), tot AS (SELECT SUM(part_rev) AS t, COUNT(*) AS n_parts FROM rev),
ranked AS (
  SELECT l_partkey, part_rev,
         ROW_NUMBER() OVER (ORDER BY part_rev DESC, l_partkey) AS rk,
         SUM(part_rev) OVER (ORDER BY part_rev DESC, l_partkey
                             ROWS UNBOUNDED PRECEDING) AS cum_rev
  FROM rev
), marked AS (
  SELECT rk, cum_rev, t, n_parts,
         (CAST(cum_rev AS DOUBLE) / CAST(t AS DOUBLE) >= 0.8) AS past_80
  FROM ranked, tot
)
SELECT CAST(MIN(n_parts) AS BIGINT) AS n_parts,
       CAST(MIN(CASE WHEN past_80 THEN rk END) AS BIGINT) AS parts_for_80pct,
       ROUND(MIN(CASE WHEN past_80 THEN rk END)
             / CAST(MIN(n_parts) AS DOUBLE), 6) AS part_share_for_80pct,
       ROUND(CAST(MIN(t) AS DOUBLE), 2) AS total_revenue
FROM marked
""",
)
def pareto_revenue_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pareto (80/20) concentration: how many parts carry 80% of
    revenue. Exact-decimal per-part revenue, one ordered window over the
    |parts| report with a deterministic (revenue, partkey) total order,
    then a single aggregate finds the crossing rank. The 0.8 threshold
    compares exact-decimal cumulative sums cast once to double —
    identical in both engines."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
            "part_rev"
        )
    )
    tot = rev.agg(
        F.sum("part_rev").alias("t"), F.count(F.lit(1)).alias("n_parts")
    )
    w = W.orderBy(F.desc("part_rev"), "l_partkey")
    ranked = rev.select(
        F.row_number().over(w).alias("rk"),
        F.sum("part_rev")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_rev"),
    )
    marked = ranked.crossJoin(F.broadcast(tot)).select(
        "rk",
        "n_parts",
        "t",
        (
            F.col("cum_rev").cast("double") / F.col("t").cast("double")
            >= 0.8
        ).alias("past_80"),
    )
    return marked.agg(
        F.min("n_parts").alias("n_parts"),
        F.min(F.when(F.col("past_80"), F.col("rk"))).alias(
            "parts_for_80pct"
        ),
        F.round(
            F.min(F.when(F.col("past_80"), F.col("rk")))
            / F.min("n_parts").cast("double"),
            6,
        ).alias("part_share_for_80pct"),
        F.round(F.min("t").cast("double"), 2).alias("total_revenue"),
    )


@query(
    "sla_shipping_lead_time_report",
    oracle="""
WITH lt AS (
  SELECT o.o_orderpriority AS priority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS lead_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(COUNT(CASE WHEN lead_days <= 30 THEN 1 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS pct_within_30d,
       ROUND(quantile_cont(lead_days, 0.5), 4) AS p50_days,
       ROUND(quantile_cont(lead_days, 0.9), 4) AS p90_days,
       CAST(MAX(lead_days) AS BIGINT) AS max_days
FROM lt GROUP BY priority
ORDER BY priority
""",
)
def sla_shipping_lead_time_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shipping-SLA report: order-to-ship lead time per priority — the
    operational latency-percentile shape (order/lineitem equi-join left
    to AQE; integer day deltas; per-group exact p50/p90 via the grouped
    distributed quantiles; exact within-30d share). Interpolated
    quantiles of integers land on .5 grids — 4-dp rounding is tie-free.
    """
    from skope_api_spark.operators.stats import grouped_quantiles

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    lt = li.join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    ).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("lead_days"),
    )
    lt = lt.localCheckpoint(eager=True)
    base = lt.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.count(F.when(F.col("lead_days") <= 30, 1))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("pct_within_30d"),
        F.max("lead_days").cast("long").alias("max_days"),
    )
    qs = grouped_quantiles(lt, "lead_days", [0.5, 0.9], by=["priority"])
    wide = qs.groupBy("priority").agg(
        F.round(
            F.min(F.when(F.col("prob") == 0.5, F.col("value"))), 4
        ).alias("p50_days"),
        F.round(
            F.min(F.when(F.col("prob") == 0.9, F.col("value"))), 4
        ).alias("p90_days"),
    )
    return (
        base.join(wide, "priority")
        .select(
            "priority",
            "n_lines",
            "pct_within_30d",
            "p50_days",
            "p90_days",
            "max_days",
        )
        .orderBy("priority")
    )


@query(
    "stats_hhi_supplier_concentration",
    oracle="""
WITH rev AS (
  SELECT n.n_name AS nation, l.l_suppkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS srev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name, l.l_suppkey
), tot AS (
  SELECT nation, SUM(srev) AS trev, COUNT(*) AS n_suppliers FROM rev
  GROUP BY nation
)
SELECT r.nation,
       CAST(MIN(t.n_suppliers) AS BIGINT) AS n_suppliers,
       ROUND(SUM(POWER(CAST(r.srev AS DOUBLE) / CAST(t.trev AS DOUBLE), 2))
             * 10000, 4) AS hhi
FROM rev r JOIN tot t ON r.nation = t.nation
GROUP BY r.nation
ORDER BY r.nation
""",
)
def stats_hhi_supplier_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation (0-10,000 scale; antitrust threshold lore: >2,500 =
    highly concentrated) — the market-structure rollup. Exact-decimal
    revenue, one share division per supplier (identical doubles), the
    squares summed per nation; supplier dims broadcast under AQE."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    rev = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(nat, sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), "l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "srev"
            )
        )
    )
    rev = rev.localCheckpoint(eager=True)
    tot = rev.groupBy("nation").agg(
        F.sum("srev").alias("trev"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share = F.col("srev").cast("double") / F.col("trev").cast("double")
    # tot is one row per nation (bounded 25) — broadcast explicitly so the
    # static plan is the BHJ AQE would pick anyway; no shuffle of rev
    return (
        rev.join(F.broadcast(tot), "nation")
        .groupBy("nation")
        .agg(
            F.min("n_suppliers").alias("n_suppliers"),
            F.round(F.sum(share * share) * 10000, 4).alias("hhi"),
        )
        .orderBy("nation")
    )


@query(
    "rfm_repeat_purchase_latency",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
           LAG(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap_days
  FROM orders
), g AS (SELECT gap_days FROM gaps WHERE gap_days IS NOT NULL)
SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(quantile_cont(gap_days, 0.5), 4) AS p50_days,
       ROUND(quantile_cont(gap_days, 0.9), 4) AS p90_days,
       ROUND(AVG(gap_days), 4) AS mean_days
FROM g
""",
)
def rfm_repeat_purchase_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase latency: day gaps between a customer's
    consecutive orders ((orderdate, orderkey)-ordered for a total
    order), summarized as exact distributed p50/p90 plus the mean —
    the inter-purchase-time input to churn/CLV models. Integer day
    gaps: quantile grids land on .5 steps, mean has denominator
    |gaps| — 4-dp rounding is effectively tie-free and the mean's sum
    is exact integer arithmetic."""
    from pyspark.sql import Window as W

    from skope_api_spark.operators.stats import exact_quantiles

    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = orders.select(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).alias("gap_days")
    ).where(F.col("gap_days").isNotNull())
    gaps = gaps.localCheckpoint(eager=True)
    base = gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.sum("gap_days").cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_days"),
    )
    qs = exact_quantiles(gaps, "gap_days", [0.5, 0.9])
    wide = qs.agg(
        F.round(
            F.min(F.when(F.col("prob") == 0.5, F.col("value"))), 4
        ).alias("p50_days"),
        F.round(
            F.min(F.when(F.col("prob") == 0.9, F.col("value"))), 4
        ).alias("p90_days"),
    )
    return base.crossJoin(F.broadcast(wide)).select(
        "n_gaps", "p50_days", "p90_days", "mean_days"
    )


@query(
    "ts_new_vs_returning_revenue",
    oracle="""
WITH ranked AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) = 1
           AS is_first
  FROM orders
)
SELECT CAST(month AS DATE) AS month,
       CAST(COUNT(CASE WHEN is_first THEN 1 END) AS BIGINT) AS new_orders,
       CAST(COUNT(CASE WHEN NOT is_first THEN 1 END) AS BIGINT)
         AS returning_orders,
       CAST(SUM(CASE WHEN is_first THEN price END) AS DOUBLE)
         AS new_revenue,
       CAST(SUM(CASE WHEN NOT is_first THEN price END) AS DOUBLE)
         AS returning_revenue
FROM ranked
GROUP BY month
ORDER BY month
""",
)
def ts_new_vs_returning_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly revenue split into first-ever orders vs repeat orders —
    the acquisition-vs-retention board slide. First-order detection is
    one (customer, orderdate, orderkey)-ordered window; revenue follows
    the exact-decimal rule, reported unrounded (exact sums cast once).
    """
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = orders.select(
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        (F.row_number().over(w) == 1).alias("is_first"),
    )
    return (
        ranked.groupBy("m")
        .agg(
            F.count(F.when(F.col("is_first"), 1)).alias("new_orders"),
            F.count(F.when(~F.col("is_first"), 1)).alias(
                "returning_orders"
            ),
            F.sum(F.when(F.col("is_first"), F.col("price")))
            .cast("double")
            .alias("new_revenue"),
            F.sum(F.when(~F.col("is_first"), F.col("price")))
            .cast("double")
            .alias("returning_revenue"),
        )
        .select(
            F.to_date("m").alias("month"),
            "new_orders",
            "returning_orders",
            "new_revenue",
            "returning_revenue",
        )
        .orderBy("month")
    )


@query(
    "dq_single_source_risk_parts",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem GROUP BY l_partkey, l_suppkey
), shares AS (
  SELECT l_partkey,
         MAX(CAST(rev AS DOUBLE))
           / SUM(CAST(rev AS DOUBLE)) AS top_share,
         COUNT(*) AS n_suppliers
  FROM ps GROUP BY l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(CASE WHEN n_suppliers = 1 THEN 1 END) AS BIGINT)
         AS sole_sourced,
       CAST(COUNT(CASE WHEN top_share >= 0.5 THEN 1 END) AS BIGINT)
         AS majority_single_supplier,
       ROUND(AVG(top_share), 6) AS avg_top_share
FROM shares
""",
)
def dq_single_source_risk_parts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supply-chain single-source risk: for each part, the revenue share
    of its dominant supplier — counts of sole-sourced and
    majority-single-supplier parts plus the average dominant share. Two
    partial-aggregatable groupBys, exact-decimal revenue; the only
    accumulation-ordered float is the final avg (6-dp rounded)."""
    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
    )
    shares = ps.groupBy("l_partkey").agg(
        (
            F.max(F.col("rev").cast("double"))
            / F.sum(F.col("rev").cast("double"))
        ).alias("top_share"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    return shares.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.count(F.when(F.col("n_suppliers") == 1, 1)).alias(
            "sole_sourced"
        ),
        F.count(F.when(F.col("top_share") >= 0.5, 1)).alias(
            "majority_single_supplier"
        ),
        F.round(F.avg("top_share"), 6).alias("avg_top_share"),
    )


@query(
    "stats_discount_elasticity_by_brand",
    oracle="""
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n,
       (ROUND(regr_slope(l.l_quantity, l.l_discount), 6) + 0.0) AS qty_per_discount,
       ROUND(regr_r2(l.l_quantity, l.l_discount), 8) AS r2
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
ORDER BY p.p_brand
""",
)
def stats_discount_elasticity_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Discount-elasticity screen per brand: OLS slope of quantity on
    discount (does discounting move volume?) — grouped_ols over the
    broadcast part-dim join, six algebraic sums per brand, closed-form
    slope/R² (synthetic data shows ~zero slopes; the CONTRACT is the
    estimator, not the economics)."""
    from skope_api_spark.operators.stats import grouped_ols

    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == part["p_partkey"],
    )
    out = grouped_ols(j, y="l_quantity", x="l_discount", by=["p_brand"])
    return out.select(
        "p_brand",
        "n",
        round_nz("slope", 6).alias("qty_per_discount"),
        F.round("r2", 8).alias("r2"),
    ).orderBy("p_brand")


@query(
    "dq_duplicate_payment_candidates",
    oracle="""
WITH dirty AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_totalprice,
         o_orderdate + INTERVAL 3 DAY
  FROM orders WHERE o_custkey % 97 = 0 AND o_orderkey % 5 = 0
)
SELECT a.o_custkey, a.o_totalprice AS amount,
       a.o_orderkey AS order_a, b.o_orderkey AS order_b,
       CAST(date_diff('day', CAST(a.o_orderdate AS DATE),
                      CAST(b.o_orderdate AS DATE)) AS BIGINT)
         AS days_apart
FROM dirty a JOIN dirty b
  ON a.o_custkey = b.o_custkey
 AND a.o_totalprice = b.o_totalprice
 AND a.o_orderkey < b.o_orderkey
WHERE abs(date_diff('day', CAST(a.o_orderdate AS DATE),
                    CAST(b.o_orderdate AS DATE))) <= 7
ORDER BY a.o_custkey, amount, order_a, order_b
""",
)
def dq_duplicate_payment_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-payment screen (the classic AP fraud/DQ audit): order
    pairs from the SAME customer with the IDENTICAL amount within 7
    days. The join leads with (custkey, amount) equi-keys — a hash
    join whose candidates are only true amount collisions — and the
    day-window is a residual filter, so no inequality-join BNLJ ever
    appears (same discipline as the PIT join). The corpus has no true
    duplicates, so a deterministic seeded set (every 5th order of every
    97th customer re-keyed +3 days) proves the screen FIRES — the
    seed-then-detect pattern of text_redact_pii and the anomaly spike.
    """
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    seeded = base.where(
        (F.col("o_custkey") % 97 == 0) & (F.col("o_orderkey") % 5 == 0)
    ).select(
        (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_totalprice"),
        (F.col("o_orderdate") + F.expr("INTERVAL 3 DAYS")).alias(
            "o_orderdate"
        ),
    )
    orders = base.unionByName(seeded)
    a = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderkey").alias("order_a"),
        F.col("o_orderdate").cast("date").alias("d_a"),
    )
    b = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderkey").alias("order_b"),
        F.col("o_orderdate").cast("date").alias("d_b"),
    )
    j = a.join(b, ["ck", "amount"]).where(
        (F.col("order_a") < F.col("order_b"))
        & (F.abs(F.datediff("d_b", "d_a")) <= 7)
    )
    return j.select(
        F.col("ck").alias("o_custkey"),
        "amount",
        "order_a",
        "order_b",
        F.datediff("d_b", "d_a").cast("long").alias("days_apart"),
    ).orderBy("o_custkey", "amount", "order_a", "order_b")


@query(
    "dq_sequence_gaps_orderkeys",
    oracle="""
WITH kept AS (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey % 500 NOT BETWEEN 100 AND 104
), s AS (
  SELECT o_orderkey AS k,
         LEAD(o_orderkey) OVER (ORDER BY o_orderkey) AS nxt
  FROM kept
), gaps AS (
  SELECT k + 1 AS gap_start, nxt - 1 AS gap_end, nxt - k - 1 AS gap_len
  FROM s WHERE nxt - k > 1
)
SELECT CAST((SELECT COUNT(*) FROM gaps) AS BIGINT) AS n_gaps,
       CAST((SELECT SUM(gap_len) FROM gaps) AS BIGINT) AS missing_keys,
       CAST(g.gap_start AS BIGINT) AS gap_start,
       CAST(g.gap_end AS BIGINT) AS gap_end,
       CAST(g.gap_len AS BIGINT) AS gap_len
FROM gaps g
ORDER BY g.gap_start
LIMIT 20
""",
)
def dq_sequence_gaps_orderkeys(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Islands-and-gaps over the orderkey sequence — the classic
    completeness audit (did ingestion drop a key range?): consecutive-
    key LEAD pairs flag every hole, reported as (start, end, length)
    ranges with the global totals. One ordered window over the KEY
    column only (skinny), exact integers throughout. This generator's
    keys are dense, so deterministic deletions (keys ≡ 100..104 mod
    500) seed known 5-key holes the detector must report — the
    seed-then-detect pattern."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders").where(
        ~(F.col("o_orderkey") % 500).between(100, 104)
    )
    s = orders.select(F.col("o_orderkey").alias("k")).withColumn(
        "nxt", F.lead("k").over(W.orderBy("k"))
    )
    gaps = s.where(F.col("nxt") - F.col("k") > 1).select(
        (F.col("k") + 1).alias("gap_start"),
        (F.col("nxt") - 1).alias("gap_end"),
        (F.col("nxt") - F.col("k") - 1).alias("gap_len"),
    )
    gaps = gaps.localCheckpoint(eager=True)
    tot = gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_len").alias("missing_keys"),
    )
    return (
        gaps.crossJoin(F.broadcast(tot))
        .select(
            "n_gaps", "missing_keys", "gap_start", "gap_end", "gap_len"
        )
        .orderBy("gap_start")
        .limit(20)
    )


@query(
    "share_of_region_revenue",
    oracle="""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS nrev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT region, nation,
       CAST(nrev AS DOUBLE) AS nation_revenue,
       ROUND(CAST(nrev AS DOUBLE)
             / CAST(SUM(nrev) OVER (PARTITION BY region) AS DOUBLE), 6)
         AS share_of_region,
       ROUND(CAST(SUM(nrev) OVER (PARTITION BY region) AS DOUBLE)
             / CAST(SUM(nrev) OVER () AS DOUBLE), 6) AS region_share
FROM rev
ORDER BY region, nation
""",
)
def share_of_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent rollup — nation revenue as a share of its
    region and the region's share of the world, in one pass over the
    25-row nation report (two window levels over exact-decimal sums;
    each share is one double division of exact decimals)."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "nrev"
            )
        )
    )
    wr = W.partitionBy("region")
    wall = W.partitionBy()
    return rev.select(
        "region",
        "nation",
        F.col("nrev").cast("double").alias("nation_revenue"),
        F.round(
            F.col("nrev").cast("double")
            / F.sum("nrev").over(wr).cast("double"),
            6,
        ).alias("share_of_region"),
        F.round(
            F.sum("nrev").over(wr).cast("double")
            / F.sum("nrev").over(wall).cast("double"),
            6,
        ).alias("region_share"),
    ).orderBy("region", "nation")


@query(
    "abc_inventory_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS prev
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT l_partkey, prev,
         SUM(prev) OVER (ORDER BY prev DESC, l_partkey
                         ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(prev) OVER () AS tot
  FROM rev
), classed AS (
  SELECT CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.8
              THEN 'A'
              WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95
              THEN 'B' ELSE 'C' END AS abc_class,
         prev
  FROM ranked
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(prev) AS DOUBLE) AS class_revenue
FROM classed GROUP BY abc_class
ORDER BY abc_class
""",
)
def abc_inventory_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ABC inventory classes (the operations-management 80/95 cumulative
    revenue rule): parts ranked by exact-decimal revenue with a
    deterministic (revenue desc, partkey) total order; class thresholds
    compare exact-decimal cumulative sums cast once to double. Window
    over the |parts| report."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("prev")
    )
    w = W.orderBy(F.desc("prev"), "l_partkey").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy()
    share = F.sum("prev").over(w).cast("double") / F.sum("prev").over(
        wall
    ).cast("double")
    classed = rev.select(
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "prev",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("prev").cast("double").alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@query(
    "top_movers_monthly_priority",
    oracle="""
WITH m AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
         o_orderpriority AS priority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1, 2
), d AS (
  SELECT month, priority, rev,
         rev - LAG(rev) OVER (PARTITION BY priority ORDER BY month)
           AS delta
  FROM m
), ranked AS (
  SELECT CAST(month AS DATE) AS month, priority,
         ROUND(rev, 2) AS revenue, ROUND(delta, 2) AS mom_delta,
         ROW_NUMBER() OVER (ORDER BY ABS(delta) DESC, month, priority)
           AS rk
  FROM d WHERE delta IS NOT NULL
)
SELECT CAST(rk AS INT) AS rk, month, priority, revenue, mom_delta
FROM ranked WHERE rk <= 15
ORDER BY rk
""",
)
def top_movers_monthly_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top movers — the "what changed most" report: the 15 largest
    absolute month-over-month revenue swings across priorities. Exact-
    decimal monthly series per priority, one lag window, TakeOrdered on
    (|delta| desc, month, priority) — a deterministic total order over
    exact-decimal-derived doubles."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    w = W.partitionBy("priority").orderBy("m")
    d = m.withColumn(
        "delta", F.col("rev") - F.lag("rev").over(w)
    ).where(F.col("delta").isNotNull())
    wr = W.orderBy(F.abs("delta").desc(), "m", "priority")
    return (
        d.withColumn("rk", F.row_number().over(wr).cast("int"))
        .where(F.col("rk") <= 15)
        .select(
            "rk",
            F.to_date("m").alias("month"),
            "priority",
            F.round("rev", 2).alias("revenue"),
            F.round("delta", 2).alias("mom_delta"),
        )
        .orderBy("rk")
    )


@query(
    "mix_shift_price_bands_yearly",
    oracle="""
WITH b AS MATERIALIZED (
  SELECT ROUND(quantile_cont(l_extendedprice, 1.0/3), 2) AS q1,
         ROUND(quantile_cont(l_extendedprice, 2.0/3), 2) AS q2
  FROM lineitem
), banded AS (
  SELECT EXTRACT(year FROM l.l_shipdate) AS yr,
         CASE WHEN l.l_extendedprice <= b.q1 THEN 'low'
              WHEN l.l_extendedprice <= b.q2 THEN 'mid'
              ELSE 'high' END AS band,
         CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l CROSS JOIN b
)
SELECT CAST(yr AS INT) AS yr, band,
       CAST(SUM(qty) AS BIGINT) AS quantity,
       ROUND(SUM(qty) / CAST(SUM(SUM(qty)) OVER (PARTITION BY yr)
                             AS DOUBLE), 6) AS share_of_year
FROM banded GROUP BY yr, band
ORDER BY yr, band
""",
)
def mix_shift_price_bands_yearly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mix-shift analysis: yearly quantity share across FIXED global
    price terciles (bands from exact distributed quantiles, 2-dp-rounded
    and broadcast) — the "is demand moving down-market" report. Fixed
    bands are the analytically correct choice (per-year bands would hide
    the shift); shares are single divisions of exact integer sums over
    the report-sized (year, band) grid."""
    from skope_api_spark.operators.stats import exact_quantiles

    li = load(spark, sf_dir, "lineitem")
    qs = exact_quantiles(li, "l_extendedprice", [1.0 / 3, 2.0 / 3])
    b = qs.agg(
        F.round(F.min("value"), 2).alias("__q1"),
        F.round(F.max("value"), 2).alias("__q2"),
    )
    banded = li.crossJoin(F.broadcast(b)).select(
        F.year("l_shipdate").alias("yr"),
        F.when(F.col("l_extendedprice") <= F.col("__q1"), "low")
        .when(F.col("l_extendedprice") <= F.col("__q2"), "mid")
        .otherwise("high")
        .alias("band"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    from pyspark.sql import Window as W

    g = banded.groupBy("yr", "band").agg(F.sum("qty").alias("quantity"))
    wy = W.partitionBy("yr")
    return g.select(
        "yr",
        "band",
        "quantity",
        F.round(
            F.col("quantity") / F.sum("quantity").over(wy).cast("double"),
            6,
        ).alias("share_of_year"),
    ).orderBy("yr", "band")


@query(
    "customer_revenue_concentration",
    oracle="""
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS crev
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT crev,
         ROW_NUMBER() OVER (ORDER BY crev DESC, o_custkey) AS rk,
         SUM(crev) OVER () AS tot,
         COUNT(*) OVER () AS nc
  FROM rev
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(CAST(MAX(CASE WHEN rk = 1 THEN crev END) AS DOUBLE)
             / CAST(MIN(tot) AS DOUBLE), 6) AS top1_share,
       ROUND(CAST(SUM(CASE WHEN rk <= 10 THEN crev END) AS DOUBLE)
             / CAST(MIN(tot) AS DOUBLE), 6) AS top10_share,
       ROUND(CAST(SUM(CASE WHEN rk <= CEIL(nc * 0.01)
                      THEN crev END) AS DOUBLE)
             / CAST(MIN(tot) AS DOUBLE), 6) AS top1pct_share
FROM ranked
""",
)
def customer_revenue_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer revenue concentration — the key-account risk report:
    share of total revenue held by the #1 customer, the top 10, and the
    top 1% (ceiling count). Exact-decimal revenue, deterministic
    (revenue desc, custkey) ranking over the |customers| report, single
    divisions at the edge."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("crev")
    )
    w = W.orderBy(F.desc("crev"), "o_custkey")
    wall = W.partitionBy()
    ranked = rev.select(
        "crev",
        F.row_number().over(w).alias("rk"),
        F.sum("crev").over(wall).alias("tot"),
        F.count(F.lit(1)).over(wall).alias("nc"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(
            F.max(F.when(F.col("rk") == 1, F.col("crev"))).cast("double")
            / F.min("tot").cast("double"),
            6,
        ).alias("top1_share"),
        F.round(
            F.sum(F.when(F.col("rk") <= 10, F.col("crev"))).cast("double")
            / F.min("tot").cast("double"),
            6,
        ).alias("top10_share"),
        F.round(
            F.sum(
                F.when(
                    F.col("rk") <= F.ceil(F.col("nc") * 0.01),
                    F.col("crev"),
                )
            ).cast("double")
            / F.min("tot").cast("double"),
            6,
        ).alias("top1pct_share"),
    )


@query(
    "cohort_ltv_curve_quarterly",
    oracle="""
WITH firsts AS (
  SELECT o_custkey,
         MIN(date_trunc('quarter', CAST(o_orderdate AS DATE))) AS cohort
  FROM orders GROUP BY o_custkey
), facts AS (
  SELECT f.cohort,
         CAST(date_diff('quarter', f.cohort,
              date_trunc('quarter', CAST(o.o_orderdate AS DATE)))
           AS BIGINT) AS age_q,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
), per AS (
  SELECT cohort, age_q, SUM(price) AS rev
  FROM facts GROUP BY cohort, age_q
), sized AS (
  SELECT cohort, COUNT(*) AS cohort_customers FROM firsts GROUP BY cohort
)
SELECT CAST(p.cohort AS DATE) AS cohort, p.age_q,
       CAST(s.cohort_customers AS BIGINT) AS cohort_customers,
       CAST((CAST(SUM(p.rev) OVER (PARTITION BY p.cohort ORDER BY p.age_q
                   ROWS UNBOUNDED PRECEDING) * 10000 AS BIGINT) * 2
             + s.cohort_customers) // (2 * s.cohort_customers)
            AS DOUBLE) / 10000.0 AS cum_ltv_per_customer
FROM per p JOIN sized s ON p.cohort = s.cohort
ORDER BY cohort, age_q
""",
)
def cohort_ltv_curve_quarterly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohort LTV curves: cumulative revenue per customer by acquisition
    quarter and quarter-age — the retention economics chart behind
    payback-period decisions. First-order cohorts (one aggregation),
    exact-decimal revenue per (cohort, age) cell, a cumulative window
    over the report grid, one division per row. The per-customer LTV is
    rounded to 4dp by INTEGER cross-multiplication — round(a/n) HALF_UP
    == (2a+n) DIV (2n) on exact ×1e4 cents units — because double
    ROUND(cum/n, 4) CAN tie at 4dp for any cohort size 2^k·5^j (e.g.
    the 8-customer 1997-07 cohort: denominator 800 makes .xxxx5 exactly
    representable, and Spark HALF_UP vs DuckDB round-half-to-even then
    disagree — the r15 driver red). Integer arithmetic is bit-identical
    across engines; the final /10000.0 is the same double op on both."""
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.date_trunc("quarter", "o_orderdate")).alias("cohort")
    )
    facts = orders.join(firsts, "o_custkey").select(
        "cohort",
        F.months_between(
            F.date_trunc("quarter", "o_orderdate"), F.col("cohort")
        )
        .cast("long")
        .alias("__mq"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    ).select(
        "cohort", (F.col("__mq") / 3).cast("long").alias("age_q"), "price"
    )
    per = facts.groupBy("cohort", "age_q").agg(
        F.sum("price").alias("rev")
    )
    sized = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    return (
        per.join(sized, "cohort")
        .select(
            F.to_date("cohort").alias("cohort"),
            "age_q",
            "cohort_customers",
            F.sum("rev")
            .over(
                W.partitionBy("cohort")
                .orderBy("age_q")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            .alias("__cum_rev"),
        )
        .select(
            "cohort",
            "age_q",
            "cohort_customers",
            (
                F.expr(
                    "(CAST(__cum_rev * 10000 AS BIGINT) * 2"
                    " + cohort_customers) DIV (2 * cohort_customers)"
                )
                / F.lit(10000.0)
            ).alias("cum_ltv_per_customer"),
        )
        .orderBy("cohort", "age_q")
    )
