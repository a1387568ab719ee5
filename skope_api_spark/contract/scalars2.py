"""Second scalar/aggregate capability sweep: exact quantiles, range frames,
correlated subqueries, string & date function batteries.

Every function here was chosen for identical cross-engine semantics (or is
explicitly reconciled in the oracle, e.g. day-of-week numbering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from skope_api_spark.contract.registry import query
from skope_api_spark.tables import load


@query(
    "quantile_stats_orders",
    oracle="""
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       ROUND(quantile_cont(o_totalprice, 0.90), 4) AS p90
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def quantile_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous-interpolation percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``; never percentile_approx in a checked query)."""
    orders = load(spark, sf_dir, "orders")
    pct = lambda p: F.round(  # noqa: E731
        F.expr(f"percentile(o_totalprice, {p})"), 4
    )
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            pct(0.25).alias("p25"),
            pct(0.50).alias("p50"),
            pct(0.75).alias("p75"),
            pct(0.90).alias("p90"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "range_frame_rolling_hour",
    oracle="""
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
       ROUND(SUM(value) OVER w, 4) AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY EPOCH_MS(ts)
             RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
)
def range_frame_rolling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): all events within the
    trailing hour — the time-windowed rolling agg row frames can't express
    when event spacing is irregular."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"))
        .rangeBetween(-3_600_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
            F.round(F.sum("value").over(w), 4).alias("sum_last_hour"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "correlated_subquery_above_avg",
    oracle="""
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
FROM orders o
WHERE o_totalprice > 2 * (
  SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
ORDER BY o_orderkey
""",
)
def correlated_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders > 2× their customer's average) —
    Catalyst decorrelates this into an aggregate + join automatically."""
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_corr")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS price
        FROM __orders_corr o
        WHERE o_totalprice > 2 * (
          SELECT AVG(o2.o_totalprice) FROM __orders_corr o2
          WHERE o2.o_custkey = o.o_custkey
        )
        ORDER BY o_orderkey
        """
    )


@query(
    "regexp_battery",
    oracle="""
SELECT c_custkey,
       TRY_CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS extracted_id,
       regexp_replace(c_name, '^Customer#0*', '')                   AS short_id,
       CAST(regexp_matches(c_name, '0{3,}') AS BOOLEAN)             AS has_zero_run,
       CAST(LENGTH(regexp_replace(c_name, '[^0-9]', '', 'g')) AS INT) AS n_digits
FROM customer
WHERE c_custkey % 13 = 0
ORDER BY c_custkey
""",
)
def regexp_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex functions over a cross-dialect-safe pattern subset (capture
    groups, anchored replace, run detection, character-class strip —
    no backreferences, whose syntax differs between engines)."""
    cust = load(spark, sf_dir, "customer")
    return (
        cust.where(F.col("c_custkey") % 13 == 0)
        .select(
            "c_custkey",
            # try_cast: a non-matching name extracts '' and a plain
            # ANSI cast is a job failure on dirty data; NULL on both
            # engines (TRY_CAST in the oracle)
            F.regexp_extract("c_name", r"Customer#(\d+)", 1)
            .try_cast("bigint")
            .alias("extracted_id"),
            F.regexp_replace("c_name", r"^Customer#0*", "").alias("short_id"),
            F.col("c_name").rlike("0{3,}").alias("has_zero_run"),
            F.length(F.regexp_replace("c_name", "[^0-9]", "")).alias("n_digits"),
        )
        .orderBy("c_custkey")
    )


@query(
    "array_agg_battery",
    oracle="""
SELECT o_custkey,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
       CAST(len(list_sort(list(DISTINCT o_orderstatus))) AS INT) AS n_statuses,
       CAST(list_contains(list(DISTINCT o_orderstatus), 'F') AS BOOLEAN) AS has_final
FROM orders
WHERE o_custkey % 11 = 0
GROUP BY o_custkey
ORDER BY o_custkey
""",
)
def array_agg_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type aggregation: collect_set → sorted array → string
    serialization (arrays are serialized so cross-engine value hashing
    stays representation-independent), plus membership and cardinality."""
    orders = load(spark, sf_dir, "orders").where(F.col("o_custkey") % 11 == 0)
    statuses = F.sort_array(F.collect_set("o_orderstatus"))
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.concat_ws(",", statuses).alias("statuses"),
            F.concat_ws("|", F.sort_array(F.collect_set("o_orderpriority"))).alias(
                "priorities"
            ),
            F.size(statuses).alias("n_statuses"),
            F.array_contains(F.collect_set("o_orderstatus"), "F").alias("has_final"),
        )
        .orderBy("o_custkey")
    )


@query(
    "histogram_order_prices",
    oracle="""
SELECT CAST(CASE WHEN o_totalprice < 0 THEN 0
            WHEN o_totalprice >= 600000 THEN 13
            ELSE FLOOR(o_totalprice / 50000) + 1 END AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(o_totalprice), 2) AS lo,
       ROUND(MAX(o_totalprice), 2) AS hi
FROM orders
GROUP BY bucket
ORDER BY bucket
""",
)
def histogram_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram via width_bucket — the single-pass binning
    shape (no per-bin scans)."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.select(
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12))
            .cast("int")
            .alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "null_semantics_battery",
    oracle="""
SELECT c.c_custkey,
       CAST(COALESCE(o.o_orderkey, -1) AS BIGINT)        AS order_or_default,
       NULLIF(c.c_mktsegment, 'BUILDING')                AS seg_or_null,
       CAST(o.o_orderkey IS NULL AS BOOLEAN)             AS no_order,
       CAST(o.o_custkey IS NOT DISTINCT FROM c.c_custkey AS BOOLEAN) AS nullsafe_eq,
       CAST(GREATEST(COALESCE(o.o_orderkey, 0), c.c_custkey) AS BIGINT) AS greatest_val
FROM customer c LEFT JOIN orders o
  ON c.c_custkey = o.o_custkey AND o.o_orderkey % 50 = 0
WHERE c.c_custkey % 7 = 0
ORDER BY c.c_custkey, order_or_default
""",
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling across engines: COALESCE/NULLIF/IS NULL, null-safe
    equality (Spark ``<=>`` ≡ DuckDB ``IS NOT DISTINCT FROM``), GREATEST
    over nullable inputs — exercised on real outer-join nulls."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_custkey") % 7 == 0)
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 0)
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("o_orderkey", F.lit(-1)).alias("order_or_default"),
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg_or_null"),
        F.col("o_orderkey").isNull().alias("no_order"),
        F.col("o_custkey").eqNullSafe(F.col("c_custkey")).alias("nullsafe_eq"),
        F.greatest(F.coalesce("o_orderkey", F.lit(0)), "c_custkey").alias(
            "greatest_val"
        ),
    ).orderBy("c_custkey", "order_or_default")


@query(
    "string_functions_sweep",
    oracle="""
SELECT c_custkey,
       UPPER(c_name)                                   AS name_upper,
       LOWER(c_mktsegment)                             AS seg_lower,
       CAST(LENGTH(c_name) AS INT)                     AS name_len,
       REVERSE(c_mktsegment)                           AS seg_rev,
       LPAD(CAST(c_custkey AS VARCHAR), 8, '0')        AS key_padded,
       REPLACE(c_name, '#', '-')                       AS name_dashed,
       SUBSTR(c_mktsegment, 2, 3)                      AS seg_mid,
       CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS lev_building,
       CONCAT_WS('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
       CAST(POSITION('1' IN c_name) AS INT)            AS pos_one
FROM customer
WHERE c_custkey % 5 = 0
ORDER BY c_custkey
""",
)
def string_functions_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    return (
        cust.where(F.col("c_custkey") % 5 == 0)
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("seg_lower"),
            F.length("c_name").alias("name_len"),
            F.reverse("c_mktsegment").alias("seg_rev"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
            F.regexp_replace("c_name", "#", "-").alias("name_dashed"),
            F.substring("c_mktsegment", 2, 3).alias("seg_mid"),
            F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev_building"),
            F.concat_ws(
                "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
            ).alias("seg_nation"),
            F.instr("c_name", "1").alias("pos_one"),
        )
        .orderBy("c_custkey")
    )


@query(
    "date_functions_sweep",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE)      AS month_start,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)   AS month_end,
       CAST(dayofweek(o_orderdate) + 1 AS INT)             AS dow,
       CAST(dayofyear(o_orderdate) AS INT)                 AS doy,
       CAST(CAST(o_orderdate AS DATE) + 90 AS DATE)        AS plus_90d,
       CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_95
FROM orders
WHERE o_orderkey % 9 = 0
ORDER BY o_orderkey
""",
)
def date_functions_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date battery. Reconciled numbering: Spark ``dayofweek`` is 1=Sunday,
    DuckDB's is 0=Sunday — the oracle adds 1."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderkey") % 9 == 0)
        .select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
            F.last_day("o_orderdate").alias("month_end"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.dayofyear("o_orderdate").alias("doy"),
            F.date_add(F.col("o_orderdate").cast("date"), 90).alias("plus_90d"),
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
            ).alias("days_since_95"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "hof_array_sweep",
    oracle="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
  WHERE vec_id % 17 = 0
)
SELECT vec_id,
  ROUND(list_sum(list_transform(e, x -> abs(x))), 4) AS l1_norm,
  CAST(len(list_filter(e, x -> x > 0)) AS INT) AS n_pos,
  ROUND(list_max(list_transform(e, x -> abs(x))), 4) AS max_abs,
  ROUND(list_dot_product(e, list_reverse(e)), 4) AS dot_reversed,
  CAST(len(list_filter(e, x -> abs(x) > 0.4)) > 0 AS BOOLEAN) AS any_extreme
FROM v
ORDER BY vec_id
""",
)
def hof_array_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function battery over the embedding column:
    transform / filter / aggregate (fold) / zip_with / reverse / exists —
    all JVM expressions in the scan projection (the idioms every
    vector-column pipeline builds on). Floats are cast to double BEFORE
    the fold so accumulation matches the oracle's double math."""
    emb = load(spark, sf_dir, "embeddings").where(F.col("vec_id") % 17 == 0)
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    absd = F.transform(e, lambda x: F.abs(x))
    fold = lambda arr: F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return emb.select(
        "vec_id",
        F.round(fold(absd), 4).alias("l1_norm"),
        F.size(F.filter(e, lambda x: x > 0)).cast("int").alias("n_pos"),
        F.round(F.array_max(absd), 4).alias("max_abs"),
        F.round(
            fold(F.zip_with(e, F.reverse(e), lambda a, b: a * b)), 4
        ).alias("dot_reversed"),
        F.exists(e, lambda x: F.abs(x) > 0.4).alias("any_extreme"),
    ).orderBy("vec_id")


@query(
    "map_functions_battery",
    oracle="""
WITH per AS (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderpriority IS NOT NULL
  GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus,
  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
  CAST(COUNT(*) AS INT) AS n_priorities,
  CAST(MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN n END) AS BIGINT)
    AS n_urgent,
  CAST(SUM(n) AS BIGINT) AS total_orders
FROM per
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def map_functions_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: map_from_entries over sorted entries, then
    map_keys / element_at / size / a fold over map_values — the oracle
    derives identical scalars relationally, proving the map semantics
    (insertion-ordered keys from the sorted entry list, lookup, fold)."""
    orders = load(spark, sf_dir, "orders")
    # NULL priorities cannot be map keys (NULL_MAP_KEY is a runtime
    # error, not a NULL entry) — exclude them on BOTH sides; a defined
    # "NULL keys are dropped" contract beats a job failure on dirty data
    per = (
        orders.where(F.col("o_orderpriority").isNotNull())
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = per.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("o_orderpriority", "n")))
        ).alias("m")
    )
    return m.select(
        "o_orderstatus",
        F.concat_ws(",", F.map_keys("m")).alias("priorities"),
        F.size("m").alias("n_priorities"),
        F.element_at("m", "1-URGENT").alias("n_urgent"),
        F.aggregate(
            F.map_values("m"), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total_orders"),
    ).orderBy("o_orderstatus")


@query(
    "quantile_approx_accuracy",
    oracle="""
WITH t(q) AS (VALUES (0.25), (0.5), (0.75), (0.9))
SELECT CAST(q AS DOUBLE) AS q,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n,
       TRUE AS within_bound
FROM t ORDER BY q
""",
)
def quantile_approx_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy CONTRACT for the approximate-percentile sketch (same
    pattern as sim_recall_report; determinism-safe — only exact counts
    and tolerance booleans reach the hashed output, never the sketch
    estimate itself): percentile_approx's Greenwald-Khanna
    guarantee is rank error <= n/accuracy, so for each target q the
    REALIZED rank of the returned value — measured against the actual
    data with one conditional aggregation — must satisfy
    rank_le/n >= q - eps - slack and rank_lt/n <= q + eps + slack
    (slack 2/n absorbs discrete-rank rounding). The oracle pins the
    REQUIRED verdict (TRUE per q); the Spark side must earn it from the
    sketch, whatever partitioning the merge took."""
    probs = [0.25, 0.5, 0.75, 0.9]
    acc = 10000
    orders = load(spark, sf_dir, "orders")
    ap = orders.agg(
        F.percentile_approx("o_totalprice", probs, acc).alias("vals"),
        F.count(F.lit(1)).alias("n"),
    )
    probs_arr = F.array(*[F.lit(p) for p in probs])
    ex = ap.select(F.posexplode("vals").alias("i", "v"), "n").select(
        F.element_at(probs_arr, F.col("i") + 1).alias("q"), "v", "n"
    )
    joined = orders.crossJoin(F.broadcast(ex))
    ranks = joined.groupBy("q", "v", "n").agg(
        F.sum((F.col("o_totalprice") <= F.col("v")).cast("long")).alias(
            "rank_le"
        ),
        F.sum((F.col("o_totalprice") < F.col("v")).cast("long")).alias(
            "rank_lt"
        ),
    )
    eps = 1.0 / acc
    slack = 2.0 / F.col("n")
    within = (
        (F.col("rank_le") / F.col("n") >= F.col("q") - eps - slack)
        & (F.col("rank_lt") / F.col("n") <= F.col("q") + eps + slack)
    )
    return ranks.select(
        "q", F.col("n").cast("long").alias("n"), within.alias("within_bound")
    ).orderBy("q")


@query(
    "string_collation_battery",
    oracle="""
WITH mangled AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_type) ELSE p_type END AS s
  FROM part
)
SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct_sensitive,
       CAST(COUNT(DISTINCT LOWER(s)) AS BIGINT) AS n_distinct_ci,
       CAST(COUNT(CASE WHEN LOWER(s) = 'standard anodized tin' THEN 1 END)
            AS BIGINT) AS n_match_ci
FROM mangled
""",
)
def string_collation_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: case-insensitive DISTINCT and equality through
    ``collate(s, 'UTF8_LCASE')`` — comparison semantics live in the
    ENGINE (usable in joins/groupBys without lower() rewrites and without
    losing the original casing). The oracle expresses the same semantics
    through LOWER(), the engine-neutral spelling; the case-sensitive
    distinct count pins that the mangling actually produced mixed case."""
    part = load(spark, sf_dir, "part")
    s = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_type")
    ).otherwise(F.col("p_type"))
    ci = F.collate(s, "UTF8_LCASE")
    return part.agg(
        F.countDistinct(s).alias("n_distinct_sensitive"),
        F.countDistinct(ci).alias("n_distinct_ci"),
        F.count(
            F.when(ci == F.lit("standard anodized tin"), 1)
        ).alias("n_match_ci"),
    )


@query(
    "scalar_bitwise_battery",
    oracle="""
SELECT l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(BIT_AND(l_orderkey) AS BIGINT) AS and_key,
       CAST(BIT_OR(l_orderkey) AS BIGINT) AS or_key,
       CAST(BIT_XOR(l_orderkey) AS BIGINT) AS xor_key,
       CAST(SUM(bit_count(CAST(l_orderkey AS BIGINT))) AS BIGINT)
         AS popcount_sum,
       CAST(SUM(CASE WHEN l_orderkey & 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS div8_aligned,
       CAST(MAX((l_orderkey << 2) | 3) AS BIGINT) AS shifted_max
FROM lineitem
GROUP BY l_linenumber
ORDER BY l_linenumber
""",
)
def scalar_bitwise_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface: BIT_AND/OR/XOR aggregates,
    popcount (bit_count), masked alignment tests, and shift/or
    compositions — all exact integer semantics, grouped by line number.
    The layout/sketch operators build on these primitives; this battery
    pins their cross-engine behavior directly."""
    li = load(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_and(k).alias("and_key"),
            F.bit_or(k).alias("or_key"),
            F.bit_xor(k).alias("xor_key"),
            F.sum(F.bit_count(k)).alias("popcount_sum"),
            F.sum(
                F.when(k.bitwiseAND(F.lit(7)) == 0, 1).otherwise(0)
            ).alias("div8_aligned"),
            F.max(
                F.shiftleft(k, 2).bitwiseOR(F.lit(3))
            ).alias("shifted_max"),
        )
        .orderBy("l_linenumber")
    )


@query(
    "sql_udf_margin_classifier",
    oracle="""
WITH m AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS net
  FROM lineitem GROUP BY l_orderkey
)
SELECT CASE WHEN net >= 300000 THEN 'large'
            WHEN net >= 100000 THEN 'medium' ELSE 'small' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(net) AS DOUBLE) AS net_revenue
FROM m GROUP BY 1 ORDER BY bucket
""",
)
def sql_udf_margin_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDF (CREATE FUNCTION … RETURN): a declarative scalar
    function classifying order net revenue into buckets, used inside an
    aggregation — the catalog-resident reusable-logic surface (the UDF
    body is inlined by the analyzer, so it costs nothing vs the CASE the
    oracle spells out). Net revenue follows the exact-decimal money-sum
    rule."""
    from skope_api_spark.tables import load as _load

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION revenue_bucket(x DOUBLE) "
        "RETURNS STRING RETURN "
        "CASE WHEN x >= 300000 THEN 'large' "
        "WHEN x >= 100000 THEN 'medium' ELSE 'small' END"
    )
    _load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
WITH m AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS net
  FROM lineitem GROUP BY l_orderkey
)
SELECT revenue_bucket(CAST(net AS DOUBLE)) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(net) AS DOUBLE) AS net_revenue
FROM m GROUP BY 1 ORDER BY bucket
"""
    )


@query(
    "sql_pipe_syntax_priority_rollup",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def sql_pipe_syntax_priority_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spark 4 SQL pipe syntax (|>): the same filtered rollup a classic
    GROUP BY writes, expressed as a linear FROM → WHERE → AGGREGATE
    pipeline — the readability surface SQL:2023-adjacent engines are
    converging on. The oracle is the classic form; the RESULT contract
    is what must match, and Catalyst plans both identically."""
    from skope_api_spark.tables import load as _load

    _load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
FROM orders
|> WHERE o_orderstatus = 'F'
|> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
   GROUP BY o_orderpriority
|> SELECT o_orderpriority, n, revenue
|> ORDER BY o_orderpriority
"""
    )


@query(
    "scalar_try_arithmetic_battery",
    oracle="""
SELECT CAST(TRY_CAST('123' AS BIGINT) AS BIGINT) AS ok_int,
       CAST(TRY_CAST('12x' AS BIGINT) AS BIGINT) AS bad_int,
       TRY_CAST('2024-02-30' AS DATE) AS bad_date,
       TRY_CAST('2024-02-29' AS DATE) AS leap_date,
       CAST(TRY_CAST('1e400' AS DOUBLE) AS DOUBLE) AS inf_dbl,
       CAST(9223372036854775807 AS BIGINT) AS max_bigint,
       CAST(NULL AS BIGINT) AS overflow_add,
       CAST(NULL AS DOUBLE) AS div_zero,
       CAST(NULL AS BIGINT) AS mod_zero
""",
)
def scalar_try_arithmetic_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANSI-mode safety surface: the try_* family that returns NULL
    where strict SQL raises — bad casts, impossible dates, bigint
    overflow, division/modulo by zero. The engine contract a pipeline
    depends on when quarantining dirty numerics (Spark runs ANSI-on by
    default in 4.x; these are the sanctioned escape hatches). DuckDB
    lacks try_add/try_divide, so the oracle states the DEFINED results
    (NULL) directly — the battery pins Spark's behavior against them.
    Note '1e400' → DuckDB TRY_CAST yields +inf (double rounding), and
    Spark matches."""
    row = spark.range(1)
    return row.select(
        F.expr("try_cast('123' AS BIGINT)").alias("ok_int"),
        F.expr("try_cast('12x' AS BIGINT)").alias("bad_int"),
        F.expr("try_cast('2024-02-30' AS DATE)").alias("bad_date"),
        F.expr("try_cast('2024-02-29' AS DATE)").alias("leap_date"),
        F.expr("try_cast('1e400' AS DOUBLE)").alias("inf_dbl"),
        F.expr("try_add(9223372036854775806, 1)").alias("max_bigint"),
        F.expr("try_add(9223372036854775807, 1)").alias("overflow_add"),
        F.try_divide(F.lit(1.0), F.lit(0.0)).alias("div_zero"),
        F.expr("try_mod(10, 0)").alias("mod_zero"),
    )


@query(
    "date_interval_edges_battery",
    oracle="""
SELECT (DATE '2024-01-31' + INTERVAL 1 MONTH)::DATE AS jan31_plus_1m,
       (DATE '2024-02-29' + INTERVAL 12 MONTH)::DATE AS leap_plus_1y,
       (DATE '2023-01-31' + INTERVAL 1 MONTH)::DATE AS jan31_nonleap,
       (DATE '2024-03-31' - INTERVAL 1 MONTH)::DATE AS mar31_minus_1m,
       date_trunc('week', DATE '2024-01-01')::DATE AS week_of_jan1,
       date_trunc('quarter', DATE '2024-08-14')::DATE AS q_trunc,
       CAST(date_diff('day', DATE '2024-02-28', DATE '2024-03-01')
            AS BIGINT) AS leap_span_days,
       CAST(EXTRACT(dow FROM DATE '2024-02-29') AS INT) AS leap_dow,
       last_day(DATE '2024-02-10') AS leap_month_end
""",
)
def date_interval_edges_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calendar-edge semantics both engines must agree on before any
    monthly rollup is trusted: month-end clamping (Jan 31 + 1 month →
    Feb 29/28), leap-day year arithmetic, backwards month steps, ISO
    week/quarter truncation, day spans across Feb 29, day-of-week
    numbering — a REAL trap this battery pins: Spark's dayofweek is
    1-based (Sunday=1), DuckDB's EXTRACT(dow) 0-based (Sunday=0), so the
    contract normalizes to Sunday=0 — and last_day. Spark's add_months
    is the clamping month-add; DuckDB's + INTERVAL matches it on every
    pinned edge."""
    row = spark.range(1)
    d = F.to_date
    return row.select(
        F.add_months(d(F.lit("2024-01-31")), 1).alias("jan31_plus_1m"),
        F.add_months(d(F.lit("2024-02-29")), 12).alias("leap_plus_1y"),
        F.add_months(d(F.lit("2023-01-31")), 1).alias("jan31_nonleap"),
        F.add_months(d(F.lit("2024-03-31")), -1).alias("mar31_minus_1m"),
        F.date_trunc("week", d(F.lit("2024-01-01")))
        .cast("date")
        .alias("week_of_jan1"),
        F.date_trunc("quarter", d(F.lit("2024-08-14")))
        .cast("date")
        .alias("q_trunc"),
        F.datediff(d(F.lit("2024-03-01")), d(F.lit("2024-02-28")))
        .cast("long")
        .alias("leap_span_days"),
        (F.dayofweek(d(F.lit("2024-02-29"))) - 1).alias("leap_dow"),
        F.last_day(d(F.lit("2024-02-10"))).alias("leap_month_end"),
    )
