"""Engine-capability extension queries: as-of join, JSON scalars, pivot,
approximate aggregation. Spark-native capabilities beyond the reference's
surface, exercised as first-class contract queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skope_api_spark.contract.registry import (
    int_bracket_sql,
    query,
    round_nz,
    safe_corr,
)
from skope_api_spark.operators.asof import asof_join
from skope_api_spark.tables import load


@query(
    "asof_join_purchase_to_click",
    oracle="""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id,
       c.event_id AS click_event_id,
       ROUND(c.value, 4) AS click_value,
       CAST(EPOCH_MS(p.ts) - EPOCH_MS(c.ts) AS BIGINT) AS ms_since_click
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
""",
)
def asof_join_purchase_to_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase matched to the user's latest
    preceding click. Oracle uses DuckDB's native ASOF JOIN; the Spark side
    is the union-merge operator (one shuffle, no range blowup)."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id"), "value"
    )
    out = asof_join(
        purchases,
        clicks,
        on=("user_id",),
        right_cols=("click_event_id", "value", "ts"),
        suffix="_c",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("click_event_id_c").alias("click_event_id"),
        F.round("value_c", 4).alias("click_value"),
        (F.unix_millis("ts") - F.unix_millis("ts_c")).alias("ms_since_click"),
    ).orderBy("event_id")


@query(
    "asof_forward_click_to_purchase",
    oracle="""
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT c.event_id, c.user_id,
       p.event_id AS next_purchase_id,
       CAST(EPOCH_MS(p.ts) - EPOCH_MS(c.ts) AS BIGINT) AS ms_to_purchase
FROM clicks c
ASOF LEFT JOIN purchases p ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY c.event_id
""",
)
def asof_forward_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click matched to the user's NEXT purchase
    (time-to-conversion). Oracle = DuckDB forward ASOF JOIN."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("next_purchase_id")
    )
    out = asof_join(
        clicks,
        purchases,
        on=("user_id",),
        right_cols=("next_purchase_id", "ts"),
        suffix="_p",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("next_purchase_id_p").alias("next_purchase_id"),
        (F.unix_millis("ts_p") - F.unix_millis("ts")).alias("ms_to_purchase"),
    ).orderBy("event_id")


@query(
    "json_scalars_events",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       CAST(json_extract(props, '$.missing') IS NOT NULL AS BOOLEAN) AS has_missing,
       CAST(LENGTH(props) AS INT) AS props_len
FROM events
WHERE event_id % 7 = 0
ORDER BY event_id
""",
)
def json_scalars_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions over the events ``props`` column."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.where(F.col("event_id") % 7 == 0)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            F.get_json_object("props", "$.missing").isNotNull().alias("has_missing"),
            F.length("props").alias("props_len"),
        )
        .orderBy("event_id")
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "pivot_orders_by_priority",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT'        THEN 1 END) AS BIGINT) AS "1-URGENT",
       CAST(COUNT(CASE WHEN o_orderpriority = '2-HIGH'          THEN 1 END) AS BIGINT) AS "2-HIGH",
       CAST(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM'        THEN 1 END) AS BIGINT) AS "3-MEDIUM",
       CAST(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS BIGINT) AS "4-NOT SPECIFIED",
       CAST(COUNT(CASE WHEN o_orderpriority = '5-LOW'           THEN 1 END) AS BIGINT) AS "5-LOW"
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def pivot_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation). Explicit value list — at scale an implicit
    pivot triggers a distinct-values job first; always enumerate."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _PRIORITIES)
        .orderBy("o_orderstatus")
    )


@query(
    "skew_salted_event_rollup",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def skew_salted_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation over the 5 hot event_type keys —
    identical results to a plain group-by (the oracle), but each hot key
    fans across 16 reducers in the partial phase."""
    from skope_api_spark.operators.skew import salted_agg

    ev = load(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        salt_source=F.col("event_id"),
        n_salts=16,
        sums=["value"],
    )
    return out.select(
        "event_type", "n", F.round("sum_value", 4).alias("sum_value")
    ).orderBy("event_type")


@query(
    "order_count_distribution",
    oracle="""
SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
""",
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join → per-key count → count histogram
    (a double aggregation with a different key each phase)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@query(
    "exists_late_shipment_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def exists_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS (compiles to a left-semi join)
    with a cross-table predicate inside the subquery."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    orders.createOrReplaceTempView("__orders_q4")
    li.createOrReplaceTempView("__lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM __orders_q4 o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND EXISTS (
            SELECT 1 FROM __lineitem_q4 l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "sketch_kmv_distinct_suppliers",
    oracle="""
WITH h AS (
  SELECT DISTINCT l_returnflag,
         ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM lineitem
), ranked AS (
  SELECT l_returnflag, hv,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rk
  FROM h
)
SELECT l_returnflag,
       CAST(ROUND(15.0 / (MAX(CASE WHEN rk = 16 THEN hv END)::DOUBLE
                          / 1152921504606846976.0)) AS BIGINT) AS kmv_estimate,
       CAST(COUNT(*) AS BIGINT) AS exact_distinct
FROM ranked
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def sketch_kmv_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values, k=16) distinct-count sketch — a mergeable
    bottom-k sketch like HLL, but built from md5-derived uniform hashes so
    both engines produce the IDENTICAL estimate (HLL sketches are
    engine-specific; this one is oracle-checkable). Estimator:
    (k-1) / (kth_min / 2^60). The exact count rides along for comparison."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    hv = F.conv(
        F.substring(F.md5(F.col("l_suppkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    h = li.select("l_returnflag", hv.alias("hv")).distinct()
    w = W.partitionBy("l_returnflag").orderBy("hv")
    ranked = h.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.round(
                F.lit(15.0)
                / (
                    F.max(F.when(F.col("rk") == 16, F.col("hv"))).cast("double")
                    / F.lit(float(1 << 60))
                )
            )
            .cast("long")
            .alias("kmv_estimate"),
            F.count(F.lit(1)).alias("exact_distinct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "approx_count_distinct_suppliers",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS suppliers_within_5pct,
       TRUE AS parts_within_5pct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def approx_count_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct. Raw sketch estimates are
    engine-specific, so the checkable contract is determinism-safe: emit the
    EXACT count plus a boolean asserting the HLL estimate (rsd=0.02) landed
    within 5% of it; the oracle computes the exact counts and literal TRUE.
    This turns the accuracy guarantee itself into the hashed value."""
    li = load(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", 0.02).alias("approx_suppliers"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    within = (
        lambda a, e: F.abs(F.col(a) - F.col(e)) / F.col(e) <= 0.05
    )
    return out.select(
        "l_returnflag",
        "exact_suppliers",
        "exact_parts",
        within("approx_suppliers", "exact_suppliers").alias(
            "suppliers_within_5pct"
        ),
        within("approx_parts", "exact_parts").alias("parts_within_5pct"),
    ).orderBy("l_returnflag")


_MORTON_SQL = " + ".join(
    f"(((zx >> {i}) & 1) * {1 << (2 * i)}) + (((zy >> {i}) & 1) * {1 << (2 * i + 1)})"
    for i in range(11)
)


@query(
    "layout_zorder_events",
    oracle=f"""
WITH b AS (
  SELECT event_id,
         CAST(user_id % 2048 AS BIGINT) AS zx,
         CAST(EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts) AS BIGINT)
           AS zy
  FROM events
)
SELECT event_id, CAST(zx AS INT) AS zx, CAST(zy AS INT) AS zy,
       CAST({_MORTON_SQL} AS BIGINT) AS zorder
FROM b
ORDER BY event_id
""",
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout clustering over (user, minute-of-day):
    the lakehouse two-dimensional scan-pruning layout. The contract
    checks the interleaved codes bit-for-bit; the range-partitioned
    sorted layout itself is asserted in tests/test_layout.py."""
    from skope_api_spark.operators.layout import zorder_layout

    ev = load(spark, sf_dir, "events")
    pre = ev.select(
        "event_id",
        (F.col("user_id") % 2048).cast("long").alias("zx"),
        (F.hour("ts") * 60 + F.minute("ts")).cast("long").alias("zy"),
    )
    out = zorder_layout(pre, "zx", "zy", bits=11, n_partitions=8)
    return out.select(
        "event_id",
        F.col("zx").cast("int").alias("zx"),
        F.col("zy").cast("int").alias("zy"),
        "zorder",
    ).orderBy("event_id")


@query(
    "ts_gap_fill_interpolate",
    oracle="""
WITH daily AS (
  SELECT user_id AS key, CAST(ts AS DATE) AS day, ROUND(SUM(value), 4) AS v
  FROM events WHERE user_id < 8 GROUP BY user_id, CAST(ts AS DATE)
), spans AS (
  SELECT key, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY key
), spine AS (
  SELECT key, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS day
  FROM spans
), j AS (
  SELECT s.key, s.day, d.v FROM spine s LEFT JOIN daily d USING (key, day)
), w AS (
  SELECT key, day, v,
    last_value(v IGNORE NULLS) OVER
      (PARTITION BY key ORDER BY day
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
      (PARTITION BY key ORDER BY day
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
    first_value(v IGNORE NULLS) OVER
      (PARTITION BY key ORDER BY day
       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER
      (PARTITION BY key ORDER BY day
       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
  FROM j
)
SELECT key, day,
  ROUND(CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL
             THEN pv + (nv - pv) * (date_diff('day', pd, day)::DOUBLE
                                    / date_diff('day', pd, nd))
        END, 4) AS value,
  (v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS interpolated
FROM w
ORDER BY key, day
""",
)
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily gap filling + linear interpolation over sparse per-user event
    sums (users < 8): date spine per key, interior gaps interpolated
    between the nearest known points, edge gaps NULL. Oracle replays the
    identical spine/window arithmetic."""
    from skope_api_spark.operators.windows import gap_fill_interpolate

    ev = load(spark, sf_dir, "events").where(F.col("user_id") < 8)
    return gap_fill_interpolate(ev).orderBy("key", "day")


@query(
    "scd2_merge_customers",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_name, c_nationkey, ROUND(c_acctbal, 2) AS c_acctbal,
         c_mktsegment,
         DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM customer
), upd AS (
  SELECT c_custkey, c_name, c_nationkey,
         ROUND(c_acctbal + 100, 2) AS c_acctbal,
         'MOVED' AS c_mktsegment, DATE '2024-06-01' AS eff
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT b.c_custkey, b.c_name, b.c_nationkey, b.c_acctbal, b.c_mktsegment,
       b.valid_from, u.eff AS valid_to
FROM base b JOIN upd u USING (c_custkey)
UNION ALL
SELECT b.* FROM base b ANTI JOIN upd u USING (c_custkey)
UNION ALL
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
       eff AS valid_from, CAST(NULL AS DATE) AS valid_to
FROM upd
ORDER BY c_custkey, valid_from
""",
)
def scd2_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 upsert (the MERGE plan a
    lakehouse compiles before file rewrite): every 10th customer gets a
    new version (acctbal +100, segment MOVED) effective 2024-06-01 —
    current rows of changed keys are closed out, new versions opened,
    everything else passes through untouched."""
    from skope_api_spark.operators.merge import scd2_merge

    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
        F.to_date(F.lit("2020-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    upd = cust.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
        F.lit("MOVED").alias("c_mktsegment"),
        F.to_date(F.lit("2024-06-01")).alias("effective_date"),
    )
    out = scd2_merge(base, upd, key_cols=["c_custkey"])
    return out.orderBy("c_custkey", "valid_from")


@query(
    "pit_join_orders_customers",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 2) AS c_acctbal,
         DATE '1995-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM customer
), upd AS (
  SELECT c_custkey, 'MOVED' AS c_mktsegment,
         ROUND(c_acctbal + 100, 2) AS c_acctbal, DATE '1998-01-01' AS eff
  FROM customer WHERE c_custkey % 10 = 0
), hist AS (
  SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal,
         b.valid_from, u.eff AS valid_to
  FROM base b JOIN upd u USING (c_custkey)
  UNION ALL
  SELECT b.* FROM base b ANTI JOIN upd u USING (c_custkey)
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_acctbal, eff, CAST(NULL AS DATE)
  FROM upd
)
SELECT o.o_orderkey, o.o_custkey, h.c_mktsegment, h.c_acctbal
FROM orders o
LEFT JOIN hist h
  ON o.o_custkey = h.c_custkey
 AND CAST(o.o_orderdate AS DATE) >= h.valid_from
 AND (h.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < h.valid_to)
ORDER BY o.o_orderkey
""",
)
def pit_join_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join of orders to an SCD2 customer history (version
    change effective 1998-01-01 for every 10th customer): each order
    resolves the customer version valid AT its order date — pre-1998
    orders see the original segment, later ones see MOVED. Key
    equi-join + residual validity filter; exactly one version matches."""
    from skope_api_spark.operators.merge import point_in_time_join, scd2_merge

    cust = load(spark, sf_dir, "customer")
    base = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.to_date(F.lit("1995-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    upd = cust.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
        F.to_date(F.lit("1998-01-01")).alias("effective_date"),
    )
    hist = scd2_merge(base, upd, key_cols=["c_custkey"])
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate").cast("date").alias("o_day"),
    )
    out = point_in_time_join(
        orders, hist, key_cols=["c_custkey"], ts_col="o_day", how="left"
    )
    return out.select(
        orders["o_orderkey"],
        orders["c_custkey"].alias("o_custkey"),
        hist["c_mktsegment"],
        hist["c_acctbal"],
    ).orderBy("o_orderkey")


def _cms_hash_sql(r: int, width: int = 1024) -> str:
    return (
        f"CAST(('0x' || substr(md5('cms{r}:' || tok), 1, 15)) AS BIGINT)"
        f" % {width}"
    )


@query(
    "sketch_cms_token_counts",
    oracle=f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), cells AS (
  SELECT 0 AS row, {_cms_hash_sql(0)} AS col FROM toks
  UNION ALL SELECT 1, {_cms_hash_sql(1)} FROM toks
  UNION ALL SELECT 2, {_cms_hash_sql(2)} FROM toks
  UNION ALL SELECT 3, {_cms_hash_sql(3)} FROM toks
), cms AS (
  SELECT row, col, COUNT(*) AS n FROM cells GROUP BY row, col
), exact AS (
  SELECT tok, COUNT(*) AS exact_n FROM toks GROUP BY tok
), top AS (
  SELECT tok, exact_n FROM exact ORDER BY exact_n DESC, tok LIMIT 10
), probes AS (
  SELECT tok, 0 AS row, {_cms_hash_sql(0)} AS col FROM top
  UNION ALL SELECT tok, 1, {_cms_hash_sql(1)} FROM top
  UNION ALL SELECT tok, 2, {_cms_hash_sql(2)} FROM top
  UNION ALL SELECT tok, 3, {_cms_hash_sql(3)} FROM top
), est AS (
  SELECT p.tok, MIN(COALESCE(c.n, 0)) AS cms_n
  FROM probes p LEFT JOIN cms c USING (row, col) GROUP BY p.tok
)
SELECT t.tok, CAST(t.exact_n AS BIGINT) AS exact_n,
       CAST(e.cms_n AS BIGINT) AS cms_n,
       (e.cms_n >= t.exact_n) AS no_underestimate
FROM top t JOIN est e USING (tok)
ORDER BY exact_n DESC, tok
""",
)
def sketch_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch as a DataFrame (1024×4 counter table from one
    aggregation): point estimates for the exact top-10 tokens, plus the
    sketch's no-underestimate invariant. Deterministic md5 hash rows, so
    the oracle replays the identical sketch — an exact contract on an
    approximate structure."""
    from skope_api_spark.operators.sketches import cms_build, cms_estimate

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    cms = cms_build(toks, "tok")
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "tok")
        .limit(10)
    )
    est = cms_estimate(cms, top.select("tok"), "tok")
    return (
        top.join(est, "tok")
        .select(
            "tok",
            "exact_n",
            "cms_count",
        )
        .select(
            "tok",
            F.col("exact_n").cast("bigint").alias("exact_n"),
            F.col("cms_count").cast("bigint").alias("cms_n"),
            (F.col("cms_count") >= F.col("exact_n")).alias("no_underestimate"),
        )
        .orderBy(F.desc("exact_n"), "tok")
    )


@query(
    "sketch_gk_quantiles_price",
    oracle="""
WITH p AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS p FROM lineitem
), q AS (
  SELECT quantile_cont(p, [0.25, 0.5, 0.75, 0.9]) AS qs,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM p
)
SELECT CAST(CASE g WHEN 1 THEN 0.25 WHEN 2 THEN 0.5
                   WHEN 3 THEN 0.75 ELSE 0.9 END AS DOUBLE) AS prob,
       ROUND(qs[g], 4) AS exact_value,
       n,
       TRUE AS within_bound
FROM q CROSS JOIN generate_series(1, 4) t(g)
ORDER BY prob
""",
)
def sketch_gk_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch contract in the sketch_* family (KMV / CMS / now
    rank sketch): Spark's mergeable ``percentile_approx``
    (Greenwald-Khanna-style, accuracy 1/ε = 1000) probed at four ranks
    over lineitem prices. Complements ``quantile_approx_accuracy``
    (scalars2.py), which pins the pure rank-error booleans on orders at
    accuracy 10k — THIS contract additionally cross-engine-verifies the
    EXACT quantile values themselves (via the distributed
    ``exact_quantiles`` prefix-sum operator — no single-reducer
    percentile) alongside the sketch invariant, so a regression in
    either the sketch or the exact path is caught by one query. The
    approximate VALUE stays out of the hashed surface (engine-specific),
    so the declared contract is determinism-safe: what is hashed is the
    exact quantile, the row count, and the realized rank-error
    invariant. With duplicate values the returned element does not have
    ONE rank but the interval [count(p < v̂)+1, count(p ≤ v̂)] — the GK
    guarantee is that SOME rank of v̂ is within ε·n of q·n, so the
    boolean checks that this interval intersects [q·n − ε·n, q·n + ε·n]
    (a single max-rank test over-rejects when any value's multiplicity
    approaches ε·n). TRUE at any scale by the sketch guarantee. The
    realized rank interval of each sketch value is ONE extra corpus
    aggregation against the 4-row broadcast — the sketch itself is a
    single partial-aggregated pass, the 100 TB shape for monitoring
    dashboards where exact prefix-sum quantiles are overkill."""
    from skope_api_spark.operators.stats import exact_quantiles

    probs = [0.25, 0.5, 0.75, 0.9]
    li = load(spark, sf_dir, "lineitem")
    prices = li.select(F.col("l_extendedprice").cast("double").alias("p"))
    exact = exact_quantiles(prices, "p", probs)
    sk = prices.agg(
        F.percentile_approx("p", probs, 1000).alias("av"),
        F.count(F.lit(1)).alias("n"),
    )
    prob_lit = F.array(*[F.lit(p) for p in probs])
    approx = sk.select(
        F.posexplode("av").alias("i", "av"), F.col("n")
    ).select(prob_lit[F.col("i")].alias("prob"), "av", "n")
    ranks = (
        prices.crossJoin(F.broadcast(approx))
        .groupBy("prob", "av", "n")
        .agg(
            F.sum(F.when(F.col("p") < F.col("av"), 1).otherwise(0)).alias(
                "rk_below"
            ),
            F.sum(F.when(F.col("p") <= F.col("av"), 1).otherwise(0)).alias(
                "rk_hi"
            ),
        )
    )
    eps_slack = F.col("n").cast("double") / 1000.0 + 1.0
    target = F.col("prob") * F.col("n").cast("double")
    return (
        exact.join(ranks, "prob")
        .select(
            "prob",
            F.round("value", 4).alias("exact_value"),
            "n",
            (
                ((F.col("rk_below") + 1).cast("double") <= target + eps_slack)
                & (F.col("rk_hi").cast("double") >= target - eps_slack)
            ).alias("within_bound"),
        )
        .orderBy("prob")
    )


@query(
    "skew_hot_key_report",
    oracle="""
WITH counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM events GROUP BY event_type
), tot AS (SELECT COUNT(*) AS t FROM events)
SELECT event_type, n_rows,
       ROUND(n_rows / t, 6) AS share,
       CAST(CEIL((n_rows / t) * 32) AS INT) AS suggested_salt
FROM counts, tot
WHERE n_rows / t >= 0.05
ORDER BY n_rows DESC, event_type
""",
)
def skew_hot_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key profiler: the measurement that justifies (or rules out)
    salting. events.event_type is near-uniform at ~20% per value, so all
    five keys cross the 5% reporting threshold; suggested_salt is the
    salt count that levels each key to one average reducer's load at 32
    shuffle partitions (pinned so the oracle is engine-independent)."""
    from skope_api_spark.operators.skew import detect_hot_keys

    ev = load(spark, sf_dir, "events")
    out = detect_hot_keys(
        ev, ["event_type"], min_share=0.05, target_partitions=32
    )
    return out.select(
        "event_type",
        "n_rows",
        F.round("share", 6).alias("share"),
        "suggested_salt",
    ).orderBy(F.desc("n_rows"), "event_type")


def _pr_iteration(prev: str, cur: str) -> str:
    """One unrolled PageRank power-iteration CTE (mirrors operators/graph.py:
    rank' = (1-d)/N + d * sum(rank/outdeg over in-edges), rounded to 12 dp
    so accumulation-order noise cannot compound across iterations)."""
    return f"""{cur} AS (
  SELECT nodes.node,
         ROUND((1.0 - 0.85) / ANY_VALUE(nn.n)
               + 0.85 * COALESCE(SUM(c.c), 0.0), 12) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (SELECT e.dst, {prev}.rank / od.outdeg AS c
             FROM e JOIN {prev} ON {prev}.node = e.src
             JOIN od ON od.src = e.src) c
    ON c.dst = nodes.node
  GROUP BY nodes.node
)"""


_PAGERANK_ORACLE = f"""
WITH e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT l_partkey AS src,
           LEAD(l_partkey) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
    FROM lineitem)
  WHERE dst IS NOT NULL AND src <> dst
), nodes AS (
  SELECT src AS node FROM e UNION SELECT dst AS node FROM e
), nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
od AS (SELECT src, COUNT(*)::DOUBLE AS outdeg FROM e GROUP BY src),
r0 AS (SELECT node, ROUND(1.0 / (SELECT n FROM nn), 12) AS rank FROM nodes),
{_pr_iteration("r0", "r1")},
{_pr_iteration("r1", "r2")},
{_pr_iteration("r2", "r3")}
SELECT node AS part_node,
       CAST((2 * CAST(ROUND(rank * 1000000000000.0) AS BIGINT) + 1000000)
            // 2000000 AS DOUBLE) / 1000000.0 AS pagerank
FROM r3
ORDER BY pagerank DESC, part_node
LIMIT 20
"""


@query("graph_pagerank_copurchase", oracle=_PAGERANK_ORACLE)
def graph_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 3-iteration PageRank over the part co-purchase graph
    (consecutive line numbers within an order -> directed part edge; see
    operators/graph.py for the per-iteration join/agg plan and the
    12-dp-per-iteration determinism contract). Top-20 by 6-dp rank,
    node-id tie-break -> TakeOrderedAndProject.

    The 12-dp iteration pin makes every rank an EXACT 1e-12 multiple on
    both engines — which means the final 6-dp engine ROUND hits true
    repr-ties (the sf1 tie audit caught rank 5.5e-06 diverging: a
    teleport-floor-derived exact 7-digit decimal). Both engines recover
    the same integer R = ROUND(rank*1e12) (doubles within ~1e-4 of R)
    and round by integer HALF_UP — bit-identical, and the top-20
    ordering happens on the identical rounded value."""
    from skope_api_spark.operators.graph import pagerank, transition_edges

    li = load(spark, sf_dir, "lineitem")
    edges = transition_edges(
        li,
        group_col="l_orderkey",
        order_col="l_linenumber",
        node_col="l_partkey",
    )
    ranks = pagerank(edges, iterations=3, damping=0.85)
    return (
        ranks.select(
            F.col("node").alias("part_node"),
            F.expr(
                "CAST((2 * CAST(ROUND(rank * 1000000000000.0) AS BIGINT)"
                " + 1000000) DIV 2000000 AS DOUBLE) / 1000000.0"
            ).alias("pagerank"),
        )
        .orderBy(F.desc("pagerank"), "part_node")
        .limit(20)
    )


@query(
    "json_quarantine_ingest",
    oracle="""
WITH raw AS (
  SELECT event_type,
         CASE WHEN event_id % 13 = 0 THEN 'x' || props ELSE props END AS p
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN NOT json_valid(p) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quarantined,
       ROUND(AVG(CASE WHEN json_valid(p)
                      THEN CAST(json_extract(p, '$.k') AS INT) END), 4)
         AS avg_k
FROM raw
GROUP BY event_type
ORDER BY event_type
""",
)
def json_quarantine_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read ingestion with quarantine: a deterministic 1-in-13
    slice of the ``props`` payloads is corrupted (PREFIX garbage — both
    engines reject it; trailing garbage would diverge, Jackson accepts it
    while DuckDB's json_valid does not), then parsed with an explicit
    schema carrying a ``_corrupt_record`` column — the real PERMISSIVE
    quarantine pattern: malformed rows keep their raw payload in the
    corrupt column, are counted per group, and are excluded from the
    typed aggregate. At scale this is the standard "parse, quarantine,
    aggregate the clean side" landing-zone plan: one scan, parsing in the
    projection, no corpus-sized extra shuffle."""
    ev = load(spark, sf_dir, "events")
    corrupted = F.when(
        F.col("event_id") % 13 == 0, F.concat(F.lit("x"), F.col("props"))
    ).otherwise(F.col("props"))
    parsed = F.from_json(
        corrupted,
        "k INT, _corrupt_record STRING",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return (
        ev.select("event_type", parsed.alias("p"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("p._corrupt_record").isNotNull().cast("int"))
            .cast("long")
            .alias("n_quarantined"),
            F.round(F.avg(F.col("p.k")), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@query(
    "fuzzy_join_part_terms",
    oracle="""
WITH dict AS (
  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS term FROM part
), pw AS (
  SELECT p_partkey, string_split(p_name, ' ')[1] AS w
  FROM part WHERE p_partkey % 17 = 0
), probes AS (
  SELECT DISTINCT
    substring(w, 1, CAST(p_partkey % len(w) AS INT))
    || substring(w, CAST(p_partkey % len(w) AS INT) + 2, len(w)) AS probe
  FROM pw
)
SELECT p.probe, d.term,
       CAST(levenshtein(p.probe, d.term) AS INT) AS dist
FROM probes p CROSS JOIN dict d
WHERE levenshtein(p.probe, d.term) <= 1
ORDER BY p.probe, d.term
""",
)
def fuzzy_join_part_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell fuzzy join: deterministic 1-char-deletion misspellings of
    part-name words, matched back to the part vocabulary on edit distance
    <= 1 via the 1-deletion-neighborhood equi-join (guaranteed recall —
    see operators/fuzzy.py). The oracle is the brute-force all-pairs
    levenshtein the banding provably reproduces."""
    from skope_api_spark.operators.fuzzy import fuzzy_join

    part = load(spark, sf_dir, "part")
    dict_ = part.select(
        F.explode(F.split("p_name", " ")).alias("term")
    ).distinct()
    w = F.split("p_name", " ")[0]
    pos = (F.col("p_partkey") % F.length(w)).cast("int")
    probes = (
        part.where(F.col("p_partkey") % 17 == 0)
        .select(
            F.concat(
                w.substr(F.lit(1), pos),
                w.substr(pos + 2, F.length(w)),
            ).alias("probe")
        )
        .distinct()
    )
    return fuzzy_join(probes, dict_).orderBy("probe", "term")


@query(
    "mv_incremental_rollup",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def mv_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view incremental refresh: the pre-cutoff history is
    aggregated once (the stored MV), the post-cutoff delta is aggregated
    alone, and the two merge by re-reducing — O(delta + groups), never
    re-reading history (operators/merge.py::incremental_rollup). The
    oracle is the full recompute the refresh must equal."""
    from skope_api_spark.operators.merge import incremental_rollup

    ev = load(spark, sf_dir, "events")
    cutoff = "2024-01-20"
    base_agg = (
        ev.where(F.col("ts") < cutoff)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").alias("sum_value"),
        )
    )
    merged = incremental_rollup(
        base_agg,
        ev.where(F.col("ts") >= cutoff),
        keys=["event_type"],
        count_col="n",
        sum_cols=[("sum_value", "value")],
    )
    return merged.select(
        "event_type", "n", F.round("sum_value", 4).alias("sum_value")
    ).orderBy("event_type")


@query(
    "funnel_conversion_events",
    oracle="""
WITH ev AS (
  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03'
), c1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM ev
  WHERE event_type = 'click' GROUP BY user_id
), c2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2 FROM ev e
  JOIN c1 ON e.user_id = c1.user_id
  WHERE e.event_type = 'view' AND e.ts > c1.t1 GROUP BY e.user_id
), c3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3 FROM ev e
  JOIN c2 ON e.user_id = c2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c2.t2 GROUP BY e.user_id
), stages AS (
  SELECT c1.user_id,
         CASE WHEN c3.user_id IS NOT NULL THEN 3
              WHEN c2.user_id IS NOT NULL THEN 2
              ELSE 1 END AS stage
  FROM c1
  LEFT JOIN c2 USING (user_id)
  LEFT JOIN c3 USING (user_id)
)
SELECT CAST(stage AS INT) AS stage, CAST(COUNT(*) AS BIGINT) AS n_users
FROM stages GROUP BY stage ORDER BY stage
""",
)
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel depth histogram over click -> view -> purchase, greedy
    ordered matching (each step strictly after the matched previous
    step; see operators/funnel.py). Population = users who reached step
    1, so stages are 1..3. The window is cut to the first two days —
    over the full month every user completes every step and the
    histogram degenerates to one row."""
    from skope_api_spark.operators.funnel import funnel_stages

    ev = load(spark, sf_dir, "events").where(F.col("ts") < "2024-01-03")
    st = funnel_stages(ev, ["click", "view", "purchase"])
    return (
        st.groupBy("stage")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("stage")
    )


@query(
    "cohort_retention_events",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
)
SELECT f.cohort,
       CAST(date_diff('day', f.cohort, a.p) / 7 AS INT) AS period_n,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM active a JOIN firsts f USING (user_id)
GROUP BY f.cohort, period_n
ORDER BY f.cohort, period_n
""",
)
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-active ISO week,
    counted in every later week they return (operators/funnel.py::
    cohort_retention — two aggregations + one user-key join). Week
    distances are exact multiples of 7 days (both endpoints truncated),
    so the integer division is tie-free cross-engine."""
    from skope_api_spark.operators.funnel import cohort_retention

    ev = load(spark, sf_dir, "events")
    out = cohort_retention(ev)
    # Spark date_trunc returns TIMESTAMP, DuckDB's returns DATE — align
    return out.select(
        F.col("cohort").cast("date").alias("cohort"), "period_n", "n_users"
    ).orderBy("cohort", "period_n")


@query(
    "graph_triangle_top_nodes",
    oracle="""
WITH e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT l_partkey AS src,
           LEAD(l_partkey) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
    FROM lineitem)
  WHERE dst IS NOT NULL AND src <> dst
), und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM e0
), tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
), corners AS (
  SELECT unnest([a, b, c]) AS node FROM tri
), nodes AS (
  SELECT u AS node FROM und UNION SELECT v AS node FROM und
)
SELECT n.node AS part_node, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS n_triangles
FROM nodes n
LEFT JOIN (SELECT node, COUNT(*) AS cnt FROM corners GROUP BY node) c
  USING (node)
ORDER BY n_triangles DESC, part_node
LIMIT 10
""",
)
def graph_triangle_top_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 parts by triangle participation in the co-purchase graph
    (degree-ordered compact-forward counting, operators/graph.py::
    triangle_counts — wedge join bounded by m^1.5 regardless of hub
    degree). The oracle enumerates each id-ordered triangle (a<b<c) once
    from the canonical undirected edge list; counts are exact integers,
    so no rounding contracts are needed."""
    from skope_api_spark.operators.graph import (
        transition_edges,
        triangle_counts,
    )

    li = load(spark, sf_dir, "lineitem")
    edges = transition_edges(
        li,
        group_col="l_orderkey",
        order_col="l_linenumber",
        node_col="l_partkey",
    )
    out = triangle_counts(edges)
    return (
        out.select(F.col("node").alias("part_node"), "n_triangles")
        .orderBy(F.desc("n_triangles"), "part_node")
        .limit(10)
    )


# Shared convex CCW polygon fixture for the spatial join: one Python
# constant renders BOTH the Spark rows and the DuckDB literals, so the
# two engines see bit-identical vertex doubles.
_SPATIAL_POLYS: list[tuple[int, list[tuple[float, float]]]] = [
    (1, [(0.0, 0.0), (5.0, 0.0), (5.0, 5.0), (0.0, 5.0)]),
    (2, [(10.0, 1.0), (14.0, 1.0), (12.0, 4.0)]),
    (3, [(9.0, 10.0), (7.5, 12.598), (4.5, 12.598), (3.0, 10.0),
         (4.5, 7.402), (7.5, 7.402)]),
    (4, [(8.0, 8.0), (19.0, 8.0), (19.0, 14.0), (8.0, 14.0)]),
    (5, [(4.0, 10.0), (6.0, 12.0), (4.0, 14.0), (2.0, 12.0)]),
]


def _polys_sql() -> str:
    rows = []
    for pid, verts in _SPATIAL_POLYS:
        vs = ", ".join(f"{{'x': {x!r}, 'y': {y!r}}}" for x, y in verts)
        rows.append(f"({pid}, [{vs}])")
    return ",\n         ".join(rows)


_SPATIAL_ORACLE = f"""
WITH polys(poly_id, verts) AS (
  VALUES {_polys_sql()}
), pts AS (
  SELECT event_id AS point_id,
         (event_id % 200) / 10.0 AS px,
         (user_id % 150) / 10.0 AS py
  FROM events
), hits AS (
  SELECT p.point_id, g.poly_id
  FROM pts p CROSS JOIN polys g
  WHERE len(list_filter(range(1, len(g.verts) + 1), i ->
      ( (g.verts[CASE WHEN i = len(g.verts) THEN 1 ELSE i + 1 END].x
          - g.verts[i].x) * (p.py - g.verts[i].y)
      - (g.verts[CASE WHEN i = len(g.verts) THEN 1 ELSE i + 1 END].y
          - g.verts[i].y) * (p.px - g.verts[i].x) ) < 0)) = 0
)
SELECT CAST(poly_id AS INT) AS poly_id,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM hits GROUP BY poly_id ORDER BY poly_id
"""


@query("spatial_join_points_polygons", oracle=_SPATIAL_ORACLE)
def spatial_join_points_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial join (operators/spatial.py): events mapped
    to deterministic 2-D points, joined against five convex CCW polygons
    (two overlapping) through the cell equi-join + half-plane verify.
    The oracle brute-forces the same convex containment over the cross
    product — the grid path must lose nothing."""
    from skope_api_spark.operators.spatial import spatial_join

    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_id").alias("point_id"),
        ((F.col("event_id") % 200) / F.lit(10.0)).alias("x"),
        ((F.col("user_id") % 150) / F.lit(10.0)).alias("y"),
    )
    polys = spark.createDataFrame(
        [
            (pid, [{"x": x, "y": y} for x, y in verts])
            for pid, verts in _SPATIAL_POLYS
        ],
        "poly_id int, verts array<struct<x double, y double>>",
    )
    out = spatial_join(pts, polys, cell_size=4.0)
    return (
        out.groupBy("poly_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_points"))
        .orderBy("poly_id")
    )


@query(
    "dq_constraint_report_orders",
    oracle="""
WITH a AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_rows,
         CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) AS n_distinct_keys,
         CAST(COUNT(o_totalprice) AS DOUBLE) / COUNT(*) AS price_completeness,
         CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
         CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1992-01-01'
                        AND o_orderdate <  TIMESTAMP '1999-01-01'
                       THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
           AS date_in_range_frac
  FROM orders
)
SELECT c."constraint", c.observed, c.passed FROM a, LATERAL (
  SELECT * FROM (VALUES
    ('row_count_floor',    a.n_rows,              a.n_rows >= 1000),
    ('orderkey_unique',    a.n_distinct_keys,     a.n_distinct_keys = a.n_rows),
    ('price_complete',     a.price_completeness,  a.price_completeness = 1.0),
    ('price_non_negative', a.min_price,           a.min_price >= 0.0),
    ('date_in_range',      a.date_in_range_frac,  a.date_in_range_frac = 1.0)
  ) AS v("constraint", observed, passed)
) c
""",
)
def dq_constraint_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality audit of the orders ingest
    (operators/quality.py::constraint_report): row-count floor, key
    uniqueness, price completeness and range, date window — all from ONE
    aggregation; the report row order is the declaration order."""
    from skope_api_spark.operators.quality import constraint_report

    orders = load(spark, sf_dir, "orders")
    in_range = (
        (F.col("o_orderdate") >= "1992-01-01")
        & (F.col("o_orderdate") < "1999-01-01")
    ).cast("int")
    return constraint_report(
        orders,
        [
            ("row_count_floor", F.count(F.lit(1)),
             F.col("row_count_floor") >= 1000),
            ("orderkey_unique", F.countDistinct("o_orderkey"),
             F.col("orderkey_unique") == F.col("row_count_floor")),
            ("price_complete",
             F.try_divide(F.count("o_totalprice"), F.count(F.lit(1))),
             F.col("price_complete") == 1.0),
            ("price_non_negative", F.min("o_totalprice"),
             F.col("price_non_negative") >= 0.0),
            ("date_in_range",
             F.try_divide(F.sum(in_range), F.count(F.lit(1))),
             F.col("date_in_range") == 1.0),
        ],
    )


@query(
    "cdc_apply_customers",
    oracle="""
WITH changes AS (
  SELECT c_custkey AS k, 2 AS seq, 'U' AS op, c_name,
         ROUND(c_acctbal + 100.0, 2) AS c_acctbal
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey, 3, 'D', c_name, c_acctbal
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 1, 'I',
         'new customer ' || CAST(c_custkey AS VARCHAR), 0.0
  FROM customer WHERE c_custkey % 17 = 0
), latest AS (
  SELECT k, op, c_name, c_acctbal FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
    FROM changes) t
  WHERE rn = 1
), survivors AS (
  SELECT k AS c_custkey, c_name, c_acctbal FROM latest WHERE op <> 'D'
), kept AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer
  WHERE c_custkey NOT IN (SELECT k FROM changes)
)
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal
FROM (SELECT * FROM kept UNION ALL SELECT * FROM survivors)
ORDER BY c_custkey
""",
)
def cdc_apply_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-state apply (operators/merge.py::cdc_apply): a derived
    change batch — updates for keys %5, deletes for %10 (their seq 3
    beats the update's seq 2), inserts at key+1e6 for %17 — applied to
    the customer snapshot. The %10 keys must vanish (delete wins by
    sequence), %5-but-not-%10 keys carry the +100 balance, inserts
    appear, everything else passes through untouched."""
    from skope_api_spark.operators.merge import cdc_apply

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    upd = cust.where(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit(2).alias("seq"),
        F.lit("U").alias("op"),
        "c_name",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("c_acctbal"),
    )
    dels = cust.where(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit(3).alias("seq"),
        F.lit("D").alias("op"),
        "c_name",
        "c_acctbal",
    )
    ins = cust.where(F.col("c_custkey") % 17 == 0).select(
        (F.col("c_custkey") + 1000000).alias("k"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.concat(
            F.lit("new customer "), F.col("c_custkey").cast("string")
        ).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    changes = upd.unionByName(dels).unionByName(ins).withColumnRenamed(
        "k", "c_custkey"
    )
    out = cdc_apply(
        cust,
        changes,
        key_cols=["c_custkey"],
        seq_col="seq",
        payload_cols=["c_name", "c_acctbal"],
    )
    return out.select(
        "c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal")
    ).orderBy("c_custkey")


@query(
    "snapshot_diff_customers",
    oracle="""
WITH a AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 11 <> 0
), b AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN ROUND(c_acctbal + 50.0, 2)
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 13 <> 0
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT CASE WHEN a.c_custkey IS NULL THEN 'added'
              WHEN b.c_custkey IS NULL THEN 'removed'
              WHEN a.c_acctbal <> b.c_acctbal THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN b USING (c_custkey)
) t
GROUP BY status ORDER BY status
""",
)
def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation — the FULL OUTER JOIN shape: two derived
    customer snapshots (rows dropped on each side, balances drifted on
    %7 keys) classified added/removed/changed/unchanged and counted.
    The join coalesces the key from whichever side is present."""
    cust = load(spark, sf_dir, "customer")
    # presence markers (not payload NULLs) classify existence, so a
    # legitimately-NULL balance could never masquerade as a missing row —
    # matching the oracle's key-presence semantics exactly
    a = cust.where(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        F.col("c_acctbal").alias("bal_a"),
        F.lit(1).alias("in_a"),
    )
    b = cust.where(F.col("c_custkey") % 13 != 0).select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 7 == 0,
            F.round(F.col("c_acctbal") + 50.0, 2),
        )
        .otherwise(F.col("c_acctbal"))
        .alias("bal_b"),
        F.lit(1).alias("in_b"),
    )
    joined = a.join(b, "c_custkey", "full_outer")
    status = (
        F.when(F.col("in_a").isNull(), "added")
        .when(F.col("in_b").isNull(), "removed")
        .when(F.col("bal_a") != F.col("bal_b"), "changed")
        .otherwise("unchanged")
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("status")
    )


_SITES: list[tuple[int, float, float]] = [
    (1, 40.7, -74.0),   # NYC-ish
    (2, 51.5, -0.1),    # London-ish
    (3, 35.7, 139.7),   # Tokyo-ish
    (4, -33.9, 151.2),  # Sydney-ish
    (5, 19.4, -99.1),   # CDMX-ish
    (6, 0.0, 0.0),      # null island
]


def _sites_sql() -> str:
    return ", ".join(f"({sid}, {la!r}, {lo!r})" for sid, la, lo in _SITES)


_NEAREST_ORACLE = f"""
WITH sites(site_id, slat, slon) AS (
  VALUES {_sites_sql()}
), pts AS (
  SELECT event_id AS point_id,
         (user_id % 120) * 0.5 - 30.0 AS plat,
         (event_id % 360) * 0.5 - 90.0 AS plon
  FROM events
), d AS (
  SELECT p.point_id, s.site_id,
         CAST(FLOOR(2.0 * 6371.0088 * asin(sqrt(least(
           sin(radians(s.slat - p.plat) / 2.0)
             * sin(radians(s.slat - p.plat) / 2.0)
           + cos(radians(p.plat)) * cos(radians(s.slat))
             * sin(radians(s.slon - p.plon) / 2.0)
             * sin(radians(s.slon - p.plon) / 2.0),
           1.0))) * 1000000.0 + 0.5) AS BIGINT) AS km_u
  FROM pts p CROSS JOIN sites s
), best AS (
  SELECT point_id, site_id, km_u,
         ROW_NUMBER() OVER (
           PARTITION BY point_id ORDER BY km_u, site_id) AS rn
  FROM d
)
SELECT CAST(site_id AS INT) AS site_id,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST((2 * SUM(km_u) + 100 * COUNT(*)) // (200 * COUNT(*))
            AS DOUBLE) / 10000.0 AS avg_km
FROM best WHERE rn = 1
GROUP BY site_id ORDER BY site_id
"""


@query("spatial_nearest_site", oracle=_NEAREST_ORACLE)
def spatial_nearest_site(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-site assignment (operators/spatial.py::nearest_site):
    events mapped to deterministic lat/lon, each assigned to the closest
    of six reference sites by 6-dp-quantized haversine km (site-id
    tie-break), reported as per-site counts and mean distance. Broadcast
    sites + one min-struct aggregation — no window sort.

    Cross-engine exactness (r16): the per-pair distance quantizes by
    FLOOR(km*1e6 + 0.5) on the shared binary double — the sf1 tie audit
    found 29 cells where engine ROUND(x, 6) diverges on repr-ties of the
    transcendental value; floor-shift is the same arithmetic on the same
    double everywhere. The mean then sums the exact BIGINT micro-km
    (order-independent) and rounds by integer HALF_UP, eliminating the
    order-dependent double AVG."""
    from skope_api_spark.operators.spatial import nearest_site

    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_id").alias("point_id"),
        ((F.col("user_id") % 120) * 0.5 - 30.0).alias("lat"),
        ((F.col("event_id") % 360) * 0.5 - 90.0).alias("lon"),
    )
    sites = spark.createDataFrame(
        _SITES, "site_id int, lat double, lon double"
    )
    out = nearest_site(pts, sites).select(
        "site_id",
        # exact recover: distance_km is the double nearest micro/1e6
        F.expr("CAST(ROUND(distance_km * 1000000.0) AS BIGINT)").alias(
            "km_u"
        ),
    )
    return (
        out.groupBy("site_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.expr(
                "CAST((2 * SUM(km_u) + 100 * COUNT(*))"
                " DIV (200 * COUNT(*)) AS DOUBLE) / 10000.0"
            ).alias("avg_km"),
        )
        .orderBy("site_id")
    )


@query(
    "graph_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), pairs AS (
  SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
)
SELECT cur, nxt, CAST(n AS BIGINT) AS n,
       ROUND(n / SUM(n) OVER (PARTITION BY cur), 6) AS p
FROM pairs ORDER BY cur, nxt
""",
)
def graph_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user event sequences —
    the path-analysis primitive behind "what do users do next": one
    window pass for consecutive pairs ((ts, event_id) deterministic
    order), one aggregation, and a per-state window normalization to
    probabilities."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    wn = W.partitionBy("cur")
    return (
        pairs.select(
            "cur",
            "nxt",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.sum("n").over(wn), 6).alias("p"),
        )
        .orderBy("cur", "nxt")
    )


@query(
    "ts_rolling_correlation_events",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         SUM(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END) AS click_v,
         SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS purchase_v
  FROM events GROUP BY 1
), r AS (
  SELECT h, click_v, purchase_v,
         CASE WHEN COUNT(*) OVER w = 24
              THEN CORR(click_v, purchase_v) OVER w END AS c
  FROM hourly
  WINDOW w AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT CAST(h AS TIMESTAMP) AS h,
       ROUND(click_v, 4) AS click_v,
       ROUND(purchase_v, 4) AS purchase_v,
       (ROUND(c, 6) + 0.0) AS rolling_corr
FROM r ORDER BY h
""",
)
def ts_rolling_correlation_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-hour rolling Pearson correlation between the hourly click and
    purchase value series — the co-movement signal (quant-style rolling
    corr). One conditional-sum aggregation aligns the two series without
    a join; corr runs in a count-guarded row window (partial windows
    NULL, the W1 discipline)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", F.col("value")).otherwise(
                0.0
            )
        ).alias("click_v"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase", F.col("value")
            ).otherwise(0.0)
        ).alias("purchase_v"),
    )
    w = W.orderBy("h").rowsBetween(-23, 0)
    # safe_corr, not F.corr: a 24-hour window where one series is
    # constant (e.g. zero purchases at small SF / quiet shards at scale)
    # must yield NULL, not an ANSI DIVIDE_BY_ZERO job failure
    out = hourly.withColumn(
        "rolling_corr",
        F.when(
            F.count(F.lit(1)).over(w) == 24,
            safe_corr("click_v", "purchase_v", over=w),
        ),
    )
    return out.select(
        "h",
        F.round("click_v", 4).alias("click_v"),
        F.round("purchase_v", 4).alias("purchase_v"),
        round_nz("rolling_corr", 6).alias("rolling_corr"),
    ).orderBy("h")


@query(
    "graph_khop_distances",
    oracle="""
WITH RECURSIVE e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT l_partkey AS src,
           LEAD(l_partkey) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
    FROM lineitem)
  WHERE dst IS NOT NULL AND src <> dst
), seeds AS (
  SELECT DISTINCT src AS node FROM e WHERE src % 97 = 0
), bfs AS (
  SELECT node, 0 AS d FROM seeds
  UNION
  SELECT e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.node WHERE b.d < 3
)
SELECT node AS part_node, CAST(MIN(d) AS INT) AS dist
FROM bfs GROUP BY node
ORDER BY dist, part_node
""",
)
def graph_khop_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source k-hop BFS over the part co-purchase graph: shortest
    hop-distance (<= 3) from a deterministic seed set (src % 97 = 0).

    The oracle is the SEMANTIC spec — a recursive CTE that enumerates
    path prefixes and takes MIN(dist); the Spark side is the frontier
    BFS in operators/graph.py:khop_distances, whose per-iteration cost
    is one frontier-sized join + anti-join (the scale plan: frontiers
    shrink, path enumeration explodes). This is the one registry shape
    a recursive CTE expresses that Spark SQL has no native form for."""
    from skope_api_spark.operators.graph import khop_distances, transition_edges

    li = load(spark, sf_dir, "lineitem")
    edges = transition_edges(
        li,
        group_col="l_orderkey",
        order_col="l_linenumber",
        node_col="l_partkey",
    )
    seeds = edges.where(F.col("src") % 97 == 0).select(
        F.col("src").alias("node")
    )
    out = khop_distances(edges, seeds, max_hops=3)
    return out.select(
        F.col("node").alias("part_node"), F.col("dist").cast("int").alias("dist")
    ).orderBy("dist", "part_node")


@query(
    "hist_equi_width_price",
    oracle="""
SELECT CASE WHEN l_extendedprice < 900.0 THEN 0
            WHEN l_extendedprice >= 105000.0 THEN 22
            ELSE CAST(FLOOR((l_extendedprice - 900.0)
                            / ((105000.0 - 900.0) / 21)) AS BIGINT) + 1
       END AS bucket,
       ROUND(900.0 + (CASE WHEN l_extendedprice < 900.0 THEN 0
            WHEN l_extendedprice >= 105000.0 THEN 22
            ELSE CAST(FLOOR((l_extendedprice - 900.0)
                            / ((105000.0 - 900.0) / 21)) AS BIGINT) + 1
       END - 1) * ((105000.0 - 900.0) / 21), 4) AS lo,
       ROUND(900.0 + CASE WHEN l_extendedprice < 900.0 THEN 0
            WHEN l_extendedprice >= 105000.0 THEN 22
            ELSE CAST(FLOOR((l_extendedprice - 900.0)
                            / ((105000.0 - 900.0) / 21)) AS BIGINT) + 1
       END * ((105000.0 - 900.0) / 21), 4) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY 1
ORDER BY bucket
""",
)
def hist_equi_width_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of l_extendedprice over a fixed profiled
    domain [900, 105000) in 21 bins (operators/quality.py:
    equi_width_histogram — ONE width_bucket aggregation with map-side
    combine; DuckDB has no width_bucket, so the oracle spells out the
    identical floor arithmetic, verified bucket-exact at sf0.01 and
    sf0.1)."""
    from skope_api_spark.operators.quality import equi_width_histogram

    li = load(spark, sf_dir, "lineitem")
    out = equi_width_histogram(
        li, "l_extendedprice", lo=900.0, hi=105000.0, buckets=21
    )
    return out.select(
        "bucket",
        F.round("lo", 4).alias("lo"),
        F.round("hi", 4).alias("hi"),
        "n",
    ).orderBy("bucket")


@query(
    "hist_equi_depth_price",
    oracle=f"""
WITH ticks AS MATERIALIZED (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS t FROM lineitem
), b AS MATERIALIZED ({int_bracket_sql('ticks', 't', range(1, 10), 10)})
SELECT 1 + len(list_filter(b.t,
         s -> ticks.t * 10 > s.vlo * 10 + s.rem * (s.vhi - s.vlo)))
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM ticks CROSS JOIN b
GROUP BY 1
ORDER BY bucket
""",
)
def hist_equi_depth_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of l_extendedprice: boundaries as
    INTEGER-EXACT cent-tick brackets (operators/quality.py:
    equi_depth_histogram tick mode → stats.py:exact_quantile_brackets)
    broadcast as one scalar row, then an in-scan aggregate fold bins
    each value by integer cross-multiplication — no ntile, no global
    sort funnel, and no interpolated-double boundary for an engine-build
    quantile ulp to flip (the r8 rfm class: cent-grid prices against
    ROUND(decile, 2) could tie on a half-cent). Swap approx_percentile
    into the boundary aggregate at extreme scale, same plan shape."""
    from skope_api_spark.operators.quality import equi_depth_histogram

    li = load(spark, sf_dir, "lineitem")
    out = equi_depth_histogram(
        li, "l_extendedprice", buckets=10, tick_scale=100
    )
    return out.orderBy("bucket")


@query(
    "hh_misra_gries_report",
    oracle="""
WITH items AS (
  SELECT CASE WHEN l_orderkey % 3 = 0 THEN 'hot_' || (l_orderkey % 2)
              ELSE 'cold_' || l_orderkey END AS item
  FROM lineitem
), exact AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_count FROM items GROUP BY item
)
SELECT item, exact_count,
       TRUE AS present_ok,
       TRUE AS bound_ok
FROM exact
ORDER BY exact_count DESC, item
LIMIT 10
""",
)
def hh_misra_gries_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Misra-Gries heavy hitters with a realized-accuracy
    contract (operators/heavyhitters.py). Domain: a hot-head/long-tail
    key over lineitem (two ~n/6 hot items + ~40k singleton-ish cold
    items — the open-domain regime where pre-shuffle summary compression
    matters; 64 counters, threshold n/65).

    The MG estimates themselves depend on the batch layout, so the
    contract hashes what theory makes PARTITIONING-INDEPENDENT: for the
    top-10 items by exact count, ``present_ok`` (every item above the
    n/(m+1) undercount threshold survived, vacuous below it) and
    ``bound_ok`` (0 <= exact - est <= n/(m+1), checked in exact integer
    arithmetic). Same realized-bound pattern as
    ``quantile_approx_accuracy``."""
    from skope_api_spark.operators.heavyhitters import mg_estimates

    m = 64
    li = load(spark, sf_dir, "lineitem")
    items = li.select(
        F.when(
            F.col("l_orderkey") % 3 == 0,
            F.concat(F.lit("hot_"), (F.col("l_orderkey") % 2).cast("string")),
        )
        .otherwise(F.concat(F.lit("cold_"), F.col("l_orderkey").cast("string")))
        .alias("item")
    )
    exact = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    est = mg_estimates(items, "item", counters=m).withColumnRenamed(
        "est_count", "__est"
    )
    n = items.agg(F.count(F.lit(1)).alias("__n"))
    joined = (
        exact.join(est, "item", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "item",
            "exact_count",
            (
                (F.col("exact_count") * (m + 1) <= F.col("__n"))
                | (F.coalesce("__est", F.lit(0)) > 0)
            ).alias("present_ok"),
            (
                (F.coalesce("__est", F.lit(0)) <= F.col("exact_count"))
                & (
                    (F.col("exact_count") - F.coalesce("__est", F.lit(0)))
                    * (m + 1)
                    <= F.col("__n")
                )
            ).alias("bound_ok"),
        )
    )
    return joined.orderBy(F.desc("exact_count"), "item").limit(10)


@query(
    "basket_association_rules",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
), nb AS (SELECT COUNT(DISTINCT basket) AS n FROM items),
ic AS (SELECT item, COUNT(*) AS n_item FROM items GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
)
SELECT p.item_a, p.item_b, p.n_pairs,
       CAST(ca.n_item AS BIGINT) AS n_a,
       CAST(cb.n_item AS BIGINT) AS n_b,
       CAST(p.n_pairs AS DOUBLE) / nb.n AS support,
       CAST(p.n_pairs AS DOUBLE) / ca.n_item AS confidence_a_b,
       CAST(p.n_pairs * nb.n AS DOUBLE)
         / CAST(ca.n_item * cb.n_item AS DOUBLE) AS lift
FROM pairs p
JOIN ic ca ON ca.item = p.item_a
JOIN ic cb ON cb.item = p.item_b
CROSS JOIN nb
ORDER BY lift DESC, item_a, item_b
LIMIT 20
""",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order/part co-purchases:
    top-20 part pairs by lift with pair-count >= 3
    (operators/basket.py — basket-key-co-located self-join, skinny count
    joins, broadcast basket total; support/confidence/lift are single
    divisions of exact integers, bit-identical cross-engine)."""
    from skope_api_spark.operators.basket import association_rules

    li = load(spark, sf_dir, "lineitem")
    return association_rules(
        li,
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_pair_count=3,
        top_k=20,
    )


_RFM_CUST = """
  SELECT o_custkey AS customer,
         MAX(DATEDIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
           AS recency_days,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         SUM(CAST(ROUND(o_totalprice * 10000) AS BIGINT)) AS monetary_ticks
  FROM orders GROUP BY o_custkey
"""


def _rfm_brackets(col: str) -> str:
    """Integer-exact quartile brackets of an integral column of `cust`
    (registry.py:int_bracket_sql — the oracle mirror of
    operators/stats.py:exact_quantile_brackets)."""
    return int_bracket_sql("cust", col, [1, 2, 3], 4)


@query(
    "rfm_customer_segments",
    oracle=f"""
WITH cust AS MATERIALIZED ({_RFM_CUST}),
tr AS MATERIALIZED ({_rfm_brackets('recency_days')}),
tf AS MATERIALIZED ({_rfm_brackets('frequency')}),
tm AS MATERIALIZED ({_rfm_brackets('monetary_ticks')}),
scored AS (
  SELECT c.*,
    1 + len(list_filter(tr.t,
        s -> 4 * c.recency_days > 4 * s.vlo + s.rem * (s.vhi - s.vlo)))
      AS r_score,
    1 + len(list_filter(tf.t,
        s -> 4 * c.frequency > 4 * s.vlo + s.rem * (s.vhi - s.vlo)))
      AS f_score,
    1 + len(list_filter(tm.t,
        s -> 4 * c.monetary_ticks > 4 * s.vlo + s.rem * (s.vhi - s.vlo)))
      AS m_score
  FROM cust c CROSS JOIN tr CROSS JOIN tf CROSS JOIN tm
)
SELECT r_score || '' || f_score || '' || m_score AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(monetary_ticks) AS BIGINT) AS total_monetary_ticks
FROM scored
GROUP BY 1
ORDER BY n_customers DESC, segment
""",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of the customer base: quartile scores over
    recency/frequency/monetary (operators/funnel.py:rfm_segments — one
    per-customer aggregation, integer-exact quartile brackets broadcast,
    in-scan score fold), rolled up to segment sizes and exact BIGINT
    money-ticks segment revenue. Engine-build-proof (VERDICT r8 #1):
    every hashed cell is a string or BIGINT, every quartile comparison
    is integer cross-multiplication — no interpolated-double threshold
    for a DuckDB-build quantile_cont ulp difference to flip."""
    from skope_api_spark.operators.funnel import rfm_segments

    orders = load(spark, sf_dir, "orders")
    seg = rfm_segments(
        orders,
        customer_col="o_custkey",
        date_col="o_orderdate",
        amount_col="o_totalprice",
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary_ticks").alias("total_monetary_ticks"),
        )
        .orderBy(F.desc("n_customers"), "segment")
    )


@query(
    "json_variant_battery",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract(
           CASE WHEN json_valid(props) THEN props END, '$.k') AS INT))
         AS BIGINT) AS sum_k,
       CAST(MAX(CAST(json_extract(
           CASE WHEN json_valid(props) THEN props END, '$.k') AS INT))
         AS INT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def json_variant_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: semi-structured payloads parsed once into
    the binary variant encoding (parse_json), typed extraction via
    variant_get in the aggregation — the engine-native successor to
    repeated get_json_object string parsing. Oracle reads the same
    payloads through DuckDB's JSON extraction."""
    ev = load(spark, sf_dir, "events")
    # try_parse_json: malformed payloads are a certainty in real event
    # streams — NULL variant (skipped by the aggregates) on both
    # engines (oracle guards with json_valid), never a parse failure
    v = ev.select(
        "event_type", F.try_parse_json("props").alias("__v")
    )
    k = F.variant_get("__v", "$.k", "int")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "net_ip_block_enrichment",
    oracle="""
WITH ips AS (
  SELECT event_id,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':ip'), 1, 15))
           ::BIGINT % 4294967296 AS ip
  FROM events
), blocks AS (
  SELECT n_nationkey AS block_id, n_name AS block_name,
         CAST(n_nationkey AS BIGINT) * 134217728 AS ip_lo,
         CAST(n_nationkey AS BIGINT) * 134217728
           + CAST(134217728 / POW(2, n_nationkey % 3) AS BIGINT) - 1 AS ip_hi
  FROM nation
)
SELECT b.block_id, b.block_name,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(i.ip) AS BIGINT) AS min_ip,
       CAST(MAX(i.ip) AS BIGINT) AS max_ip
FROM ips i JOIN blocks b ON i.ip BETWEEN b.ip_lo AND b.ip_hi
GROUP BY b.block_id, b.block_name
ORDER BY b.block_id
""",
)
def net_ip_block_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IP-to-block enrichment (the CIDR / geo-IP log join): synthetic
    32-bit IPs from the shared md5_long chain, variable-width blocks
    (/5-equivalent down to /7-equivalent so widths differ 4x) derived
    from nation. Spark side is operators/rangejoin.py:point_in_range_join
    — bucket equi-join with capped block explode, never the BNLJ a bare
    BETWEEN join plans; the oracle is that bare theta join, fine at
    25-block scale."""
    from skope_api_spark.operators.dedup import md5_long
    from skope_api_spark.operators.rangejoin import point_in_range_join

    ev = load(spark, sf_dir, "events")
    ips = ev.select(
        "event_id",
        (
            md5_long(F.concat(F.col("event_id").cast("string"), F.lit(":ip")))
            % F.lit(4294967296)
        ).alias("ip"),
    )
    nation = load(spark, sf_dir, "nation")
    blocks = nation.select(
        F.col("n_nationkey").alias("block_id"),
        F.col("n_name").alias("block_name"),
        (F.col("n_nationkey").cast("long") * 134217728).alias("ip_lo"),
        (
            F.col("n_nationkey").cast("long") * 134217728
            + F.floor(
                134217728 / F.pow(2, F.col("n_nationkey") % 3)
            ).cast("long")
            - 1
        ).alias("ip_hi"),
    )
    joined = point_in_range_join(
        ips,
        blocks,
        point_col="ip",
        range_start="ip_lo",
        range_end="ip_hi",
        bucket_width=1 << 24,
        max_buckets_per_range=4,
    )
    return (
        joined.groupBy("block_id", "block_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ip").alias("min_ip"),
            F.max("ip").alias("max_ip"),
        )
        .orderBy("block_id")
    )


@query(
    "dq_k_anonymity_customers",
    oracle="""
WITH classes AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS sz
  FROM customer GROUP BY 1, 2
)
SELECT CAST(SUM(sz) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(sz) AS BIGINT) AS k_min,
       CAST(COALESCE(SUM(CASE WHEN sz < 5 THEN sz END), 0) AS BIGINT)
         AS n_rows_below_k,
       CAST(COUNT(CASE WHEN sz < 5 THEN 1 END) AS BIGINT)
         AS n_classes_below_k,
       MIN(sz) >= 5 AS anonymous
FROM classes
""",
)
def dq_k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table on the
    (mktsegment, nationkey) quasi-identifier pair — the privacy gate run
    before sharing any row-level extract
    (operators/quality.py:k_anonymity_report, two map-side-combinable
    aggregations)."""
    from skope_api_spark.operators.quality import k_anonymity_report

    cust = load(spark, sf_dir, "customer")
    return k_anonymity_report(
        cust, ["c_mktsegment", "c_nationkey"], k=5
    )


@query(
    "rec_item_item_neighbors",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
), ic AS (SELECT item, COUNT(*) AS n_item FROM items GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_pairs
  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= 2
), scored AS (
  SELECT p.item_a, p.item_b, p.n_pairs,
         p.n_pairs / SQRT(CAST(ca.n_item * cb.n_item AS DOUBLE)) AS cosine
  FROM pairs p
  JOIN ic ca ON ca.item = p.item_a
  JOIN ic cb ON cb.item = p.item_b
), sym AS (
  SELECT item_a AS item, item_b AS neighbor, n_pairs, cosine FROM scored
  UNION ALL
  SELECT item_b AS item, item_a AS neighbor, n_pairs, cosine FROM scored
), ranked AS (
  SELECT item, neighbor, n_pairs, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY item
                                 ORDER BY cosine DESC, neighbor) AS INT)
           AS rk
  FROM sym
)
SELECT item, rk, neighbor, CAST(n_pairs AS BIGINT) AS n_pairs,
       ROUND(cosine, 6) AS cosine
FROM ranked WHERE rk <= 3
ORDER BY item, rk
""",
)
def rec_item_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-kNN recommender neighbors: top-3 co-purchase neighbors per
    part by binary-incidence cosine (n_pairs / sqrt(n_a·n_b)), min
    co-occurrence 2. Ranking keys are a single exact-integer division
    plus the neighbor-id tie-break, so the top-3 cut is deterministic
    cross-engine (operators/basket.py:item_item_cosine)."""
    from skope_api_spark.operators.basket import item_item_cosine

    li = load(spark, sf_dir, "lineitem")
    out = item_item_cosine(
        li,
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_pair_count=2,
        k=3,
    )
    return out.select(
        "item",
        "rk",
        "neighbor",
        "n_pairs",
        F.round("cosine", 6).alias("cosine"),
    ).orderBy("item", "rk")


@query(
    "graph_degree_assortativity",
    oracle="""
WITH e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT l_partkey AS src,
           LEAD(l_partkey) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
    FROM lineitem)
  WHERE dst IS NOT NULL AND src <> dst
), und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM e0
), deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
  ) GROUP BY node
), stubs AS (
  SELECT du.deg AS da, dv.deg AS db
  FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v
  UNION ALL
  SELECT dv.deg AS da, du.deg AS db
  FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_edges,
       ROUND((SELECT SUM(deg)::DOUBLE / COUNT(*) FROM deg), 6) AS avg_degree,
       ROUND((SELECT CORR(da, db) FROM stubs), 6) AS assortativity
""",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph — do high-degree
    parts co-occur with other hubs? One degree aggregation + two skinny
    joins + a single corr over symmetrized stubs; 6-dp rounding covers
    corr accumulation-order noise
    (operators/graph.py:degree_assortativity)."""
    from skope_api_spark.operators.graph import (
        degree_assortativity,
        transition_edges,
    )

    li = load(spark, sf_dir, "lineitem")
    edges = transition_edges(
        li,
        group_col="l_orderkey",
        order_col="l_linenumber",
        node_col="l_partkey",
    )
    out = degree_assortativity(edges)
    return out.select(
        "n_nodes",
        "n_edges",
        F.round("avg_degree", 6).alias("avg_degree"),
        F.round("assortativity", 6).alias("assortativity"),
    )


_PROF_NUM = """
SELECT '{c}' AS "column", 'completeness' AS metric,
       COUNT({c})::DOUBLE / COUNT(*) AS value FROM orders
UNION ALL SELECT '{c}', 'n_distinct', COUNT(DISTINCT {c})::DOUBLE FROM orders
UNION ALL SELECT '{c}', 'min', MIN({c})::DOUBLE FROM orders
UNION ALL SELECT '{c}', 'max', MAX({c})::DOUBLE FROM orders
UNION ALL SELECT '{c}', 'mean',
  SUM(CAST({c} AS {dec}))::DOUBLE / COUNT({c}) FROM orders
"""

_PROF_STR = """
SELECT '{c}' AS "column", 'completeness' AS metric,
       COUNT({c})::DOUBLE / COUNT(*) AS value FROM orders
UNION ALL SELECT '{c}', 'n_distinct', COUNT(DISTINCT {c})::DOUBLE FROM orders
UNION ALL SELECT '{c}', 'min_length', MIN(LENGTH({c}))::DOUBLE FROM orders
UNION ALL SELECT '{c}', 'max_length', MAX(LENGTH({c}))::DOUBLE FROM orders
UNION ALL SELECT '{c}', 'avg_length',
  SUM(CAST(LENGTH({c}) AS DECIMAL(38,0)))::DOUBLE / COUNT({c}) FROM orders
"""

_PROF_TS = """
SELECT '{c}' AS "column", 'completeness' AS metric,
       COUNT({c})::DOUBLE / COUNT(*) AS value FROM orders
UNION ALL SELECT '{c}', 'n_distinct', COUNT(DISTINCT {c})::DOUBLE FROM orders
UNION ALL SELECT '{c}', 'min_epoch', EPOCH(MIN({c}))::DOUBLE FROM orders
UNION ALL SELECT '{c}', 'max_epoch', EPOCH(MAX({c}))::DOUBLE FROM orders
"""


@query(
    "dq_column_profile_orders",
    oracle="SELECT \"column\", metric, ROUND(value, 6) AS value FROM (\n"
    + "UNION ALL".join(
        [
            "SELECT '*' AS \"column\", 'n_rows' AS metric, "
            "COUNT(*)::DOUBLE AS value FROM orders\n",
            _PROF_NUM.format(c="o_orderkey", dec="DECIMAL(38,0)"),
            _PROF_NUM.format(c="o_custkey", dec="DECIMAL(38,0)"),
            _PROF_STR.format(c="o_orderstatus"),
            _PROF_NUM.format(c="o_totalprice", dec="DECIMAL(18,2)"),
            _PROF_TS.format(c="o_orderdate"),
            _PROF_STR.format(c="o_orderpriority"),
        ]
    )
    + ') ORDER BY "column", metric',
)
def dq_column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profile of orders in ONE aggregation pass —
    completeness, exact distinct counts, typed min/max/mean (exact
    decimal accumulation per the money-sum rule), string length stats,
    timestamp epoch range (UTC sessions). Long-format deequ-style
    output (operators/quality.py:column_profile)."""
    from skope_api_spark.operators.quality import column_profile

    orders = load(spark, sf_dir, "orders")
    out = column_profile(orders, float_decimal="decimal(18,2)")
    return out.select(
        "column", "metric", F.round("value", 6).alias("value")
    ).orderBy("column", "metric")


@query(
    "sketch_kmv_overlap_langs",
    oracle="""
WITH ha AS (
  SELECT DISTINCT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE lang = 'en')
), hb AS (
  SELECT DISTINCT ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv
  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE lang = 'de')
), ska AS (SELECT hv FROM ha ORDER BY hv LIMIT 64),
skb AS (SELECT hv FROM hb ORDER BY hv LIMIT 64),
usk AS (
  SELECT hv FROM (
    SELECT DISTINCT hv FROM (SELECT hv FROM ska UNION ALL SELECT hv FROM skb)
  ) ORDER BY hv LIMIT 64
), marked AS (
  SELECT u.hv, (a.hv IS NOT NULL AND b.hv IS NOT NULL) AS in_both
  FROM usk u LEFT JOIN ska a USING (hv) LEFT JOIN skb b USING (hv)
), agg AS (
  SELECT COUNT(*) AS n, MAX(hv) AS kth,
         COUNT(CASE WHEN in_both THEN 1 END) AS shared
  FROM marked
), ex AS (
  SELECT (SELECT COUNT(*) FROM ha JOIN hb USING (hv))::DOUBLE AS n_int,
         (SELECT COUNT(*) FROM
            (SELECT hv FROM ha UNION SELECT hv FROM hb))::DOUBLE AS n_un
)
SELECT CAST(CASE WHEN n >= 64
            THEN ROUND(63.0 / (kth / 1152921504606846976.0))
            ELSE n END AS BIGINT) AS union_estimate,
       ROUND(shared / CAST(n AS DOUBLE), 6) AS jaccard_estimate,
       CAST(ROUND((shared / CAST(n AS DOUBLE))
            * (CASE WHEN n >= 64
               THEN ROUND(63.0 / (kth / 1152921504606846976.0))
               ELSE n END)) AS BIGINT) AS intersection_estimate,
       ROUND(ex.n_int / ex.n_un, 6) AS exact_jaccard,
       CAST(ex.n_un AS BIGINT) AS exact_union
FROM agg, ex
""",
)
def sketch_kmv_overlap_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set algebra: union-size, Jaccard, and intersection
    estimates between the English and German token vocabularies from two
    64-value bottom-k sketches — mergeable sketch math with
    md5-deterministic hashes, so the ESTIMATES are oracle-checkable,
    not just the exact counts. The exact Jaccard/union ride along as the
    realized-error report (operators/sketches.py:kmv_bottomk /
    kmv_overlap)."""
    from skope_api_spark.operators.dedup import md5_long
    from skope_api_spark.operators.sketches import kmv_bottomk, kmv_overlap

    docs = load(spark, sf_dir, "documents")
    tok = lambda lang: docs.where(F.col("lang") == lang).select(  # noqa: E731
        F.explode(F.split("text", " ")).alias("tok")
    )
    ska = kmv_bottomk(tok("en"), "tok", k=64)
    skb = kmv_bottomk(tok("de"), "tok", k=64)
    est = kmv_overlap(ska, skb, k=64)
    ha = tok("en").select(md5_long(F.col("tok")).alias("hv")).distinct()
    hb = tok("de").select(md5_long(F.col("tok")).alias("hv")).distinct()
    n_int = ha.join(hb, "hv").agg(
        F.count(F.lit(1)).cast("double").alias("n_int")
    )
    n_un = (
        ha.unionAll(hb)
        .distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("n_un"))
    )
    ex = n_int.crossJoin(F.broadcast(n_un))
    return est.crossJoin(F.broadcast(ex)).select(
        "union_estimate",
        F.round("jaccard_estimate", 6).alias("jaccard_estimate"),
        "intersection_estimate",
        F.round(F.try_divide(F.col("n_int"), F.col("n_un")), 6).alias(
            "exact_jaccard"
        ),
        F.col("n_un").cast("long").alias("exact_union"),
    )


@query(
    "graph_adamic_adar_links",
    oracle="""
WITH e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT l_partkey AS src,
           LEAD(l_partkey) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
    FROM lineitem)
  WHERE dst IS NOT NULL AND src <> dst
), und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM e0
), dirs AS (
  SELECT u AS center, v AS n FROM und
  UNION ALL SELECT v AS center, u AS n FROM und
), deg AS (SELECT center, COUNT(*) AS deg FROM dirs GROUP BY center),
weighted AS (
  SELECT d.center, d.n, 1.0 / LN(g.deg) AS w
  FROM dirs d JOIN deg g USING (center)
), cand AS (
  SELECT a.n AS u, b.n AS v, SUM(a.w) AS aa_score,
         CAST(COUNT(*) AS BIGINT) AS common_neighbors
  FROM weighted a JOIN weighted b
    ON a.center = b.center AND a.n < b.n
  GROUP BY a.n, b.n
), non_edges AS (
  SELECT c.* FROM cand c
  LEFT JOIN und ON und.u = c.u AND und.v = c.v
  WHERE und.u IS NULL
)
SELECT u, v, common_neighbors, ROUND(aa_score, 6) AS aa_score
FROM non_edges
ORDER BY ROUND(aa_score, 6) DESC, u, v
LIMIT 20
""",
)
def graph_adamic_adar_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted co-purchase links by Adamic-Adar common-neighbor
    score — existing edges anti-joined away, ranking on the 6-dp-rounded
    score with (u, v) tie-break so sub-rounding ln-sum noise cannot flip
    the cut (operators/graph.py:adamic_adar_links)."""
    from skope_api_spark.operators.graph import (
        adamic_adar_links,
        transition_edges,
    )

    li = load(spark, sf_dir, "lineitem")
    edges = transition_edges(
        li,
        group_col="l_orderkey",
        order_col="l_linenumber",
        node_col="l_partkey",
    )
    return adamic_adar_links(edges, top_k=20)


_REACH_SQL = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT l_partkey AS src,
           LEAD(l_partkey) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
    FROM lineitem)
  WHERE dst IS NOT NULL AND src <> dst
), und AS (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v FROM e0
  GROUP BY 1, 2
), sym AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), seeds AS (
  SELECT u AS node FROM und GROUP BY u ORDER BY u LIMIT 3
), reach(node, hop) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT s.v, r.hop + 1
  FROM reach r JOIN sym s ON s.u = r.node
  WHERE r.hop < 2
)
SELECT node, CAST(MIN(hop) AS INT) AS min_hops,
       CAST(COUNT(*) AS BIGINT) AS n_paths
FROM reach GROUP BY node
ORDER BY min_hops, node
LIMIT 200
"""


@query("sql_recursive_reachability", oracle=_REACH_SQL)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE (Spark 4's WITH RECURSIVE) — 2-hop
    reachability with path counts from the three smallest co-purchase
    nodes, running the IDENTICAL SQL text on both engines. Complements
    the DataFrame-loop BFS (graph_khop_distances, which scales via
    frontier anti-joins and checkpoints): the recursive CTE is the
    SQL-user surface, hop-bounded because UNION ALL enumerates paths.
    Exact integer hops/counts, deterministic LIMIT on (min_hops, node).
    """
    from skope_api_spark.tables import load as _load

    _load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_REACH_SQL)


@query(
    "spatial_grid_density_clusters",
    oracle="""
WITH RECURSIVE pts AS (
  SELECT (user_id % 120) * 0.5 - 30.0 AS lat,
         (event_id % 360) * 0.5 - 90.0 AS lon
  FROM events
), cells AS (
  SELECT CAST(FLOOR(lat / 5.0) AS BIGINT) AS cx,
         CAST(FLOOR(lon / 5.0) AS BIGINT) AS cy,
         (CAST(FLOOR(lat / 5.0) AS BIGINT) + 1000) * 1000000
           + (CAST(FLOOR(lon / 5.0) AS BIGINT) + 1000) AS cell_id,
         COUNT(*) AS n_points
  FROM pts GROUP BY 1, 2, 3
  HAVING COUNT(*) >= 25
), offs(dx, dy) AS (
  SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
                        (0,1),(1,-1),(1,0),(1,1)) t(dx, dy)
), pairs AS (
  SELECT c.cell_id AS u,
         (c.cx + o.dx + 1000) * 1000000 + (c.cy + o.dy + 1000) AS v
  FROM cells c CROSS JOIN offs o
  JOIN cells n ON n.cell_id =
       (c.cx + o.dx + 1000) * 1000000 + (c.cy + o.dy + 1000)
  WHERE c.cell_id <
        (c.cx + o.dx + 1000) * 1000000 + (c.cy + o.dy + 1000)
), edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), labels AS (
  SELECT u AS cell_id, LEAST(u, MIN(v)) AS cluster_id
  FROM reach GROUP BY u
), full_cells AS (
  SELECT c.*, COALESCE(l.cluster_id, c.cell_id) AS cluster_id
  FROM cells c LEFT JOIN labels l USING (cell_id)
)
SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(n_points) AS BIGINT) AS n_points,
       CAST(MIN(cx) AS BIGINT) AS min_cx, CAST(MAX(cx) AS BIGINT) AS max_cx,
       CAST(MIN(cy) AS BIGINT) AS min_cy, CAST(MAX(cy) AS BIGINT) AS max_cy
FROM full_cells
GROUP BY cluster_id
ORDER BY cluster_id
""",
)
def spatial_grid_density_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Grid-density spatial clustering of the deterministic event
    point cloud (cell-based DBSCAN: 5° cells, core at ≥25 points,
    8-adjacent core cells merged by star contraction). No distance
    cross join anywhere — density via ONE aggregation, adjacency via
    the bounded ×8 offset explode, merging via the log-round
    components operator; the oracle replays adjacency + a recursive-CTE
    closure (operators/spatial.py:grid_density_clusters)."""
    from skope_api_spark.operators.spatial import grid_density_clusters

    events = load(spark, sf_dir, "events")
    pts = events.select(
        ((F.col("user_id") % 120) * 0.5 - 30.0).alias("lat"),
        ((F.col("event_id") % 360) * 0.5 - 90.0).alias("lon"),
    )
    out = grid_density_clusters(pts, cell_deg=5.0, min_pts=25)
    return out.orderBy("cluster_id")


@query(
    "funnel_time_to_convert_quantiles",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), matched AS MATERIALIZED (
  SELECT epoch_ms(p.ts) - epoch_ms(c.ts) AS ms
  FROM p ASOF JOIN c
    ON p.user_id = c.user_id AND p.ts >= c.ts
), br AS MATERIALIZED ({int_bracket_sql('matched', 'ms', [50, 90, 99], 100)})
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM matched) AS n_conversions,
       (100 * br.t[1].vlo + br.t[1].rem * (br.t[1].vhi - br.t[1].vlo)) // 600
         AS p50_min_e4,
       (100 * br.t[2].vlo + br.t[2].rem * (br.t[2].vhi - br.t[2].vlo)) // 600
         AS p90_min_e4,
       (100 * br.t[3].vlo + br.t[3].rem * (br.t[3].vhi - br.t[3].vlo)) // 600
         AS p99_min_e4
FROM br
""",
)
def funnel_time_to_convert_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-to-convert distribution — the funnel-latency report: each
    purchase as-of-joined to the user's latest preceding click (the
    union-merge operator, one shuffle), then exact quantiles of the
    integer millisecond deltas via the bracket form
    (stats.py:exact_quantile_brackets — percentile_cont rank brackets
    plus remainder, all BIGINT). Reported as minutes ×10⁴, floored:
    p_min_e4 = (100·vlo + rem·(vhi−vlo)) div 600 — the exact rational
    q_ms/60000 at 1e-4 precision with ZERO floats anywhere, closing the
    last convertible member of the r8 quantile-boundary class (the
    prior form ROUNDed an engine-interpolated double whose exact value
    can land on the 5e-5 half-grid: ms/60000 has a factor-3 denominator,
    so half-grid ties are reachable on exact data)."""
    from skope_api_spark.operators.asof import asof_join
    from skope_api_spark.operators.stats import exact_quantile_brackets

    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    m = asof_join(
        purchases, clicks, on=("user_id",), right_cols=("ts",), suffix="_c"
    ).where(F.col("ts_c").isNotNull())
    ms = m.select(
        (F.unix_millis("ts") - F.unix_millis("ts_c")).alias("ms")
    )
    n = ms.agg(F.count(F.lit(1)).alias("n_conversions"))
    br = exact_quantile_brackets(ms, "ms", [50, 90, 99], 100)
    # BIGINT `div`, not `/`: e4 reaches ~1e11 and a double quotient
    # would reintroduce the rounding surface this form removes
    e4_div = F.expr("(vlo * 100 + rem * (vhi - vlo)) div 600")
    wide = br.agg(
        *[
            F.min(F.when(F.col("num") == k, e4_div)).alias(alias)
            for k, alias in [
                (50, "p50_min_e4"),
                (90, "p90_min_e4"),
                (99, "p99_min_e4"),
            ]
        ]
    )
    return n.crossJoin(F.broadcast(wide))
