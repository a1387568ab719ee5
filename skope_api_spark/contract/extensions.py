"""Engine-capability extension queries: as-of join, JSON scalars, pivot,
approximate aggregation. Spark-native capabilities beyond the reference's
surface, exercised as first-class contract queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skope_api_spark.contract.registry import query
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


@query("approx_count_distinct_suppliers")
def approx_count_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — sketch values are engine-
    specific, so this registers WITHOUT an oracle (driver rows-only check).
    The exact-count companion is ``distinct_agg_suppliers_per_brand``."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_suppkey", 0.02).alias("approx_suppliers"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        )
        .orderBy("l_returnflag")
    )
