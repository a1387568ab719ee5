"""Event-sequence analytics: funnel conversion and cohort retention.

The two workhorse product-analytics queries over an event stream — both
pure DataFrame aggregation shapes that survive arbitrary scale:

- **funnel**: how far does each user get through an ordered step list
  (click -> view -> purchase), where later steps must happen strictly
  AFTER the matched earlier step? Greedy matching (earliest qualifying
  timestamp per step) is optimal for subsequence existence, so the plan
  is one conditional aggregation per step plus a co-partitioned join
  back on the user key — k steps = k passes over the (user, step)
  aggregate, never over raw history more than once per step.

- **cohort retention**: bucket users by first-activity period (their
  cohort), then count who returns n periods later. Two aggregations and
  one join, all on the user key.

Both results are deterministic (min timestamps, counts) — no window
ordering ties to manage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel depth: (user_id, stage, ts_step1..ts_stepK).

    ``stage`` = number of steps completed in order (0..K); step i+1
    matches the EARLIEST event of its type strictly after the matched
    step-i timestamp (greedy — optimal for existence).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    # stage 1: earliest occurrence of the first step per user
    cur = events.where(F.col(type_col) == steps[0]).groupBy(
        F.col(user_col).alias("user_id")
    ).agg(F.min(ts_col).alias("ts_1"))
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == step)
            .select(F.col(user_col).alias("user_id"), F.col(ts_col))
            .join(cur.select("user_id", f"ts_{i - 1}"), "user_id")
            .where(F.col(ts_col) > F.col(f"ts_{i - 1}"))
            .groupBy("user_id")
            .agg(F.min(ts_col).alias(f"ts_{i}"))
        )
        cur = cur.join(nxt, "user_id", "left")
    stage = None
    for i in range(len(steps), 0, -1):
        cond = F.col(f"ts_{i}").isNotNull()
        stage = (
            F.when(cond, F.lit(i)) if stage is None else stage.when(cond, i)
        )
    stage = stage.otherwise(F.lit(0))
    return cur.select(
        "user_id",
        stage.cast("int").alias("stage"),
        *[f"ts_{i}" for i in range(1, len(steps) + 1)],
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention counts: (cohort, period_n, n_users).

    ``cohort`` = the user's first active period (date_trunc); a user
    counts in (cohort, n) if they have ANY event n periods after their
    cohort period. period_n = 0 is the cohort size.
    """
    firsts = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort")
    )
    active = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.date_trunc(period, F.col(ts_col)).alias("p"),
        )
        .distinct()
        .join(firsts, "user_id")
    )
    # period distance in whole periods; weeks are fixed-width so integer
    # day arithmetic is exact (months would need months_between)
    widths = {"week": 7, "day": 1}
    if period not in widths:
        raise ValueError(
            f"period must be one of {sorted(widths)} (fixed-width day "
            f"arithmetic); got {period!r}"
        )
    days = widths[period]
    n = (F.datediff(F.col("p"), F.col("cohort")) / days).cast("int")
    return (
        active.select("cohort", n.alias("period_n"), "user_id")
        .groupBy("cohort", "period_n")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def session_paths(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_cols: Sequence[str] = ("ts", "event_id"),
    gap: str = "30 minutes",
    top_k: int = 20,
    max_path_events: int | None = None,
) -> DataFrame:
    """Top-k most frequent session paths (the "user journey" report).

    Sessionizes with the shared gap rule (operators/windows.py:
    sessionize — one window pass), reconstructs each session's ordered
    event-type sequence with ``array_sort(collect_list(struct(...)))``
    (collect_list order is NOT deterministic in a distributed shuffle;
    the sort key is the total order ``order_cols``), joins it to a
    ``'>'``-delimited path string, and counts paths. Returns
    (path, n_sessions) as TakeOrderedAndProject top-k, count-desc with a
    lexicographic tie-break.

    Per-session state is bounded by session length (the operator's
    inherent cost); ``max_path_events`` truncates pathological sessions
    (bot traffic) with an explicit ``...`` suffix marker rather than
    silently dropping them.
    """
    from skope_api_spark.operators.windows import sessionize

    sess = sessionize(
        events,
        ts_col=ts_col,
        order_by=tuple(order_cols),
        partition_by=(user_col,),
        gap=gap,
        out_col="__sid",
    )
    key = F.struct(*[F.col(c) for c in order_cols], F.col(type_col))
    seq = (
        sess.groupBy(user_col, "__sid")
        .agg(F.array_sort(F.collect_list(key)).alias("__seq"))
        .select(
            F.transform("__seq", lambda s: s[type_col]).alias("__types")
        )
    )
    if max_path_events is not None:
        if max_path_events < 1:
            raise ValueError("max_path_events must be >= 1")
        truncated = F.size("__types") > max_path_events
        seq = seq.select(
            F.when(
                truncated,
                F.concat(
                    F.slice("__types", 1, max_path_events),
                    F.array(F.lit("...")),
                ),
            )
            .otherwise(F.col("__types"))
            .alias("__types")
        )
    paths = seq.select(F.array_join("__types", ">").alias("path"))
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(top_k)
    )


def rfm_segments(
    orders: DataFrame,
    *,
    customer_col: str,
    date_col: str,
    amount_col: str,
    tick_scale: int = 10000,
) -> DataFrame:
    """RFM segmentation: per-customer Recency / Frequency / Monetary
    quartile scores (1 = lowest quartile of each metric, 4 = highest).

    Engine-build-proof by construction (VERDICT r8 #1): every scored
    metric is a BIGINT — recency as epoch-day of the last order,
    frequency as a count, monetary as the exact money-ticks sum
    (``round(amount · tick_scale)`` per row, long addition; the contract
    registry's ``money_ticks`` rule) — and the quartile comparisons
    never touch a float. Thresholds come from the distributed
    ``exact_quantile_brackets`` (stats.py): each quartile k/4 is carried
    as its bracketing values (vlo, vhi) plus the rank remainder, and
    ``x > quantile`` is evaluated by integer cross-multiplication
    ``4·x > 4·vlo + rem·(vhi − vlo)`` — no interpolated double, no
    ROUND boundary for a last-ulp engine difference to flip.

    Plan: ONE aggregation to the per-customer table, three distributed
    bracket computations over it (broadcast, 3 rows each), an in-scan
    integer fold assigns each score. Customer-table-sized work after
    the first aggregation; no ntile, no global sort.

    Returns (customer, recency_days, frequency, monetary_ticks,
    r_score, f_score, m_score, segment) where segment is "RFM" digits.
    """
    from skope_api_spark.operators.stats import exact_quantile_brackets

    per_cust = orders.groupBy(
        F.col(customer_col).alias("customer")
    ).agg(
        F.max(F.unix_date(F.to_date(date_col))).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.round(F.col(amount_col) * F.lit(tick_scale)).cast("long")
        ).alias("monetary_ticks"),
    )
    per_cust = per_cust.localCheckpoint(eager=True)  # 3 quantile passes + scoring

    def thresholds(col):
        br = exact_quantile_brackets(per_cust, col, [1, 2, 3], 4)
        return br.agg(
            F.array_sort(
                F.collect_list(F.struct("num", "vlo", "vhi", "rem"))
            ).alias(f"__t_{col}")
        )

    scored = (
        per_cust.crossJoin(F.broadcast(thresholds("recency_days")))
        .crossJoin(F.broadcast(thresholds("frequency")))
        .crossJoin(F.broadcast(thresholds("monetary_ticks")))
    )

    def score(col):
        return F.aggregate(
            F.col(f"__t_{col}"),
            F.lit(1),
            lambda acc, t: acc
            + F.when(
                F.col(col) * 4
                > t["vlo"] * 4 + t["rem"] * (t["vhi"] - t["vlo"]),
                1,
            ).otherwise(0),
        )

    return scored.select(
        "customer",
        "recency_days",
        "frequency",
        "monetary_ticks",
        score("recency_days").alias("r_score"),
        score("frequency").alias("f_score"),
        score("monetary_ticks").alias("m_score"),
        F.concat(
            score("recency_days").cast("string"),
            score("frequency").cast("string"),
            score("monetary_ticks").cast("string"),
        ).alias("segment"),
    )
