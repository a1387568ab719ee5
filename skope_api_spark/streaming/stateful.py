"""Custom stateful streaming operator: per-key running anomaly detection.

``applyInPandasWithState`` is the Spark surface for operators whose state
is not expressible as a built-in windowed aggregate. This one keeps a
Welford accumulator (count, mean, M2) per user and flags events deviating
more than ``k·σ`` from the mean of all PRIOR events (exclusive expanding
window) — the semantics are row-sequential inside each key, so results are
identical regardless of how the stream is chopped into micro-batches
(state carries across batches; the test proves stream ≡ batch).

State size is 3 doubles per key — O(active users), watermark-free safe.
The batch equivalent (for verification and backfills) is an exclusive
expanding window: ``avg/stddev_pop over rowsBetween(unboundedPreceding,
-1)``.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("n_prior", LongType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ]
)

MIN_PRIOR = 5
K_SIGMA = 3.0


def _track(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
    out_rows: list[dict] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for _, row in pdf.iterrows():
            v = float(row["value"])
            sigma = math.sqrt(m2 / n) if n > 0 else 0.0
            out_rows.append(
                {
                    "user_id": user_id,
                    "event_id": int(row["event_id"]),
                    "ts": row["ts"],
                    "value": v,
                    "n_prior": n,
                    "is_anomaly": bool(
                        n >= MIN_PRIOR and sigma > 0 and abs(v - mean) > K_SIGMA * sigma
                    ),
                }
            )
            # Welford update AFTER flagging: the event never scores itself
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
    state.update((n, mean, m2))
    yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def running_anomalies_stream(events: DataFrame) -> DataFrame:
    """Streaming form: state persists across micro-batches."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_anomalies_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent via exclusive expanding window — used to verify the
    stateful operator and for backfills (all JVM-native)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    n_prior = F.count("value").over(w)
    mean = F.avg("value").over(w)
    sigma = F.stddev_pop("value").over(w)
    return events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.coalesce(n_prior, F.lit(0)).alias("n_prior"),
        F.coalesce(
            (n_prior >= MIN_PRIOR)
            & (sigma > 0)
            & (F.abs(F.col("value") - mean) > K_SIGMA * sigma),
            F.lit(False),
        ).alias("is_anomaly"),
    )


# --- transformWithStateInPandas (Spark 4 arbitrary-state API) -----------------
#
# The successor to applyInPandasWithState: typed state handles
# (Value/List/Map), timers, TTL, and initial-state seeding, with the same
# Arrow-batched pandas surface. The operator below is the canonical
# "running per-key totals" shape — ValueState carrying (n, total) across
# micro-batches — with a JVM-native batch twin for parity proofs and
# backfills.

TOTALS_OUTPUT = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"


class RunningTotalsProcessor(StatefulProcessor):
    """StatefulProcessor keeping (n_events, total_value) per user.

    Update mode emits one refreshed row per key per micro-batch — the
    dashboard-feed shape.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", "n BIGINT, total DOUBLE")

    def handleInputRows(self, key, rows, timerValues):
        n, total = (
            tuple(self._state.get()) if self._state.exists() else (0, 0.0)
        )
        for pdf in rows:
            n += int(len(pdf))
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "n_events": [n],
                "total_value": [total],
            }
        )

    def close(self) -> None:
        pass


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) via ``transformWithStateInPandas``.

    State is 1 long + 1 double per user — O(active users); Update output
    mode re-emits a key's row only in batches where it received events.

    Preconditions, both checked here with clear errors instead of the
    opaque crashes they otherwise cause (NOT silently fixed — mutating
    the shared session conf would change the state-store provider under
    every OTHER streaming query started later, breaking their
    checkpointed state formats):

    - RocksDB state store: transformWithState does not support the
      default HDFS-backed provider. Set
      ``spark.sql.streaming.stateStore.providerClass`` to
      ``...state.RocksDBStateStoreProvider`` before starting the query.
    - ``google.protobuf`` installed: the API's state-server protocol is
      protobuf-based (this sandbox lacks it — the driver worker dies
      with 'worker exited unexpectedly').

    ``applyInPandasWithState`` (``running_anomalies_stream``) remains the
    dependency-free stateful path.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the google.protobuf "
            "package (its state-server protocol is protobuf-based); "
            "install protobuf or use the applyInPandasWithState operators"
        ) from e
    provider = events.sparkSession.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    if "RocksDB" not in (provider or ""):
        raise RuntimeError(
            "transformWithStateInPandas requires the RocksDB state store; "
            "set spark.sql.streaming.stateStore.providerClass to "
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider on the session before starting "
            "this query (not set globally here — it would change the "
            "provider under other queries' checkpoints)"
        )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=TOTALS_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin: one partial-aggregated groupBy (verification/backfill)."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


# --- streaming funnel ----------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", LongType()),
        StructField("ts_reached", TimestampType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("stage", LongType()),
        StructField("last_ts", DoubleType()),  # epoch seconds of last match
    ]
)

FUNNEL_STEPS = ("click", "view", "purchase")


def _advance_funnel(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Greedy ordered funnel per user: step i+1 matches the first event of
    its type strictly after the matched step-i timestamp. Row-sequential
    inside the key in (ts, event_id) order, so — for in-event-time-order
    arrival (the watermark contract) — results are identical however the
    stream is chopped into micro-batches. Emits one row per stage
    ADVANCE (not per event), carrying the reaching timestamp."""
    (user_id,) = key
    stage, last_ts = state.get if state.exists else (0, float("-inf"))
    out_rows: list[dict] = []
    # a key's events can span MULTIPLE Arrow chunks within one micro-batch
    # (maxRecordsPerBatch) with no cross-chunk ordering — sorting each
    # chunk independently would process events out of global event-time
    # order and silently miss stage advances; concat THEN sort
    chunks = list(pdfs)
    if not chunks:
        state.update((stage, last_ts))
        yield pd.DataFrame(
            [], columns=[f.name for f in FUNNEL_OUTPUT_SCHEMA]
        )
        return
    pdf = pd.concat(chunks, ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"])
    for row in pdf.itertuples(index=False):
        if stage >= len(FUNNEL_STEPS):
            break
        ts = row.ts
        epoch = ts.timestamp()
        if row.event_type == FUNNEL_STEPS[stage] and epoch > last_ts:
            stage += 1
            last_ts = epoch
            out_rows.append(
                {"user_id": user_id, "stage": stage, "ts_reached": ts}
            )
    state.update((stage, last_ts))
    yield pd.DataFrame(out_rows, columns=[f.name for f in FUNNEL_OUTPUT_SCHEMA])


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming funnel over (user_id, event_type, ts, event_id).

    Projects to the four consumed columns BEFORE the group shuffle so a
    wide event schema is neither shuffled nor Arrow-serialized."""
    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _advance_funnel,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def funnel_batch_stages(events: DataFrame) -> DataFrame:
    """Batch equivalent: operators.funnel.funnel_stages reshaped to the
    same (user_id, stage, ts_reached) advance-event form."""
    from pyspark.sql import functions as F

    from skope_api_spark.operators.funnel import funnel_stages

    st = funnel_stages(events, list(FUNNEL_STEPS))
    parts = [
        st.where(F.col(f"ts_{i}").isNotNull()).select(
            "user_id",
            F.lit(i).cast("long").alias("stage"),
            F.col(f"ts_{i}").alias("ts_reached"),
        )
        for i in range(1, len(FUNNEL_STEPS) + 1)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- online Holt smoothing (per-key level/trend state) ------------------------
#
# The streaming twin of operators/forecast.py:holt_forecast. State is two
# doubles + a count per key; each arriving observation advances the
# recurrence and emits the refreshed (level, trend, one-step forecast) —
# the live-forecast dashboard shape. Chopping the stream into micro-batches
# cannot change results (the recurrence is sequential per key and state
# carries across batches); the parity test proves the final state equals
# the JVM F.aggregate fold bit-for-bit, a genuine two-implementation check.
#
# Ordering contract: within a key, observations must arrive time-ordered
# across micro-batches (each batch is sorted here; cross-batch disorder is
# the caller's watermark/replay discipline — same contract as _track).

HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("order_key", LongType()),
        StructField("value", DoubleType()),
        StructField("n_points", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast_1", DoubleType()),
    ]
)

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
    ]
)

HOLT_ALPHA = 0.4
HOLT_BETA = 0.2


def _holt_track(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
    (user_id,) = key
    n, level, trend = state.get if state.exists else (0, 0.0, 0.0)
    out: list[dict] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("order_key")
        for _, row in pdf.iterrows():
            v = float(row["value"])
            if n == 0:
                level, trend = v, 0.0
            else:
                new_level = HOLT_ALPHA * v + (1.0 - HOLT_ALPHA) * (
                    level + trend
                )
                trend = (
                    HOLT_BETA * (new_level - level)
                    + (1.0 - HOLT_BETA) * trend
                )
                level = new_level
            n += 1
            out.append(
                {
                    "user_id": user_id,
                    "order_key": int(row["order_key"]),
                    "value": v,
                    "n_points": n,
                    "level": level,
                    "trend": trend,
                    "forecast_1": level + trend,
                }
            )
    state.update((n, level, trend))
    yield pd.DataFrame(
        out, columns=[f.name for f in HOLT_OUTPUT_SCHEMA.fields]
    )


def holt_stream(observations: DataFrame) -> DataFrame:
    """Streaming per-key Holt smoothing: input (user_id, order_key,
    value); emits every observation with its refreshed level/trend and
    one-step forecast."""
    return (
        observations.select("user_id", "order_key", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _holt_track,
            outputStructType=HOLT_OUTPUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
