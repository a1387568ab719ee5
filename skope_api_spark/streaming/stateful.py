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
