"""Streaming event operators: watermarked windows + native sessionization.

The reference is strictly batch (SURVEY.md §2.8); these are the engine
extensions a continuously-ingested event table needs. Every transformation
below is expressed so the SAME code runs in batch and streaming mode —
``F.window`` / ``F.session_window`` aggregations are mode-agnostic; only
the source (``read`` vs ``readStream``) and the sink differ.

Scale notes:
- watermarks bound state: late events beyond the watermark are dropped,
  so window state is O(active windows), not O(history);
- ``session_window`` is Spark's native gap-merging session operator —
  state per (user, open session), merged incrementally; the batch result
  equals the window-function sessionization in ``operators.windows``
  (oracle-checked by the ``sessionize_native_session_window`` contract
  query);
- ``availableNow`` triggers give incremental batch-over-stream execution
  (catch-up runs over a file-backed table) with exactly-once sink
  semantics via checkpoints.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(
    spark: SparkSession,
    source_dir: str,
    *,
    with_watermark: str | None = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of event parquet files (ns→µs ts
    conversion as in ``tables.load``). New files landing in the directory
    are picked up incrementally — the standard landing-zone ingestion
    shape. (The file source requires a DIRECTORY; point it at the landing
    zone, not a single file.)"""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(source_dir).schema  # streams must declare schema
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is not None:
        # bound each micro-batch to N files — lets watermark-gated state
        # (outer joins, timeouts) flush across batches in bounded drains
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(source_dir)
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # see tables.load: ntz→ltz round-trips through the session tz
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    if with_watermark:
        raw = raw.withWatermark("ts", with_watermark)
    return raw


def windowed_event_counts(
    events: DataFrame, *, window: str = "1 hour", by: str = "event_type"
) -> DataFrame:
    """Tumbling-window counts + value stats — the canonical streaming agg.

    Works identically on a batch DataFrame (window start/end become plain
    group keys).
    """
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col(by))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            by,
            "n_events",
            "sum_value",
        )
    )


def sessionized_events(
    events: DataFrame, *, gap: str = "30 minutes"
) -> DataFrame:
    """Native gap-based sessions via ``F.session_window`` (incremental
    merge state in streaming; equals the batch window-function
    sessionization in results)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


def dedup_events_within_watermark(
    events: DataFrame, *, keys: Sequence[str] = ("event_id",)
) -> DataFrame:
    """Streaming exact dedup: drop repeated ``keys`` arrivals, with state
    bounded by the watermark (``dropDuplicatesWithinWatermark``) — the
    streaming form of the batch exact-dedup operator. An at-least-once
    upstream (replayed files, retried producers) becomes exactly-once per
    key within the watermark horizon; state is O(keys per horizon), not
    O(history).

    Falls back to plain ``dropDuplicates`` on batch DataFrames (no
    watermark concept), so the same call works in both modes.
    """
    if events.isStreaming:
        return events.dropDuplicatesWithinWatermark(list(keys))
    return events.dropDuplicates(list(keys))


def run_available_now(
    stream_df: DataFrame,
    *,
    query_name: str,
    checkpoint: str,
    output_mode: str = "append",
) -> None:
    """Drain everything currently available into a memory sink and stop —
    the incremental catch-up execution used by tests and backfills.

    ``output_mode`` defaults to ``append``, the mode watermarked pipelines
    use in production (state is dropped once the watermark passes; final
    results only). Pass ``"complete"`` explicitly for unwatermarked
    aggregations — noting that complete mode retains ALL aggregation state,
    so it is a dev/test convenience, never the scale path."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def click_purchase_stream_join(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding ``within`` window.

    The time-bound condition (purchase_ts in [click_ts, click_ts+within])
    is what makes the join runnable on two UNBOUNDED streams: with
    watermarks on both sides, Spark derives how long a click must be
    held in state before no future purchase can match it, and expires it
    — state is O(events in the window), not O(history). Mode-agnostic:
    the same function on two batch DataFrames returns the identical
    result through a plain range join (tests assert parity).

    Inputs are raw event streams/frames (``ts``/``user_id``/``event_id``
    columns, e.g. from ``stream_events``): clicks/purchases are filtered
    here so both sides inherit the source's watermark.
    """
    c = clicks.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {within}")
        )
    )
    # left_outer: unmatched clicks emit once the watermark proves no
    # future purchase can join them (Spark holds the click in state until
    # click_ts + within < watermark, then emits the NULL-padded row) —
    # the streaming shape of "clicks that never converted". Requires the
    # watermark the raw stream already carries.
    return c.join(p, cond, how).select(
        # equal on matches; the click side survives NULL-padded outer rows
        F.coalesce("purchase_user", "click_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )
