"""Skew-safe aggregation: salted two-phase group-by.

When a handful of keys carry most rows (power-law event types, null-heavy
join keys), a plain groupBy funnels each hot key through one reducer.
Salting splits every key into ``n_salts`` sub-keys for the partial phase,
so the hot key's rows spread across ``n_salts`` reducers, then a second
(tiny) aggregation merges the partials. Only re-aggregatable measures
(sum/count/min/max) qualify — avg must be derived as sum/count after the
merge.

(AQE's skew-join splitting handles skewed JOINS automatically; salting is
the analogous manual tool for skewed AGGREGATIONS, and also the fallback
when AQE is unavailable.)

The salt must be deterministic for reproducible results: derived by
hashing a high-cardinality column, never ``rand()``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    *,
    salt_source: Column,
    n_salts: int = 16,
    sums: Sequence[str] = (),
    counts: bool = True,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    Phase 1 groups by (*keys, salt) — hot keys fan across ``n_salts``
    reducers; phase 2 merges partials per key. Returns one row per key
    with ``n`` (if ``counts``) and ``sum_<col>`` per entry in ``sums``.
    """
    salt = F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).alias("__salt")
    phase1_aggs = []
    if counts:
        phase1_aggs.append(F.count(F.lit(1)).alias("__n"))
    for c in sums:
        phase1_aggs.append(F.sum(c).alias(f"__sum_{c}"))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_aggs)

    phase2_aggs = []
    if counts:
        phase2_aggs.append(F.sum("__n").alias("n"))
    for c in sums:
        phase2_aggs.append(F.sum(f"__sum_{c}").alias(f"sum_{c}"))
    return partial.groupBy(*keys).agg(*phase2_aggs)


def detect_hot_keys(
    df: DataFrame,
    keys: Sequence[str],
    *,
    min_share: float = 0.01,
    target_partitions: int | None = None,
    max_keys: int = 100,
) -> DataFrame:
    """Frequency profile of the heaviest keys — the measurement step that
    decides whether ``salted_agg`` (or AQE skew handling) is needed, and
    with how many salts.

    ONE partial-aggregated groupBy over the keys — the 1-row total is
    derived from the counts aggregate (one row per distinct key), never
    a second scan of ``df`` — then a broadcast back over the counts; no
    driver-side collect, the report is a lazy DataFrame. For a 100 TB
    table the single scan is column-pruned to ``keys`` and the shuffle
    carries one row per distinct key.

    Returns ``(*keys, n_rows, share, suggested_salt)`` for keys whose row
    share is ≥ ``min_share``, heaviest first, capped at ``max_keys``
    (TakeOrderedAndProject — no global sort). ``suggested_salt`` is the
    salt count that spreads the key to roughly one average reducer's load:
    ``ceil(share * target_partitions)`` (defaults to the session's
    ``spark.sql.shuffle.partitions``), floored at 1; an empty result means
    no key crosses the threshold and plain aggregation is fine.
    """
    if not (0.0 < min_share <= 1.0):
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    if target_partitions is None:
        target_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "share", F.col("n_rows") / F.col("__total")
        )
        .where(F.col("share") >= min_share)
        .withColumn(
            "suggested_salt",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("share") * target_partitions),
            ).cast("int"),
        )
        .drop("__total")
        .orderBy(F.desc("n_rows"), *keys)
        .limit(max_keys)
    )
