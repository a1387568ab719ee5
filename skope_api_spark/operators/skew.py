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
