"""Mutation-style table maintenance expressed as pure DataFrame plans.

Spark has no in-place UPDATE; the lakehouse pattern (Delta/Iceberg MERGE)
rewrites the affected files from a declarative plan. ``scd2_merge`` is
that plan for the most common warehouse mutation — a slowly-changing-
dimension type-2 upsert: closing out the current version of every changed
key and appending the new version, preserving full history.

Scale shape: the updates batch is change-data-capture-sized (≪ the
dimension), so both joins (the inner close-out and the anti pass-through)
broadcast the updates side under AQE; the dimension table itself never
shuffles, and the three branches are a union of narrow transformations —
exactly the shape a MERGE compiles to before file rewrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    *,
    key_cols: Sequence[str],
    effective_col: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """SCD type-2 upsert: ``base`` is the history table (``valid_to`` NULL
    marks the current version); ``updates`` carries AT MOST ONE new
    version per key (same attribute columns as ``base`` minus the
    validity pair, plus ``effective_col``) — multi-version batches must
    be collapsed to the latest per key upstream, or the close-out join
    duplicates the closed row. Keys absent from ``base`` insert cleanly
    (close-out matches nothing, the new version opens).

    Emits three branches:

    - historical rows (``valid_to`` already set) — untouched;
    - current rows of updated keys — closed out at the effective date;
    - the new versions — opened at the effective date, ``valid_to`` NULL;
    - current rows of un-updated keys — untouched.

    Returns the new history table (same schema as ``base``).
    """
    keys = list(key_cols)
    upd_keys = updates.select(*keys, F.col(effective_col).alias("__eff"))

    historical = base.where(F.col(valid_to).isNotNull())
    current = base.where(F.col(valid_to).isNull())
    closed = (
        current.join(upd_keys, keys)
        .withColumn(valid_to, F.col("__eff"))
        .drop("__eff")
    )
    passthrough = current.join(upd_keys.select(*keys), keys, "left_anti")
    opened = (
        updates.withColumn(valid_from, F.col(effective_col))
        .withColumn(valid_to, F.lit(None).cast("date"))
        .drop(effective_col)
    )
    out_cols = base.columns
    return (
        historical.select(*out_cols)
        .unionByName(closed.select(*out_cols))
        .unionByName(passthrough.select(*out_cols))
        .unionByName(opened.select(*out_cols))
    )


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (temporal) join: each fact row picks the dimension
    VERSION that was valid at the fact's timestamp — the feature-store /
    audit-correct way to join facts to an SCD2 history (never leak a
    future version into a past fact).

    Scale shape: the join condition leads with the key equi-predicate, so
    Catalyst plans a plain hash join on the keys (shuffled or broadcast
    by AQE) and the validity range is a RESIDUAL filter on matched rows —
    never a nested-loop range join. Because SCD2 histories are
    non-overlapping per key, each fact matches at most one version, so
    no post-join dedup is needed.
    """
    if not key_cols:
        raise ValueError("point_in_time_join requires at least one key column")
    cond = None
    for k in key_cols:
        c = facts[k] == dim_history[k]
        cond = c if cond is None else cond & c
    cond = (
        cond
        & (facts[ts_col] >= dim_history[valid_from])
        & (
            dim_history[valid_to].isNull()
            | (facts[ts_col] < dim_history[valid_to])
        )
    )
    return facts.join(dim_history, cond, how)


def incremental_rollup(
    base_agg: DataFrame,
    delta: DataFrame,
    *,
    keys: Sequence[str],
    count_col: str = "n",
    sum_cols: Sequence[tuple[str, str]] = (),
) -> DataFrame:
    """Materialized-view incremental refresh for distributive aggregates
    (COUNT / SUM — the rollups that merge without re-reading history):
    aggregate ONLY the delta batch, union it with the existing aggregate
    table, and re-reduce. The refresh cost is O(delta + |groups|),
    independent of the fact-table history — the whole point of keeping a
    rollup MV at 100 TB.

    ``base_agg`` carries (keys..., count_col, *sum names); ``delta`` is
    raw fact rows; ``sum_cols`` maps (output_sum_name, fact_value_col).
    AVG/stddev refresh the same way from (count, sum, sum_sq) parts;
    non-distributive aggregates (exact median, distinct) need their own
    mergeable sketch (see operators/sketches.py).
    """
    d_agg = delta.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias(count_col),
        *[F.sum(src).alias(out) for out, src in sum_cols],
    )
    merged = base_agg.select(
        *keys, count_col, *[out for out, _ in sum_cols]
    ).unionByName(d_agg)
    return merged.groupBy(*keys).agg(
        F.sum(count_col).cast("long").alias(count_col),
        *[F.sum(out).alias(out) for out, _ in sum_cols],
    )


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    *,
    key_cols: Sequence[str],
    seq_col: str,
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
) -> DataFrame:
    """Apply a CDC change batch (I/U/D rows) to a snapshot — the plain
    "latest state" MERGE (SCD type 1), complementing the history-keeping
    ``scd2_merge``.

    - latest change per key: ONE aggregation taking the lexicographic
      max of struct(seq, op, payload...) — seq decides (callers must
      make it unique per key, e.g. a log offset; the struct tail makes
      any residual tie deterministic), partial-agg friendly, no window
      sort;
    - keys whose latest op is 'D' are dropped; other latest payloads
      win over the base row (U) or create it (I);
    - unchanged base rows pass through via a key anti-join.

    All joins are key-partitioned hash joins; the change batch never
    forces a base-table rewrite beyond the affected keys' partitions —
    the lakehouse MERGE shape before file rewrite.
    """
    keys = list(key_cols)
    payloads = list(payload_cols)
    latest = changes.groupBy(*keys).agg(
        F.max(F.struct(seq_col, op_col, *payloads)).alias("__c")
    )
    survivors = latest.where(F.col(f"__c.{op_col}") != "D").select(
        *keys, *[F.col(f"__c.{p}").alias(p) for p in payloads]
    )
    # latest already holds exactly the distinct changed keys — reusing it
    # avoids a second full scan+shuffle of the change batch
    changed_keys = latest.select(*keys)
    kept = base.join(changed_keys, keys, "left_anti").select(*keys, *payloads)
    return kept.unionByName(survivors)
