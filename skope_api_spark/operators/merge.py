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
    marks the current version); ``updates`` carries one new version per
    key (same attribute columns as ``base`` minus the validity pair, plus
    ``effective_col``).

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
