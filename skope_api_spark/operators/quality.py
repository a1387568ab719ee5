"""Data-quality constraint checking — the deequ-style single-pass audit.

A production pipeline gates every ingest on a constraint report:
row-count floors, key uniqueness, completeness (non-null fraction),
value ranges. The scale-relevant property is that ALL constraints are
verified in ONE aggregation pass over the table (every check is an
algebraic aggregate with map-side partials), then reshaped to a narrow
(constraint, observed, passed) report — never one job per check.

Uniqueness uses count vs count(distinct); for approximate gating at
extreme scale swap in approx_count_distinct or the KMV sketch
(operators/sketches.py) — the report shape is unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    constraints: Sequence[tuple[str, Column, Column]],
) -> DataFrame:
    """One-pass constraint audit.

    ``constraints``: (name, observed_aggregate, passed_predicate) where
    ``passed_predicate`` is an expression over the SAME aggregation row
    (reference observed aggregates by their alias via F.col).

    Returns (constraint, observed double, passed boolean), one row per
    constraint, in the given order — computed from a single groupBy().agg.
    """
    if not constraints:
        raise ValueError("constraints must be non-empty")
    names = [name for name, _, _ in constraints]
    if len(set(names)) != len(names):
        raise ValueError("constraint names must be unique")
    agg_row = df.agg(
        *[obs.cast("double").alias(name) for name, obs, _ in constraints]
    )
    report = agg_row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint"),
                        F.col(name).alias("observed"),
                        passed.alias("passed"),
                    )
                    for name, _, passed in constraints
                ]
            )
        ).alias("c")
    )
    return report.select("c.constraint", "c.observed", "c.passed")
