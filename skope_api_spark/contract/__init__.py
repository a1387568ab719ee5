"""Driver-contract query registry.

Every implemented operator from SURVEY.md §2 (plus the large-scale pipeline
extensions) registers here as a named query over the TESTDATA tables, with —
whenever SQL-expressible — an equivalent DuckDB oracle. ``__spark_entry__.py``
re-exports the merged registry.
"""

from __future__ import annotations

from skope_api_spark.contract.registry import ORACLES, QUERIES


def _load_all() -> None:
    # Import for registration side effects.
    from skope_api_spark.contract import (  # noqa: F401
        dedup,
        extensions,
        relational,
        scalars2,
        similarity,
        skope,
        text,
        windows,
    )


_load_all()

__all__ = ["QUERIES", "ORACLES"]
