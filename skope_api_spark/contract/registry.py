"""Registration plumbing for the driver contract.

Usage in a theme module::

    @query("q1_pricing_summary", oracle=\"\"\"SELECT ...\"\"\")
    def q1(spark, sf_dir) -> DataFrame: ...

Rules enforced by convention (see tests/test_contract.py):
- every computed column is aliased identically in the Spark plan and the
  oracle SQL (the driver sorts columns by name before hashing);
- order-dependent float aggregates (sum/avg/stddev over doubles) are rounded
  in BOTH plans (same decimals) so cross-engine accumulation-order noise
  cannot flip the value hash;
- counts are cast to BIGINT on the DuckDB side (DuckDB widens integer sums
  to HUGEINT, which Spark has no analogue for).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def register(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate contract query {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return register
