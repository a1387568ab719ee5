"""Registry gate guard for the IEEE -0.0 class (registry.py round_nz rule).

A rounded near-zero double can land on either side of zero depending on
accumulation order, and ROUND() preserves the sign bit — so one engine
can emit -0.0 where the other emits 0.0: numerically equal (== passes)
but distinct under the driver's byte/string value hash. This cost the
round-7 driver gate its one red (`sim_embedding_covariance`). The rule:
no contract query may emit -0.0 from EITHER engine; normalize with
``round_nz`` (Spark) / ``(ROUND(x, n) + 0.0)`` (oracle).

This test enforces the rule over the 50-query driver gate at sf0.001 on
both engines (the full 256-query sweep runs in
scripts/check_correctness.py, which hard-fails on any -0.0 cell).
"""

from __future__ import annotations

import math
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _negzero_cells(rows) -> int:
    hits = 0
    for r in rows:
        for v in r:
            if isinstance(v, float):
                if v == 0 and math.copysign(1.0, v) < 0:
                    hits += 1
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if (
                        isinstance(x, float)
                        and x == 0
                        and math.copysign(1.0, x) < 0
                    ):
                        hits += 1
    return hits


def test_gate_queries_emit_no_negative_zero_on_either_engine(spark):
    import duckdb

    import __spark_entry__ as entry
    from skope_api_spark.contract import _GATE_PRIORITY

    qs, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    # the driver gate = the FIRST 50 unique names (first-occurrence-wins,
    # later duplicate mentions in the tuple are inert — see _reorder);
    # iterating the whole 100+-name tuple ran 2x the documented scope
    # (r17: the suite must fit the driver's verify budget, and the full
    # registry is already swept by scripts/check_correctness.py)
    gate = list(dict.fromkeys(_GATE_PRIORITY))[:50]
    offenders = []
    for name in gate:
        s_hits = _negzero_cells(tuple(r) for r in qs[name](spark, SF_DIR).collect())
        d_hits = (
            _negzero_cells(con.execute(oracles[name]).fetchall())
            if name in oracles
            else 0
        )
        if s_hits or d_hits:
            offenders.append((name, s_hits, d_hits))
    assert offenders == [], (
        f"gate queries emitting -0.0 (name, spark_cells, duck_cells): "
        f"{offenders} — apply the registry round_nz rule to both sides"
    )


def test_round_nz_normalizes_only_negative_zero(spark):
    from pyspark.sql import functions as F

    from skope_api_spark.contract.registry import round_nz

    df = spark.createDataFrame(
        [(-1e-9,), (1e-9,), (0.0,), (-0.0,), (-2.5,), (None,)],
        "x double",
    )
    rows = df.select(round_nz(F.col("x"), 6).alias("y")).collect()
    ys = [r["y"] for r in rows]
    assert ys[:5] == [0.0, 0.0, 0.0, 0.0, -2.5] and ys[5] is None
    # every zero (including the rounded tiny negatives) carries a
    # POSITIVE sign bit
    assert all(
        math.copysign(1.0, y) > 0 for y in ys[:4] if y is not None
    )
