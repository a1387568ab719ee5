"""AQE skew-join evidence: a deliberately skewed join splits the hot
partition at runtime instead of stalling one task on it.

Complements ``operators/skew.py`` (deterministic salting for
AGGREGATIONS, where AQE has no skew rule): for shuffle JOINS the engine
position is to let AQE's skew-join optimization handle it — this test
pins that the mechanism actually engages on our session settings, so the
no-salting-for-joins design decision stays evidence-backed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_session(spark):
    """Thresholds lowered so the test-sized hot key qualifies as skewed
    (defaults target 256 MB partitions); restored after."""
    conf = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


class TestAQESkewJoin:
    def test_hot_key_join_is_split_and_correct(self, skew_session):
        spark = skew_session
        # 50k rows on ONE key + 5k spread over 500 keys vs a 501-key dim
        fact = spark.range(0, 55_000).select(
            F.when(F.col("id") < 50_000, F.lit(0))
            .otherwise((F.col("id") % 500) + 1)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
        )
        dim = spark.range(0, 501).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
        )
        joined = fact.join(dim, "k")
        # materialize THIS DataFrame (a derived .count() runs its own
        # QueryExecution and would leave joined's adaptive plan unbound)
        collected = joined.collect()
        from collections import Counter

        per_key = Counter(r.k for r in collected)
        assert per_key[0] == 50_000 and len(per_key) == 501

        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, f"skew join did not engage:\n{final[:2000]}"
        assert "skewed" in final  # AQEShuffleRead reports the skew split
