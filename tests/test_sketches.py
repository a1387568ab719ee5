"""Count-Min Sketch invariants: never underestimates, bounded table
size, exact on collision-free inputs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from skope_api_spark.operators.sketches import cms_build, cms_estimate


def _toks(spark, tokens):
    return spark.createDataFrame([(t,) for t in tokens], "tok string")


class TestCountMinSketch:
    def test_never_underestimates_even_tiny_width(self, spark):
        # width 4 forces collisions — estimates must still be >= exact
        tokens = [f"w{i % 7}" for i in range(100)]
        df = _toks(spark, tokens)
        cms = cms_build(df, width=4, depth=3)
        distinct = df.distinct()
        est = {
            r.tok: r.cms_count
            for r in cms_estimate(cms, distinct, width=4, depth=3).collect()
        }
        exact = {
            r.tok: r.n
            for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert set(est) == set(exact)
        for tok, n in exact.items():
            assert est[tok] >= n

    def test_sketch_table_is_bounded(self, spark):
        df = _toks(spark, [f"t{i}" for i in range(500)])
        cms = cms_build(df, width=16, depth=4)
        assert cms.count() <= 16 * 4

    def test_exact_when_width_ample(self, spark):
        df = _toks(spark, ["a"] * 5 + ["b"] * 3 + ["c"] * 1)
        cms = cms_build(df, width=4096, depth=4)
        est = {
            r.tok: r.cms_count
            for r in cms_estimate(cms, df.distinct(), width=4096, depth=4).collect()
        }
        assert est == {"a": 5, "b": 3, "c": 1}

    def test_unseen_token_estimate_is_collision_noise(self, spark):
        df = _toks(spark, ["a"] * 10)
        cms = cms_build(df, width=4096, depth=4)
        est = cms_estimate(
            cms, _toks(spark, ["never-seen"]), width=4096, depth=4
        ).collect()
        assert est[0].cms_count >= 0  # left-join coalesce, no null


class TestKMVOverlap:
    def test_disjoint_and_identical_sets(self, spark):
        from skope_api_spark.operators.sketches import (
            kmv_bottomk,
            kmv_overlap,
        )

        a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "v string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "v string")
        ska, skb = kmv_bottomk(a, "v", k=32), kmv_bottomk(b, "v", k=32)
        r = kmv_overlap(ska, skb, k=32).collect()[0]
        assert r["jaccard_estimate"] == 0.0
        assert r["intersection_estimate"] == 0
        assert 500 <= r["union_estimate"] <= 2000  # ~1000, k=32 is coarse
        # identical sets: jaccard 1, union ~|A|
        r2 = kmv_overlap(ska, ska, k=32).collect()[0]
        assert r2["jaccard_estimate"] == 1.0
        assert r2["intersection_estimate"] == r2["union_estimate"]

    def test_small_sets_fall_back_to_exact(self, spark):
        from skope_api_spark.operators.sketches import (
            kmv_bottomk,
            kmv_overlap,
        )

        a = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
        b = spark.createDataFrame([("y",), ("z",), ("w",)], "v string")
        r = kmv_overlap(
            kmv_bottomk(a, "v", k=64), kmv_bottomk(b, "v", k=64), k=64
        ).collect()[0]
        # under k values: counts are exact, jaccard = 2/4
        assert r["union_estimate"] == 4
        assert r["jaccard_estimate"] == pytest.approx(0.5)
        assert r["intersection_estimate"] == 2
        import pytest as _pt

        with _pt.raises(ValueError, match="k must"):
            kmv_bottomk(a, "v", k=1)
