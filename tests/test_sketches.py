"""Count-Min Sketch invariants: never underestimates, bounded table
size, exact on collision-free inputs."""

from __future__ import annotations

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
