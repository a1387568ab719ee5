"""As-of join unit tests (hand-computed golden + tie semantics)."""

from __future__ import annotations

from skope_api_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestAsofJoin:
    def test_backward_match_and_left_outer(self, spark):
        left = _df(
            spark,
            [("a", 10, "L1"), ("a", 20, "L2"), ("a", 5, "L0"), ("b", 7, "L3")],
            "k string, ts int, lv string",
        )
        right = _df(
            spark,
            [("a", 8, "R8"), ("a", 15, "R15"), ("c", 1, "RC")],
            "k string, ts int, rv string",
        )
        out = {
            r.lv: r.rv_m
            for r in asof_join(
                left, right, on=("k",), right_cols=("rv",), suffix="_m"
            ).collect()
        }
        assert out == {
            "L0": None,   # ts 5: nothing at or before
            "L1": "R8",   # ts 10: latest right <= 10 is 8
            "L2": "R15",  # ts 20: latest right <= 20 is 15
            "L3": None,   # key b: no right rows
        }

    def test_equal_timestamp_matches(self, spark):
        left = _df(spark, [("a", 10, "L")], "k string, ts int, lv string")
        right = _df(spark, [("a", 10, "R10")], "k string, ts int, rv string")
        out = asof_join(left, right, on=("k",), right_cols=("rv",)).collect()
        assert out[0].rv_matched == "R10"

    def test_single_shuffle_plan(self, spark):
        left = _df(spark, [("a", 10, "L")], "k string, ts int, lv string")
        right = _df(spark, [("a", 8, "R")], "k string, ts int, rv string")
        plan = (
            asof_join(left, right, on=("k",), right_cols=("rv",))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # union-merge shape: no join operator at all, one hash exchange
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") == 1


class TestDuplicateClusters:
    def test_chain_triangle_and_pair(self, spark):
        from skope_api_spark.operators.dedup import duplicate_clusters

        pairs = spark.createDataFrame(
            # chain 1-2-3-4 (tests multi-hop propagation), triangle 10-11-12,
            # isolated pair 20-21
            [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
            "doc_a long, doc_b long",
        )
        out = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


class TestForwardAsof:
    def test_forward_matches_earliest_following(self, spark):
        left = spark.createDataFrame(
            [("a", 10, "L1"), ("a", 16, "L2"), ("a", 99, "L3")],
            "k string, ts int, lv string",
        )
        right = spark.createDataFrame(
            [("a", 8, "R8"), ("a", 15, "R15"), ("a", 16, "R16")],
            "k string, ts int, rv string",
        )
        out = {
            r.lv: r.rv_m
            for r in asof_join(
                left, right, on=("k",), right_cols=("rv",), suffix="_m",
                direction="forward",
            ).collect()
        }
        assert out == {
            "L1": "R15",  # earliest right >= 10
            "L2": "R16",  # equal ts matches
            "L3": None,   # nothing follows
        }
