"""Bucketed-table co-located joins: the write-once shuffle actually
removes the join-time Exchange, results stay identical, and layout drift
is caught."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skope_api_spark.sources.bucketed import (
    assert_no_shuffle_join,
    colocated_join,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    from skope_api_spark.tables import load

    li = load(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice", "o_orderdate"
    )
    write_bucketed(
        li, "bkt_lineitem", bucket_cols=["l_orderkey"], n_buckets=4,
        sort_cols=["l_orderkey"],
    )
    write_bucketed(
        o, "bkt_orders", bucket_cols=["l_orderkey"], n_buckets=4,
        sort_cols=["l_orderkey"],
    )
    return li, o


@pytest.fixture()
def no_broadcast(spark):
    """Force the shuffle-join regime (the one bucketing exists for)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    if old_aqe is None:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    else:
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
        )


class TestBucketedJoin:
    def test_join_plans_without_exchange(
        self, spark, bucketed_tables, no_broadcast
    ):
        j = colocated_join(spark, "bkt_lineitem", "bkt_orders", ["l_orderkey"])
        assert_no_shuffle_join(j)  # would raise on any hash re-partition
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan

    def test_results_match_unbucketed_join(
        self, spark, bucketed_tables, no_broadcast
    ):
        li, o = bucketed_tables
        expected = sorted(
            (r.l_orderkey, round(r.s, 2))
            for r in li.join(o, "l_orderkey")
            .groupBy("l_orderkey")
            .agg(F.sum("l_extendedprice").alias("s"))
            .collect()
        )
        got = sorted(
            (r.l_orderkey, round(r.s, 2))
            for r in colocated_join(
                spark, "bkt_lineitem", "bkt_orders", ["l_orderkey"]
            )
            .groupBy("l_orderkey")
            .agg(F.sum("l_extendedprice").alias("s"))
            .collect()
        )
        assert got == expected and len(got) > 0

    def test_groupby_on_bucket_key_needs_no_shuffle(
        self, spark, bucketed_tables, no_broadcast
    ):
        """Bucketing helps aggregations too: a groupBy on the bucket key
        reuses the stored partitioning."""
        agg = spark.table("bkt_lineitem").groupBy("l_orderkey").agg(
            F.sum("l_extendedprice").alias("s")
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan

    def test_layout_drift_is_caught(self, spark, bucketed_tables, no_broadcast):
        """Joining a bucketed table against a plain (unbucketed) side
        re-shuffles — assert_no_shuffle_join flags it."""
        li, o = bucketed_tables
        drifted = spark.table("bkt_lineitem").join(o, "l_orderkey")
        with pytest.raises(AssertionError, match="re-shuffles"):
            assert_no_shuffle_join(drifted)

    def test_write_validation(self, spark, bucketed_tables):
        li, _ = bucketed_tables
        with pytest.raises(ValueError, match="n_buckets"):
            write_bucketed(li, "t", bucket_cols=["l_orderkey"], n_buckets=0)
        with pytest.raises(ValueError, match="bucket_cols"):
            write_bucketed(li, "t", bucket_cols=[], n_buckets=4)


class TestShuffleGuardScoping:
    def test_sibling_branch_exchange_does_not_false_alarm(
        self, spark, bucketed_tables, no_broadcast
    ):
        """A union whose OTHER branch aggregates (exchanging on a
        non-bucket key) must not trip the guard — only exchanges feeding
        a join count (the string-scoped guard misattributed these)."""
        join = colocated_join(
            spark, "bkt_lineitem", "bkt_orders", ["l_orderkey"]
        ).select(F.col("l_orderkey").cast("double").alias("out"))
        sibling = (
            spark.table("bkt_lineitem")
            .groupBy("l_extendedprice")  # non-bucket key -> real exchange
            .agg(F.count(F.lit(1)).cast("double").alias("n"))
            .select(F.col("n").alias("out"))
        )
        stacked = join.unionByName(sibling)
        plan = stacked._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan  # the sibling's exchange
        assert_no_shuffle_join(stacked)  # ...must not false-alarm

    def test_shuffled_join_still_caught_through_tree_walk(
        self, spark, no_broadcast
    ):
        a = spark.range(0, 5000).select(F.col("id").alias("k"))
        b = spark.range(0, 5000).select(F.col("id").alias("k"))
        with pytest.raises(AssertionError, match="re-shuffles"):
            assert_no_shuffle_join(a.join(b, "k"))
