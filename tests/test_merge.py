"""SCD2 merge semantics: close-out, open, pass-through, history
preservation, and idempotence of re-merging a disjoint batch."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from skope_api_spark.operators.merge import scd2_merge


def _base(spark):
    return spark.createDataFrame(
        [
            # key 1: one closed historical version + a current one
            (1, "alice", 10.0, date(2020, 1, 1), date(2022, 1, 1)),
            (1, "alice", 20.0, date(2022, 1, 1), None),
            (2, "bob", 30.0, date(2020, 1, 1), None),
        ],
        "id long, name string, bal double, valid_from date, valid_to date",
    )


class TestScd2Merge:
    def test_close_open_passthrough(self, spark):
        updates = spark.createDataFrame(
            [(1, "alice", 25.0, date(2024, 6, 1))],
            "id long, name string, bal double, effective_date date",
        )
        out = scd2_merge(_base(spark), updates, key_cols=["id"]).collect()
        rows = {(r.id, str(r.valid_from)): r for r in out}
        assert len(out) == 4
        # historical row untouched
        assert rows[(1, "2020-01-01")].valid_to == date(2022, 1, 1)
        # current version of key 1 closed at the effective date
        closed = rows[(1, "2022-01-01")]
        assert closed.valid_to == date(2024, 6, 1) and closed.bal == 20.0
        # new version opened, current
        opened = rows[(1, "2024-06-01")]
        assert opened.valid_to is None and opened.bal == 25.0
        # untouched key passes through current
        assert rows[(2, "2020-01-01")].valid_to is None

    def test_empty_updates_is_identity(self, spark):
        updates = spark.createDataFrame(
            [], "id long, name string, bal double, effective_date date"
        )
        out = scd2_merge(_base(spark), updates, key_cols=["id"])
        assert sorted(
            (r.id, str(r.valid_from), r.valid_to is None) for r in out.collect()
        ) == sorted(
            (r.id, str(r.valid_from), r.valid_to is None)
            for r in _base(spark).collect()
        )

    def test_exactly_one_current_row_per_key_after_merge(self, spark):
        updates = spark.createDataFrame(
            [(1, "alice", 25.0, date(2024, 6, 1)), (2, "bob", 31.0, date(2024, 6, 1))],
            "id long, name string, bal double, effective_date date",
        )
        out = scd2_merge(_base(spark), updates, key_cols=["id"])
        current = out.where(F.col("valid_to").isNull()).groupBy("id").count().collect()
        assert all(r["count"] == 1 for r in current)


class TestPointInTimeJoin:
    def _hist(self, spark):
        return spark.createDataFrame(
            [
                (1, "v1", date(2020, 1, 1), date(2022, 1, 1)),
                (1, "v2", date(2022, 1, 1), None),
                (2, "w1", date(2021, 1, 1), None),
            ],
            "id long, attr string, valid_from date, valid_to date",
        )

    def test_each_fact_sees_its_version(self, spark):
        from skope_api_spark.operators.merge import point_in_time_join

        facts = spark.createDataFrame(
            [
                (100, 1, date(2021, 6, 1)),   # inside v1
                (101, 1, date(2022, 1, 1)),   # boundary: valid_from inclusive
                (102, 1, date(2023, 1, 1)),   # current version
                (103, 2, date(2020, 6, 1)),   # before any version -> null
            ],
            "fact_id long, id long, ts date",
        )
        hist = self._hist(spark)
        out = point_in_time_join(facts, hist, key_cols=["id"], ts_col="ts")
        got = {r.fact_id: r.attr for r in out.select("fact_id", hist["attr"]).collect()}
        assert got == {100: "v1", 101: "v2", 102: "v2", 103: None}

    def test_plan_is_hash_join_not_nested_loop(self, spark):
        """The validity range must stay a residual filter on a key hash
        join — a BroadcastNestedLoopJoin would be quadratic at scale."""
        from skope_api_spark.operators.merge import point_in_time_join

        facts = spark.createDataFrame(
            [(1, 1, date(2021, 1, 1))], "fact_id long, id long, ts date"
        )
        plan = (
            point_in_time_join(facts, self._hist(spark), key_cols=["id"], ts_col="ts")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" not in plan
