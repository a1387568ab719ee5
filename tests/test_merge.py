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
