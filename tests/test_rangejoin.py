"""Bucketed interval-overlap join: exactness vs the naive quadratic join,
single emission per pair, closed-interval endpoint semantics, and the
equi-bucket plan shape (no cartesian)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from skope_api_spark.operators.rangejoin import interval_overlap_join


def _iv(spark, rows, prefix):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1, h1, m1), datetime(2024, 1, 1, h2, m2))
         for i, (h1, m1, h2, m2) in enumerate(rows)],
        f"{prefix}_id long, {prefix}_start timestamp, {prefix}_end timestamp",
    )


class TestIntervalOverlapJoin:
    def _join(self, left, right, **kw):
        kw.setdefault("bucket", "1 hour")
        return interval_overlap_join(
            left,
            right,
            left_start="a_start",
            left_end="a_end",
            right_start="b_start",
            right_end="b_end",
            **kw,
        )

    def test_matches_naive_quadratic_join(self, spark):
        import random

        rng = random.Random(7)

        # random closed intervals within one day
        def rand_rows(n):
            out = []
            for _ in range(n):
                (h1, m1), (h2, m2) = sorted(
                    [(rng.randrange(0, 23), rng.randrange(0, 60)) for _ in range(2)]
                )
                out.append((h1, m1, h2, m2))
            return out

        a = _iv(spark, rand_rows(40), "a")
        b = _iv(spark, rand_rows(40), "b")
        got = sorted(
            (r.a_id, r.b_id) for r in self._join(a, b).collect()
        )
        naive = sorted(
            (r.a_id, r.b_id)
            for r in a.join(
                b,
                (F.col("a_start") <= F.col("b_end"))
                & (F.col("b_start") <= F.col("a_end")),
            ).collect()
        )
        assert got == naive and len(got) > 0

    def test_each_pair_emitted_once_across_many_buckets(self, spark):
        # both intervals span 5+ hourly buckets and overlap in all of them
        a = _iv(spark, [(1, 0, 9, 0)], "a")
        b = _iv(spark, [(2, 0, 8, 0)], "b")
        rows = self._join(a, b).collect()
        assert len(rows) == 1

    def test_closed_interval_touching_endpoints_match(self, spark):
        a = _iv(spark, [(1, 0, 2, 0)], "a")
        b = _iv(spark, [(2, 0, 3, 0)], "b")  # starts exactly at a's end
        assert self._join(a, b).count() == 1

    def test_disjoint_intervals_never_match(self, spark):
        a = _iv(spark, [(1, 0, 2, 0)], "a")
        b = _iv(spark, [(2, 1, 3, 0)], "b")
        assert self._join(a, b).count() == 0

    def test_extra_condition_applies(self, spark):
        a = _iv(spark, [(1, 0, 5, 0)], "a")
        b = _iv(spark, [(1, 0, 5, 0)], "b")
        assert (
            self._join(a, b, extra_condition=F.col("a_id") != F.col("b_id")).count()
            == 0
        )

    def test_ambiguous_columns_rejected(self, spark):
        a = _iv(spark, [(1, 0, 2, 0)], "a")
        with pytest.raises(ValueError, match="ambiguous"):
            interval_overlap_join(
                a,
                a,
                left_start="a_start",
                left_end="a_end",
                right_start="a_start",
                right_end="a_end",
            )

    def test_plan_is_equi_join_not_cartesian(self, spark):
        a = _iv(spark, [(1, 0, 2, 0), (3, 0, 4, 0)], "a")
        b = _iv(spark, [(1, 30, 2, 30), (5, 0, 6, 0)], "b")
        plan = (
            self._join(a, b)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestLongIntervalSplit:
    """max_buckets_per_interval: a long-tail interval must produce identical
    pairs (exactly once) while never materializing a bucket array longer
    than the cap."""

    def _days(self, spark, rows, prefix):
        return spark.createDataFrame(
            [
                (i, datetime(2024, 1, d1, h1), datetime(2024, 1, d2, h2))
                for i, (d1, h1, d2, h2) in enumerate(rows)
            ],
            f"{prefix}_id long, {prefix}_start timestamp, {prefix}_end timestamp",
        )

    def test_split_matches_unsplit_with_skewed_interval(self, spark):
        """One interval spanning >10^3 hourly buckets (6 weeks) against many
        short ones: every cap (including cap < span and cap=1) returns the
        same pair set as the unsplit join, each pair once."""
        # a_0 spans Jan 1 .. Feb 12 (~1000 hourly buckets); a_1..a_3 short
        long_and_short = [(1, 0, 31, 23), (2, 1, 2, 5), (10, 0, 10, 9)]
        a = self._days(spark, long_and_short, "a")
        b = self._days(
            spark,
            [(d, 3, d, 20) for d in range(1, 31, 3)] + [(5, 0, 28, 0)],
            "b",
        )

        def pairs(cap):
            j = interval_overlap_join(
                a,
                b,
                left_start="a_start",
                left_end="a_end",
                right_start="b_start",
                right_end="b_end",
                bucket="1 hour",
                max_buckets_per_interval=cap,
            )
            rows = [(r.a_id, r.b_id) for r in j.collect()]
            assert len(rows) == len(set(rows)), f"duplicate pairs at cap={cap}"
            return sorted(rows)

        unsplit = pairs(None)
        assert len(unsplit) > 10
        for cap in (1, 7, 64, 4096):
            assert pairs(cap) == unsplit, cap

    def test_exploded_arrays_bounded_by_cap(self, spark):
        """Direct check on the split helper: no (row, sub-range) explodes
        more than cap buckets, and coverage is exact and disjoint."""
        from skope_api_spark.operators.rangejoin import _exploded_buckets

        a = self._days(spark, [(1, 0, 31, 23)], "a")  # ~744 hourly buckets
        cap = 50
        out = _exploded_buckets(a, "a_start", "a_end", 3600_000, cap, "bkt")
        buckets = [r.bkt for r in out.collect()]
        lo = min(buckets)
        hi = max(buckets)
        # exact, gap-free, duplicate-free coverage of the interval's span
        assert sorted(buckets) == list(range(lo, hi + 1))
        assert hi - lo + 1 > 700

    def test_cap_must_be_positive(self, spark):
        a = self._days(spark, [(1, 0, 2, 0)], "a")
        b = self._days(spark, [(1, 0, 2, 0)], "b")
        with pytest.raises(ValueError, match="max_buckets_per_interval"):
            interval_overlap_join(
                a,
                b,
                left_start="a_start",
                left_end="a_end",
                right_start="b_start",
                right_end="b_end",
                max_buckets_per_interval=0,
            ).collect()


class TestKeyedIntervalJoin:
    def test_keys_restrict_matches_and_plan_uses_hash_keys(self, spark):
        from skope_api_spark.operators.rangejoin import interval_overlap_join

        a = spark.createDataFrame(
            [(1, 10, datetime(2024, 1, 1, 1, 0), datetime(2024, 1, 1, 3, 0)),
             (2, 20, datetime(2024, 1, 1, 1, 0), datetime(2024, 1, 1, 3, 0))],
            "a_id long, a_user long, a_start timestamp, a_end timestamp",
        )
        b = spark.createDataFrame(
            [(7, 10, datetime(2024, 1, 1, 2, 0), datetime(2024, 1, 1, 4, 0)),
             (8, 30, datetime(2024, 1, 1, 2, 0), datetime(2024, 1, 1, 4, 0))],
            "b_id long, b_user long, b_start timestamp, b_end timestamp",
        )
        j = interval_overlap_join(
            a, b,
            left_start="a_start", left_end="a_end",
            right_start="b_start", right_end="b_end",
            keys=[("a_user", "b_user")],
        )
        rows = [(r.a_id, r.b_id) for r in j.collect()]
        assert rows == [(1, 7)]  # only the same-user overlapping pair
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the key participates in the hash join, not a post-join filter
        assert "a_user" in plan.split("Join")[1].split("\n")[0]


class TestRandomizedSplitParity:
    def test_random_intervals_with_small_cap_match_naive(self, spark):
        """Seeded-random mixed-length intervals (minutes to multi-day) with
        a small split cap: the bucketed+split join must equal the naive
        quadratic join exactly, each pair once."""
        import random
        from datetime import datetime, timedelta

        rng = random.Random(11)
        base = datetime(2024, 3, 1)

        def mk(prefix, n):
            rows = []
            for i in range(n):
                start = base + timedelta(minutes=rng.randrange(0, 4000))
                length = timedelta(
                    minutes=rng.choice([1, 10, 90, 600, 2880])
                )
                rows.append((i, start, start + length))
            return spark.createDataFrame(
                rows,
                f"{prefix}_id long, {prefix}_start timestamp, {prefix}_end timestamp",
            )

        a, b = mk("a", 30), mk("b", 30)
        naive = sorted(
            (r.a_id, r.b_id)
            for r in a.join(
                b,
                (F.col("a_start") <= F.col("b_end"))
                & (F.col("b_start") <= F.col("a_end")),
            ).collect()
        )
        assert len(naive) > 50
        got = [
            (r.a_id, r.b_id)
            for r in interval_overlap_join(
                a,
                b,
                left_start="a_start",
                left_end="a_end",
                right_start="b_start",
                right_end="b_end",
                bucket="30 minutes",
                max_buckets_per_interval=3,
            ).collect()
        ]
        assert len(got) == len(set(got))
        assert sorted(got) == naive


class TestPointInRange:
    def test_membership_and_boundaries(self, spark):
        from skope_api_spark.operators.rangejoin import point_in_range_join

        pts = spark.createDataFrame(
            [(1, 5), (2, 10), (3, 20), (4, 99)], "pid long, p long"
        )
        rng = spark.createDataFrame(
            [(100, 5, 10), (200, 15, 30)], "rid long, lo long, hi long"
        )
        out = point_in_range_join(
            pts, rng, point_col="p", range_start="lo", range_end="hi",
            bucket_width=8,
        )
        got = {(r["pid"], r["rid"]) for r in out.collect()}
        # closed ranges: both 5 and 10 belong to [5, 10]; 99 matches none
        assert got == {(1, 100), (2, 100), (3, 200)}

    def test_cap_equivalent_and_long_range(self, spark):
        from skope_api_spark.operators.rangejoin import point_in_range_join

        pts = spark.createDataFrame(
            [(i, i * 37) for i in range(50)], "pid long, p long"
        )
        rng = spark.createDataFrame(
            [(1, 0, 1000), (2, 900, 905)], "rid long, lo long, hi long"
        )
        kw = dict(point_col="p", range_start="lo", range_end="hi",
                  bucket_width=16)
        a = {(r["pid"], r["rid"]) for r in point_in_range_join(pts, rng, **kw).collect()}
        b = {
            (r["pid"], r["rid"])
            for r in point_in_range_join(
                pts, rng, max_buckets_per_range=3, **kw
            ).collect()
        }
        assert a == b and len(a) > 0

    def test_no_duplicate_pairs(self, spark):
        from pyspark.sql import functions as F

        from skope_api_spark.operators.rangejoin import point_in_range_join

        pts = spark.createDataFrame([(1, 50)], "pid long, p long")
        rng = spark.createDataFrame([(9, 0, 100)], "rid long, lo long, hi long")
        out = point_in_range_join(
            pts, rng, point_col="p", range_start="lo", range_end="hi",
            bucket_width=4, max_buckets_per_range=2,
        )
        assert out.count() == 1  # range covers many buckets; point in ONE

    def test_validation(self, spark):
        import pytest as _pytest

        from skope_api_spark.operators.rangejoin import point_in_range_join

        pts = spark.createDataFrame([(1, 1)], "pid long, p long")
        rng = spark.createDataFrame([(1, 0, 2)], "pid long, lo long, hi long")
        with _pytest.raises(ValueError, match="overlapping"):
            point_in_range_join(
                pts, rng, point_col="p", range_start="lo", range_end="hi",
                bucket_width=4,
            )
