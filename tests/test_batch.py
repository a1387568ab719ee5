"""Batched multi-query execution: one scan, one shuffle, N queries."""

from __future__ import annotations

from skope_api_spark.operators.batch import batched_zonal_series
from skope_api_spark.sources.cube import analytic_cube


class TestBatchedExecution:
    def test_results_match_per_query_runs(self, spark):
        cube = analytic_cube(spark, "annual_5x5x5_dataset", "uint16_variable")
        masks = {
            "p": [(0, 0)],
            "sq": [(1, 1), (1, 2), (2, 1), (2, 2)],
        }
        out = {
            (r.query_id, r.band): (r.value, r.n_cells)
            for r in batched_zonal_series(cube, masks).collect()
        }
        for b in range(1, 6):
            assert out[("p", b)] == (b * 100.0, 1)
            vals = [b * 100 + r * 10 + c for (r, c) in masks["sq"]]
            assert out[("sq", b)] == (sum(vals) / 4, 4)

    def test_overlapping_masks_count_independently(self, spark):
        cube = analytic_cube(spark, "annual_5x5x5_dataset", "uint16_variable")
        masks = {"a": [(0, 0), (0, 1)], "b": [(0, 0)]}  # share cell (0,0)
        out = {
            (r.query_id, r.band): r.n_cells
            for r in batched_zonal_series(cube, masks).collect()
        }
        assert out[("a", 1)] == 2 and out[("b", 1)] == 1

    def test_single_scan_single_aggregate_exchange(self, spark):
        cube = analytic_cube(spark, "annual_5x5x5_dataset", "uint16_variable")
        masks = {f"q{i}": [(i % 5, (i * 2) % 5)] for i in range(20)}
        plan = (
            batched_zonal_series(cube, masks)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # 20 queries: still exactly one cube lineage and one agg shuffle
        assert plan.count("BroadcastHashJoin") == 1
        assert plan.count("Exchange hashpartitioning") == 1
