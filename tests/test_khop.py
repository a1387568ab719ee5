"""Multi-source k-hop BFS (operators/graph.py:khop_distances)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from skope_api_spark.operators.graph import khop_distances


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _seeds(spark, nodes):
    return spark.createDataFrame([(n,) for n in nodes], "node long")


def test_khop_path_graph_distances(spark):
    # 0 -> 1 -> 2 -> 3 -> 4; seed {0}, 3 hops: node 4 unreachable
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    out = khop_distances(e, _seeds(spark, [0]), max_hops=3)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_khop_shortest_wins_over_longer_path(spark):
    # two routes to node 3: 0->3 (1 hop) and 0->1->2->3 (3 hops)
    e = _edges(spark, [(0, 3), (0, 1), (1, 2), (2, 3)])
    out = khop_distances(e, _seeds(spark, [0]), max_hops=3)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert got[3] == 1


def test_khop_multi_source_min_over_seeds(spark):
    # seeds {0, 4}; node 2 is 2 hops from 0 but 1 hop from 4
    e = _edges(spark, [(0, 1), (1, 2), (4, 2)])
    out = khop_distances(e, _seeds(spark, [0, 4]), max_hops=3)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert got == {0: 0, 4: 0, 1: 1, 2: 1}


def test_khop_isolated_seed_and_early_stop(spark):
    # seed 99 has no out-edges: reported at dist 0, loop stops early
    e = _edges(spark, [(0, 1)])
    out = khop_distances(e, _seeds(spark, [99]), max_hops=5)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert got == {99: 0}


def test_khop_directedness(spark):
    # edge 1 -> 0 does NOT make 1 reachable from 0
    e = _edges(spark, [(1, 0)])
    out = khop_distances(e, _seeds(spark, [0]), max_hops=2)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert got == {0: 0}


def test_khop_cycle_terminates(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    out = khop_distances(e, _seeds(spark, [0]), max_hops=10)
    got = {r["node"]: r["dist"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_khop_duplicate_seed_rows_collapse(spark):
    e = _edges(spark, [(0, 1)])
    seeds = _seeds(spark, [0, 0, 0])
    out = khop_distances(e, seeds, max_hops=1)
    assert out.groupBy("node").count().where(F.col("count") > 1).count() == 0


class TestAssortativity:
    def test_star_graph_is_disassortative(self, spark):
        from skope_api_spark.operators.graph import degree_assortativity

        # star: hub 0 to leaves 1..5 — perfectly disassortative (r = -1)
        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "src long, dst long"
        )
        r = degree_assortativity(edges).collect()[0]
        assert r["n_nodes"] == 6 and r["n_edges"] == 5
        assert r["assortativity"] == pytest.approx(-1.0)
        assert r["avg_degree"] == pytest.approx(10 / 6)

    def test_regular_cycle_has_undefined_corr(self, spark):
        from skope_api_spark.operators.graph import degree_assortativity

        # 4-cycle: every degree is 2 — corr over constant series is NULL
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
        )
        r = degree_assortativity(edges).collect()[0]
        assert r["n_edges"] == 4 and r["assortativity"] is None

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        from skope_api_spark.operators.graph import degree_assortativity

        edges = spark.createDataFrame(
            [(0, 1), (1, 0), (0, 1), (1, 1)], "src long, dst long"
        )
        r = degree_assortativity(edges).collect()[0]
        assert r["n_edges"] == 1 and r["n_nodes"] == 2  # loop dropped


class TestAdamicAdar:
    def test_triangle_completion_scores(self, spark):
        from skope_api_spark.operators.graph import adamic_adar_links

        # path graph 1-2-3 plus hub 0 connected to 1,2,3:
        # non-edge (1,3) shares neighbors {0, 2}
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (0, 1), (0, 2), (0, 3)], "src long, dst long"
        )
        out = adamic_adar_links(edges, top_k=10).collect()
        by = {(r["u"], r["v"]): r for r in out}
        import math

        # deg(0)=3, deg(2)=3 -> AA(1,3) = 1/ln3 + 1/ln3
        assert by[(1, 3)]["common_neighbors"] == 2
        assert by[(1, 3)]["aa_score"] == pytest.approx(
            round(2 / math.log(3), 6)
        )
        # existing edges never appear
        assert (1, 2) not in by and (0, 1) not in by

    def test_degree_one_nodes_survive_ansi(self, spark):
        """r14 unicode/extremets sweeps: a degree-1 node's 1/ln(1) weight
        was evaluated row-wise (ANSI DIVIDE_BY_ZERO job killer) even
        though it can never form a neighbor pair. Pendant vertices must
        be pruned, not scored."""
        from skope_api_spark.operators.graph import adamic_adar_links

        # 9 is a pendant (degree 1) hanging off the hub
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (0, 1), (0, 2), (0, 3), (0, 9)],
            "src long, dst long",
        )
        out = adamic_adar_links(edges, top_k=20).collect()
        by = {(r["u"], r["v"]): r for r in out}
        # pendant contributes no weight anywhere, but pairs THROUGH the
        # hub involving it still score: (1, 9) shares neighbor 0 (deg 4)
        import math

        assert by[(1, 9)]["common_neighbors"] == 1
        assert by[(1, 9)]["aa_score"] == pytest.approx(
            round(1 / math.log(4), 6)
        )
