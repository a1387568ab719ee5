"""Dedup operator edge cases not covered by the oracle contract queries —
the chain-graph depth behavior of connected-components propagation."""

from __future__ import annotations

import pytest

from skope_api_spark.operators.dedup import duplicate_clusters


def chain_pairs(spark, n: int):
    """Path graph 0-1-2-...-n: worst-case diameter for min-label spread."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )


class TestClusterPropagationDepth:
    def test_chain_converges_within_diameter_rounds(self, spark):
        """A diameter-11 path needs 11 propagation rounds (+1 to detect the
        fixpoint); max_iter=13 must converge with every node labeled 0."""
        out = {
            r.doc_id: r.cluster_id
            for r in duplicate_clusters(chain_pairs(spark, 11), max_iter=13).collect()
        }
        assert out == {i: 0 for i in range(12)}

    def test_max_iter_exceeded_raises_not_partial(self, spark):
        """Labels after too-few rounds would be a WRONG partial merge — the
        operator must refuse, not return them."""
        with pytest.raises(RuntimeError, match="did not converge"):
            duplicate_clusters(chain_pairs(spark, 11), max_iter=5).collect()

    def test_two_components_stay_separate(self, spark):
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11), (11, 12)], "doc_a long, doc_b long"
        )
        out = {
            r.doc_id: r.cluster_id
            for r in duplicate_clusters(pairs).collect()
        }
        assert out == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}
