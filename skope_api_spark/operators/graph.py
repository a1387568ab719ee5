"""Graph operators: fixed-iteration PageRank over a derived link graph.

The training-data relevance: web-scale corpus curation weights documents by
link centrality (the original PageRank use), and co-occurrence graphs
(parts bought together, docs citing each other) drive sampling weights.

Scale shape:

- the edge list is the only corpus-proportional table; each power
  iteration is ONE join of ranks onto edges (co-partitioned on the node
  key) plus one aggregation on dst — the irreducible cost of distributed
  PageRank;
- out-degrees are node-sized and join on the same key (no extra exchange
  under AQE once ranks are node-partitioned);
- the node count enters as a broadcast 1-row aggregate, keeping the whole
  K-iteration computation a single lazy plan for small K. For large K,
  pass ``checkpoint_every`` so lineage is truncated with
  ``localCheckpoint`` (same pattern as ``dedup.duplicate_clusters``).

Cross-engine determinism: each iteration's rank is rounded to 12 dp, so
double accumulation-order noise cannot compound across iterations; the
final report rounds to 6 dp and breaks ties by node id.

Contract semantics (documented, not the only possible choice): dangling
nodes (no out-edges) leak their mass — rank_{t+1}(v) = (1-d)/N +
d * sum_{u->v} rank_t(u)/outdeg(u) with no dangling redistribution. Edges
are DISTINCT (src, dst) pairs; self-loops are dropped by the edge builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transition_edges(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    node_col: str,
) -> DataFrame:
    """Distinct (src, dst) edges from consecutive rows within each group
    (e.g. consecutive line numbers of an order -> part co-purchase edges).
    One window shuffle on the group key; self-loops dropped.

    The window orders by (order_col, node_col): order_col alone may not be
    unique within a group (TESTDATA lineitem carries duplicate line
    numbers), and with the node id as tie-break the emitted node SEQUENCE
    is deterministic — equal (order, node) rows are interchangeable.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(order_col, node_col)
    return (
        df.select(
            F.col(node_col).alias("src"),
            F.lead(node_col).over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    *,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank; returns (node, rank) with rank at 12 dp.

    ``edges`` must be distinct (src, dst). Node set = src ∪ dst.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    outdeg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("__outdeg")
    )
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", F.round(1.0 / F.col("__n"), 12).alias("rank")
    )
    for i in range(iterations):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__outdeg")).alias("__c"),
            )
        )
        incoming = contrib.groupBy("node").agg(F.sum("__c").alias("__in"))
        ranks = (
            nodes.join(incoming, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__in"), F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
