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
- the node count enters as a driver-side scalar (one count job on the
  pinned edge list — the standard iterative-control shape). For large K,
  pass ``checkpoint_every`` so lineage is truncated with
  ``checkpoint.pin`` (localCheckpoint by default; reliable checkpoint
  under SPARK_GRAFT_RELIABLE_CHECKPOINT=1 so a 1000-executor run
  survives executor loss mid-iteration — same pattern as
  ``dedup.duplicate_clusters``).

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

from skope_api_spark.checkpoint import pin, spread


def _size_bytes(conf_value: str) -> int:
    """Parse a Spark size conf ('10485760', '64m', '1g', '-1') to bytes."""
    s = str(conf_value).strip().lower().removesuffix("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if s.endswith(suffix):
            s, mult = s[:-1], m
            break
    try:
        return int(float(s) * mult)
    except ValueError:
        return 0


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

    Plan shape (r16): the edge list is pinned ONCE (lazy localCheckpoint,
    materialized by the node-count job) — the lazy plan re-evaluated the
    whole upstream edge build (scan + window + distinct) for every
    reference in every iteration: 3 iterations × (contrib join, outdeg,
    nodes, n) redundant subtree evaluations. nodes/outdeg derive from the
    pin and are pinned themselves. Because a checkpoint's LogicalRDD has
    no size statistics, Catalyst would demote every per-iteration join to
    sort-merge (measured 8.7 s vs 6.4 s lazy at sf0.1) — so the
    node-cardinality sides (ranks, outdeg, incoming) carry an explicit
    broadcast hint exactly when the MEASURED node count fits the
    session's autoBroadcastJoinThreshold: the same decision the optimizer
    made from source stats, now from observed cardinality. At real-scale
    node counts the hint drops out and the joins stay sort-merge — the
    correct strategy there. The total node count is a driver-side scalar
    (one count on the pin, the standard iterative-control shape), which
    also removes the per-iteration crossJoin against the count subtree.
    """
    edges = pin(edges, eager=False)
    nodes = pin(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct(),
        eager=False,
    )
    outdeg = pin(
        edges.groupBy("src").agg(
            F.count(F.lit(1)).cast("double").alias("__outdeg")
        ),
        eager=False,
    )
    # one job: materializes the edges + nodes pins and yields the scalar n
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph: the old lazy plan yielded an empty frame; keep that
        # instead of a driver-side ZeroDivisionError below
        return nodes.select("node", F.lit(0.0).alias("rank"))
    thresh = _size_bytes(
        edges.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
    )
    # ~48 bytes per (long node, double rank) UnsafeRow incl. overhead
    hint = F.broadcast if (thresh > 0 and n_nodes * 48 < thresh) else (lambda d: d)
    # Python float ops are the same IEEE doubles Spark computes: 1/n and
    # (1-d)/n as literals are bit-identical to the former column forms
    init_rank = 1.0 / float(n_nodes)
    teleport = (1.0 - damping) / float(n_nodes)
    ranks = nodes.select("node", F.round(F.lit(init_rank), 12).alias("rank"))
    for i in range(iterations):
        contrib = (
            edges.join(hint(ranks.withColumnRenamed("node", "src")), "src")
            .join(hint(outdeg), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__outdeg")).alias("__c"),
            )
        )
        incoming = contrib.groupBy("node").agg(F.sum("__c").alias("__in"))
        ranks = nodes.join(hint(incoming), "node", "left").select(
            "node",
            F.round(
                F.lit(teleport)
                + damping * F.coalesce(F.col("__in"), F.lit(0.0)),
                12,
            ).alias("rank"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = pin(ranks, eager=False)
    return ranks


def khop_distances(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    max_hops: int,
) -> DataFrame:
    """Multi-source BFS: shortest hop-distance (≤ ``max_hops``) from any
    seed node, over a directed edge list.

    The standard frontier-based distributed BFS (Pregel's canonical
    example; no proprietary lineage):

    - ``frontier`` holds exactly the nodes first reached at distance d;
      each iteration is ONE equi-join of the frontier onto ``edges`` (on
      the src key — co-partitioned with the previous iteration's join
      under AQE), one distinct, and one left-anti against the visited set.
    - the frontier SHRINKS as the reachable set saturates, so later
      iterations join ever-smaller sets — the opposite of the quadratic
      growth a path-enumeration (recursive-CTE) evaluation pays. The
      oracle for the contract query is exactly that recursive CTE, which
      is fine at test scale and is the semantic spec, not the scale plan.
    - ``visited`` is re-referenced by every later round, so each round is
      pinned (``checkpoint.pin``, same pattern as ``duplicate_clusters``)
      to keep the plan linear in ``max_hops`` instead of exponential.

    ``seeds`` must be a 1-column ``node`` DataFrame. Returns
    ``(node, dist)`` for every node within ``max_hops`` of a seed; seed
    nodes report dist 0 even when absent from the edge list.
    """
    visited = pin(
        seeds.select("node").distinct()
        .select("node", F.lit(0).alias("dist"))
    )
    frontier = visited.select("node")
    for d in range(1, max_hops + 1):
        reached = (
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        fresh = pin(
            reached.join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(d).alias("dist"))
        )
        if not fresh.take(1):
            break
        visited = pin(visited.unionByName(fresh))
        frontier = fresh.select("node")
    return visited


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge list: (u, v) with u < v, distinct,
    self-loops dropped — the normalization triangle counting needs."""
    return (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation
    (the "compact-forward" algorithm — Latapy 2008; MR adaptation in
    Suri & Vassilvitskii 2011, both public).

    Orienting every undirected edge from the lower-(degree, id) endpoint
    to the higher one makes the oriented out-degree O(sqrt(m)) even for
    hubs, so the wedge join (the quadratic step) is bounded by
    sum(outdeg^2) <= m^(3/2) instead of the hub-degree^2 a naive
    adjacency join pays. Wedges (a->b, a->c) are then confirmed against
    the oriented edge set with one more equi-join; each triangle is
    found exactly once and credited to all three corners via an explode.

    Returns (node, n_triangles) for every node of the graph (0 for
    triangle-free nodes).
    """
    # pin the canonical edge list ONCE (r16): the lazy plan references
    # und five times (degree union x2, orientation join, closing-edge
    # side, node spine) and re-ran the whole upstream build — scan +
    # window + distinct — for every reference. spread before the pin:
    # AQE coalesces the fixture-sized distinct to ONE partition, and a
    # 1-partition checkpoint would run every downstream stage
    # single-task (no-op at real split counts). Interleaved same-host
    # A/B at sf0.1: pinned 5.93 s vs lazy 6.48 s vs persist 6.92 s
    # median, with 4 redundant edge builds of CPU removed at any scale.
    # (pagerank pins its edge list too, but must pair the pin with
    # explicit measured-size broadcast hints: a checkpoint's unknown
    # size estimate demoted its per-iteration joins to sort-merge when
    # pinned alone — measured 8.7 s vs 6.4 s lazy; see pagerank_scores.)
    und = pin(spread(undirected_edges(edges)))
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("__deg"))
    )
    du = deg.select(
        F.col("node").alias("u"), F.col("__deg").alias("__du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("__deg").alias("__dv")
    )
    ranked = und.join(du, "u").join(dv, "v")
    # orient low-(deg, id) -> high-(deg, id)
    fwd = ranked.select(
        F.when(
            (F.col("__du") < F.col("__dv"))
            | ((F.col("__du") == F.col("__dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
        )
        .otherwise(F.struct(F.col("v").alias("a"), F.col("u").alias("b")))
        .alias("e")
    ).select("e.a", "e.b")
    w1 = fwd.select(F.col("a"), F.col("b").alias("x"))
    w2 = fwd.select(F.col("a"), F.col("b").alias("y"))
    wedges = (
        w1.join(w2, "a")
        .where(F.col("x") < F.col("y"))
        .select("a", "x", "y")
    )
    # the closing-edge set IS the canonical undirected list (already
    # id-ordered and distinct) — reorienting fwd back would pay a wasted
    # corpus-sized exchange + dedup
    closing = und.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, ["x", "y"]).select("a", "x", "y")
    corner = tris.select(
        F.explode(F.array("a", "x", "y")).alias("node")
    )
    counts = corner.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    nodes = deg.select("node")
    return nodes.join(counts, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Newman degree assortativity of an undirected graph: the Pearson
    correlation of endpoint degrees over all directed stubs (each
    undirected edge counted in both orientations — the standard
    definition; Newman 2002, public). r > 0 means hubs prefer hubs.

    Plan: canonicalize to distinct undirected edges, ONE degree
    aggregation (skinny |V| table, AQE picks broadcast vs shuffle for
    the two joins back), symmetrize by unioning the two orientations,
    and a single corr() aggregate — no windows, no driver loops.
    Returns one row: n_nodes, n_edges, avg_degree, assortativity.
    """
    # materialize the canonical edge list and the |V|-row degree table:
    # five consumers each (stub joins, counts, totals) would otherwise
    # replay the whole upstream edge derivation per branch — 13 corpus
    # scans in the planned co-purchase query vs 1 with the checkpoints
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    j = und.join(du, "u").join(dv, "v")
    stubs = j.select(
        F.col("du").alias("da"), F.col("dv").alias("db")
    ).unionAll(j.select(F.col("dv").alias("da"), F.col("du").alias("db")))
    nn = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("deg").alias("__sd")
    )
    ne = und.agg(F.count(F.lit(1)).alias("n_edges"))
    # corr from moment sums with try_divide: F.corr raises DIVIDE_BY_ZERO
    # under ANSI on constant-degree (regular) graphs, where r is undefined
    m = stubs.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("da").cast("double").alias("__sa"),
        F.sum("db").cast("double").alias("__sb"),
        F.sum(F.col("da") * F.col("db")).cast("double").alias("__sab"),
        F.sum(F.col("da") * F.col("da")).cast("double").alias("__saa"),
        F.sum(F.col("db") * F.col("db")).cast("double").alias("__sbb"),
    )
    cov = F.col("__n") * F.col("__sab") - F.col("__sa") * F.col("__sb")
    var_a = F.col("__n") * F.col("__saa") - F.col("__sa") * F.col("__sa")
    var_b = F.col("__n") * F.col("__sbb") - F.col("__sb") * F.col("__sb")
    r = m.select(
        F.try_divide(cov, F.sqrt(var_a * var_b)).alias("assortativity")
    )
    return (
        nn.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(r))
        .select(
            "n_nodes",
            "n_edges",
            (F.col("__sd").cast("double") / F.col("n_nodes")).alias(
                "avg_degree"
            ),
            "assortativity",
        )
    )


def adamic_adar_links(
    edges: DataFrame,
    *,
    top_k: int = 20,
    score_decimals: int = 6,
) -> DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003, public): score
    every NON-adjacent node pair by Σ 1/ln(deg(w)) over their common
    neighbors w — the classic "people you may know" feature. Returns the
    top_k predicted links (rounded-score desc, then (u, v) ascending —
    a deterministic total order).

    Shape: canonical undirected edges + degree table (both checkpointed,
    as in ``degree_assortativity``), neighbor-pair generation by a
    per-center self-join (cost Σ deg(w)² — the statistic's inherent
    wedge count; cap per-center neighbor lists upstream on power-law
    graphs), one sum per candidate pair, an anti-join removing existing
    edges, and a TakeOrdered cut."""
    und = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dirs = und.select(
        F.col("u").alias("center"), F.col("v").alias("n")
    ).unionAll(und.select(F.col("v").alias("center"), F.col("u").alias("n")))
    deg = dirs.groupBy("center").agg(F.count(F.lit(1)).alias("deg"))
    # deg == 1 centers can never form a neighbor PAIR (the self-join
    # needs two neighbors), but their weight expression would still be
    # evaluated row-wise — and 1/ln(1) is an ANSI DIVIDE_BY_ZERO job
    # killer (found by the r14 unicode/extremets degenerate sweeps: a
    # hostile fixture with a degree-1 node kills the whole query).
    # Filtering them first is value-neutral AND prunes the wedge join.
    weighted = (
        dirs.join(deg, "center")
        .where(F.col("deg") >= 2)
        .select("center", "n", (1.0 / F.log(F.col("deg"))).alias("w"))
    )
    a = weighted.select("center", F.col("n").alias("na"), "w")
    b = weighted.select("center", F.col("n").alias("nb"))
    cand = (
        a.join(b, "center")
        .where(F.col("na") < F.col("nb"))
        .groupBy(F.col("na").alias("u"), F.col("nb").alias("v"))
        .agg(F.sum("w").alias("aa_score"), F.count(F.lit(1)).alias(
            "common_neighbors"
        ))
    )
    non_edges = cand.join(und, ["u", "v"], "left_anti")
    return (
        non_edges.orderBy(
            F.round("aa_score", score_decimals).desc(), "u", "v"
        )
        .limit(top_k)
        .select(
            "u",
            "v",
            "common_neighbors",
            F.round("aa_score", score_decimals).alias("aa_score"),
        )
    )
