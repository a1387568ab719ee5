"""Similarity-search contract queries on the ``embeddings`` table.

The DuckDB oracles reuse the *same* deterministic hyperplanes (md5-parity
±1 vectors, inlined as literals by ``_planes_sql``) so the bucketed
approximate paths are bit-for-bit reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skope_api_spark.contract.registry import query, round_nz
from skope_api_spark.operators import similarity as ops
from skope_api_spark.tables import load

_PLANES = ops.hyperplanes()
_PLANES16 = ops.hyperplanes(16)
_PLANES32 = ops.hyperplanes(32)  # two disjoint 16-plane tables for multiprobe


def _planes_sql(planes: list[list[float]] | None = None) -> str:
    """DuckDB bucket expression from the shared hyperplane constants."""
    terms = []
    for p, plane in enumerate(planes if planes is not None else _PLANES):
        arr = "[" + ", ".join(str(x) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), {arr}) >= 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS INT)"


@query(
    "sim_cosine_topk",
    oracle="""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cs
  FROM q, c WHERE query_id != neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cs,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS INT) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cs, 4) AS cosine_sim, rk
FROM ranked WHERE rk <= 5
ORDER BY query_id, rk
""",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force baseline: top-5 neighbors for each of 10 queries."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine_sim", 4).alias("cosine_sim"),
        "rk",
    ).orderBy("query_id", "rk")


def _bucketed_oracle(tail: str, planes: list[list[float]] | None = None) -> str:
    return f"""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {_planes_sql(planes)} AS bucket
  FROM embeddings
)
{tail}
"""


@query(
    "sim_lsh_bucket_topk",
    oracle=_bucketed_oracle(
        """
, q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, b.v) AS cs
  FROM b JOIN q USING (bucket) WHERE q.query_id != b.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cs,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS INT) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cs, 4) AS cosine_sim, rk
FROM ranked WHERE rk <= 3
ORDER BY query_id, rk
"""
    ),
)
def sim_lsh_bucket_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: same-bucket candidates, exact re-rank, top-3 per query."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.lsh_bucket_topk(
        emb, emb.where(F.col("vec_id") < 10), k=3, planes=_PLANES
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine_sim", 4).alias("cosine_sim"),
        "rk",
    ).orderBy("query_id", "rk")


@query(
    "sim_ivf_topk",
    oracle="""
WITH ex AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), un AS (
  SELECT label, i AS idx, v[i] AS x FROM ex, range(1, {DIM_PLUS_1}) t(i)
), cm AS (
  SELECT label AS cell, idx, AVG(x) AS m FROM un GROUP BY label, idx
), cent AS (
  SELECT cell, list(m ORDER BY idx) AS c FROM cm GROUP BY cell
), assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.c) DESC, c.cell) AS rk
    FROM ex e CROSS JOIN cent c
  ) WHERE rk = 1
), q AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM assigned WHERE vec_id < 10
), scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, a.v) AS cs
  FROM assigned a JOIN q USING (cell) WHERE q.query_id != a.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cs,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS INT) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cs, 4) AS cosine_sim, rk
FROM ranked WHERE rk <= 3
ORDER BY query_id, rk
""".format(DIM_PLUS_1=ops.DIM + 1),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF scale path: data-adaptive coarse quantizer (label centroids),
    probe the query's cell, exact re-rank. Oracle mirrors the identical
    algorithm (centroid construction included) in SQL."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.ivf_topk(emb, emb.where(F.col("vec_id") < 10), k=3)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine_sim", 4).alias("cosine_sim"),
        "rk",
    ).orderBy("query_id", "rk")


@query(
    "sim_embedding_near_dup_bucketed",
    oracle=_bucketed_oracle(
        """
SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.v, b2.v), 4) AS cosine_sim
FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
WHERE list_cosine_similarity(a.v, b2.v) >= 0.25
ORDER BY vec_a, vec_b
"""
    ),
)
def sim_embedding_near_dup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, bucket-local by definition."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.embedding_near_duplicates(emb, threshold=0.25, planes=_PLANES)
    return out.select(
        "vec_a", "vec_b", F.round("cosine_sim", 4).alias("cosine_sim")
    ).orderBy("vec_a", "vec_b")


@query(
    "sim_embedding_near_dup_16planes",
    oracle=_bucketed_oracle(
        """
SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.v, b2.v), 4) AS cosine_sim
FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
WHERE list_cosine_similarity(a.v, b2.v) >= 0.25
ORDER BY vec_a, vec_b
""",
        planes=_PLANES16,
    ),
)
def sim_embedding_near_dup_16planes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-default variant of embedding near-dup: 16 hyperplanes →
    65,536 buckets, so the quadratic bucket-local candidate set shrinks by
    ~256× vs the 8-plane query (expected pairs-per-bucket ∝ (N/2^b)²; see
    PERF.md for the measured sweep). Candidate recall for cosine ≥ 0.25
    drops accordingly — the standard banding answer is to union multiple
    independent 16-plane tables (OR-of-ANDs), which is a union of this
    query's shape; the contract here checks one table bit-for-bit."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.embedding_near_duplicates(emb, threshold=0.25, planes=_PLANES16)
    return out.select(
        "vec_a", "vec_b", F.round("cosine_sim", 4).alias("cosine_sim")
    ).orderBy("vec_a", "vec_b")


@query(
    "sim_embedding_near_dup_multiprobe",
    oracle=f"""
WITH b1 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {{p1}} AS bucket
  FROM embeddings
), b2 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {{p2}} AS bucket
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
         list_cosine_similarity(a.v, c.v) AS cs
  FROM b1 a JOIN b1 c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE list_cosine_similarity(a.v, c.v) >= 0.25
  UNION
  SELECT a.vec_id, c.vec_id, list_cosine_similarity(a.v, c.v)
  FROM b2 a JOIN b2 c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE list_cosine_similarity(a.v, c.v) >= 0.25
)
SELECT vec_a, vec_b, ROUND(cs, 4) AS cosine_sim
FROM pairs
ORDER BY vec_a, vec_b
""".format(
        p1=_planes_sql(_PLANES32[:16]), p2=_planes_sql(_PLANES32[16:])
    ),
)
def sim_embedding_near_dup_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs: union of two independent 16-plane bucket tables (the
    production recall construction for narrow buckets — see PERF.md sweep).
    The oracle replays both tables from the same deterministic hyperplane
    family and unions the pair sets."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.embedding_near_duplicates_multiprobe(
        emb, threshold=0.25, n_tables=2, planes_per_table=16
    )
    return out.select(
        "vec_a", "vec_b", F.round("cosine_sim", 4).alias("cosine_sim")
    ).orderBy("vec_a", "vec_b")


@query(
    "sim_exact_cosine_pairs",
    oracle="""
WITH ex AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.v, b.v), 4) AS cosine_sim
FROM ex a JOIN ex b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.25
ORDER BY vec_a, vec_b
""",
)
def sim_exact_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quadratic all-pairs cosine baseline (ground truth for the
    bucketed paths; fixture-scale only by design)."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.exact_cosine_pairs(emb, threshold=0.25)
    return out.select(
        "vec_a", "vec_b", F.round("cosine_sim", 4).alias("cosine_sim")
    ).orderBy("vec_a", "vec_b")


_ASSIGN_SQL = """
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.v) DESC, c.cell) AS rk
    FROM ex e CROSS JOIN {cents} c
  ) WHERE rk = 1
"""

_UPDATE_SQL = f"""
  SELECT cell, list(m ORDER BY idx) AS v FROM (
    SELECT cell, i AS idx, ROUND(AVG(v[i]), 6) AS m
    FROM {{assigned}}, range(1, {ops.DIM + 1}) t(i) GROUP BY cell, i
  ) GROUP BY cell
"""


@query(
    "sim_ivf_kmeans_topk",
    oracle=f"""
WITH ex AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cell, v
  FROM ex
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 8
), a1 AS ({_ASSIGN_SQL.format(cents="seeds")}
), c1 AS ({_UPDATE_SQL.format(assigned="a1")}
), a2 AS ({_ASSIGN_SQL.format(cents="c1")}
), c2 AS ({_UPDATE_SQL.format(assigned="a2")}
), af AS ({_ASSIGN_SQL.format(cents="c2")}
), q AS (
  SELECT vec_id AS query_id, v AS qv, cell FROM af WHERE vec_id < 10
), scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, a.v) AS cs
  FROM af a JOIN q USING (cell) WHERE q.query_id != a.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cs,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS INT) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cs, 4) AS cosine_sim, rk
FROM ranked WHERE rk <= 3
ORDER BY query_id, rk
""",
)
def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a REAL k-means codebook: deterministic md5-sampled seeds,
    two Lloyd iterations (6-decimal-rounded updates for cross-engine
    bit-stability), assign, probe the query's cell, exact re-rank. The
    oracle unrolls the identical two iterations in SQL."""
    emb = load(spark, sf_dir, "embeddings")
    cents = ops.kmeans_centroids(emb, n_cells=8, iters=2)
    out = ops.ivf_topk(
        emb, emb.where(F.col("vec_id") < 10), k=3, centroids=cents
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine_sim", 4).alias("cosine_sim"),
        "rk",
    ).orderBy("query_id", "rk")


def _pair_sql(bucket_table: str) -> str:
    """Bucket-local candidate pairs passing the exact cosine filter."""
    return f"""
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM {bucket_table} a JOIN {bucket_table} c
    ON a.bucket = c.bucket AND a.vec_id < c.vec_id
  WHERE list_cosine_similarity(a.v, c.v) >= 0.25
"""


def _recall_row_sql(method: str, k: int, approx: str, exact: str, keys: str) -> str:
    return f"""
  SELECT '{method}' AS method, {k} AS k,
         (SELECT COUNT(*) FROM {approx} JOIN {exact} USING ({keys})) AS n_hits,
         (SELECT COUNT(*) FROM {exact}) AS n_exact
"""


@query(
    "sim_recall_report",
    oracle=f"""
WITH ex AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM ex WHERE vec_id < 10
), brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id) AS rk
    FROM q, ex e WHERE q.query_id != e.vec_id
  ) WHERE rk <= 3
), b8 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES)} AS bucket
  FROM embeddings
), lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qb.query_id, cb.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY qb.query_id
             ORDER BY list_cosine_similarity(qb.qv, cb.v) DESC, cb.vec_id) AS rk
    FROM (SELECT vec_id AS query_id, v AS qv, bucket FROM b8 WHERE vec_id < 10) qb
    JOIN b8 cb USING (bucket) WHERE qb.query_id != cb.vec_id
  ) WHERE rk <= 3
), un AS (
  SELECT label, i AS idx, v[i] AS x FROM ex, range(1, {ops.DIM + 1}) t(i)
), cm AS (
  SELECT label AS cell, idx, AVG(x) AS m FROM un GROUP BY label, idx
), lcent AS (
  SELECT cell, list(m ORDER BY idx) AS v FROM cm GROUP BY cell
), lassigned AS ({_ASSIGN_SQL.format(cents="lcent")}
), ivf_label AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qa.query_id, ca.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY qa.query_id
             ORDER BY list_cosine_similarity(qa.qv, ca.v) DESC, ca.vec_id) AS rk
    FROM (SELECT vec_id AS query_id, v AS qv, cell
          FROM lassigned WHERE vec_id < 10) qa
    JOIN lassigned ca USING (cell) WHERE qa.query_id != ca.vec_id
  ) WHERE rk <= 3
), seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cell, v
  FROM ex
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 8
), a1 AS ({_ASSIGN_SQL.format(cents="seeds")}
), c1 AS ({_UPDATE_SQL.format(assigned="a1")}
), a2 AS ({_ASSIGN_SQL.format(cents="c1")}
), c2 AS ({_UPDATE_SQL.format(assigned="a2")}
), af AS ({_ASSIGN_SQL.format(cents="c2")}
), ivf_kmeans AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qa.query_id, ca.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY qa.query_id
             ORDER BY list_cosine_similarity(qa.qv, ca.v) DESC, ca.vec_id) AS rk
    FROM (SELECT vec_id AS query_id, v AS qv, cell FROM af WHERE vec_id < 10) qa
    JOIN af ca USING (cell) WHERE qa.query_id != ca.vec_id
  ) WHERE rk <= 3
), qprobe2 AS (
  SELECT vec_id AS query_id, qv, cell FROM (
    SELECT e.vec_id, e.v AS qv, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.v) DESC, c.cell) AS rk
    FROM (SELECT vec_id, v FROM ex WHERE vec_id < 10) e CROSS JOIN c2 c
  ) WHERE rk <= 2
), ivf_kmeans_p2 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qa.query_id, ca.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY qa.query_id
             ORDER BY list_cosine_similarity(qa.qv, ca.v) DESC, ca.vec_id) AS rk
    FROM qprobe2 qa JOIN af ca USING (cell) WHERE qa.query_id != ca.vec_id
  ) WHERE rk <= 3
), p_exact AS (
  SELECT a.vec_id AS vec_a, c.vec_id AS vec_b
  FROM ex a JOIN ex c ON a.vec_id < c.vec_id
  WHERE list_cosine_similarity(a.v, c.v) >= 0.25
), b16 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES16)} AS bucket
  FROM embeddings
), b16b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES32[16:])} AS bucket
  FROM embeddings
), b4 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES32[:4])} AS bucket
  FROM embeddings
), b8b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES32[8:16])} AS bucket
  FROM embeddings
), b8c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES32[16:24])} AS bucket
  FROM embeddings
), b8d AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES32[24:32])} AS bucket
  FROM embeddings
), p4 AS ({_pair_sql("b4")}
), p8 AS ({_pair_sql("b8")}
), p16 AS ({_pair_sql("b16")}
), pmp AS (
  {_pair_sql("b16")}
  UNION
  {_pair_sql("b16b")}
), pmp48 AS (
  {_pair_sql("b8")}
  UNION
  {_pair_sql("b8b")}
  UNION
  {_pair_sql("b8c")}
  UNION
  {_pair_sql("b8d")}
), b4b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES32[4:8])} AS bucket
  FROM embeddings
), b4c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES32[8:12])} AS bucket
  FROM embeddings
), b4d AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_planes_sql(_PLANES32[12:16])} AS bucket
  FROM embeddings
), hn_brute AS (
  SELECT anchor_id, neighbor_id FROM (
    SELECT a.vec_id AS anchor_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.v, e.v) DESC, e.vec_id) AS rk
    FROM (SELECT * FROM ex WHERE vec_id < 10) a
    JOIN ex e ON e.label <> a.label
  ) WHERE rk <= 3
), hn_cand AS (
  SELECT qa.vec_id AS anchor_id, ca.vec_id AS neighbor_id
  FROM b8 qa JOIN b8 ca ON qa.bucket = ca.bucket WHERE qa.vec_id < 10
  UNION
  SELECT qa.vec_id, ca.vec_id
  FROM b8b qa JOIN b8b ca ON qa.bucket = ca.bucket WHERE qa.vec_id < 10
), hn_bucketed AS (
  SELECT anchor_id, neighbor_id FROM (
    SELECT h.anchor_id, h.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY h.anchor_id
             ORDER BY list_cosine_similarity(ea.v, en.v) DESC,
                      h.neighbor_id) AS rk
    FROM hn_cand h
    JOIN ex ea ON ea.vec_id = h.anchor_id
    JOIN ex en ON en.vec_id = h.neighbor_id
    WHERE en.label <> ea.label
  ) WHERE rk <= 3
), hn_cand4 AS (
  SELECT qa.vec_id AS anchor_id, ca.vec_id AS neighbor_id
  FROM b4 qa JOIN b4 ca ON qa.bucket = ca.bucket WHERE qa.vec_id < 10
  UNION
  SELECT qa.vec_id, ca.vec_id
  FROM b4b qa JOIN b4b ca ON qa.bucket = ca.bucket WHERE qa.vec_id < 10
  UNION
  SELECT qa.vec_id, ca.vec_id
  FROM b4c qa JOIN b4c ca ON qa.bucket = ca.bucket WHERE qa.vec_id < 10
  UNION
  SELECT qa.vec_id, ca.vec_id
  FROM b4d qa JOIN b4d ca ON qa.bucket = ca.bucket WHERE qa.vec_id < 10
), hn_bucketed4 AS (
  SELECT anchor_id, neighbor_id FROM (
    SELECT h.anchor_id, h.neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY h.anchor_id
             ORDER BY list_cosine_similarity(ea.v, en.v) DESC,
                      h.neighbor_id) AS rk
    FROM hn_cand4 h
    JOIN ex ea ON ea.vec_id = h.anchor_id
    JOIN ex en ON en.vec_id = h.neighbor_id
    WHERE en.label <> ea.label
  ) WHERE rk <= 3
), report AS (
{_recall_row_sql("topk_lsh_bucket_8p", 3, "lsh", "brute", "query_id, neighbor_id")}
  UNION ALL
{_recall_row_sql("topk_ivf_label", 3, "ivf_label", "brute", "query_id, neighbor_id")}
  UNION ALL
{_recall_row_sql("topk_ivf_kmeans", 3, "ivf_kmeans", "brute", "query_id, neighbor_id")}
  UNION ALL
{_recall_row_sql("topk_ivf_kmeans_p2", 3, "ivf_kmeans_p2", "brute", "query_id, neighbor_id")}
  UNION ALL
{_recall_row_sql("pairs_neardup_4p", 0, "p4", "p_exact", "vec_a, vec_b")}
  UNION ALL
{_recall_row_sql("pairs_neardup_8p", 0, "p8", "p_exact", "vec_a, vec_b")}
  UNION ALL
{_recall_row_sql("pairs_neardup_16p", 0, "p16", "p_exact", "vec_a, vec_b")}
  UNION ALL
{_recall_row_sql("pairs_multiprobe_2x16", 0, "pmp", "p_exact", "vec_a, vec_b")}
  UNION ALL
{_recall_row_sql("pairs_multiprobe_4x8", 0, "pmp48", "p_exact", "vec_a, vec_b")}
  UNION ALL
{_recall_row_sql("hardneg_bucketed_2x8", 3, "hn_bucketed", "hn_brute", "anchor_id, neighbor_id")}
  UNION ALL
{_recall_row_sql("hardneg_bucketed_4x4", 3, "hn_bucketed4", "hn_brute", "anchor_id, neighbor_id")}
)
SELECT method, k, n_hits, n_exact,
       ROUND(CAST(n_hits AS DOUBLE) / n_exact, 6) AS recall
FROM report ORDER BY method
""",
)
def sim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@k / pair-recall of every approximate ANN path vs its
    exact baseline — the quality contract the deterministic bucketed paths
    were missing. The oracle replays every method AND each exact baseline
    bit-for-bit (shared md5 hyperplanes / seeds), so recall itself is a
    cross-engine-verified number, not a self-reported one. r14 adds the
    hardneg_bucketed_2x8 AND hardneg_bucketed_4x4 rows:
    hard_negative_mining_bucketed (the corpus-scale equi-join path) at
    both table geometries, each scored against the broadcast-anchor
    brute hard_negative_mining over the same anchors (r15 ADVICE:
    docstring now names both rows)."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.ann_recall_report(
        emb, emb.where(F.col("vec_id") < 10), k=3, pair_threshold=0.25
    )
    return out.orderBy("method")


@query(
    "sim_semantic_dedup",
    oracle=f"""
WITH ex AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), seeds AS (
  SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cell, v
  FROM ex
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 8
), a1 AS ({_ASSIGN_SQL.format(cents="seeds")}
), c1 AS ({_UPDATE_SQL.format(assigned="a1")}
), a2 AS ({_ASSIGN_SQL.format(cents="c1")}
), c2 AS ({_UPDATE_SQL.format(assigned="a2")}
), af AS ({_ASSIGN_SQL.format(cents="c2")}
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM af a JOIN af b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.35
)
SELECT af.vec_id, CAST(af.cell AS INT) AS cell,
       (d.vec_id IS NULL) AS kept
FROM af LEFT JOIN dropped d ON af.vec_id = d.vec_id
ORDER BY af.vec_id
""",
)
def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-clustered embedding space (the trained Lloyd
    codebook), within-cluster cosine >= 0.35 pruning, min-id
    representative kept. The oracle replays the identical codebook
    trajectory and pruning rule in SQL."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.semantic_dedup(emb, n_cells=8, iters=2, tau=0.35)
    return out.orderBy("vec_id")


@query(
    "sim_pq_topk",
    oracle="""
WITH ex AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), un AS (
  SELECT vec_id, label, i, v[i] AS x FROM ex, range(1, 65) t(i)
), cm AS (
  SELECT label AS cell, CAST((i - 1) // 8 AS INT) AS j,
         (i - 1) % 8 AS si, ROUND(AVG(x), 6) AS m
  FROM un GROUP BY cell, j, si
), cent AS (
  SELECT j, cell, list(m ORDER BY si) AS c FROM cm GROUP BY j, cell
), sv AS (
  SELECT vec_id, CAST((i - 1) // 8 AS INT) AS j, list(x ORDER BY i) AS s
  FROM un GROUP BY vec_id, j
), dists AS (
  SELECT s.vec_id, s.j, c.cell,
         list_sum(list_transform([1, 2, 3, 4, 5, 6, 7, 8],
                  i -> (s.s[i] - c.c[i]) * (s.s[i] - c.c[i]))) AS ssd
  FROM sv s JOIN cent c ON s.j = c.j
), codes AS (
  SELECT vec_id, j, cell FROM (
    SELECT vec_id, j, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY ssd, cell) AS rk
    FROM dists
  ) WHERE rk = 1
), scored AS (
  SELECT l.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(SUM(l.ssd), 6) AS approx_dist
  FROM codes c JOIN dists l ON c.j = l.j AND c.cell = l.cell
  WHERE l.vec_id < 10 AND c.vec_id != l.vec_id
  GROUP BY query_id, neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, approx_dist,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY approx_dist, neighbor_id
         ) AS INT) AS rk
  FROM scored
)
SELECT query_id, neighbor_id, approx_dist, rk
FROM ranked WHERE rk <= 3
ORDER BY query_id, rk
""",
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (Jégou et al. 2011): the corpus is
    scanned as m-byte codes instead of raw vectors; each query's
    distances come from a broadcast m x k lookup table selected by code
    via an equi-join. The oracle mirrors the ENTIRE algorithm in SQL —
    per-subspace label-mean codebooks (6-decimal rounded, like the
    k-means trainer), squared-L2 code assignment with (ssd, cell)
    tie-break, LUT sum, 6-decimal rank — so approximation error is
    identical cross-engine and the hash check is exact."""
    emb = load(spark, sf_dir, "embeddings")
    return ops.pq_topk(emb, emb.where(F.col("vec_id") < 10), k=3).orderBy(
        "query_id", "rk"
    )


@query(
    "sim_pq_rerank_topk",
    oracle="""
WITH ex AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), un AS (
  SELECT vec_id, i, v[i] AS x FROM ex, range(1, 65) t(i)
), sv AS (
  SELECT vec_id, CAST((i - 1) // 2 AS INT) AS j, list(x ORDER BY i) AS s
  FROM un GROUP BY vec_id, j
), seeds AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cell
  FROM ex
  QUALIFY ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 32
), c0 AS (
  SELECT s.j, d.cell, s.s AS c FROM sv s JOIN seeds d USING (vec_id)
), a1 AS (
  SELECT j, cell, s FROM (
    SELECT s.j, c.cell, s.s,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j
             ORDER BY list_sum(list_transform([1, 2],
                      i -> (s.s[i] - c.c[i]) * (s.s[i] - c.c[i]))), c.cell
           ) AS rk
    FROM sv s JOIN c0 c ON s.j = c.j
  ) WHERE rk = 1
), c1 AS (
  SELECT j, cell, list(m ORDER BY si) AS c FROM (
    SELECT j, cell, i AS si, ROUND(AVG(s[i]), 6) AS m
    FROM a1, range(1, 3) t(i) GROUP BY j, cell, si
  ) GROUP BY j, cell
), dists AS (
  SELECT s.vec_id, s.j, c.cell,
         list_sum(list_transform([1, 2],
                  i -> (s.s[i] - c.c[i]) * (s.s[i] - c.c[i]))) AS ssd
  FROM sv s JOIN c1 c ON s.j = c.j
), codes AS (
  SELECT vec_id, j, cell FROM (
    SELECT vec_id, j, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY ssd, cell) AS rk
    FROM dists
  ) WHERE rk = 1
), scored AS (
  SELECT l.vec_id AS query_id, c.vec_id AS neighbor_id,
         ROUND(SUM(l.ssd), 6) AS ad
  FROM codes c JOIN dists l ON c.j = l.j AND c.cell = l.cell
  WHERE l.vec_id < 10 AND c.vec_id != l.vec_id
  GROUP BY query_id, neighbor_id
), short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY ad, neighbor_id) AS rk
    FROM scored
  ) WHERE rk <= 50
), rer AS (
  SELECT s.query_id, s.neighbor_id, list_cosine_similarity(q.v, n.v) AS cs
  FROM short s
  JOIN ex q ON q.vec_id = s.query_id
  JOIN ex n ON n.vec_id = s.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, ROUND(cs, 4) AS cosine_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS INT) AS rk
  FROM rer
)
SELECT query_id, neighbor_id, cosine_sim, rk
FROM ranked WHERE rk <= 3
ORDER BY query_id, rk
""",
)
def sim_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production PQ shape, oracle-mirrored end to end: per-subspace
    Lloyd codebooks (m=32 2-dim subspaces, 32 cells, md5-seeded, one
    6-decimal-rounded iteration), m-byte code scan, broadcast-LUT ADC
    shortlist of 50, exact cosine re-rank to top-3. Recall@10 vs brute
    force measured at 0.99 (PERF.md r07); this contract proves the whole
    trajectory — trainer included — is deterministic cross-engine."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.pq_topk_rerank(
        emb,
        emb.where(F.col("vec_id") < 10),
        k=3,
        shortlist=50,
        m=32,
        n_cells=32,
        iters=1,
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine_sim", 4).alias("cosine_sim"),
        "rk",
    ).orderBy("query_id", "rk")


@query(
    "sim_sq8_topk",
    oracle="""
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), pos AS (SELECT UNNEST(range(1, 65)) AS p),
dims AS (
  SELECT p, MIN(v[p]) AS mn, MAX(v[p]) AS mx
  FROM c CROSS JOIN pos GROUP BY p
), codes AS (
  SELECT c.vec_id, d.p,
         CASE WHEN d.mx - d.mn > 0.0
              THEN LEAST(255.0, GREATEST(0.0,
                     FLOOR((c.v[d.p] - d.mn) * 256.0 / (d.mx - d.mn))))
              ELSE 0.0 END AS code,
         d.mn, d.mx
  FROM c CROSS JOIN dims d
), recon AS (
  SELECT vec_id, p,
         mn + (code + 0.5) * ((mx - mn) / 256.0) AS r
  FROM codes
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 8
), approx AS (
  SELECT q.query_id, r.vec_id AS neighbor_id,
         ROUND(SUM(q.qv[r.p] * r.r), 6) AS ad
  FROM q JOIN recon r ON r.vec_id <> q.query_id
  GROUP BY q.query_id, r.vec_id
), sl AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY ad DESC, neighbor_id) AS srk
  FROM approx
), rer AS (
  SELECT s.query_id, s.neighbor_id, list_cosine_similarity(q.qv, c.v) AS cs
  FROM sl s
  JOIN q ON q.query_id = s.query_id
  JOIN c ON c.vec_id = s.neighbor_id
  WHERE s.srk <= 32
), ranked AS (
  SELECT query_id, neighbor_id, cs,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS INT) AS rk
  FROM rer
)
SELECT query_id, neighbor_id, ROUND(cs, 4) AS cosine_sim, rk
FROM ranked WHERE rk <= 5
ORDER BY query_id, rk
""",
)
def sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar-quantized ANN: per-dimension min/max training, 8-bit
    codes, shortlist-32 by approximate dot product against bin-center
    reconstructions, exact-cosine rerank to top-5 for 8 queries. The
    oracle replays the identical quantizer (floor/clamp, same operation
    order) so the code table — and therefore the shortlist and the final
    ranking — is reproducible cross-engine."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.sq_topk(emb, emb.where(F.col("vec_id") < 8), k=5, shortlist=32)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round("cosine_sim", 4).alias("cosine_sim"),
        "rk",
    ).orderBy("query_id", "rk")


@query(
    "sim_hard_negatives",
    oracle="""
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
), a AS (
  SELECT vec_id AS anchor_id, v AS av, label AS anchor_label
  FROM c WHERE vec_id < 8
), scored AS (
  SELECT a.anchor_id, a.anchor_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         list_cosine_similarity(a.av, c.v) AS cs
  FROM a JOIN c ON c.label <> a.anchor_label
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
       PARTITION BY anchor_id ORDER BY cs DESC, neighbor_id) AS INT) AS rk
  FROM scored
)
SELECT anchor_id, rk, neighbor_id, ROUND(cs, 4) AS cosine_sim,
       anchor_label, neighbor_label
FROM ranked WHERE rk <= 5
ORDER BY anchor_id, rk
""",
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per anchor (8 anchors), the
    top-5 most-similar vectors carrying a DIFFERENT label (see
    operators/similarity.py::hard_negative_mining for the broadcast /
    pre-score label-filter plan)."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.hard_negative_mining(
        emb, emb.where(F.col("vec_id") < 8), k=5
    )
    return out.select(
        "anchor_id",
        "rk",
        "neighbor_id",
        F.round("cosine_sim", 4).alias("cosine_sim"),
        "anchor_label",
        "neighbor_label",
    ).orderBy("anchor_id", "rk")


_HN_BUCKET_TABLES = "\n  UNION\n".join(
    f"""  SELECT qa.vec_id AS anchor_id, ca.vec_id AS neighbor_id
  FROM hnb{t} qa JOIN hnb{t} ca ON qa.bucket = ca.bucket
  WHERE qa.vec_id < 8 AND qa.vec_id <> ca.vec_id"""
    for t in range(4)
)

_HN_BUCKET_CTES = ", ".join(
    f"""hnb{t} AS (
  SELECT vec_id, {_planes_sql(ops.hyperplanes(16)[4 * t : 4 * t + 4])} AS bucket
  FROM embeddings
)"""
    for t in range(4)
)


@query(
    "sim_hard_negatives_bucketed",
    oracle=f"""
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
), {_HN_BUCKET_CTES}, cand AS (
{_HN_BUCKET_TABLES}
), ranked AS (
  SELECT h.anchor_id, ea.label AS anchor_label,
         h.neighbor_id, en.label AS neighbor_label,
         list_cosine_similarity(ea.v, en.v) AS cs,
         CAST(ROW_NUMBER() OVER (PARTITION BY h.anchor_id
           ORDER BY list_cosine_similarity(ea.v, en.v) DESC,
                    h.neighbor_id) AS INT) AS rk
  FROM cand h
  JOIN c ea ON ea.vec_id = h.anchor_id
  JOIN c en ON en.vec_id = h.neighbor_id
  WHERE en.label <> ea.label
)
SELECT anchor_id, rk, neighbor_id, ROUND(cs, 4) AS cosine_sim,
       anchor_label, neighbor_label
FROM ranked WHERE rk <= 5
ORDER BY anchor_id, rk
""",
)
def sim_hard_negatives_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale hard-negative mining (VERDICT r14 item 3): the
    bucketed variant's OUTPUT contract — (anchor_id, rk, neighbor_id,
    cosine, labels) at the 4x4 multiprobe default — pinned directly, not
    just via its sim_recall_report recall rows. Same 8 anchors as the
    brute sibling sim_hard_negatives; candidates are the union of four
    equi-joins on disjoint 4-plane LSH tables (nothing broadcasts,
    nothing all-pairs — operators/similarity.py::
    hard_negative_mining_bucketed), so the oracle replays the exact
    table family from the shared deterministic hyperplanes."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.hard_negative_mining_bucketed(
        emb, emb.where(F.col("vec_id") < 8), k=5,
        n_tables=4, planes_per_table=4,
    )
    return out.select(
        "anchor_id",
        "rk",
        "neighbor_id",
        F.round("cosine_sim", 4).alias("cosine_sim"),
        "anchor_label",
        "neighbor_label",
    ).orderBy("anchor_id", "rk")


@query(
    "sim_embedding_covariance",
    oracle="""
WITH l AS (
  SELECT vec_id, g AS i, CAST(embedding[g] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN generate_series(1, 64) t(g)
)
SELECT a.i - 1 AS i, b.i - 1 AS j,
       (ROUND(COVAR_POP(a.x, b.x), 6) + 0.0) AS cov
FROM l a JOIN l b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
ORDER BY i, j
""",
)
def sim_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 64x64 population covariance of the embedding corpus (upper
    triangle, 2080 rows) — the sufficient statistic behind PCA whitening
    for the ANN/SemDeDup family. The Spark plan is a cheap means pass
    plus ONE tree-reducible aggregation over in-scan centered
    upper-triangle product terms (operators/linalg.py:covariance,
    'explode' strategy — two-pass centered accumulation, so near-zero
    covariances are sign-stable); the oracle evaluates the same matrix
    through DuckDB's COVAR_POP over a vec_id-aligned self-join. Both
    sides normalize -0.0 via the registry round_nz rule — this query was
    the round-7 gate red (one -0.0 vs 0.0 cell out of 2080). The
    d^2-per-row explode is the JVM-codegen default; the BLAS mapInPandas
    'gram' strategy (parity-tested in tests/test_linalg.py) is the
    high-d path."""
    from skope_api_spark.operators.linalg import covariance

    emb = load(spark, sf_dir, "embeddings")
    out = covariance(emb, "embedding", strategy="explode")
    return out.select(
        "i", "j", round_nz("cov", 6).alias("cov")
    ).orderBy("i", "j")


@query(
    "sim_embedding_decontaminate",
    oracle="""
WITH p AS (
  SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pv
  FROM embeddings WHERE vec_id < 20
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id >= 20
), scored AS (
  SELECT c.vec_id, p.probe_id, list_cosine_similarity(p.pv, c.cv) AS cs
  FROM c, p
), best AS (
  SELECT vec_id, probe_id, cs,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cs DESC, probe_id) AS rk
  FROM scored
)
SELECT vec_id, probe_id AS best_probe, ROUND(cs, 4) AS best_cos,
       (cs >= 0.25) AS contaminated
FROM best WHERE rk = 1
ORDER BY vec_id
""",
)
def sim_embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval decontamination: every corpus vector scored
    against the 20-vector probe (benchmark) set, flagged where the best
    cosine clears 0.25 — the paraphrase-robust complement of the n-gram
    decontaminator. Probe set broadcast, per-vector argmax as ONE
    max-struct aggregation with smallest-probe tie-break
    (operators/similarity.py:embedding_decontaminate)."""
    emb = load(spark, sf_dir, "embeddings")
    out = ops.embedding_decontaminate(
        emb.where(F.col("vec_id") >= 20),
        emb.where(F.col("vec_id") < 20),
        threshold=0.25,
    )
    return out.select(
        "vec_id",
        "best_probe",
        F.round("best_cos", 4).alias("best_cos"),
        "contaminated",
    ).orderBy("vec_id")
