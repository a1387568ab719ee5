"""Similarity-search contract queries on the ``embeddings`` table.

The DuckDB oracles reuse the *same* deterministic hyperplanes (md5-parity
±1 vectors, inlined as literals by ``_planes_sql``) so the bucketed
approximate paths are bit-for-bit reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skope_api_spark.contract.registry import query
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
