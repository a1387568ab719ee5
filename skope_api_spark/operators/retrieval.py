"""BM25 full-text retrieval over an inverted index.

The classic training-data / RAG retrieval primitive: build a posting-list
table (token -> document, term frequency, document length) once, then score
a bounded batch of keyword queries with Okapi BM25 and return top-k
documents per query.

Scale shape (the 100 TB stance):

- the posting table is ONE explode + groupBy over the corpus scan — it is
  (doc_id, tok)-keyed, so the only corpus-sized shuffle carries
  (doc_id, tok, tf, dl), never the text;
- document-frequency is a second aggregation OVER THE POSTINGS (already
  skinny), not over the corpus;
- corpus stats (N, avgdl) are a broadcast 1-row aggregate, keeping the
  whole query a single lazy plan;
- the query batch is bounded by construction (an API request carries a
  handful of keyword queries), so it is broadcast into the posting join —
  only postings matching query terms survive the join, i.e. candidate
  volume is the posting-list length of the query's terms, not the corpus;
- top-k per query is a row_number window partitioned by query_id over that
  candidate set. A pathological stopword-only query makes its candidate
  list corpus-sized — cap it upstream (drop terms with df/N above a
  stopword threshold) exactly like production BM25 engines do.

Cross-engine determinism: ranking uses the 6-dp ROUNDED score (then doc_id
asc), so the order is reproducible across Spark and the DuckDB oracle
despite double accumulation-order noise in the per-document term sum.

Reference has no retrieval surface; this is part of the engine's
training-data pipeline extension (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def build_postings(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted-index posting table: (doc_id, tok, tf, dl).

    One explode + one groupBy; ``dl`` (document length in tokens) rides
    along via ``first`` since it is constant per document.

    ``dl`` is computed in a projection BELOW the explode. Putting
    ``size(split(text))`` in the same select as the explode plans it
    ABOVE the Generate, which then must carry ``text`` as
    requiredChildOutput — every generated token row copies the full
    document text: O(tokens × doc_bytes) per document (the r13 megadoc
    class measured a 100k-token × 630 kB doc as ~63 GB of row-copy work,
    a stuck-forever task). With dl below, only (doc_id, dl) rides
    through the Generate.
    """
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__toks"),
    ).select(
        "doc_id",
        F.size("__toks").cast("double").alias("dl"),
        F.col("__toks"),
    )
    toks = sized.select("doc_id", "dl", F.explode("__toks").alias("tok"))
    return toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf"),
        F.first("dl").alias("dl"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k per query.

    ``queries`` is a bounded (query_id, term) table — one row per distinct
    query term. Returns (query_id, rk, doc_id, score) with rk in [1, k],
    score rounded to 6 dp, ties broken by doc_id ascending.

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))   (Robertson-Sparck Jones,
    the Lucene variant — strictly positive, no negative-idf clamp needed).
    """
    postings = build_postings(docs, text_col=text_col, id_col=id_col)
    dfreq = postings.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(F.split(F.col(text_col), " "))).alias("avgdl"),
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        postings.join(F.broadcast(queries), postings.tok == queries.term)
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
        .select("query_id", "rk", "doc_id", "score")
    )
