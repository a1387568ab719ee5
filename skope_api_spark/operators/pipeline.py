"""End-to-end training-corpus cleaning pipeline — the operators composed.

The canonical LLM data-pipeline shape: quality filter → near-dup dedup
(keep one representative per duplicate cluster) → corpus statistics. Each
stage is one of this package's operators; this module only composes them,
proving they chain as DataFrame transformations without materialization
between stages (except the iterative component step, which is inherently
multi-job).

Scale shape: the quality filter is a scan-level predicate; dedup is the
banded-LSH + cluster path (never all-pairs); the final stats are one
aggregation. At 100 TB the whole pipeline is: scan → LSH shuffles →
cluster iterations on the (tiny) pair graph → broadcast anti-join of
non-representative ids → aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skope_api_spark.operators.dedup import (
    duplicate_clusters,
    minhash_near_duplicates,
)
from skope_api_spark.operators.text import quality_stats


def clean_corpus(
    docs: DataFrame,
    *,
    min_tokens: int = 30,
    max_stopword_ratio: float = 0.5,
    dedup_threshold: float = 0.7,
) -> DataFrame:
    """Quality-filter and near-dup-dedup a documents table.

    Keeps documents that (a) pass the quality gates and (b) are their
    duplicate cluster's representative (min doc_id), i.e. near-duplicates
    of a kept document are dropped. Returns the surviving rows of ``docs``.
    """
    q = quality_stats(docs)
    keepable = q.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    ).select("doc_id")
    kept = docs.join(keepable, "doc_id", "left_semi")
    # two consumers (the dedup stage and the final anti-join) plus the
    # cluster iterations re-enter this lineage — materialize once
    from pyspark import StorageLevel

    kept = kept.persist(StorageLevel.MEMORY_AND_DISK)

    pairs = minhash_near_duplicates(kept, threshold=dedup_threshold)
    clusters = duplicate_clusters(pairs)
    # nodes whose cluster representative is someone else → drop.
    # no broadcast hint: the duplicate-id set is corpus-proportional (30-60%
    # of a web corpus is near-duplicate), so a forced broadcast OOMs at scale;
    # AQE picks broadcast on its own when the set is actually small.
    losers = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return kept.join(losers, "doc_id", "left_anti")


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus summary of a (cleaned) documents table."""
    toks = F.split(F.col("text"), " ")
    return (
        docs.select("lang", F.size(toks).alias("n_toks"), F.length("text").alias("n_chars"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


def keep_best_representative(
    docs: DataFrame, *, dedup_threshold: float = 0.7
) -> DataFrame:
    """Quality-aware representative selection: per near-dup cluster, keep
    the HIGHEST-quality member (most distinct tokens; ties → min doc_id)
    instead of ``clean_corpus``'s min-id rule — "keep the best copy, not
    the first" (the crawl-dedup policy when duplicates differ by
    truncation or boilerplate contamination).

    Scale shape: pairs/clusters are collision-sized (≪ corpus); the
    quality join touches only clustered docs; the per-cluster argmax is
    ``groupBy(max_by)`` — map-side partial aggregation, no window sort.
    Returns (cluster_id, rep_id, n_members, rep_distinct_tokens).
    """
    pairs = minhash_near_duplicates(docs, threshold=dedup_threshold)
    clusters = duplicate_clusters(pairs)
    q = quality_stats(docs).select("doc_id", "n_distinct_tokens")
    return (
        clusters.join(q, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.max_by(
                F.struct("doc_id", "n_distinct_tokens"),
                F.struct(
                    F.col("n_distinct_tokens"), (-F.col("doc_id")).alias("nd")
                ),
            ).alias("best"),
            F.count(F.lit(1)).cast("int").alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("best.doc_id").alias("rep_id"),
            "n_members",
            F.col("best.n_distinct_tokens").alias("rep_distinct_tokens"),
        )
    )
