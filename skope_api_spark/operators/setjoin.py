"""Exact set-similarity join via prefix filtering (AllPairs / PPJoin
family — Bayardo et al. 2007, Xiao et al. 2008; public algorithms).

The DETERMINISTIC complement to MinHash banding (`dedup.py`): finds all
pairs of documents with shingle-set Jaccard >= t with guaranteed
completeness — no probabilistic recall, no band tuning — while still
never going all-pairs.

The prefix-filtering lemma: order every document's distinct shingles by
one GLOBAL total order and keep only the first
``|x| - ceil(t * |x|) + 1`` (the "prefix"). Any pair with Jaccard >= t
must share at least one prefix element: if every common element sat in
both suffixes, the overlap could not reach the
``t/(1+t) * (|A|+|B|)`` that Jaccard >= t requires. So candidates =
pairs sharing a prefix element (an equi-join), then an exact verify.

Ordering elements by ascending corpus frequency (rarest first — the
classical AllPairs heuristic) makes prefixes maximally selective: hot
shingles fall into suffixes and never generate candidates.

Scale shape:
- element frequencies: one aggregation over the (doc, shingle) explode;
- per-doc frequency-ordered arrays: frequency join-back + one regroup
  (array_sort over (freq, shingle) structs — a deterministic total
  order with the shingle itself as tie-break);
- the candidate join is an equi-join on prefix elements; its cost is
  sum over prefix elements of C(posting_len, 2) — the algorithm's
  output-sensitive cost, concentrated on rare elements by construction;
- verify joins the two shingle arrays back by doc id (hash joins) and
  computes exact Jaccard JVM-side (array_intersect / array_union).

Same (doc_a, doc_b, jaccard) contract as ``dedup.ngram_jaccard_pairs``
(the quadratic baseline) and ``dedup.minhash_near_duplicates`` (the
probabilistic path) — three routes to one oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skope_api_spark.operators.dedup import with_token_shingles


def _freq_sorted_shingles(
    docs: DataFrame, *, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """(doc_id, sh) with distinct shingles sorted by (corpus frequency
    asc, shingle asc) — one shared global order for every document."""
    sh = with_token_shingles(docs, text_col, shingle_n, "shingles").select(
        F.col(id_col).alias("doc_id"),
        F.explode("shingles").alias("shingle"),
    )
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__f"))
    return (
        sh.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__f", "shingle"))),
                lambda s: s["shingle"],
            ).alias("sh")
        )
    )


def _hash_sorted_shingles(
    docs: DataFrame, *, text_col: str, id_col: str, shingle_n: int
) -> DataFrame:
    """(doc_id, sh) with distinct shingles sorted by (md5(shingle),
    shingle) — a shared pseudo-random global order computed ENTIRELY in
    the scan projection: no explode, no frequency join, no regroup
    shuffle. Candidate prefixes are then random rather than rare, which
    is equivalent on flat shingle distributions but loses the
    rare-first selectivity on Zipfian corpora (see jaccard_prefix_join's
    ``order`` knob and the PERF.md measurement)."""
    sh = with_token_shingles(docs, text_col, shingle_n, "shingles")
    ordered = F.transform(
        F.array_sort(
            F.transform(
                F.col("shingles"),
                lambda s: F.struct(F.md5(s).alias("h"), s.alias("s")),
            )
        ),
        lambda e: e["s"],
    )
    return sh.select(F.col(id_col).alias("doc_id"), ordered.alias("sh"))


def _min_overlap(t: float, n):
    """Smallest integer k with ``double(k) / n >= t`` under the SAME
    double division the verify predicates use. ``ceil(t * n)`` computed
    in double arithmetic can land ONE ABOVE that k when ``fl(t * n)``
    rounds just past an integer (numerically confirmed cases: t=0.81,
    n=300 → ceil gives 244 but 243/300 >= 0.81 in doubles; t=0.55,
    n=100; t=0.67, n=1500) — which would make the prefix one element
    too short and the containment size-residual over-prune, silently
    dropping pairs sitting exactly at the threshold (r14 ADVICE).
    One conditional step-down is sufficient: (k-2)/n >= t would need
    the double division to round up by ~1/n — orders of magnitude
    beyond half an ulp for any representable set size."""
    k0 = F.ceil(F.lit(t) * n)
    return F.when(
        (k0 - 1).cast("double") / n >= F.lit(t), k0 - 1
    ).otherwise(k0)


def jaccard_prefix_join(
    docs: DataFrame,
    *,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    order: str = "frequency",
) -> DataFrame:
    """All (doc_a, doc_b) pairs (a < b) with shingle-set Jaccard >=
    ``threshold``. Exact — complete by the prefix lemma (which only
    needs SOME shared global order), verified by an exact Jaccard on
    candidates only.

    ``order``: "frequency" (rare-first, maximally selective prefixes —
    the right default for Zipfian real corpora, costs one frequency
    aggregation + regroup) or "hash" (md5 pseudo-random order computed
    in the scan projection — zero extra shuffles, equivalent candidate
    volume on flat shingle distributions).
    """
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {t}")
    if order not in ("frequency", "hash"):
        raise ValueError(f"order must be 'frequency' or 'hash', got {order!r}")
    builder = (
        _freq_sorted_shingles if order == "frequency" else _hash_sorted_shingles
    )
    # the sorted index is referenced three times (prefix explode + both
    # verify sides); without truncation Catalyst re-runs the whole build
    # for every reference (0 ReusedExchange, measured ~12% slower at
    # sf0.1) — lazy localCheckpoint materializes it once, same pattern
    # as dedup.duplicate_clusters
    sorted_docs = builder(
        docs, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    ).localCheckpoint(eager=False)
    n = F.size("sh")
    prefix_len = (n - _min_overlap(t, n) + 1).cast("int")
    pre = sorted_docs.withColumn(
        "__p", F.slice("sh", 1, prefix_len)
    ).select("doc_id", F.explode("__p").alias("shingle"))
    cand = (
        pre.alias("a")
        .join(pre.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    left = sorted_docs.select(
        F.col("doc_id").alias("doc_a"), F.col("sh").alias("__sa")
    )
    right = sorted_docs.select(
        F.col("doc_id").alias("doc_b"), F.col("sh").alias("__sb")
    )
    jac = (
        F.size(F.array_intersect("__sa", "__sb"))
        / F.size(F.array_union("__sa", "__sb"))
    ).cast("double")
    return (
        cand.join(left, "doc_a")
        .join(right, "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= t)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_prefix_join(
    docs: DataFrame,
    *,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """All DIRECTED (doc_src, doc_sup) pairs with shingle-set containment
    ``|S_src ∩ S_sup| / |S_src| >= threshold`` — the asymmetric dedup
    class Jaccard misses: a short document embedded verbatim inside a
    longer one scores near-1 containment but arbitrarily low Jaccard
    (the union is dominated by the superset's extra shingles). Training
    pipelines need this direction for quote/boilerplate absorption and
    test-set-inside-train leakage, where the contained side is the one
    to drop or flag.

    Exact and complete by the asymmetric prefix lemma: containment >= t
    needs overlap o = the minimal integer with double(o)/|A| >= t
    (``_min_overlap`` — ceil(t*|A|) corrected for double rounding so it
    is consistent with the verify division), so if A's first ``|A| - o + 1``
    globally-ordered shingles all miss B, at most ``o - 1`` of A's
    elements can be in B — contradiction. Hence probing only the SRC
    prefix against FULL postings of every other doc is complete; no
    bound exists on which of B's elements match (|B| doesn't appear in
    the threshold), so the index side cannot be prefix-truncated.

    Scale shape: the index side posts every (shingle, doc) once — same
    volume as the frequency aggregation every route already pays — and
    candidate cost concentrates on rare shingles because the probe
    prefixes are frequency-ordered rare-first; hot shingles sit in probe
    suffixes and never touch their long postings. Verify is exact
    (array_intersect / size(src)) on candidates only. Sub-``shingle_n``-
    token docs have empty shingle sets (containment undefined) and are
    excluded on both sides.
    """
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {t}")
    sorted_docs = (
        _freq_sorted_shingles(
            docs, text_col=text_col, id_col=id_col, shingle_n=shingle_n
        )
        .where(F.size("sh") > 0)
        .localCheckpoint(eager=False)
    )
    n = F.size("sh")
    k = _min_overlap(t, n)
    prefix_len = (n - k + 1).cast("int")
    probe = sorted_docs.withColumn(
        "__p", F.slice("sh", 1, prefix_len)
    ).select(
        "doc_id", k.cast("int").alias("__k"), F.explode("__p").alias("shingle")
    )
    postings = sorted_docs.select(
        "doc_id", n.alias("__n"), F.explode("sh").alias("shingle")
    )
    # size filter: |A∩B| >= k and |A∩B| <= |B| force |B| >= k — a
    # per-candidate integer compare that prunes short-superset pairs
    # BEFORE the distinct shuffles them. k is the fl-consistent minimal
    # overlap (_min_overlap), NOT raw ceil(t*|A|), so the residual can
    # never prune a pair the verify predicate would accept.
    cand = (
        probe.alias("a")
        .join(postings.alias("b"), "shingle")
        .where(
            (F.col("a.doc_id") != F.col("b.doc_id"))
            & (F.col("b.__n") >= F.col("a.__k"))
        )
        .select(
            F.col("a.doc_id").alias("doc_src"),
            F.col("b.doc_id").alias("doc_sup"),
        )
        .distinct()
    )
    src = sorted_docs.select(
        F.col("doc_id").alias("doc_src"), F.col("sh").alias("__sa")
    )
    sup = sorted_docs.select(
        F.col("doc_id").alias("doc_sup"), F.col("sh").alias("__sb")
    )
    containment = (
        F.size(F.array_intersect("__sa", "__sb")) / F.size("__sa")
    ).cast("double")
    return (
        cand.join(src, "doc_src")
        .join(sup, "doc_sup")
        .withColumn("containment", containment)
        .where(F.col("containment") >= t)
        .select("doc_src", "doc_sup", "containment")
    )
