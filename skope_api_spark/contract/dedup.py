"""Dedup contract queries on the ``documents`` table.

Spark side = the scale-path implementations in ``operators.dedup`` (hash
group-by, banded MinHash LSH, pigeonhole-banded SimHash). DuckDB oracle =
the exact, small-scale definition of the same result (all-pairs Jaccard /
all-pairs Hamming), so each check proves the scalable path loses nothing.

SimHash oracles are generated programmatically (60 per-bit sums) from the
same md5-based hash both engines compute bit-identically.

Jaccard values are hashed UNROUNDED: each is one int/int IEEE-754 division
(|intersect| / |union|), bit-identical across engines. A ``ROUND(x, 4)``
here is a latent cross-engine red — dyadic ratios like 58/64 = 0.90625 tie
exactly at 4 dp, where Spark rounds HALF_UP and DuckDB half-even (first
observed at sf1 in ``dedup_minhash_cross_corpus``, round 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skope_api_spark.checkpoint import spread
from skope_api_spark.contract.registry import query
from skope_api_spark.operators import dedup as ops
from skope_api_spark.tables import load

def _jaccard_pairs_ctes(src: str = "documents") -> str:
    """Exact J>=0.7 pair CTEs via inverted-index join (r15, VERDICT r14
    item 6). The previous all-pairs cartesian (``sh a JOIN sh b ON
    a.doc_id < b.doc_id`` + ``list_intersect``) exceeded the 600 s sf1
    oracle budget, leaving five queries rows-only at sf1. This form is
    LOSSLESS for the same set: any pair at J >= t shares at least one
    shingle (J > 0 requires one), and J >= t implies
    min(|a|,|b|) >= t * max(|a|,|b|) (since |a∩b| <= min and
    |a∪b| >= max) — the classic AllPairs size filter, inclusive at the
    boundary (IEEE 0.7 rounds DOWN, so the prefilter is never stricter
    than the real predicate). The jaccard value is the identical
    int/int IEEE division: c = |a∩b| via COUNT over the distinct-shingle
    equi-join, union = na + nb - c. Measured at sf1: 2,010 pairs in
    55 s vs >600 s timeout (same rows as the pure-Python ground truth).
    """
    return f"""toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM {src}),
sh AS (
  SELECT doc_id,
         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        for i in range(1, len(ws) - 1)]) AS s
  FROM toks
), inv AS (
  SELECT doc_id, len(s) AS n, UNNEST(s) AS shingle FROM sh
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb, COUNT(*) AS c
  FROM inv a JOIN inv b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
   AND b.n * 0.7 <= a.n AND a.n * 0.7 <= b.n
  GROUP BY 1, 2
), jpairs AS (
  SELECT doc_a, doc_b, c::DOUBLE / (na + nb - c) AS jaccard
  FROM cand
  WHERE c::DOUBLE / (na + nb - c) >= 0.7
)"""


_JACCARD_ORACLE_BODY = f"""
WITH {_jaccard_pairs_ctes()}
SELECT doc_a, doc_b, jaccard FROM jpairs
ORDER BY doc_a, doc_b
"""


@query(
    "dedup_exact_documents",
    oracle="""
SELECT sha256(text) AS content_hash,
       MIN(doc_id)  AS rep_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents
GROUP BY sha256(text)
ORDER BY content_hash
""",
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return ops.exact_duplicate_groups(docs).orderBy("content_hash")


@query("dedup_minhash_near_duplicates", oracle=_JACCARD_ORACLE_BODY)
def dedup_minhash_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-banded MinHash; oracle is the exact all-pairs result (r=2, b=32
    banding: per-pair miss ≤ 4.4e-10 for ANY pair at J ≥ the 0.7 threshold,
    so the sets coincide — not just at planted-pair similarity)."""
    docs = load(spark, sf_dir, "documents")
    out = ops.minhash_near_duplicates(docs, threshold=0.7)
    return out.select(
        "doc_a", "doc_b", "jaccard"
    ).orderBy("doc_a", "doc_b")


@query("dedup_ngram_jaccard_pairs", oracle=_JACCARD_ORACLE_BODY)
def dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs baseline of the same pair set (small inputs only)."""
    docs = load(spark, sf_dir, "documents")
    out = ops.ngram_jaccard_pairs(docs, threshold=0.7)
    return out.select(
        "doc_a", "doc_b", "jaccard"
    ).orderBy("doc_a", "doc_b")


@query(
    "dedup_duplicate_clusters",
    oracle=f"""
WITH RECURSIVE {_jaccard_pairs_ctes()}, pairs AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs
), edges AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, CAST(LEAST(u, MIN(v)) AS BIGINT) AS cluster_id
FROM reach GROUP BY u
ORDER BY doc_id
""",
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters via iterative min-label
    propagation (Spark) vs transitive closure via recursive CTE (oracle).
    The cluster_id is the canonical representative — the key a dedup
    pipeline keeps one row per."""
    docs = load(spark, sf_dir, "documents")
    pairs = ops.minhash_near_duplicates(docs, threshold=0.7)
    return ops.duplicate_clusters(pairs).orderBy("doc_id")


@query(
    "pipeline_clean_corpus_stats",
    oracle=f"""
WITH RECURSIVE q AS (
  SELECT doc_id FROM documents
  WHERE len(string_split(text, ' ')) >= 30
    AND len(list_filter(string_split(text, ' '), t -> t IN ('a', 'the')))::DOUBLE
        / len(string_split(text, ' ')) <= 0.5
), kept AS (
  SELECT d.* FROM documents d JOIN q USING (doc_id)
), {_jaccard_pairs_ctes("kept")}, pairs AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs
), edges AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), losers AS (
  SELECT u AS doc_id FROM reach GROUP BY u HAVING LEAST(u, MIN(v)) != u
), clean AS (
  SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM losers)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       ROUND(AVG(LENGTH(text)), 4) AS avg_chars
FROM clean
GROUP BY lang
ORDER BY lang
""",
)
def pipeline_clean_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship composition: quality filter → LSH near-dup dedup →
    cluster-representative selection → per-language corpus stats, all as
    one chained DataFrame pipeline (operators.pipeline). The oracle
    re-derives the identical corpus in SQL (recursive CTE for clusters)."""
    from skope_api_spark.operators.pipeline import clean_corpus, corpus_stats

    docs = load(spark, sf_dir, "documents")
    return corpus_stats(clean_corpus(docs)).orderBy("lang")


def _simhash_sig_sql(bits: int = ops.SIMHASH_BITS) -> str:
    sums = ",\n    ".join(
        f"SUM(CASE WHEN (th >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS s{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS tf FROM toks GROUP BY doc_id, tok),
th AS (SELECT doc_id, tf, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS th FROM tf),
sums AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id),
sig AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM sums)
"""


@query(
    "dedup_simhash_signatures",
    oracle=_simhash_sig_sql() + "SELECT doc_id, simhash FROM sig ORDER BY doc_id",
)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return ops.simhash_signatures(docs).orderBy("doc_id")


@query(
    "dedup_simhash_near_duplicates",
    oracle=_simhash_sig_sql()
    + """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
ORDER BY doc_a, doc_b
""",
)
def dedup_simhash_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pigeonhole-banded Hamming join; oracle is exact all-pairs Hamming
    (banding over max_hamming+1 blocks has guaranteed recall)."""
    docs = load(spark, sf_dir, "documents")
    out = ops.simhash_near_duplicates(docs, max_hamming=3)
    return out.select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    ).orderBy("doc_a", "doc_b")


@query(
    "dedup_minhash_cross_corpus",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        for i in range(1, len(ws) - 1)]) AS s
  FROM toks
), invc AS (
  SELECT doc_id, len(s) AS n, UNNEST(s) AS shingle FROM sh
  WHERE doc_id % 5 != 0
), invp AS (
  SELECT doc_id, len(s) AS n, UNNEST(s) AS shingle FROM sh
  WHERE doc_id % 5 = 0
), cand AS (
  -- same lossless inverted-index + size-filter form as
  -- _jaccard_pairs_ctes, cross-set (corpus x probes) instead of a < b
  SELECT c.doc_id AS doc_id, p.doc_id AS probe_id,
         ANY_VALUE(c.n) AS nc, ANY_VALUE(p.n) AS np, COUNT(*) AS cnt
  FROM invc c JOIN invp p
    ON c.shingle = p.shingle
   AND p.n * 0.7 <= c.n AND c.n * 0.7 <= p.n
  GROUP BY 1, 2
)
SELECT doc_id, probe_id, cnt::DOUBLE / (nc + np - cnt) AS jaccard
FROM cand
WHERE cnt::DOUBLE / (nc + np - cnt) >= 0.7
ORDER BY doc_id, probe_id
""",
)
def dedup_minhash_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-heldout decontamination at document granularity: corpus
    docs (doc_id % 5 != 0) that are near-dups of any probe doc
    (doc_id % 5 == 0) via broadcast banded signatures + exact verify.
    Oracle is the exact cross-set Jaccard (r=2, b=32 banding: per-pair
    miss ≤ 4.4e-10 at J ≥ the 0.7 threshold, so the sets coincide)."""
    docs = load(spark, sf_dir, "documents")
    out = ops.minhash_cross_corpus(
        docs.where(F.col("doc_id") % 5 != 0),
        docs.where(F.col("doc_id") % 5 == 0),
        threshold=0.7,
    )
    return out.select(
        "doc_id", "probe_id", "jaccard"
    ).orderBy("doc_id", "probe_id")


@query(
    "pipeline_keep_best_rep",
    oracle=f"""
WITH RECURSIVE {_jaccard_pairs_ctes()}, pairs AS (
  SELECT doc_a AS u, doc_b AS v FROM jpairs
), edges AS (
  SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
), clust AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
), q AS (
  SELECT doc_id, len(list_distinct(string_split(text, ' '))) AS ndt
  FROM documents
), m AS (
  SELECT c.cluster_id, c.doc_id, q.ndt,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.ndt DESC, c.doc_id) AS rk
  FROM clust c JOIN q USING (doc_id)
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(MIN(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS rep_id,
       CAST(COUNT(*) AS INT) AS n_members,
       CAST(MIN(CASE WHEN rk = 1 THEN ndt END) AS INT) AS rep_distinct_tokens
FROM m
GROUP BY cluster_id
ORDER BY cluster_id
""",
)
def pipeline_keep_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup representative: per near-dup cluster, the
    member with the most distinct tokens wins (ties → min doc_id) —
    "keep the best copy, not the first". Oracle replays the transitive
    closure + argmax in SQL."""
    from skope_api_spark.operators.pipeline import keep_best_representative

    docs = load(spark, sf_dir, "documents")
    return keep_best_representative(docs).orderBy("cluster_id")


@query(
    "dedup_duplicate_spans",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), e AS (
  SELECT doc_id,
         unnest([{'pos': i - 1,
                  'h': md5(array_to_string(ws[i:i+7], ' '))}
                 for i in range(1, len(ws) - 6)]) AS s
  FROM t WHERE len(ws) >= 8
), p AS (
  SELECT doc_id, CAST(s.pos AS INT) AS pos, s.h AS span_md5 FROM e
), counted AS (
  SELECT doc_id, pos, span_md5,
         CAST(COUNT(*) OVER (PARTITION BY span_md5) AS INT) AS n_occurrences
  FROM p
)
SELECT doc_id, pos, span_md5, n_occurrences
FROM counted WHERE n_occurrences >= 2
ORDER BY doc_id, pos
""",
)
def dedup_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication map: rolling md5 over every 8-token
    window, one hash-partitioned recurrence count — positions of verbatim
    repeated spans (the removal set of substring-level dedup)."""
    docs = load(spark, sf_dir, "documents")
    return ops.duplicate_spans(docs, span_tokens=8).orderBy("doc_id", "pos")


@query(
    "dedup_remove_duplicate_spans",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), e AS (
  SELECT doc_id,
         unnest([{'pos': i - 1,
                  'h': md5(array_to_string(ws[i:i+7], ' '))}
                 for i in range(1, len(ws) - 6)]) AS s
  FROM t WHERE len(ws) >= 8
), p AS (
  SELECT doc_id, CAST(s.pos AS INT) AS pos, s.h FROM e
), rk AS (
  SELECT doc_id, pos, h,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk,
         COUNT(*) OVER (PARTITION BY h) AS n
  FROM p
), dup AS (
  SELECT doc_id, pos FROM rk WHERE n >= 2 AND rk > 1
), cov AS (
  SELECT DISTINCT doc_id, pos + u AS tpos FROM dup, unnest(range(8)) AS tt(u)
), rem AS (
  SELECT doc_id, COUNT(*) AS n_removed, list(tpos) AS rl FROM cov GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.ws) AS INT) AS n_tokens,
       CAST(COALESCE(r.n_removed, 0) AS INT) AS n_removed,
       COALESCE(array_to_string(
         [t.ws[i] FOR i IN range(1, len(t.ws) + 1)
          IF r.rl IS NULL OR NOT list_contains(r.rl, i - 1)], ' '), '')
         AS cleaned_text
FROM t LEFT JOIN rem r USING (doc_id)
ORDER BY doc_id
""",
)
def dedup_remove_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr removal (Lee et al. 2021) — documents rewritten with
    every non-canonical occurrence of a corpus-repeated 8-token span
    deleted (canonical = smallest (doc_id, pos), so exactly one copy
    survives corpus-wide). The oracle replays canonical selection with a
    window rank; the Spark side picks it via groupBy(min(struct)) and
    rewrites in the scan projection — corpus text never shuffles."""
    docs = load(spark, sf_dir, "documents")
    return ops.remove_duplicate_spans(docs, span_tokens=8).orderBy("doc_id")


@query("dedup_jaccard_prefix_join", oracle=_JACCARD_ORACLE_BODY)
def dedup_jaccard_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered EXACT similarity join (AllPairs/PPJoin family, see
    operators/setjoin.py): third route to the shared all-pairs Jaccard
    oracle — deterministic completeness by the prefix lemma, vs the
    quadratic baseline (ngram_jaccard_pairs) and the probabilistic band
    join (minhash_near_duplicates)."""
    from skope_api_spark.operators.setjoin import jaccard_prefix_join

    docs = load(spark, sf_dir, "documents")
    out = jaccard_prefix_join(docs, threshold=0.7)
    return out.select(
        "doc_a", "doc_b", "jaccard"
    ).orderBy("doc_a", "doc_b")


@query(
    "dedup_containment_pairs",
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                        for i in range(1, len(ws) - 1)]) AS s
  FROM toks
  WHERE len(ws) >= 3
)
SELECT a.doc_id AS doc_src, b.doc_id AS doc_sup,
       len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) AS containment
FROM sh a JOIN sh b ON a.doc_id != b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(a.s) >= 0.8
ORDER BY doc_src, doc_sup
""",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-dup join (|S_src ∩ S_sup| / |S_src|
    >= 0.8): the asymmetric class Jaccard misses — a short doc embedded
    in a longer one (quote absorption, test-set-inside-train leakage)
    scores near-1 containment but arbitrarily low Jaccard. Spark side is
    the asymmetric-prefix-filtered inverted-index join
    (operators/setjoin.py:containment_prefix_join — probe prefixes
    complete by the pigeonhole lemma, index side full postings because
    |B| never appears in the threshold); oracle is the quadratic
    all-pairs definition, small-scale BY DESIGN like the shared Jaccard
    oracle. Containment values hash UNROUNDED: each is one int/int
    IEEE-754 division, bit-identical across engines (the module-header
    rounding rule)."""
    from skope_api_spark.operators.setjoin import containment_prefix_join

    docs = load(spark, sf_dir, "documents")
    out = containment_prefix_join(docs, threshold=0.8)
    return out.select(
        "doc_src", "doc_sup", "containment"
    ).orderBy("doc_src", "doc_sup")


@query(
    "er_customer_record_clusters",
    oracle="""
WITH RECURSIVE dirty AS (
  SELECT 2 * c_custkey AS rid, c_name AS name FROM customer
  UNION ALL
  SELECT 2 * c_custkey + 1,
         substr(c_name, 1, c_custkey % 18)
           || substr(c_name, (c_custkey % 18) + 2)
  FROM customer WHERE c_custkey % 5 = 0
), dels AS (
  -- the match rule (lev <= 1 AND |len diff| = 1) is EXACTLY "one name
  -- is a single-char deletion of the other": lev >= |len diff| forces
  -- lev = 1, and a distance-1 pair with unequal lengths is an
  -- insert/delete. Enumerating every 1-char deletion and equi-joining
  -- is therefore a COMPLETE exact computation of the same pair set —
  -- sub-quadratic (n * len rows; 429k pairs in 1.5 s at sf1 vs an
  -- all-pairs levenshtein that never finished). The query still stays
  -- sf1-EXCLUDED: the sf1 pair graph is ONE 125,768-node component
  -- (measured r15), so the reach() transitive closure below is 15.8B
  -- rows at sf1 regardless of how cheaply pairs are found — the
  -- closure, not the blocking, is the gate-scale-only part.
  SELECT rid,
         unnest([substr(name, 1, i - 1) || substr(name, i + 1)
                 for i in range(1, length(name) + 1)]) AS del
  FROM dirty
), pairs AS (
  SELECT DISTINCT LEAST(d.rid, s.rid) AS u, GREATEST(d.rid, s.rid) AS v
  FROM dels d JOIN dirty s ON d.del = s.name AND d.rid <> s.rid
), edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
SELECT u AS record_id, CAST(LEAST(u, MIN(v)) AS BIGINT) AS cluster_id
FROM reach GROUP BY u
ORDER BY record_id
""",
)
def er_customer_record_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end as a composition of the engine's own
    operators: a deterministically-dirtied customer table (every 5th
    name gets a 1-char-deleted variant record), SymSpell deletion-
    neighborhood blocking + levenshtein verify for candidate pairs
    (operators/fuzzy.py:deletion_variants — guaranteed recall at
    distance 1, exploded once with the record id carried),
    a length-difference match rule that keeps true insert/delete pairs
    (sequential TPC-H names are all substitution-distance 1 from each
    other — realistic blocking noise the rule must reject), then
    large-star/small-star contraction to cluster ids
    (operators/dedup.py:duplicate_clusters). The oracle replays blocking
    as all-pairs levenshtein + a recursive-CTE closure — quadratic BY
    DESIGN (the verification baseline, like dedup_ngram_jaccard), so
    cross-engine replay stays at gate scale (sf <= 0.1). The Spark
    side's blocking join scales and runs alone at sf1 (125,768 clustered
    records in ~6.5 min on local[32]; PERF.md session-4 notes)."""
    from skope_api_spark.operators.dedup import duplicate_clusters
    from skope_api_spark.operators.fuzzy import deletion_variants

    cust = load(spark, sf_dir, "customer")
    originals = cust.select(
        (2 * F.col("c_custkey")).alias("rid"), F.col("c_name").alias("name")
    )
    variants = cust.where(F.col("c_custkey") % 5 == 0).select(
        (2 * F.col("c_custkey") + 1).alias("rid"),
        F.concat(
            F.expr("substring(c_name, 1, c_custkey % 18)"),
            F.expr("substring(c_name, (c_custkey % 18) + 2, 100)"),
        ).alias("name"),
    )
    # spread before the checkpoint: the customer scan is 1-2 splits at
    # fixture scale, and everything downstream (deletion-variant explode,
    # candidate join, levenshtein verify) inherits that parallelism —
    # r16 measured 1.1 s single-task aggregation builds with 30 idle cores
    dirty = spread(originals.unionByName(variants)).localCheckpoint(
        eager=True
    )
    # SymSpell deletion-neighborhood blocking (operators/fuzzy.py
    # structure), restructured r16 to explode ONCE with the record id
    # carried: the former shape deduped names on both sides (two
    # identical distinct exchanges), fuzzy-joined name-to-name, then
    # broadcast-joined rids back on twice. Carrying rid through the
    # variant self-join needs no name dedup (names are near-unique;
    # fuzzy_join's own final distinct absorbed duplicates anyway) and no
    # join-backs — measured r16: 2.45 s -> 0.75 s warm at sf0.1,
    # pair set bit-identical. The ER match rule (ordered pair + exact
    # insert/delete length signature) stays pushed into the join as a
    # candidate filter ahead of the levenshtein verify and the distinct:
    # sequential TPC-H names make the substitution class (equal lengths)
    # the dominant candidate population, and the cheap length compare
    # rejects it before any edit-distance work.
    ex = dirty.withColumn("__v", F.explode(deletion_variants(F.col("name"))))
    blk_a = ex.select(
        F.col("rid").alias("u"), F.col("name").alias("probe"), "__v"
    )
    blk_b = ex.select(
        F.col("rid").alias("v"), F.col("name").alias("term"), "__v"
    )
    edges = (
        blk_a.join(blk_b, "__v")
        .where(
            (F.col("probe") < F.col("term"))
            & (F.abs(F.length("probe") - F.length("term")) == 1)
            & (F.levenshtein("probe", "term") <= 1)
        )
        .select(
            F.least("u", "v").alias("doc_a"),
            F.greatest("u", "v").alias("doc_b"),
        )
        .where(F.col("doc_a") != F.col("doc_b"))
        .distinct()
    )
    out = duplicate_clusters(edges)
    return out.select(
        F.col("doc_id").alias("record_id"), "cluster_id"
    ).orderBy("record_id")
