"""Deduplication operators for large-scale text pipelines.

All operators are DataFrame-native (JVM higher-order functions — no Python
UDFs) and follow the shapes a 100 TB corpus requires:

- **Exact dedup**: content hash (sha2-256) → hash-partitioned group-by.
  One shuffle on the hash; no text comparison beyond the digest.
- **MinHash + LSH near-dup**: shingle → k minhashes → banded signatures →
  shuffle on (band, band_hash) → candidate pairs → exact-Jaccard verify.
  The candidate join is the only quadratic-ish step and it is confined to
  same-bucket collisions — never an all-pairs cross join.
- **SimHash**: weighted per-bit majority over token hashes → 60-bit
  signature; near-dup = Hamming distance ≤ k found via pigeonhole banding
  (split the signature into k+1 blocks; any pair within distance k must
  agree on at least one block — guaranteed recall, no cross join).
- **Exact n-gram Jaccard**: the all-pairs baseline the LSH paths replace;
  kept for verification and small inputs.

SimHash signatures are built from md5 (not xxhash64) so the *output* is
engine-independent — the DuckDB oracle computes bit-identical signatures.
MinHash internals use xxhash64 (fast, JVM-native); only its *verified
pairs* surface in results, so cross-engine hash parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skope_api_spark.checkpoint import pin

SIMHASH_BITS = 60  # 15 hex chars of md5 — stays positive in a signed int64


def md5_long(col) -> "F.Column":
    """First 60 bits of md5 as a positive int64 — the engine-independent
    uniform hash every determinism-sensitive operator shares (SimHash token
    hash, stratified sampling, shard assignment). The DuckDB oracle replays
    it as ``('0x' || substr(md5(x), 1, 15))::BIGINT``; change BOTH together
    or cross-engine parity breaks."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_bands_sql(
    num_hashes: int, bands: int, *, sbase_col: str = "sbase"
) -> str:
    """SQL for the banded-minhash struct array of a base-hash array column:
    ``array<struct<band:int, band_hash:bigint>>`` with
    ``band_hash = xxhash64(min_i xxhash64(band*r+0, x), ...)`` over the
    ``num_hashes`` seeded families (r = hashes per band).

    One SQL string instead of ``num_hashes`` Python-built
    ``array_min(transform(...))`` columns, for two measured reasons (r16):

    - **construction cost**: the per-seed Python/py4j column building made
      every *invocation* of the minhash query pay ~1.5-2.3 s of driver-side
      Python before any job ran (≈60% of the whole warm query at sf0.1);
      parsing one string in the JVM is milliseconds.
    - **single pass**: ``aggregate`` folds the signature vector in ONE
      traversal of the base-hash array with a ``zip_with``/``least`` merge,
      where the per-seed form traversed the array ``num_hashes`` times.
      The ``finish`` lambda then derives the band hashes from the bound
      accumulator, so the signature vector cannot be inlined/duplicated
      by CollapseProject (the with_token_shingles blowup class).

    Values are IDENTICAL to the per-seed form: min over the same
    ``xxhash64(i, x)`` family (int seed, long base — same argument types,
    same hashes; min is order-insensitive), banded in the same layout.
    """
    rpb = num_hashes // bands
    band_hash_args = ", ".join(
        f"element_at(acc, j * {rpb} + {r + 1})" for r in range(rpb)
    )
    return (
        f"aggregate({sbase_col}, "
        f"array_repeat(9223372036854775807L, {num_hashes}), "
        f"(acc, x) -> zip_with(acc, "
        f"transform(sequence(0, {num_hashes - 1}), i -> xxhash64(i, x)), "
        f"(m, h) -> least(m, h)), "
        f"acc -> transform(sequence(0, {bands - 1}), "
        f"j -> named_struct('band', j, "
        f"'band_hash', xxhash64({band_hash_args}))))"
    )


def sliding_gram_sql(toks: str, n: int, *, wrap: str = "{g}") -> str:
    """SQL for the position-ordered n-token sliding grams of token-array
    column ``toks``, with each gram string substituted into ``wrap``
    (e.g. ``"md5({g})"``). Built as ``arrays_zip`` of n SHIFTED slices so
    the per-element lambda never references the token array — the
    load-bearing property: InferFiltersFromGenerate + predicate pushdown
    can inline the whole expression (split included) below a downstream
    explode, and a lambda that touches ``toks`` per index turns that
    into O(tokens²) per document (see with_token_shingles docstring; the
    r13 megadoc class measured 301 s for one 50k-token doc). The zipped
    form keeps at most ~2n+1 whole-array references — linear, whoever
    inlines it."""
    width = f"size({toks}) - {n - 1}"
    zipped = ", ".join(f"slice({toks}, {j + 1}, {width})" for j in range(n))
    gram = "concat_ws(' ', " + ", ".join(f"s.`{j}`" for j in range(n)) + ")"
    body = wrap.format(g=gram)
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(arrays_zip({zipped}), s -> {body}) "
        f"ELSE array() END"
    )


def with_token_shingles(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    out_col: str = "shingles",
) -> DataFrame:
    """Distinct n-word shingles of a whitespace-tokenized text column.

    The lambda must not reference the token ARRAY — only its own element.
    Two optimizer rewrites (CollapseProject / PushDownPredicates alias
    substitution, and InferFiltersFromGenerate's inferred
    ``size(e) > 0`` filter on any downstream explode) can inline the
    materialized ``split(text)`` back into the shingle expression; if the
    per-index lambda then contains ``slice(toks, i+1, n)``, the inlined
    split re-evaluates PER SHINGLE INDEX — O(tokens²) per document. At
    ordinary doc lengths that is invisible; at crawl-junk lengths it is a
    stuck executor (found by the r13 megadoc degenerate class: a
    50k-token spam doc took 301 s to explode ONE distinct shingle).
    Zipping n SHIFTED slices instead (``sliding_gram_sql``) leaves at
    most ~2n+1 whole-array references in the worst-case inlined form —
    linear, whoever inlines it. ``arrays_zip`` of non-column inputs
    names struct fields by position ("0".."n-1")."""
    toks = "__sh_toks"
    expr = f"array_distinct({sliding_gram_sql(toks, n)})"
    return (
        df.withColumn(toks, F.split(F.col(text_col), " "))
        .withColumn(out_col, F.expr(expr))
        .drop(toks)
    )


def exact_duplicate_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup: group by sha2-256 of the content.

    Returns one row per distinct content: (content_hash, rep_id = min id,
    n_copies). At scale this is a single hash-partitioned aggregation; the
    digest (32 bytes) shuffles instead of the document body.
    """
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.7,
    persist_shingles: bool = True,
    min_band_collisions: int = 2,
) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verified.

    Pipeline: shingle → ``num_hashes`` minhashes per doc (xxhash64 seeded by
    hash index) → ``bands`` band-hashes → self-join on (band, band_hash) →
    candidate pairs colliding in >= ``min_band_collisions`` bands → exact
    Jaccard on shingle sets → ``>= threshold``.

    ``min_band_collisions=2`` is the spurious-candidate guard (r16): short
    documents over a small vocabulary collide on a band whenever their
    MINIMUM shingle hashes coincide — a j-independent coincidence whose
    bucket population grows LINEARLY with the corpus, so >=1-band
    candidates grow QUADRATICALLY (measured sf3→sf9: 27.5M enumerated
    band pairs, 26.9M distinct candidates, 18.5k true pairs — the exact
    verify paid for ~1500x spurious work and the staircase exponent hit
    ~2.1). A SECOND collision for a sub-threshold pair is an independent
    rare coincidence, so requiring two kills ~all spurious candidates; a
    true pair at j has per-band P = j^2, and P(<=1 of 32 bands) at
    j = 0.70 is 1.4e-8 (4.4e-10 + 32·0.49·0.51^31) — still effectively
    guaranteed recall (8e-21 at j = 0.9). The filter is computed INSIDE
    the aggregation that already deduplicated multi-band collisions
    (count >= k replaces DISTINCT), so it costs zero extra shuffle.
    Pass 1 to restore pure >=1-band candidates.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b. Detection probability
    for a pair with true Jaccard j is 1-(1-j^r)^b (r = hashes per band). The
    defaults are sized for GUARANTEED recall at the default threshold, not
    just at planted-pair similarity: r=2, b=32 with the >=2-band rule gives
    a per-pair miss bound of P(Bin(32, 0.49) <= 1) ≈ 1.4e-8 at j = 0.70
    (8e-21 at j = 0.9; 4.4e-10 / 8e-24 under >=1), so the LSH path
    reproduces the exact all-pairs result for every pair AT OR ABOVE the
    threshold, not only the comfortably-similar ones. The previous r=2, b=8
    sizing missed j ≈ 0.70-0.76 organic pairs with P ≈ 0.1-0.5% — observed at
    sf1 (round 9): pair (5394, 31904), exact J = 37/49 ≈ 0.755, absent from
    the banded join, flipping one cluster in every downstream pipeline query.
    Precision needs no sizing: candidates are verified with exact Jaccard.

    ``persist_shingles`` materializes the shingle table (MEMORY_AND_DISK):
    three downstream lineages consume it (signatures + both verify sides),
    and without persistence each one re-tokenizes the corpus — measured 3×
    slower. Standard web-scale dedup materializes this intermediate; pass
    False to keep the plan fully lazy (e.g. one-pass pipelines that already
    checkpoint it themselves).

    Join shape depends on that choice. With a persisted shingle table the
    band self-join is SKINNY — it shuffles only (doc_id, band, band_hash),
    ~24 bytes/row, and the (far smaller) candidate-pair set joins back to
    the persisted shingles for exact verification. Measured 2.7× faster at
    sf0.1 than carrying the shingle arrays through the shuffle, and at
    100 TB it moves ~40× fewer shuffle bytes (arrays are KBs/row). Without
    persistence the arrays DO ride through the band join: a join-back would
    re-run the tokenize/hash pipeline twice more, which is strictly worse
    than the fat shuffle for a one-pass plan.
    """
    if num_hashes % bands != 0:
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")

    sh = with_token_shingles(df, text_col, shingle_n, "shingles").select(
        F.col(id_col).alias("doc_id"), "shingles"
    )
    sh = sh.where(F.size("shingles") > 0)
    # two-level hashing: the EXPENSIVE string hash runs once per shingle
    # (sbase, materialized in the persisted table), and the per-seed
    # family h_i = xxhash64(i, sbase) mixes cheap 8-byte longs — with 64
    # hashes the naive form re-hashes every multi-byte shingle string 64
    # times; this form does it once (cross-seed independence is the
    # standard double-hashing argument, base collisions ~2^-64 are far
    # below the banding miss bound and the verify step is exact anyway)
    sh = sh.withColumn(
        "sbase", F.transform("shingles", lambda s: F.xxhash64(s))
    )
    if persist_shingles:
        from pyspark import StorageLevel

        # single-file corpora arrive as one input split; spread the
        # tokenize/hash work before materializing (at scale the scan already
        # has thousands of splits and this exchange is noise)
        sh = sh.repartition(df.sparkSession.sparkContext.defaultParallelism)
        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)

    # minhash via ONE higher-order-function fold (minhash_bands_sql):
    # whole signature + banding inside the scan projection — no explode,
    # no groupBy shuffle, one array traversal, ms-scale construction.
    bands_expr = F.expr(minhash_bands_sql(num_hashes, bands))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b"))
    ).cast("double")

    if persist_shingles:
        # skinny band join: shuffle only the 24-byte key rows; verify by
        # joining the (small) candidate set back to the persisted shingles
        banded = sh.select(
            "doc_id", F.explode(bands_expr).alias("bb")
        ).select(
            "doc_id",
            F.col("bb.band").alias("band"),
            F.col("bb.band_hash").alias("band_hash"),
        )
        a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            # multi-band dedupe + spurious-candidate guard in ONE
            # aggregation: count collisions instead of DISTINCT
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("__nb"))
            .where(F.col("__nb") >= min_band_collisions)
            .drop("__nb")
        )
        sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
        sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
        return (
            cands.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("jaccard", jac)
            .where(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )

    # fully-lazy plan: carry the shingle array through the band join so the
    # verify step needs no join back (which would re-run the pipeline twice)
    banded = sh.select(
        "doc_id", "shingles", F.explode(bands_expr).alias("bb")
    ).select(
        "doc_id",
        "shingles",
        F.col("bb.band").alias("band"),
        F.col("bb.band_hash").alias("band_hash"),
    )

    # shuffle_hash hint: both self-join sides then share one shuffle of the
    # SAME subplan (a broadcast side would force recomputing the whole
    # shingle+minhash pipeline twice — measured 2× slower); at scale the
    # banded table is corpus-sized, where broadcast is wrong anyway
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.first("sh_a").alias("sh_a"),
            F.first("sh_b").alias("sh_b"),
            F.count(F.lit(1)).alias("__nb"),
        )
        .where(F.col("__nb") >= min_band_collisions)
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_cross_corpus(
    corpus: DataFrame,
    probe: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.7,
) -> DataFrame:
    """Cross-corpus near-dup flagging: corpus documents that are near
    duplicates (exact n-gram Jaccard ≥ ``threshold``) of ANY probe-set
    document — the train-vs-heldout / train-vs-benchmark decontamination
    check at document granularity (stronger than single-n-gram overlap:
    it flags verbatim and lightly-edited copies, not incidental phrase
    collisions).

    Scale shape — the probe side is benchmark-sized by definition, so its
    banded signature table AND its shingle table are both broadcast: the
    corpus is scanned ONCE, signatures are computed in the scan
    projection, candidates fall out of a broadcast equi-join on
    (band, band_hash), and the only shuffle is the candidate-pair
    distinct (collision-sized, ≪ corpus). No corpus self-join, no
    corpus-sized shuffle at all.

    Returns (doc_id, probe_id, jaccard) for every verified pair.
    """
    if num_hashes % bands != 0:
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")

    # two-level hashing as in minhash_near_duplicates: string-hash each
    # shingle once (sbase), then the one-pass seeded fold + banding of
    # minhash_bands_sql (single array traversal, ms-scale construction)
    bands_expr = F.expr(minhash_bands_sql(num_hashes, bands))
    sbase = F.transform("shingles", lambda s: F.xxhash64(s))

    sh_c = (
        with_token_shingles(corpus, text_col, shingle_n, "shingles")
        .select(F.col(id_col).alias("doc_id"), "shingles")
        .where(F.size("shingles") > 0)
        .withColumn("sbase", sbase)
    )
    sh_p = (
        with_token_shingles(probe, text_col, shingle_n, "shingles")
        .select(F.col(id_col).alias("probe_id"), "shingles")
        .where(F.size("shingles") > 0)
        .withColumn("sbase", sbase)
    )

    # corpus rows carry their shingle arrays through the BROADCAST join —
    # map-side, so the arrays never shuffle; probe bands are skinny
    banded_c = sh_c.select(
        "doc_id", "shingles", F.explode(bands_expr).alias("bb")
    ).select(
        "doc_id",
        F.col("shingles").alias("sh_a"),
        F.col("bb.band").alias("band"),
        F.col("bb.band_hash").alias("band_hash"),
    )
    banded_p = sh_p.select(
        "probe_id", F.explode(bands_expr).alias("bb")
    ).select(
        "probe_id",
        F.col("bb.band").alias("band"),
        F.col("bb.band_hash").alias("band_hash"),
    )

    cands = (
        banded_c.join(F.broadcast(banded_p), ["band", "band_hash"])
        # a pair can collide in several bands — dedupe (and keep one copy
        # of the corpus shingles) before verifying; this groupBy is the
        # only shuffle and it moves candidate pairs, not the corpus
        .groupBy("doc_id", "probe_id")
        .agg(F.first("sh_a").alias("sh_a"))
    )
    probe_sh = sh_p.select("probe_id", F.col("shingles").alias("sh_b"))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b"))
    ).cast("double")
    return (
        cands.join(F.broadcast(probe_sh), "probe_id")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_id", "probe_id", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard — the baseline the LSH path replaces.

    Quadratic in input size; use only on small/blocked inputs. Returns the
    same (doc_a, doc_b, jaccard) shape as ``minhash_near_duplicates``.
    """
    sh = with_token_shingles(df, text_col, shingle_n, "shingles").select(
        F.col(id_col).alias("doc_id"), "shingles"
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    # try_divide: a pair of EMPTY shingle sets (docs shorter than the
    # shingle width) has union size 0 — under ANSI mode a bare division
    # throws DIVIDE_BY_ZERO; NULL matches DuckDB's 0/0 and fails >= t
    jac = F.try_divide(
        F.size(F.array_intersect("sh_a", "sh_b")),
        F.size(F.array_union("sh_a", "sh_b")),
    ).cast("double")
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def duplicate_clusters(
    pairs: DataFrame,
    *,
    id_cols: tuple[str, str] = ("doc_a", "doc_b"),
    max_iter: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs → duplicate clusters.

    Large-star / small-star contraction (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014) in plain DataFrame
    ops. Each round rewires edges toward neighborhood minima:

    - large-star: every node strictly larger than its neighbor ``u``
      re-attaches to ``min(N(u) ∪ {u})``;
    - small-star: on edges oriented large→small, every smaller neighbor
      (and ``u`` itself) re-attaches to the smallest neighbor.

    The edge set monotonically contracts toward stars centered on each
    component's minimum id — O(log² n) rounds worst case, O(log n) in
    practice, vs the O(diameter) of naive min-label propagation: a
    chain-shaped cluster of diameter 10³ converges in ~10 rounds, not
    10³ Spark jobs. Each round is two partial-aggregated groupBys plus a
    distinct on a skinny 2-column edge list; the per-round convergence
    check is a driver-side scalar (edge-set symmetric difference count),
    the standard iterative-algorithm shape, not a data collect.

    If ``max_iter`` rounds pass while the edge set is still changing, the
    labels would be a WRONG partial merge — so this raises rather than
    silently returning them (``max_iter`` bounds log-rounds now, so the
    default 20 covers any graph of < 2^20 diameter).

    Returns (doc_id, cluster_id = min reachable id) for every node that
    appears in ``pairs`` — deterministic, same contract as the previous
    propagation implementation (hash-checked by
    ``dedup_duplicate_clusters``).
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    a, b = id_cols
    # pin the pair input ONCE: nodes and edges both derive from it, and
    # pinning each separately evaluated the (often expensive) upstream —
    # a fuzzy join, an LSH band join — twice (r16: measured 2.75 s +
    # 2.22 s duplicated front-end on er_customer_record_clusters sf0.1)
    # LAZY pin (r16 round 2): localCheckpoint(eager=False) marks the RDD;
    # the FIRST job that computes it persists + truncates — here, the
    # edges checkpoint job below materializes raw as a side effect, so
    # raw never needs its own job.
    raw = pin(pairs.select(F.col(a).alias("u"), F.col(b).alias("v")), eager=False)
    # derived once each from the checkpoint: nodes feeds only the final
    # label join (no pin needed), edges is re-pinned every round below
    nodes = (
        raw.select(F.col("u").alias("n"))
        .union(raw.select(F.col("v").alias("n")))
        .distinct()
    )
    # canonical orientation large→small; self-pairs carry no connectivity
    # convergence witness FOLDED into the materializing job (r17,
    # VERDICT r16 item 3): observe() computes (count, bit_xor(xxhash64))
    # as rows stream through the eager checkpoint's job — the former
    # separate witness aggregation added one exchange + one AQE stage
    # wave per round to a latency-bound loop. Dataset.localCheckpoint
    # runs under withAction, so the observation listener fires and
    # Observation.get returns the metrics of exactly the checkpointed
    # rows. Same inequality-only semantics: empty input gives
    # (0, None) like the former .first().
    from pyspark.sql import Observation

    def _pin_with_witness(df: DataFrame) -> tuple[DataFrame, int, int]:
        obs = Observation()
        pinned = pin(
            df.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64("u", "v")).alias("sig"),
            ),
            eager=True,
        )
        got = obs.get
        return pinned, got["n"], got["sig"]

    edges, prev_count, prev_sig = _pin_with_witness(
        raw.where(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    # each round pins its result (checkpoint.pin — localCheckpoint by
    # default, reliable checkpoint for cluster runs): each round's plan
    # references the previous one — without truncation the lineage
    # compounds and the final plan grows with round count
    for _ in range(max_iter):
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        # NO distinct here (r16): the small-star phase's final distinct
        # already dedups, so an intermediate one only adds an exchange +
        # barrier to every round. Duplicate multiplicity entering smins
        # is bounded by a node's smaller-neighbor count within ONE round
        # (partial aggregation absorbs it map-side) and never compounds
        # across rounds — each round re-derives from the deduped edges.
        # Measured r16: loop 7.3 s -> 4.5 s at sf0.1, converged edge set
        # bit-identical.
        large = (
            sym.join(lmins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("lu"),
                F.least("u", "mv").alias("lv"),
            )
            .select(F.col("lu").alias("u"), F.col("lv").alias("v"))
        )
        smins = large.groupBy("u").agg(F.min("v").alias("mv"))
        small = (
            large.join(smins, "u")
            .where(F.col("v") != F.col("mv"))
            .select(F.col("v").alias("su"), F.col("mv").alias("sv"))
            .select(F.col("su").alias("u"), F.col("sv").alias("v"))
            .union(smins.select("u", F.col("mv").alias("v")))
            .distinct()
        )
        # convergence = edge-set equality. The (count, xxhash64 bit_xor)
        # witness rides the checkpoint job via observe() (r17): a
        # differing count or hash PROVES the set changed with no
        # subtract (r16 — the former count-only witness forced an exact
        # subtract on every round where edges rewired without changing
        # the count, 0.3-0.5 s each here; bit_xor, not sum — a long sum
        # overflows under ANSI). Only when BOTH match does the exact
        # one-sided subtract run (|A| == |B| and A \ B = ∅ ⟹ A == B) —
        # the hash xor is a fast-path inequality witness, never the
        # equality proof, so a hash-xor collision costs one extra
        # subtract, not correctness.
        small, new_count, new_sig = _pin_with_witness(small)
        if (new_count, new_sig) == (prev_count, prev_sig):
            changed = small.subtract(edges).count()
        else:
            changed = max(abs(new_count - prev_count), 1)
        prev_count, prev_sig = new_count, new_sig
        edges = small
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iter} rounds - "
            f"{changed} edges still rewiring; raise max_iter (it bounds "
            "log-rounds, so this takes an astronomically deep graph or a "
            "tiny limit). Refusing to return a partial merge."
        )
    # fixpoint = stars: every non-root node has exactly one edge, to its
    # component's min; roots (and isolated nodes) label themselves
    return (
        nodes.join(
            edges.select(F.col("u").alias("n"), F.col("v").alias("root")),
            "n",
            "left",
        )
        .select(
            F.col("n").alias("doc_id"),
            F.coalesce("root", "n").alias("cluster_id"),
        )
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Frequency-weighted SimHash signature per document.

    Token hash = first 15 hex chars of md5(token) parsed as an int (60 usable
    bits, positive in int64). Signature bit b is set when the weighted sum of
    (±1 per token, + if token's bit b set, weight = term frequency) is > 0.
    md5 keeps the signature engine-independent: the DuckDB oracle reproduces
    it bit-for-bit.

    Returns (doc_id, simhash). Round-4 shape: the tf-weighted sum over
    DISTINCT tokens equals the plain sum over all token OCCURRENCES, so
    the old (doc_id, token) tf pre-aggregation — a full shuffle of the
    tokenized corpus — is gone: one explode, md5 in the scan projection,
    then a single groupBy(doc_id) whose ``bits`` sum(when) aggregates
    partial-aggregate map-side (60 longs/doc cross the wire). The wide
    HashAggregate costs one-time codegen JIT — measured ~15× cheaper in
    steady state than the interpreted higher-order-function fold that
    would avoid it (2.75 s vs 40.9 s warm at sf0.1; PERF.md), and
    one-time JIT is noise at 100 TB while per-row cost is not.
    """
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select("doc_id", md5_long(F.col("tok")).alias("th"))
    # the per-bit aggregates and the signature reassembly are built as SQL
    # strings parsed in the JVM (r16): the former per-bit Python column
    # building cost ~0.5-1 s of driver-side py4j PER INVOCATION (pure
    # fixed overhead, ~25% of the warm query at sf0.1); the aggregate
    # SHAPE is unchanged — ``bits`` map-side-combining SUMs, 60 longs/doc
    # across the wire
    bit_sums = [
        F.expr(
            f"sum(CASE WHEN (shiftright(th, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    sums = occ.groupBy("doc_id").agg(*bit_sums)
    sig = F.expr(
        " + ".join(
            f"(CASE WHEN s{b} > 0 THEN {1 << b}L ELSE 0L END)"
            for b in range(bits)
        )
    )
    return sums.select("doc_id", sig.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Candidate generation by pigeonhole banding: the signature splits into
    ``max_hamming + 1`` blocks; any pair within the distance bound must agree
    exactly on ≥ 1 block, so joining per-block has guaranteed recall (the
    standard web-scale simhash dedup layout). No all-pairs join.
    """
    n_blocks = max_hamming + 1
    block_bits = bits // n_blocks
    sig = simhash_signatures(df, text_col, id_col, bits=bits)

    blocks = [
        F.struct(
            F.lit(i).alias("block"),
            F.shiftright(F.col("simhash"), i * block_bits)
            .bitwiseAND(F.lit((1 << block_bits) - 1))
            .alias("block_val"),
        )
        for i in range(n_blocks)
    ]
    banded = sig.select(
        "doc_id", "simhash", F.explode(F.array(*blocks)).alias("bb")
    ).select(
        "doc_id",
        "simhash",
        F.col("bb.block").alias("block"),
        F.col("bb.block_val").alias("block_val"),
    )
    a, b = banded.alias("a"), banded.hint("shuffle_hash").alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        # verify BEFORE the dedupe shuffle: hamming is computed in the
        # join projection, so filtering first means only true near-dup
        # rows reach the DISTINCT exchange — on skewed corpora (short
        # docs clustering on popular block values) the unfiltered
        # candidate set grows quadratically and was the whole cost
        # (sf9: 52s of the 89s wall). Filter/distinct commute here.
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    span_tokens: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact-substring duplication map (the ExactSubstr idea of Lee et al.
    2021, "Deduplicating Training Data Makes Language Models Better",
    realized with rolling hashes instead of a suffix array): every
    ``span_tokens``-token window position in the corpus, keyed by the md5
    of its text; positions whose span recurs ``min_occurrences``+ times
    anywhere (same doc included) are the repeated-span removal set.

    Scale shape: span hashes are computed in the scan projection (one
    transform over token positions — no per-span re-split), ONE
    posexplode, and the recurrence count is a single hash-partitioned
    window count — one shuffle of (doc_id, pos, 32-char hash), which is
    the op's inherent cost (every position must meet its collisions).
    A suffix array gives the same answer sequentially; the rolling-hash
    shuffle is the distributed-native equivalent.

    Returns (doc_id, pos, span_md5, n_occurrences) for repeated positions.
    """
    toks = "__sp_toks"
    # zip-of-shifted-slices form: the per-index lambda must not touch
    # the token array (sliding_gram_sql docstring; posexplode below
    # triggers the same inferred-filter inlining as explode)
    spans = sliding_gram_sql(toks, span_tokens, wrap="md5({g})")
    from pyspark.sql import Window as W

    pos = (
        df.withColumn(toks, F.split(F.col(text_col), " "))
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.expr(spans)).alias("pos", "span_md5"),
        )
    )
    n = F.count(F.lit(1)).over(W.partitionBy("span_md5"))
    return (
        pos.withColumn("n_occurrences", n.cast("int"))
        .where(F.col("n_occurrences") >= min_occurrences)
        .select("doc_id", F.col("pos").cast("int").alias("pos"),
                "span_md5", "n_occurrences")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    span_tokens: int = 8,
) -> DataFrame:
    """ExactSubstr REMOVAL (Lee et al. 2021): rewrite every document with
    repeated-span occurrences deleted, keeping exactly one canonical copy
    of each repeated span corpus-wide (the occurrence with the smallest
    (doc_id, pos) — deterministic, so the oracle replays it).

    A token survives unless it is covered by a NON-canonical occurrence
    of a span that repeats anywhere in the corpus (same doc included).

    Scale shape — the corpus text never shuffles:
    - span hashes: scan-projection transform + one posexplode (as in
      ``duplicate_spans``), window count per hash — one shuffle of
      (doc_id, pos, 32-char md5);
    - canonical pick: groupBy(span_md5).min(struct(doc_id, pos)) —
      partial-aggregated, repeated spans only;
    - covered positions: explode the span width ONLY for duplicate
      occurrences (duplicate mass, not corpus mass), collect_set per doc;
    - rewrite: ONE row of removed positions joins back per doc, and the
      indexed ``filter(toks, (x, i) -> ...)`` deletes in the projection.

    Returns (doc_id, n_tokens, n_removed, cleaned_text).
    """
    toks = "__rm_toks"
    # zip-of-shifted-slices form: the per-index lambda must not touch
    # the token array (sliding_gram_sql docstring; posexplode below
    # triggers the same inferred-filter inlining as explode)
    spans = sliding_gram_sql(toks, span_tokens, wrap="md5({g})")
    from pyspark.sql import Window as W

    pos = (
        df.withColumn(toks, F.split(F.col(text_col), " "))
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.expr(spans)).alias("pos", "span_md5"),
        )
    )
    repeated = pos.withColumn(
        "__n", F.count(F.lit(1)).over(W.partitionBy("span_md5"))
    ).where(F.col("__n") >= 2)
    canonical = repeated.groupBy("span_md5").agg(
        F.min(F.struct("doc_id", "pos")).alias("__c")
    )
    dup_occ = repeated.join(canonical, "span_md5").where(
        (F.col("doc_id") != F.col("__c.doc_id"))
        | (F.col("pos") != F.col("__c.pos"))
    )
    removed = (
        dup_occ.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (span_tokens - 1))
            ).alias("tpos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("tpos").alias("__removed"))
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias(toks)
    )
    rm = F.coalesce(F.col("__removed"), F.array().cast("array<int>"))
    # kept positions via ONE hash-set array_except (order-preserving on
    # the left operand), then O(1) getItem per survivor. The previous
    # form — filter(toks, (x, i) -> NOT array_contains(rm, i)) — scanned
    # the removed-set PER TOKEN: O(tokens × removed) per document, which
    # the r13 megadoc class measured as a >90 s single row (a 100k-token
    # doc with ~100k removed positions = 1e10 comparisons). Note the
    # quadratic hid from .count() probes: only a consumer that actually
    # projects cleaned_text pays it. toks[p] inside the lambda is safe
    # here: no Generate consumes cleaned_text inside this op, so the
    # inferred-filter inlining trap (sliding_gram_sql docstring) has no
    # trigger, and getItem is O(1) either way.
    kept = F.expr(
        f"transform(array_except(sequence(0, size({toks}) - 1), "
        f"coalesce(__removed, array())), p -> {toks}[p])"
    )
    return base.join(removed, "doc_id", "left").select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(rm).cast("int").alias("n_removed"),
        # NULL text must stay NULL (r14 ADVICE): size(NULL toks) = -1
        # fails any size guard, and an otherwise('') branch would
        # silently coerce NULL→'' — a behavior change vs the pre-r13
        # filter/array_join form and a latent oracle mismatch. Non-null
        # text always splits to size >= 1, so isNotNull is the exact
        # guard.
        F.when(F.col(toks).isNotNull(), F.array_join(kept, " "))
        .otherwise(F.lit(None).cast("string"))
        .alias("cleaned_text"),
    )
