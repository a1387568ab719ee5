"""Deterministic sampling + sequence packing for training-data assembly.

The two operators a pipeline runs AFTER cleaning/dedup to turn a corpus
into training shards:

- **stratified hash sampling** — per-stratum keep-fractions (the "data
  mixing" step: e.g. 100% books, 30% web). Uses an md5-derived uniform
  hash of the document id, so (a) the sample is deterministic and
  reproducible across runs/engines (no RNG state), and (b) re-running with
  a larger fraction yields a superset (hash thresholds nest). A pure
  filter in the scan projection — no shuffle, prunes at full scan speed.

- **token-budget packing** — assign documents to fixed-token-budget bins
  ("~budget tokens per shard"). Greedy bin packing is inherently
  sequential, so the scale shape is: hash documents into ``n_shards``
  independent shards, then run the sequential fill WITHIN each shard via a
  partitioned window (running token cumsum → bin = floor(start/budget)).
  One shuffle (the window partition), shards fill in parallel, and every
  bin overflows its budget by at most one document — the standard
  distributed relaxation of first-fit.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from skope_api_spark.operators.dedup import md5_long

_HASH_MOD = 1_000_000


def _uniform_hash(col):
    return md5_long(col.cast("string")) % _HASH_MOD


def stratified_hash_sample(
    df: DataFrame,
    fractions: Mapping[str, float],
    *,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each stratum at its configured fraction, deterministically.

    A document survives iff ``hash(id) / MOD < fraction(stratum)`` — no
    RNG, no sampling shuffle; strata not in ``fractions`` fall back to
    ``default_fraction``.
    """
    frac = None
    for stratum, f in fractions.items():
        cond = F.col(stratum_col) == stratum
        frac = F.when(cond, F.lit(float(f))) if frac is None else frac.when(
            cond, F.lit(float(f))
        )
    frac = (
        frac.otherwise(F.lit(float(default_fraction)))
        if frac is not None
        else F.lit(float(default_fraction))
    )
    return df.where(_uniform_hash(F.col(id_col)) < frac * _HASH_MOD)


def pack_documents(
    df: DataFrame,
    *,
    budget_tokens: int,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to (shard, bin) training-shard slots.

    Within a shard (hash-assigned, so shards are balanced and the layout
    is deterministic), documents fill bins in ``id`` order: a document
    starts at the running token offset of its predecessors and lands in
    ``floor(start / budget)``. Returns
    (doc_id, n_tokens, shard, bin_id) — every (shard, bin_id) group is a
    ready-to-concatenate training shard of ~``budget_tokens`` tokens.
    """
    n_tok = F.size(F.split(F.col(text_col), " "))
    shard = (_uniform_hash(F.col(id_col)) % n_shards).cast("int")
    # the window resolves against the post-select schema, where the id
    # column is always named doc_id (regardless of the input's id_col)
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            n_tok.alias("n_tokens"),
            shard.alias("shard"),
        )
        .withColumn("__end", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "n_tokens",
            "shard",
            F.floor((F.col("__end") - F.col("n_tokens")) / budget_tokens)
            .cast("int")
            .alias("bin_id"),
        )
    )


def token_budget_mixing(
    df: DataFrame,
    budgets: Mapping[str, int],
    *,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    default_budget: int = 0,
) -> DataFrame:
    """Budget-driven source mixing: instead of hand-picked fractions
    (``stratified_hash_sample``), each source gets a TOKEN budget and the
    keep-fraction is derived from the measured totals —
    ``min(1, budget / total_tokens(source))`` — the way a training-data
    mix is actually specified ("200 B tokens of web, all of books").

    Two scans composed lazily: a per-source token-total aggregation
    (#sources rows — broadcast back), then the same deterministic
    md5-threshold filter as stratified sampling. No driver-side
    collection; budgets over actuals clamp to keep-everything.

    Returns the surviving rows with ``__frac`` (the applied fraction)
    attached for auditability.
    """
    n_tok = F.size(F.split(F.col(text_col), " "))
    totals = df.groupBy(source_col).agg(
        F.sum(n_tok).cast("double").alias("__tot")
    )
    budget = None
    for src, b in budgets.items():
        cond = F.col(source_col) == src
        budget = (
            F.when(cond, F.lit(float(b)))
            if budget is None
            else budget.when(cond, F.lit(float(b)))
        )
    budget = (
        budget.otherwise(F.lit(float(default_budget)))
        if budget is not None
        else F.lit(float(default_budget))
    )
    fracs = totals.select(
        source_col, F.least(F.lit(1.0), budget / F.col("__tot")).alias("__frac")
    )
    return df.join(F.broadcast(fracs), source_col).where(
        _uniform_hash(F.col(id_col)) < F.col("__frac") * _HASH_MOD
    )


def weighted_sample(
    df: DataFrame,
    *,
    weight_col,
    id_col: str = "doc_id",
    k: int = 50,
    key_col: str = "__wkey",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006): each row gets key ``ln(u) / w`` with ``u`` the
    md5-uniform of its id in (0, 1]; the k largest keys are a sample
    where P(selection) ∝ weight — the quality-weighted data-selection
    primitive ("sample 1M documents proportional to quality score").

    Same determinism story as stratified sampling: no RNG state, the
    sample is reproducible across runs/engines, and the md5 recipe is the
    shared ``md5_long`` contract. ``orderBy().limit(k)`` is a distributed
    TakeOrderedAndProject (per-partition top-k, tiny merge) — never a
    global sort. Keys are rounded to 6 decimals with an id tie-break so
    the selection is stable cross-engine.
    """
    u = (_uniform_hash(F.col(id_col)) + 1) / (_HASH_MOD + 1.0)
    key = F.round(F.log(u) / weight_col, 6)
    return (
        df.withColumn(key_col, key)
        .orderBy(F.desc(key_col), id_col)
        .limit(k)
    )


def temperature_mixing(
    df: DataFrame,
    *,
    alpha: float = 0.3,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-LM sampling
    rule, XLM-R style): with natural token shares ``p_s``, the target mix
    is ``q_s ∝ p_s^alpha`` — alpha < 1 flattens the distribution,
    upsampling rare sources relative to dominant ones. Realized as a
    deterministic per-source keep-RATE ``r_s ∝ p_s^(alpha-1)`` normalized
    so the rarest source keeps everything (max rate = 1), then the shared
    md5-threshold filter; the surviving corpus's expected token shares
    are exactly the tempered distribution.

    Plan shape: one per-source token-total aggregation (#sources rows),
    the rate computed against a broadcast 1-row max — both tiny broadcast
    sides — then a pure filter in the corpus scan projection. No
    corpus-sized shuffle; same determinism/nesting story as
    ``stratified_hash_sample``.
    """
    n_tok = F.size(F.split(F.col(text_col), " "))
    totals = df.groupBy(source_col).agg(
        F.sum(n_tok).cast("double").alias("__tot")
    )
    # p_s^(alpha-1) with p_s = tot_s / N: the 1/N factors cancel in the
    # max-normalization, so rates use raw totals directly.
    raw = totals.select(
        source_col, F.pow(F.col("__tot"), alpha - 1.0).alias("__raw")
    )
    mx = raw.agg(F.max("__raw").alias("__mx"))
    fracs = raw.crossJoin(F.broadcast(mx)).select(
        source_col, (F.col("__raw") / F.col("__mx")).alias("__frac")
    )
    return df.join(F.broadcast(fracs), source_col).where(
        _uniform_hash(F.col(id_col)) < F.col("__frac") * _HASH_MOD
    )


def pack_training_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    seq_len: int = 64,
    n_shards: int = 8,
) -> DataFrame:
    """Concat-and-chunk example packing — the pretraining "group_texts"
    step at corpus scale: documents are hash-assigned to shards,
    concatenated in deterministic (doc_id) order within each shard, and
    cut into EXACT ``seq_len``-token sequences; each shard's trailing
    partial sequence is dropped (standard packing discards the remainder
    rather than pad). Differs from ``pack_documents`` (bin packing of
    whole docs under a budget): here documents are split across sequence
    boundaries so every emitted example has exactly ``seq_len`` tokens.

    Scale shape: the running offset is a window cumsum over doc-level
    rows (one skinny shuffle of (shard, doc_id, n_tokens)); tokens then
    regroup into sequences with one token-level shuffle on
    (shard, seq_id) — the op's inherent cost, since a sequence can span
    documents. Shard count bounds window-partition size; at 100 TB
    n_shards scales with the cluster so no shard's doc list is hot.

    Returns (shard, seq_id, seq_text), seq_id dense from 0 per shard.
    """
    if seq_len < 1 or n_shards < 1:
        raise ValueError("seq_len and n_shards must be >= 1")
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(md5_long(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = base.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w), F.lit(0))
    )
    positions = offs.select(
        "shard",
        F.col("__offset"),
        F.posexplode("__toks").alias("__p", "tok"),
    ).select(
        "shard",
        ((F.col("__offset") + F.col("__p")) / seq_len)
        .cast("long")
        .alias("seq_id"),
        F.pmod(F.col("__offset") + F.col("__p"), F.lit(seq_len)).alias(
            "__sp"
        ),
        "tok",
    )
    return (
        positions.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("__cnt"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__sp", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("seq_text"),
        )
        .where(F.col("__cnt") == seq_len)  # drop each shard's remainder
        .select("shard", "seq_id", "seq_text")
    )


def hash_split(
    df: DataFrame,
    splits: Mapping[str, float],
    *,
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment by id hash.

    Each row lands in exactly one named split: the uniform id hash falls
    into consecutive half-open intervals sized by the (normalized-to-≤1)
    fractions, in the mapping's insertion order; any hash mass past the
    last boundary gets NULL (caller-visible "unassigned" remainder). No
    RNG, no shuffle, stable across runs/engines/partitionings — the same
    document can never leak from train into test on a re-run, and
    membership is reproducible from the id alone.

    Returns ``df`` plus ``out_col``; filter per split downstream (the
    predicate pushes into the scan).
    """
    fracs = [(name, float(f)) for name, f in splits.items()]
    if not fracs or any(f < 0 for _, f in fracs):
        raise ValueError("splits must be a non-empty map of >= 0 fractions")
    if sum(f for _, f in fracs) > 1.0 + 1e-9:
        raise ValueError("split fractions must sum to <= 1")
    h = _uniform_hash(F.col(id_col))
    expr = None
    upper = 0.0
    for name, f in fracs:
        upper += f
        cond = h < upper * _HASH_MOD
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr)


def cap_per_group(
    df: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Deterministic "at most k rows per group" — the crawl-pipeline
    domain cap ("keep <= N pages per host"). Rows within a group are
    ranked by the md5-uniform of their id (id tie-break), so the kept set
    is reproducible across runs/engines and UNBIASED in arrival order —
    capping by file order would keep whatever the scan happened to read
    first.

    One window shuffle on the group key. A pathologically hot group makes
    a hot window partition; for those, pre-filter with the hot-key
    detector (operators/skew.py) or raise the cap tier-wise.
    """
    w = W.partitionBy(group_col).orderBy(
        _uniform_hash(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def unimax_allocation(
    df: DataFrame,
    *,
    budget_frac: float = 0.4,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """The |L|-row UniMax water-filling allocation table (see
    ``unimax_mixing``): one row per language present in the corpus with
    ``__s`` (lang tokens), ``__capped``, ``__num``, ``__den``. Total over
    the language dimension by construction — a language whose uncapped
    share ends up keeping zero documents still appears here, which is
    what reporting queries must join kept-counts onto (deriving the
    table from kept rows instead silently drops such languages).

    The budget B = floor(budget_frac · total) is computed in EXACT
    rational arithmetic: budget_frac is taken as the decimal literal of
    its repr (``Fraction(str(...))``, e.g. 0.3 → 3/10), and the floor is
    the remainder-subtraction identity over decimal(38,0) — a double
    multiply would floor one short whenever the fraction's binary double
    sits below the rational and t·frac is exactly integral.
    """
    from fractions import Fraction

    from pyspark.sql import Window

    frac = Fraction(str(budget_frac))
    if not 0 <= frac <= 1:
        raise ValueError(f"budget_frac must be in [0, 1], got {budget_frac}")
    num, den = frac.numerator, frac.denominator

    n_tok = F.size(F.split(F.col(text_col), " "))
    # materialize the |L|-row language table ONCE: every downstream stage
    # (totals, ranks, flags, first-failure, capped totals, the alloc
    # broadcast) derives from it, and without the checkpoint each branch
    # re-scans the corpus — 18 scans in the planned query vs 2 with it
    sizes = (
        df.groupBy(lang_col)
        .agg(F.sum(n_tok).cast("long").alias("__s"))
        .localCheckpoint(eager=True)
    )
    tot = sizes.agg(
        F.sum("__s").alias("__t"), F.count(F.lit(1)).alias("__l")
    )
    w = Window.orderBy("__s", lang_col)
    ranked = (
        sizes.crossJoin(F.broadcast(tot))
        .withColumn("__r", F.row_number().over(w))
        .withColumn(
            "__pp",
            F.coalesce(
                F.sum("__s").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "__tn",
            F.col("__t").cast("decimal(38,0)")
            * F.lit(num).cast("decimal(18,0)"),
        )
        .withColumn(
            # exact floor(t·num/den): subtract the remainder, then the
            # decimal division is an exact integer — no double rounding
            "__bud",
            (
                (F.col("__tn") - F.pmod(F.col("__tn"), F.lit(den)))
                / F.lit(den)
            ).cast("long"),
        )
        .drop("__tn")
    )
    flagged = ranked.withColumn(
        "__flag",
        F.col("__s") * (F.col("__l") - F.col("__r") + 1)
        <= F.col("__bud") - F.col("__pp"),
    )
    # capped = every rank before the FIRST failure (ascending sizes make
    # the water-filling condition monotone; the min-rank guard keeps the
    # prefix semantics exact even on degenerate inputs)
    ff = flagged.agg(
        F.min(F.when(~F.col("__flag"), F.col("__r"))).alias("__ff_raw")
    )
    enr = (
        flagged.crossJoin(F.broadcast(ff))
        .withColumn(
            "__capped",
            F.col("__r") < F.coalesce("__ff_raw", F.col("__l") + 1),
        )
    )
    ct = enr.agg(
        F.coalesce(
            F.sum(F.when(F.col("__capped"), F.col("__s"))), F.lit(0)
        ).alias("__ctot"),
        F.coalesce(
            F.sum(F.when(~F.col("__capped"), F.lit(1))), F.lit(0)
        ).alias("__den"),
    )
    return enr.crossJoin(F.broadcast(ct)).select(
        lang_col,
        "__s",
        "__capped",
        (F.col("__bud") - F.col("__ctot")).alias("__num"),
        "__den",
    )


def unimax_mixing(
    df: DataFrame,
    *,
    budget_frac: float = 0.4,
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    alloc: DataFrame | None = None,
) -> DataFrame:
    """UniMax language mixing (Chung et al. 2023, public): allocate a
    token budget B = floor(budget_frac · total) across languages by
    water-filling — every language gets up to one full epoch (its whole
    corpus) but never more than the fair share of what remains. With
    sizes s_1 ≤ s_2 ≤ … (ascending), language l is "capped" (kept whole)
    iff s_l · (L − l + 1) ≤ B − Σ_{j<l} s_j — an ALL-INTEGER window
    predicate, so the allocation is exact and engine-independent; the
    uncapped tail splits the leftover budget equally (num/den rational).
    The budget itself is exact rational arithmetic — see
    ``unimax_allocation``, which also documents why reporting joins must
    start from the allocation table, not from kept rows.

    Selection is the shared md5-threshold at doc granularity: keep an
    uncapped-language doc iff u · den · s_l < num · M, compared in
    decimal(38,0) cross-multiplication — no float threshold, no overflow
    at petabyte token counts. Plan: one corpus aggregation to the
    language table (|L| rows), tiny window/flag passes on it, one
    broadcast join back, and a pure filter — the corpus never shuffles.

    Pass a precomputed ``alloc`` (from ``unimax_allocation``) to share
    the allocation pass with a reporting query; it derives from a
    checkpointed language table, so reuse does not rescan the corpus.

    Returns the kept rows with lang-level columns ``__s`` (lang tokens),
    ``__capped``, ``__num``, ``__den`` for reporting.
    """
    if alloc is None:
        alloc = unimax_allocation(
            df, budget_frac=budget_frac, lang_col=lang_col, text_col=text_col
        )
    joined = df.join(F.broadcast(alloc), lang_col)
    d20 = lambda c: c.cast("decimal(20,0)")  # noqa: E731
    keep = F.col("__capped") | (
        _uniform_hash(F.col(id_col)).cast("decimal(7,0)")
        * F.col("__den").cast("decimal(4,0)")
        * d20(F.col("__s"))
        < d20(F.col("__num")) * F.lit(_HASH_MOD).cast("decimal(7,0)")
    )
    return joined.where(keep)


def dsir_select(
    df: DataFrame,
    target,
    *,
    k_buckets: int = 128,
    top_n: int = 100,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = ":dsir",
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, public): score every raw
    document by its hashed-feature importance weight between a TARGET
    token distribution (rows where ``target`` is true) and the RAW
    distribution, then resample top_n docs by Gumbel-top-k — sampling
    without replacement proportional to exp(score), with deterministic
    md5-derived Gumbel noise so the selection is engine-replayable.

    Features are hashed unigram buckets (md5_long(token) % k_buckets —
    the paper uses hashed n-grams; the bucket shape is identical), with
    add-``alpha`` smoothing on both distributions. Plan: the corpus
    tokenizes in-scan twice (fit the K-bucket distributions, then score)
    — the inherent two-pass of fit-then-apply; the bucket table is K
    rows broadcast both times, the per-doc score is one partial-agg
    groupBy, and the final cut is a TakeOrdered top_n. No corpus-sized
    shuffle beyond the doc-level score aggregation.
    """
    tok = F.explode(F.split(F.col(text_col), " ")).alias("__tok")
    tb = df.select(
        F.col(id_col), target.alias("__is_tgt"), tok
    ).select(
        id_col,
        "__is_tgt",
        (md5_long(F.col("__tok")) % k_buckets).alias("__b"),
    )
    bs = tb.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__n_raw"),
        F.count(F.when(F.col("__is_tgt"), 1)).alias("__n_tgt"),
    )
    tot = bs.agg(
        F.sum("__n_raw").alias("__t_raw"), F.sum("__n_tgt").alias("__t_tgt")
    )
    ak = alpha * k_buckets
    w = bs.crossJoin(F.broadcast(tot)).select(
        "__b",
        (
            F.log((F.col("__n_tgt") + alpha) / (F.col("__t_tgt") + ak))
            - F.log((F.col("__n_raw") + alpha) / (F.col("__t_raw") + ak))
        ).alias("__wt"),
    )
    scores = tb.join(F.broadcast(w), "__b").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("__wt").alias("score")
    )
    u = (
        _uniform_hash(
            F.concat(F.col(id_col).cast("string"), F.lit(salt))
        ).cast("double")
        + 0.5
    ) / _HASH_MOD
    keyed = scores.select(
        id_col,
        "n_tokens",
        "score",
        (F.col("score") - F.log(-F.log(u))).alias("gumbel_key"),
    )
    # rank on the ROUNDED key with id tie-break: sub-1e-6 cross-engine
    # accumulation noise cannot flip the selection boundary
    return keyed.orderBy(
        F.round("gumbel_key", 6).desc(), F.col(id_col)
    ).limit(top_n)
