"""Text-analysis operators for training-data pipelines.

All JVM-native (split / higher-order array functions / regexp) — no Python
UDFs, so they run inside whole-stage codegen at full scan throughput.

- quality stats: token counts, type-token ratio, stopword ratio, length
  shape — the usual cheap quality-filter features.
- token counting: whitespace tokens plus a BPE-ish regex token count
  (letter runs / digit runs / other symbols).
- language-ID: profile-based n-gram heuristic — build per-language top-N
  token profiles from a labeled sample, classify by profile overlap.
  (Two aggregations + one equi-join; profiles are tiny and broadcast.)
- fingerprinting: bottom-k sketch of md5 shingle hashes per document
  (winnowing-style); md5 keeps fingerprints engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from skope_api_spark.operators.dedup import with_token_shingles

STOPWORDS = ("a", "the")
BPE_ISH = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def quality_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality features.

    avg_token_len uses the identity (chars - separators) / n for
    single-space-separated text — no per-token length pass needed.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        n.cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_distinct_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n, 4).alias("type_token_ratio"),
        F.round((F.length(text_col) - (n - 1)) / n, 4).alias("avg_token_len"),
        F.round(n_stop / n, 4).alias("stopword_ratio"),
    )


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace token count and a BPE-ish regex token count."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("int").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0))
        .cast("int")
        .alias("n_bpe_tokens"),
    )


def langid_profiles(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    *,
    top_n: int = 10,
) -> DataFrame:
    """Per-language profile: top-N tokens by frequency (ties → token asc)."""
    tok = df.select(
        F.col(lang_col).alias("profile_lang"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    counts = tok.groupBy("profile_lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("profile_lang").orderBy(F.desc("n"), "tok")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_n)
        .select("profile_lang", "tok")
    )


def langid_classify(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    *,
    top_n: int = 10,
) -> DataFrame:
    """Classify each doc as the language whose profile overlaps most.

    Overlap = |distinct doc tokens ∩ profile| ; ties break lang-ascending.
    Profiles are tiny ((#langs · top_n) rows) → broadcast equi-join on token.
    Returns (doc_id, lang, predicted_lang, overlap).
    """
    profiles = langid_profiles(df, text_col, lang_col, top_n=top_n)
    doc_toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    )
    overlaps = (
        doc_toks.join(F.broadcast(profiles), "tok")
        .groupBy("doc_id", "profile_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("overlap"), "profile_lang")
    best = (
        overlaps.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "doc_id",
            F.col("profile_lang").alias("predicted_lang"),
            F.col("overlap").cast("int").alias("overlap"),
        )
    )
    truth = df.select(F.col(id_col).alias("doc_id"), F.col(lang_col).alias("lang"))
    return truth.join(best, "doc_id", "left")


def bottomk_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    k: int = 4,
) -> DataFrame:
    """Bottom-k document fingerprint: the k smallest md5(shingle) digests.

    A winnowing-style sketch — documents sharing most shingles share most of
    the sketch. Returns (doc_id, rk, fp) rows, rk in 1..k.
    """
    sh = with_token_shingles(df, text_col, shingle_n, "shingles")
    ex = sh.select(
        F.col(id_col).alias("doc_id"), F.explode("shingles").alias("shingle")
    ).select("doc_id", F.md5("shingle").alias("fp"))
    w = W.partitionBy("doc_id").orderBy("fp")
    return (
        ex.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("doc_id", F.col("rk").cast("int").alias("rk"), "fp")
    )
