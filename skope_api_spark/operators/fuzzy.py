"""Fuzzy string join via 1-deletion neighborhoods (SymSpell banding).

The scale problem: joining two string sets on "edit distance <= 1" is an
all-pairs O(|A| x |B|) comparison. The SymSpell observation turns it into
an equi-join: for any pair within edit distance 1, the two strings SHARE a
member of their deletion neighborhoods (the string itself plus every
1-char-deletion variant):

- substitution at i:  a.delete(i) == b.delete(i)
- insertion into a:   a.delete(i) == b
- deletion from a:    a          == b.delete(i)
- equality:           a == b

So exploding both sides to (variant, term) and equi-joining on the variant
has GUARANTEED recall for distance <= 1 — the same pigeonhole structure as
the simhash band join (`dedup.py`). Candidates are then verified with an
exact ``levenshtein`` and deduplicated. Each term of length L emits L+1
variants, so the shuffle is O(L x rows) skinny strings — never all-pairs.

Generalization note (documented, not implemented): distance <= k needs
k-deletion neighborhoods (C(L, k) variants/term) — the standard SymSpell
trade; k = 1 covers the dominant typo class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column) -> Column:
    """Array of the string itself plus every 1-char-deletion variant."""
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1),
            col.substr(i + 1, F.length(col)),
        ),
    )
    # sequence(1, 0) would count DOWN for the empty string — guard it
    safe = F.when(F.length(col) > 0, deletions).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(F.concat(F.array(col), safe))


def fuzzy_join(
    probes: DataFrame,
    terms: DataFrame,
    *,
    probe_col: str = "probe",
    term_col: str = "term",
    max_distance: int = 1,
    candidate_filter: Column | None = None,
) -> DataFrame:
    """All (probe, term) pairs with edit distance <= 1, via the deletion-
    neighborhood equi-join. ``max_distance`` documents the contract; only
    1 is supported (see module docstring).

    ``candidate_filter`` is an optional predicate over the ``probe`` /
    ``term`` columns applied to candidates BEFORE the levenshtein verify
    and the distinct — when the caller will filter pairs anyway (e.g. an
    entity-resolution rule that only wants insert/delete pairs,
    ``abs(length(probe) − length(term)) == 1``), pushing it here prunes
    the dominant candidate class with a cheap comparison before any
    edit-distance work. The verify-then-distinct order matters at scale:
    a candidate pair appears once per shared deletion variant, and
    verifying first means the distinct only shuffles SURVIVING pairs —
    levenshtein on the few duplicates is map-side CPU, while a
    pre-verify distinct shuffles every colliding candidate.

    Returns distinct (probe, term, dist).
    """
    if max_distance != 1:
        raise ValueError("only max_distance=1 neighborhoods are generated")
    # explode via withColumn: an alias + explode-referencing-the-alias in
    # ONE select trips Spark's lateral-column-alias resolution
    # (INTERNAL_ERROR LateralColumnAliasReference on Spark 4.1)
    p = probes.withColumn(
        "__v", F.explode(deletion_variants(F.col(probe_col)))
    ).select(F.col(probe_col).alias("probe"), "__v")
    t = terms.withColumn(
        "__v", F.explode(deletion_variants(F.col(term_col)))
    ).select(F.col(term_col).alias("term"), "__v")
    cand = p.join(t, "__v").select("probe", "term")
    if candidate_filter is not None:
        cand = cand.where(candidate_filter)
    return (
        cand.select(
            "probe",
            "term",
            F.levenshtein("probe", "term").cast("int").alias("dist"),
        )
        .where(F.col("dist") <= max_distance)
        .distinct()
    )
