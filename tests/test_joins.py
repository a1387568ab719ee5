"""Bloom-filter runtime pruning: no false negatives, exactness independent
of filter size, sane parameter math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skope_api_spark.operators.joins import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_prefilter,
    bloom_pruned_semi_join,
)


@pytest.fixture()
def fact_dim(spark):
    fact = spark.range(0, 2000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(3,), (17,), (42,)], "dk long")
    return fact, dim


class TestBloomParams:
    def test_textbook_values(self):
        m, k = bloom_params(1000, 0.01)
        # -1000 ln(.01)/ln(2)^2 ≈ 9586 → rounded up to a 64 multiple
        assert m % 64 == 0 and 9586 <= m <= 9664
        assert k == 7

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            bloom_params(0, 0.01)
        with pytest.raises(ValueError):
            bloom_params(10, 1.5)


class TestBloomSemantics:
    def test_no_false_negatives_any_size(self, spark, fact_dim):
        """Every true match survives the prefilter at ANY bloom size —
        the property that makes prefilter → exact join exact."""
        fact, dim = fact_dim
        exact = set(
            r.payload
            for r in fact.join(
                dim.select(F.col("dk").alias("k")), "k", "left_semi"
            ).collect()
        )
        for bits, hashes in [(64, 2), (256, 3), (1 << 12, 5)]:
            kept = set(
                r.payload
                for r in bloom_prefilter(
                    fact, dim, "k", "dk", num_bits=bits, num_hashes=hashes
                ).collect()
            )
            assert exact <= kept

    def test_pruned_semi_join_is_exact(self, spark, fact_dim):
        fact, dim = fact_dim
        exact = sorted(
            r.payload
            for r in fact.join(
                dim.select(F.col("dk").alias("k")), "k", "left_semi"
            ).collect()
        )
        for bits in (64, 1 << 12):
            got = sorted(
                r.payload
                for r in bloom_pruned_semi_join(
                    fact, dim, "k", "dk", num_bits=bits, num_hashes=3
                ).collect()
            )
            assert got == exact

    def test_prefilter_actually_prunes(self, spark, fact_dim):
        """With a well-sized bloom, the kept set is far below the fact
        count (3 of 97 key values match → ~62 true rows of 2000)."""
        fact, dim = fact_dim
        m, k = bloom_params(3, 0.01)
        kept = bloom_prefilter(
            fact, dim, "k", "dk", num_bits=m, num_hashes=k
        ).count()
        assert kept < 200  # 2000 rows in; >90% pruned before any shuffle

    def test_empty_dim_prunes_everything(self, spark, fact_dim):
        fact, dim = fact_dim
        empty = dim.where(F.lit(False))
        assert (
            bloom_prefilter(fact, empty, "k", "dk", num_bits=256).count() == 0
        )

    def test_membership_expression_directly(self, spark):
        dim = spark.createDataFrame([(i,) for i in range(50)], "dk long")
        bloom = bloom_build(dim, "dk", num_bits=1 << 12, num_hashes=5)
        probe = spark.range(0, 100).join(F.broadcast(bloom))
        hits = probe.where(
            bloom_might_contain(
                F.col("id"), F.col("bits"), num_bits=1 << 12, num_hashes=5
            )
        )
        ids = sorted(r.id for r in hits.collect())
        assert set(range(50)) <= set(ids)  # members always hit
        assert len(ids) < 60  # ~0 false positives at this sizing


class TestKeyDtypeDiscipline:
    def test_int_vs_bigint_keys_still_match(self, spark):
        """xxhash64 is byte-sensitive: without normalization an int build
        key and a bigint probe key hash differently and true matches are
        silently DROPPED. Both sides normalize to bigint, so the mixed-type
        call must return every true match."""
        fact = spark.range(0, 200).select(
            (F.col("id") % 50).cast("long").alias("k"),
            F.col("id").alias("payload"),
        )
        dim = spark.createDataFrame([(3,), (17,)], "dk int")  # int, not long
        exact = sorted(
            r.payload
            for r in fact.join(
                dim.select(F.col("dk").cast("long").alias("k")),
                "k",
                "left_semi",
            ).collect()
        )
        got = sorted(
            r.payload
            for r in bloom_pruned_semi_join(
                fact, dim, "k", "dk", num_bits=1 << 10, min_fact_bytes=0
            ).collect()
        )
        assert got == exact and len(exact) == 8

    def test_unrelated_key_types_rejected(self, spark):
        fact = spark.range(0, 10).select(F.col("id").alias("k"))
        dim = spark.createDataFrame([("3",)], "dk string")
        with pytest.raises(ValueError, match="dtype mismatch"):
            bloom_prefilter(fact, dim, "k", "dk", num_bits=256)
        with pytest.raises(ValueError, match="dtype mismatch"):
            bloom_pruned_semi_join(fact, dim, "k", "dk", num_bits=256)


class TestCostingGuard:
    def test_small_fact_plans_plain_semi_join(self, spark, fact_dim):
        """Below min_fact_bytes the bloom can't pay for itself (PERF.md's
        measured local-regime loss) — the plan must contain NO bloom
        machinery, just the plain left-semi join."""
        fact, dim = fact_dim
        df = bloom_pruned_semi_join(fact, dim, "k", "dk")  # default guard
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" not in plan and "bit_get" not in plan
        assert df.count() == fact.join(
            dim.select(F.col("dk").alias("k")), "k", "left_semi"
        ).count()

    def test_forced_bloom_path_keeps_machinery(self, spark, fact_dim):
        fact, dim = fact_dim
        df = bloom_pruned_semi_join(fact, dim, "k", "dk", min_fact_bytes=0)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" in plan


class TestBloomScaleBounds:
    def test_oversized_bloom_rejected(self, spark, fact_dim):
        """Past the broadcast-sanity cap the right move is sharding or the
        plain join — a 12 GB 'broadcast' must not be constructible."""
        fact, dim = fact_dim
        with pytest.raises(ValueError, match="MAX_NUM_BITS"):
            bloom_prefilter(fact, dim, "k", "dk", num_bits=1 << 29)

    def test_params_for_huge_n_hit_the_cap(self):
        with pytest.raises(ValueError, match="MAX_NUM_BITS"):
            bloom_params(10**9, 0.01)  # would need ~9.6e9 bits

    def test_tiny_bits_clamped_to_one_word(self, spark, fact_dim):
        """Sub-word sizes round up to 64 bits (still exact — only the FP
        rate suffers)."""
        fact, dim = fact_dim
        exact = fact.join(
            dim.select(F.col("dk").alias("k")), "k", "left_semi"
        ).count()
        got = bloom_pruned_semi_join(
            fact, dim, "k", "dk", num_bits=8, num_hashes=2
        ).count()
        assert got == exact


class TestPublicPairDtypeCanonicalization:
    def test_int_key_build_probe_pair_matches(self, spark):
        """The public bloom_build + bloom_might_contain pair with INT keys
        on both sides: string canonicalization means every integer width
        hashes identically, so members always hit."""
        dim = spark.createDataFrame([(i,) for i in range(50)], "dk int")
        bloom = bloom_build(dim, "dk", num_bits=1 << 12, num_hashes=5)
        probe = (
            spark.range(0, 100)
            .select(F.col("id").cast("int").alias("id"))
            .join(F.broadcast(bloom))
        )
        hits = probe.where(
            bloom_might_contain(
                F.col("id"), F.col("bits"), num_bits=1 << 12, num_hashes=5
            )
        )
        ids = {r.id for r in hits.collect()}
        assert set(range(50)) <= ids  # no silent drops

    def test_mixed_width_build_vs_probe(self, spark):
        """Build from INT dim, probe with BIGINT fact — the exact dtype
        drift the canonicalization exists for."""
        dim = spark.createDataFrame([(3,), (17,)], "dk int")
        bloom = bloom_build(dim, "dk", num_bits=256, num_hashes=3)
        probe = spark.range(0, 30).join(F.broadcast(bloom))  # id: bigint
        hits = probe.where(
            bloom_might_contain(
                F.col("id"), F.col("bits"), num_bits=256, num_hashes=3
            )
        )
        assert {3, 17} <= {r.id for r in hits.collect()}
