"""Deterministic sampling + packing invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from skope_api_spark.operators.sampling import pack_documents, stratified_hash_sample
from skope_api_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


class TestStratifiedSample:
    def test_fractions_approximately_hold(self, spark):
        docs = load(spark, SF_DIR, "documents")
        n_en = docs.where(F.col("lang") == "en").count()
        kept = stratified_hash_sample(docs, {"en": 0.5}, default_fraction=0.0)
        k = kept.count()
        assert kept.where(F.col("lang") != "en").count() == 0
        assert 0.3 * n_en < k < 0.7 * n_en  # hash-uniformity, small corpus

    def test_larger_fraction_is_superset(self, spark):
        """Hash thresholds nest: growing a stratum's fraction only ADDS
        documents — reruns of a mixing config never churn the sample."""
        docs = load(spark, SF_DIR, "documents")
        small = stratified_hash_sample(docs, {"en": 0.2}, default_fraction=0.1)
        big = stratified_hash_sample(docs, {"en": 0.6}, default_fraction=0.3)
        assert small.join(big, "doc_id", "left_anti").count() == 0

    def test_deterministic_across_runs(self, spark):
        docs = load(spark, SF_DIR, "documents")
        a = {r.doc_id for r in stratified_hash_sample(docs, {"en": 0.5}).collect()}
        b = {r.doc_id for r in stratified_hash_sample(docs, {"en": 0.5}).collect()}
        assert a == b and len(a) > 0


class TestPackDocuments:
    def test_custom_id_col_resolves(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, "d e")], "vec_id long, text string"
        )
        out = pack_documents(df, budget_tokens=4, n_shards=1, id_col="vec_id")
        assert {r.doc_id for r in out.collect()} == {1, 2}

    def test_bins_respect_budget_within_one_doc(self, spark):
        """Every bin's token total is < budget + its largest document (the
        first-fit relaxation bound), and packing covers every document."""
        docs = load(spark, SF_DIR, "documents")
        out = pack_documents(docs, budget_tokens=512, n_shards=4).cache()
        assert out.count() == docs.count()
        per_bin = out.groupBy("shard", "bin_id").agg(
            F.sum("n_tokens").alias("total"), F.max("n_tokens").alias("biggest")
        )
        assert per_bin.where(F.col("total") >= 512 + F.col("biggest")).count() == 0
        # bins are dense: 0..max with no gaps inside each shard
        bins = per_bin.groupBy("shard").agg(
            F.count(F.lit(1)).alias("n"), (F.max("bin_id") + 1).alias("hi")
        )
        assert bins.where(F.col("n") != F.col("hi")).count() == 0
