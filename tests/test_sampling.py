"""Deterministic sampling + packing invariants."""

from __future__ import annotations

import pytest
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


class TestTokenBudgetMixing:
    def test_budget_over_total_keeps_everything(self, spark):
        from skope_api_spark.operators.sampling import token_budget_mixing

        docs = spark.createDataFrame(
            [(i, "w " * 9 + "w", "a") for i in range(20)]
            + [(100 + i, "w " * 9 + "w", "b") for i in range(20)],
            "doc_id long, text string, source string",
        )
        # source a: budget 10x total -> frac clamps to 1.0 (all 20 kept);
        # source b: zero default budget -> none kept
        out = token_budget_mixing(docs, {"a": 2000})
        rows = out.collect()
        assert len(rows) == 20
        assert all(r.source == "a" and r["__frac"] == 1.0 for r in rows)

    def test_fraction_derived_from_measured_totals(self, spark):
        from skope_api_spark.operators.sampling import token_budget_mixing

        docs = spark.createDataFrame(
            [(i, "w " * 9 + "w", "a") for i in range(200)],
            "doc_id long, text string, source string",
        )
        # 200 docs x 10 tokens = 2000 total; budget 500 -> frac 0.25
        out = token_budget_mixing(docs, {"a": 500})
        rows = out.collect()
        assert all(abs(r["__frac"] - 0.25) < 1e-12 for r in rows)
        # md5-threshold sampling is unbiased-ish: expect ~50 of 200
        assert 25 <= len(rows) <= 85

    def test_nested_budgets_are_supersets(self, spark):
        from skope_api_spark.operators.sampling import token_budget_mixing

        docs = spark.createDataFrame(
            [(i, "x y z", "a") for i in range(100)],
            "doc_id long, text string, source string",
        )
        small = {r.doc_id for r in token_budget_mixing(docs, {"a": 60}).collect()}
        big = {r.doc_id for r in token_budget_mixing(docs, {"a": 150}).collect()}
        assert small <= big  # hash thresholds nest


class TestWeightedSample:
    def test_heavier_rows_selected_more_often(self, spark):
        from skope_api_spark.operators.sampling import weighted_sample

        # 200 light rows (w=1) + 200 heavy rows (w=50): a 100-row sample
        # should be dominated by heavy rows
        rows = [(i, 1.0) for i in range(200)] + [
            (1000 + i, 50.0) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "doc_id long, w double")
        out = weighted_sample(df, weight_col=F.col("w"), k=100)
        heavy = sum(1 for r in out.collect() if r.doc_id >= 1000)
        assert heavy > 80

    def test_deterministic_across_runs(self, spark):
        from skope_api_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(i, float(1 + i % 7)) for i in range(300)], "doc_id long, w double"
        )
        a = [r.doc_id for r in weighted_sample(df, weight_col=F.col("w"), k=30).collect()]
        b = [r.doc_id for r in weighted_sample(df, weight_col=F.col("w"), k=30).collect()]
        assert a == b

    def test_take_ordered_not_global_sort(self, spark):
        from skope_api_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(i, 1.0) for i in range(100)], "doc_id long, w double"
        )
        plan = (
            weighted_sample(df, weight_col=F.col("w"), k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestPackTrainingSequences:
    def test_sequences_exact_length_and_span_documents(self, spark):
        from skope_api_spark.operators.sampling import pack_training_sequences

        # one shard -> pure concat in doc_id order; 10 tokens over 3 docs
        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "e f g"), (3, "h i j")],
            "doc_id long, text string",
        )
        rows = pack_training_sequences(
            docs, seq_len=4, n_shards=1
        ).orderBy("seq_id").collect()
        # 10 tokens -> 2 full sequences, 2-token remainder dropped
        assert [(r.seq_id, r.seq_text) for r in rows] == [
            (0, "a b c d"),
            (1, "e f g h"),  # spans docs 2 and 3
        ]

    def test_remainder_dropped_per_shard(self, spark):
        from skope_api_spark.operators.sampling import pack_training_sequences

        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        assert (
            pack_training_sequences(docs, seq_len=4, n_shards=1).count() == 0
        )

    def test_deterministic_across_runs(self, spark):
        from skope_api_spark.operators.sampling import pack_training_sequences
        from skope_api_spark.tables import load

        docs = load(spark, "/root/testdata/sf0.001", "documents")
        a = sorted(
            (r.shard, r.seq_id, r.seq_text)
            for r in pack_training_sequences(docs).collect()
        )
        b = sorted(
            (r.shard, r.seq_id, r.seq_text)
            for r in pack_training_sequences(docs).collect()
        )
        assert a == b and len(a) > 0

    def test_validation(self, spark):
        from skope_api_spark.operators.sampling import pack_training_sequences

        docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            pack_training_sequences(docs, seq_len=0)
        with pytest.raises(ValueError):
            pack_training_sequences(docs, n_shards=0)


class TestHashSplit:
    def test_partition_is_disjoint_exhaustive_deterministic(self, spark):
        from skope_api_spark.operators.sampling import hash_split

        docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
        out = hash_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
        by_doc = {r.doc_id: r.split for r in out}
        assert len(by_doc) == 2000  # one verdict per row
        assert set(by_doc.values()) == {"train", "val", "test"}
        # roughly the configured proportions
        n_train = sum(1 for s in by_doc.values() if s == "train")
        assert 0.75 < n_train / 2000 < 0.85
        # a second run assigns identically (no RNG)
        again = {
            r.doc_id: r.split
            for r in hash_split(
                docs, {"train": 0.8, "val": 0.1, "test": 0.1}
            ).collect()
        }
        assert again == by_doc

    def test_remainder_is_null(self, spark):
        from skope_api_spark.operators.sampling import hash_split

        docs = spark.range(0, 500).select(F.col("id").alias("doc_id"))
        out = hash_split(docs, {"train": 0.5}).collect()
        nulls = sum(1 for r in out if r.split is None)
        assert 0.4 < nulls / 500 < 0.6  # ~half unassigned, visible as NULL

    def test_bad_fractions_rejected(self, spark):
        from skope_api_spark.operators.sampling import hash_split

        docs = spark.range(0, 5).select(F.col("id").alias("doc_id"))
        with pytest.raises(ValueError, match="sum"):
            hash_split(docs, {"a": 0.9, "b": 0.2})
        with pytest.raises(ValueError, match="fractions"):
            hash_split(docs, {})


class TestUniMax:
    def _docs(self, spark, sizes):
        # one doc per (lang, i) with `per` single-char tokens each
        rows = []
        did = 0
        for lang, n_docs, per in sizes:
            for _ in range(n_docs):
                rows.append((did, lang, " ".join(["x"] * per)))
                did += 1
        return spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )

    def test_water_filling_allocation(self, spark):
        from skope_api_spark.operators.sampling import unimax_mixing

        # sizes: a=10, b=20, c=70 tokens; B = floor(0.5*100) = 50
        # a capped (10*3<=50), b capped (20*2<=40), c uncapped num=20 den=1
        docs = self._docs(spark, [("a", 1, 10), ("b", 2, 10), ("c", 7, 10)])
        kept = unimax_mixing(docs, budget_frac=0.5)
        rows = {
            r["lang"]: r
            for r in kept.select(
                "lang", "__s", "__capped", "__num", "__den"
            )
            .dropDuplicates(["lang"])
            .collect()
        }
        assert rows["a"]["__capped"] and rows["b"]["__capped"]
        assert not rows["c"]["__capped"]
        assert rows["c"]["__num"] == 20 and rows["c"]["__den"] == 1
        # capped languages keep EVERY doc
        per_lang = {
            r["lang"]: r["n"]
            for r in kept.groupBy("lang").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert per_lang["a"] == 1 and per_lang["b"] == 2
        # uncapped language keeps a strict, deterministic subset
        assert 0 <= per_lang.get("c", 0) < 7
        again = {
            r["lang"]: r["n"]
            for r in unimax_mixing(docs, budget_frac=0.5)
            .groupBy("lang")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        assert again == per_lang

    def test_budget_covers_everything(self, spark):
        from skope_api_spark.operators.sampling import unimax_mixing

        docs = self._docs(spark, [("a", 2, 5), ("b", 3, 5)])
        kept = unimax_mixing(docs, budget_frac=1.0)
        assert kept.count() == 5  # all capped, all docs kept

    def test_budget_is_exact_rational(self, spark):
        from skope_api_spark.operators.sampling import unimax_allocation

        # 0.3 as a binary double is 0.299999...988, so a double multiply
        # gives floor(10 * 0.3) = 2; the exact rational floor is 3. One
        # 10-token language: capped iff s*1 <= B, i.e. iff B >= 10 — use
        # B itself via num/den of the uncapped branch to read it back.
        docs = self._docs(spark, [("a", 1, 4), ("b", 1, 6)])  # total 10
        alloc = {
            r["lang"]: r
            for r in unimax_allocation(docs, budget_frac=0.3).collect()
        }
        # B = floor(0.3 * 10) = 3 exactly: a (4 tokens) is NOT capped
        # (4*2 > 3), so leftover num = B - 0 = 3 — the double-multiply
        # bug would report num = 2 here
        assert not alloc["a"]["__capped"] and not alloc["b"]["__capped"]
        assert alloc["a"]["__num"] == 3 and alloc["a"]["__den"] == 2

    def test_allocation_total_even_when_lang_keeps_zero_docs(self, spark):
        from skope_api_spark.operators.sampling import (
            unimax_allocation,
            unimax_mixing,
        )

        # c is one 90-token doc: uncapped, and its md5 threshold keeps it
        # with probability num/(den*s) — whether or not it survives, the
        # ALLOCATION table must still carry all three languages (the
        # round-7 advice item: deriving alloc from kept rows drops a
        # zero-keep language)
        docs = self._docs(spark, [("a", 1, 3), ("b", 1, 3), ("c", 1, 90)])
        alloc = unimax_allocation(docs, budget_frac=0.1)
        assert sorted(r["lang"] for r in alloc.collect()) == ["a", "b", "c"]
        kept_langs = {
            r["lang"]
            for r in unimax_mixing(
                docs, budget_frac=0.1, alloc=alloc
            ).collect()
        }
        assert kept_langs <= {"a", "b", "c"}


class TestDSIR:
    def test_selects_target_looking_docs(self, spark):
        from pyspark.sql import functions as F

        from skope_api_spark.operators.sampling import dsir_select

        # target docs share a vocab disjoint from the rest; raw docs that
        # LOOK like the target must outrank the others
        tgt_text = " ".join(f"alpha{i % 7}" for i in range(40))
        raw_text = " ".join(f"omega{i % 7}" for i in range(40))
        rows = (
            [(i, "en", tgt_text) for i in range(10)]
            + [(100 + i, "xx", tgt_text) for i in range(5)]  # en-looking
            + [(200 + i, "xx", raw_text) for i in range(20)]
        )
        docs = spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )
        out = dsir_select(
            docs, F.col("lang") == "en", k_buckets=64, top_n=15
        ).collect()
        picked = {r["doc_id"] for r in out}
        # every selected doc uses the target vocabulary
        assert picked <= set(range(10)) | {100 + i for i in range(5)}
        scores = {r["doc_id"]: r["score"] for r in out}
        assert min(scores.values()) > 0  # target-vocab docs score positive
