"""Repetition-filter + decontamination operator semantics (training-data
quality ops beyond the generic text battery)."""

from __future__ import annotations

import pytest

from skope_api_spark.operators.text import decontaminate, repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionStats:
    def test_boilerplate_scores_high(self, spark):
        out = {
            r.doc_id: (r.top2gram_frac, r.dup3gram_frac)
            for r in repetition_stats(
                _docs(
                    spark,
                    [
                        # "buy now" 2-gram covers 8 of 8 tokens
                        (1, "buy now buy now buy now buy now"),
                        (2, "all tokens here are fully distinct words"),
                    ],
                )
            ).collect()
        }
        top2, dup3 = out[1]
        assert top2 == pytest.approx(1.0)  # degenerate spam doc
        assert dup3 > 0.5  # "buy now buy" / "now buy now" repeat
        top2_clean, dup3_clean = out[2]
        assert top2_clean == pytest.approx(2 / 7, abs=1e-4)  # no repeated 2-gram
        assert dup3_clean == 0.0

    def test_short_docs_yield_null_not_crash(self, spark):
        """sequence(1, 0) DESCENDS in Spark — unguarded gram construction
        indexed past the token array on 1-2-token docs. Docs too short for
        an n-gram get NULL fractions (DuckDB-oracle parity: 0/0 → NULL)."""
        out = {
            r.doc_id: (r.top2gram_frac, r.dup3gram_frac)
            for r in repetition_stats(
                _docs(spark, [(1, "hello"), (2, "two words"), (3, "")])
            ).collect()
        }
        assert out[1] == (None, None)
        assert out[2] == (1.0, None)  # one 2-gram covers 100%; no 3-gram
        assert out[3] == (None, None)

    def test_no_shuffle_in_plan(self, spark):
        plan = (
            repetition_stats(_docs(spark, [(1, "a b c d e")]))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # per-row math stays in the scan


class TestDecontaminate:
    def test_flags_only_probe_overlap(self, spark):
        corpus = _docs(
            spark,
            [
                (10, "the quick brown fox jumps high"),  # shares "quick brown fox"
                (11, "совершенно unrelated text entirely different"),
            ],
        )
        probes = _docs(spark, [(1, "a quick brown fox appears")])
        got = {r.doc_id: r.n_shared_grams for r in decontaminate(corpus, probes).collect()}
        assert got == {10: 1}
