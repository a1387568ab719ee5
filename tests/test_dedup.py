"""Dedup operator edge cases not covered by the oracle contract queries —
the chain-graph depth behavior of connected-components propagation."""

from __future__ import annotations

import pytest

from skope_api_spark.operators.dedup import duplicate_clusters


def chain_pairs(spark, n: int):
    """Path graph 0-1-2-...-n: worst-case diameter for min-label spread."""
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )


class TestClusterPropagationDepth:
    def test_chain_converges_in_log_rounds(self, spark):
        """Star contraction is O(log n) rounds, not O(diameter): a path of
        diameter 1000 (which the old propagation loop could never finish
        inside its default 20 rounds) must converge within ~2·log2(n)+2
        rounds with every node labeled 0."""
        import math

        n = 1000
        budget = 2 * math.ceil(math.log2(n)) + 2  # 22 rounds
        out = {
            r.doc_id: r.cluster_id
            for r in duplicate_clusters(
                chain_pairs(spark, n), max_iter=budget
            ).collect()
        }
        assert out == {i: 0 for i in range(n + 1)}

    def test_max_iter_exceeded_raises_not_partial(self, spark):
        """Labels after too-few rounds would be a WRONG partial merge — the
        operator must refuse, not return them."""
        with pytest.raises(RuntimeError, match="did not converge"):
            duplicate_clusters(chain_pairs(spark, 200), max_iter=2).collect()

    def test_self_pairs_and_isolated_nodes_label_themselves(self, spark):
        pairs = spark.createDataFrame(
            [(5, 5), (1, 2)], "doc_a long, doc_b long"
        )
        out = {
            r.doc_id: r.cluster_id
            for r in duplicate_clusters(pairs).collect()
        }
        assert out == {5: 5, 1: 1, 2: 1}

    def test_two_components_stay_separate(self, spark):
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11), (11, 12)], "doc_a long, doc_b long"
        )
        out = {
            r.doc_id: r.cluster_id
            for r in duplicate_clusters(pairs).collect()
        }
        assert out == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


class TestMinhashCrossCorpus:
    def test_flags_near_dup_of_probe_only(self, spark):
        from skope_api_spark.operators.dedup import minhash_cross_corpus

        base = " ".join(f"w{i}" for i in range(40))
        corpus = spark.createDataFrame(
            [
                (10, base + " tail"),  # near-dup of probe doc 1
                (11, " ".join(f"z{i}" for i in range(40))),  # unrelated
            ],
            "doc_id long, text string",
        )
        probe = spark.createDataFrame(
            [(1, base), (2, "short unrelated probe text here")],
            "doc_id long, text string",
        )
        rows = minhash_cross_corpus(corpus, probe, threshold=0.7).collect()
        assert [(r.doc_id, r.probe_id) for r in rows] == [(10, 1)]
        assert rows[0].jaccard > 0.9

    def test_probe_side_is_broadcast(self, spark):
        """The band join and the verify join must both broadcast the
        (benchmark-sized) probe side — the corpus must never shuffle."""
        from skope_api_spark.operators.dedup import minhash_cross_corpus

        corpus = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string"
        )
        probe = spark.createDataFrame(
            [(2, "a b c d e f")], "doc_id long, text string"
        )
        plan = (
            minhash_cross_corpus(corpus, probe)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("BroadcastHashJoin") == 2
        assert "SortMergeJoin" not in plan


class TestSemanticDedup:
    def test_drops_higher_id_within_cluster(self, spark):
        from skope_api_spark.operators.similarity import semantic_dedup

        # two near-identical vectors (cos ~ 1) + two far-away ones
        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.99, 0.01, 0.0, 0.0]),  # semantic dup of 1 → dropped
            (3, [0.0, 1.0, 0.0, 0.0]),
            (4, [0.0, 0.0, 1.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {
            r.vec_id: r.kept
            for r in semantic_dedup(df, n_cells=2, iters=1, tau=0.9).collect()
        }
        assert out[1] is True  # min-id representative kept
        assert out[2] is False  # pruned
        assert out[3] is True and out[4] is True
        assert len(out) == 4  # every input vector gets a verdict


class TestDuplicateSpans:
    def test_repeated_span_positions_found(self, spark):
        from skope_api_spark.operators.dedup import duplicate_spans

        span = " ".join(f"s{i}" for i in range(8))
        docs = spark.createDataFrame(
            [
                (1, "a b " + span + " tail"),
                (2, span + " completely different ending here"),
                (3, "no shared content in this document at all"),
            ],
            "doc_id long, text string",
        )
        rows = duplicate_spans(docs, span_tokens=8).collect()
        hits = {(r.doc_id, r.pos) for r in rows}
        assert (1, 2) in hits and (2, 0) in hits  # the shared span
        assert all(r.doc_id != 3 for r in rows)
        assert all(r.n_occurrences == 2 for r in rows if (r.doc_id, r.pos) in {(1, 2), (2, 0)})

    def test_short_docs_yield_nothing(self, spark):
        from skope_api_spark.operators.dedup import duplicate_spans

        docs = spark.createDataFrame(
            [(1, "only four tokens here")], "doc_id long, text string"
        )
        assert duplicate_spans(docs, span_tokens=8).count() == 0


class TestClusterArgValidation:
    def test_max_iter_below_one_raises_value_error(self, spark):
        from skope_api_spark.operators.dedup import duplicate_clusters

        pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        with pytest.raises(ValueError, match="max_iter"):
            duplicate_clusters(pairs, max_iter=0)


class TestRemoveDuplicateSpans:
    def test_keeps_exactly_one_canonical_copy(self, spark):
        from skope_api_spark.operators.dedup import remove_duplicate_spans

        boiler = "x1 x2 x3 x4"
        docs = spark.createDataFrame(
            [
                (1, f"{boiler} a b c d"),
                (2, f"{boiler} e f g h"),
                (3, f"{boiler} i j k l"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in remove_duplicate_spans(docs, span_tokens=4).collect()
        }
        # doc 1 holds the canonical (smallest (doc_id, pos)) copy
        assert out[1].n_removed == 0
        assert out[1].cleaned_text == f"{boiler} a b c d"
        # later docs lose the boilerplate span, keep their unique tails
        assert out[2].cleaned_text == "e f g h"
        assert out[3].cleaned_text == "i j k l"
        assert out[2].n_removed == out[3].n_removed == 4

    def test_within_doc_repetition_removed(self, spark):
        from skope_api_spark.operators.dedup import remove_duplicate_spans

        docs = spark.createDataFrame(
            [(1, "p q r s p q r s tail1 tail2")],
            "doc_id long, text string",
        )
        row = remove_duplicate_spans(docs, span_tokens=4).collect()[0]
        # second occurrence of "p q r s" (pos 4..7) is removed
        assert row.cleaned_text == "p q r s tail1 tail2"
        assert row.n_removed == 4

    def test_short_and_unique_docs_untouched(self, spark):
        from skope_api_spark.operators.dedup import remove_duplicate_spans

        docs = spark.createDataFrame(
            [(1, "too short"), (2, "all tokens unique here today friend ok yes")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in remove_duplicate_spans(docs).collect()}
        assert out[1].n_removed == 0 and out[1].cleaned_text == "too short"
        assert out[2].n_removed == 0

    def test_overlapping_duplicate_spans_union_coverage(self, spark):
        from skope_api_spark.operators.dedup import remove_duplicate_spans

        # 5-token repeat means two overlapping 4-token spans repeat;
        # covered positions must union, not double-count
        docs = spark.createDataFrame(
            [(1, "a b c d e z1 z2 z3"), (2, "a b c d e y1 y2 y3")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r
            for r in remove_duplicate_spans(docs, span_tokens=4).collect()
        }
        assert out[1].n_removed == 0
        assert out[2].cleaned_text == "y1 y2 y3"
        assert out[2].n_removed == 5


class TestClusterRandomGraphs:
    def test_random_graphs_match_union_find(self, spark):
        """Star contraction vs a pure-Python union-find reference on random
        multigraphs (self-loops, duplicate edges, isolated-by-self-pair
        nodes all included)."""
        import random

        for seed in (1, 2, 3):
            rng = random.Random(seed)
            n = 60
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(80)
            ]
            pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")

            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            nodes = set()
            for a, b in edges:
                nodes.update((a, b))
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            mins: dict[int, int] = {}
            for x in nodes:
                r = find(x)
                mins[r] = min(mins.get(r, x), x)
            expected = {x: mins[find(x)] for x in nodes}

            got = {
                r.doc_id: r.cluster_id
                for r in duplicate_clusters(pairs).collect()
            }
            assert got == expected, f"seed {seed}"


class TestSlidingGramSql:
    """Pins the r13 megadoc fix: the sliding-gram lambda must never
    reference the token ARRAY — InferFiltersFromGenerate + predicate
    pushdown can inline split(text) below a downstream explode, and a
    whole-array reference inside the per-element lambda turns that into
    O(tokens²) per document (301 s to explode one distinct shingle from
    a 50k-token doc before the fix)."""

    def test_lambda_body_never_references_token_array(self):
        from skope_api_spark.operators.dedup import sliding_gram_sql

        for n in (2, 3, 8):
            sql = sliding_gram_sql("__toks_col", n, wrap="md5({g})")
            body = sql.split("s ->", 1)[1].split("ELSE", 1)[0]
            assert "__toks_col" not in body, (
                f"n={n}: token array leaked into the lambda body: {body}"
            )

    def test_values_match_bruteforce(self, spark):
        from pyspark.sql import functions as F

        from skope_api_spark.operators.dedup import sliding_gram_sql

        texts = [
            "a b c d e f g h i j",
            "x y",                       # shorter than any n >= 3
            "spam spam spam spam spam",
            "",                          # splits to one empty token
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        for n in (2, 3, 8):
            out = {
                r.id: r.g
                for r in df.withColumn("__t", F.split("text", " "))
                .withColumn("g", F.expr(sliding_gram_sql("__t", n)))
                .collect()
            }
            for i, t in enumerate(texts):
                ws = t.split(" ")
                want = [
                    " ".join(ws[j : j + n])
                    for j in range(len(ws) - n + 1)
                ] if len(ws) >= n else []
                assert out[i] == want, f"n={n} id={i}"


class TestMinhashBandCollisionGuard:
    def test_min_band_collisions_1_restores_single_band_recall(self, spark):
        """Contract pin for the r16 ≥2-band spurious-candidate guard
        (VERDICT r16 item 5): the ≥1-band behavior must stay restorable
        via ``min_band_collisions=1``. Crafted corpus: disjoint-vocab
        doc pairs at shingle-Jaccard 1/6 (above the lowered threshold),
        where some pairs happen to collide in exactly ONE band — those
        pairs are exactly what the default guard drops and what
        ``min_band_collisions=1`` must bring back; multi-band pairs
        must appear under BOTH settings."""
        from pyspark.sql import functions as F

        from skope_api_spark.operators.dedup import (
            minhash_bands_sql,
            minhash_near_duplicates,
            with_token_shingles,
        )

        rows = []
        for i in range(40):
            base = [f"p{i}w{j}" for j in range(30)]
            alt = base[:10] + [f"p{i}x{j}" for j in range(10, 30)]
            rows.append((2 * i, " ".join(base)))
            rows.append((2 * i + 1, " ".join(alt)))
        df = spark.createDataFrame(rows, "doc_id long, text string")

        # discover each pair's band-collision count with the operator's
        # own building blocks (no magic constants: stays valid if the
        # hash family or banding layout ever changes)
        sh = with_token_shingles(df, "text", 3, "shingles").withColumn(
            "sbase", F.transform("shingles", lambda s: F.xxhash64(s))
        )
        banded = sh.select(
            "doc_id", F.explode(F.expr(minhash_bands_sql(64, 32))).alias("bb")
        ).select("doc_id", "bb.band", F.col("bb.band_hash").alias("bh"))
        a, b = banded.alias("a"), banded.alias("b")
        counts = {
            (r.da, r.db): r["count"]
            for r in a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
            )
            .count()
            .collect()
        }
        single = sorted(p for p, c in counts.items() if c == 1)
        multi = sorted(p for p, c in counts.items() if c >= 2)
        assert single and multi, (
            f"fixture lost its 1-band / multi-band pairs: {counts}"
        )

        def pairs(k: int) -> set:
            out = minhash_near_duplicates(
                df, threshold=0.1, min_band_collisions=k
            )
            return {(r.doc_a, r.doc_b) for r in out.collect()}

        loose, strict = pairs(1), pairs(2)
        assert strict <= loose
        assert single[0] in loose, "k=1 lost a 1-band true pair"
        assert single[0] not in strict, "default guard should drop it"
        assert multi[0] in strict and multi[0] in loose


class TestRemoveDuplicateSpansNulls:
    def test_null_text_stays_null(self, spark):
        """r14 ADVICE: NULL text must propagate as NULL cleaned_text —
        the r13 size-guard rewrite silently coerced it to ''."""
        from skope_api_spark.operators.dedup import remove_duplicate_spans

        docs = spark.createDataFrame(
            [(1, None), (2, "w1 w2 w3 w4 w1 w2 w3 w4")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r.cleaned_text
            for r in remove_duplicate_spans(docs, span_tokens=4).collect()
        }
        assert out[1] is None
        assert out[2] is not None


class TestJaccardEmptyShingleContract:
    """r15 ADVICE: the inverted-index oracle rewrite (contract/dedup.py::
    _jaccard_pairs_ctes) can never emit a pair of sub-3-token documents
    (empty shingle sets produce no inverted-index rows), while the old
    all-pairs form computed 0/0 — NaN, which DuckDB orders above all
    values so NaN >= 0.7 passed. The Spark side excludes the same pairs
    via try_divide -> NULL. This fixture makes that exclusion an explicit
    cross-engine contract rather than an accident of the join shape."""

    TEXTS = [
        (1, "hi there"),            # 2 tokens: empty shingle set
        (2, "hi there"),            # identical 2-token twin of 1
        (3, "solo"),                # 1 token
        (4, "a b c d e f g h"),     # near-dup pair with 5 (J = 6/8)
        (5, "a b c d e f g q"),
        (6, "x y z totally different tokens here"),
    ]

    def _write_docs(self, tmp_path) -> str:
        import pandas as pd

        df = pd.DataFrame(
            [
                (i, t, "en", "fixture", len(t))
                for i, t in self.TEXTS
            ],
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
        df.to_parquet(f"{tmp_path}/documents.parquet", index=False)
        return str(tmp_path)

    def test_spark_and_oracle_both_exclude_empty_shingle_pairs(
        self, spark, tmp_path
    ):
        import duckdb

        from skope_api_spark.contract import ORACLES, QUERIES

        sf_dir = self._write_docs(tmp_path)
        got = [
            (r.doc_a, r.doc_b)
            for r in QUERIES["dedup_ngram_jaccard_pairs"](spark, sf_dir).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        oracle = [
            (r[0], r[1])
            for r in con.execute(ORACLES["dedup_ngram_jaccard_pairs"]).fetchall()
        ]
        assert got == oracle
        # the identical sub-3-token twins (1, 2) must NOT pair on either
        # engine, despite being exact duplicates of each other
        assert (1, 2) not in got
        assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in got)
