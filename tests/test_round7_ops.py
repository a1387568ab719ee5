"""Round-7 session-2 operators: BM25 retrieval, fixed-iteration PageRank,
int8 scalar-quantized ANN, temperature mixing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from skope_api_spark.operators.graph import pagerank, transition_edges
from skope_api_spark.operators.retrieval import bm25_topk, build_postings
from skope_api_spark.operators.sampling import temperature_mixing
from skope_api_spark.operators.similarity import sq_bounds, sq_encode, sq_topk


# --- BM25 ---------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "hash join fast hash"),
        (1, "hash scan"),
        (2, "vector scan scan scan"),
        (3, "the a the a"),
        (4, "join join join hash table"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_postings_tf_and_dl(docs):
    p = {
        (r.doc_id, r.tok): (r.tf, r.dl)
        for r in build_postings(docs).collect()
    }
    assert p[(0, "hash")] == (2.0, 4.0)
    assert p[(2, "scan")] == (3.0, 4.0)
    assert (3, "hash") not in p


def test_bm25_ranks_matching_docs_first(spark, docs):
    queries = spark.createDataFrame(
        [(1, "hash"), (1, "join")], "query_id int, term string"
    )
    out = bm25_topk(docs, queries, k=5).collect()
    got = [(r.query_id, r.rk, r.doc_id) for r in out]
    # docs 0/1/4 contain query terms; 2 and 3 do not appear at all
    assert {r[2] for r in got} == {0, 1, 4}
    # ranks are 1..n contiguous
    assert sorted(r[1] for r in got) == [1, 2, 3]
    # doc 0 (two 'hash' + short) must beat doc 1 (one 'hash', no 'join'):
    ranks = {r[2]: r[1] for r in got}
    assert ranks[0] < ranks[1]


def test_bm25_idf_positive_even_for_ubiquitous_term(spark):
    # term in EVERY doc: Lucene-style idf = ln(1 + 0.5/(N+0.5)) > 0
    rows = [(i, "common") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(1, "common")], "query_id int, term string")
    out = bm25_topk(docs, q, k=10).collect()
    assert len(out) == 4
    assert all(r.score > 0 for r in out)


# --- PageRank -----------------------------------------------------------


def test_transition_edges_dedup_and_tiebreak(spark):
    rows = [
        # group 1: a->b->c plus duplicate order values (tie-broken by node)
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"),
        # group 2: same consecutive pair twice -> ONE distinct edge
        (2, 1, "a"), (2, 2, "b"),
        # group 3: self-loop dropped
        (3, 1, "x"), (3, 2, "x"),
    ]
    df = spark.createDataFrame(rows, "g int, o int, node string")
    edges = {
        (r.src, r.dst)
        for r in transition_edges(
            df, group_col="g", order_col="o", node_col="node"
        ).collect()
    }
    assert edges == {("a", "b"), ("b", "c")}


def test_pagerank_star_graph(spark):
    # star: spokes a,b,c all point at hub h. Hub must rank strictly higher;
    # ranks of symmetric spokes must be identical.
    edges = spark.createDataFrame(
        [("a", "h"), ("b", "h"), ("c", "h")], "src string, dst string"
    )
    r = {x.node: x.rank for x in pagerank(edges, iterations=3).collect()}
    assert r["h"] > r["a"]
    assert r["a"] == r["b"] == r["c"]
    # spokes get only the teleport term (1-d)/N each iteration
    assert math.isclose(r["a"], 0.15 / 4, rel_tol=1e-9)


def test_pagerank_cycle_uniform(spark):
    # a->b->c->a: perfectly symmetric, every node keeps rank 1/3
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r = [x.rank for x in pagerank(edges, iterations=4).collect()]
    assert all(math.isclose(v, 1 / 3, abs_tol=1e-9) for v in r)


def test_pagerank_mass_conservation_no_dangling(spark):
    # without dangling nodes total rank mass stays 1 (documented contract)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a")],
        "src string, dst string",
    )
    total = sum(x.rank for x in pagerank(edges, iterations=5).collect())
    assert math.isclose(total, 1.0, abs_tol=1e-9)


def test_pagerank_empty_edges_returns_empty(spark):
    # the r16 driver-side n scalar must not divide by zero on an empty graph
    edges = spark.createDataFrame([], "src string, dst string")
    assert pagerank(edges, iterations=3).collect() == []


def test_pagerank_size_conf_parsing():
    from skope_api_spark.operators.graph import _size_bytes

    assert _size_bytes("10485760") == 10 * 1024 * 1024
    assert _size_bytes("10485760b") == 10 * 1024 * 1024
    assert _size_bytes("64m") == 64 * 1024 * 1024
    assert _size_bytes("1g") == 1 << 30
    assert _size_bytes("512k") == 512 * 1024
    assert _size_bytes("-1") == -1
    assert _size_bytes("garbage") == 0


def test_pagerank_broadcast_hint_follows_threshold(spark):
    # fixture node count fits the default threshold -> broadcast joins;
    # with auto-broadcast disabled the hint must drop out (the 100 TB
    # shape: sort-merge at real node counts)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    plan_on = pagerank(edges, iterations=1)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan_on
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_off = (
            pagerank(edges, iterations=1)._jdf.queryExecution().toString()
        )
        assert "BroadcastHashJoin" not in plan_off
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_pagerank_checkpoint_matches_lazy(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "src string, dst string",
    )
    lazy = {x.node: x.rank for x in pagerank(edges, iterations=4).collect()}
    chk = {
        x.node: x.rank
        for x in pagerank(edges, iterations=4, checkpoint_every=2).collect()
    }
    assert lazy == chk


# --- int8 scalar quantization ------------------------------------------


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [0.7, 0.7, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sq_bounds_shape(vecs):
    b = sq_bounds(vecs).collect()[0]
    assert b.mn_arr == [0.0, 0.0, 0.0]
    assert b.mx_arr == [1.0, 1.0, 1.0]


def test_sq_encode_extremes_and_constant_dim(spark):
    rows = [(0, [0.0, 5.0]), (1, [10.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = sq_bounds(df)
    codes = {r.vec_id: r.codes for r in sq_encode(df, b).collect()}
    # min -> 0, max -> clamped 255; constant dim (mx == mn) -> 0
    assert codes[0] == [0, 0]
    assert codes[1] == [255, 0]


def test_sq_topk_matches_exact_on_separable_data(spark, vecs):
    out = sq_topk(vecs, vecs.where(F.col("vec_id") == 0), k=2, shortlist=4)
    got = [(r.rk, r.neighbor_id) for r in out.collect()]
    # nearest to [1,0,0]: vec 1 (0.994) then vec 4 (0.707)
    assert got == [(1, 1), (2, 4)]


# --- temperature mixing -------------------------------------------------


def test_temperature_rates_flatten_distribution(spark):
    rows = [(i, "big" if i < 90 else "small", "w " * 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = temperature_mixing(df, alpha=0.3)
    fr = {
        r["source"]: r["frac"]
        for r in out.select("source", F.col("__frac").alias("frac"))
        .distinct()
        .collect()
    }
    # rarest source keeps everything; dominant source is downsampled by
    # (p_small/p_big)^(1-alpha) = (10/90)^0.7
    assert math.isclose(fr["small"], 1.0, rel_tol=1e-12)
    assert math.isclose(fr["big"], (10 / 90) ** 0.7, rel_tol=1e-9)


def test_temperature_alpha_one_keeps_everything(spark):
    rows = [(i, f"s{i % 3}", "a b c") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = temperature_mixing(df, alpha=1.0)
    # alpha = 1 -> natural distribution -> every rate is 1 -> no filtering
    assert out.count() == 30


# --- fuzzy join (SymSpell 1-deletion neighborhoods) ---------------------


def test_deletion_variants(spark):
    from skope_api_spark.operators.fuzzy import deletion_variants

    df = spark.createDataFrame([("ring",), ("",)], "t string")
    got = [r.v for r in df.select(deletion_variants(F.col("t")).alias("v")).collect()]
    assert got[0] == ["ring", "ing", "rng", "rig", "rin"]
    # empty string: just itself — no runaway descending sequence(1, 0)
    assert got[1] == [""]


def test_fuzzy_join_matches_bruteforce(spark):
    from skope_api_spark.operators.fuzzy import fuzzy_join

    probe_rows = ["rng", "bolt", "blt", "xyz", "blue", "bluee"]
    term_rows = ["ring", "bolt", "blue", "gear"]
    probes = spark.createDataFrame([(p,) for p in probe_rows], "probe string")
    terms = spark.createDataFrame([(t,) for t in term_rows], "term string")
    got = {
        (r.probe, r.term, r.dist) for r in fuzzy_join(probes, terms).collect()
    }
    # brute-force reference
    def lev(a, b):
        d = [[i + j if not i * j else 0 for j in range(len(b) + 1)] for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(d[i-1][j] + 1, d[i][j-1] + 1,
                              d[i-1][j-1] + (a[i-1] != b[j-1]))
        return d[len(a)][len(b)]

    want = {
        (p, t, lev(p, t))
        for p in probe_rows for t in term_rows if lev(p, t) <= 1
    }
    assert got == want
    assert ("bolt", "bolt", 0) in got       # exact match included
    assert all(p != "xyz" for p, _, _ in got)  # no spurious matches


def test_fuzzy_join_rejects_unsupported_distance(spark):
    from skope_api_spark.operators.fuzzy import fuzzy_join

    df = spark.createDataFrame([("a",)], "probe string")
    with pytest.raises(ValueError):
        fuzzy_join(df, df.withColumnRenamed("probe", "term"), max_distance=2)


# --- char entropy -------------------------------------------------------


def test_char_entropy_extremes(spark):
    from skope_api_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "abcd")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_chars, r.entropy) for r in char_entropy(df).collect()}
    assert got[0] == (4, 0.0)                      # constant string: H = 0
    assert got[1] == (4, round(math.log(4), 6))    # uniform over 4 chars


# --- hard negatives -----------------------------------------------------


def test_hard_negatives_exclude_same_label(spark):
    from skope_api_spark.operators.similarity import hard_negative_mining

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.99, 0.1], 1),   # same label as anchor: must NOT appear
        (2, [0.9, 0.2], 2),    # different label, very close: top negative
        (3, [0.0, 1.0], 2),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = hard_negative_mining(df, df.where(F.col("vec_id") == 0), k=2).collect()
    got = [(r.rk, r.neighbor_id) for r in out]
    assert got == [(1, 2), (2, 3)]
    assert all(r.neighbor_label != r.anchor_label for r in out)


# --- incremental rollup + per-group cap ---------------------------------


def test_incremental_rollup_equals_full_recompute(spark):
    from skope_api_spark.operators.merge import incremental_rollup

    rows = [(i, "a" if i % 2 else "b", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, k string, v double")
    base = (
        df.where(F.col("id") < 12)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("v").alias("sv"))
    )
    merged = incremental_rollup(
        base, df.where(F.col("id") >= 12),
        keys=["k"], count_col="n", sum_cols=[("sv", "v")],
    )
    full = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("v").alias("sv"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_incremental_rollup_new_group_only_in_delta(spark):
    from skope_api_spark.operators.merge import incremental_rollup

    base_rows = spark.createDataFrame([("a", 2, 5.0)], "k string, n long, sv double")
    delta = spark.createDataFrame([(99, "zz", 7.0)], "id long, k string, v double")
    got = {
        r.k: (r.n, r.sv)
        for r in incremental_rollup(
            base_rows, delta, keys=["k"], count_col="n", sum_cols=[("sv", "v")]
        ).collect()
    }
    assert got == {"a": (2, 5.0), "zz": (1, 7.0)}


def test_cap_per_group_bounds_and_determinism(spark):
    from skope_api_spark.operators.sampling import cap_per_group

    rows = [(i, f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out1 = sorted(r.doc_id for r in cap_per_group(df, k=5).collect())
    out2 = sorted(r.doc_id for r in cap_per_group(df, k=5).collect())
    assert out1 == out2                       # deterministic
    assert len(out1) == 15                    # 3 groups x 5
    # nesting: the k=3 sample is a subset of the k=5 sample
    out3 = sorted(r.doc_id for r in cap_per_group(df, k=3).collect())
    assert set(out3) <= set(out1)


# --- prefix-filtered exact Jaccard join ---------------------------------


def test_jaccard_prefix_join_matches_bruteforce(spark):
    from skope_api_spark.operators.dedup import ngram_jaccard_pairs
    from skope_api_spark.operators.setjoin import jaccard_prefix_join

    base = "the quick brown fox jumps over the lazy dog near the old barn"
    rows = [
        (0, base),
        (1, base),                                   # exact dup
        (2, base.replace("lazy", "sleepy")),         # near dup
        (3, "completely different words in this one entirely unrelated"),
        (4, base.replace("quick", "slow").replace("dog", "cat")),
        (5, "short text"),                           # < shingle size after split? 2 tokens -> empty set
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.5, 0.7, 0.9):
        got = {
            (r.doc_a, r.doc_b, round(r.jaccard, 6))
            for r in jaccard_prefix_join(docs, threshold=t).collect()
        }
        want = {
            (r.doc_a, r.doc_b, round(r.jaccard, 6))
            for r in ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        assert got == want, f"threshold {t}"
    # sanity: the exact dup pair is present at every threshold
    assert (0, 1, 1.0) in got or any(a == 0 and b == 1 for a, b, _ in got)


def test_jaccard_prefix_join_threshold_validation(spark):
    from skope_api_spark.operators.setjoin import jaccard_prefix_join

    docs = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError):
        jaccard_prefix_join(docs, threshold=0.0)


# --- asymmetric containment join ----------------------------------------


def _shingles(text, n=3):
    ws = text.split(" ")
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def test_containment_prefix_join_matches_bruteforce(spark):
    from skope_api_spark.operators.setjoin import containment_prefix_join

    long_doc = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [
        (0, long_doc),
        (1, "alpha beta gamma delta epsilon zeta"),  # embedded prefix of 0
        (2, "nu xi omicron pi rho sigma tau upsilon"),  # embedded suffix of 0
        (3, "totally unrelated words that never overlap anything here"),
        (4, long_doc),                                # exact dup of 0
        (5, "two words"),                             # < 3 tokens: no shingles
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sets = {i: _shingles(t) for i, t in rows}
    for t in (0.5, 0.8, 1.0):
        got = {
            (r.doc_src, r.doc_sup, round(r.containment, 6))
            for r in containment_prefix_join(docs, threshold=t).collect()
        }
        want = {
            (a, b, round(len(sa & sb) / len(sa), 6))
            for a, sa in sets.items() if sa
            for b, sb in sets.items() if b != a
            if len(sa & sb) / len(sa) >= t
        }
        assert got == want, f"threshold {t}"
    # the asymmetric class: 1 ⊂ 0 is caught at t=1.0 even though the
    # pair's JACCARD is only |S1|/|S0| (well under any near-dup bar)
    assert (1, 0, 1.0) in got
    s1, s0 = sets[1], sets[0]
    assert len(s1 & s0) / len(s1 | s0) < 0.5


def test_containment_prefix_join_threshold_validation(spark):
    from skope_api_spark.operators.setjoin import containment_prefix_join

    docs = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError):
        containment_prefix_join(docs, threshold=1.5)


# --- funnel + cohort ----------------------------------------------------


def test_funnel_strict_ordering(spark):
    from skope_api_spark.operators.funnel import funnel_stages

    rows = [
        # u1 completes in order
        (1, "click", "2024-01-01 10:00:00"),
        (1, "view", "2024-01-01 11:00:00"),
        (1, "purchase", "2024-01-01 12:00:00"),
        # u2: purchase BEFORE view -> stops at stage 2
        (2, "click", "2024-01-01 10:00:00"),
        (2, "purchase", "2024-01-01 10:30:00"),
        (2, "view", "2024-01-01 11:00:00"),
        # u3: only a view, never clicked -> not in population
        (3, "view", "2024-01-01 10:00:00"),
        # u4: click+view at the SAME ts -> strict > rejects, stage 1
        (4, "click", "2024-01-01 10:00:00"),
        (4, "view", "2024-01-01 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts string").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {r.user_id: r.stage for r in funnel_stages(ev, ["click", "view", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 4: 1}


def test_funnel_greedy_uses_earliest_match(spark):
    from skope_api_spark.operators.funnel import funnel_stages

    # greedy earliest-click at 10:00 lets the 10:30 view match even though
    # a later click (11:00) would not
    rows = [
        (1, "click", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 11:00:00"),
        (1, "view", "2024-01-01 10:30:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts string").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    got = funnel_stages(ev, ["click", "view"]).collect()[0]
    assert got.stage == 2


def test_funnel_empty_steps_raise(spark):
    from skope_api_spark.operators.funnel import funnel_stages

    ev = spark.createDataFrame([], "user_id long, event_type string, ts timestamp")
    with pytest.raises(ValueError):
        funnel_stages(ev, [])


def test_cohort_retention_counts(spark):
    from skope_api_spark.operators.funnel import cohort_retention

    rows = [
        # u1 first active week of Jan 1 (Mon), returns 2 weeks later
        (1, "2024-01-02 10:00:00"),
        (1, "2024-01-16 10:00:00"),
        # u2 same cohort, week 0 only (two events, one distinct period)
        (2, "2024-01-03 10:00:00"),
        (2, "2024-01-04 10:00:00"),
        # u3 later cohort (week of Jan 8), returns next week
        (3, "2024-01-10 10:00:00"),
        (3, "2024-01-17 10:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {
        (r.cohort.date().isoformat() if hasattr(r.cohort, "date") else str(r.cohort), r.period_n): r.n_users
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


# --- triangle counting --------------------------------------------------


def test_triangle_counts_known_graph(spark):
    from skope_api_spark.operators.graph import triangle_counts

    # K4 on {a,b,c,d}: every node is in C(3,2) = 3 triangles; pendant e: 0
    edges = [(x, y) for i, x in enumerate("abcd") for y in "abcd"[i + 1:]]
    edges.append(("d", "e"))
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_triangle_counts_orientation_invariant(spark):
    from skope_api_spark.operators.graph import triangle_counts

    # same triangle given with mixed/duplicate orientations counts once
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "b"), ("a", "c")],
        "src string, dst string",
    )
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_free_graph(spark):
    from skope_api_spark.operators.graph import triangle_counts

    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert set(got.values()) == {0}


# --- grid spatial join --------------------------------------------------


def _polys_df(spark):
    return spark.createDataFrame(
        [
            (1, [{"x": 0.0, "y": 0.0}, {"x": 4.0, "y": 0.0},
                 {"x": 4.0, "y": 4.0}, {"x": 0.0, "y": 4.0}]),
            # overlaps poly 1
            (2, [{"x": 2.0, "y": 2.0}, {"x": 6.0, "y": 2.0},
                 {"x": 6.0, "y": 6.0}, {"x": 2.0, "y": 6.0}]),
        ],
        "poly_id int, verts array<struct<x double, y double>>",
    )


def test_spatial_join_membership_and_overlap(spark):
    from skope_api_spark.operators.spatial import spatial_join

    pts = spark.createDataFrame(
        [
            (1, 1.0, 1.0),    # poly 1 only
            (2, 3.0, 3.0),    # both polys (overlap region)
            (3, 5.0, 5.0),    # poly 2 only
            (4, 9.0, 9.0),    # outside everything
            (5, 4.0, 4.0),    # on poly 1's corner AND inside poly 2
            (6, 0.0, 0.0),    # on poly 1's corner (boundary inclusive)
        ],
        "point_id long, x double, y double",
    )
    got = {
        (r.point_id, r.poly_id)
        for r in spatial_join(pts, _polys_df(spark), cell_size=2.0).collect()
    }
    assert got == {(1, 1), (2, 1), (2, 2), (3, 2), (5, 1), (5, 2), (6, 1)}


def test_spatial_join_cell_size_invariant(spark):
    from skope_api_spark.operators.spatial import spatial_join

    pts = spark.createDataFrame(
        [(i, float(i % 7), float(i % 5)) for i in range(50)],
        "point_id long, x double, y double",
    )
    polys = _polys_df(spark)
    results = [
        {
            (r.point_id, r.poly_id)
            for r in spatial_join(pts, polys, cell_size=cs).collect()
        }
        for cs in (0.5, 2.0, 10.0)
    ]
    # the grid is an index, not a semantic: any cell size gives the same pairs
    assert results[0] == results[1] == results[2]
    assert len(results[0]) > 0


def test_jaccard_prefix_join_order_knob_equivalent(spark):
    from skope_api_spark.operators.setjoin import jaccard_prefix_join

    base = "the quick brown fox jumps over the lazy dog near the old barn"
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, base.replace("lazy", "sleepy")),
         (3, "completely different words entirely here now")],
        "doc_id long, text string",
    )
    freq = {(r.doc_a, r.doc_b) for r in jaccard_prefix_join(docs, threshold=0.6).collect()}
    hsh = {
        (r.doc_a, r.doc_b)
        for r in jaccard_prefix_join(docs, threshold=0.6, order="hash").collect()
    }
    assert freq == hsh and freq
    with pytest.raises(ValueError):
        jaccard_prefix_join(docs, order="lexicographic")


# --- seasonal decomposition ---------------------------------------------


def test_seasonal_decompose_pure_seasonal_series(spark):
    from skope_api_spark.operators.windows import seasonal_decompose

    # 4 "years" of period-4 data: value = 10 + seasonal offset per phase;
    # a constant-trend series recovers its own seasonal pattern exactly
    offsets = {0: 2.0, 1: -1.0, 2: 0.0, 3: -1.0}
    rows = [(t, t % 4, 10.0 + offsets[t % 4]) for t in range(16)]
    df = spark.createDataFrame(rows, "t int, season int, v double")
    out = seasonal_decompose(
        df, "v", order_by=["t"], season_col="season", period=4
    ).orderBy("t").collect()
    by_t = {r.t: r for r in out}
    # seasonal component: per-season mean minus grand mean of season means
    grand = sum(10.0 + o for o in offsets.values()) / 4
    for t, r in by_t.items():
        assert r.seasonal == pytest.approx(10.0 + offsets[t % 4] - grand)
    # the 2x4 half-weight-endpoint MA must recover the FLAT trend exactly
    # on a pure seasonal series (a plain 5-MA would oscillate by
    # offset/5 with the phase) — this pins the classical trend, not just
    # the residual tautology
    assert by_t[0].trend is None and by_t[15].trend is None
    for t in range(2, 14):
        assert by_t[t].trend == pytest.approx(10.0)
        assert by_t[t].residual == pytest.approx(0.0, abs=1e-9)


def test_seasonal_decompose_partitioned(spark):
    from skope_api_spark.operators.windows import seasonal_decompose

    rows = [(g, t, t % 2, float(g * 100 + (t % 2))) for g in (1, 2) for t in range(8)]
    df = spark.createDataFrame(rows, "g int, t int, season int, v double")
    out = seasonal_decompose(
        df, "v", order_by=["t"], season_col="season", period=2,
        partition_by=["g"],
    ).collect()
    # seasonal means are computed per partition: group 2's level (200+)
    # must not leak into group 1's seasonal component
    for r in out:
        assert abs(r.seasonal) <= 0.5 + 1e-9


# --- data-quality constraint report -------------------------------------


def test_constraint_report_single_pass_and_failures(spark):
    from skope_api_spark.operators.quality import constraint_report

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (2, -1.0)], "k long, v double"
    )
    rep = constraint_report(
        df,
        [
            ("n", F.count(F.lit(1)), F.col("n") >= 10),
            ("k_unique", F.countDistinct("k"), F.col("k_unique") == F.col("n")),
            ("v_complete", F.count("v") / F.count(F.lit(1)),
             F.col("v_complete") == 1.0),
            ("v_min", F.min("v"), F.col("v_min") >= 0.0),
        ],
    )
    got = {r.constraint: (r.observed, r.passed) for r in rep.collect()}
    assert got["n"] == (3.0, False)
    assert got["k_unique"] == (2.0, False)
    assert got["v_complete"][1] is False
    assert got["v_min"] == (-1.0, False)
    # single-pass guarantee: the source is scanned exactly once (the
    # count-distinct expands into a multi-phase aggregation, but all
    # phases hang off ONE scan)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final AND Initial sections — count scans in the final only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 1


def test_constraint_report_validation(spark):
    from skope_api_spark.operators.quality import constraint_report

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        constraint_report(df, [])
    with pytest.raises(ValueError):
        constraint_report(
            df,
            [("a", F.count(F.lit(1)), F.lit(True)),
             ("a", F.min("k"), F.lit(True))],
        )


# --- level-shift detection ----------------------------------------------


def test_level_shift_flags_injected_step(spark):
    from skope_api_spark.operators.windows import level_shift_detect

    # flat at 10 for t<10, flat at 50 for t>=10, small deterministic noise
    rows = [
        (t, (10.0 if t < 10 else 50.0) + (t % 3) * 0.1) for t in range(20)
    ]
    df = spark.createDataFrame(rows, "t int, v double")
    out = {r.t: r.is_shift for r in level_shift_detect(
        df, "v", order_by=["t"], width=4, threshold=3.0
    ).collect()}
    assert out[10] is True                      # the step boundary
    # away from the boundary (windows fully on one level): no flag
    assert out[5] is False
    assert out[15] is False
    # incomplete edge windows: NULL, not False
    assert out[0] is None and out[19] is None


def test_level_shift_clean_step_and_plateau(spark):
    from skope_api_spark.operators.windows import level_shift_detect

    # zero pooled variance is NOT a dead zone: a noise-free step flags
    # True (infinite effect size) while a flat plateau is False
    step = spark.createDataFrame(
        [(t, 10.0 if t < 6 else 50.0) for t in range(12)], "t int, v double"
    )
    got = {r.t: r.is_shift for r in level_shift_detect(
        step, "v", order_by=["t"], width=3
    ).collect()}
    assert got[6] is True     # the clean boundary
    # t=4: after-window (rows 4..6) mixes levels -> nonzero pooled sigma,
    # jump well under 3 sigma -> False, not a spurious early flag
    assert got[4] is False
    flat = spark.createDataFrame([(t, 7.0) for t in range(12)], "t int, v double")
    out = level_shift_detect(flat, "v", order_by=["t"], width=3).collect()
    complete = [r for r in out if r.is_shift is not None]
    assert complete and all(r.is_shift is False for r in complete)
    with pytest.raises(ValueError):
        level_shift_detect(flat, "v", order_by=["t"], width=1)


# --- CDC latest-state apply ---------------------------------------------


def test_cdc_apply_semantics(spark):
    from skope_api_spark.operators.merge import cdc_apply

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    changes = spark.createDataFrame(
        [
            (2, 1, "U", "b2", 25.0),   # update
            (3, 1, "U", "c2", 35.0),   # update then...
            (3, 2, "D", "c2", 35.0),   # ...delete wins by seq
            (4, 1, "I", "d", 40.0),    # insert
            (1, 1, "D", "a", 10.0),    # delete then...
            (1, 2, "I", "a2", 11.0),   # ...re-insert wins by seq
        ],
        "k long, seq int, op string, name string, bal double",
    )
    got = {
        r.k: (r.name, r.bal)
        for r in cdc_apply(
            base, changes, key_cols=["k"], seq_col="seq",
            payload_cols=["name", "bal"],
        ).collect()
    }
    assert got == {1: ("a2", 11.0), 2: ("b2", 25.0), 4: ("d", 40.0)}


# --- nearest site (haversine) -------------------------------------------


def test_haversine_known_distance(spark):
    from skope_api_spark.operators.spatial import haversine_km

    df = spark.createDataFrame([(40.7128, -74.0060, 51.5074, -0.1278)],
                               "a double, b double, c double, d double")
    km = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0].km
    assert km == pytest.approx(5570, abs=10)   # NYC -> London great circle


def test_nearest_site_assignment_and_ties(spark):
    from skope_api_spark.operators.spatial import nearest_site

    sites = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 10.0)], "site_id int, lat double, lon double"
    )
    pts = spark.createDataFrame(
        [(1, 0.0, 1.0),   # near site 1
         (2, 0.0, 9.0),   # near site 2
         (3, 0.0, 5.0)],  # EXACT midpoint: tie -> lower site id
        "point_id long, lat double, lon double",
    )
    got = {r.point_id: r.site_id for r in nearest_site(pts, sites).collect()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_haversine_antipodal_clamped(spark):
    from skope_api_spark.operators.spatial import haversine_km

    # exactly antipodal: the 'a' term exceeds 1.0 by 1 ulp in doubles;
    # unclamped this is asin(sqrt(>1)) = NaN instead of half circumference
    df = spark.createDataFrame([(30.0, 10.0, -30.0, -170.0)],
                               "a double, b double, c double, d double")
    km = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("km")
    ).collect()[0].km
    assert km == pytest.approx(20015, abs=5)


def test_nearest_site_ignores_null_coordinate_sites(spark):
    from skope_api_spark.operators.spatial import nearest_site

    sites = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, None, None)], "site_id int, lat double, lon double"
    )
    pts = spark.createDataFrame(
        [(1, 0.0, 1.0)], "point_id long, lat double, lon double"
    )
    got = nearest_site(pts, sites).collect()
    # the malformed site must not hijack the argmin with a NULL distance
    assert [(r.point_id, r.site_id) for r in got] == [(1, 1)]
    assert got[0].distance_km is not None


class TestEmbeddingDecontaminate:
    def test_flags_exact_and_near_matches_only(self, spark):
        from skope_api_spark.operators.similarity import (
            embedding_decontaminate,
        )

        e1 = [1.0, 0.0, 0.0, 0.0]
        e2 = [0.0, 1.0, 0.0, 0.0]
        near = [0.9, 0.1, 0.0, 0.0]
        probes = spark.createDataFrame(
            [(0, e1), (1, e2)], "vec_id long, embedding array<float>"
        )
        corpus = spark.createDataFrame(
            [(10, e1), (11, near), (12, [0.0, 0.0, 1.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        out = {
            r["vec_id"]: r
            for r in embedding_decontaminate(
                corpus, probes, threshold=0.8
            ).collect()
        }
        assert out[10]["contaminated"] and out[10]["best_probe"] == 0
        assert out[10]["best_cos"] == pytest.approx(1.0)
        assert out[11]["contaminated"]  # paraphrase-like near match
        assert not out[12]["contaminated"]  # orthogonal text

    def test_tie_breaks_to_smallest_probe(self, spark):
        from skope_api_spark.operators.similarity import (
            embedding_decontaminate,
        )

        v = [1.0, 1.0]
        probes = spark.createDataFrame(
            [(5, v), (3, v)], "vec_id long, embedding array<float>"
        )
        corpus = spark.createDataFrame(
            [(10, v)], "vec_id long, embedding array<float>"
        )
        r = embedding_decontaminate(corpus, probes).collect()[0]
        assert r["best_probe"] == 3


class TestRollingDistinct:
    def test_hand_checked_windows(self, spark):
        from datetime import datetime

        from skope_api_spark.operators.windows import rolling_distinct_count

        rows = [
            ("a", datetime(2024, 1, 1, 0, 10)),
            ("b", datetime(2024, 1, 1, 1, 20)),
            ("a", datetime(2024, 1, 1, 1, 30)),  # dup pair within hour
            ("a", datetime(2024, 1, 1, 1, 45)),
            ("c", datetime(2024, 1, 3, 5, 0)),  # outside every other window
        ]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        out = {
            r["window_end"]: r["distinct_keys"]
            for r in rolling_distinct_count(
                df, key_col="user_id", window_buckets=24
            ).collect()
        }
        assert out[datetime(2024, 1, 1, 0, 0)] == 1  # {a}
        assert out[datetime(2024, 1, 1, 1, 0)] == 2  # {a, b} over 2 hours
        assert out[datetime(2024, 1, 3, 5, 0)] == 1  # {c}, others aged out
        assert len(out) == 3  # only hours that contain events


class TestHampelFilter:
    def test_spike_repaired_plateau_kept(self, spark):
        from skope_api_spark.operators.windows import hampel_filter

        # flat series with one wild spike at position 5
        vals = [10.0] * 11
        vals[5] = 500.0
        rows = [("u", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "u string, t long, value double")
        out = {
            r["t"]: r
            for r in hampel_filter(
                df, "value", partition_by=["u"], order_by=["t"]
            ).collect()
        }
        assert out[5]["is_outlier"] and out[5]["repaired"] == 10.0
        assert out[4]["is_outlier"] is False  # spike can't corrupt median
        assert out[0]["is_outlier"] is None  # incomplete edge frame
        assert out[0]["repaired"] == 10.0  # edges pass through

    def test_legitimate_level_shift_not_flagged(self, spark):
        from skope_api_spark.operators.windows import hampel_filter

        # a step change is not a point outlier: window medians follow it
        vals = [1.0] * 8 + [50.0] * 8
        rows = [("u", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "u string, t long, value double")
        out = hampel_filter(
            df, "value", partition_by=["u"], order_by=["t"]
        ).collect()
        # at most the two rows straddling the step can flag; interior not
        flagged = [r["t"] for r in out if r["is_outlier"]]
        assert all(6 <= t <= 9 for t in flagged)


class TestGridDensityClusters:
    def test_two_blobs_and_noise(self, spark):
        from skope_api_spark.operators.spatial import grid_density_clusters

        rows = []
        # blob A: 30 points in cell (0,0); neighbor core cell (0,1) with 30
        rows += [(0.5, 0.5)] * 30 + [(0.5, 5.5)] * 30
        # blob B: far away core cell
        rows += [(40.2, 40.2)] * 30
        # noise: sparse cell below min_pts
        rows += [(-20.0, -20.0)] * 3
        df = spark.createDataFrame(rows, "lat double, lon double")
        out = grid_density_clusters(df, cell_deg=5.0, min_pts=25).collect()
        assert len(out) == 2  # A-cells merged, B alone, noise dropped
        sizes = sorted((r["n_cells"], r["n_points"]) for r in out)
        assert sizes == [(1, 30), (2, 60)]

    def test_validation(self, spark):
        import pytest as _pt

        from skope_api_spark.operators.spatial import grid_density_clusters

        df = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
        with _pt.raises(ValueError):
            grid_density_clusters(df, cell_deg=0.0)


# --- fl-consistent minimal overlap (r14 ADVICE regression) ---------------


def test_min_overlap_consistent_with_verify_division(spark):
    """ceil(t*n) computed in doubles can exceed the smallest k whose
    double-division k/n passes the verify predicate (t=0.81,n=300 →
    ceil 244 but 243/300 >= 0.81). _min_overlap must equal the brute
    smallest such k so the prefix/size filters never over-prune."""
    from pyspark.sql import functions as F

    from skope_api_spark.operators.setjoin import _min_overlap

    cases = [(0.81, 300), (0.55, 100), (0.67, 1500), (0.8, 10),
             (1.0, 7), (0.5, 2), (0.3, 9), (0.7, 13), (0.9, 11)]
    one = spark.range(1)
    for t, n in cases:
        got = one.select(_min_overlap(t, F.lit(n)).alias("k")).collect()[0].k
        ref = next(k for k in range(n + 1) if k / n >= t)
        assert got == ref, (t, n, got, ref)


def test_containment_exact_threshold_pair_not_pruned(spark):
    """Deterministic catch for the naive-ceil over-prune: doc A has 100
    shingles, 45 unshared (freq 1 → they ARE the rare-first prefix) and
    55 shared with B. containment(A in B) = 55/100, and 55/100 >= 0.55
    in doubles while ceil(0.55*100) = 56 — the naive prefix (45) is
    exactly A's unshared shingles, so the old code dropped the pair."""
    from skope_api_spark.operators.setjoin import containment_prefix_join

    a_toks = [f"a{i}" for i in range(102)]          # 100 shingles
    b_toks = a_toks[:57] + [f"f{i}" for i in range(10)]  # 55 shared
    docs = spark.createDataFrame(
        [(0, " ".join(a_toks)), (1, " ".join(b_toks))],
        "doc_id long, text string",
    )
    got = {
        (r.doc_src, r.doc_sup): r.containment
        for r in containment_prefix_join(docs, threshold=0.55).collect()
    }
    assert (0, 1) in got, "exact-threshold pair pruned (naive-ceil bug)"
    assert abs(got[(0, 1)] - 0.55) < 1e-12
    # brute-force completeness at the same threshold
    sa = _shingles(" ".join(a_toks))
    sb = _shingles(" ".join(b_toks))
    want = {
        (s, p)
        for (s, ss), (p, sp) in [((0, sa), (1, sb)), ((1, sb), (0, sa))]
        if len(ss & sp) / len(ss) >= 0.55
    }
    assert set(got) == want


def test_hard_negative_bucketed_matches_brute_when_single_bucket(spark):
    """Identical-direction vectors land in the same LSH bucket in every
    table, so the bucketed candidate set is complete and the corpus-scale
    equi-join path must agree with the broadcast-anchor brute path
    exactly (ties broken by neighbor_id in both)."""
    from skope_api_spark.operators.similarity import (
        hard_negative_mining,
        hard_negative_mining_bucketed,
    )

    base = [1.0 if (d * 7) % 3 else -1.0 for d in range(64)]
    rows = [
        (i, [x * (1.0 + 0.1 * i) for x in base], i % 3) for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    anchors = df.where(F.col("vec_id") < 4)
    brute = hard_negative_mining(df, anchors, k=3).collect()
    buck = hard_negative_mining_bucketed(df, anchors, k=3).collect()

    def key(rs):
        return sorted((r.anchor_id, r.rk, r.neighbor_id) for r in rs)

    assert key(buck) == key(brute)
    assert all(r.anchor_label != r.neighbor_label for r in buck)


def test_hard_negative_bucketed_contract_on_testdata(spark):
    """On the real embeddings fixture: label inequality everywhere, ranks
    contiguous from 1 per anchor, cosines non-increasing in rank, and
    every returned pair is also a valid brute candidate."""
    from skope_api_spark.operators.similarity import (
        hard_negative_mining_bucketed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = hard_negative_mining_bucketed(
        emb, emb.where(F.col("vec_id") < 5), k=3
    ).collect()
    assert out, "bucketed path returned nothing on the fixture"
    per = {}
    for r in out:
        assert r.anchor_label != r.neighbor_label
        per.setdefault(r.anchor_id, []).append((r.rk, r.cosine_sim))
    for aid, rs in per.items():
        rs.sort()
        assert [rk for rk, _ in rs] == list(range(1, len(rs) + 1)), aid
        sims = [s for _, s in rs]
        assert sims == sorted(sims, reverse=True), aid


def test_min_overlap_exhaustive_grid(spark):
    """Exhaustive fl-consistency sweep: every threshold on a 0.01 grid ×
    a log-spaced set-size range, evaluated as ONE Spark job, must equal
    the brute-force smallest k with double(k)/n >= t. Catches any future
    drift between the column expression and the verify division."""
    from pyspark.sql import functions as F

    from skope_api_spark.operators.setjoin import _min_overlap

    ns = [1, 2, 3, 5, 7, 10, 13, 30, 100, 300, 999, 1500, 4096, 30000,
          99991, 1000000]
    ts = [i / 100 for i in range(1, 101)]
    rows = [(t, n) for t in ts for n in ns]
    df = spark.createDataFrame(rows, "t double, n int")
    # _min_overlap takes a python float t; evaluate per distinct t via a
    # CASE chain is heavy — instead exploit that the expression only
    # uses t as a literal: group rows by t and run one select per t on
    # a cached local frame would be 100 jobs. Cheaper: build the k
    # column with t as a COLUMN using the same arithmetic.
    k0 = F.ceil(F.col("t") * F.col("n"))
    k = F.when(
        (k0 - 1).cast("double") / F.col("n") >= F.col("t"), k0 - 1
    ).otherwise(k0)
    got = {(r.t, r.n): r.k for r in df.select("t", "n", k.alias("k")).collect()}
    for t, n in rows:
        lo = max(0, int(t * n) - 2)
        ref = next(kk for kk in range(lo, n + 1) if kk / n >= t)
        assert got[(t, n)] == ref, (t, n, got[(t, n)], ref)
    # and the Python-literal form agrees with the column form on a spot
    one = spark.range(1)
    for t, n in [(0.81, 300), (0.55, 100), (0.67, 1500)]:
        kc = one.select(_min_overlap(t, F.lit(n)).alias("k")).collect()[0].k
        assert kc == got[(t, n)], (t, n)


def test_line_cutter_randomized_vs_split_slices(spark):
    """200 seeded-random whitespace-hostile strings × t in 1..4, one
    Spark job per t: the regex line cutter must reproduce split(' ')
    slices exactly (r14 ADVICE regression, randomized layer)."""
    import random

    from skope_api_spark.operators.text import with_doc_lines

    rng = random.Random(1414)
    alphabet = "ab \t  "  # space-heavy: empty tokens are common
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        list(enumerate(strings)), "doc_id long, text string"
    )
    for t in (1, 2, 3, 4):
        rows = with_doc_lines(df, tokens_per_line=t).collect()
        got, nl = {}, {}
        for r in rows:
            got.setdefault(r.doc_id, []).append((r.pos, r.line))
            nl[r.doc_id] = r.n_lines
        for i, s in enumerate(strings):
            toks = s.split(" ")
            exp = [" ".join(toks[j : j + t]) for j in range(0, len(toks), t)]
            lines = [l for _, l in sorted(got[i])]
            assert lines == exp, (t, repr(s))
            assert nl[i] == len(exp), (t, repr(s))

def test_recall_report_label_free_inputs_skip_hardneg_rows(spark):
    """r15 ADVICE: ann_recall_report on a corpus/queries pair WITHOUT a
    label column must still produce the label-free recall rows
    (previously it raised AnalysisException from the unconditional
    hard_negative_mining call); with labels present the label-codebook
    IVF row and the two hardneg rows are added back."""
    from skope_api_spark.operators.similarity import ann_recall_report

    base = [1.0 if (d * 7) % 3 else -1.0 for d in range(64)]
    rows = [
        (i, [x * (1.0 + 0.1 * i) for x in base], i % 3) for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = df.where(F.col("vec_id") < 3)

    unlabeled = ann_recall_report(
        df.drop("label"), queries.drop("label"), k=2
    ).collect()
    methods = {r.method for r in unlabeled}
    assert len(unlabeled) == 8
    assert not any(m.startswith("hardneg") for m in methods)
    assert "topk_ivf_label" not in methods

    labeled = ann_recall_report(df, queries, k=2).collect()
    assert {r.method for r in labeled} - methods == {
        "topk_ivf_label", "hardneg_bucketed_2x8", "hardneg_bucketed_4x4"
    }
    assert len(labeled) == 11
