"""Registry-wide physical-plan guard: no contract query may plan a
CartesianProduct.

A cartesian is the canonical scale-killer — O(|A|·|B|) rows moved — and
it can appear silently when a join loses its equi-conjunct in a refactor
(e.g. a key rename turning `a.k == b.k` into a trivially-true literal
comparison). Planning is cheap (no job runs: `executedPlan()` stops at
the initial adaptive plan), so every registered query is checked.

1-row broadcast cross joins (scalar-aggregate broadcasts: TF-IDF corpus
size, q22's average, the bloom filter row) plan as
BroadcastNestedLoopJoin with a 1-row build side — bounded and
intentional — so BNLJ is NOT flagged; only CartesianProduct is.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plan_of(spark):
    """Module-shared plan cache: planning every registry query costs
    ~0.5-1 s each (263 queries), and before r17 this module built the
    same plans up to three times across its tests (the two full-registry
    sweeps plus the rotation-block re-plans) — ~7 minutes of pure
    re-planning inside the driver's pytest budget. Plans are
    deterministic for a fixed session + SF_DIR, so one cache serves
    every assertion; each query is still planned (and checked) at least
    once per run — coverage is unchanged, only repetition is gone."""
    import __spark_entry__ as entry

    qs = entry.queries()
    cache: dict[str, str] = {}

    def _plan(name: str) -> str:
        if name not in cache:
            cache[name] = (
                qs[name](spark, SF_DIR)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        return cache[name]

    return _plan


def test_no_query_plans_a_cartesian_product(spark, plan_of):
    import __spark_entry__ as entry

    offenders = []
    for name in entry.queries():
        if "CartesianProduct" in plan_of(name):
            offenders.append(name)
    assert offenders == [], (
        f"queries planning a CartesianProduct: {offenders}"
    )


def test_no_query_plans_row_python_udf(spark, plan_of):
    """Registry-wide: no query may plan a BatchEvalPython stage — the
    row-at-a-time Python UDF executor (each row round-trips through
    pickle, ~10-100× slower than Arrow batches). Vectorized boundaries
    (ArrowEvalPython, MapInPandas, FlatMapGroupsInPandas) stay legal;
    the ban is specifically on the per-row interpreter loop, which has
    been an engine-wide invariant since round 1 but was only enforced
    by grep until now."""
    import __spark_entry__ as entry

    offenders = []
    for name in entry.queries():
        if "BatchEvalPython" in plan_of(name):
            offenders.append(name)
    assert offenders == [], (
        f"queries planning a row-Python UDF stage: {offenders}"
    )


def test_qshape_scan_pushdown_and_topk_shapes(spark, plan_of):
    """Pins the r11 plan audit of the newly-gated TPC-H q-shapes: the
    selective predicates must reach the parquet scan (PushedFilters) and
    the top-k queries must compile to TakeOrderedAndProject — a refactor
    that wraps a filtered column in an expression (killing pushdown) or
    replaces limit-after-sort (materializing a global sort) fails here
    before it costs anything at scale."""
    # predicate -> scan pushdown (representatives of each pushdown kind
    # seen in the audit: date range, equality, string prefix). Matched
    # with tolerant regexes — filter tag + column inside a PushedFilters
    # list — not the exact `EqualTo(col,val)` rendering, which is
    # engine-version-sensitive formatting (ADVICE r11).
    import re

    def pushed(plan, tag, col):
        return any(
            re.search(rf"{tag}\([^)]*{col}", blk)
            for blk in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        )

    p = plan_of("q4_order_priority_check")
    assert pushed(p, "GreaterThanOrEqual", "o_orderdate")
    assert pushed(p, "LessThan", "o_orderdate")
    p = plan_of("q10_returned_item_customers")
    assert pushed(p, "EqualTo", "l_returnflag")
    assert "TakeOrderedAndProject" in p
    p = plan_of("q20_part_supplier_shortlist")
    assert pushed(p, "StringStartsWith", "p_name")
    p = plan_of("q18_large_volume_customers")
    assert "TakeOrderedAndProject" in p
    # scalar-subquery thresholds stay 1-row broadcasts, not cartesians
    p = plan_of("q22_dormant_rich_customers")
    assert "CartesianProduct" not in p


def test_r12_rotation_block_plan_shapes(spark, plan_of):
    """Pins the r12 gate-rotation block's plan audit (VERDICT r11 item 7),
    the same way the q-shapes got pushdown/top-k pins in r11:

    - WINDOW FRAMES: every ts_* first-timer that uses a window must plan
      the BOUNDED RowFrame its semantics allow — a refactor that widens a
      lag/rolling frame to an unbounded sort-the-world frame fails here
      before it costs a full-partition materialization at 100 TB.
      (ts_cumulative_unique_users_daily and ts_gap_fill_interpolate are
      the two documented unbounded exceptions: running totals and
      next-valid-value interpolation are genuinely cumulative.)
    - PYTHON BOUNDARIES: within the block, only the documented Arrow
      surfaces may plan one — text_unicode_normalize (one mapInPandas:
      Python's unicodedata has no JVM equivalent) and the two mm_*
      binary sniffs (decode ladder). Every other text_*/ts_* first-timer
      must stay whole-stage-codegen JVM (zero MapInPandas /
      ArrowEvalPython / FlatMapGroupsInPandas)."""
    # bounded-frame pins (frame text is stable lowercase catalyst form)
    p = plan_of("ts_hampel_filter_events")
    assert "specifiedwindowframe(RowFrame, -3, 3)" in p
    assert "unboundedfollowing" not in p
    p = plan_of("ts_mom_yoy_revenue_growth")
    assert "specifiedwindowframe(RowFrame, -1, -1)" in p
    assert "specifiedwindowframe(RowFrame, -12, -12)" in p
    assert "unboundedfollowing" not in p
    p = plan_of("ts_level_shift_monthly_revenue")
    assert "specifiedwindowframe(RowFrame, -5, -1)" in p
    assert "unboundedfollowing" not in p
    p = plan_of("ts_seasonal_anomaly_flags")
    assert "specifiedwindowframe(RowFrame, -6, 6)" in p
    assert "unboundedfollowing" not in p

    # Python-boundary budget: documented Arrow surfaces only
    PY_MARKS = ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
                "BatchEvalPython")
    documented = {"text_unicode_normalize", "mm_media_sniff_quarantine",
                  "mm_geotiff_header_sniff"}
    block = [
        "text_redact_pii", "text_repetition_stats", "text_unicode_normalize",
        "text_char_entropy", "text_readability_scores", "text_zipf_slope",
        "text_unigram_logprob", "text_vocabulary_richness",
        "ts_gap_fill_interpolate", "ts_mom_yoy_revenue_growth",
        "ts_rolling_distinct_users_24h", "ts_dau_wau_mau_stickiness",
        "ts_level_shift_monthly_revenue", "ts_seasonal_anomaly_flags",
        "ts_cumulative_unique_users_daily", "ts_hampel_filter_events",
        "mm_media_sniff_quarantine", "mm_geotiff_header_sniff",
        "session_top_paths", "skew_hot_key_report",
    ]
    offenders = []
    for name in block:
        p = plan_of(name)
        has_py = any(m in p for m in PY_MARKS)
        if has_py and name not in documented:
            offenders.append(name)
        if name in documented:
            assert "MapInPandas" in p, f"{name} lost its Arrow decode stage"
    assert offenders == [], (
        f"undocumented Python boundary in r12 block: {offenders}"
    )


def test_r13_rotation_block_plan_shapes(spark, plan_of):
    """Pins the r13 gate-rotation block's plan audit (VERDICT r12 item 6),
    extending the r11 q-shape and r12 bounded-frame pins:

    - STATS ONE-PASS SHAPES: every stats_* first-timer is an aggregation
      query (Welch t, OLS, contingency, two-proportion, Wilson, HHI,
      elasticity, confusion report) whose math reduces to grouped sums —
      none may plan a Window sort. A refactor that rewrites a grouped
      moment as a windowed running moment fails here before it
      materializes a full partition sort at 100 TB.
    - PQ BROADCAST-LUT JOIN: sim_pq_topk / sim_pq_rerank_topk join codes
      against the broadcast codebook LUT as a BroadcastHashJoin equi-join;
      a lost equi-conjunct (BNLJ) or a shuffled SortMergeJoin on the
      codes-side fails here.
    - PYTHON-BOUNDARY BUDGET: within the r13 block the only documented
      Arrow surface is skope_reference_raster_zonal (mapInPandas raster
      decode on executors); every other first-timer stays whole-stage
      JVM codegen."""
    STATS = [
        "stats_welch_ttest_segment", "stats_ols_price_by_flag",
        "stats_contingency_type_hour", "stats_two_proportion_ab",
        "stats_return_rate_wilson_by_flag_status",
        "stats_hhi_supplier_concentration",
        "stats_discount_elasticity_by_brand",
        "stats_langid_confusion_report",
    ]
    windowed = [n for n in STATS if "Window" in plan_of(n)]
    assert windowed == [], f"stats_* planning a window sort: {windowed}"

    for name in ("sim_pq_topk", "sim_pq_rerank_topk"):
        p = plan_of(name)
        assert "BroadcastHashJoin" in p, f"{name} lost the broadcast LUT join"
        assert "BroadcastNestedLoopJoin" not in p, (
            f"{name} degraded to BNLJ (lost equi-conjunct)"
        )
        assert "SortMergeJoin" not in p, (
            f"{name} shuffles the codes side instead of broadcasting the LUT"
        )

    PY_MARKS = ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
                "BatchEvalPython")
    documented = {"skope_reference_raster_zonal"}
    block = STATS + [
        "text_decontaminate_probe_overlap", "text_boilerplate_ngrams",
        "text_domain_profile", "text_bigram_logprob",
        "text_bpe_encode_profile", "text_keyness_llr",
        "text_ctfidf_top_terms_per_source", "text_js_divergence_langs",
        "sim_pq_topk", "sim_pq_rerank_topk", "sample_token_budget_mixing",
        "skope_reference_raster_zonal",
    ]
    offenders = []
    for name in block:
        p = plan_of(name)
        has_py = any(m in p for m in PY_MARKS)
        if has_py and name not in documented:
            offenders.append(name)
        if name in documented:
            assert "MapInPandas" in p, f"{name} lost its Arrow decode stage"
    assert offenders == [], (
        f"undocumented Python boundary in r13 block: {offenders}"
    )


def test_r13_new_query_plan_shapes(spark, plan_of):
    """Pins the two queries ADDED in r13 (q13 + containment join), same
    discipline as the rotation-block pins:

    - q13: the NOT-LIKE exclusion must reach the orders parquet scan as
      a pushed filter (it is a single-side predicate even though the
      JOIN keeps zero-order customers), the customer scan must stay
      pruned to the join key, and the distribution must plan as two
      cascaded partial-aggregating HashAggregates — never a Window.
    - dedup_containment_pairs: candidates come from the shingle
      EQUI-join (prefix lemma), never a cartesian, and the whole
      pipeline stays JVM codegen (no Python boundary)."""
    p = plan_of("q13_customer_order_distribution")
    assert "Not(StringContains(o_orderpriority,LOW))" in p, (
        "q13 exclusion predicate no longer pushed to the orders scan"
    )
    assert "ReadSchema: struct<c_custkey:bigint>" in p, (
        "q13 customer scan reads more than the join key"
    )
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert p.count("partial_count") >= 2, (
        "q13 lost a map-side partial aggregation"
    )

    PY_MARKS = ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
                "BatchEvalPython")
    p = plan_of("dedup_containment_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert not any(m in p for m in PY_MARKS), (
        "containment join grew a Python boundary"
    )
    # the size filter must ride the candidate equi-join as a residual,
    # not wait for the verify stage
    assert "CEIL((0.8" in p, "containment size filter fell off the join"


def test_r14_rotation_block_plan_shapes(spark, plan_of):
    """Pins the r14 gate-rotation block's plan audit (VERDICT r13 item 5),
    extending the r11-r13 rotation pins:

    - GRAPH SHAPES: the three graph_* first-timers never plan a
      CartesianProduct; adamic_adar's wedge enumeration is an EQUI-join
      on the shared-neighbor key (hash-join family, never BNLJ — a lost
      equi-conjunct would go quadratic in edges at 100 TB).
      degree_assortativity's two BNLJs are 1-row scalar-aggregate
      broadcasts (the mean-degree moments) — bounded and intentional.
      transition_matrix's unbounded window frame is PARTITIONED by the
      source state (per-node normalization, bounded by out-degree).
    - CDC/PIT MAX-STRUCT SHAPES: cdc_apply_customers and
      pit_join_orders_customers plan NO Window operator — latest-version
      selection is the max-struct aggregation (partial-aggregatable,
      no full partition sort) and the PIT match rides hash equi-joins
      with the time predicate as a residual, never BNLJ.
    - INTERVAL JOIN: interval_join_click_purchase is the BUCKETED
      equi-join form — explode over bucket ids feeding a hash-family
      equi-join with the interval predicate as a residual; a lost
      bucket conjunct (BNLJ/cartesian) fails here.
    - TS FRAMES: the four ts_* first-timers keep running/rolling frames
      (no unboundedfollowing anywhere — a reversed cumulative would
      force a second full sort pass).
    - PYTHON-BOUNDARY BUDGET: no query in the r14 block has a
      documented Arrow surface; all twenty stay whole-stage JVM
      codegen."""
    BLOCK = [
        "q13_customer_order_distribution", "dedup_containment_pairs",
        "graph_adamic_adar_links", "graph_degree_assortativity",
        "graph_transition_matrix", "dq_duplicate_payment_candidates",
        "dq_k_anonymity_customers", "dq_single_source_risk_parts",
        "sample_ht_total_estimate", "sample_temperature_mixing",
        "sample_weighted_by_tokens", "ts_daily_value_bands",
        "ts_load_profile_dow_hour", "ts_new_vs_returning_revenue",
        "ts_seasonal_naive_backtest", "scalar_bitwise_battery",
        "scalar_try_arithmetic_battery", "cdc_apply_customers",
        "pit_join_orders_customers", "interval_join_click_purchase",
    ]
    plans = {n: plan_of(n) for n in BLOCK}

    # graph shapes
    for n in ("graph_adamic_adar_links", "graph_degree_assortativity",
              "graph_transition_matrix"):
        assert "CartesianProduct" not in plans[n], n
    p = plans["graph_adamic_adar_links"]
    assert "BroadcastNestedLoopJoin" not in p, (
        "adamic_adar wedge join lost its equi-conjunct"
    )
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p \
        or "ShuffledHashJoin" in p

    # cdc/pit max-struct + residual-hash-join shapes
    for n in ("cdc_apply_customers", "pit_join_orders_customers"):
        p = plans[n]
        assert "Window" not in p, f"{n} regressed to a window sort"
        assert "BroadcastNestedLoopJoin" not in p, n
        assert "CartesianProduct" not in p, n
        assert "BroadcastHashJoin" in p or "SortMergeJoin" in p \
            or "ShuffledHashJoin" in p, f"{n} lost its hash equi-join"

    # bucketed interval join
    p = plans["interval_join_click_purchase"]
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p, (
        "interval join lost its bucket equi-conjunct (BNLJ)"
    )
    assert "explode" in p, "interval join lost its bucket explode"
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p \
        or "ShuffledHashJoin" in p

    # ts frames: running/rolling only
    for n in ("ts_daily_value_bands", "ts_load_profile_dow_hour",
              "ts_new_vs_returning_revenue", "ts_seasonal_naive_backtest"):
        assert "unboundedfollowing" not in plans[n].lower(), n

    # python-boundary budget: zero Arrow/Python stages in the block
    PY_MARKS = ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
                "BatchEvalPython")
    offenders = [n for n in BLOCK
                 if any(m in plans[n] for m in PY_MARKS)]
    assert offenders == [], (
        f"undocumented Python boundary in r14 block: {offenders}"
    )


def test_r15_rotation_block_plan_shapes(spark, plan_of):
    """Pins the r15 gate-rotation block (the final 27 never-driver-checked
    queries, named in contract/__init__.py's GATE-ORDER PLAN r15) ahead
    of their window — same discipline as the r11-r14 rotation pins:

    - PYTHON-BOUNDARY BUDGET: none of the 27 has a documented Arrow
      surface; all stay whole-stage JVM codegen.
    - CLEAN SHAPES stay clean: the prefix join, pipeline keep-best-rep,
      IP-block range join, JSON quarantine and snapshot diff plan no
      Window, no BNLJ, no cartesian.
    - grouping_sets / unpivot keep their Expand (the one-pass
      multi-grouping shape — losing it means N scans).
    - rec_item_item_neighbors: co-occurrence is an EQUI-join on the
      shared basket key, never a cartesian.
    - spatial_nearest_site: per-point argmin is an aggregation
      (min-struct), never a window sort; the site table is a bounded
      broadcast (BNLJ allowed, documented).
    - sim_exact_cosine_pairs is the DOCUMENTED all-pairs verification
      baseline — its BNLJ is the point, so it is exempt here.
    - Unbounded-following frames in the report queries (pareto/ABC/
      share/mix-shift/spans) are PARTITIONED group-total frames —
      bounded by group size, audited by eye in r14; only new GLOBAL
      sorts would regress, which the no-cartesian + window-count pins
      downstream of refactors would surface in review."""
    BLOCK = [
        "abc_inventory_classification", "cohort_ltv_curve_quarterly",
        "conditional_agg_battery", "customer_revenue_concentration",
        "dedup_duplicate_spans", "dedup_jaccard_prefix_join",
        "grouping_sets_order_mix", "json_quarantine_ingest",
        "mix_shift_price_bands_yearly", "net_ip_block_enrichment",
        "pack_documents_token_budget", "pareto_revenue_concentration",
        "pipeline_keep_best_rep", "rec_item_item_neighbors",
        "rfm_repeat_purchase_latency", "session_bounce_rate",
        "share_of_region_revenue", "sim_exact_cosine_pairs",
        "sim_hard_negatives", "sim_ivf_kmeans_topk",
        "sla_shipping_lead_time_report", "snapshot_diff_customers",
        "spatial_nearest_site", "sql_pipe_syntax_priority_rollup",
        "top_movers_monthly_priority", "topn_parts_per_brand",
        "unpivot_priority_price_stats",
    ]
    plans = {n: plan_of(n) for n in BLOCK}

    PY_MARKS = ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
                "BatchEvalPython")
    offenders = [n for n in BLOCK if any(m in plans[n] for m in PY_MARKS)]
    assert offenders == [], (
        f"undocumented Python boundary in r15 block: {offenders}"
    )

    for n in BLOCK:
        if n == "sim_exact_cosine_pairs":
            continue  # documented quadratic baseline
        assert "CartesianProduct" not in plans[n], n

    CLEAN = ("dedup_jaccard_prefix_join", "pipeline_keep_best_rep",
             "net_ip_block_enrichment", "json_quarantine_ingest",
             "snapshot_diff_customers")
    for n in CLEAN:
        p = plans[n]
        assert "Window" not in p, f"{n} grew a window sort"
        assert "BroadcastNestedLoopJoin" not in p, n

    for n in ("grouping_sets_order_mix", "unpivot_priority_price_stats"):
        assert "Expand" in plans[n], f"{n} lost its one-pass Expand"

    assert "Window" not in plans["spatial_nearest_site"], (
        "nearest-site argmin regressed to a window sort"
    )

def test_sim_hard_negatives_bucketed_plan_shape(spark, plan_of):
    """Pins the NEW r15 contract query (VERDICT r14 item 3): the
    corpus-scale hard-negative path must stay an EQUI-join on the
    (tbl, bucket) LSH keys — never a cartesian, never a broadcast
    nested-loop (the whole point vs the brute sibling), and no Python
    boundary (buckets are JVM-side bit arithmetic)."""
    plan = plan_of("sim_hard_negatives_bucketed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for m in ("MapInPandas", "ArrowEvalPython", "FlatMapGroupsInPandas",
              "BatchEvalPython"):
        assert m not in plan, m
    # the candidate join keys must survive optimization
    assert "bucket" in plan and "tbl" in plan

def test_exact_cosine_pairs_distributes_pair_space(spark, plan_of):
    """r15: the documented-quadratic exact baseline must still FAN OUT —
    the BNLJ's parallelism is the streamed side's partitioning, and a
    small parquet reads as one partition (the sf1 single-task 30+ min
    stall). Pin: explicit broadcast build side + round-robin exchange on
    the streamed side, so the pair space splits across cores."""
    plan = plan_of("sim_exact_cosine_pairs")
    assert "BroadcastNestedLoopJoin BuildRight" in plan, plan[:2000]
    assert "REPARTITION_BY_NUM" in plan or "RoundRobinPartitioning" in plan, (
        "streamed side lost its repartition — pair space back to one task"
    )


def test_exact_cosine_pairs_refuses_oversized_broadcast(spark):
    """r16 (ADVICE r15): the explicit F.broadcast bypasses
    autoBroadcastJoinThreshold, so a corpus beyond max_broadcast_rows
    must fail with a clear redirect to the bucketed paths, not a
    driver/executor OOM."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from skope_api_spark.operators.similarity import exact_cosine_pairs

    vecs = spark.range(8).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="max_broadcast_rows"):
        exact_cosine_pairs(vecs, max_broadcast_rows=4).collect()
    # at or under the cap the baseline still runs
    assert exact_cosine_pairs(vecs, max_broadcast_rows=8).count() == 28
