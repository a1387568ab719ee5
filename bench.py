#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly ONE JSON line on stdout:
  {"metric": "headline_total", "value": <sum warm sec>, "unit": "sec",
   "queries": {"q1_pricing_summary": sec, ...},
   "queries_cold": {...}, "sf": 0.1}

Each query is materialized with the noop sink (full execution, no
driver-side collect cost — we're timing the engine, not Python pickling).

Each query runs 1 cold + N warm times (round 4, N=3 since r8 for the
headline and r17 for the ext group): the first (cold) run absorbs
one-time whole-stage-codegen JIT — ~10 s for the very wide hash plans
(minhash/simhash), pure noise for regression tracking — and the MEDIAN
of the warm runs is the steady-state number the totals sum. Cold times
are kept as a separate column so codegen-cost regressions stay visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Stable headline set: the relational spine, the window core, and (as they
# land) the LLM-pipeline operators. Names missing from the registry are
# skipped so bench.py never breaks on a partial build.
HEADLINE = [
    # relational spine
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top_parts_by_revenue",
    "distinct_agg_suppliers_per_brand",
    # window / time-series core
    "w1_centered_moving_average",
    "w3_rolling_zscore",
    "sessionize_events",
    "range_frame_rolling_hour",
    "asof_join_purchase_to_click",
    # LLM-pipeline operators
    "dedup_exact_documents",
    "dedup_minhash_near_duplicates",
    "dedup_simhash_near_duplicates",
    "sim_cosine_topk",
    "sim_lsh_bucket_topk",
    # sim_pq_rerank_topk is deliberately NOT in the headline: its wall
    # time is ~90% one-off codebook training + code materialization
    # (amortized across query batches in production, measured separately
    # in PERF.md) — adding it would break cross-round comparability of
    # headline_total
    "text_quality_stats",
    "text_tfidf_top_terms",
]

# Second recorded group (round 8, VERDICT r7 item 6): the round-7 operator
# surfaces whose perf had no round-over-round tracking — graph, the
# distributed prefix-sum stats family, BPE, entity-resolution blocking,
# spatial, PQ — plus this round's money-ticks flagship. Kept SEPARATE from
# HEADLINE so `value`/`queries` stay comparable across every recorded
# round; these emit as `queries_ext`/`value_ext` in the same JSON line.
HEADLINE_EXT = [
    "graph_triangle_top_nodes",
    "graph_pagerank_copurchase",
    "stats_auc_chars_vs_lang",
    "hist_equi_depth_price",
    "text_bpe_train_merges",
    "text_bpe_encode_profile",
    "er_customer_record_clusters",
    "sim_pq_topk",
    "spatial_join_points_polygons",
    "stats_ks_price_by_segment",
]


# Per-query quiet anchors for the contention self-labeler (r15, VERDICT
# r14 item 4): when per-query ratios vs these inflate UNIFORMLY beyond
# ~1.3x, the run gets contention_suspect=true — the all-boats-rise
# hypervisor signature that cost manual arbitration in r12 and r14. A
# non-uniform inflation (a few queries hot, the rest at par) is NOT
# flagged: that shape is a code regression and must stay visible.
#
# RE-ANCHORED r16 (VERDICT r15 item 5): the r13 anchors sat ~1.25x below
# every r15-observable run (median ratio 1.235 on a clean bracket — 0.065
# from the 1.3 trigger), which would eventually misfire suspect=true on
# clean runs. Policy executed: three consecutive suspect=false same-HEAD
# brackets agreeing within 5% (16.582 / 16.444 / 16.107 s headline,
# medians 1.165 / 1.186 / 1.124 vs r13) -> anchors = per-query MIN across
# that bracket. Re-anchor again only under the same rule.
QUIET_ANCHORS = {
    "q1_pricing_summary": 0.593,
    "q3_shipping_priority": 0.762,
    "q5_local_supplier_volume": 0.937,
    "top_parts_by_revenue": 0.955,
    "distinct_agg_suppliers_per_brand": 0.819,
    "w1_centered_moving_average": 0.359,
    "w3_rolling_zscore": 0.397,
    "sessionize_events": 0.582,
    "range_frame_rolling_hour": 0.506,
    "asof_join_purchase_to_click": 0.631,
    "dedup_exact_documents": 0.277,
    "dedup_minhash_near_duplicates": 2.553,
    "dedup_simhash_near_duplicates": 2.418,
    "sim_cosine_topk": 0.828,
    "sim_lsh_bucket_topk": 1.409,
    "text_quality_stats": 0.397,
    "text_tfidf_top_terms": 0.814,
    "graph_triangle_top_nodes": 3.559,
    "graph_pagerank_copurchase": 2.927,
    "stats_auc_chars_vs_lang": 0.64,
    "hist_equi_depth_price": 3.854,
    "text_bpe_train_merges": 1.787,
    "text_bpe_encode_profile": 3.802,
    "er_customer_record_clusters": 7.736,
    "sim_pq_topk": 1.208,
    "spatial_join_points_polygons": 1.069,
    "stats_ks_price_by_segment": 1.986,
}


def contention_check(all_times: dict[str, float]) -> dict | None:
    """Uniform-inflation detector vs the committed quiet anchors.

    suspect=true iff the MEDIAN per-query ratio exceeds 1.3 AND >=80% of
    anchored queries are over 1.2x — the all-boats-rise hypervisor
    signature. Isolated hot queries keep suspect=false so real
    regressions are never masked.

    SEMANTICS (r16, ADVICE r15): suspect=true means "retry under quiet
    conditions REQUIRED", never exoneration — a genuine global
    regression (a session/config change inflating every query ~1.5x)
    produces the same uniform shape. The disambiguator is persistence:
    hypervisor windows pass, code regressions don't. When the LAST
    `PERSISTENT_N` recorded driver rounds (BENCH_r*.json) were all
    uniformly inflated too, the run additionally sets
    persistent_uniform_inflation=true — treat THAT as a regression until
    a quiet-host run proves otherwise (and if a quiet-host bracket
    agrees with the anchors, re-anchor instead; see QUIET_ANCHORS note).
    """
    ratios = sorted(
        t / QUIET_ANCHORS[n]
        for n, t in all_times.items()
        if QUIET_ANCHORS.get(n)
    )
    if len(ratios) < 8:
        return None
    med = ratios[len(ratios) // 2]
    frac = sum(r > 1.2 for r in ratios) / len(ratios)
    suspect = bool(med > 1.3 and frac >= 0.8)
    out = {
        "median_ratio_vs_quiet": round(med, 3),
        "frac_over_1p2": round(frac, 2),
        "suspect": suspect,
    }
    if suspect:
        prior = _prior_round_median_ratios()
        if len(prior) >= PERSISTENT_N and all(
            r is not None and r > 1.3 for r in prior[-PERSISTENT_N:]
        ):
            out["persistent_uniform_inflation"] = True
    return out


PERSISTENT_N = 3


def _prior_round_median_ratios() -> list:
    """median_ratio_vs_quiet from the last recorded driver BENCH_r*.json
    lines (None where a round predates the detector or didn't parse)."""
    import glob
    import re as _re

    out = []
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            blob = open(path).read()
        except OSError:
            continue
        m = _re.search(r'"median_ratio_vs_quiet":\s*([0-9.]+)', blob)
        out.append(float(m.group(1)) if m else None)
    return out


def host_telemetry() -> dict:
    """Contention snapshot emitted with every bench line (r13, VERDICT r12
    item 2): BENCH_r12 recorded a 46 s headline that was pure host noise
    (three same-HEAD runs measured 15.1-17.3 s) and cost a full
    arbitration pass to adjudicate. loadavg + competing heavy processes
    make the next inflated artifact self-diagnosing."""
    tele: dict = {}
    try:
        la1, la5, la15 = os.getloadavg()
        tele["loadavg"] = [round(la1, 2), round(la5, 2), round(la15, 2)]
    except OSError:
        pass
    tele["cpus"] = os.cpu_count()
    # count OTHER java/python processes (potential CPU competitors for the
    # 32-thread shuffle); exclude self and our own process subtree (the
    # bench's JVM and any pyspark workers)
    ppid_of: dict[int, int] = {}
    comm_of: dict[int, str] = {}
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    parts = fh.read().rsplit(")", 1)[1].split()
                with open(f"/proc/{pid}/comm") as fh:
                    comm = fh.read().strip()
            except (OSError, IndexError):
                continue
            ppid_of[int(pid)] = int(parts[1])
            comm_of[int(pid)] = comm
    except OSError:
        return tele
    own = {os.getpid()}
    # one pass per tree depth; bench subtree is shallow (py -> java -> *)
    for _ in range(8):
        grew = {p for p, pp in ppid_of.items() if pp in own} - own
        if not grew:
            break
        own |= grew
    tele["competing_jvm_py"] = sum(
        1
        for p, c in comm_of.items()
        if p not in own and c.startswith(("java", "python"))
    )
    return tele


def main() -> int:
    tele = host_telemetry()  # snapshot BEFORE the run: pre-existing load
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    import __spark_entry__ as e
    from skope_api_spark.session import get_spark

    spark = get_spark("bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = e.queries()

    # Warm the JVM + file-listing caches WITHOUT executing any headline
    # query (warming with q1 would make q1's "cold" row its second run,
    # hiding codegen-cost regressions in exactly the column built to show
    # them); order_count_distribution shares the orders scan but none of
    # the headline plans.
    warmup = qs.get("order_count_distribution") or next(iter(qs.values()))
    warmup(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # r8 (VERDICT r7 "bench recording hygiene"): the recorded warm number
    # is the MEDIAN of 3 post-cold runs — the shared host's ±30%
    # run-to-run variance was costing round-over-round signal (r7's
    # headline "regression" was mostly one contended recording). The cold
    # column stays a single first run by construction (it exists to show
    # one-time codegen cost, which only happens once).
    warm_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def run_group(
        names: list[str], runs: int
    ) -> tuple[dict[str, float], dict[str, float]]:
        warm: dict[str, float] = {}
        cold: dict[str, float] = {}
        for name in names:
            if name not in qs:
                continue
            samples = []
            for i in range(1 + runs):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.perf_counter() - t0, 3)
                if i == 0:
                    cold[name] = dt
                else:
                    samples.append(dt)
            # SPARK_GRAFT_BENCH_RUNS=0 degrades to cold-only recording
            # instead of crashing on an empty median
            warm[name] = (
                sorted(samples)[len(samples) // 2] if samples else cold[name]
            )
        return warm, cold

    times, cold = run_group(HEADLINE, warm_runs)
    # ext group: median-of-3 warm runs, SAME protocol as the headline
    # (r17 measurement fix, VERDICT r16 items 1-2): the former single
    # warm run made every ext number a one-sample draw, and whole-stage
    # codegen JIT takes 3-5 runs to converge on slow hosts — BOTH r16
    # "perf_weak" rows (graph_pagerank_copurchase 9.554 s, sim_pq_topk
    # 2.736 s) were single ext runs that interleaved A/Bs measured at
    # 3.07 s / ~1.9 s. Old single-run numbers stay recorded in
    # BENCH_r16.json and earlier; the metric semantics are unchanged
    # (per-query warm seconds; cold column still the first run). Cost:
    # ~+2x ext wall per bracket (~+60 s at sf0.1), well inside the
    # driver budget.
    times_ext, cold_ext = run_group(HEADLINE_EXT, warm_runs)

    try:
        tele["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        pass
    contention = contention_check({**times, **times_ext})
    out = {
        "host": tele,
        "contention": contention,
        "contention_suspect": bool(contention and contention["suspect"]),
        "metric": "headline_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "queries_cold": cold,
        "value_ext": round(sum(times_ext.values()), 3),
        "queries_ext": times_ext,
        "queries_ext_cold": cold_ext,
        "sf": sf,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
