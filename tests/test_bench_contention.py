"""Pins bench.py's contention self-labeling (r15, VERDICT r14 item 4).

The detector exists to auto-adjudicate the hypervisor-neighbor signature
(BENCH_r12's 46 s, BENCH_r14's 18.6 s artifacts) WITHOUT masking real
per-query regressions — so both directions are pinned: uniform inflation
flags, isolated inflation does not. No Spark needed; the detector is
pure arithmetic over the committed quiet anchors.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench_module",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_uniform_inflation_flags_suspect():
    # the r15 live catch: every query ~1.45x the quiet anchors
    run = {n: t * 1.45 for n, t in bench.QUIET_ANCHORS.items()}
    c = bench.contention_check(run)
    assert c["suspect"] is True
    assert c["median_ratio_vs_quiet"] > 1.4
    assert c["frac_over_1p2"] >= 0.9


def test_clean_run_not_flagged():
    c = bench.contention_check(dict(bench.QUIET_ANCHORS))
    assert c["suspect"] is False
    assert abs(c["median_ratio_vs_quiet"] - 1.0) < 1e-9


def test_single_query_regression_not_masked():
    """A 3x regression in ONE query must NOT read as contention — the
    flag would otherwise hide exactly the signal the bench exists for."""
    run = dict(bench.QUIET_ANCHORS)
    run["dedup_minhash_near_duplicates"] *= 3.0
    c = bench.contention_check(run)
    assert c["suspect"] is False


def test_partial_coverage_returns_none():
    # fewer than 8 anchored queries -> no verdict (new/renamed headline)
    assert bench.contention_check({"q1_pricing_summary": 1.0}) is None


def test_borderline_uniformity_requires_both_conditions():
    # median over 1.3 but only half the queries inflated -> not suspect
    names = sorted(bench.QUIET_ANCHORS)
    run = {}
    for i, n in enumerate(names):
        run[n] = bench.QUIET_ANCHORS[n] * (1.5 if i % 2 == 0 else 1.0)
    c = bench.contention_check(run)
    assert c["suspect"] is False


def test_persistent_uniform_inflation_marks_regression(monkeypatch):
    """r16 (ADVICE r15): suspect=true is 'retry required', not
    exoneration — when the last PERSISTENT_N recorded driver rounds were
    ALSO uniformly inflated, the run must carry
    persistent_uniform_inflation=true (a hypervisor window passes; a
    global code/config regression persists)."""
    run = {n: t * 1.5 for n, t in bench.QUIET_ANCHORS.items()}
    monkeypatch.setattr(
        bench, "_prior_round_median_ratios", lambda: [1.0, 1.45, 1.5, 1.42]
    )
    c = bench.contention_check(run)
    assert c["suspect"] is True
    assert c.get("persistent_uniform_inflation") is True


def test_one_quiet_round_breaks_persistence(monkeypatch):
    monkeypatch.setattr(
        bench, "_prior_round_median_ratios", lambda: [1.45, 1.05, 1.5]
    )
    c = bench.contention_check(
        {n: t * 1.5 for n, t in bench.QUIET_ANCHORS.items()}
    )
    assert c["suspect"] is True
    assert "persistent_uniform_inflation" not in c


def test_clean_run_never_checks_persistence(monkeypatch):
    monkeypatch.setattr(
        bench, "_prior_round_median_ratios",
        lambda: (_ for _ in ()).throw(AssertionError("must not be called")),
    )
    c = bench.contention_check(dict(bench.QUIET_ANCHORS))
    assert c["suspect"] is False
