"""Unit pins for scripts/tie_audit.py — the repr-tie detector behind the
r16 rounded-division sweep (VERDICT r15 item 3).

The detector's contract: flag exactly the values where Spark's ROUND
(HALF_UP on the double's shortest decimal repr) can disagree with
DuckDB's (half-away-from-zero on the binary value) — quotients whose
shortest repr terminates at dp+1 fractional digits ending in 5 — and
classify each as exact (dyadic, provably stable), lucky (binary above
the tie), or diverge (binary below: flips the hash)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

from tie_audit import (  # noqa: E402
    _duckdb_round,
    _spark_round,
    classify_tie,
    is_repr_tie,
    rewrite_round,
)


class TestIsReprTie:
    def test_dyadic_tie(self):
        assert is_repr_tie(0.03125, 4)  # 1/32, exact .xxxx5
        assert is_repr_tie(0.09375, 4)  # 3/32

    def test_r15_failing_value(self):
        assert is_repr_tie(256437803 / 800, 4)  # repr 320547.25375

    def test_non_ties(self):
        assert not is_repr_tie(0.0313, 4)  # already rounded
        assert not is_repr_tie(1 / 3, 4)  # non-terminating repr
        assert not is_repr_tie(0.03125, 3)  # 5 lands past dp+1
        assert not is_repr_tie(0.0315, 4)  # terminates at dp, not dp+1
        assert not is_repr_tie(0.0, 4)
        assert not is_repr_tie(float("nan"), 4)
        assert not is_repr_tie(float("inf"), 4)

    def test_tie_at_other_dp(self):
        assert is_repr_tie(0.125, 2)
        assert is_repr_tie(151818.235, 2)


class TestClassify:
    def test_exact_dyadic_is_stable(self):
        # binary == decimal: both engines round up, forever
        assert classify_tie(0.03125, 4) == "exact"
        assert _spark_round(0.03125, 4) == _duckdb_round(0.03125, 4) == 0.0313

    def test_r15_value_diverges(self):
        v = 256437803 / 800  # binary sits below 320547.25375
        assert classify_tie(v, 4) == "diverge"
        assert _spark_round(v, 4) == 320547.2538
        assert _duckdb_round(v, 4) == 320547.2537

    def test_lucky_above(self):
        # 8001/800 = 10.00125: binary sits above the decimal tie
        v = 8001 / 800
        assert classify_tie(v, 4) == "lucky"
        assert _spark_round(v, 4) == _duckdb_round(v, 4) == 10.0013


class TestRewrite:
    def test_two_arg(self):
        assert (
            rewrite_round("SELECT ROUND(x / y, 4) FROM t")
            == "SELECT TIEPROBE(x / y, 4) FROM t"
        )

    def test_one_arg_gets_explicit_zero(self):
        assert (
            rewrite_round("SELECT round(x * 100) FROM t")
            == "SELECT TIEPROBE(x * 100, 0) FROM t"
        )

    def test_nested_and_string_literals(self):
        sql = "SELECT ROUND(SUM(ROUND(x)), 2), 'ROUND(keep,1)' FROM t"
        out = rewrite_round(sql)
        assert out == (
            "SELECT TIEPROBE(SUM(TIEPROBE(x, 0)), 2), 'ROUND(keep,1)' FROM t"
        )

    def test_commas_inside_nested_calls_not_counted(self):
        sql = "SELECT ROUND(COALESCE(a, b)) FROM t"
        assert rewrite_round(sql) == "SELECT TIEPROBE(COALESCE(a, b), 0) FROM t"
