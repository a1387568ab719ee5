"""Regression pins for the r15 driver red (cohort_ltv_curve_quarterly).

Two defects, each pinned here:

1. The contract used ``ROUND(double(cum_rev)/cohort_customers, 4)``. For
   any cohort size of the form 2^k*5^j the quotient can land on an
   EXACTLY-representable .xxxx5 (cohort size 8 -> denominator 800 =
   2^5*25: any cumulative cents that is an odd multiple of 25 yields a
   dyadic-rational true tie), and Spark's HALF_UP disagrees with
   DuckDB's round-half-to-even on true ties. The fix computes the 4-dp
   rounding by integer cross-multiplication — round(a/n) HALF_UP ==
   (2a+n) DIV (2n) on exact x1e4 units — identical bit-for-bit on both
   engines. The fixture below builds the minimal tie: an 8-customer
   cohort whose cumulative cents hit odd multiples of 25.

2. The local gate normalized floats to 9 significant digits
   (scripts/check_correctness.py), so a 4-dp divergence in a value
   >= 1e5 was structurally invisible locally while the driver's exact
   hash was red. ``_norm_cell`` is now exact; a 1-ulp diff must FAIL.
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _write_tie_fixture(tmp_path) -> str:
    """8 customers, all acquired in Q3-1997. Q3 prices sum to $0.75
    (75 cents = 25*3, odd multiple of 25 -> 0.75/8 = 0.09375, a true
    .xxxx5 tie at 4dp). One Q4 repeat order of $0.50 brings cumulative
    to $1.25 (125 cents = 25*5) -> 1.25/8 = 0.15625, a second tie."""
    import pandas as pd

    rows = []
    # seven customers at $0.01, one at $0.68 -> Q3 total $0.75
    for i in range(7):
        rows.append(
            (i + 1, i + 1, "F", 0.01, datetime.datetime(1997, 7, 10 + i), "3-MEDIUM")
        )
    rows.append((8, 8, "F", 0.68, datetime.datetime(1997, 8, 2), "3-MEDIUM"))
    # one repeat order next quarter -> cumulative $1.25
    rows.append((9, 1, "F", 0.50, datetime.datetime(1997, 11, 5), "3-MEDIUM"))
    df = pd.DataFrame(rows, columns=list(ORDERS_COLS))
    # timestamp[us] like the real testdata (ns parquet reads as BIGINT
    # under the session's nanosAsLong conf)
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"]).astype("datetime64[us]")
    out = str(tmp_path)
    df.to_parquet(os.path.join(out, "orders.parquet"), index=False)
    return out


class TestCohortLtvTieRounding:
    def test_power_of_two_cohort_half_up_on_both_engines(self, spark, tmp_path):
        import duckdb

        from skope_api_spark.contract import ORACLES, QUERIES

        sf_dir = _write_tie_fixture(tmp_path)
        got = {
            (r["cohort"].isoformat(), r["age_q"]): (
                r["cohort_customers"],
                r["cum_ltv_per_customer"],
            )
            for r in QUERIES["cohort_ltv_curve_quarterly"](spark, sf_dir).collect()
        }
        # HALF_UP: 0.09375 -> 0.0938, 0.15625 -> 0.1563 (round-half-even
        # would give 0.0938 and 0.1562 — age_q 1 is the discriminating row)
        assert got == {
            ("1997-07-01", 0): (8, 0.0938),
            ("1997-07-01", 1): (8, 0.1563),
        }

        con = duckdb.connect()
        p = os.path.join(sf_dir, "orders.parquet")
        con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{p}')")
        oracle = {
            (r[0].isoformat(), r[1]): (r[2], r[3])
            for r in con.execute(ORACLES["cohort_ltv_curve_quarterly"]).fetchall()
        }
        assert oracle == got  # exact equality, no tolerance

    def test_integer_half_up_identity(self):
        """round(a/n) HALF_UP == (2a+n) // (2n) for positive ints —
        the identity both engines' contract expressions rely on."""
        from decimal import ROUND_HALF_UP, Decimal

        for a in [7500, 12500, 15008, 1, 25, 799, 800, 801, 1234567]:
            for n in [1, 2, 3, 7, 8, 25, 800]:
                want = int(
                    (Decimal(a) / Decimal(n)).quantize(
                        Decimal(1), rounding=ROUND_HALF_UP
                    )
                )
                assert (2 * a + n) // (2 * n) == want, (a, n)


class TestGatePrecision:
    """The local gate compares floats exactly (driver parity)."""

    def test_one_ulp_diff_fails(self):
        from check_correctness import _norm_cell

        v = 320547.2537
        v_ulp = math.nextafter(v, math.inf)
        assert v != v_ulp
        assert _norm_cell(v) != _norm_cell(v_ulp)

    def test_tenth_significant_digit_diff_fails(self):
        from check_correctness import _norm_cell

        # the exact r15 class: 4th-decimal diff on a 6-digit magnitude —
        # identical at 9 significant digits, must now differ
        assert float(f"{320547.2538:.9g}") == float(f"{320547.2537:.9g}")
        assert _norm_cell(320547.2538) != _norm_cell(320547.2537)

    def test_nan_and_negzero_still_normalize(self):
        from check_correctness import _norm_cell

        assert _norm_cell(float("nan")) == "NaN"
        assert _norm_cell(-0.0) == 0.0
        assert str(_norm_cell(-0.0)) == "0.0"


@pytest.mark.parametrize("cents", [25, 75, 125, 175, 1025])
def test_odd_multiple_of_25_is_exact_tie_for_cohort_8(cents):
    """The mathematical claim behind the fix: cents = 25*odd over
    denominator 800 is an exactly-representable .xxxx5 double."""
    q = cents / 800.0  # dollars per customer
    scaled = q * 1e4
    assert scaled == math.floor(scaled) + 0.5
