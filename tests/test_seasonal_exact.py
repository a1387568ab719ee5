"""Regression pins for the r16 sf1 red (ts_seasonal_decompose_orders).

The r16 tie-audit conversion made only the TREND integer-exact; seasonal
and residual still rounded engine-computed doubles. Window/aggregate sums
associate in engine-specific orders, so Spark's and DuckDB's pre-round
doubles differ by ulps and can straddle a 4-dp rounding boundary — at sf1
magnitudes (~5e9, ulp of the 13-month sum ~1e-5) the straddle probability
is ~10% per residual row, and the sf1 scoped recheck caught one
(18216835.2162 vs .2163). The oracle-side tie audit is structurally blind
to this class: the divergence is in SPARK's double, not a repr-tie of the
oracle's.

The rewrite keeps everything BIGINT until one final /1e4 on both engines:
monthly cents c; trend = A/2400 (A = 2*sum13 - first - last); seasonal
means over COMPLETE calendar years only (uniform denominator n), seasonal
= E_s/(1200n) with E_s = 12*T_s - tot; residual = (24nc - nA - 2E_s)/
(2400n); each x1e4 output by sign-split integer HALF_UP.

The fixture below manufactures true .5 ties on BOTH sign paths:
tot ≡ 3 (mod 6) makes every season's 25*E_s/6 a true .5 tie (25E ≡ 3
mod 6), negative for eleven seasons and positive for December.
"""

from __future__ import annotations

import datetime
import os

import pytest

ORDERS_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


def _write_orders(tmp_path, rows) -> str:
    import pandas as pd

    df = pd.DataFrame(rows, columns=list(ORDERS_COLS))
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"]).astype("datetime64[us]")
    out = str(tmp_path)
    df.to_parquet(os.path.join(out, "orders.parquet"), index=False)
    return out


def _tie_fixture(tmp_path) -> str:
    """Two complete years (n=2). Cents: 6 every month, except 1996-12 = 9.
    tot = 147 ≡ 3 (mod 6) -> E_s = -3 for Jan-Nov (seasonal x1e4 = -12.5,
    a true NEGATIVE tie -> half-away -13) and E_12 = 33 (137.5 -> 138).
    Plus one partial-1998 January order ($1000) that must be EXCLUDED
    from the seasonal means but still emitted as an output row."""
    rows = []
    k = 1
    for yr in (1996, 1997):
        for mo in range(1, 13):
            cents = 9 if (yr, mo) == (1996, 12) else 6
            rows.append(
                (k, k, "F", cents / 100.0, datetime.datetime(yr, mo, 15), "3-MEDIUM")
            )
            k += 1
    rows.append((k, k, "F", 1000.00, datetime.datetime(1998, 1, 10), "3-MEDIUM"))
    return _write_orders(tmp_path, rows)


class TestSeasonalDecomposeExact:
    def test_sign_split_ties_and_partial_year_exclusion(self, spark, tmp_path):
        from skope_api_spark.contract import QUERIES

        sf_dir = _tie_fixture(tmp_path)
        rows = {
            r["mon"].isoformat(): r.asDict()
            for r in QUERIES["ts_seasonal_decompose_orders"](spark, sf_dir).collect()
        }
        assert len(rows) == 25

        # negative true tie -12.5 -> half AWAY from zero -> -0.0013
        assert rows["1996-01-01"]["seasonal"] == -0.0013
        # positive true tie 137.5 -> 0.0138
        assert rows["1996-12-01"]["seasonal"] == 0.0138
        # zero-centering: 11*(-3) + 33 = 0 in exact units
        # trend at the first complete window (1996-07): A = 150 -> 0.0625
        assert rows["1996-07-01"]["trend"] == 0.0625
        assert rows["1996-07-01"]["v"] == 0.06
        # residual x1e4 = 25*(48c - 2A - 2E)/12 = -12.5 -> -0.0013
        assert rows["1996-07-01"]["residual"] == -0.0013

        # the partial 1998 row is emitted but does NOT poison the means:
        # January seasonal stays the two-complete-year value
        assert rows["1998-01-01"]["v"] == 1000.0
        assert rows["1998-01-01"]["seasonal"] == -0.0013
        assert rows["1998-01-01"]["trend"] is None
        assert rows["1998-01-01"]["residual"] is None

    def test_oracle_bit_identical(self, spark, tmp_path):
        import duckdb

        from skope_api_spark.contract import ORACLES, QUERIES

        sf_dir = _tie_fixture(tmp_path)
        got = sorted(
            tuple(r) for r in
            QUERIES["ts_seasonal_decompose_orders"](spark, sf_dir).collect()
        )
        con = duckdb.connect()
        p = os.path.join(sf_dir, "orders.parquet")
        con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{p}')")
        oracle = sorted(
            (r[0], *r[1:]) for r in
            con.execute(ORACLES["ts_seasonal_decompose_orders"]).fetchall()
        )
        assert [tuple(r)[1:] for r in got] == [tuple(r)[1:] for r in oracle]
        assert [r[0].isoformat() for r in got] == [r[0].isoformat() for r in oracle]

    def test_no_complete_year_yields_null_seasonal(self, spark, tmp_path):
        from skope_api_spark.contract import QUERIES

        rows = [
            (i, i, "F", 1.00, datetime.datetime(1997, mo, 5), "3-MEDIUM")
            for i, mo in enumerate((1, 2, 3), start=1)
        ]
        sf_dir = _write_orders(tmp_path, rows)
        out = QUERIES["ts_seasonal_decompose_orders"](spark, sf_dir).collect()
        assert len(out) == 3
        for r in out:
            assert r["seasonal"] is None
            assert r["residual"] is None
            assert r["trend"] is None
            assert r["v"] == 1.0

    def test_sign_split_half_up_identity(self):
        """HALF_UP (half away from zero) == sign-split (2|p|+q) DIV (2q)
        under BOTH truncating (Spark DIV) and flooring (DuckDB //)
        division, for p of either sign — the cross-engine identity the
        contract relies on."""
        from decimal import ROUND_HALF_UP, Decimal

        for p in [-151, -150, -13, -12, -7, -6, -3, -1, 0, 1, 3, 6, 825, 137]:
            for q in [1, 2, 3, 6, 12, 25]:
                want = int(
                    (Decimal(p) / Decimal(q)).quantize(
                        Decimal(1), rounding=ROUND_HALF_UP
                    )
                )
                if p >= 0:
                    trunc = (2 * p + q) // (2 * q)  # operands positive: // == DIV
                    assert trunc == want, (p, q)
                else:
                    m = (-2 * p + q) // (2 * q)
                    assert -m == want, (p, q)
