#!/usr/bin/env python
"""Mechanical cross-engine rounding-tie audit over the oracle registry.

The r15 driver red (cohort_ltv_curve_quarterly) came from the one rounding
class where Spark and DuckDB legitimately disagree on the SAME double:

  Spark ``ROUND(x, dp)`` HALF_UPs the SHORTEST DECIMAL REPR of the double
  (BigDecimal.valueOf -> Double.toString), while DuckDB rounds the BINARY
  value. They diverge exactly when the shortest repr terminates at dp+1
  fractional digits with final digit 5 (a "repr-tie") AND the binary double
  sits below that decimal: Spark sees the literal ...5 and rounds up,
  DuckDB rounds the (lower) binary value down. Verified reproduction:
  256437803/800 -> repr 320547.25375 -> Spark 320547.2538, DuckDB
  320547.2537.

This script detects every repr-tie fed to ROUND anywhere in every oracle:
it rewrites each oracle's ``ROUND(expr, dp)`` / ``ROUND(expr)`` calls into
a Python UDF that records (query, value, dp) whenever the value's shortest
repr is a dp+1-digit decimal ending in 5, then returns DuckDB's own binary
rounding so the rest of the query proceeds. Because Spark computes the
SAME IEEE doubles for these contract expressions, probing the oracle side
covers both engines' inputs.

A tie hit means the query's output hash depends on the engines' tie-break
and must be converted to integer/decimal-exact rounding (the cohort-LTV
``(2a+n) DIV (2n)`` pattern). A clean sweep at the driver fixture (sf0.01)
is the "no representable tie exists at the fixture" proof VERDICT r15
item 3 asked for.

Usage: python scripts/tie_audit.py [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)

The three documented quadratic-oracle queries are excluded by default
(their DuckDB sides are fixture-scale verification baselines, minutes-to
-hours at any SF): er_customer_record_clusters, dedup_ngram_jaccard_pairs,
dedup_jaccard_prefix_join. Their rounded columns are jaccard/containment
ratios with small odd denominators (shingle-set unions), a non-terminating
class — see the PERF.md r16 note.
"""

from __future__ import annotations

import math
import os
import re
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

HEAVY_ORACLES = {
    "er_customer_record_clusters",
    "dedup_ngram_jaccard_pairs",
    "dedup_jaccard_prefix_join",
}

TIES: list[tuple[str, float, int, bool]] = []  # (query, value, dp, diverges)
_CURRENT = [""]


def is_repr_tie(x: float, dp: int) -> bool:
    """True iff the double's shortest repr is a decimal with exactly dp+1
    fractional digits, the last of which is 5 — the Spark-HALF_UP-vs-
    binary divergence precondition."""
    if not isinstance(x, float) or not math.isfinite(x) or x == 0:
        return False
    d = Decimal(repr(x)).normalize()
    exp = -d.as_tuple().exponent
    if exp != dp + 1:
        return False
    return d.as_tuple().digits[-1] == 5


def _duckdb_round(x: float, dp: int) -> float:
    """DuckDB's behavior: round the binary value, half away from zero."""
    scale = 10.0 ** dp
    y = x * scale
    f = math.floor(y)
    if y - f >= 0.5:
        f += 1
    return f / scale


def _spark_round(x: float, dp: int) -> float:
    """Spark's behavior: HALF_UP on the shortest decimal repr
    (BigDecimal.valueOf(double).setScale(dp, HALF_UP))."""
    from decimal import ROUND_HALF_UP

    return float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-dp), rounding=ROUND_HALF_UP)
    )


def _probe(x, dp):
    if x is None:
        return None
    x, dp = float(x), int(dp)
    if is_repr_tie(x, dp):
        diverges = _spark_round(x, dp) != _duckdb_round(x, dp)
        TIES.append((_CURRENT[0], x, dp, diverges))
    return _duckdb_round(x, dp)


def rewrite_round(sql: str) -> str:
    """Rewrite every ``ROUND(expr[, dp])`` to ``TIEPROBE(expr, dp)``
    (dp=0 when absent), walking balanced parens so one-arg calls get an
    explicit 0 — DuckDB python UDFs don't overload arity."""
    out = []
    i = 0
    pat = re.compile(r"\bround\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i : m.start()])
        # find matching close paren and top-level commas
        depth = 1
        j = m.end()
        top_commas = 0
        in_str = False
        while j < len(sql) and depth:
            c = sql[j]
            if in_str:
                if c == "'":
                    in_str = False
            elif c == "'":
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_commas += 1
            j += 1
        inner = sql[m.end() : j - 1]
        if top_commas == 0:
            out.append(f"TIEPROBE({rewrite_round(inner)}, 0)")
        else:
            out.append(f"TIEPROBE({rewrite_round(inner)})")
        i = j
    return "".join(out)


def main(selected: list[str]) -> int:
    import duckdb

    from skope_api_spark.contract import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    con.create_function(
        "TIEPROBE", lambda x, dp: _probe(x, dp), ["DOUBLE", "BIGINT"], "DOUBLE"
    )

    names = sorted(ORACLES)
    if selected:
        unknown = [n for n in selected if n not in ORACLES]
        if unknown:
            print(f"unknown queries: {unknown}")
            return 2
        names = sorted(selected)
    else:
        names = [n for n in names if n not in HEAVY_ORACLES]

    n_err = 0
    for name in names:
        sql = ORACLES[name]
        probed = rewrite_round(sql)
        if probed == sql:
            continue  # no ROUND anywhere — nothing to audit
        _CURRENT[0] = name
        before = len(TIES)
        t0 = time.time()
        try:
            con.execute(probed).fetchall()
        except Exception as ex:  # noqa: BLE001
            # one-arg ROUND or non-double input the UDF can't take: report,
            # don't hide
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:160]}")
            n_err += 1
            continue
        new = TIES[before:]
        n_div = sum(1 for t in new if t[3])
        if n_div:
            status = f"DIVERGE x{n_div}"
        elif new:
            status = f"tie-agree x{len(new)}"
        else:
            status = "clean"
        print(f"{status:>14}  {name} ({time.time() - t0:.1f}s)")

    print()
    diverging = [t for t in TIES if t[3]]
    agreeing = [t for t in TIES if not t[3]]
    if agreeing:
        print(
            f"{len(agreeing)} repr-tie cells where both engines AGREE (dyadic"
            " exact ties / binary-at-or-above: both round up) — latent only:"
        )
        for q, v, dp, _ in agreeing[:40]:
            print(f"  {q}: ROUND({v!r}, {dp})")
    if diverging:
        print(f"{len(diverging)} DIVERGING tie cells — these flip the hash:")
        for q, v, dp, _ in diverging:
            print(f"  {q}: ROUND({v!r}, {dp})")
    else:
        print("0 diverging ties across all audited oracles at", SF_DIR)
    return 1 if (diverging or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
