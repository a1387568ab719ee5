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


def classify_tie(x: float, dp: int) -> str:
    """'exact'  — the double IS the tie decimal (dyadic): both engines
                  round half-away/HALF_UP upward, provably stable.
       'lucky'  — binary sits above the tie decimal: both round up today,
                  but a data nudge producing a below-tie double diverges.
       'diverge'— binary sits below: Spark (repr HALF_UP) rounds up,
                  DuckDB (binary) rounds down — flips the hash NOW."""
    exact_bin = Decimal(x)
    repr_dec = Decimal(repr(x))
    if exact_bin == repr_dec:
        return "exact"
    return "lucky" if exact_bin > repr_dec else "diverge"


def _probe(x, dp):
    if x is None:
        return None
    x, dp = float(x), int(dp)
    if is_repr_tie(x, dp):
        TIES.append((_CURRENT[0], x, dp, classify_tie(x, dp)))
    return _duckdb_round(x, dp)


def rewrite_round(sql: str) -> str:
    """Rewrite every ``ROUND(expr[, dp])`` to ``TIEPROBE(expr, dp)``
    (dp=0 when absent), walking balanced parens so one-arg calls get an
    explicit 0 — DuckDB python UDFs don't overload arity."""
    # spans of single-quoted string literals — ROUND inside them is data
    str_spans = [m.span() for m in re.finditer(r"'[^']*'", sql)]

    def _in_literal(pos: int) -> bool:
        return any(a <= pos < b for a, b in str_spans)

    out = []
    i = 0
    pat = re.compile(r"\bround\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        while m and _in_literal(m.start()):
            m = pat.search(sql, m.end())
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
            print(f"{'no-round':>14}  {name}")
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
        n_div = sum(1 for t in new if t[3] == "diverge")
        n_lucky = sum(1 for t in new if t[3] == "lucky")
        if n_div:
            status = f"DIVERGE x{n_div}"
        elif n_lucky:
            status = f"LUCKY x{n_lucky}"
        elif new:
            status = f"exact-tie x{len(new)}"
        else:
            status = "clean"
        print(f"{status:>14}  {name} ({time.time() - t0:.1f}s)")

    print()
    by = {"exact": [], "lucky": [], "diverge": []}
    for t in TIES:
        by[t[3]].append(t)
    if by["exact"]:
        print(
            f"{len(by['exact'])} EXACT (dyadic) tie cells — both engines"
            " round up, provably stable; no action needed:"
        )
        for q, v, dp, _ in by["exact"][:40]:
            print(f"  {q}: ROUND({v!r}, {dp})")
    if by["lucky"]:
        print(
            f"{len(by['lucky'])} LUCKY tie cells — binary above the tie,"
            " engines agree TODAY but the class is one data-nudge from"
            " diverging; convert to integer/decimal-exact rounding:"
        )
        for q, v, dp, _ in by["lucky"]:
            print(f"  {q}: ROUND({v!r}, {dp})")
    if by["diverge"]:
        print(f"{len(by['diverge'])} DIVERGING tie cells — flip the hash NOW:")
        for q, v, dp, _ in by["diverge"]:
            print(f"  {q}: ROUND({v!r}, {dp})")
    if not (by["lucky"] or by["diverge"]):
        print("0 diverging/lucky ties across all audited oracles at", SF_DIR)
    return 1 if (by["diverge"] or by["lucky"] or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
