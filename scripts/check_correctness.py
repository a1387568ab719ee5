#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it with
the matching ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted by
all columns, floats compared EXACTLY — only NaN and -0.0 are normalized,
matching the driver's exact value hash). Queries with no oracle get a
rows-only check (>= 0 rows, stable schema).

Usage: python scripts/check_correctness.py [query ...]
       python scripts/check_correctness.py --exclude name [name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
       SPARK_GRAFT_MASTER — e.g. 'local-cluster[4,8,4096]' to replay the
       whole registry on REAL worker JVMs (multi-JVM evidence mode:
       cross-process shuffle/broadcast, executor-side Python workers)

``--exclude`` runs the whole registry MINUS the named queries — the sf1
sweep shape, where the three documented quadratic-oracle verification
baselines (er_customer_record_clusters, dedup_ngram_jaccard_pairs,
dedup_jaccard_prefix_join) must not run their DuckDB side.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _scan_negzero(rows) -> int:
    """Count -0.0 cells, descending into list/struct/Row/dict nesting.
    Numerically equal to 0.0 but distinct under the driver's value hash —
    the registry's round_nz rule exists to keep these out of BOTH
    engines' output."""

    def walk(v) -> int:
        if isinstance(v, float):
            return 1 if v == 0 and math.copysign(1.0, v) < 0 else 0
        if isinstance(v, (list, tuple)):  # includes pyspark Row
            return sum(walk(x) for x in v)
        if isinstance(v, dict):
            return sum(walk(x) for x in v.values())
        return 0

    return sum(walk(r) for r in rows)


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # EXACT — no significant-digit tolerance. The registry is designed
        # for bit-identical doubles on both engines (integer/decimal-exact
        # boundaries everywhere a contract rounds); the r15 driver red
        # (cohort_ltv_curve_quarterly) hid behind the former 9-sig-digit
        # normalization because 4-dp values >= 1e5 put the rounded digit
        # past the 9th significant digit. Only NaN and -0.0 normalize.
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(selected: list[str]) -> int:
    import duckdb

    import __spark_entry__ as e
    from skope_api_spark.session import get_spark

    spark = get_spark("check_correctness")
    qs, oracles = e.queries(), e.oracle_sql()
    if selected and selected[0] == "--exclude":
        excluded = set(selected[1:])
        unknown = excluded - set(qs)
        if unknown:
            print(f"unknown --exclude names: {sorted(unknown)}")
            return 2
        qs = {k: v for k, v in qs.items() if k not in excluded}
    elif selected:
        qs = {k: v for k, v in qs.items() if k in selected}

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"ERR  {name}: spark: {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            continue
        # the -0.0 rule covers the WHOLE registry: scan the Spark output
        # BEFORE any rows-only early-exit (no-oracle queries and
        # oracle-timeout paths included), so a negative zero can never
        # ride a weaker check to green
        nz_s = _scan_negzero(srows)
        if nz_s:
            print(f"FAIL {name}: -0.0 cells in spark output: {nz_s} (round_nz rule)")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [no oracle]")
            n_rows_only += 1
            continue
        # watchdog: a single pathological oracle (the quadratic baselines
        # aside, some closure/recursive oracles are superlinear in SF)
        # must not stall a whole sweep — interrupt DuckDB after the
        # budget and record the query as rows-only for THIS run.
        # Each query runs on its OWN cursor (shared catalog, separate
        # interrupt target), so a timer that fires in the gap between
        # query completion and cancel() interrupts only the dying
        # cursor — it cannot poison the next query's execute.
        budget = float(os.environ.get("SPARK_GRAFT_ORACLE_TIMEOUT", "0"))
        cur = con.cursor()
        timer = None
        if budget > 0:
            import threading

            def _interrupt(c=cur):
                try:
                    c.interrupt()
                except Exception:  # noqa: BLE001 — stale/closed cursor
                    pass

            timer = threading.Timer(budget, _interrupt)
            timer.start()
        try:
            res = cur.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            if "INTERRUPT" in type(ex).__name__.upper() or "interrupted" in str(ex).lower():
                print(
                    f"ROWS {name}: {len(srows)} rows [oracle exceeded "
                    f"{budget:.0f}s budget — rows-only this run]"
                )
                n_rows_only += 1
            else:
                print(f"ERR  {name}: duckdb: {type(ex).__name__}: {str(ex)[:200]}")
                n_fail += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
            cur.close()
        ok = True
        msgs = []
        nz_d = _scan_negzero(drows)
        if nz_d:
            ok = False
            msgs.append(f"-0.0 cells: duck={nz_d} (round_nz rule)")
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rows spark={len(srows)} duck={len(drows)}")
        if ok:
            _, ns = _norm_rows(scols, srows)
            _, nd = _norm_rows(dcols, drows)
            if ns != nd:
                ok = False
                diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                msgs.append(f"values differ, first diffs: {diffs}")
        if ok:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {'; '.join(msgs)}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
