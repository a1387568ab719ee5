#!/usr/bin/env python
"""Capture .explain("formatted") for bench queries into plans/r17/.

Usage: python scripts/capture_plans.py <suffix> [name ...]
  suffix: "before" or "after" (file becomes plans/r17/<name>_<suffix>.txt)
  names : default = HEADLINE + HEADLINE_EXT from bench.py

Plan capture is driver-side only (no job runs); with AQE on the output is
the initial plan (isFinalPlan=false), which is the comparable artifact —
Exchange count, join strategy, PushedFilters, ReadSchema, Python eval
nodes are all visible pre-execution.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, HEADLINE_EXT  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    import __spark_entry__ as e
    from skope_api_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    qs = e.queries()
    if not names:
        names = [n for n in HEADLINE + HEADLINE_EXT if n in qs]

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r17",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInArrow") + plan.count(
            "MapInPandas"
        )
        print(f"{name}: exchanges={n_exch} python_nodes={n_py} -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
