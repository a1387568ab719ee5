#!/usr/bin/env python
"""Per-stage profiler for a registry query (guide §1: measure first).

Usage: python scripts/profile_query.py <query> [<query> ...]

Runs each query once cold + once warm with the noop sink on
$SPARK_GRAFT_SF_DIR (default sf0.1), with the Spark UI enabled, then dumps
per-stage wall/task-time/shuffle metrics from the status REST API for the
warm run — the empirical loop's "which stage is slow" answer without a
browser. Output: one table per query, stages sorted by executor run time.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> ...")
        return 2

    import __spark_entry__ as e
    from skope_api_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile_query",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    qs = e.queries()
    sc = spark.sparkContext
    app_id = sc.applicationId
    base = f"http://127.0.0.1:{sc.uiWebUrl.rsplit(':', 1)[1]}/api/v1/applications/{app_id}"

    def rest(path: str):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in registry")
            continue
        # cold run (codegen warmup)
        sc.setJobDescription(f"profile-cold:{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0

        jobs_before = {j["jobId"] for j in rest("/jobs")}
        sc.setJobDescription(f"profile-warm:{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.perf_counter() - t0
        sc.setJobDescription(None)

        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: warm {warm:.3f}s (cold {cold:.3f}s), "
              f"{len(jobs)} jobs, {len(stage_ids)} stages ===")
        rows = []
        for st in rest("/stages?status=complete"):
            if st["stageId"] not in stage_ids:
                continue
            rows.append((
                st.get("executorRunTime", 0),
                st["stageId"],
                st.get("numCompleteTasks", st.get("numTasks", 0)),
                st.get("executorRunTime", 0) / 1000.0,
                st.get("executorCpuTime", 0) / 1e9,
                st.get("shuffleReadBytes", 0) / 1e6,
                st.get("shuffleWriteBytes", 0) / 1e6,
                st.get("inputBytes", 0) / 1e6,
                (st.get("name") or "")[:70],
            ))
        rows.sort(reverse=True)
        print(f"{'stage':>5} {'tasks':>5} {'run_s':>8} {'cpu_s':>8} "
              f"{'shR_MB':>8} {'shW_MB':>8} {'in_MB':>8}  name")
        for _, sid, nt, run, cpu, shr, shw, inp, nm in rows[:14]:
            print(f"{sid:>5} {nt:>5} {run:>8.2f} {cpu:>8.2f} "
                  f"{shr:>8.1f} {shw:>8.1f} {inp:>8.1f}  {nm}")
        tot_run = sum(r[3] for r in rows)
        print(f"total executor run {tot_run:.1f}s across {len(rows)} stages; "
              f"wall {warm:.3f}s; parallelism {tot_run / max(warm, 1e-9):.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
