"""Executor-loss survival under reliable checkpointing (VERDICT r9 #7).

`checkpoint.pin` equality under `SPARK_GRAFT_RELIABLE_CHECKPOINT=1` is
covered by test_checkpoint_policy; this test demonstrates the CLAIM the
mode exists for — an iterative job (PageRank, per-iteration pins)
finishes with correct results after a worker executor JVM is SIGKILLed
mid-run. With the default localCheckpoint the pinned blocks would die
with the executor; with reliable checkpointing they are on disk, so the
standalone master relaunches the executor and the job recomputes only
in-flight tasks.

Gated behind SPARK_GRAFT_LC=1 (spawns real worker JVMs, ~60 s):

    SPARK_GRAFT_LC=1 python -m pytest tests/test_executor_kill.py -q -s
"""

from __future__ import annotations

import os
import signal
import subprocess
import threading
import time

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LC") != "1",
    reason="multi-JVM local-cluster run is opt-in (SPARK_GRAFT_LC=1)",
)


def _executor_pids(app_id: str) -> list[int]:
    """PIDs of CoarseGrainedExecutorBackend JVMs serving ``app_id``."""
    out = subprocess.check_output(["ps", "-eo", "pid,args"], text=True)
    pids = []
    for line in out.splitlines():
        if "CoarseGrainedExecutorBackend" in line and app_id in line:
            pids.append(int(line.split(None, 1)[0]))
    return pids


def test_pagerank_completes_after_executor_sigkill(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "ckpt"))

    from skope_api_spark.operators.graph import pagerank
    from skope_api_spark.session import get_spark

    spark = get_spark(
        "test_executor_kill",
        master="local-cluster[2,2,2048]",
        shuffle_partitions=16,
    )
    try:
        sc = spark.sparkContext
        # deterministic pseudo-random digraph: ~300k distinct edges on
        # 50k nodes — big enough that 8 iterations give a kill window
        edges = (
            spark.range(0, 300_000)
            .selectExpr(
                "CAST(id * 2654435761 % 50000 AS BIGINT) AS src",
                "CAST((id * 40503 + 7) % 50000 AS BIGINT) AS dst",
            )
            .where("src != dst")
            .distinct()
        )
        edges = edges.persist()
        edges.count()

        def run(group: str) -> dict[int, float]:
            # job group tags every job of this run so the kill can be
            # timed by JOB PROGRESS, not wall-clock (the killed run is
            # much faster than baseline — codegen/JIT warm)
            sc.setJobGroup(group, group)
            rows = pagerank(
                edges, iterations=8, checkpoint_every=1
            ).collect()
            return {r["node"]: r["rank"] for r in rows}

        tracker = sc.statusTracker()
        t0 = time.time()
        baseline = run("baserun")
        base_dur = time.time() - t0
        base_jobs = len(tracker.getJobIdsForGroup("baserun"))
        print(f"\n[kill-test] baseline run: {base_dur:.1f}s, {base_jobs} jobs")
        assert base_jobs >= 5, "expected a multi-job cascade to kill into"

        result: dict = {}
        err: list = []
        done_at: list = []

        def target() -> None:
            try:
                result.update(run("killrun"))
                done_at.append(time.time())
            except Exception as ex:  # surfaced by the main thread
                err.append(ex)

        worker = threading.Thread(target=target)
        worker.start()

        # kill once ~40% of the baseline's job cascade has launched —
        # progress-based, so run-speed variance cannot overshoot the end
        target_jobs = max(2, int(base_jobs * 0.4))
        deadline = time.time() + 120
        while (
            len(tracker.getJobIdsForGroup("killrun")) < target_jobs
            and not done_at
            and time.time() < deadline
        ):
            time.sleep(0.02)
        assert (
            len(tracker.getJobIdsForGroup("killrun")) >= target_jobs
        ), f"run never reached job {target_jobs} (done={bool(done_at)})"
        pids = _executor_pids(sc.applicationId)
        assert pids, "no executor JVMs found to kill"
        victim = pids[0]
        # the run is a cascade of jobs (one per pinned iteration +
        # checkpoint writes) with idle gaps between them, so "any job
        # active right now" is the wrong mid-flight probe — what must
        # hold is that the RUN (the worker thread) had not finished
        # when the kill landed
        mid_flight = worker.is_alive() and not done_at
        os.kill(victim, signal.SIGKILL)
        kill_t = time.time()
        print(
            f"[kill-test] SIGKILLed executor pid={victim} at "
            f"t+{kill_t - t0 - base_dur:.1f}s (run mid-flight: {mid_flight})"
        )

        worker.join(timeout=300)
        assert not worker.is_alive(), "killed run did not finish in 300s"
        assert not err, f"killed run failed: {err}"
        assert mid_flight, (
            "kill landed after the run finished — enlarge the graph"
        )
        assert done_at and done_at[0] > kill_t

        # the relaunched-executor run must produce the same ranks
        assert set(result) == set(baseline)
        worst = max(abs(result[n] - baseline[n]) for n in baseline)
        print(
            f"[kill-test] completed {done_at[0] - kill_t:.1f}s after kill; "
            f"{len(result)} nodes, max |Δrank| = {worst:.2e}"
        )
        assert worst < 1e-9
    finally:
        spark.stop()
