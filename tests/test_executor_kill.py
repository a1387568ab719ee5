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

        def run() -> dict[int, float]:
            rows = pagerank(
                edges, iterations=8, checkpoint_every=1
            ).collect()
            return {r["node"]: r["rank"] for r in rows}

        t0 = time.time()
        baseline = run()
        base_dur = time.time() - t0
        print(f"\n[kill-test] baseline run: {base_dur:.1f}s")

        result: dict = {}
        err: list = []

        def target() -> None:
            try:
                result.update(run())
            except Exception as ex:  # surfaced by the main thread
                err.append(ex)

        worker = threading.Thread(target=target)
        worker.start()

        # wait for the job to be genuinely mid-flight, then kill one
        # executor JVM outright
        tracker = sc.statusTracker()
        deadline = time.time() + 60
        while not tracker.getActiveJobsIds() and time.time() < deadline:
            time.sleep(0.05)
        assert tracker.getActiveJobsIds(), "job never started"
        time.sleep(max(0.5, base_dur * 0.3))
        pids = _executor_pids(sc.applicationId)
        assert pids, "no executor JVMs found to kill"
        victim = pids[0]
        still_running = bool(tracker.getActiveJobsIds())
        os.kill(victim, signal.SIGKILL)
        kill_t = time.time()
        print(
            f"[kill-test] SIGKILLed executor pid={victim} at "
            f"t+{kill_t - t0 - base_dur:.1f}s (job active: {still_running})"
        )

        worker.join(timeout=300)
        assert not worker.is_alive(), "killed run did not finish in 300s"
        assert not err, f"killed run failed: {err}"
        finish_t = time.time()
        assert finish_t > kill_t
        assert still_running, (
            "kill landed after the job finished — enlarge the graph"
        )

        # the relaunched-executor run must produce the same ranks
        assert set(result) == set(baseline)
        worst = max(abs(result[n] - baseline[n]) for n in baseline)
        print(
            f"[kill-test] completed {finish_t - kill_t:.1f}s after kill; "
            f"{len(result)} nodes, max |Δrank| = {worst:.2e}"
        )
        assert worst < 1e-9
    finally:
        spark.stop()
