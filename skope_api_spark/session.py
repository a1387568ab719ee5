"""SparkSession factory.

Local test runs use ``local[$SPARK_GRAFT_CPUS]`` (default 32) in a single
JVM; the configuration below is nevertheless written for the real design
point — a multi-executor cluster scanning ~100 TB:

- AQE on (runtime coalescing, skew-join splitting) so static
  ``shuffle.partitions`` only needs to be an upper bound.
- Arrow on for every pandas-UDF boundary (the slow-path operators:
  similarity search, multimodal decode).
- ``spark.sql.files.maxPartitionBytes`` left at 128 MB: at 100 TB that is
  ~800k input splits, which schedules fine on 1000 executors and keeps
  per-task memory bounded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def default_driver_memory() -> str:
    """Local-mode JVM heap (driver == all executors in local[N]).

    Spark's 1g default is an artifact of cluster mode, where the driver
    only coordinates; in local mode the single JVM also holds every
    executor thread's shuffle/broadcast/state memory, so at sf1 (~6M-row
    lineitem) 1g OOMs on the first ~100 MB broadcast build. 8g is the
    local equivalent of a normally-sized executor; override with
    SPARK_GRAFT_DRIVER_MEM."""
    return os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")


# Documented (not auto-applied) configuration profile for a REAL
# multi-executor cluster at the ~100 TB design point. local[N] shares one
# JVM, so broadcast sizing, shuffle transport, and executor heap have
# never been exercised with real executors in this sandbox — these are
# the settings to start from when they are, with the reasoning recorded
# so the first cluster deployment isn't guessing:
CLUSTER_PROFILE: dict[str, str] = {
    # 4-8 cores per executor: wide enough to amortize broadcast/JIT per
    # JVM, narrow enough that one straggling task doesn't idle 15 cores
    "spark.executor.cores": "5",
    # ~6g/core heap + off-heap headroom for Arrow batches (pandas-UDF
    # boundaries) and shuffle spill buffers
    "spark.executor.memory": "24g",
    "spark.executor.memoryOverhead": "6g",
    # shuffle upper bound sized so a 100 TB scan's largest shuffle stage
    # lands ~128-256 MB per partition pre-AQE; AQE coalesces the rest
    "spark.sql.shuffle.partitions": "8192",
    # the 10 MB default refuses most of this repo's dimension broadcasts
    # (nation/region/catalog/alloc tables are KBs, but sf-scaled dims like
    # part at sf1000 are ~100 MB); the explicit F.broadcast() hints in the
    # operators stay authoritative — this only widens the auto threshold
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # executor loss is routine at 1000 executors; decommission gracefully
    # (planned departures migrate blocks; for CRASH tolerance of long
    # iterative jobs also set SPARK_GRAFT_RELIABLE_CHECKPOINT=1 — see
    # skope_api_spark/checkpoint.py)
    "spark.decommission.enabled": "true",
    "spark.storage.decommission.shuffleBlocks.enabled": "true",
    # at 1000 executors one slow disk/VM per stage is the norm, and a
    # 100 TB scan stage has hours of straggler-tail exposure; once 75%
    # of a stage is done, re-launch tasks running 3x beyond the median
    # (safe here: every operator is a pure deterministic transform, and
    # writes go through Spark's output-commit coordinator)
    "spark.speculation": "true",
    "spark.speculation.quantile": "0.75",
    "spark.speculation.multiplier": "3",
    # AQE skew handling is on in get_spark(); at cluster scale also bound
    # the in-flight shuffle fetch so reducers over skewed maps don't OOM
    "spark.reducer.maxSizeInFlight": "96m",
    "spark.shuffle.file.buffer": "1m",
}
# Usage: get_spark(master="yarn"/"k8s://...", extra_conf=CLUSTER_PROFILE)
# (plus site-specific dynamicAllocation / shuffle-service settings).


def get_spark(
    app_name: str = "skope_api_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    fair_scheduling: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """``fair_scheduling=True`` enables FAIR scheduler pools so concurrent
    API requests on one session share executors instead of FIFO-queuing
    (serving deployments; see api/service.py)."""
    cpus = default_parallelism()
    # SPARK_GRAFT_MASTER lets any entry point (checker, bench, tests) run
    # against a different master without code changes — the sandbox's
    # multi-JVM evidence mode is `local-cluster[workers,cores,memMB]`,
    # which spawns REAL worker JVMs (cross-process shuffle/broadcast,
    # full serialization) with no cluster manager.
    resolved_master = (
        master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    )
    # Executors in separate JVMs launch their own Python workers, which
    # must import this package by reference (cloudpickle pickles
    # module-level pandas-UDF closures by name). A no-op in local[N]
    # (workers inherit the driver process's sys.path).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(resolved_master)
        .config("spark.executorEnv.PYTHONPATH", repo_root)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # applies only at JVM launch; a no-op if a session already exists
        .config("spark.driver.memory", default_driver_memory())
        .config("spark.scheduler.mode", "FAIR" if fair_scheduling else "FIFO")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores timestamp[ns]; Spark 4 refuses INT64(TIMESTAMP_NANOS)
        # unless read as raw longs — tables.load() converts to a µs timestamp.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    # real-executor masters (local-cluster / standalone) size executor
    # heaps from spark.executor.memory (default 1g), NOT from the
    # driver-mem knob above; sf1-scale multi-JVM runs need more
    exec_mem = os.environ.get("SPARK_GRAFT_EXECUTOR_MEM")
    if exec_mem:
        builder = builder.config("spark.executor.memory", exec_mem)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
