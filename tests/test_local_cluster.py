"""Multi-JVM execution evidence: `local-cluster[w,c,memMB]` mode.

`local[N]` runs every executor thread inside the driver JVM, so
cross-process shuffle transport, broadcast serialization, and Python
worker launch on REAL executors are never exercised by the normal
suite. Spark's `local-cluster` master (used by Spark's own tests)
spawns actual worker JVMs with no cluster manager — the closest this
sandbox can get to the 1000-executor design point.

Gated behind SPARK_GRAFT_LC=1 because each session costs ~30 s of JVM
spin-up and the full-registry evidence run lives in
`scripts/check_correctness.py` (SPARK_GRAFT_MASTER env — see PERF.md
"multi-JVM evidence" section for the recorded 257-query artifact):

    SPARK_GRAFT_LC=1 python -m pytest tests/test_local_cluster.py -q
    SPARK_GRAFT_MASTER='local-cluster[4,8,4096]' \
        python scripts/check_correctness.py
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LC") != "1",
    reason="multi-JVM local-cluster run is opt-in (SPARK_GRAFT_LC=1)",
)


@pytest.fixture(scope="module")
def lc_spark():
    from skope_api_spark.session import get_spark

    spark = get_spark(
        "test_local_cluster",
        master="local-cluster[2,4,2048]",
        shuffle_partitions=8,
    )
    yield spark
    spark.stop()


def test_multi_jvm_executors_registered(lc_spark):
    import time

    # worker JVMs register asynchronously after session start; force a
    # job (which blocks until at least one executor exists) then poll
    # the status tracker for both workers
    lc_spark.range(100, numPartitions=8).count()

    def n_block_managers() -> int:
        # driver + one per worker JVM (pyspark's StatusTracker doesn't
        # surface executor infos; the JVM SparkContext does)
        jsc = lc_spark.sparkContext._jsc.sc()
        return jsc.getExecutorMemoryStatus().size()

    for _ in range(60):
        if n_block_managers() >= 3:  # driver + 2 workers
            break
        time.sleep(0.5)
    assert n_block_managers() >= 3
    # two worker JVMs x four cores each — NOT the driver's own threads
    assert lc_spark.sparkContext.defaultParallelism == 8


def test_shuffle_and_broadcast_cross_jvm(lc_spark):
    import __spark_entry__ as e

    # flagship query: scan -> broadcast join -> shuffle agg, collected
    # across executor JVM boundaries
    assert len(e.entry(lc_spark).collect()) >= 1


def test_streaming_windowed_counts_cross_jvm(lc_spark, tmp_path):
    # Structured Streaming with watermarked window state held on REAL
    # executors: stream a small event directory availableNow and check
    # the windowed counts equal the batch computation of the same input
    import shutil

    from skope_api_spark.streaming.events import (
        run_available_now,
        stream_events,
        windowed_event_counts,
    )

    src = str(tmp_path / "events_src")
    shutil.copytree("/root/testdata/sf0.001", src, ignore=shutil.ignore_patterns("*"))
    shutil.copy("/root/testdata/sf0.001/events.parquet", src + "/events.parquet")
    stream = windowed_event_counts(stream_events(lc_spark, src))
    # complete mode: parity wants ALL windows incl. the watermark tail
    # (same reasoning as tests/test_streaming.py's batch-parity tests)
    run_available_now(
        stream,
        query_name="lc_win",
        checkpoint=str(tmp_path / "ckpt"),
        output_mode="complete",
    )
    key = lambda r: (  # noqa: E731
        r["window_start"],
        r["event_type"],
        r["n_events"],
        r["sum_value"],
    )
    got = {key(r) for r in lc_spark.sql("SELECT * FROM lc_win").collect()}
    from skope_api_spark.tables import load

    want = {
        key(r)
        for r in windowed_event_counts(load(lc_spark, src, "events")).collect()
    }
    assert got == want and len(want) > 0


def test_pandas_udf_worker_on_real_executor(lc_spark):
    # mapInPandas path: executor JVMs launch their own Python workers,
    # which must import skope_api_spark by reference (the
    # spark.executorEnv.PYTHONPATH wiring in session.get_spark)
    import __spark_entry__ as e

    qs = e.queries()
    rows = qs["mm_binary_stats"](lc_spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0


def test_gap_fill_guard_fails_fast_keyed_on_real_executors(lc_spark):
    """VERDICT r10 item 7: the date-spine bomb guard must fail FAST with
    the offending key and span in the driver-visible message when the
    raise_error fires inside a REAL executor JVM (not a driver thread),
    and sibling keys must complete via the explicit opt-in path."""
    from pyspark.sql import functions as F

    from skope_api_spark.operators.windows import gap_fill_interpolate

    rows = [
        # two healthy keys: short spans, one interior gap each
        (1, "2020-01-01 00:00:00", 1.0),
        (1, "2020-01-03 00:00:00", 3.0),
        (2, "2020-02-01 00:00:00", 2.0),
        (2, "2020-02-04 00:00:00", 8.0),
        # key 99 carries an epoch-0 sentinel -> ~106k-day span
        (99, "1970-01-01 00:00:00", 0.0),
        (99, "2260-01-05 00:00:00", 5.0),
    ]
    df = lc_spark.createDataFrame(
        rows, "user_id int, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    with pytest.raises(Exception) as exc:
        gap_fill_interpolate(df).count()
    msg = str(exc.value)
    # keyed, actionable message surfaced across the JVM boundary
    assert "key 99" in msg and "105924 days" in msg
    assert "max_span_days" in msg

    # opt-in path: pre-filtering the sentinel lets the siblings finish
    healthy = gap_fill_interpolate(
        df.filter(F.year("ts") >= 2000)
    ).collect()
    by_key = {}
    for r in healthy:
        by_key.setdefault(r["key"], []).append(r)
    assert sorted(by_key) == [1, 2, 99]
    assert len(by_key[1]) == 3 and len(by_key[2]) == 4
    interp = [r for r in by_key[1] if r["interpolated"]]
    assert len(interp) == 1 and interp[0]["value"] == 2.0
