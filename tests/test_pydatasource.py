"""Custom Python DataSource (sources/pydatasource.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skope_api_spark.sources.pydatasource import register


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _read(spark, **opts):
    r = spark.read.format("skope_synth_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_row_count_and_schema(spark):
    df = _read(spark, n_rows=500, seed=1)
    assert df.count() == 500
    assert df.columns == ["event_id", "user_id", "event_type", "value"]
    assert dict(df.dtypes)["value"] == "double"


def test_partition_count_respected(spark):
    df = _read(spark, n_rows=100, partitions=8)
    assert df.rdd.getNumPartitions() == 8


def test_data_independent_of_partitioning(spark):
    a = sorted(map(tuple, _read(spark, n_rows=200, partitions=1).collect()))
    b = sorted(map(tuple, _read(spark, n_rows=200, partitions=7).collect()))
    assert a == b


def test_deterministic_per_seed(spark):
    a = sorted(map(tuple, _read(spark, n_rows=100, seed=3).collect()))
    b = sorted(map(tuple, _read(spark, n_rows=100, seed=3).collect()))
    c = sorted(map(tuple, _read(spark, n_rows=100, seed=4).collect()))
    assert a == b
    assert a != c


def test_filters_and_aggregates_compose(spark):
    df = _read(spark, n_rows=1000)
    out = df.where(F.col("event_type") == "click").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 2).alias("v")
    ).first()
    assert 0 < out["n"] < 1000


def test_empty_source(spark):
    assert _read(spark, n_rows=0).count() == 0


class TestStreamReader:
    def test_stream_matches_batch_read(self, spark, tmp_path):
        from skope_api_spark.sources.pydatasource import register

        register(spark)
        n = 250
        stream = (
            spark.readStream.format("skope_synth_events")
            .option("n_rows", n)
            .option("batch_rows", 64)
            .option("seed", 11)
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("synth_stream_sink")
            .option(
                "checkpointLocation", str(tmp_path / "ckpt")
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql(
            "SELECT * FROM synth_stream_sink ORDER BY event_id"
        ).collect()
        want = (
            spark.read.format("skope_synth_events")
            .option("n_rows", n)
            .option("seed", 11)
            .load()
            .orderBy("event_id")
            .collect()
        )
        assert len(got) == n
        assert got == want  # stream == batch, row for row

    def test_replay_is_deterministic(self):
        from skope_api_spark.sources.pydatasource import (
            SynthEventsStreamReader,
        )

        r = SynthEventsStreamReader({"seed": "3", "batch_rows": "10"})
        it1, off1 = r.read(r.initialOffset())
        rows1 = list(it1)
        assert off1 == {"index": 10} and len(rows1) == 10
        # a retry of the SAME committed range regenerates identical rows
        assert list(r.readBetweenOffsets({"index": 0}, {"index": 10})) == rows1
        it2, off2 = r.read(off1)
        rows2 = list(it2)
        assert off2 == {"index": 20}
        assert rows1[0] != rows2[0]  # batches advance

    def test_bounded_stream_quiesces(self):
        from skope_api_spark.sources.pydatasource import (
            SynthEventsStreamReader,
        )

        r = SynthEventsStreamReader(
            {"seed": "3", "batch_rows": "10", "n_rows": "15"}
        )
        it1, off1 = r.read({"index": 0})
        it2, off2 = r.read(off1)
        it3, off3 = r.read(off2)
        assert len(list(it1)) == 10 and len(list(it2)) == 5
        assert list(it3) == [] and off3 == {"index": 15}  # idle, offset stable
