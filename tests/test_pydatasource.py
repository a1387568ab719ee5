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
