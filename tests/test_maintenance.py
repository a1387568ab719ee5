"""Lake maintenance: compaction swap safety and partition reporting."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from skope_api_spark.sources.maintenance import compact, partition_report
from skope_api_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def fragmented_lake(spark, tmp_path):
    """orders written as ~24 tiny files — the streaming-ingestion smell."""
    path = str(tmp_path / "orders_frag")
    load(spark, SF_DIR, "orders").repartition(24).write.parquet(path)
    return path


def _file_count(path):
    return sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )


class TestCompaction:
    def test_compact_preserves_data_and_reduces_files(self, spark, fragmented_lake):
        before = spark.read.parquet(fragmented_lake)
        checksum_before = before.agg(
            F.count("*"), F.round(F.sum("o_totalprice"), 2)
        ).first()
        assert _file_count(fragmented_lake) >= 20

        n_files = compact(
            spark, fragmented_lake, target_files=2, sort_by=("o_orderkey",)
        )
        assert n_files == 2
        after = spark.read.parquet(fragmented_lake)
        assert (
            after.agg(F.count("*"), F.round(F.sum("o_totalprice"), 2)).first()
            == checksum_before
        )
        # no temp/old residue
        assert not os.path.exists(fragmented_lake + ".__compact_tmp")
        assert not os.path.exists(fragmented_lake + ".__compact_old")

    def test_compact_recovers_from_mid_swap_crash(self, spark, fragmented_lake):
        """Simulate a crash between the two swap renames (live dir gone,
        data only at .__compact_old) plus a stale tmp dir: the next compact
        run must restore and proceed."""
        n_rows = spark.read.parquet(fragmented_lake).count()
        os.rename(fragmented_lake, fragmented_lake + ".__compact_old")
        os.makedirs(fragmented_lake + ".__compact_tmp")  # stale partial write

        n_files = compact(spark, fragmented_lake, target_files=1)
        assert n_files == 1
        assert spark.read.parquet(fragmented_lake).count() == n_rows
        assert not os.path.exists(fragmented_lake + ".__compact_tmp")
        assert not os.path.exists(fragmented_lake + ".__compact_old")

    def test_partition_report_counts_every_row(self, spark, fragmented_lake):
        rep = partition_report(spark, fragmented_lake)
        total = rep.agg(F.sum("n_rows")).first()[0]
        assert total == spark.read.parquet(fragmented_lake).count()
        assert rep.where(F.col("n_bytes").isNull()).count() == 0
