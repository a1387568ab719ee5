"""Format round-trips (CSV/JSONL/ORC), bucketed co-located joins, and a
parquet streaming sink."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from skope_api_spark.sources import formats as fmt
from skope_api_spark.sources.cube import analytic_cube
from skope_api_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def _checksum(df):
    row = df.agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s")
    ).first()
    return (row.n, row.s)


class TestFormatRoundTrips:
    @pytest.fixture(scope="class")
    def cube(self, spark):
        # dates/doubles/ints/strings + NULLs — the awkward CSV cases
        return analytic_cube(spark, "annual_5x5x5_dataset", "float32_variable")

    def test_csv(self, spark, cube, tmp_path):
        p = str(tmp_path / "cube_csv")
        fmt.write_csv(cube, p, n_files=1)
        back = fmt.read_csv(spark, p, cube.schema)
        # nullability flags relax on read-back; names/types must hold
        assert [(f.name, f.dataType) for f in back.schema] == [
            (f.name, f.dataType) for f in cube.schema
        ]
        assert _checksum(back) == _checksum(cube)
        # NULL cells survive the round trip
        assert back.where(F.col("value").isNull()).count() == 6

    def test_jsonl(self, spark, cube, tmp_path):
        p = str(tmp_path / "cube_jsonl")
        fmt.write_jsonl(cube, p, n_files=1)
        back = fmt.read_jsonl(spark, p, cube.schema)
        assert _checksum(back) == _checksum(cube)

    def test_orc(self, spark, cube, tmp_path):
        p = str(tmp_path / "cube_orc")
        fmt.write_orc(cube, p, n_files=1)
        back = fmt.read_orc(spark, p)
        assert _checksum(back) == _checksum(cube)


class TestBucketedJoin:
    def test_bucketed_tables_join_without_shuffle(self, spark, tmp_path):
        """bucketBy co-locates join keys at write time: joining two tables
        bucketed on the same key shows NO Exchange in the plan — the
        pre-shuffle trade that pays off when a big join runs repeatedly."""
        orders = load(spark, SF_DIR, "orders")
        cust = load(spark, SF_DIR, "customer")
        orders.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy(
            "o_custkey"
        ).saveAsTable("orders_bkt")
        cust.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy(
            "c_custkey"
        ).saveAsTable("cust_bkt")
        j = spark.table("orders_bkt").join(
            spark.table("cust_bkt").hint("merge"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert j.count() == orders.join(cust, orders.o_custkey == cust.c_custkey).count()
        spark.sql("DROP TABLE orders_bkt")
        spark.sql("DROP TABLE cust_bkt")


class TestParquetStreamingSink:
    def test_stream_to_parquet_sink(self, spark, tmp_path):
        """File-to-file streaming: events landing dir → watermarked counts
        is not file-sink-able (complete mode), so sink the raw enriched
        stream append-only and verify contents."""
        import os

        landing = tmp_path / "landing"
        landing.mkdir()
        os.symlink(f"{SF_DIR}/events.parquet", landing / "events.parquet")
        from skope_api_spark.streaming.events import stream_events

        stream = stream_events(spark, str(landing), with_watermark=None)
        enriched = stream.withColumn("value_x2", F.col("value") * 2)
        out = str(tmp_path / "sink")
        q = (
            enriched.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        back = spark.read.parquet(out)
        assert back.count() == load(spark, SF_DIR, "events").count()
        assert "value_x2" in back.columns


class TestBroadcastDegradation:
    def test_q5_degrades_to_shuffle_join_without_broadcast(self, spark):
        """The PERF.md claim, proven: with auto-broadcast disabled (as if
        customer/supplier exceeded the threshold at 100 TB), q5's big
        joins fall back to shuffle joins instead of OOMing — nothing
        scale-proportional is force-broadcast. (The explicit hints on the
        fixed 5/25-row region/nation dims remain, as intended.)"""
        from skope_api_spark.contract.relational import q5_local_supplier_volume

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            df = q5_local_supplier_volume(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            rows = df.collect()
            assert len(rows) >= 1  # still correct, just a different strategy
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestArrowCosineParity:
    def test_arrow_kernel_matches_jvm_kernel(self, spark):
        """The two cosine kernels agree (same top-k, sims within 1e-9)."""
        from skope_api_spark.operators.similarity import brute_force_topk
        from skope_api_spark.tables import load

        emb = load(spark, SF_DIR, "embeddings")
        q = emb.where(F.col("vec_id") < 5)
        jvm = {(r.query_id, r.rk): (r.neighbor_id, r.cosine_sim)
               for r in brute_force_topk(emb, q, k=3).collect()}
        arw = {(r.query_id, r.rk): (r.neighbor_id, r.cosine_sim)
               for r in brute_force_topk(emb, q, k=3, use_arrow=True).collect()}
        assert set(jvm) == set(arw)
        for key in jvm:
            assert jvm[key][0] == arw[key][0]
            assert abs(jvm[key][1] - arw[key][1]) < 1e-9
