"""applyInPandasWithState operator: streaming result ≡ batch equivalent."""

from __future__ import annotations

import tempfile

import pytest

from skope_api_spark.streaming import stateful as sf
from skope_api_spark.streaming.events import stream_events
from skope_api_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_landing_state")
    (d / "events.parquet").symlink_to(f"{SF_DIR}/events.parquet")
    return str(d)


class TestStatefulAnomalies:
    def test_stream_equals_batch_equivalent(self, spark, events_dir):
        batch_events = load(spark, SF_DIR, "events")
        expected = {
            r.event_id: (r.n_prior, r.is_anomaly)
            for r in sf.running_anomalies_batch(batch_events).collect()
        }

        stream = stream_events(spark, events_dir, with_watermark=None)
        out = sf.running_anomalies_stream(stream)
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                out.writeStream.format("memory")
                .queryName("anom_test")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got = {
                r.event_id: (r.n_prior, r.is_anomaly)
                for r in spark.sql("SELECT * FROM anom_test").collect()
            }
        assert len(got) == len(expected) > 0
        assert got == expected

    def test_welford_flags_known_outlier(self, spark):
        rows = [(1, i, f"2024-01-01 00:{i:02d}:00", v) for i, v in enumerate(
            [10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.1, 50.0, 10.0]
        )]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts_s string, value double"
        ).selectExpr("user_id", "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
        out = {r.event_id: r.is_anomaly for r in sf.running_anomalies_batch(df).collect()}
        assert out[7] is True          # the 50.0 spike
        assert sum(out.values()) == 1  # and nothing else


class TestTransformWithState:
    def test_running_totals_stream_equals_batch(self, spark, tmp_path_factory):
        """transformWithStateInPandas (Spark 4 typed-state API): draining
        the whole events fixture must reproduce the batch groupBy totals —
        state accumulates correctly across keys and batches. Requires
        google.protobuf (the API's state-server protocol) — skipped where
        absent, with the ImportError gate itself asserted below."""
        import tempfile

        import pytest as _pytest

        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            from skope_api_spark.streaming.stateful import (
                running_totals_stream as _rts,
            )
            from skope_api_spark.streaming import events as _se
            from skope_api_spark.tables import load as _load

            with _pytest.raises(ImportError, match="protobuf"):
                _rts(_load(spark, SF_DIR, "events"))
            _pytest.skip("google.protobuf not installed in this environment")

        from skope_api_spark.streaming import events as se
        from skope_api_spark.streaming.stateful import (
            running_totals_batch,
            running_totals_stream,
        )
        from skope_api_spark.tables import load

        d = tmp_path_factory.mktemp("events_twst")
        (d / "events.parquet").symlink_to(f"{SF_DIR}/events.parquet")
        batch_events = load(spark, SF_DIR, "events")
        expected = {
            r.user_id: (r.n_events, round(r.total_value, 4))
            for r in running_totals_batch(batch_events).collect()
        }

        stream = se.stream_events(spark, str(d), with_watermark=None)
        out = running_totals_stream(stream)
        assert out.isStreaming
        with tempfile.TemporaryDirectory() as ckpt:
            se.run_available_now(
                out,
                query_name="twst_totals",
                checkpoint=ckpt,
                output_mode="update",
            )
            got = {
                r.user_id: (r.n_events, round(r.total_value, 4))
                for r in spark.sql("SELECT * FROM twst_totals").collect()
            }
        assert got == expected and len(got) > 0


class TestStreamingFunnel:
    def test_stream_equals_batch_equivalent(self, spark, events_dir):
        batch_events = load(spark, SF_DIR, "events")
        expected = {
            (r.user_id, r.stage): r.ts_reached
            for r in sf.funnel_batch_stages(batch_events).collect()
        }

        stream = stream_events(spark, events_dir, with_watermark=None)
        out = sf.funnel_stream(stream)
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                out.writeStream.format("memory")
                .queryName("funnel_test")
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            got = {
                (r.user_id, r.stage): r.ts_reached
                for r in spark.sql("SELECT * FROM funnel_test").collect()
            }
        assert len(got) == len(expected) > 0
        assert got == expected

    def test_strict_after_semantics_batch_twin(self, spark):
        # strict-after semantics: view at the same ts as the matched click
        # must NOT advance; a view before any click is not stage 1
        rows = [
            (1, 1, "2024-01-01 10:00:00", "click"),
            (1, 2, "2024-01-01 10:00:00", "view"),
            (1, 3, "2024-01-01 11:00:00", "view"),
            (2, 4, "2024-01-01 10:00:00", "view"),   # view before any click
            (2, 5, "2024-01-01 11:00:00", "click"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts_s string, event_type string"
        ).selectExpr(
            "user_id", "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type"
        )
        got = {
            (r.user_id, r.stage) for r in sf.funnel_batch_stages(df).collect()
        }
        assert got == {(1, 1), (1, 2), (2, 1)}

    def test_state_carries_across_micro_batches(self, spark, tmp_path):
        # two availableNow runs over a growing landing dir with a SHARED
        # checkpoint: the second run restores (stage, last_ts) from the
        # state store, so the equal-ts view is still rejected and the
        # later view advances — a FUNNEL_STATE_SCHEMA round-trip proof
        landing = tmp_path / "landing"
        landing.mkdir()
        ckpt = str(tmp_path / "ckpt")

        def write_batch(name, rows):
            # one parquet FILE per micro-batch (the file stream source
            # tracks files; a nested write.parquet dir would not be read
            # by the schema probe)
            import pandas as pd
            import pyarrow as pa
            import pyarrow.parquet as pq

            df = pd.DataFrame(
                rows, columns=["user_id", "event_id", "ts_s", "event_type"]
            )
            df["ts"] = pd.to_datetime(df.pop("ts_s"))
            pq.write_table(
                pa.Table.from_pandas(df, preserve_index=False),
                str(landing / name),
            )

        out_dir = str(tmp_path / "out")

        def run(qname):
            # parquet sink: the memory sink refuses checkpoint RECOVERY,
            # which is exactly what this test exercises
            stream = stream_events(spark, str(landing), with_watermark=None)
            q = (
                sf.funnel_stream(stream)
                .writeStream.format("parquet")
                .queryName(qname)
                .outputMode("append")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return {
                (r.user_id, r.stage)
                for r in spark.read.parquet(out_dir).collect()
            }

        write_batch("b1.parquet", [(7, 1, "2024-01-01 10:00:00", "click")])
        assert run("funnel_mb1") == {(7, 1)}
        write_batch(
            "b2.parquet",
            [
                (7, 2, "2024-01-01 10:00:00", "view"),  # equal ts: rejected
                (7, 3, "2024-01-01 10:30:00", "view"),  # advances to 2
            ],
        )
        # the parquet sink accumulates: batch-1's stage-1 row plus ONLY
        # the new stage-2 advance (the equal-ts view was rejected against
        # the RESTORED last_ts; no duplicate stage-1 emission)
        assert run("funnel_mb2") == {(7, 1), (7, 2)}


class TestStreamingHolt:
    def _obs_file(self, path, rows):
        import pandas as pd

        pd.DataFrame(
            rows, columns=["user_id", "order_key", "value"]
        ).to_parquet(path)

    def test_final_state_matches_jvm_fold_across_batches(
        self, spark, tmp_path
    ):
        """Two availableNow runs over a growing landing dir with a shared
        checkpoint: the Python recurrence (streaming, state across
        batches) must land on the SAME final (level, trend) as the JVM
        F.aggregate fold in operators/forecast.py — bit-for-bit, two
        independent implementations of the recurrence."""
        from skope_api_spark.operators.forecast import holt_forecast
        from skope_api_spark.streaming import stateful as sf

        land = tmp_path / "land"
        land.mkdir()
        ckpt = str(tmp_path / "ckpt")
        rows1 = [(1, k, float(10 + 2 * k + (k % 3))) for k in range(5)]
        rows2 = [(1, k, float(10 + 2 * k + (k % 3))) for k in range(5, 9)]
        self._obs_file(land / "a.parquet", rows1)

        out_dir = str(tmp_path / "out")

        def run():
            # parquet sink: the memory sink refuses checkpoint RECOVERY,
            # which this cross-batch test exercises
            stream = (
                spark.readStream.schema(
                    "user_id long, order_key long, value double"
                ).parquet(str(land))
            )
            q = (
                sf.holt_stream(stream)
                .writeStream.format("parquet")
                .outputMode("append")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run()
        self._obs_file(land / "b.parquet", rows2)
        run()
        got = sorted(
            spark.read.parquet(out_dir).collect(),
            key=lambda r: r.order_key,
        )
        assert [r.order_key for r in got] == list(range(9))
        final = got[-1]
        assert final.n_points == 9

        batch = spark.createDataFrame(
            rows1 + rows2, "user_id long, order_key long, value double"
        )
        ref = holt_forecast(
            batch,
            key_cols=("user_id",),
            order_col="order_key",
            value_col="value",
            alpha=sf.HOLT_ALPHA,
            beta=sf.HOLT_BETA,
            horizon=1,
        ).first()
        # bit-for-bit: same IEEE recurrence, Python vs JVM codegen
        assert final.level == ref["level"]
        assert final.trend == ref["trend"]
        assert final.forecast_1 == ref["forecast_1"]

    def test_first_observation_initializes_state(self, spark, tmp_path):
        from skope_api_spark.streaming import stateful as sf

        land = tmp_path / "land2"
        land.mkdir()
        self._obs_file(land / "a.parquet", [(7, 0, 42.0)])
        stream = spark.readStream.schema(
            "user_id long, order_key long, value double"
        ).parquet(str(land))
        q = (
            sf.holt_stream(stream)
            .writeStream.format("memory")
            .queryName("holt_init")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        row = spark.sql("SELECT * FROM holt_init").first()
        assert row.level == 42.0 and row.trend == 0.0
        assert row.forecast_1 == 42.0
