"""Empty-input robustness: every contract query must handle EMPTY tables
(empty shards / filters that match nothing are routine at 100 TB) by
returning rows or an empty frame — never by throwing.

Round-10 finding: 8 of 258 queries crashed on empty input — six ANSI
DIVIDE_BY_ZERO ratios (bounce rate, TTR/hapax, KMV estimates, dq
completeness, ANN recall), one value-less pivot that dropped its
columns (robust_summary's `0.5` selection), and the documented
dimension-unknowable error in the embedding covariance. All but the
last are fixed with try_divide / explicit pivot values; DuckDB's x/0
is NULL, so the oracles agree on the degenerate case too.

The fast test covers the previously-crashing set; the full 258-query
sweep is env-gated (SPARK_GRAFT_SLOW=1) and also part of the round
protocol via /tmp scripts (see PERF.md round 10).
"""

from __future__ import annotations

import os

import pytest

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

FIXED = [
    "sketch_kmv_overlap_langs",
    "dq_constraint_report_orders",
    "dq_column_profile_orders",
    "sim_recall_report",
    "stats_robust_price_summary",
    "text_vocabulary_richness",
    "session_bounce_rate",
]


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    import glob
    import shutil

    from skope_api_spark.tables import load

    out = str(tmp_path_factory.mktemp("sf_empty"))
    for t in TABLES:
        df = load(spark, "/root/testdata/sf0.001", t).limit(0)
        tmp = f"{out}/_tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.copy(part, f"{out}/{t}.parquet")
        shutil.rmtree(tmp)
    return out


def test_previously_crashing_queries_survive_empty_input(spark, empty_dir):
    import __spark_entry__ as e

    qs = e.queries()
    for name in FIXED:
        rows = qs[name](spark, empty_dir).collect()  # must not raise
        # ratio cells on empty input are NULL, never -0.0 / inf / error
        for r in rows:
            for v in r:
                if isinstance(v, float):
                    assert v == v and abs(v) != float("inf"), (name, r)


def test_embedding_covariance_raises_the_documented_error(spark, empty_dir):
    import __spark_entry__ as e

    with pytest.raises(ValueError, match="empty column"):
        e.queries()["sim_embedding_covariance"](spark, empty_dir)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW") != "1",
    reason="full 258-query empty sweep is opt-in (SPARK_GRAFT_SLOW=1)",
)
def test_full_registry_survives_empty_input(spark, empty_dir):
    import __spark_entry__ as e

    allowed = {"sim_embedding_covariance"}  # documented clear error
    bad = []
    for name, fn in e.queries().items():
        if name in allowed:
            continue
        try:
            fn(spark, empty_dir).collect()
        except Exception as ex:  # noqa: BLE001
            bad.append((name, f"{type(ex).__name__}: {str(ex)[:120]}"))
    assert bad == []


FIXED_ONEROW = [
    "stats_moments_battery",      # m2 = 0 for a 1-row group
    "feature_robust_scale_price", # IQR = 0
    "stats_langid_confusion_report",  # pe_v = 1 -> kappa undefined
]


@pytest.fixture(scope="module")
def onerow_dir(spark, tmp_path_factory):
    import glob
    import shutil

    from skope_api_spark.tables import load

    out = str(tmp_path_factory.mktemp("sf_onerow"))
    for t in TABLES:
        df = load(spark, "/root/testdata/sf0.001", t).limit(1)
        tmp = f"{out}/_tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.copy(part, f"{out}/{t}.parquet")
        shutil.rmtree(tmp)
    return out


def test_previously_crashing_queries_survive_single_row_input(
    spark, onerow_dir
):
    """n=1 degenerates: zero variance, zero IQR, chance-agreement 1 —
    undefined statistics must come back NULL, not ANSI errors."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in FIXED_ONEROW:
        qs[name](spark, onerow_dir).collect()  # must not raise


FIXED_NULLS = ["map_functions_battery", "stats_two_proportion_ab"]
KEEP_COLS = ("key", "doc_id", "vec_id", "event_id", "user_id", "ts", "id")


@pytest.fixture(scope="module")
def nulls_dir(spark, tmp_path_factory):
    import glob
    import shutil

    from pyspark.sql import functions as F

    from skope_api_spark.tables import load

    out = str(tmp_path_factory.mktemp("sf_nulls"))
    for t in TABLES:
        df = load(spark, "/root/testdata/sf0.001", t).limit(20)
        cols = [
            F.col(f.name)
            if any(k in f.name for k in KEEP_COLS)
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in df.schema.fields
        ]
        tmp = f"{out}/_tmp_{t}"
        df.select(*cols).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.copy(part, f"{out}/{t}.parquet")
        shutil.rmtree(tmp)
    return out


def test_previously_crashing_queries_survive_null_payloads(
    spark, nulls_dir
):
    """NULL-poisoned rows (keys kept, payloads NULL): NULL map keys are
    dropped by contract, zero-conversion z-tests yield NULL — no
    NULL_MAP_KEY / DIVIDE_BY_ZERO job failures."""
    import __spark_entry__ as e

    qs = e.queries()
    for name in FIXED_NULLS:
        qs[name](spark, nulls_dir).collect()  # must not raise


def test_malformed_payload_queries_survive(spark, tmp_path):
    """Dirty-payload class: non-JSON props and non-matching names must
    quarantine to NULL, not fail the job (try_parse_json / try_cast)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from skope_api_spark.tables import load

    out = str(tmp_path)
    for t, col, lit in (
        ("events", "props", "not json"),
        ("customer", "c_name", "Totally#Unrelated"),
    ):
        df = load(spark, "/root/testdata/sf0.001", t).limit(20)
        df = df.withColumn(col, F.lit(lit))
        tmpd = f"{out}/_tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmpd)
        part = glob.glob(f"{tmpd}/part-*.parquet")[0]
        shutil.copy(part, f"{out}/{t}.parquet")
        shutil.rmtree(tmpd)
    import __spark_entry__ as e

    qs = e.queries()
    rows = qs["json_variant_battery"](spark, out).collect()
    assert all(r["sum_k"] is None for r in rows)  # quarantined, counted
    assert all(r["n_events"] > 0 for r in rows)
    rows = qs["regexp_battery"](spark, out).collect()
    assert all(r["extracted_id"] is None for r in rows)


def test_gap_fill_sentinel_span_guard(spark):
    """Date-spine bomb guard: one sentinel timestamp (epoch 0 / 9999)
    must fail LOUDLY with the key and span in the message, not silently
    materialize a 100k-row-per-key spine (at real key counts that is a
    quadrillion-row output)."""
    from pyspark.sql import functions as F

    from skope_api_spark.operators.windows import gap_fill_interpolate

    df = spark.createDataFrame(
        [(1, "1970-01-01 00:00:00", 1.0), (1, "2260-01-05 00:00:00", 5.0)],
        "user_id int, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    with pytest.raises(Exception, match="max_span_days"):
        gap_fill_interpolate(df).count()
    # explicit opt-in still works
    assert gap_fill_interpolate(df, max_span_days=200_000).count() > 100_000
