"""checkpoint.pin policy: reliable mode must be a pure execution-strategy
swap — identical results to the default localCheckpoint path — because
on a real cluster it is the difference between an iterative job
surviving executor loss and dying (see skope_api_spark/checkpoint.py).
"""

from __future__ import annotations

import os

import pytest

from skope_api_spark.checkpoint import pin, reliable_mode


@pytest.fixture()
def reliable(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "ckpt"))
    yield


def test_pin_default_is_local(spark):
    assert not reliable_mode()
    df = pin(spark.range(10))
    assert df.count() == 10
    # localCheckpoint truncates lineage: the post-pin plan is a scan of
    # the checkpointed RDD, not the original Range operator
    plan = df._jdf.queryExecution().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    assert "Range (0, 10" not in plan


def test_pin_reliable_writes_checkpoint_dir(spark, reliable, tmp_path):
    assert reliable_mode()
    df = pin(spark.range(10))
    assert df.count() == 10
    ckpt = tmp_path / "ckpt"
    assert ckpt.exists() and any(ckpt.rglob("*"))


def test_pagerank_identical_under_reliable_mode(spark, monkeypatch, tmp_path):
    from skope_api_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (1, 3)], "src int, dst int"
    )
    base = {
        (r["node"], r["rank"])
        for r in pagerank(edges, iterations=6, checkpoint_every=2).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "pr"))
    rel = {
        (r["node"], r["rank"])
        for r in pagerank(edges, iterations=6, checkpoint_every=2).collect()
    }
    assert rel == base


def test_duplicate_clusters_identical_under_reliable_mode(
    spark, monkeypatch, tmp_path
):
    from skope_api_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f"), ("g", "e")],
        "x string, y string",
    )
    base = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(pairs, id_cols=("x", "y")).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "dc"))
    rel = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(pairs, id_cols=("x", "y")).collect()
    }
    assert rel == base


def test_checkpoint_dir_defaults_to_tmp_when_unset(
    spark, monkeypatch, tmp_path
):
    # no SPARK_GRAFT_CHECKPOINT_DIR: pin must still work (per-app tmp
    # dir) — sandbox convenience; cluster deployments set a shared path
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CHECKPOINT", "1")
    monkeypatch.delenv("SPARK_GRAFT_CHECKPOINT_DIR", raising=False)
    assert pin(spark.range(5)).count() == 5
