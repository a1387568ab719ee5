"""Session path mining (operators/funnel.py:session_paths)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from skope_api_spark.operators.funnel import session_paths


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


T0 = datetime(2024, 1, 1, 12, 0, 0)


def _t(minutes):
    return T0 + timedelta(minutes=minutes)


def test_paths_ordered_within_session(spark):
    rows = [
        (1, _t(0), 1, "view"),
        (2, _t(1), 1, "click"),
        (3, _t(2), 1, "purchase"),
    ]
    out = session_paths(_events(spark, rows), top_k=5).collect()
    assert [(r["path"], r["n_sessions"]) for r in out] == [
        ("view>click>purchase", 1)
    ]


def test_gap_splits_paths(spark):
    rows = [
        (1, _t(0), 1, "view"),
        (2, _t(5), 1, "click"),
        (3, _t(120), 1, "view"),  # > 30 min gap: new session
        (4, _t(125), 1, "click"),
    ]
    out = session_paths(_events(spark, rows), top_k=5).collect()
    assert [(r["path"], r["n_sessions"]) for r in out] == [("view>click", 2)]


def test_tie_break_is_lexicographic(spark):
    rows = [
        (1, _t(0), 1, "a"),
        (2, _t(0), 2, "b"),
        (3, _t(0), 3, "a"),
        (4, _t(0), 4, "b"),
    ]
    out = session_paths(_events(spark, rows), top_k=5).collect()
    assert [(r["path"], r["n_sessions"]) for r in out] == [("a", 2), ("b", 2)]


def test_same_timestamp_orders_by_event_id(spark):
    rows = [
        (9, _t(0), 1, "late"),
        (1, _t(0), 1, "early"),
    ]
    out = session_paths(_events(spark, rows), top_k=5).collect()
    assert out[0]["path"] == "early>late"


def test_truncation_marker(spark):
    rows = [(i, _t(i), 1, f"e{i}") for i in range(5)]
    out = session_paths(
        _events(spark, rows), top_k=5, max_path_events=2
    ).collect()
    assert out[0]["path"] == "e0>e1>..."


def test_truncation_validation(spark):
    rows = [(1, _t(0), 1, "a")]
    with pytest.raises(ValueError, match="max_path_events"):
        session_paths(_events(spark, rows), max_path_events=0)
