"""Market-basket association rules (operators/basket.py)."""

from __future__ import annotations

import pytest

from skope_api_spark.operators.basket import association_rules, basket_items


def _baskets(spark, baskets):
    rows = [(b, i) for b, items in baskets for i in items]
    return spark.createDataFrame(rows, "basket long, item string")


def test_counts_and_metrics_hand_checked(spark):
    # 4 baskets; (a,b) co-occur in 3; a in 4, b in 3
    df = _baskets(
        spark,
        [
            (1, ["a", "b"]),
            (2, ["a", "b", "c"]),
            (3, ["a", "b"]),
            (4, ["a", "c"]),
        ],
    )
    rows = association_rules(
        df, basket_col="basket", item_col="item", min_pair_count=1, top_k=10
    ).collect()
    ab = next(r for r in rows if (r["item_a"], r["item_b"]) == ("a", "b"))
    assert ab["n_pairs"] == 3 and ab["n_a"] == 4 and ab["n_b"] == 3
    assert ab["support"] == 3 / 4
    assert ab["confidence_a_b"] == 3 / 4
    assert ab["lift"] == pytest.approx((3 * 4) / (4 * 3))


def test_duplicate_lines_do_not_inflate(spark):
    df = _baskets(spark, [(1, ["a", "a", "b", "b"]), (2, ["a", "b"])])
    rows = association_rules(
        df, basket_col="basket", item_col="item", min_pair_count=1
    ).collect()
    assert rows[0]["n_pairs"] == 2  # one pair per basket, not 4


def test_min_pair_count_filters(spark):
    df = _baskets(spark, [(1, ["a", "b"]), (2, ["c", "d"])])
    rows = association_rules(
        df, basket_col="basket", item_col="item", min_pair_count=2
    ).collect()
    assert rows == []


def test_lift_identifies_association(spark):
    # (x,y) always together; (x,z) independent-ish
    baskets = [(i, ["x", "y"]) for i in range(5)]
    baskets += [(10 + i, ["x", "z"]) for i in range(5)]
    baskets += [(20 + i, ["z"]) for i in range(5)]
    df = _baskets(spark, baskets)
    rows = association_rules(
        df, basket_col="basket", item_col="item", min_pair_count=1
    ).collect()
    top = rows[0]
    assert (top["item_a"], top["item_b"]) == ("x", "y")
    assert top["lift"] > 1.0


def test_basket_items_normalizes(spark):
    df = _baskets(spark, [(1, ["a", "a"])])
    assert basket_items(df, basket_col="basket", item_col="item").count() == 1


def test_validation(spark):
    df = _baskets(spark, [(1, ["a"])])
    with pytest.raises(ValueError, match="min_pair_count"):
        association_rules(
            df, basket_col="basket", item_col="item", min_pair_count=0
        )
