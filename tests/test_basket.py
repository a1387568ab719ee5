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


class TestRFM:
    def _orders(self, spark):
        from datetime import datetime

        rows = []
        # customer 1: recent, frequent, big spender -> 444
        for d in range(1, 9):
            rows.append((1, datetime(2024, 3, d), 1000.0))
        # customer 2: one old small order -> 111
        rows.append((2, datetime(2023, 1, 1), 10.0))
        # customers 3..6 in between
        for c, (m, n, amt) in enumerate(
            [(6, 2, 100.0), (9, 3, 200.0), (12, 4, 300.0), (2, 5, 400.0)],
            start=3,
        ):
            for d in range(1, n + 1):
                rows.append((c, datetime(2023, m, d), amt))
        return spark.createDataFrame(
            rows, "cust long, dt timestamp, amount double"
        )

    def test_scores_monotone_with_metrics(self, spark):
        from skope_api_spark.operators.funnel import rfm_segments

        out = {
            r["customer"]: r
            for r in rfm_segments(
                self._orders(spark),
                customer_col="cust",
                date_col="dt",
                amount_col="amount",
            ).collect()
        }
        assert out[1]["segment"] == "444"
        assert out[2]["segment"] == "111"
        # every score is a valid quartile
        for r in out.values():
            for s in ("r_score", "f_score", "m_score"):
                assert 1 <= r[s] <= 4

    def test_monetary_is_exact_tick_sum(self, spark):
        from skope_api_spark.operators.funnel import rfm_segments

        out = {
            r["customer"]: r["monetary_ticks"]
            for r in rfm_segments(
                self._orders(spark),
                customer_col="cust",
                date_col="dt",
                amount_col="amount",
            ).collect()
        }
        assert out[1] == 8000_0000 and out[2] == 10_0000


class TestItemItemCosine:
    def test_hand_checked_neighbors(self, spark):
        from skope_api_spark.operators.basket import item_item_cosine

        # baskets: {A,B} x3, {A,C} x1 (+dup line), {B,C} x1
        rows = [
            (1, "A"), (1, "B"),
            (2, "A"), (2, "B"),
            (3, "A"), (3, "B"),
            (4, "A"), (4, "C"), (4, "C"),  # duplicate line must not count
            (5, "B"), (5, "C"),
        ]
        df = spark.createDataFrame(rows, "oid long, item string")
        out = item_item_cosine(
            df, basket_col="oid", item_col="item", min_pair_count=1, k=2
        ).collect()
        by = {(r["item"], r["neighbor"]): r for r in out}
        # n_A=4, n_B=4, n_C=2; cooc(A,B)=3, cooc(A,C)=1, cooc(B,C)=1
        assert by[("A", "B")]["cosine"] == pytest.approx(3 / 4)
        assert by[("A", "C")]["cosine"] == pytest.approx(1 / (8**0.5))
        assert by[("A", "B")]["rk"] == 1  # strongest neighbor first
        # symmetric: B's list contains A at rank 1
        assert by[("B", "A")]["rk"] == 1
        assert by[("B", "A")]["cosine"] == pytest.approx(3 / 4)

    def test_min_pair_count_filters(self, spark):
        from skope_api_spark.operators.basket import item_item_cosine

        rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C")]
        df = spark.createDataFrame(rows, "oid long, item string")
        out = item_item_cosine(
            df, basket_col="oid", item_col="item", min_pair_count=2, k=5
        ).collect()
        pairs = {(r["item"], r["neighbor"]) for r in out}
        assert ("A", "B") in pairs and ("A", "C") not in pairs
        import pytest as _pt

        with _pt.raises(ValueError):
            item_item_cosine(
                df, basket_col="oid", item_col="item", min_pair_count=0
            )
