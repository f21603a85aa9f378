"""Market-basket association rules (operators/basket.py)."""

import pytest

from intake_esm_spark.operators.basket import association_rules


@pytest.fixture(scope="module")
def baskets(spark):
    rows = [
        (1, "bread"), (1, "butter"), (1, "milk"),
        (2, "bread"), (2, "butter"),
        (3, "bread"), (3, "butter"),
        (4, "bread"), (4, "milk"),
        (5, "milk"),
        (6, "bread"), (6, "bread"),   # duplicate item: counts once
        (None, "ghost"), (7, None),   # nulls excluded
    ]
    return spark.createDataFrame(rows, "basket long, item string")


def test_rules_support_confidence_lift(baskets):
    out = {
        (r["antecedent"], r["consequent"]): r.asDict()
        for r in association_rules(baskets, "basket", "item", 0.2).collect()
    }
    # 6 valid baskets; bread in 5, butter in 3, milk in 3;
    # {bread, butter} in 3, {bread, milk} in 2, {butter, milk} in 1 (< 0.2*6)
    bb = out[("bread", "butter")]
    assert bb["pair_n"] == 3
    assert bb["support"] == pytest.approx(0.5)
    assert bb["confidence"] == pytest.approx(3 / 5)
    assert bb["lift"] == pytest.approx((3 / 5) / (3 / 6))
    rev = out[("butter", "bread")]
    assert rev["confidence"] == pytest.approx(1.0)   # butter always with bread
    assert rev["support"] == bb["support"]
    assert ("butter", "milk") not in out             # below min_support
    assert ("bread", "milk") in out and ("milk", "bread") in out


def test_apriori_prefilter_drops_rare_items(spark):
    rows = [(1, "a"), (1, "rare"), (2, "a"), (3, "a"), (4, "a"), (5, "a")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = association_rules(df, "basket", "item", 0.4).collect()
    assert out == []  # 'rare' is pruned before the join; no pair survives


def test_mega_basket_guard(spark):
    rows = [(1, f"i{k}") for k in range(50)] + [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r["antecedent"], r["consequent"]): r["pair_n"]
        for r in association_rules(df, "basket", "item", 0.3, max_basket_items=10).collect()
    }
    # basket 1 (50 items) dropped: pair counts come from baskets 2-3 only
    assert out[("i0", "i1")] == 2


def test_validation(spark):
    df = spark.createDataFrame([(1, "a")], "basket long, item string")
    with pytest.raises(ValueError):
        association_rules(df, "basket", "item", 0.0)
    with pytest.raises(ValueError):
        association_rules(df, "basket", "item", 0.5, max_basket_items=1)
