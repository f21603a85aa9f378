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


def test_rules3_hand_example(spark):
    """Baskets: {a,b,c}×2, {a,b}×1, {a,c}×1 over N=4 baskets.
    min_support=0.5 → frequent triples: (a,b,c) tn=2."""
    from intake_esm_spark.operators.basket import association_rules3

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"), (3, "b"),
        (4, "a"), (4, "c"),
    ]
    df = spark.createDataFrame(rows, "b long, i string")
    out = association_rules3(df, "b", "i", min_support=0.5)
    got = {
        (r["antecedent_1"], r["antecedent_2"], r["consequent"]): r.asDict()
        for r in out.collect()
    }
    assert set(got) == {("b", "c", "a"), ("a", "c", "b"), ("a", "b", "c")}
    r = got[("a", "b", "c")]
    assert r["triple_n"] == 2
    assert r["support"] == 0.5          # 2/4
    assert r["confidence"] == pytest.approx(2 / 3, abs=1e-6)  # pair ab n=3
    # lift = conf / (n_c/N) = (2/3) / (3/4)
    assert r["lift"] == pytest.approx((2 / 3) / (3 / 4), abs=1e-5)
    r = got[("b", "c", "a")]
    assert r["confidence"] == 1.0       # pair bc n=2, both have a


def test_rules3_support_monotone_vs_pairs(spark):
    """Apriori monotonicity, asserted end-to-end on real data: every
    frequent triple's support <= the support of EACH of its three
    sub-pairs in the pairwise report (same min_support)."""
    from intake_esm_spark.operators.basket import (
        association_rules,
        association_rules3,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    ms = 0.0005
    pair_sup = {
        (r["antecedent"], r["consequent"]): r["support"]
        for r in association_rules(
            li, "l_orderkey", "l_partkey", min_support=ms
        ).collect()
    }
    tri = association_rules3(
        li, "l_orderkey", "l_partkey", min_support=ms
    ).collect()
    for r in tri:
        a1, a2, cq = r["antecedent_1"], r["antecedent_2"], r["consequent"]
        for x, y in ((a1, a2), (a1, cq), (a2, cq)):
            assert (x, y) in pair_sup or (y, x) in pair_sup
            s = pair_sup.get((x, y), pair_sup.get((y, x)))
            assert r["support"] <= s + 1e-9


def test_rules3_validation(spark):
    from intake_esm_spark.operators.basket import association_rules3

    df = spark.createDataFrame([(1, "a")], "b long, i string")
    with pytest.raises(ValueError):
        association_rules3(df, "b", "i", min_support=0.0)
    with pytest.raises(ValueError):
        association_rules3(df, "b", "i", min_support=0.5, max_basket_items=2)
