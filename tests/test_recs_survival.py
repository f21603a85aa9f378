"""also_bought (operators/recs.py) and km_survival (operators/survival.py)."""

import pytest

from intake_esm_spark.operators.recs import also_bought
from intake_esm_spark.operators.survival import km_survival


def _baskets(spark):
    rows = [
        ("b1", "A"), ("b1", "B"), ("b1", "C"),
        ("b2", "A"), ("b2", "B"),
        ("b3", "A"), ("b3", "C"),
        ("b4", "B"), ("b4", "C"), ("b4", "C"),  # dup counts once
    ]
    return spark.createDataFrame(rows, "basket string, item string")


def test_also_bought_hand_example(spark):
    out = also_bought(
        _baskets(spark), "basket", "item", top_k=2, min_pair_count=2
    ).collect()
    got = {(r["item"], r["neighbor"]): r for r in out}
    # every pair co-occurs in exactly 2 baskets; every item is in 3
    assert set(got) == {
        ("A", "B"), ("A", "C"), ("B", "A"), ("B", "C"),
        ("C", "A"), ("C", "B"),
    }
    for r in got.values():
        assert r["n_both"] == 2
        assert r["cosine"] == pytest.approx(round(2 / 3, 6))
    # cosine ties rank by neighbor id
    assert got[("A", "B")]["rank"] == 1 and got[("A", "C")]["rank"] == 2


def test_also_bought_min_pair_floor(spark):
    assert (
        also_bought(
            _baskets(spark), "basket", "item", top_k=2, min_pair_count=3
        ).count()
        == 0
    )


def test_also_bought_mega_basket_guard(spark):
    out = also_bought(
        _baskets(spark),
        "basket",
        "item",
        top_k=2,
        min_pair_count=1,
        max_basket_items=2,
    ).collect()
    # 3-item basket b1 dropped: only b2 (A,B), b3 (A,C), b4 (B,C) pair up
    got = {(r["item"], r["neighbor"]): r["n_both"] for r in out}
    assert got[("A", "B")] == 1 and got[("A", "C")] == 1


def test_also_bought_validation(spark):
    df = _baskets(spark)
    with pytest.raises(ValueError):
        also_bought(df, "basket", "item", top_k=0)
    with pytest.raises(ValueError):
        also_bought(df, "basket", "item", min_pair_count=0)
    with pytest.raises(ValueError):
        also_bought(df, "basket", "item", max_basket_items=1)


def test_km_textbook_example(spark):
    subj = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 0), (3, 1), (4, 0)], "dur int, ev int"
    )
    rows = {
        r["t"]: r
        for r in km_survival(subj, "dur", "ev").collect()
    }
    assert rows[1]["n_at_risk"] == 5 and rows[1]["n_events"] == 1
    assert rows[1]["survival"] == pytest.approx(0.8)
    assert rows[2]["n_at_risk"] == 4 and rows[2]["n_censored"] == 1
    assert rows[2]["survival"] == pytest.approx(0.6)
    assert rows[3]["n_at_risk"] == 2
    assert rows[3]["survival"] == pytest.approx(0.3)
    assert rows[4]["n_at_risk"] == 1 and rows[4]["n_events"] == 0
    # censoring-only time: survival does NOT step down
    assert rows[4]["survival"] == pytest.approx(0.3)
    assert rows[4]["hazard"] == 0.0


def test_km_survival_reaches_zero(spark):
    subj = spark.createDataFrame([(1, 1), (1, 1)], "dur int, ev int")
    r = km_survival(subj, "dur", "ev").collect()[0]
    assert r["n_at_risk"] == 2 and r["n_events"] == 2
    assert r["survival"] == 0.0


def test_km_nulls_excluded(spark):
    subj = spark.createDataFrame(
        [(1, 1), (None, 1), (2, None)], "dur int, ev int"
    )
    out = km_survival(subj, "dur", "ev").collect()
    assert len(out) == 1 and out[0]["n_at_risk"] == 1


# --- logrank_test ------------------------------------------------------------


def test_logrank_matches_reference_computation(spark):
    """Hand reference: per event time, O-E and hypergeometric variance
    computed by a plain python loop over the same subjects (ties and
    censoring included)."""
    import math

    import pytest as _pt

    from intake_esm_spark.operators.survival import logrank_test

    # (treated?, duration, event): ties at 3 and 5, censored rows mixed
    data = [
        (1, 1.0, 1), (1, 3.0, 1), (1, 3.0, 0), (1, 5.0, 1), (1, 7.0, 0),
        (1, 9.0, 1), (0, 2.0, 1), (0, 3.0, 1), (0, 4.0, 1), (0, 5.0, 1),
        (0, 6.0, 0), (0, 8.0, 1),
    ]
    oe = vv = 0.0
    for t in sorted({d for _, d, e in data if e == 1}):
        n1 = sum(1 for g, d, _ in data if g and d >= t)
        n = sum(1 for _, d, _ in data if d >= t)
        d1 = sum(1 for g, d, e in data if g and d == t and e)
        dd = sum(1 for _, d, e in data if d == t and e)
        oe += d1 - dd * n1 / n
        if n > 1:
            vv += dd * (n1 / n) * (1 - n1 / n) * (n - dd) / (n - 1)
    expect_z = oe / math.sqrt(vv)

    rows = [("t" if g else "c", d, e) for g, d, e in data]
    df = spark.createDataFrame(rows, "grp string, dur double, ev int")
    out = logrank_test(df, "grp", "dur", "ev", "t", "c").collect()[0]
    assert (out["n_treatment"], out["n_control"]) == (6, 6)
    assert out["n_events"] == 9
    assert out["z"] == _pt.approx(expect_z, abs=1e-5)
    assert out["chi2"] == _pt.approx(expect_z * expect_z, abs=1e-5)


def test_logrank_identical_arms_is_null_or_zero(spark):
    """Same durations in both arms: O = E at every time, z ~ 0; an
    event-free frame yields null z with counts intact."""
    from intake_esm_spark.operators.survival import logrank_test

    rows = [("t", float(d), 1) for d in range(1, 8)] + [
        ("c", float(d), 1) for d in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "grp string, dur double, ev int")
    out = logrank_test(df, "grp", "dur", "ev", "t", "c").collect()[0]
    assert out["z"] == 0.0 and out["significant"] == 0

    censored = spark.createDataFrame(
        [("t", 1.0, 0), ("c", 2.0, 0)], "grp string, dur double, ev int"
    )
    r = logrank_test(censored, "grp", "dur", "ev", "t", "c").collect()[0]
    assert r["z"] is None and r["n_events"] == 0
    assert (r["n_treatment"], r["n_control"]) == (1, 1)


def test_km_nelson_aalen_cum_hazard(spark):
    """cum_hazard (round 11) is the running sum of d/n at each distinct
    time — hand-checked on a small censored cohort."""
    subj = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 0), (3, 1), (3, 0), (4, 1)],
        "dur int, ev int",
    )
    rows = {r["t"]: r for r in km_survival(subj, "dur", "ev").collect()}
    # t=1: n=6 d=2 -> H=2/6; t=2: censored only, H unchanged;
    # t=3: n=3 d=1 -> +1/3; t=4: n=1 d=1 -> +1
    assert rows[1]["cum_hazard"] == round(2 / 6, 6)
    assert rows[2]["cum_hazard"] == round(2 / 6, 6)
    assert rows[3]["cum_hazard"] == round(2 / 6 + 1 / 3, 6)
    assert rows[4]["cum_hazard"] == round(2 / 6 + 1 / 3 + 1.0, 6)
