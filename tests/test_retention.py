"""Cohort retention matrix (operators/retention.py)."""

import datetime as dt

import pytest

from intake_esm_spark.operators.retention import retention_matrix


def _ts(day, h=0):
    return dt.datetime(2024, 1, day, h)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # cohort Jan 1: u1 (returns day 2 and day 9), u2 (never returns)
        ("u1", "signup", _ts(1)),
        ("u1", "view", _ts(2)),
        ("u1", "view", _ts(2, 5)),  # same day twice -> counted once
        ("u1", "click", _ts(9)),
        ("u2", "view", _ts(1, 23)),
        # cohort Jan 3: u3 returns day 4
        ("u3", "view", _ts(3)),
        ("u3", "purchase", _ts(4)),
        # null user: excluded entirely
        (None, "view", _ts(1)),
    ]
    return spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")


def _key(df):
    return {
        (r["cohort_date"], r["offset_periods"]): r.asDict() for r in df.collect()
    }


def test_daily_retention(events):
    m = _key(retention_matrix(events))
    assert set(m) == {("2024-01-01", 0), ("2024-01-01", 1), ("2024-01-01", 8),
                      ("2024-01-03", 0), ("2024-01-03", 1)}
    d0 = m[("2024-01-01", 0)]
    assert d0["n_active"] == 2 and d0["cohort_size"] == 2 and d0["retention"] == 1.0
    assert m[("2024-01-01", 1)]["n_active"] == 1  # only u1, same-day dup collapsed
    assert m[("2024-01-01", 1)]["retention"] == 0.5
    assert m[("2024-01-03", 1)]["cohort_size"] == 1


def test_weekly_grain_buckets_offsets(events):
    m = _key(retention_matrix(events, grain_days=7))
    # u1's day-2 and day-9 activity -> offsets 0 and 1; day-1 -> 0
    assert set(m) == {("2024-01-01", 0), ("2024-01-01", 1), ("2024-01-03", 0)}
    assert m[("2024-01-01", 0)]["n_active"] == 2
    assert m[("2024-01-01", 1)]["n_active"] == 1


def test_grain_validation(events):
    with pytest.raises(ValueError):
        retention_matrix(events, grain_days=0)


def test_cohort_ltv_hand_example(spark):
    """Two users, one cohort: u1 spends 10 on day0 and 30 on day7 (week
    offset 1), u2 spends 20 on day0 — LTV/user: offset0 = 15, offset1 =
    (10+20+30)/2 = 30."""
    from intake_esm_spark.operators.retention import cohort_ltv

    rows = [
        (1, "2024-01-01 09:00:00", 10.0),
        (2, "2024-01-01 12:00:00", 20.0),
        (1, "2024-01-08 09:00:00", 30.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    out = {
        (r["cohort_date"], r["offset_periods"]): r.asDict()
        for r in cohort_ltv(df, grain_days=7).collect()
    }
    assert set(out) == {("2024-01-01", 0), ("2024-01-01", 1)}
    o0 = out[("2024-01-01", 0)]
    assert o0["cohort_users"] == 2
    assert o0["period_revenue"] == 30.0
    assert o0["ltv_per_user"] == 15.0
    o1 = out[("2024-01-01", 1)]
    assert o1["period_revenue"] == 30.0
    assert o1["ltv_per_user"] == 30.0  # (10+20+30)/2


def test_cohort_ltv_excludes_null_users_and_values(spark):
    from intake_esm_spark.operators.retention import cohort_ltv

    rows = [
        (1, "2024-01-01 09:00:00", 10.0),
        (None, "2024-01-01 09:00:00", 99.0),
        (1, "2024-01-02 09:00:00", None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    out = cohort_ltv(df, grain_days=7).collect()
    assert len(out) == 1
    assert out[0]["period_revenue"] == 10.0
