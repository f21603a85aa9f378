"""Daily rollup + calendar moving average (operators/timeseries.py)."""

import datetime as dt

import pytest

from intake_esm_spark.operators.timeseries import daily_rollup_ma


def _ts(day, h=0):
    return dt.datetime(2024, 3, day, h)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        ("p", _ts(1), 10.0),
        ("p", _ts(1, 5), 20.0),
        ("p", _ts(2), 40.0),
        # day 3 missing entirely
        ("p", _ts(4), 100.0),
        ("p", _ts(20), 7.0),  # far gap: window holds only itself
    ]
    return spark.createDataFrame(rows, "event_type string, ts timestamp, value double")


def test_rollup_and_calendar_window(events):
    out = {r["day"]: r.asDict() for r in daily_rollup_ma(events, window_days=3).collect()}
    assert out["2024-03-01"]["revenue"] == 30.0
    assert out["2024-03-01"]["ma3"] == 30.0
    assert out["2024-03-02"]["ma3"] == 35.0  # (30+40)/2
    # calendar RANGE window: day 4 sees days 2..4 -> {40, 100}, NOT the
    # last-3-rows {30, 40, 100} a rows window would produce
    assert out["2024-03-04"]["ma3"] == 70.0
    assert out["2024-03-20"]["ma3"] == 7.0


def test_decimal_accumulation_is_partition_stable(spark):
    rows = [("p", _ts(5), 0.1)] * 99
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    a = daily_rollup_ma(df).collect()[0]["revenue"]
    b = daily_rollup_ma(df.repartition(17)).collect()[0]["revenue"]
    assert a == b == 9.9  # decimal(18,6) sum: exact, no float drift


def test_window_days_validation(events):
    with pytest.raises(ValueError):
        daily_rollup_ma(events, window_days=0)


def test_anomaly_detection_flags_spike(spark):
    from intake_esm_spark.operators.timeseries import detect_anomalies

    rows = [("p", _ts(d), 10.0 + (d % 3) * 0.5) for d in range(1, 11)]
    rows.append(("p", _ts(11), 500.0))  # the spike
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {r["day"]: r.asDict() for r in detect_anomalies(df, window_days=7).collect()}
    assert out["2024-03-11"]["is_anomaly"] is True
    assert out["2024-03-11"]["z_score"] > 10
    # first day has no trailing window
    assert out["2024-03-01"]["z_score"] is None
    assert out["2024-03-01"]["is_anomaly"] is False
    # normal days unflagged
    assert not out["2024-03-08"]["is_anomaly"]


def test_anomaly_constant_series_degenerate_variance(spark):
    from intake_esm_spark.operators.timeseries import detect_anomalies

    rows = [("p", _ts(d), 10.0) for d in range(1, 8)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = detect_anomalies(df, window_days=7).collect()
    assert all(r["z_score"] is None for r in out)
    assert all(r["is_anomaly"] is False for r in out)
