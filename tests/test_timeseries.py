"""Daily rollup + calendar moving average (operators/timeseries.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# CUSUM level-shift


def test_cusum_closed_form_matches_recursion(spark):
    """The prefix-minus-running-min closed form must equal the textbook
    recursion S+ = max(0, S+ + d) computed in python over the same
    quantized drifts — and flag the injected level shift."""
    import math
    from intake_esm_spark.operators.timeseries import detect_level_shift

    vals = [100.0] * 14 + [130.0] * 10  # +30 level shift on day 15
    rows = [("p", _ts(1 + i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = sorted(
        detect_level_shift(df, k_sigma=0.5, h_sigma=4.0).collect(),
        key=lambda r: r["day"],
    )
    n = len(vals)
    mean = sum(vals) / n
    var = (sum(v * v for v in vals) - n * mean * mean) / (n - 1)
    sd = math.sqrt(var)
    s_up, s_dn = 0.0, 0.0
    expect_up, expect_dn = [], []
    for v in vals:
        s_up = max(0.0, s_up + round(v - mean - 0.5 * sd, 6))
        s_dn = max(0.0, s_dn + round(mean - v - 0.5 * sd, 6))
        expect_up.append(s_up)
        expect_dn.append(s_dn)
    for r, eu, ed in zip(out, expect_up, expect_dn):
        assert r["cusum_up"] == pytest.approx(eu, abs=1e-5)
        assert r["cusum_down"] == pytest.approx(ed, abs=1e-5)
    # the up-alarm fires only in the shifted regime; note the DOWN side
    # also accumulates early (vs the GLOBAL mean, regime 1 sits low) —
    # that is correct CUSUM behavior, covered by the recursion parity
    assert all(r["shift_up"] == 0 for r in out[:14])
    assert any(r["shift_up"] == 1 for r in out[14:])


def test_cusum_degenerate_sigma_never_alarms(spark):
    from intake_esm_spark.operators.timeseries import detect_level_shift

    rows = [("p", _ts(1 + i), 50.0) for i in range(5)]  # constant series
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = detect_level_shift(df).collect()
    assert all(r["shift_up"] == 0 and r["shift_down"] == 0 for r in out)
    assert all(r["cusum_up"] is None for r in out)  # sd null -> null cusum


def test_stream_cusum_matches_batch(spark, tmp_path):
    """Two time-ordered micro-batches of day-grain rows, baseline =
    the batch operator's own moments: per-day cusum values and alarm
    flags must equal detect_level_shift row-for-row (the int64
    millionth-units state makes cross-batch accumulation exact)."""
    import glob
    import math
    import os
    import shutil
    from decimal import Decimal

    from intake_esm_spark.operators.timeseries import detect_level_shift
    from intake_esm_spark.streaming.stateful import stream_cusum

    vals = [100.0, 101.5, 99.25, 130.0, 131.0, 98.0, 132.5, 133.0]
    rows = [("p", _ts(1 + i), v) for i, v in enumerate(vals)]
    events = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    batch = {
        r["day"]: (r["cusum_up"], r["cusum_down"], r["shift_up"], r["shift_down"])
        for r in detect_level_shift(events, k_sigma=0.5, h_sigma=0.5).collect()
    }
    # the baseline the batch op computed internally, replayed exactly:
    # decimal day totals cast to double, the same IEEE moment shapes
    daily = [float(Decimal(repr(v)).quantize(Decimal("0.000001"))) for v in vals]
    n = len(daily)
    s, s2 = sum(daily), sum(v * v for v in daily)
    mean = s / n
    sd = math.sqrt((s2 - n * mean * mean) / (n - 1.0))

    day_rows = [
        ("rev", f"2024-03-{d:02d}", v) for d, v in enumerate(daily, start=1)
    ]
    df = spark.createDataFrame(day_rows, "series string, day string, value double")
    flat = tmp_path / "flat"
    flat.mkdir()
    early = df.filter(F.col("day") <= "2024-03-04")
    late = df.filter(F.col("day") > "2024-03-04")
    early.repartition(1).write.parquet(str(tmp_path / "a"))
    late.repartition(1).write.parquet(str(tmp_path / "b"))
    for i, (part, name) in enumerate(
        [(tmp_path / "a", "0early"), (tmp_path / "b", "1late")]
    ):
        for f in glob.glob(str(part / "*.parquet")):
            dest = flat / f"{name}.parquet"
            shutil.copy(f, dest)
            os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(flat))
    )
    out = stream_cusum(stream, mean, sd, k_sigma=0.5, h_sigma=0.5)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("cusum_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM cusum_stream").collect()
    finally:
        q.stop()
    streamed = {
        r["day"]: (r["cusum_up"], r["cusum_down"], r["shift_up"], r["shift_down"])
        for r in emitted
    }
    assert streamed == batch
    # the injected upward shift raised a streaming alarm
    assert any(v[2] == 1 for v in streamed.values())


def test_stream_cusum_batch_fallback_and_validation(spark):
    from intake_esm_spark.streaming.stateful import stream_cusum

    df = spark.createDataFrame(
        [("rev", "2024-03-01", 10.0), ("rev", "2024-03-02", 50.0)],
        "series string, day string, value double",
    )
    out = {r["day"]: r["cusum_up"] for r in stream_cusum(df, 10.0, 5.0).collect()}
    # day 1: drift = 10-10-2.5 = -2.5 -> S+ = 0 - min(0,-2.5)... P=-2.5,
    # min(0,P)=-2.5 -> cu = 0; day 2: P = -2.5+37.5 = 35 -> cu = 37.5
    assert out["2024-03-01"] == 0.0
    assert out["2024-03-02"] == 37.5
    with pytest.raises(ValueError):
        stream_cusum(df, 10.0, 0.0)


# ---------------------------------------------------------------------------
# rolling user features (eventlog, but shares the daily-grain contract)


def test_rolling_user_features_trailing_windows(spark):
    from intake_esm_spark.operators.eventlog import rolling_user_features

    rows = [
        (1, _ts(1), 10.0),
        (1, _ts(2), 20.0),
        (1, _ts(9), 5.0),   # day 9: day 1-2 outside the 7d window
        (2, _ts(1), 1.0),
        (None, _ts(1), 9.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    ).withColumn("event_id", F.monotonically_increasing_id())
    out = {
        (r["user_id"], r["day"]): r.asDict()
        for r in rolling_user_features(df, windows=[7, 30]).collect()
    }
    assert len(out) == 4  # active days only; null user excluded
    d2 = out[(1, "2024-03-02")]
    assert d2["n_events_7d"] == 2 and d2["value_7d"] == 30.0
    assert d2["days_active_7d"] == 2
    d9 = out[(1, "2024-03-09")]
    assert d9["n_events_7d"] == 1 and d9["value_7d"] == 5.0  # 1-2 aged out
    assert d9["n_events_30d"] == 3 and d9["value_30d"] == 35.0
    with pytest.raises(ValueError):
        rolling_user_features(df, windows=[])


def test_ewma_daily_matches_python_reference(spark):
    """Truncated EWMA replayed in pure python: partial-window rows
    normalize by the sum of AVAILABLE weights."""
    from intake_esm_spark.operators.timeseries import ewma_daily

    rows = [
        (f"2024-01-0{d} 10:00:00", v)
        for d, v in [(1, 10.0), (2, 20.0), (3, 15.0), (4, 40.0)]
    ]
    df = spark.createDataFrame(rows, "ts string, value double").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "value", "'purchase' AS event_type"
    )
    out = {r["day"]: r.asDict() for r in ewma_daily(df, alpha=0.5, lags=3).collect()}
    xs = [10.0, 20.0, 15.0, 40.0]
    ws = [0.5 * 0.5**k for k in range(3)]
    for t, day in enumerate(["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]):
        avail = [(ws[k], xs[t - k]) for k in range(3) if t - k >= 0]
        # identical summation order to the engine: 0.0-seeded, k ascending
        num = 0.0
        den = 0.0
        for wk, xv in avail:
            num += wk * xv
            den += wk
        assert out[day]["ewma"] == pytest.approx(num / den, abs=1e-6), day


def test_ewma_validation(spark):
    from intake_esm_spark.operators.timeseries import ewma_daily

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0)], "ts string, value double"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "value")
    with pytest.raises(ValueError):
        ewma_daily(df, alpha=0.0)
    with pytest.raises(ValueError):
        ewma_daily(df, lags=0)


def test_seasonal_naive_backtest_hand_example(spark):
    """10 days, season=3: forecasts start day 4; errors computed by
    hand for days 4..10 (both f and naive-1 defined)."""
    from intake_esm_spark.operators.timeseries import seasonal_naive_backtest

    xs = [10.0, 20.0, 30.0, 13.0, 26.0, 27.0, 13.0, 20.0, 33.0, 10.0]
    rows = [
        (f"2024-01-{d+1:02d} 10:00:00", xs[d]) for d in range(len(xs))
    ]
    df = spark.createDataFrame(rows, "ts string, value double").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    r = seasonal_naive_backtest(df, season=3).collect()[0].asDict()
    scored = [(xs[t], xs[t - 3], xs[t - 1]) for t in range(3, 10)]
    mae = sum(abs(x - f) for x, f, _ in scored) / len(scored)
    mae1 = sum(abs(x - n1) for x, _, n1 in scored) / len(scored)
    assert r["n_scored_days"] == 7
    assert r["mae"] == pytest.approx(mae, abs=1e-6)
    assert r["naive1_mae"] == pytest.approx(mae1, abs=1e-6)
    assert r["mase_vs_naive1"] == pytest.approx(mae / mae1, abs=1e-5)
    import math
    rmse = math.sqrt(sum((x - f) ** 2 for x, f, _ in scored) / len(scored))
    assert r["rmse"] == pytest.approx(rmse, abs=1e-6)


def test_seasonal_naive_validation(spark):
    from intake_esm_spark.operators.timeseries import seasonal_naive_backtest

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0)], "ts string, value double"
    ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "value")
    with pytest.raises(ValueError):
        seasonal_naive_backtest(df, season=0)


# ---------------------------------------------------------------------------
# Theil-Sen


def _ts_events(spark, day_values):
    import datetime

    rows = [
        (datetime.datetime(2024, 1, 1 + d, 12, 0, 0), float(v))
        for d, v in day_values
    ]
    return spark.createDataFrame(rows, "ts timestamp, value double")


def test_theil_sen_perfect_line(spark):
    from intake_esm_spark.operators.timeseries import theil_sen_trend

    df = _ts_events(spark, [(d, 10 * (d + 1)) for d in range(5)])
    r = theil_sen_trend(df).collect()[0]
    assert r["n_days"] == 5 and r["n_pairs"] == 10
    assert r["slope"] == 10.0


def test_theil_sen_resists_outlier_day(spark):
    from intake_esm_spark.operators.timeseries import theil_sen_trend

    df = _ts_events(spark, [(0, 10), (1, 20), (2, 30), (3, 40), (4, 1000)])
    r = theil_sen_trend(df).collect()[0]
    # 6 of 10 pairwise slopes are exactly 10 -> the median ignores the spike
    assert r["slope"] == 10.0


def test_theil_sen_single_day(spark):
    from intake_esm_spark.operators.timeseries import theil_sen_trend

    df = _ts_events(spark, [(0, 10)])
    r = theil_sen_trend(df).collect()[0]
    assert r["n_days"] == 1 and r["n_pairs"] == 0
    assert r["slope"] is None and r["intercept"] is None


# --- seasonal_decompose ------------------------------------------------------


def test_seasonal_decompose_pure_weekly_pattern(spark):
    """A constant-level series with an exact weekly pattern decomposes
    into flat trend = overall mean, mean-centered per-phase seasonal,
    and ZERO residual on every full-window day."""
    import datetime

    import pytest as _pt

    from intake_esm_spark.operators.timeseries import seasonal_decompose

    effects = [0.0, 10.0, -5.0, 3.0, -3.0, 7.0, -12.0]
    base = datetime.date(2024, 1, 1)
    epoch = datetime.date(1970, 1, 1)
    rows = []
    for d in range(21):
        day = base + datetime.timedelta(days=d)
        phase = (day - epoch).days % 7
        rows.append(
            (datetime.datetime.combine(day, datetime.time(12)),
             100.0 + effects[phase])
        )
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["day"]: r for r in seasonal_decompose(df).collect()}
    assert len(out) == 21
    mean_level = 100.0 + sum(effects) / 7.0
    full = [r for r in out.values() if r["trend"] is not None]
    assert len(full) == 21 - 6  # 3 edge days lost each side
    for r in full:
        assert r["trend"] == _pt.approx(mean_level, abs=1e-6)
        assert r["residual"] == _pt.approx(0.0, abs=1e-6)
        assert r["value"] == _pt.approx(
            r["trend"] + r["seasonal"] + r["residual"], abs=1e-6
        )
    # seasonal indexes are mean-centered
    seas = {r["seasonal"] for r in full}
    assert abs(sum(seas)) < 1e-6 and len(seas) == 7
    with _pt.raises(ValueError):
        seasonal_decompose(df, period=6)


def test_seasonal_decompose_gap_nulls_trend(spark):
    """A missing calendar day breaks every centered window that spans
    it — trend (and with it seasonal/residual) is null there instead of
    a silently-shrunken average."""
    import datetime

    from intake_esm_spark.operators.timeseries import seasonal_decompose

    base = datetime.date(2024, 1, 1)
    rows = [
        (datetime.datetime.combine(base + datetime.timedelta(days=d),
                                   datetime.time(12)), 100.0)
        for d in range(15) if d != 7
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {r["day"]: r for r in seasonal_decompose(df).collect()}
    assert "2024-01-08" not in out  # the gap day itself has no row
    # days 4..10 (0-indexed) have windows spanning the gap -> null trend
    for d in range(15):
        if d == 7:
            continue
        day = str(base + datetime.timedelta(days=d))
        near_gap = 4 <= d <= 10
        edge = d < 3 or d > 11
        if near_gap or edge:
            assert out[day]["trend"] is None, day
        else:
            assert out[day]["trend"] == 100.0, day
