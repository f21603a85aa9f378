"""Round-14 time-series diagnostics: PACF (Durbin-Levinson), Ljung-Box
portmanteau, and the ADF unit-root regression — first-principles numpy
references over the same quantized daily series, plus guards."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401


def _mk_events(spark, series, start="2024-01-01"):
    """One event per day with value = series[t] (daily rollup is then
    exactly the series, 6dp)."""
    d0 = dt.date.fromisoformat(start)
    rows = [
        (dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time(12)),
         float(v))
        for i, v in enumerate(series)
    ]
    return spark.createDataFrame(rows, "ts timestamp, value double")


def _std_acf(x, max_lag):
    """Standard single-mean total-SS autocorrelations at 6dp-rounded
    centered values (replays the operator's quantization)."""
    xq = np.round(x, 6)
    mean = round(float(xq.sum()) / len(xq), 6)
    c = np.round(xq - mean, 6)
    ss = float(np.sum(np.round(c * c, 12)))
    return {
        k: float(np.sum(np.round(c[:-k] * c[k:], 12))) / ss
        for k in range(1, max_lag + 1)
    }


@pytest.fixture(scope="module")
def ar1_series():
    rng = np.random.RandomState(146)
    n = 200
    x = np.zeros(n)
    for t in range(1, n):
        x[t] = 0.6 * x[t - 1] + rng.normal(0, 1)
    return np.round(x + 10.0, 4)


def test_pacf_matches_first_principles(spark, ar1_series):
    from intake_esm_spark.operators.timeseries import (
        durbin_levinson_pacf,
        pacf_report,
    )

    df = _mk_events(spark, ar1_series)
    rows = {r["lag"]: r for r in pacf_report(df, max_lag=6).collect()}
    rho = _std_acf(ar1_series, 6)
    pac = durbin_levinson_pacf(rho)
    for k in range(1, 7):
        assert rows[k]["acf"] == pytest.approx(rho[k], abs=2e-6), k
        assert rows[k]["pacf"] == pytest.approx(pac[k], abs=2e-6), k
    # AR(1) signature: pacf cuts off after lag 1
    assert rows[1]["pacf"] == pytest.approx(0.6, abs=0.15)
    assert all(abs(rows[k]["pacf"]) < 0.2 for k in range(2, 7))


def test_pacf_lag1_equals_acf1_and_ar2_reference(spark):
    """Order-2 Yule-Walker closed form: pacf2 = (rho2 - rho1^2) /
    (1 - rho1^2)."""
    from intake_esm_spark.operators.timeseries import pacf_report

    rng = np.random.RandomState(147)
    x = np.round(np.cumsum(rng.normal(0, 1, 120)) + 50, 4)
    df = _mk_events(spark, x)
    rows = {r["lag"]: r for r in pacf_report(df, max_lag=2).collect()}
    rho = _std_acf(x, 2)
    assert rows[1]["pacf"] == pytest.approx(rho[1], abs=2e-6)
    ref2 = (rho[2] - rho[1] ** 2) / (1 - rho[1] ** 2)
    assert rows[2]["pacf"] == pytest.approx(ref2, abs=2e-6)


def test_ljung_box_matches_first_principles(spark, ar1_series):
    from intake_esm_spark.operators.timeseries import ljung_box_report

    df = _mk_events(spark, ar1_series)
    rows = {
        r["lag"]: r for r in ljung_box_report(df, max_lag=5).collect()
    }
    rho = _std_acf(ar1_series, 5)
    n = len(ar1_series)
    q = 0.0
    for k in range(1, 6):
        q += rho[k] ** 2 / (n - k)
        assert rows[k]["q_stat"] == pytest.approx(
            n * (n + 2) * q, abs=1e-4
        ), k
        assert rows[k]["dof"] == k
    # AR(1) at n=200 is loudly non-white
    assert rows[5]["q_stat"] > 50


def test_ljung_box_white_noise_small(spark):
    from intake_esm_spark.operators.timeseries import ljung_box_report

    rng = np.random.RandomState(148)
    x = np.round(rng.normal(100, 5, 300), 4)
    df = _mk_events(spark, x)
    rows = ljung_box_report(df, max_lag=5).collect()
    # chi2(5) 99th percentile is 15.1 — white noise stays below
    assert max(r["q_stat"] for r in rows) < 15.1


def test_sidecar_guards(spark):
    from intake_esm_spark.operators.timeseries import pacf_report

    df = _mk_events(spark, [1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="max_lag \\+ 2"):
        pacf_report(df, max_lag=5)
    with pytest.raises(ValueError, match="max_lag must be >= 1"):
        pacf_report(df, max_lag=0)


def test_adf_matches_first_principles(spark, ar1_series):
    """Replay the ADF regression with numpy lstsq on the same
    quantized frame: dy_t ~ 1 + y_{t-1} + dy_{t-1}."""
    from intake_esm_spark.operators.timeseries import adf_report

    df = _mk_events(spark, ar1_series)
    row = adf_report(df, lag_order=1).collect()[0]
    x = np.round(ar1_series, 6)
    dy = np.round(x[1:] - x[:-1], 6)
    # rows t = 2..n-1: dy[t], y1 = x[t-1], dy1 = dy[t-1]
    yv = dy[1:]
    y1 = x[1:-1]
    dy1 = dy[:-1]
    X = np.column_stack([np.ones_like(yv), y1, dy1])
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    e = yv - X @ beta
    sigma2 = float(e @ e) / (len(yv) - 3)
    cov = sigma2 * np.linalg.inv(X.T @ X)
    assert row["n_obs"] == len(yv)
    assert row["gamma"] == pytest.approx(beta[1], abs=1e-5)
    assert row["alpha"] == pytest.approx(beta[0], abs=1e-4)
    assert row["tau"] == pytest.approx(
        beta[1] / np.sqrt(cov[1, 1]), abs=1e-4
    )
    # stationary AR(1): tau far below the -2.86 critical value
    assert row["tau"] < -2.86


def test_adf_random_walk_not_rejected(spark):
    from intake_esm_spark.operators.timeseries import adf_report

    rng = np.random.RandomState(149)
    x = np.round(np.cumsum(rng.normal(0, 1, 250)) + 100, 4)
    df = _mk_events(spark, x)
    row = adf_report(df, lag_order=1).collect()[0]
    assert row["tau"] > -2.86  # unit root not rejected


def test_adf_lag0_and_guard(spark, ar1_series):
    from intake_esm_spark.operators.timeseries import adf_report

    df = _mk_events(spark, ar1_series)
    row = adf_report(df, lag_order=0).collect()[0]
    assert row["lag_order"] == 0
    assert row["n_obs"] == len(ar1_series) - 1
    with pytest.raises(ValueError, match="lag_order must be >= 0"):
        adf_report(df, lag_order=-1)


def test_adf_calendar_gap_drops_rows(spark, ar1_series):
    """Removing one interior day must drop exactly the rows whose
    terms straddle the gap (complete-case), not fabricate zeros."""
    from intake_esm_spark.operators.timeseries import adf_report

    df = _mk_events(spark, ar1_series)
    gapped = df.filter(
        F.to_date("ts") != F.lit("2024-02-01").cast("date")
    )
    full = adf_report(df, lag_order=1).collect()[0]
    gap = adf_report(gapped, lag_order=1).collect()[0]
    # terms span 3 consecutive days -> a 1-day hole kills 3 rows
    assert full["n_obs"] - gap["n_obs"] == 3


def test_adf_scale_conditioning(spark, ar1_series):
    """scale= rescales the daily series before quantization (the
    cond-guard fix for total-valued series): gamma is unit-free, alpha
    scales with the series, tau is scale-free — and a series whose
    raw magnitude blows cond(X'X) past the shared 1e12 guard fits
    cleanly once its natural unit is passed."""
    from intake_esm_spark.operators.timeseries import adf_report

    df = _mk_events(spark, ar1_series)
    raw = adf_report(df, lag_order=1).collect()[0]
    sc = adf_report(df, lag_order=1, scale=1e-2).collect()[0]
    assert sc["n_obs"] == raw["n_obs"]
    assert sc["gamma"] == pytest.approx(raw["gamma"], abs=1e-3)
    assert sc["alpha"] == pytest.approx(raw["alpha"] * 1e-2, abs=1e-4)
    assert sc["tau"] == pytest.approx(raw["tau"], abs=1e-2)

    # level-1e6 AR(1) (the daily-revenue shape): raw cond 1.5e14 blows
    # the shared solver guard, the thousands unit fits at cond 1.5e8
    rng = np.random.RandomState(147)
    n = 220
    ar = np.zeros(n)
    for t in range(1, n):
        ar[t] = 0.5 * ar[t - 1] + rng.normal(0, 1)
    big = np.round(1.0e6 * (1.0 + 0.25 * ar / 3.0), 4)
    bdf = _mk_events(spark, big)
    with pytest.raises(ValueError, match="ill-conditioned"):
        adf_report(bdf, lag_order=1)
    row = adf_report(bdf, lag_order=1, scale=1e-3).collect()[0]
    assert row["n_obs"] == n - 2
    # stationary AR(1) around the level: tau rejects the unit root
    assert row["tau"] < -2.86
