"""Round-14 tests (second batch): Chow structural-break F, IV 2SLS
(just-identified), and Durbin-Watson serial-correlation diagnostic —
each checked against a first-principles numpy reference on the same
6dp-quantized inputs, plus the guard paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F  # noqa: F401


# ---- Chow structural-break test -------------------------------------------


@pytest.fixture(scope="module")
def chow_frame(spark):
    """Two regimes with genuinely different slopes (a real break)."""
    rng = np.random.RandomState(141)
    n = 150
    x1 = np.round(rng.uniform(0, 10, 2 * n), 4)
    x2 = np.round(rng.normal(0, 2, 2 * n), 4)
    eps = np.round(rng.normal(0, 1, 2 * n), 4)
    ya = 1.0 + 2.0 * x1[:n] - 0.5 * x2[:n] + eps[:n]
    yb = 4.0 - 1.0 * x1[n:] + 1.5 * x2[n:] + eps[n:]
    y = np.round(np.concatenate([ya, yb]), 4)
    g = np.array(["a"] * n + ["b"] * n)
    df = spark.createDataFrame(
        list(zip(map(float, y), map(float, x1), map(float, x2), g)),
        "y double, x1 double, x2 double, g string",
    )
    return df, y, x1, x2, g


def _sse(y, X):
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    r = y - X @ beta
    return float(r @ r)


def test_chow_matches_first_principles(spark, chow_frame):
    from intake_esm_spark.operators.regression import chow_test_report

    df, y, x1, x2, g = chow_frame
    row = chow_test_report(df, "y", ["x1", "x2"], "g").collect()[0]
    X = np.column_stack([np.ones_like(y), x1, x2])
    sse_a = _sse(y[g == "a"], X[g == "a"])
    sse_b = _sse(y[g == "b"], X[g == "b"])
    sse_p = _sse(y, X)
    k1 = 3
    n = len(y)
    f_ref = ((sse_p - sse_a - sse_b) / k1) / (
        (sse_a + sse_b) / (n - 2 * k1)
    )
    assert row["grp_a"] == "a" and row["grp_b"] == "b"
    assert row["n_a"] == row["n_b"] == n // 2
    assert row["df_num"] == k1 and row["df_den"] == n - 2 * k1
    assert row["sse_pooled"] == pytest.approx(sse_p, rel=1e-6)
    assert row["sse_within"] == pytest.approx(sse_a + sse_b, rel=1e-6)
    assert row["f_stat"] == pytest.approx(f_ref, rel=1e-5)
    # a genuine break must be loudly significant at n=300
    assert row["f_stat"] > 50


def test_chow_no_break_is_small(spark):
    """Same data-generating process in both regimes -> modest F."""
    from intake_esm_spark.operators.regression import chow_test_report

    rng = np.random.RandomState(142)
    x = np.round(rng.uniform(0, 10, 400), 4)
    y = np.round(3.0 + 1.5 * x + rng.normal(0, 1, 400), 4)
    g = np.where(np.arange(400) % 2 == 0, "pre", "post")
    df = spark.createDataFrame(
        list(zip(map(float, y), map(float, x), g)),
        "y double, x double, g string",
    )
    row = chow_test_report(df, "y", ["x"], "g").collect()[0]
    assert row["f_stat"] < 5


def test_chow_guards(spark, chow_frame):
    from intake_esm_spark.operators.regression import chow_test_report

    df, *_ = chow_frame
    with pytest.raises(ValueError, match="at least one feature"):
        chow_test_report(df, "y", [], "g")
    # three regimes -> the lazy in-plan guard fires at action time
    df3 = df.withColumn(
        "g3",
        F.when(F.col("x1") < 3, "lo")
        .when(F.col("x1") < 7, "mid")
        .otherwise("hi"),
    )
    with pytest.raises(Exception, match="exactly TWO"):
        chow_test_report(df3, "y", ["x1"], "g3").collect()
    # a segment too small to fit raises with the segment tag
    tiny = spark.createDataFrame(
        [(1.0, 1.0, "a"), (2.0, 2.0, "a"), (3.0, 3.0, "a"),
         (4.0, 4.0, "a"), (1.0, 1.0, "b"), (2.0, 2.0, "b")],
        "y double, x double, g string",
    )
    with pytest.raises(ValueError, match="segment 'b'"):
        chow_test_report(tiny, "y", ["x"], "g")


# ---- IV two-stage least squares -------------------------------------------


@pytest.fixture(scope="module")
def iv_frame(spark):
    """Classic endogeneity: x = 0.8 z + v, y = 1 + 2 x + u with
    corr(u, v) > 0 — OLS is biased upward, IV recovers beta = 2."""
    rng = np.random.RandomState(143)
    n = 600
    z = np.round(rng.normal(0, 1, n), 4)
    v = rng.normal(0, 1, n)
    u = np.round(0.8 * v + 0.6 * rng.normal(0, 1, n), 4)
    x = np.round(0.8 * z + v, 4)
    y = np.round(1.0 + 2.0 * x + u, 4)
    df = spark.createDataFrame(
        list(zip(map(float, y), map(float, x), map(float, z))),
        "y double, x double, z double",
    )
    return df, y, x, z


def test_iv_matches_first_principles(spark, iv_frame):
    from intake_esm_spark.operators.regression import iv2sls_report

    df, y, x, z = iv_frame
    rows = {
        r["term"]: r
        for r in iv2sls_report(df, "y", ["x"], ["z"]).collect()
    }
    n = len(y)
    X = np.column_stack([np.ones(n), x])
    Z = np.column_stack([np.ones(n), z])
    beta = np.linalg.solve(Z.T @ X, Z.T @ y)
    e = y - X @ beta
    sigma2 = float(e @ e) / (n - 2)
    inv_zx = np.linalg.inv(Z.T @ X)
    cov = sigma2 * inv_zx @ (Z.T @ Z) @ inv_zx.T
    assert rows["_intercept"]["coef"] == pytest.approx(beta[0], abs=1e-5)
    assert rows["x"]["coef"] == pytest.approx(beta[1], abs=1e-5)
    assert rows["x"]["std_err"] == pytest.approx(
        np.sqrt(cov[1, 1]), abs=1e-5
    )
    assert rows["_intercept"]["std_err"] == pytest.approx(
        np.sqrt(cov[0, 0]), abs=1e-5
    )


def test_iv_beats_ols_on_endogeneity(spark, iv_frame):
    """OLS slope is biased away from 2; IV lands near it."""
    from intake_esm_spark.operators.regression import (
        iv2sls_report,
        ols_report,
    )

    df, *_ = iv_frame
    iv = {
        r["term"]: r["coef"]
        for r in iv2sls_report(df, "y", ["x"], ["z"]).collect()
    }
    ols = {
        r["term"]: r["coef"]
        for r in ols_report(df, "y", ["x"]).collect()
    }
    assert abs(iv["x"] - 2.0) < 0.15
    assert ols["x"] - 2.0 > 0.2  # upward endogeneity bias visible


def test_iv_exogenous_self_instrument(spark, iv_frame):
    """A regressor instrumenting itself reproduces OLS coefficients
    (the just-identified identity) — run with (x, z) where z
    self-instruments."""
    from intake_esm_spark.operators.regression import (
        iv2sls_report,
        ols_report,
    )

    df, *_ = iv_frame
    iv = {
        r["term"]: r["coef"]
        for r in iv2sls_report(df, "y", ["z"], ["z"]).collect()
    }
    ols = {
        r["term"]: r["coef"]
        for r in ols_report(df, "y", ["z"]).collect()
    }
    assert iv["z"] == pytest.approx(ols["z"], abs=2e-6)


def test_iv_guards(spark, iv_frame):
    from intake_esm_spark.operators.regression import iv2sls_report

    df, *_ = iv_frame
    with pytest.raises(ValueError, match="len\\(z_cols\\) == len\\(x_cols\\)"):
        iv2sls_report(df, "y", ["x"], [])
    with pytest.raises(ValueError, match="len\\(z_cols\\) == len\\(x_cols\\)"):
        iv2sls_report(df, "y", ["x"], ["z", "x"])
    # an instrument uncorrelated by construction (a constant) is
    # singular in Z'X -> the weak-instrument guard fires
    dfc = df.withColumn("zc", F.lit(1.0))
    with pytest.raises(ValueError, match="weak or singular"):
        iv2sls_report(dfc, "y", ["x"], ["zc"])


# ---- Durbin-Watson --------------------------------------------------------


@pytest.fixture(scope="module")
def dw_frame(spark):
    """AR(1) errors rho=0.7 over an explicit sequence order."""
    rng = np.random.RandomState(144)
    n = 400
    x = np.round(rng.uniform(0, 5, n), 4)
    e = np.zeros(n)
    for t in range(1, n):
        e[t] = 0.7 * e[t - 1] + rng.normal(0, 1)
    y = np.round(2.0 + 1.2 * x + e, 4)
    order = np.arange(n, dtype=float)
    df = spark.createDataFrame(
        list(zip(map(float, y), map(float, x), map(float, order))),
        "y double, x double, t double",
    )
    return df, y, x, order


def _dw_ref(y, x, order):
    """First-principles DW replaying the operator's quantization: fit
    via the 6dp-rounded normal equations, 6dp beta, 6dp residuals."""
    X = np.column_stack([np.ones_like(y), np.round(x, 6)])
    yq = np.round(y, 6)
    beta = np.round(np.linalg.lstsq(X, yq, rcond=None)[0], 6)
    e = np.round(yq - (beta[0] + beta[1] * np.round(x, 6)), 6)
    e = e[np.argsort(order, kind="stable")]
    num = float(np.sum(np.diff(e) ** 2))
    den = float(e @ e)
    return num / den, float(e[1:] @ e[:-1]) / den


def test_dw_matches_first_principles(spark, dw_frame):
    from intake_esm_spark.operators.regression import durbin_watson_report

    df, y, x, order = dw_frame
    row = durbin_watson_report(df, "y", ["x"], "t", []).collect()[0]
    dw_ref, rho_ref = _dw_ref(y, x, order)
    assert row["n_rows"] == len(y)
    assert row["dw_stat"] == pytest.approx(dw_ref, abs=1e-4)
    assert row["rho1"] == pytest.approx(rho_ref, abs=1e-4)
    # AR(1) rho=0.7 -> DW far below 2
    assert row["dw_stat"] < 1.0 and row["rho1"] > 0.4


def test_dw_independent_errors_near_two(spark):
    from intake_esm_spark.operators.regression import durbin_watson_report

    rng = np.random.RandomState(145)
    n = 500
    x = np.round(rng.uniform(0, 5, n), 4)
    y = np.round(1.0 + 0.5 * x + rng.normal(0, 1, n), 4)
    df = spark.createDataFrame(
        list(
            zip(map(float, y), map(float, x), map(float, np.arange(n)))
        ),
        "y double, x double, t double",
    )
    row = durbin_watson_report(df, "y", ["x"], "t", []).collect()[0]
    assert 1.7 < row["dw_stat"] < 2.3
    assert abs(row["rho1"]) < 0.15


def test_dw_perfect_fit_null_stats(spark):
    """Zero residual energy -> dw/rho are null, not a divide-by-zero."""
    from intake_esm_spark.operators.regression import durbin_watson_report

    rows = [(float(2 * i + 1), float(i), float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "y double, x double, t double")
    row = durbin_watson_report(df, "y", ["x"], "t", []).collect()[0]
    assert row["dw_stat"] is None and row["rho1"] is None


# ---- streaming twin #27: IV moments ---------------------------------------


def test_stream_iv_moments_matches_batch(spark, tmp_path):
    """Two micro-batches: the LAST update row of the streaming widened
    (1, x, z, y) moment aggregation, tailed into the SAME
    iv_solve_from_moments, equals the whole-corpus batch iv2sls_report
    bit-for-bit (additive exact decimals — the twin #25/#26 parity
    argument verbatim)."""
    import glob
    import shutil

    from intake_esm_spark.operators.regression import (
        iv2sls_report,
        iv_solve_from_moments,
    )
    from intake_esm_spark.streaming.stateful import stream_iv_moments

    rng = np.random.RandomState(27)
    n = 200
    z = rng.normal(0, 1, n).round(4)
    v = rng.normal(0, 1, n)
    u = (0.7 * v + 0.5 * rng.normal(0, 1, n)).round(4)
    x = (0.8 * z + v).round(4)
    y = (1.0 + 2.0 * x + u).round(4)
    df = spark.createDataFrame(
        list(zip(map(float, y), map(float, x), map(float, z))),
        "y double, x double, z double",
    )
    batch = {
        r["term"]: r
        for r in iv2sls_report(df, "y", ["x"], ["z"]).collect()
    }

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.crc32(F.col("y").cast("string")) % 2 == 0).coalesce(
        1
    ).write.parquet(str(tmp_path / "a"))
    df.filter(F.crc32(F.col("y").cast("string")) % 2 == 1).coalesce(
        1
    ).write.parquet(str(tmp_path / "b"))
    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "[ab]" / "*.parquet")))
    ):
        shutil.copy(f, src / f"part{i}.parquet")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    out = stream_iv_moments(stream, "y", ["x"], ["z"])
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("iv_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM iv_stream").collect()
    finally:
        q.stop()
    assert len(emitted) >= 2
    sol = iv_solve_from_moments(emitted[-1].asDict(), ["x"], ["z"])
    for i, t in enumerate(["_intercept", "x"]):
        assert sol["coef"][i] == batch[t]["coef"], t
        assert sol["std_err"][i] == batch[t]["std_err"], t
        assert sol["t_stat"][i] == batch[t]["t_stat"], t
