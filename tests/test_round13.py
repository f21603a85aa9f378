"""Round-13 tests: ridge on the OLS moments, grouped OLS, the
Arrow-GEMM fast PCA path (`pca_project(exact=False)`), streaming twin
#25 (the OLS moment pass), and the three r13 ADVICE fixes (actual
n_iter echo, strict 0/1 label domain incl. n_iter=0, the
anderson-darling degenerate-branch schema pin)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def reg_frame(spark):
    rng = np.random.RandomState(13)
    n = 300
    x1 = rng.normal(5, 2, n).round(4)
    x2 = rng.normal(-1, 3, n).round(4)
    g = np.array(["a", "b", "c"])[np.arange(n) % 3]
    slope = {"a": 1.2, "b": -0.4, "c": 2.0}
    y = np.round(
        2.5
        + np.vectorize(slope.get)(g) * x1
        - 0.7 * x2
        + rng.normal(0, 1.5, n),
        4,
    )
    df = spark.createDataFrame(
        list(zip(map(str, g), map(float, y), map(float, x1), map(float, x2))),
        "g string, y double, x1 double, x2 double",
    )
    return df, g, y, x1, x2


def _ridge_ref(y, x1, x2, lam):
    """First-principles ridge reference on 6dp-quantized values:
    intercept unpenalized (the augmented normal equations — identical
    to sklearn Ridge(alpha, fit_intercept=True))."""
    X = np.column_stack([np.ones(len(y)), np.round(x1, 6), np.round(x2, 6)])
    yq = np.round(y, 6)
    xtx = X.T @ X
    pen = xtx + np.diag([0.0, lam, lam])
    beta = np.linalg.solve(pen, X.T @ yq)
    resid = yq - X @ beta
    sse = float(resid @ resid)
    sigma2 = sse / (len(y) - 3)
    inv_a = np.linalg.inv(pen)
    covb = sigma2 * inv_a @ xtx @ inv_a
    return beta, np.sqrt(np.diag(covb)), sse


def test_ridge_matches_numpy_closed_form(spark, reg_frame):
    from intake_esm_spark.operators.regression import ols_report

    df, g, y, x1, x2 = reg_frame
    lam = 250.0  # large enough that shrinkage is visible at 6dp
    got = {
        r["term"]: r
        for r in ols_report(df, "y", ["x1", "x2"], l2=lam).collect()
    }
    beta, se, _ = _ridge_ref(y, x1, x2, lam)
    ols = {
        r["term"]: r for r in ols_report(df, "y", ["x1", "x2"]).collect()
    }
    for i, t in enumerate(["_intercept", "x1", "x2"]):
        assert got[t]["coef"] == pytest.approx(beta[i], abs=1e-5), t
        assert got[t]["std_err"] == pytest.approx(se[i], abs=1e-5), t
    # shrinkage direction: penalized slopes move toward zero
    for t in ("x1", "x2"):
        assert abs(got[t]["coef"]) < abs(ols[t]["coef"])
    with pytest.raises(ValueError, match="l2 penalty"):
        ols_report(df, "y", ["x1"], l2=-1.0)


def test_ridge_turns_collinear_raise_into_fit(spark, reg_frame):
    """The r12 verdict's stated purpose: a design that raises at l2=0
    (duplicated feature) becomes a usable fit at l2>0, with the two
    collinear slopes sharing the weight (the ridge symmetry
    property)."""
    from intake_esm_spark.operators.regression import ols_report

    df, *_ = reg_frame
    dup = df.withColumn("x3", F.col("x1"))
    with pytest.raises(ValueError, match="singular"):
        ols_report(dup, "y", ["x1", "x3"])
    got = {
        r["term"]: r
        for r in ols_report(dup, "y", ["x1", "x3"], l2=10.0).collect()
    }
    # exact duplicates split the coefficient symmetrically under ridge
    assert got["x1"]["coef"] == pytest.approx(got["x3"]["coef"], abs=1e-6)


def test_ridge_fit_report_uses_actual_residuals(spark, reg_frame):
    from intake_esm_spark.operators.regression import ols_fit_report

    df, g, y, x1, x2 = reg_frame
    lam = 250.0
    fit = ols_fit_report(df, "y", ["x1", "x2"], l2=lam).collect()[0]
    _, _, sse = _ridge_ref(y, x1, x2, lam)
    n = len(y)
    assert fit["rmse"] == pytest.approx(np.sqrt(sse / n), abs=1e-5)
    yq = np.round(y, 6)
    sst = float((yq - yq.mean()) @ (yq - yq.mean()))
    assert fit["r2"] == pytest.approx(1 - sse / sst, abs=1e-5)


def test_ols_by_group_matches_per_group_numpy(spark, reg_frame):
    from intake_esm_spark.operators.regression import ols_by_group

    df, g, y, x1, x2 = reg_frame
    rows = ols_by_group(df, "y", ["x1", "x2"], "g").collect()
    got = {(r["grp"], r["term"]): r for r in rows}
    assert len(rows) == 9  # 3 groups x 3 terms
    for grp in ("a", "b", "c"):
        m = g == grp
        X = np.column_stack(
            [np.ones(m.sum()), np.round(x1[m], 6), np.round(x2[m], 6)]
        )
        yq = np.round(y[m], 6)
        beta, *_ = np.linalg.lstsq(X, yq, rcond=None)
        resid = yq - X @ beta
        sigma2 = float(resid @ resid) / (m.sum() - 3)
        se = np.sqrt(sigma2 * np.diag(np.linalg.inv(X.T @ X)))
        for i, t in enumerate(["_intercept", "x1", "x2"]):
            r = got[(grp, t)]
            assert r["coef"] == pytest.approx(beta[i], abs=1e-5), (grp, t)
            assert r["std_err"] == pytest.approx(se[i], abs=1e-5), (grp, t)
            assert r["n_rows"] == int(m.sum())


def test_ols_by_group_skips_degenerate_groups(spark, reg_frame):
    """A group too small to fit (n <= p+1) is omitted; the healthy
    groups still come back — one bad segment must not kill the job."""
    from intake_esm_spark.operators.regression import ols_by_group

    df, *_ = reg_frame
    tiny = spark.createDataFrame(
        [("z", 1.0, 1.0, 2.0), ("z", 2.0, 2.0, 1.0)],
        "g string, y double, x1 double, x2 double",
    )
    rows = ols_by_group(df.unionByName(tiny), "y", ["x1", "x2"], "g").collect()
    grps = {r["grp"] for r in rows}
    assert grps == {"a", "b", "c"}  # z omitted, not fatal


def test_ols_by_group_max_groups_guard(spark, reg_frame):
    from intake_esm_spark.operators.regression import ols_by_group

    df, *_ = reg_frame
    with pytest.raises(Exception, match="more than 2 groups"):
        ols_by_group(df, "y", ["x1", "x2"], "g", max_groups=2)


def test_ols_by_group_null_groups_excluded(spark, reg_frame):
    from intake_esm_spark.operators.regression import ols_by_group

    df, *_ = reg_frame
    withnull = df.withColumn(
        "g", F.when(F.col("g") == "c", F.lit(None)).otherwise(F.col("g"))
    )
    rows = ols_by_group(withnull, "y", ["x1", "x2"], "g").collect()
    assert {r["grp"] for r in rows} == {"a", "b"}


# ---- r13 ADVICE fixes -------------------------------------------------


def test_logistic_fit_report_echoes_actual_n_iter(spark):
    from intake_esm_spark.operators.regression import logistic_fit_report

    rng = np.random.RandomState(7)
    n = 120
    x = rng.normal(0, 1, n).round(4)
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-x))).astype(int)
    df = spark.createDataFrame(
        list(zip(map(int, y), map(float, x))), "y int, x double"
    )
    fit = logistic_fit_report(df, "y", ["x"], n_iter=4).collect()[0]
    assert fit["n_iter"] == 4  # r13 ADVICE: echo the real pass count


def test_logistic_label_domain_strict_01(spark):
    """y=0.5 lies in [0,1] but violates the 0/1 contract — must raise
    (r13 ADVICE), including at n_iter=0 where the old guard never
    ran."""
    from intake_esm_spark.operators.regression import logistic_report

    df = spark.createDataFrame(
        [(0.5, 1.0), (0.0, 2.0), (1.0, 3.0), (0.0, 4.0), (1.0, 5.0)],
        "y double, x double",
    )
    with pytest.raises(ValueError, match="label must be 0/1"):
        logistic_report(df, "y", ["x"])
    with pytest.raises(ValueError, match="label must be 0/1"):
        logistic_report(df, "y", ["x"], n_iter=0)


def test_logistic_n_iter_zero_emits_null_model(spark):
    """n_iter=0 is the null model (beta=0): legal, validated, and the
    report comes from the single final pass."""
    from intake_esm_spark.operators.regression import logistic_fit_report

    df = spark.createDataFrame(
        [(i % 2, float(i)) for i in range(40)], "y int, x double"
    )
    fit = logistic_fit_report(df, "y", ["x"], n_iter=0).collect()[0]
    assert fit["n_iter"] == 0
    # null model log-loss at mu=0.5 is exactly ln 2
    assert fit["log_loss"] == pytest.approx(np.log(2), abs=1e-6)


def test_anderson_degenerate_branch_schema_matches_main(spark):
    """The early-return (N<4 / k<2 / single value) must emit the SAME
    schema as the main path (r13 ADVICE: n_groups was bigint on one
    branch, int on the other)."""
    from intake_esm_spark.operators.groupstats import (
        anderson_darling_ksample,
    )

    tiny = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("a", 1.0)], "g string, v double"
    )
    full = spark.createDataFrame(
        [("a", float(i)) for i in range(9)]
        + [("b", float(i) + 0.5) for i in range(9)],
        "g string, v double",
    )
    s_deg = anderson_darling_ksample(tiny, "v", "g").schema
    s_main = anderson_darling_ksample(full, "v", "g").schema
    assert [(f.name, f.dataType) for f in s_deg] == [
        (f.name, f.dataType) for f in s_main
    ]


# ---- fast PCA path ----------------------------------------------------


@pytest.fixture(scope="module")
def vec_frame(spark):
    rng = np.random.RandomState(5)
    n, d = 400, 12
    # strong planted structure: two dominant directions with a healthy
    # eigengap, so the loading perturbation bound is tight
    basis = np.linalg.qr(rng.normal(size=(d, d)))[0]
    scales = np.array([10.0, 6.0] + [0.5] * (d - 2))
    X = (rng.normal(size=(n, d)) * scales) @ basis.T
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )


def test_pca_fast_matches_exact_bounded(spark, vec_frame):
    """pca_project(exact=False) — covariance AND means from ONE
    Arrow-GEMM scan — agrees with the exact decimal path to within the
    6dp-grid/eigengap perturbation bound on every projected row."""
    from intake_esm_spark.operators.matrix import pca_project

    exact = {
        r["vec_id"]: (r["pc_1"], r["pc_2"])
        for r in pca_project(vec_frame, k=2).collect()
    }
    fast = {
        r["vec_id"]: (r["pc_1"], r["pc_2"])
        for r in pca_project(vec_frame, k=2, exact=False).collect()
    }
    assert set(exact) == set(fast)
    worst = max(
        abs(a - b)
        for k2 in exact
        for a, b in zip(exact[k2], fast[k2])
    )
    assert worst <= 1e-3, worst


def test_pca_fast_whiten_matches_exact_bounded(spark, vec_frame):
    from intake_esm_spark.operators.matrix import pca_project

    exact = {
        r["vec_id"]: (r["pc_1"], r["pc_2"])
        for r in pca_project(vec_frame, k=2, whiten=True).collect()
    }
    fast = {
        r["vec_id"]: (r["pc_1"], r["pc_2"])
        for r in pca_project(
            vec_frame, k=2, whiten=True, exact=False
        ).collect()
    }
    # whitened scale is ~unit, so the same absolute bound applies
    worst = max(
        abs(a - b)
        for k2 in exact
        for a, b in zip(exact[k2], fast[k2])
    )
    assert worst <= 1e-3, worst


def test_pca_fast_guards_match_exact(spark, vec_frame):
    from intake_esm_spark.operators.matrix import pca_project

    with pytest.raises(ValueError, match="exceeds vector dimension"):
        pca_project(vec_frame, k=13, exact=False)
    one = vec_frame.limit(1)
    with pytest.raises(ValueError, match=">= 2 vectors"):
        pca_project(one, k=2, exact=False)


# ---- streaming twin #25 ------------------------------------------------


def test_stream_ols_moments_matches_batch(spark, tmp_path):
    """Two micro-batches: the LAST update row of the streaming moment
    aggregation, tailed into the SAME ols_solve_from_moments, equals
    the whole-corpus batch ols_report bit-for-bit (additive exact
    decimals — the ANOVA-twin parity argument verbatim)."""
    import glob
    import shutil

    from intake_esm_spark.operators.regression import (
        ols_report,
        ols_solve_from_moments,
    )
    from intake_esm_spark.streaming.stateful import stream_ols_moments

    rng = np.random.RandomState(17)
    n = 200
    x1 = rng.normal(2, 1, n).round(4)
    x2 = rng.normal(0, 2, n).round(4)
    y = (1.0 + 0.8 * x1 - 0.3 * x2 + rng.normal(0, 1, n)).round(4)
    df = spark.createDataFrame(
        list(zip(map(float, y), map(float, x1), map(float, x2))),
        "y double, x1 double, x2 double",
    )
    batch = {
        r["term"]: r for r in ols_report(df, "y", ["x1", "x2"]).collect()
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
    out = stream_ols_moments(stream, "y", ["x1", "x2"])
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ols_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM ols_stream").collect()
    finally:
        q.stop()
    assert len(emitted) >= 2  # one update per micro-batch
    sol = ols_solve_from_moments(emitted[-1].asDict(), ["x1", "x2"])
    for i, t in enumerate(["_intercept", "x1", "x2"]):
        assert sol["coef"][i] == batch[t]["coef"], t
        assert sol["std_err"][i] == batch[t]["std_err"], t
        assert sol["t_stat"][i] == batch[t]["t_stat"], t


# ---- WLS / Breusch-Pagan / predict ------------------------------------


def test_wls_matches_numpy_weighted_solve(spark, reg_frame):
    from intake_esm_spark.operators.regression import wls_report

    df, g, y, x1, x2 = reg_frame
    w = np.abs(x1) + 1.0  # positive weights
    dfw = spark.createDataFrame(
        list(
            zip(
                map(float, y),
                map(float, x1),
                map(float, x2),
                map(float, w),
            )
        ),
        "y double, x1 double, x2 double, w double",
    )
    got = {
        r["term"]: r
        for r in wls_report(dfw, "y", ["x1", "x2"], "w").collect()
    }
    X = np.column_stack([np.ones(len(y)), np.round(x1, 6), np.round(x2, 6)])
    yq, wq = np.round(y, 6), np.round(w, 6)
    xtx = X.T * wq @ X
    xty = X.T @ (wq * yq)
    beta = np.linalg.solve(xtx, xty)
    resid = yq - X @ beta
    sigma2 = float(wq @ (resid * resid)) / (len(y) - 3)
    se = np.sqrt(sigma2 * np.diag(np.linalg.inv(xtx)))
    for i, t in enumerate(["_intercept", "x1", "x2"]):
        assert got[t]["coef"] == pytest.approx(beta[i], abs=1e-5), t
        assert got[t]["std_err"] == pytest.approx(se[i], abs=1e-5), t


def test_wls_excludes_nonpositive_weights(spark):
    from intake_esm_spark.operators.regression import (
        wls_moments,
        wls_report,
    )

    rows = [(float(i), float(i), 1.0) for i in range(20)]
    rows += [(999.0, 999.0, 0.0), (999.0, 999.0, -5.0), (999.0, 999.0, None)]
    df = spark.createDataFrame(rows, "y double, x double, w double")
    mom = wls_moments(df, "y", ["x"], "w")
    assert mom["n"] == 20  # the three bad-weight rows never entered
    got = {r["term"]: r for r in wls_report(df, "y", ["x"], "w").collect()}
    assert got["x"]["coef"] == pytest.approx(1.0, abs=1e-6)


def test_wls_equal_weights_reduce_to_ols(spark, reg_frame):
    from intake_esm_spark.operators.regression import ols_report, wls_report

    df, *_ = reg_frame
    dfw = df.withColumn("w", F.lit(1.0))
    wls = {
        r["term"]: r
        for r in wls_report(dfw, "y", ["x1", "x2"], "w").collect()
    }
    ols = {
        r["term"]: r for r in ols_report(df, "y", ["x1", "x2"]).collect()
    }
    for t in ("_intercept", "x1", "x2"):
        assert wls[t]["coef"] == pytest.approx(ols[t]["coef"], abs=1e-6)
        assert wls[t]["std_err"] == pytest.approx(
            ols[t]["std_err"], abs=1e-6
        )


def _bp_ref(y, x1, x2):
    """First-principles Koenker BP on the operator's quantization:
    6dp data, 6dp-rounded beta literals, e2-on-X auxiliary R2."""
    X = np.column_stack([np.ones(len(y)), np.round(x1, 6), np.round(x2, 6)])
    yq = np.round(y, 6)
    beta = np.round(
        np.linalg.solve(X.T @ X, X.T @ yq), 6
    )  # the operator projects 6dp literals
    e = yq - X @ beta
    u = e * e
    ba = np.linalg.solve(X.T @ X, X.T @ u)
    sse = float((u - X @ ba) @ (u - X @ ba))
    sst = float((u - u.mean()) @ (u - u.mean()))
    r2 = 1 - sse / sst
    return len(y) * r2, r2


def test_breusch_pagan_detects_heteroscedasticity(spark):
    from intake_esm_spark.operators.regression import breusch_pagan_report

    rng = np.random.RandomState(23)
    n = 500
    x1 = rng.uniform(1, 10, n).round(4)
    x2 = rng.normal(0, 1, n).round(4)
    # variance grows with x1 -> BP must fire
    y = (3.0 + 2.0 * x1 + 0.5 * x2 + rng.normal(0, 1, n) * x1).round(4)
    df = spark.createDataFrame(
        list(zip(map(float, y), map(float, x1), map(float, x2))),
        "y double, x1 double, x2 double",
    )
    r = breusch_pagan_report(df, "y", ["x1", "x2"]).collect()[0]
    lm_ref, r2_ref = _bp_ref(y, x1, x2)
    assert r["lm_stat"] == pytest.approx(lm_ref, rel=1e-4)
    assert r["r2_aux"] == pytest.approx(r2_ref, abs=1e-6)
    assert r["dof"] == 2 and r["significant"] == 1
    # homoscedastic twin: must NOT fire
    y2 = (3.0 + 2.0 * x1 + 0.5 * x2 + rng.normal(0, 1, n)).round(4)
    df2 = spark.createDataFrame(
        list(zip(map(float, y2), map(float, x1), map(float, x2))),
        "y double, x1 double, x2 double",
    )
    r2row = breusch_pagan_report(df2, "y", ["x1", "x2"]).collect()[0]
    assert r2row["significant"] == 0


def test_ols_predict_residuals_match_numpy(spark, reg_frame):
    from intake_esm_spark.operators.regression import ols_predict

    df, g, y, x1, x2 = reg_frame
    dfi = df.withColumn("rid", F.monotonically_increasing_id())
    # the fixture is deterministic row order only per createDataFrame;
    # join predictions back on the variables instead: use y as key is
    # unsafe (dups) -> recompute reference from the row's own values
    rows = ols_predict(
        dfi, "y", ["x1", "x2"], ["rid", "y", "x1", "x2"]
    ).collect()
    X = np.column_stack([np.ones(len(y)), np.round(x1, 6), np.round(x2, 6)])
    yq = np.round(y, 6)
    beta = np.round(np.linalg.solve(X.T @ X, X.T @ yq), 6)
    for r in rows[:50]:
        eta = beta[0] + beta[1] * round(r["x1"], 6) + beta[2] * round(
            r["x2"], 6
        )
        assert r["fitted"] == pytest.approx(eta, abs=1e-6)
        assert r["residual"] == pytest.approx(
            round(r["y"], 6) - eta, abs=1e-6
        )
    assert len(rows) == len(y)


# ---- VIF / Poisson ------------------------------------------------------


def test_vif_matches_numpy_corr_inverse(spark):
    from intake_esm_spark.operators.regression import vif_report

    rng = np.random.RandomState(41)
    n = 300
    x1 = rng.normal(5, 2, n).round(4)
    x2 = rng.normal(-1, 3, n).round(4)
    # x3 NOISILY collinear with x1 -> VIF well above 1 but finite
    x3 = (2.0 * x1 + rng.normal(0, 0.5, n)).round(4)
    dfv = spark.createDataFrame(
        list(zip(map(float, x1), map(float, x2), map(float, x3))),
        "x1 double, x2 double, x3 double",
    )
    got = {
        r["term"]: r
        for r in vif_report(dfv, ["x1", "x2", "x3"]).collect()
    }
    X = np.column_stack([np.round(x1, 6), np.round(x2, 6), np.round(x3, 6)])
    corr = np.corrcoef(X, rowvar=False)
    vifs = np.diag(np.linalg.inv(corr))
    for i, t in enumerate(["x1", "x2", "x3"]):
        assert got[t]["vif"] == pytest.approx(vifs[i], rel=1e-3), t
        assert got[t]["r2_other"] == pytest.approx(
            1 - 1 / vifs[i], abs=1e-4
        )
    assert got["x3"]["vif"] > 10  # collinearity detected


def test_vif_degenerate_features(spark, reg_frame):
    from intake_esm_spark.operators.regression import vif_report

    df, *_ = reg_frame
    # constant feature: zero variance -> null VIF, others unaffected
    dfc = df.withColumn("xc", F.lit(5.0))
    got = {
        r["term"]: r for r in vif_report(dfc, ["x1", "x2", "xc"]).collect()
    }
    assert got["xc"]["vif"] is None
    assert got["x1"]["vif"] == pytest.approx(1.0, abs=0.1)
    # perfect collinearity: r2_other = 1, null VIF
    dfp = df.withColumn("xd", F.col("x1") * 3.0)
    got2 = {
        r["term"]: r for r in vif_report(dfp, ["x1", "x2", "xd"]).collect()
    }
    assert got2["x1"]["vif"] is None and got2["x1"]["r2_other"] == 1.0


def test_poisson_irls_matches_numpy(spark):
    from intake_esm_spark.operators.regression import (
        poisson_fit_report,
        poisson_report,
    )

    rng = np.random.RandomState(31)
    n = 400
    x1 = rng.normal(0, 0.8, n).round(4)
    x2 = rng.normal(0, 0.5, n).round(4)
    lam = np.exp(0.7 + 0.5 * x1 - 0.3 * x2)
    y = rng.poisson(lam)
    df = spark.createDataFrame(
        list(zip(map(int, y), map(float, x1), map(float, x2))),
        "y int, x1 double, x2 double",
    )
    got = {
        r["term"]: r
        for r in poisson_report(df, "y", ["x1", "x2"]).collect()
    }
    X = np.column_stack([np.ones(n), np.round(x1, 6), np.round(x2, 6)])
    # converged reference: mean-matched start (the operator's pass-0
    # rule) then Newton to convergence
    b = np.array([np.log(y.mean()), 0.0, 0.0])
    for _ in range(40):
        mu = np.exp(np.clip(X @ b, -50, 50))
        b = b + np.linalg.solve(X.T * mu @ X, X.T @ (y - mu))
    mu = np.exp(X @ b)
    se = np.sqrt(np.diag(np.linalg.inv(X.T * mu @ X)))
    for i, t in enumerate(["_intercept", "x1", "x2"]):
        assert got[t]["coef"] == pytest.approx(b[i], abs=1e-5), t
        assert got[t]["std_err"] == pytest.approx(se[i], abs=1e-5), t
    fit = poisson_fit_report(df, "y", ["x1", "x2"]).collect()[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        dev_terms = np.where(y > 0, y * np.log(y / mu), 0.0) - (y - mu)
    ref_dev = float(2.0 * dev_terms.sum() / n)
    assert fit["mean_deviance"] == pytest.approx(ref_dev, abs=1e-4)
    assert fit["n_rows"] == n and fit["n_iter"] == 8
    # guards: negative label, collinear features
    neg = df.withColumn("y", F.col("y") - 10)
    with pytest.raises(ValueError, match="non-negative"):
        poisson_report(neg, "y", ["x1"])
    dup = df.withColumn("x3", F.col("x1") * 2.0)
    with pytest.raises(ValueError, match="singular Hessian"):
        poisson_report(dup, "y", ["x1", "x3"])


def test_logistic_by_group_matches_solo_fits(spark):
    """Each group's grouped-IRLS trajectory must equal the solo
    logistic_report on that group's subframe BIT-FOR-BIT (identical
    per-group moments -> identical shared Newton steps)."""
    from intake_esm_spark.operators.regression import (
        logistic_by_group,
        logistic_report,
    )

    rng = np.random.RandomState(47)
    n = 300
    g = np.array(["a", "b", "c"])[np.arange(n) % 3]
    x1 = rng.normal(0, 1.5, n).round(4)
    x2 = rng.normal(1, 2, n).round(4)
    shift = {"a": -0.5, "b": 0.5, "c": 0.0}
    eta = np.vectorize(shift.get)(g) + 1.1 * x1 - 0.6 * x2
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(int)
    df = spark.createDataFrame(
        list(zip(map(str, g), map(int, y), map(float, x1), map(float, x2))),
        "g string, y int, x1 double, x2 double",
    )
    rows = logistic_by_group(df, "y", ["x1", "x2"], "g", n_iter=4).collect()
    got = {(r["grp"], r["term"]): r for r in rows}
    assert len(rows) == 9
    for grp in ("a", "b", "c"):
        solo = {
            r["term"]: r
            for r in logistic_report(
                df.filter(F.col("g") == grp), "y", ["x1", "x2"], n_iter=4
            ).collect()
        }
        for t in ("_intercept", "x1", "x2"):
            assert got[(grp, t)]["coef"] == solo[t]["coef"], (grp, t)
            assert got[(grp, t)]["std_err"] == solo[t]["std_err"], (grp, t)
            assert got[(grp, t)]["z_stat"] == solo[t]["z_stat"], (grp, t)


def test_logistic_by_group_skips_degenerate_group(spark):
    """A group with too few rows / separation is omitted; the healthy
    groups' trajectories are unaffected by its presence."""
    from intake_esm_spark.operators.regression import logistic_by_group

    rng = np.random.RandomState(53)
    n = 200
    g = np.array(["a", "b"])[np.arange(n) % 2]
    x = rng.normal(0, 1, n).round(4)
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-x))).astype(int)
    df = spark.createDataFrame(
        list(zip(map(str, g), map(int, y), map(float, x))),
        "g string, y int, x double",
    )
    healthy = logistic_by_group(df, "y", ["x"], "g", n_iter=4).collect()
    # identical x across the z rows: the group Hessian is rank-1
    # (x collinear with the intercept) -> singular -> frozen+omitted
    tiny = spark.createDataFrame(
        [("z", 1, 1.0), ("z", 0, 1.0)], "g string, y int, x double"
    )
    withz = logistic_by_group(
        df.unionByName(tiny), "y", ["x"], "g", n_iter=4
    ).collect()
    assert {r["grp"] for r in withz} <= {"a", "b"}  # z never survives
    hmap = {(r["grp"], r["term"]): r["coef"] for r in healthy}
    zmap = {(r["grp"], r["term"]): r["coef"] for r in withz}
    assert hmap == zmap  # bit-identical trajectories for a and b


def test_logistic_by_group_guards(spark):
    from intake_esm_spark.operators.regression import logistic_by_group

    df = spark.createDataFrame(
        [("a", 0.5, 1.0), ("a", 0.0, 2.0), ("b", 1.0, 3.0)] * 5,
        "g string, y double, x double",
    )
    with pytest.raises(ValueError, match="label must be 0/1"):
        logistic_by_group(df, "y", ["x"], "g", n_iter=2)
    ok = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0), ("b", 1, 3.0), ("b", 0, 1.5)] * 10,
        "g string, y int, x double",
    )
    with pytest.raises(ValueError, match="max_groups"):
        logistic_by_group(ok, "y", ["x"], "g", max_groups=1)


# ---- Cox proportional hazards -------------------------------------------


def _cox_breslow_ref(t, e, X, iters=40):
    """First-principles Breslow Cox Newton (O(n^2), fine for a test
    fixture): returns (beta, se)."""
    n, p = X.shape
    b = np.zeros(p)
    for _ in range(iters):
        eta = X @ b
        r = np.exp(eta)
        g = np.zeros(p)
        H = np.zeros((p, p))
        for ti in np.unique(t[e == 1]):
            risk = t >= ti
            d = int(((t == ti) & (e == 1)).sum())
            s0 = r[risk].sum()
            s1 = (r[risk, None] * X[risk]).sum(axis=0)
            s2 = (r[risk, None, None] * X[risk, :, None] * X[risk, None, :]).sum(axis=0)
            zx = X[(t == ti) & (e == 1)].sum(axis=0)
            g += zx - d * s1 / s0
            H += d * (s2 / s0 - np.outer(s1, s1) / s0**2)
        b = b + np.linalg.solve(H, g)
    eta = X @ b
    r = np.exp(eta)
    H = np.zeros((p, p))
    for ti in np.unique(t[e == 1]):
        risk = t >= ti
        d = int(((t == ti) & (e == 1)).sum())
        s0 = r[risk].sum()
        s1 = (r[risk, None] * X[risk]).sum(axis=0)
        s2 = (r[risk, None, None] * X[risk, :, None] * X[risk, None, :]).sum(axis=0)
        H += d * (s2 / s0 - np.outer(s1, s1) / s0**2)
    se = np.sqrt(np.diag(np.linalg.inv(H)))
    return b, se


@pytest.mark.parametrize("tie_round", [4, 1])
def test_cox_matches_first_principles_breslow(spark, tie_round):
    """Continuous durations (tie_round=4, mostly unique) AND heavily
    tied durations (tie_round=1) — the Breslow construction must match
    the O(n^2) reference in both regimes."""
    from intake_esm_spark.operators.survival import cox_ph_report

    rng = np.random.RandomState(61)
    n = 200
    x1 = (rng.uniform(size=n) < 0.4).astype(float)
    x2 = rng.normal(0, 1, n).round(4)
    lam = np.exp(0.8 * x1 - 0.5 * x2)
    t = np.round(rng.exponential(1.0 / lam), tie_round)
    cens = np.round(rng.exponential(2.0, n), tie_round)
    e = (t <= cens).astype(int)
    tt = np.minimum(t, cens)
    df = spark.createDataFrame(
        list(zip(map(float, tt), map(int, e), map(float, x1), map(float, x2))),
        "dur double, ev int, x1 double, x2 double",
    )
    got = {
        r["term"]: r
        for r in cox_ph_report(df, "dur", "ev", ["x1", "x2"]).collect()
    }
    X = np.column_stack([x1, np.round(x2, 6)])
    b, se = _cox_breslow_ref(np.round(tt, 6), e, X)
    for i, c in enumerate(["x1", "x2"]):
        assert got[c]["coef"] == pytest.approx(b[i], abs=2e-3), c
        assert got[c]["std_err"] == pytest.approx(se[i], abs=2e-3), c
        assert got[c]["hazard_ratio"] == pytest.approx(
            np.exp(b[i]), abs=5e-3
        )


def test_cox_guards(spark):
    from intake_esm_spark.operators.survival import cox_ph_report

    df = spark.createDataFrame(
        [(1.0, 0, 0.5), (2.0, 0, 1.0), (3.0, 0, 1.5)],
        "dur double, ev int, x double",
    )
    with pytest.raises(ValueError, match="no events"):
        cox_ph_report(df, "dur", "ev", ["x"], n_iter=2)
    with pytest.raises(ValueError, match="at least one covariate"):
        cox_ph_report(df, "dur", "ev", [])
