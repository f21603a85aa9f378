"""K-sample group statistics, Pettitt change-point, weighted
quantiles, and the embedding covariance matrix — each checked against
an independent in-test numpy/pandas computation of the textbook
formula (scipy is absent from the container, so the references are
computed from first principles the way the module docstrings state
them)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from intake_esm_spark.operators.groupstats import (
    anova_from_moments,
    anova_report,
    association_report,
    brown_forsythe_report,
    kruskal_wallis_report,
    spearman_report,
)


def _fixture():
    rng = np.random.RandomState(7)
    g = rng.randint(0, 3, 40)
    x = np.round(rng.normal(10, 2, 40) + g * 0.5, 3)
    y = np.round(x * 0.7 + rng.normal(0, 1, 40), 3)
    return pd.DataFrame({"g": g.astype(str), "x": x, "y": y})


def test_kruskal_wallis_matches_textbook(spark):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    row = kruskal_wallis_report(df, "g", "x").collect()[0]
    # reference: midranks + tie correction
    r = pd.Series(pdf["x"]).rank(method="average").values
    n = len(pdf)
    h = 12 / (n * (n + 1)) * sum(
        r[pdf["g"].values == k].sum() ** 2
        / (pdf["g"].values == k).sum()
        for k in "012"
    ) - 3 * (n + 1)
    _, cnt = np.unique(pdf["x"].values, return_counts=True)
    c = 1 - (cnt**3 - cnt).sum() / (n**3 - n)
    assert row["n_units"] == n
    assert row["n_groups"] == 3
    assert row["dof"] == 2
    assert row["h_stat"] == pytest.approx(h / c, abs=1e-6)


def test_kruskal_heavy_ties_stays_exact(spark):
    # 90% of values tied at one point — the tie-correction branch
    rows = [("a", 1.0)] * 18 + [("b", 1.0)] * 18 + [
        ("a", 2.0), ("b", 3.0), ("a", 4.0), ("b", 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    row = kruskal_wallis_report(df, "g", "x").collect()[0]
    pdf = pd.DataFrame(rows, columns=["g", "x"])
    r = pdf["x"].rank(method="average").values
    n = len(pdf)
    h = 12 / (n * (n + 1)) * sum(
        r[pdf["g"].values == k].sum() ** 2 / (pdf["g"].values == k).sum()
        for k in "ab"
    ) - 3 * (n + 1)
    _, cnt = np.unique(pdf["x"].values, return_counts=True)
    c = 1 - (cnt**3 - cnt).sum() / (n**3 - n)
    assert row["h_stat"] == pytest.approx(h / c, abs=1e-6)


def test_kruskal_all_tied_is_null(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("a", 5.0)], "g string, x double"
    )
    row = kruskal_wallis_report(df, "g", "x").collect()[0]
    assert row["h_stat"] is None  # C = 0: no ordering information


def test_anova_matches_textbook(spark):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    row = anova_report(df, "g", "x").collect()[0]
    x, g = pdf["x"].values, pdf["g"].values
    n, k = len(x), 3
    means = {c: x[g == c].mean() for c in "012"}
    gm = x.mean()
    ssb = sum((g == c).sum() * (means[c] - gm) ** 2 for c in "012")
    ssw = sum(((x[g == c] - means[c]) ** 2).sum() for c in "012")
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["df_between"] == 2 and row["df_within"] == 37
    assert row["f_stat"] == pytest.approx(f, abs=1e-6)
    assert row["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=1e-6)
    # Welch
    ns = np.array([(g == c).sum() for c in "012"], float)
    vs = np.array([x[g == c].var(ddof=1) for c in "012"])
    ms = np.array([means[c] for c in "012"])
    w = ns / vs
    mw = (w * ms).sum() / w.sum()
    a = (w * (ms - mw) ** 2).sum() / (k - 1)
    b = 2 * (k - 2) / (k**2 - 1) * ((1 - w / w.sum()) ** 2 / (ns - 1)).sum()
    assert row["welch_f"] == pytest.approx(a / (1 + b), abs=1e-6)
    assert row["welch_df2"] == pytest.approx(
        (k**2 - 1) / (3 * ((1 - w / w.sum()) ** 2 / (ns - 1)).sum()),
        abs=1e-4,
    )


def test_anova_degenerate_group_nulls_welch_only(spark):
    # one singleton group: classical F still defined, Welch is not
    rows = [("a", 1.0), ("a", 2.0), ("b", 5.0), ("b", 6.0), ("c", 9.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    row = anova_report(df, "g", "x").collect()[0]
    assert row["f_stat"] is not None
    assert row["welch_f"] is None and row["welch_df2"] is None


def test_anova_single_group_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "g string, x double"
    )
    row = anova_report(df, "g", "x").collect()[0]
    assert row["f_stat"] is None and row["eta_sq"] is None


def test_brown_forsythe_matches_textbook(spark):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    row = brown_forsythe_report(df, "g", "x").collect()[0]
    x, g = pdf["x"].values, pdf["g"].values
    n, k = len(x), 3
    meds = {c: np.median(x[g == c]) for c in "012"}
    z = np.abs(x - np.array([meds[c] for c in g]))
    mz = {c: z[g == c].mean() for c in "012"}
    gz = z.mean()
    ssb = sum((g == c).sum() * (mz[c] - gz) ** 2 for c in "012")
    ssw = sum(((z[g == c] - mz[c]) ** 2).sum() for c in "012")
    bf = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["df1"] == 2 and row["df2"] == 37
    # group medians are 6dp-rounded before centering; odd group sizes
    # in this fixture make the exact median an element, so parity holds
    assert row["bf_stat"] == pytest.approx(bf, abs=1e-4)


def test_spearman_matches_rank_pearson(spark):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    row = spearman_report(df, "x", "y").collect()[0]
    rx = pdf["x"].rank(method="average").values
    ry = pdf["y"].rank(method="average").values
    rho = np.corrcoef(rx, ry)[0, 1]
    n = len(pdf)
    assert row["n_rows"] == n
    assert row["rho"] == pytest.approx(rho, abs=1e-6)
    assert row["t_stat"] == pytest.approx(
        rho * np.sqrt((n - 2) / (1 - rho**2)), abs=1e-4
    )


def test_spearman_ties_and_filters(spark):
    rows = [
        (1.0, 2.0), (1.0, 3.0), (2.0, 3.0), (2.0, 5.0),
        (3.0, 7.0), (None, 1.0), (4.0, None),
        (float("nan"), 2.0), (5.0, float("inf")),
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    row = spearman_report(df, "x", "y").collect()[0]
    pdf = pd.DataFrame(rows[:5], columns=["x", "y"])
    rx = pdf["x"].rank(method="average").values
    ry = pdf["y"].rank(method="average").values
    assert row["n_rows"] == 5  # null / NaN / inf rows excluded
    assert row["rho"] == pytest.approx(np.corrcoef(rx, ry)[0, 1], abs=1e-6)


def test_spearman_constant_margin_null(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0)], "x double, y double"
    )
    row = spearman_report(df, "x", "y").collect()[0]
    assert row["rho"] is None and row["t_stat"] is None


def test_association_independent_and_deterministic(spark):
    # deterministic mapping: NMI = 1, V = 1
    det = spark.createDataFrame(
        [("a", "x")] * 5 + [("b", "y")] * 5 + [("c", "z")] * 5,
        "u string, v string",
    )
    row = association_report(det, "u", "v").collect()[0]
    assert row["nmi"] == pytest.approx(1.0, abs=1e-6)
    assert row["cramers_v"] == pytest.approx(1.0, abs=1e-6)
    # perfectly independent 2x2: MI = 0, V = 0
    ind = spark.createDataFrame(
        [("a", "x")] * 4 + [("a", "y")] * 4
        + [("b", "x")] * 4 + [("b", "y")] * 4,
        "u string, v string",
    )
    row = association_report(ind, "u", "v").collect()[0]
    assert row["mi"] == pytest.approx(0.0, abs=1e-6)
    assert row["cramers_v"] == pytest.approx(0.0, abs=1e-6)


def test_association_chi2_matches_full_grid_report(spark):
    """The zero-cell shortcut (Σ_{o=0} e = N − Σ_{o>0} e) must agree
    with chi_square_report's explicit full-grid χ² on a frame WITH an
    empty cell."""
    from intake_esm_spark.operators.experiment import chi_square_report

    rows = (
        [("a", "x")] * 6 + [("a", "y")] * 2
        + [("b", "x")] * 1 + [("b", "y")] * 7
        + [("c", "x")] * 4  # (c, y) is the zero cell
    )
    df = spark.createDataFrame(rows, "u string, v string")
    grid = chi_square_report(df, "u", "v").collect()[0]
    assoc = association_report(df, "u", "v").collect()[0]
    n = grid["n_units"]
    v_from_grid = np.sqrt(grid["chi2"] / (n * (min(3, 2) - 1)))
    assert assoc["cramers_v"] == pytest.approx(v_from_grid, abs=1e-6)
    # and MI against the direct formula over observed cells
    pdf = pd.DataFrame(rows, columns=["u", "v"])
    ct = pdf.groupby(["u", "v"]).size()
    na = pdf.groupby("u").size()
    nb = pdf.groupby("v").size()
    mi = sum(
        c / n * np.log(n * c / (na[a] * nb[b]))
        for (a, b), c in ct.items()
    )
    assert assoc["mi"] == pytest.approx(mi, abs=1e-6)


def test_pettitt_matches_pairwise_definition(spark):
    rng = np.random.RandomState(11)
    vals = np.concatenate(
        [rng.normal(10, 1, 12), rng.normal(14, 1, 13)]
    ).round(2)
    days = pd.date_range("2024-03-01", periods=25, freq="D")
    rows = [
        (pd.Timestamp(d).to_pydatetime(), float(v))
        for d, v in zip(days, vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    from intake_esm_spark.operators.timeseries import pettitt_test

    row = pettitt_test(df).collect()[0]
    x = vals  # one event per day: daily totals are the values
    t_count = len(x)
    u = [
        sum(
            np.sign(x[i] - x[j])
            for i in range(t + 1)
            for j in range(t + 1, t_count)
        )
        for t in range(t_count - 1)
    ]
    k = int(max(abs(np.array(u))))
    am = int(np.argmax(np.abs(u)))
    p = min(1.0, 2 * np.exp(-6 * k**2 / (t_count**3 + t_count**2)))
    assert row["n_days"] == t_count
    assert row["k_stat"] == k
    assert row["change_day"] == str(days[am].date())
    assert row["p_value"] == pytest.approx(p, abs=1e-6)
    assert row["p_value"] < 0.01  # the shift is real


def test_pettitt_short_series_empty(spark):
    from intake_esm_spark.operators.timeseries import pettitt_test

    one = spark.createDataFrame(
        [("2024-01-01 00:00:00", 5.0)], "ts string, value double"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    assert pettitt_test(one).count() == 0


def test_weighted_quantiles_matches_searchsorted(spark):
    from intake_esm_spark.operators.profiling import weighted_quantiles

    rng = np.random.RandomState(3)
    v = rng.normal(50, 10, 200).round(3)
    w = rng.randint(1, 9, 200).astype(float)
    pdf = pd.DataFrame({"v": v, "w": w})
    df = spark.createDataFrame(pdf)
    probs = [0.1, 0.5, 0.9, 1.0]
    got = {
        r["prob"]: r
        for r in weighted_quantiles(df, "v", "w", probs).collect()
    }
    agg = pdf.groupby("v", as_index=False)["w"].sum().sort_values("v")
    cw = agg["w"].cumsum().values
    total = agg["w"].sum()
    for p in probs:
        idx = int(np.searchsorted(cw, p * total, side="left"))
        assert got[p]["quantile"] == pytest.approx(
            agg["v"].values[idx], abs=1e-9
        ), p
        assert got[p]["n_rows"] == 200
        assert got[p]["total_weight"] == pytest.approx(total)


def test_weighted_quantiles_excludes_nonpositive_weights(spark):
    from intake_esm_spark.operators.profiling import weighted_quantiles

    df = spark.createDataFrame(
        [(1.0, 0.0), (2.0, -3.0), (3.0, 1.0), (4.0, None), (None, 1.0)],
        "v double, w double",
    )
    rows = weighted_quantiles(df, "v", "w", [0.5, 1.0]).collect()
    assert all(r["n_rows"] == 1 and r["quantile"] == 3.0 for r in rows)


def test_weighted_quantiles_validates_probs(spark):
    from intake_esm_spark.operators.profiling import weighted_quantiles

    df = spark.createDataFrame([(1.0, 1.0)], "v double, w double")
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [0.0, 0.5])
    with pytest.raises(ValueError):
        weighted_quantiles(df, "v", "w", [])


def test_embedding_covariance_matches_numpy(spark):
    from intake_esm_spark.operators.matrix import embedding_covariance

    rng = np.random.RandomState(5)
    mat = rng.normal(0, 1, (60, 6)).round(4)
    df = spark.createDataFrame(
        [(r.tolist(),) for r in mat], "embedding array<double>"
    )
    rows = embedding_covariance(df).collect()
    assert len(rows) == 6 * 7 // 2
    n = mat.shape[0]
    s1 = mat.sum(0)
    cov = (mat.T @ mat - np.outer(s1, s1) / n) / (n - 1)
    var = np.diag(cov)
    for r in rows:
        assert r["n_vecs"] == n
        assert r["cov"] == pytest.approx(cov[r["i"], r["j"]], abs=2e-6)
        assert r["corr"] == pytest.approx(
            cov[r["i"], r["j"]] / np.sqrt(var[r["i"]] * var[r["j"]]),
            abs=1e-4,
        )


def test_embedding_covariance_small_n_and_no_corr(spark):
    from intake_esm_spark.operators.matrix import embedding_covariance

    one = spark.createDataFrame(
        [([1.0, 2.0],)], "embedding array<double>"
    )
    assert embedding_covariance(one).count() == 0  # n < 2: undefined
    two = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 5.0],)], "embedding array<double>"
    )
    out = embedding_covariance(two, include_corr=False)
    assert out.columns == ["i", "j", "n_vecs", "cov"]
    got = {(r["i"], r["j"]): r["cov"] for r in out.collect()}
    assert got[(0, 0)] == pytest.approx(2.0)
    assert got[(0, 1)] == pytest.approx(3.0)
    assert got[(1, 1)] == pytest.approx(4.5)


def test_stream_anova_matches_batch(spark, tmp_path):
    """Two micro-batches of grouped values: the LAST update per group,
    snapshotted through anova_from_moments, equals the whole-corpus
    batch anova_report exactly (additive exact-decimal moments — the
    PSI-twin parity argument verbatim)."""
    import glob
    import shutil

    from intake_esm_spark.streaming.stateful import stream_anova_moments

    pdf = _fixture()
    df = spark.createDataFrame(pdf).select("g", F.col("x").alias("x"))
    batch = anova_report(df, "g", "x").collect()[0]

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.crc32(F.col("x").cast("string")) % 2 == 0).coalesce(
        1
    ).write.parquet(str(tmp_path / "a"))
    df.filter(F.crc32(F.col("x").cast("string")) % 2 == 1).coalesce(
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
    out = stream_anova_moments(stream, "g", "x")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("anova_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM anova_stream").collect()
    finally:
        q.stop()
    last = {}
    for r in emitted:  # memory sink appends updates in batch order
        last[r["__g"]] = (r["__n"], r["__s1"], r["__s2"])
    moms = spark.createDataFrame(
        [(g, n, s1, s2) for g, (n, s1, s2) in last.items()],
        "__g string, __n long, __s1 decimal(18,6), __s2 decimal(38,12)",
    )
    streamed = anova_from_moments(moms).collect()[0]
    for c in (
        "n_units", "n_groups", "df_between", "df_within",
        "f_stat", "eta_sq", "welch_f", "welch_df2",
    ):
        assert streamed[c] == batch[c], c


def test_kendall_tau_b_matches_contingency_formula(spark):
    from intake_esm_spark.operators.groupstats import kendall_tau_b

    rng = np.random.RandomState(9)
    x = rng.randint(1, 8, 300)
    y = np.clip(x + rng.randint(-2, 3, 300), 0, 9)
    pdf = pd.DataFrame({"x": x.astype(float), "y": y.astype(float)})
    df = spark.createDataFrame(pdf)
    row = kendall_tau_b(df, "x", "y").collect()[0]
    ct = pd.crosstab(pdf["x"], pdf["y"]).values
    r, c = ct.shape
    cc = dd = 0
    for i in range(r):
        for j in range(c):
            if ct[i, j] == 0:
                continue
            cc += ct[i, j] * ct[i + 1:, j + 1:].sum()
            dd += ct[i, j] * ct[i + 1:, :j].sum()
    n = len(pdf)
    nx = ct.sum(1)
    ny = ct.sum(0)
    n0 = n * (n - 1) / 2
    tau = (cc - dd) / np.sqrt(
        (n0 - (nx * (nx - 1) / 2).sum()) * (n0 - (ny * (ny - 1) / 2).sum())
    )
    assert row["n_rows"] == n
    assert row["concordant"] == cc and row["discordant"] == dd
    assert row["tau_b"] == pytest.approx(tau, abs=1e-6)


def test_kendall_guard_aborts_high_cardinality(spark):
    from intake_esm_spark.operators.groupstats import kendall_tau_b
    from py4j.protocol import Py4JJavaError

    rng = np.random.RandomState(1)
    pdf = pd.DataFrame(
        {"x": rng.normal(size=300), "y": rng.normal(size=300)}
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception) as ei:
        kendall_tau_b(df, "x", "y", max_cells=64).collect()
    assert "kendall_tau_b" in str(ei.value)


def test_kendall_perfect_and_reversed(spark):
    from intake_esm_spark.operators.groupstats import kendall_tau_b

    up = spark.createDataFrame(
        [(float(i), float(i)) for i in range(10)], "x double, y double"
    )
    assert kendall_tau_b(up, "x", "y").collect()[0]["tau_b"] == 1.0
    dn = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(10)], "x double, y double"
    )
    assert kendall_tau_b(dn, "x", "y").collect()[0]["tau_b"] == -1.0


def test_acf_matches_numpy_pairs(spark):
    from intake_esm_spark.operators.timeseries import acf_report

    rng = np.random.RandomState(4)
    days = pd.date_range("2024-05-01", periods=40, freq="D")
    vals = (np.sin(np.arange(40) * 2 * np.pi / 7) * 10 + 50
            + rng.normal(0, 1, 40)).round(2)
    rows = [
        (pd.Timestamp(d).to_pydatetime(), float(v))
        for d, v in zip(days, vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {r["lag"]: r for r in acf_report(df, max_lag=7).collect()}
    for k in range(1, 8):
        x, y = vals[:-k], vals[k:]
        ref = np.corrcoef(x, y)[0, 1]
        assert got[k]["n_pairs"] == 40 - k
        assert got[k]["acf"] == pytest.approx(ref, abs=1e-6), k
    # the planted weekly cycle must dominate
    assert got[7]["acf"] > 0.9


def test_acf_gap_shrinks_pairs(spark):
    from intake_esm_spark.operators.timeseries import acf_report

    days = [d for i, d in enumerate(
        pd.date_range("2024-05-01", periods=10, freq="D")
    ) if i != 4]  # drop one day
    rows = [
        (pd.Timestamp(d).to_pydatetime(), float(i))
        for i, d in enumerate(days)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    got = {r["lag"]: r for r in acf_report(df, max_lag=2).collect()}
    # 9 days, one interior gap: lag-1 loses the two pairs crossing it
    assert got[1]["n_pairs"] == 7
    with pytest.raises(ValueError):
        acf_report(df, max_lag=0)


def test_pca_project_matches_numpy(spark):
    from intake_esm_spark.operators.matrix import pca_project

    rng = np.random.RandomState(12)
    # anisotropic cloud: one dominant direction
    base = rng.normal(0, 1, (80, 1)) @ np.array([[3.0, 1.0, 0.2, 0.0]])
    mat = (base + rng.normal(0, 0.3, (80, 4))).round(4)
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r for r in pca_project(df, k=2).collect()
    }
    q = np.round(mat, 6)
    cmat = np.cov(q.T)
    _, vv = np.linalg.eigh(cmat)
    for c in range(2):
        v = vv[:, -1 - c]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        ref = (mat - q.mean(0)) @ v
        errs = [
            abs(got[i][f"pc_{c+1}"] - ref[i]) for i in range(len(mat))
        ]
        assert max(errs) < 1e-4, (c, max(errs))


def test_pca_project_validates(spark):
    from intake_esm_spark.operators.matrix import pca_project

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError):
        pca_project(df, k=3)
    with pytest.raises(ValueError):
        pca_project(df, k=0)
    with pytest.raises(ValueError):
        pca_project(df.filter("vec_id < 0"), k=1)
    with pytest.raises(ValueError):
        pca_project(df, k=1, max_dim=1)


def test_stream_association_matches_batch(spark, tmp_path):
    """Two micro-batches of (a, b) pairs: the LAST update per cell,
    snapshotted through association_from_cells, equals the whole-corpus
    batch association_report exactly (integer cell counters — the
    PSI-twin parity argument verbatim)."""
    import glob
    import shutil

    from intake_esm_spark.operators.groupstats import (
        association_from_cells,
    )
    from intake_esm_spark.streaming.stateful import (
        stream_association_cells,
    )

    rows = (
        [("a", "x")] * 7 + [("a", "y")] * 2
        + [("b", "x")] * 3 + [("b", "y")] * 8
        + [("c", "x")] * 5
    )
    df = spark.createDataFrame(rows, "u string, v string")
    batch = association_report(df, "u", "v").collect()[0]

    src = tmp_path / "flat"
    src.mkdir()
    df.withColumn(
        "__h", F.crc32(F.concat(F.col("u"), F.col("v")))
    ).filter(F.col("__h") % 2 == 0).drop("__h").repartition(1).write.parquet(
        str(tmp_path / "a")
    )
    df.withColumn(
        "__h", F.crc32(F.concat(F.col("u"), F.col("v")))
    ).filter(F.col("__h") % 2 == 1).drop("__h").repartition(1).write.parquet(
        str(tmp_path / "b")
    )
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
    out = stream_association_cells(stream, "u", "v")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("assoc_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM assoc_stream").collect()
    finally:
        q.stop()
    last = {}
    for r in emitted:  # memory sink appends updates in batch order
        last[(r["__a"], r["__b"])] = r["__obs"]
    cells = spark.createDataFrame(
        [(a, b, n) for (a, b), n in last.items()],
        "__a string, __b string, __obs long",
    )
    streamed = association_from_cells(cells).collect()[0]
    for c in ("n_units", "n_a", "n_b", "mi", "nmi", "cramers_v"):
        assert streamed[c] == batch[c], c


def test_conformal_interval_matches_order_statistic(spark):
    from intake_esm_spark.operators.evaluation import conformal_interval

    rng = np.random.RandomState(2)
    y = rng.normal(10, 3, 200).round(3)
    p = (y + rng.normal(0, 1, 200)).round(3)
    df = spark.createDataFrame(pd.DataFrame({"y": y, "p": p}))
    row = conformal_interval(df, "y", "p", alpha=0.1).collect()[0]
    r = np.round(np.abs(y - p), 6)
    k = int(np.ceil(201 * 0.9))
    assert row["n_calib"] == 200
    assert row["k_rank"] == k
    assert row["q_hat"] == pytest.approx(np.sort(r)[k - 1])
    assert row["coverage_guarantee"] == pytest.approx(k / 201, abs=1e-6)
    # empirical coverage on the calibration set itself >= the guarantee
    assert (r <= row["q_hat"]).mean() >= row["coverage_guarantee"] - 1e-9


def test_conformal_small_n_returns_null_qhat(spark):
    from intake_esm_spark.operators.evaluation import conformal_interval

    df = spark.createDataFrame(
        [(1.0, 1.5), (2.0, 2.2)], "y double, p double"
    )
    # k = ceil(3 * 0.99) = 3 > n = 2: no rank exists -> honest null
    row = conformal_interval(df, "y", "p", alpha=0.01).collect()[0]
    assert row["q_hat"] is None and row["k_rank"] == 3
    with pytest.raises(ValueError):
        conformal_interval(df, "y", "p", alpha=0.0)
    with pytest.raises(ValueError):
        conformal_interval(df, "y", "p", alpha=1.0)


def test_mann_kendall_detects_planted_trend(spark):
    from intake_esm_spark.operators.timeseries import mann_kendall_test

    rng = np.random.RandomState(6)
    days = pd.date_range("2024-02-01", periods=30, freq="D")
    vals = (np.arange(30) * 2.0 + rng.normal(0, 1, 30)).round(2)
    df = spark.createDataFrame(
        [
            (pd.Timestamp(d).to_pydatetime(), float(v))
            for d, v in zip(days, vals)
        ],
        "ts timestamp, value double",
    )
    row = mann_kendall_test(df).collect()[0]
    x = vals
    n = len(x)
    s = sum(
        np.sign(x[j] - x[i]) for i in range(n) for j in range(i + 1, n)
    )
    _, t = np.unique(x, return_counts=True)
    var = (
        n * (n - 1) * (2 * n + 5) - (t * (t - 1) * (2 * t + 5)).sum()
    ) / 18
    z = (s - 1) / np.sqrt(var) if s > 0 else (s + 1) / np.sqrt(var)
    assert row["s_stat"] == s
    assert row["z"] == pytest.approx(z, abs=1e-6)
    assert row["significant"] == 1


def test_mann_kendall_ties_and_constant(spark):
    from intake_esm_spark.operators.timeseries import mann_kendall_test

    days = pd.date_range("2024-02-01", periods=8, freq="D")
    vals = [5.0, 5.0, 7.0, 5.0, 7.0, 7.0, 9.0, 9.0]
    df = spark.createDataFrame(
        [
            (pd.Timestamp(d).to_pydatetime(), float(v))
            for d, v in zip(days, vals)
        ],
        "ts timestamp, value double",
    )
    row = mann_kendall_test(df).collect()[0]
    x = np.array(vals)
    n = 8
    s = sum(
        np.sign(x[j] - x[i]) for i in range(n) for j in range(i + 1, n)
    )
    _, t = np.unique(x, return_counts=True)
    var = (n * (n - 1) * (2 * n + 5) - (t * (t - 1) * (2 * t + 5)).sum()) / 18
    z = (s - 1) / np.sqrt(var) if s > 0 else (s + 1) / np.sqrt(var)
    assert row["s_stat"] == s
    assert row["z"] == pytest.approx(z, abs=1e-6)
    const = spark.createDataFrame(
        [
            (pd.Timestamp(d).to_pydatetime(), 3.0)
            for d in pd.date_range("2024-02-01", periods=5, freq="D")
        ],
        "ts timestamp, value double",
    )
    crow = mann_kendall_test(const).collect()[0]
    assert crow["s_stat"] == 0 and crow["z"] is None
    assert crow["significant"] == 0


def test_fisher_scores_match_numpy(spark):
    from intake_esm_spark.operators.matrix import fisher_scores

    rng = np.random.RandomState(8)
    lab = rng.randint(0, 3, 90)
    # dim 0 separates the classes, dim 1 is noise, dim 2 is constant
    mat = np.stack(
        [
            lab * 2.0 + rng.normal(0, 0.3, 90),
            rng.normal(0, 1, 90),
            np.zeros(90),
        ],
        axis=1,
    ).round(4)
    df = spark.createDataFrame(
        [(int(l), r.tolist()) for l, r in zip(lab, mat)],
        "label int, embedding array<double>",
    )
    got = {r["i"]: r for r in fisher_scores(df).collect()}
    for i in range(2):
        xi = mat[:, i]
        mg = xi.mean()
        btw = sum(
            (lab == c).sum() * (xi[lab == c].mean() - mg) ** 2
            for c in range(3)
        )
        wth = sum(
            ((xi[lab == c] - xi[lab == c].mean()) ** 2).sum()
            for c in range(3)
        )
        assert got[i]["fisher"] == pytest.approx(btw / wth, rel=1e-4), i
        assert got[i]["n_labels"] == 3
    assert got[0]["fisher"] > 50 * got[1]["fisher"]  # separator dominates
    assert got[2]["fisher"] is None  # zero within-class scatter


def test_ratio_ab_test_matches_delta_method(spark):
    from intake_esm_spark.operators.experiment import ratio_ab_test

    rng = np.random.RandomState(3)
    n = 400
    g = np.where(rng.rand(n) < 0.5, "t", "c")
    y = rng.poisson(10, n) + 1.0
    x = np.round(y * (1.5 + (g == "t") * 0.1) + rng.normal(0, 2, n), 3)
    pdf = pd.DataFrame({"g": g, "x": x, "y": y})
    df = spark.createDataFrame(pdf)
    row = ratio_ab_test(df, "g", "x", "y", "t", "c").collect()[0]

    def delta(arm):
        d = pdf[pdf.g == arm]
        xx, yy = np.round(d.x.values, 6), d.y.values
        nn = len(d)
        r = xx.sum() / yy.sum()
        vx, vy = xx.var(ddof=1), yy.var(ddof=1)
        vxy = np.cov(xx, yy, ddof=1)[0, 1]
        return r, (vx - 2 * r * vxy + r * r * vy) / (nn * yy.mean() ** 2)

    rt, vt = delta("t")
    rc, vc = delta("c")
    assert row["ratio_treat"] == pytest.approx(rt, abs=1e-6)
    assert row["ratio_control"] == pytest.approx(rc, abs=1e-6)
    assert row["z"] == pytest.approx((rt - rc) / np.sqrt(vt + vc), abs=1e-5)
    assert row["significant"] == 1


def test_ratio_ab_degenerate_nulls(spark):
    from intake_esm_spark.operators.experiment import ratio_ab_test

    # singleton treatment arm: n < 2 -> z null
    df = spark.createDataFrame(
        [("t", 1.0, 2.0), ("c", 1.0, 2.0), ("c", 3.0, 4.0)],
        "g string, x double, y double",
    )
    row = ratio_ab_test(df, "g", "x", "y", "t", "c").collect()[0]
    assert row["z"] is None and row["significant"] == 0
    assert row["ratio_treat"] == pytest.approx(0.5)


def test_jackknife_ratio_ci_matches_hash_replay(spark):
    from intake_esm_spark.operators.experiment import jackknife_ratio_ci
    import hashlib

    rng = np.random.RandomState(3)
    n = 300
    y = rng.poisson(10, n) + 1.0
    x = np.round(y * 1.5 + rng.normal(0, 2, n), 3)
    pdf = pd.DataFrame({"x": x, "y": y, "uid": np.arange(n)})
    df = spark.createDataFrame(pdf)
    row = jackknife_ratio_ci(df, "x", "y", "uid", n_buckets=20).collect()[0]

    def h60(key, salt=""):
        s = f"{salt}|{key}"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 1_000_000

    b = np.array([h60(str(u)) % 20 for u in pdf.uid])
    xs = np.round(pdf.x.values, 6)
    big_s, big_t = xs.sum(), pdf.y.values.sum()
    ths = np.array(
        [
            (big_s - xs[b == bb].sum()) / (big_t - pdf.y.values[b == bb].sum())
            for bb in np.unique(b)
        ]
    )
    bb_n = len(ths)
    var = (bb_n - 1) / bb_n * ((ths - ths.mean()) ** 2).sum()
    assert row["n_buckets_used"] == bb_n
    assert row["ratio"] == pytest.approx(big_s / big_t, abs=1e-6)
    assert row["se"] == pytest.approx(np.sqrt(var), abs=1e-5)
    assert row["ci_lo"] < row["ratio"] < row["ci_hi"]
    with pytest.raises(ValueError):
        jackknife_ratio_ci(df, "x", "y", "uid", n_buckets=1)


def test_jackknife_null_when_loo_denominator_zero(spark):
    """A bucket whose removal zeroes the denominator total must null
    the whole CI — SQL sum would silently skip the null theta."""
    from intake_esm_spark.operators.experiment import jackknife_ratio_ci

    # two units; with 2 buckets each unit is alone, so removing the
    # y=5 unit leaves denominator 0 for one leave-one-out ratio
    df = spark.createDataFrame(
        [(0, 1.0, 0.0), (1, 2.0, 5.0)], "uid long, x double, y double"
    )
    row = jackknife_ratio_ci(df, "x", "y", "uid", n_buckets=2).collect()[0]
    assert row["ratio"] == pytest.approx(0.6)
    assert row["se"] is None and row["ci_lo"] is None


def test_cluster_quality_matches_numpy(spark):
    from intake_esm_spark.operators.matrix import cluster_quality

    rng = np.random.RandomState(10)
    k, per, d = 4, 30, 5
    cents = rng.normal(0, 5, (k, d))
    mat = np.vstack(
        [cents[c] + rng.normal(0, 1, (per, d)) for c in range(k)]
    ).round(4)
    lab = np.repeat(np.arange(k), per)
    df = spark.createDataFrame(
        [(int(l), r.tolist()) for l, r in zip(lab, mat)],
        "label int, embedding array<double>",
    )
    row = cluster_quality(df).collect()[0]
    q = np.round(mat, 6)
    n = len(q)
    mg = q.mean(0)
    b = sum(
        (lab == c).sum() * ((q[lab == c].mean(0) - mg) ** 2).sum()
        for c in range(k)
    )
    w = sum(((q[lab == c] - q[lab == c].mean(0)) ** 2).sum() for c in range(k))
    ch = (b / (k - 1)) / (w / (n - k))
    cm = {c: q[lab == c].mean(0) for c in range(k)}
    s = {
        c: np.sqrt(((q[lab == c] - cm[c]) ** 2).sum() / per)
        for c in range(k)
    }
    dbv = np.mean(
        [
            max(
                (s[c] + s[e]) / np.linalg.norm(cm[c] - cm[e])
                for e in range(k)
                if e != c
            )
            for c in range(k)
        ]
    )
    assert row["n_vecs"] == n and row["n_clusters"] == k
    assert row["calinski_harabasz"] == pytest.approx(ch, rel=1e-5)
    assert row["davies_bouldin"] == pytest.approx(dbv, rel=1e-5)
    # a well-separated clustering: CH should dominate a random labeling
    rand = spark.createDataFrame(
        [
            (int(l), r.tolist())
            for l, r in zip(rng.randint(0, k, n), mat)
        ],
        "label int, embedding array<double>",
    )
    rrow = cluster_quality(rand).collect()[0]
    assert row["calinski_harabasz"] > 10 * rrow["calinski_harabasz"]
    assert row["davies_bouldin"] < rrow["davies_bouldin"]


def test_cluster_quality_guard_and_degenerate(spark):
    from intake_esm_spark.operators.matrix import cluster_quality

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(10)],
        "label int, embedding array<double>",
    )
    with pytest.raises(Exception) as ei:
        cluster_quality(df, max_clusters=4).collect()
    assert "cluster_quality" in str(ei.value)
    one = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [2.0, 3.0])],
        "label int, embedding array<double>",
    )
    row = cluster_quality(one).collect()[0]
    assert row["calinski_harabasz"] is None
    assert row["davies_bouldin"] is None


def test_stratified_ate_deconfounds(spark):
    from intake_esm_spark.operators.experiment import stratified_ate

    rng = np.random.RandomState(5)
    n = 500
    score = rng.rand(n).round(4)
    t = (rng.rand(n) < 0.3 + 0.4 * score).astype(int)
    y = np.round(2 * score * 10 + t * 1.5 + rng.normal(0, 1, n), 3)
    pdf = pd.DataFrame({"uid": np.arange(n), "t": t, "y": y, "s": score})
    df = spark.createDataFrame(pdf)
    row = stratified_ate(df, "t", "y", "s", "uid", n_strata=5).collect()[0]
    # numpy replay with SQL ntile semantics (order by score, id)
    o = pdf.sort_values(["s", "uid"]).reset_index(drop=True)
    q, rem = divmod(n, 5)
    idx = np.repeat(np.arange(5), [q + 1] * rem + [q] * (5 - rem))
    yq = np.round(o.y.values, 6)
    eff = var = wtot = 0.0
    for s_ in range(5):
        mask = idx == s_
        ts, ys = o.t.values[mask], yq[mask]
        nt, nc = ts.sum(), (1 - ts).sum()
        mtv, mcv = ys[ts == 1].mean(), ys[ts == 0].mean()
        ns = nt + nc
        eff += ns * (mtv - mcv)
        wtot += ns
        var += ns * ns * (
            ys[ts == 1].var(ddof=1) / nt + ys[ts == 0].var(ddof=1) / nc
        )
    assert row["ate"] == pytest.approx(eff / wtot, abs=1e-5)
    assert row["se"] == pytest.approx(np.sqrt(var) / wtot, abs=1e-5)
    assert row["n_strata_used"] == 5 and row["n_strata_dropped"] == 0
    # the stratification recovers ~1.5 where the naive diff is ~4
    naive = yq[o.t.values == 1].mean() - yq[o.t.values == 0].mean()
    assert abs(row["ate"] - 1.5) < 0.2 < abs(naive - 1.5)


def test_stratified_ate_drops_unsupported_strata(spark):
    from intake_esm_spark.operators.experiment import stratified_ate

    # no treated units in the bottom half of scores: those strata have
    # no within-stratum contrast and must be dropped, not imputed
    rows = [
        (i, (i % 2 if i >= 10 else 0), float(i), float(i))
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "uid long, t int, y double, s double")
    row = stratified_ate(df, "t", "y", "s", "uid", n_strata=4).collect()[0]
    assert row["n_strata_dropped"] == 2  # strata 1-2 are all-control
    assert row["n_strata_used"] == 2
    with pytest.raises(ValueError):
        stratified_ate(df, "t", "y", "s", "uid", n_strata=1)


def test_salted_join_matches_plain_join(spark):
    from intake_esm_spark.operators.layout import salted_join

    rng = np.random.RandomState(13)
    # heavy skew: 80% of rows share one key
    keys = np.where(rng.rand(500) < 0.8, 7, rng.randint(0, 50, 500))
    big = spark.createDataFrame(
        [(int(k), float(i)) for i, k in enumerate(keys)],
        "k long, v double",
    ).repartition(8)
    small = spark.createDataFrame(
        [(int(k), f"dim{k}") for k in range(0, 50, 2)],
        "k long, name string",
    )
    plain = (
        big.join(small, "k").groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    salted = (
        salted_join(big, small, "k", n_salts=4)
        .groupBy("k", "name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    # left join preserves unmatched big rows exactly once
    lp = big.join(small, "k", "left").count()
    ls = salted_join(big, small, "k", n_salts=4, how="left").count()
    assert lp == ls == 500
    # the small side is replicated through an explode in the plan
    plan_df = salted_join(big, small, "k", n_salts=4)
    assert "explode" in plan_df._jdf.queryExecution().toString().lower()
    with pytest.raises(ValueError):
        salted_join(big, small, "k", n_salts=1)
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="full")


def test_quantile_bin_matches_sql_ntile(spark):
    from intake_esm_spark.operators.profiling import quantile_bin

    rng = np.random.RandomState(14)
    vals = rng.randint(0, 7, 103).astype(float)  # heavy ties
    pdf = pd.DataFrame({"uid": np.arange(103), "v": vals})
    df = spark.createDataFrame(pdf)
    got = quantile_bin(df, "v", "uid", n_bins=4)
    ref = df.selectExpr(
        "uid", "v", "ntile(4) OVER (ORDER BY v, uid) AS bin"
    )
    assert sorted(map(tuple, got.select("uid", "bin").collect())) == sorted(
        map(tuple, ref.select("uid", "bin").collect())
    )
    with pytest.raises(ValueError):
        quantile_bin(df, "v", "uid", n_bins=0)


def test_stream_ratio_ab_matches_batch(spark, tmp_path):
    """Two micro-batches of ratio-metric units: the LAST update equals
    the whole-corpus batch delta-method report exactly (additive
    decimal moments — the mSPRT-twin parity argument verbatim)."""
    import glob
    import shutil

    from intake_esm_spark.operators.experiment import ratio_ab_test
    from intake_esm_spark.streaming.stateful import stream_ratio_ab

    rng = np.random.RandomState(15)
    n = 60
    g = np.where(rng.rand(n) < 0.5, "t", "c")
    y = rng.poisson(8, n) + 1.0
    x = np.round(y * 1.4 + rng.normal(0, 1, n), 3)
    pdf = pd.DataFrame({"g": g, "x": x, "y": y})
    df = spark.createDataFrame(pdf)
    batch = ratio_ab_test(df, "g", "x", "y", "t", "c").collect()[0]

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.crc32(F.col("x").cast("string")) % 2 == 0).coalesce(
        1
    ).write.parquet(str(tmp_path / "a"))
    df.filter(F.crc32(F.col("x").cast("string")) % 2 == 1).coalesce(
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
    out = stream_ratio_ab(stream, "g", "x", "y", "t", "c")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ratio_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM ratio_stream").collect()
    finally:
        q.stop()
    last = emitted[-1]
    for c in (
        "n_treat", "n_control", "ratio_treat", "ratio_control",
        "diff", "z", "significant",
    ):
        assert last[c] == batch[c], c


def test_l_diversity_flags_homogeneous_groups(spark):
    from intake_esm_spark.operators.privacy import l_diversity_report

    rows = (
        [("NY", "flu")] * 5              # k-safe but homogeneous
        + [("SF", "flu"), ("SF", "cold"), ("SF", "covid")]
        + [("LA", None), ("LA", "flu")]  # null is its own disclosure
    )
    df = spark.createDataFrame(rows, "zip string, diagnosis string")
    got = {
        r["zip"]: r
        for r in l_diversity_report(df, ["zip"], "diagnosis", 2).collect()
    }
    assert got["NY"]["n_sensitive"] == 1 and got["NY"]["is_diverse"] == 0
    assert got["SF"]["n_sensitive"] == 3 and got["SF"]["is_diverse"] == 1
    assert got["LA"]["n_sensitive"] == 2  # null counted as a value
    with pytest.raises(ValueError):
        l_diversity_report(df, [], "diagnosis")
    with pytest.raises(ValueError):
        l_diversity_report(df, ["zip"], "diagnosis", 0)


def test_dp_noisy_counts_deterministic_and_scaled(spark):
    from intake_esm_spark.operators.privacy import dp_noisy_counts

    rows = [(f"g{i % 40}",) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string")
    a = sorted(map(tuple, dp_noisy_counts(df, ["g"], 1.0, "s1").collect()))
    b = sorted(
        map(
            tuple,
            dp_noisy_counts(df.repartition(17), ["g"], 1.0, "s1").collect(),
        )
    )
    assert a == b  # partition-independent
    c = sorted(map(tuple, dp_noisy_counts(df, ["g"], 1.0, "s2").collect()))
    assert a != c  # salt actually moves the draw
    # noise magnitude tracks 1/epsilon: mean |noisy - true| ~ b
    true = 100
    err1 = np.mean([abs(n - true) for _, n in a])
    wide = sorted(
        map(tuple, dp_noisy_counts(df, ["g"], 0.05, "s1").collect())
    )
    err2 = np.mean([abs(n - true) for _, n in wide])
    assert err2 > 4 * err1  # b = 20 vs b = 1
    assert all(n >= 0 for _, n in wide)  # clamped
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], 0.0)
    with pytest.raises(ValueError):
        dp_noisy_counts(df, [], 1.0)


def test_dp_noisy_counts_null_cells_get_distinct_noise(spark):
    """(a, NULL) and (a,) -shaped cells must not share a noise draw:
    concat_ws skips nulls, so the key encodes them explicitly."""
    from intake_esm_spark.operators.privacy import dp_noisy_counts

    rows = [("a", None)] * 500 + [("a", "x")] * 500
    df = spark.createDataFrame(rows, "g string, h string")
    got = {
        (r["g"], r["h"]): r["noisy_count"]
        for r in dp_noisy_counts(df, ["g", "h"], 1.0, "s").collect()
    }
    assert len(got) == 2
    # same true count, different keys => (almost surely) different noise;
    # the real assertion is the KEYS differ, proven by differing draws
    # for equal counts under a salt chosen to exhibit it
    diffs = [
        s
        for s in ("s", "s2", "s3", "s4")
        for d in [
            {
                (r["g"], r["h"]): r["noisy_count"]
                for r in dp_noisy_counts(df, ["g", "h"], 1.0, s).collect()
            }
        ]
        if d[("a", None)] != d[("a", "x")]
    ]
    assert diffs  # at least one salt separates the two cells


def test_wilcoxon_signed_rank_matches_exact_reference(spark):
    from intake_esm_spark.operators.experiment import wilcoxon_signed_rank

    rng = np.random.RandomState(21)
    pre = rng.normal(10, 2, 200).round(2)
    post = (pre + 0.4 + rng.normal(0, 1, 200)).round(2)
    df = spark.createDataFrame(pd.DataFrame({"pre": pre, "post": post}))
    row = wilcoxon_signed_rank(df, "pre", "post").collect()[0]
    # EXACT integer-cents differences — double subtraction of 2dp
    # values splits ties the decimal arithmetic correctly keeps
    d = np.round(post * 100).astype(int) - np.round(pre * 100).astype(int)
    nzd = d[d != 0]
    r = pd.Series(np.abs(nzd)).rank(method="average").values
    wplus = r[nzd > 0].sum()
    n = len(nzd)
    _, t = np.unique(np.abs(nzd), return_counts=True)
    var = n * (n + 1) * (2 * n + 1) / 24 - ((t**3 - t).sum()) / 48
    z = (wplus - n * (n + 1) / 4) / np.sqrt(var)
    assert row["n_pairs"] == 200 and row["n_nonzero"] == n
    assert row["w_plus"] == wplus
    assert row["z"] == pytest.approx(z, abs=1e-6)
    assert row["significant"] == 1


def test_wilcoxon_zero_diffs_and_degenerate(spark):
    from intake_esm_spark.operators.experiment import wilcoxon_signed_rank

    # half the pairs tie exactly: discarded per the Wilcoxon convention
    rows = [(1.0, 1.0)] * 5 + [(1.0, 2.0), (3.0, 1.0), (2.0, 4.0)]
    df = spark.createDataFrame(rows, "pre double, post double")
    row = wilcoxon_signed_rank(df, "pre", "post").collect()[0]
    assert row["n_pairs"] == 8 and row["n_nonzero"] == 3
    # |d| = 1, 2, 2 -> ranks 1, 2.5, 2.5; positives d=+1 (rank 1), d=+2
    # (rank 2.5) -> W+ = 3.5
    assert row["w_plus"] == 3.5
    # all pairs tied: no evidence, null z
    allz = spark.createDataFrame([(1.0, 1.0)] * 4, "pre double, post double")
    zrow = wilcoxon_signed_rank(allz, "pre", "post").collect()[0]
    assert zrow["n_nonzero"] == 0 and zrow["z"] is None
    assert zrow["w_plus"] is None and zrow["significant"] == 0
