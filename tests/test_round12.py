"""Round-12 regression tests: the folded heavy-value probe
(`ranks.probe_heavy_values` + the `heavy=` literal parameter), the
single-job `_heavy_values` rewrite, the Arrow-GEMM covariance path, the
mixed-dimensionality guards, the quantized PCA projection, the
dp_noisy_counts cell-key escaping, and the nmi clamp."""

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from intake_esm_spark.operators.ranks import (
    _heavy_values,
    global_rank,
    probe_heavy_values,
)


@pytest.fixture(scope="module")
def modal_frame(spark):
    # two modal metrics over one entity frame: half of `f` is 1,
    # `m` masses at 0.0 — the RFM shape the probes exist for
    rows = [
        (i, 1 if i % 2 == 0 else (i % 7) + 2, 0.0 if i % 3 else float(i))
        for i in range(400)
    ]
    return spark.createDataFrame(rows, "id long, f long, m double")


def test_probe_heavy_values_matches_per_metric_probe(spark, modal_frame):
    """ONE exploded rollup job returns the same heavy tables as the
    per-metric probes it folds (value, count threshold, tiebreak
    spans)."""
    combined = probe_heavy_values(
        modal_frame, [("f", "f", "id"), ("m", "m", "id")]
    )
    for val in ("f", "m"):
        solo = _heavy_values(modal_frame, val, "id", 64)
        got = [
            (float(r["__hv"]), r["__hlo"], r["__hhi"])
            for r in combined[val]
        ]
        want = [
            (float(r["__hv"]), r["__hlo"], r["__hhi"]) for r in solo
        ]
        assert got == want, (val, got, want)


def test_heavy_literal_rank_equals_probe_rank_equals_row_number(
    spark, modal_frame
):
    """`heavy=` (precomputed table) and `tie_fanout=True` (internal
    probe) produce the identical exact rank, and both equal the
    unpartitioned row_number ground truth."""
    heavy = probe_heavy_values(modal_frame, [("f", "f", "id")])["f"]
    assert heavy, "fixture must actually contain a heavy value"
    via_lit = {
        r["id"]: r["__rank"]
        for r in global_rank(
            modal_frame, "f", ["id"], heavy=heavy
        ).collect()
    }
    via_probe = {
        r["id"]: r["__rank"]
        for r in global_rank(
            modal_frame, "f", ["id"], tie_fanout=True
        ).collect()
    }
    w = Window.orderBy(F.col("f").asc(), F.col("id").asc())
    truth = {
        r["id"]: r["rn"]
        for r in modal_frame.withColumn(
            "rn", F.row_number().over(w)
        ).collect()
    }
    assert via_lit == truth
    assert via_probe == truth


def test_single_job_heavy_probe_threshold_semantics(spark):
    """The rollup+TakeOrdered rewrite keeps the exact membership rule
    `count·HEAVY_TIE_DENOM >= N` (round 12: a value is heavy at a
    1/16 frame share, not at the normal 1/B bucket load): a value at
    exactly N/16 is heavy, one below is not."""
    # N = 160, D = 16 -> threshold count 10
    rows = []
    for v in range(6):  # 6 values at exactly the threshold share
        rows += [(100 * v + j, 500 + v) for j in range(10)]
    rows += [(10_000 + i, 1000 + i) for i in range(91)]  # 91 singletons
    rows += [(20_000 + j, 2000) for j in range(9)]  # count 9: just below
    df = spark.createDataFrame(rows, "id long, v long")
    assert df.count() == 160
    heavy = _heavy_values(df, "v", "id", 64)
    vals = {r["__hv"] for r in heavy}
    assert vals == {500 + v for v in range(6)}, vals


def test_embedding_covariance_arrow_matches_exact(spark):
    from intake_esm_spark.operators.matrix import embedding_covariance

    rng = np.random.RandomState(42)
    mat = rng.normal(0, 3, (300, 9)).round(7)
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(mat)],
        "vec_id long, embedding array<double>",
    ).repartition(11)
    exact = {
        (r["i"], r["j"]): (r["cov"], r["corr"])
        for r in embedding_covariance(df).collect()
    }
    fast = {
        (r["i"], r["j"]): (r["cov"], r["corr"])
        for r in embedding_covariance(df, exact=False).collect()
    }
    assert set(exact) == set(fast)
    for k in exact:
        # float64 GEMM partials on 6dp inputs: raw moments agree to
        # ~1e-9, so the 6dp-rounded outputs agree except when a value
        # sits ON a rounding boundary — then they differ by exactly
        # one 6th-decimal grid step
        assert abs(exact[k][0] - fast[k][0]) <= 1.01e-6, k
        assert abs(exact[k][1] - fast[k][1]) <= 1.01e-6, k


def test_mixed_dimensionality_aborts_in_plan(spark):
    from intake_esm_spark.operators.matrix import (
        cluster_quality,
        embedding_covariance,
        fisher_scores,
        pca_project,
    )

    bad = spark.createDataFrame(
        [(0, [1.0, 2.0], 1), (1, [1.0, 2.0, 3.0], 1), (2, [0.5, 1.5], 2)],
        "vec_id long, embedding array<double>, label int",
    )
    for op in (
        lambda: embedding_covariance(bad).collect(),
        lambda: embedding_covariance(bad, exact=False).collect(),
        lambda: fisher_scores(bad).collect(),
        lambda: cluster_quality(bad).collect(),
        lambda: pca_project(bad, k=1).collect(),
    ):
        with pytest.raises(Exception, match="mixed vector dimensionality"):
            op()
    # an EMPTY frame must NOT trip the guard (NULL min/max sizes)
    empty = bad.filter("vec_id < 0")
    assert embedding_covariance(empty).count() == 0


def test_pca_projection_uses_quantized_components(spark):
    """ADVICE r12: the projection must center the SAME 6dp-quantized
    components the covariance consumed — first-principles replication
    on data where raw != quantized."""
    from intake_esm_spark.operators.matrix import (
        pca_loadings_from_cov,
        pca_project,
    )

    rng = np.random.RandomState(5)
    mat = rng.normal(0, 1, (50, 4)) + 1e-7 * rng.normal(0, 5, (50, 4))
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in pca_project(df, k=2).collect()}
    q = np.round(mat, 6)
    # the engine feeds eigh the 6dp-ROUNDED covariance — replicate
    comps = pca_loadings_from_cov(np.round(np.cov(q.T), 6), 2)
    for c, v in enumerate(comps, start=1):
        ref = (q - q.mean(0)) @ v
        errs = [abs(got[i][f"pc_{c}"] - ref[i]) for i in range(len(mat))]
        # numpy float moments vs the engine's exact-decimal moments
        # differ in the last ulps, and the output rounds to 6dp —
        # 1e-6 bounds both; the BIT-exact proof of quantized
        # centering is the embed_pca DuckDB oracle (round 12), whose
        # projection replays round(x, 6) components term-for-term
        assert max(errs) <= 1.01e-6, (c, max(errs))


def test_dp_cell_key_separator_values_get_distinct_draws(spark):
    """ADVICE r12: values containing the \\x1f separator used to
    collide across cells and share one noise draw; escaped keys give
    each cell its own deterministic draw."""
    from intake_esm_spark.operators.privacy import dp_noisy_counts

    rows = [("a\x1fb", "c")] * 1000 + [("a", "b\x1fc")] * 1000
    df = spark.createDataFrame(rows, "g1 string, g2 string")
    out = {
        (r["g1"], r["g2"]): r["noisy_count"]
        for r in dp_noisy_counts(
            df, ["g1", "g2"], epsilon=0.05, salt="v1"
        ).collect()
    }
    assert len(out) == 2
    d1 = out[("a\x1fb", "c")] - 1000
    d2 = out[("a", "b\x1fc")] - 1000
    # pre-fix both cells keyed 'a\x1fb\x1fc' and drew IDENTICAL noise;
    # with epsilon=0.05 (b=20) two independent md5 draws rounding to
    # the same integer is essentially impossible — and deterministic
    assert d1 != d2, (d1, d2)


def test_nmi_clamped_at_one(spark):
    """ADVICE r12: quantized MI/entropy sums can push nmi marginally
    above 1 on a deterministic association — the least() clamp caps
    it while a null guard branch stays null."""
    from intake_esm_spark.operators.groupstats import association_report

    rows = [(f"k{i % 13}", f"v{i % 13}") for i in range(997)]
    df = spark.createDataFrame(rows, "a string, b string")
    row = association_report(df, "a", "b").collect()[0]
    assert row["nmi"] is not None
    assert row["nmi"] <= 1.0
    # degenerate single-level column -> zero entropy -> nmi null
    one = spark.createDataFrame(
        [("x", f"v{i % 3}") for i in range(30)], "a string, b string"
    )
    assert association_report(one, "a", "b").collect()[0]["nmi"] is None


def test_effect_size_report_matches_numpy(spark):
    from intake_esm_spark.operators.groupstats import effect_size_report

    rng = np.random.RandomState(31)
    a = rng.normal(10, 2, 60).round(4)
    b = rng.normal(11, 3, 45).round(4)
    rows = [(0, float(x)) for x in a] + [(1, float(x)) for x in b]
    df = spark.createDataFrame(rows, "g int, v double")
    r = effect_size_report(df, "v", "g").collect()[0]
    ssq_a = a.var(ddof=0) * len(a)
    ssq_b = b.var(ddof=0) * len(b)
    pooled = np.sqrt((ssq_a + ssq_b) / (len(a) + len(b) - 2))
    d = (b.mean() - a.mean()) / pooled
    j = 1 - 3 / (4 * (len(a) + len(b)) - 9)
    assert r["n_a"] == 60 and r["n_b"] == 45
    assert r["mean_diff"] == pytest.approx(b.mean() - a.mean(), abs=1e-5)
    assert r["cohens_d"] == pytest.approx(d, abs=1e-5)
    assert r["hedges_g"] == pytest.approx(j * d, abs=1e-5)
    assert r["glass_delta"] == pytest.approx(
        (b.mean() - a.mean()) / a.std(ddof=1), abs=1e-5
    )
    three = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 3.0)], "g int, v double"
    )
    with pytest.raises(Exception, match="exactly TWO groups"):
        effect_size_report(three, "v", "g").collect()


def test_cliffs_delta_matches_bruteforce(spark):
    from intake_esm_spark.operators.groupstats import cliffs_delta

    rng = np.random.RandomState(9)
    a = rng.randint(0, 12, 40).astype(float)  # heavy ties on purpose
    b = (rng.randint(0, 12, 55) + rng.binomial(1, 0.4, 55)).astype(float)
    rows = [("x", float(v)) for v in a] + [("y", float(v)) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = cliffs_delta(df, "v", "g").collect()[0]
    gt = sum(1 for x in a for y in b if y > x)
    lt = sum(1 for x in a for y in b if y < x)
    tie = sum(1 for x in a for y in b if y == x)
    assert (r["n_gt"], r["n_lt"], r["n_tie"]) == (gt, lt, tie)
    assert r["cliffs_delta"] == pytest.approx(
        (gt - lt) / (len(a) * len(b)), abs=1e-6
    )
    assert r["magnitude"] in {"negligible", "small", "medium", "large"}
    one = spark.createDataFrame([("x", 1.0)], "g string, v double")
    with pytest.raises(Exception, match="exactly TWO groups"):
        cliffs_delta(one, "v", "g").collect()


def test_pca_whiten_unit_variance(spark):
    from intake_esm_spark.operators.matrix import pca_project

    rng = np.random.RandomState(3)
    base = rng.normal(0, 1, (200, 1)) @ np.array([[4.0, 1.0, 0.3]])
    mat = (base + rng.normal(0, 0.5, (200, 3))).round(4)
    df = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    out = np.array(
        [
            (r["pc_1"], r["pc_2"])
            for r in pca_project(df, k=2, whiten=True).collect()
        ]
    )
    # whitened components have ~unit SAMPLE variance (exact up to the
    # 6dp quantization of inputs/outputs and the n-1 covariance norm)
    for c in range(2):
        assert abs(out[:, c].var(ddof=1) - 1.0) < 0.01, out[:, c].var(ddof=1)
    # degenerate: whitening a zero-variance component must raise
    flat = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="whitening"):
        pca_project(flat, k=2, whiten=True)


def test_cvm_two_sample_matches_numpy(spark):
    """ECDF-integral form vs first-principles numpy; on TIE-FREE data
    it must also equal the classic rank formula
    U/(n m N) - (4mn-1)/(6N)."""
    from intake_esm_spark.operators.experiment import cvm_test_report

    rng = np.random.RandomState(17)
    a = np.unique(rng.normal(0, 1, 80).round(6))
    b = np.unique(rng.normal(0.4, 1.3, 70).round(6) + 1e-4)
    rows = [("t", float(x)) for x in a] + [("c", float(y)) for y in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = cvm_test_report(df, "g", "v", "t", "c").collect()[0]
    n, m = len(a), len(b)
    N = n + m
    pooled = np.sort(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), pooled, side="right") / n
    fb = np.searchsorted(np.sort(b), pooled, side="right") / m
    t_int = n * m / N**2 * np.sum((fa - fb) ** 2)
    assert r["t_stat"] == pytest.approx(t_int, abs=1e-5)
    # rank formula (tie-free): U = n*sum((r_i - i)^2) + m*sum((s_j - j)^2)
    ranks = {v: i + 1 for i, v in enumerate(pooled)}
    ra = np.array(sorted(ranks[v] for v in a))
    rb = np.array(sorted(ranks[v] for v in b))
    u = n * np.sum((ra - np.arange(1, n + 1)) ** 2) + m * np.sum(
        (rb - np.arange(1, m + 1)) ** 2
    )
    t_rank = u / (n * m * N) - (4 * m * n - 1) / (6 * N)
    assert r["t_stat"] == pytest.approx(t_rank, abs=1e-5)
    # scipy-identical finite-N adjustment
    et = (1 + 1 / N) / 6
    vt = (N + 1) * (4 * n * m * N - 3 * (n**2 + m**2) - 2 * n * m) / (
        45 * N**2 * 4 * n * m
    )
    assert r["t_adj"] == pytest.approx(
        1 / 6 + (t_int - et) * np.sqrt((1 / 45) / vt), abs=1e-5
    )
    assert r["significant"] in (0, 1)
    # identical samples -> tiny statistic, not significant
    same = spark.createDataFrame(
        [("t", float(i % 13)) for i in range(50)]
        + [("c", float(i % 13)) for i in range(50)],
        "g string, v double",
    )
    r0 = cvm_test_report(same, "g", "v", "t", "c").collect()[0]
    assert r0["t_stat"] == pytest.approx(0.0, abs=1e-9)
    assert r0["significant"] == 0


def test_stream_effect_sizes_matches_batch(spark, tmp_path):
    """The effect-size readout composes with the EXISTING streaming
    moments twin (#22, stream_anova_moments): last update per arm →
    effect_sizes_from_moments == whole-corpus effect_size_report
    bit-for-bit (the additive exact-decimal parity argument)."""
    import glob
    import shutil

    from intake_esm_spark.operators.groupstats import (
        effect_size_report,
        effect_sizes_from_moments,
    )
    from intake_esm_spark.streaming.stateful import stream_anova_moments

    rng = np.random.RandomState(44)
    rows = [("a" if i % 2 else "b", float(v))
            for i, v in enumerate(rng.normal(5, 2, 120).round(4))]
    df = spark.createDataFrame(rows, "g string, x double")
    batch = effect_size_report(df, "x", "g").collect()[0]

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
    q = (
        stream_anova_moments(stream, "g", "x")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("es_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM es_stream").collect()
    finally:
        q.stop()
    last = {}
    for r in emitted:
        last[r["__g"]] = (r["__n"], r["__s1"], r["__s2"])
    moms = spark.createDataFrame(
        [(g, n, s1, s2) for g, (n, s1, s2) in last.items()],
        "__g string, __n long, __s1 decimal(18,6), __s2 decimal(38,12)",
    )
    streamed = effect_sizes_from_moments(moms).collect()[0]
    for c in (
        "n_a", "n_b", "mean_a", "mean_b", "mean_diff",
        "pooled_sd", "cohens_d", "hedges_g", "glass_delta",
    ):
        assert streamed[c] == batch[c], c


def ad_ksamp_midrank_ref(samples):
    """Independent numpy translation of Scholz & Stephens (1987):
    tie-adjusted (midrank) A2akN, exact variance constants, normalized
    statistic — the formulas scipy.anderson_ksamp implements."""
    Z = np.sort(np.concatenate(samples))
    Zstar = np.unique(Z)
    k = len(samples)
    n = np.array([len(s) for s in samples])
    N = len(Z)
    lj = Z.searchsorted(Zstar, "right") - Z.searchsorted(Zstar, "left")
    Bj = Z.searchsorted(Zstar, "left") + lj / 2.0
    A2 = 0.0
    for i in range(k):
        s = np.sort(samples[i])
        Mij = s.searchsorted(Zstar, "right").astype(float)
        fij = Mij - s.searchsorted(Zstar, "left")
        Mij -= fij / 2.0
        inner = (
            lj
            / float(N)
            * (N * Mij - Bj * n[i]) ** 2
            / (Bj * (N - Bj) - N * lj / 4.0)
        )
        A2 += inner.sum() / n[i]
    A2 *= (N - 1.0) / N
    H = (1.0 / n).sum()
    hs = (1.0 / np.arange(1, N)).sum()
    g = 0.0
    for l in range(1, N - 1):
        g += (1.0 / (N - l)) * (1.0 / np.arange(l + 1, N)).sum()
    a = (4 * g - 6) * (k - 1) + (10 - 6 * g) * H
    b = (
        (2 * g - 4) * k**2
        + 8 * hs * k
        + (2 * g - 14 * hs - 4) * H
        - 8 * hs
        + 4 * g
        - 6
    )
    c = (
        (6 * hs + 2 * g - 2) * k**2
        + (4 * hs - 4 * g + 6) * k
        + (2 * hs - 6) * H
        + 4 * hs
    )
    d = (2 * hs + 6) * k**2 - 4 * hs * k
    sigsq = (a * N**3 + b * N**2 + c * N + d) / (
        (N - 1.0) * (N - 2.0) * (N - 3.0)
    )
    return A2, np.sqrt(sigsq), (A2 - (k - 1)) / np.sqrt(sigsq)


def test_anderson_darling_ksample_matches_reference(spark):
    from intake_esm_spark.operators.groupstats import (
        anderson_darling_ksample,
    )

    rng = np.random.RandomState(7)
    samples = [
        rng.randint(0, 25, 60).astype(float),
        (rng.randint(0, 25, 45) + rng.binomial(1, 0.5, 45)).astype(float),
        rng.randint(2, 27, 50).astype(float),
    ]
    rows = [(f"g{i}", float(v)) for i, s in enumerate(samples) for v in s]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anderson_darling_ksample(df, "v", "g").collect()[0]
    a2, sig, t = ad_ksamp_midrank_ref(samples)
    assert r["n_units"] == 155 and r["n_groups"] == 3
    assert r["a2_stat"] == pytest.approx(a2, abs=1e-5)
    assert r["sigma"] == pytest.approx(sig, abs=1e-5)
    assert r["t_stat"] == pytest.approx(t, abs=1e-5)
    # a genuinely shifted third sample must reject
    shifted = samples[:2] + [samples[2] + 30.0]
    rows2 = [(f"g{i}", float(v)) for i, s in enumerate(shifted) for v in s]
    df2 = spark.createDataFrame(rows2, "g string, v double")
    r2 = anderson_darling_ksample(df2, "v", "g").collect()[0]
    a2b, sigb, tb = ad_ksamp_midrank_ref(shifted)
    assert r2["t_stat"] == pytest.approx(tb, abs=1e-4)
    assert r2["significant"] == 1
    # degenerate guards: one group / tiny N / single value -> nulls
    tiny = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("a", 1.0)], "g string, v double"
    )
    row = anderson_darling_ksample(tiny, "v", "g").collect()[0]
    assert row["a2_stat"] is None and row["significant"] == 0


def test_ols_matches_numpy_lstsq(spark):
    from intake_esm_spark.operators.regression import (
        ols_fit_report,
        ols_report,
    )

    rng = np.random.RandomState(11)
    n = 300
    x1 = rng.normal(5, 2, n).round(4)
    x2 = rng.normal(-1, 3, n).round(4)
    y = (2.5 + 1.2 * x1 - 0.7 * x2 + rng.normal(0, 1.5, n)).round(4)
    df = spark.createDataFrame(
        list(zip(map(float, y), map(float, x1), map(float, x2))),
        "y double, x1 double, x2 double",
    )
    got = {r["term"]: r for r in ols_report(df, "y", ["x1", "x2"]).collect()}
    X = np.column_stack([np.ones(n), np.round(x1, 6), np.round(x2, 6)])
    yq = np.round(y, 6)
    beta, *_ = np.linalg.lstsq(X, yq, rcond=None)
    resid = yq - X @ beta
    sse = float(resid @ resid)
    sigma2 = sse / (n - 3)
    inv = np.linalg.inv(X.T @ X)
    se = np.sqrt(sigma2 * np.diag(inv))
    for i, t in enumerate(["_intercept", "x1", "x2"]):
        assert got[t]["coef"] == pytest.approx(beta[i], abs=1e-5), t
        assert got[t]["std_err"] == pytest.approx(se[i], abs=1e-5), t
        assert got[t]["t_stat"] == pytest.approx(beta[i] / se[i], abs=1e-3)
    fit = ols_fit_report(df, "y", ["x1", "x2"]).collect()[0]
    sst = float((yq - yq.mean()) @ (yq - yq.mean()))
    assert fit["n_rows"] == n and fit["df_resid"] == n - 3
    assert fit["r2"] == pytest.approx(1 - sse / sst, abs=1e-5)
    assert fit["rmse"] == pytest.approx(np.sqrt(sse / n), abs=1e-5)
    assert fit["f_stat"] == pytest.approx(
        ((sst - sse) / 2) / (sse / (n - 3)), rel=1e-4
    )
    # guards: collinear design, too few rows, feature cap
    dup = df.withColumn("x3", F.col("x1") * 2.0)
    with pytest.raises(ValueError, match="singular"):
        ols_report(dup, "y", ["x1", "x3"])
    with pytest.raises(ValueError, match="cannot fit"):
        ols_report(df.limit(3), "y", ["x1", "x2"])
    with pytest.raises(ValueError, match="MAX_FEATURES"):
        ols_report(df, "y", ["x1"] * 17)


def test_logistic_irls_matches_numpy(spark):
    from intake_esm_spark.operators.regression import (
        logistic_fit_report,
        logistic_report,
    )

    rng = np.random.RandomState(21)
    n = 400
    x1 = rng.normal(0, 1.5, n).round(4)
    x2 = rng.normal(1, 2, n).round(4)
    eta = -0.5 + 1.1 * x1 - 0.6 * x2
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(int)
    df = spark.createDataFrame(
        list(zip(map(int, y), map(float, x1), map(float, x2))),
        "y int, x1 double, x2 double",
    )
    got = {
        r["term"]: r
        for r in logistic_report(df, "y", ["x1", "x2"]).collect()
    }
    # converged numpy IRLS reference (30 iterations, unquantized sums)
    X = np.column_stack([np.ones(n), np.round(x1, 6), np.round(x2, 6)])
    b = np.zeros(3)
    for _ in range(30):
        mu = 1 / (1 + np.exp(-X @ b))
        b = b + np.linalg.solve(X.T * (mu * (1 - mu)) @ X, X.T @ (y - mu))
    mu = 1 / (1 + np.exp(-X @ b))
    inv = np.linalg.inv(X.T * (mu * (1 - mu)) @ X)
    se = np.sqrt(np.diag(inv))
    for i, t in enumerate(["_intercept", "x1", "x2"]):
        assert got[t]["coef"] == pytest.approx(b[i], abs=1e-5), t
        assert got[t]["std_err"] == pytest.approx(se[i], abs=1e-5), t
    fit = logistic_fit_report(df, "y", ["x1", "x2"]).collect()[0]
    ref_ll = float((-(y * np.log(mu) + (1 - y) * np.log(1 - mu))).mean())
    assert fit["log_loss"] == pytest.approx(ref_ll, abs=1e-5)
    assert fit["n_rows"] == n and fit["n_iter"] == 8
    # guards: non-binary label, collinear features
    bad = df.withColumn("y", F.col("y") * 3)
    with pytest.raises(ValueError, match="label must be 0/1"):
        logistic_report(bad, "y", ["x1"])
    dup = df.withColumn("x3", F.col("x1") * 2.0)
    with pytest.raises(ValueError, match="singular Hessian"):
        logistic_report(dup, "y", ["x1", "x3"])


def test_jarque_bera_matches_numpy(spark):
    from intake_esm_spark.operators.groupstats import jarque_bera_report

    rng = np.random.RandomState(3)
    x = np.exp(rng.normal(0, 0.8, 400)).round(4)  # lognormal: skewed
    df = spark.createDataFrame([(float(v),) for v in x], "v double")
    r = jarque_bera_report(df, "v").collect()[0]
    q = np.round(x, 6)
    m = q.mean()
    m2 = ((q - m) ** 2).mean()
    m3 = ((q - m) ** 3).mean()
    m4 = ((q - m) ** 4).mean()
    S = m3 / m2**1.5
    K = m4 / m2**2 - 3
    assert r["skewness"] == pytest.approx(S, abs=1e-5)
    assert r["kurtosis_excess"] == pytest.approx(K, abs=1e-5)
    assert r["jb_stat"] == pytest.approx(len(q) / 6 * (S**2 + K**2 / 4), rel=1e-5)
    assert r["significant"] == 1  # lognormal is decisively non-normal
    norm = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 2000).round(4)], "v double"
    )
    assert jarque_bera_report(norm, "v").collect()[0]["significant"] == 0


def test_moods_median_matches_bruteforce(spark):
    from intake_esm_spark.operators.groupstats import moods_median_test

    rng = np.random.RandomState(13)
    g = np.array(["a", "b", "c"])[np.arange(300) % 3]
    x = rng.normal(0, 1, 300).round(4) + np.where(g == "c", 0.8, 0.0)
    df = spark.createDataFrame(
        [(str(gg), float(v)) for gg, v in zip(g, x)], "g string, v double"
    )
    r = moods_median_test(df, "v", "g").collect()[0]
    med = float(np.median(np.round(x, 4)))
    assert r["grand_median"] == pytest.approx(med, abs=1e-6)
    chi2 = 0.0
    A = int((x > r["grand_median"]).sum())
    for gg in "abc":
        ng = int((g == gg).sum())
        oa = int(((g == gg) & (x > r["grand_median"])).sum())
        ea = ng * A / 300
        eb = ng * (300 - A) / 300
        chi2 += (oa - ea) ** 2 / ea + (ng - oa - eb) ** 2 / eb
    assert r["chi2"] == pytest.approx(chi2, abs=1e-5)
    assert r["dof"] == 2 and r["significant"] == 1
    # exact chi2(2) 5% point is 5.991465 — Wilson-Hilferty lands within 1%
    assert r["chi2_crit_05"] == pytest.approx(5.991465, rel=0.01)


def test_cliffs_delta_empty_input_raises_two_group_guard(spark):
    """Review finding: an empty frame has ZERO groups, and the two-arm
    guard rejects it with the same message as any other k != 2 (the
    magnitude when-chain was ALSO closed — no otherwise branch — so a
    hypothetical null-delta row can never read as 'large')."""
    from intake_esm_spark.operators.groupstats import cliffs_delta

    empty = spark.createDataFrame([], "g string, v double")
    with pytest.raises(Exception, match="exactly TWO groups"):
        cliffs_delta(empty, "v", "g").collect()
