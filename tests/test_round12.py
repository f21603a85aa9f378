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
