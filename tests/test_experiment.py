"""A/B two-proportion z-test report (operators/experiment.py)."""

import math

import pytest

from intake_esm_spark.operators.experiment import ab_test_report


def _ref_z(xv, nv, xc, nc):
    p = (xv + xc) / (nv + nc)
    se = math.sqrt(p * (1 - p) * (1 / nv + 1 / nc))
    return (xv / nv - xc / nc) / se


@pytest.fixture(scope="module")
def units(spark):
    rows = (
        [("A", 1)] * 20 + [("A", 0)] * 80     # control: 20%
        + [("B", 1)] * 40 + [("B", 0)] * 60   # treatment: 40%
        + [("C", 1)] * 22 + [("C", 0)] * 78   # near-control: 22%
        + [(None, 1)]                          # null variant excluded
    )
    return spark.createDataFrame(rows, "variant string, converted int")


def test_report_counts_rates_and_z(units):
    out = {r["variant"]: r.asDict() for r in ab_test_report(units, "variant", "converted", control="A").collect()}
    assert set(out) == {"A", "B", "C"}
    assert out["A"]["n_units"] == 100 and out["A"]["n_converted"] == 20
    assert out["A"]["rate"] == 0.2
    assert out["A"]["z_vs_control"] is None  # control vs itself
    assert out["A"]["significant"] == 0
    assert out["B"]["z_vs_control"] == pytest.approx(
        _ref_z(40, 100, 20, 100), abs=1e-6
    )
    assert out["B"]["significant"] == 1    # 20pp lift on n=100: z≈3.09
    assert out["C"]["significant"] == 0    # 2pp lift: z≈0.35
    assert out["C"]["z_vs_control"] == pytest.approx(
        _ref_z(22, 100, 20, 100), abs=1e-6
    )


def test_duplicate_unit_warning_is_callers_problem(spark):
    """The documented precondition: rows are unit-grain. A converted
    column >1 still counts as ONE conversion (the >0 rule)."""
    df = spark.createDataFrame(
        [("A", 3), ("A", 0), ("B", 1), ("B", 1)], "variant string, converted int"
    )
    out = {r["variant"]: r.asDict() for r in ab_test_report(df, "variant", "converted", "A").collect()}
    assert out["A"]["n_converted"] == 1
    assert out["B"]["n_converted"] == 2


def test_missing_control_keeps_variant_rows(spark):
    """ADVICE r7: a control label matching no variant must NOT collapse
    the report to zero rows — variants survive with null z (control
    stats left-join in)."""
    df = spark.createDataFrame(
        [("A", 1), ("A", 0), ("B", 1)], "variant string, converted int"
    )
    out = {
        r["variant"]: r.asDict()
        for r in ab_test_report(df, "variant", "converted", "ZZZ").collect()
    }
    assert set(out) == {"A", "B"}
    assert out["A"]["z_vs_control"] is None
    assert out["A"]["significant"] == 0
    assert out["A"]["rate"] == 0.5


def test_null_converted_counts_as_not_converted(spark):
    """NULL converted = not-converted, explicitly: the unit stays in
    n_units and contributes 0 conversions (no silent rate deflation
    ambiguity)."""
    df = spark.createDataFrame(
        [("A", 1), ("A", None), ("A", 0), ("B", 1)],
        "variant string, converted int",
    )
    out = {
        r["variant"]: r.asDict()
        for r in ab_test_report(df, "variant", "converted", "A").collect()
    }
    assert out["A"]["n_units"] == 3
    assert out["A"]["n_converted"] == 1
    assert out["A"]["rate"] == pytest.approx(1 / 3, abs=1e-6)


def test_did_report_hand_example(spark):
    """T: 10->20 (+10), C: 5->10 (+5) -> DiD = +5; exact means; SE from
    the four sample variances."""
    from intake_esm_spark.operators.experiment import did_report

    rows = (
        [("treatment", "pre", v) for v in (8.0, 12.0)]
        + [("treatment", "post", v) for v in (18.0, 22.0)]
        + [("control", "pre", v) for v in (4.0, 6.0)]
        + [("control", "post", v) for v in (9.0, 11.0)]
        + [("other", "pre", 999.0), ("treatment", "mid", 999.0)]  # ignored
    )
    df = spark.createDataFrame(rows, "grp string, period string, obs double")
    r = did_report(df, "grp", "period", "obs").collect()[0].asDict()
    assert r["n_treat_pre"] == 2 and r["n_ctrl_post"] == 2
    assert r["mean_treat_pre"] == 10.0 and r["mean_treat_post"] == 20.0
    assert r["did_estimate"] == 5.0
    # cell variances: T cells ((8-10)^2+(12-10)^2)/1 = 8 -> /n = 4;
    # C cells = 2 -> /n = 1; SE = sqrt(4+4+1+1) = sqrt(10)
    assert r["did_se"] == pytest.approx(10 ** 0.5, abs=1e-6)


def test_did_report_singleton_cell_nulls_se(spark):
    from intake_esm_spark.operators.experiment import did_report

    rows = [
        ("treatment", "pre", 1.0), ("treatment", "post", 2.0),
        ("control", "pre", 1.0), ("control", "post", 1.5),
    ]
    df = spark.createDataFrame(rows, "grp string, period string, obs double")
    r = did_report(df, "grp", "period", "obs").collect()[0].asDict()
    assert r["did_estimate"] == 0.5
    assert r["did_se"] is None  # n=1 cells -> no variance estimate


# ---------------------------------------------------------------------------
# chi-square independence


def _chi2(spark, rows):
    from intake_esm_spark.operators.experiment import chi_square_report

    df = spark.createDataFrame(rows, "g string, o string")
    return chi_square_report(df, "g", "o").collect()[0]


def test_chi2_hand_example(spark):
    # 2x2: g1 (a:10, b:20), g2 (a:20, b:10); e = 15 everywhere
    rows = (
        [("g1", "a")] * 10 + [("g1", "b")] * 20
        + [("g2", "a")] * 20 + [("g2", "b")] * 10
    )
    r = _chi2(spark, rows)
    assert r["n_units"] == 60 and r["dof"] == 1
    assert r["chi2"] == round(4 * 25 / 15, 6)


def test_chi2_zero_cells_contribute_expected_mass(spark):
    # g1 only 'a', g2 only 'b' -> the two observed-zero cells carry e=2.5
    rows = [("g1", "a")] * 5 + [("g2", "b")] * 5
    r = _chi2(spark, rows)
    assert r["chi2"] == 10.0 and r["dof"] == 1


def test_chi2_independent_is_zero(spark):
    rows = (
        [("g1", "a")] * 6 + [("g1", "b")] * 3
        + [("g2", "a")] * 4 + [("g2", "b")] * 2
    )
    r = _chi2(spark, rows)
    assert r["chi2"] == 0.0


# ---------------------------------------------------------------------------
# Mann-Whitney U


def _mw(spark, rows):
    from intake_esm_spark.operators.experiment import mannwhitney_report

    df = spark.createDataFrame(rows, "g string, v double")
    return mannwhitney_report(df, "g", "v", "t", "c").collect()[0]


def test_mannwhitney_separated_groups(spark):
    # t = {1,2,3}, c = {4,5,6}: R1 = 6, U1 = 0, var = 5.25
    rows = [("t", 1.0), ("t", 2.0), ("t", 3.0),
            ("c", 4.0), ("c", 5.0), ("c", 6.0)]
    r = _mw(spark, rows)
    assert r["n_treat"] == 3 and r["n_control"] == 3
    assert r["u_stat"] == 0.0
    assert r["z"] == round(-4.5 / 5.25 ** 0.5, 6)
    assert r["significant"] == 1


def test_mannwhitney_all_tied_degenerates(spark):
    rows = [("t", 1.0), ("t", 1.0), ("c", 1.0), ("c", 1.0)]
    r = _mw(spark, rows)
    # midrank 2.5 each -> U1 = 2 exactly; tie correction kills the var
    assert r["u_stat"] == 2.0
    assert r["z"] is None and r["significant"] == 0


def test_mannwhitney_empty_group(spark):
    r = _mw(spark, [("t", 1.0), ("t", 2.0)])
    assert r["n_control"] == 0
    assert r["u_stat"] is None and r["z"] is None


# --- ks_test_report -------------------------------------------------------


def _units(spark, rows):
    return spark.createDataFrame(rows, "grp string, val double")


def test_ks_fully_separated(spark):
    """t={1,2} entirely below c={3,4}: D = 1.0 at x=2."""
    df = _units(
        spark, [("t", 1.0), ("t", 2.0), ("c", 3.0), ("c", 4.0)]
    )
    from intake_esm_spark.operators.experiment import ks_test_report

    r = ks_test_report(df, "grp", "val", "t", "c").collect()[0]
    assert (r["n_treat"], r["n_control"]) == (2, 2)
    assert r["d_stat"] == 1.0
    # crit = 1.358102 * sqrt(4/4)
    assert r["d_crit"] == 1.358102
    assert r["significant"] == 0  # 1.0 < crit at n=2+2


def test_ks_interleaved(spark):
    """t={1,3}, c={2,4}: max ECDF gap is 0.5 (after x=1 or x=3)."""
    df = _units(
        spark, [("t", 1.0), ("t", 3.0), ("c", 2.0), ("c", 4.0)]
    )
    from intake_esm_spark.operators.experiment import ks_test_report

    r = ks_test_report(df, "grp", "val", "t", "c").collect()[0]
    assert r["d_stat"] == 0.5


def test_ks_identical_samples_and_ties(spark):
    """Same values in both groups: every ECDF gap is 0."""
    df = _units(
        spark,
        [("t", 1.0), ("t", 2.0), ("c", 1.0), ("c", 2.0)],
    )
    from intake_esm_spark.operators.experiment import ks_test_report

    r = ks_test_report(df, "grp", "val", "t", "c").collect()[0]
    assert r["d_stat"] == 0.0 and r["significant"] == 0


def test_ks_empty_group_nulls(spark):
    df = _units(spark, [("t", 1.0)])
    from intake_esm_spark.operators.experiment import ks_test_report

    r = ks_test_report(df, "grp", "val", "t", "c").collect()[0]
    assert r["d_stat"] is None and r["d_crit"] is None
    assert r["significant"] == 0


# --- bootstrap_mean_ci ----------------------------------------------------


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from intake_esm_spark.operators.experiment import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 21)], "k long, v double"
    )
    r1 = bootstrap_mean_ci(df, "v", "k", n_boot=50).collect()[0]
    r2 = bootstrap_mean_ci(df, "v", "k", n_boot=50).collect()[0]
    assert r1 == r2  # pure hash function of the keys — no RNG state
    assert r1["n_units"] == 20 and r1["mean"] == 10.5
    assert 0 < r1["n_boot"] <= 50
    # every replicate mean is a convex combination of the values
    assert 1.0 <= r1["ci_lo"] <= r1["ci_hi"] <= 20.0
    # a 95% CI from 20 iid-ish units should bracket the sample mean
    assert r1["ci_lo"] <= r1["mean"] <= r1["ci_hi"]


def test_bootstrap_poisson_weights_shift_with_salt(spark):
    """Different salts give different (but each deterministic) CIs."""
    from intake_esm_spark.operators.experiment import bootstrap_mean_ci

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(1, 31)], "k long, v double"
    )
    a = bootstrap_mean_ci(df, "v", "k", n_boot=40, salt="a").collect()[0]
    b = bootstrap_mean_ci(df, "v", "k", n_boot=40, salt="b").collect()[0]
    assert (a["ci_lo"], a["ci_hi"]) != (b["ci_lo"], b["ci_hi"])
    assert a["mean"] == b["mean"]  # the point estimate is resample-free


def test_bootstrap_validation(spark):
    from intake_esm_spark.operators.experiment import bootstrap_mean_ci

    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    import pytest as _pt

    with _pt.raises(ValueError):
        bootstrap_mean_ci(df, "v", "k", n_boot=1)
    with _pt.raises(ValueError):
        bootstrap_mean_ci(df, "v", "k", level=1.0)


# --- cuped_report -----------------------------------------------------------


def test_cuped_perfect_covariate_kills_variance(spark):
    """Metric = covariate + constant lift: theta = 1, the adjusted
    metric is constant per variant -> ~100% variance reduction and the
    tiny lift becomes detectable."""
    from intake_esm_spark.operators.experiment import cuped_report

    rows = []
    for i in range(40):
        x = float(i % 10) * 10.0
        wiggle = 0.01 * float(i % 3)  # keep var(y') > 0 so z is defined
        rows.append(("c", x, x + 1.0 + wiggle))
        rows.append(("t", x, x + 1.5 + wiggle))  # +0.5 lift over control
    df = spark.createDataFrame(rows, "v string, x double, y double")
    out = {r["variant"]: r for r in cuped_report(df, "v", "y", "x", "c").collect()}
    t = out["t"]
    assert t["var_reduction_pct"] > 99.9
    assert out["c"]["z_adj"] is None  # control row carries no z
    assert t["z_adj"] is not None and t["significant"] == 1
    # adjusted means keep the unbiased lift
    assert t["mean_adj"] - out["c"]["mean_adj"] == pytest.approx(0.5, abs=1e-6)


def test_cuped_useless_covariate_no_reduction(spark):
    """Covariate constant: var(x)=0 -> theta=0, adjusted == raw."""
    from intake_esm_spark.operators.experiment import cuped_report

    rows = [("c", 1.0, float(i % 7)) for i in range(20)] + [
        ("t", 1.0, float(i % 7) + 1.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "v string, x double, y double")
    out = {r["variant"]: r for r in cuped_report(df, "v", "y", "x", "c").collect()}
    for r in out.values():
        assert r["mean_adj"] == r["mean_raw"]
        assert r["var_reduction_pct"] == 0.0


def test_cuped_null_rows_excluded(spark):
    from intake_esm_spark.operators.experiment import cuped_report

    rows = [("c", 1.0, 2.0), ("c", None, 3.0), ("t", 1.0, None), ("t", 2.0, 4.0)]
    df = spark.createDataFrame(rows, "v string, x double, y double")
    out = {r["variant"]: r["n_units"] for r in cuped_report(df, "v", "y", "x", "c").collect()}
    assert out == {"c": 1, "t": 1}


# --- srm_report -------------------------------------------------------------


def test_srm_balanced_split(spark):
    from intake_esm_spark.operators.experiment import srm_report

    rows = [("a",)] * 50 + [("b",)] * 50
    df = spark.createDataFrame(rows, "variant string")
    out = {
        r["variant"]: r
        for r in srm_report(df, "variant", [("a", 0.5), ("b", 0.5)]).collect()
    }
    assert out["a"]["n_obs"] == 50 and out["a"]["n_expected"] == 50.0
    assert out["a"]["chi2_contribution"] == 0.0
    assert out["a"]["n_unassigned"] == 0


def test_srm_mismatch_and_unassigned(spark):
    from intake_esm_spark.operators.experiment import srm_report

    rows = [("a",)] * 75 + [("b",)] * 25 + [("zzz",)] * 7 + [(None,)]
    df = spark.createDataFrame(rows, "variant string")
    out = {
        r["variant"]: r
        for r in srm_report(df, "variant", [("a", 0.5), ("b", 0.5)]).collect()
    }
    # N = 100 configured units; zzz is unassigned, null excluded
    assert out["a"]["n_expected"] == 50.0
    assert out["a"]["chi2_contribution"] == 12.5  # (75-50)^2/50
    assert out["b"]["chi2_contribution"] == 12.5
    assert out["a"]["n_unassigned"] == 7 and out["b"]["n_unassigned"] == 7


def test_srm_missing_arm_counts_zero(spark):
    from intake_esm_spark.operators.experiment import srm_report

    df = spark.createDataFrame([("a",)] * 10, "variant string")
    out = {
        r["variant"]: r
        for r in srm_report(df, "variant", [("a", 0.9), ("b", 0.1)]).collect()
    }
    assert out["b"]["n_obs"] == 0 and out["b"]["n_expected"] == 1.0
    assert out["b"]["chi2_contribution"] == 1.0  # (0-1)^2/1


def test_srm_validation(spark):
    from intake_esm_spark.operators.experiment import srm_report

    df = spark.createDataFrame([("a",)], "variant string")
    with pytest.raises(ValueError):
        srm_report(df, "variant", [])
    with pytest.raises(ValueError):
        srm_report(df, "variant", [("a", 0.5), ("a", 0.5)])
    with pytest.raises(ValueError):
        srm_report(df, "variant", [("a", 0.0)])


# --- ips_value --------------------------------------------------------------


def test_ips_identity_policy(spark):
    from intake_esm_spark.operators.experiment import ips_value

    # target == logging => every weight 1, IPS = SNIPS = plain mean
    rows = [(10.0, 0.2, 0.2), (20.0, 0.5, 0.5), (30.0, 0.3, 0.3)]
    df = spark.createDataFrame(rows, "r double, pt double, pl double")
    out = ips_value(df, "r", "pt", "pl").collect()[0]
    assert out["n_units"] == 3 and out["n_clipped"] == 0
    assert out["mean_weight"] == 1.0
    assert out["ips_value"] == 20.0 and out["snips_value"] == 20.0


def test_ips_clipping_and_diagnostics(spark):
    from intake_esm_spark.operators.experiment import ips_value

    # raw weights: 5.0 (clipped to 2), 0.5
    rows = [(10.0, 0.5, 0.1), (10.0, 0.1, 0.2)]
    df = spark.createDataFrame(rows, "r double, pt double, pl double")
    out = ips_value(df, "r", "pt", "pl", clip=2.0).collect()[0]
    assert out["n_clipped"] == 1
    assert out["mean_weight"] == 1.25  # (2 + .5)/2
    assert out["ips_value"] == 12.5    # (20 + 5)/2
    assert out["snips_value"] == 10.0  # 25/2.5


def test_ips_excludes_invalid_rows(spark):
    from intake_esm_spark.operators.experiment import ips_value

    rows = [(10.0, 0.2, 0.2), (99.0, 0.2, 0.0), (None, 0.2, 0.2)]
    df = spark.createDataFrame(rows, "r double, pt double, pl double")
    out = ips_value(df, "r", "pt", "pl").collect()[0]
    assert out["n_units"] == 1 and out["ips_value"] == 10.0
    with pytest.raises(ValueError):
        ips_value(df, "r", "pt", "pl", clip=0.0)


def test_ips_boundary_weight_counts_as_clipped(spark):
    from intake_esm_spark.operators.experiment import ips_value

    # raw weight EXACTLY on the clip: the estimator is saturated at the
    # boundary, so the diagnostic must count it (>= not strict >)
    rows = [(10.0, 0.4, 0.2), (10.0, 0.1, 0.2)]  # raw 2.0 and 0.5
    df = spark.createDataFrame(rows, "r double, pt double, pl double")
    out = ips_value(df, "r", "pt", "pl", clip=2.0).collect()[0]
    assert out["n_clipped"] == 1
    assert out["mean_weight"] == 1.25  # value path unchanged by the count


# --- quantile_treatment_effects ---------------------------------------------


def test_qte_uniform_shift(spark):
    from intake_esm_spark.operators.experiment import (
        quantile_treatment_effects,
    )

    # treatment = control + 10 everywhere: every QTE is exactly 10
    c = [("c", float(v)) for v in range(1, 10)]
    t = [("t", float(v) + 10.0) for v in range(1, 10)]
    df = spark.createDataFrame(c + t, "g string, v double")
    out = quantile_treatment_effects(df, "g", "v", "t", "c").collect()
    assert len(out) == 3
    for r in out:
        assert r["qte"] == 10.0
        assert r["q_treatment"] == r["q_control"] + 10.0


def test_qte_probs_and_missing_arm(spark):
    from intake_esm_spark.operators.experiment import (
        quantile_treatment_effects,
    )

    df = spark.createDataFrame(
        [("c", 1.0), ("c", 2.0), ("c", 3.0)], "g string, v double"
    )
    out = quantile_treatment_effects(
        df, "g", "v", "t", "c", probs=[0.5]
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["prob"] == 0.5 and r["q_control"] == 2.0
    assert r["q_treatment"] is None and r["qte"] is None
    with pytest.raises(ValueError):
        quantile_treatment_effects(df, "g", "v", "t", "c", probs=[])


# --- trend_test (Cochran-Armitage) ------------------------------------------


def test_trend_monotone_vs_flat(spark):
    from intake_esm_spark.operators.experiment import trend_test

    # conversion rises with dose 0/1/2: strong positive z
    rows = (
        [(0.0, 0)] * 90 + [(0.0, 1)] * 10
        + [(1.0, 0)] * 50 + [(1.0, 1)] * 50
        + [(2.0, 0)] * 10 + [(2.0, 1)] * 90
    )
    df = spark.createDataFrame(rows, "dose double, conv int")
    r = trend_test(df, "dose", "conv").collect()[0]
    assert r["n_units"] == 300 and r["n_doses"] == 3
    assert r["z"] > 10 and r["significant"] == 1

    # same pooled rate, flat across doses: z ~ 0
    flat = [(float(d), c) for d in range(3) for c in [0] * 50 + [1] * 50]
    df2 = spark.createDataFrame(flat, "dose double, conv int")
    r2 = trend_test(df2, "dose", "conv").collect()[0]
    assert abs(r2["z"]) < 1e-9 and r2["significant"] == 0


def test_trend_reference_formula(spark):
    import math

    import pytest as _pt

    from intake_esm_spark.operators.experiment import trend_test

    rows = [(0.0, 0), (0.0, 1), (1.0, 1), (1.0, 1), (2.0, 1), (2.0, 0)]
    df = spark.createDataFrame(rows, "dose double, conv int")
    r = trend_test(df, "dose", "conv").collect()[0]
    n = len(rows)
    conv = sum(c for _, c in rows)
    sx = sum(d for d, _ in rows)
    sxx = sum(d * d for d, _ in rows)
    sxc = sum(d for d, c in rows if c)
    pb = conv / n
    z = (sxc - pb * sx) / math.sqrt(pb * (1 - pb) * (sxx - sx * sx / n))
    assert r["z"] == _pt.approx(z, abs=1e-6)


def test_trend_degenerate_null(spark):
    from intake_esm_spark.operators.experiment import trend_test

    # constant dose: no trend direction exists
    df = spark.createDataFrame(
        [(1.0, 0), (1.0, 1)], "dose double, conv int"
    )
    r = trend_test(df, "dose", "conv").collect()[0]
    assert r["z"] is None and r["significant"] == 0
    # all converted: pooled rate 1 degenerates the variance
    df2 = spark.createDataFrame(
        [(0.0, 1), (1.0, 1)], "dose double, conv int"
    )
    assert trend_test(df2, "dose", "conv").collect()[0]["z"] is None


# --- power_mde_report --------------------------------------------------------


def test_power_mde_hand_case(spark):
    import math

    import pytest as _pt

    from intake_esm_spark.operators.experiment import power_mde_report

    # both arms [1,2,3]: var 1 each, se = sqrt(2/3)
    rows = [("t", 1.0), ("t", 2.0), ("t", 3.0),
            ("c", 1.0), ("c", 2.0), ("c", 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = power_mde_report(df, "g", "v", "t", "c").collect()[0]
    assert (out["n_treatment"], out["n_control"]) == (3, 3)
    se = math.sqrt(2.0 / 3.0)
    assert out["se_diff"] == _pt.approx(se, abs=1e-6)
    assert out["mde_abs"] == _pt.approx((1.959964 + 0.841621) * se, abs=1e-6)
    assert out["mean_control"] == 2.0
    assert out["mde_rel"] == _pt.approx(out["mde_abs"] / 2.0, rel=1e-4)

    # an arm with < 2 units has no variance estimate
    small = spark.createDataFrame([("t", 1.0), ("c", 2.0)], "g string, v double")
    r = power_mde_report(small, "g", "v", "t", "c").collect()[0]
    assert r["mde_abs"] is None and r["mean_control"] == 2.0
    with _pt.raises(ValueError):
        power_mde_report(df, "g", "v", "t", "c", z_alpha=0.0)


# --- stream_srm --------------------------------------------------------------


def test_stream_srm_matches_batch(spark, tmp_path):
    """Two micro-batches of assigned units: the LAST update per variant,
    snapshotted through srm_from_counts, equals the whole-corpus batch
    srm_report exactly (integer counters — the calibration-twin parity
    argument verbatim)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from intake_esm_spark.operators.experiment import (
        srm_from_counts,
        srm_report,
    )
    from intake_esm_spark.streaming.stateful import stream_srm

    shares = [("a", 0.5), ("b", 0.5)]
    rows = (
        [("a",)] * 11 + [("b",)] * 7 + [("holdout",)] * 3 + [("ghost",)] * 2
    )
    df = spark.createDataFrame(rows, "variant string")
    batch = {
        r["variant"]: r
        for r in srm_report(df, "variant", shares).collect()
    }

    src = tmp_path / "flat"
    src.mkdir()
    df.withColumn("__h", F.crc32(F.col("variant")) + F.lit(1)).filter(
        F.col("__h") % 2 == 0
    ).drop("__h").repartition(1).write.parquet(str(tmp_path / "a"))
    df.withColumn("__h", F.crc32(F.col("variant")) + F.lit(1)).filter(
        F.col("__h") % 2 == 1
    ).drop("__h").repartition(1).write.parquet(str(tmp_path / "b"))
    for i, f in enumerate(
        sorted(glob.glob(str(tmp_path / "[ab]" / "*.parquet")))
    ):
        shutil.copy(f, src / f"part{i}.parquet")
    stream = (
        spark.readStream.schema("variant string")
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(str(src))
    )
    out = stream_srm(stream, "variant", shares)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("srm_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM srm_stream").collect()
    finally:
        q.stop()
    # state is bounded: configured arms + the one __unassigned counter
    assert {r["variant"] for r in emitted} <= {"a", "b", "__unassigned"}
    last = {}
    for r in emitted:  # memory sink appends updates in batch order
        last[r["variant"]] = r["__c"]
    counts = spark.createDataFrame(
        [(k, v) for k, v in last.items()], "variant string, __c long"
    )
    streamed = {
        r["variant"]: r
        for r in srm_from_counts(counts, shares).collect()
    }
    assert set(streamed) == set(batch)
    for k in batch:
        for c in (
            "n_obs",
            "n_expected",
            "expected_share",
            "chi2_contribution",
            "n_unassigned",
        ):
            assert streamed[k][c] == batch[k][c], (k, c)
    # the unassigned fold caught both garbage labels
    assert batch["a"]["n_unassigned"] == 5


def test_power_mde_constant_arms_zero_not_nan(spark):
    """A constant arm's variance expansion can dip ~1e-10 below zero in
    float; sqrt of that is NaN, which Spark sorts ABOVE every number —
    a silent poison for any downstream effect >= mde gate. Clamped to
    exactly 0."""
    import math

    from intake_esm_spark.operators.experiment import power_mde_report

    rows = [("t", 817.077202)] * 30 + [("c", 817.077202)] * 30
    df = spark.createDataFrame(rows, "g string, v double")
    out = power_mde_report(df, "g", "v", "t", "c").collect()[0]
    for c in ("se_diff", "mde_abs", "mde_rel"):
        assert out[c] is not None and not math.isnan(out[c]), c
    assert out["se_diff"] == 0.0 and out["mde_abs"] == 0.0


# --- qini_report -------------------------------------------------------------


def test_qini_hand_case(spark):
    import pytest as _pt

    from intake_esm_spark.operators.experiment import qini_report

    # 8 units, scores 8..1 desc, alternating arms; hand-traced cums
    rows = [
        (1, 8.0, 1, 1), (2, 7.0, 0, 0), (3, 6.0, 1, 1), (4, 5.0, 0, 1),
        (5, 4.0, 1, 0), (6, 3.0, 0, 0), (7, 2.0, 1, 0), (8, 1.0, 0, 1),
    ]
    df = spark.createDataFrame(rows, "id int, s double, t int, y int")
    out = {
        r["bin"]: r
        for r in qini_report(df, "t", "y", "s", "id", n_bins=4).collect()
    }
    assert out[1]["uplift_at_depth"] == 1.0 and out[1]["qini"] == 1.0
    assert out[2]["uplift_at_depth"] == 0.5 and out[2]["qini"] == 1.0
    assert out[3]["uplift_at_depth"] == _pt.approx(1 / 3, abs=1e-6)
    assert out[3]["qini"] == 1.0
    assert out[4]["uplift_at_depth"] == 0.0 and out[4]["qini"] == 0.0
    assert out[4]["cum_n_treat"] == 4 and out[4]["cum_resp_ctrl"] == 2
    with _pt.raises(ValueError):
        qini_report(df, "t", "y", "s", "id", n_bins=1)


def test_qini_flat_for_pure_propensity_score(spark):
    """A score that ranks by OUTCOME propensity (not uplift) puts equal
    treated/control responders first — qini stays ~0 at every depth
    when arms behave identically."""
    from intake_esm_spark.operators.experiment import qini_report

    rows = []
    for i in range(200):
        y = 1 if i < 100 else 0
        rows.append((i, float(200 - i), i % 2, y))
    df = spark.createDataFrame(rows, "id int, s double, t int, y int")
    out = qini_report(df, "t", "y", "s", "id", n_bins=5).collect()
    for r in out:
        assert abs(r["qini"]) < 1e-9, r


# --- proportion_ci_report / eb_shrunk_rates ----------------------------------


def test_wilson_ci_hand_case_and_bounds(spark):
    import math

    import pytest as _pt

    from intake_esm_spark.operators.experiment import proportion_ci_report

    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] + [("c", 0)] * 5
    df = spark.createDataFrame(rows, "variant string, conv int")
    out = {
        r["variant"]: r
        for r in proportion_ci_report(df, "variant", "conv").collect()
    }
    # hand Wilson for a: p=.8 n=10 z=1.959964
    z = 1.959964
    p, n = 0.8, 10.0
    c = p + z * z / (2 * n)
    mgn = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    d = 1 + z * z / n
    assert out["a"]["ci_low"] == _pt.approx((c - mgn) / d, abs=1e-6)
    assert out["a"]["ci_high"] == _pt.approx((c + mgn) / d, abs=1e-6)
    # 1/1 and 0/5 stay inside [0, 1] with nonzero width (not Wald)
    assert 0.0 < out["b"]["ci_low"] < 1.0 and out["b"]["ci_high"] == 1.0
    assert out["c"]["ci_low"] == 0.0 and 0.0 < out["c"]["ci_high"] < 1.0
    with _pt.raises(ValueError):
        proportion_ci_report(df, "variant", "conv", z=0.0)


def test_eb_shrinkage_pulls_small_samples_harder(spark):
    import pytest as _pt

    from intake_esm_spark.operators.experiment import eb_shrunk_rates

    # twenty 50-trial entities with rates tightly around 0.5 define a
    # STRONG prior (low across-entity variance); a 1/1 entity should be
    # pulled hard toward it while a 1000-trial entity barely moves
    df_rows = []
    for k in range(20):
        x = 23 + (k % 5)  # 23..27 of 50 -> rates 0.46..0.54
        df_rows += [(f"e{k}", 1)] * x + [(f"e{k}", 0)] * (50 - x)
    big = [("big", 1)] * 480 + [("big", 0)] * 520  # 0.48 over 1000
    tiny = [("tiny", 1)]  # 1/1
    df = spark.createDataFrame(
        df_rows + big + tiny, "key string, conv int"
    )
    out = {
        r["key"]: r for r in eb_shrunk_rates(df, "key", "conv").collect()
    }
    assert out["tiny"]["rate"] == 1.0
    # the 1-trial entity is pulled far toward the prior mean...
    assert out["tiny"]["shrunk_rate"] < 0.8
    # ...while the 1000-trial entity barely moves
    assert abs(out["big"]["shrunk_rate"] - 0.48) < 0.02
    assert out["big"]["prior_strength"] is not None


def test_eb_shrinkage_degenerate_prior_falls_back_to_raw(spark):
    from intake_esm_spark.operators.experiment import eb_shrunk_rates

    # all entities share one rate -> zero variance -> no prior
    rows = [(f"e{k}", 1) for k in range(5)]
    df = spark.createDataFrame(rows, "key string, conv int")
    for r in eb_shrunk_rates(df, "key", "conv").collect():
        assert r["prior_strength"] is None
        assert r["shrunk_rate"] == r["rate"] == 1.0


def test_msprt_matches_closed_form_and_caps_at_one(spark):
    """msprt_report reproduces the mixture-SPRT closed form over the
    four exact arm integers, and the always-valid p caps at 1 for a
    null effect (the LR can dip below 1; the p may not exceed it)."""
    import math

    from intake_esm_spark.operators.experiment import msprt_report

    rows = (
        [("t", 1)] * 400 + [("t", 0)] * 600
        + [("c", 1)] * 300 + [("c", 0)] * 700
    )
    df = spark.createDataFrame(rows, "variant string, converted int")
    out = msprt_report(df, "variant", "converted", "t", "c", tau=0.05).collect()[0]
    assert (out["n_treatment"], out["conv_treatment"]) == (1000, 400)
    assert (out["n_control"], out["conv_control"]) == (1000, 300)
    pt, pc = 0.4, 0.3
    v = pt * (1 - pt) / 1000 + pc * (1 - pc) / 1000
    t2 = 0.05 * 0.05
    lr = math.sqrt(v / (v + t2)) * math.exp((pt - pc) ** 2 * t2 / (2 * v * (v + t2)))
    assert out["lr"] == round(lr, 6)
    assert out["always_valid_p"] == round(min(1.0, 1.0 / lr), 6)
    assert out["significant"] == (1 if round(min(1.0, 1.0 / lr), 6) <= 0.05 else 0)
    # a strong uplift this size must reject
    assert out["significant"] == 1

    # null effect: LR < 1 (the prior spreads mass over effects that
    # didn't happen), p capped at exactly 1, never significant
    rows0 = [("t", i % 10 == 0) for i in range(500)] + [
        ("c", i % 10 == 0) for i in range(500)
    ]
    df0 = spark.createDataFrame(
        [(v, int(c)) for v, c in rows0], "variant string, converted int"
    )
    out0 = msprt_report(df0, "variant", "converted", "t", "c").collect()[0]
    assert out0["lr"] < 1.0
    assert out0["always_valid_p"] == 1.0
    assert out0["significant"] == 0


def test_msprt_degenerate_and_null_handling(spark):
    """Degenerate variance (both arms all-0) and a missing arm yield
    null lr/p with significant = 0; NULL conversions count as
    not-converted (the ab_test_report contract)."""
    from intake_esm_spark.operators.experiment import msprt_report

    allzero = spark.createDataFrame(
        [("t", 0)] * 5 + [("c", 0)] * 5, "variant string, converted int"
    )
    r = msprt_report(allzero, "variant", "converted", "t", "c").collect()[0]
    assert r["lr"] is None and r["always_valid_p"] is None
    assert r["significant"] == 0

    onearm = spark.createDataFrame(
        [("t", 1), ("t", 0)], "variant string, converted int"
    )
    r1 = msprt_report(onearm, "variant", "converted", "t", "c").collect()[0]
    assert r1["n_control"] == 0 and r1["rate_control"] is None
    assert r1["always_valid_p"] is None and r1["significant"] == 0

    nulls = spark.createDataFrame(
        [("t", 1), ("t", None), ("c", 1), ("c", 0)],
        "variant string, converted int",
    )
    rn = msprt_report(nulls, "variant", "converted", "t", "c").collect()[0]
    assert (rn["n_treatment"], rn["conv_treatment"]) == (2, 1)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        msprt_report(nulls, "variant", "converted", "t", "c", tau=0.0)
    with _pytest.raises(ValueError):
        msprt_report(nulls, "variant", "converted", "t", "c", alpha=1.5)


def test_stream_msprt_matches_batch(spark, tmp_path):
    """Two micro-batches of units: the LAST update equals the batch
    mSPRT report exactly (four integer counters into fixed IEEE
    expressions — the scoring-rules-twin parity argument verbatim),
    and intermediate updates are themselves valid readouts (the
    always-valid property is the twin's reason to exist)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from intake_esm_spark.operators.experiment import msprt_report
    from intake_esm_spark.streaming.stateful import stream_msprt

    rows = [("t", i % 3 == 0) for i in range(60)] + [
        ("c", i % 5 == 0) for i in range(60)
    ]
    df = spark.createDataFrame(
        [(v, int(c)) for v, c in rows], "variant string, converted int"
    )
    batch = msprt_report(df, "variant", "converted", "t", "c").collect()[0]

    src = tmp_path / "flat"
    src.mkdir()
    df.filter(F.crc32(F.col("variant")) % 2 == 0).repartition(1).write.parquet(
        str(tmp_path / "a")
    )
    df.filter(F.crc32(F.col("variant")) % 2 == 1).repartition(1).write.parquet(
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
    out = stream_msprt(stream, "variant", "converted", "t", "c")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("msprt_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt_msprt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql("SELECT * FROM msprt_stream").collect()
    finally:
        q.stop()
    last = emitted[-1]
    for c in (
        "n_treatment", "n_control", "conv_treatment", "conv_control",
        "rate_treatment", "rate_control", "uplift", "lr",
        "always_valid_p", "significant",
    ):
        assert last[c] == batch[c], (c, last[c], batch[c])
    # every intermediate update is a well-formed readout
    for r in emitted:
        assert r["always_valid_p"] is None or 0.0 <= r["always_valid_p"] <= 1.0


def test_bh_adjust_matches_stepup_reference(spark):
    """bh_adjust == the textbook step-up computed in Python (suffix min
    of p*n/rank over the sorted p's, capped at 1), including heavy p
    ties (all members of a tie group share one q — the grain the
    distributed form stands on) and null/NaN exclusion."""
    import math

    from intake_esm_spark.operators.experiment import bh_adjust

    ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205,
          0.212, 0.216, 0.222, 0.251, 0.269, 0.275, 0.34, 0.341,
          0.05, 0.05, 0.05, 0.05]  # a 4-way tie group
    rows = [(f"m{i:02d}", p) for i, p in enumerate(ps)]
    rows += [("null_p", None), ("nan_p", float("nan"))]
    df = spark.createDataFrame(rows, "metric string, pv double")

    def reference(pvals):
        n = len(pvals)
        order = sorted(range(n), key=lambda i: pvals[i])
        q = [None] * n
        running = math.inf
        for pos in range(n - 1, -1, -1):
            i = order[pos]
            running = min(running, pvals[i] * n / (pos + 1))
            q[i] = min(1.0, running)
        return q

    expect_q = reference(ps)
    out = {r["metric"]: r for r in bh_adjust(df, "pv", "metric").collect()}
    assert "null_p" not in out and "nan_p" not in out
    assert len(out) == len(ps)
    for i, p in enumerate(ps):
        r = out[f"m{i:02d}"]
        assert r["n_tests"] == len(ps)
        assert r["q"] == round(expect_q[i], 6), (i, p, r["q"], expect_q[i])
        assert r["rejected"] == int(round(expect_q[i], 6) <= 0.05)
    # the 4-way tie at p=0.05 shares one q
    tie_qs = {out[f"m{i:02d}"]["q"] for i in (16, 17, 18, 19)}
    assert len(tie_qs) == 1
    # q is monotone in p
    qs = [out[f"m{i:02d}"]["q"] for i in sorted(range(len(ps)), key=lambda i: ps[i])]
    assert qs == sorted(qs)

    with __import__("pytest").raises(ValueError):
        bh_adjust(df, "pv", "metric", alpha=0.0)


def test_bucketed_cummin_equals_window_min(spark):
    """bucketed_cummin == an unpartitioned running min over the same
    order, for asc/desc and frames with nulls in the min column (the
    empty-prefix identity must stay null, not a sentinel)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.ranks import bucketed_cummin

    rows = [
        (i, float(i % 13), None if i % 7 == 0 else float((i * 31) % 97))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, v double, x double")
    for desc in (False, True):
        order = [
            F.col("v").desc() if desc else F.col("v").asc(),
            F.col("id").asc(),
        ]
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        expect = {
            r["id"]: r["m"]
            for r in df.withColumn("m", F.min("x").over(w)).collect()
        }
        got = {
            r["id"]: r["__cum_x"]
            for r in bucketed_cummin(
                df, ["x"], val_col="v", tiebreaks=["id"], descending=desc
            ).collect()
        }
        assert got == expect


def test_trimmed_means_report_matches_reference(spark):
    """trimmed_means_report == the textbook per-arm trimmed mean
    (drop floor(trim*n) from each tail), on a frame with heavy value
    ties straddling the cut (the tie-group partial-mass case) and a
    whale that only the raw mean sees."""
    from intake_esm_spark.operators.experiment import trimmed_means_report

    tvals = [10.0] * 8 + [20.0] * 8 + [30.0] * 3 + [100000.0]
    cvals = [10.0] * 10 + [20.0] * 9 + [30.0]
    rows = [("t", v) for v in tvals] + [("c", v) for v in cvals]
    df = spark.createDataFrame(rows, "arm string, val double")
    out = trimmed_means_report(df, "arm", "val", "t", "c", trim=0.1).collect()[0]

    def ref(vals, trim):
        k = int(trim * len(vals))
        kept = sorted(vals)[k: len(vals) - k]
        return sum(kept) / len(kept), len(kept)

    tm_t, nk_t = ref(tvals, 0.1)
    tm_c, nk_c = ref(cvals, 0.1)
    assert out["n_treatment"] == 20 and out["n_control"] == 20
    assert out["n_kept_treatment"] == nk_t
    assert out["n_kept_control"] == nk_c
    assert out["trimmed_mean_treatment"] == round(tm_t, 6)
    assert out["trimmed_mean_control"] == round(tm_c, 6)
    assert out["mean_treatment"] == round(sum(tvals) / 20, 6)
    # the whale moves the raw mean thousands of points; trimmed barely
    assert out["mean_diff"] > 4000
    assert abs(out["trimmed_mean_diff"]) < 10

    # degenerate: empty trimmed window (n too small for the trim)
    tiny = spark.createDataFrame(
        [("t", 1.0), ("c", 2.0)], "arm string, val double"
    )
    r = trimmed_means_report(tiny, "arm", "val", "t", "c", trim=0.4).collect()[0]
    assert r["n_treatment"] == 1 and r["n_kept_treatment"] == 1
    assert r["trimmed_mean_treatment"] == 1.0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        trimmed_means_report(tiny, "arm", "val", "t", "c", trim=0.5)
