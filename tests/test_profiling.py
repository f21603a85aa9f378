"""Exact one-pass correlation matrix (operators/profiling.py)."""

import numpy as np
import pytest

from intake_esm_spark.operators.profiling import correlation_matrix


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(10, 2, 200).round(3)
    b = (2 * a + rng.normal(0, 1, 200)).round(3)   # strongly correlated
    c = rng.normal(0, 5, 200).round(3)             # independent
    rows = [(float(x), float(y), float(z)) for x, y, z in zip(a, b, c)]
    return spark.createDataFrame(rows, "a double, b double, c double"), (a, b, c)


def test_matches_numpy_corrcoef(frame):
    df, (a, b, c) = frame
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in correlation_matrix(df, ["a", "b", "c"]).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    m = np.corrcoef(np.vstack([a, b, c]))
    assert got[("a", "b")] == pytest.approx(m[0, 1], abs=1e-6)
    assert got[("a", "c")] == pytest.approx(m[0, 2], abs=1e-6)
    assert got[("b", "c")] == pytest.approx(m[1, 2], abs=1e-6)
    assert got[("a", "b")] > 0.95


def test_constant_column_is_null(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, k double"
    )
    out = correlation_matrix(df, ["x", "k"]).collect()
    assert out[0]["corr"] is None


def test_null_rows_are_complete_case_deleted(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (None, 100.0), (4.0, None)],
        "x double, y double",
    )
    out = correlation_matrix(df, ["x", "y"]).collect()[0]
    assert out["corr"] == 1.0  # only the 3 complete, perfectly-linear rows


def test_partition_independent(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(100)], "x double, y double"
    )
    one = correlation_matrix(df, ["x", "y"]).collect()[0]["corr"]
    many = correlation_matrix(df.repartition(17), ["x", "y"]).collect()[0]["corr"]
    assert one == many


def test_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        correlation_matrix(df, ["x"])


# ---------------------------------------------------------------------------
# winsorize


def test_winsorize_clamps_to_group_fences(spark):
    from intake_esm_spark.operators.profiling import winsorize

    rows = [("g", float(v)) for v in range(1, 100)] + [
        ("g", 10_000.0),      # the outlier
        ("h", 5.0),
        ("h", None),          # null stays null
    ]
    df = spark.createDataFrame(rows, "grp string, x double")
    out = {
        (r["grp"], r["x"]): r["x_w"]
        for r in winsorize(df, "x", ["grp"], 0.01, 0.99).collect()
    }
    assert out[("g", 10_000.0)] < 10_000.0  # capped at the p99 fence
    assert out[("g", 50.0)] == 50.0         # interior values untouched
    assert out[("h", 5.0)] == 5.0           # single-value group: lo==hi==x
    assert out[("h", None)] is None         # null guarded, NOT set to lo


def test_winsorize_global_and_validation(spark):
    from intake_esm_spark.operators.profiling import winsorize

    df = spark.createDataFrame(
        [(float(v),) for v in range(100)], "x double"
    )
    out = winsorize(df, "x", None, 0.10, 0.90).collect()
    ws = [r["x_w"] for r in out]
    assert min(ws) == pytest.approx(9.9) and max(ws) == pytest.approx(89.1)
    with pytest.raises(ValueError):
        winsorize(df, "x", None, 0.9, 0.1)


# ---------------------------------------------------------------------------
# target encoding


def test_target_encode_loo_and_fallbacks(spark):
    from intake_esm_spark.operators.profiling import target_encode

    rows = [
        ("a", 10.0), ("a", 20.0), ("a", 30.0),  # LOO means: 25, 20, 15
        ("b", 100.0),                            # singleton -> prior
        ("a", None),                             # null target -> cat mean
        (None, 50.0),                            # null cat -> prior
    ]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = [
        (r["cat"], r["y"], r["cat_te"])
        for r in target_encode(df, "cat", "y").collect()
    ]
    prior = (10 + 20 + 30 + 100 + 50) / 5
    enc = {(c, y): e for c, y, e in out}
    assert enc[("a", 10.0)] == 25.0
    assert enc[("a", 20.0)] == 20.0
    assert enc[("a", 30.0)] == 15.0
    assert enc[("b", 100.0)] == pytest.approx(prior, abs=1e-6)
    assert enc[("a", None)] == 20.0   # category mean of non-null targets
    assert enc[(None, 50.0)] == pytest.approx(prior, abs=1e-6)


def test_target_encode_does_not_leak_own_row(spark):
    """The defining property: a row's encoding is independent of its own
    target — change y_i, every OTHER a-row's encoding moves, row i's
    stays a function of the others."""
    from intake_esm_spark.operators.profiling import target_encode

    base = [("a", 10.0), ("a", 20.0)]
    df1 = spark.createDataFrame(base, "cat string, y double")
    df2 = spark.createDataFrame([("a", 10.0), ("a", 99.0)], "cat string, y double")
    e1 = {r["y"]: r["cat_te"] for r in target_encode(df1, "cat", "y").collect()}
    e2 = {r["y"]: r["cat_te"] for r in target_encode(df2, "cat", "y").collect()}
    assert e1[10.0] == 20.0 and e2[10.0] == 99.0  # others moved it
    assert e1[20.0] == 10.0 and e2[99.0] == 10.0  # own row never leaks


# ---------------------------------------------------------------------------
# trend lines (closed-form OLS)


def test_trend_matches_numpy_polyfit(spark):
    from intake_esm_spark.operators.profiling import trend_lines

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 10, 300).round(3)
    y = (2.5 * x + 7.0 + rng.normal(0, 0.5, 300)).round(3)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    out = trend_lines(df, "x", "y").collect()[0]
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert out["n"] == 300
    assert out["slope"] == pytest.approx(slope, abs=1e-6)
    assert out["intercept"] == pytest.approx(intercept, abs=1e-6)
    assert out["r2"] == pytest.approx(r * r, abs=1e-6)


def test_trend_per_group_and_degenerate_x(spark):
    from intake_esm_spark.operators.profiling import trend_lines

    rows = (
        [("a", float(i), float(3 * i + 1)) for i in range(10)]  # exact line
        + [("b", 5.0, float(i)) for i in range(5)]              # constant x
        + [("a", None, 1.0), ("a", 1.0, None)]                  # dropped
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r.asDict() for r in trend_lines(df, "x", "y", ["g"]).collect()}
    assert out["a"]["n"] == 10
    assert out["a"]["slope"] == 3.0 and out["a"]["intercept"] == 1.0
    assert out["a"]["r2"] == 1.0
    assert out["b"]["slope"] is None and out["b"]["r2"] is None


def _plan_str(df):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_winsorize_approx_path_drops_exact_aggregate(spark):
    """VERDICT r7 #5: exact=False must actually plan approx_percentile
    (fixed-size GK summary, map-side foldable) instead of the
    value-buffering exact percentile — and still clamp sanely."""
    from intake_esm_spark.operators.profiling import winsorize

    df = spark.createDataFrame(
        [(g, float(v)) for g in ("a", "b") for v in range(1, 101)],
        "g string, v double",
    )
    out = winsorize(df, "v", ["g"], 0.10, 0.90, exact=False)
    plan = _plan_str(out)
    assert "approx_percentile" in plan
    assert "percentile(v" not in plan.replace("approx_percentile", "")
    rows = out.collect()
    assert all(10.0 <= r["v_w"] <= 91.0 for r in rows)
    # exact and approx agree on this tiny distribution to within 1 rank
    exact_rows = {
        (r["g"], r["v"]): r["v_w"]
        for r in winsorize(df, "v", ["g"], 0.10, 0.90).collect()
    }
    for r in rows:
        assert abs(r["v_w"] - exact_rows[(r["g"], r["v"])]) <= 1.0


def test_group_quantiles_exact_matches_manual(spark):
    from intake_esm_spark.operators.profiling import group_quantiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 5)], "g string, v double"
    )
    out = group_quantiles(df, "v", ["g"], [0.5], out_cols=["med"]).collect()
    assert out[0]["med"] == 2.5  # type-7 interpolation over 1..4


def test_group_quantiles_approx_plan_and_bounds(spark):
    from intake_esm_spark.operators.profiling import group_quantiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 1001)], "g string, v double"
    )
    out = group_quantiles(
        df, "v", ["g"], [0.5, 0.95], out_cols=["p50", "p95"], exact=False
    )
    assert "approx_percentile" in _plan_str(out)
    r = out.collect()[0]
    assert abs(r["p50"] - 500.5) <= 2.0 and abs(r["p95"] - 950.0) <= 3.0


def test_group_quantiles_validation(spark):
    from intake_esm_spark.operators.profiling import group_quantiles

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    import pytest as _pt

    with _pt.raises(ValueError):
        group_quantiles(df, "v", ["g"], [])
    with _pt.raises(ValueError):
        group_quantiles(df, "v", ["g"], [0.5], out_cols=["a", "b"])


def test_benford_profile_hand_example(spark):
    from intake_esm_spark.operators.profiling import benford_profile

    import math

    rows = [(v,) for v in [1.5, 19.0, 0.0012, 250.0, 2.0, None, 0.0, -3.5]]
    df = spark.createDataFrame(rows, "v double")
    out = {r["digit"]: r.asDict() for r in benford_profile(df, "v").collect()}
    # digits: 1.5->1, 19->1, 0.0012->1, 250->2, 2->2, -3.5->3; null/0 dropped
    assert {d: out[d]["n"] for d in out} == {"1": 3, "2": 2, "3": 1}
    assert out["1"]["share"] == 0.5
    assert out["1"]["benford_share"] == pytest.approx(math.log10(2), abs=1e-6)
    assert out["3"]["deviation"] == pytest.approx(
        1 / 6 - math.log10(1 + 1 / 3), abs=1e-6
    )


def test_benford_profile_grouped(spark):
    from intake_esm_spark.operators.profiling import benford_profile

    rows = [("a", 10.0), ("a", 20.0), ("b", 30.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        (r["g"], r["digit"]): r["share"]
        for r in benford_profile(df, "v", ["g"]).collect()
    }
    assert out[("a", "1")] == 0.5 and out[("b", "3")] == 1.0


def test_lift_table_hand_example(spark):
    """20 rows, scores 20..1, outcome = score > 15 (top 5): with 4 bins
    of 5 rows, bin 1 captures all 5 positives -> rate 1.0, lift 4.0,
    cum_capture 1.0; other bins rate 0."""
    from intake_esm_spark.operators.profiling import lift_table

    rows = [(i, float(21 - i), 1 if 21 - i > 15 else 0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "id long, score double, y int")
    out = {r["bin"]: r.asDict() for r in lift_table(df, "score", "y", "id", n_bins=4).collect()}
    assert out[1]["n_rows"] == 5 and out[1]["outcome_rate"] == 1.0
    assert out[1]["lift"] == 4.0          # 1.0 / (5/20)
    assert out[1]["cum_capture"] == 1.0
    assert out[2]["outcome_rate"] == 0.0 and out[2]["cum_capture"] == 1.0
    assert out[4]["lift"] == 0.0


def test_lift_table_validation(spark):
    from intake_esm_spark.operators.profiling import lift_table

    df = spark.createDataFrame([(1, 1.0, 1)], "id long, score double, y int")
    import pytest as _pt

    with _pt.raises(ValueError):
        lift_table(df, "score", "y", "id", n_bins=1)


# ---------------------------------------------------------------------------
# gini


def test_gini_uniform_is_zero(spark):
    from intake_esm_spark.operators.profiling import gini_coefficient

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("c", 1.0), ("d", 1.0)], "k string, v double"
    )
    r = gini_coefficient(df, "k", "v").collect()[0]
    assert r["n_entities"] == 4 and r["total"] == 4.0 and r["gini"] == 0.0


def test_gini_concentrated(spark):
    from intake_esm_spark.operators.profiling import gini_coefficient

    # v sorted asc = 0,0,0,4 -> G = (2*16 - 5*4) / (4*4) = 0.75
    df = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0), ("c", 0.0), ("d", 4.0)], "k string, v double"
    )
    r = gini_coefficient(df, "k", "v").collect()[0]
    assert r["gini"] == 0.75


def test_gini_excludes_nulls(spark):
    from intake_esm_spark.operators.profiling import gini_coefficient

    df = spark.createDataFrame(
        [("a", 1.0), ("b", None), (None, 5.0)], "k string, v double"
    )
    assert gini_coefficient(df, "k", "v").collect()[0]["n_entities"] == 1


# --- mad_outliers -----------------------------------------------------------


def test_mad_flags_the_fat_finger(spark):
    from intake_esm_spark.operators.profiling import mad_outliers

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r["x"]: r for r in mad_outliers(df, "x").collect()}
    # median of the six is 12.5, MAD = median(|x-12.5|) = 1.5
    assert out[10.0]["x_med"] == 12.5 and out[10.0]["x_mad"] == 1.5
    assert out[1000.0]["is_outlier"] is True
    assert all(not out[v]["is_outlier"] for v in vals[:-1])
    # the mean/std fence would have been dragged by the outlier itself:
    # 1000 is the ONLY flag even at k=3
    assert sum(r["is_outlier"] for r in out.values()) == 1


def test_mad_grouped_and_zero_mad_guard(spark):
    from intake_esm_spark.operators.profiling import mad_outliers

    rows = [("a", 1.0), ("a", 1.0), ("a", 9.0), ("b", 5.0), ("b", None)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = mad_outliers(df, "x", ["g"]).collect()
    by = {(r["g"], r["x"]): r["is_outlier"] for r in out}
    # group a: med 1, MAD 0 -> zero-MAD guard, nothing flags
    assert by[("a", 9.0)] is False
    # null value never flags
    assert by[("b", None)] is False


def test_mad_approx_path_same_schema(spark):
    from intake_esm_spark.operators.profiling import mad_outliers

    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    exact = mad_outliers(df, "x", exact=True)
    approx = mad_outliers(df, "x", exact=False)
    assert exact.columns == approx.columns
    assert approx.filter("is_outlier").count() == 0


# --- entropy_report ---------------------------------------------------------


def test_entropy_uniform_and_single(spark):
    import math

    from intake_esm_spark.operators.profiling import entropy_report

    rows = (
        [("u", "a"), ("u", "b"), ("u", "c"), ("u", "d")]  # uniform over 4
        + [("s", "only")] * 5                              # single category
        + [("m", "x")] * 3 + [("m", "y")]                  # 3:1 mix
    )
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r["g"]: r for r in entropy_report(df, ["g"], "c").collect()}
    assert out["u"]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert out["u"]["norm_entropy"] == 1.0
    assert out["s"]["entropy"] == 0.0 and out["s"]["norm_entropy"] is None
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert out["m"]["entropy"] == pytest.approx(h, abs=1e-6)
    assert out["m"]["n_rows"] == 4 and out["m"]["n_categories"] == 2


def test_entropy_null_categories_excluded(spark):
    from intake_esm_spark.operators.profiling import entropy_report

    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b")], "g string, c string"
    )
    r = entropy_report(df, ["g"], "c").collect()[0]
    assert r["n_rows"] == 2 and r["n_categories"] == 2


# --- skew_report ------------------------------------------------------------


def test_skew_report_hand_example(spark):
    from intake_esm_spark.operators.profiling import skew_report

    rows = [("hot",)] * 8 + [("warm",)] * 2 + [(None,)] * 2
    df = spark.createDataFrame(rows, "k string")
    r = {x["column"]: x for x in skew_report(df, ["k"], top_n=1).collect()}["k"]
    assert r["n_rows"] == 12 and r["n_nulls"] == 2 and r["n_distinct"] == 2
    assert r["top_value"] == "hot"
    assert r["top_share"] == pytest.approx(8 / 12, abs=1e-6)
    assert r["top_n_share"] == pytest.approx(8 / 12, abs=1e-6)  # top_n=1


def test_skew_report_multiple_columns_and_uniform(spark):
    from intake_esm_spark.operators.profiling import skew_report

    rows = [(i, "const") for i in range(10)]
    df = spark.createDataFrame(rows, "u long, c string")
    out = {r["column"]: r for r in skew_report(df, ["u", "c"]).collect()}
    assert out["u"]["n_distinct"] == 10 and out["u"]["top_share"] == 0.1
    assert out["c"]["n_distinct"] == 1 and out["c"]["top_share"] == 1.0
    # numeric column values render as strings in the unified schema
    assert out["u"]["top_value"] == "0"


def test_skew_report_validation(spark):
    from intake_esm_spark.operators.profiling import skew_report

    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError):
        skew_report(df, [])
    with pytest.raises(ValueError):
        skew_report(df, ["a"], top_n=0)


def test_mad_null_group_key_gets_own_fences(spark):
    """Rows with a NULL group key form their own group (groupBy
    semantics) and must get REAL fences, not a NULL flag."""
    from intake_esm_spark.operators.profiling import mad_outliers

    rows = [(None, 1.0), (None, 1.1), (None, 0.9), (None, 50.0), ("g", 2.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {(r["g"], r["x"]): r["is_outlier"] for r in mad_outliers(df, "x", ["g"]).collect()}
    assert out[(None, 50.0)] is True
    assert out[(None, 1.0)] is False  # real False, not NULL
    assert out[("g", 2.0)] is False


def test_exact_quantiles_matches_percentile_aggregate(spark):
    """exact_quantiles == Spark's sort-based percentile (type-7) on
    frames with duplicates, negatives and a singleton — the bucketed
    span probe picks the identical order statistics."""
    from pyspark.sql import functions as F

    from intake_esm_spark.operators.profiling import exact_quantiles

    vals = [5.0, -3.5, 5.0, 12.25, 0.0, 5.0, 99.5, -3.5, 7.75, 1.0, 1.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    probs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    arr = "array(" + ", ".join(f"{p}D" for p in probs) + ")"
    expect = df.agg(F.expr(f"percentile(x, {arr})").alias("q")).collect()[0]["q"]
    got = {
        r["prob"]: r["quantile"]
        for r in exact_quantiles(df, "x", probs=probs).collect()
    }
    assert len(got) == len(probs)
    for p, e in zip(probs, expect):
        assert got[p] == round(e, 6), (p, got[p], e)
        assert all(r == len(vals) for r in [len(vals)])

    single = spark.createDataFrame([(42.0,)], "x double")
    one = exact_quantiles(single, "x", probs=[0.5]).collect()[0]
    assert one["quantile"] == 42.0 and one["n_values"] == 1

    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles(empty, "x", probs=[0.5]).count() == 0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        exact_quantiles(df, "x", probs=[1.5])


def test_benford_report_digits_and_conformity(spark):
    """benford_report: exact string-form leading digits (incl. values
    < 1 whose digit sits after leading zeros, negatives, and nulls),
    all nine digits present in the output, shares sum to 1."""
    from intake_esm_spark.operators.profiling import benford_report

    vals = (
        [1.0, 19.9, 0.00123, -1.5] * 30    # digit 1
        + [2.5, 0.29, 250.0] * 18          # digit 2
        + [3.0] * 12 + [4.4] * 10 + [5.01] * 8
        + [6.9] * 7 + [70.0] * 6 + [0.08] * 5 + [9999.0] * 4
        + [None, 0.0]                      # excluded: null and zero
    )
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r["digit"]: r for r in benford_report(df, "x").collect()}
    assert sorted(rows) == list(range(1, 10))
    n_total = sum(r["n"] for r in rows.values())
    assert n_total == len(vals) - 2
    assert rows[1]["n"] == 120 and rows[2]["n"] == 54
    assert rows[8]["n"] == 5  # 0.08 -> digit 8
    assert abs(sum(r["observed_share"] for r in rows.values()) - 1.0) < 1e-5
    assert rows[1]["expected_share"] == round(0.3010299956639812, 6)
    mads = {r["mad"] for r in rows.values()}
    assert len(mads) == 1  # constant summary column
    assert rows[1]["conformity"] in {
        "close", "acceptable", "marginal", "nonconforming"
    }


def test_group_exact_quantiles_matches_percentile(spark):
    """group_exact_quantiles == the per-group percentile aggregate on
    groups of very different sizes, with ties, a singleton group, and
    null value/group exclusion — the grouped bucketed construction
    picks identical order statistics."""
    from intake_esm_spark.operators.profiling import (
        group_exact_quantiles,
        group_quantiles,
    )

    rows = (
        [("a", float(i % 17) - 5.0) for i in range(300)]
        + [("b", float(i)) for i in range(40)]
        + [("c", 7.5)]                       # singleton group
        + [("a", None), (None, 3.0)]         # excluded
    )
    df = spark.createDataFrame(rows, "g string, x double")
    probs = [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = {
        (r["g"], r["prob"]): (r["n_values"], r["quantile"])
        for r in group_exact_quantiles(df, "x", ["g"], probs).collect()
    }
    cols = [f"q{i}" for i in range(len(probs))]
    clean = df.filter("x IS NOT NULL AND g IS NOT NULL")
    exp_rows = group_quantiles(clean, "x", ["g"], probs, out_cols=cols).collect()
    expect = {
        (r["g"], p): r[c]
        for r in exp_rows
        for p, c in zip(probs, cols)
    }
    assert set(got) == set(expect)
    for k, (n, q) in got.items():
        assert q == expect[k], (k, q, expect[k])
    assert got[("c", 0.5)] == (1, 7.5)
    assert got[("a", 0.5)][0] == 300
