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
