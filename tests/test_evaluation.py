"""Model evaluation operators (operators/evaluation.py)."""

import pytest

from intake_esm_spark.operators.evaluation import (
    confusion_report,
    regression_metrics,
)


def test_confusion_hand_example(spark):
    """3 classes: 'a' perfect, 'b' half-recalled, 'c' never predicted,
    'x' hallucinated-only."""
    rows = [
        ("a", "a"), ("a", "a"),
        ("b", "b"), ("b", "x"),
        ("c", "a"),
    ]
    df = spark.createDataFrame(rows, "actual string, pred string")
    out = {r["label"]: r for r in confusion_report(df, "actual", "pred").collect()}
    assert set(out) == {"a", "b", "c", "x"}
    a = out["a"]
    assert (a["n_actual"], a["n_predicted"], a["n_correct"]) == (2, 3, 2)
    assert a["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert a["recall"] == 1.0
    b = out["b"]
    assert b["recall"] == 0.5 and b["precision"] == 1.0
    assert b["f1"] == pytest.approx(2 * 0.5 / 1.5, abs=1e-6)
    c = out["c"]  # never predicted: recall 0, precision undefined
    assert c["recall"] == 0.0 and c["precision"] is None and c["f1"] is None
    x = out["x"]  # hallucinated: precision 0, recall undefined
    assert x["n_actual"] == 0 and x["precision"] == 0.0 and x["recall"] is None


def test_confusion_nulls_excluded(spark):
    rows = [("a", "a"), (None, "a"), ("a", None)]
    df = spark.createDataFrame(rows, "actual string, pred string")
    out = confusion_report(df, "actual", "pred").collect()
    assert len(out) == 1 and out[0]["n_actual"] == 1


def test_regression_metrics_hand_example(spark):
    """y = [1,2,3,4], pred = [1,2,3,8]: one +4 error."""
    rows = [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0), (4.0, 8.0)]
    df = spark.createDataFrame(rows, "y double, p double")
    r = regression_metrics(df, "y", "p").collect()[0]
    assert r["n"] == 4
    assert r["mae"] == 1.0  # (0+0+0+4)/4
    assert r["rmse"] == 2.0  # sqrt(16/4)
    assert r["bias"] == 1.0  # mean error +1
    # tss = sum((y-2.5)^2) = 5; r2 = 1 - 16/5 = -2.2 (worse than mean)
    assert r["r2"] == pytest.approx(-2.2, abs=1e-6)


def test_regression_perfect_and_constant_actuals(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0)], "y double, p double"
    )
    r = regression_metrics(df, "y", "p").collect()[0]
    assert r["mae"] == 0.0 and r["rmse"] == 0.0 and r["r2"] == 1.0
    const = spark.createDataFrame(
        [(5.0, 5.0), (5.0, 6.0)], "y double, p double"
    )
    r2 = regression_metrics(const, "y", "p").collect()[0]
    assert r2["r2"] is None  # zero total variance
