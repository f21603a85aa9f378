"""Model evaluation: classification confusion reports and regression
error metrics.

Extension (SURVEY §2.9): the scoring loop every model-assisted pipeline
stage closes with — "how good is the lang-id / quality classifier /
forecast against labels?". The lift/gains table (profiling.lift_table)
ranks a score; these two give the standard summary metrics. Both are
single partial-aggregated passes over exact integers / decimal moments,
so every number is engine-exact and SQL-replayable.

Scale: one map-side-combined aggregation each; outputs are
class-cardinality (confusion) or one row (regression) — metadata scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_report(
    df: DataFrame,
    actual_col: str,
    predicted_col: str,
) -> DataFrame:
    """Per-class classification report over (actual, predicted) label
    pairs: ``(label, n_actual, n_predicted, n_correct, precision,
    recall, f1)`` — one row per label seen on EITHER side (a class the
    model never predicts still reports recall; a hallucinated class
    still reports precision). Rows with a null on either side are
    excluded (unlabeled/unscored units).

    Plan: ONE (actual, predicted)-keyed count collapse (map-side
    partial, output bounded by classes²), then the per-label margins
    via two aggregations over that cell frame and a full-outer label
    join — metadata scale throughout. Metrics are fixed IEEE divides
    over exact integers, 6dp; a zero denominator nulls the metric, and
    f1 is null when either side is null or p+r = 0."""
    pairs = (
        df.filter(
            F.col(actual_col).isNotNull() & F.col(predicted_col).isNotNull()
        )
        .groupBy(
            F.col(actual_col).alias("__a"), F.col(predicted_col).alias("__p")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)  # cell frame feeds three margins
    )
    act = pairs.groupBy(F.col("__a").alias("label")).agg(
        F.sum("__c").alias("n_actual"),
        F.sum(F.when(F.col("__a") == F.col("__p"), F.col("__c"))).alias("__tp_a"),
    )
    pred = pairs.groupBy(F.col("__p").alias("label")).agg(
        F.sum("__c").alias("n_predicted")
    )
    m = act.join(pred, "label", "full_outer").select(
        "label",
        F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
        F.coalesce("n_predicted", F.lit(0)).alias("n_predicted"),
        F.coalesce("__tp_a", F.lit(0)).alias("n_correct"),
    )
    prec = F.when(
        F.col("n_predicted") > 0,
        F.col("n_correct").cast("double") / F.col("n_predicted").cast("double"),
    )
    rec = F.when(
        F.col("n_actual") > 0,
        F.col("n_correct").cast("double") / F.col("n_actual").cast("double"),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
        F.lit(2.0) * prec * rec / (prec + rec),
    )
    return m.select(
        "label",
        "n_actual",
        "n_predicted",
        "n_correct",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def regression_metrics(
    df: DataFrame,
    actual_col: str,
    predicted_col: str,
) -> DataFrame:
    """One-row regression scorecard: ``(n, mae, rmse, bias, r2)`` over
    (actual, predicted) pairs — the generic form of the seasonal-naive
    backtest's scoring tail, for ANY prediction column (a forecast, a
    model score, an imputation). Null on either side excludes the row.

    All moments — Σ|e|, Σe, Σe², Σy, Σy² — accumulate as DECIMAL in ONE
    map-side-combined aggregation (order-independent); MAE/RMSE/bias
    and ``r2 = 1 − Σe²/Σ(y−ȳ)²`` are fixed IEEE expressions over them,
    6dp-rounded. r2 is null when the actuals are constant (zero total
    variance)."""
    # one operand widened (19,6)x(18,6) -> product (38,12) in BOTH
    # engines; (19,6)x(19,6) trips Spark's precision-39 overflow, which
    # silently drops the product scale to 11 while DuckDB keeps 12 (the
    # profiling.py one-wide-operand rule).
    dw = lambda c: c.cast("decimal(19,6)")  # noqa: E731
    dn = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    y = F.col(actual_col)
    e = F.col(predicted_col) - y
    clean = df.filter(y.isNotNull() & F.col(predicted_col).isNotNull())
    row = clean.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dn(F.abs(e))).alias("__sae"),
        F.sum(dn(e)).alias("__se"),
        F.sum(dw(e) * dn(e)).alias("__see"),
        F.sum(dn(y)).alias("__sy"),
        F.sum(dw(y) * dn(y)).alias("__syy"),
    )
    n = F.col("n").cast("double")
    sse = F.col("__see").cast("double")
    tss = F.col("__syy").cast("double") - F.col("__sy").cast("double") * F.col(
        "__sy"
    ).cast("double") / n
    return row.select(
        "n",
        F.round(F.col("__sae").cast("double") / n, 6).alias("mae"),
        F.round(F.sqrt(sse / n), 6).alias("rmse"),
        F.round(F.col("__se").cast("double") / n, 6).alias("bias"),
        F.when(tss > 0, F.round(F.lit(1.0) - sse / tss, 6)).alias("r2"),
    )
