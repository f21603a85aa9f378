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


def auc_report(
    df: DataFrame,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Exact ROC-AUC of a score against a binary label via the rank-sum
    identity ``AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋)`` with midranks for
    tied scores — mathematically the Mann-Whitney U normalized by the
    pair count (ties contribute ½, the standard trapezoidal-ROC value),
    so the implementation IS :func:`~.experiment._cum_by_value`'s
    two-phase bucketed prefix sum over the distinct-score grain: one
    score-keyed exchange, bucketed rank cumsums, never a single-task
    sort (the Mann-Whitney plan discipline).

    ``label_col`` is truthy-numeric (``> 0`` = positive; null = excluded
    along with null scores). Returns one row ``(n_pos, n_neg, auc,
    gini)`` — ``gini = 2·AUC − 1``; both null when either class is
    empty. Determinism: ``2·R₊`` and the counts are exact integers
    (DECIMAL(38,0) accumulation); AUC is one fixed IEEE expression over
    them, 6dp-rounded."""
    from .experiment import _cum_by_value

    two = df.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    )
    per_v = two.groupBy(F.col(score_col).alias("__val")).agg(
        F.sum((F.col(label_col) > 0).cast("bigint")).alias("__ct"),
        F.count(F.lit(1)).alias("__c"),
    )
    ranked = _cum_by_value(per_v, ["__c"]).withColumnRenamed(
        "__cum___c", "__cum"
    )
    # cast-FIRST: __ct * (2·cum − c + 1) in int64 wraps near 9.2e18
    # (reachable at ~3e9 heavily-tied units) while the DuckDB oracle
    # multiplies in DECIMAL(38,0) — cast before the product so both
    # engines run the identical exact arithmetic
    two_r1 = F.sum(
        F.expr("CAST(__ct AS DECIMAL(38,0)) * (2 * __cum - __c + 1)")
    )
    m = ranked.agg(
        F.coalesce(F.sum("__ct"), F.lit(0)).alias("__n1"),
        F.coalesce(F.sum("__c") - F.sum("__ct"), F.lit(0)).alias("__n2"),
        two_r1.cast("double").alias("__2r1"),
    )
    n1 = F.col("__n1").cast("double")
    n2 = F.col("__n2").cast("double")
    auc = F.when(
        (F.col("__n1") > 0) & (F.col("__n2") > 0),
        (F.col("__2r1") / F.lit(2.0) - n1 * (n1 + F.lit(1.0)) / F.lit(2.0))
        / (n1 * n2),
    )
    return m.select(
        F.col("__n1").alias("n_pos"),
        F.col("__n2").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(F.lit(2.0) * auc - F.lit(1.0), 6).alias("gini"),
    )


def calibration_report(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability table for a probability-like score: rows are score
    bins ``floor(score·n_bins)`` (clamped into ``[0, n_bins−1]``, so a
    score of exactly 1.0 lands in the top bin and out-of-range scores
    saturate instead of vanishing), columns ``(bin, n_units, avg_score,
    pos_rate, abs_gap)`` — ``abs_gap = |pos_rate − avg_score|`` is the
    per-bin calibration error whose n-weighted sum is ECE. Empty bins
    are absent (their weight is zero). Null label or score excludes the
    row, and so does a NON-FINITE score: in non-ANSI Spark
    ``floor(NaN·n)`` casts to 0, so a NaN would land in bin 0, count
    into ``n_units``, yet drop out of the decimal score sum — deflating
    ``avg_score`` while DuckDB errors on the same cast. Excluding
    NaN/±Inf up front keeps both engines on the null-exclusion
    contract.

    Plan: ONE bin-keyed map-side-combined aggregation (output ≤ n_bins
    rows); the bin id is in-row codegen. Determinism: counts are exact
    integers; scores accumulate as DECIMAL(18,6); rates/gaps are fixed
    IEEE divides, 6dp. The bin edge is ``floor`` of one IEEE product —
    identical in both engines on identical doubles."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    s = F.col(score_col).cast("double")
    b = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.floor(s * F.lit(float(n_bins))).cast("int"),
        ),
    )
    binned = (
        df.filter(
            F.col(label_col).isNotNull()
            & F.col(score_col).isNotNull()
            & ~F.isnan(s)
            & (F.abs(s) != F.lit(float("inf")))
        )
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum(s.cast("decimal(18,6)")).alias("__ss"),
            F.sum((F.col(label_col) > 0).cast("bigint")).alias("__np"),
        )
    )
    n = F.col("n_units").cast("double")
    avg = F.col("__ss").cast("double") / n
    rate = F.col("__np").cast("double") / n
    return binned.select(
        "bin",
        "n_units",
        F.round(avg, 6).alias("avg_score"),
        F.round(rate, 6).alias("pos_rate"),
        F.round(F.abs(rate - avg), 6).alias("abs_gap"),
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
) -> DataFrame:
    """Cohen's kappa inter-rater agreement over paired categorical
    labels: ``κ = (p_o − p_e) / (1 − p_e)`` with ``p_o`` the observed
    agreement rate and ``p_e = Σᵢ rowᵢ·colᵢ / N²`` the chance agreement
    from the marginals — the standard "are two annotators / a model and
    a human actually agreeing beyond luck" readout for label-quality
    audits. Rows with a null on either side are excluded.

    Plan: one (a, b)-keyed count collapse (map-side partial, ≤ classes²
    rows, pinned — feeds both margins), margins re-joined on the label,
    one final fold. Determinism: N, the diagonal, and ``Σ rowᵢ·colᵢ``
    are exact integers (DECIMAL(38,0) for the product sum); κ is one
    fixed IEEE expression, 6dp. Returns one row ``(n_units,
    observed_agreement, expected_agreement, kappa)``; κ is null when
    ``p_e = 1`` (both raters constant — agreement is undefined, not
    perfect)."""
    cells = (
        df.filter(
            F.col(rater_a_col).isNotNull() & F.col(rater_b_col).isNotNull()
        )
        .groupBy(
            F.col(rater_a_col).alias("__a"), F.col(rater_b_col).alias("__b")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)  # feeds both margins + the diagonal
    )
    am = cells.groupBy(F.col("__a").alias("__l")).agg(
        F.sum("__c").alias("__ra")
    )
    bm = cells.groupBy(F.col("__b").alias("__l")).agg(
        F.sum("__c").alias("__rb")
    )
    prod = (
        am.join(bm, "__l")
        .agg(
            F.coalesce(
                F.sum(
                    F.expr("CAST(__ra AS DECIMAL(38,0)) * __rb")
                ),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("__pe_num")
        )
    )
    base = cells.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"),
        F.coalesce(
            F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))),
            F.lit(0),
        ).alias("__diag"),
    )
    j = base.crossJoin(F.broadcast(prod))
    nd = F.col("__n").cast("double")
    po = F.col("__diag").cast("double") / nd
    pe = F.col("__pe_num").cast("double") / (nd * nd)
    kappa = F.when(
        (F.col("__n") > 0) & (pe < 1.0), (po - pe) / (F.lit(1.0) - pe)
    )
    return j.select(
        F.col("__n").alias("n_units"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.round(kappa, 6).alias("kappa"),
    )
