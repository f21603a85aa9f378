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


def _calibration_bins(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int,
) -> DataFrame:
    """The shared bin collapse behind :func:`calibration_report` and
    :func:`ece_report`: ONE bin-keyed map-side-combined aggregation of
    ``(bin, n_units, __ss decimal score sum, __np positive count)``
    over clean units — null label/score and NON-FINITE scores excluded
    (in non-ANSI Spark ``floor(NaN·n)`` casts to 0, so a NaN would land
    in bin 0, count into n_units, yet drop out of the decimal sum —
    deflating avg_score while DuckDB errors on the same cast)."""
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
    return (
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
    binned = _calibration_bins(df, label_col, score_col, n_bins)
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


def ece_report(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected Calibration Error — the one-number summary of
    :func:`calibration_report` (its n-weighted |pos_rate − avg_score|
    sum) plus MCE, the worst single bin: the scalar gate a
    quality-classifier rollout checks before trusting thresholds.

    The n-weighted per-bin gap telescopes EXACTLY:
    ``n_b·|pos_b/n_b − scoresum_b/n_b| = |np_b − Σs_b|``, so ECE is one
    decimal-exact sum of per-bin |integer − decimal| over the same
    pinned bin collapse calibration uses (``≤ n_bins`` rows), divided
    by N once — no per-bin IEEE division enters the sum. MCE is the
    max of the per-bin gaps (fixed IEEE divides, max order-free).
    Returns one row ``(n_units, n_bins_used, ece, mce)``; both null on
    an empty clean frame. Same exclusions as calibration (null label/
    score, non-finite scores)."""
    binned = _calibration_bins(df, label_col, score_col, n_bins)
    gap_mass = F.abs(
        F.col("__np").cast("decimal(18,6)") - F.col("__ss")
    )
    per_bin_gap = gap_mass.cast("double") / F.col("n_units").cast("double")
    m = binned.agg(
        F.coalesce(F.sum("n_units"), F.lit(0)).alias("n_units"),
        F.count(F.lit(1)).alias("n_bins_used"),
        F.sum(gap_mass).alias("__gm"),
        F.max(per_bin_gap).alias("__mce"),
    )
    return m.select(
        "n_units",
        "n_bins_used",
        F.when(
            F.col("n_units") > 0,
            F.round(
                F.col("__gm").cast("double")
                / F.col("n_units").cast("double"),
                6,
            ),
        ).alias("ece"),
        F.round(F.col("__mce"), 6).alias("mce"),
    )


def pr_auc_report(
    df: DataFrame,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Precision-Recall AUC (average precision) — the companion to
    :func:`auc_report` when positives are RARE (exactly the
    quality-classifier regime: ROC-AUC stays flattering under class
    imbalance, AP does not). Steps descend the DISTINCT-score
    thresholds; at each step ``k``: precision ``P_k = cum_pos/cum_n``
    and recall increment ``ΔR_k = pos_k/n_pos`` (ties grouped — the
    sklearn ``average_precision_score`` step convention), and
    ``AP = Σ ΔR_k·P_k``.

    Plan: one score-keyed exchange to the distinct-score grain, then
    DESCENDING cumulative counts via the bucketed prefix sum
    (:func:`~.ranks.bucketed_cumsum` — the Mann-Whitney discipline, no
    single-task score sort). Determinism: cumulative counts are exact
    integers; each ``pos_k·cum_pos/cum_n`` term quantizes to 12dp
    DECIMAL(28,12) before the cross-step sum (order-independent), and
    AP divides the exact term sum by ``n_pos`` once. Returns one row
    ``(n_pos, n_neg, baseline, pr_auc)`` — ``baseline = n_pos/N`` is
    the random-classifier AP; ``pr_auc`` is null when either class is
    empty (no ranking to score). ``label_col`` truthy-numeric (> 0 =
    positive); null label/score AND non-finite scores excluded — the
    calibration/scoring-rules finite-score contract (round-11 ADVICE
    fix: a NaN score would otherwise become its own distinct-score
    group, collapse the bucketed span to one task, and sort as the top
    threshold under descending, silently skewing AP)."""
    from .ranks import bucketed_cumsum

    s = F.col(score_col).cast("double")
    two = df.filter(
        F.col(label_col).isNotNull()
        & F.col(score_col).isNotNull()
        & ~F.isnan(s)
        & (F.abs(s) != F.lit(float("inf")))
    )
    per_v = two.groupBy(F.col(score_col).alias("__val")).agg(
        F.sum((F.col(label_col) > 0).cast("bigint")).alias("__ct"),
        F.count(F.lit(1)).alias("__c"),
    )
    cum = bucketed_cumsum(
        per_v, ["__ct", "__c"], val_col="__val", descending=True
    )
    term = F.round(
        F.col("__ct").cast("double")
        * F.col("__cum___ct").cast("double")
        / F.col("__cum___c").cast("double"),
        12,
    ).cast("decimal(28,12)")
    m = cum.agg(
        F.coalesce(F.sum("__ct"), F.lit(0)).alias("__n1"),
        F.coalesce(F.sum("__c") - F.sum("__ct"), F.lit(0)).alias("__n2"),
        F.sum(term).alias("__ap_num"),
    )
    n1 = F.col("__n1").cast("double")
    n2 = F.col("__n2").cast("double")
    ap = F.when(
        (F.col("__n1") > 0) & (F.col("__n2") > 0),
        F.col("__ap_num").cast("double") / n1,
    )
    return m.select(
        F.col("__n1").alias("n_pos"),
        F.col("__n2").alias("n_neg"),
        F.when(
            (F.col("__n1") + F.col("__n2")) > 0,
            F.round(n1 / (n1 + n2), 6),
        ).alias("baseline"),
        F.round(ap, 6).alias("pr_auc"),
    )


def scoring_rules_report(
    df: DataFrame,
    label_col: str,
    score_col: str,
    eps: float = 1e-15,
) -> DataFrame:
    """Proper scoring rules for a probability-like score against a
    binary label: Brier score (mean squared probability error) and
    log-loss (cross-entropy) — the two numbers that, unlike accuracy,
    cannot be gamed by confident miscalibration; the standard training
    monitors for the corpus quality classifiers.

    Plan: ONE map-side-combined aggregation; both are in-row terms.
    Determinism: each per-unit term — ``(s − y)²`` and
    ``−(y·ln s̃ + (1−y)·ln(1−s̃))`` with ``s̃`` clamped into
    ``[eps, 1−eps]`` (a hard 0/1 score would blow the log up) —
    quantizes to 12dp DECIMAL(28,12) before the corpus sum (the
    chi-square cell rule: a raw double sum is partition-order-
    dependent); the final means are fixed IEEE divides, 6dp. Null
    label/score and non-finite scores are excluded (the calibration
    contract). Returns one row ``(n_units, brier, log_loss)``."""
    if not 0.0 < eps < 0.5:
        raise ValueError(f"eps must be in (0, 0.5), got {eps}")
    s = F.col(score_col).cast("double")
    y = (F.col(label_col) > 0).cast("int").cast("double")
    sc = F.least(F.greatest(s, F.lit(float(eps))), F.lit(1.0 - eps))
    brier_t = F.round((s - y) * (s - y), 12).cast("decimal(28,12)")
    ll_t = F.round(
        -(y * F.log(sc) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - sc)), 12
    ).cast("decimal(28,12)")
    m = df.filter(
        F.col(label_col).isNotNull()
        & F.col(score_col).isNotNull()
        & ~F.isnan(s)
        & (F.abs(s) != F.lit(float("inf")))
    ).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(brier_t).alias("__sb"),
        F.sum(ll_t).alias("__sl"),
    )
    n = F.col("n_units").cast("double")
    return m.select(
        "n_units",
        F.when(
            F.col("n_units") > 0,
            F.round(F.col("__sb").cast("double") / n, 6),
        ).alias("brier"),
        F.when(
            F.col("n_units") > 0,
            F.round(F.col("__sl").cast("double") / n, 6),
        ).alias("log_loss"),
    )


def mcc_report(
    df: DataFrame,
    actual_col: str,
    predicted_col: str,
) -> DataFrame:
    """Matthews correlation coefficient over binary (actual, predicted)
    pairs — the single-number confusion summary that stays honest under
    class imbalance (accuracy and F1 both saturate when one class
    dominates; MCC needs all four cells to be right). Truthy-numeric
    sides (> 0 = positive); null on either side excludes the row.

    Plan: ONE map-side-combined aggregation of the four cells.
    Determinism: cells are exact integers; the numerator products run
    cast-first in DECIMAL(38,0) (tp·tn at 3e9 units overflows int64);
    the denominator multiplies the four margin square roots in double
    (√(ab) = √a·√b each margin ≤ N, so no decimal overflow and one
    fixed IEEE expression), 6dp. MCC is null when any margin is zero
    (a constant side — correlation undefined). Returns one row
    ``(n_units, tp, fp, tn, fn, accuracy, mcc)``."""
    a = (F.col(actual_col) > 0).cast("int")
    p = (F.col(predicted_col) > 0).cast("int")
    m = df.filter(
        F.col(actual_col).isNotNull() & F.col(predicted_col).isNotNull()
    ).agg(
        F.count(F.lit(1)).alias("n_units"),
        F.coalesce(F.sum(((a == 1) & (p == 1)).cast("bigint")), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(((a == 0) & (p == 1)).cast("bigint")), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(((a == 0) & (p == 0)).cast("bigint")), F.lit(0)).alias("tn"),
        F.coalesce(F.sum(((a == 1) & (p == 0)).cast("bigint")), F.lit(0)).alias("fn"),
    )
    num = (
        F.expr("CAST(tp AS DECIMAL(38,0)) * tn").cast("double")
        - F.expr("CAST(fp AS DECIMAL(38,0)) * fn").cast("double")
    )
    den = (
        F.sqrt((F.col("tp") + F.col("fp")).cast("double"))
        * F.sqrt((F.col("tp") + F.col("fn")).cast("double"))
        * F.sqrt((F.col("tn") + F.col("fp")).cast("double"))
        * F.sqrt((F.col("tn") + F.col("fn")).cast("double"))
    )
    return m.select(
        "n_units",
        "tp",
        "fp",
        "tn",
        "fn",
        F.when(
            F.col("n_units") > 0,
            F.round(
                (F.col("tp") + F.col("tn")).cast("double")
                / F.col("n_units").cast("double"),
                6,
            ),
        ).alias("accuracy"),
        F.when(den > 0, F.round(num / den, 6)).alias("mcc"),
    )


def psi_report(
    df: DataFrame,
    group_col: str,
    baseline: str,
    current: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between two slices' score
    distributions — the standard "has the scored population drifted
    since the model shipped" monitor (rule of thumb: < 0.1 stable,
    0.1–0.25 watch, > 0.25 retrain): ``PSI = Σ_b (p_b − q_b)·ln(p_b/
    q_b)`` over the same clamped ``floor(score·n_bins)`` bins
    calibration uses.

    Plan: ONE bin-keyed map-side-combined aggregation with conditional
    counts for both slices (output ≤ n_bins rows); totals are a 1-row
    broadcast over that bounded frame. Bins where exactly one side has
    mass make the term infinite — they are EXCLUDED from the sum and
    surfaced as ``n_onesided_bins`` (a nonzero value is itself maximal
    drift; the count keeps it impossible to misread the finite PSI as
    calm). Determinism: proportions are exact-integer ratios in
    double; each term quantizes to 12dp DECIMAL(28,12) before the
    cross-bin sum, 6dp at the end. Null/non-finite scores and rows in
    neither slice are excluded. Returns one row ``(n_baseline,
    n_current, n_bins_used, n_onesided_bins, psi)``; psi null when
    either slice is empty."""
    binned = _psi_bins(df, group_col, baseline, current, score_col, n_bins)
    return psi_from_bins(binned)


def _psi_bins(
    df: DataFrame,
    group_col: str,
    baseline: str,
    current: str,
    score_col: str,
    n_bins: int,
) -> DataFrame:
    """The shared bin collapse behind :func:`psi_report` and its
    streaming twin (``streaming.stateful.stream_psi``): ONE bin-keyed
    map-side-combined aggregation of ``(bin, __nb, __nc)`` conditional
    counts — plain additive counters, so the identical plan is a legal
    streaming aggregation in update mode."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if baseline == current:
        raise ValueError("baseline and current must differ")
    s = F.col(score_col).cast("double")
    b = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.floor(s * F.lit(float(n_bins))).cast("int"),
        ),
    )
    g = F.col(group_col)
    return (
        df.filter(
            g.isin(baseline, current)
            & F.col(score_col).isNotNull()
            & ~F.isnan(s)
            & (F.abs(s) != F.lit(float("inf")))
        )
        .groupBy(b.alias("bin"))
        .agg(
            F.sum((g == baseline).cast("bigint")).alias("__nb"),
            F.sum((g == current).cast("bigint")).alias("__nc"),
        )
    )


def psi_from_bins(binned: DataFrame) -> DataFrame:
    """The :func:`psi_report` readout over an ALREADY-COLLAPSED
    ``(bin, __nb, __nc)`` count frame — the shared tail that makes the
    streaming twin's snapshot bit-identical to the batch report
    (integer bin counters in, the same 12dp-decimal terms and fixed
    IEEE expressions out)."""
    tot = binned.agg(
        F.coalesce(F.sum("__nb"), F.lit(0)).alias("__tb"),
        F.coalesce(F.sum("__nc"), F.lit(0)).alias("__tc"),
    )
    j = binned.crossJoin(F.broadcast(tot))
    pb = F.col("__nb").cast("double") / F.col("__tb").cast("double")
    pc = F.col("__nc").cast("double") / F.col("__tc").cast("double")
    two_sided = (F.col("__nb") > 0) & (F.col("__nc") > 0)
    term = F.when(
        two_sided,
        F.round((pb - pc) * F.log(pb / pc), 12).cast("decimal(28,12)"),
    )
    m = j.agg(
        F.max("__tb").alias("n_baseline"),
        F.max("__tc").alias("n_current"),
        F.count(F.lit(1)).alias("n_bins_used"),
        F.coalesce(
            F.sum((~two_sided).cast("bigint")), F.lit(0)
        ).alias("n_onesided_bins"),
        F.sum(term).alias("__psi"),
    )
    return m.select(
        F.coalesce("n_baseline", F.lit(0)).alias("n_baseline"),
        F.coalesce("n_current", F.lit(0)).alias("n_current"),
        "n_bins_used",
        "n_onesided_bins",
        F.when(
            (F.col("n_baseline") > 0) & (F.col("n_current") > 0),
            F.round(
                F.coalesce(F.col("__psi").cast("double"), F.lit(0.0)), 6
            ),
        ).alias("psi"),
    )


def ranking_metrics(
    df: DataFrame,
    query_col: str,
    item_col: str,
    label_col: str,
    score_col: str,
    k: int = 10,
) -> DataFrame:
    """Ranking-quality scoreboard — NDCG@k and MRR@k of ``score_col``'s
    per-query ordering against graded relevance ``label_col``: the
    retrieval-evaluation companion to the brute-force ANN oracles
    (simsearch recall measures candidate coverage; this measures the
    final ORDER a reranker ships). Linear gain ``rel/log₂(rank+1)``
    (DuckDB-replayable; swap 2^rel−1 upstream for exponential gain),
    ideal ranking by (relevance desc, item asc), reciprocal rank of the
    first relevant (> 0) item within the top k.

    Queries whose relevance is all-zero/negative have no ideal ranking
    and are EXCLUDED from both means — ``n_queries`` counts the scored
    ones, ``n_queries_total`` everything seen (the gap is itself a data
    signal). Null query/item/label/score excludes the row.

    Plan: the rank windows PARTITION BY the query (bounded per-query
    frames — the benign class, never a global order); per-query metrics
    collapse in the same pass, then per-query NDCG/RR quantize to 12dp
    DECIMAL(28,12) before the cross-query mean (the chi-square cell
    rule). Ties on score break by item id, so both engines rank
    identically. Returns one row ``(n_queries_total, n_queries,
    ndcg_at_k, mrr_at_k)``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    q = F.col(query_col)
    clean = df.filter(
        q.isNotNull()
        & F.col(item_col).isNotNull()
        & F.col(label_col).isNotNull()
        & F.col(score_col).isNotNull()
    ).select(
        q.alias("__q"),
        F.col(item_col).alias("__i"),
        F.col(label_col).cast("double").alias("__rel"),
        F.col(score_col).alias("__s"),
    )
    w_score = Window.partitionBy("__q").orderBy(
        F.col("__s").desc(), F.col("__i").asc()
    )
    w_ideal = Window.partitionBy("__q").orderBy(
        F.col("__rel").desc(), F.col("__i").asc()
    )
    ranked = clean.withColumn(
        "__r", F.row_number().over(w_score)
    ).withColumn("__ir", F.row_number().over(w_ideal))
    disc = lambda r: F.log2(r.cast("double") + F.lit(1.0))  # noqa: E731
    # per-ITEM gain terms quantize to 12dp decimals BEFORE the per-query
    # sum: a ≤k-term double sum is accumulation-order-dependent in its
    # last ulp, and across thousands of queries a last-ulp flip lands on
    # a rounding boundary often enough to break engine parity
    gain = lambda r: F.round(  # noqa: E731
        F.col("__rel") / disc(r), 12
    ).cast("decimal(28,12)")
    per_q = ranked.groupBy("__q").agg(
        F.sum(F.when(F.col("__r") <= k, gain(F.col("__r")))).alias("__dcg"),
        F.sum(F.when(F.col("__ir") <= k, gain(F.col("__ir")))).alias(
            "__idcg"
        ),
        F.min(
            F.when(
                (F.col("__rel") > 0) & (F.col("__r") <= k), F.col("__r")
            )
        ).alias("__first_rel"),
    )
    scored = per_q.agg(
        F.count(F.lit(1)).alias("n_queries_total"),
        F.coalesce(
            F.sum((F.col("__idcg") > 0).cast("bigint")), F.lit(0)
        ).alias("n_queries"),
        F.sum(
            F.when(
                F.col("__idcg") > 0,
                F.round(
                    F.coalesce(
                        F.col("__dcg").cast("double"), F.lit(0.0)
                    )
                    / F.col("__idcg").cast("double"),
                    12,
                ).cast("decimal(28,12)"),
            )
        ).alias("__sn"),
        F.sum(
            F.when(
                F.col("__idcg") > 0,
                F.round(
                    F.coalesce(
                        F.lit(1.0) / F.col("__first_rel").cast("double"),
                        F.lit(0.0),
                    ),
                    12,
                ).cast("decimal(28,12)"),
            )
        ).alias("__sr"),
    )
    nq = F.col("n_queries").cast("double")
    return scored.select(
        "n_queries_total",
        "n_queries",
        F.when(
            F.col("n_queries") > 0,
            F.round(F.col("__sn").cast("double") / nq, 6),
        ).alias("ndcg_at_k"),
        F.when(
            F.col("n_queries") > 0,
            F.round(F.col("__sr").cast("double") / nq, 6),
        ).alias("mrr_at_k"),
    )


def conformal_interval(
    df: DataFrame,
    label_col: str,
    pred_col: str,
    alpha: float = 0.1,
) -> DataFrame:
    """Split-conformal prediction half-width — the distribution-free
    wrapper that turns ANY point predictor into a (1−α) interval with
    a finite-sample guarantee (Vovk; Lei et al. 2018): on a held-out
    calibration set the half-width is the ``k = ⌈(n+1)(1−α)⌉``-th
    smallest absolute residual, and ``pred ± q_hat`` then covers fresh
    exchangeable points with probability ≥ 1−α.  The "how wrong can
    this model be, with a guarantee" number a scored-data pipeline
    reports next to RMSE (:func:`regression_metrics`, which has no
    guarantee).

    Scale shape (the :func:`~.profiling.exact_quantiles` discipline):
    one value-keyed collapse of the residuals to the distinct-value
    grain, cumulative counts from the bucketed prefix sum, and the
    single needed order statistic picked by a broadcast 1-row rank
    probe — element selection (conformal quantiles are type-1 by
    definition), no value buffering, no single-task sort.

    Determinism: residuals round to 6dp (both engines' fixed rounding),
    ranks are exact integers.  Null/non-finite labels or predictions
    are excluded.  Returns one row ``(n_calib, alpha, k_rank, q_hat,
    coverage_guarantee)`` where ``coverage_guarantee = k/(n+1)`` is the
    exact finite-sample level; ``q_hat`` is null when k > n (n too
    small for the requested α — the honest answer, not the max)."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1): {alpha}")
    from .ranks import bucketed_cumsum

    yd = F.col(label_col).cast("double")
    pd_ = F.col(pred_col).cast("double")
    r = F.round(F.abs(yd - pd_), 6)
    base = df.filter(
        F.col(label_col).isNotNull()
        & F.col(pred_col).isNotNull()
        & ~F.isnan(yd)
        & ~F.isnan(pd_)
        & (F.abs(yd) != F.lit(float("inf")))
        & (F.abs(pd_) != F.lit(float("inf")))
    )
    per_v = (
        base.groupBy(r.alias("__r"))
        .agg(F.count(F.lit(1)).alias("__c"))
        # pinned: feeds the count AND the cumsum
        .localCheckpoint(eager=False)
    )
    nn = per_v.agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"))
    probe = nn.select(
        "__n",
        F.ceil(
            (F.col("__n").cast("double") + F.lit(1.0))
            * F.lit(1.0 - alpha)
        )
        .cast("bigint")
        .alias("__k"),
    )
    cum = bucketed_cumsum(per_v, ["__c"], val_col="__r")
    prev = F.col("__cum___c") - F.col("__c")
    hit = F.broadcast(probe).join(
        cum,
        (F.col("__k") > prev) & (F.col("__k") <= F.col("__cum___c")),
        "left",
    )
    return hit.groupBy("__n", "__k").agg(
        F.max("__r").alias("__q")
    ).select(
        F.col("__n").alias("n_calib"),
        F.lit(float(alpha)).alias("alpha"),
        F.col("__k").alias("k_rank"),
        F.when(F.col("__k") <= F.col("__n"), F.col("__q")).alias(
            "q_hat"
        ),
        F.round(
            F.col("__k").cast("double")
            / (F.col("__n").cast("double") + F.lit(1.0)),
            6,
        ).alias("coverage_guarantee"),
    )


def pav_fit(bins: list[tuple[int, int, int]]) -> list[float]:
    """Pool-adjacent-violators over ``(bin, n, pos)`` rows sorted by
    bin — ONE shared implementation for the Spark operator and the
    DuckDB oracle builder.  Classic stack PAV: walk the bins in score
    order keeping block means ``pos/n`` non-decreasing, merging any
    violating block into its predecessor (n-weighted, exact integer
    numerators — the merge arithmetic never touches floats until the
    final divide).  Returns the isotonic rate per input row, in input
    order."""
    blocks: list[list[int]] = []  # [n, pos, count_of_rows]
    for _b, n, p in bins:
        blocks.append([n, p, 1])
        while (
            len(blocks) > 1
            and blocks[-2][1] * blocks[-1][0]
            > blocks[-1][1] * blocks[-2][0]
        ):  # prev_rate > cur_rate, compared in exact integers
            n2, p2, c2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += p2
            blocks[-1][2] += c2
        # (equal rates stay separate blocks — the fit is identical)
    out: list[float] = []
    for n, p, c in blocks:
        out.extend([p / n] * c)
    return out


def isotonic_calibration_report(
    df: DataFrame,
    label_col: str,
    score_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Isotonic (PAV) recalibration of a probability-like score — the
    monotone-regression calibrator (sklearn ``IsotonicRegression``
    over the binned reliability curve): per score bin, the raw
    ``pos_rate`` AND the pooled-adjacent-violators rate ``iso_rate``
    that a monotone calibrator would output for scores in that bin.
    ``iso_rate`` is non-decreasing in the bin id by construction —
    the fixed lookup table production scoring would apply.

    Scale: the distributed work is exactly the ONE bin-keyed
    map-side-combined collapse of :func:`calibration_report`; PAV
    runs on the driver over the ≤ ``n_bins``-row sidecar (exact
    integer merge arithmetic) through the SAME shared
    :func:`pav_fit` the oracle replays.  Returns ``(bin, n_units,
    pos_rate, iso_rate)``, 6dp; empty bins are absent."""
    rows = sorted(
        _calibration_bins(df, label_col, score_col, n_bins).collect(),
        key=lambda r: r["bin"],
    )
    bins = [
        (int(r["bin"]), int(r["n_units"]), int(r["__np"])) for r in rows
    ]
    iso = pav_fit(bins)
    out = [
        (
            b,
            n,
            round(p / n, 6),
            round(v, 6),
        )
        for (b, n, p), v in zip(bins, iso)
    ]
    return df.sparkSession.createDataFrame(
        out, "bin int, n_units bigint, pos_rate double, iso_rate double"
    )
