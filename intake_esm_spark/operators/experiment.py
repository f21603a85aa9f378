"""Experiment (A/B test) analysis: conversion rates + two-proportion
z-tests against a control.

Extension (SURVEY §2.9): the readout every product experiment ends with
— per-variant conversion, lift vs control, and whether the difference
clears significance. Deliberately the *frequentist two-proportion z*
formulation: it is closed-form arithmetic over four exact integers per
comparison, so the whole report is engine-portable (a Bayesian
posterior would not be; the one bootstrap here — ``bootstrap_mean_ci``
— stays portable by deriving its resample weights from the md5-60
hash instead of an RNG).

Scale: one partial-aggregated groupBy over unit-grain rows (the variant
report is variant-cardinality-sized), then the control row broadcasts
back in-plan — no driver collect, no second scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ab_test_report(
    units: DataFrame,
    variant_col: str,
    converted_col: str,
    control: str,
    z_threshold: float = 1.959964,
) -> DataFrame:
    """Per variant: unit count, conversions, conversion rate, and the
    two-proportion z-statistic vs ``control`` (pooled standard error):
    ``z = (p_v − p_c) / √(p̂(1−p̂)(1/n_v + 1/n_c))`` with ``p̂`` the
    pooled rate. ``units`` must be ONE ROW PER UNIT (deduplicate
    upstream — a unit counted twice silently narrows the standard
    error); ``converted_col`` is 0/1 (any numeric where >0 means
    converted; NULL counts as not-converted — made explicit with a
    coalesce so the unit stays in ``n_units`` without inflating the
    rate). The control row itself carries a null z. ``significant``
    is 1 iff ``|z| >= z_threshold`` (default = two-sided 5%). If
    ``control`` matches no variant, every row survives with a null z
    (control stats LEFT-join in) instead of the report silently
    collapsing to zero rows.

    Determinism: counts are exact integers; every rate and the z are
    fixed IEEE expressions over them, 6dp-rounded."""
    per_variant = (
        units.filter(F.col(variant_col).isNotNull())
        .groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum(
                F.coalesce((F.col(converted_col) > 0).cast("bigint"), F.lit(0))
            ).alias("n_converted"),
        )
    )
    ctrl = per_variant.filter(F.col("variant") == control).select(
        F.lit(1).alias("__ck"),
        F.col("n_units").alias("__nc"),
        F.col("n_converted").alias("__xc"),
    )
    j = per_variant.withColumn("__ck", F.lit(1)).join(
        F.broadcast(ctrl), "__ck", "left"
    )
    nv = F.col("n_units").cast("double")
    xv = F.col("n_converted").cast("double")
    nc = F.col("__nc").cast("double")
    xc = F.col("__xc").cast("double")
    rate = xv / nv
    pool = (xv + xc) / (nv + nc)
    se = F.sqrt(pool * (F.lit(1.0) - pool) * (F.lit(1.0) / nv + F.lit(1.0) / nc))
    z = F.when(
        (F.col("variant") != control) & (se > 0), (xv / nv - xc / nc) / se
    )
    return j.select(
        "variant",
        "n_units",
        "n_converted",
        F.round(rate, 6).alias("rate"),
        F.round(z, 6).alias("z_vs_control"),
        F.coalesce(
            (F.abs(F.round(z, 6)) >= F.lit(z_threshold)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def did_report(
    units: DataFrame,
    group_col: str,
    period_col: str,
    value_col: str,
    treatment: str = "treatment",
    control: str = "control",
    pre: str = "pre",
    post: str = "post",
) -> DataFrame:
    """Difference-in-differences readout: the 2×2 cell means
    (treatment/control × pre/post) and the DiD estimate
    ``(T_post − T_pre) − (C_post − C_pre)`` with its large-sample
    standard error ``√(Σ s²ᵢ/nᵢ)`` over the four cells — the quasi-
    experimental sibling of :func:`ab_test_report` for when treatment
    wasn't randomized but a parallel-trend control exists.

    ``units`` is one row per (unit, period) observation; rows whose
    group/period labels aren't the four expected values are ignored.
    Cells accumulate Σx and Σx² as DECIMAL (order-independent); means,
    the sample variances ``(Σx² − n·x̄²)/(n−1)``, the estimate, and the
    SE are fixed IEEE expressions over them, 6dp-rounded. A cell with
    n < 2 yields a null SE (no variance estimate); a missing cell nulls
    the estimate. One partial-aggregated groupBy over unit-grain rows —
    the output is the four-row cell frame pivoted driver-free into one
    row via conditional aggregation."""
    x = F.col(value_col).cast("decimal(18,6)")
    # one operand widened (19,6)x(18,6) -> product (38,12): Spark's rule
    # for (19,6)x(19,6) hits precision 39 > 38 and silently DROPS scale
    # to 11, while DuckDB keeps (38,12) — the profiling.py one-wide-
    # operand rule keeps both engines bit-identical at scale 12.
    x2 = (
        F.col(value_col).cast("decimal(19,6)")
        * F.col(value_col).cast("decimal(18,6)")
    )
    labeled = units.filter(
        F.col(group_col).isin(treatment, control)
        & F.col(period_col).isin(pre, post)
        & F.col(value_col).isNotNull()
    )

    def cell(g: str, p: str, tag: str):
        cond = (F.col(group_col) == g) & (F.col(period_col) == p)
        return [
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(f"__n_{tag}"),
            F.sum(F.when(cond, x)).alias(f"__s_{tag}"),
            F.sum(F.when(cond, x2)).alias(f"__q_{tag}"),
        ]

    aggs = (
        cell(treatment, pre, "tp")
        + cell(treatment, post, "tq")
        + cell(control, pre, "cp")
        + cell(control, post, "cq")
    )
    row = labeled.agg(*aggs)

    def mean(tag: str):
        return F.col(f"__s_{tag}").cast("double") / F.col(f"__n_{tag}").cast(
            "double"
        )

    def var_over_n(tag: str):
        n = F.col(f"__n_{tag}").cast("double")
        s = F.col(f"__s_{tag}").cast("double")
        q = F.col(f"__q_{tag}").cast("double")
        return F.when(
            F.col(f"__n_{tag}") >= 2, (q - s * s / n) / (n - F.lit(1.0)) / n
        )

    did = (mean("tq") - mean("tp")) - (mean("cq") - mean("cp"))
    se = F.sqrt(
        var_over_n("tp") + var_over_n("tq") + var_over_n("cp") + var_over_n("cq")
    )
    return row.select(
        F.col("__n_tp").alias("n_treat_pre"),
        F.col("__n_tq").alias("n_treat_post"),
        F.col("__n_cp").alias("n_ctrl_pre"),
        F.col("__n_cq").alias("n_ctrl_post"),
        F.round(mean("tp"), 6).alias("mean_treat_pre"),
        F.round(mean("tq"), 6).alias("mean_treat_post"),
        F.round(mean("cp"), 6).alias("mean_ctrl_pre"),
        F.round(mean("cq"), 6).alias("mean_ctrl_post"),
        F.round(did, 6).alias("did_estimate"),
        F.round(se, 6).alias("did_se"),
    )


def chi_square_report(
    units: DataFrame,
    group_col: str,
    outcome_col: str,
) -> DataFrame:
    """Chi-square test of independence between two categorical columns
    — the k-variant × k-outcome generalization of the two-proportion z
    in :func:`ab_test_report`. Returns one row ``(n_units, n_groups,
    n_outcomes, dof, chi2)``; compare ``chi2`` against the critical
    value for ``dof`` client-side (the CDF is not SQL arithmetic).

    The full r×c grid is materialized (margins cross-joined) so
    observed-zero cells still contribute their expected mass — the
    groupBy alone would silently drop them and understate the
    statistic.

    Scale: one partial-agged exchange over the units; everything after
    runs on the cell grid (categorical-cardinality², metadata scale,
    margins broadcast). Determinism: observed counts and margins are
    exact integers; each cell's ``(o−e)²/e`` quantizes to 12dp
    DECIMAL(28,12) before the cross-cell sum (a double sum over cells
    is partition-order-dependent), the pagerank accumulation rule."""
    cells = (
        units.filter(
            F.col(group_col).isNotNull() & F.col(outcome_col).isNotNull()
        )
        .groupBy(
            F.col(group_col).alias("__g"), F.col(outcome_col).alias("__o")
        )
        .agg(F.count(F.lit(1)).alias("__obs"))
        # feeds both margins and the grid join
        .localCheckpoint(eager=False)
    )
    gm = cells.groupBy("__g").agg(F.sum("__obs").alias("__gt"))
    om = cells.groupBy("__o").agg(F.sum("__obs").alias("__ot"))
    nn = cells.agg(F.sum("__obs").alias("__n"))
    grid = (
        gm.crossJoin(F.broadcast(om))
        .join(cells, ["__g", "__o"], "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "__g",
            "__o",
            F.coalesce(F.col("__obs"), F.lit(0)).alias("__obs"),
            (
                F.col("__gt").cast("double")
                * F.col("__ot").cast("double")
                / F.col("__n").cast("double")
            ).alias("__e"),
            "__n",
        )
    )
    contrib = F.round(
        (F.col("__obs").cast("double") - F.col("__e"))
        * (F.col("__obs").cast("double") - F.col("__e"))
        / F.col("__e"),
        12,
    ).cast("decimal(28,12)")
    return grid.agg(
        F.max("__n").alias("n_units"),
        F.countDistinct("__g").alias("n_groups"),
        F.countDistinct("__o").alias("n_outcomes"),
        (
            (F.countDistinct("__g") - F.lit(1))
            * (F.countDistinct("__o") - F.lit(1))
        ).alias("dof"),
        F.round(F.sum(contrib).cast("double"), 6).alias("chi2"),
    )


def _cum_by_value(per_v: DataFrame, sum_cols: list[str]) -> DataFrame:
    """INCLUSIVE prefix sums of ``sum_cols`` over the distinct-value frame
    ``per_v`` ordered by ``__val`` ascending — the two-phase bucketed
    construction that keeps rank statistics free of single-task global
    sorts (for continuous outcomes distinct-values ≈ units, so a global
    ``Window.orderBy(__val)`` would be a corpus-scale single-partition
    sort).  Round 10 moved the machinery to the shared
    :func:`~.ranks.bucketed_cumsum` (same buckets, same plan shape, same
    exact results — the construction is order-preserving and the sums
    associative); this delegate keeps the rank-test call sites and their
    distinct-value contract (``per_v`` has one row per ``__val``, so no
    tiebreaks are needed for exactness)."""
    from .ranks import bucketed_cumsum

    return bucketed_cumsum(per_v, sum_cols, val_col="__val")


def mannwhitney_report(
    units: DataFrame,
    group_col: str,
    value_col: str,
    treatment: str,
    control: str,
    z_threshold: float = 1.959964,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test — the nonparametric
    companion to :func:`ab_test_report` for CONTINUOUS outcomes
    (revenue per user, latency): does the treatment distribution
    stochastically dominate the control, without assuming normality?
    Uses midranks for ties, the normal approximation with the standard
    tie correction ``var = n₁n₂/12·((N+1) − Σ(t³−t)/(N(N−1)))``, and no
    continuity correction (one fewer arbitrary constant to replicate).

    Scale shape: one value-keyed exchange collapses the units to the
    distinct-value grain; the rank cumsum is the TWO-PHASE BUCKETED
    prefix sum (:func:`_cum_by_value` — value-range buckets, per-bucket
    windows, broadcast offsets), so no single task ever sorts the whole
    frame even when the outcome is continuous and distinct ≈ units.

    Determinism: ``2·midrank = 2·cumcount − t + 1`` is an INTEGER, so
    the rank sum ``2·R₁`` and the tie term accumulate as exact
    DECIMAL(38,0) — the whole statistic reduces to one fixed IEEE
    expression over exact integers (prefix sums are associative, so the
    bucketed evaluation is bit-identical to a global sort). Returns one
    row ``(n_treat, n_control, u_stat, z, significant)``; z is null
    when either group is empty or the variance degenerates (all values
    tied)."""
    two = units.filter(
        F.col(group_col).isin(treatment, control)
        & F.col(value_col).isNotNull()
    )
    per_v = two.groupBy(F.col(value_col).alias("__val")).agg(
        F.sum(
            (F.col(group_col) == treatment).cast("bigint")
        ).alias("__ct"),
        F.count(F.lit(1)).alias("__c"),
    )
    ranked = _cum_by_value(per_v, ["__c"]).withColumnRenamed(
        "__cum___c", "__cum"
    )
    # 2·midrank(v) = 2·cum − c + 1 (integer); R1·2 = Σ ct·that.
    # cast-FIRST (the ties term's existing form): the int64 product
    # wraps near 9.2e18 at ~3e9 tied units while DECIMAL(38,0) stays
    # exact — and matches the oracle's cast-before-multiply exactly
    two_r1 = F.sum(
        F.expr(
            "CAST(__ct AS DECIMAL(38,0)) * (2 * __cum - __c + 1)"
        )
    )
    ties = F.sum(
        F.expr("CAST(__c AS DECIMAL(38,0)) * __c * __c - __c")
    )
    m = ranked.agg(
        F.sum("__ct").alias("__n1"),
        (F.sum("__c") - F.sum("__ct")).alias("__n2"),
        two_r1.cast("double").alias("__2r1"),
        ties.cast("double").alias("__tt"),
    )
    n1 = F.col("__n1").cast("double")
    n2 = F.col("__n2").cast("double")
    nn = n1 + n2
    u1 = F.col("__2r1") / F.lit(2.0) - n1 * (n1 + F.lit(1.0)) / F.lit(2.0)
    var = (
        n1
        * n2
        / F.lit(12.0)
        * ((nn + F.lit(1.0)) - F.col("__tt") / (nn * (nn - F.lit(1.0))))
    )
    z = F.when(
        (F.col("__n1") > 0) & (F.col("__n2") > 0) & (var > 0),
        (u1 - n1 * n2 / F.lit(2.0)) / F.sqrt(var),
    )
    return m.select(
        F.col("__n1").alias("n_treat"),
        F.col("__n2").alias("n_control"),
        F.when(
            (F.col("__n1") > 0) & (F.col("__n2") > 0), F.round(u1, 6)
        ).alias("u_stat"),
        F.round(z, 6).alias("z"),
        F.coalesce(
            (F.abs(F.round(z, 6)) >= z_threshold).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def ks_test_report(
    units: DataFrame,
    group_col: str,
    value_col: str,
    treatment: str,
    control: str,
    crit_coeff: float = 1.358102,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test — does the WHOLE treatment
    distribution differ from control (any moment, not just the mean)?
    ``D = max |F₁(x) − F₂(x)|`` over the pooled values, with the
    asymptotic two-sided critical value ``c(α)·√((n₁+n₂)/(n₁n₂))``
    (``crit_coeff`` defaults to c(0.05) = √(−ln(0.025)/2)).

    Scale shape: identical to :func:`mannwhitney_report` — one
    value-keyed exchange collapses units to the distinct-value grain;
    the ECDF cumsums are the two-phase bucketed prefix sum
    (:func:`_cum_by_value`) and the group totals a 1-row broadcast
    aggregate, so no single-task sort and no single-partition window
    anywhere in the plan.

    Determinism: the ECDF difference is kept as the EXACT integer
    ``|cum₁·n₂ − cum₂·n₁|`` (DECIMAL(38,0)) and divided by ``n₁·n₂``
    only in the final row — D is engine-exact to the last bit before
    its 6dp rounding. Returns one row ``(n_treat, n_control, d_stat,
    d_crit, significant)``; d/crit are null when either group is
    empty."""
    two = units.filter(
        F.col(group_col).isin(treatment, control)
        & F.col(value_col).isNotNull()
    )
    per_v = two.groupBy(F.col(value_col).alias("__val")).agg(
        F.sum((F.col(group_col) == treatment).cast("bigint")).alias("__ct"),
        F.count(F.lit(1)).alias("__c"),
    )
    # no coalesce-to-0: on empty input the crossJoin below yields zero
    # rows and the final max-over-empty returns NULL counts — the same
    # empty-input contract as the oracle (a coalesce here would be dead
    # code suggesting otherwise)
    tot = per_v.agg(
        F.sum("__ct").alias("__n1"),
        (F.sum("__c") - F.sum("__ct")).alias("__n2"),
    )
    ranked = (
        _cum_by_value(per_v, ["__ct", "__c"])
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("__cum___ct").alias("__cum1"),
            (F.col("__cum___c") - F.col("__cum___ct")).alias("__cum2"),
            "__n1",
            "__n2",
        )
    )
    diff = F.abs(
        F.expr(
            "CAST(__cum1 AS DECIMAL(38,0)) * __n2"
            " - CAST(__cum2 AS DECIMAL(38,0)) * __n1"
        )
    )
    m = ranked.agg(
        F.max("__n1").alias("__n1"),
        F.max("__n2").alias("__n2"),
        F.max(diff).cast("double").alias("__dnum"),
    )
    n1 = F.col("__n1").cast("double")
    n2 = F.col("__n2").cast("double")
    ok = (F.col("__n1") > 0) & (F.col("__n2") > 0)
    d = F.when(ok, F.round(F.col("__dnum") / (n1 * n2), 6))
    crit = F.when(
        ok, F.round(F.lit(crit_coeff) * F.sqrt((n1 + n2) / (n1 * n2)), 6)
    )
    return m.select(
        F.col("__n1").alias("n_treat"),
        F.col("__n2").alias("n_control"),
        d.alias("d_stat"),
        crit.alias("d_crit"),
        F.coalesce((d > crit).cast("int"), F.lit(0)).alias("significant"),
    )


def cvm_test_report(
    units: DataFrame,
    group_col: str,
    value_col: str,
    treatment: str,
    control: str,
    crit: float = 0.461249,
) -> DataFrame:
    """Two-sample Cramér-von Mises test (round 12) — the
    whole-distribution companion between Mann-Whitney (location only)
    and KS (supremum only): ``T = (n₁n₂/N²)·Σ_pooled (F₁(x)−F₂(x))²``
    integrates the SQUARED ECDF gap over every pooled observation, so
    it sees broad moderate divergence KS's single worst point misses.
    Tie handling: the sum runs over the pooled distinct values
    weighted by their pooled multiplicities (the ECDF-integral form —
    identical to the classic rank formula on tie-free data, and the
    natural extension under ties; documented divergence from midrank
    variants).  The readout standardizes with Anderson's exact finite-
    sample moments ``E[T] = (1+1/N)/6``, ``Var[T] = (N+1)(4n₁n₂N −
    3(n₁²+n₂²) − 2n₁n₂) / (45N²·4n₁n₂)`` and maps back onto the
    limiting ω² scale (``t_adj = 1/6 + (T−E)√(Var∞/Var)`` with
    ``Var∞ = 1/45`` — the scipy adjustment), compared against the ω²
    table's 5% point (``crit`` = 0.461249).

    Scale shape: identical to :func:`ks_test_report` — one value-keyed
    exchange to the distinct-value grain, ECDF cumsums via the
    two-phase bucketed prefix sum, group totals a 1-row broadcast;
    per-value terms quantize to 12dp DECIMAL(38,12) before the
    cross-value sum (order-independent), the integer ECDF gap
    ``cum₁n₂ − cum₂n₁`` is exact DECIMAL(38,0) before its one double
    division.  Returns one row ``(n_treat, n_control, t_stat, t_adj,
    significant)``; null t when either group is empty."""
    two = units.filter(
        F.col(group_col).isin(treatment, control)
        & F.col(value_col).isNotNull()
    )
    per_v = two.groupBy(F.col(value_col).alias("__val")).agg(
        F.sum((F.col(group_col) == treatment).cast("bigint")).alias("__ct"),
        F.count(F.lit(1)).alias("__c"),
    )
    tot = per_v.agg(
        F.sum("__ct").alias("__n1"),
        (F.sum("__c") - F.sum("__ct")).alias("__n2"),
    )
    ranked = (
        _cum_by_value(per_v, ["__ct", "__c"])
        .crossJoin(F.broadcast(tot))
        .select(
            "__c",
            F.col("__cum___ct").alias("__cum1"),
            (F.col("__cum___c") - F.col("__cum___ct")).alias("__cum2"),
            "__n1",
            "__n2",
        )
    )
    gap = F.expr(
        "CAST(__cum1 AS DECIMAL(38,0)) * __n2"
        " - CAST(__cum2 AS DECIMAL(38,0)) * __n1"
    ).cast("double") / (
        F.col("__n1").cast("double") * F.col("__n2").cast("double")
    )
    term = F.round(F.col("__c").cast("double") * gap * gap, 12).cast(
        "decimal(38,12)"
    )
    m = ranked.agg(
        F.max("__n1").alias("__n1"),
        F.max("__n2").alias("__n2"),
        F.sum(term).cast("double").alias("__s"),
    )
    n1 = F.col("__n1").cast("double")
    n2 = F.col("__n2").cast("double")
    nn = n1 + n2
    ok = (F.col("__n1") > 0) & (F.col("__n2") > 0)
    t = F.when(ok, n1 * n2 / (nn * nn) * F.col("__s"))
    et = (F.lit(1.0) + F.lit(1.0) / nn) / F.lit(6.0)
    vt = (
        (nn + F.lit(1.0))
        * (
            F.lit(4.0) * n1 * n2 * nn
            - F.lit(3.0) * (n1 * n1 + n2 * n2)
            - F.lit(2.0) * n1 * n2
        )
        / (F.lit(45.0) * nn * nn * F.lit(4.0) * n1 * n2)
    )
    t_adj = F.when(
        ok & (vt > 0),
        F.lit(1.0 / 6.0)
        + (t - et) * F.sqrt(F.lit(1.0 / 45.0) / vt),
    )
    return m.select(
        F.col("__n1").alias("n_treat"),
        F.col("__n2").alias("n_control"),
        F.round(t, 6).alias("t_stat"),
        F.round(t_adj, 6).alias("t_adj"),
        F.coalesce(
            (F.round(t_adj, 6) > F.lit(crit)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def _poisson1_cdf(max_k: int = 9) -> list[float]:
    """Cumulative P(Poisson(1) <= k) for k = 0..max_k-1 — the inverse-CDF
    thresholds of the bootstrap weights. Pure arithmetic (no RNG): both
    the Spark literals and the SQL oracle embed the SAME doubles."""
    import math

    cdf, acc, fact = [], 0.0, 1.0
    for k in range(max_k):
        if k > 0:
            fact *= k
        acc += math.exp(-1.0) / fact
        cdf.append(acc)
    return cdf


def bootstrap_mean_ci(
    units: DataFrame,
    value_col: str,
    key_col: str,
    n_boot: int = 200,
    level: float = 0.95,
    salt: str = "bs",
) -> DataFrame:
    """Deterministic Poisson-bootstrap confidence interval for the mean
    of ``value_col`` over one-row-per-unit data. The classic n-out-of-n
    bootstrap needs a global multinomial draw (unshardable); the
    Poisson bootstrap (Chamandy et al. 2012, "Estimating Uncertainty
    for Massively Parallel Algorithms", Google) replaces it with an
    independent Poisson(1) weight per (unit, replicate) — each weight a
    pure function of the unit key, so the whole resample is a ROW
    FUNCTION: partition-independent, re-ingest-stable, and replayable
    by a SQL oracle (no RNG state anywhere).

    Weight construction: ``u = md5₆₀(salt|key#r)/2⁶⁰`` inverted through
    the Poisson(1) CDF literals (k = 0..9; P(X>9) ≈ 1e-7 truncates to
    9 — bias far below the CI's own Monte-Carlo error at any real
    ``n_boot``).

    Scale shape: one ``explode(sequence(1, n_boot))`` fans each unit
    row out ×``n_boot`` (the deliberate, documented cost — 200× a
    UNIT-grain frame, not the event corpus), one replicate-keyed
    map-side-combined aggregation (``n_boot`` output rows), then the
    CI bounds select replicate means BY RANK (no interpolation — the
    Theil-Sen precedent) over the ``n_boot``-row frame. Weighted sums
    accumulate as DECIMAL(28,6)·weight — order-independent.

    Returns one row ``(n_units, n_boot, mean, ci_lo, ci_hi)`` with the
    point estimate from the unweighted sample and rank-selected
    ``level`` bounds; replicates with all-zero weight (probability
    ~e^{-n} per replicate) yield a null mean and are excluded from the
    rank selection."""
    from pyspark.sql import Window

    from intake_esm_spark.functions.text import HASH_SPACE_60, salted_hash60

    if n_boot < 2:
        raise ValueError(f"n_boot must be >= 2, got {n_boot}")
    if not (0.0 < level < 1.0):
        raise ValueError(f"level must be in (0,1), got {level}")
    cdf = _poisson1_cdf()
    base = units.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("__k"),
        F.col(value_col).cast("decimal(28,6)").alias("__x"),
    )
    rep = base.select(
        "__k", "__x", F.explode(F.sequence(F.lit(1), F.lit(n_boot))).alias("__r")
    )
    u = salted_hash60(
        F.concat(F.col("__k").cast("string"), F.lit("#"), F.col("__r")),
        salt,
    ).cast("double") / F.lit(HASH_SPACE_60)
    # weight = #thresholds at or below u  (inverse CDF; exact compares)
    wgt = sum((u >= F.lit(c)).cast("int") for c in cdf)
    means = (
        rep.select("__r", "__x", wgt.alias("__w"))
        .groupBy("__r")
        .agg(
            F.sum(F.col("__x") * F.col("__w")).alias("__sx"),
            F.sum("__w").alias("__sw"),
        )
        .select(
            "__r",
            # divide as DOUBLE (decimal/decimal scale rules differ per
            # engine; double division is the same IEEE op everywhere)
            F.when(
                F.col("__sw") > 0,
                F.round(
                    F.col("__sx").cast("double")
                    / F.col("__sw").cast("double"),
                    9,
                ),
            ).alias("__m"),
        )
        .filter(F.col("__m").isNotNull())
    )
    alpha = 1.0 - level
    rk = Window.orderBy(F.col("__m").asc(), F.col("__r").asc())
    cnt = Window.partitionBy()  # n_boot-row frame, bounded
    picked = means.select(
        F.col("__m"),
        F.row_number().over(rk).alias("__rank"),
        F.count(F.lit(1)).over(cnt).alias("__nb"),
    )
    lo_rank = F.greatest(
        F.lit(1), F.ceil(F.col("__nb") * F.lit(alpha / 2.0)).cast("int")
    )
    hi_rank = F.least(
        F.col("__nb").cast("int"),
        F.ceil(F.col("__nb") * F.lit(1.0 - alpha / 2.0)).cast("int"),
    )
    bounds = picked.agg(
        F.max(F.when(F.col("__rank") == lo_rank, F.col("__m"))).alias("__lo"),
        F.max(F.when(F.col("__rank") == hi_rank, F.col("__m"))).alias("__hi"),
        F.max("__nb").alias("__nb"),
    )
    point = base.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.round(
            F.sum("__x").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean"),
    )
    return point.crossJoin(F.broadcast(bounds)).select(
        "n_units",
        F.col("__nb").cast("int").alias("n_boot"),
        "mean",
        F.round("__lo", 6).alias("ci_lo"),
        F.round("__hi", 6).alias("ci_hi"),
    )


def cuped_report(
    units: DataFrame,
    variant_col: str,
    metric_col: str,
    covariate_col: str,
    control: str,
    z_threshold: float = 1.959964,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. 2013,
    "Improving the Sensitivity of Online Controlled Experiments by
    Utilizing Pre-Experiment Data"): regress the metric on a
    pre-experiment covariate (``θ = cov(y,x)/var(x)``, pooled), analyze
    the adjusted metric ``y' = y − θ·(x − x̄)`` — same expectation,
    variance shrunk by the squared correlation, so the same experiment
    detects smaller lifts. THE standard trick for revenue metrics where
    last month's spend predicts this month's.

    Everything is closed-form over decimal moments, so no second pass
    ever touches the units: per-variant ``(n, Σy, Σx, Σy², Σx², Σxy)``
    fold in ONE map-side-combined aggregation; θ and x̄ derive from the
    variant-frame totals (window over the variant-cardinality frame);
    adjusted means/variances expand algebraically —
    ``var(y') = var(y) − 2θ·cov(y,x) + θ²·var(x)`` per variant. Rows
    with a null metric or covariate are excluded (CUPED needs both).

    Returns one row per variant: ``(variant, n_units, mean_raw,
    mean_adj, z_adj, var_reduction_pct, significant)`` — ``z_adj`` is
    the two-sample z on adjusted means vs ``control`` (null on the
    control row itself and when either variance degenerates);
    ``var_reduction_pct`` = ``100·(1 − var(y')/var(y))``."""
    from pyspark.sql import Window

    # one operand widened (19,6)x(18,6) -> product (38,12) in BOTH
    # engines; (19,6)x(19,6) would hit Spark's precision-39 overflow and
    # silently drop the product to scale 11 while DuckDB keeps 12 (the
    # profiling.py rule).
    dw = lambda c: F.col(c).cast("decimal(19,6)")  # noqa: E731
    dn = lambda c: F.col(c).cast("decimal(18,6)")  # noqa: E731
    clean = units.filter(
        F.col(metric_col).isNotNull()
        & F.col(covariate_col).isNotNull()
        & F.col(variant_col).isNotNull()
    )
    per_v = clean.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dn(metric_col)).alias("sy"),
        F.sum(dn(covariate_col)).alias("sx"),
        F.sum(dw(metric_col) * dn(metric_col)).alias("syy"),
        F.sum(dw(covariate_col) * dn(covariate_col)).alias("sxx"),
        F.sum(dw(metric_col) * dn(covariate_col)).alias("sxy"),
    )
    tot = Window.partitionBy()  # variant-cardinality frame, bounded
    g = per_v.select(
        "*",
        F.sum("n").over(tot).alias("tn"),
        F.sum("sy").over(tot).cast("double").alias("tsy"),
        F.sum("sx").over(tot).cast("double").alias("tsx"),
        F.sum("sxx").over(tot).cast("double").alias("tsxx"),
        F.sum("sxy").over(tot).cast("double").alias("tsxy"),
    )
    tnd = F.col("tn").cast("double")
    # pooled theta and covariate mean over exact totals
    var_x_pool = F.col("tsxx") - F.col("tsx") * F.col("tsx") / tnd
    cov_pool = F.col("tsxy") - F.col("tsx") * F.col("tsy") / tnd
    theta = F.when(var_x_pool > 0, cov_pool / var_x_pool).otherwise(F.lit(0.0))
    xbar = F.col("tsx") / tnd
    n = F.col("n").cast("double")
    my = F.col("sy").cast("double") / n
    mx = F.col("sx").cast("double") / n
    # per-variant sample (co)variances from the same moments
    vy = F.when(
        F.col("n") >= 2,
        (F.col("syy").cast("double") - n * my * my) / (n - F.lit(1.0)),
    )
    vx = F.when(
        F.col("n") >= 2,
        (F.col("sxx").cast("double") - n * mx * mx) / (n - F.lit(1.0)),
    )
    cxy = F.when(
        F.col("n") >= 2,
        (F.col("sxy").cast("double") - n * mx * my) / (n - F.lit(1.0)),
    )
    # var(y') is mathematically >= 0, but when the covariate (near-)
    # perfectly explains the metric the float expansion can dip a hair
    # below 0 — sqrt would then return NaN, and Spark orders NaN ABOVE
    # every number, so (se > 0) passes and `significant` fires on a NaN
    # z. Clamp at 0 (null-preserving: n < 2 keeps its null variance).
    vadj_raw = vy - F.lit(2.0) * theta * cxy + theta * theta * vx
    vadj = F.when(vadj_raw.isNotNull(), F.greatest(vadj_raw, F.lit(0.0)))
    stats = g.select(
        "variant",
        F.col("n").alias("n_units"),
        my.alias("__my"),
        (my - theta * (mx - xbar)).alias("__madj"),
        vy.alias("__vy"),
        vadj.alias("__vadj"),
    ).localCheckpoint(eager=False)  # tiny frame, referenced by the ctrl join
    ctrl = stats.filter(F.col("variant") == control).select(
        F.lit(1).alias("__ck"),
        F.col("n_units").alias("__nc"),
        F.col("__madj").alias("__mc"),
        F.col("__vadj").alias("__vc"),
    )
    j = stats.withColumn("__ck", F.lit(1)).join(F.broadcast(ctrl), "__ck", "left")
    se = F.sqrt(
        F.col("__vadj") / F.col("n_units").cast("double")
        + F.col("__vc") / F.col("__nc").cast("double")
    )
    z = F.when(
        (F.col("variant") != control) & (se > 0),
        (F.col("__madj") - F.col("__mc")) / se,
    )
    vr = F.when(
        F.col("__vy") > 0,
        F.lit(100.0) * (F.lit(1.0) - F.col("__vadj") / F.col("__vy")),
    )
    return j.select(
        "variant",
        "n_units",
        F.round("__my", 6).alias("mean_raw"),
        F.round("__madj", 6).alias("mean_adj"),
        F.round(z, 6).alias("z_adj"),
        F.round(vr, 6).alias("var_reduction_pct"),
        F.coalesce(
            (F.abs(F.round(z, 6)) >= F.lit(z_threshold)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def srm_report(
    units: DataFrame,
    variant_col: str,
    expected_shares: list[tuple[str, float]],
) -> DataFrame:
    """Sample-ratio-mismatch check — the FIRST test run on any
    experiment readout (a traffic split that doesn't match its config
    invalidates every downstream metric: bot filtering, redirect loss,
    or assignment bugs skew who got counted). Per configured variant:
    observed units, expected units ``N·share``, and the chi-square
    contribution ``(o − e)²/e``; the total chi-square against
    ``len(shares) − 1`` degrees of freedom is the scalar gate (compare
    client-side, the :func:`chi_square_report` convention).

    ``expected_shares`` is the configured allocation (label, share);
    shares must be > 0 (a zero-share arm with observed traffic is
    trivially mismatched — model it upstream). Units with labels
    OUTSIDE the configured set are counted into ``n_unassigned`` on
    every row (a nonzero value is itself an SRM signal); null labels
    are excluded. N is the total over CONFIGURED variants only.

    Plan: one variant-keyed count collapse (map-side partial), the
    expected table a broadcast literal frame — output is
    len(shares)-sized. Determinism: counts exact; contributions fixed
    IEEE over them, 6dp."""
    _validate_srm_shares(expected_shares)
    counts = (
        units.filter(F.col(variant_col).isNotNull())
        .groupBy(F.col(variant_col).cast("string").alias("variant"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)  # feeds the join + both totals
    )
    return srm_from_counts(counts, expected_shares)


def _validate_srm_shares(expected_shares: list[tuple[str, float]]) -> None:
    if not expected_shares:
        raise ValueError("expected_shares must be non-empty")
    labels = [lab for lab, _ in expected_shares]
    if len(set(labels)) != len(labels):
        raise ValueError("expected_shares labels must be unique")
    for lab, sh in expected_shares:
        if not sh > 0:
            raise ValueError(f"share for {lab!r} must be > 0, got {sh}")


def srm_from_counts(
    counts: DataFrame,
    expected_shares: list[tuple[str, float]],
) -> DataFrame:
    """The :func:`srm_report` readout over an ALREADY-COLLAPSED
    ``(variant, __c)`` count frame — the shared tail that makes the
    streaming twin (``streaming.stateful.stream_srm``) bit-identical to
    the batch report: the stream maintains the per-variant counters,
    and snapshotting them through this function IS the batch operator
    (same broadcast expectation table, same fixed IEEE contributions).
    Variants outside the configured set fold into ``n_unassigned``."""
    _validate_srm_shares(expected_shares)
    spark = counts.sparkSession
    exp = spark.createDataFrame(
        [(lab, float(sh)) for lab, sh in expected_shares],
        "variant string, expected_share double",
    )
    obs = exp.join(F.broadcast(counts), "variant", "left").select(
        "variant",
        "expected_share",
        F.coalesce("__c", F.lit(0)).alias("n_obs"),
    )
    tot = obs.agg(F.sum("n_obs").alias("__n"))
    other = (
        counts.join(F.broadcast(exp.select("variant")), "variant", "left_anti")
        .agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__unassigned"))
    )
    j = obs.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(other))
    e = F.col("__n").cast("double") * F.col("expected_share")
    o = F.col("n_obs").cast("double")
    contrib = F.when(e > 0, (o - e) * (o - e) / e)
    return j.select(
        "variant",
        "n_obs",
        F.round(e, 6).alias("n_expected"),
        F.round(F.col("expected_share"), 6).alias("expected_share"),
        F.round(contrib, 6).alias("chi2_contribution"),
        F.col("__unassigned").alias("n_unassigned"),
    )


def ips_value(
    df: DataFrame,
    reward_col: str,
    target_prob_col: str,
    logging_prob_col: str,
    clip: float = 10.0,
) -> DataFrame:
    """Clipped inverse-propensity off-policy value estimate — "what
    would the NEW policy's mean reward have been on the logged traffic"
    (Horvitz-Thompson / IPS, the counterfactual-evaluation primitive
    behind ranking and recommendation rollouts): per logged unit the
    weight ``w = min(clip, p_target/p_logging)`` re-weights its reward;
    ``ips_value = Σ w·r / n`` and the self-normalized
    ``snips_value = Σ w·r / Σ w`` (lower variance, the production
    default). Rows with null reward/probabilities or a non-positive
    logging probability are excluded (an action the logger could never
    take carries no counterfactual information).

    Plan: one map-side-combined aggregation — weights are in-row IEEE
    expressions. Determinism: ``w`` and ``w·r`` quantize to 9dp
    DECIMAL(28,12) BEFORE summing (the chi-square cell rule: a double
    sum over the corpus is partition-order-dependent); the final
    ratios are fixed IEEE over the exact sums, 6dp. Returns one row
    ``(n_units, n_clipped, mean_weight, ips_value, snips_value)`` —
    ``n_clipped`` counts weights AT or above the clip (a ratio landing
    exactly on the boundary is saturated too) and, with
    ``mean_weight``, tells you the estimate is extrapolating (weights
    piling on the clip ⇒ the policies barely overlap and the number is
    not trustworthy)."""
    if not clip > 0:
        raise ValueError(f"clip must be > 0, got {clip}")
    clean = df.filter(
        F.col(reward_col).isNotNull()
        & F.col(target_prob_col).isNotNull()
        & F.col(logging_prob_col).isNotNull()
        & (F.col(logging_prob_col) > 0)
    )
    raw_w = F.col(target_prob_col).cast("double") / F.col(
        logging_prob_col
    ).cast("double")
    w = F.least(F.lit(float(clip)), raw_w)
    wq = F.round(w, 9).cast("decimal(28,12)")
    wrq = F.round(w * F.col(reward_col).cast("double"), 9).cast(
        "decimal(28,12)"
    )
    m = clean.agg(
        F.count(F.lit(1)).alias("n_units"),
        # >= : a ratio landing exactly ON the clip is saturated — the
        # estimator can no longer follow it up, so the diagnostic must
        # count it (strict > hid boundary weights)
        F.coalesce(
            F.sum((raw_w >= F.lit(float(clip))).cast("bigint")), F.lit(0)
        ).alias("n_clipped"),
        F.sum(wq).alias("__sw"),
        F.sum(wrq).alias("__swr"),
    )
    n = F.col("n_units").cast("double")
    sw = F.col("__sw").cast("double")
    swr = F.col("__swr").cast("double")
    return m.select(
        "n_units",
        "n_clipped",
        F.when(F.col("n_units") > 0, F.round(sw / n, 6)).alias("mean_weight"),
        F.when(F.col("n_units") > 0, F.round(swr / n, 6)).alias("ips_value"),
        F.when(sw > 0, F.round(swr / sw, 6)).alias("snips_value"),
    )


def quantile_treatment_effects(
    units: DataFrame,
    group_col: str,
    value_col: str,
    treatment: str,
    control: str,
    probs: list[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Quantile treatment effects — where in the outcome distribution
    the treatment moved (a mean shift of +2 can be "everyone +2" or
    "the p90 exploded while the median fell"; regressions on means
    can't tell them apart). Per probability: the treatment and control
    quantiles and their difference.

    Thin composition over :func:`~.profiling.group_quantiles`
    (``exact=True``: Spark ``percentile`` = type-7 interpolation,
    bitwise DuckDB ``quantile_cont`` parity; swap ``exact=False`` for
    the fixed-state Greenwald-Khanna path at 100 TB): ONE grouped
    aggregation over the two arms, the two quantile rows then pivot
    via conditional aggregation into per-probability rows through a
    ``posexplode`` of the probability literals — everything after the
    group collapse is 2-row metadata. Returns ``(prob, q_treatment,
    q_control, qte)`` rows; a missing arm nulls its side and the
    effect."""
    plist = list(probs)
    if not plist:
        raise ValueError("probs must be non-empty")
    from .profiling import group_quantiles

    two = units.filter(
        F.col(group_col).isin(treatment, control)
        & F.col(value_col).isNotNull()
    )
    cols = [f"__q{i}" for i in range(len(plist))]
    q = group_quantiles(
        two.select(F.col(group_col).alias("__g"), F.col(value_col)),
        value_col,
        ["__g"],
        plist,
        out_cols=cols,
    )
    folded = q.agg(
        *[
            F.max(F.when(F.col("__g") == treatment, F.col(c))).alias(
                f"__t{i}"
            )
            for i, c in enumerate(cols)
        ],
        *[
            F.max(F.when(F.col("__g") == control, F.col(c))).alias(f"__c{i}")
            for i, c in enumerate(cols)
        ],
    )
    prob_arr = F.array(*[F.lit(float(p)) for p in plist])
    rows = folded.select(
        F.posexplode(prob_arr).alias("__i", "prob"),
        *[F.col(f"__t{i}") for i in range(len(plist))],
        *[F.col(f"__c{i}") for i in range(len(plist))],
    )
    qt = None
    qc = None
    for i in range(len(plist)):
        t_i = F.when(F.col("__i") == i, F.col(f"__t{i}"))
        c_i = F.when(F.col("__i") == i, F.col(f"__c{i}"))
        qt = t_i if qt is None else F.coalesce(qt, t_i)
        qc = c_i if qc is None else F.coalesce(qc, c_i)
    return rows.select(
        F.round("prob", 6).alias("prob"),
        F.round(qt, 6).alias("q_treatment"),
        F.round(qc, 6).alias("q_control"),
        F.round(qt - qc, 6).alias("qte"),
    )


def trend_test(
    units: DataFrame,
    dose_col: str,
    converted_col: str,
    z_threshold: float = 1.959964,
) -> DataFrame:
    """Cochran-Armitage test for a TREND in proportions across ordered
    exposure levels — "does conversion rise WITH the dose" (price
    tiers, ranking positions, model-score buckets), strictly stronger
    than the k-group chi-square when the alternative is monotone:
    ``z = (Σxᵢcᵢ − p̄·Σxᵢ) / √(p̄(1−p̄)(Σxᵢ² − (Σxᵢ)²/N))`` over
    per-unit doses xᵢ and 0/1 conversions cᵢ, with ``p̄`` the pooled
    rate. Null dose or conversion excludes the unit; any numeric dose
    works (the statistic uses the doses as scores).

    Plan: ONE map-side-combined aggregation. Determinism: doses
    accumulate as DECIMAL(18,6) (Σx, Σxc) with the squared moment at
    the (19,6)×(18,6) → (38,12) width (the profiling.py rule); z is a
    fixed IEEE expression over the exact moments, 6dp. z is null when
    the dose is constant or the pooled rate degenerates (0 or 1).
    Returns one row ``(n_units, n_converted, n_doses, z,
    significant)``."""
    clean = units.filter(
        F.col(dose_col).isNotNull() & F.col(converted_col).isNotNull()
    )
    x = F.col(dose_col).cast("decimal(18,6)")
    xw = F.col(dose_col).cast("decimal(19,6)")
    conv = (F.col(converted_col) > 0).cast("bigint")
    m = clean.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.coalesce(F.sum(conv), F.lit(0)).alias("n_converted"),
        F.countDistinct(F.col(dose_col)).alias("n_doses"),
        F.sum(x).alias("__sx"),
        F.sum(xw * x).alias("__sxx"),
        F.sum(F.when(conv == 1, x)).alias("__sxc"),
    )
    n = F.col("n_units").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sxc = F.coalesce(F.col("__sxc").cast("double"), F.lit(0.0))
    pbar = F.col("n_converted").cast("double") / n
    var = pbar * (F.lit(1.0) - pbar) * (sxx - sx * sx / n)
    z = F.when(
        (F.col("n_units") > 0) & (var > 0),
        (sxc - pbar * sx) / F.sqrt(var),
    )
    return m.select(
        "n_units",
        "n_converted",
        "n_doses",
        F.round(z, 6).alias("z"),
        F.coalesce(
            (F.abs(F.round(z, 6)) >= F.lit(z_threshold)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def power_mde_report(
    units: DataFrame,
    group_col: str,
    value_col: str,
    treatment: str,
    control: str,
    z_alpha: float = 1.959964,
    z_power: float = 0.841621,
) -> DataFrame:
    """Minimum detectable effect at the CURRENT sample — the experiment
    design readout run before (and during) any A/B test: given the two
    arms' realized sizes and variances, the smallest true lift the
    z-test could flag, ``MDE = (z_{1−α/2} + z_{power})·√(s²_t/n_t +
    s²_c/n_c)``. An observed effect under the MDE is not evidence of
    absence; shipping decisions need this number next to the p-value.
    Defaults: two-sided α = 0.05 (1.959964) at 80% power (0.841621) —
    pass other normal quantiles for other levels (kept as explicit
    parameters; no closed-form inverse-normal in either engine).

    Plan: ONE map-side-combined aggregation of both arms' decimal
    moments (the :func:`ab_test_report` shape — count, Σx, Σx² per arm
    via conditional aggregation). Determinism: moments accumulate as
    DECIMAL with the (19,6)×(18,6) → (38,12) one-wide-operand product
    rule; MDE/SE are fixed IEEE expressions over them, 6dp. Sample
    variances use n−1; an arm with < 2 units nulls the result. Returns
    one row ``(n_treatment, n_control, mean_control, se_diff, mde_abs,
    mde_rel)`` — ``mde_rel`` (the % lift floor) is null when the
    control mean is 0. Null values excluded."""
    if not z_alpha > 0 or not z_power >= 0:
        raise ValueError(
            f"need z_alpha > 0 and z_power >= 0, got ({z_alpha}, {z_power})"
        )
    dw = lambda c: c.cast("decimal(19,6)")  # noqa: E731
    dn = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    v = F.col(value_col)
    is_t = F.col(group_col) == treatment
    is_c = F.col(group_col) == control
    m = units.filter(
        (is_t | is_c) & v.isNotNull()
    ).agg(
        F.coalesce(F.sum(is_t.cast("bigint")), F.lit(0)).alias("__nt"),
        F.coalesce(F.sum(is_c.cast("bigint")), F.lit(0)).alias("__nc"),
        F.sum(F.when(is_t, dn(v))).alias("__st"),
        F.sum(F.when(is_t, dw(v) * dn(v))).alias("__stt"),
        F.sum(F.when(is_c, dn(v))).alias("__sc"),
        F.sum(F.when(is_c, dw(v) * dn(v))).alias("__scc"),
    )

    def _var(n, s, ss):
        nd = n.cast("double")
        # clamped at 0: the float expansion can dip ~1e-10 below zero on
        # a constant arm, and sqrt(negative) is NaN, not null — the
        # CUPED vadj clamp (experiment.py ~l.650) applied here too
        return F.greatest(
            (ss.cast("double") - s.cast("double") * s.cast("double") / nd)
            / (nd - F.lit(1.0)),
            F.lit(0.0),
        )

    var_t = _var(F.col("__nt"), F.col("__st"), F.col("__stt"))
    var_c = _var(F.col("__nc"), F.col("__sc"), F.col("__scc"))
    se = F.sqrt(
        var_t / F.col("__nt").cast("double")
        + var_c / F.col("__nc").cast("double")
    )
    ok = (F.col("__nt") > 1) & (F.col("__nc") > 1)
    mean_c = F.col("__sc").cast("double") / F.col("__nc").cast("double")
    mde = (F.lit(float(z_alpha)) + F.lit(float(z_power))) * se
    return m.select(
        F.col("__nt").alias("n_treatment"),
        F.col("__nc").alias("n_control"),
        F.when(F.col("__nc") > 0, F.round(mean_c, 6)).alias("mean_control"),
        F.when(ok, F.round(se, 6)).alias("se_diff"),
        F.when(ok, F.round(mde, 6)).alias("mde_abs"),
        F.when(ok & (mean_c != 0), F.round(mde / mean_c, 6)).alias(
            "mde_rel"
        ),
    )


def qini_report(
    df: DataFrame,
    treatment_col: str,
    outcome_col: str,
    score_col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Qini / uplift curve table — the evaluation for an UPLIFT model
    (a score that claims to rank units by how much the treatment
    changes THEIR outcome, not by outcome propensity): rank all units
    by score descending into ``n_bins`` tiles and report, at each
    cumulative depth, both arms' exposure and response plus
    ``uplift_at_depth`` (the response-rate gap among the targeted
    head) and the Qini value ``Y_t(φ) − Y_c(φ)·N_t(φ)/N_c(φ)`` — the
    treated-response excess over what the control arm predicts for the
    same depth. A model that just predicts conversion ranks
    sure-things first and shows a FLAT Qini; lift_table cannot tell
    the difference, this can.

    Scale: the rank is the bucketed prefix sum
    (:func:`~.ranks.global_rank` + :func:`~.ranks.ntile_from_rank` —
    the lift_table discipline, no single-task row-frame sort), run
    with ``tie_fanout`` (round 11: uplift scores clamp/quantize to
    mass points, and value-only bucketing would hold such a tied run
    in one window task — heavy scores sub-bucket by the id tiebreak);
    everything after is the ``n_bins``-row frame (its cumulative
    window is the bounded offset-table class). Determinism: all four
    cumulative quantities are exact integer counts; uplift/qini are
    fixed IEEE expressions over them, 6dp. Null treatment/outcome/
    score/id excludes the unit (a null id would break the total order
    the bin boundary stands on — and make bin assignment among tied
    scores physical-order nondeterministic); uplift is null until
    both arms appear, qini null until the control arm appears.
    ``treatment_col`` and ``outcome_col`` are truthy-numeric (> 0 =
    treated / converted)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from pyspark.sql import Window

    from .ranks import global_rank, ntile_from_rank

    t = (F.col(treatment_col) > 0).cast("bigint")
    y = (F.col(outcome_col) > 0).cast("bigint")
    base = (
        df.filter(
            F.col(treatment_col).isNotNull()
            & F.col(outcome_col).isNotNull()
            & F.col(score_col).isNotNull()
            & F.col(id_col).isNotNull()
        )
        .select(
            F.col(id_col),
            F.col(score_col).alias("__val"),
            t.alias("__t"),
            y.alias("__y"),
        )
        .localCheckpoint(eager=False)  # feeds the row count AND the ranks
    )
    nrows = base.agg(F.count(F.lit(1)).alias("__nr"))
    ranked = global_rank(
        base.crossJoin(F.broadcast(nrows)),
        "__val",
        [id_col],
        descending=True,
        tie_fanout=True,
    )
    binned = ranked.withColumn(
        "bin", ntile_from_rank(F.col("__rank"), F.col("__nr"), n_bins)
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("__t").alias("__nt"),
        F.sum(F.lit(1) - F.col("__t")).alias("__nc"),
        F.sum(F.col("__y") * F.col("__t")).alias("__yt"),
        F.sum(F.col("__y") * (F.lit(1) - F.col("__t"))).alias("__yc"),
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cnt = F.sum("__nt").over(wc)
    cnc = F.sum("__nc").over(wc)
    cyt = F.sum("__yt").over(wc)
    cyc = F.sum("__yc").over(wc)
    uplift = F.when(
        (cnt > 0) & (cnc > 0),
        cyt.cast("double") / cnt.cast("double")
        - cyc.cast("double") / cnc.cast("double"),
    )
    qini = F.when(
        cnc > 0,
        cyt.cast("double")
        - cyc.cast("double") * cnt.cast("double") / cnc.cast("double"),
    )
    return per_bin.select(
        "bin",
        "n_units",
        cnt.alias("cum_n_treat"),
        cnc.alias("cum_n_ctrl"),
        cyt.alias("cum_resp_treat"),
        cyc.alias("cum_resp_ctrl"),
        F.round(uplift, 6).alias("uplift_at_depth"),
        F.round(qini, 6).alias("qini"),
    )


def proportion_ci_report(
    units: DataFrame,
    variant_col: str,
    converted_col: str,
    z: float = 1.959964,
) -> DataFrame:
    """Per-variant Wilson score interval for the conversion rate — the
    CI that belongs NEXT TO :func:`ab_test_report`'s z readout (a
    Wald interval collapses to zero width at 0/n and overshoots [0,1];
    Wilson stays honest at small n and extreme rates):
    ``(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)``.

    Plan: ONE variant-keyed count collapse (map-side partial, output
    variant-cardinality); the interval is pure in-row IEEE arithmetic
    over exact integers, 6dp. NULL conversions count as not-converted
    (the ab_test_report contract); a zero-unit variant cannot occur
    (groupBy only sees existing rows). Returns ``(variant, n_units,
    n_converted, rate, ci_low, ci_high)``."""
    if not z > 0:
        raise ValueError(f"z must be > 0, got {z}")
    per_variant = (
        units.filter(F.col(variant_col).isNotNull())
        .groupBy(F.col(variant_col).alias("variant"))
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum(
                F.coalesce(
                    (F.col(converted_col) > 0).cast("bigint"), F.lit(0)
                )
            ).alias("n_converted"),
        )
    )
    n = F.col("n_units").cast("double")
    p = F.col("n_converted").cast("double") / n
    z2 = F.lit(float(z) * float(z))
    center = p + z2 / (F.lit(2.0) * n)
    margin = F.lit(float(z)) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + z2 / n
    return per_variant.select(
        "variant",
        "n_units",
        "n_converted",
        F.round(p, 6).alias("rate"),
        F.round(F.greatest((center - margin) / denom, F.lit(0.0)), 6).alias(
            "ci_low"
        ),
        F.round(F.least((center + margin) / denom, F.lit(1.0)), 6).alias(
            "ci_high"
        ),
    )


def eb_shrunk_rates(
    df: DataFrame,
    key_col: str,
    converted_col: str,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    per-entity conversion rates toward the corpus prior — the fix for
    "the top-rated item has 1/1 conversions": a raw rate from 3 trials
    should not outrank a 48% rate from 10,000. The prior strength
    ``K = α+β = (m(1−m) − v)/v`` comes from the across-entity mean
    ``m`` and variance ``v`` of raw rates; each entity reports
    ``shrunk = (x + m·K)/(n + K)``.

    Plan: one entity-keyed count collapse (map-side partial, pinned —
    feeds the moment aggregate AND the output), a 1-row moment
    aggregate broadcast back. Determinism: n/x are exact integers; raw
    rates and their squares quantize to 12dp DECIMAL(28,12) before the
    moment sums (order-independent); m, v, K and the shrunk rate are
    fixed IEEE expressions, 6dp. When the rate spread is degenerate
    (``v = 0`` or ``v ≥ m(1−m)`` — no informative prior) shrinkage is
    undefined and ``shrunk_rate`` falls back to the raw rate with
    ``prior_strength`` null. NULL conversions count as not-converted;
    null keys are excluded. Returns ``(key, n_units, n_converted,
    rate, prior_strength, shrunk_rate)``."""
    per_key = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum(
                F.coalesce(
                    (F.col(converted_col) > 0).cast("bigint"), F.lit(0)
                )
            ).alias("n_converted"),
        )
        .localCheckpoint(eager=False)  # feeds the moments AND the output
    )
    raw = F.col("n_converted").cast("double") / F.col("n_units").cast(
        "double"
    )
    rq = F.round(raw, 12).cast("decimal(28,12)")
    rq2 = F.round(raw * raw, 12).cast("decimal(28,12)")
    mom = per_key.agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum(rq).alias("__sr"),
        F.sum(rq2).alias("__sr2"),
    )
    kd = F.col("__k").cast("double")
    m = F.col("__sr").cast("double") / kd
    v = F.when(
        F.col("__k") > 1,
        (
            F.col("__sr2").cast("double")
            - F.col("__sr").cast("double")
            * F.col("__sr").cast("double")
            / kd
        )
        / (kd - F.lit(1.0)),
    )
    strength = F.when(
        v.isNotNull() & (v > 0) & (m * (F.lit(1.0) - m) > v),
        (m * (F.lit(1.0) - m) - v) / v,
    )
    j = per_key.crossJoin(F.broadcast(mom))
    shrunk = F.when(
        strength.isNotNull(),
        (F.col("n_converted").cast("double") + m * strength)
        / (F.col("n_units").cast("double") + strength),
    ).otherwise(raw)
    return j.select(
        F.col(key_col),
        "n_units",
        "n_converted",
        F.round(raw, 6).alias("rate"),
        F.round(strength, 6).alias("prior_strength"),
        F.round(shrunk, 6).alias("shrunk_rate"),
    )


def msprt_report(
    units: DataFrame,
    variant_col: str,
    converted_col: str,
    treatment: str,
    control: str,
    tau: float = 0.05,
    alpha: float = 0.05,
) -> DataFrame:
    """Always-valid two-proportion readout via the mixture sequential
    probability ratio test (mSPRT) — the missing companion to
    :func:`ab_test_report` for the #1 real-world A/B failure that a
    fixed-horizon z cannot survive: PEEKING. A team that reads the z
    p-value every day and stops at the first p < 0.05 inflates its
    false-positive rate far past 5%; the mSPRT p-value is valid at
    EVERY sample size simultaneously (Robbins' mixture martingale:
    under H₀ the likelihood ratio Λₙ is a nonnegative martingale with
    mean 1, so P(sup Λₙ ≥ 1/α) ≤ α by Ville/Markov), so "significant"
    here may be acted on whenever it first appears.

    Formulation (the normal-approximation mixture with a N(0, τ²)
    prior over the uplift — the standard industrial form): with
    ``θ̂ = p_t − p_c`` and its estimated variance
    ``Vₙ = p_t(1−p_t)/n_t + p_c(1−p_c)/n_c``,

        ``Λₙ = √(Vₙ/(Vₙ+τ²)) · exp(θ̂²·τ²/(2·Vₙ·(Vₙ+τ²)))``

    and ``p = min(1, 1/Λₙ)``. ``tau`` is the prior scale of plausible
    uplifts (absolute rate points — 0.05 spans typical product
    effects; a horizon-matched τ maximizes power at that horizon but
    any fixed τ keeps validity). This single-snapshot readout
    computes the CURRENT Λₙ; the running-minimum-p variant is its
    streaming twin (the p is monotone under repeated evaluation
    because a rejection, once reached, is acted on).

    Plan: ONE variant-keyed count collapse (map-side partial) to the
    same four exact integers as :func:`ab_test_report`, pivoted
    in-row; Λ and p are fixed IEEE expressions over them, 6dp. NULL
    conversions count as not-converted (the ab_test_report contract);
    a missing arm or a degenerate variance (both arms all-0 or all-1)
    yields null lr/p and significant = 0. Returns one row
    ``(n_treatment, n_control, conv_treatment, conv_control,
    rate_treatment, rate_control, uplift, lr, always_valid_p,
    significant)``."""
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    g1 = (F.col(variant_col) == treatment).cast("bigint")
    conv = F.coalesce((F.col(converted_col) > 0).cast("bigint"), F.lit(0))
    m = units.filter(F.col(variant_col).isin(treatment, control)).agg(
        F.coalesce(F.sum(g1), F.lit(0)).alias("__nt"),
        F.coalesce(F.sum(g1 * conv), F.lit(0)).alias("__xt"),
        F.coalesce(F.sum(F.lit(1) - g1), F.lit(0)).alias("__nc"),
        F.coalesce(F.sum((F.lit(1) - g1) * conv), F.lit(0)).alias("__xc"),
    )
    nt = F.col("__nt").cast("double")
    xt = F.col("__xt").cast("double")
    nc = F.col("__nc").cast("double")
    xc = F.col("__xc").cast("double")
    # ANSI-safe: an empty arm must yield null rates, not a
    # divide-by-zero (the agg pivot, unlike a groupBy, CAN see n = 0)
    pt = F.when(F.col("__nt") > 0, xt / nt)
    pc = F.when(F.col("__nc") > 0, xc / nc)
    theta = pt - pc
    v = pt * (F.lit(1.0) - pt) / nt + pc * (F.lit(1.0) - pc) / nc
    t2 = F.lit(float(tau) * float(tau))
    lr = F.when(
        (F.col("__nt") > 0) & (F.col("__nc") > 0) & (v > 0),
        F.sqrt(v / (v + t2))
        * F.exp(theta * theta * t2 / (F.lit(2.0) * v * (v + t2))),
    )
    # least() SKIPS nulls on both engines, so gate explicitly: a null
    # lr (missing arm / degenerate variance) must yield a null p, not
    # least(1.0, null) = 1.0
    p = F.when(lr.isNotNull(), F.least(F.lit(1.0), F.lit(1.0) / lr))
    return m.select(
        F.col("__nt").alias("n_treatment"),
        F.col("__nc").alias("n_control"),
        F.col("__xt").alias("conv_treatment"),
        F.col("__xc").alias("conv_control"),
        F.when(F.col("__nt") > 0, F.round(pt, 6)).alias("rate_treatment"),
        F.when(F.col("__nc") > 0, F.round(pc, 6)).alias("rate_control"),
        F.when(
            (F.col("__nt") > 0) & (F.col("__nc") > 0), F.round(theta, 6)
        ).alias("uplift"),
        F.round(lr, 6).alias("lr"),
        F.round(p, 6).alias("always_valid_p"),
        F.coalesce(
            (F.round(p, 6) <= F.lit(alpha)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def bh_adjust(
    df: DataFrame,
    p_col: str,
    id_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Benjamini-Hochberg FDR adjustment across a frame of p-values —
    the multiple-testing companion the experiment family needs the
    moment it reports more than one metric (20 independent readouts at
    α=0.05 produce a false positive EVERY experiment; BH controls the
    expected false-discovery rate at α across all of them): with
    p₍₁₎ ≤ … ≤ p₍ₙ₎, ``q₍ᵢ₎ = min(1, min_{j≥i} p₍ⱼ₎·n/j)`` and a test
    is rejected iff its q ≤ α — the standard step-up, q monotone in p.

    Scale (the whole point of having it here — BH over millions of
    per-item tests, not a dozen dashboard metrics): ties in p share
    one exact q (within a tie group ``p·n/j`` is decreasing in j, so
    the suffix min is the group-end value for every member — the same
    smoothing the step-up itself performs), which drops the whole
    computation to the DISTINCT-p grain: one p-keyed collapse, the
    max-rank per distinct p from :func:`~.ranks.bucketed_cumsum`, the
    suffix min as a PREFIX min under the reversed order from
    :func:`~.ranks.bucketed_cummin` (tie-free at this grain), and one
    keyed join back to rows. Nothing sorts in one task at any p
    cardinality.

    Determinism: ranks are exact integers; ``p·n/rank`` is two
    correctly-rounded IEEE ops on exact inputs, and min is exact
    selection (no accumulation), so q is bit-identical across engines
    before the 6dp output rounding. Null and non-finite p-values are
    excluded (they carry no evidence and would poison the span);
    ``n_tests`` counts what remained. Returns one row per surviving
    input row: ``(id_col, p, q, rejected, n_tests)``."""
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    from .ranks import bucketed_cummin, bucketed_cumsum

    pd_ = F.col(p_col).cast("double")
    rows = df.filter(
        F.col(p_col).isNotNull()
        & ~F.isnan(pd_)
        & (F.abs(pd_) != F.lit(float("inf")))
    ).select(F.col(id_col), pd_.alias("p"))
    per_p = (
        rows.groupBy("p")
        .agg(F.count(F.lit(1)).alias("__c"))
        # pinned: feeds the n total, the rank cumsum AND the row join
        .localCheckpoint(eager=False)
    )
    n = per_p.agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"))
    ranked = bucketed_cumsum(
        per_p.crossJoin(F.broadcast(n)), ["__c"], val_col="p"
    )
    # max rank of the tie group = inclusive cumulative count; the
    # group-end raw value is the suffix min within the group
    raw = (
        F.col("p") * F.col("__n").cast("double")
        / F.col("__cum___c").cast("double")
    )
    staged = ranked.withColumn("__raw", raw)
    qmin = bucketed_cummin(
        staged, ["__raw"], val_col="p", descending=True
    )
    q = F.least(F.lit(1.0), F.col("__cum___raw"))
    adjusted = qmin.select(
        "p",
        F.col("__n").alias("n_tests"),
        F.round(q, 6).alias("q"),
        (F.round(q, 6) <= F.lit(alpha)).cast("int").alias("rejected"),
    )
    return rows.join(adjusted, "p").select(
        F.col(id_col),
        F.round(F.col("p"), 6).alias("p"),
        "q",
        "rejected",
        "n_tests",
    )


def trimmed_means_report(
    units: DataFrame,
    variant_col: str,
    value_col: str,
    treatment: str,
    control: str,
    trim: float = 0.05,
) -> DataFrame:
    """Trimmed-mean A/B readout — the robust companion to the raw-mean
    comparisons (:func:`cuped_report` etc.) for heavy-tailed value
    metrics: one whale order moves a revenue mean by itself, so the
    standard practice is to compare means after dropping the extreme
    ``trim`` fraction from EACH tail of EACH arm. Reports both raw and
    trimmed means per arm plus the differences.

    Scale: per arm, one value-keyed collapse to the distinct-value
    grain, cumulative counts from :func:`~.ranks.bucketed_cumsum`, and
    the trimmed sum computed PER TIE GROUP — a group spanning
    cumulative positions ``(prev, cum]`` keeps
    ``max(0, min(cum, hi) − max(prev, lo))`` of its rows, and because
    tied rows share one value the trimmed SUM is invariant to which
    tied rows are notionally dropped. No row-grain rank join, no
    single-task sort; two bounded arms → two bucketed passes.

    Determinism: values accumulate as DECIMAL(18,6); each tie group's
    kept mass is an exact DECIMAL(38,6) product (the gini widening
    rule); cut points ``lo = floor(trim·n)``, ``hi = n − lo`` use the
    IEEE double product both engines compute identically. Means are
    final IEEE divisions, 6dp. Null values are excluded; an arm whose
    trimmed window is empty (n too small for the trim) reports a null
    trimmed mean. Returns one row."""
    if not 0.0 <= trim < 0.5:
        raise ValueError(f"trim must be in [0, 0.5), got {trim}")
    from .ranks import bucketed_cumsum

    def arm(label: str, tag: str) -> DataFrame:
        per_v = (
            units.filter(
                (F.col(variant_col) == label) & F.col(value_col).isNotNull()
            )
            .groupBy(F.col(value_col).cast("decimal(18,6)").alias("__v"))
            .agg(F.count(F.lit(1)).alias("__c"))
            # pinned: feeds the totals aggregate AND the cumsum
            .localCheckpoint(eager=False)
        )
        tot = per_v.agg(
            F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"),
            F.sum(
                F.expr("CAST(CAST(__c AS DECIMAL(20,0)) * __v AS DECIMAL(38,6))")
            ).alias("__s"),
        )
        cum = bucketed_cumsum(
            per_v.crossJoin(F.broadcast(tot)), ["__c"], val_col="__v"
        )
        nd = F.col("__n").cast("double")
        lo = F.floor(F.lit(float(trim)) * nd).cast("bigint")
        hi = F.col("__n") - lo
        prev = F.col("__cum___c") - F.col("__c")
        kept = F.greatest(
            F.lit(0),
            F.least(F.col("__cum___c"), hi) - F.greatest(prev, lo),
        )
        kept_sum = F.sum(
            F.expr(
                "CAST(CAST(__kept AS DECIMAL(20,0)) * __v AS DECIMAL(38,6))"
            )
        )
        m = cum.withColumn("__kept", kept).agg(
            kept_sum.alias("__ts"),
            F.coalesce(F.sum("__kept"), F.lit(0)).alias("__tn"),
            F.max("__n").alias("__nn"),
            F.max("__s").alias("__ss"),
        )
        return m.select(
            F.coalesce(F.col("__nn"), F.lit(0)).alias(f"n_{tag}"),
            F.when(
                F.coalesce(F.col("__nn"), F.lit(0)) > 0,
                F.round(
                    F.col("__ss").cast("double")
                    / F.col("__nn").cast("double"),
                    6,
                ),
            ).alias(f"mean_{tag}"),
            F.col("__tn").alias(f"n_kept_{tag}"),
            F.when(
                F.col("__tn") > 0,
                F.round(
                    F.col("__ts").cast("double")
                    / F.col("__tn").cast("double"),
                    6,
                ),
            ).alias(f"trimmed_mean_{tag}"),
        )

    j = arm(treatment, "treatment").crossJoin(
        F.broadcast(arm(control, "control"))
    )
    return j.select(
        "n_treatment",
        "n_control",
        "mean_treatment",
        "mean_control",
        "n_kept_treatment",
        "n_kept_control",
        "trimmed_mean_treatment",
        "trimmed_mean_control",
        F.round(
            F.col("mean_treatment") - F.col("mean_control"), 6
        ).alias("mean_diff"),
        F.round(
            F.col("trimmed_mean_treatment") - F.col("trimmed_mean_control"),
            6,
        ).alias("trimmed_mean_diff"),
    )


def ratio_ab_test(
    units: DataFrame,
    group_col: str,
    num_col: str,
    den_col: str,
    treatment: str,
    control: str,
    z_threshold: float = 1.959964,
) -> DataFrame:
    """Delta-method z-test for a RATIO metric (revenue per session,
    clicks per view) — the readout :func:`ab_test_report` gets wrong
    when the metric is a quotient of two unit-level quantities: the
    naive per-unit-mean variance ignores that numerator and
    denominator covary within a unit (Deng et al., KDD 2018).  With
    ``R = ΣX/ΣY`` per arm, the delta approximation gives
    ``var(R) = (σ²_x − 2Rσ_xy + R²σ²_y) / (n·μ²_y)`` over the
    unit-level sample (co)variances; the z compares the two arms'
    independent ratios.

    Scale: ONE global aggregation with per-arm conditional 6dp-decimal
    moments (map-side partial, 1-row output) — no second pass, no
    broadcast.  Determinism: all six moments per arm are exact
    decimals; the statistic is one fixed IEEE expression.  Returns one
    row ``(n_treat, n_control, ratio_treat, ratio_control, diff, z,
    significant)``; z null when either arm has n < 2, a zero
    denominator total, or degenerate variance. Null or NON-FINITE
    numerators/denominators are excluded (a NaN would be counted by n
    yet vanish from the decimal sums — the count/sum mismatch that
    silently biases moments)."""
    xdr = F.col(num_col).cast("double")
    ydr = F.col(den_col).cast("double")
    xq = F.round(xdr, 6).cast("decimal(18,6)")
    yq = F.round(ydr, 6).cast("decimal(18,6)")
    d12 = "decimal(38,12)"

    def arm(tag: str, label: str) -> list:
        c = F.col(group_col) == label
        return [
            F.sum(F.when(c, 1).otherwise(0)).alias(f"__n{tag}"),
            F.sum(F.when(c, xq)).alias(f"__sx{tag}"),
            F.sum(F.when(c, yq)).alias(f"__sy{tag}"),
            F.sum(F.when(c, (xq.cast("decimal(19,6)") * xq).cast(d12))).alias(
                f"__sxx{tag}"
            ),
            F.sum(F.when(c, (yq.cast("decimal(19,6)") * yq).cast(d12))).alias(
                f"__syy{tag}"
            ),
            F.sum(F.when(c, (xq.cast("decimal(19,6)") * yq).cast(d12))).alias(
                f"__sxy{tag}"
            ),
        ]

    base = units.filter(
        F.col(group_col).isin(treatment, control)
        & F.col(num_col).isNotNull()
        & F.col(den_col).isNotNull()
        & ~F.isnan(xdr)
        & ~F.isnan(ydr)
        & (F.abs(xdr) != F.lit(float("inf")))
        & (F.abs(ydr) != F.lit(float("inf")))
    )
    m = base.agg(*(arm("t", treatment) + arm("c", control)))

    def ratio_var(tag: str):
        n = F.col(f"__n{tag}").cast("double")
        sx = F.col(f"__sx{tag}").cast("double")
        sy = F.col(f"__sy{tag}").cast("double")
        sxx = F.col(f"__sxx{tag}").cast("double")
        syy = F.col(f"__syy{tag}").cast("double")
        sxy = F.col(f"__sxy{tag}").cast("double")
        r = F.when(sy != 0, sx / sy)
        vx = (sxx - sx * sx / n) / (n - F.lit(1.0))
        vy = (syy - sy * sy / n) / (n - F.lit(1.0))
        vxy = (sxy - sx * sy / n) / (n - F.lit(1.0))
        muy = sy / n
        var = F.when(
            (F.col(f"__n{tag}") >= 2) & (sy != 0),
            (vx - F.lit(2.0) * r * vxy + r * r * vy)
            / (n * muy * muy),
        )
        return r, var

    rt, vt = ratio_var("t")
    rc, vc = ratio_var("c")
    z = F.when(
        vt.isNotNull() & vc.isNotNull() & (vt + vc > 0),
        (rt - rc) / F.sqrt(vt + vc),
    )
    z6 = F.round(z, 6)
    return m.select(
        F.col("__nt").cast("bigint").alias("n_treat"),
        F.col("__nc").cast("bigint").alias("n_control"),
        F.round(rt, 6).alias("ratio_treat"),
        F.round(rc, 6).alias("ratio_control"),
        F.round(rt - rc, 6).alias("diff"),
        z6.alias("z"),
        F.coalesce(
            (F.abs(z6) >= F.lit(z_threshold)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def jackknife_ratio_ci(
    units: DataFrame,
    num_col: str,
    den_col: str,
    unit_col: str,
    n_buckets: int = 50,
    salt: str = "",
    z: float = 1.959964,
) -> DataFrame:
    """Delete-one-bucket jackknife CI for a ratio metric — the
    assumption-free companion to :func:`ratio_ab_test`'s delta method
    (and the standard cross-check when the delta's unit-level
    normality is in doubt): units hash into ``n_buckets`` deterministic
    buckets (the md5-60 construction every sampler here uses, so the
    split is partition-independent and engine-replayable), each
    leave-one-bucket-out ratio ``θ_(b) = (S−s_b)/(T−t_b)`` is computed
    from the bucket sums alone, and ``var = (B−1)/B · Σ(θ_(b) − θ̄)²``.

    Scale: ONE bucket-grain exchange (≤ n_buckets rows, map-side
    partial), then two passes over the bounded bucket frame (the mean
    must exist before the spread — the Welch shape, 1-row broadcast).
    Determinism: bucket sums are exact 6dp decimals; each θ_(b) and
    its squared deviation quantize to 12dp decimal before the
    cross-bucket sums.  Returns one row ``(n_units, n_buckets_used,
    ratio, se, ci_lo, ci_hi)``; se/CI null when any leave-one-out
    denominator is 0 or fewer than 2 buckets are populated."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from .sampling import hash_bucket

    xdr = F.col(num_col).cast("double")
    ydr = F.col(den_col).cast("double")
    xq = F.round(xdr, 6).cast("decimal(18,6)")
    yq = F.round(ydr, 6).cast("decimal(18,6)")
    per_b = (
        units.filter(
            F.col(num_col).isNotNull()
            & F.col(den_col).isNotNull()
            & F.col(unit_col).isNotNull()
            # finite only — the ratio_ab_test count/sum-mismatch rule
            & ~F.isnan(xdr)
            & ~F.isnan(ydr)
            & (F.abs(xdr) != F.lit(float("inf")))
            & (F.abs(ydr) != F.lit(float("inf")))
        )
        .groupBy(
            (hash_bucket(F.col(unit_col), salt) % n_buckets).alias("__b")
        )
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(xq).alias("__sx"),
            F.sum(yq).alias("__sy"),
        )
        # pinned: feeds the totals AND both jackknife passes
        .localCheckpoint(eager=False)
    )
    tot = per_b.agg(
        F.sum("__n").alias("__tn"),
        F.sum("__sx").alias("__ts"),
        F.sum("__sy").alias("__tt"),
        F.count(F.lit(1)).alias("__bu"),
    )
    wtot = per_b.crossJoin(F.broadcast(tot))
    d12 = "decimal(38,12)"
    th_b = F.when(
        (F.col("__tt") - F.col("__sy")).cast("double") != 0,
        (F.col("__ts") - F.col("__sx")).cast("double")
        / (F.col("__tt") - F.col("__sy")).cast("double"),
    )
    s1 = wtot.agg(
        F.sum(F.round(th_b, 12).cast(d12)).alias("__sth"),
        F.count(F.lit(1)).alias("__b2"),
        # SQL sum SKIPS a null θ_(b) instead of propagating it — count
        # the valid ones so a zero leave-one-out denominator nulls the
        # whole CI (the documented contract), not just its own term
        F.count(th_b).alias("__bv"),
    )
    # second pass: squared deviations about the jackknife mean
    wm = wtot.crossJoin(F.broadcast(s1))
    thbar = F.col("__sth").cast("double") / F.col("__b2").cast("double")
    dev = F.round((th_b - thbar) * (th_b - thbar), 12).cast(d12)
    s2 = wm.agg(F.sum(dev).alias("__sdev"))
    m = tot.crossJoin(F.broadcast(s1)).crossJoin(F.broadcast(s2))
    bu = F.col("__bu").cast("double")
    ratio = F.when(
        F.col("__tt").cast("double") != 0,
        F.col("__ts").cast("double") / F.col("__tt").cast("double"),
    )
    var = F.when(
        (F.col("__bu") >= 2) & (F.col("__bv") == F.col("__bu")),
        (bu - F.lit(1.0)) / bu * F.col("__sdev").cast("double"),
    )
    se = F.when(var >= 0, F.sqrt(var))
    return m.select(
        F.col("__tn").alias("n_units"),
        F.col("__bu").alias("n_buckets_used"),
        F.round(ratio, 6).alias("ratio"),
        F.round(se, 6).alias("se"),
        F.round(ratio - F.lit(z) * se, 6).alias("ci_lo"),
        F.round(ratio + F.lit(z) * se, 6).alias("ci_hi"),
    )


def stratified_ate(
    units: DataFrame,
    treatment_col: str,
    outcome_col: str,
    score_col: str,
    id_col: str,
    n_strata: int = 5,
    z_threshold: float = 1.959964,
) -> DataFrame:
    """Propensity-stratified average treatment effect — the
    observational-causal workhorse (Rosenbaum-Rubin subclassification):
    rank units by a propensity/activity score into ``n_strata``
    quantile strata, difference the arm means WITHIN each stratum
    (where units are comparable), and average the per-stratum effects
    weighted by stratum size.  Closes the causal family's gap between
    :func:`ips_value` (needs logged probabilities) and
    :func:`did_report` (needs a time axis): this one needs only a
    score.  Strata missing either arm have no within-stratum contrast
    (no common support) — they are EXCLUDED and counted, not silently
    imputed.

    Scale shape: stratum ids come from the exact bucketed global rank
    (:func:`~.ranks.global_rank` with ``tie_fanout`` + the SQL
    ``ntile`` remainder rule via :func:`~.ranks.ntile_from_rank`) — a
    clamped score massed at 0/1 cannot collapse the rank pass into one
    task, and no unpartitioned row-frame window exists anywhere; the
    per-stratum moments are one grouped aggregation (≤ n_strata rows).

    Determinism: outcomes quantize to 6dp decimals; per-stratum
    contributions quantize to 12dp decimal before the cross-stratum
    sums.  ``SE² = Σ w_s²·(var_t/n_t + var_c/n_c)`` (large-sample,
    within-stratum independence).  Returns one row ``(n_units,
    n_strata_used, n_strata_dropped, ate, se, z, significant)``; null
    ate when no stratum has both arms, null se/z when any used stratum
    has an arm with n < 2 or the variance degenerates."""
    if n_strata < 2:
        raise ValueError(f"n_strata must be >= 2, got {n_strata}")
    from .ranks import global_rank, ntile_from_rank

    sd = F.col(score_col).cast("double")
    yd0 = F.col(outcome_col).cast("double")
    base = units.filter(
        F.col(treatment_col).isNotNull()
        & F.col(outcome_col).isNotNull()
        & F.col(score_col).isNotNull()
        & F.col(id_col).isNotNull()
        & ~F.isnan(sd)
        & (F.abs(sd) != F.lit(float("inf")))
        # outcome too — the count/sum mismatch rule
        & ~F.isnan(yd0)
        & (F.abs(yd0) != F.lit(float("inf")))
    ).select(
        F.col(id_col).alias("__id"),
        (F.col(treatment_col) > 0).cast("int").alias("__t"),
        F.round(F.col(outcome_col).cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("__y"),
        F.col(score_col).alias("__sc"),
    ).localCheckpoint(eager=False)  # feeds the count AND the rank pass
    nn = base.agg(F.count(F.lit(1)).alias("__nn"))
    ranked = global_rank(
        base, "__sc", ["__id"], out_col="__rk", tie_fanout=True
    ).crossJoin(F.broadcast(nn))
    strat = ranked.select(
        "__t",
        "__y",
        ntile_from_rank(
            F.col("__rk"), F.col("__nn").cast("bigint"), n_strata
        ).alias("__s"),
    )
    d12 = "decimal(38,12)"
    per_s = strat.groupBy("__s").agg(
        F.sum(F.when(F.col("__t") == 1, 1).otherwise(0)).alias("__nt"),
        F.sum(F.when(F.col("__t") == 0, 1).otherwise(0)).alias("__ncn"),
        F.sum(F.when(F.col("__t") == 1, F.col("__y"))).alias("__st"),
        F.sum(F.when(F.col("__t") == 0, F.col("__y"))).alias("__sc0"),
        F.sum(
            F.when(
                F.col("__t") == 1,
                (F.col("__y").cast("decimal(19,6)") * F.col("__y")).cast(
                    d12
                ),
            )
        ).alias("__stt"),
        F.sum(
            F.when(
                F.col("__t") == 0,
                (F.col("__y").cast("decimal(19,6)") * F.col("__y")).cast(
                    d12
                ),
            )
        ).alias("__scc"),
    )
    used = (F.col("__nt") > 0) & (F.col("__ncn") > 0)
    ntd = F.col("__nt").cast("double")
    ncd = F.col("__ncn").cast("double")
    ns = ntd + ncd
    mt = F.col("__st").cast("double") / ntd
    mc = F.col("__sc0").cast("double") / ncd
    vt = F.when(
        F.col("__nt") >= 2,
        (F.col("__stt").cast("double") - F.col("__st").cast("double") * mt)
        / (ntd - F.lit(1.0)),
    )
    vc = F.when(
        F.col("__ncn") >= 2,
        (F.col("__scc").cast("double") - F.col("__sc0").cast("double") * mc)
        / (ncd - F.lit(1.0)),
    )
    m = per_s.crossJoin(F.broadcast(nn)).agg(
        F.max("__nn").alias("__n"),
        F.sum(F.when(used, 1).otherwise(0)).alias("__used"),
        F.sum(F.when(~used, 1).otherwise(0)).alias("__dropped"),
        # effects weighted by FULL stratum size over the USED total —
        # each term quantized before the cross-stratum sum
        F.sum(F.when(used, ns.cast("decimal(28,6)"))).alias("__wtot"),
        F.sum(
            F.when(used, F.round(ns * (mt - mc), 12).cast(d12))
        ).alias("__eff"),
        F.sum(
            F.when(
                used,
                F.round(ns * ns * (vt / ntd + vc / ncd), 12).cast(d12),
            )
        ).alias("__var"),
        # null-propagation probe: a used stratum with a degenerate arm
        # must null the SE (sum skips nulls — the jackknife lesson)
        F.sum(F.when(used & vt.isNotNull() & vc.isNotNull(), 1)).alias(
            "__vok"
        ),
    )
    wt = F.col("__wtot").cast("double")
    ate = F.when(
        F.col("__used") >= 1, F.col("__eff").cast("double") / wt
    )
    se = F.when(
        (F.col("__used") >= 1)
        & (F.col("__vok") == F.col("__used"))
        & (F.col("__var").cast("double") >= 0),
        F.sqrt(F.col("__var").cast("double")) / wt,
    )
    z = F.when(se > 0, ate / se)
    z6 = F.round(z, 6)
    return m.select(
        F.col("__n").alias("n_units"),
        F.col("__used").alias("n_strata_used"),
        F.col("__dropped").alias("n_strata_dropped"),
        F.round(ate, 6).alias("ate"),
        F.round(se, 6).alias("se"),
        z6.alias("z"),
        F.coalesce(
            (F.abs(z6) >= F.lit(z_threshold)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def wilcoxon_signed_rank(
    units: DataFrame,
    pre_col: str,
    post_col: str,
    z_threshold: float = 1.959964,
) -> DataFrame:
    """Wilcoxon signed-rank test — the PAIRED nonparametric companion:
    :func:`mannwhitney_report` compares two independent samples, this
    compares each unit WITH ITSELF (pre/post, A-vs-B on the same user),
    which removes between-unit variance the way :func:`cuped_report`
    does parametrically but without assuming normality of the
    differences. Zero differences are discarded (the standard Wilcoxon
    convention), |d| midranks carry ties, and the normal approximation
    uses the tie-corrected variance
    ``n(n+1)(2n+1)/24 − Σ(t³−t)/48``.

    Scale shape (the Mann-Whitney discipline): one |d|-keyed exchange
    collapses the pairs to the distinct-|difference| grain; cumulative
    counts come from the bucketed prefix sum, so no single task ever
    sorts the frame even when differences are continuous.

    Determinism: differences quantize to 6dp decimals (so d = 0 is
    exact, not an IEEE accident); ``2·midrank = 2·cum − c + 1`` is an
    integer, and ``2·W⁺ = Σ₊ c₊·(2·cum − c + 1)`` accumulates as exact
    DECIMAL(38,0); the z is one fixed IEEE expression. Null or
    non-finite pre/post values are excluded (the count/sum-mismatch
    rule). Returns one row ``(n_pairs, n_nonzero, w_plus, z,
    significant)``; z null when no nonzero pairs remain or the
    variance degenerates (all |d| tied at one value still leaves a
    valid variance unless n_nonzero = 0)."""
    pre = F.col(pre_col).cast("double")
    post = F.col(post_col).cast("double")
    d = (
        F.round(post, 6).cast("decimal(18,6)")
        - F.round(pre, 6).cast("decimal(18,6)")
    )
    base = units.filter(
        F.col(pre_col).isNotNull()
        & F.col(post_col).isNotNull()
        & ~F.isnan(pre)
        & ~F.isnan(post)
        & (F.abs(pre) != F.lit(float("inf")))
        & (F.abs(post) != F.lit(float("inf")))
    ).select(d.alias("__d"))
    n_all = base.agg(F.count(F.lit(1)).alias("__np"))
    nz = base.filter(F.col("__d") != 0)
    per_v = nz.groupBy(F.abs(F.col("__d")).alias("__val")).agg(
        F.sum((F.col("__d") > 0).cast("bigint")).alias("__cp"),
        F.count(F.lit(1)).alias("__c"),
    )
    from .ranks import bucketed_cumsum

    ranked = bucketed_cumsum(per_v, ["__c"], val_col="__val")
    two_wp = F.sum(
        F.expr("CAST(__cp AS DECIMAL(38,0)) * (2 * __cum___c - __c + 1)")
    )
    ties = F.sum(F.expr("CAST(__c AS DECIMAL(38,0)) * __c * __c - __c"))
    m = (
        ranked.agg(
            F.sum("__c").alias("__nn"),
            two_wp.cast("double").alias("__2wp"),
            ties.cast("double").alias("__tt"),
        )
        .crossJoin(F.broadcast(n_all))
    )
    nn = F.coalesce(F.col("__nn"), F.lit(0))
    nd = nn.cast("double")
    wp = F.col("__2wp") / F.lit(2.0)
    mean = nd * (nd + F.lit(1.0)) / F.lit(4.0)
    var = nd * (nd + F.lit(1.0)) * (
        F.lit(2.0) * nd + F.lit(1.0)
    ) / F.lit(24.0) - F.col("__tt") / F.lit(48.0)
    z = F.when((nn > 0) & (var > 0), (wp - mean) / F.sqrt(var))
    z6 = F.round(z, 6)
    return m.select(
        F.col("__np").alias("n_pairs"),
        nn.alias("n_nonzero"),
        F.when(nn > 0, F.round(wp, 6)).alias("w_plus"),
        z6.alias("z"),
        F.coalesce(
            (F.abs(z6) >= F.lit(z_threshold)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def mcnemar_report(
    df: DataFrame,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes — "did the flag flip
    between condition A and condition B for the same units" (model-A
    vs model-B on the same eval set, before/after on the same users).
    Only the discordant cells carry information: ``chi2 = (n01 −
    n10)² / (n01 + n10)`` (uncorrected — the large-sample form;
    statsmodels ``mcnemar(exact=False, correction=False)``).  Compare
    against chi²(1) criticals client-side (the
    :func:`chi_square_report` convention).

    Scale: ONE 2×2 cell collapse with map-side partials — the corpus
    crosses the wire as at most four counts per partition.
    Determinism: exact integer cells; the statistic is one fixed IEEE
    expression, 6dp.  Rows with a null on either side are excluded.
    Returns one row ``(n_pairs, n01, n10, chi2)``; chi2 null when no
    discordant pairs exist (the test is undefined, not zero)."""
    a = (F.col(a_col).cast("int") > 0).cast("int")
    b = (F.col(b_col).cast("int") > 0).cast("int")
    m = df.filter(
        F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
    ).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            ((a == 0) & (b == 1)).cast("bigint")
        ).alias("n01"),
        F.sum(
            ((a == 1) & (b == 0)).cast("bigint")
        ).alias("n10"),
    )
    d = (F.col("n01") - F.col("n10")).cast("double")
    tot = (F.col("n01") + F.col("n10")).cast("double")
    chi2 = F.when(tot > 0, d * d / tot)
    return m.select(
        "n_pairs", "n01", "n10", F.round(chi2, 6).alias("chi2")
    )


def permutation_test_report(
    units: DataFrame,
    id_col: str,
    group_col: str,
    value_col: str,
    n_perm: int = 64,
    salt: str = "perm",
) -> DataFrame:
    """Deterministic randomization test for a difference in means —
    the distribution-free significance readout when the t-test's
    assumptions are in doubt: relabel every unit ``n_perm`` times by
    a salted hash, recompute the mean difference under each
    relabeling, and report ``p = (1 + #{|Δ_perm| ≥ |Δ_obs|}) /
    (n_perm + 1)`` (the add-one permutation p-value; hash relabeling
    is the standard approximate-randomization variant — group sizes
    float binomially around the observed split).

    Scale: the fan-out is an in-row ``explode(sequence(0, B−1))`` —
    B rows per unit, partial-aggregated down to the 2B-cell grid
    before the one exchange; the observed split reuses the same
    collapse at a literal permutation id.  Determinism: the relabel
    is the engine-portable salted md5-60 parity; value sums are 6dp
    DECIMAL(38,6); each Δ is one fixed IEEE expression over exact
    decimals, so the ≥ comparison is engine-identical without any
    tolerance.  Exactly TWO observed groups are required (the
    :func:`~.regression.chow_test_report` contract).  Returns one row
    ``(n_units, n_perm, obs_diff, n_extreme, p_value)`` — obs_diff =
    mean(later group) − mean(earlier group) by name order, 6dp."""
    from intake_esm_spark.functions.text import salted_hash60

    if n_perm < 1:
        raise ValueError(f"n_perm must be >= 1, got {n_perm}")
    from intake_esm_spark.operators._util import _spread

    # r14: the permuted pass inflates every unit B-fold and runs one
    # md5 per (unit, permutation) — on a single-file source that whole
    # B·n hash grid ran in ONE task. A narrow (id, g, v) round-robin
    # spread before the pin buys full-core parallelism; the relabel
    # hash is per-row-deterministic and the cell sums are decimal, so
    # every cell and the p-value are byte-identical (guide §2.5).
    base = _spread(
        units.filter(
            F.col(group_col).isNotNull()
            & F.col(value_col).isNotNull()
            & F.col(id_col).isNotNull()
        ).select(
            F.col(id_col).cast("string").alias("__id"),
            F.col(group_col).cast("string").alias("__g"),
            F.round(F.col(value_col).cast("double"), 6)
            .cast("decimal(18,6)")
            .alias("__v"),
        )
    ).localCheckpoint(eager=False)  # pinned: observed + permuted passes
    groups = sorted(
        r["__g"]
        for r in base.select("__g").distinct().limit(3).collect()
    )
    if len(groups) != 2:
        raise ValueError(
            "permutation test: need exactly TWO groups, got "
            f"{len(groups)} ({groups[:3]})"
        )
    ga, gb = groups
    obs = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__v").alias("s")
    ).collect()
    om = {r["__g"]: (int(r["n"]), r["s"]) for r in obs}
    n_units = om[ga][0] + om[gb][0]
    obs_diff = float(om[gb][1]) / om[gb][0] - float(om[ga][1]) / om[ga][0]
    perm = base.select(
        "__v",
        F.explode(F.expr(f"sequence(0, {int(n_perm) - 1})")).alias(
            "__p"
        ),
        "__id",
    ).select(
        "__p",
        "__v",
        F.pmod(
            salted_hash60(
                F.concat_ws("|", F.col("__p").cast("string"),
                            F.col("__id")),
                salt,
            ),
            F.lit(2),
        ).alias("__l"),
    )
    cells = perm.groupBy("__p", "__l").agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__v").alias("__s")
    )
    wide = cells.groupBy("__p").agg(
        F.sum(F.when(F.col("__l") == 1, F.col("__n"))).alias("n1"),
        F.sum(F.when(F.col("__l") == 1, F.col("__s"))).alias("s1"),
        F.sum(F.when(F.col("__l") == 0, F.col("__n"))).alias("n0"),
        F.sum(F.when(F.col("__l") == 0, F.col("__s"))).alias("s0"),
    )
    diff = (
        F.col("s1").cast("double") / F.col("n1").cast("double")
        - F.col("s0").cast("double") / F.col("n0").cast("double")
    )
    # a degenerate relabeling (all units one side) yields a null diff
    # and counts as NOT extreme (documented: it carries no evidence)
    extreme = wide.agg(
        F.sum(
            F.when(
                F.abs(diff) >= F.lit(abs(obs_diff)), 1
            ).otherwise(0)
        ).alias("__e")
    ).collect()[0]["__e"]
    n_extreme = int(extreme or 0)
    return units.sparkSession.createDataFrame(
        [
            (
                n_units,
                int(n_perm),
                round(obs_diff, 6),
                n_extreme,
                round((1 + n_extreme) / (n_perm + 1), 6),
            )
        ],
        "n_units bigint, n_perm int, obs_diff double,"
        " n_extreme bigint, p_value double",
    )


def mantel_haenszel_report(
    df: DataFrame,
    stratum_col: str,
    exposed_col: str,
    outcome_col: str,
) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio across 2×2 strata — the
    classic confounder-adjusted association readout (does exposure
    move the outcome AFTER holding the stratifier fixed?), the
    categorical sibling of :func:`stratified_ate`.  ``OR_MH =
    Σ(a·d/n) / Σ(b·c/n)`` with the Robins-Breslow-Greenland variance
    of ``ln OR`` for the CI (statsmodels ``StratifiedTable.oddsratio_
    pooled`` / ``logodds_pooled_se``).

    Scale: ONE (stratum, exposed, outcome)-keyed partial-aggregated
    collapse; everything after runs on the ≤ 4·|strata| cell frame
    (metadata scale).  Determinism: cells are exact integers; the
    per-stratum ratio terms quantize to 12dp DECIMAL(38,12) before
    the cross-strata sums (a double sum over strata is
    partition-order-dependent); OR/SE/CI are fixed IEEE expressions,
    6dp.  Strata with a zero margin contribute what their non-zero
    terms allow (the MH estimator's built-in continuity — no ad-hoc
    0.5 corrections).  Returns one row ``(n_units, n_strata, or_mh,
    log_or_se, ci_lo, ci_hi)``; null OR when either ratio sum
    degenerates to 0."""
    base = df.filter(
        F.col(stratum_col).isNotNull()
        & F.col(exposed_col).isNotNull()
        & F.col(outcome_col).isNotNull()
    ).select(
        F.col(stratum_col).alias("__s"),
        (F.col(exposed_col).cast("int") > 0).cast("int").alias("__e"),
        (F.col(outcome_col).cast("int") > 0).cast("int").alias("__y"),
    )
    cells = base.groupBy("__s", "__e", "__y").agg(
        F.count(F.lit(1)).alias("__c")
    )
    wide = cells.groupBy("__s").agg(
        F.sum(F.when((F.col("__e") == 1) & (F.col("__y") == 1),
                     F.col("__c"))).alias("a"),
        F.sum(F.when((F.col("__e") == 1) & (F.col("__y") == 0),
                     F.col("__c"))).alias("b"),
        F.sum(F.when((F.col("__e") == 0) & (F.col("__y") == 1),
                     F.col("__c"))).alias("c"),
        F.sum(F.when((F.col("__e") == 0) & (F.col("__y") == 0),
                     F.col("__c"))).alias("d"),
    ).select(
        *[F.coalesce(F.col(x), F.lit(0)).alias(x)
          for x in ("a", "b", "c", "d")]
    )
    n = (
        F.col("a") + F.col("b") + F.col("c") + F.col("d")
    ).cast("double")
    a, b, c, d = [F.col(x).cast("double") for x in ("a", "b", "c", "d")]
    d38 = "decimal(38,12)"
    # RBG variance building blocks (Robins et al. 1986): with
    # P=(a+d)/n, Q=(b+c)/n, R=ad/n, S=bc/n:
    # var(lnOR) = ΣPR/(2(ΣR)²) + Σ(PS+QR)/(2ΣRΣS) + ΣQS/(2(ΣS)²)
    p = (a + d) / n
    q = (b + c) / n
    r = a * d / n
    s = b * c / n
    terms = wide.filter(n > 0).agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum(n.cast("decimal(28,6)")).alias("__n"),
        F.sum(F.round(r, 12).cast(d38)).alias("__sr"),
        F.sum(F.round(s, 12).cast(d38)).alias("__ss"),
        F.sum(F.round(p * r, 12).cast(d38)).alias("__spr"),
        F.sum(F.round(p * s + q * r, 12).cast(d38)).alias("__smix"),
        F.sum(F.round(q * s, 12).cast(d38)).alias("__sqs"),
    )
    sr = F.col("__sr").cast("double")
    ss = F.col("__ss").cast("double")
    orr = F.when((sr > 0) & (ss > 0), sr / ss)
    var = F.when(
        (sr > 0) & (ss > 0),
        F.col("__spr").cast("double") / (2.0 * sr * sr)
        + F.col("__smix").cast("double") / (2.0 * sr * ss)
        + F.col("__sqs").cast("double") / (2.0 * ss * ss),
    )
    se = F.when(var >= 0, F.sqrt(var))
    z = F.lit(1.959964)
    lo = F.when(se.isNotNull(), orr * F.exp(-z * se))
    hi = F.when(se.isNotNull(), orr * F.exp(z * se))
    return terms.select(
        F.col("__n").cast("bigint").alias("n_units"),
        "n_strata",
        F.round(orr, 6).alias("or_mh"),
        F.round(se, 6).alias("log_or_se"),
        F.round(lo, 6).alias("ci_lo"),
        F.round(hi, 6).alias("ci_hi"),
    )


def smd_balance_report(
    df: DataFrame,
    treat_col: str,
    covariate_cols: list[str],
    threshold: float = 0.1,
) -> DataFrame:
    """Standardized-mean-difference covariate balance table — the
    first table of every observational study (Austin 2009): per
    covariate, ``SMD = (x̄_t − x̄_c) / √((s²_t + s²_c)/2)``; |SMD| ≤
    0.1 is the conventional "balanced" bar.  The diagnostic that
    tells you whether :func:`stratified_ate` / :func:`ips_value`
    adjustment is even needed, and (re-run on the weighted frame)
    whether it worked.

    Scale: ONE 1-row partial-aggregated pass carrying both arms'
    exact-decimal moments for EVERY covariate (6dp-quantized values,
    12dp decimal squares — the :func:`~.regression.ols_moments`
    discipline).  Determinism: fixed IEEE readouts over exact
    decimals, 6dp.  Complete-case per covariate (a null in x drops
    the row from THAT covariate's moments only).  Returns one row per
    covariate ``(covariate, n_treat, n_control, mean_treat,
    mean_control, smd, balanced)``; smd null when the pooled variance
    degenerates to 0."""
    if not covariate_cols:
        raise ValueError("smd: need at least one covariate")
    t = (F.col(treat_col).cast("int") > 0).cast("int")
    base = df.filter(F.col(treat_col).isNotNull()).select(
        t.alias("__t"), *covariate_cols
    )
    d38 = "decimal(38,12)"
    aggs = []
    for i, cc in enumerate(covariate_cols):
        xq = F.round(F.col(cc).cast("double"), 6)
        ok = F.col(cc).isNotNull() & ~F.isnan(xq) & (
            F.abs(xq) != F.lit(float("inf"))
        )
        for arm, flag in (("t", 1), ("c", 0)):
            sel = ok & (F.col("__t") == flag)
            aggs.append(
                F.sum(F.when(sel, 1).otherwise(0)).alias(f"n{arm}_{i}")
            )
            aggs.append(
                F.sum(
                    F.when(sel, xq.cast("decimal(18,6)"))
                ).alias(f"s{arm}_{i}")
            )
            aggs.append(
                F.sum(
                    F.when(sel, F.round(xq * xq, 12).cast(d38))
                ).alias(f"q{arm}_{i}")
            )
    row = base.agg(*aggs).collect()[0]
    out = smd_rows_from_moments(
        {k: row[k] for k in row.asDict()}, covariate_cols, threshold
    )
    return df.sparkSession.createDataFrame(
        out,
        "covariate string, n_treat bigint, n_control bigint,"
        " mean_treat double, mean_control double, smd double,"
        " balanced int",
    )


def smd_rows_from_moments(
    mom: dict, covariate_cols: list[str], threshold: float
) -> list[tuple]:
    """Driver-side SMD readout over the per-arm exact-decimal moment
    dict (keys ``n{t|c}_{i}``, ``s{t|c}_{i}``, ``q{t|c}_{i}``) — ONE
    shared implementation for the Spark operator and the DuckDB
    oracle builder."""
    out = []
    for i, cc in enumerate(covariate_cols):
        nt, nc = int(mom[f"nt_{i}"]), int(mom[f"nc_{i}"])
        if nt < 2 or nc < 2:
            out.append((cc, nt, nc, None, None, None, None))
            continue
        mt = float(mom[f"st_{i}"]) / nt
        mc = float(mom[f"sc_{i}"]) / nc
        vt = (float(mom[f"qt_{i}"]) - nt * mt * mt) / (nt - 1)
        vc = (float(mom[f"qc_{i}"]) - nc * mc * mc) / (nc - 1)
        pooled = (max(vt, 0.0) + max(vc, 0.0)) / 2.0
        smd = (mt - mc) / pooled**0.5 if pooled > 0 else None
        out.append(
            (
                cc,
                nt,
                nc,
                round(mt, 6),
                round(mc, 6),
                round(smd, 6) if smd is not None else None,
                (1 if abs(smd) <= threshold else 0)
                if smd is not None
                else None,
            )
        )
    return out


def cochran_q_report(
    df: DataFrame,
    unit_col: str,
    flag_cols: list[str],
) -> DataFrame:
    """Cochran's Q — the k-treatment generalization of
    :func:`mcnemar_report` for PAIRED binary outcomes (did the same
    units succeed under treatments 1..k at the same rate?):
    ``Q = (k−1)·(k·ΣG_j² − (ΣG_j)²) / (k·ΣL_i − ΣL_i²)`` with
    ``G_j`` the per-treatment success totals and ``L_i`` each unit's
    success count (statsmodels ``cochrans_q``).  Compare against
    chi²(k−1) criticals client-side.

    ``df`` must be ONE ROW PER UNIT with k 0/1 flag columns
    (pre-pivot upstream); nulls read as 0 (a missing measurement is
    a non-success — documented).  Scale: ONE 1-row partial-aggregated
    pass carrying 2k+3 exact integer sums.  Returns one row
    ``(n_units, k, q_stat, dof)``; Q null when the denominator is 0
    (every unit all-success or all-failure — no discordance to
    test)."""
    k = len(flag_cols)
    if k < 2:
        raise ValueError(f"cochran q: need >= 2 flag columns, got {k}")
    flags = [
        F.coalesce(
            (F.col(c).cast("int") > 0).cast("int"), F.lit(0)
        )
        for c in flag_cols
    ]
    ell = flags[0]
    for f2 in flags[1:]:
        ell = ell + f2
    base = df.filter(F.col(unit_col).isNotNull())
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, f2 in enumerate(flags):
        aggs.append(F.sum(f2.cast("bigint")).alias(f"g_{i}"))
    aggs.append(F.sum(ell.cast("bigint")).alias("sl"))
    aggs.append(F.sum((ell * ell).cast("bigint")).alias("sl2"))
    m = base.agg(*aggs)
    sg = F.col("g_0").cast("double")
    sg2 = F.col("g_0").cast("double") * F.col("g_0").cast("double")
    for i in range(1, k):
        gi = F.col(f"g_{i}").cast("double")
        sg = sg + gi
        sg2 = sg2 + gi * gi
    den = (
        F.lit(float(k)) * F.col("sl").cast("double")
        - F.col("sl2").cast("double")
    )
    q = F.when(
        den > 0,
        F.lit(float(k - 1))
        * (F.lit(float(k)) * sg2 - sg * sg)
        / den,
    )
    return m.select(
        F.col("n").alias("n_units"),
        F.lit(k).alias("k"),
        F.round(q, 6).alias("q_stat"),
        F.lit(k - 1).alias("dof"),
    )


def friedman_report(
    df: DataFrame,
    unit_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Friedman rank test — the repeated-measures nonparametric ANOVA
    (do k paired measurements per unit share a location, judged by
    WITHIN-unit ranks?): per unit the k values rank in-row (average
    ranks on ties — exact, via pairwise comparisons doubled into
    integers), then ``χ²_F = 12/(n·k·(k+1)) · ΣR_j² − 3·n·(k+1)``
    over the per-treatment rank sums (scipy ``friedmanchisquare``
    without the tie-correction denominator — exact on continuous
    data, documented).  Compare against chi²(k−1) client-side.

    Complete-case: a unit missing ANY of the k values drops (ranks
    are undefined on partial rows).  Scale: the ranking is IN-ROW
    codegen (k² pairwise comparisons — k is small by construction);
    ONE 1-row pass sums the DOUBLED ranks as exact integers.
    Returns one row ``(n_units, k, chi2_f, dof)``; null χ² when
    n = 0."""
    k = len(value_cols)
    if k < 2:
        raise ValueError(f"friedman: need >= 2 value columns, got {k}")
    cond = F.lit(True)
    for c in value_cols:
        cd = F.col(c).cast("double")
        cond = (
            cond
            & F.col(c).isNotNull()
            & ~F.isnan(cd)
            & (F.abs(cd) != F.lit(float("inf")))
        )
    base = df.filter(F.col(unit_col).isNotNull() & cond)
    vals = [F.round(F.col(c).cast("double"), 6) for c in value_cols]
    # doubled average rank: 2·rank_j = 2 + 2·#{i: v_i < v_j}
    #                                    + #{i≠j: v_i = v_j}  (integer)
    r2 = []
    for j in range(k):
        expr = F.lit(2)
        for i in range(k):
            if i == j:
                continue
            expr = expr + F.when(vals[i] < vals[j], 2).otherwise(
                F.when(vals[i] == vals[j], 1).otherwise(0)
            )
        r2.append(expr.cast("bigint"))
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(k):
        aggs.append(F.sum(r2[j]).alias(f"r2_{j}"))
    m = base.agg(*aggs)
    n = F.col("n").cast("double")
    sr2 = None
    for j in range(k):
        rj = F.col(f"r2_{j}").cast("double") / F.lit(2.0)
        term = rj * rj
        sr2 = term if sr2 is None else sr2 + term
    chi2 = F.when(
        F.col("n") > 0,
        F.lit(12.0) / (n * F.lit(float(k)) * F.lit(float(k + 1)))
        * sr2
        - F.lit(3.0) * n * F.lit(float(k + 1)),
    )
    return m.select(
        F.col("n").alias("n_units"),
        F.lit(k).alias("k"),
        F.round(chi2, 6).alias("chi2_f"),
        F.lit(k - 1).alias("dof"),
    )
