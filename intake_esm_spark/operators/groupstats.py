"""K-sample group-comparison statistics: Kruskal-Wallis, one-way /
Welch ANOVA, Brown-Forsythe, Spearman rank correlation, and the
categorical association report (mutual information + Cramér's V).

Extension (SURVEY §2.9): the two-sample readouts in ``experiment.py``
(two-proportion z, Mann-Whitney, KS) answer "did the treatment move the
metric"; this module answers the K-ARM and ASSOCIATION questions a
training-data pipeline asks of the same frames — "do the k data sources
differ in quality score" (Kruskal-Wallis / ANOVA), "is the variance
stable across shards" (Brown-Forsythe), "do these two features carry
the same information" (Spearman / mutual information).  No reference
counterpart (the reference is a catalog engine, intake_esm/_search.py);
these follow the repo's experiment-family discipline instead.

Scale shapes, by construction:

- rank statistics (Kruskal-Wallis, Spearman) collapse to the
  DISTINCT-VALUE grain with one value-keyed exchange, then take
  cumulative counts from the two-phase bucketed prefix sum
  (:func:`~.ranks.bucketed_cumsum`) — no single task ever sorts the
  frame, even for continuous outcomes where distinct ≈ units (the
  Mann-Whitney discipline, ``experiment.py``);
- moment statistics (ANOVA, Brown-Forsythe) are ONE partial-aggregated
  groupBy to the group grain (map-side combine makes the exchange
  group-cardinality-sized), then closed-form IEEE over the k-row frame;
- the association report is one cell-grain exchange with margins
  broadcast back (the ``chi_square_report`` shape).

Determinism: counts, rank sums (via ``2·midrank = 2·cum − c + 1``,
an integer) and 6dp-quantized value moments accumulate as exact
DECIMALs; every cross-group / cross-cell double sum quantizes to
decimal first (order-independent); the final statistic is one fixed
IEEE expression over those exact inputs, so the DuckDB oracles replay
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_moments(
    units: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group additive moments ``(group, __n, __s1, __s2)`` — the
    exact-decimal half shared by :func:`anova_report` and
    :func:`brown_forsythe_report`, and the state of the streaming twin
    (``streaming.stateful.stream_anova``): values quantize to 6dp
    DECIMAL(18,6) first, so the sum and sum-of-squares are EXACT and
    additive (any partition order, any micro-batch split — same
    moments).  One partial-aggregated exchange, group-cardinality-sized
    output.  Null group keys and null or NON-FINITE values are
    excluded — a NaN would pass isNotNull, be COUNTED by n, yet vanish
    from the decimal sums (round(NaN) casts to null), silently biasing
    every downstream mean/variance; |values| ≥ 1e12 remain the
    documented DECIMAL(18,6) domain bound shared by the whole repo."""
    xd = F.col(value_col).cast("double")
    xq = F.round(xd, 6).cast("decimal(18,6)")
    return (
        units.filter(
            F.col(group_col).isNotNull()
            & F.col(value_col).isNotNull()
            & ~F.isnan(xd)
            & (F.abs(xd) != F.lit(float("inf")))
        )
        .groupBy(F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(xq).alias("__s1"),
            F.sum(
                (xq * xq).cast("decimal(38,12)")
            ).alias("__s2"),
        )
    )


def anova_from_moments(per_g: DataFrame) -> DataFrame:
    """One-way fixed-effects F and Welch's heteroscedastic F from the
    per-group moment frame of :func:`_group_moments` — the shared
    readout of the batch report and the streaming twin's snapshot.

    Closed-form over exact moments: ``SSB = Σ s1_g²/n_g − S1²/N``,
    ``SSW = Σ (s2_g − s1_g²/n_g)``; per-group double contributions
    quantize to 12dp DECIMAL(38,12) before the cross-group sum (the
    chi² cell discipline — a double sum over groups is
    partition-order-dependent).  Welch needs the weight total first, so
    the 1-row weight aggregate broadcasts back onto the k-row frame —
    aggregate-sized, never data.  Returns one row ``(n_units, n_groups,
    df_between, df_within, f_stat, eta_sq, welch_f, welch_df2)``;
    ``f_stat`` is null when k < 2, N ≤ k, or SSW degenerates to 0;
    Welch columns are additionally null when any group has n < 2 or
    zero variance (its 1/s² weight is undefined)."""
    nd = F.col("__n").cast("double")
    s1d = F.col("__s1").cast("double")
    s2d = F.col("__s2").cast("double")
    d12 = "decimal(38,12)"
    contrib_b = F.round(s1d * s1d / nd, 12).cast(d12)
    contrib_w = F.round(s2d - s1d * s1d / nd, 12).cast(d12)
    # per-group sample variance for Welch (null-safe: n ≥ 2 only)
    var_g = F.when(
        F.col("__n") >= 2,
        (s2d - s1d * s1d / nd) / (nd - F.lit(1.0)),
    )
    w_g = F.when(var_g > 0, nd / var_g)
    base = per_g.select(
        "__n",
        "__s1",
        contrib_b.alias("__cb"),
        contrib_w.alias("__cw"),
        w_g.alias("__w"),
        (w_g * (s1d / nd)).alias("__wm"),
    )
    tot1 = base.agg(
        F.sum("__n").alias("__tn"),
        F.sum("__s1").alias("__ts1"),
        F.count(F.lit(1)).alias("__k"),
        F.sum("__cb").alias("__sb"),
        F.sum("__cw").alias("__sw"),
        # Welch weight totals: null-propagating on purpose — ANY
        # degenerate group (n<2 or var=0) nulls the Welch columns
        F.sum(F.when(F.col("__w").isNotNull(), 1).otherwise(None)).alias(
            "__wk"
        ),
        F.sum("__w").alias("__tw"),
        F.sum("__wm").alias("__twm"),
    )
    # second k-row pass for the Welch dispersion terms (needs W first)
    wjoined = base.crossJoin(F.broadcast(tot1.select("__tw", "__twm")))
    wterms = wjoined.agg(
        F.sum(
            F.round(
                F.col("__w")
                * (
                    F.col("__s1").cast("double") / F.col("__n").cast("double")
                    - F.col("__twm") / F.col("__tw")
                )
                * (
                    F.col("__s1").cast("double") / F.col("__n").cast("double")
                    - F.col("__twm") / F.col("__tw")
                ),
                12,
            ).cast(d12)
        ).alias("__wa"),
        F.sum(
            F.round(
                (F.lit(1.0) - F.col("__w") / F.col("__tw"))
                * (F.lit(1.0) - F.col("__w") / F.col("__tw"))
                / (F.col("__n").cast("double") - F.lit(1.0)),
                12,
            ).cast(d12)
        ).alias("__wb"),
    )
    m = tot1.crossJoin(F.broadcast(wterms))
    tn = F.col("__tn").cast("double")
    ts1 = F.col("__ts1").cast("double")
    k = F.col("__k").cast("double")
    ssb = F.col("__sb").cast("double") - ts1 * ts1 / tn
    ssw = F.col("__sw").cast("double")
    sst = ssb + ssw
    df1 = F.col("__k") - F.lit(1)
    df2 = F.col("__tn") - F.col("__k")
    ok = (F.col("__k") >= 2) & (F.col("__tn") > F.col("__k"))
    f_stat = F.when(
        ok & (ssw > 0),
        (ssb / (k - F.lit(1.0))) / (ssw / (tn - k)),
    )
    eta = F.when(ok & (sst > 0), ssb / sst)
    # Welch: valid only when every group carried a finite weight
    wok = ok & (F.col("__wk") == F.col("__k"))
    wa = F.col("__wa").cast("double")
    wb = F.col("__wb").cast("double")
    kk = (k - F.lit(1.0)) * (k + F.lit(1.0))  # k² − 1
    welch_f = F.when(
        wok & (wb >= 0),
        (wa / (k - F.lit(1.0)))
        / (F.lit(1.0) + F.lit(2.0) * (k - F.lit(2.0)) / kk * wb),
    )
    welch_df2 = F.when(wok & (wb > 0), kk / (F.lit(3.0) * wb))
    return m.select(
        F.col("__tn").alias("n_units"),
        F.col("__k").alias("n_groups"),
        F.when(ok, df1).alias("df_between"),
        F.when(ok, df2).alias("df_within"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(eta, 6).alias("eta_sq"),
        F.round(welch_f, 6).alias("welch_f"),
        F.round(welch_df2, 6).alias("welch_df2"),
    )


def anova_report(
    units: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-way ANOVA across k groups — the parametric k-arm
    generalization of :func:`~.experiment.ab_test_report`'s mean
    comparison: does ANY data source / experiment arm / shard differ in
    mean outcome?  Reports both the classical fixed-effects F (equal
    variances) and Welch's F (heteroscedastic — the robust default when
    group variances differ, the common case for per-source quality
    scores), plus eta² effect size.  Compare ``f_stat`` against the
    F(df_between, df_within) critical value client-side (the CDF is not
    SQL arithmetic — the :func:`~.experiment.chi_square_report`
    convention).

    Scale: one partial-aggregated exchange to the group grain
    (:func:`_group_moments`), then closed-form IEEE over the k-row
    frame with 12dp-decimal cross-group sums.  The moments are additive
    and exact, which is what makes the streaming twin
    (``streaming.stateful.stream_anova``) bit-identical."""
    return anova_from_moments(_group_moments(units, group_col, value_col))


def brown_forsythe_report(
    units: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Brown-Forsythe test of EQUAL VARIANCES across k groups — the
    median-centered Levene variant (robust to non-normality): one-way
    ANOVA on ``|x − median_g|``.  A shard whose metric variance blows
    up (upstream dedup regression, corrupted source) moves this test
    long before the mean moves.

    Per-group medians come from
    :func:`~.profiling.group_exact_quantiles` (exact type-7 selection
    via per-group bucketed cumulative counts — no group ever sorts in
    one task, no value buffering), rounded to 6dp and broadcast back
    (group-cardinality frame); the centered deviations then take the
    one-exchange moment path of :func:`anova_report`.  Returns one row
    ``(n_units, n_groups, df1, df2, bf_stat)``; null statistic when
    k < 2, N ≤ k, or the deviations degenerate."""
    from .profiling import group_exact_quantiles

    base = units.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    )
    med = group_exact_quantiles(
        base, value_col, [group_col], probs=[0.5]
    ).select(
        F.col(group_col).alias("__mg"), F.col("quantile").alias("__med")
    )
    dev = base.join(
        F.broadcast(med), F.col(group_col) == F.col("__mg")
    ).select(
        F.col(group_col).alias("__bfg"),
        F.abs(F.col(value_col).cast("double") - F.col("__med")).alias(
            "__bfz"
        ),
    )
    out = anova_from_moments(_group_moments(dev, "__bfg", "__bfz"))
    return out.select(
        "n_units",
        "n_groups",
        F.col("df_between").alias("df1"),
        F.col("df_within").alias("df2"),
        F.col("f_stat").alias("bf_stat"),
    )


def kruskal_wallis_report(
    units: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Kruskal-Wallis H test — the k-sample generalization of
    :func:`~.experiment.mannwhitney_report`: do the k groups draw from
    the same distribution, without assuming normality?  Midranks for
    ties with the standard tie correction ``C = 1 − Σ(t³−t)/(N³−N)``;
    ``h_stat`` is the tie-corrected statistic, chi²(dof)-distributed
    under the null — compare client-side (the ``chi_square_report``
    convention).

    Scale shape (the Mann-Whitney discipline): one (value, group)-keyed
    exchange collapses the units, cumulative counts over the
    distinct-value grain come from the TWO-PHASE BUCKETED prefix sum
    (:func:`~.ranks.bucketed_cumsum` — value-range buckets, per-bucket
    windows, broadcast offsets), so no single task ever sorts the frame
    even when the outcome is continuous and distinct ≈ units; per-group
    rank sums are then one group-grain aggregate.

    Determinism: ``2·midrank = 2·cum − c + 1`` is an INTEGER, so each
    group's doubled rank sum accumulates as exact DECIMAL(38,0); the
    cross-group ``R_g²/n_g`` sum quantizes to 6dp decimal (the H
    statistic is O(chi²)-sized, so 6dp absolute error on the 12/(N(N+1))
    -scaled term is far below the 6dp output rounding); ties
    ``Σ(t³−t)`` is an exact decimal.  Returns one row ``(n_units,
    n_groups, dof, h_stat)``; null when k < 2 or every value is tied
    (C = 0)."""
    from .ranks import bucketed_cumsum

    kvd = F.col(value_col).cast("double")
    per_vg = (
        units.filter(
            F.col(group_col).isNotNull()
            & F.col(value_col).isNotNull()
            # finite only — the spearman/bucketed-span contract: NaN
            # would rank above every finite value AND poison the
            # bucket span (ranks.py docstring)
            & ~F.isnan(kvd)
            & (F.abs(kvd) != F.lit(float("inf")))
        )
        .groupBy(
            F.col(value_col).alias("__val"),
            F.col(group_col).alias("__g"),
        )
        .agg(F.count(F.lit(1)).alias("__cg"))
        # pinned: feeds the value-grain collapse AND the rank join-back
        .localCheckpoint(eager=False)
    )
    per_v = per_vg.groupBy("__val").agg(F.sum("__cg").alias("__c"))
    cum = bucketed_cumsum(per_v, ["__c"], val_col="__val")
    j = per_vg.join(cum, "__val")
    per_g = j.groupBy("__g").agg(
        F.sum("__cg").alias("__ng"),
        F.sum(
            F.expr("CAST(__cg AS DECIMAL(38,0)) * (2 * __cum___c - __c + 1)")
        ).alias("__2r"),
    )
    ties = per_v.agg(
        F.sum(
            F.expr("CAST(__c AS DECIMAL(38,0)) * __c * __c - __c")
        )
        .cast("double")
        .alias("__tt")
    )
    ngd = F.col("__ng").cast("double")
    rg = F.col("__2r").cast("double") / F.lit(2.0)
    term = F.round(rg * rg / ngd, 6).cast("decimal(38,6)")
    m = per_g.agg(
        F.sum("__ng").alias("__tn"),
        F.count(F.lit(1)).alias("__k"),
        F.sum(term).cast("double").alias("__st"),
    ).crossJoin(F.broadcast(ties))
    tn = F.col("__tn").cast("double")
    h_raw = (
        F.lit(12.0) / (tn * (tn + F.lit(1.0))) * F.col("__st")
        - F.lit(3.0) * (tn + F.lit(1.0))
    )
    c_tie = F.lit(1.0) - F.col("__tt") / (tn * tn * tn - tn)
    h = F.when(
        (F.col("__k") >= 2) & (F.col("__tn") >= 2) & (c_tie > 0),
        h_raw / c_tie,
    )
    return m.select(
        F.col("__tn").alias("n_units"),
        F.col("__k").alias("n_groups"),
        F.when(F.col("__k") >= 2, F.col("__k") - F.lit(1)).alias("dof"),
        F.round(h, 6).alias("h_stat"),
    )


def spearman_report(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Spearman rank correlation between two numeric columns — Pearson
    on midranks, the monotone-association measure that survives
    outliers and nonlinearity (feature-vs-quality screening, where raw
    Pearson chases heavy tails).  With ``t = rho·√((n−2)/(1−rho²))``
    reported for the usual t(n−2) reference.

    Scale shape: each column collapses to its distinct-value grain with
    one value-keyed exchange; cumulative counts come from the bucketed
    prefix sum (no single-task sort); the midrank maps join back onto
    the row frame by value (two keyed hash joins — rank maps are
    distinct-value-sized, co-partitioned on the value).

    Determinism: the whole statistic reduces to THREE exact integer
    sums — ``Σ(2rx·2ry)``, ``Σ(2rx)²``, ``Σ(2ry)²`` as DECIMAL(38,0)
    (``2·midrank ≤ 2N``, so products stay within 38 digits for any
    realistic N) — because midranks preserve the rank total:
    ``Σ2r = N(N+1)`` identically, making the means known constants.
    ``rho = (Σ2rx·2ry − N(N+1)²) / √((Σ(2rx)² − N(N+1)²)(Σ(2ry)² −
    N(N+1)²))`` is one fixed IEEE expression over those integers.
    Non-finite and null values in either column are excluded.  Returns
    one row ``(n_rows, rho, t_stat)``; null when n < 2 or either margin
    is constant."""
    from .ranks import bucketed_cumsum

    xd = F.col(x_col).cast("double")
    yd = F.col(y_col).cast("double")
    base = df.filter(
        F.col(x_col).isNotNull()
        & F.col(y_col).isNotNull()
        & ~F.isnan(xd)
        & ~F.isnan(yd)
        & (F.abs(xd) != F.lit(float("inf")))
        & (F.abs(yd) != F.lit(float("inf")))
    ).select(xd.alias("__x"), yd.alias("__y"))

    def _rank_map(col: str, out: str) -> DataFrame:
        per_v = base.groupBy(F.col(col).alias("__val")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        cum = bucketed_cumsum(per_v, ["__c"], val_col="__val")
        return cum.select(
            F.col("__val").alias(col),
            (
                F.lit(2) * F.col("__cum___c") - F.col("__c") + F.lit(1)
            ).alias(out),
        )

    rx = _rank_map("__x", "__tmx")
    ry = _rank_map("__y", "__tmy")
    rowed = base.join(rx, "__x").join(ry, "__y")
    m = rowed.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(
            F.expr("CAST(__tmx AS DECIMAL(38,0)) * __tmy")
        ).cast("double").alias("__sxy"),
        F.sum(
            F.expr("CAST(__tmx AS DECIMAL(38,0)) * __tmx")
        ).cast("double").alias("__sxx"),
        F.sum(
            F.expr("CAST(__tmy AS DECIMAL(38,0)) * __tmy")
        ).cast("double").alias("__syy"),
    )
    nd = F.col("__n").cast("double")
    mm = nd * (nd + F.lit(1.0)) * (nd + F.lit(1.0))
    vx = F.col("__sxx") - mm
    vy = F.col("__syy") - mm
    rho = F.when(
        (F.col("__n") >= 2) & (vx > 0) & (vy > 0),
        (F.col("__sxy") - mm) / F.sqrt(vx * vy),
    )
    rho6 = F.round(rho, 6)
    t = F.when(
        (F.col("__n") > 2) & (F.abs(rho6) < 1),
        rho6
        * F.sqrt(
            (nd - F.lit(2.0)) / (F.lit(1.0) - rho6 * rho6)
        ),
    )
    return m.select(
        F.col("__n").alias("n_rows"),
        rho6.alias("rho"),
        F.round(t, 6).alias("t_stat"),
    )


def kendall_tau_b(
    df: DataFrame,
    x_col: str,
    y_col: str,
    max_cells: int = 4096,
) -> DataFrame:
    """Kendall's tau-b between two LOW-CARDINALITY numeric columns —
    the third leg of the correlation trio (Pearson in
    :func:`~.profiling.correlation_matrix`, Spearman in
    :func:`spearman_report`): concordant-vs-discordant pair agreement
    with the standard tie normalization
    ``τ_b = (C − D)/√((n₀ − n₁)(n₀ − n₂))``.

    Scale contract — and the reason this operator is CELL-GRAIN ONLY:
    tau over continuous columns is inherently pairwise (distributed
    O(n log n) inversion counting doesn't decompose into Spark's
    associative primitives), but over bounded-cardinality columns
    (quantized features, ratings, ordinal tiers — tau's natural home)
    every pair statistic is exact on the r×c contingency table: ONE
    cell-grain exchange, then a cell×cell dominance self-join bounded
    by ``max_cells²``. The cardinality is GUARDED lazily in-plan by an
    ``assert_true`` broadcast onto BOTH join inputs (the
    ``source_divergence`` convention) — a continuous column aborts
    with an informative error before the quadratic join can emit.

    Determinism: C and D are exact DECIMAL(38,0) sums of n_a·n_b over
    strictly-dominating cell pairs; tie terms n₁/n₂ come from the
    margins as exact decimals; the final ratio is one fixed IEEE
    expression. Returns one row ``(n_rows, n_cells, concordant,
    discordant, tau_b)``; null τ when either margin is constant."""
    if max_cells < 4:
        raise ValueError(f"max_cells must be >= 4, got {max_cells}")
    cells = (
        df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"))
        .agg(F.count(F.lit(1)).alias("__n"))
        # pinned: feeds the guard count, both join sides, and margins
        .localCheckpoint(eager=False)
    )
    ncells = cells.agg(F.count(F.lit(1)).alias("__nc"))
    guard = F.assert_true(
        F.col("__nc") <= F.lit(max_cells),
        F.lit(
            f"kendall_tau_b: more than {max_cells} distinct (x, y) "
            "cells — the dominance join is cells²-quadratic; tau-b is "
            "for bounded-cardinality columns (quantize first, or raise "
            "max_cells explicitly)"
        ),
    ).isNull()
    cg = cells.crossJoin(F.broadcast(ncells)).filter(guard).drop("__nc")
    a = cg.select(
        F.col("__x").alias("__xa"),
        F.col("__y").alias("__ya"),
        F.col("__n").alias("__na"),
    )
    b = cg.select(
        F.col("__x").alias("__xb"),
        F.col("__y").alias("__yb"),
        F.col("__n").alias("__nb"),
    )
    prod = F.expr("CAST(__na AS DECIMAL(38,0)) * __nb")
    pairs = a.join(b, F.col("__xa") < F.col("__xb")).select(
        F.when(F.col("__ya") < F.col("__yb"), prod).alias("__c"),
        F.when(F.col("__ya") > F.col("__yb"), prod).alias("__d"),
    )
    cd = pairs.agg(
        F.coalesce(F.sum("__c"), F.lit(0).cast("decimal(38,0)")).alias(
            "__cc"
        ),
        F.coalesce(F.sum("__d"), F.lit(0).cast("decimal(38,0)")).alias(
            "__dd"
        ),
    )
    xm = cells.groupBy("__x").agg(F.sum("__n").alias("__nx"))
    ym = cells.groupBy("__y").agg(F.sum("__n").alias("__ny"))
    t1 = xm.agg(
        F.sum(
            F.expr("CAST(__nx AS DECIMAL(38,0)) * (__nx - 1)")
        ).alias("__t1"),
        F.sum("__nx").alias("__nr"),
    )
    t2 = ym.agg(
        F.sum(
            F.expr("CAST(__ny AS DECIMAL(38,0)) * (__ny - 1)")
        ).alias("__t2")
    )
    nc2 = cells.agg(F.count(F.lit(1)).alias("__ncells"))
    m = (
        cd.crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .crossJoin(F.broadcast(nc2))
    )
    nd = F.col("__nr").cast("double")
    # doubled pair counts keep everything integer: 2n₀ = n(n−1),
    # 2n₁ = Σnx(nx−1), 2n₂ = Σny(ny−1)
    two_n0 = nd * (nd - F.lit(1.0))
    den = F.sqrt(
        (two_n0 - F.col("__t1").cast("double"))
        * (two_n0 - F.col("__t2").cast("double"))
    ) / F.lit(2.0)
    tau = F.when(
        den > 0,
        (F.col("__cc").cast("double") - F.col("__dd").cast("double"))
        / den,
    )
    return m.select(
        F.col("__nr").alias("n_rows"),
        F.col("__ncells").alias("n_cells"),
        F.col("__cc").cast("double").alias("concordant"),
        F.col("__dd").cast("double").alias("discordant"),
        F.round(tau, 6).alias("tau_b"),
    )


def _assoc_cells(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """The (a, b) cell-count collapse shared by
    :func:`association_report` and the streaming twin
    (``streaming.stateful.stream_association_cells``): additive integer
    counters to the cell grain — exactly a legal streaming aggregation
    in update mode, state bounded by the categorical cross product."""
    return (
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__obs"))
    )


def association_report(
    df: DataFrame, a_col: str, b_col: str
) -> DataFrame:
    """Association between two CATEGORICAL columns, three measures in
    one row: mutual information (nats), normalized MI
    (``MI/√(H_a·H_b)``, the geometric-mean normalization — 0 =
    independent, 1 = deterministic), and Cramér's V
    (``√(χ²/(N·(min(r,c)−1)))``).  The feature-redundancy screen of a
    training-data pipeline: two metadata columns with NMI ≈ 1 carry the
    same signal, and a source column with high V against the label
    leaks it.

    Scale: ONE cell-grain exchange (partial-agged groupBy to (a, b)
    counts, pinned — it feeds both margins and the grid); margins
    broadcast back; χ² uses the full r×c grid (zero cells still
    contribute expected mass — the :func:`~.experiment.
    chi_square_report` rule) while MI sums observed cells only (its
    zero-cell terms are 0 by continuity).  Determinism: counts and
    margins are exact integers; every per-cell double term quantizes to
    12dp DECIMAL(28,12) before the cross-cell sum.  Returns one row
    ``(n_units, n_a, n_b, mi, nmi, cramers_v)``; ``nmi`` is null when
    either margin is constant (its entropy is 0), ``cramers_v`` when
    min(r,c) < 2."""
    return association_from_cells(
        # pinned: feeds both margins, the MI sum, and the chi² terms
        _assoc_cells(df, a_col, b_col).localCheckpoint(eager=False)
    )


def association_from_cells(cells: DataFrame) -> DataFrame:
    """The association readout over a ``(__a, __b, __obs)`` cell frame
    — shared by the batch report and the streaming twin's snapshot
    (latest update per cell → this readout == batch bit-for-bit:
    integer counters into the same quantized term sums)."""
    am = cells.groupBy("__a").agg(F.sum("__obs").alias("__at"))
    bm = cells.groupBy("__b").agg(F.sum("__obs").alias("__bt"))
    nn = cells.agg(F.sum("__obs").alias("__n"))
    d12 = "decimal(28,12)"
    # entropies of the margins (12dp-quantized cross-row sums)
    h_a = (
        am.crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                F.round(
                    -(F.col("__at").cast("double") / F.col("__n"))
                    * F.log(F.col("__at").cast("double") / F.col("__n")),
                    12,
                ).cast(d12)
            )
            .cast("double")
            .alias("__ha"),
            F.count(F.lit(1)).alias("__ka"),
        )
    )
    h_b = (
        bm.crossJoin(F.broadcast(nn))
        .agg(
            F.sum(
                F.round(
                    -(F.col("__bt").cast("double") / F.col("__n"))
                    * F.log(F.col("__bt").cast("double") / F.col("__n")),
                    12,
                ).cast(d12)
            )
            .cast("double")
            .alias("__hb"),
            F.count(F.lit(1)).alias("__kb"),
        )
    )
    # observed cells with both margins: MI terms + chi² observed part
    withm = (
        cells.join(F.broadcast(am), "__a")
        .join(F.broadcast(bm), "__b")
        .crossJoin(F.broadcast(nn))
    )
    nd = F.col("__n").cast("double")
    od = F.col("__obs").cast("double")
    ed = F.col("__at").cast("double") * F.col("__bt").cast("double") / nd
    mi_sum = withm.agg(
        F.sum(
            F.round(od / nd * F.log(od / ed), 12).cast(d12)
        )
        .cast("double")
        .alias("__mi"),
        # χ² over OBSERVED cells: Σ(o−e)²/e + the zero-cell remainder
        # Σ_{o=0} e = N − Σ_{o>0} e (margins are exact), so the full
        # grid never materializes — cell-grain only
        F.sum(F.round((od - ed) * (od - ed) / ed, 12).cast(d12))
        .cast("double")
        .alias("__x2obs"),
        F.sum(F.round(ed, 12).cast(d12)).cast("double").alias("__eobs"),
    )
    m = (
        nn.crossJoin(F.broadcast(h_a))
        .crossJoin(F.broadcast(h_b))
        .crossJoin(F.broadcast(mi_sum))
    )
    chi2 = F.col("__x2obs") + (nd - F.col("__eobs"))
    minrc = F.least(F.col("__ka"), F.col("__kb")).cast("double")
    v = F.when(
        minrc >= 2,
        F.sqrt(
            F.greatest(chi2, F.lit(0.0))
            / (nd * (minrc - F.lit(1.0)))
        ),
    )
    # clamped at 1.0 (round-12 ADVICE, mirroring the greatest(chi2, 0)
    # clamp on Cramér's V): with 12dp-quantized MI/entropy term sums a
    # deterministic association can land marginally above 1 after the
    # 6dp round, which downstream consumers treating nmi ∈ [0, 1]
    # reject; the least() sits INSIDE the when so a null guard branch
    # stays null (least() skips nulls)
    nmi = F.when(
        (F.col("__ha") > 0) & (F.col("__hb") > 0),
        F.least(
            F.lit(1.0),
            F.col("__mi") / F.sqrt(F.col("__ha") * F.col("__hb")),
        ),
    )
    return m.select(
        F.col("__n").alias("n_units"),
        F.col("__ka").alias("n_a"),
        F.col("__kb").alias("n_b"),
        F.round(F.col("__mi"), 6).alias("mi"),
        F.round(nmi, 6).alias("nmi"),
        F.round(v, 6).alias("cramers_v"),
    )


def effect_size_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Two-sample standardized effect sizes — Cohen's d (pooled-SD
    standardized mean difference), Hedges' g (the small-sample
    bias-corrected d, ``J = 1 − 3/(4N − 9)``), and Glass's Δ
    (standardized by the CONTROL arm's SD alone, for when the
    treatment changes the variance too) — the "how big, not just how
    significant" companion every A/B readout needs next to
    :func:`anova_report`'s p-value machinery (reference repo has no
    statistics surface; extension per SURVEY §2.9).

    The two arms are ordered by the group VALUE: arm ``a`` = the
    smaller label (the control by the repo's even/odd cohort
    convention), arm ``b`` = the larger; ``mean_diff`` and all three
    effect sizes are ``b − a``.  Exactly two groups are required —
    guarded in-plan by the house ``assert_true`` (a 3-arm frame aborts
    before any readout emits).

    Scale: ONE partial-aggregated exchange to the group grain (the
    :func:`_group_moments` kernel — 6dp-quantized exact decimal
    moments), then ``min_by``/``max_by`` over the 2-row frame; every
    statistic is a fixed IEEE expression over the exact sums, 6dp
    output.  Nulls: d/g null when either n < 2 or the pooled variance
    degenerates to 0; Glass additionally null when arm a's variance is
    0.  Returns one row ``(n_a, n_b, mean_a, mean_b, mean_diff,
    pooled_sd, cohens_d, hedges_g, glass_delta)``."""
    return effect_sizes_from_moments(
        _group_moments(df, group_col, value_col)
    )


def effect_sizes_from_moments(per_g: DataFrame) -> DataFrame:
    """The readout half of :func:`effect_size_report` over a
    :func:`_group_moments` frame — split out (round 12) so the
    STREAMING path composes exactly like the ANOVA twin: the live
    state is ``stream_anova_moments`` (twin #22's additive per-arm
    counters), and snapshot-through-this-readout == the batch report
    bit-for-bit (exact decimal moments, any micro-batch split; pinned
    by the parity test)."""
    agg = per_g.agg(
        F.count(F.lit(1)).alias("__k"),
        F.min_by(F.struct("__n", "__s1", "__s2"), F.col("__g")).alias(
            "__a"
        ),
        F.max_by(F.struct("__n", "__s1", "__s2"), F.col("__g")).alias(
            "__b"
        ),
    )
    guard = F.assert_true(
        F.col("__k") == 2,
        F.lit(
            "effect_size_report: exactly TWO groups required — "
            "standardized mean differences are a two-arm statistic "
            "(use anova_report for k arms)"
        ),
    ).isNull()
    g = agg.filter(guard)
    n1 = F.col("__a.__n").cast("double")
    n2 = F.col("__b.__n").cast("double")
    s11 = F.col("__a.__s1").cast("double")
    s12 = F.col("__b.__s1").cast("double")
    s21 = F.col("__a.__s2").cast("double")
    s22 = F.col("__b.__s2").cast("double")
    mean_a = s11 / n1
    mean_b = s12 / n2
    ssq_a = s21 - s11 * s11 / n1
    ssq_b = s22 - s12 * s12 / n2
    diff = mean_b - mean_a
    pooled = F.sqrt((ssq_a + ssq_b) / (n1 + n2 - F.lit(2.0)))
    var_a = ssq_a / (n1 - F.lit(1.0))
    ok = (F.col("__a.__n") >= 2) & (F.col("__b.__n") >= 2)
    d = F.when(ok & (pooled > 0), diff / pooled)
    j = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (n1 + n2) - F.lit(9.0)
    )
    glass = F.when(ok & (var_a > 0), diff / F.sqrt(var_a))
    return g.select(
        F.col("__a.__n").alias("n_a"),
        F.col("__b.__n").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(diff, 6).alias("mean_diff"),
        F.round(pooled, 6).alias("pooled_sd"),
        F.round(d, 6).alias("cohens_d"),
        F.round(j * d, 6).alias("hedges_g"),
        F.round(glass, 6).alias("glass_delta"),
    )


def cliffs_delta(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Cliff's delta — the nonparametric ordinal effect size
    ``δ = (#(b > a) − #(b < a)) / (n_a·n_b)``: the dominance
    companion of :func:`~.experiment.mann_whitney_u` (δ = 2U/(n_a·n_b)
    − 1 up to tie handling), robust where Cohen's d is meaningless
    (skew, outliers, ordinal scales).  Arms ordered by group value
    (a = smaller label = control; positive δ = arm b stochastically
    larger); ``magnitude`` carries Romano's standard reading
    (negligible < 0.147 ≤ small < 0.33 ≤ medium < 0.474 ≤ large).

    Scale: the pair counts NEVER materialize pairs — one value-keyed
    collapse to the distinct-value grain (map-side partial), the
    running count of arm-a values below each distinct value via
    :func:`~.ranks.bucketed_cumsum` (no single-task window), and the
    dominance identity ``#(b > a) = Σ_v c_b(v)·cum_a(< v)`` as exact
    DECIMAL(38,0) products — the Kendall/Mann-Whitney discipline.
    Exactly two groups guarded in-plan; null/NaN values and null
    groups excluded.  Returns one row ``(n_a, n_b, n_gt, n_lt, n_tie,
    cliffs_delta, magnitude)``."""
    from .ranks import bucketed_cumsum

    vd = F.col(value_col).cast("double")
    base = df.filter(
        F.col(group_col).isNotNull()
        & F.col(value_col).isNotNull()
        & ~F.isnan(vd)
    ).select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    )
    gg = base.agg(
        F.min("__g").alias("__ga"),
        F.max("__g").alias("__gb"),
        F.countDistinct("__g").alias("__k"),
    )
    guard = F.assert_true(
        F.col("__k") == 2,
        F.lit(
            "cliffs_delta: exactly TWO groups required — dominance "
            "is a two-arm statistic"
        ),
    ).isNull()
    b2 = base.crossJoin(F.broadcast(gg)).filter(guard)
    per_v = (
        b2.groupBy("__v")
        .agg(
            F.sum(
                F.when(F.col("__g") == F.col("__ga"), 1).otherwise(0)
            ).alias("__ca"),
            F.sum(
                F.when(F.col("__g") == F.col("__gb"), 1).otherwise(0)
            ).alias("__cb"),
        )
        # pinned: feeds the cumsum AND the totals (multi-reference)
        .localCheckpoint(eager=False)
    )
    cum = bucketed_cumsum(per_v, ["__ca"], val_col="__v")
    d38 = "decimal(38,0)"
    below_a = (F.col("__cum___ca") - F.col("__ca")).cast(d38)
    tot = per_v.agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    sums = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("__na").alias("__n1"),
        F.max("__nb").alias("__n2"),
        F.coalesce(
            F.sum(F.col("__cb").cast(d38) * below_a), F.lit(0).cast(d38)
        ).alias("__gt"),
        F.coalesce(
            F.sum(
                F.col("__cb").cast(d38)
                * (F.col("__na").cast(d38) - F.col("__cum___ca").cast(d38))
            ),
            F.lit(0).cast(d38),
        ).alias("__lt"),
        F.coalesce(
            F.sum(F.col("__cb").cast(d38) * F.col("__ca").cast(d38)),
            F.lit(0).cast(d38),
        ).alias("__tie"),
    )
    delta = (
        F.col("__gt").cast("double") - F.col("__lt").cast("double")
    ) / (F.col("__n1").cast("double") * F.col("__n2").cast("double"))
    ad = F.abs(F.round(delta, 6))
    return sums.select(
        F.col("__n1").alias("n_a"),
        F.col("__n2").alias("n_b"),
        F.col("__gt").cast("bigint").alias("n_gt"),
        F.col("__lt").cast("bigint").alias("n_lt"),
        F.col("__tie").cast("bigint").alias("n_tie"),
        F.round(delta, 6).alias("cliffs_delta"),
        # closed when-chain (no otherwise): an empty input aggregates
        # to a null-delta row, which must NOT read as 'large'
        F.when(ad < 0.147, F.lit("negligible"))
        .when(ad < 0.33, F.lit("small"))
        .when(ad < 0.474, F.lit("medium"))
        .when(ad >= 0.474, F.lit("large"))
        .alias("magnitude"),
    )


def anderson_darling_ksample(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """k-sample Anderson-Darling test (Scholz & Stephens 1987, the
    tie-adjusted "midrank" version — the same variant scipy's
    ``anderson_ksamp`` computes): did these k samples come from one
    common distribution, with the tail-sensitive AD weighting that
    catches divergence KS/CvM underweight.  The pipeline question is
    "do the k shards / sources / time slices draw from one quality
    distribution" — the omnibus companion of :func:`anova_report`
    (means only) and :func:`kruskal_wallis_report` (locations only).

    Statistic: ``A²akN = (N−1)/N · Σ_i (1/n_i) Σ_j (h_j/N)·
    (N·M_ij − n_i·B_j)² / (B_j(N−B_j) − N·h_j/4)`` over the pooled
    distinct values, with midrank cumulatives ``M_ij = F_ij − f_ij/2``
    and ``B_j = H_j − h_j/2``; standardized ``T = (A² − (k−1))/σ_N``
    where σ_N's exact variance constants are closed forms in the
    harmonic sums ``h = Σ_{i<N} 1/i`` and ``g = Σ_u (1/u)(h − H_{N−u})``.
    Compared against the Scholz-Stephens Table-2 5% critical value
    ``1.645 + 0.678/√m − 0.362/m`` (m = k−1).

    Scale shape: the A² sum is ONE (group, value)-grain exchange —
    per-group midrank cumulatives via
    :func:`~.ranks.grouped_bucketed_cumsum`, pooled cumulatives via
    :func:`~.ranks.bucketed_cumsum`, a value-keyed join between the
    two (never a broadcast of a value-grain frame), per-group k-row
    rollup.  The harmonic constants are NOT an O(N) driver loop
    (scipy's shape): ``h`` and the H-prefix table come from a
    ``spark.range(N)`` bucketed cumsum and ``g`` from one keyed
    self-join of that N-row index frame — distributed, exact-decimal
    (18dp-quantized terms, order-independent), one bounded 1-row
    collect fetches (N, k, L) only.  Determinism: every cumulative is
    an exact integer (doubled to keep midrank halves integral:
    ``2M = 2F−f``, ``2B = 2H−h``; the per-j term reduces to
    ``h·num²/(N·den4)`` with ``num = N(2F−f) − n_i(2H−h)`` and
    ``den4 = (2B)(2N−2B) − N·h`` both exact), per-j/per-i terms
    quantize to 12dp decimals before cross-row sums, one fixed IEEE
    finish.  Null/NaN values and null groups excluded; returns one
    row ``(n_units, n_groups, a2_stat, sigma, t_stat, t_crit_05,
    significant)`` — stats null when N < 4, k < 2, or the pooled
    frame has a single distinct value."""
    from .ranks import bucketed_cumsum, grouped_bucketed_cumsum

    vd = F.col(value_col).cast("double")
    units = df.filter(
        F.col(group_col).isNotNull()
        & F.col(value_col).isNotNull()
        & ~F.isnan(vd)
        & (F.abs(vd) != F.lit(float("inf")))
    ).select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
    cells = (
        units.groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).alias("__f"))
        # pinned: feeds the (N,k,L) sidecar, both cumulative passes,
        # and the group totals (multi-reference rule)
        .localCheckpoint(eager=False)
    )
    meta = cells.agg(
        F.coalesce(F.sum("__f"), F.lit(0)).alias("__N"),
        F.countDistinct("__g").alias("__k"),
        F.countDistinct("__v").alias("__L"),
    ).collect()[0]
    n_total, k, n_l = int(meta["__N"]), int(meta["__k"]), int(meta["__L"])
    if n_total < 4 or k < 2 or n_l < 2:
        return cells.agg(
            F.coalesce(F.sum("__f"), F.lit(0)).alias("n_units"),
            # int, matching the main path's F.lit(k).cast("int") — the
            # output schema must not vary with the data shape (r13 ADVICE)
            F.countDistinct("__g").cast("int").alias("n_groups"),
            F.lit(None).cast("double").alias("a2_stat"),
            F.lit(None).cast("double").alias("sigma"),
            F.lit(None).cast("double").alias("t_stat"),
            F.lit(None).cast("double").alias("t_crit_05"),
            F.lit(0).alias("significant"),
        )
    spark = df.sparkSession
    nn = float(n_total)
    # pooled per-value counts + midrank cumulative (value grain);
    # pinned: feeds the pooled cumsum AND the dense-grid scaffold
    pooled = (
        cells.groupBy("__v")
        .agg(F.sum("__f").alias("__h"))
        .localCheckpoint(eager=False)
    )
    # NB: Spark's resolver is case-INSENSITIVE — naming these __h/__H
    # (or __ph/__pH) makes every later unqualified reference ambiguous
    pooled_cum = bucketed_cumsum(pooled, ["__h"], val_col="__v").select(
        F.col("__v").alias("__pv"),
        F.col("__h").alias("__hj"),
        F.col("__cum___h").alias("__cumh"),
    )
    # per-group midrank cumulative over the DENSE (group x pooled
    # value) grid: the inner sum runs over EVERY pooled distinct value
    # for EVERY sample (at values a group never hit, f = 0 but its
    # cumulative M is not, and the term still contributes) — a k-fold
    # blowup of the value grain, the price the statistic itself sets
    groups = cells.select("__g").distinct()
    dense = (
        pooled.select("__v")
        .crossJoin(F.broadcast(groups))
        .join(cells, ["__g", "__v"], "left")
        .select(
            "__g", "__v", F.coalesce(F.col("__f"), F.lit(0)).alias("__f")
        )
    )
    grp_cum = grouped_bucketed_cumsum(
        dense, ["__f"], ["__g"], val_col="__v"
    ).select("__g", "__v", "__f", F.col("__cum___f").alias("__cumf"))
    n_i = cells.groupBy("__g").agg(F.sum("__f").alias("__ni"))
    j = (
        grp_cum.join(pooled_cum, F.col("__v") == F.col("__pv"))
        .join(F.broadcast(n_i.withColumnRenamed("__g", "__gg")),
              F.col("__g") == F.col("__gg"))
    )
    d38 = "decimal(38,0)"
    two_m = (F.lit(2) * F.col("__cumf") - F.col("__f")).cast(d38)  # 2M_ij
    two_b = (F.lit(2) * F.col("__cumh") - F.col("__hj")).cast(d38)  # 2B_j
    num = (
        F.lit(n_total).cast(d38) * two_m
        - F.col("__ni").cast(d38) * two_b
    ).cast("double")
    den4 = (
        two_b * (F.lit(2 * n_total).cast(d38) - two_b)
        - F.lit(n_total).cast(d38) * F.col("__hj").cast(d38)
    ).cast("double")
    hd = F.col("__hj").cast("double")
    inner = hd * num * num / (F.lit(nn) * den4)
    per_g = j.groupBy("__g", "__ni").agg(
        F.sum(F.round(inner, 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("__si")
    )
    a2_row = per_g.agg(
        F.sum(
            F.round(
                F.col("__si") / F.col("__ni").cast("double"), 12
            ).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("__tot")
    ).select(
        (F.col("__tot") * F.lit((nn - 1.0) / nn)).alias("__a2")
    )
    # harmonic constants, DISTRIBUTED: H-prefix table over range(1, N)
    rng = spark.range(1, n_total).select(
        F.col("id"),
        # 15dp, not 18: Spark casts double->decimal through the
        # SHORTEST decimal repr (BigDecimal.valueOf) while DuckDB
        # quantizes the exact binary expansion — they agree only
        # within the shortest-repr digit budget
        F.round(F.lit(1.0) / F.col("id").cast("double"), 15)
        .cast("decimal(38,15)")
        .alias("__t"),
    )
    hpref = bucketed_cumsum(rng, ["__t"], val_col="id").select(
        "id", F.col("__cum___t").alias("__Ht")
    ).localCheckpoint(eager=False)  # feeds h, g-left AND g-right
    h_row = hpref.agg(F.max("__Ht").cast("double").alias("__hc"))
    left = hpref.filter(F.col("id") >= 2).select(
        F.col("id").alias("__u"),
        (F.lit(n_total) - F.col("id")).alias("__pk"),
    )
    right = hpref.select(F.col("id").alias("__t2"), F.col("__Ht"))
    g_row = (
        left.join(right, F.col("__pk") == F.col("__t2"))
        .crossJoin(F.broadcast(h_row))
        .agg(
            F.sum(
                F.round(
                    (F.lit(1.0) / F.col("__u").cast("double"))
                    * (F.col("__hc") - F.col("__Ht").cast("double")),
                    15,
                ).cast("decimal(38,15)")
            )
            .cast("double")
            .alias("__gc")
        )
    )
    m = a2_row.crossJoin(F.broadcast(h_row)).crossJoin(F.broadcast(g_row))
    kd, nd = float(k), nn
    hh = F.col("__hc")
    gg = F.col("__gc")
    big_h = n_i.agg(
        F.sum(
            F.round(F.lit(1.0) / F.col("__ni").cast("double"), 15).cast(
                "decimal(38,15)"
            )
        )
        .cast("double")
        .alias("__HH")
    )
    m = m.crossJoin(F.broadcast(big_h))
    HH = F.col("__HH")
    a = (F.lit(4.0) * gg - F.lit(6.0)) * F.lit(kd - 1.0) + (
        F.lit(10.0) - F.lit(6.0) * gg
    ) * HH
    b = (
        (F.lit(2.0) * gg - F.lit(4.0)) * F.lit(kd * kd)
        + F.lit(8.0 * kd) * hh
        + (F.lit(2.0) * gg - F.lit(14.0) * hh - F.lit(4.0)) * HH
        - F.lit(8.0) * hh
        + F.lit(4.0) * gg
        - F.lit(6.0)
    )
    c = (
        (F.lit(6.0) * hh + F.lit(2.0) * gg - F.lit(2.0)) * F.lit(kd * kd)
        + (F.lit(4.0) * hh - F.lit(4.0) * gg + F.lit(6.0)) * F.lit(kd)
        + (F.lit(2.0) * hh - F.lit(6.0)) * HH
        + F.lit(4.0) * hh
    )
    d = (F.lit(2.0) * hh + F.lit(6.0)) * F.lit(kd * kd) - F.lit(
        4.0 * kd
    ) * hh
    sigmasq = (
        a * F.lit(nd * nd * nd) + b * F.lit(nd * nd) + c * F.lit(nd) + d
    ) / F.lit((nd - 1.0) * (nd - 2.0) * (nd - 3.0))
    sigma = F.when(sigmasq > 0, F.sqrt(sigmasq))
    mm = kd - 1.0
    t = (F.col("__a2") - F.lit(mm)) / sigma
    crit = 1.645 + 0.678 / (mm**0.5) - 0.362 / mm
    return m.select(
        F.lit(n_total).cast("bigint").alias("n_units"),
        F.lit(k).cast("int").alias("n_groups"),
        F.round(F.col("__a2"), 6).alias("a2_stat"),
        F.round(sigma, 6).alias("sigma"),
        F.round(t, 6).alias("t_stat"),
        F.lit(round(crit, 6)).alias("t_crit_05"),
        F.coalesce(
            (F.round(t, 6) > F.lit(round(crit, 6))).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def jarque_bera_report(df: DataFrame, value_col: str) -> DataFrame:
    """Jarque-Bera normality test — skewness and excess kurtosis from
    one moment pass, ``JB = n/6·(S² + K²/4)`` against χ²(2): the
    distribution-shape gate run before trusting any z/t-based readout
    on a metric column (heavy revenue tails are the norm, and JB says
    so cheaply where a full ECDF test is overkill).

    Scale: ONE partial-aggregated 1-row scan.  Determinism: values
    quantize to 6dp; Σx and Σx² accumulate as exact decimals (the
    _group_moments kernel); the cubed/quartic terms cannot stay exact
    decimal (the product chain exceeds DECIMAL(38) precision), so each
    per-row x³/x⁴ is ONE fixed IEEE double expression quantized to
    12dp DECIMAL(38,12) before the cross-row sum — order-independent,
    the chi²-cell discipline.  Central moments via the closed
    raw-to-central identities, one fixed IEEE finish; the 5% critical
    value is the χ²(2) literal 5.991465.  Null/NaN excluded.  Returns
    one row ``(n_values, skewness, kurtosis_excess, jb_stat,
    jb_crit_05, significant)``; stats null when n < 3 or the variance
    degenerates."""
    xd = F.col(value_col).cast("double")
    xq6 = F.round(xd, 6)
    base = df.filter(
        F.col(value_col).isNotNull()
        & ~F.isnan(xd)
        & (F.abs(xd) != F.lit(float("inf")))
    )
    d38 = "decimal(38,12)"
    agg = base.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(xq6.cast("decimal(18,6)")).alias("__s1"),
        F.sum(
            (
                xq6.cast("decimal(19,6)") * xq6.cast("decimal(18,6)")
            ).cast(d38)
        ).alias("__s2"),
        F.sum(F.round(xq6 * xq6 * xq6, 12).cast(d38)).alias("__s3"),
        F.sum(F.round(xq6 * xq6 * xq6 * xq6, 12).cast(d38)).alias("__s4"),
    )
    n = F.col("__n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    s3 = F.col("__s3").cast("double")
    s4 = F.col("__s4").cast("double")
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * mean * mean * mean
    m4 = (
        s4 / n
        - F.lit(4.0) * mean * (s3 / n)
        + F.lit(6.0) * mean * mean * (s2 / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    ok = (F.col("__n") >= 3) & (m2 > 0)
    skew = F.when(ok, m3 / F.sqrt(m2 * m2 * m2))
    kurt = F.when(ok, m4 / (m2 * m2) - F.lit(3.0))
    jb = F.when(
        ok,
        n / F.lit(6.0) * (skew * skew + kurt * kurt / F.lit(4.0)),
    )
    return agg.select(
        F.col("__n").alias("n_values"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis_excess"),
        F.round(jb, 6).alias("jb_stat"),
        F.lit(5.991465).alias("jb_crit_05"),
        F.coalesce(
            (F.round(jb, 6) > F.lit(5.991465)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def moods_median_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Mood's median test — the k-sample location test that asks only
    "does each group straddle the GRAND median the same way" (χ² over
    the 2×k above/not-above contingency): maximally robust, the
    companion of :func:`kruskal_wallis_report` when even rank sums
    are too parametric (censored/clipped metrics).  Values equal to
    the grand median count as NOT-above (scipy ``median_test``'s
    ``ties='below'`` default); the grand median is the exact type-7
    pooled median (:func:`~.profiling.exact_quantiles`'s rank-probe —
    interpolated on even counts, so ties at it then only occur for
    odd counts, matching numpy/scipy).  No continuity correction at
    any k (scipy applies Yates only at k = 2 — divergence documented
    rather than silently matched for one shape and not the other).

    Scale: the median via the distinct-value-grain rank probe (no
    single-task sort), then ONE group-grain conditional aggregate;
    χ² closed-form over the k-row frame with 12dp-decimal
    cross-group term sums.  The 5% critical value uses the
    Wilson-Hilferty cube approximation (engine-exact arithmetic;
    within ~0.1% of the exact χ² quantile — documented).  Returns one
    row ``(n_units, n_groups, grand_median, chi2, dof, chi2_crit_05,
    significant)``; null when k < 2 or a margin degenerates."""
    from .profiling import exact_quantiles

    vd = F.col(value_col).cast("double")
    base = df.filter(
        F.col(group_col).isNotNull()
        & F.col(value_col).isNotNull()
        & ~F.isnan(vd)
        & (F.abs(vd) != F.lit(float("inf")))
    ).select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
    med = exact_quantiles(base, "__v", [0.5]).select(
        F.col("quantile").alias("__med")
    )
    per_g = (
        base.crossJoin(F.broadcast(med))
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).alias("__ng"),
            F.sum(
                (F.col("__v").cast("double") > F.col("__med")).cast(
                    "bigint"
                )
            ).alias("__ag"),
            F.max("__med").alias("__medv"),
        )
    )
    tot = per_g.agg(
        F.sum("__ng").alias("__N"),
        F.sum("__ag").alias("__A"),
        F.count(F.lit(1)).alias("__k"),
        F.max("__medv").alias("__gm"),
    )
    j = per_g.crossJoin(F.broadcast(tot))
    nd = F.col("__N").cast("double")
    share = F.col("__A").cast("double") / nd
    e_above = F.col("__ng").cast("double") * share
    e_below = F.col("__ng").cast("double") * (F.lit(1.0) - share)
    o_above = F.col("__ag").cast("double")
    o_below = (F.col("__ng") - F.col("__ag")).cast("double")
    term = F.round(
        (o_above - e_above) * (o_above - e_above) / e_above
        + (o_below - e_below) * (o_below - e_below) / e_below,
        12,
    ).cast("decimal(38,12)")
    out = j.agg(
        F.max("__N").alias("__n"),
        F.max("__k").alias("__kk"),
        F.max("__gm").alias("__med"),
        F.max("__A").alias("__a"),
        F.sum(term).cast("double").alias("__chi2"),
    )
    kk = F.col("__kk")
    dof = (kk - F.lit(1)).cast("int")
    dd = dof.cast("double")
    # Wilson-Hilferty: chi2_q(p, df) ~ df*(1 - 2/(9df) + z_p*sqrt(2/(9df)))^3
    wh = (
        F.lit(1.0)
        - F.lit(2.0) / (F.lit(9.0) * dd)
        + F.lit(1.644854) * F.sqrt(F.lit(2.0) / (F.lit(9.0) * dd))
    )
    crit = dd * wh * wh * wh
    ok = (
        (kk >= 2)
        & (F.col("__a") > 0)
        & (F.col("__a") < F.col("__n"))
    )
    chi2 = F.when(ok, F.col("__chi2"))
    return out.select(
        F.col("__n").alias("n_units"),
        kk.alias("n_groups"),
        F.col("__med").alias("grand_median"),
        F.round(chi2, 6).alias("chi2"),
        dof.alias("dof"),
        F.round(F.when(kk >= 2, crit), 6).alias("chi2_crit_05"),
        F.coalesce(
            (F.round(chi2, 6) > F.round(crit, 6)).cast("int"), F.lit(0)
        ).alias("significant"),
    )
