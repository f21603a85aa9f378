"""Closed-form multiple linear regression (OLS) on Spark: coefficients,
standard errors, t statistics, and fit diagnostics from ONE distributed
moment pass.

Extension (SURVEY §2.9): the regression readout every analytics stack
reaches for right after the two-sample tests — "how much does each
driver move the metric, holding the others fixed".  No reference
counterpart (the reference is a catalog engine); the design follows the
repo's PCA split (``matrix.pca_project``):

Scale shape — the ONLY corpus-sized work is one partial-aggregated
moment pass: with ``p`` features (p ≤ 16, guarded) the normal-equation
inputs are the ``(p+1)(p+2)/2`` second-order sums ``n, Σxᵢ, Σxᵢxⱼ, Σy,
Σxᵢy, Σy²`` — a SINGLE 1-row aggregate with map-side combine, no
shuffle wider than one row.  The ``(p+1)×(p+1)`` solve runs on the
DRIVER (``numpy.linalg.solve`` over a bounded sidecar — the
``pca_project`` eigh precedent), and every fit statistic (SSE, R²,
standard errors, t, F) is closed-form driver arithmetic over the same
exact moments — no residual pass over the corpus at all.

Determinism: every variable quantizes to 6dp DECIMAL(18,6), every
product to DECIMAL(38,12) — the sums are EXACT and order-independent,
so the solve consumes bit-identical inputs on every run and engine;
the DuckDB oracle replays the moment SQL, calls the SAME shared
:func:`ols_solve_from_moments`, and compares the identical literals
(the ``embed_pca`` data-derived-oracle construction).  LAPACK ``solve``
is deterministic for bit-identical inputs; a singular (collinear)
design raises rather than emitting garbage coefficients.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_FEATURES = 16
"""Moment-pass width guard: p features cost (p+1)(p+2)/2 decimal sums
in one aggregate row — fine through 16 (153 sums), a smell above it
(use hashed-feature scoring for wide inputs)."""


def _q(col: str):
    return F.round(F.col(col).cast("double"), 6).cast("decimal(18,6)")


def _finite(col: str):
    cd = F.col(col).cast("double")
    return (
        F.col(col).isNotNull()
        & ~F.isnan(cd)
        & (F.abs(cd) != F.lit(float("inf")))
    )


def _ols_moment_proj(y_col: str, x_cols: list[str]) -> list:
    """The per-row exact-decimal term columns of the OLS moment pass.
    The quantize-and-cast work lives HERE, in a projection BELOW the
    aggregate — a double→decimal cast inside a HashAggregate input
    expression costs ~10× its projected form (the measured SCALE.md
    house rule; the r13 bench caught the first cut of this kernel
    paying ~3× before the split).  Shared by :func:`ols_moment_frame`
    (batch and streaming twin #25) and :func:`ols_by_group`."""
    d38 = "decimal(38,12)"
    cols = []
    for i, c in enumerate(x_cols):
        cols.append(_q(c).alias(f"__ms_{i}"))
        cols.append(
            (_q(c).cast("decimal(19,6)") * _q(y_col))
            .cast(d38)
            .alias(f"__mq_{i}")
        )
        for j2 in range(i, len(x_cols)):
            cols.append(
                (_q(c).cast("decimal(19,6)") * _q(x_cols[j2]))
                .cast(d38)
                .alias(f"__mp_{i}_{j2}")
            )
    cols.append(_q(y_col).alias("__msy"))
    cols.append(
        (_q(y_col).cast("decimal(19,6)") * _q(y_col))
        .cast(d38)
        .alias("__msyy")
    )
    return cols


def _ols_moment_sums(x_cols: list[str]) -> list:
    """The matching plain-column sums over :func:`_ols_moment_proj`'s
    output — (p+1)(p+2)/2 decimal sums plus the count, nothing but
    column references inside the aggregate."""
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(len(x_cols)):
        aggs.append(F.sum(f"__ms_{i}").alias(f"s_{i}"))
        aggs.append(F.sum(f"__mq_{i}").alias(f"q_{i}"))
        for j2 in range(i, len(x_cols)):
            aggs.append(F.sum(f"__mp_{i}_{j2}").alias(f"p_{i}_{j2}"))
    aggs.append(F.sum("__msy").alias("sy"))
    aggs.append(F.sum("__msyy").alias("syy"))
    return aggs


def _complete_case(df: DataFrame, y_col: str, x_cols: list[str]) -> DataFrame:
    cond = _finite(y_col)
    for c in x_cols:
        cond = cond & _finite(c)
    return df.filter(cond)


def ols_moment_frame(
    df: DataFrame, y_col: str, x_cols: list[str]
) -> DataFrame:
    """The one distributed pass AS A PLAN: the 1-row exact-decimal
    moment aggregate of ``(1, x₁..x_p, y)``.  Batch callers collect it
    (:func:`ols_moments`); the streaming twin (#25,
    ``streaming.stateful.stream_ols_moments``) runs the IDENTICAL plan
    as a global streaming aggregation in update mode — every sum is an
    additive exact decimal, so the last update row equals the batch
    moments over everything ingested bit-for-bit."""
    if not x_cols:
        raise ValueError("ols: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"ols: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES} — the moment row grows quadratically; use "
            "hashed-feature scoring (operators/corpus.py) for wide inputs"
        )
    from intake_esm_spark.operators._util import _spread

    # r14: single-row-group parquet arrives as ONE non-empty scan task,
    # serializing the (p+1)(p+2)/2 decimal terms per row on one core —
    # a narrow (y, x₁..x_p) shuffle first spreads the quantize/multiply
    # work across every core (no-op on a many-file table; streaming
    # frames pass through). Decimal sums are order-independent, so the
    # moment row is byte-identical (guide §2.1).
    keep = list(dict.fromkeys([y_col, *x_cols]))
    return (
        _spread(_complete_case(df, y_col, x_cols).select(*keep))
        .select(*_ols_moment_proj(y_col, x_cols))
        .agg(*_ols_moment_sums(x_cols))
    )


def ols_moments(df: DataFrame, y_col: str, x_cols: list[str]) -> dict:
    """The one distributed pass: exact-decimal second-order moments of
    ``(1, x₁..x_p, y)`` as a plain dict (Decimal values) — shared verbatim
    by :func:`ols_report` / :func:`ols_fit_report` and replayed in SQL
    by the oracle builder.  Rows with any null/non-finite variable are
    excluded (complete-case, the _group_moments rule)."""
    return ols_moment_frame(df, y_col, x_cols).collect()[0].asDict()


def ols_solve_from_moments(
    mom: dict, x_cols: list[str], l2: float = 0.0
) -> dict:
    """Driver-side closed-form solve over the exact moments — ONE
    shared implementation consumed by the Spark operators AND the
    DuckDB oracle builder, so both sides emit bit-identical literals.
    Returns ``{terms, coef, std_err, t_stat, n, r2, rmse, resid_se,
    f_stat, df_resid}`` (lists ordered intercept-first); raises on a
    singular design or n ≤ p.

    ``l2 > 0`` (round 13): ridge regression on the SAME moments —
    ``λ`` adds to the slope diagonal of the normal equations (the
    intercept stays unpenalized, so the solution matches sklearn
    ``Ridge(alpha=λ, fit_intercept=True)`` / the centered-design
    closed form exactly), at ZERO extra distributed work.  Standard
    errors switch to the ridge sandwich ``σ²·A⁻¹(XᵀX)A⁻¹`` with
    ``A = XᵀX + Λ`` (which reduces to the OLS ``σ²(XᵀX)⁻¹`` at λ=0 —
    kept on its own branch so the λ=0 float path is byte-identical to
    round 12); SSE/R² use the UNPENALIZED moments (actual residuals
    of the shrunk coefficients).  A collinear design that raises at
    λ=0 becomes a usable fit — the condition guard applies to the
    penalized matrix."""
    import numpy as np

    if l2 < 0 or not np.isfinite(l2):
        raise ValueError(f"ols: l2 penalty must be finite and >= 0, got {l2}")
    p = len(x_cols)
    n = int(mom["n"])
    if n <= p + 1:
        raise ValueError(f"ols: n={n} rows cannot fit {p + 1} parameters")
    xtx = np.zeros((p + 1, p + 1))
    xty = np.zeros(p + 1)
    xtx[0, 0] = float(n)
    xty[0] = float(mom["sy"])
    for i in range(p):
        s = float(mom[f"s_{i}"])
        xtx[0, i + 1] = xtx[i + 1, 0] = s
        xty[i + 1] = float(mom[f"q_{i}"])
        for j2 in range(i, p):
            v = float(mom[f"p_{i}_{j2}"])
            xtx[i + 1, j2 + 1] = xtx[j2 + 1, i + 1] = v
    pen = xtx.copy()
    if l2 > 0:
        for j2 in range(1, p + 1):  # never the intercept
            pen[j2, j2] += float(l2)
    # quantized sums perturb an exactly-singular matrix into an
    # ill-conditioned-but-invertible one, so LU alone won't raise —
    # guard on the condition number (SVD: deterministic given bits)
    cond = float(np.linalg.cond(pen))
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError(
            "ols: singular or ill-conditioned design matrix "
            f"(cond={cond:.3g}, collinear features) — drop a "
            "redundant column or set l2 > 0"
        )
    beta = np.linalg.solve(pen, xty)
    syy = float(mom["syy"])
    sy = float(mom["sy"])
    sse = max(
        0.0, syy - 2.0 * float(beta @ xty) + float(beta @ xtx @ beta)
    )
    sst = syy - sy * sy / n
    df_resid = n - p - 1
    sigma2 = sse / df_resid
    if l2 > 0:
        inv_a = np.linalg.inv(pen)
        covb = inv_a @ xtx @ inv_a
        se = [
            float(np.sqrt(max(0.0, sigma2 * covb[j, j])))
            for j in range(p + 1)
        ]
    else:
        inv = np.linalg.inv(xtx)
        se = [
            float(np.sqrt(max(0.0, sigma2 * inv[j, j])))
            for j in range(p + 1)
        ]
    r2 = 1.0 - sse / sst if sst > 0 else None
    f_stat = (
        ((sst - sse) / p) / (sse / df_resid)
        if p > 0 and sse > 0 and sst > sse
        else None
    )
    return {
        "terms": ["_intercept", *x_cols],
        "coef": [round(float(b), 6) for b in beta],
        "std_err": [round(s, 6) for s in se],
        "t_stat": [
            round(float(b) / s, 6) if s > 0 else None
            for b, s in zip(beta, se)
        ],
        "n": n,
        "r2": round(r2, 6) if r2 is not None else None,
        "rmse": round(float(np.sqrt(sse / n)), 6),
        "resid_se": round(float(np.sqrt(sigma2)), 6),
        "f_stat": round(f_stat, 6) if f_stat is not None else None,
        "df_resid": df_resid,
    }


def ols_report(
    df: DataFrame, y_col: str, x_cols: list[str], l2: float = 0.0
) -> DataFrame:
    """Per-coefficient OLS readout: one row per term (intercept first)
    with ``(term, coef, std_err, t_stat)`` — module docstring for the
    one-pass moment construction and the determinism argument.
    ``l2 > 0`` fits ridge on the same moments (see
    :func:`ols_solve_from_moments` — sklearn ``Ridge(alpha=l2)``
    parity, intercept unpenalized, sandwich standard errors)."""
    sol = ols_solve_from_moments(
        ols_moments(df, y_col, x_cols), x_cols, l2=l2
    )
    spark = df.sparkSession
    rows = list(
        zip(sol["terms"], sol["coef"], sol["std_err"], sol["t_stat"])
    )
    return spark.createDataFrame(
        rows, "term string, coef double, std_err double, t_stat double"
    )


def ols_fit_report(
    df: DataFrame, y_col: str, x_cols: list[str], l2: float = 0.0
) -> DataFrame:
    """Model-level OLS diagnostics: one row ``(n_rows, df_resid, r2,
    rmse, resid_se, f_stat)`` from the SAME moments (no residual pass
    — SSE is closed-form in the second-order sums)."""
    sol = ols_solve_from_moments(
        ols_moments(df, y_col, x_cols), x_cols, l2=l2
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                sol["n"],
                sol["df_resid"],
                sol["r2"],
                sol["rmse"],
                sol["resid_se"],
                sol["f_stat"],
            )
        ],
        "n_rows bigint, df_resid bigint, r2 double, rmse double,"
        " resid_se double, f_stat double",
    )


MAX_GROUPS = 256
"""Group-count guard for :func:`ols_by_group`: the driver solves one
(p+1)×(p+1) system per group over the collected moment sidecar, so the
sidecar must stay bounded — 256 groups × ≤153 sums is a few hundred KB;
raise explicitly for wider segmentations."""


def ols_by_group(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    group_col: str,
    max_groups: int = MAX_GROUPS,
    l2: float = 0.0,
) -> DataFrame:
    """Per-segment multiple regression — one independent OLS (or
    ridge, ``l2 > 0``) fit PER GROUP, the natural follow-up to
    :func:`ols_report` ("does the price~quantity slope differ by
    return flag / source / cohort").

    Scale shape: ONE partial-aggregated exchange to the GROUP grain —
    the identical exact-decimal second-order moments of
    :func:`ols_moments`, grouped, so each task emits ≤ |groups| rows
    before the shuffle and the collected sidecar is |groups| ×
    (p+1)(p+2)/2 decimals, bounded in-plan by a lazy ``assert_true``
    on ``countDistinct(group) ≤ max_groups`` (the ``cluster_quality``
    guard pattern).  The per-group solve is driver arithmetic through
    the SAME shared :func:`ols_solve_from_moments` the oracle builder
    replays, so literals match bit-for-bit.

    Group keys cast to string (one pinned output type across engines);
    null groups are excluded like null variables.  Groups that cannot
    fit — n ≤ p+1, or a singular/ill-conditioned design at the given
    ``l2`` — are OMITTED from the output rather than killing the job
    (one degenerate segment must not abort the other 255; the oracle
    replays the identical try/skip).  Returns one row per surviving
    ``(grp, term)``: ``(grp, term, coef, std_err, t_stat, n_rows)``,
    intercept first within each group."""
    if not x_cols:
        raise ValueError("ols_by_group: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"ols_by_group: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES}"
        )
    cond = _finite(y_col) & F.col(group_col).isNotNull()
    for c in x_cols:
        cond = cond & _finite(c)
    base = df.filter(cond).select(
        F.col(group_col).cast("string").alias("__grp"), y_col, *x_cols
    )
    kc = base.agg(F.countDistinct("__grp").alias("__k"))
    guard = F.assert_true(
        F.coalesce(F.col("__k") <= F.lit(max_groups), F.lit(True)),
        F.lit(
            f"ols_by_group: more than {max_groups} groups — the "
            "per-group moment sidecar is collected to the driver; "
            "coarsen the segmentation or raise max_groups explicitly"
        ),
    ).isNull()
    guarded = base.crossJoin(F.broadcast(kc)).filter(guard).drop("__k")
    moment_rows = (
        guarded.select("__grp", *_ols_moment_proj(y_col, x_cols))
        .groupBy("__grp")
        .agg(*_ols_moment_sums(x_cols))
        .collect()
    )
    out = []
    for r in sorted(moment_rows, key=lambda r0: r0["__grp"]):
        mom = r.asDict()
        try:
            sol = ols_solve_from_moments(mom, x_cols, l2=l2)
        except ValueError:
            continue  # degenerate segment: omitted, documented above
        for t, c, s, ts in zip(
            sol["terms"], sol["coef"], sol["std_err"], sol["t_stat"]
        ):
            out.append((r["__grp"], t, c, s, ts, sol["n"]))
    return df.sparkSession.createDataFrame(
        out,
        "grp string, term string, coef double, std_err double,"
        " t_stat double, n_rows bigint",
    )


def ols_predict(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    id_cols: list[str],
    l2: float = 0.0,
) -> DataFrame:
    """Per-row fitted values and residuals from the one-pass OLS (or
    ridge) fit — the materialization step every diagnostic pipeline
    wants after :func:`ols_report` ("which rows does the model miss").

    Scale shape: ONE moment pass (the :func:`ols_moments` aggregate)
    fits β on the driver; the prediction itself is a fixed IEEE
    expression over β LITERALS applied in-row — zero additional
    shuffles, whole-stage codegen, the corpus is scanned once for the
    fit and once for the projection.  Only complete-case rows are
    emitted (a residual against a null variable is undefined).
    Determinism: the 6dp-rounded coefficients from the shared solve
    project over the same 6dp-quantized variables, left-associated
    exactly as the DuckDB oracle replays them; outputs round to 6dp.
    Returns ``(*id_cols, fitted, residual)``."""
    sol = ols_solve_from_moments(
        ols_moments(df, y_col, x_cols), x_cols, l2=l2
    )
    beta = sol["coef"]  # 6dp literals — the oracle replays these
    base = _complete_case(df, y_col, x_cols)
    eta = F.lit(float(beta[0]))
    for bj, c in zip(beta[1:], x_cols):
        eta = eta + F.lit(float(bj)) * F.round(F.col(c).cast("double"), 6)
    yq = F.round(F.col(y_col).cast("double"), 6)
    return base.select(
        *[F.col(c) for c in id_cols],
        F.round(eta, 6).alias("fitted"),
        F.round(yq - eta, 6).alias("residual"),
    )


def wls_moment_frame(
    df: DataFrame, y_col: str, x_cols: list[str], w_col: str
) -> DataFrame:
    """Weighted second-order moments for :func:`wls_report` AS A PLAN
    (the :func:`ols_moment_frame` split): batch callers collect the
    1-row aggregate (:func:`wls_moments`); the streaming twin (#26,
    ``streaming.stateful.stream_wls_moments``) runs the IDENTICAL plan
    as a global streaming aggregation — every sum is an additive exact
    decimal, so snapshots equal the batch moments bit-for-bit: the same
    single 1-row partial-aggregated scan as :func:`ols_moments`, every
    sum carrying the 6dp-quantized weight — ``Σw, Σw·xᵢ, Σw·xᵢxⱼ,
    Σw·y, Σw·xᵢy, Σw·y²`` plus the plain row count for the residual
    dof.  Rows with null/non-finite variables OR a non-positive
    QUANTIZED weight are excluded (a raw 0 < w < 5e-7 rounds to a zero
    6dp weight — it contributes nothing to any weighted sum and must
    not inflate n/df_resid; a negative weight is a caller bug — r14
    ADVICE).  Per-row products are IEEE doubles 12dp-rounded in
    a PROJECTION below the aggregate (the logistic-pass discipline —
    order-independent decimal sums, codegen-friendly casts)."""
    if not x_cols:
        raise ValueError("wls: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"wls: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES}"
        )
    cond = _finite(y_col) & _finite(w_col)
    for c in x_cols:
        cond = cond & _finite(c)
    # filter on the QUANTIZED weight: a raw 0 < w < 5e-7 rounds to a
    # zero 6dp weight, contributing nothing to any weighted sum — if it
    # still counted toward n it would inflate df_resid and deflate the
    # sigma^2/SE readout (driver ADVICE r14; the oracle replays the
    # same quantized filter)
    base = df.filter(
        cond & (F.round(F.col(w_col).cast("double"), 6) > 0)
    )
    from intake_esm_spark.operators._util import _spread

    # r14: narrow pre-aggregation spread — see ols_moment_frame.
    base = _spread(
        base.select(*dict.fromkeys([w_col, y_col, *x_cols]))
    )
    wq = F.round(F.col(w_col).cast("double"), 6)
    yq = F.round(F.col(y_col).cast("double"), 6)
    xq = [F.round(F.col(c).cast("double"), 6) for c in x_cols]
    # the decimal casts live in the PROJECTION, not the aggregate
    # input — the measured ~10x codegen trap (SCALE.md house rule;
    # the r13 bench caught this operator paying 3x before the fix)
    d38 = "decimal(38,12)"
    terms = [F.round(wq, 6).cast("decimal(18,6)").alias("__tw")]
    for i, x in enumerate(xq):
        terms.append(F.round(wq * x, 12).cast(d38).alias(f"__ts_{i}"))
        terms.append(
            F.round(wq * x * yq, 12).cast(d38).alias(f"__tq_{i}")
        )
        for j2 in range(i, len(xq)):
            terms.append(
                F.round(wq * x * xq[j2], 12).cast(d38).alias(
                    f"__tp_{i}_{j2}"
                )
            )
    terms.append(F.round(wq * yq, 12).cast(d38).alias("__tsy"))
    terms.append(F.round(wq * yq * yq, 12).cast(d38).alias("__tsyy"))
    proj = base.select(*terms)
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs.append(F.sum("__tw").alias("sw"))
    for i in range(len(x_cols)):
        aggs.append(F.sum(f"__ts_{i}").alias(f"s_{i}"))
        aggs.append(F.sum(f"__tq_{i}").alias(f"q_{i}"))
        for j2 in range(i, len(x_cols)):
            aggs.append(F.sum(f"__tp_{i}_{j2}").alias(f"p_{i}_{j2}"))
    aggs.append(F.sum("__tsy").alias("sy"))
    aggs.append(F.sum("__tsyy").alias("syy"))
    return proj.agg(*aggs)


def wls_moments(
    df: DataFrame, y_col: str, x_cols: list[str], w_col: str
) -> dict:
    """The collected 1-row weighted moment aggregate of
    :func:`wls_moment_frame` — what :func:`wls_report` consumes."""
    return wls_moment_frame(df, y_col, x_cols, w_col).collect()[
        0
    ].asDict()


def wls_solve_from_moments(mom: dict, x_cols: list[str]) -> dict:
    """Driver-side weighted-least-squares solve over the weighted
    moments — ``β = (XᵀWX)⁻¹XᵀWy``, standard errors from
    ``σ²(XᵀWX)⁻¹`` with ``σ² = SSE_w / (n − p − 1)`` (statsmodels
    ``WLS`` conventions).  ONE shared implementation for the operator
    and the DuckDB oracle builder (the OLS precedent)."""
    import numpy as np

    p = len(x_cols)
    n = int(mom["n"])
    if n <= p + 1:
        raise ValueError(f"wls: n={n} rows cannot fit {p + 1} parameters")
    xtx = np.zeros((p + 1, p + 1))
    xty = np.zeros(p + 1)
    xtx[0, 0] = float(mom["sw"])
    xty[0] = float(mom["sy"])
    for i in range(p):
        s = float(mom[f"s_{i}"])
        xtx[0, i + 1] = xtx[i + 1, 0] = s
        xty[i + 1] = float(mom[f"q_{i}"])
        for j2 in range(i, p):
            v = float(mom[f"p_{i}_{j2}"])
            xtx[i + 1, j2 + 1] = xtx[j2 + 1, i + 1] = v
    cond = float(np.linalg.cond(xtx))
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError(
            "wls: singular or ill-conditioned weighted design "
            f"(cond={cond:.3g})"
        )
    beta = np.linalg.solve(xtx, xty)
    inv = np.linalg.inv(xtx)
    sse = max(
        0.0,
        float(mom["syy"])
        - 2.0 * float(beta @ xty)
        + float(beta @ xtx @ beta),
    )
    df_resid = n - p - 1
    sigma2 = sse / df_resid
    se = [float(np.sqrt(max(0.0, sigma2 * inv[j, j]))) for j in range(p + 1)]
    return {
        "terms": ["_intercept", *x_cols],
        "coef": [round(float(b), 6) for b in beta],
        "std_err": [round(s, 6) for s in se],
        "t_stat": [
            round(float(b) / s, 6) if s > 0 else None
            for b, s in zip(beta, se)
        ],
        "n": n,
        "df_resid": df_resid,
    }


def wls_report(
    df: DataFrame, y_col: str, x_cols: list[str], w_col: str
) -> DataFrame:
    """Weighted least squares — the regression every
    heteroscedasticity-aware pipeline reaches for after
    :func:`breusch_pagan_report` fires (and the aggregated-data
    regression: rows that are group means carry their group sizes as
    weights).  Same ONE-pass scale shape as :func:`ols_report`; see
    :func:`wls_moments` / :func:`wls_solve_from_moments`.  Returns one
    row per term ``(term, coef, std_err, t_stat)``."""
    sol = wls_solve_from_moments(
        wls_moments(df, y_col, x_cols, w_col), x_cols
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        list(zip(sol["terms"], sol["coef"], sol["std_err"], sol["t_stat"])),
        "term string, coef double, std_err double, t_stat double",
    )


def vif_from_moments(mom: dict, x_cols: list[str]) -> list[dict]:
    """Variance-inflation factors from the SAME second-order moments
    the OLS pass collects: centered covariance → correlation matrix R
    of the predictors → ``VIF_j = [R⁻¹]_jj`` and ``R²_j = 1 − 1/VIF_j``
    (each feature regressed on the others, closed-form).  ONE shared
    implementation for the operator and the oracle builder.  A
    zero-variance feature gets a null VIF (it inflates nothing — it IS
    degenerate); an exactly-singular correlation matrix (perfect
    collinearity) reports infinity as null VIF with ``r2_j = 1``."""
    import numpy as np

    p = len(x_cols)
    n = int(mom["n"])
    if n < 2:
        raise ValueError(f"vif: need >= 2 rows, got {n}")
    cov = np.zeros((p, p))
    for i in range(p):
        si = float(mom[f"s_{i}"])
        for j2 in range(i, p):
            v = float(mom[f"p_{i}_{j2}"])
            sj = float(mom[f"s_{j2}"])
            cov[i, j2] = cov[j2, i] = v - si * sj / n
    sd = np.sqrt(np.diag(cov))
    out = []
    live = [i for i in range(p) if sd[i] > 0]
    corr = np.eye(len(live))
    for a, i in enumerate(live):
        for b in range(a + 1, len(live)):
            j2 = live[b]
            corr[a, b] = corr[b, a] = cov[i, j2] / (sd[i] * sd[j2])
    cnd = float(np.linalg.cond(corr)) if live else 0.0
    inv = (
        np.linalg.inv(corr)
        if live and np.isfinite(cnd) and cnd < 1e12
        else None
    )
    pos = {i: a for a, i in enumerate(live)}
    for i, c in enumerate(x_cols):
        if sd[i] <= 0 or inv is None:
            out.append(
                {
                    "term": c,
                    "vif": None,
                    "r2_other": 1.0 if (sd[i] > 0 and inv is None) else None,
                }
            )
        else:
            v = float(inv[pos[i], pos[i]])
            out.append(
                {
                    "term": c,
                    "vif": round(v, 6),
                    "r2_other": round(1.0 - 1.0 / v, 6) if v > 0 else None,
                }
            )
    return out


def vif_report(df: DataFrame, x_cols: list[str]) -> DataFrame:
    """Variance-inflation factors — the collinearity diagnostic to run
    BEFORE :func:`ols_report` raises (and the "how much ridge do I
    need" readout): ``VIF_j = 1/(1 − R²_j)`` with R²_j from regressing
    feature j on the others, computed CLOSED-FORM from one
    :func:`ols_moments`-style pass (the y slot is unused — the first
    feature doubles as the complete-case anchor).

    Scale shape: ONE 1-row partial-aggregated moment scan; everything
    after is driver arithmetic on the bounded (p×p) sidecar through
    the shared :func:`vif_from_moments` the oracle replays.  Returns
    one row per feature ``(term, vif, r2_other)``; a zero-variance
    feature reports null, perfect collinearity reports ``r2_other=1``
    with null VIF."""
    if not x_cols:
        raise ValueError("vif: need at least one feature column")
    mom = ols_moments(df, x_cols[0], x_cols)
    rows = vif_from_moments(mom, x_cols)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(r["term"], r["vif"], r["r2_other"]) for r in rows],
        "term string, vif double, r2_other double",
    )


def _bp_aux_moments(
    df: DataFrame, y_col: str, x_cols: list[str], beta: list[float]
) -> dict:
    """The second Breusch-Pagan pass: squared-residual moments at the
    fitted β LITERALS — ``Σu, Σu·xᵢ, Σu²`` with ``u = e²`` — one 1-row
    partial-aggregated scan, residual built in a projection below the
    aggregate (the logistic-pass discipline), left-associated exactly
    as the oracle replays it."""
    from intake_esm_spark.operators._util import _spread

    # r14: narrow pre-aggregation spread — see ols_moment_frame.
    base = _spread(
        _complete_case(df, y_col, x_cols).select(
            *dict.fromkeys([y_col, *x_cols])
        )
    )
    xq = [F.round(F.col(c).cast("double"), 6) for c in x_cols]
    yq = F.round(F.col(y_col).cast("double"), 6)
    eta = F.lit(float(beta[0]))
    for bj, x in zip(beta[1:], xq):
        eta = eta + F.lit(float(bj)) * x
    e = yq - eta
    u = e * e
    # decimal casts in the projection, never the aggregate input (the
    # measured ~10x codegen trap — SCALE.md house rule)
    d38 = "decimal(38,12)"
    terms = [F.round(u, 12).cast(d38).alias("__tu")]
    for i, x in enumerate(xq):
        terms.append(F.round(u * x, 12).cast(d38).alias(f"__tux_{i}"))
    terms.append(F.round(u * u, 12).cast(d38).alias("__tuu"))
    proj = base.select(*terms)
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs.append(F.sum("__tu").alias("su"))
    for i in range(len(x_cols)):
        aggs.append(F.sum(f"__tux_{i}").alias(f"su_{i}"))
    aggs.append(F.sum("__tuu").alias("suu"))
    return proj.agg(*aggs).collect()[0].asDict()


def bp_stat_from_moments(
    mom: dict, aux: dict, x_cols: list[str]
) -> dict:
    """Breusch-Pagan (Koenker's studentized form) closed-form finish
    over the pass-1 design moments and the pass-2 squared-residual
    moments: regress ``u = e²`` on X reusing the SAME XᵀX, take
    ``LM = n·R²_aux``, compare against the Wilson-Hilferty χ²(p) 5%
    point.  ONE shared implementation for operator and oracle."""
    import numpy as np

    p = len(x_cols)
    n = int(mom["n"])
    xtx = np.zeros((p + 1, p + 1))
    xtu = np.zeros(p + 1)
    xtx[0, 0] = float(n)
    xtu[0] = float(aux["su"])
    for i in range(p):
        s = float(mom[f"s_{i}"])
        xtx[0, i + 1] = xtx[i + 1, 0] = s
        xtu[i + 1] = float(aux[f"su_{i}"])
        for j2 in range(i, p):
            v = float(mom[f"p_{i}_{j2}"])
            xtx[i + 1, j2 + 1] = xtx[j2 + 1, i + 1] = v
    ba = np.linalg.solve(xtx, xtu)
    suu = float(aux["suu"])
    su = float(aux["su"])
    sse = max(0.0, suu - 2.0 * float(ba @ xtu) + float(ba @ xtx @ ba))
    sst = suu - su * su / n
    r2 = 1.0 - sse / sst if sst > 0 else None
    lm = n * r2 if r2 is not None else None
    dd = float(p)
    wh = 1.0 - 2.0 / (9.0 * dd) + 1.644854 * np.sqrt(2.0 / (9.0 * dd))
    crit = dd * wh * wh * wh
    return {
        "n": n,
        "lm_stat": round(lm, 6) if lm is not None else None,
        "dof": p,
        "chi2_crit_05": round(float(crit), 6),
        "significant": int(lm is not None and round(lm, 6) > round(crit, 6)),
        "r2_aux": round(r2, 6) if r2 is not None else None,
    }


def breusch_pagan_report(
    df: DataFrame, y_col: str, x_cols: list[str]
) -> DataFrame:
    """Breusch-Pagan heteroscedasticity test (Koenker's studentized
    ``n·R²`` form — statsmodels ``het_breuschpagan`` LM parity): does
    the residual variance move with the regressors, i.e. can you
    trust :func:`ols_report`'s standard errors or should you reach
    for :func:`wls_report`.

    Scale shape: TWO 1-row partial-aggregated scans — pass 1 is the
    :func:`ols_moments` aggregate (fits β on the driver), pass 2
    re-scans with the squared residual built in-row at β literals
    (:func:`_bp_aux_moments`); the auxiliary regression of e² on X
    reuses pass 1's XᵀX, so no third pass exists.  Determinism: 6dp
    quantized variables, 6dp β literals, 12dp-rounded term sums, one
    fixed IEEE finish shared with the oracle builder
    (:func:`bp_stat_from_moments`).  Returns one row ``(n_rows,
    lm_stat, dof, chi2_crit_05, significant, r2_aux)``."""
    mom = ols_moments(df, y_col, x_cols)
    sol = ols_solve_from_moments(mom, x_cols)
    aux = _bp_aux_moments(df, y_col, x_cols, sol["coef"])
    out = bp_stat_from_moments(mom, aux, x_cols)
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                out["n"],
                out["lm_stat"],
                out["dof"],
                out["chi2_crit_05"],
                out["significant"],
                out["r2_aux"],
            )
        ],
        "n_rows bigint, lm_stat double, dof int, chi2_crit_05 double,"
        " significant int, r2_aux double",
    )


N_IRLS_ITER = 8
"""Fixed IRLS/Newton iteration count for :func:`logistic_report` —
fixed, never convergence-tested, so the computation is a DETERMINISTIC
unrolled pipeline (the kmeans_refine precedent): every engine and
every run executes byte-identical passes."""


def _logistic_pass(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    beta: list[float],
    prepared: bool = False,
    need_loss: bool = True,
    need_domain: bool = True,
) -> dict:
    """One distributed IRLS pass: the gradient/Hessian sufficient
    statistics ``g_j = Σ (y−μ)x_j`` and ``h_ij = Σ w·x_i·x_j`` (x₀ = 1)
    at literal ``beta``, every term 12dp-decimal-quantized before the
    cross-row sum (order-independent), plus n and the clamped
    log-loss sum — ONE 1-row partial-aggregated scan.

    The per-row quantities (quantized features, μ) project ONCE below
    the aggregate — the first cut built them independently inside
    every aggregate expression and paid ~10 μ/decimal evaluations per
    row (measured 15 s/pass at sf0.1; this shape is ~10×).  Features
    quantize via plain ``round(x, 6)``: the double IS the nearest
    double to the 6dp decimal, identical to the decimal round-trip
    the OLS moment pass uses, at a fraction of the per-row cost.

    r14 optimization flags — the Newton step consumes ONLY g/h/n, so
    intermediate passes skip the per-row clamped-log-loss term
    (``need_loss=False``: two ``ln`` calls/row feeding a sum nobody
    reads until the final pass) and the label-domain min/max/violation
    sidecar (``need_domain=False``: checked on the first and final
    passes only — exactly where :func:`_logistic_fit` reads it).
    ``prepared=True`` marks a frame already projected to
    ``__y, __x1..`` with 6dp-rounded features (built once before the
    fit's checkpoint instead of re-rounded every pass).  All three
    default to the original full-pass behavior; the dropped sums are
    never consumed, so the β trajectory and every reported value are
    unchanged."""
    names = [f"__x{i + 1}" for i in range(len(x_cols))]
    if prepared:
        proj1 = df
    else:
        proj1 = df.select(
            F.col(y_col).cast("double").alias("__y"),
            *[
                F.round(F.col(c).cast("double"), 6).alias(nm)
                for c, nm in zip(x_cols, names)
            ],
        )
    eta = F.lit(float(beta[0]))
    for bj, nm in zip(beta[1:], names):
        eta = eta + F.lit(float(bj)) * F.col(nm)
    proj2 = proj1.select(
        "__y",
        *names,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))).alias("__mu"),
    )
    mu = F.col("__mu")
    w = mu * (F.lit(1.0) - mu)
    resid = F.col("__y") - mu
    xs = [F.lit(1.0)] + [F.col(nm) for nm in names]
    d38 = "decimal(38,12)"
    # the 12dp round + decimal cast live in a PROJECTION below the
    # aggregate: a double→decimal cast inside a HashAggregate input
    # expression knocks the whole operator off the codegen fast path
    # (measured ~0.4 s/term at 600k rows vs ~0.04 s/term projected)
    term_cols = []
    for j2, xj in enumerate(xs):
        term_cols.append(
            F.round(resid * xj, 12).cast(d38).alias(f"__tg_{j2}")
        )
        for i in range(j2, len(xs)):
            term_cols.append(
                F.round(w * xj * xs[i], 12).cast(d38).alias(
                    f"__th_{j2}_{i}"
                )
            )
    if need_loss:
        mc = F.greatest(F.least(mu, F.lit(1.0 - 1e-15)), F.lit(1e-15))
        yd = F.col("__y")
        ll = -(
            yd * F.log(mc) + (F.lit(1.0) - yd) * F.log(F.lit(1.0) - mc)
        )
        term_cols.append(F.round(ll, 12).cast(d38).alias("__tll"))
    proj3 = proj2.select("__y", *term_cols)
    aggs = [F.count(F.lit(1)).alias("n")]
    for j2 in range(len(xs)):
        aggs.append(F.sum(f"__tg_{j2}").alias(f"g_{j2}"))
        for i in range(j2, len(xs)):
            aggs.append(F.sum(f"__th_{j2}_{i}").alias(f"h_{j2}_{i}"))
    if need_loss:
        aggs.append(F.sum("__tll").alias("ll"))
    if need_domain:
        # label-domain sidecar (checked by _logistic_fit; the oracle's
        # pass omits these — logistic_step ignores extra keys). min/max
        # alone cannot see an INTERIOR non-binary value once 0 and 1
        # both occur, so the violation count is its own additive counter
        aggs.append(F.min(F.col("__y")).alias("ymin"))
        aggs.append(F.max(F.col("__y")).alias("ymax"))
        aggs.append(
            F.sum(
                F.when(
                    (F.col("__y") != F.lit(0.0))
                    & (F.col("__y") != F.lit(1.0)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("ybad")
        )
    return proj3.agg(*aggs).collect()[0].asDict()


def logistic_step(mom: dict, beta: list[float], p: int) -> list[float]:
    """One Newton update ``β' = β + H⁻¹g`` over a pass's exact-decimal
    sums — shared by the Spark loop and the oracle builder, so both
    sides walk the identical float trajectory.  Raises on a singular
    Hessian (separated/collinear design)."""
    import numpy as np

    h = np.zeros((p + 1, p + 1))
    g = np.zeros(p + 1)
    for j2 in range(p + 1):
        g[j2] = float(mom[f"g_{j2}"])
        for i in range(j2, p + 1):
            h[j2, i] = h[i, j2] = float(mom[f"h_{j2}_{i}"])
    cond = float(np.linalg.cond(h))
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError(
            "logistic: singular Hessian (collinear features or "
            f"complete separation; cond={cond:.3g})"
        )
    step = np.linalg.solve(h, g)
    return [float(b + s) for b, s in zip(beta, step)]


def logistic_finalize(
    mom: dict,
    beta: list[float],
    x_cols: list[str],
    n_iter: int = N_IRLS_ITER,
) -> dict:
    """Final readout from the LAST pass (run at the final β): standard
    errors from the observed-information inverse, Wald z, mean
    log-loss, McFadden pseudo-R² against the null (intercept-only
    closed form ``p̄`` from g₀'s identity Σy = Σμ + g₀).  ``n_iter``
    is the ACTUAL iteration count the caller ran (round-13 ADVICE:
    the report must echo the real pass count, not the module
    default)."""
    import numpy as np

    p = len(x_cols)
    h = np.zeros((p + 1, p + 1))
    for j2 in range(p + 1):
        for i in range(j2, p + 1):
            h[j2, i] = h[i, j2] = float(mom[f"h_{j2}_{i}"])
    try:
        inv = np.linalg.inv(h)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            "logistic: singular Hessian at the final iterate — "
            f"separated or collinear design: {exc}"
        ) from exc
    se = [float(np.sqrt(max(0.0, inv[j, j]))) for j in range(p + 1)]
    n = int(mom["n"])
    ll = float(mom["ll"])
    return {
        "terms": ["_intercept", *x_cols],
        "coef": [round(float(b), 6) for b in beta],
        "std_err": [round(s, 6) for s in se],
        "z_stat": [
            round(float(b) / s, 6) if s > 0 else None
            for b, s in zip(beta, se)
        ],
        "n": n,
        "log_loss": round(ll / n, 6),
        "n_iter": n_iter,
    }


def _check_label_domain(mom: dict) -> None:
    """The 0/1 label contract, enforced from a pass's min/max sidecar
    (round-13 ADVICE: the old guard accepted any y in [0, 1] — e.g.
    0.5 — and was skipped entirely at ``n_iter=0``; it now requires
    both extremes to be EXACTLY 0 or 1 and runs on the final pass
    too, which always executes)."""
    ymin, ymax = mom.get("ymin"), mom.get("ymax")
    bad = mom.get("ybad")
    if (
        ymin is None
        or ymin not in (0.0, 1.0)
        or ymax not in (0.0, 1.0)
        or (bad is not None and int(bad) > 0)
    ):
        raise ValueError(
            f"logistic: label must be 0/1, got range [{ymin}, {ymax}]"
            + (f" with {bad} non-binary value(s)" if bad else "")
        )


def _glm_prepared_base(
    df: DataFrame, y_col: str, x_cols: list[str]
) -> tuple[DataFrame, list[str]]:
    """The shared GLM fit prologue (r14 optimization): complete-case
    filter, then project to ``(__y, __x1..__xp)`` with the features
    6dp-rounded ONCE — before the repartition and the lazy pin — so
    the ``n_iter + 1`` passes rescan p+1 narrow doubles instead of the
    caller's full row width and never re-quantize (guide §2.3: project
    before the exchange; the rounding is idempotent and identical to
    the per-pass form, so every sum is unchanged).

    A small parquet input arrives as ONE partition and would run all
    passes single-core (measured 5.5 s/pass at sf0.1) — spread across
    the executors once, before the pin; sums are order-independent
    decimals, so the shuffle changes nothing."""
    names = [f"__x{i + 1}" for i in range(len(x_cols))]
    cond = _finite(y_col)
    for c in x_cols:
        cond = cond & _finite(c)
    base = df.filter(cond).select(
        F.col(y_col).cast("double").alias("__y"),
        *[
            F.round(F.col(c).cast("double"), 6).alias(nm)
            for c, nm in zip(x_cols, names)
        ],
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)
    return base.localCheckpoint(eager=False), names


def _logistic_fit(
    df: DataFrame, y_col: str, x_cols: list[str], n_iter: int
) -> dict:
    if not x_cols:
        raise ValueError("logistic: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"logistic: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES}"
        )
    base, names = _glm_prepared_base(df, y_col, x_cols)
    p = len(x_cols)
    beta = [0.0] * (p + 1)
    for it in range(n_iter):
        # intermediate passes: Newton reads only g/h/n — the log-loss
        # term and (past pass 0) the domain sidecar are dead weight
        last = _logistic_pass(
            base, "__y", names, beta,
            prepared=True, need_loss=False, need_domain=(it == 0),
        )
        if it == 0:
            _check_label_domain(last)  # fail fast on the first pass
        beta = logistic_step(last, beta, p)
    final = _logistic_pass(base, "__y", names, beta, prepared=True)
    # the final pass always runs, so n_iter=0 still validates
    _check_label_domain(final)
    return logistic_finalize(final, beta, x_cols, n_iter=n_iter)


def _poisson_pass(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    beta: list[float],
    prepared: bool = False,
    need_loss: bool = True,
    need_domain: bool = True,
) -> dict:
    """One distributed Poisson-IRLS pass at literal ``beta``: with
    ``μ = exp(η)``, the score ``g_j = Σ (y−μ)x_j`` and information
    ``h_ij = Σ μ·x_i·x_j`` (x₀ = 1), every term 12dp-decimal-quantized
    in a projection below the aggregate (the measured logistic-pass
    codegen discipline), plus n, the deviance sum, and the
    label-domain sidecar (min y and the non-finite-μ count) — ONE
    1-row partial-aggregated scan.  η clamps at ±50 before exp (μ
    spans 2e-22..5e21 — finite, and the clamp is replayed verbatim by
    the oracle so both engines walk one trajectory).

    r14 optimization flags (the :func:`_logistic_pass` discipline):
    ``need_loss=False`` drops the deviance term (read only by the
    final pass's finalize), ``need_domain=False`` drops the ymin
    sidecar (checked first/final pass only), ``prepared=True`` marks
    the pre-projected 6dp frame — dropped sums are never consumed, so
    the trajectory is unchanged."""
    names = [f"__x{i + 1}" for i in range(len(x_cols))]
    if prepared:
        proj1 = df
    else:
        proj1 = df.select(
            F.col(y_col).cast("double").alias("__y"),
            *[
                F.round(F.col(c).cast("double"), 6).alias(nm)
                for c, nm in zip(x_cols, names)
            ],
        )
    eta = F.lit(float(beta[0]))
    for bj, nm in zip(beta[1:], names):
        eta = eta + F.lit(float(bj)) * F.col(nm)
    eta = F.greatest(F.least(eta, F.lit(50.0)), F.lit(-50.0))
    proj2 = proj1.select("__y", *names, F.exp(eta).alias("__mu"))
    mu = F.col("__mu")
    resid = F.col("__y") - mu
    xs = [F.lit(1.0)] + [F.col(nm) for nm in names]
    d38 = "decimal(38,12)"
    term_cols = []
    for j2, xj in enumerate(xs):
        term_cols.append(
            F.round(resid * xj, 12).cast(d38).alias(f"__tg_{j2}")
        )
        for i in range(j2, len(xs)):
            term_cols.append(
                F.round(mu * xj * xs[i], 12).cast(d38).alias(
                    f"__th_{j2}_{i}"
                )
            )
    if need_loss:
        # unit deviance: 2[y·ln(y/μ) − (y − μ)], with the y=0 limit 2μ
        yd = F.col("__y")
        dev = F.lit(2.0) * (
            F.when(yd > 0, yd * F.log(yd / mu)).otherwise(F.lit(0.0))
            - (yd - mu)
        )
        term_cols.append(F.round(dev, 12).cast(d38).alias("__tdev"))
    proj3 = proj2.select("__y", *term_cols)
    aggs = [F.count(F.lit(1)).alias("n")]
    for j2 in range(len(xs)):
        aggs.append(F.sum(f"__tg_{j2}").alias(f"g_{j2}"))
        for i in range(j2, len(xs)):
            aggs.append(F.sum(f"__th_{j2}_{i}").alias(f"h_{j2}_{i}"))
    if need_loss:
        aggs.append(F.sum("__tdev").alias("dev"))
    if need_domain:
        aggs.append(F.min(F.col("__y")).alias("ymin"))
    return proj3.agg(*aggs).collect()[0].asDict()


def poisson_warm_start(mom: dict, p: int) -> list[float]:
    """The deterministic pass-0 update: a mean-matched intercept
    ``β = [ln(ȳ), 0, …]`` instead of a raw Newton step.  Newton from
    β = 0 on a Poisson overshoots by ``ȳ − 1`` and then walks back
    only ~1 per iteration (measured: quantity's ȳ ≈ 25.5 left the
    8-pass fit stuck at e¹⁷·⁵ with a 7×10⁷ mean deviance and pushed
    the 12dp term sums past the 15-significant-digit cross-engine
    budget); the mean-matched start is the statsmodels-style init and
    converges in a few quadratic steps.  ``ȳ`` comes EXACTLY from the
    β = 0 pass's own sums (``g₀ = Σ(y−1)`` at μ = 1, so
    ``Σy = g₀ + n``) — one shared implementation for the operator and
    the oracle builder, no extra distributed pass."""
    import math

    n = int(mom["n"])
    ybar = float(mom["g_0"] + n) / n if n else 0.0
    if ybar <= 0:
        raise ValueError(
            "poisson: mean label is 0 — the intercept is -inf "
            "(all-zero counts); nothing to fit"
        )
    return [math.log(ybar)] + [0.0] * p


def poisson_finalize(
    mom: dict,
    beta: list[float],
    x_cols: list[str],
    n_iter: int,
) -> dict:
    """Final Poisson readout from the last pass: standard errors from
    the information inverse, Wald z, mean deviance.  Shared by the
    operator and the oracle builder."""
    import numpy as np

    p = len(x_cols)
    h = np.zeros((p + 1, p + 1))
    for j2 in range(p + 1):
        for i in range(j2, p + 1):
            h[j2, i] = h[i, j2] = float(mom[f"h_{j2}_{i}"])
    try:
        inv = np.linalg.inv(h)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            "poisson: singular information matrix at the final "
            f"iterate: {exc}"
        ) from exc
    se = [float(np.sqrt(max(0.0, inv[j, j]))) for j in range(p + 1)]
    n = int(mom["n"])
    return {
        "terms": ["_intercept", *x_cols],
        "coef": [round(float(b), 6) for b in beta],
        "std_err": [round(s, 6) for s in se],
        "z_stat": [
            round(float(b) / s, 6) if s > 0 else None
            for b, s in zip(beta, se)
        ],
        "n": n,
        "mean_deviance": round(float(mom["dev"]) / n, 6),
        "n_iter": n_iter,
    }


def _poisson_fit(
    df: DataFrame, y_col: str, x_cols: list[str], n_iter: int
) -> dict:
    if not x_cols:
        raise ValueError("poisson: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"poisson: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES}"
        )
    base, names = _glm_prepared_base(df, y_col, x_cols)
    p = len(x_cols)
    beta = [0.0] * (p + 1)
    for it in range(n_iter):
        last = _poisson_pass(
            base, "__y", names, beta,
            prepared=True, need_loss=False, need_domain=(it == 0),
        )
        if it == 0 and (last["ymin"] is None or last["ymin"] < 0.0):
            raise ValueError(
                "poisson: label must be a non-negative count/rate, "
                f"got min {last['ymin']}"
            )
        if it == 0:
            # mean-matched warm start (see poisson_warm_start) — the
            # raw Newton step from beta=0 overshoots by ybar−1
            beta = poisson_warm_start(last, p)
        else:
            beta = logistic_step(last, beta, p)  # same Newton shape
    final = _poisson_pass(base, "__y", names, beta, prepared=True)
    if final["ymin"] is None or final["ymin"] < 0.0:
        raise ValueError(
            "poisson: label must be a non-negative count/rate, "
            f"got min {final['ymin']}"
        )
    return poisson_finalize(final, beta, x_cols, n_iter)


def poisson_report(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    n_iter: int = N_IRLS_ITER,
) -> DataFrame:
    """Poisson regression via UNROLLED IRLS/Newton — the count-model
    member of the GLM family (statsmodels ``Poisson`` / sklearn
    ``PoissonRegressor(alpha=0)`` parity at convergence): how do the
    drivers move an event COUNT (orders per customer, defects per
    batch, tokens per document).  ``y_col`` must be non-negative
    (reals allowed — the quasi-Poisson reading).

    Scale shape: ``n_iter + 1`` distributed passes, each ONE 1-row
    partial-aggregated scan of score/information sums at the current β
    literals — identical discipline, exchanges, and determinism
    argument as :func:`logistic_report` (shared ``logistic_step``
    Newton update; the oracle builder replays the pass SQL through the
    same shared step/finalize, one float trajectory).  Returns one row
    per term ``(term, coef, std_err, z_stat)``."""
    sol = _poisson_fit(df, y_col, x_cols, n_iter)
    spark = df.sparkSession
    return spark.createDataFrame(
        list(zip(sol["terms"], sol["coef"], sol["std_err"], sol["z_stat"])),
        "term string, coef double, std_err double, z_stat double",
    )


def poisson_fit_report(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    n_iter: int = N_IRLS_ITER,
) -> DataFrame:
    """Model-level Poisson diagnostics: one row ``(n_rows, n_iter,
    mean_deviance)`` at the final iterate (mean unit deviance — the
    Poisson analogue of the logistic log-loss; >> 1 per dof signals
    overdispersion, reach for the jackknife/ratio machinery)."""
    sol = _poisson_fit(df, y_col, x_cols, n_iter)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(sol["n"], sol["n_iter"], sol["mean_deviance"])],
        "n_rows bigint, n_iter int, mean_deviance double",
    )


def logistic_report(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    n_iter: int = N_IRLS_ITER,
) -> DataFrame:
    """Logistic regression via UNROLLED IRLS/Newton — the classifier
    companion of :func:`ols_report` (SURVEY §2.9; sklearn
    ``LogisticRegression(penalty=None)`` / statsmodels ``Logit``
    parity at convergence).  ``y_col`` must be 0/1.

    Scale shape: ``n_iter + 1`` distributed passes, each a ONE-row
    partial-aggregated scan computing the gradient/Hessian sufficient
    statistics at the current β literals (the kmeans unrolled-Lloyd
    precedent — no driver-side data, only (p+1)² sums cross the
    boundary per pass); the Newton solve is driver arithmetic on the
    bounded sidecar.  Determinism: features 6dp-quantized, every
    per-row term 12dp-decimal-quantized before its cross-row sum, β
    literals carried at full double precision between passes, fixed
    iteration count — the oracle builder replays the identical pass
    SQL + the SAME shared step/finalize helpers, so both engines walk
    one float trajectory.  Returns one row per term ``(term, coef,
    std_err, z_stat)``."""
    sol = _logistic_fit(df, y_col, x_cols, n_iter)
    spark = df.sparkSession
    return spark.createDataFrame(
        list(zip(sol["terms"], sol["coef"], sol["std_err"], sol["z_stat"])),
        "term string, coef double, std_err double, z_stat double",
    )


MAX_LOGIT_GROUPS = 64
"""Group-count guard for :func:`logistic_by_group`: each group adds
p+1 β literals to the per-row CASE chain — the codegen-width lesson
from the heavy-tie probes says keep literal chains bounded."""


def _logistic_group_pass(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    betas: dict[str, list[float]],
    prepared: bool = False,
    need_loss: bool = True,
    need_domain: bool = True,
) -> dict[str, dict]:
    """One grouped IRLS pass: the :func:`_logistic_pass` sufficient
    statistics aggregated PER GROUP in one group-grain exchange, with
    each row's μ built from ITS group's β literals via a when-chain
    (k·(p+1) literals, bounded by :data:`MAX_LOGIT_GROUPS`).  Returns
    ``{grp: moment dict}``.  ``prepared``/``need_loss``/``need_domain``
    follow the :func:`_logistic_pass` r14 discipline — dropped sums
    are never consumed by the intermediate Newton steps, so every
    group's trajectory is unchanged."""
    names = [f"__x{i + 1}" for i in range(len(x_cols))]
    if prepared:
        proj1 = df
    else:
        proj1 = df.select(
            "__grp",
            F.col(y_col).cast("double").alias("__y"),
            *[
                F.round(F.col(c).cast("double"), 6).alias(nm)
                for c, nm in zip(x_cols, names)
            ],
        )
    eta = None
    for grp in sorted(betas):
        beta = betas[grp]
        ge = F.lit(float(beta[0]))
        for bj, nm in zip(beta[1:], names):
            ge = ge + F.lit(float(bj)) * F.col(nm)
        eta = (
            F.when(F.col("__grp") == grp, ge)
            if eta is None
            else eta.when(F.col("__grp") == grp, ge)
        )
    proj2 = proj1.select(
        "__grp",
        "__y",
        *names,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))).alias("__mu"),
    )
    mu = F.col("__mu")
    w = mu * (F.lit(1.0) - mu)
    resid = F.col("__y") - mu
    xs = [F.lit(1.0)] + [F.col(nm) for nm in names]
    d38 = "decimal(38,12)"
    term_cols = []
    for j2, xj in enumerate(xs):
        term_cols.append(
            F.round(resid * xj, 12).cast(d38).alias(f"__tg_{j2}")
        )
        for i in range(j2, len(xs)):
            term_cols.append(
                F.round(w * xj * xs[i], 12).cast(d38).alias(
                    f"__th_{j2}_{i}"
                )
            )
    if need_loss:
        mc = F.greatest(F.least(mu, F.lit(1.0 - 1e-15)), F.lit(1e-15))
        yd = F.col("__y")
        ll = -(
            yd * F.log(mc) + (F.lit(1.0) - yd) * F.log(F.lit(1.0) - mc)
        )
        term_cols.append(F.round(ll, 12).cast(d38).alias("__tll"))
    proj3 = proj2.select("__grp", "__y", *term_cols)
    aggs = [F.count(F.lit(1)).alias("n")]
    for j2 in range(len(xs)):
        aggs.append(F.sum(f"__tg_{j2}").alias(f"g_{j2}"))
        for i in range(j2, len(xs)):
            aggs.append(F.sum(f"__th_{j2}_{i}").alias(f"h_{j2}_{i}"))
    if need_loss:
        aggs.append(F.sum("__tll").alias("ll"))
    if need_domain:
        aggs.append(F.min(F.col("__y")).alias("ymin"))
        aggs.append(F.max(F.col("__y")).alias("ymax"))
        aggs.append(
            F.sum(
                F.when(
                    (F.col("__y") != F.lit(0.0))
                    & (F.col("__y") != F.lit(1.0)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("ybad")
        )
    rows = proj3.groupBy("__grp").agg(*aggs).collect()
    return {r["__grp"]: r.asDict() for r in rows}


def logistic_by_group(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    group_col: str,
    n_iter: int = N_IRLS_ITER,
    max_groups: int = MAX_LOGIT_GROUPS,
) -> DataFrame:
    """Per-segment logistic regression — an independent IRLS fit PER
    GROUP (does the churn~drivers model differ by ship mode / source
    / cohort), the classifier sibling of :func:`ols_by_group`.

    Scale shape: ``n_iter + 1`` passes, each ONE group-grain
    partial-aggregated exchange (k bounded moment rows per pass, never
    data); every row's μ comes from its own group's β literals via a
    when-chain (k·(p+1) literals, ``max_groups``-guarded — the
    codegen-width discipline).  The Newton updates run per group on
    the driver through the SAME shared :func:`logistic_step` /
    :func:`logistic_finalize`; the DuckDB oracle replays the grouped
    pass SQL through them, so every group's float trajectory is
    engine-identical.  A group whose Hessian degenerates mid-
    trajectory (separation, collinearity, too few rows) has its β
    FROZEN for the remaining passes and is OMITTED from the output
    (the :func:`ols_by_group` skip discipline — one bad segment must
    not kill the rest); label-domain violations anywhere raise.
    Returns one row per surviving ``(grp, term)``: ``(grp, term,
    coef, std_err, z_stat)``."""
    if not x_cols:
        raise ValueError("logistic_by_group: need at least one feature")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"logistic_by_group: {len(x_cols)} features exceeds "
            f"MAX_FEATURES={MAX_FEATURES}"
        )
    cond = _finite(y_col) & F.col(group_col).isNotNull()
    for c in x_cols:
        cond = cond & _finite(c)
    gnames = [f"__x{i + 1}" for i in range(len(x_cols))]
    # project AND 6dp-round once, before the repartition/pin (the
    # _glm_prepared_base discipline) — every pass rescans p+2 narrow
    # columns and never re-quantizes; rounding here is idempotent
    # with the per-pass form, so every group's sums are unchanged
    base = df.filter(cond).select(
        F.col(group_col).cast("string").alias("__grp"),
        F.col(y_col).cast("double").alias("__y"),
        *[
            F.round(F.col(c).cast("double"), 6).alias(nm)
            for c, nm in zip(x_cols, gnames)
        ],
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)
    base = base.localCheckpoint(eager=False)
    # bounded key probe: limit(max_groups + 1) BEFORE collect so a
    # high-cardinality segment column raises cleanly instead of
    # materializing every distinct value on the driver (the
    # datastore._bounded_key_collect / ivf_topk_indexed discipline;
    # ols_by_group guards the same bound lazily in-plan)
    probe = (
        base.select("__grp").distinct().limit(max_groups + 1).collect()
    )
    if len(probe) > max_groups:
        raise ValueError(
            f"logistic_by_group: more than max_groups={max_groups} "
            "distinct groups — each group widens the per-row literal "
            "chain; coarsen the segmentation"
        )
    groups = sorted(r["__grp"] for r in probe)
    if not groups:
        return df.sparkSession.createDataFrame(
            [],
            "grp string, term string, coef double, std_err double,"
            " z_stat double",
        )
    p = len(x_cols)
    betas = {g: [0.0] * (p + 1) for g in groups}
    dead: set[str] = set()
    for it in range(n_iter):
        moms = _logistic_group_pass(
            base, "__y", gnames, betas,
            prepared=True, need_loss=False, need_domain=(it == 0),
        )
        if it == 0:
            for g in groups:
                _check_label_domain(moms[g])
        for g in groups:
            if g in dead:
                continue
            try:
                betas[g] = logistic_step(moms[g], betas[g], p)
            except ValueError:
                dead.add(g)  # β frozen; omitted from output
    final = _logistic_group_pass(base, "__y", gnames, betas, prepared=True)
    for g in groups:
        _check_label_domain(final[g])
    out = []
    for g in groups:
        if g in dead:
            continue
        try:
            sol = logistic_finalize(final[g], betas[g], x_cols, n_iter)
        except ValueError:
            continue  # singular at the final iterate: same skip
        for t, c, s, z in zip(
            sol["terms"], sol["coef"], sol["std_err"], sol["z_stat"]
        ):
            out.append((g, t, c, s, z))
    return df.sparkSession.createDataFrame(
        out,
        "grp string, term string, coef double, std_err double,"
        " z_stat double",
    )


def logistic_fit_report(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    n_iter: int = N_IRLS_ITER,
) -> DataFrame:
    """Model-level logistic diagnostics: one row ``(n_rows, n_iter,
    log_loss)`` — the mean clamped negative log-likelihood at the
    final iterate (clamp 1e-15, documented; same moments pass as
    :func:`logistic_report`)."""
    sol = _logistic_fit(df, y_col, x_cols, n_iter)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(sol["n"], sol["n_iter"], sol["log_loss"])],
        "n_rows bigint, n_iter int, log_loss double",
    )


# -- negative binomial (NB2, fixed dispersion) -------------------------


def _negbin_pass(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    beta: list[float],
    alpha: float,
    prepared: bool = False,
    need_loss: bool = True,
    need_domain: bool = True,
) -> dict:
    """One distributed NB2 Fisher-scoring pass at literal ``beta``:
    with ``μ = exp(η)`` and the NB2 variance ``μ(1 + αμ)``, the score
    is ``g_j = Σ (y−μ)/(1+αμ)·x_j`` and the expected information
    ``h_ij = Σ μ/(1+αμ)·x_i·x_j`` (x₀ = 1) — exactly the Poisson pass
    with the in-row shrink weight ``w = 1/(1+αμ)`` (α a literal), so
    the moment keys feed the SAME shared ``logistic_step`` /
    ``poisson_finalize``.  Every term 12dp-decimal-quantized in a
    projection below the aggregate; η clamps at ±50 before exp,
    replayed verbatim by the oracle.  Sidecars: n, ymin, the NB2
    deviance sum, and the exact decimal ``Σ round(y,6)`` the
    mean-matched warm start reads (the Poisson ``g₀+n`` trick doesn't
    survive the weight).

    r14 optimization flags (the :func:`_logistic_pass` discipline):
    ``need_loss=False`` drops the deviance term (final-pass-only),
    ``need_domain=False`` drops the ymin + Σy sidecars (first/final
    pass only), ``prepared=True`` marks the pre-projected 6dp frame —
    dropped sums are never consumed, trajectory unchanged."""
    names = [f"__x{i + 1}" for i in range(len(x_cols))]
    if prepared:
        proj1 = df
    else:
        proj1 = df.select(
            F.col(y_col).cast("double").alias("__y"),
            *[
                F.round(F.col(c).cast("double"), 6).alias(nm)
                for c, nm in zip(x_cols, names)
            ],
        )
    eta = F.lit(float(beta[0]))
    for bj, nm in zip(beta[1:], names):
        eta = eta + F.lit(float(bj)) * F.col(nm)
    eta = F.greatest(F.least(eta, F.lit(50.0)), F.lit(-50.0))
    proj2 = proj1.select("__y", *names, F.exp(eta).alias("__mu"))
    mu = F.col("__mu")
    a = F.lit(float(alpha))
    w = F.lit(1.0) / (F.lit(1.0) + a * mu)
    resid = (F.col("__y") - mu) * w
    xs = [F.lit(1.0)] + [F.col(nm) for nm in names]
    d38 = "decimal(38,12)"
    term_cols = []
    for j2, xj in enumerate(xs):
        term_cols.append(
            F.round(resid * xj, 12).cast(d38).alias(f"__tg_{j2}")
        )
        for i in range(j2, len(xs)):
            term_cols.append(
                F.round(mu * w * xj * xs[i], 12).cast(d38).alias(
                    f"__th_{j2}_{i}"
                )
            )
    yd = F.col("__y")
    if need_loss:
        # NB2 unit deviance: 2[y·ln(y/μ) − (y + 1/α)·ln((1+αy)/(1+αμ))],
        # with the y=0 limit 2·(1/α)·ln(1+αμ)
        inv_a = F.lit(1.0 / float(alpha))
        dev = F.lit(2.0) * (
            F.when(yd > 0, yd * F.log(yd / mu)).otherwise(F.lit(0.0))
            - (yd + inv_a)
            * F.log((F.lit(1.0) + a * yd) / (F.lit(1.0) + a * mu))
        )
        term_cols.append(F.round(dev, 12).cast(d38).alias("__tdev"))
    if need_domain:
        term_cols.append(
            F.round(yd, 6).cast("decimal(18,6)").alias("__ty")
        )
    proj3 = proj2.select("__y", *term_cols)
    aggs = [F.count(F.lit(1)).alias("n")]
    for j2 in range(len(xs)):
        aggs.append(F.sum(f"__tg_{j2}").alias(f"g_{j2}"))
        for i in range(j2, len(xs)):
            aggs.append(F.sum(f"__th_{j2}_{i}").alias(f"h_{j2}_{i}"))
    if need_loss:
        aggs.append(F.sum("__tdev").alias("dev"))
    if need_domain:
        aggs.append(F.sum("__ty").alias("sy"))
        aggs.append(F.min(F.col("__y")).alias("ymin"))
    return proj3.agg(*aggs).collect()[0].asDict()


def negbin_warm_start(mom: dict, p: int) -> list[float]:
    """The deterministic pass-0 update for NB2: the mean-matched
    intercept ``β = [ln(ȳ), 0, …]`` (the Poisson precedent —
    :func:`poisson_warm_start` — with ``ȳ`` read from the pass's own
    exact decimal ``sy`` sidecar, since the weighted ``g₀`` no longer
    encodes Σy).  Shared by the operator and the oracle builder."""
    import math

    n = int(mom["n"])
    ybar = float(mom["sy"]) / n if n else 0.0
    if ybar <= 0:
        raise ValueError(
            "negbin: mean label is 0 — the intercept is -inf "
            "(all-zero counts); nothing to fit"
        )
    return [math.log(ybar)] + [0.0] * p


def _negbin_fit(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    alpha: float,
    n_iter: int,
) -> dict:
    import math

    if not x_cols:
        raise ValueError("negbin: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"negbin: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES}"
        )
    if not (alpha > 0 and math.isfinite(alpha)):
        raise ValueError(
            f"negbin: dispersion alpha must be finite and > 0, got "
            f"{alpha} (alpha -> 0 is the Poisson limit — use "
            "poisson_report)"
        )
    base, names = _glm_prepared_base(df, y_col, x_cols)
    p = len(x_cols)
    beta = [0.0] * (p + 1)
    for it in range(n_iter):
        last = _negbin_pass(
            base, "__y", names, beta, alpha,
            prepared=True, need_loss=False, need_domain=(it == 0),
        )
        if it == 0 and (last["ymin"] is None or last["ymin"] < 0.0):
            raise ValueError(
                "negbin: label must be a non-negative count, "
                f"got min {last['ymin']}"
            )
        if it == 0:
            beta = negbin_warm_start(last, p)
        else:
            beta = logistic_step(last, beta, p)  # same Newton shape
    final = _negbin_pass(base, "__y", names, beta, alpha, prepared=True)
    if final["ymin"] is None or final["ymin"] < 0.0:
        raise ValueError(
            "negbin: label must be a non-negative count, "
            f"got min {final['ymin']}"
        )
    return poisson_finalize(final, beta, x_cols, n_iter)


def negbin_report(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    alpha: float = 1.0,
    n_iter: int = N_IRLS_ITER,
) -> DataFrame:
    """Negative-binomial (NB2) regression with FIXED dispersion α via
    unrolled Fisher scoring — the overdispersion follow-up the Poisson
    entry's own ``mean_deviance`` gate points at (statsmodels
    ``NegativeBinomial(loglike_method='nb2')`` at known α / sklearn-
    style GLM with variance ``μ(1+αμ)`` parity at convergence): when
    count variance grows like μ² (bursty purchases, heavy-tailed token
    counts), Poisson SEs are spuriously tight; NB2 widens them by the
    shrink weight ``1/(1+αμ)``.

    Scale shape: ``n_iter + 1`` distributed passes, each ONE 1-row
    partial-aggregated scan of score/information sums at the current β
    literals — identical discipline, exchanges, and determinism
    argument as :func:`poisson_report` (mean-matched warm start from
    the pass's exact ``Σy`` sidecar, shared ``logistic_step`` Newton
    update, shared ``poisson_finalize``; the oracle replays the pass
    SQL with the same α literal through the same shared helpers, one
    float trajectory).  Returns one row per term ``(term, coef,
    std_err, z_stat)``."""
    sol = _negbin_fit(df, y_col, x_cols, alpha, n_iter)
    spark = df.sparkSession
    return spark.createDataFrame(
        list(zip(sol["terms"], sol["coef"], sol["std_err"], sol["z_stat"])),
        "term string, coef double, std_err double, z_stat double",
    )


# -- Huber robust regression -------------------------------------------


def _huber_pass(
    base: DataFrame,
    p: int,
    beta: list[float],
    a: float,
    scale: float,
    c: float,
    sidecars: bool = False,
) -> dict:
    """One distributed Huber-IRLS pass at literal ``beta`` over the
    prepared 6dp frame (``__y``, ``__x1..__xp``): residual ``e = y−η``
    in a projection, in-row weight ``w = min(1, a/|e|)`` with ``a =
    c·scale`` a driver-computed literal (the branch compares ``|e| ≤
    a`` — ONE form shared with ψ so boundary ulps can't disagree), and
    the weighted normal-equation moments ``Σw, Σw·x, Σw·x·y, Σw·x·xᵀ,
    Σw·y`` each 12dp-decimal-quantized below the aggregate (the WLS
    kernel discipline) — ONE 1-row partial-aggregated scan.
    ``sidecars=True`` (the final pass) adds the SE inputs: ``Σψ(u)²``
    at ``u = e/scale``, the in-threshold count ``Σ1{|e|≤a}``, and the
    UNWEIGHTED design moments for the asymptotic covariance."""
    names = [f"__x{i + 1}" for i in range(p)]
    eta = F.lit(float(beta[0]))
    for bj, nm in zip(beta[1:], names):
        eta = eta + F.lit(float(bj)) * F.col(nm)
    e = F.col("__y") - eta
    proj1 = base.select("__y", *names, e.alias("__e"))
    absd = F.abs(F.col("__e"))
    al = F.lit(float(a))
    w = F.when(absd <= al, F.lit(1.0)).otherwise(al / absd)
    xs = [F.lit(1.0)] + [F.col(nm) for nm in names]
    d38 = "decimal(38,12)"
    term_cols = [F.round(w, 12).cast(d38).alias("__tw")]
    for i in range(p):
        term_cols.append(
            F.round(w * xs[i + 1], 12).cast(d38).alias(f"__ts_{i}")
        )
        term_cols.append(
            F.round(w * xs[i + 1] * F.col("__y"), 12)
            .cast(d38)
            .alias(f"__tq_{i}")
        )
        for j2 in range(i, p):
            term_cols.append(
                F.round(w * xs[i + 1] * xs[j2 + 1], 12)
                .cast(d38)
                .alias(f"__tp_{i}_{j2}")
            )
    term_cols.append(
        F.round(w * F.col("__y"), 12).cast(d38).alias("__tsy")
    )
    if sidecars:
        u = F.col("__e") / F.lit(float(scale))
        psi = F.when(absd <= al, u).otherwise(
            F.signum(F.col("__e")) * F.lit(float(c))
        )
        term_cols.append(
            F.round(psi * psi, 12).cast(d38).alias("__tpsi2")
        )
        term_cols.append((absd <= al).cast("bigint").alias("__tin"))
        for i in range(p):
            term_cols.append(
                xs[i + 1].cast("decimal(18,6)").alias(f"__tus_{i}")
            )
            for j2 in range(i, p):
                term_cols.append(
                    F.round(xs[i + 1] * xs[j2 + 1], 12)
                    .cast(d38)
                    .alias(f"__tup_{i}_{j2}")
                )
    proj2 = proj1.select(*term_cols)
    aggs = [F.count(F.lit(1)).alias("n"), F.sum("__tw").alias("sw")]
    for i in range(p):
        aggs.append(F.sum(f"__ts_{i}").alias(f"s_{i}"))
        aggs.append(F.sum(f"__tq_{i}").alias(f"q_{i}"))
        for j2 in range(i, p):
            aggs.append(F.sum(f"__tp_{i}_{j2}").alias(f"p_{i}_{j2}"))
    aggs.append(F.sum("__tsy").alias("sy"))
    if sidecars:
        aggs.append(F.sum("__tpsi2").alias("spsi2"))
        aggs.append(F.sum("__tin").alias("npsi"))
        for i in range(p):
            aggs.append(F.sum(f"__tus_{i}").alias(f"us_{i}"))
            for j2 in range(i, p):
                aggs.append(
                    F.sum(f"__tup_{i}_{j2}").alias(f"up_{i}_{j2}")
                )
    return proj2.agg(*aggs).collect()[0].asDict()


def huber_step_from_moments(mom: dict, p: int) -> list[float]:
    """The Huber-IRLS β update: solve the weighted normal equations
    ``(XᵀWX)β = XᵀWy`` from the pass's exact decimal moments — ONE
    shared implementation for the operator and the DuckDB oracle
    builder, so both engines walk one float trajectory."""
    import numpy as np

    A = np.zeros((p + 1, p + 1))
    b = np.zeros(p + 1)
    A[0, 0] = float(mom["sw"])
    b[0] = float(mom["sy"])
    for i in range(p):
        s = float(mom[f"s_{i}"])
        A[0, i + 1] = A[i + 1, 0] = s
        b[i + 1] = float(mom[f"q_{i}"])
        for j2 in range(i, p):
            v = float(mom[f"p_{i}_{j2}"])
            A[i + 1, j2 + 1] = A[j2 + 1, i + 1] = v
    cond = float(np.linalg.cond(A))
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError(
            "huber: singular or ill-conditioned weighted design "
            f"(cond={cond:.3g}) — drop a redundant column"
        )
    return [float(v) for v in np.linalg.solve(A, b)]


def huber_finalize(
    mom: dict,
    beta: list[float],
    x_cols: list[str],
    scale: float,
    n_iter: int,
) -> dict:
    """Final Huber readout from the last (sidecar) pass: the standard
    Huber (1973) asymptotic covariance ``[s²·Σψ(u)²/(n−p−1)] /
    [Σψ'(u)/n]² · (XᵀX)⁻¹`` with ψ the clipped residual at ``u = e/s``
    and ψ' = 1 inside the threshold (statsmodels RLM's H1 shape
    without the small-sample K correction — documented, since no
    statsmodels build exists in this container to pin against).
    Shared by the operator and the oracle builder."""
    import numpy as np

    p = len(x_cols)
    n = int(mom["n"])
    npsi = int(mom["npsi"] or 0)
    df_resid = n - p - 1
    if df_resid <= 0:
        raise ValueError(f"huber: n={n} rows cannot fit {p + 1} parameters")
    if npsi == 0:
        raise ValueError(
            "huber: every residual beyond the threshold — scale/c too "
            "small for this frame"
        )
    xtx = np.zeros((p + 1, p + 1))
    xtx[0, 0] = float(n)
    for i in range(p):
        s = float(mom[f"us_{i}"])
        xtx[0, i + 1] = xtx[i + 1, 0] = s
        for j2 in range(i, p):
            v = float(mom[f"up_{i}_{j2}"])
            xtx[i + 1, j2 + 1] = xtx[j2 + 1, i + 1] = v
    cond = float(np.linalg.cond(xtx))
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError(
            f"huber: singular design matrix (cond={cond:.3g})"
        )
    num = float(scale) ** 2 * float(mom["spsi2"]) / df_resid
    den = (float(npsi) / n) ** 2
    cov = (num / den) * np.linalg.inv(xtx)
    se = [float(np.sqrt(max(0.0, cov[j, j]))) for j in range(p + 1)]
    return {
        "terms": ["_intercept", *x_cols],
        "coef": [round(float(bv), 6) for bv in beta],
        "std_err": [round(sv, 6) for sv in se],
        "t_stat": [
            round(float(bv) / sv, 6) if sv > 0 else None
            for bv, sv in zip(beta, se)
        ],
        "n": n,
        "scale": round(float(scale), 6),
        "n_iter": n_iter,
    }


def huber_report(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    c: float = 1.345,
    scale: float | None = None,
    n_iter: int = N_IRLS_ITER,
) -> DataFrame:
    """Huber robust regression via UNROLLED IRLS — the whale-robust
    member of the regression family (the trimmed/MAD family's sibling
    on the MODEL side; statsmodels ``RLM(M=HuberT(t=c))`` semantics
    with a FIXED scale): squared loss inside ``c·scale``, linear
    beyond, so a few extreme rows stop owning the fit while clean rows
    keep full OLS efficiency (95% at the default c = 1.345).

    Scale shape: one OLS moment pass for the starting β (shared
    :func:`ols_solve_from_moments`), two :func:`~.profiling.
    exact_quantiles` rank probes for the MAD scale when ``scale`` is
    not given (``1.4826·median(|e − median(e)|)`` of the 6dp starting
    residuals — normalized-MAD, held FIXED across passes, i.e.
    statsmodels ``fit(update_scale=False)``; both medians come from
    the distinct-value-grain bucketed cumsum, never a value-buffering
    percentile), then ``n_iter`` IRLS passes, each ONE 1-row
    partial-aggregated scan of weighted normal-equation moments at the
    current β literals (the WLS kernel shape) with the in-row weight
    ``min(1, c·s/|e|)``, plus one sidecar pass for the asymptotic SEs.
    Only the p(p+5)/2 sums cross to the driver per pass; the solve is
    the shared :func:`huber_step_from_moments`.  Determinism:
    6dp-quantized y/x, every cross-row term 12dp-decimal-quantized,
    fixed IEEE in-row weight, 6dp scale literal — the oracle replays
    the identical pass SQL through the same shared step/finalize, one
    float trajectory.  Returns one row per term ``(term, coef,
    std_err, t_stat)``."""
    import math

    if not x_cols:
        raise ValueError("huber: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"huber: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES}"
        )
    if not (c > 0 and math.isfinite(c)):
        raise ValueError(f"huber: threshold c must be finite and > 0, got {c}")
    if scale is not None and not (scale > 0 and math.isfinite(scale)):
        raise ValueError(
            f"huber: scale must be finite and > 0 when given, got {scale}"
        )
    names = [f"__x{i + 1}" for i in range(len(x_cols))]
    base = _complete_case(df, y_col, x_cols).select(
        F.round(F.col(y_col).cast("double"), 6).alias("__y"),
        *[
            F.round(F.col(x).cast("double"), 6).alias(nm)
            for x, nm in zip(x_cols, names)
        ],
    )
    par = df.sparkSession.sparkContext.defaultParallelism
    if base.rdd.getNumPartitions() < par:
        base = base.repartition(par)
    base = base.localCheckpoint(eager=False)
    p = len(x_cols)
    # starting β: the 6dp OLS solution over the SAME prepared frame
    sol0 = ols_solve_from_moments(
        ols_moments(base, "__y", names), names
    )
    beta = [float(b) for b in sol0["coef"]]
    if scale is None:
        eta0 = F.lit(beta[0])
        for bj, nm in zip(beta[1:], names):
            eta0 = eta0 + F.lit(float(bj)) * F.col(nm)
        from .profiling import exact_quantiles

        e6 = F.round(F.col("__y") - eta0, 6)
        med_rows = exact_quantiles(
            base.select(e6.alias("__e")), "__e", [0.5]
        ).collect()
        if not med_rows:
            raise ValueError("huber: no complete-case rows")
        med = float(med_rows[0]["quantile"])
        mad = float(
            exact_quantiles(
                base.select(
                    F.round(F.abs(e6 - F.lit(med)), 6).alias("__d")
                ),
                "__d",
                [0.5],
            ).collect()[0]["quantile"]
        )
        scale = round(1.4826 * mad, 6)
        if not scale > 0:
            raise ValueError(
                "huber: degenerate MAD scale (over half the residuals "
                "identical) — pass scale explicitly"
            )
    a = float(c) * float(scale)
    for _ in range(n_iter):
        mom = _huber_pass(base, p, beta, a, scale, c)
        beta = huber_step_from_moments(mom, p)
    final = _huber_pass(base, p, beta, a, scale, c, sidecars=True)
    sol = huber_finalize(final, beta, x_cols, scale, n_iter)
    spark = df.sparkSession
    return spark.createDataFrame(
        list(zip(sol["terms"], sol["coef"], sol["std_err"], sol["t_stat"])),
        "term string, coef double, std_err double, t_stat double",
    )


# -- Gamma GLM (log link) ----------------------------------------------


def _gamma_pass(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    beta: list[float],
    prepared: bool = False,
    need_loss: bool = True,
    need_domain: bool = True,
) -> dict:
    """One distributed Gamma-GLM (log link) Fisher-scoring pass at
    literal ``beta``: with ``μ = exp(η)``, the scaled score is
    ``g_j = Σ (y/μ − 1)·x_j`` and the expected information is the
    CONSTANT ``h_ij = Σ x_i·x_j`` (the log link is the canonical-mean
    parameterization where Fisher info loses μ entirely; the
    dispersion φ cancels in the Newton step and returns only in the
    SEs).  Sidecars: the Pearson χ² sum ``Σ((y−μ)/μ)²`` (the φ̂
    estimator), the deviance sum ``2Σ(−ln(y/μ) + (y−μ)/μ)``, n, and
    min y (must be > 0).  Same discipline as the Poisson pass: 6dp
    features, ±50 η clamp before exp, every cross-row term
    12dp-decimal-quantized in a projection below the aggregate.

    r14 optimization flags (the :func:`_logistic_pass` discipline):
    ``need_loss=False`` drops the Pearson-χ²/deviance terms (read only
    by the final pass's finalize), ``need_domain=False`` the ymin
    sidecar (first/final pass only), ``prepared=True`` the
    pre-projected 6dp frame — dropped sums are never consumed,
    trajectory unchanged."""
    names = [f"__x{i + 1}" for i in range(len(x_cols))]
    if prepared:
        proj1 = df
    else:
        proj1 = df.select(
            F.col(y_col).cast("double").alias("__y"),
            *[
                F.round(F.col(c).cast("double"), 6).alias(nm)
                for c, nm in zip(x_cols, names)
            ],
        )
    eta = F.lit(float(beta[0]))
    for bj, nm in zip(beta[1:], names):
        eta = eta + F.lit(float(bj)) * F.col(nm)
    eta = F.greatest(F.least(eta, F.lit(50.0)), F.lit(-50.0))
    proj2 = proj1.select("__y", *names, F.exp(eta).alias("__mu"))
    mu = F.col("__mu")
    yd = F.col("__y")
    resid = yd / mu - F.lit(1.0)
    xs = [F.lit(1.0)] + [F.col(nm) for nm in names]
    d38 = "decimal(38,12)"
    term_cols = []
    for j2, xj in enumerate(xs):
        term_cols.append(
            F.round(resid * xj, 12).cast(d38).alias(f"__tg_{j2}")
        )
        for i in range(j2, len(xs)):
            term_cols.append(
                F.round(xj * xs[i], 12).cast(d38).alias(f"__th_{j2}_{i}")
            )
    if need_loss:
        pe = (yd - mu) / mu
        term_cols.append(F.round(pe * pe, 12).cast(d38).alias("__tpe"))
        dev = F.lit(2.0) * (-F.log(yd / mu) + (yd - mu) / mu)
        term_cols.append(F.round(dev, 12).cast(d38).alias("__tdev"))
    proj3 = proj2.select("__y", *term_cols)
    aggs = [F.count(F.lit(1)).alias("n")]
    for j2 in range(len(xs)):
        aggs.append(F.sum(f"__tg_{j2}").alias(f"g_{j2}"))
        for i in range(j2, len(xs)):
            aggs.append(F.sum(f"__th_{j2}_{i}").alias(f"h_{j2}_{i}"))
    if need_loss:
        aggs.append(F.sum("__tpe").alias("pearson"))
        aggs.append(F.sum("__tdev").alias("dev"))
    if need_domain:
        aggs.append(F.min(yd).alias("ymin"))
    return proj3.agg(*aggs).collect()[0].asDict()


def gamma_finalize(
    mom: dict, beta: list[float], x_cols: list[str], n_iter: int
) -> dict:
    """Final Gamma-GLM readout: SEs scale the information inverse by
    the Pearson dispersion ``φ̂ = Σ((y−μ)/μ)²/(n−p−1)`` (statsmodels
    ``Gamma(log)`` with ``scale='X2'``).  Shared by the operator and
    the oracle builder."""
    import numpy as np

    p = len(x_cols)
    n = int(mom["n"])
    df_resid = n - p - 1
    if df_resid <= 0:
        raise ValueError(f"gamma: n={n} rows cannot fit {p + 1} parameters")
    h = np.zeros((p + 1, p + 1))
    for j2 in range(p + 1):
        for i in range(j2, p + 1):
            h[j2, i] = h[i, j2] = float(mom[f"h_{j2}_{i}"])
    try:
        inv = np.linalg.inv(h)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            f"gamma: singular information matrix: {exc}"
        ) from exc
    phi = float(mom["pearson"]) / df_resid
    se = [
        float(np.sqrt(max(0.0, phi * inv[j, j]))) for j in range(p + 1)
    ]
    return {
        "terms": ["_intercept", *x_cols],
        "coef": [round(float(b), 6) for b in beta],
        "std_err": [round(s, 6) for s in se],
        "z_stat": [
            round(float(b) / s, 6) if s > 0 else None
            for b, s in zip(beta, se)
        ],
        "n": n,
        "dispersion": round(phi, 6),
        "mean_deviance": round(float(mom["dev"]) / n, 6),
        "n_iter": n_iter,
    }


def gamma_report(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    n_iter: int = N_IRLS_ITER,
) -> DataFrame:
    """Gamma regression with log link via unrolled Fisher scoring —
    the POSITIVE-CONTINUOUS member of the GLM family (statsmodels
    ``GLM(family=Gamma(link=Log()))`` with Pearson-χ² scale parity at
    convergence): revenue per order, latency, claim size — responses
    whose noise scales with the mean, where OLS on ln(y) answers the
    wrong question (E[ln y] ≠ ln E[y]).

    Scale shape: ``n_iter + 1`` distributed passes, each ONE 1-row
    partial-aggregated scan at the current β literals — identical
    discipline and exchanges as :func:`poisson_report`, with the SAME
    shared mean-matched warm start (at β = 0, ``g₀ = Σ(y−1)`` again,
    so :func:`poisson_warm_start` reads ȳ unchanged) and the shared
    ``logistic_step`` Newton update; the oracle replays the pass SQL
    through the same shared step/finalize, one float trajectory.
    Requires y > 0.  Returns one row per term ``(term, coef, std_err,
    z_stat)``."""
    if not x_cols:
        raise ValueError("gamma: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"gamma: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES}"
        )
    base, names = _glm_prepared_base(df, y_col, x_cols)
    p = len(x_cols)
    beta = [0.0] * (p + 1)
    for it in range(n_iter):
        last = _gamma_pass(
            base, "__y", names, beta,
            prepared=True, need_loss=False, need_domain=(it == 0),
        )
        if it == 0 and (last["ymin"] is None or last["ymin"] <= 0.0):
            raise ValueError(
                "gamma: label must be strictly positive, "
                f"got min {last['ymin']}"
            )
        if it == 0:
            beta = poisson_warm_start(last, p)
        else:
            beta = logistic_step(last, beta, p)
    final = _gamma_pass(base, "__y", names, beta, prepared=True)
    sol = gamma_finalize(final, beta, x_cols, n_iter)
    spark = df.sparkSession
    return spark.createDataFrame(
        list(zip(sol["terms"], sol["coef"], sol["std_err"], sol["z_stat"])),
        "term string, coef double, std_err double, z_stat double",
    )


def damped_newton_step(
    mom: dict, theta: list[float], k: int, alpha: float
) -> list[float]:
    """One DAMPED Newton update ``θ' = θ + α·I⁻¹U`` over a pass's
    exact-decimal sums (keys ``g_0..g_k`` / ``h_i_j`` — the
    :func:`logistic_step` vocabulary, (k+1)-dimensional).  The fixed
    fractional α schedule is the deterministic, oracle-replayable
    stand-in for line search: raw Newton on the Weibull/Gumbel
    likelihood overshoots from any moment-matched start (measured:
    divergence to 1e25 within 5 full steps), while α = ¼,¼,½,½,1,…
    converges on the same fixtures — and at α = 1 the update is
    bit-identical to the undamped step (``1.0·d`` is exact in IEEE).
    Shared by the Spark loop and the oracle builder."""
    import numpy as np

    h = np.zeros((k + 1, k + 1))
    g = np.zeros(k + 1)
    for j2 in range(k + 1):
        g[j2] = float(mom[f"g_{j2}"])
        for i in range(j2, k + 1):
            h[j2, i] = h[i, j2] = float(mom[f"h_{j2}_{i}"])
    cond = float(np.linalg.cond(h))
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError(
            "newton: singular or ill-conditioned information matrix "
            f"(cond={cond:.3g})"
        )
    step = np.linalg.solve(h, g)
    return [
        float(t + float(alpha) * d) for t, d in zip(theta, step)
    ]


def _design_from_moments(mom: dict, p: int):
    """(X̃ᵀX̃, X̃ᵀỹ, Σy²) rebuilt from an :func:`ols_moments` dict —
    the identical array construction as :func:`ols_solve_from_moments`
    (intercept first), extracted for the solves below that need the
    RAW SSE rather than the rounded report fields."""
    import numpy as np

    xtx = np.zeros((p + 1, p + 1))
    xty = np.zeros(p + 1)
    xtx[0, 0] = float(int(mom["n"]))
    xty[0] = float(mom["sy"])
    for i in range(p):
        s = float(mom[f"s_{i}"])
        xtx[0, i + 1] = xtx[i + 1, 0] = s
        xty[i + 1] = float(mom[f"q_{i}"])
        for j2 in range(i, p):
            v = float(mom[f"p_{i}_{j2}"])
            xtx[i + 1, j2 + 1] = xtx[j2 + 1, i + 1] = v
    return xtx, xty, float(mom["syy"])


def _sse_from_moments(mom: dict, x_cols: list[str], tag: str) -> float:
    """Closed-form OLS SSE over one segment's exact moments (the
    :func:`ols_solve_from_moments` identity ``Σy² − 2βᵀX̃ᵀỹ +
    βᵀX̃ᵀX̃β``), with the same cond guard; raises ``ValueError``
    tagged with the segment when the fit is impossible — the Chow
    statistic is undefined if EITHER segment cannot be fitted."""
    import numpy as np

    p = len(x_cols)
    n = int(mom["n"])
    if n <= p + 1:
        raise ValueError(
            f"chow: segment {tag!r} has n={n} rows — cannot fit "
            f"{p + 1} parameters"
        )
    xtx, xty, syy = _design_from_moments(mom, p)
    cond = float(np.linalg.cond(xtx))
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError(
            f"chow: singular design in segment {tag!r} (cond={cond:.3g})"
        )
    beta = np.linalg.solve(xtx, xty)
    return max(
        0.0, syy - 2.0 * float(beta @ xty) + float(beta @ xtx @ beta)
    )


def chow_solve_from_moments(
    moms: dict[str, dict], x_cols: list[str]
) -> dict:
    """Driver-side Chow structural-break F from the TWO segments'
    exact-decimal moment dicts — ONE shared implementation consumed by
    the Spark operator and the DuckDB oracle builder.  The pooled
    moments are the element-wise DECIMAL sums of the segment moments
    (exact — no third pass over the data), so ``F = ((SSE_pooled −
    SSE_a − SSE_b)/(p+1)) / ((SSE_a + SSE_b)/(n − 2(p+1)))`` is pure
    closed-form arithmetic over already-collected sidecars.  Raises
    unless exactly two fittable segments are present; ``f_stat`` is
    null when the within-SSE degenerates to 0 or df_den ≤ 0."""
    if len(moms) != 2:
        raise ValueError(
            f"chow: need exactly 2 segments, got {len(moms)} "
            f"({sorted(moms)[:5]})"
        )
    p = len(x_cols)
    (ga, ma), (gb, mb) = sorted(moms.items())
    pooled = {"n": int(ma["n"]) + int(mb["n"])}
    for k in ma:
        if k != "n" and (k == "sy" or k == "syy" or k[:2] in ("s_", "q_", "p_")):
            pooled[k] = ma[k] + mb[k]  # Decimal + Decimal: exact
    sse_a = _sse_from_moments(ma, x_cols, ga)
    sse_b = _sse_from_moments(mb, x_cols, gb)
    sse_p = _sse_from_moments(pooled, x_cols, "<pooled>")
    n = pooled["n"]
    k1 = p + 1
    df_den = n - 2 * k1
    sse_w = sse_a + sse_b
    f = (
        ((sse_p - sse_w) / k1) / (sse_w / df_den)
        if df_den > 0 and sse_w > 0
        else None
    )
    return {
        "grp_a": ga,
        "grp_b": gb,
        "n_a": int(ma["n"]),
        "n_b": int(mb["n"]),
        "df_num": k1,
        "df_den": df_den,
        "sse_pooled": round(sse_p, 6),
        "sse_within": round(sse_w, 6),
        "f_stat": round(f, 6) if f is not None else None,
    }


def chow_test_report(
    df: DataFrame, y_col: str, x_cols: list[str], group_col: str
) -> DataFrame:
    """Chow structural-break test — does the SAME linear model
    ``y ~ x`` hold across two regimes (pre/post a policy date, two
    sources, two shards), or do the coefficients genuinely differ?
    The classic econometric F comparing the pooled fit against
    separate per-regime fits (Chow 1960; statsmodels
    ``compare_f_test`` on the dummy-interacted model is the same
    statistic).

    Scale shape: ONE partial-aggregated exchange to the 2-row regime
    grain carrying the exact-decimal :func:`ols_moments` sums (the
    :func:`ols_by_group` construction with the group count pinned to
    2 by a lazy in-plan ``assert_true`` — nothing unbounded ever
    reaches the driver); the pooled moments are DECIMAL sums of the
    two sidecar rows, so the pooled fit costs ZERO extra distributed
    work.  All three solves + the F are driver arithmetic through the
    SAME shared :func:`chow_solve_from_moments` the oracle replays.
    Returns one row ``(grp_a, grp_b, n_a, n_b, df_num, df_den,
    sse_pooled, sse_within, f_stat)``."""
    if not x_cols:
        raise ValueError("chow: need at least one feature column")
    if len(x_cols) > MAX_FEATURES:
        raise ValueError(
            f"chow: {len(x_cols)} features exceeds MAX_FEATURES="
            f"{MAX_FEATURES}"
        )
    cond = _finite(y_col) & F.col(group_col).isNotNull()
    for c in x_cols:
        cond = cond & _finite(c)
    base = df.filter(cond).select(
        F.col(group_col).cast("string").alias("__grp"), y_col, *x_cols
    )
    kc = base.agg(F.countDistinct("__grp").alias("__k"))
    guard = F.assert_true(
        F.coalesce(F.col("__k") == F.lit(2), F.lit(True)),
        F.lit(
            "chow: the Chow test compares exactly TWO regimes — "
            "derive a binary split column first"
        ),
    ).isNull()
    guarded = base.crossJoin(F.broadcast(kc)).filter(guard).drop("__k")
    rows = (
        guarded.select("__grp", *_ols_moment_proj(y_col, x_cols))
        .groupBy("__grp")
        .agg(*_ols_moment_sums(x_cols))
        .collect()
    )
    sol = chow_solve_from_moments(
        {r["__grp"]: r.asDict() for r in rows}, x_cols
    )
    return df.sparkSession.createDataFrame(
        [tuple(sol.values())],
        "grp_a string, grp_b string, n_a bigint, n_b bigint,"
        " df_num bigint, df_den bigint, sse_pooled double,"
        " sse_within double, f_stat double",
    )


def _iv_moment_proj(
    y_col: str, x_cols: list[str], z_cols: list[str]
) -> list:
    """Per-row exact-decimal term columns of the 2SLS moment pass —
    the :func:`_ols_moment_proj` discipline extended with the
    instrument cross-moments: Z'X needs EVERY ``(i, j)`` pair (it is
    not symmetric), Z'Z and X'X stay triangular.  Quantize-and-cast in
    a projection BELOW the aggregate (the measured house rule)."""
    d38 = "decimal(38,12)"

    def prod(a: str, b: str):
        return (_q(a).cast("decimal(19,6)") * _q(b)).cast(d38)

    cols = [_q(y_col).alias("__msy"), prod(y_col, y_col).alias("__msyy")]
    for i, c in enumerate(x_cols):
        cols.append(_q(c).alias(f"__mx_{i}"))
        cols.append(prod(c, y_col).alias(f"__mxy_{i}"))
        for j2 in range(i, len(x_cols)):
            cols.append(prod(c, x_cols[j2]).alias(f"__mxx_{i}_{j2}"))
    for i, c in enumerate(z_cols):
        cols.append(_q(c).alias(f"__mz_{i}"))
        cols.append(prod(c, y_col).alias(f"__mzy_{i}"))
        for j2 in range(i, len(z_cols)):
            cols.append(prod(c, z_cols[j2]).alias(f"__mzz_{i}_{j2}"))
        for j2 in range(len(x_cols)):
            cols.append(prod(c, x_cols[j2]).alias(f"__mzx_{i}_{j2}"))
    return cols


def _iv_moment_sums(x_cols: list[str], z_cols: list[str]) -> list:
    """Plain-column sums over :func:`_iv_moment_proj`'s output."""
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs.append(F.sum("__msy").alias("sy"))
    aggs.append(F.sum("__msyy").alias("syy"))
    for i in range(len(x_cols)):
        aggs.append(F.sum(f"__mx_{i}").alias(f"sx_{i}"))
        aggs.append(F.sum(f"__mxy_{i}").alias(f"xy_{i}"))
        for j2 in range(i, len(x_cols)):
            aggs.append(F.sum(f"__mxx_{i}_{j2}").alias(f"xx_{i}_{j2}"))
    for i in range(len(z_cols)):
        aggs.append(F.sum(f"__mz_{i}").alias(f"sz_{i}"))
        aggs.append(F.sum(f"__mzy_{i}").alias(f"zy_{i}"))
        for j2 in range(i, len(z_cols)):
            aggs.append(F.sum(f"__mzz_{i}_{j2}").alias(f"zz_{i}_{j2}"))
        for j2 in range(len(x_cols)):
            aggs.append(F.sum(f"__mzx_{i}_{j2}").alias(f"zx_{i}_{j2}"))
    return aggs


def iv_moment_frame(
    df: DataFrame, y_col: str, x_cols: list[str], z_cols: list[str]
) -> DataFrame:
    """The 2SLS moment pass AS A PLAN (the :func:`ols_moment_frame`
    split): batch callers collect the 1-row aggregate
    (:func:`iv_moments`); the streaming twin (#27,
    ``streaming.stateful.stream_iv_moments``) runs the IDENTICAL plan
    as a global streaming aggregation in update mode — every sum is
    an additive exact decimal, so snapshots equal the batch moments
    bit-for-bit.  Complete-case over ALL variables (a row missing the
    instrument is missing for both stages)."""
    if not x_cols or len(z_cols) != len(x_cols):
        raise ValueError(
            "iv2sls: need len(z_cols) == len(x_cols) >= 1 (the "
            "just-identified case — one instrument per endogenous "
            f"regressor), got p={len(x_cols)}, m={len(z_cols)}"
        )
    if len(x_cols) + len(z_cols) > MAX_FEATURES:
        raise ValueError(
            f"iv2sls: {len(x_cols)}+{len(z_cols)} variables exceeds "
            f"MAX_FEATURES={MAX_FEATURES}"
        )
    cond = _finite(y_col)
    for c in [*x_cols, *z_cols]:
        cond = cond & _finite(c)
    from intake_esm_spark.operators._util import _spread

    # r14: narrow pre-aggregation spread — see ols_moment_frame.  An
    # exogenous regressor instruments itself (x∩z non-empty), so the
    # projection list dedups while preserving order.
    keep = list(dict.fromkeys([y_col, *x_cols, *z_cols]))
    return (
        _spread(df.filter(cond).select(*keep))
        .select(*_iv_moment_proj(y_col, x_cols, z_cols))
        .agg(*_iv_moment_sums(x_cols, z_cols))
    )


def iv_moments(
    df: DataFrame, y_col: str, x_cols: list[str], z_cols: list[str]
) -> dict:
    """ONE distributed pass: exact-decimal second-order moments of
    ``(1, x, z, y)`` — the collected form of
    :func:`iv_moment_frame`."""
    return (
        iv_moment_frame(df, y_col, x_cols, z_cols)
        .collect()[0]
        .asDict()
    )


def iv_solve_from_moments(
    mom: dict, x_cols: list[str], z_cols: list[str]
) -> dict:
    """Driver-side just-identified IV solve over the exact moments —
    ONE shared implementation for the Spark operator AND the DuckDB
    oracle builder.  ``β = (Z̃'X̃)⁻¹ Z̃'ỹ`` (intercept instruments
    itself), residual variance from the STRUCTURAL residual ``y −
    X̃β`` (closed-form in the X moments — never a residual pass), and
    the just-identified IV sandwich ``Cov(β) = σ²(Z̃'X̃)⁻¹ Z̃'Z̃
    (X̃'Z̃)⁻¹`` — statsmodels ``IV2SLS`` parity.  Raises on n ≤ p+1
    or a weak/singular instrument matrix (cond > 1e12: the
    instrument-relevance failure mode surfaces as conditioning)."""
    import numpy as np

    p = len(x_cols)
    n = int(mom["n"])
    if n <= p + 1:
        raise ValueError(f"iv2sls: n={n} rows cannot fit {p + 1} parameters")
    zx = np.zeros((p + 1, p + 1))
    zz = np.zeros((p + 1, p + 1))
    xx = np.zeros((p + 1, p + 1))
    zy = np.zeros(p + 1)
    xy = np.zeros(p + 1)
    zx[0, 0] = zz[0, 0] = xx[0, 0] = float(n)
    zy[0] = xy[0] = float(mom["sy"])
    for i in range(p):
        zx[0, i + 1] = xx[0, i + 1] = xx[i + 1, 0] = float(
            mom[f"sx_{i}"]
        )
        zx[i + 1, 0] = zz[0, i + 1] = zz[i + 1, 0] = float(
            mom[f"sz_{i}"]
        )
        zy[i + 1] = float(mom[f"zy_{i}"])
        xy[i + 1] = float(mom[f"xy_{i}"])
        for j2 in range(p):
            zx[i + 1, j2 + 1] = float(mom[f"zx_{i}_{j2}"])
        for j2 in range(i, p):
            zz[i + 1, j2 + 1] = zz[j2 + 1, i + 1] = float(
                mom[f"zz_{i}_{j2}"]
            )
            xx[i + 1, j2 + 1] = xx[j2 + 1, i + 1] = float(
                mom[f"xx_{i}_{j2}"]
            )
    cond = float(np.linalg.cond(zx))
    if not np.isfinite(cond) or cond > 1e12:
        raise ValueError(
            "iv2sls: weak or singular instrument matrix Z'X "
            f"(cond={cond:.3g}) — the instruments do not move the "
            "endogenous regressors"
        )
    beta = np.linalg.solve(zx, zy)
    syy = float(mom["syy"])
    sse = max(
        0.0, syy - 2.0 * float(beta @ xy) + float(beta @ xx @ beta)
    )
    df_resid = n - p - 1
    sigma2 = sse / df_resid
    inv_zx = np.linalg.inv(zx)
    covb = sigma2 * inv_zx @ zz @ inv_zx.T
    se = [float(np.sqrt(max(0.0, covb[j, j]))) for j in range(p + 1)]
    return {
        "terms": ["_intercept", *x_cols],
        "coef": [round(float(b), 6) for b in beta],
        "std_err": [round(s, 6) for s in se],
        "t_stat": [
            round(float(b) / s, 6) if s > 0 else None
            for b, s in zip(beta, se)
        ],
        "n": n,
        "df_resid": df_resid,
        "resid_se": round(float(np.sqrt(sigma2)), 6),
    }


def iv2sls_report(
    df: DataFrame, y_col: str, x_cols: list[str], z_cols: list[str]
) -> DataFrame:
    """Instrumental-variables two-stage least squares (just-identified)
    — the causal-inference workhorse when a regressor is endogenous
    (price ~ demand with cost-shifter instruments): per-coefficient
    ``(term, coef, std_err, t_stat)`` rows, statsmodels ``IV2SLS``
    parity.

    Scale shape: ONE 1-row partial-aggregated exact-decimal moment
    pass over ``(1, x, z, y)`` — the :func:`ols_report` construction
    widened with the Z'X / Z'Z cross-moments; both "stages" collapse
    into the closed-form ``(Z'X)⁻¹Z'y`` driver solve (the textbook
    two-regression procedure is an identity, not a plan), through the
    SAME shared :func:`iv_solve_from_moments` the oracle replays."""
    sol = iv_solve_from_moments(
        iv_moments(df, y_col, x_cols, z_cols), x_cols, z_cols
    )
    return df.sparkSession.createDataFrame(
        list(
            zip(sol["terms"], sol["coef"], sol["std_err"], sol["t_stat"])
        ),
        "term string, coef double, std_err double, t_stat double",
    )


def durbin_watson_report(
    df: DataFrame,
    y_col: str,
    x_cols: list[str],
    order_col: str,
    tiebreaks: list[str],
) -> DataFrame:
    """Durbin-Watson serial-correlation diagnostic on the OLS
    residuals in a caller-supplied sequence order — "are the errors of
    price ~ quantity independent across the ship sequence, or does a
    miss at t predict a miss at t+1" (statsmodels
    ``durbin_watson(resid)`` at the same ordering; DW ≈ 2(1−ρ̂₁)).

    Scale shape: the :func:`ols_moments` pass fits β on the driver
    (literals), residuals are a fixed IEEE in-row expression (the
    :func:`ols_predict` projection); the CONSECUTIVE pairing — the
    one genuinely sequential piece — runs as an exact global rank via
    the bucketed cumsum (:func:`~.ranks.global_rank`, never an
    unpartitioned window) followed by a rank-keyed equi-join of the
    frame against itself at ``rank+1`` (the ``rmst_report``
    successive-pairs construction).  Numerator/denominator accumulate
    as 12dp DECIMAL(38,12) (order-independent, engine-exact).
    ``order_col`` must be numeric; ``tiebreaks`` must make the order
    total, or ranks among ties follow physical order and the statistic
    stops being well-defined.  Returns one row ``(n_rows, dw_stat,
    rho1)`` — null statistics when the residual energy degenerates to
    zero (a perfect fit has no autocorrelation to measure)."""
    from .ranks import global_rank

    sol = ols_solve_from_moments(
        ols_moments(df, y_col, x_cols), x_cols
    )
    beta = sol["coef"]
    cond = _finite(y_col) & F.col(order_col).isNotNull()
    for c in x_cols:
        cond = cond & _finite(c)
    for c in tiebreaks:
        cond = cond & F.col(c).isNotNull()
    eta = F.lit(float(beta[0]))
    for bj, c in zip(beta[1:], x_cols):
        eta = eta + F.lit(float(bj)) * F.round(F.col(c).cast("double"), 6)
    yq = F.round(F.col(y_col).cast("double"), 6)
    base = df.filter(cond).select(
        F.col(order_col).cast("double").alias("__ord"),
        *[F.col(c) for c in tiebreaks],
        F.round(yq - eta, 6).alias("__e"),
    )
    ranked = global_rank(
        base, "__ord", tiebreaks, out_col="__rn", tie_fanout=True
    ).localCheckpoint(eager=False)  # pinned: both sides of the pair join
    d38 = "decimal(38,12)"
    lhs = ranked.select(
        F.col("__rn").alias("__r"), F.col("__e").alias("__e1")
    )
    rhs = ranked.select(
        (F.col("__rn") + F.lit(1)).alias("__r"),
        F.col("__e").alias("__e0"),
    )
    diff = F.col("__e1") - F.col("__e0")
    pair_sums = lhs.join(rhs, "__r").agg(
        F.sum(F.round(diff * diff, 12).cast(d38)).alias("__num"),
        F.sum(
            F.round(F.col("__e1") * F.col("__e0"), 12).cast(d38)
        ).alias("__cross"),
    )
    den_sums = ranked.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.round(F.col("__e") * F.col("__e"), 12).cast(d38)
        ).alias("__den"),
    )
    m = den_sums.crossJoin(F.broadcast(pair_sums))
    den = F.col("__den").cast("double")
    dw = F.when(den > 0, F.col("__num").cast("double") / den)
    rho = F.when(den > 0, F.col("__cross").cast("double") / den)
    return m.select(
        "n_rows",
        F.round(dw, 6).alias("dw_stat"),
        F.round(rho, 6).alias("rho1"),
    )
