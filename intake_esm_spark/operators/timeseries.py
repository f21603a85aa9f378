"""Time-series rollups over event streams.

Extension (SURVEY §2.9): the daily-revenue-with-moving-average chart —
a calendar rollup followed by a trailing-window smooth. The interesting
part at scale is what the window runs OVER: the corpus collapses to one
row per calendar day in the first aggregation (map-side partial), so
the unpartitioned ordered window — normally the cardinal sin — runs
over a frame bounded by the CALENDAR (30 rows for a month, 3650 for a
decade), not by the data. Same benign metadata-scale window class as
mixing.py's rate frame, documented here for the same reason.

Determinism: revenue accumulates as DECIMAL(18,6) (double summation is
partition-order-dependent — the SCALE.md rule), cast back to double
only for the final rounded output; the moving average is a true
calendar RANGE window (6 preceding days), not a rows window, so missing
days shrink the divisor instead of silently stretching the lookback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _daily_frame(events: DataFrame, value_col: str, ts_col: str) -> DataFrame:
    """Day-grain decimal totals shared by the rollup and the anomaly
    scorer: ``(day, __dn epoch-day, __rd decimal(18,6))`` — ONE
    definition so the two entries (and their oracles) cannot de-sync."""
    return (
        events.select(
            F.to_date(ts_col).alias("day"),
            F.col(value_col).cast("decimal(18,6)").alias("__v"),
        )
        .groupBy("day")
        .agg(F.sum("__v").cast("decimal(18,6)").alias("__rd"))
        .select(
            "day",
            F.datediff("day", F.lit("1970-01-01")).alias("__dn"),
            "__rd",
        )
    )


def daily_rollup_ma(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Per calendar day: total of ``value_col`` (exact decimal
    accumulation) and the trailing ``window_days``-day moving average
    over days PRESENT in that calendar range."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    daily = _daily_frame(events, value_col, ts_col)
    w = (
        Window.orderBy("__dn")
        .rangeBetween(-(window_days - 1), 0)
    )
    ma = F.sum("__rd").over(w).cast("double") / F.count(F.lit(1)).over(w).cast(
        "double"
    )
    return daily.select(
        F.col("day").cast("string").alias("day"),
        F.round(F.col("__rd").cast("double"), 6).alias("revenue"),
        F.round(ma, 6).alias(f"ma{window_days}"),
    )


def detect_level_shift(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """One-sided CUSUM level-shift detection on the daily rollup: flags
    the days where the cumulative evidence of an upward (or downward)
    mean shift crosses ``h_sigma`` standard deviations — the
    complementary alarm to :func:`detect_anomalies` (a z-score sees one
    spiky day; CUSUM accumulates many small drifts a z-score never
    flags).

    Spark-first trick: the textbook recursion ``S⁺_t = max(0, S⁺_{t-1}
    + d_t)`` is NOT a window sum, but its closed form IS —
    ``S⁺_t = P_t − min(0, min_{j≤t} P_j)`` with ``P`` the running
    prefix sum of the drifts ``d_t = x_t − mean − k·σ`` — so two
    ordered windows (prefix sum, running min) over the CALENDAR-bounded
    day frame compute it exactly, no recursion, no UDF. Mean/σ use the
    same order-independent decimal moments as :func:`detect_anomalies`
    (global, two-pass-free: both come from the same 1-row aggregate
    broadcast back). Output per day: the day's value, ``cusum_up``,
    ``cusum_down`` and the alarm flags (0 when σ is degenerate)."""
    daily = _daily_frame(events, value_col, ts_col)
    # global decimal moments -> mean/sd, broadcast back in-plan
    stats = daily.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__rd").alias("__s"),
        F.sum(F.col("__rd").cast("decimal(19,6)") * F.col("__rd")).alias(
            "__s2"
        ),
    )
    j = daily.crossJoin(F.broadcast(stats))
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    s2 = F.col("__s2").cast("double")
    mean = s / n
    var = (s2 - n * mean * mean) / (n - F.lit(1.0))
    sd = F.when(var > 0, F.sqrt(var))
    x = F.col("__rd").cast("double")
    # drifts quantize to 6dp DECIMAL before the running windows: a
    # cumulative DOUBLE sum is segment-tree-order-dependent across
    # engines (the detect_anomalies lesson), a decimal one is exact
    d_up = F.round(x - mean - F.lit(k_sigma) * sd, 6).cast("decimal(18,6)")
    d_dn = F.round(mean - x - F.lit(k_sigma) * sd, 6).cast("decimal(18,6)")
    pre = j.select(
        "day",
        "__dn",
        x.alias("__x"),
        d_up.alias("__du"),
        d_dn.alias("__dd"),
        (F.lit(h_sigma) * sd).alias("__h"),
    )
    w = (
        Window.orderBy("__dn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zero = F.lit(0).cast("decimal(18,6)")
    # windows can't nest: materialize the prefix sums, then the running
    # min in a second projection over the SAME ordered window (one sort)
    pre = pre.select(
        "*",
        F.sum("__du").over(w).alias("__pu"),
        F.sum("__dd").over(w).alias("__pd"),
    )
    cu = (
        F.col("__pu") - F.least(zero, F.min("__pu").over(w))
    ).cast("double")
    cd = (
        F.col("__pd") - F.least(zero, F.min("__pd").over(w))
    ).cast("double")
    return pre.select(
        F.col("day").cast("string").alias("day"),
        F.round("__x", 6).alias("revenue"),
        F.round(cu, 6).alias("cusum_up"),
        F.round(cd, 6).alias("cusum_down"),
        F.coalesce((F.round(cu, 6) > F.col("__h")).cast("int"), F.lit(0)).alias(
            "shift_up"
        ),
        F.coalesce((F.round(cd, 6) > F.col("__h")).cast("int"), F.lit(0)).alias(
            "shift_down"
        ),
    )


def detect_anomalies(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    window_days: int = 7,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Trailing z-score anomaly flags on the daily rollup: each day is
    scored against the mean/std of the PRECEDING ``window_days`` calendar
    days (the day itself excluded — a spike must not defend itself).

    Engine-exact by construction: the moments are DECIMAL window sums —
    the daily totals are exact decimal(18,6) values, their squares exact
    decimal products, so ``s`` and ``s2`` are order-independent no
    matter how an engine's segment tree pairs the additions (a double
    window sum is NOT) — cast to double only for the final fixed IEEE
    expression ``var = (s2 - n*mean^2)/(n-1)``. Built-in ``stddev`` is
    avoided for the same reason: its accumulation order is
    engine-internal. Days with fewer than 2 trailing days, or a
    degenerate (zero/negative from float cancellation) variance, get a
    null z-score and ``is_anomaly = false``. The window runs over the
    day-grain frame (calendar-bounded — the benign class).
    """
    if window_days < 2:
        raise ValueError(f"window_days must be >= 2, got {window_days}")
    daily = _daily_frame(events, value_col, ts_col)
    w = Window.orderBy("__dn").rangeBetween(-window_days, -1)
    n = F.count(F.lit(1)).over(w).cast("double")
    s = F.sum("__rd").over(w).cast("double")
    s2 = F.sum(F.col("__rd") * F.col("__rd")).over(w).cast("double")
    r = F.col("__rd").cast("double")
    mean = s / n
    var = (s2 - n * mean * mean) / (n - F.lit(1.0))
    sd = F.when(var > 0, F.sqrt(var))
    z = F.round((r - mean) / sd, 6)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        F.round(r, 6).alias("revenue"),
        F.when(n >= 2, F.round(mean, 6)).alias("trailing_mean"),
        F.when(n >= 2, z).alias("z_score"),
        F.coalesce(
            F.when(n >= 2, F.abs(z) >= F.lit(z_threshold)), F.lit(False)
        ).alias("is_anomaly"),
    )


def ewma_daily(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    alpha: float = 0.2,
    lags: int = 14,
) -> DataFrame:
    """Truncated exponentially-weighted moving average of the daily
    total: ``ewma_t = Σ_{k<lags} w_k·x_{t-k} / Σ_{k<lags} w_k`` with
    ``w_k = α(1−α)^k``, summed over the OBSERVED daily sequence (row
    lags, not calendar — compose with gapfill upstream for calendar
    semantics). The truncation makes the recursion a FIXED in-row
    expression over ``lags`` window lags: no sequential dependency, so
    it parallelizes like any window — the untruncated recursive form
    would serialize the whole series (the CUSUM prefix-sum trick does
    not apply to multiplicative decay).

    Determinism: the weights are Python double literals inlined into
    the plan (and the SQL oracle replays the SAME literals via repr
    round-trip); terms are coalesced and summed left-to-right in lag
    order, so both engines add identical doubles in identical order.
    Scale: one day-grain aggregate (the only corpus exchange) + one
    unpartitioned-but-day-grain window, the daily_rollup_ma class."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if lags < 1:
        raise ValueError(f"lags must be >= 1, got {lags}")
    daily = _daily_frame(events, value_col, ts_col)
    x = F.round(F.col("__rd").cast("double"), 6)
    d2 = daily.select("day", "__dn", x.alias("__x"))
    w = Window.orderBy("__dn")
    weights = [alpha * (1.0 - alpha) ** k for k in range(lags)]
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k, wk in enumerate(weights):
        xk = F.col("__x") if k == 0 else F.lag("__x", k).over(w)
        num = num + F.coalesce(F.lit(wk) * xk, F.lit(0.0))
        den = den + F.coalesce(
            F.when(xk.isNotNull(), F.lit(wk)), F.lit(0.0)
        )
    return d2.select(
        F.col("day").cast("string").alias("day"),
        F.col("__x").alias("revenue"),
        F.round(num / den, 6).alias("ewma"),
    )


def seasonal_naive_backtest(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    season: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's total with
    the value one ``season`` earlier in the OBSERVED daily sequence
    (row lag — compose with gapfill for calendar strictness) and score
    the whole series in one pass: n scored days, MAE, RMSE, MAPE, and
    the naive-baseline MAE (lag-1) for a skill ratio — the sanity
    baseline every forecasting project must beat before anything
    fancier ships.

    Determinism: daily totals are decimal; absolute/squared errors are
    fixed IEEE expressions over the rounded daily doubles; the final
    metrics divide exact decimal error sums in double. Scale: one
    day-grain aggregate (the only corpus exchange) + the benign ordered
    window + a 1-row metrics aggregate."""
    if season < 1:
        raise ValueError(f"season must be >= 1, got {season}")
    daily = _daily_frame(events, value_col, ts_col)
    x = F.round(F.col("__rd").cast("double"), 6)
    d2 = daily.select("__dn", x.alias("__x"))
    w = Window.orderBy("__dn")
    fc = F.lag("__x", season).over(w)
    naive = F.lag("__x", 1).over(w)
    scored = d2.select(
        "__x",
        fc.alias("__f"),
        naive.alias("__n1"),
    ).filter(F.col("__f").isNotNull() & F.col("__n1").isNotNull())
    ae = F.abs(F.col("__x") - F.col("__f")).cast("decimal(18,6)")
    # one operand widened (19,6)x(18,6) -> (38,12) in both engines (the
    # profiling.py rule; (19,6)^2 would drop Spark's scale to 11)
    se = (
        (F.col("__x") - F.col("__f")).cast("decimal(19,6)")
        * (F.col("__x") - F.col("__f")).cast("decimal(18,6)")
    )
    ape = F.when(
        F.col("__x") != 0,
        (F.abs(F.col("__x") - F.col("__f")) / F.abs(F.col("__x"))).cast(
            "decimal(18,6)"
        ),
    )
    ae1 = F.abs(F.col("__x") - F.col("__n1")).cast("decimal(18,6)")
    agg = scored.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(ae).alias("__sae"),
        F.sum(se).alias("__sse"),
        F.sum(ape).alias("__sape"),
        F.count(ape).alias("__nape"),
        F.sum(ae1).alias("__sae1"),
    )
    n = F.col("__n").cast("double")
    mae = F.col("__sae").cast("double") / n
    mae1 = F.col("__sae1").cast("double") / n
    return agg.select(
        F.col("__n").alias("n_scored_days"),
        F.round(mae, 6).alias("mae"),
        F.round(F.sqrt(F.col("__sse").cast("double") / n), 6).alias("rmse"),
        F.round(
            F.lit(100.0)
            * F.col("__sape").cast("double")
            / F.col("__nape").cast("double"),
            6,
        ).alias("mape_pct"),
        F.round(mae1, 6).alias("naive1_mae"),
        F.round(mae / mae1, 6).alias("mase_vs_naive1"),
    )


def theil_sen_trend(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Theil-Sen robust trend over the daily totals: the median of all
    pairwise slopes ``(v_j − v_i)/(d_j − d_i)``, with the intercept as
    the median residual ``v_i − slope·d_i`` — resistant to ~29%
    outlier days, where the OLS line in :func:`trend_lines`' family
    tips over for a single bad day.

    Scale shape: one day-grain exchange, then the pair self-join runs
    over the CALENDAR-bounded day frame (days² pairs — 365 days is 66k
    rows, still metadata scale; the corpus itself never self-joins).
    Both medians are RANK-SELECTED (round 12, closing the r11
    verdict's last single-task flag): collapse to the distinct-value
    grain, cumulative counts via :func:`~.ranks.bucketed_cumsum`, and
    the two middle order statistics picked by rank literals against
    each value's ``(prev, cum]`` span — the ``exact_quantiles`` /
    split-conformal probe recipe, so NOTHING sorts in one task even at
    decade spans.

    Determinism: slopes divide a decimal-exact revenue difference by
    an integer day difference (one IEEE division — identical in both
    engines); the median picks ELEMENTS by rank and averages the
    middle two (no percentile interpolation formula, whose expression
    shape differs across engines); ``(v+v)/2 = v`` exactly in IEEE, so
    the odd-count case is unchanged from the positional form. Returns
    one row ``(n_days, n_pairs, slope, intercept)``."""
    from .ranks import bucketed_cumsum

    def _median_by_rank(frame: DataFrame, col: str, n: int) -> F.Column:
        """One-column frame → 1-row frame holding the positional
        median under the rank-probe construction; returns the frame."""
        lo, hi = (n + 1) // 2, n // 2 + 1
        per_v = frame.groupBy(F.col(col).alias("__v")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        cum = bucketed_cumsum(per_v, ["__c"], val_col="__v")
        sel = cum.select(
            "__v",
            (F.col("__cum___c") - F.col("__c")).alias("__p"),
            F.col("__cum___c").alias("__q"),
        )
        pick = lambda r: F.max(  # noqa: E731 — the span containing rank r
            F.when(
                (F.lit(r) > F.col("__p")) & (F.lit(r) <= F.col("__q")),
                F.col("__v"),
            )
        )
        return sel.agg(
            ((pick(lo) + pick(hi)) / F.lit(2.0)).alias("__med")
        )

    daily = _daily_frame(events, value_col, ts_col).localCheckpoint(
        eager=False
    )
    a = daily.select(
        F.col("__dn").alias("__da"), F.col("__rd").alias("__va")
    )
    b = daily.select(
        F.col("__dn").alias("__db"), F.col("__rd").alias("__vb")
    )
    slopes = (
        a.crossJoin(b)
        .filter(F.col("__da") < F.col("__db"))
        .select(
            (
                (F.col("__vb") - F.col("__va")).cast("double")
                / (F.col("__db") - F.col("__da")).cast("double")
            ).alias("__s")
        )
        .localCheckpoint(eager=False)  # feeds count + both middle picks
    )

    # median by RANK against the distinct-value cumulative spans —
    # no unpartitioned window anywhere; day-grain counts are
    # driver-safe
    n_pairs = slopes.count()
    if n_pairs == 0:
        return daily.agg(
            F.count(F.lit(1)).alias("n_days"),
            F.lit(0).cast("bigint").alias("n_pairs"),
            F.lit(None).cast("double").alias("slope"),
            F.lit(None).cast("double").alias("intercept"),
        )
    slope_row = (
        _median_by_rank(slopes, "__s", n_pairs)
        .select(F.col("__med").alias("__slope"))
        # pinned: feeds the residual frame AND the final select
        .localCheckpoint(eager=False)
    )
    resid = daily.crossJoin(F.broadcast(slope_row)).select(
        (
            F.col("__rd").cast("double")
            - F.col("__slope") * F.col("__dn").cast("double")
        ).alias("__r"),
        "__slope",
    )
    n_days = daily.count()
    int_row = _median_by_rank(resid, "__r", n_days).select(
        F.col("__med").alias("__int")
    )
    return (
        slope_row.crossJoin(F.broadcast(int_row))
        .select(
            F.lit(n_days).cast("bigint").alias("n_days"),
            F.lit(n_pairs).cast("bigint").alias("n_pairs"),
            F.round(F.col("__slope"), 6).alias("slope"),
            F.round(F.col("__int"), 6).alias("intercept"),
        )
    )


def seasonal_decompose(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of the daily rollup:
    ``value = trend + seasonal + residual`` — the "is Monday always low
    or is something broken" view that turns the raw daily series into
    three readable components (the moving-average sibling of
    :func:`seasonal_naive_backtest`, which scores rather than
    explains). Trend is the centered ``period``-day moving average
    (null at the edges and wherever the calendar window is not fully
    present — gaps make a centered average lie); seasonal is the
    mean-centered per-phase (``epoch_day mod period``) average of the
    detrended series; residual is what remains.

    ``period`` must be odd and >= 3 (a centered window needs a middle
    day; weekly = 7). Scale: everything after the ONE day-grain
    collapse runs on the calendar-bounded daily frame — the documented
    benign window class shared with the rollup/anomaly operators; the
    phase table is ``period`` rows, broadcast back.

    Determinism: daily totals are exact DECIMAL(18,6); trend is one
    fixed IEEE division of the exact window sum; detrended values
    quantize to 12dp DECIMAL(28,12) before the per-phase mean (the
    chi-square cell rule), per-phase means re-quantize to 12dp before
    the centering sum, so every accumulation is order-independent;
    outputs are 6dp. Returns ``(day, value, trend, seasonal, residual)``
    — seasonal/residual null where trend is null."""
    if period < 3 or period % 2 == 0:
        raise ValueError(f"period must be odd and >= 3, got {period}")
    half = period // 2
    daily = _daily_frame(events, value_col, ts_col).localCheckpoint(
        eager=False
    )  # pinned: feeds the trend frame AND the phase aggregate
    w = Window.orderBy("__dn").rangeBetween(-half, half)
    full = F.count(F.lit(1)).over(w) == period
    trend = F.when(
        full,
        F.sum("__rd").over(w).cast("double") / F.lit(float(period)),
    )
    t_frame = daily.select(
        "day",
        "__dn",
        F.col("__rd").cast("double").alias("__y"),
        trend.alias("__t"),
        F.pmod(F.col("__dn"), F.lit(period)).alias("__phase"),
    ).localCheckpoint(eager=False)  # feeds phase means AND the output
    det_q = F.round(F.col("__y") - F.col("__t"), 12).cast("decimal(28,12)")
    phase_means = (
        t_frame.filter(F.col("__t").isNotNull())
        .groupBy("__phase")
        .agg(
            F.round(
                F.sum(det_q).cast("double") / F.count(F.lit(1)).cast("double"),
                12,
            )
            .cast("decimal(28,12)")
            .alias("__pm")
        )
    )
    center = phase_means.agg(
        (
            F.sum("__pm").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__c")
    )
    seas = phase_means.crossJoin(F.broadcast(center)).select(
        "__phase",
        (F.col("__pm").cast("double") - F.col("__c")).alias("__s"),
    )
    out = t_frame.join(F.broadcast(seas), "__phase", "left")
    seasonal = F.when(F.col("__t").isNotNull(), F.col("__s"))
    return out.select(
        F.col("day").cast("string").alias("day"),
        F.round(F.col("__y"), 6).alias("value"),
        F.round(F.col("__t"), 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(F.col("__y") - F.col("__t") - seasonal, 6).alias("residual"),
    )


def pettitt_test(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Pettitt change-point test on the daily rollup — the
    nonparametric "WHEN did the series shift" companion to
    :func:`detect_level_shift` (which needs a window width) and
    :func:`trend_test` (which assumes a monotone drift): finds the
    single most likely abrupt change in the daily-total distribution
    with no distributional assumptions, via the rank statistic
    ``U_t = 2·S_t − t(N+1)`` (``S_t`` = sum of the midranks of the
    first ``t`` days); the change day maximizes ``|U_t|`` and the
    classic approximation ``p ≈ 2·exp(−6K²/(N³+N²))`` calibrates it.

    Scale: everything after the ONE day-grain collapse
    (:func:`_daily_frame`) runs on the calendar-bounded daily frame —
    the documented benign window class of this module. Determinism:
    ``2·midrank = 2·min_rank + t_v − 1`` and therefore ``2·S_t`` and
    ``U_t`` are exact INTEGERS (midranks over a doubled scale), so
    ``K = max|U_t|`` is exact; ties on ``|U_t|`` resolve to the
    EARLIEST day (min-day over argmax — deterministic both engines);
    the p-value is one fixed IEEE expression over (K, N), clamped to
    [0, 1]. Returns one row ``(n_days, change_day, k_stat, p_value)``;
    zero rows when the series has < 2 days (no interior split point
    exists — ``U_N ≡ 0`` is anchored, not a candidate)."""
    daily = _daily_frame(events, value_col, ts_col)
    w_rank = Window.orderBy("__rd")
    t_v = Window.partitionBy("__rd")
    two_mid = (
        F.lit(2) * F.rank().over(w_rank)
        + F.count(F.lit(1)).over(t_v)
        - F.lit(1)
    ).cast("bigint")
    w_day = Window.orderBy("__dn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    t_idx = F.row_number().over(Window.orderBy("__dn")).cast("bigint")
    ranked = daily.select(
        "day", "__dn", two_mid.alias("__2r")
    )
    nn = ranked.agg(F.count(F.lit(1)).alias("__nd"))
    u = (
        ranked.crossJoin(F.broadcast(nn))
        .select(
            "day",
            "__dn",
            "__nd",
            (
                F.sum("__2r").over(w_day)
                - t_idx * (F.col("__nd") + F.lit(1))
            ).alias("__u"),
            t_idx.alias("__t"),
        )
        # t = N is the anchored endpoint (U_N ≡ 0) — not a candidate
        .filter(F.col("__t") < F.col("__nd"))
    )
    best = u.groupBy("__nd").agg(
        F.max(F.abs(F.col("__u"))).alias("__k")
    )
    pick = (
        u.join(F.broadcast(best), "__nd")
        .filter(F.abs(F.col("__u")) == F.col("__k"))
        .groupBy("__nd", "__k")
        .agg(F.min("day").alias("__day"))
    )
    ndd = F.col("__nd").cast("double")
    kd = F.col("__k").cast("double")
    p = F.least(
        F.lit(1.0),
        F.lit(2.0)
        * F.exp(
            F.lit(-6.0) * kd * kd / (ndd * ndd * ndd + ndd * ndd)
        ),
    )
    return pick.select(
        F.col("__nd").alias("n_days"),
        F.col("__day").cast("string").alias("change_day"),
        F.col("__k").alias("k_stat"),
        F.round(p, 6).alias("p_value"),
    )


def acf_report(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    max_lag: int = 14,
) -> DataFrame:
    """Lag-k autocorrelation of the daily rollup, k = 1..``max_lag`` —
    the "is there a weekly cycle / how fast does the series forget"
    diagnostic that tells :func:`seasonal_decompose` which period to
    use and :func:`ewma_daily` how much memory matters.  Per-lag
    Pearson over the aligned day pairs ``(x_t, x_{t+k})`` (the
    sample-pair variant: each lag correlates only the days BOTH
    endpoints of which exist, so calendar gaps shrink ``n_pairs``
    instead of fabricating zeros; the classic
    divide-by-global-variance ACF assumes a gapless series).

    Scale: everything after the ONE day-grain collapse runs on the
    calendar-bounded daily frame — the documented benign class of this
    module; the lag fan-out is an in-row ``explode(sequence(...))``
    (``max_lag`` rows per day) followed by a day-keyed self-join of
    the bounded frame.  Determinism: daily totals are exact
    DECIMAL(18,6); per-lag moments accumulate as exact decimals
    (products as DECIMAL(38,12)); each lag's coefficient is one fixed
    IEEE expression.  Returns EXACTLY one row per lag 1..``max_lag``
    ``(lag, n_pairs, acf)`` — a lag with zero aligned pairs (series
    shorter than the lag, or a gap swallowing it) reports
    ``n_pairs = 0`` with null acf rather than silently vanishing (a
    consumer iterating the lags must see the hole); acf is also null
    when a lag has < 2 pairs or either margin degenerates."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    daily = _daily_frame(events, value_col, ts_col).localCheckpoint(
        eager=False
    )  # pinned: feeds both sides of the lag join
    lhs = daily.select(
        "__dn",
        F.col("__rd").alias("__x"),
        F.explode(
            F.expr(f"sequence(1, {int(max_lag)})")
        ).alias("lag"),
    ).withColumn("__dn2", F.col("__dn") + F.col("lag"))
    rhs = daily.select(
        F.col("__dn").alias("__dn2"), F.col("__rd").alias("__y")
    )
    pairs = lhs.join(rhs, "__dn2")
    d12 = "decimal(38,12)"
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum((F.col("__x") * F.col("__y")).cast(d12)).alias("__sxy"),
        F.sum((F.col("__x") * F.col("__x")).cast(d12)).alias("__sxx"),
        F.sum((F.col("__y") * F.col("__y")).cast(d12)).alias("__syy"),
    )
    nd = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    vx = nd * F.col("__sxx").cast("double") - sx * sx
    vy = nd * F.col("__syy").cast("double") - sy * sy
    r = F.when(
        (F.col("__n") >= 2) & (vx > 0) & (vy > 0),
        (nd * F.col("__sxy").cast("double") - sx * sy)
        / F.sqrt(vx * vy),
    )
    got = m.select(
        "lag",
        F.col("__n").alias("n_pairs"),
        F.round(r, 6).alias("acf"),
    )
    # every requested lag appears, even with zero pairs (doc contract)
    all_lags = events.sparkSession.range(1, int(max_lag) + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    return all_lags.join(got, "lag", "left").select(
        "lag",
        F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
        "acf",
    )


def mann_kendall_test(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    z_threshold: float = 1.959964,
) -> DataFrame:
    """Mann-Kendall monotone-trend test on the daily rollup — the
    significance companion to :func:`theil_sen_trend` (which estimates
    the slope this test certifies) and the nonparametric alternative
    to fitting a line and eyeballing r²: is the daily series going
    somewhere, without assuming linearity or normality?
    ``S = Σ_{i<j} sgn(x_j − x_i)`` over time-ordered days, the
    tie-corrected variance ``(n(n−1)(2n+5) − Σt(t−1)(2t+5))/18``, and
    the standard continuity-corrected z.

    Scale: the pair sum runs on the self-joined CALENDAR-BOUNDED daily
    frame (the theil_sen day-pair shape — k days → k²/2 pairs, bounded
    by the calendar, not the data). Determinism: S is an exact integer
    sum of {−1, 0, 1} over exact decimal comparisons; the tie term is
    an exact decimal; z is one fixed IEEE expression. Returns one row
    ``(n_days, s_stat, z, significant)``; z null when n < 2 or the
    variance degenerates (all days tied)."""
    daily = _daily_frame(events, value_col, ts_col).localCheckpoint(
        eager=False
    )  # pinned: feeds both pair sides, the tie term, and the count
    a = daily.select(
        F.col("__dn").alias("__da"), F.col("__rd").alias("__xa")
    )
    b = daily.select(
        F.col("__dn").alias("__db"), F.col("__rd").alias("__xb")
    )
    s = (
        a.join(b, F.col("__da") < F.col("__db"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("__xb") > F.col("__xa"), 1)
                    .when(F.col("__xb") < F.col("__xa"), -1)
                    .otherwise(0)
                    .cast("bigint")
                ),
                F.lit(0),
            ).alias("__s")
        )
    )
    ties = daily.groupBy("__rd").agg(F.count(F.lit(1)).alias("__t"))
    tt = ties.agg(
        F.coalesce(
            F.sum(
                F.expr(
                    "CAST(__t AS DECIMAL(38,0)) * (__t - 1) * (2 * __t + 5)"
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        )
        .cast("double")
        .alias("__tt"),
        F.sum("__t").alias("__nd"),
    )
    m = s.crossJoin(F.broadcast(tt))
    nd = F.col("__nd").cast("double")
    var = (
        nd * (nd - F.lit(1.0)) * (F.lit(2.0) * nd + F.lit(5.0))
        - F.col("__tt")
    ) / F.lit(18.0)
    sd = F.col("__s").cast("double")
    z = F.when(
        (F.col("__nd") >= 2) & (var > 0),
        F.when(F.col("__s") > 0, (sd - F.lit(1.0)) / F.sqrt(var))
        .when(F.col("__s") < 0, (sd + F.lit(1.0)) / F.sqrt(var))
        .otherwise(F.lit(0.0)),
    )
    z6 = F.round(z, 6)
    return m.select(
        F.col("__nd").alias("n_days"),
        F.col("__s").alias("s_stat"),
        z6.alias("z"),
        F.coalesce(
            (F.abs(z6) >= F.lit(z_threshold)).cast("int"), F.lit(0)
        ).alias("significant"),
    )


def _centered_acf_sidecar(
    events: DataFrame,
    value_col: str,
    ts_col: str,
    max_lag: int,
) -> dict:
    """The bounded sidecar behind :func:`pacf_report` /
    :func:`ljung_box_report`: the STANDARD (single-global-mean,
    total-SS-denominator) autocorrelation sequence of the daily
    rollup — the statsmodels ``acf(adjusted=False)`` convention the
    Durbin-Levinson recursion and the Ljung-Box Q are defined over
    (the sample-pair Pearson of :func:`acf_report` re-estimates the
    margins per lag, which is the better standalone diagnostic but
    NOT a valid input to either recursion).

    Two passes over the calendar-bounded daily frame: (1) one 1-row
    aggregate for ``n`` / the 6dp global mean, (2) the lag fan-out +
    day-keyed self-join of :func:`acf_report` with the centered
    products at the mean LITERAL, 12dp-rounded into DECIMAL(38,12)
    sums (order-independent).  Calendar gaps shrink a lag's pair set
    (complete-case) rather than fabricating zeros.  Returns ``{"n":
    days, "mean": x̄₆, "ss": Σ(x−x̄)², "c": {lag: Σ(xₜ−x̄)(xₜ₊ₖ−x̄)},
    "rho": {lag: c/ss}}`` with ``rho`` in float — the one shared
    vocabulary the Spark operators and the DuckDB oracle builders
    both consume."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    daily = _daily_frame(events, value_col, ts_col).localCheckpoint(
        eager=False
    )  # pinned: feeds the mean pass and both sides of the lag join
    d12 = "decimal(38,12)"
    head = daily.agg(
        F.count(F.lit(1)).alias("n"), F.sum("__rd").alias("sx")
    ).collect()[0]
    n = int(head["n"])
    if n < max_lag + 2:
        raise ValueError(
            f"need at least max_lag + 2 = {max_lag + 2} days, got {n}"
        )
    mean = round(float(head["sx"]) / n, 6)
    cen = F.round(F.col("__rd").cast("double") - F.lit(mean), 6)
    ss_row = daily.agg(
        F.sum(F.round(cen * cen, 12).cast(d12)).alias("ss")
    ).collect()[0]
    ss = float(ss_row["ss"])
    lhs = daily.select(
        F.col("__dn").alias("__d"),
        cen.alias("__cx"),
        F.explode(F.expr(f"sequence(1, {int(max_lag)})")).alias("lag"),
    ).withColumn("__d2", F.col("__d") + F.col("lag"))
    rhs = daily.select(F.col("__dn").alias("__d2"), cen.alias("__cy"))
    rows = (
        lhs.join(rhs, "__d2")
        .select(
            "lag",
            F.round(F.col("__cx") * F.col("__cy"), 12)
            .cast(d12)
            .alias("__p"),
        )
        .groupBy("lag")
        .agg(F.sum("__p").alias("c"))
        .collect()
    )
    c = {int(r["lag"]): float(r["c"]) for r in rows}
    rho = {
        k: (c.get(k, 0.0) / ss if ss > 0 else 0.0)
        for k in range(1, max_lag + 1)
    }
    return {"n": n, "mean": mean, "ss": ss, "c": c, "rho": rho}


def durbin_levinson_pacf(rho: dict[int, float]) -> dict[int, float]:
    """Partial autocorrelations from the autocorrelation sequence via
    the Durbin-Levinson recursion (statsmodels ``pacf(method='ld')``)
    — pure driver arithmetic over the bounded lag sidecar, ONE shared
    implementation for the Spark operator and the DuckDB oracle
    builder.  ``pacf[k]`` is the last coefficient of the order-k
    Yule-Walker fit; a degenerate step (1 − φ·ρ ≤ 0, a
    non-positive-definite sample sequence) yields None from that lag
    on rather than dividing by ~0 into garbage."""
    lags = sorted(rho)
    out: dict[int, float] = {}
    phi_prev: list[float] = []
    denom = 1.0
    dead = False
    for k in lags:
        if dead:
            out[k] = None
            continue
        num = rho[k] - sum(
            p * rho[k - 1 - i] for i, p in enumerate(phi_prev)
        )
        if denom <= 1e-12:
            out[k] = None
            dead = True
            continue
        a = num / denom
        out[k] = a
        phi = [
            p - a * phi_prev[len(phi_prev) - 1 - i]
            for i, p in enumerate(phi_prev)
        ] + [a]
        denom = denom * (1.0 - a * a)
        phi_prev = phi
    return out


def pacf_report(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Partial autocorrelation of the daily rollup at lags
    1..``max_lag`` — "how much does day t−k explain day t AFTER the
    intermediate days are regressed out", the AR-order selector that
    tells you which lags belong in an autoregression (statsmodels
    ``pacf(method='ld')`` over the standard ACF).

    Scale: the distributed work is exactly the
    :func:`_centered_acf_sidecar` passes (one 1-row mean aggregate +
    one lag-fanned self-join of the calendar-bounded daily frame);
    the Durbin-Levinson recursion is driver arithmetic over the
    ``max_lag``-row sidecar through the SAME shared
    :func:`durbin_levinson_pacf` the oracle replays.  Returns one row
    per lag ``(lag, acf, pacf)``, 6dp."""
    side = _centered_acf_sidecar(events, value_col, ts_col, max_lag)
    pac = durbin_levinson_pacf(side["rho"])
    rows = [
        (
            k,
            round(side["rho"][k], 6),
            round(pac[k], 6) if pac[k] is not None else None,
        )
        for k in sorted(side["rho"])
    ]
    return events.sparkSession.createDataFrame(
        rows, "lag int, acf double, pacf double"
    )


def ljung_box_report(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    max_lag: int = 7,
) -> DataFrame:
    """Ljung-Box portmanteau whiteness test on the daily rollup —
    ``Q(k) = n(n+2) Σ_{j<=k} ρ̂²_j/(n−j)`` at every lag 1..``max_lag``
    (statsmodels ``acorr_ljungbox``): is the series distinguishable
    from white noise using the first k autocorrelations jointly?
    Compare against the chi-square critical value for ``dof = k``
    client-side (the CDF is not SQL arithmetic — the
    :func:`~.experiment.chi_square_report` convention).

    Scale: identical distributed shape to :func:`pacf_report` (the
    shared sidecar passes); the cumulative Q is driver arithmetic
    over the bounded sidecar.  Returns one row per lag ``(lag, acf,
    q_stat, dof)``, 6dp."""
    side = _centered_acf_sidecar(events, value_col, ts_col, max_lag)
    n = side["n"]
    rows = []
    q = 0.0
    for k in sorted(side["rho"]):
        q += side["rho"][k] ** 2 / (n - k)
        rows.append(
            (
                k,
                round(side["rho"][k], 6),
                round(n * (n + 2) * q, 6),
                k,
            )
        )
    return events.sparkSession.createDataFrame(
        rows, "lag int, acf double, q_stat double, dof int"
    )


def adf_report(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    lag_order: int = 1,
    scale: float = 1.0,
) -> DataFrame:
    """Augmented Dickey-Fuller unit-root regression on the daily
    rollup (constant, no trend): ``Δxₜ = α + γ·xₜ₋₁ +
    Σ_{i<=p} φᵢ·Δxₜ₋ᵢ + ε`` — is the series mean-reverting
    (γ < 0, stationary) or a random walk (γ ≈ 0)?  ``tau`` is the
    Dickey-Fuller t on γ̂; compare against the DF critical values
    (−2.86 at 5% for the constant-only case) client-side — the DF
    distribution is nonstandard, tabulated, and not SQL arithmetic
    (the chi_square_report convention).  statsmodels
    ``adfuller(x, maxlag=p, autolag=None, regression='c')`` parity
    on a gapless series.

    Scale: each lagged term is a day-keyed equi-join of the
    calendar-bounded daily frame against itself at ``t−i`` (the
    :func:`acf_report` alignment — calendar gaps drop the affected
    rows, complete-case, never fabricated zeros); the regression is
    the SAME shared exact-decimal :func:`~.regression.ols_moments`
    1-row pass + driver solve every other regression entry uses.
    Returns one row ``(n_obs, lag_order, gamma, tau, alpha)``.

    ``scale`` multiplies the daily series BEFORE the 6dp quantization
    (applied identically by the oracle replay).  The normal equations
    square the design's column-scale spread — a daily total in the
    1e5–1e6 range against the constant regressor 1 drives
    ``cond(XᵀX)`` past the shared solver's 1e12 guard as the data
    grows (measured 1.5e12 at bench scale), so total-valued series
    pass their natural unit here (e.g. 1e-3 for "daily revenue in
    thousands"); γ and α are reported in the scaled unit, τ is
    scale-free."""
    from .regression import ols_moments, ols_solve_from_moments

    if lag_order < 0:
        raise ValueError(f"lag_order must be >= 0, got {lag_order}")
    daily = _daily_frame(events, value_col, ts_col).localCheckpoint(
        eager=False
    )  # pinned: feeds one join side per lagged term
    xraw = F.col("__rd").cast("double")
    if scale != 1.0:
        xraw = xraw * F.lit(float(scale))
    xd = F.round(xraw, 6)
    base = daily.select(F.col("__dn").alias("__d"), xd.alias("__x0"))
    # shifted copies x_{t-s} for s = 1..lag_order+1 (dy_i needs s=i+1)
    cur = base
    for s in range(1, lag_order + 2):
        sh = daily.select(
            (F.col("__dn") + F.lit(s)).alias("__d"),
            xd.alias(f"__x{s}"),
        )
        cur = cur.join(sh, "__d")
    cols = [
        F.round(F.col("__x0") - F.col("__x1"), 6).alias("__dy"),
        F.col("__x1").alias("__y1"),
    ]
    for i in range(1, lag_order + 1):
        cols.append(
            F.round(F.col(f"__x{i}") - F.col(f"__x{i + 1}"), 6).alias(
                f"__dy{i}"
            )
        )
    frame = cur.select(*cols)
    xs = ["__y1"] + [f"__dy{i}" for i in range(1, lag_order + 1)]
    sol = ols_solve_from_moments(ols_moments(frame, "__dy", xs), xs)
    row = adf_finish(sol, lag_order)
    return events.sparkSession.createDataFrame(
        [row],
        "n_obs bigint, lag_order int, gamma double, tau double,"
        " alpha double",
    )


def adf_finish(sol: dict, lag_order: int) -> tuple:
    """The (n_obs, lag_order, gamma, tau, alpha) readout of the ADF
    regression's shared OLS solve — ONE implementation consumed by
    :func:`adf_report` and the DuckDB oracle builder so the tau
    arithmetic can never drift between engines."""
    gamma = sol["coef"][1]
    se = sol["std_err"][1]
    tau = (
        round(gamma / se, 6) if se is not None and se > 0 else None
    )
    return (int(sol["n"]), int(lag_order), gamma, tau, sol["coef"][0])


def holt_linear(vals: list[float], alpha: float, beta: float) -> tuple:
    """Holt's linear-trend recursion over the observed sequence — ONE
    shared implementation for the Spark operator and the DuckDB
    oracle builder (pure IEEE driver arithmetic, no engine maths):
    ``l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})``, ``b_t = β(l_t −
    l_{t−1}) + (1−β)·b_{t−1}``, initialized ``l_0 = y_0, b_0 = y_1 −
    y_0`` (the classic two-point start).  Returns ``(level, trend)``
    after the last observation."""
    if len(vals) < 2:
        raise ValueError(
            f"holt: need at least 2 observations, got {len(vals)}"
        )
    level = vals[0]
    trend = vals[1] - vals[0]
    for y in vals[1:]:
        prev = level
        level = alpha * y + (1.0 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1.0 - beta) * trend
    return level, trend


def holt_forecast_report(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 7,
) -> DataFrame:
    """Holt (double exponential smoothing) h-step forecasts of the
    daily rollup — the level+trend sibling of :func:`ewma_daily`
    (statsmodels ``Holt(initialization_method='legacy-heuristic')``-
    adjacent; the fixed two-point start keeps the trajectory
    deterministic and oracle-replayable).  The recursion runs over
    OBSERVED days in calendar order (a gap does not fabricate a zero
    day — the series is the sequence of days that exist, the
    :func:`acf_report` complete-case stance).

    Scale: the distributed work is the ONE day-grain collapse; the
    recursion is inherently sequential but runs over the
    CALENDAR-BOUNDED daily sidecar on the driver (this module's
    documented benign class — bounded by days elapsed, not data), via
    the SAME shared :func:`holt_linear` the oracle replays.  Returns
    ``(h, forecast)`` for h = 1..``horizon``: ``forecast = level +
    h·trend``, 6dp."""
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError(
            f"holt: need 0 < alpha <= 1 and 0 <= beta <= 1, got "
            f"alpha={alpha}, beta={beta}"
        )
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    rows = (
        _daily_frame(events, value_col, ts_col)
        .orderBy("__dn")
        .select(F.col("__rd").cast("double").alias("__v"))
        .collect()
    )
    level, trend = holt_linear([r["__v"] for r in rows], alpha, beta)
    out = [
        (h, round(level + h * trend, 6)) for h in range(1, horizon + 1)
    ]
    return events.sparkSession.createDataFrame(
        out, "h int, forecast double"
    )
