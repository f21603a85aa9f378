"""Dataset profiling and feature prep: one-pass exact correlations,
percentile winsorization, leave-one-out target encoding.

Extensions (SURVEY §2.9): the steps between ``profile_numeric`` and a
model — "which measures move together" (correlation matrix from ONE
aggregation pass: per column Σx and Σx², per pair Σxy, coefficients as
closed-form arithmetic on the aggregate row — no ``df.stat.corr`` loop,
which runs one job per pair), outlier capping at percentile fences, and
the no-leak categorical encoding.

Determinism (the repo-wide contract): all moments accumulate as DECIMALS
— a double Σxy is partition-order-dependent, a decimal one is exact, so
Spark and DuckDB agree bitwise on the inputs to the final fixed IEEE
expression ``(n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̄) · √(n·Σy² − Σy²̄))``.
Products widen one operand to DECIMAL(19,6) (DuckDB does not auto-grow
product precision the way Spark does — the anomaly-detection precedent).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str | None = None,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Clamp ``value_col`` to its (per-group) ``[lower, upper]``
    percentile fences — the outlier-capping step feature pipelines run
    before scaling (a single fat-finger value otherwise owns the
    min-max range). Adds ``out_col`` (default ``<value_col>_w``) with
    the clamped value; null values stay null; all other columns pass
    through.

    Exact percentiles (Spark's sort-based ``percentile``, type-7 — the
    `quantile_cont` parity the quantile entries pinned) from ONE
    aggregation keyed by the group columns, joined back on the key —
    AQE broadcasts the group-cardinality fence frame when it is small
    and shuffles co-keyed when it is not (a FORCED broadcast would OOM
    on a high-cardinality group column — the target_encode rule); the
    clamp itself is an in-row ``least(greatest(...))``. ``exact=False``
    is the 100 TB path: ``approx_percentile`` (Greenwald–Khanna with
    ``accuracy``-bounded error) replaces the value-buffering exact
    aggregate with a fixed-size summary that folds map-side — the rest
    of the plan is unchanged. Ungrouped (``group_cols=None``) uses a
    single global fence row (that one IS a forced 1-row broadcast)."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(
            f"need 0 <= lower < upper <= 1, got ({lower}, {upper})"
        )
    out_col = out_col or f"{value_col}_w"
    fn = "percentile" if exact else f"approx_percentile"
    acc = "" if exact else f", {accuracy}"
    fences_agg = [
        F.expr(f"{fn}({value_col}, {lower}D{acc})").alias("__lo"),
        F.expr(f"{fn}({value_col}, {upper}D{acc})").alias("__hi"),
    ]
    if group_cols:
        fences = df.groupBy(*group_cols).agg(*fences_agg)
        joined = df.join(fences, group_cols, "left")
    else:
        fences = df.agg(*fences_agg)
        joined = df.crossJoin(F.broadcast(fences))
    # explicit null guard: least/greatest SKIP nulls in both engines, so
    # a bare clamp would turn a null value into the lower fence
    clamped = F.when(
        F.col(value_col).isNotNull(),
        F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
    )
    return joined.select(
        *df.columns, clamped.alias(out_col)
    )


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: list[float],
    out_cols: list[str] | None = None,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group quantiles of ``value_col`` at each probability in
    ``probs`` — the distribution-summary aggregate behind every "p50/p95
    latency by segment" dashboard. ``exact=True`` uses Spark's
    sort-based ``percentile`` (type-7 linear interpolation — bitwise
    parity with DuckDB's ``quantile_cont``, the oracle-able form; it
    buffers every group value in the aggregate, memory ∝ group size).
    ``exact=False`` is the 100 TB path: one-pass ``approx_percentile``
    (Greenwald–Khanna, ``accuracy``-bounded rank error) whose per-group
    state is a FIXED-SIZE summary that folds map-side — group size never
    touches executor memory. Same plan shape otherwise: one partial-
    aggregated groupBy, output is group-cardinality-sized. 6dp-rounded
    doubles either way."""
    if not probs:
        raise ValueError("probs must be non-empty")
    out_cols = out_cols or [
        "p" + format(p * 100, "g").replace(".", "_") for p in probs
    ]
    if len(out_cols) != len(probs):
        raise ValueError("out_cols must match probs in length")
    arr = "array(" + ", ".join(f"{p}D" for p in probs) + ")"
    fn = (
        f"percentile({value_col}, {arr})"
        if exact
        else f"approx_percentile({value_col}, {arr}, {accuracy})"
    )
    agged = df.groupBy(*group_cols).agg(F.expr(fn).alias("__q"))
    return agged.select(
        *group_cols,
        *[
            F.round(F.element_at("__q", i + 1).cast("double"), 6).alias(c)
            for i, c in enumerate(out_cols)
        ],
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Leave-one-out target encoding: row *i* in category *c* gets the
    mean target of the OTHER rows of its category,
    ``(Σ_c − y_i) / (n_c − 1)`` — the standard high-cardinality
    categorical encoding that doesn't leak the row's own label (a plain
    category mean memorizes singletons and the model reads its own
    target). Fallbacks, all deterministic: null category or empty
    category → the global mean (the prior); a null-target row → the
    plain category mean (it contributed nothing to Σ_c); a singleton's
    own row → the prior (no "others" exist).

    Scale: one partial-aggregated groupBy on the category (category-
    cardinality output) joined back on the same key — AQE broadcasts it
    when small, shuffles co-keyed when not; the global prior is a 1-row
    broadcast; the encoding itself is one in-row CASE. Sums accumulate
    as DECIMAL(18,6) (order-independence), division in double,
    6dp-rounded."""
    out_col = out_col or f"{cat_col}_te"
    tgt_dec = F.col(target_col).cast("decimal(18,6)")
    per_cat = df.groupBy(cat_col).agg(
        F.sum(tgt_dec).alias("__cs"),
        F.count(F.when(F.col(target_col).isNotNull(), 1)).alias("__cn"),
    )
    prior = df.agg(
        F.sum(tgt_dec).alias("__gs"),
        F.count(F.when(F.col(target_col).isNotNull(), 1)).alias("__gn"),
    )
    j = df.join(per_cat, cat_col, "left").crossJoin(F.broadcast(prior))
    y = F.col(target_col).cast("double")
    cs = F.col("__cs").cast("double")
    cn = F.col("__cn").cast("double")
    gmean = F.col("__gs").cast("double") / F.col("__gn").cast("double")
    enc = (
        F.when(F.col(cat_col).isNull() | (F.coalesce("__cn", F.lit(0)) == 0), gmean)
        .when(F.col(target_col).isNull(), cs / cn)
        .when(F.col("__cn") == 1, gmean)
        .otherwise((cs - y) / (cn - F.lit(1.0)))
    )
    return j.select(*df.columns, F.round(enc, 6).alias(out_col))


def trend_lines(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group simple linear regression (closed-form OLS): slope,
    intercept, r² and n for ``y ~ x`` within each group — "what's the
    revenue trend per segment" as ONE partial-aggregated groupBy, the
    distributed closed form instead of an ML-library fit per group.

    Same machinery as :func:`correlation_matrix`: decimal moments
    (Σx, Σy, Σx², Σy², Σxy — order-independent), coefficients as fixed
    IEEE arithmetic on the aggregate row:
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)``,
    ``intercept = (Σy − slope·Σx) / n``, ``r² = corr²``. Complete cases
    only (either column null drops the row); a degenerate x (constant
    within its group) yields null slope/intercept/r². Ungrouped
    (``group_cols=None``) emits one global row. 6dp-rounded."""

    def dec(c: str) -> F.Column:
        return F.col(c).cast("decimal(18,6)")

    def dec_wide(c: str) -> F.Column:
        return F.col(c).cast("decimal(19,6)")

    base = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(x_col)).alias("__sx"),
        F.sum(dec(y_col)).alias("__sy"),
        F.sum(dec_wide(x_col) * dec(x_col)).alias("__sxx"),
        F.sum(dec_wide(y_col) * dec(y_col)).alias("__syy"),
        F.sum(dec_wide(x_col) * dec(y_col)).alias("__sxy"),
    ]
    grouped = (
        base.groupBy(*group_cols).agg(*aggs) if group_cols else base.agg(*aggs)
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    sxy = F.col("__sxy").cast("double")
    den_x = n * sxx - sx * sx
    num = n * sxy - sx * sy
    slope = F.when(den_x > 0, num / den_x)
    intercept = (sy - slope * sx) / n
    den_y = n * syy - sy * sy
    r2 = F.when((den_x > 0) & (den_y > 0), (num * num) / (den_x * den_y))
    return grouped.select(
        *(group_cols or []),
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pearson correlation for every unordered pair of ``cols``, complete
    cases only (rows with a null in ANY profiled column are excluded —
    pairwise-deletion would need per-pair counts and yields matrices
    that aren't positive semi-definite). Output: one
    ``(col_x, col_y, corr)`` row per pair, 6dp-rounded; a degenerate
    (constant) column yields null against everything."""
    if len(cols) < 2:
        raise ValueError("need at least 2 columns to correlate")
    cond = None
    for c in cols:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else (cond & nn)
    base = df.filter(cond)

    def dec(c: str) -> F.Column:
        return F.col(c).cast("decimal(18,6)")

    def dec_wide(c: str) -> F.Column:
        # one operand widened: keeps the product rule identical across
        # engines (DuckDB multiplies (19,6)x(18,6) without overflow)
        return F.col(c).cast("decimal(19,6)")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(dec(c)).alias(f"__s_{c}"))
        aggs.append(F.sum(dec_wide(c) * dec(c)).alias(f"__ss_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(dec_wide(a) * dec(b)).alias(f"__sp_{a}_{b}"))
    stats = base.agg(*aggs)

    n = F.col("__n").cast("double")
    pair_rows = []
    for a, b in combinations(cols, 2):
        sa = F.col(f"__s_{a}").cast("double")
        sb = F.col(f"__s_{b}").cast("double")
        saa = F.col(f"__ss_{a}").cast("double")
        sbb = F.col(f"__ss_{b}").cast("double")
        sab = F.col(f"__sp_{a}_{b}").cast("double")
        num = n * sab - sa * sb
        da = F.sqrt(n * saa - sa * sa)
        db = F.sqrt(n * sbb - sb * sb)
        den = da * db
        corr = F.when(den > 0, F.round(num / den, 6))
        pair_rows.append(
            F.struct(
                F.lit(a).alias("col_x"), F.lit(b).alias("col_y"), corr.alias("corr")
            )
        )
    return stats.select(
        F.explode(F.array(*pair_rows)).alias("__p")
    ).select("__p.col_x", "__p.col_y", "__p.corr")


def benford_profile(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic numeric-forensics screen (fabricated or unit-mixed data
    drifts from the log curve). Per (group,) digit 1-9: count, observed
    share, expected Benford share ``log10(1 + 1/d)``, and the signed
    deviation. Rows whose value is null/zero take no digit and are
    excluded.

    The digit comes from the DECIMAL(18,6) string rendering (both
    engines print plain notation at a fixed scale — a double's string
    can go scientific, and log10/pow on raw doubles disagree in the
    last ulp near powers of ten), matched with one regexp. Zero-shuffle
    per row; one digit-keyed partial aggregate; expected shares are
    Python double literals."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    digit = F.regexp_extract(
        F.abs(F.col(value_col)).cast("decimal(18,6)").cast("string"),
        "[1-9]",
        0,
    )
    base = (
        df.select(*group_cols, digit.alias("digit"))
        .filter(F.col("digit") != "")
        .groupBy(*group_cols, "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    import math

    expected = F.element_at(
        F.array(*[F.lit(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)]),
        F.col("digit").cast("int"),
    )
    share = F.col("n").cast("double") / F.sum("n").over(wt).cast("double")
    return base.select(
        *group_cols,
        "digit",
        "n",
        F.round(share, 6).alias("share"),
        F.round(expected, 6).alias("benford_share"),
        F.round(share - expected, 6).alias("deviation"),
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    columns: list[str] | None = None,
) -> DataFrame:
    """Schema/distribution drift report between two snapshots of a
    table — the data-contract check an ingestion pipeline runs before
    promoting a batch: per column, presence in each side, null rate,
    distinct count, and (for numerics) the decimal-exact mean, with
    old→new deltas. One aggregation pass PER SIDE (all columns fold in
    one partial-aggregated job each, never a job per column), joined on
    the column name — a 2-row-per-column metadata frame at the end.

    Columns defaults to the union of both schemas; a column missing on
    one side reports null stats there (``status`` = added/removed).
    Distinct counts are exact here (the profile table is
    column-cardinality-sized); swap ``approx_count_distinct`` in at
    100 TB exactly as :func:`~intake_esm_spark.operators.grouping.nunique`
    does."""
    from decimal import ROUND_HALF_UP, Decimal

    def _r6(x: float | None) -> float | None:
        # F.round-compatible HALF_UP on the repr double (the repo's
        # oracle idiom) — python's built-in round() is HALF_EVEN and
        # would diverge from both engines on exact .5e-6 ties
        if x is None:
            return None
        return float(
            Decimal(repr(float(x))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )

    def side_stats(df: DataFrame, cols: list[str], tag: str):
        dtypes = dict(df.dtypes)
        aggs = [F.count(F.lit(1)).alias("__n")]
        present = [c for c in cols if c in df.columns]
        for c in present:
            aggs.append(
                F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}")
            )
            aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
            if dtypes.get(c) in ("int", "bigint", "double", "float", "smallint", "tinyint") or str(
                dtypes.get(c, "")
            ).startswith("decimal"):
                aggs.append(
                    F.sum(F.col(c).cast("decimal(18,6)")).alias(f"__s_{c}")
                )
        row = df.agg(*aggs).collect()[0]
        out = {}
        for c in present:
            n = row["__n"]
            nnull = int(row[f"__null_{c}"])
            s = row[f"__s_{c}"] if f"__s_{c}" in row.asDict() else None
            mean = (
                _r6(float(s) / (n - nnull))
                if s is not None and n - nnull > 0
                else None
            )
            out[c] = {
                f"dtype_{tag}": dtypes[c],
                f"null_rate_{tag}": _r6(nnull / n) if n else None,
                f"n_distinct_{tag}": int(row[f"__nd_{c}"]),
                f"mean_{tag}": mean,
            }
        return out

    cols = columns or sorted(set(old.columns) | set(new.columns))
    so = side_stats(old, cols, "old")
    sn = side_stats(new, cols, "new")
    spark = old.sparkSession
    rows = []
    for c in cols:
        o, n = so.get(c), sn.get(c)
        status = (
            "added" if o is None else "removed" if n is None else (
                "retyped"
                if o["dtype_old"] != n["dtype_new"]
                else "common"
            )
        )
        rows.append(
            (
                c,
                status,
                o["dtype_old"] if o else None,
                n["dtype_new"] if n else None,
                o["null_rate_old"] if o else None,
                n["null_rate_new"] if n else None,
                (
                    # a zero-row snapshot carries a None null_rate while
                    # the column is still status "common" — the delta is
                    # undefined (null), not a TypeError
                    _r6(n["null_rate_new"] - o["null_rate_old"])
                    if o
                    and n
                    and o["null_rate_old"] is not None
                    and n["null_rate_new"] is not None
                    else None
                ),
                o["n_distinct_old"] if o else None,
                n["n_distinct_new"] if n else None,
                o["mean_old"] if o else None,
                n["mean_new"] if n else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "column string, status string, dtype_old string, dtype_new string,"
        " null_rate_old double, null_rate_new double, null_rate_delta double,"
        " n_distinct_old bigint, n_distinct_new bigint,"
        " mean_old double, mean_new double",
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    outcome_col: str,
    id_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Model-evaluation lift/gains table: rank rows by ``score_col``
    descending into ``n_bins`` ntile bins (bin 1 = highest scores), and
    per bin report size, outcome total and rate, lift vs the base rate,
    and the cumulative capture share (gains) — how a ranking model's
    decile chart is read before anyone trusts its AUC.

    Determinism: the bin boundary is a TOTAL order (score desc +
    ``id_col`` tiebreak); outcomes accumulate as DECIMAL through both
    the bin sums and the cumulative window; rates/lift are fixed IEEE
    divisions of the exact sums, 6dp. Scale: the rank is the bucketed
    prefix sum (:func:`~.ranks.global_rank` — per-bucket windows, a
    broadcast ≤64-row offset table, NO single-task row-frame sort; the
    r9 Mann-Whitney discipline replacing the r8 unpartitioned ntile),
    the tile id pure rank arithmetic (:func:`~.ranks.ntile_from_rank` —
    identical remainder splits, so every boundary row keeps its bin);
    everything after is a ``n_bins``-row frame (its cumulative window
    is bin-bounded, the offset-table class). The rank runs with
    ``tie_fanout`` (round 11): clamped/quantized model scores mass at
    point values, and value-only bucketing would hold such a tied run
    in ONE window task — heavy scores sub-bucket by the id tiebreak.
    Null scores/outcomes/ids are excluded (a null id would break the
    total order the bin boundary stands on)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from pyspark.sql import Window

    from .ranks import global_rank, ntile_from_rank

    base = (
        df.filter(
            F.col(score_col).isNotNull()
            & F.col(outcome_col).isNotNull()
            & F.col(id_col).isNotNull()
        )
        .select(
            F.col(id_col),
            F.col(score_col).alias("__val"),
            F.col(outcome_col).cast("decimal(18,6)").alias("__y"),
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
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__y").cast("decimal(18,6)").alias("__ys"),
    )
    # grand totals from the pinned base (identical sums, and per_bin
    # stays single-reference — no checkpoint needed, so the bucketed
    # rank plan stays visible to the plan-shape pins)
    totals = base.agg(
        F.count(F.lit(1)).alias("__nt"),
        F.sum("__y").cast("decimal(18,6)").alias("__yt"),
    )
    wc = (
        Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_y = F.sum("__ys").over(wc).cast("decimal(18,6)")
    j = per_bin.crossJoin(F.broadcast(totals))
    rate = F.col("__ys").cast("double") / F.col("n_rows").cast("double")
    base_rate = F.col("__yt").cast("double") / F.col("__nt").cast("double")
    return j.select(
        "bin",
        "n_rows",
        F.round(F.col("__ys").cast("double"), 6).alias("outcome_total"),
        F.round(rate, 6).alias("outcome_rate"),
        F.round(rate / base_rate, 6).alias("lift"),
        F.round(
            cum_y.cast("double") / F.col("__yt").cast("double"), 6
        ).alias("cum_capture"),
    )


def gini_coefficient(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Gini coefficient of how unevenly ``value_col`` mass concentrates
    across ``key_col`` entities (0 = perfectly even, →1 = one entity
    holds everything) — the summary statistic behind the ABC/Pareto
    views: ``G = (2·Σ i·vᵢ − (n+1)·Σv) / (n·Σv)`` over the per-entity
    totals sorted ascending.

    Scale shape: ONE corpus exchange (the entity-keyed partial-agged
    rollup), then the formula is evaluated at the DISTINCT-VALUE grain:
    the rank-sum identity collapses every tie group of ``c`` entities
    at value ``v`` with ``N_prev`` entities below it into one exact
    term ``Σᵢ i·v = v·(c·N_prev + c(c+1)/2)`` (G is tie-invariant —
    any rank permutation within a tie group sums identically), and
    ``N_prev`` comes from the bucketed prefix sum
    (:func:`~.ranks.bucketed_cumsum` — the r9 Mann-Whitney discipline),
    so the r8 unpartitioned entity-frame ``row_number`` window is GONE.

    Determinism: per-entity totals accumulate as DECIMAL(18,6); rank
    sums are exact integers (DECIMAL(20,0), same width the per-row form
    used); each ``v·R`` term is an exact DECIMAL(38,6) product, so the
    cross-value sum is order-independent and the final expression one
    fixed IEEE division. Returns one row ``(n_entities, total,
    gini)``."""
    from .ranks import bucketed_cumsum

    per_key = (
        df.filter(F.col(key_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(F.col(key_col).alias("__k"))
        .agg(
            F.sum(F.expr(f"CAST({value_col} AS DECIMAL(18,6))")).alias("__v")
        )
    )
    per_val = per_key.groupBy(F.col("__v").alias("__val")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    ranked = bucketed_cumsum(per_val, ["__c"], val_col="__val")
    # rank sum of the tie group: ranks N_prev+1 .. N_prev+c, summed —
    # exact in DECIMAL(20,0) (≤ c·N ≲ 10²⁰ headroom at 3e9 entities)
    rank_sum = F.expr(
        "CAST(__c AS DECIMAL(20,0)) * (__cum___c - __c)"
        " + CAST(__c AS DECIMAL(20,0)) * (__c + 1) / 2"
    ).cast("decimal(20,0)")
    return ranked.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("n_entities"),
        F.round(
            F.sum(
                F.expr("CAST(__val * __c AS DECIMAL(28,6))")
            ).cast("double"),
            6,
        ).alias("total"),
        F.round(
            (
                F.lit(2.0)
                * F.sum(
                    (rank_sum * F.col("__val")).cast("decimal(38,6)")
                ).cast("double")
                - (F.sum("__c") + F.lit(1)).cast("double")
                * F.sum(
                    F.expr("CAST(__val * __c AS DECIMAL(28,6))")
                ).cast("double")
            )
            / (
                F.sum("__c").cast("double")
                * F.sum(
                    F.expr("CAST(__val * __c AS DECIMAL(28,6))")
                ).cast("double")
            ),
            6,
        ).alias("gini"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.0,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Robust outlier flagging by Median Absolute Deviation — the
    resistant alternative to the trailing z-score (one fat-finger value
    shifts a mean/stddev fence but not a median/MAD one; Leys et al.
    2013's recommendation over ±3σ). Adds three columns:
    ``<value_col>_med`` (the per-group median), ``<value_col>_mad``
    (median of |x − med|), and ``is_outlier``
    (``|x − med| > k · MAD``; null value or zero MAD → false, the
    all-identical-group guard). ``k=3`` ≈ 4.45σ under normality
    (scale MAD by 1.4826 to compare with σ directly).

    Two aggregation passes by construction (the inner median must exist
    before deviations do): (1) per-group median, joined back (AQE
    broadcasts group-cardinality frames — the winsorize rule);
    (2) per-group MAD over the in-row |x − med|, joined back the same
    way. Both use the sort-based exact ``percentile`` (type-7,
    `quantile_cont` parity) when ``exact=True``, or Greenwald–Khanna
    ``approx_percentile`` with fixed-size map-side-folding state as the
    100 TB path — plan shape unchanged. The flag itself is in-row."""
    fn = "percentile" if exact else "approx_percentile"
    acc = "" if exact else f", {accuracy}"
    med_agg = F.expr(f"{fn}({value_col}, 0.5D{acc})").alias("__med")

    def _join_back(left: DataFrame, agg: DataFrame) -> DataFrame:
        # NULL-SAFE equi-join: groupBy collects null group keys into
        # their own group, so the join back must match them too — a
        # plain equi-join would leave those rows with null fences and a
        # NULL (not False) flag
        cond = reduce(
            lambda a, b: a & b,
            [left[c].eqNullSafe(agg[c]) for c in group_cols],
        )
        return left.join(agg, cond).drop(*[agg[c] for c in group_cols])

    from functools import reduce

    if group_cols:
        med = df.groupBy(*group_cols).agg(med_agg)
        with_med = _join_back(df, med)
    else:
        with_med = df.crossJoin(F.broadcast(df.agg(med_agg)))
    dev = F.abs(F.col(value_col) - F.col("__med"))
    with_dev = with_med.withColumn("__dev", dev)
    mad_agg = F.expr(f"{fn}(__dev, 0.5D{acc})").alias("__mad")
    if group_cols:
        mad = with_dev.groupBy(*group_cols).agg(mad_agg)
        joined = _join_back(with_dev, mad)
    else:
        joined = with_dev.crossJoin(F.broadcast(with_dev.agg(mad_agg)))
    flag = (
        F.col(value_col).isNotNull()
        & (F.col("__mad") > 0)
        & (F.abs(F.col(value_col) - F.col("__med")) > F.lit(k) * F.col("__mad"))
    )
    return joined.select(
        *df.columns,
        F.round(F.col("__med").cast("double"), 6).alias(f"{value_col}_med"),
        F.round(F.col("__mad").cast("double"), 6).alias(f"{value_col}_mad"),
        flag.alias("is_outlier"),
    )


def entropy_report(
    df: DataFrame,
    group_cols: list[str],
    category_col: str,
) -> DataFrame:
    """Per-group Shannon entropy of a categorical distribution — the
    diversity/concentration profile ("does this source emit one event
    type or a healthy mix?"): ``H = −Σ pᵢ ln pᵢ`` in nats, plus
    ``n_categories`` and ``norm_entropy = H / ln(n_categories)``
    (0 = single category, 1 = uniform; null when one category).

    One (group, category)-keyed count collapse (map-side partial), then
    the per-group fold — the category frame is bounded by
    groups × categories, metadata scale. Each category's ``−p·ln p``
    term is ln over exact integer ratios quantized to 12dp DECIMAL
    before the cross-category sum (order-independent, the chi-square
    precedent); H and the normalization are 6dp-rounded doubles."""
    cat = (
        df.filter(F.col(category_col).isNotNull())
        .groupBy(*group_cols, category_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    from pyspark.sql import Window

    tot = Window.partitionBy(*group_cols)
    p = F.col("__c").cast("double") / F.col("__n").cast("double")
    term = F.round(-p * F.log(p), 12).cast("decimal(28,12)")
    per_cat = cat.withColumn("__n", F.sum("__c").over(tot)).select(
        *group_cols, F.col("__n"), term.alias("__t")
    )
    agged = per_cat.groupBy(*group_cols).agg(
        F.max("__n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_categories"),
        F.sum("__t").cast("double").alias("__h"),
    )
    return agged.select(
        *group_cols,
        "n_rows",
        "n_categories",
        F.round(F.col("__h"), 6).alias("entropy"),
        F.when(
            F.col("n_categories") > 1,
            F.round(
                F.col("__h") / F.log(F.col("n_categories").cast("double")), 6
            ),
        ).alias("norm_entropy"),
    )


def skew_report(
    df: DataFrame,
    cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Per-column key-skew diagnostics — the "will this column's groupBy
    / join melt a partition" report an engineer runs BEFORE picking
    shuffle keys: ``(column, n_rows, n_nulls, n_distinct, top_value,
    top_share, top_n_share)`` where top_share is the heaviest key's row
    fraction and top_n_share the heaviest ``top_n`` keys' combined
    fraction (1.0 ≈ a dimension column; 1/n_distinct ≈ uniform; a
    top_share over ~1/parallelism predicts a straggler under that key).

    One value-keyed count aggregation PER COLUMN (each map-side
    partial), each collapsed to one row via a bounded top-n sort over
    its value-cardinality frame, then a union of the per-column rows —
    column count is small and static, so the job count is too. Values
    render as strings (one report schema for any column mix); shares
    are exact-integer ratios, 6dp."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from pyspark.sql import Window

    outs = []
    for c in cols:
        counts = (
            df.groupBy(F.col(c).cast("string").alias("__v"))
            .agg(F.count(F.lit(1)).alias("__c"))
            .localCheckpoint(eager=False)  # feeds totals AND the top-n
        )
        totals = counts.agg(
            F.sum("__c").alias("__n"),
            F.coalesce(
                F.sum(F.when(F.col("__v").isNull(), F.col("__c"))), F.lit(0)
            ).alias("__nn"),
            F.count(F.when(F.col("__v").isNotNull(), F.lit(1))).alias("__nd"),
        )
        # rank NON-NULL values only: null ordering differs across
        # engines (Spark ASC=NULLS FIRST, DuckDB=NULLS LAST), and nulls
        # are already reported separately as n_nulls. orderBy+limit
        # plans TakeOrderedAndProject (distributed partial top-k per
        # partition, k-row merge on the driver side of the exchange) —
        # for near-unique columns (user ids, exactly this diagnostic's
        # target) an unpartitioned row_number window here would be a
        # corpus-scale single-task sort. The row_number below runs over
        # the ≤ top_n-row result (the dsir_select post-limit pattern).
        w = Window.orderBy(F.col("__c").desc(), F.col("__v").asc())
        ranked = (
            counts.filter(F.col("__v").isNotNull())
            .orderBy(F.col("__c").desc(), F.col("__v").asc())
            .limit(top_n)
            .select("__v", "__c", F.row_number().over(w).alias("__rk"))
        )
        row = ranked.agg(
            F.max(F.when(F.col("__rk") == 1, F.col("__v"))).alias("__top"),
            F.max(F.when(F.col("__rk") == 1, F.col("__c"))).alias("__tc"),
            F.sum("__c").alias("__tnc"),
        ).crossJoin(F.broadcast(totals))
        outs.append(
            row.select(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col("__nn").alias("n_nulls"),
                F.col("__nd").alias("n_distinct"),
                F.col("__top").alias("top_value"),
                F.round(
                    F.col("__tc").cast("double") / F.col("__n").cast("double"), 6
                ).alias("top_share"),
                F.round(
                    F.col("__tnc").cast("double") / F.col("__n").cast("double"), 6
                ).alias("top_n_share"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """EXACT type-7 quantiles with no value buffering — the scale-safe
    sibling of :func:`group_quantiles`'s ``exact=True`` path: Spark's
    sort-based ``percentile`` aggregate holds every value of the frame
    in one aggregation buffer (at corpus scale that task simply dies),
    and the usual escape is approximate (Greenwald-Khanna). This keeps
    exactness instead: ONE value-keyed collapse to the distinct-value
    grain, cumulative counts from :func:`~.ranks.bucketed_cumsum`
    (each distinct value owns the rank span ``(prev, cum]``), and the
    two order statistics every probability needs (``lo = ⌊h⌋``,
    ``hi = ⌈h⌉`` with ``h = (n−1)p + 1``) are picked by a
    broadcast-nested-loop probe of ≤ 2·|probs| rank literals against
    that span — the corpus never sorts in one task and never leaves
    the distinct-value grain.

    Determinism: ranks/counts are exact integers; ``h`` and the
    interpolation ``v_lo + (h−⌊h⌋)·(v_hi−v_lo)`` are the same fixed
    IEEE expressions both engines evaluate (bitwise parity with
    Spark ``percentile`` / DuckDB ``quantile_cont`` pinned by test),
    6dp-rounded. Null values are excluded; an empty frame returns
    zero rows. Returns one row per probability: ``(prob, n_values,
    quantile)``."""
    plist = [float(p) for p in probs]
    if not plist or any(not 0.0 <= p <= 1.0 for p in plist):
        raise ValueError(f"probs must be non-empty, each in [0, 1]: {probs}")
    from .ranks import bucketed_cumsum

    per_v = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        # pinned: feeds the total AND the cumsum
        .localCheckpoint(eager=False)
    )
    n = per_v.agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"))
    # n stays on the probe side only (the span side would make every
    # probe-join column ambiguous); the cumsum pays its own span pass
    # over the pinned frame
    cum = bucketed_cumsum(per_v, ["__c"], val_col="__v")
    # ≤ |probs| rows: each probability's h and its two needed ranks
    h = (F.col("__n").cast("double") - F.lit(1.0)) * F.col("p") + F.lit(1.0)
    needs = (
        n.select(
            "__n",
            F.posexplode(F.array(*[F.lit(p) for p in plist])).alias(
                "idx", "p"
            ),
        )
        .withColumn("h", h)
        .withColumn("lo", F.floor(F.col("h")).cast("bigint"))
        .withColumn("hi", F.ceil(F.col("h")).cast("bigint"))
    )
    # ≤ 2|probs| probe rows (rank, side) — broadcast against the span
    probes = needs.select(
        "idx", "p", "h", "__n",
        F.explode(
            F.array(
                F.struct(F.col("lo").alias("r"), F.lit("l").alias("s")),
                F.struct(F.col("hi").alias("r"), F.lit("h").alias("s")),
            )
        ).alias("pr"),
    ).select("idx", "p", "h", "__n", F.col("pr.r").alias("r"), F.col("pr.s").alias("s"))
    prev = F.col("__cum___c") - F.col("__c")
    hit = F.broadcast(probes).join(
        cum, (F.col("r") > prev) & (F.col("r") <= F.col("__cum___c"))
    )
    vd = F.col("__v").cast("double")
    picked = hit.groupBy("idx", "p", "h", "__n").agg(
        F.max(F.when(F.col("s") == "l", vd)).alias("__vl"),
        F.max(F.when(F.col("s") == "h", vd)).alias("__vh"),
    )
    q = F.col("__vl") + (F.col("h") - F.floor(F.col("h"))) * (
        F.col("__vh") - F.col("__vl")
    )
    return picked.select(
        F.col("p").alias("prob"),
        F.col("__n").alias("n_values"),
        F.round(q, 6).alias("quantile"),
    )


def benford_report(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford first-digit conformity — the classic anomaly screen for
    transaction-amount columns (organically-grown magnitudes follow
    ``P(d) = log₁₀(1 + 1/d)``; fabricated, capped, or unit-converted
    data does not): per leading digit 1–9, the observed share vs the
    Benford share, plus the mean absolute deviation (MAD) with
    Nigrini's standard conformity reading (< 0.006 close, < 0.012
    acceptable, < 0.015 marginal, else nonconforming).

    The leading digit is extracted from the DECIMAL(18,6) string form
    (first nonzero digit character) — arithmetically via
    ``floor(v/10^⌊log₁₀ v⌋)`` a last-ulp libm difference flips the
    digit at exact powers of ten, while the string form is exact and
    engine-identical. One digit-keyed collapse (map-side partial, ≤ 9
    groups); zero/null values are excluded (they have no leading
    digit). Determinism: counts exact; shares and MAD are fixed IEEE
    expressions (the Benford shares via ``ln(1+1/d)/ln(10)`` on both
    engines), 6dp. Returns 9 rows ``(digit, n, observed_share,
    expected_share, abs_gap, mad, conformity)`` — digits never
    observed still appear (their gap is the full expected share)."""
    digit_s = F.regexp_extract(
        F.abs(F.col(value_col).cast("decimal(18,6)")).cast("string"),
        "([1-9])",
        1,
    )
    obs = (
        df.filter(F.col(value_col).isNotNull() & (digit_s != ""))
        .groupBy(digit_s.cast("int").alias("digit"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    spark = df.sparkSession
    digits = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    full = digits.join(F.broadcast(obs), "digit", "left").select(
        "digit", F.coalesce(F.col("__c"), F.lit(0)).alias("__c")
    )
    tot = full.agg(F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"))
    j = full.crossJoin(F.broadcast(tot))
    dd = F.col("digit").cast("double")
    expected = F.log(F.lit(1.0) + F.lit(1.0) / dd) / F.log(F.lit(10.0))
    share = F.when(
        F.col("__n") > 0,
        F.col("__c").cast("double") / F.col("__n").cast("double"),
    )
    gap = F.abs(share - expected)
    scored = j.select(
        "digit",
        F.col("__c").alias("n"),
        F.round(share, 6).alias("observed_share"),
        F.round(expected, 6).alias("expected_share"),
        F.round(gap, 6).alias("abs_gap"),
        F.round(gap, 12).cast("decimal(28,12)").alias("__g12"),
    )
    # the 9-row MAD rollup broadcasts back (bounded-frame class)
    mad_row = scored.agg(
        (F.sum("__g12").cast("double") / F.lit(9.0)).alias("__mad")
    )
    out = scored.crossJoin(F.broadcast(mad_row))
    mad6 = F.round(F.col("__mad"), 6)
    return out.select(
        "digit",
        "n",
        "observed_share",
        "expected_share",
        "abs_gap",
        mad6.alias("mad"),
        F.when(mad6 < 0.006, "close")
        .when(mad6 < 0.012, "acceptable")
        .when(mad6 < 0.015, "marginal")
        .otherwise("nonconforming")
        .alias("conformity"),
    )


def group_exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: list[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """PER-GROUP exact type-7 quantiles with no value buffering — what
    :func:`group_quantiles` ``exact=True`` cannot offer at scale (its
    ``percentile`` aggregate holds every group value in one buffer —
    one hot group OOMs the executor) and ``exact=False`` only
    approximates. The :func:`exact_quantiles` construction applied per
    group: one (group, value)-keyed collapse, per-group cumulative
    counts from :func:`~.ranks.grouped_bucketed_cumsum`, and each
    group's needed order statistics picked by an EQUI-keyed probe join
    (group equality + rank-span containment — hash-joinable, the probe
    frame is group-cardinality × 2·|probs|, aggregate-sized). No group
    ever sorts in one task; no executor ever holds a group's values.

    Determinism: exact integer ranks; ``h``/interpolation are the same
    fixed IEEE expressions as the global form (``percentile`` /
    ``quantile_cont`` parity), 6dp. Null values AND null group keys
    are excluded. Returns one row per (group, probability):
    ``(*group_cols, prob, n_values, quantile)``."""
    plist = [float(p) for p in probs]
    if not plist or any(not 0.0 <= p <= 1.0 for p in plist):
        raise ValueError(f"probs must be non-empty, each in [0, 1]: {probs}")
    from .ranks import grouped_bucketed_cumsum

    gl = list(group_cols)
    if not gl:
        raise ValueError("group_cols must be non-empty (use exact_quantiles)")
    base = df.filter(F.col(value_col).isNotNull())
    for g in gl:
        base = base.filter(F.col(g).isNotNull())
    per_v = (
        base.groupBy(*gl, F.col(value_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
        # pinned: feeds the group totals AND the grouped cumsum
        .localCheckpoint(eager=False)
    )
    cum = grouped_bucketed_cumsum(per_v, ["__c"], gl, val_col="__v")
    ng = per_v.groupBy(*gl).agg(F.sum("__c").alias("__qn"))
    h = (F.col("__qn").cast("double") - F.lit(1.0)) * F.col("__qp") + F.lit(
        1.0
    )
    needs = (
        ng.select(
            *gl,
            "__qn",
            F.posexplode(F.array(*[F.lit(p) for p in plist])).alias(
                "__qi", "__qp"
            ),
        )
        .withColumn("__qh", h)
        .withColumn("__qlo", F.floor(F.col("__qh")).cast("bigint"))
        .withColumn("__qhi", F.ceil(F.col("__qh")).cast("bigint"))
    )
    probes = needs.select(
        *[F.col(g).alias(f"__pg_{i}") for i, g in enumerate(gl)],
        "__qi", "__qp", "__qh", "__qn",
        F.explode(
            F.array(
                F.struct(F.col("__qlo").alias("r"), F.lit("l").alias("s")),
                F.struct(F.col("__qhi").alias("r"), F.lit("h").alias("s")),
            )
        ).alias("__pr"),
    ).select(
        *[f"__pg_{i}" for i in range(len(gl))],
        "__qi", "__qp", "__qh", "__qn",
        F.col("__pr.r").alias("__qr"),
        F.col("__pr.s").alias("__qs"),
    )
    prev = F.col("__cum___c") - F.col("__c")
    cond = (F.col("__qr") > prev) & (F.col("__qr") <= F.col("__cum___c"))
    for i, g in enumerate(gl):
        cond = cond & (F.col(f"__pg_{i}") == F.col(g))
    hit = probes.join(cum, cond)
    vd = F.col("__v").cast("double")
    picked = hit.groupBy(
        *[f"__pg_{i}" for i in range(len(gl))], "__qi", "__qp", "__qh",
        "__qn",
    ).agg(
        F.max(F.when(F.col("__qs") == "l", vd)).alias("__vl"),
        F.max(F.when(F.col("__qs") == "h", vd)).alias("__vh"),
    )
    q = F.col("__vl") + (F.col("__qh") - F.floor(F.col("__qh"))) * (
        F.col("__vh") - F.col("__vl")
    )
    return picked.select(
        *[
            F.col(f"__pg_{i}").alias(g)
            for i, g in enumerate(gl)
        ],
        F.col("__qp").alias("prob"),
        F.col("__qn").alias("n_values"),
        F.round(q, 6).alias("quantile"),
    )


def weighted_quantiles(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    probs: list[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """EXACT weighted quantiles with no value buffering — the
    importance-weighted sibling of :func:`exact_quantiles` for frames
    where rows carry unequal mass (token counts weighting a per-doc
    score, sampling weights after :func:`~.selection.dsir` resampling):
    the ``p``-quantile is the SMALLEST value whose inclusive cumulative
    weight reaches ``p·W`` (the left-continuous inverse of the weighted
    CDF — element SELECTION, no interpolation, so both engines pick the
    identical stored double and ties in the weight boundary cannot
    split them).

    Scale shape (the :func:`exact_quantiles` discipline): ONE
    value-keyed collapse to the distinct-value grain summing exact
    6dp-decimal weights, cumulative weights from
    :func:`~.ranks.bucketed_cumsum`, and each probability picked by a
    broadcast-nested-loop probe of ≤ |probs| target literals against
    the weight span ``(cum − w, cum]`` — the corpus never sorts in one
    task. Determinism: weights quantize to DECIMAL(18,6) so cumulative
    weights are exact decimals; the target ``p·W`` and the span
    comparison evaluate on the same correctly-rounded doubles in both
    engines. Rows whose value or weight is null, or whose 6dp-ROUNDED
    weight is ≤ 0, are excluded (a zero-weight value must not be
    pickable as a quantile — and the filter applies to the QUANTIZED
    weight, so a 1e-7 weight that rounds to zero mass cannot pass the
    filter yet vanish from the cumulative spans).
    ``probs`` must each lie in (0, 1]. Returns one row per
    probability: ``(prob, n_rows, total_weight, quantile)``; empty
    frame returns zero rows."""
    plist = [float(p) for p in probs]
    if not plist or any(not 0.0 < p <= 1.0 for p in plist):
        raise ValueError(
            f"probs must be non-empty, each in (0, 1]: {probs}"
        )
    from .ranks import bucketed_cumsum

    wq = F.round(F.col(weight_col).cast("double"), 6).cast("decimal(18,6)")
    per_v = (
        df.filter(
            F.col(value_col).isNotNull()
            & F.col(weight_col).isNotNull()
            & (F.round(F.col(weight_col).cast("double"), 6) > 0)
        )
        .groupBy(F.col(value_col).alias("__v"))
        .agg(
            F.sum(wq).cast("decimal(38,6)").alias("__w"),
            F.count(F.lit(1)).alias("__c"),
        )
        # pinned: feeds the weight total AND the cumsum
        .localCheckpoint(eager=False)
    )
    tot = per_v.agg(
        F.coalesce(F.sum("__w"), F.lit(0).cast("decimal(38,6)")).alias(
            "__tw"
        ),
        F.coalesce(F.sum("__c"), F.lit(0)).alias("__n"),
    )
    cum = bucketed_cumsum(per_v, ["__w"], val_col="__v")
    targets = tot.select(
        "__tw",
        "__n",
        F.explode(F.array(*[F.lit(p) for p in plist])).alias("__p"),
    ).withColumn(
        "__tgt", F.col("__p") * F.col("__tw").cast("double")
    )
    prev = (F.col("__cum___w") - F.col("__w")).cast("double")
    hit = F.broadcast(targets).join(
        cum,
        (F.col("__tgt") > prev)
        & (F.col("__tgt") <= F.col("__cum___w").cast("double")),
    )
    return hit.select(
        F.col("__p").alias("prob"),
        F.col("__n").alias("n_rows"),
        F.col("__tw").cast("double").alias("total_weight"),
        F.col("__v").cast("double").alias("quantile"),
    )


def quantile_bin(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_bins: int = 10,
    out_col: str = "bin",
) -> DataFrame:
    """Equal-frequency (quantile) binning as a PUBLIC row-grain
    operator — the discretizer feature pipelines run before target
    encoding, WoE scoring, or monotone-binned calibration: each row
    gets the SQL ``ntile(n_bins)`` bucket of its value under the total
    order ``(value, id)``.

    This is the building block :func:`lift_table` /
    :func:`~.segmentation.rfm_segments` already use, exposed directly:
    the exact bucketed global rank (:func:`~.ranks.global_rank` with
    ``tie_fanout`` — a modal value cannot collapse the pass into one
    window task) plus the exact-integer ntile remainder arithmetic
    (:func:`~.ranks.ntile_from_rank`), so there is NO unpartitioned
    ntile window anywhere and results equal the SQL window
    bit-for-bit. Null values or ids are excluded. Returns the input
    columns plus ``out_col`` (1-based bin id)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    from .ranks import global_rank, ntile_from_rank

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    ).localCheckpoint(eager=False)  # feeds the count AND the rank pass
    nn = base.agg(F.count(F.lit(1)).alias("__qbn"))
    ranked = global_rank(
        base, value_col, [id_col], out_col="__qbr", tie_fanout=True
    ).crossJoin(F.broadcast(nn))
    return ranked.withColumn(
        out_col,
        ntile_from_rank(
            F.col("__qbr"), F.col("__qbn").cast("bigint"), n_bins
        ),
    ).drop("__qbr", "__qbn")
